package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    MediaRow(1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
    MediaRow(2L, Array[Byte](-5, 0, 0, 9)),
    MediaRow(3L, Array.empty[Byte])
  ).toDS()

  test("extractMeta: deterministic schema + per-row metadata") {
    val meta = Multimodal.extractMeta(media).collect().map(m => m.id -> m).toMap
    assert(meta(1L).nBytes == 8 && meta(1L).durationMs == 80)
    assert(meta(3L).format == "empty" && meta(3L).nBytes == 0)
    // deterministic: same input -> same fake dims on re-run
    val again = Multimodal.extractMeta(media).collect().map(m => m.id -> m).toMap
    assert(meta(2L).width == again(2L).width && meta(2L).height == again(2L).height)
  }

  test("extractFeatures: fixed-dim float vectors feed similarity ops") {
    val feats = Multimodal.extractFeatures(media, dim = 4)
    assert(feats.columns.toSeq == Seq("id", "features"))
    val v = feats.filter($"id" === 1L).select("features")
      .as[Seq[Float]].head()
    assert(v.length == 4)
    assert(v.sum > 0) // bytes accumulated into buckets
  }

  test("resizeAll preserves schema; sampleFrames explodes one row per frame") {
    val resized = Multimodal.resizeAll(media, 8, 8).collect().map(r => r.id -> r.media.length).toMap
    assert(resized(1L) <= 8 && resized(1L) >= 1)
    val frames = Multimodal.sampleFrames(media.filter($"id" === 1L), n = 4)
    assert(frames.columns.toSeq == Seq("id", "frame_no", "frame"))
    assert(frames.count() == 4)
  }
}
