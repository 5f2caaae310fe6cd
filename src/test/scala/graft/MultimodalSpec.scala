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

/** Real-decode path: PNG/JPEG/WAV generated in-memory with JDK encoders,
  * decoded distributed through the same mapPartitions pipeline — no fake
  * anywhere in these assertions.
  */
class ImageIoCodecSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal.ImageIoCodec

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** 1 second of silence, 8kHz 8-bit mono PCM in a WAV container. */
  private def wav(): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val pcm = new Array[Byte](8000)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      in, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real decode: sniff, dims, duration through the Spark pipeline") {
    val media = Seq(
      MediaRow(1L, png(37, 23, 0x336699)),
      MediaRow(2L, jpeg(16, 8)),
      MediaRow(3L, wav())
    ).toDS().repartition(2)
    val meta = Multimodal.extractMeta(media, ImageIoCodec)
      .collect().map(m => m.id -> m).toMap
    assert(meta(1L).format == "png" && meta(1L).width == 37 && meta(1L).height == 23)
    assert(meta(2L).format == "jpeg" && meta(2L).width == 16 && meta(2L).height == 8)
    assert(meta(3L).format == "wav" && meta(3L).durationMs == 1000)
    assert(meta(1L).durationMs == 0) // stills have no duration
  }

  test("real resize re-encodes to the target pixel dimensions") {
    val media = Seq(MediaRow(1L, png(64, 64, 0xFF0000))).toDS()
    val out = Multimodal.resizeAll(media, 8, 4, ImageIoCodec).collect().head
    assert(ImageIoCodec.sniffFormat(out.media) == "png")
    assert(ImageIoCodec.decodeDims(out.media) == (8, 4))
  }

  test("real features: luminance histogram is L1-normalized, peak at the fill tone") {
    val black = png(10, 10, 0x000000)
    val white = png(10, 10, 0xFFFFFF)
    val media = Seq(MediaRow(1L, black), MediaRow(2L, white)).toDS()
    val feats = Multimodal.extractFeatures(media, dim = 16, ImageIoCodec)
      .as[(Long, Seq[Float])].collect().toMap
    assert(math.abs(feats(1L).sum - 1f) < 1e-5)
    assert(feats(1L).head == 1f)  // all-black -> lowest bin
    assert(feats(2L).last == 1f)  // all-white -> highest bin
  }
}
