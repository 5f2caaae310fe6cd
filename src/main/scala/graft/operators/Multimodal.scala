package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `BINARY` columns with typed metadata alongside — the
  * Spark-side contract (schema, partitioning, batch iteration shape) is
  * real and tested; the actual codec calls are STUBBED behind
  * [[FakeCodec]] (deterministic fakes — the image/audio libraries are not
  * in this container). Swapping in a real decoder touches only FakeCodec.
  *
  * Scale design: decode/feature-extract runs as `mapPartitions` over the
  * binary column — per-partition batch processing, zero shuffle; partition
  * sizing is controlled upstream (`spark.sql.files.maxPartitionBytes` keeps
  * each task's media batch in memory). Feature outputs are columnar
  * (arrays/structs), so downstream similarity/dedup operators consume them
  * directly.
  */
object Multimodal {

  /** Decoded-media metadata row. */
  final case class MediaMeta(
      id: Long, format: String, width: Int, height: Int,
      nBytes: Long, durationMs: Long)

  /** Media row as carried through the pipeline. */
  final case class MediaRow(id: Long, media: Array[Byte])

  /** ===== STUB: deterministic fake codec =====
    * Every function here is a placeholder for a real decoder (JPEG/PNG/
    * WAV/MP4). The fakes are pure functions of the bytes, so tests are
    * reproducible and the pipeline shape (batching, schema, partitioning)
    * is exercised for real.
    */
  object FakeCodec {
    def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.isEmpty) "empty"
      else Seq("jpeg", "png", "wav", "mp4")(math.abs(bytes(0).toInt) % 4)

    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(bytes)
      (64 + math.abs(h % 1024), 64 + math.abs((h >> 10) % 1024))
    }

    def durationMs(bytes: Array[Byte]): Long = bytes.length.toLong * 10

    /** Fake feature vector (stand-in for an image embedding). */
    def features(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      out
    }

    /** Fake resize: real impl would re-encode; stub truncates/pads bytes to
      * a size proportional to the target area.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(bytes, math.max(1, math.min(bytes.length, w * h / 64)))

    /** Fake frame sampling: byte-strided slices as "frames". */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val stride = math.max(1, bytes.length / math.max(n, 1))
      (0 until math.min(n, math.max(bytes.length, 1)))
        .map(i => java.util.Arrays.copyOfRange(
          bytes, math.min(i * stride, bytes.length),
          math.min(i * stride + stride, bytes.length)))
    }
  }

  /** Decode + metadata extraction: BINARY -> typed MediaMeta columns.
    * `mapPartitions` so a real codec can amortize per-batch init
    * (model load, native lib handle) across the partition.
    */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: init decoder once per partition here
      rows.map { r =>
        val (w, h) = FakeCodec.decodeDims(r.media)
        MediaMeta(r.id, FakeCodec.sniffFormat(r.media), w, h,
          r.media.length.toLong, FakeCodec.durationMs(r.media))
      }
    }
  }

  /** Feature extraction: BINARY -> ARRAY<FLOAT>, ready for
    * [[Similarity]] / [[Dedup.embeddingNearDup]].
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => (r.id, FakeCodec.features(r.media, dim)))
    }.toDF("id", "features")
  }

  /** Resize pass-through: BINARY -> BINARY (same schema, new payload). */
  def resizeAll(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(r => MediaRow(r.id, FakeCodec.resize(r.media, w, h))))
  }

  /** Frame sampling: one row per sampled frame (video -> image rows). */
  def sampleFrames(media: Dataset[MediaRow], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap(r => FakeCodec.sampleFrames(r.media, n).zipWithIndex.map {
      case (f, i) => (r.id, i, f)
    }).toDF("id", "frame_no", "frame")
  }

  /** Adapter: any DataFrame with (idCol: LONG, binCol: BINARY) -> MediaRow. */
  def asMedia(df: DataFrame, idCol: String, binCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("media")).as[MediaRow]
  }
}
