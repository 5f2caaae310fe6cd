package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `BINARY` columns with typed metadata alongside. The
  * Spark-side contract (schema, partitioning, batch iteration shape) is
  * real and tested; decoding goes through the [[MediaCodec]] seam:
  *  - [[ImageIoCodec]] — a REAL decoder for the formats the JDK ships
  *    codecs for (JPEG/PNG via `javax.imageio`, WAV via
  *    `javax.sound.sampled`): true magic-byte sniffing, true pixel
  *    dimensions, true resampled resize, luminance-histogram features,
  *    true PCM duration.
  *  - [[FakeCodec]] — a deterministic stand-in for formats whose codecs
  *    are NOT in the JDK (mp4/video frame demux), and for oracle-checked
  *    tests that need engine-independent reproducibility.
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

  /** The codec seam. Implementations must be Serializable — instances are
    * closed over by `mapPartitions` lambdas and shipped to executors; a
    * real native-lib codec would lazy-init its handle per partition (the
    * `rows` iterator is consumed once per task).
    */
  trait MediaCodec extends Serializable {
    def sniffFormat(bytes: Array[Byte]): String
    def decodeDims(bytes: Array[Byte]): (Int, Int)
    def durationMs(bytes: Array[Byte]): Long
    def features(bytes: Array[Byte], dim: Int = 16): Array[Float]
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]]
  }

  /** ===== STUB: deterministic fake codec =====
    * Placeholder for decoders outside the JDK (mp4 demux) and the codec
    * used by the DuckDB-oracled queries (q26/q27) — pure functions of the
    * bytes, reproducible on any engine.
    */
  object FakeCodec extends MediaCodec {
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

  /** ===== REAL codec for JDK-decodable formats =====
    * JPEG / PNG (and GIF/BMP) decode through `javax.imageio`; WAV through
    * `javax.sound.sampled`; mp4 duration + frame sampling through the
    * zero-dependency [[Mp4Demux]] box parser. All pure JVM. Pixel decode
    * of mp4 video samples stays out of scope (no JDK H.264 decoder) —
    * the demuxed access units are what an inference batch consumes.
    */
  object ImageIoCodec extends MediaCodec {

    /** True magic-byte sniffing (the part FakeCodec fakes with a hash). */
    def sniffFormat(bytes: Array[Byte]): String = {
      def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xFF else -1
      if (bytes.isEmpty) "empty"
      else if (at(0) == 0xFF && at(1) == 0xD8) "jpeg"
      else if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
      else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
        at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
      else if (at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p') "mp4"
      else "unknown"
    }

    private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))

    def decodeDims(bytes: Array[Byte]): (Int, Int) =
      readImage(bytes).map(img => (img.getWidth, img.getHeight)).getOrElse((0, 0))

    /** PCM duration from the WAV header; mvhd duration for mp4 (real box
      * parse, [[Mp4Demux]]); 0 for stills.
      */
    def durationMs(bytes: Array[Byte]): Long = sniffFormat(bytes) match {
      case "wav" =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          if (f.getFrameRate > 0) (in.getFrameLength * 1000L / f.getFrameRate.toLong)
          else 0L
        } finally in.close()
      case "jpeg" | "png" => 0L
      case "mp4" => Mp4Demux.durationMs(bytes)
      case _ => FakeCodec.durationMs(bytes)
    }

    /** Real image features: a dim-bin luminance histogram, L1-normalized —
      * the classic cheap visual fingerprint (and a valid
      * [[Dedup.embeddingNearDup]] input).
      */
    def features(bytes: Array[Byte], dim: Int = 16): Array[Float] =
      readImage(bytes).map { img =>
        val out = new Array[Float](dim)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 +
              ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
            out(math.min(lum * dim / 256, dim - 1)) += 1f
            x += 1
          }
          y += 1
        }
        val n = (img.getWidth.toLong * img.getHeight).toFloat
        if (n > 0) { var i = 0; while (i < dim) { out(i) /= n; i += 1 } }
        out
      }.getOrElse(FakeCodec.features(bytes, dim))

    /** Real resize: bilinear redraw, re-encoded as PNG (lossless, JDK
      * writer always available).
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      readImage(bytes).map { img =>
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }.getOrElse(FakeCodec.resize(bytes, w, h))

    /** Real mp4 demux ([[Mp4Demux]]): n evenly-spaced video samples
      * (access units) sliced straight from `mdat` via the stsz/stsc/stco
      * sample table. Non-mp4 (or unparsable) input keeps the FakeCodec
      * byte-stride stand-in.
      */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      if (sniffFormat(bytes) == "mp4") {
        val frames = Mp4Demux.sampleFrames(bytes, n)
        if (frames.nonEmpty) frames else FakeCodec.sampleFrames(bytes, n)
      } else FakeCodec.sampleFrames(bytes, n)
  }

  /** Decode + metadata extraction: BINARY -> typed MediaMeta columns.
    * `mapPartitions` so a real codec can amortize per-batch init
    * (model load, native lib handle) across the partition.
    */
  def extractMeta(
      media: Dataset[MediaRow],
      codec: MediaCodec = FakeCodec): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: init decoder once per partition here
      rows.map { r =>
        val (w, h) = codec.decodeDims(r.media)
        MediaMeta(r.id, codec.sniffFormat(r.media), w, h,
          r.media.length.toLong, codec.durationMs(r.media))
      }
    }
  }

  /** Feature extraction: BINARY -> ARRAY<FLOAT>, ready for
    * [[Similarity]] / [[Dedup.embeddingNearDup]].
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      dim: Int = 16,
      codec: MediaCodec = FakeCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => (r.id, codec.features(r.media, dim)))
    }.toDF("id", "features")
  }

  /** Resize pass-through: BINARY -> BINARY (same schema, new payload). */
  def resizeAll(
      media: Dataset[MediaRow],
      w: Int,
      h: Int,
      codec: MediaCodec = FakeCodec): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(r => MediaRow(r.id, codec.resize(r.media, w, h))))
  }

  /** Frame sampling: one row per sampled frame (video -> image rows). */
  def sampleFrames(
      media: Dataset[MediaRow],
      n: Int,
      codec: MediaCodec = FakeCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap(r => codec.sampleFrames(r.media, n).zipWithIndex.map {
      case (f, i) => (r.id, i, f)
    }).toDF("id", "frame_no", "frame")
  }

  /** Adapter: any DataFrame with (idCol: LONG, binCol: BINARY) -> MediaRow. */
  def asMedia(df: DataFrame, idCol: String, binCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("media")).as[MediaRow]
  }

  // ---------------------------------------------------- audio features

  /** Windowed audio energy features from REAL PCM decode (AudioSystem):
    * per fixed `windowMs` window the RMS amplitude (normalized to
    * [0, 1]), plus the clip-level silence fraction (windows under
    * `silenceRms`) and peak — the trim-the-dead-air / discard-empty-clip
    * signals an audio curation pass cuts on. 16-bit/8-bit PCM; sample
    * sums accumulate in Long (exact), one sqrt per window. Returns None
    * for non-audio bytes.
    */
  final case class AudioStats(
      durationMs: Long, nWindows: Long, rmsMean: Double,
      silenceFrac: Double, peak: Double)

  def audioStats(
      bytes: Array[Byte],
      windowMs: Int = 100,
      silenceRms: Double = 0.01): Option[AudioStats] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val bits = f.getSampleSizeInBits
        if (bits != 16 && bits != 8) return None
        val bytesPerFrame = f.getFrameSize
        val data = in.readAllBytes()
        val nFrames = data.length / bytesPerFrame
        val rate = f.getFrameRate.toDouble
        val perWin = math.max(1, (rate * windowMs / 1000.0).toInt)
        val full = if (bits == 16) 32768.0 else 128.0
        def sample(i: Int): Long = {
          val off = i * bytesPerFrame // first channel
          if (bits == 16) {
            val lo = data(off) & 0xFF
            val hi = data(off + 1)
            if (f.isBigEndian) ((data(off) << 8) | (data(off + 1) & 0xFF)).toLong
            else ((hi << 8) | lo).toLong
          } else (data(off) & 0xFF).toLong - 128L
        }
        var win = 0
        var rmsSum = 0.0
        var silent = 0L
        var peak = 0.0
        var i = 0
        val nWins = nFrames / perWin
        while (win < nWins) {
          var sq = 0L
          var j = 0
          while (j < perWin) {
            val s = sample(i)
            sq += s * s
            val a = math.abs(s) / full
            if (a > peak) peak = a
            i += 1; j += 1
          }
          val rms = math.sqrt(sq.toDouble / perWin) / full
          rmsSum += rms
          if (rms < silenceRms) silent += 1
          win += 1
        }
        if (nWins == 0) None
        else Some(AudioStats(
          (nFrames * 1000L / rate.toLong),
          nWins,
          rmsSum / nWins,
          silent.toDouble / nWins,
          peak))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Distributed audio stats: one row per decodable clip. */
  def extractAudioStats(
      media: Dataset[MediaRow],
      windowMs: Int = 100,
      silenceRms: Double = 0.01): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => audioStats(r.media, windowMs, silenceRms).map(s =>
        (r.id, s.durationMs, s.nWindows, s.rmsMean, s.silenceFrac, s.peak)))
    }.toDF("id", "duration_ms", "n_windows", "rms_mean", "silence_frac", "peak")
  }

  // ------------------------------------------------- perceptual hashing

  /** 64-bit average hash (aHash — the classic perceptual image
    * fingerprint, Krawetz 2011 writeup of the folklore algorithm): the
    * image collapses to an 8×8 luminance grid by EXACT integer block
    * averaging (no resampling filter — bilinear redraws can differ across
    * JVMs/platforms; block sums of the decoded pixels cannot), bit i set
    * when block i's mean luminance strictly exceeds the grid mean.
    * Non-decodable bytes hash to 0 (callers filter on decodability via
    * [[extractMeta]]'s dims).
    */
  def aHash64(bytes: Array[Byte]): Long =
    lumGrid(bytes, 8, 8) match {
      case None => 0L
      case Some(g) =>
        // bit i: block mean > whole-image pixel mean, decided by exact
        // integer cross-multiplication s_i*C > S*c_i — no float anywhere
        val bigS = g.map(_._1).sum
        val bigC = g.map(_._2).sum
        var h = 0L
        var i = 0
        while (i < 64) {
          if (g(i)._1 * bigC > bigS * g(i)._2) h |= (1L << i)
          i += 1
        }
        h
    }

  /** 64-bit difference hash (dHash — gradient fingerprint, more robust to
    * global brightness shifts than aHash): 9×8 block grid, bit (y·8+x)
    * set when block (x,y) is strictly darker than its right neighbor —
    * again exact integer cross-multiplication.
    */
  def dHash64(bytes: Array[Byte]): Long =
    lumGrid(bytes, 9, 8) match {
      case None => 0L
      case Some(g) =>
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val l = g(y * 9 + x); val r = g(y * 9 + x + 1)
            if (l._1 * r._2 < r._1 * l._2) h |= (1L << (y * 8 + x))
            x += 1
          }
          y += 1
        }
        h
    }

  /** Perceptual near-duplicate image pairs: all (id1, id2) with
    * Hamming(aHash) ≤ `maxHamming`, found SimHash-style — split the
    * 64-bit hash into `maxHamming`+1 bands (pigeonhole: a qualifying
    * pair agrees exactly on at least one band), candidate-join on
    * (band_id, band_value), verify with one popcount. Never all-pairs;
    * every exchange carries (band, id) longs.
    */
  def imageNearDupPairs(
      media: Dataset[MediaRow],
      maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "0 <= maxHamming < 64")
    import media.sparkSession.implicits._
    val hashes = media.mapPartitions { rows =>
      rows.map(r => (r.id, aHash64(r.media)))
    }.toDF("id", "h")
      .filter(col("h") =!= 0L) // non-decodable bytes don't pair
      .persist()
    val bands = maxHamming + 1
    val width = 64 / bands
    val banded = hashes.select(col("id"), col("h"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          (shiftright(col("h"), b * width) bitwiseAND
            lit((1L << width) - 1)).as("v"))
      }: _*)).as("bv"))
      .select(col("id"), col("h"), col("bv.band"), col("bv.v"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  private def lumGrid(bytes: Array[Byte], gw: Int, gh: Int): Option[Array[(Long, Long)]] =
    Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      .filter(img => img.getWidth >= gw && img.getHeight >= gh)
      .map { img =>
        val w = img.getWidth; val h = img.getHeight
        val out = new Array[(Long, Long)](gw * gh)
        var gy = 0
        while (gy < gh) {
          val y0 = h.toLong * gy / gh; val y1 = h.toLong * (gy + 1) / gh
          var gx = 0
          while (gx < gw) {
            val x0 = w.toLong * gx / gw; val x1 = w.toLong * (gx + 1) / gw
            var sum = 0L; var cnt = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x.toInt, y.toInt)
                sum += (((rgb >> 16) & 0xFF) * 299 +
                  ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
                cnt += 1; x += 1
              }
              y += 1
            }
            out(gy * gw + gx) = (sum, cnt)
            gx += 1
          }
          gy += 1
        }
        out
      }
}
