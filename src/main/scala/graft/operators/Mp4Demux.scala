package graft.operators

import java.nio.charset.StandardCharsets

/** Minimal pure-JVM MP4 (ISO BMFF, the public ISO/IEC 14496-12 box
  * structure) demuxer: movie duration from `moov/mvhd` and the video
  * track's sample byte ranges from the `stbl` sample table
  * (`stsz` sizes + `stsc` sample-to-chunk runs + `stco`/`co64` chunk
  * offsets). DEMUX only — it slices real sample payloads (e.g. AVC access
  * units) out of `mdat`; pixel decode stays out of scope, exactly the
  * boundary a feature-extraction pipeline wants before handing frames to
  * an inference batch (Multimodal.scala's mapInPandas analog).
  *
  * The reference treats media as opaque binary (multimodal columns are a
  * beyond-reference addition, SURVEY §2.12 X12); this closes the one seam
  * that previously fell back to [[Multimodal.FakeCodec]].
  */
object Mp4Demux {

  /** Parsed sample table of the first video (`hdlr` = "vide") track. */
  final case class Mp4Info(
      timescale: Long,
      duration: Long,
      sampleOffsets: Array[Long],
      sampleSizes: Array[Long]) {
    def durationMs: Long =
      if (timescale > 0) duration * 1000L / timescale else 0L
    def sampleCount: Int = sampleSizes.length
  }

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  private def u64(b: Array[Byte], i: Int): Long = (u32(b, i) << 32) | u32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, StandardCharsets.US_ASCII)

  /** Sibling boxes in [start, end): (type, payloadStart, payloadEnd).
    * Handles 64-bit largesize (size==1) and to-end boxes (size==0);
    * malformed sizes clamp to the window so a truncated file can't loop
    * or overrun.
    */
  private def boxes(b: Array[Byte], start: Int, end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var p = start
      override def hasNext: Boolean = p + 8 <= end
      override def next(): (String, Int, Int) = {
        val size32 = u32(b, p)
        val tpe = fourcc(b, p + 4)
        val (hdrLen, size) =
          if (size32 == 1 && p + 16 <= end) (16, u64(b, p + 8))
          else if (size32 == 0) (8, (end - p).toLong)
          else (8, size32)
        val boxEnd = math.min(end.toLong, p + math.max(size, hdrLen.toLong)).toInt
        val out = (tpe, math.min(p + hdrLen, boxEnd), boxEnd)
        p = boxEnd
        out
      }
    }

  private def find(b: Array[Byte], start: Int, end: Int, tpe: String): Option[(Int, Int)] =
    boxes(b, start, end).collectFirst { case (t, s, e) if t == tpe => (s, e) }

  private def path(b: Array[Byte], ps: Seq[String]): Option[(Int, Int)] =
    ps.foldLeft(Option((0, b.length))) { case (acc, t) =>
      acc.flatMap { case (s, e) => find(b, s, e, t) }
    }

  /** (timescale, duration) from `moov/mvhd`, version 0 or 1. */
  def movieTiming(b: Array[Byte]): Option[(Long, Long)] =
    path(b, Seq("moov", "mvhd")).flatMap { case (s, e) =>
      val v = b(s) & 0xFF
      if (v == 1 && s + 32 <= e) Some((u32(b, s + 20), u64(b, s + 24)))
      else if (v == 0 && s + 20 <= e) Some((u32(b, s + 12), u32(b, s + 16)))
      else None
    }

  def durationMs(b: Array[Byte]): Long =
    movieTiming(b).map { case (ts, d) => if (ts > 0) d * 1000L / ts else 0L }
      .getOrElse(0L)

  /** Full parse: timing + the first video track's sample table, expanded
    * to absolute per-sample byte ranges. None if the file has no parsable
    * moov or no video track.
    */
  def parse(b: Array[Byte]): Option[Mp4Info] = for {
    (moovS, moovE) <- path(b, Seq("moov"))
    (ts, dur) = movieTiming(b).getOrElse((0L, 0L))
    stbl <- boxes(b, moovS, moovE).collect { case ("trak", ts0, te) => (ts0, te) }
      .flatMap { case (ts0, te) =>
        find(b, ts0, te, "mdia").flatMap { case (ms, me) =>
          // hdlr payload: version/flags(4) pre_defined(4) handler_type(4)
          val isVideo = find(b, ms, me, "hdlr").exists { case (hs, he) =>
            hs + 12 <= he && fourcc(b, hs + 8) == "vide"
          }
          if (isVideo)
            find(b, ms, me, "minf").flatMap { case (fs, fe) => find(b, fs, fe, "stbl") }
          else None
        }
      }.take(1).toSeq.headOption
    sizes <- sampleSizes(b, stbl._1, stbl._2)
    offsets <- sampleOffsets(b, stbl._1, stbl._2, sizes)
  } yield Mp4Info(ts, dur, offsets, sizes)

  /** `stsz`: fixed sample_size or a per-sample size list. */
  private def sampleSizes(b: Array[Byte], s: Int, e: Int): Option[Array[Long]] =
    find(b, s, e, "stsz").flatMap { case (zs, ze) =>
      if (zs + 12 > ze) None
      else {
        val fixed = u32(b, zs + 4)
        val count = u32(b, zs + 8).toInt
        if (fixed != 0) Some(Array.fill(count)(fixed))
        else if (zs + 12 + 4L * count > ze) None
        else Some(Array.tabulate(count)(i => u32(b, zs + 12 + 4 * i)))
      }
    }

  /** `stsc` run-length sample-to-chunk map + `stco`/`co64` chunk offsets
    * -> absolute byte offset per sample (samples are contiguous within a
    * chunk, ISO 14496-12 §8.7.4-8.7.5).
    */
  private def sampleOffsets(
      b: Array[Byte], s: Int, e: Int, sizes: Array[Long]): Option[Array[Long]] = {
    val chunkOffsets: Option[Array[Long]] =
      find(b, s, e, "stco").flatMap { case (cs, ce) =>
        val n = u32(b, cs + 4).toInt
        if (cs + 8 + 4L * n > ce) None
        else Some(Array.tabulate(n)(i => u32(b, cs + 8 + 4 * i)))
      }.orElse(find(b, s, e, "co64").flatMap { case (cs, ce) =>
        val n = u32(b, cs + 4).toInt
        if (cs + 8 + 8L * n > ce) None
        else Some(Array.tabulate(n)(i => u64(b, cs + 8 + 8 * i)))
      })
    for {
      chunks <- chunkOffsets
      (scS, scE) <- find(b, s, e, "stsc")
    } yield {
      val nRuns = u32(b, scS + 4).toInt
      // runs: (first_chunk 1-based, samples_per_chunk)
      val runs = Array.tabulate(nRuns)(i =>
        (u32(b, scS + 8 + 12 * i).toInt, u32(b, scS + 12 + 12 * i).toInt))
      val out = new Array[Long](sizes.length)
      var sample = 0
      var run = 0
      var chunk = 0
      while (chunk < chunks.length && sample < sizes.length) {
        while (run + 1 < runs.length && runs(run + 1)._1 <= chunk + 1) run += 1
        val perChunk = if (runs.isEmpty) sizes.length else runs(run)._2
        var off = chunks(chunk)
        var j = 0
        while (j < perChunk && sample < sizes.length) {
          out(sample) = off
          off += sizes(sample)
          sample += 1
          j += 1
        }
        chunk += 1
      }
      out
    }
  }

  /** Slice `n` evenly-spaced video samples (demuxed access units) out of
    * the file; all samples when n >= sampleCount. Empty when unparsable —
    * the caller decides the fallback.
    */
  def sampleFrames(b: Array[Byte], n: Int): Seq[Array[Byte]] =
    parse(b).toSeq.flatMap { info =>
      val count = info.sampleCount
      if (count == 0 || n <= 0) Seq.empty
      else {
        val picks =
          if (n >= count) 0 until count
          else (0 until n).map(i => i * count / n)
        picks.distinct.flatMap { i =>
          val off = info.sampleOffsets(i)
          val len = info.sampleSizes(i)
          if (off >= 0 && len >= 0 && off + len <= b.length)
            Some(java.util.Arrays.copyOfRange(b, off.toInt, (off + len).toInt))
          else None
        }
      }
    }
}
