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

  // ---- mp4: a structurally-valid ISO BMFF file built box by box ----

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body
  }

  /** ftyp + mdat holding 4 known video samples + a moov whose mvhd says
    * 2500 ms and whose single `vide` track maps the samples via
    * stsz/stsc/stco — offsets computed exactly as a muxer would.
    */
  private def mp4(samples: Seq[Array[Byte]]): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0),
      "isom".getBytes("US-ASCII"))
    val mdatPayloadOffset = ftyp.length + 8 // absolute offset of sample 0
    val mdat = box("mdat", samples.flatten.toArray)
    // mvhd v0: flags, creation, modification, timescale=1000, duration=2500
    val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(1000), be32(2500))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes("US-ASCII"),
      new Array[Byte](12))
    val stsz = box("stsz", be32(0), be32(0), be32(samples.length),
      samples.map(s => be32(s.length.toLong)).flatten.toArray)
    // one run: first_chunk=1 carries all samples
    val stsc = box("stsc", be32(0), be32(1),
      be32(1), be32(samples.length.toLong), be32(1))
    val stco = box("stco", be32(0), be32(1), be32(mdatPayloadOffset.toLong))
    val stbl = box("stbl", stsz, stsc, stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", hdlr, minf)
    val trak = box("trak", mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  test("mp4 demux: mvhd duration + real sample payloads out of mdat") {
    val planted = Seq("FRAME-A", "FRAME-BB", "FRAME-CCC", "FRAME-DDDD")
      .map(_.getBytes("US-ASCII"))
    val bytes = mp4(planted)
    assert(ImageIoCodec.sniffFormat(bytes) == "mp4")
    assert(ImageIoCodec.durationMs(bytes) == 2500)
    // all samples, in order, byte-exact
    val all = Multimodal.sampleFrames(
      Seq(MediaRow(7L, bytes)).toDS(), n = 4, ImageIoCodec)
      .orderBy("frame_no")
      .as[(Long, Int, Array[Byte])].collect()
    assert(all.length == 4)
    assert(all.map(f => new String(f._3, "US-ASCII")).toSeq ==
      Seq("FRAME-A", "FRAME-BB", "FRAME-CCC", "FRAME-DDDD"))
    // subsampling picks evenly-spaced real samples, not byte strides
    val two = graft.operators.Mp4Demux.sampleFrames(bytes, 2)
      .map(new String(_, "US-ASCII"))
    assert(two == Seq("FRAME-A", "FRAME-CCC"))
    // extractMeta surfaces the real duration through the Spark pipeline
    val meta = Multimodal.extractMeta(
      Seq(MediaRow(7L, bytes)).toDS(), ImageIoCodec).collect().head
    assert(meta.format == "mp4" && meta.durationMs == 2500)
  }
}
