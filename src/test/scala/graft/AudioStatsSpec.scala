package graft

import graft.operators.Multimodal
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Windowed audio RMS/silence on real 16-bit PCM WAVs: sine RMS ~ A/sqrt(2),
  * silence detection, half-silent clips, and junk-byte rejection.
  */
class AudioStatsSpec extends SparkSpec {
  import spark.implicits._

  private val Rate = 8000f

  private def wav(samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(i * 2) = (s & 0xFF).toByte
      bytes(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(Rate, 16, 1, true, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def sine(seconds: Double, amp: Double, hz: Double = 440): Array[Short] =
    Array.tabulate((Rate * seconds).toInt)(i =>
      (amp * 32767 * math.sin(2 * math.Pi * hz * i / Rate)).toShort)

  private def silence(seconds: Double): Array[Short] =
    Array.fill((Rate * seconds).toInt)(0.toShort)

  test("sine RMS approximates amplitude over sqrt(2); peak hits amplitude") {
    val st = Multimodal.audioStats(wav(sine(1.0, 0.5))).get
    assert(math.abs(st.rmsMean - 0.5 / math.sqrt(2)) < 0.01, st.rmsMean)
    assert(math.abs(st.peak - 0.5) < 0.01)
    assert(st.silenceFrac == 0.0)
    assert(st.durationMs == 1000L && st.nWindows == 10L)
  }

  test("pure silence scores silence fraction 1.0") {
    val st = Multimodal.audioStats(wav(silence(1.0))).get
    assert(st.silenceFrac == 1.0 && st.rmsMean == 0.0 && st.peak == 0.0)
  }

  test("half-silent clips split the fraction") {
    val st = Multimodal.audioStats(wav(sine(1.0, 0.5) ++ silence(1.0))).get
    assert(st.silenceFrac == 0.5, st.silenceFrac)
    assert(st.nWindows == 20L)
  }

  test("junk bytes return None; distributed op drops them") {
    assert(Multimodal.audioStats("not audio".getBytes).isEmpty)
    val df = Seq(
      (1L, wav(sine(0.5, 0.3))), (2L, "junk".getBytes)).toDF("id", "media")
    val out = Multimodal.extractAudioStats(
      Multimodal.asMedia(df, "id", "media")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    assert(out.head.getLong(1) == 500L)
  }
}
