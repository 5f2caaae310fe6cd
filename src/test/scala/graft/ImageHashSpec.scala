package graft

import graft.operators.Multimodal
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Perceptual image hashing on real PNGs: hash stability under small
  * noise, separation of different images, dHash brightness robustness,
  * and banded-join equality with brute force.
  */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def gray(v: Int): Int = (v << 16) | (v << 8) | v

  // structurally distinct pattern per seed: stripe direction, period, and
  // a dark quadrant all rotate with the seed
  private def base(seed: Int): Array[Byte] = png(64, 64) { (x, y) =>
    val period = 8 + (seed % 5) * 6
    val stripe = (seed / 5) % 3 match {
      case 0 => (x / period) % 2 == 0
      case 1 => (y / period) % 2 == 0
      case _ => ((x + y) / period) % 2 == 0
    }
    val quad = (seed % 4) match {
      case 0 => x < 32 && y < 32
      case 1 => x >= 32 && y < 32
      case 2 => x < 32 && y >= 32
      case _ => x >= 32 && y >= 32
    }
    if (quad) gray(15) else if (stripe) gray(220) else gray(80)
  }

  private def noised(seed: Int, flips: Int): Array[Byte] = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(base(seed)))
    val rnd = new scala.util.Random(42)
    (0 until flips).foreach { _ =>
      img.setRGB(rnd.nextInt(64), rnd.nextInt(64), gray(rnd.nextInt(255)))
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("identical bytes hash identically; small noise moves few bits") {
    val h0 = Multimodal.aHash64(base(1))
    assert(h0 == Multimodal.aHash64(base(1)))
    assert(h0 != 0L)
    val hn = Multimodal.aHash64(noised(1, 30))
    assert(ham(h0, hn) <= 6, s"noise moved ${ham(h0, hn)} bits")
  }

  test("different images sit far apart") {
    val seeds = Seq(0, 1, 2, 5, 6, 7)
    val ds = seeds.map(s => Multimodal.aHash64(base(s)))
    for (i <- ds.indices; j <- i + 1 until ds.length)
      assert(ham(ds(i), ds(j)) > 6, s"$i~$j at ${ham(ds(i), ds(j))}")
  }

  test("dHash survives a global brightness shift better than aHash") {
    val bright = png(64, 64) { (x, y) => gray(((x * 2 + y) % 200 + 55)) }
    val dark = png(64, 64) { (x, y) => gray(((x * 2 + y) % 200 + 30)) }
    val d = ham(Multimodal.dHash64(bright), Multimodal.dHash64(dark))
    assert(d <= 4, s"dHash moved $d bits under brightness shift")
  }

  test("non-decodable bytes hash to 0 and never pair") {
    assert(Multimodal.aHash64("not an image".getBytes) == 0L)
    val rows = Seq((1L, "junk one".getBytes), (2L, "junk two".getBytes))
      .toDF("id", "media")
    val out = Multimodal.imageNearDupPairs(Multimodal.asMedia(rows, "id", "media"))
    assert(out.count() == 0L)
  }

  test("banded near-dup join equals brute force") {
    val seeds = Seq(0, 1, 2, 5, 6, 7)
    val images = seeds.zipWithIndex.map { case (s, i) => (i.toLong * 2, base(s)) } ++
      seeds.zipWithIndex.map { case (s, i) => (i.toLong * 2 + 1, noised(s, 25)) }
    val df = images.toDF("id", "media")
    val got = Multimodal.imageNearDupPairs(
      Multimodal.asMedia(df, "id", "media"), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashes = images.map { case (id, b) => id -> Multimodal.aHash64(b) }
    val brute = (for {
      (i1, h1) <- hashes; (i2, h2) <- hashes
      if i1 < i2 && h1 != 0 && h2 != 0 && ham(h1, h2) <= 6
    } yield (i1, i2)).toSet
    assert(got == brute)
    // every original pairs with its own noised twin
    seeds.indices.foreach(i => assert(got.contains((i.toLong * 2, i.toLong * 2 + 1))))
  }
}
