package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** The r17 heteroscedasticity layer: Welch's heteroscedastic ANOVA
  * (q295) and the Quade weighted-block rank test (q296), plus a direct
  * value reference for the existing Brown–Forsythe operator (q230 —
  * AuditPropSpec pins its invariances, this pins its exact value).
  * Each block checks the operator against a small-n reference
  * implementation on randomized inputs (the ClassicalCompletionSpec
  * discipline), plus the degenerate-input null contract.
  */
class KGroupRobustSpec extends SparkSpec {
  import spark.implicits._

  private def r4(v: Double) = math.floor(v * 10000 + 0.5) / 10000

  /** Interpolated median at (n-1)/2 — the groupedPercentileTable /
    * quantile_cont definition. */
  private def median(xs: Seq[Long]): Double = {
    val s = xs.sorted
    val pos = (s.length - 1) * 0.5
    val lo = s(pos.floor.toInt).toDouble
    val hi = s(pos.ceil.toInt).toDouble
    if (pos.floor == pos.ceil) lo else 0.5 * lo + 0.5 * hi
  }

  /** One-way F on given per-row values (doubles), textbook SSB/SSW. */
  private def oneWayF(groups: Map[String, Seq[Double]]): Double = {
    val n = groups.values.map(_.length).sum.toDouble
    val k = groups.size.toDouble
    val grand = groups.values.flatten.sum / n
    val ssb = groups.values.map(g =>
      g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.values.map(g => {
      val m = g.sum / g.length
      g.map(x => math.pow(x - m, 2)).sum
    }).sum
    ssb / (k - 1) / (ssw / (n - k))
  }

  test("Brown-Forsythe matches the direct median-centered F on random groups") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val k = 3 + trial
      val rows = (0 until 400).map { i =>
        val g = s"g${i % k}"
        // group-dependent spread so W is non-degenerate
        (g, (rnd.nextInt(10 + 15 * (i % k)) + 5).toLong)
      }
      val byG = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2) }
      val z = byG.map { case (g, xs) =>
        val m = median(xs)
        g -> xs.map(x => math.abs(x - m))
      }
      val expected = r4(oneWayF(z))
      val out = Quality.brownForsythe(
        rows.toDF("g", "x"), col("x"), col("g")).head()
      assert(out.getDouble(2) == expected,
        s"trial $trial: w=${out.getDouble(2)} expected $expected")
      assert(out.getLong(0) == rows.length && out.getLong(1) == k.toLong)
    }
  }

  test("Brown-Forsythe nulls on a constant corpus") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "x")
    val out = Quality.brownForsythe(df, col("x"), col("g")).head()
    assert(out.isNullAt(2) && out.isNullAt(3))
  }

  /** Direct Welch W* (Welch 1951; R oneway.test(var.equal=FALSE)). */
  private def bruteWelch(groups: Map[String, Seq[Long]]): (Double, Double) = {
    val k = groups.size.toDouble
    val stats = groups.values.toSeq.map { xs =>
      val n = xs.length.toDouble
      val m = xs.map(_.toDouble).sum / n
      val s2 = xs.map(x => math.pow(x - m, 2)).sum / (n - 1)
      (n, m, n / s2)
    }
    val wSum = stats.map(_._3).sum
    val mT = stats.map(s => s._3 * s._2).sum / wSum
    val num = stats.map(s => s._3 * math.pow(s._2 - mT, 2)).sum / (k - 1)
    val lam = stats.map(s => math.pow(1 - s._3 / wSum, 2) / (s._1 - 1)).sum
    val w = num / (1 + 2 * (k - 2) / (k * k - 1) * lam)
    val df2 = (k * k - 1) / (3 * lam)
    (w, df2)
  }

  test("Welch ANOVA matches the direct reference on random groups") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val k = 3 + trial
      val rows = (0 until 300).map { i =>
        val g = s"g${i % k}"
        (g, (rnd.nextInt(20 + 10 * (i % k)) + (i % k) * 4).toLong)
      }
      val byG = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2) }
      val (w, df2) = bruteWelch(byG)
      val out = Quality.welchAnova(
        rows.toDF("g", "x"), col("x"), col("g")).head()
      assert(out.getDouble(2) == r4(w),
        s"trial $trial: w_star=${out.getDouble(2)} expected ${r4(w)}")
      assert(out.getLong(3) == math.floor(df2 * 10000 + 0.5).toLong, "df2")
    }
  }

  test("Welch ANOVA nulls when a group has zero variance") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 3L), ("b", 9L)).toDF("g", "x")
    val out = Quality.welchAnova(df, col("x"), col("g")).head()
    assert(out.isNullAt(2) && out.isNullAt(3))
  }

  /** Direct Quade W with midranks (Conover 5.8.3 layout). */
  private def bruteQuade(blocks: Seq[Seq[Long]]): Double = {
    val k = blocks.head.length
    def midranks(xs: Seq[Long]): Seq[Double] = xs.map { x =>
      xs.count(_ < x) + (xs.count(_ == x) + 1) / 2.0
    }
    val ranges = blocks.map(b => (b.max - b.min).toDouble)
    val q = midranks(ranges.map(r => r.toLong))
    val s = blocks.zipWithIndex.map { case (b, i) =>
      midranks(b).map(r => q(i) * (r - (k + 1) / 2.0))
    }
    val a = s.flatten.map(x => x * x).sum
    val bStat = s.transpose.map(_.sum).map(x => x * x).sum / blocks.length
    (blocks.length - 1) * bStat / (a - bStat)
  }

  test("Quade matches the direct reference on random integer blocks") {
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 3) {
      val blocks = Seq.fill(80 + trial)(
        Seq.fill(3)((rnd.nextInt(5) + 1).toLong))
      val df = blocks.map(b => (b(0), b(1), b(2))).toDF("a", "b", "c")
      val out = Quality.quadeTest(df,
        Seq(col("a"), col("b"), col("c"))).head()
      // fully-tied inputs can degenerate at random — only compare live ones
      val ref = bruteQuade(blocks)
      if (!ref.isNaN && !ref.isInfinite) {
        assert(out.getDouble(2) == r4(ref),
          s"trial $trial: w=${out.getDouble(2)} expected ${r4(ref)}")
      }
      assert(out.getLong(0) == blocks.length && out.getLong(1) == 3L)
    }
  }

  /** Direct Yuen reference using the operator's exact integer algebra
    * (winsorized sums, c2w = n·W2 − W1²) so the comparison is
    * bit-for-bit, not merely close. */
  private def bruteYuenSide(xs: Seq[Long]): (Long, Long, Double, Double) = {
    val n = xs.length
    val g = n / 5
    val h = n - 2 * g
    val s = xs.sorted
    val trimmed = s.slice(g, n - g)
    val t1 = trimmed.map(BigInt(_)).sum
    val lo = BigInt(s(g)); val hi = BigInt(s(n - g - 1))
    val w1 = t1 + g * (lo + hi)
    val w2 = trimmed.map(x => BigInt(x) * x).sum + g * (lo * lo + hi * hi)
    val c2w = BigInt(n) * w2 - w1 * w1
    val d = c2w.toDouble / (n.toDouble * h.toDouble * (h.toDouble - 1))
    (n.toLong, h.toLong, t1.toDouble / h, d)
  }

  test("Yuen trimmed t matches the exact-algebra reference on random sides") {
    val rnd = new scala.util.Random(61)
    for (trial <- 1 to 3) {
      val a = Seq.fill(120 + trial)(rnd.nextInt(60).toLong)
      // heavy-tail contamination on b — the regime Yuen exists for
      val b = Seq.fill(140)(rnd.nextInt(50).toLong + 8) ++
        Seq.fill(6)(5000L + rnd.nextInt(100))
      val out = Quality.yuenTrimmedT(a.toDF("v"), b.toDF("v"), "v").head()
      val (na, ha, tma, da) = bruteYuenSide(a)
      val (nb, hb, tmb, db) = bruteYuenSide(b)
      def bp(v: Double) = math.floor(v * 10000 + 0.5).toLong
      assert(out.getLong(0) == na && out.getLong(1) == nb, "n")
      assert(out.getLong(2) == ha && out.getLong(3) == hb, "h")
      assert(out.getLong(4) == bp(tma) && out.getLong(5) == bp(tmb), "tmeans")
      assert(out.getLong(6) == bp((tma - tmb) / math.sqrt(da + db)), "t")
      assert(out.getLong(7) == bp((da + db) * (da + db) /
        (da * da / (ha - 1) + db * db / (hb - 1))), "df")
    }
  }

  test("Yuen shrugs off tail contamination that flips the raw-mean t") {
    // identical cores; b carries outliers that drag its RAW mean far
    // above a's — the trimmed means must stay put
    val a = (0 until 100).map(i => (i % 50).toLong)
    val b = (0 until 95).map(i => (i % 50).toLong) ++ Seq.fill(5)(100000L)
    val out = Quality.yuenTrimmedT(a.toDF("v"), b.toDF("v"), "v").head()
    assert(math.abs(out.getLong(4) - out.getLong(5)) < 20000,
      "trimmed means differ by < 2 tokens despite 100k outliers")
  }

  test("Quade nulls when every block is fully tied") {
    val df = Seq((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L)).toDF("a", "b", "c")
    val out = Quality.quadeTest(df, Seq(col("a"), col("b"), col("c"))).head()
    assert(out.isNullAt(2))
  }
}
