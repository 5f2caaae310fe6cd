package graft

import graft.functions.{ExprKernels, JaroWinkler}
import graft.operators.EditJoin
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler: textbook values, the boost-threshold and prefix-cap
  * edges, kernel symmetry/bounds, and block-join equality with the
  * brute-force quadratic join.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    ExprKernels.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values (the DuckDB-validated contract)") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(jw("jellyfish", "smellyfish") == jw("smellyfish", "jellyfish"))
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0 && jw("", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no cross-position matches
  }

  test("boost threshold: no prefix bonus at jaro <= 0.7") {
    // common prefix "ab" but jaro 0.5185 -> bonus suppressed
    assert(math.abs(jw("abquuuuuu", "abzzzz") - 0.5185185185185185) < 1e-15)
  }

  test("prefix bonus caps at 4 characters") {
    // 5 shared leading chars, bonus uses l = 4
    assert(math.abs(jw("aaaaab", "aaaaac") - 0.9333333333333333) < 1e-15)
  }

  test("kernel is symmetric and bounded on random pairs") {
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(10)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(10)).mkString
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == jw(b, a))
    }
  }

  test("blocked join equals brute force within blocks") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamna"),
      (3L, "alpha beta delta"), (4L, "zeta eta theta"),
      (5L, "zeta eta thetaa")).toDF("id", "name")
    val got = EditJoin.jaroWinklerJoin(df, "id", "name", tau = 0.9,
      blockKey = s => element_at(split(lower(trim(s)), "\\s+"), 1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over ALL pairs sharing the first token
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (i1, s1) <- rows; (i2, s2) <- rows
      if i1 < i2 && s1.split("\\s+")(0) == s2.split("\\s+")(0)
      if jw(s1, s2) >= 0.9
    } yield (i1, i2)).toSet
    assert(got == brute && got.contains((1L, 2L)) && got.contains((4L, 5L)))
  }

  test("pairs across blocks are never compared") {
    val df = Seq((1L, "aaa x"), (2L, "aab x")).toDF("id", "name")
    // jw("aaa x","aab x") = high, but first tokens differ -> no pair
    val got = EditJoin.jaroWinklerJoin(df, "id", "name", tau = 0.5,
      blockKey = s => element_at(split(lower(trim(s)), "\\s+"), 1))
    assert(got.count() == 0L)
  }

  test("expression is codegen-compatible in a plan") {
    val df = Seq(("martha", "marhta")).toDF("a", "b")
      .select(JaroWinkler.jaro_winkler(col("a"), col("b")).as("s"))
    assert(math.abs(df.head().getDouble(0) - 0.9611111111111111) < 1e-15)
  }
}
