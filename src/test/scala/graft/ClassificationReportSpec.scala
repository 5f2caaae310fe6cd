package graft

import graft.operators.Quality

/** Per-class P/R/F1 report: hand-computed values, zero-denominator
  * classes, the perfect-prediction identity, and class-universe coverage.
  */
class ClassificationReportSpec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: (String, String)*) =
    Quality.classificationReport(
      pairs.toSeq.toDF("label", "pred"), "label", "pred")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

  test("hand-computed report") {
    val out = run(("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"), ("b", "a"))
    assert(out("a") == ((3L, 2L, 0.6667, 0.6667, 0.6667)))
    assert(out("b") == ((2L, 1L, 0.5, 0.5, 0.5)))
  }

  test("a class never predicted has precision 0; never labeled has recall 0") {
    val out = run(("c", "a"), ("a", "a"))
    assert(out("c") == ((1L, 0L, 0.0, 0.0, 0.0)))
    // "a": labeled once (tp 1), predicted twice -> p 0.5, r 1.0, f1 0.6667
    assert(out("a") == ((1L, 1L, 0.5, 1.0, 0.6667)))
  }

  test("perfect predictions score 1.0 everywhere") {
    val out = run(("x", "x"), ("y", "y"), ("y", "y"))
    assert(out("x") == ((1L, 1L, 1.0, 1.0, 1.0)))
    assert(out("y") == ((2L, 2L, 1.0, 1.0, 1.0)))
  }

  test("the class universe is labels UNION predictions") {
    val out = run(("a", "zzz"))
    assert(out.keySet == Set("a", "zzz"))
    assert(out("zzz") == ((0L, 0L, 0.0, 0.0, 0.0)))
  }
}
