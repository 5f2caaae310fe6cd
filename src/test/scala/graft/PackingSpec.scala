package graft

import graft.operators.Packing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("packSequences: hand case — offsets, straddling, chunk ranges") {
    import spark.implicits._
    // 3+4+5 tokens, L = 4: doc 1 -> [0,3) seq 0; doc 2 -> [3,7) seqs 0-1;
    // doc 3 -> [7,12) seqs 1-2
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i j k l"),
      (4L, "   ")  // whitespace-only: dropped
    ).toDF("doc_id", "text")
    val got = Packing.packSequences(docs, seqLen = 4)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 0L, 0L, 0L),
      (2L, 4L, 3L, 0L, 1L),
      (3L, 5L, 7L, 1L, 2L)))
  }

  test("packSequences: bucketed cumsum equals a single-window reference, skewed ids") {
    import spark.implicits._
    // sparse, clustered ids: bucket sizes are wildly unequal but the
    // offsets must not care
    val rnd = new scala.util.Random(3)
    val ids = (Seq.tabulate(40)(i => 1000000L + i) ++ Seq.tabulate(40)(i => 2L * i) ++
      Seq(5000000000L, 5000000001L)).distinct
    val docs = ids.map(i => (i, Seq.fill(1 + rnd.nextInt(7))("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Packing.packSequences(docs, seqLen = 8, buckets = 7)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    val ref = docs
      .select($"doc_id",
        size(split(lower(trim($"text")), "\\s+")).cast("long").as("n"))
      .withColumn("s", coalesce(sum($"n").over(
        Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"n", $"s",
        expr("s div 8").as("f"), expr("(s + n - 1) div 8").as("l"))
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == ref)
    // deterministic replay
    val again = Packing.packSequences(docs, seqLen = 8, buckets = 7)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("packSequences: contiguous token stream — no gaps, no overlaps") {
    import spark.implicits._
    val docs = Tables(spark, sf(), "documents")
    val got = Packing.packSequences(docs, seqLen = 128)
      .orderBy($"doc_id").as[(Long, Long, Long, Long, Long)].collect()
    var expect = 0L
    got.foreach { case (_, n, start, f, l) =>
      assert(start == expect, "each doc starts where the previous ended")
      assert(f == start / 128 && l == (start + n - 1) / 128)
      expect = start + n
    }
    assert(expect == got.map(_._2).sum)
  }
}
