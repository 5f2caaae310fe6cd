package graft

import graft.store.LogStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpStore() = new LogStore(
    Files.createTempDirectory("graft-compact").toString)

  test("compact collapses per-epoch small files, preserving the exact row multiset") {
    val store = tmpStore()
    // 6 micro-batch epochs -> 6 batch_id partitions of small files
    (0 until 6).foreach { e =>
      val df = Seq.tabulate(10)(i =>
        (s"m$e-$i", s"c${i % 3}", "2024-01-01")).toDF("message", "correlation_id", "date")
      store.appendIdempotent("logs", df, "w", batchId = e.toLong)
    }
    val before = store.fileStats(spark, "logs")
    assert(before.head._2 >= 6, s"expected >=6 files, got ${before.head._2}")
    val rowsBefore = store.read(spark, "logs")
      .select("message", "correlation_id", "date").as[(String, String, String)]
      .collect().sorted.toSeq

    val (nBefore, nAfter, rows) = store.compact(spark, "logs", "2024-01-01")
    assert(nBefore == before.head._2)
    assert(nAfter == 1) // tiny bytes -> one right-sized file
    assert(rows == 60)
    val after = store.fileStats(spark, "logs")
    assert(after.head._2 == 1)

    val rowsAfter = store.read(spark, "logs")
      .select("message", "correlation_id", "date").as[(String, String, String)]
      .collect().sorted.toSeq
    assert(rowsAfter == rowsBefore)
    // layout depth stays uniform: the compacted date still has a batch_id
    // partition level, so discovery keeps working alongside uncompacted dates
    assert(store.read(spark, "logs").columns.contains("batch_id"))
  }

  test("compact touches only the named date; other dates keep their files") {
    val store = tmpStore()
    Seq("2024-01-01", "2024-01-02").foreach { d =>
      (0 until 3).foreach { e =>
        val df = Seq((s"m-$d-$e", "c1", d)).toDF("message", "correlation_id", "date")
        store.appendIdempotent("logs", df, "w", batchId = (if (d.endsWith("01")) e else 100 + e).toLong)
      }
    }
    store.compact(spark, "logs", "2024-01-01")
    val stats = store.fileStats(spark, "logs").map { case (d, n, _) => (d, n) }.toMap
    assert(stats("2024-01-01") == 1)
    assert(stats("2024-01-02") == 3)
    assert(store.read(spark, "logs").count() == 6)
  }

  test("targetFileBytes controls the output file count") {
    val store = tmpStore()
    val df = Seq.tabulate(5000)(i => (s"msg-$i-${"x" * 50}", s"c$i", "2024-01-01"))
      .toDF("message", "correlation_id", "date")
    store.appendIdempotent("logs", df, "w", 0L)
    // force a multi-file rewrite with a tiny target
    val (_, nAfter, rows) = store.compact(spark, "logs", "2024-01-01", targetFileBytes = 16 * 1024)
    assert(rows == 5000)
    assert(nAfter > 1)
    assert(store.fileStats(spark, "logs").head._2 == nAfter)
  }
}
