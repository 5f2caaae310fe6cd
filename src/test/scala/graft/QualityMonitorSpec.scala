package graft

import graft.operators.Quality._
import graft.streaming.QualityMonitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class QRow(ts: Timestamp, lang: String, n: Option[Long])

class QualityMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("windowed violation counts per constraint, across windows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[QRow]
    val mon = QualityMonitor.monitor(
      stream.toDS().toDF(), Seq(NotNull("lang"), InRange("n", 0, 100)),
      tsCol = "ts", windowDuration = "1 minute")
    val q = mon.writeStream.format("memory")
      .queryName("qmon_out").outputMode("complete").start()
    try {
      val t0 = 1700000040000L // minute-aligned: exactly a window A start
      val t1 = t0 + 60000L    // window B
      stream.addData(
        QRow(new Timestamp(t0), "en", Some(5L)),
        QRow(new Timestamp(t0 + 1000), null, Some(50L)),
        QRow(new Timestamp(t0 + 2000), "de", Some(999L)))
      q.processAllAvailable()
      stream.addData(
        QRow(new Timestamp(t1), "fr", None),
        QRow(new Timestamp(t1 + 1000), "es", Some(-1L)))
      q.processAllAvailable()
      val got = spark.table("qmon_out")
        .as[(Timestamp, String, Boolean, Long, Long)]
        .collect().sortBy(r => (r._1.getTime, r._2)).toSeq
      assert(got.map(r => (r._1.getTime, r._2, r._3, r._4, r._5)) == Seq(
        (t0, "in_range(n)", false, 1L, 3L), // 999 out of range
        (t0, "not_null(lang)", false, 1L, 3L),
        (t1, "in_range(n)", false, 1L, 2L), // -1; NULL n does not violate
        (t1, "not_null(lang)", true, 0L, 2L)))
    } finally q.stop()
  }

  test("Unique is rejected on the stream with a pointer to incrementalDedup") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[QRow]
    val e = intercept[IllegalArgumentException] {
      QualityMonitor.monitor(stream.toDS().toDF(), Seq(Unique("lang")))
    }
    assert(e.getMessage.contains("incrementalDedup"))
  }
}
