package graft

import graft.operators.Quality
import graft.streaming.MonitorReplay
import org.apache.spark.sql.functions._

/** The monitor-replay harness (q302–q305): deterministic emission
  * (all-but-last window per source, stable across runs), the 7-day
  * calibration split, and window-for-window parity with the BATCH
  * operators on the replayed slices — the properties the DuckDB oracle
  * then re-pins value-for-value at the gate.
  */
class MonitorReplaySpec extends SparkSpec {

  private val DayMs = 86400000L

  test("replays are deterministic and emit all-but-last window per source") {
    val a = MonitorReplay.spreadReplay(spark, sf()).collect().toSeq
    val b = MonitorReplay.spreadReplay(spark, sf()).collect().toSeq
    assert(a == b, "two replays of the same slice must be identical")
    assert(a.nonEmpty)
    // emitted windows per source = observed stream days minus the open one
    val ev = Tables(spark, sf(), "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .withColumn("d", floor(unix_millis(col("ts")) / DayMs).cast("long"))
    val cut = ev.agg(min(col("d"))).head().getLong(0) + 7
    val perSource = ev.filter(col("d") >= cut)
      .groupBy(col("event_type")).agg(countDistinct(col("d")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val emitted = a.groupBy(_.getString(0)).view.mapValues(_.size).toMap
    // a window with n < 2 stays silent; with sf0.001's ~6 events/day/type
    // every closed window passes that bar, so the count is exact
    perSource.foreach { case (src, nd) =>
      assert(emitted.getOrElse(src, 0) == (nd - 1).toInt,
        s"$src: expected ${nd - 1} closed windows, got ${emitted.get(src)}")
    }
  }

  test("spread replay rows equal the batch varianceRatioTest per window") {
    val out = MonitorReplay.spreadReplay(spark, sf()).collect().toSeq
    val ev = Tables(spark, sf(), "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .withColumn("d", floor(unix_millis(col("ts")) / DayMs).cast("long"))
      .withColumn("v", floor(col("value") + 0.5).cast("long"))
    val cut = ev.agg(min(col("d"))).head().getLong(0) + 7
    val ref = ev.filter(col("d") < cut).select(col("v"))
    // spot-check the first three emitted rows against the batch operator
    out.take(3).foreach { r =>
      val src = r.getString(0)
      val day = r.getLong(1) / DayMs
      val winRows = ev.filter(col("d") >= cut && col("event_type") === src &&
        col("d") === day).select(col("v"))
      val f = Quality.varianceRatioTest(winRows, ref, "v")
        .select(col("f")).head().getDouble(0)
      assert(r.getDouble(3) == f,
        s"$src day $day: replay ${r.getDouble(3)} vs batch $f")
    }
  }

  test("page-hinkley replay matches a driver-side fold of the daily counts") {
    val out = MonitorReplay.pageHinkleyReplay(spark, sf()).collect().toSeq
    assert(out.nonEmpty)
    val ev = Tables(spark, sf(), "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .withColumn("d", floor(unix_millis(col("ts")) / DayMs).cast("long"))
    val cut = ev.agg(min(col("d"))).head().getLong(0) + 7
    val refFit = ev.filter(col("d") < cut)
      .agg(count(lit(1)), countDistinct(col("event_type"))).head()
    val mu = math.floor(refFit.getLong(0).toDouble / (7.0 * refFit.getLong(1)))
    val daily = ev.filter(col("d") >= cut)
      .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._2, t._3))).toMap
    daily.foreach { case (tpe, days) =>
      var mUp = 0.0; var minUp = 0.0; var mDn = 0.0; var minDn = 0.0
      val expected = days.dropRight(1).map { case (day, c) =>
        mUp += c - mu - 1.0; minUp = math.min(minUp, mUp)
        mDn += mu - c - 1.0; minDn = math.min(minDn, mDn)
        (day, c, mUp - minUp, mDn - minDn)
      }
      val got = out.filter(_.getString(0) == tpe)
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      assert(got == expected.toSeq, s"$tpe: $got vs ${expected.toSeq}")
    }
  }

  test("cusum replay matches a driver-side max(0,·) fold of the daily counts") {
    val out = MonitorReplay.cusumReplay(spark, sf()).collect().toSeq
    assert(out.nonEmpty)
    val ev = Tables(spark, sf(), "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .withColumn("d", floor(unix_millis(col("ts")) / DayMs).cast("long"))
    val cut = ev.agg(min(col("d"))).head().getLong(0) + 7
    val refFit = ev.filter(col("d") < cut)
      .agg(count(lit(1)), countDistinct(col("event_type"))).head()
    val mu = math.floor(refFit.getLong(0).toDouble / (7.0 * refFit.getLong(1)))
    val daily = ev.filter(col("d") >= cut)
      .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._2, t._3))).toMap
    daily.foreach { case (tpe, days) =>
      // the literal recursion, NOT the oracle's prefix-sum identity —
      // so spec and oracle pin the monitor through different algebra
      var su = 0.0; var sd = 0.0
      val expected = days.dropRight(1).map { case (day, c) =>
        su = math.max(0.0, su + (c - mu - 2.0))
        sd = math.max(0.0, sd + (mu - c - 2.0))
        (day, c, su, sd)
      }
      val got = out.filter(_.getString(0) == tpe)
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      assert(got == expected.toSeq, s"$tpe: $got vs ${expected.toSeq}")
    }
  }

  test("ks and w1 replays share the histogram family's emission spine") {
    val k = MonitorReplay.kuiperReplay(spark, sf()).collect().toSeq
    val ks = MonitorReplay.ksReplay(spark, sf()).collect().toSeq
    val w1 = MonitorReplay.w1Replay(spark, sf()).collect().toSeq
    def spine(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(spine(ks) == spine(k) && spine(w1) == spine(k))
    // KS D <= Kuiper V window-for-window (V is the SUM of the one-sided
    // sups, D the larger) — rounding moves each by < 1e-4
    ks.zip(k).foreach { case (d, v) =>
      assert(d.getDouble(3) <= v.getDouble(3) + 2e-4,
        s"${d.getString(0)} @ ${d.getLong(1)}: D ${d.getDouble(3)} > V ${v.getDouble(3)}")
    }
    // every W1 is a rounded non-negative bin-index distance < bins
    w1.foreach { r =>
      val x = r.getDouble(3)
      assert(x >= 0.0 && x < 7.0 && x == math.floor(x * 10000 + 0.5) / 10000)
    }
  }

  test("kuiper and cvm replays agree on emission and n_events") {
    val k = MonitorReplay.kuiperReplay(spark, sf()).collect().toSeq
    val c = MonitorReplay.cvmReplay(spark, sf()).collect().toSeq
    // same state machine, same slice — the (source, window, n) spines
    // must be identical; only the emitted statistic differs
    assert(k.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ==
      c.map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
    assert(k.nonEmpty)
    // every kuiper V is a rounded value in [0, 2]
    k.foreach { r =>
      val v = r.getDouble(3)
      assert(v >= 0.0 && v <= 2.0 && v == math.floor(v * 10000 + 0.5) / 10000)
    }
  }
}
