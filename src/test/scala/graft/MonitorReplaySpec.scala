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

  test("sprt replay matches a driver-side fold with decision resets") {
    val out = MonitorReplay.sprtReplay(spark, sf()).collect().toSeq
    assert(out.nonEmpty)
    val ev = Tables(spark, sf(), "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull)
      .withColumn("d", floor(unix_millis(col("ts")) / DayMs).cast("long"))
    val cut = ev.agg(min(col("d"))).head().getLong(0) + 7
    val daily = ev.filter(col("d") >= cut)
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") >= 20.0, 1L).otherwise(0L)).as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._2, t._3, t._4)).toSeq).toMap
    val (wp, wf) = (MonitorReplay.SprtWPass, MonitorReplay.SprtWFail)
    val (up, lo) = (MonitorReplay.SprtUpper, MonitorReplay.SprtLower)
    var sawReset = false
    daily.foreach { case (tpe, days) =>
      var accN = 0L; var accK = 0L
      val expected = days.dropRight(1).map { case (day, n, k) =>
        accN += n; accK += k
        val l = accK * wp + (accN - accK) * wf
        val dec = if (l >= up) "reject_h0"
          else if (l <= lo) "accept_h0" else "continue"
        val row = (day * DayMs, accN, accK,
          math.floor(l * 10000 + 0.5) / 10000, dec)
        if (dec != "continue") { accN = 0L; accK = 0L; sawReset = true }
        row
      }
      val got = out.filter(_.getString(0) == tpe)
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getString(5)))
      assert(got == expected, s"$tpe: $got vs $expected")
    }
    assert(sawReset, "parameters must exercise at least one decision reset")
  }

  test("label-family replays share the emission spine; values are sane") {
    val pr = MonitorReplay.precisionReplay(spark, sf()).collect().toSeq
    val au = MonitorReplay.aucReplay(spark, sf()).collect().toSeq
    val ca = MonitorReplay.calibrationReplay(spark, sf()).collect().toSeq
    val cf = MonitorReplay.conformalReplay(spark, sf()).collect().toSeq
    // same slice, same state machine family: identical (source, window)
    // spines; n_events decomposes as tp+fp+fn+tn = n_pos+n_neg = n
    def sw(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(1)))
    assert(sw(au) == sw(pr) && sw(ca) == sw(pr) && sw(cf) == sw(pr))
    pr.zip(au).zip(ca).foreach { case ((p, a), c) =>
      assert(a.getLong(2) + a.getLong(3) == c.getLong(2),
        "auc pos+neg must equal calibration n on the same window")
      assert(p.getLong(2) >= p.getLong(3) + p.getLong(4) + p.getLong(5),
        "confusion cells cannot exceed n_events")
    }
    cf.foreach { r =>
      val cov = r.getDouble(4)
      assert(cov >= 0.0 && cov <= 1.0 &&
        cov == r.getLong(3).toDouble / r.getLong(2))
    }
    // psi: non-negative, 4-digit rounded, cumulative converges on the
    // reference mix as windows accumulate (last cum <= first cum + 1)
    val ps = MonitorReplay.scoreDriftReplay(spark, sf()).collect().toSeq
    assert(sw(ps) == sw(pr))
    ps.foreach { r => assert(r.getDouble(3) >= 0.0) }
  }

  test("parity replay: gap equals a driver-side fold of the group ledger") {
    val out = MonitorReplay.parityReplay(spark, sf()).collect().toSeq
    assert(out.nonEmpty)
    val ev = Tables(spark, sf(), "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("value").isNotNull && col("user_id").isNotNull)
      .withColumn("d", floor(unix_millis(col("ts")) / DayMs).cast("long"))
    val cut = ev.agg(min(col("d"))).head().getLong(0) + 7
    val cells = ev.filter(col("d") >= cut)
      .withColumn("grp", when(col("user_id") % 4 <= 2,
        concat(lit("g"), (col("user_id") % 4).cast("string")))
        .otherwise(lit("__other__")))
      .groupBy(col("event_type"), col("d"), col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") >= 30.0, 1L).otherwise(0L)).as("np"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getString(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def bp(np: Long, n: Long) = math.floor(np.toDouble / n * 10000 + 0.5).toLong
    out.foreach { r =>
      val key = (r.getString(0), r.getLong(1) / DayMs)
      val rates = cells(key).map { case (g, n, np) => (bp(np, n), g) }
      val mx = rates.map(_._1).max; val mn = rates.map(_._1).min
      assert(r.getLong(4) == mx - mn, s"$key gap")
      assert(r.getString(5) == rates.filter(_._1 == mx).map(_._2).min, s"$key maxg")
      assert(r.getString(6) == rates.filter(_._1 == mn).map(_._2).min, s"$key ming")
      assert(r.getLong(3) == rates.size, s"$key active")
    }
  }

  test("js replay tokens count 2 per non-null props; quality replay " +
    "matches batch conditional counts") {
    val js = MonitorReplay.jsDriftReplay(spark, sf()).collect().toSeq
    assert(js.nonEmpty)
    js.foreach { r =>
      val v = r.getDouble(3)
      assert(v >= 0.0 && v == math.floor(v * 10000 + 0.5) / 10000)
    }
    val qm = MonitorReplay.qualityReplay(spark, sf()).collect().toSeq
    assert(qm.nonEmpty && qm.size % 4 == 0,
      "four constraint rows per closed window")
    val ev = Tables(spark, sf(), "events").filter(col("ts").isNotNull)
      .withColumn("d", floor(unix_millis(col("ts")) / DayMs).cast("long"))
    qm.filter(_.getString(1) == "in_set(event_type)").foreach { r =>
      val d = r.getLong(0) / DayMs
      val expect = ev.filter(col("d") === d)
        .agg(sum(when(col("event_type").isNotNull &&
          !col("event_type").isin("click", "view", "signup"), 1L)
          .otherwise(0L)), count(lit(1))).head()
      assert(r.getLong(3) == expect.getLong(0) && r.getLong(4) == expect.getLong(1),
        s"day $d in_set violations/checked")
    }
  }

  test("transition replay bridges the two-batch split with no lost pair") {
    val out = SparkEntry.queries("q318_transition_replay")(spark, sf())
      .collect().toSeq
    assert(out.nonEmpty)
    val ev = Tables(spark, sf(), "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull &&
        col("user_id").isNotNull && col("event_id").isNotNull)
    // every user's N events yield exactly N-1 transitions — if the
    // LastEvent state failed to bridge the batch boundary, each user
    // would lose the pair spanning it and this ledger would come up short
    val perUser = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairTotals = out.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(3)).sum).toMap
    perUser.foreach { case (u, n) =>
      assert(pairTotals.getOrElse(u, 0L) == n - 1,
        s"user $u: ${pairTotals.getOrElse(u, 0L)} pairs from $n events")
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
