package graft

import graft.streaming.StreamAggregates
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.round
import java.sql.Timestamp

class StreamAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("timeBucketCounts: tumbling windows in batch mode (backfill path)") {
    val logs = Seq(
      (ts("2024-01-01 10:05:00"), "a"),
      (ts("2024-01-01 10:55:00"), "b"),
      (ts("2024-01-01 11:05:00"), "c")
    ).toDF("time", "message")
    val got = StreamAggregates.timeBucketCounts(logs)
      .orderBy("bucket_start")
      .select($"bucket_start", $"n").as[(Timestamp, Long)].collect().toSeq
    assert(got == Seq((ts("2024-01-01 10:00:00"), 2L), (ts("2024-01-01 11:00:00"), 1L)))
  }

  test("sessionize: gap-based sessions per correlation id (batch mode)") {
    val logs = Seq(
      (ts("2024-01-01 10:00:00"), "cid1"),
      (ts("2024-01-01 10:10:00"), "cid1"), // within 30m gap -> same session
      (ts("2024-01-01 12:00:00"), "cid1"), // > gap -> new session
      (ts("2024-01-01 10:00:00"), "cid2")
    ).toDF("time", "correlation_id")
    val got = StreamAggregates.sessionize(logs)
      .orderBy("correlation_id", "session_start")
      .select($"correlation_id", $"n_events").as[(String, Long)].collect().toSeq
    assert(got == Seq(("cid1", 2L), ("cid1", 1L), ("cid2", 1L)))
  }

  test("windowedDistinctUsers: sketch counts distincts per window (batch backfill)") {
    val logs = Seq(
      (ts("2024-01-01 10:05:00"), 1L), (ts("2024-01-01 10:15:00"), 1L),
      (ts("2024-01-01 10:25:00"), 2L), (ts("2024-01-01 10:35:00"), 3L),
      (ts("2024-01-01 11:05:00"), 1L)
    ).toDF("time", "user_id")
    val got = StreamAggregates.windowedDistinctUsers(logs)
      .orderBy("bucket_start")
      .select($"approx_users").as[Long].collect().toSeq
    // HLL++ is exact at these cardinalities (sparse mode)
    assert(got == Seq(3L, 1L))
  }

  test("streaming: windowedDistinctUsers merges sketch state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val q = StreamAggregates.windowedDistinctUsers(
      stream.toDS().toDF("time", "user_id"))
      .writeStream.format("memory").queryName("wdu")
      .outputMode("update").start()
    try {
      stream.addData((ts("2024-01-01 10:05:00"), 1L), (ts("2024-01-01 10:10:00"), 2L))
      q.processAllAvailable()
      stream.addData((ts("2024-01-01 10:20:00"), 2L), (ts("2024-01-01 10:30:00"), 3L))
      q.processAllAvailable()
      val latest = spark.table("wdu")
        .orderBy($"bucket_start", $"approx_users".desc)
        .select($"approx_users").as[Long].collect()
      // update mode emits per batch; the final window state counts 3 users
      assert(latest.max == 3L)
    } finally q.stop()
  }

  test("streaming: windowed counts accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val counts = StreamAggregates.timeBucketCounts(
      stream.toDF().toDF("time", "message"), bucket = "1 hour")
    val q = counts.writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      stream.addData((ts("2024-01-01 10:05:00"), "a"))
      stream.addData((ts("2024-01-01 10:20:00"), "b"), (ts("2024-01-01 11:01:00"), "c"))
      q.processAllAvailable()
      val got = spark.table("win_counts").orderBy("bucket_start")
        .select($"n").as[Long].collect().toSeq
      assert(got == Seq(2L, 1L))
    } finally q.stop()
  }

  test("streaming: intervalJoin matches right events within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, String)]
    val errors = MemoryStream[(Timestamp, String)]
    val joined = StreamAggregates.intervalJoin(
      clicks.toDF().toDF("time", "user"),
      errors.toDF().toDF("r_time", "user"),
      keyCol = "user", within = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ijoin")
      .outputMode("append").start()
    try {
      clicks.addData((ts("2024-01-01 10:00:00"), "u1"), (ts("2024-01-01 10:00:00"), "u2"))
      errors.addData(
        (ts("2024-01-01 10:05:00"), "u1"),  // within 10 min -> match
        (ts("2024-01-01 10:20:00"), "u1"),  // outside -> no match
        (ts("2024-01-01 09:59:00"), "u2"))  // before the click -> no match
      // advance both watermarks so results flush in append mode (distinct
      // keys so the advancer rows can't join with anything)
      clicks.addData((ts("2024-01-01 12:00:00"), "wm-l"))
      errors.addData((ts("2024-01-01 12:00:00"), "wm-r"))
      q.processAllAvailable()
      val got = spark.table("ijoin")
        .select($"user", $"r_time").as[(String, Timestamp)].collect().toSet
      assert(got == Set(("u1", ts("2024-01-01 10:05:00"))))
    } finally q.stop()
  }

  test("streaming: dedupFirstSeen drops redelivered keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val deduped = StreamAggregates.dedupFirstSeen(
      stream.toDF().toDF("time", "fp"), Seq("fp"))
    val q = deduped.writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      stream.addData((ts("2024-01-01 10:00:00"), "k1"), (ts("2024-01-01 10:00:01"), "k1"))
      stream.addData((ts("2024-01-01 10:00:02"), "k1"), (ts("2024-01-01 10:00:00"), "k2"))
      q.processAllAvailable()
      val got = spark.table("deduped").select($"fp").as[String].collect().toSeq
      assert(got.sorted == Seq("k1", "k2"))
    } finally q.stop()
  }

  test("streaming: incrementalDedup flags corpus dups and drops stream re-deliveries") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "already in the corpus")).toDF("doc_id", "text")
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StreamAggregates.incrementalDedup(
      stream.toDF().toDF("time", "doc_id", "text"), corpus)
    val q = out.writeStream.format("memory").queryName("incdedup")
      .outputMode("append").start()
    try {
      stream.addData(
        (ts("2024-01-01 10:00:00"), 10L, "ALREADY  in the corpus"), // corpus dup (normalized)
        (ts("2024-01-01 10:00:01"), 11L, "brand new document"))
      stream.addData(
        (ts("2024-01-01 10:00:02"), 12L, "brand new document"),     // stream re-delivery
        (ts("2024-01-01 10:00:03"), 13L, "also new"))
      q.processAllAvailable()
      val got = spark.table("incdedup")
        .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
      assert(got == Map(10L -> false, 11L -> true, 13L -> true)) // 12 never emitted
    } finally q.stop()
  }

  test("streaming: mixtureResample against a static reference is stateless and batch-identical") {
    implicit val sqlCtx = spark.sqlContext
    // reference mixture: big 60x8 tokens, small 3x2 -> big downsampled, small kept
    val ref = ((0L until 60L).map(i => (i, "t t t t t t t t", "big")) ++
      Seq((100L, "s s", "small"), (101L, "s s", "small"), (102L, "s s", "small")))
      .toDF("doc_id", "text", "source")
    val rows = (200L until 230L).map(i => (i, "t t t t t t t t", "big")) :+
      ((300L, "s s", "small"))
    val stream = MemoryStream[(Long, String, String)]
    val out = graft.operators.CorpusAnalytics.mixtureResample(
      stream.toDF().toDF("doc_id", "text", "source"), "source", reference = Some(ref))
    val q = out.writeStream.format("memory").queryName("resampled")
      .outputMode("append").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("resampled").select($"doc_id").as[Long].collect().toSet
      val batch = graft.operators.CorpusAnalytics.mixtureResample(
        rows.toDF("doc_id", "text", "source"), "source", reference = Some(ref))
        .select($"doc_id").as[Long].collect().toSet
      assert(got == batch, "stream and batch must make identical keep decisions")
      assert(got.contains(300L) && got.size < 31, "small kept, big downsampled")
    } finally q.stop()
  }

  test("streaming: importanceScorer scores a live stream statelessly, operator-identical") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((10L, "alpha beta alpha"), (11L, "omega psi"), (12L, "alpha omega"))
    val docs = rows.toDF("doc_id", "text")
    val target = Seq((1L, "alpha alpha beta beta")).toDF("doc_id", "text")
    // model built on the SAME (target, raw) frames the batch operator
    // uses, so the raw log weights must agree exactly
    val score = graft.operators.CorpusAnalytics.importanceScorer(target, docs)
    val want = graft.operators.CorpusAnalytics.importanceWeights(docs, target)
      .select($"doc_id", $"log_weight").as[(Long, Double)].collect().toMap
    val stream = MemoryStream[(Long, String)]
    val out = stream.toDF().toDF("doc_id", "text")
      .select($"doc_id", round(score($"text"), 4).as("log_weight"))
    val q = out.writeStream.format("memory").queryName("scored")
      .outputMode("append").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("scored").as[(Long, Double)].collect().toMap
      assert(got == want, s"stream scoring must equal the batch operator: $got vs $want")
      // target-like text scores above mixed, mixed above non-target
      assert(got(10L) > got(12L) && got(12L) > got(11L), s"ordering: $got")
    } finally q.stop()
  }

  test("streaming: curate gates, dedups, and decontaminates in one query") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "this corpus document is long enough to pass")).toDF("doc_id", "text")
    val evalDocs = Seq((900L, "leaked benchmark answer key paragraph")).toDF("doc_id", "text")
    val stream = MemoryStream[(Timestamp, Long, String)]
    val out = StreamAggregates.curate(
      stream.toDF().toDF("time", "doc_id", "text"), corpus, evalDocs)
    val q = out.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      stream.addData(
        (ts("2024-01-01 10:00:00"), 20L, "x1 x2"), // gate reject: too short
        (ts("2024-01-01 10:00:01"), 21L, "THIS corpus  document is long enough to pass"), // corpus dup
        (ts("2024-01-01 10:00:02"), 22L, "contains the leaked benchmark answer key paragraph verbatim"),
        (ts("2024-01-01 10:00:03"), 23L, "a genuinely novel clean document sails through"))
      stream.addData(
        (ts("2024-01-01 10:00:04"), 24L, "a genuinely novel clean document sails through")) // re-delivery
      q.processAllAvailable()
      val got = spark.table("curated")
        .select($"doc_id", $"keep", $"contaminated", $"admit")
        .as[(Long, Boolean, Boolean, Boolean)].collect()
        .map { case (id, k, c, a) => id -> ((k, c, a)) }.toMap
      assert(!got.contains(20L), "gate reject must never reach the sink")
      assert(!got.contains(24L), "stream re-delivery must never reach the sink")
      assert(got(21L) == ((false, false, false))) // corpus dup: not admitted
      assert(got(22L) == ((true, true, false)))   // contaminated: not admitted
      assert(got(23L) == ((true, false, true)))   // clean: admitted
    } finally q.stop()
  }
}
