package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics over the ingested `logs`/`metric` envelope — the
  * dashboard aggregations of SURVEY §2.6 (reference:
  * doc/metabase-instructions.rst:18-22, `metric` hypertable migration:66-78)
  * as live Structured-Streaming queries instead of poll-the-warehouse.
  *
  * All three are declarative compositions of built-in stateful operators
  * (windowed agg, session_window, dropDuplicatesWithinWatermark), so Spark
  * manages state stores, watermark GC, and shuffle partitioning; the same
  * code runs in batch mode for backfills (Spark treats the window exprs
  * identically on a static DataFrame).
  *
  * Scale notes: state is partitioned by group key across executors; the
  * watermark bounds state size (old windows/sessions are evicted), which is
  * the difference between "runs forever at 100 TB/day" and OOM.
  */
object StreamAggregates {

  /** Stream-static enrichment join — the streaming twin of the batch
    * `logs ⋈ context ON correlation_id` lookup (SURVEY §2.5; reference:
    * context PK migration:45-50 mirrored by the logs btree migration:35).
    * The dimension is broadcast: each micro-batch joins against the
    * executor-local copy, so enrichment adds ZERO shuffles to the stream
    * (stream-static joins are stateless — nothing to watermark or GC).
    * Dimension refresh contract: Spark caches the static side's file
    * listing (FileIndex) when the DataFrame is created, so NEW files
    * appearing under the same path are generally NOT re-listed per
    * trigger. To pick up a dimension snapshot the caller must recreate
    * the dim DataFrame (and restart the query), point at a Delta-style
    * versioned source, or invalidate via `spark.catalog.refreshTable`
    * for catalog-backed dims. Content rewritten IN-PLACE under the
    * already-listed files is not a supported refresh path either.
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      key: String = "correlation_id"): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Tumbling-window event counts + value stats — `time_bucket` live.
    * Watermark bounds lateness: events older than `lateness` vs the max seen
    * event time are dropped (the reference has no late-data policy at all —
    * SURVEY §1.4 — so any bound is strictly additive).
    */
  def timeBucketCounts(
      logs: DataFrame,
      bucket: String = "1 hour",
      lateness: String = "10 minutes",
      timeCol: String = "time"): DataFrame =
    logs
      .withWatermark(timeCol, lateness)
      .groupBy(window(col(timeCol), bucket))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"),
        col("window.end").as("bucket_end"), col("n"))

  /** Gap-based sessionization per correlation id: consecutive events closer
    * than `gap` merge into one session row (start, end, event count).
    * `session_window` is Spark's native session operator — state merges
    * partial sessions across micro-batches and closes them at
    * watermark + gap.
    */
  def sessionize(
      logs: DataFrame,
      gap: String = "30 minutes",
      lateness: String = "10 minutes",
      keyCol: String = "correlation_id",
      timeCol: String = "time"): DataFrame =
    logs
      .withWatermark(timeCol, lateness)
      .groupBy(session_window(col(timeCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Tumbling-window APPROXIMATE distinct users — the live "how many
    * unique actors this hour" panel at sketch cost: HLL++ partials
    * (`approx_count_distinct`) merge inside the windowed state, so state
    * per window is one bounded sketch buffer, never a user set. Exact
    * distinct over a stream would hold every key in state (unbounded on
    * an open id space) — the sketch is the 100 TB-shaped answer, with
    * the usual ~2% default rsd (exact at small cardinalities, where the
    * HLL++ sparse mode stores the ids themselves).
    */
  def windowedDistinctUsers(
      logs: DataFrame,
      bucket: String = "1 hour",
      lateness: String = "10 minutes",
      timeCol: String = "time",
      userCol: String = "user_id"): DataFrame =
    logs
      .withWatermark(timeCol, lateness)
      .groupBy(window(col(timeCol), bucket))
      .agg(approx_count_distinct(col(userCol)).as("approx_users"))
      .select(col("window.start").as("bucket_start"),
        col("window.end").as("bucket_end"), col("approx_users"))

  /** Streaming exact dedup on a key (e.g. a message fingerprint): keeps the
    * first occurrence, drops re-deliveries arriving within the watermark
    * horizon. State = one entry per key inside the horizon, GC'd by the
    * watermark — bounded regardless of stream length.
    */
  def dedupFirstSeen(
      logs: DataFrame,
      keyCols: Seq[String],
      lateness: String = "10 minutes",
      timeCol: String = "time"): DataFrame =
    logs
      .withWatermark(timeCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming twin of [[graft.operators.Dedup.incrementalExact]]: dedup a
    * live stream of documents against an already-deduped STATIC corpus and
    * within the stream itself, emitting each first-seen doc with a
    * `keep` verdict. Composition of two bounded-state pieces:
    * [[dedupFirstSeen]] on the normalized fingerprint (within-stream
    * first-wins, state GC'd by the watermark) then a stream-static LEFT
    * join against the corpus's DISTINCT fingerprints (stateless per
    * micro-batch — nothing to watermark; at scale the static side is the
    * pre-materialized fingerprint index, broadcast or bucket-joined).
    * Same refresh contract as [[enrich]]: recreate the corpus DataFrame
    * to pick up a new corpus snapshot.
    */
  def incrementalDedup(
      stream: DataFrame,
      corpus: DataFrame,
      textCol: String = "text",
      corpusTextCol: String = "text",
      lateness: String = "10 minutes",
      timeCol: String = "time"): DataFrame = {
    val corpusFps = corpus
      .select(graft.functions.TextAnalysis.fingerprint(col(corpusTextCol)).as("fp"))
      .distinct()
      .withColumn("_in_corpus", lit(true))
    dedupFirstSeen(
      stream.withColumn("fp", graft.functions.TextAnalysis.fingerprint(col(textCol))),
      Seq("fp"), lateness, timeCol)
      .join(corpusFps, Seq("fp"), "left")
      .withColumn("keep", coalesce(col("_in_corpus"), lit(false)) === false)
      .drop("_in_corpus")
  }

  /** Streaming curation pipeline — the LIVE twin of q105's batch chain:
    * quality gate → within-stream + vs-corpus exact dedup → Bloom
    * decontamination, composed as ONE streaming query. Emits each
    * surviving doc with (keep, contaminated, admit) verdicts; gate
    * rejects and stream re-deliveries never reach the sink.
    *
    * Stage economics, because each stage must be streamable: the gate is
    * map-side scalars (no state); dedup is the watermark-GC'd
    * `dropDuplicatesWithinWatermark` plus a stateless stream-static join
    * ([[incrementalDedup]]); decontamination probes a Bloom bitmap of the
    * eval-suite grams that enters the plan as a LITERAL (built once from
    * the static eval set, shipped with task binaries) via an `exists`
    * higher-order probe — NOT an explode + aggregate, which would need a
    * second stateful stage. One watermarked stateful operator total; at
    * 100 TB/day the state store holds only in-watermark fingerprints.
    */
  def curate(
      stream: DataFrame,
      corpus: DataFrame,
      evalDocs: DataFrame,
      textCol: String = "text",
      timeCol: String = "time",
      lateness: String = "10 minutes",
      minTokens: Int = 5,
      minAlpha: Double = 0.6,
      maxRepetition: Double = 0.2,
      n: Int = 3,
      expectedGrams: Long = 1 << 20,
      fpp: Double = 1e-4): DataFrame = {
    import graft.functions.{BloomSketch, TextAnalysis}
    val gated = stream.filter(
      TextAnalysis.tokenCount(col(textCol)) >= minTokens &&
        TextAnalysis.alphaRatio(col(textCol)) >= minAlpha &&
        graft.operators.CorpusAnalytics.repetitionRatio(col(textCol)) <= maxRepetition)
    val numBits = math.max(64L,
      math.ceil(-expectedGrams * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bloomBits: Array[Byte] = evalDocs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(graft.operators.Dedup.shingles(col(textCol), n)).as("g"))
      .agg(BloomSketch.bloom_agg(xxhash64(col("g")), expectedGrams, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    incrementalDedup(gated, corpus, textCol, textCol, lateness, timeCol)
      .withColumn("contaminated",
        exists(graft.operators.Dedup.shingles(col(textCol), n),
          g => BloomSketch.bloom_might_contain(lit(bloomBits), xxhash64(g))))
      .withColumn("admit", col("keep") && !col("contaminated"))
  }

  /** Watermarked stream-stream interval join: each left event joined to
    * right events of the same key with `right.ts` in
    * `[left.ts, left.ts + within]` — the streaming twin of the span-interval
    * association (SURVEY §2.5, reference: migration:54-64), e.g. "errors
    * within 10 minutes after each click, live".
    *
    * Both sides carry a watermark AND the join condition bounds the time
    * delta, so Spark can GC both state stores (without the time bound the
    * state grows forever — the condition is load-bearing at 100 TB/day,
    * not an optimization).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String = "time",
      rightTs: String = "r_time",
      within: String = "10 minutes",
      lateness: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).alias("l")
    val r = right.withWatermark(rightTs, lateness).alias("r")
    l.join(r, expr(
      s"l.$keyCol = r.$keyCol AND " +
        s"r.$rightTs >= l.$leftTs AND r.$rightTs <= l.$leftTs + INTERVAL $within"))
      .drop(r(keyCol))
  }
}
