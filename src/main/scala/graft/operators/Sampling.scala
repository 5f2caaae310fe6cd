package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training pipelines.
  *
  * The split assignment is a pure function of the row id — `md5` of its
  * decimal string form — NOT `rand()`: the same row lands in the same split
  * on every run, every engine, every retry (a `rand()` split silently
  * reshuffles under task retries — same hazard class as SPARK-23207 — and
  * can't be reproduced by an external auditor; the md5 form is replicated
  * exactly by the DuckDB oracle).
  *
  * No shuffle: assignment is a map-side scalar; downstream filters prune.
  */
object Sampling {

  /** Percent bucket in [0, 100): first 4 hex digits of md5(id-as-string).
    * 65536 buckets folded mod 100 — bias is < 0.4% per cell, irrelevant for
    * split purposes and fully deterministic.
    */
  def pctBucket(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("int") % 100

  /** 'train' / 'test' label at the given percentage boundary. */
  def splitLabel(id: Column, trainPct: Int = 90): Column =
    when(pctBucket(id) < trainPct, lit("train")).otherwise(lit("test"))

  /** Materialized (train, test) pair. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int = 90): (DataFrame, DataFrame) = {
    val labeled = df.withColumn("_split", splitLabel(col(idCol), trainPct))
    (labeled.filter(col("_split") === "train").drop("_split"),
      labeled.filter(col("_split") === "test").drop("_split"))
  }

  /** Train/test contamination report: near-duplicate document pairs that
    * straddle the split boundary — each row is a test document whose
    * near-duplicate leaked into train (or vice versa). Candidate
    * generation is [[Dedup.ngramJaccardPairs]] (LSH, one shuffle) with two
    * leakage-specific cost cuts:
    *
    *  - The band plan is DERIVED from the requested threshold
    *    ([[Dedup.lshBandPlan]], target recall 0.97 — a leakage report is a
    *    place where a missed pair is a silently contaminated eval): a
    *    t=0.1 sweep gets the exhaustive 32 r=1 bands (the r=2 routine
    *    setting measurably dropped a true cross-split pair at sf0.1), a
    *    t=0.3 sweep a 10-band net — nobody pays the wide explode when the
    *    S-curve says a narrow one already clears the target.
    *  - The straddle predicate PUSHES INTO candidate generation: split
    *    labels are a deterministic function of bare ids, so same-split
    *    pairs (~82% at a 90/10 split) drop before the pair dedup and the
    *    shingle-array verify joins ever see them. Recall is untouched —
    *    filtering by id can't change which true pairs collide.
    *
    * Pass `bands`/`numHashes` > 0 to override the derived plan.
    */
  def crossSplitLeakage(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      threshold: Double = 0.1,
      trainPct: Int = 90,
      bands: Int = 0,
      numHashes: Int = 0): DataFrame = {
    val (nh, b) =
      if (bands > 0 && numHashes > 0) (numHashes, bands)
      else Dedup.lshBandPlan(threshold)
    Dedup.ngramJaccardPairs(docs, textCol, idCol, n, threshold,
      bands = b, numHashes = nh,
      diffTag = Some(id => splitLabel(id, trainPct)))
      .withColumn("split_a", splitLabel(col("id_a"), trainPct))
      .withColumn("split_b", splitLabel(col("id_b"), trainPct))
      .filter(col("split_a") =!= col("split_b")) // invariant guard; free — pushdown already enforced it
  }

  /** Deterministic EPOCH SHUFFLE: assign every row a (shard, position)
    * under a seeded pseudo-random global order — the reproducible
    * "shuffle the corpus once per training epoch" step every data loader
    * needs (seed+1 = next epoch's completely different order, same seed =
    * byte-identical replay after a retry or on another engine; `rand()`
    * gives neither, per the class scaladoc).
    *
    * The order key is a 60-bit md5 prefix of `seed:id` — engine-portable
    * (the DuckDB oracle replays positions exactly) and uniform, so the
    * `shards` partitions are balanced by construction (no skew salting
    * needed, unlike any data-derived key). The plan is the write path
    * itself: ONE hash exchange on the shard id + an in-shard sort — never
    * a global sort. At 100 TB with shards sized to the target file count
    * (tens of thousands), each shard sorts a uniform ~1/shards sliver in
    * parallel, and `pos` is the batch index inside the shard's output
    * file. (A window rank per shard, not a global `orderBy`: Spark would
    * range-sample a global sort; partitioning by shard makes the exchange
    * explicitly the hash exchange we want.)
    */
  def epochShuffle(
      df: DataFrame,
      idCol: String = "doc_id",
      seed: Long = 42L,
      shards: Int = 8): DataFrame = {
    require(shards > 0, "need at least one shard")
    val h = conv(substring(
      md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string"))
        .cast("binary")), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
    df.select(col(idCol), h.as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Per-source QUOTA sampling: keep at most `quota` rows per group,
    * chosen as a deterministic uniform sample (smallest 32-bit md5 of the
    * row id first — an unbiased without-replacement draw that replays
    * identically on every run and engine). The per-domain contribution
    * cap a web-corpus pipeline applies so no single site dominates the
    * training mix.
    *
    * Reuses [[GroupTopK]]: k-entry partial heaps per (partition, group),
    * so the exchange carries at most `quota` rows per partition per
    * source — a window `row_number` would shuffle and sort EVERY row of
    * every group first. The 32-bit hash is exact as the heap's double
    * score, and ties (hash collisions) break by ascending id on both the
    * engine and the oracle, so collisions cannot reorder the answer.
    */
  def sourceQuota(
      df: DataFrame,
      groupCol: String = "source",
      idCol: String = "doc_id",
      quota: Int = 10): DataFrame = {
    require(quota > 0, "need a positive quota")
    val h32 = conv(substring(
      md5(concat(lit("q:"), col(idCol).cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long")
    GroupTopK.topK(
      df.select(col(groupCol), col(idCol), h32.as("_h")),
      Seq(groupCol), -col("_h").cast("double"), col(idCol), quota)
      .select(col("id").as(idCol), col(groupCol), col("rnk"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * IPL 97(5): each row draws key = ln(u)/w with u uniform in (0,1]; the
    * k largest keys are an exact weighted without-replacement sample).
    * The corpus-curation use: sample k documents proportional to a quality
    * or length weight, deterministically — `rand()` redraws under task
    * retries, a seeded md5 draw replays identically on every run and
    * engine.
    *
    * u = (h32+1)/2^32 from the 32-bit md5 of `seed:id` (never 0, so ln is
    * finite); w must be strictly positive. The global top-k is
    * `TakeOrderedAndProject` — k-bounded per partition, merged on the
    * driver, never a full sort — and the returned `rnk` is a window over
    * the already-reduced k rows (bounded, single partition by
    * construction). Adjacent key gaps are ~1/k-of-corpus scale (measured
    * 6e-9 minimum on the test corpus), ten orders above double ulp, so the
    * selection boundary and ranks are engine-stable.
    */
  def weightedSample(
      df: DataFrame,
      k: Int,
      weightCol: String,
      idCol: String = "doc_id",
      seed: String = "ws",
      keep: Seq[String] = Nil): DataFrame = {
    require(k > 0, "need a positive sample size")
    val h32 = conv(substring(
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long")
    val u = (h32.cast("double") + lit(1.0)) / lit(4294967296.0)
    val key = log(u) / col(weightCol).cast("double")
    val ordered = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(Seq(col(idCol), key.as("_key")) ++ keep.map(col): _*)
      .orderBy(col("_key").desc, col(idCol))
      .limit(k)
    ordered
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("_key").desc, col(idCol))).cast("long"))
      .select(Seq(col("rnk"), col(idCol)) ++ keep.map(col): _*)
  }

  /** Neyman-optimal stratified allocation (Neyman 1934 — the survey-
    * sampling answer to "given a budget of n rows, how many from each
    * stratum?": n_h ∝ N_h·σ_h, which minimizes the variance of the
    * stratified mean; proportional allocation over-samples big uniform
    * strata and starves small noisy ones). Input: a stratum column and a
    * numeric value column (e.g. tokens per doc); output per stratum:
    * size, σ (population), the allocation share, and the allocated
    * count for `budget` rows.
    *
    * Exactness: per-stratum Σx and Σx² accumulate as exact integer
    * masses (the value column is cast to long), σ = √((Σx²·N − (Σx)²))/N
    * is one fixed chain, the Σ N_h·σ_h normalizer folds in SORTED
    * stratum order (q150's discipline), and the allocated count uses the
    * floor(x+0.5) arithmetic rounding. One hash agg + one bounded
    * in-row fold pass.
    */
  def neymanAllocation(
      df: DataFrame,
      stratumCol: String,
      valueCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, "positive budget")
    val per = df
      .groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("long")).as("s1"),
        sum(col(valueCol).cast("long") * col(valueCol).cast("long")).as("s2"))
      .select(col("stratum"), col("n"),
        (sqrt((col("s2").cast("double") * col("n") -
          col("s1").cast("double") * col("s1"))) / col("n")).as("sigma"))
    val one = per
      .groupBy()
      .agg(sort_array(collect_list(struct(col("stratum"), col("n"), col("sigma"))))
        .as("gs"))
      .select(col("gs"),
        aggregate(col("gs"), lit(0.0),
          (a, g) => a + g.getField("n") * g.getField("sigma")).as("z"))
    one
      .select(explode(col("gs")).as("g"), col("z"))
      .select(col("g.stratum").as("stratum"),
        col("g.n").as("n"),
        (floor(col("g.sigma") * 10000 + lit(0.5)) / 10000).as("sigma"),
        (floor(col("g.n") * col("g.sigma") / col("z") * 10000 + lit(0.5)) / 10000)
          .as("share"),
        floor(lit(budget.toDouble) * (col("g.n") * col("g.sigma") / col("z"))
          + lit(0.5)).cast("long").as("alloc_n"))
  }

  /** Epoch replication plan — the UPSAMPLING half of mixture control that
    * [[graft.operators.CorpusAnalytics.temperatureResample]] deliberately
    * leaves to the loader: materialize per-doc replica counts for a
    * target weight w ≥ 0 as n = ⌊w⌋ + Bernoulli(frac(w)) — stochastic
    * rounding, the standard way to hit a fractional expected epoch count
    * without epoch-to-epoch bias (E[n] = w exactly).
    *
    * The Bernoulli draw is the seeded 16-bit md5 bucket (same row → same
    * plan on every run/engine/retry; no `rand()`), and the fractional
    * part is ROUNDED to 4 before the comparison (the temperature-resample
    * ulp discipline). Map-side scalar projection — no shuffle, no join;
    * weights usually arrive via a broadcast group join upstream.
    */
  def replicationPlan(
      df: DataFrame,
      weightCol: String,
      idCol: String = "doc_id",
      seed: String = "rep"): DataFrame = {
    val w = col(weightCol).cast("double")
    val u = conv(substring(
      md5(concat(col(idCol).cast("string"), lit("|" + seed)).cast("binary")),
      1, 4), 16, 10).cast("long")
    df.withColumn("n_replicas",
      (floor(w) + when(u.cast("double") < lit(65536.0) * round(w - floor(w), 4),
        1L).otherwise(0L)).cast("long"))
  }

  /** Embargoed temporal split (the financial-ML "purged" split, de Prado
    * 2018, applied to event streams): train on everything before the
    * `trainQ` time quantile, test on everything from the `testQ` quantile
    * on, and DROP the embargo band between them — the gap that keeps
    * leakage-by-adjacency (sessions, trends, near-duplicate events
    * straddling the boundary) out of the test set. The complement of
    * q56/q57's hash split: hash splits assume exchangeable rows; temporal
    * data is not exchangeable.
    *
    * Returns the per-split audit frame (split, n_rows, min_ts, max_ts in
    * epoch micros) — min/max make the embargo gap a checkable fact.
    * Cutoffs are exact interpolated percentiles of the micros (the
    * q34-proven kernel; micros sit far inside double's 53 bits), labeling
    * is a map-side comparison against the broadcast one-row cutoffs, and
    * the audit is a 3-key aggregate — the stream shuffles once for the
    * percentile agg and once for the 3-group audit.
    */
  def temporalSplit(
      df: DataFrame,
      tsCol: String,
      trainQ: Double = 0.6,
      testQ: Double = 0.7): DataFrame = {
    require(trainQ > 0 && testQ < 1 && trainQ <= testQ, "need 0 < trainQ <= testQ < 1")
    // null timestamps would otherwise fall through the CASE into the
    // embargo bucket and corrupt its audit row — exclude them explicitly
    val t = unix_micros(col(tsCol))
    val v = df.filter(col(tsCol).isNotNull).select(t.as("_t"))
    // distributed-rank percentiles (bit-identical to the ungrouped
    // percentile aggregate; no stream-cardinality aggregation buffer) —
    // _t doubles as the range-partition tie-break: positional values are
    // invariant to tie order
    val cuts = GlobalRank.percentileLiterals(
      v.select(col("_t").cast("double").as("_t")), "_t", "_t",
      Seq(trainQ, testQ), Seq("_t1", "_t2"))
    v.crossJoin(broadcast(cuts))
      .select(col("_t"),
        when(col("_t").cast("double") < col("_t1"), "train")
          .when(col("_t").cast("double") >= col("_t2"), "test")
          .otherwise("embargo").as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("_t")).as("min_ts"),
        max(col("_t")).as("max_ts"))
  }
}
