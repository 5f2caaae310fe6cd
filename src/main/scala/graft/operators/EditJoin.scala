package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-similarity self-join: all pairs within Levenshtein distance tau.
  *
  * The Ed-Join family (Xiao, Wang, Lin — VLDB 2008) turns the quadratic
  * "fuzzy duplicate" join into a prefix-filtered candidate join: an edit
  * operation destroys at most q positional q-grams, so two strings within
  * edit distance tau share at least `max(m_a, m_b) - q*tau` of their
  * q-grams (m = |s| - q + 1). Under ANY consistent global gram order the
  * standard prefix-filter theorem then says the first `q*tau + 1` grams of
  * each side must intersect — only that constant-size prefix enters the
  * candidate join. Ordering rarest-first (global df, then gram text) makes
  * prefix postings the short ones, so corpus-boilerplate grams never
  * generate candidates. Candidates are verified exactly with the codegen'd
  * `levenshtein` built-in after the free `|len(a) - len(b)| <= tau` cull —
  * the filter only prunes, never approximates (EditJoinSpec pins equality
  * with the brute-force quadratic join).
  *
  * Degenerate strings with m <= q*tau grams carry no usable prefix bound
  * (the overlap lower bound is vacuous — one edit can rewrite every gram
  * of a 3-char string); they additionally post to a single sentinel
  * bucket. A qualifying pair is therefore always caught: if either side
  * has m > q*tau the gram-prefix theorem applies (length filter keeps the
  * partner within tau grams of it), otherwise both sides sit in the
  * sentinel bucket, which stays tiny because membership is a length bound.
  *
  * Scale shape: one df agg over distinct (id, gram) rows, one per-id hash
  * agg with an in-array rarest-first sort (doc-length-bounded — never a
  * window sort of the gram stream), a candidate equi-join carrying
  * `q*tau + 1` rows per string, pair distinct, and two SHUFFLE_HASH verify
  * joins against the (id, string) relation. Nothing is ever all-pairs; a
  * skewed prefix gram is an AQE skew-join case, not a plan change.
  *
  * Returns (id1, id2, dist) with id1 < id2, dist <= tau.
  */
object EditJoin {

  def editSimilarityJoin(
      df: DataFrame,
      idCol: String,
      strCol: String,
      q: Int = 2,
      tau: Int = 1): DataFrame = {
    require(q >= 1, "q-gram length must be >= 1")
    require(tau >= 0, "tau must be >= 0")
    val base = df
      .filter(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .persist() // consumed by gram gen, the sentinel bucket, both verify joins
    // distinct positional q-grams; strings shorter than q emit none (they
    // are sentinel-bucket-only below)
    val grams = base
      .filter(length(col("s")) >= q)
      .select(col("id"), explode(array_distinct(transform(
        sequence(lit(0), length(col("s")) - q),
        i => col("s").substr(i + 1, lit(q))))).as("gram"))
    val dfreq = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    // rarest-first prefix via hash agg + in-array sort (containmentPairs'
    // discipline): (df, gram) is a consistent total order the DuckDB
    // oracle replays verbatim
    val prefix = grams
      .join(dfreq, "gram")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("gram")))).as("gd"))
      .select(col("id"), explode(transform(
        slice(col("gd"), 1, q * tau + 1), e => e("gram"))).as("gram"))
    val sentinel = base
      .filter(length(col("s")) - q + 1 <= q * tau)
      .select(col("id"), lit("").as("gram"))
    // explicit-count round-robin repartition on the probe side of the
    // candidate join: postings are byte-small (q*tau+1 short grams per
    // string), so AQE would coalesce them to one partition and serialize
    // the ~100x larger generated candidate stream AND the levenshtein
    // verify behind it (winnowingFingerprints' trap, measured there 7 s vs
    // 1 s at sf0.1). Round-robin, not gram-keyed: the join side is a
    // broadcast, so no clustering is required and hot-gram postings spread
    // instead of pinning a partition
    val postings = prefix.unionByName(sentinel)
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
    // raw candidates stay UN-deduplicated through verification: a pair can
    // arrive via at most q*tau+1 shared prefix grams (measured dup factor
    // ~1.06 on TPC-H names), so deduplicating the narrow verified output
    // is far cheaper than a full exchange of the candidate stream
    val candidates = postings.as("p1")
      .join(postings.as("p2"),
        col("p1.gram") === col("p2.gram") && col("p1.id") < col("p2.id"))
      .select(col("p1.id").as("id1"), col("p2.id").as("id2"))
    // verify joins carry only (id, string) — unhinted, so Catalyst
    // broadcasts the string relation when it fits (the candidate stream is
    // orders of magnitude wider than the corpus side) and AQE falls back
    // to a shuffled join at scale; the thresholded levenshtein runs the
    // banded O(tau*n) DP and early-exits with -1 past the band
    candidates
      .join(base.select(col("id").as("id1"), col("s").as("s1")), "id1")
      .join(base.select(col("id").as("id2"), col("s").as("s2")), "id2")
      .filter(abs(length(col("s1")) - length(col("s2"))) <= tau)
      .withColumn("dist", levenshtein(col("s1"), col("s2"), tau).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id1"), col("id2"), col("dist"))
      .distinct()
  }
}
