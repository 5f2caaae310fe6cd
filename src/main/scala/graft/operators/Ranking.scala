package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical relevance ranking over the corpus — the search surface beyond
  * exact/ILIKE/trigram matching (reference README.rst:96-99 stops at
  * pattern predicates): TF-IDF keyword extraction (per-doc salient terms
  * for tagging/faceting) and BM25 ranked retrieval (Robertson & Walker
  * 1994 — the standard probabilistic relevance function).
  *
  * Scale shape shared by both: tokenize map-side, aggregate on compact
  * (doc, token) / token keys — the same vocabulary-keyed exchanges as the
  * gram-dedup family — and keep corpus-level statistics as ONE-ROW
  * broadcast frames entering the plan as a `crossJoin(broadcast(...))`
  * (the q117/q123 scalar discipline; never a driver collect of per-doc
  * state).
  */
object Ranking {

  private def toks(textCol: String, idCol: String)(df: DataFrame): DataFrame =
    df.filter(trim(col(textCol)) =!= "")
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))

  /** Top-k tokens per document by smoothed TF-IDF
    * (score = tf · (ln((N+1)/(df+1)) + 1), the sklearn-smooth variant —
    * the +1s keep every idf finite and positive on any corpus).
    *
    * tf and df derive from ONE (doc, token) aggregate: the tf frame's rows
    * ARE the distinct (doc, token) pairs, so df is a second agg over it —
    * no countDistinct shuffle of the raw token stream. The per-doc top-k
    * is a window, deliberately NOT [[GroupTopK]]: score ties (equal tf,
    * equal df — common at tf 1) must break LEXICOGRAPHICALLY to be
    * engine-replayable, which the heap's double-encoded ordering cannot
    * express; window partitions here are bounded by per-doc vocabulary
    * (hundreds), not corpus size, so the sort is cheap and local.
    */
  def tfidfKeywords(
      docs: DataFrame,
      k: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "need a positive k")
    val t = toks(textCol, idCol)(docs)
    val tf = t.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = tf.select(col(idCol)).distinct()
      .agg(count(lit(1)).cast("double").as("n"))
    val scored = tf.join(df, "token")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("token"),
        (col("tf").cast("double") *
          (log((col("n") + lit(1.0)) / (col("df").cast("double") + lit(1.0))) +
            lit(1.0))).as("score"))
    scored
      .withColumn("rnk", row_number()
        .over(Window.partitionBy(col(idCol))
          .orderBy(col("score").desc, col("token"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("token"),
        round(col("score"), 4).as("score"))
  }

  /** BM25 top-n documents for a literal term set (k1 = 1.2, b = 0.75, the
    * conventional constants): score(d) = Σ_t idf_t · tf·(k1+1) /
    * (tf + k1·(1 − b + b·len/avglen)), idf_t = ln(1 + (N − df + ½)/(df + ½)).
    *
    * One map-side pass computes every per-term tf from the token array
    * (`filter(ts, = t)` — the term list is part of the PLAN, nothing
    * joins), corpus stats (N, avglen, per-term df) are one aggregate row
    * broadcast back, and the summation is LEFT-ASSOCIATIVE in term order
    * on both engines — a per-(doc,term)-row hash agg would sum in
    * partition order and lose bit parity. Top-n is `orderBy.limit` =
    * TakeOrderedAndProject: per-partition heaps, k-row driver merge,
    * never a global sort.
    */
  def bm25Rank(
      docs: DataFrame,
      terms: Seq[String],
      topN: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val perdoc = docs.filter(trim(col(textCol)) =!= "")
      .select(col(idCol),
        split(lower(trim(col(textCol))), "\\s+").as("ts"))
      .select(Seq(col(idCol), size(col("ts")).cast("long").as("len")) ++
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("ts"), x => x === lit(t))).cast("long").as(s"tf$i")
        }: _*)
    val statCols =
      Seq(count(lit(1)).cast("double").as("n"),
        (sum(col("len")).cast("double") / count(lit(1))).as("avglen")) ++
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i"))
    val stats = perdoc.agg(statCols.head, statCols.tail: _*)
    val contribs = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      idf * (tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("len").cast("double") / col("avglen")))
    }
    val scored = perdoc.crossJoin(broadcast(stats))
      .select(col(idCol), contribs.reduce(_ + _).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(topN)
    scored
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("score").desc, col(idCol))).cast("long"))
      .select(col("rnk"), col(idCol), round(col("score"), 4).as("score"))
  }

  /** ROC AUC of a score column against a boolean label, computed exactly
    * via the Mann-Whitney U rank statistic with midrank tie handling —
    * the standard "does this quality signal actually separate the
    * classes?" audit run before any score threshold goes into a filter
    * config. One grounding row: (n_pos, n_neg, auc).
    *
    * Scale shape: rows collapse FIRST to the per-score histogram
    * (count, positives), so the only row-level exchange is one hash
    * aggregate; the doubled midrank of every tie class comes straight
    * from the histogram — m2 = 2·prefix + count + 1 via ONE
    * [[GlobalRank.weightedPrefixSums]] pass over a distinct-score-sized
    * frame (the r14 Spearman discipline — no row-level rank pass, no
    * join back) — and Σ_pos m2 = Σ_scores positives·m2 sums in decimal
    * (exact in any order at any scale, so the oracle replays
    * bit-for-bit); the final divisions happen once. Display is
    * floor-form (U/(n⁺n⁻) is rational). `idCol` is retained for API
    * stability but unused: midranks are functions of the score value
    * alone, so no tie-break id is needed.
    */
  def scoreAuc(
      df: DataFrame,
      scoreCol: Column,
      labelCol: Column,
      idCol: String = "doc_id"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // null labels would land in the otherwise() branch and count as
    // NEGATIVES, silently diluting the statistic — unlabeled rows are out
    val v = df.filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("double").as("_s"), labelCol.as("_l"))
    val hist = v.groupBy(col("_s"))
      .agg(count(lit(1)).as("_hc"),
        sum(when(col("_l"), 1L).otherwise(0L)).as("_hp"))
    val withM2 = GlobalRank.weightedPrefixSums(hist, "_s", "_hc", "_pfx")
      .select(col("_hc"), col("_hp"),
        (lit(2L) * col("_pfx") + col("_hc") + lit(1L)).as("_m2"))
    val np = col("n_pos").cast("double")
    val nn = col("n_neg").cast("double")
    withM2.agg(
        sum(col("_hp")).as("n_pos"),
        sum(col("_hc") - col("_hp")).as("n_neg"),
        sum(col("_hp").cast(dec) * col("_m2").cast(dec)).as("_sp2"))
      .select(col("n_pos"), col("n_neg"),
        (floor(((col("_sp2").cast("double") / 2 - np * (col("n_pos") + 1).cast("double") / 2) /
          (np * nn)) * 10000 + lit(0.5)) / 10000).as("auc"))
  }

  /** DeLong confidence interval for the ROC AUC (DeLong, DeLong &
    * Clarke-Pearson 1988 — the audit [[scoreAuc]]'s point estimate owes
    * its readers: an AUC of 0.64 on 50 positives and on 50,000 positives
    * are different findings, and threshold decisions hang on which. The
    * nonparametric structural-components variance: per-positive
    * placement V₁₀ = P(score beats a random negative), per-negative V₀₁
    * mirrored; SE² = S₁₀/n⁺ + S₀₁/n⁻). One row:
    * (n_pos, n_neg, auc_bp, se_bp, lo_bp, hi_bp) with the two-sided
    * `zCrit`·SE interval clamped to [0, 1].
    *
    * Float discipline: the doubled placement a₁₀ = 2·negBelow + negTied
    * is an exact integer per score class (a₁₀ = 2n⁻·V₁₀), so every
    * moment (Σhp·a₁₀, Σhp·a₁₀²) is an exact DECIMAL(38,0) sum from ONE
    * histogram — the variances clear to integer numerators
    * (P·Q − S²)/(P(P−1)·4n⁻²) with divisions once, and the AUC itself
    * is S₁/(2n⁻P), identical to [[scoreAuc]]'s midrank form (the spec
    * pins them equal). Fewer than 2 on either side nulls the interval.
    *
    * Scale shape: [[scoreAuc]]'s exactly — one row-level hash agg to
    * the per-score histogram, TWO `weightedPrefixSums` passes over the
    * distinct-score frame (counts and positives), one moment aggregate.
    */
  def delongAucCi(
      df: DataFrame,
      scoreCol: Column,
      labelCol: Column,
      zCrit: Double = 1.96): DataFrame = {
    require(zCrit > 0, "zCrit is a two-sided normal quantile, > 0")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = df.filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("double").as("_s"), labelCol.as("_l"))
    val hist = v.groupBy(col("_s"))
      .agg(count(lit(1)).as("_hc"),
        sum(when(col("_l"), 1L).otherwise(0L)).as("_hp"))
    val p2 = GlobalRank.weightedPrefixSumsMulti(hist, "_s",
      Seq("_hc" -> "_pfa", "_hp" -> "_pfp"))._1
    val agg = p2.agg(
      sum(col("_hp")).as("p"),
      sum(col("_hc") - col("_hp")).as("ng"),
      // a10 = 2·negBelow + negTied (per score class), exact integers
      sum(col("_hp").cast(dec) *
        (lit(2L) * (col("_pfa") - col("_pfp")) +
          (col("_hc") - col("_hp"))).cast(dec)).as("_s1"),
      sum(col("_hp").cast(dec) *
        (lit(2L) * (col("_pfa") - col("_pfp")) +
          (col("_hc") - col("_hp"))).cast(dec) *
        (lit(2L) * (col("_pfa") - col("_pfp")) +
          (col("_hc") - col("_hp"))).cast(dec)).as("_q1"))
    // a01 needs the positive total P: one more pass over the same
    // histogram against the broadcast one-row totals
    val tot = agg.select(col("p"), col("ng"), col("_s1"), col("_q1"))
    val a01 = lit(2L) * col("p") - lit(2L) * col("_pfp") - col("_hp")
    val agg0 = p2.crossJoin(broadcast(tot)).agg(
      first(col("p")).as("p"), first(col("ng")).as("ng"),
      first(col("_s1")).as("_s1"), first(col("_q1")).as("_q1"),
      sum((col("_hc") - col("_hp")).cast(dec) * a01.cast(dec)).as("_s0"),
      sum((col("_hc") - col("_hp")).cast(dec) * a01.cast(dec) *
        a01.cast(dec)).as("_q0"))
    val pd = col("p").cast("double")
    val nd = col("ng").cast("double")
    val auc = col("_s1").cast("double") / (lit(2.0) * nd * pd)
    def variance(qc: Column, sc: Column, cnt: Column, other: Column) =
      (cnt.cast(dec) * qc - sc * sc).cast("double") /
        (cnt.cast("double") * (cnt.cast("double") - 1)) /
        (lit(4.0) * other.cast("double") * other.cast("double"))
    val s10 = variance(col("_q1"), col("_s1"), col("p"), col("ng"))
    val s01 = variance(col("_q0"), col("_s0"), col("ng"), col("p"))
    val se = sqrt(s10 / pd + s01 / nd)
    val okAuc = col("p") > 0 && col("ng") > 0
    val okCi = col("p") > 1 && col("ng") > 1
    def bp(c: Column) = floor(c * 10000 + lit(0.5)).cast("long")
    def guard(cond: Column, c: Column) =
      when(cond, bp(c)).otherwise(lit(null).cast("long"))
    agg0.select(col("p").as("n_pos"), col("ng").as("n_neg"),
      guard(okAuc, auc).as("auc_bp"),
      guard(okCi, se).as("se_bp"),
      guard(okCi, greatest(lit(0.0), auc - lit(zCrit) * se)).as("lo_bp"),
      guard(okCi, least(lit(1.0), auc + lit(zCrit) * se)).as("hi_bp"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    * ranked retrieval lists — the standard hybrid-search combiner for a
    * sparse (BM25) and a dense (embedding top-k) ranking:
    * score(d) = Σ_lists 1/(kConst + rank_list(d)), kConst = 60 by
    * convention; documents absent from a list simply contribute nothing.
    *
    * Scale shape: both inputs are top-k lists — k-BOUNDED frames, whatever
    * the corpus size behind them — so the fusion is a full-outer equi-join
    * of two tiny frames plus one ordered limit; the heavy lifting happened
    * upstream in [[bm25Rank]] / [[graft.operators.Similarity.topKPerQuery]],
    * each with its own bounded-shuffle story. Fused scores are sums of
    * 1/(kConst+rank) doubles in a fixed (sparse + dense) association, so
    * both engines replay the identical IEEE chain; display rounding is
    * floor-form (exact-decimal-boundary-safe, the q162 discipline).
    *
    * Inputs must carry (`idCol`, `rnk`); ties in fused score break by id.
    */
  def rrfFuse(
      sparse: DataFrame,
      dense: DataFrame,
      idCol: String = "doc_id",
      kConst: Int = 60,
      topN: Int = 10): DataFrame = {
    require(kConst > 0 && topN > 0, "need positive kConst and topN")
    val s = sparse.select(col(idCol), col("rnk").as("_rs"))
    val d = dense.select(col(idCol), col("rnk").as("_rd"))
    val fused = s.join(d, Seq(idCol), "full_outer")
      .select(col(idCol),
        (coalesce(lit(1.0) / (lit(kConst.toDouble) + col("_rs").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kConst.toDouble) + col("_rd").cast("double")), lit(0.0)))
          .as("_f"),
        col("_rs").isNotNull.as("in_sparse"),
        col("_rd").isNotNull.as("in_dense"))
      .orderBy(col("_f").desc, col(idCol))
      .limit(topN)
    fused
      .withColumn("rnk", row_number()
        .over(Window.orderBy(col("_f").desc, col(idCol))).cast("long"))
      .select(col("rnk"), col(idCol),
        (floor(col("_f") * 10000 + lit(0.5)) / 10000).as("rrf"),
        col("in_sparse"), col("in_dense"))
  }

  /** Rank-biased overlap at a fixed depth (Webber, Moffat & Zobel, TOIS
    * 2010): RBO@k = (1−p)·Σ_{d=1..k} p^{d−1}·|A_{:d} ∩ B_{:d}|/d — the
    * standard top-weighted similarity between two ranked lists (here:
    * does the dense ranking agree with BM25 where it matters, at the
    * top?). p ≈ 0.9 concentrates ~86% of the weight in the top 10.
    *
    * Both inputs are (rnk, id) top-k frames — k-BOUNDED whatever corpus
    * sits behind them — so this is one tiny equi-join (a common doc with
    * ranks (ra, rb) enters every prefix intersection from depth
    * max(ra, rb) on) plus one in-row fold over the ≤k max-rank array.
    * The geometric weights enter as PLAN LITERALS generated by iterated
    * multiplication (their shortest-round-trip decimal text parses to
    * identical doubles in the oracle — no cross-engine pow()), and the
    * depth sum folds left-associated, so the display replays exactly.
    */
  def rboOverlap(
      a: DataFrame,
      b: DataFrame,
      idCol: String = "doc_id",
      p: Double = 0.9,
      depth: Int = 10): DataFrame = {
    require(depth >= 1 && depth <= 1000, "1 <= depth <= 1000")
    require(p > 0 && p < 1, "p in (0, 1)")
    val ar = a.filter(col("rnk") <= depth)
      .select(col(idCol), col("rnk").cast("long").as("_ra"))
    val br = b.filter(col("rnk") <= depth)
      .select(col(idCol), col("rnk").cast("long").as("_rb"))
    val md = ar.join(br, idCol)
      .select(greatest(col("_ra"), col("_rb")).as("_md"))
    val w: Array[Double] = Array.iterate(1.0, depth)(_ * p)
    val terms = (1 to depth).map { d =>
      lit(w(d - 1)) *
        size(filter(col("ms"), m => m <= d)).cast("double") / d.toDouble
    }.reduce(_ + _)
    md.agg(sort_array(collect_list(col("_md"))).as("ms"),
        count(lit(1)).as("n_overlap"))
      .select(col("n_overlap"),
        (floor(lit(1.0 - p) * terms * 10000 + lit(0.5)) / 10000).as("rbo"))
  }
}
