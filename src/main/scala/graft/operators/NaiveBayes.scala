package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over character n-grams — the classic trained
  * language identifier (Cavnar & Trenkle 1994 n-gram profiles; the NB
  * formulation is the standard baseline every lang-id stack starts from,
  * and the supervised upgrade to [[graft.functions.TextAnalysis]]'s
  * stopword heuristic). Fit and apply in one pass over a labeled corpus:
  * per-class gram counts with Laplace smoothing, ln-space scoring,
  * argmax class per document.
  *
  * Shape — "fit small, apply distributed" (the centroid-literal
  * discipline): the model is the per-gram table of k class log-probs,
  * built by one (class, gram) count aggregate and joined back to the
  * per-doc gram counts as a BROADCAST (char-n-gram vocabularies are
  * alphabet^n-bounded — minuscule beside any corpus); class totals, the
  * vocabulary size, and priors are k+1 bounded driver scalars. Scoring is
  * map-side: every class score folds in ONE pass over the doc's sorted
  * gram structs. Two shuffles total — (id, gram) counts and the per-id
  * fold — both 8-byte-keyed with map-side partials.
  *
  * Float discipline (q150/q156): score_c = prior_c + Σ cnt·ln((n_cg+1)/
  * (n_c+V)) folds left-associatively in SORTED gram order, each ln
  * entering exactly once per (gram, class) — so DuckDB replays the exact
  * doubles (q158). The argmax compares ROUNDED scores (q139's discipline:
  * rank must never hinge on ln ulps), ties to the lexicographically
  * greatest class on both engines.
  */
object NaiveBayes {

  def langPredict(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      labelCol: String = "lang",
      n: Int = 3): DataFrame = {
    require(n >= 1, "langPredict: need n >= 1")
    val t = lower(col(textCol))
    val base = docs
      .filter(col(textCol).isNotNull && col(labelCol).isNotNull &&
        length(t) >= n)
      .select(col(idCol), col(labelCol).as("_lbl"), t.as("_t"))
      // the ONE text shuffle, before gram generation (q154's discipline):
      // id-partitioning satisfies every downstream grouping — the
      // (id, lbl, gram) count, and the per-id scoring fold — so no gram
      // row ever exchanges, and generation parallelizes even off a
      // single-file scan (explicit count: AQE would coalesce it to one)
      .repartition(
        docs.sparkSession.sessionState.conf.numShufflePartitions, col(idCol))
    val grams = base.select(col(idCol), col("_lbl"),
      explode(transform(sequence(lit(0), length(col("_t")) - n),
        i => col("_t").substr(i + 1, lit(n)))).as("_g"))
    // ONE persisted compact frame feeds everything: the per-doc counts
    // score directly, and the per-class model counts DERIVE from them
    // (sum of doc counts), so the gram explode materializes exactly once
    // (caller-visible lifecycle, the dedup-family discipline)
    val docGrams = grams.groupBy(col(idCol), col("_lbl"), col("_g"))
      .agg(count(lit(1)).as("_cnt")).persist()
    // the whole (class, gram) count table is alphabet^n-bounded — the
    // SAME boundedness that lets the model broadcast to every executor —
    // so collect it ONCE and derive class totals, vocabulary size, and
    // the per-gram log-prob vectors on the driver: one job replaces the
    // classTotals collect + the vocab distinct-count + the pivot shuffle
    // + the distributed-model broadcast build (the centroid-literal
    // discipline). Every double is the same IEEE chain the distributed
    // pivot computed ((n+1.0)/denom then ln), so scores are bit-identical.
    val classGramRows = docGrams.groupBy(col("_lbl"), col("_g"))
      .agg(sum(col("_cnt")).as("_n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(classGramRows.nonEmpty, "langPredict: no labeled documents")
    val classTotals = classGramRows.groupBy(_._1).map { case (l, rs) =>
      l -> rs.map(_._3).sum }.toSeq.sortBy(_._1)
    val langs = classTotals.map(_._1)
    val vocab = classGramRows.map(_._2).distinct.length.toLong
    // per-class doc counts off the cached compact frame (one job)
    val docCounts = docGrams.groupBy(col("_lbl"))
      .agg(count_distinct(col(idCol)).as("_d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalDocs = docCounts.values.sum
    val priors = langs.map(l => math.log(docCounts(l).toDouble / totalDocs))
    val denoms = classTotals.map(_._2 + vocab)
    val langIx = langs.zipWithIndex.toMap
    val byGram = classGramRows.groupBy(_._2)
    val modelRows = byGram.iterator.map { case (g, rs) =>
      val counts = new Array[Long](langs.length)
      rs.foreach { case (l, _, n) => counts(langIx(l)) = n }
      org.apache.spark.sql.Row(g, langs.indices.map(i =>
        math.log((counts(i) + 1.0) / denoms(i).toDouble)).toSeq)
    }.toSeq
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types.{StructType, StructField, StringType, ArrayType, DoubleType}
    val model = docs.sparkSession.createDataFrame(modelRows.asJava,
      StructType(Seq(StructField("_g", StringType, nullable = false),
        StructField("_lps", ArrayType(DoubleType, containsNull = false),
          nullable = false))))
    // unseen grams (scoring data the fit never saw) smooth to ln(1/(n_c+V))
    val fallback = array(langs.indices.map(i =>
      lit(math.log(1.0 / denoms(i)))): _*)
    val scoredGrams = docGrams
      .join(broadcast(model), Seq("_g"), "left")
      .select(col(idCol), col("_g"), col("_cnt"),
        coalesce(col("_lps"), fallback).as("_lps"))
    val folded = scoredGrams.groupBy(col(idCol))
      .agg(array_sort(collect_list(
        struct(col("_g"), col("_cnt"), col("_lps")))).as("_sorted"))
    // ONE pass over the sorted grams accumulates all k class sums via
    // zip_with (r13; was k separate folds re-scanning the array). Each
    // class's partial-sum sequence is unchanged — acc_i' = acc_i +
    // cnt·lps_i in the same sorted-gram left-associative order — so
    // every double is bit-identical to the k-fold form the oracle
    // replays. Bound as a column: _sums is multi-referenced below, so
    // projection collapse cannot re-inline the aggregate k times (the
    // entropy-kernel discipline).
    val zeros = array(langs.indices.map(_ => lit(0.0)): _*)
    val sums = F.aggregate(col("_sorted"), zeros,
      (acc, e) => zip_with(acc, e.getField("_lps"),
        (a, l) => a + e.getField("_cnt").cast("double") * l))
    val withSums = folded.withColumn("_sums", sums)
    val scores = langs.indices.map { i =>
      round(lit(priors(i)) + element_at(col("_sums"), i + 1), 4)
    }
    val best = array_max(array(langs.indices.map(i =>
      struct(scores(i).as("score"), lit(langs(i)).as("lang"))): _*))
    withSums.select(col(idCol),
      best.getField("lang").as("lang_pred"),
      best.getField("score").as("score"))
  }
}
