package graft

/** Executable PLANS.md: every SparkEntry query must plan WITHOUT a
  * CartesianProduct or BroadcastNestedLoopJoin, except an explicit exempt
  * list where the nested-loop side is bounded by construction (a broadcast
  * scalar/literal set or a deliberately quadratic contract oracle). A new
  * query — or a refactor of an old one — that silently degrades an
  * equi-join into a nested loop fails here instead of at 100 TB.
  */
class PlanGuardSpec extends SparkSpec {

  /** Queries allowed to contain a nested-loop join, each with the reason
    * the loop is scale-safe (or deliberately not an engine path).
    */
  private val exempt: Map[String, String] = Map(
    "q68_levenshtein" ->
      "cross of the DISTINCT event-type universe with itself — bounded small dimension, broadcast",
    "q23_knn_brute" ->
      "crossJoin(broadcast(queries)): query set is a bounded literal, map-side scoring",
    "q67_tfidf" ->
      "crossJoin(broadcast(nDocs)): single-row corpus-size scalar, corpus side streams through",
    "q93_batch_retrieval" ->
      "crossJoin(broadcast(query set)): exact retrieval is O(|corpus|*|Q|) by definition; shuffle is k-bounded by TopKPairs",
    "q84_lsh_contract" ->
      "contract twin: brute-force all-pairs ground truth is the point",
    "q85_simhash_contract" ->
      "contract twin: brute-force ground truth",
    "q86_ann_recall" ->
      "contract twin: brute-force top-k ground truth + broadcast scalar recall join",
    "q87_embed_pairs_exact" ->
      "contract twin: exact pair list is the oracle",
    "q94_batch_retrieval_lsh" ->
      "recall contract: joins against the exact twin; broadcast scalar counts",
    "q90_token_rarity" ->
      "crossJoin(broadcast(nDocs)): single-row corpus-size scalar",
    "q92_mixture_weights" ->
      "crossJoin(broadcast(totals)): single-row totals scalar",
    "q101_semdedup_contract" ->
      "contract twin: brute-force duplicate graph + single-row metric crossJoins",
    "q103_decontam_bloom_contract" ->
      "contract twin: single-row metric crossJoins (bloom bitmap itself is a plan literal)",
    "q109_mixture_resample" ->
      "crossJoin(broadcast(totals)): single-row totals scalar, corpus side streams through",
    "q110_quantized_ann_contract" ->
      "contract twin: broadcast query set + single-row stats/metric crossJoins (quantization stats are a one-row array pair)",
    "q152_kll_contract" ->
      "contract twin: single-row exact-quantile vs single-row merged-sketch crossJoins",
    "q153_pq_ann_contract" ->
      "contract twin: broadcast query set + single-row codebook/recall-metric crossJoins (q110's discipline)",
    "q157_ivfpq_ann_contract" ->
      "contract twin: the IVFADC engine path probes via an equi-join on cluster; the BNLJ sites are the brute-force exact side (broadcast query set) + single-row metric crossJoins",
    "q159_trigram_ce" ->
      "crossJoin(broadcast(nTok)): single-row token-total scalar for the unigram backoff term; all count joins are 8-byte-key equi-joins",
    "q161_kneser_ney_ce" ->
      "crossJoin(broadcast(bigram-type total)): single-row scalar for the continuation-probability denominator; all count joins are 8-byte-key equi-joins (q159's discipline)",
    "q164_temperature_resample" ->
      "crossJoin(broadcast(total/max-boost)): single-row scalars beside the bounded per-group token table; the keep decision is a map-side comparison and the corpus never shuffles (q109's discipline)",
    "q170_rfm_segments" ->
      "crossJoin(broadcast(cuts)): the single-row quintile-cut arrays beside the per-user aggregate; banding is a map-side <=-chain (q133's discipline)",
    "q177_benford" ->
      "crossJoin(broadcast(total)): the single-row digit total beside the 9-row spine",
    "q167_term_dispersion" ->
      "crossJoin(broadcast(total)): the single-row corpus-token scalar beside the bounded part-size table; the top-k x parts spine itself is bounded",
    "q172_replication_plan" ->
      "crossJoin(broadcast(totals)) inside the composed mixtureWeights: single-row totals scalar (q92's discipline); the replica decision is a map-side scalar",
    "q180_kaplan_meier" ->
      "crossJoin(broadcast(end)): the single-row observation-end scalar beside the per-user aggregate",
    "q243_logrank" ->
      "crossJoin(broadcast(end)): q180's single-row observation-end scalar beside the per-user aggregate (same lifetimes, same censoring rule)",
    "q279_mood_median" ->
      "crossJoin(broadcast(median)) + crossJoin(broadcast(totals)): single-row pooled-median and margin scalars beside the bounded group table",
    "q280_page_trend" ->
      "crossJoin(broadcast(window)): the single-row (t_min, t_max) tercile-boundary scalar; period assignment is a map-side integer comparison",
    "q281_nelson_aalen" ->
      "crossJoin(broadcast(end)): q180's single-row observation-end scalar beside the per-user aggregate",
    "q282_weighted_logrank" ->
      "crossJoin(broadcast(end)): q243's single-row observation-end scalar beside the per-user aggregate (same lifetimes, same censoring rule)",
    "q283_kuiper_test" ->
      "crossJoin(broadcast(totals)): the ksTest discipline — single-row (n_a, n_b) scalars beside the distinct-value spine",
    "q286_ansari_bradley" ->
      "crossJoin(broadcast(n)): the single-row pooled-total scalar the doubled midrank-score needs per value row",
    "q291_watson_u2" ->
      "crossJoin(broadcast(totals)): the ksTest discipline — single-row (n_a, n_b) scalars beside the distinct-value spine",
    "q293_two_sample_card" ->
      "crossJoin(broadcast(totals)): the ksTest discipline — the fused card's single-row (n_a, n_b) scalars beside the shared spine",
    "q294_kgroup_card" ->
      "crossJoin(broadcast(median/totals/ties)): q279's single-row pooled-median and moment scalars beside the bounded group table",
    "q287_lepage" ->
      "crossJoin(broadcast(n)): q286's single-row pooled-total scalar (the AB score leg shares the spine)",
    "q297_scale_card" ->
      "crossJoin(broadcast(bartlett/welch one-row legs)) + crossJoin(broadcast(totals)): the q294 fused-card discipline — every cross is a one-row audited aggregate beside the bounded group table",
    "q298_variance_ratio" ->
      "crossJoin(broadcast(side b)): the welchTTest discipline — two single-row moment aggregates meet in a one-row broadcast cross",
    "q299_yuen_trimmed" ->
      "crossJoin(broadcast(totals)) per side + crossJoin(broadcast(side b)): the ksTest/welchTTest disciplines — single-row trim-count scalars beside each value spine, then two one-row sides cross",
    "q284_rmst" ->
      "crossJoin(broadcast(end)) inside the composed kaplanMeier + crossJoin(broadcast(n_users)): both single-row scalars beside bounded frames",
    "q181_retrieval_metrics" ->
      "crossJoin(broadcast(query set)) on both retrieval sides: exact scoring is O(|corpus|*|Q|) by definition (q93's discipline); shuffles are k-bounded by TopKPairs",
    "q183_windowed_pmi" ->
      "crossJoin(broadcast(totals)): single-row unigram/pair-total scalars, pair stream maps through (q139's discipline)",
    "q184_association_rules" ->
      "crossJoin(broadcast(n_users)): the single-row user total beside the types^2-bounded rule table",
    "q186_chi_square" ->
      "distinct-A x distinct-B densification cross: both dimension sets are bounded categorical universes (types x weekdays), and absent cells must exist to contribute their expected mass",
    "q190_source_jsd" ->
      "groups x groups non-equi pair join over the v-bounded per-group array frame — the matrix is pairwise by definition and groups are a bounded dimension",
    "q192_theil" ->
      "crossJoin(broadcast(totals)): the single-row global mass/total scalars beside the groups-bounded per-group frame",
    "q193_session_paths" ->
      "crossJoin(broadcast(total)): the single-row session-count scalar beside the path frequency table",
    "q194_lsh_plan" ->
      "crossJoin(broadcast(best)): the single-row max-score scalar beside the divisor-bounded literal frame — no data is touched at all",
    "q200_dataset_card" ->
      "crossJoin(broadcast(contamination totals)): two single-row aggregates meeting in the one-row card",
    "q200c_card_contam_rate" ->
      "crossJoin(broadcast(contamination totals)): q200's contamination column bisected out, same two single-row aggregates",
    "q217_governance_card" ->
      "crossJoin(broadcast(...)) chain of ONE-ROW audit frames (calibration summary x fairness gaps x PSI) meeting in the one-row card (the q200 discipline)",
    "q215_score_drift" ->
      "crossJoin(broadcast(totals)): single-row side totals; the data side is the fixed bins-row spine (the q117/q211 discipline); decile cutpoints are plan literals",
    "q220_ks_test" ->
      "crossJoin(broadcast(totals)): the single-row side totals beside the distinct-value cumulative table — the cross-mass needs both totals on every row",
    "q222_wasserstein" ->
      "crossJoin(broadcast(totals)): the single-row side totals + value range beside the distinct-value cumulative table (q220's discipline); the next-value gap is an index equi-join",
    "q248_energy_distance" ->
      "crossJoin(broadcast(totals)): q222's single-row side totals + value range beside the gap table, twice (per-gap terms need the side sizes; displays take counts from the totals row after the roll-up)",
    "q226_rate_diff" ->
      "crossJoin(broadcast(...)): two ONE-ROW conditional aggregates (one per slice) meeting in the one-row comparison (the q200 discipline)",
    "q232_fdr_screen" ->
      "crossJoin(broadcast(groups)) building the bounded groups x values KS spine (the q186 bounded-dimension discipline — a value absent from a group still moves its complement's CDF) + the one-row totals broadcast (q220's discipline)",
    "q235_w1_screen" ->
      "q232's crossJoin(broadcast(groups)) spine + the one-row totals broadcast, twice (per-gap term needs n; displays need vmin/vmax after the group roll-up)",
    "q238_cvm_test" ->
      "crossJoin(broadcast(totals)): the single-row side totals beside the distinct-value cumulative table, twice (per-class terms need n_a/n_b; the r14-advisor pattern takes the displayed counts from the totals row after the roll-up) — q220's discipline",
    "q239_ad_ksample" ->
      "q232's crossJoin(broadcast(groups)) spine + the one-row totals and group-count broadcasts after the roll-up (the r14-advisor pattern: k/n report real counts even on a degenerate spine)",
    "q241_delta_screen" ->
      "q232's crossJoin(broadcast(groups)) spine + the one-row totals broadcast after the group roll-up (n_rest needs n; the groupedW1 left-join degenerate discipline keeps counts real when a group's complement is empty)",
    "q249_drift_card" ->
      "q232's crossJoin(broadcast(groups)) spine + the one-row totals broadcast feeding the fused three-fold aggregate (the card computes KS+W1+delta from ONE spine — the whole point)",
    "q247_breslow_day" ->
      "crossJoin(broadcast(totals)): the one-row common-OR scalar carried back across the stratum table (the fitted-cell quadratic needs R per stratum), plus the one-row totals beside the final grain-sum roll-up",
    "q242_jt_trend" ->
      "the values-spine crossJoin(broadcast(groups)) (bounded ordered groups x pooled distinct values — an absent value still moves a group's prefix mass) + the two one-row group/tie-moment broadcasts meeting the one-row JT aggregate in literal crosses",
    "q234_kruskal_wallis" ->
      "crossJoin(broadcast(ties)): the single-row tie-mass scalar beside the one-row group roll-up (q220's totals discipline)",
    "q211_psi" ->
      "crossJoin(broadcast(totals)): single-row token totals; the data side is the fixed buckets-row spine (q117's discipline)",
    "q212_drift_attribution" ->
      "crossJoin(broadcast(totals)): single-row token totals beside the fixed buckets-row spine (q117's discipline); the top-k is a TakeOrderedAndProject",
    "q116_importance_weights" ->
      "crossJoin(broadcast(totals/median)): single-row scalars, corpus side streams through",
    "q117_distribution_drift" ->
      "crossJoin(broadcast(totals)): single-row token totals; the data side is the fixed buckets-row spine",
    "q123_dup_spectrum" ->
      "crossJoin(broadcast(vocab total)): single-row scalar against the (at most |corpus|-row) df histogram",
    "q124_knn_centrality" ->
      "crossJoin(broadcast(query set)) for the exact edge build (swap to IVF at scale) + one-row dangling-mass crossJoin per iteration",
    "q128_tfidf_keywords" ->
      "crossJoin(broadcast(N)): single-row doc-count scalar; the data side is the (doc, token) tf frame",
    "q129_bm25_search" ->
      "crossJoin(broadcast(stats)): single-row N/avglen/df scalars, corpus side streams through map-side",
    "q133_perplexity_bands" ->
      "crossJoin(broadcast(cuts)): single-row tercile scalars; band labels are a map-side comparison",
    "q136_kappa_agreement" ->
      "crossJoin(broadcast(pe)): single-row expected-agreement scalar joined to the single-row observed stats",
    "q139_pmi_collocations" ->
      "crossJoin(broadcast(totals)): single-row bigram/unigram-total scalars, pair stream maps through",
    "q141_vocab_growth" ->
      "crossJoin(broadcast(nDocs)): single-row corpus-size scalar for the decile map",
    "q147_seq_packing" ->
      "crossJoin(broadcast(bounds)): single-row (min,max) id scalars for the deterministic bucket formula",
    "q148_distinct_sketch" ->
      "crossJoin(broadcast(globalExact)): single-row exact-distinct scalar beside the single-row union sketch",
    "q201_hybrid_rrf" ->
      "crossJoin(broadcast(query vector)) inside the dense top-k (q93's discipline) + the one-row BM25 stats scalar; the fusion join itself is a k-bounded equi-join",
    "q219_rbo" ->
      "q201's input lists verbatim: crossJoin(broadcast(query vector)) in the dense top-k + the one-row BM25 stats scalar; the RBO join itself is a k-bounded equi-join",
    "q202_token_burstiness" ->
      "crossJoin(broadcast(n)): single-row corpus-size scalar beside the per-token moment table",
    "q203_embedding_isotropy" ->
      "crossJoin(broadcast(...)) chain of ONE-ROW frames: centroid array, scalar counts, cos sum — nothing corpus-sized on either side",
    "q205_temporal_split" ->
      "crossJoin(broadcast(cuts)): the single-row quantile-cutoff pair beside the stream; labeling is a map-side comparison",
    "q206_conformal_interval" ->
      "crossJoin(broadcast(...)) of ONE-ROW frames only: the OLS fit and the k-th-residual threshold beside the scored stream",
    "q208_ols_crossval" ->
      "crossJoin(broadcast(global moments)): the single-row global-moment frame beside the k-row fold-moment table",
    "q255_dunn_posthoc" ->
      "crossJoin(broadcast(ties)): the single-row tie-mass scalar beside the single-row collected group list",
    "q258_holm_screen" ->
      "q232's groupedKsTest spine: crossJoin(broadcast(groups)) of the bounded group table against the distinct-value spine (a value absent from a group still moves its complement's CDF)",
    "q264_krippendorff" ->
      "crossJoin(broadcast(pooled)): the single-row pooled-histogram list beside the single-row observed-disagreement moments",
    "q265_assoc_card" ->
      "crossJoin of the two DISTINCT label sets (bounded-by-arity x bounded-by-arity) to densify absent cells — the chiSquareIndependence discipline; margins re-enter as broadcasts",
    "q266_auc_ci" ->
      "crossJoin(broadcast(totals)): the single-row positive-count scalar beside the distinct-score histogram (a01 needs P)",
    "q267_welch" ->
      "crossJoin(broadcast(side B moments)): two SINGLE-ROW moment frames",
    "q268_signed_rank" ->
      "crossJoin(broadcast(moment agg)): the single-row unit count beside the single-row rank moments",
    "q270_cohens_h" ->
      "crossJoin(broadcast(side B masses)): two SINGLE-ROW conditional aggregates (proportionDiff's shape)",
    "q274_by_screen" ->
      "q232's groupedKsTest spine: crossJoin(broadcast(groups)) of the bounded group table against the distinct-value spine"
  )

  /** One shared physical-plan pass for every rule in this suite (plan
    * construction dominates the suite's runtime — don't pay it per rule).
    */
  private lazy val plans: Seq[(String, org.apache.spark.sql.execution.SparkPlan)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan =
        try fn(spark, sf()).queryExecution.sparkPlan
        catch {
          case e: Throwable =>
            fail(s"$name failed to build a plan: ${e.getMessage}")
        }
      name -> plan
    }

  test("no CartesianProduct / BroadcastNestedLoopJoin outside the exempt list") {
    val offenders = plans.flatMap { case (name, plan) =>
      val s = plan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(s.contains)
      if (bad.nonEmpty && !exempt.contains(name)) Some(s"$name: ${bad.mkString(",")}")
      else None
    }
    assert(offenders.isEmpty,
      s"nested-loop joins outside the exempt list:\n  ${offenders.mkString("\n  ")}")
  }

  test("exempt list is tight: every exempt query still plans (no stale names)") {
    val unknown = exempt.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"exempt entries with no matching query: $unknown")
  }

  /** Queries allowed a WindowExec with an EMPTY partition spec (the
    * "Moving all data to a single partition" shape), each with the reason
    * the windowed frame is bounded by construction — every one sits above
    * a limit/top-k/fixed-cardinality reduction, so the single partition
    * holds k rows, not the corpus. An empty-partition window over an
    * UNBOUNDED input (r8's vocabularyGrowth global row_number) fails here
    * instead of at 100 TB.
    */
  private val singlePartitionWindowExempt: Map[String, String] = Map(
    "q126_weighted_sample" ->
      "rank re-derived over the already-limit(k)'d sample (Sampling.scala:181) — k rows",
    "q129_bm25_search" ->
      "rank re-derived over the already-limit(topN)'d scores (Ranking.scala:115) — topN rows",
    "q141_vocab_growth" ->
      "running-vocab cumsum over the `buckets`-row curve (10 rows) — fixed cardinality",
    "q150_zipf_slope" ->
      "rank over the top-n=200 token head (TakeOrderedAndProject) — fixed cardinality",
    "q201_hybrid_rrf" ->
      "ranks re-derived over the already-limit(topN)'d fused list (and bm25Rank's limit(20) head) — k rows",
    "q219_rbo" ->
      "bm25Rank's rank over its already-limit(10)'d head — k rows (q201's discipline)",
    "q202_token_burstiness" ->
      "rank re-derived over the already-limit(topM)'d moment head — topM rows"
  )

  private lazy val singlePartitionWindowOffenders: Set[String] = {
    import org.apache.spark.sql.execution.window.WindowExec
    plans.flatMap { case (name, plan) =>
      val empties = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (empties.nonEmpty) Some(name) else None
    }.toSet
  }

  test("no single-partition WindowExec outside the exempt list") {
    val offenders =
      singlePartitionWindowOffenders -- singlePartitionWindowExempt.keySet
    assert(offenders.isEmpty,
      "single-partition WindowExec outside the exempt list " +
        s"(unbounded global sort at scale):\n  ${offenders.toSeq.sorted.mkString("\n  ")}")
  }

  test("single-partition-window exempt list is EXACT (stale entries fail)") {
    val stale =
      singlePartitionWindowExempt.keySet -- singlePartitionWindowOffenders
    assert(stale.isEmpty,
      s"window-exempt entries whose query no longer plans a global window: $stale")
  }

  test("no fractional DECIMAL in any final output schema (r12 gate-parity rule)") {
    // the driver's gate reads Spark parquet and DuckDB results through
    // client paths that disagree on trailing-zero decimal rendering
    // ("0.5540" vs "0.554" — the r10/r11 q200 red, three rounds of it).
    // DECIMAL is welcome INSIDE a plan (exact order-free moments, the
    // q46 discipline) but a scale > 0 decimal must be cast away before
    // the final projection; one-row rates ship as BIGINT basis points
    // plus raw integer masses. Scale-0 decimals are exempt: they render
    // with no fractional part on every client path (q195's DECIMAL(38,0)
    // checksum NEEDS the width — an order-free row-hash sum over 10^12
    // rows overflows BIGINT — and has been gate-green since r9).
    import org.apache.spark.sql.types.DecimalType
    val offenders = plans.flatMap { case (name, plan) =>
      val dec = plan.schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] &&
          f.dataType.asInstanceOf[DecimalType].scale > 0 => f.name
      }
      if (dec.nonEmpty) Some(s"$name: ${dec.mkString(", ")}") else None
    }
    assert(offenders.isEmpty,
      s"fractional DECIMAL reached a final output schema:\n  ${offenders.sorted.mkString("\n  ")}")
  }

  test("no exact-percentile aggregate anywhere, grouped or not (r10 q116 flag, r13 grouped)") {
    // an exact Percentile buffers every input value of its (group's)
    // state in one unsplittable aggregation buffer — an executor OOM at
    // corpus scale. Ungrouped was banned in r10 (GlobalRank
    // .percentileValues is the sanctioned replacement); r13 extends the
    // ban to GROUPED percentile too: "grouped by lang/event_type" bounds
    // the group COUNT, not the group SIZE — ten groups over 100 TB still
    // buffer 10 TB each. GlobalRank.groupedPercentileTable is the
    // bit-identical bounded replacement (q34/q75/winsorize/MAD all ride
    // it now). No exempt list — approximate sketches
    // (ApproximatePercentile, KllSketch) are unaffected.
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile
    val offenders = plans.flatMap { case (name, plan) =>
      val bad = plan.collect {
        case a: BaseAggregateExec if a.aggregateExpressions.exists(
            _.aggregateFunction.isInstanceOf[Percentile]) => a
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"exact percentile aggregate (unsplittable whole-group buffer):\n  ${offenders.sorted.mkString("\n  ")}")
  }
}
