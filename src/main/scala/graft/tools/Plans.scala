package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps the formatted physical plan of each headline query to PLANS.md —
  * the plan-shape audit trail (pushdown, broadcasts, single-shuffle
  * claims are checkable facts, not prose).
  * Usage: runMain graft.tools.Plans [sfDir] [outFile]
  */
object Plans {
  private val Headliners = Seq(
    "q01_point_lookup" -> "filter pushed to parquet scan (PushedFilters), 3-column pruned read",
    "q02_time_range" -> "raw-nano range comparisons pushed to row-group stats (hypertable chunk-exclusion analog)",
    "q11_agg_pricing" -> "partial_sum/partial_count map-side (HashAggregate x2): shuffle carries 6 groups, not 600k rows",
    "q13_star_join" -> "dims broadcast (BroadcastHashJoin x4), single fact-table pass, no fact shuffle before aggregation",
    "q20_minhash_lsh" -> "one NARROW exchange on (band_id, band_hash, id) — pairs dedup before the signature join-back, so est-Jaccard runs once per unique pair and the widest shuffle never carries signature arrays",
    "q23_knn_brute" -> "TakeOrderedAndProject: per-partition top-k heaps, k-row driver merge, no global sort",
    "q29_asof_join" -> "single hash exchange for the union+window as-of core; final exchange is the 150-row output sort",
    "q31_window_rank" -> "one exchange on user_id, per-key sort, rank filter before projection",
    "q42_lateral" -> "LATERAL scalar subquery decorrelated into a Project — NOT a nested-loop join; filter stays predicate-pushable",
    "q44_window_analytics" -> "lag + framed moving sum share ONE exchange + one sort on (user_id; ts, event_id)",
    "q45_pivot" -> "pivot plans as two-phase hash aggregate: shuffle carries days x 5 counters, not events",
    "q51_simhash_neardup" -> "one exchange on the exploded (segment, value) key; popcount verify after the bucket self-join",
    "q54_salted_agg" -> "two even exchanges: (key, salt) partials then key merge — no single hot reducer",
    "q61_heavy_hitters" -> "MisraGries partial_misra_gries map-side: the shuffle carries one k-entry sketch per partition, not rows",
    "q64_sessionize" -> "lag + running-sum + session agg share ONE exchange on user_id (window spec reuse)",
    "q66_word_freq" -> "explode collapses map-side (partial count before the token shuffle); top-k is TakeOrderedAndProject, no global sort",
    "q67_tfidf" -> "token-stream agg computed once (persisted InMemoryRelation feeds both tf join and df agg); top-1 is a min_by hash aggregate with map-side partials (r13) — each partition ships one candidate per doc, no per-doc window sort",
    "q76_embed_centroid" -> "posexplode (64x fan-out) collapses immediately: partial decimal sums map-side, shuffle carries labels x dims, not elements",
    "q88_search_indexed" -> "trigram sidecar prunes the scan's file list BEFORE planning: InMemoryFileIndex holds only candidate files (vs 16 in the store), exact ILIKE applied to the pruned read",
    "q89_decontaminate" -> "eval gram universe distinct-aggregates then BroadcastHashJoin: the train gram stream is scored map-side and partial-aggregates before its only shuffle (per-doc hit counts)",
    "q93_batch_retrieval" -> "bounded top_k_pairs ObjectHashAggregate: partial buffers hold at most k pairs, so the post-scoring shuffle carries k rows per (partition, query) — never the scored cross product (a window row_number would)",
    "q95_range_join_binned" -> "keyless range join plans as a hash equi-join on _bin (NO BroadcastNestedLoopJoin anywhere in the plan); interval fanout <= 2 bins, range predicate verifies post-join",
    "q98_survivorship" -> "winner election is a max_by hash agg over the clustered sliver only (map-side partials) + join-back; singletons short-circuit on the left join's null side — no full-corpus window sort",
    "q99_json_contains_shred" -> "containment on a PROMOTED payload field: EqualTo(p_k,42) lands in PushedFilters of the parquet scan (row-group stats + dictionary skipping — the jsonb_path_ops GIN analog)",
    "q100_semantic_dedup" -> "assembly plan runs over the CHECKPOINTED pair graph (Scan ExistingRDD) and carries only (id, label, score) columns; pair generation executed once upstream as a hash equi-join on the replica-cluster key (code: Dedup.semanticDedup — never all-pairs), centroids enter as plan literals in the InMemoryRelation projection",
    "q102_dup_ngram_fraction" -> "exploded gram stream partial-aggregates map-side before its only wide shuffle (per-gram doc counts); join-back on the gram key feeds a per-doc hash agg — both exchanges carry compact keys, never documents",
    "q104_incremental_dedup" -> "corpus side reduces to DISTINCT fingerprints before any join; batch-first election is a min hash agg — every exchange carries (fp, id) pairs and total cost scales with the batch, not the corpus",
    "q105_curation_pipeline" -> "gate -> dedup -> decontamination fuse into one plan: gate predicates evaluate map-side on the first scan, dedup winners and contamination hits reduce to compact id/key aggregates joined back — no stage materializes an intermediate corpus",
    "q106_interval_overlap" -> "both-sides-interval overlap plans as a hash equi-join on _bin (NO BroadcastNestedLoopJoin); the canonical-cell claim is a post-join filter, so no dedup exchange follows the join",
    "q107_passage_removal" -> "positional gram stream partial-aggregates into the min!=max cross-doc test map-side; the only wide exchanges carry (gram) and (doc, position-set) — reconstruction is a map-side indexed array filter, never a per-token window sort",
    "q108_containment_pairs" -> "only rarest-first PREFIX grams enter the candidate equi-join (stop-gram postings generate no candidates) and the WWW'08 length filter (m_b*tauDen >= m_a*tauNum, r13) drops never-qualifying short-b pairs before the pair distinct; exact verify is an array_intersect projection after two compact id joins — the full gram cross product never forms",
    "q109_mixture_resample" -> "the corpus never shuffles: per-group token totals broadcast back (BroadcastHashJoin) and the one-row corpus total enters as a broadcast nested-loop of cardinality 1 — the keep decision is a map-side integer predicate",
    "q110_quantized_ann_contract" -> "both retrieval paths score map-side against broadcast queries into k-bounded top_k_pairs aggregates; quantization stats join as a broadcast one-row array pair — the corpus is scanned twice, shuffled never",
    "q111_group_topk" -> "group-wise top-k is a k-bounded ObjectHashAggregate (top_k_pairs partial heaps per partition per group) — NOT a window Exchange+Sort of every row of every group",
    "q113_mad_outliers" -> "two GlobalRank.groupedPercentileTable passes (r13: range-bucketed distributed order statistics — per-(bucket, type) windows, bounded offsets, driver interpolation of <= 2 rows per type) replace the grouped percentile aggregates whose state held whole groups; the broadcast fences join back map-side and outlier counting is one hash agg",
    "q57_split_leakage" -> "the split tag is computed ONCE per doc and rides the band explode, so same-split collisions (~82%) drop BEFORE the pair distinct; shingle-array verify joins plan as ShuffledHashJoin (no sort ever touches array-payload rows)",
    "q115_bigram_ce" -> "positional bigrams generate map-side from the token array (no positions self-join anywhere in the plan); bigram and continuation counts partial-aggregate before their 8-byte-key exchanges; the ln/avg is a post-join projection into one per-doc hash agg",
    "q116_importance_weights" -> "the corpus shuffles only by the 8-byte bucket id; both model sides reduce to fixed buckets-row count tables; totals and the exact interpolated median enter as one-row broadcasts — the keep decision is a map-side comparison",
    "q124_knn_centrality" -> "the kNN edge build is ONE map-side MatrixTopK projection over the embeddings scan (the candidate matrix rides as an expression reference object — no n²-row join or shuffle before the explode); the in-process PageRank fixpoint re-enters as Scan ExistingRDD",
    "q126_weighted_sample" -> "Efraimidis-Spirakis keys are a map-side projection; the global top-k plans as TakeOrderedAndProject (per-partition k-heaps, k-row driver merge — no global sort); the rank window runs over the already-reduced k rows",
    "q127_blocklist_match" -> "multi_match evaluates inside WholeStageCodegen on the scan projection — ONE Aho-Corasick pass per row for the whole pattern set; nothing shuffles except the ordered output",
    "q128_tfidf_keywords" -> "tf and df derive from one (doc, token) aggregate chain — exchanges carry compact token keys with map-side partials, the one-row N scalar broadcasts, and the per-doc top-k window sorts vocabulary-bounded partitions, never the corpus",
    "q129_bm25_search" -> "every per-term tf is a map-side array projection (the query terms live in the plan); the one-row N/avglen/df stats aggregate broadcasts back; top-n plans as TakeOrderedAndProject",
    "q131_mmr_select" -> "the candidate pool is distributed cosine scoring into TakeOrderedAndProject (per-partition heaps, poolSize-row merge); the greedy MMR refinement enters as a bounded Scan ExistingRDD — no pairwise shuffle anywhere",
    "q134_label_noise" -> "the 5-NN build is the map-side matrix scan; votes hash-aggregate at most k rows per node and the argmax is a min_by hash agg with map-side partials (r13 — no window exchange+sort) — the widest exchange carries (id, label) pairs",
    "q142_whitening_contract" -> "the whitening fit never shuffles: the moment pass is a per-partition (n, sum-x, sum-xx^T) mapPartitions fold collected as one bounded row per partition, and the fitted d x d transform applies inside WholeStageCodegen as an expression reference object — no join, no exchange in the transform plan",
    "q145_data_profile" -> "every profile metric folds into ONE wide aggregate: the exact multi-column distincts share a single Expand (rows x profiled-columns before partial agg — the textbook multi-distinct plan), min/max/null partials ride the same pass, and the report pivot is a literal-array explode of the one driver row — no second scan",
    "q147_seq_packing" -> "the global token cumsum never global-sorts: the deterministic id-range bucket formula is a map-side projection, per-bucket totals hash-aggregate map-side into a B-row driver prefix that re-enters as a broadcast join, and each bucket window-sorts only its own slice",
    "q148_distinct_sketch" -> "per-source HLL sketches partial-aggregate map-side (the exchange carries kilobyte sketch buffers, not tokens); the union row merges the per-source sketches with hll_union_agg — the token stream is never re-shuffled to answer the global question",
    "q141_vocab_growth" -> "the decile map's global rank is DISTRIBUTED: a value-formula id-range bucket projection, 32-row count agg -> driver prefix -> broadcast join, and per-range row_number windows — no single-partition WindowExec over the corpus anywhere (r8's scale gap, now pinned by PlanGuardSpec); the token explode partial-aggregates into the min-bucket agg, the only full-width exchange",
    "q149_bpe_pairs" -> "adjacent-pair candidates generate once per word TYPE — the word->freq hash agg collapses the token stream BEFORE pair generation, so the pair explode runs over the type table; both aggs partial map-side, top-k is TakeOrderedAndProject",
    "q150_zipf_slope" -> "the token-count agg is the only full-width exchange; the OLS fold runs over the top-200 TakeOrderedAndProject head collected into one rank-ordered array — fixed-cardinality tail work, no global sort",
    "q151_bpe_encode" -> "the learned merge table rides as a literal reference object inside the encode expression (WholeStageCodegen, no join/shuffle/UDF serialization); the roundtrip/substring contract folds into one wide aggregate pass over the encoded projection",
    "q152_kll_contract" -> "KLL sketches partial-aggregate map-side — the exchange carries bounded sketch buffers, never values; the exact-median twin is GlobalRank.percentileValues (distributed rank, no corpus-sized buffer) and both meet in a one-row contract projection",
    "q153_pq_ann_contract" -> "both the ADC shortlist and the exact re-rank score map-side against broadcast queries (codebooks are plan literals); shortlists are k-bounded top_k_pairs aggregates, and the exact path re-ranks only the shortlist join — the corpus shuffles nowhere",
    "q154_winnowing" -> "the md5 gram-hash array binds ONCE per doc inside the posexplode Generate (projection collapse cannot re-inline it into per-window lambdas — r8's quadratic trap); selection is a per-doc sliding window-min whose hash(doc_id) partitioning the DISTINCT reuses (no second exchange) — linear work, one shuffle",
    "q155_winnowing_overlap" -> "PPJoin-style postings intersection over the PERSISTED fingerprint postings (InMemoryRelation feeds the df agg and both self-join sides — unpersisted lineage re-hashes every gram up to 4x); the df-band filter bounds per-fingerprint fan-out at maxDf^2 and every exchange carries (fp, id) longs",
    "q157_ivfpq_ann_contract" -> "the IVFADC engine path probes inverted lists via a broadcast-hash EQUI-join on cluster (the |Q|*nprobe probe frame carries each query's residual LUT; corpus rows score with m array reads) — the only nested loops in the plan are the contract's brute-force exact side and single-row metric joins",
    "q158_nb_lang_predict" -> "one id-keyed text shuffle before gram generation serves the (id,lbl,gram) count AND the per-id scoring fold (no gram-row exchange anywhere); the k-class log-prob model joins back as a BroadcastHashJoin on the gram key and every class score folds map-side in one pass over the persisted doc-gram frame",
    "q160_edit_join" -> "only the q*tau+1 rarest prefix grams per string enter the candidate equi-join (rarest-first order from a hash agg + in-array sort — no window over the gram stream); an explicit-count round-robin repartition spreads the byte-small postings before the broadcast candidate join (AQE would coalesce them to one partition and serialize the 100x larger verify behind it); verification is the free length cull + banded thresholded levenshtein, dedup AFTER verify on the 40x narrower matched stream",
    "q161_kneser_ney_ce" -> "the positional bigram generator is an in-array transform (no positions self-join); all three count tables hash-aggregate map-side before 8-byte tagged-key exchanges, C(u-dot) and N1+(u-dot) fold in ONE grouped agg, and the bigram-type total enters as a one-row broadcast — the corpus shuffles only 8-byte keys",
    "q162_gopher_repetition" -> "everything is WITHIN-doc, so no corpus-global state exists: the tagged {2,3,4}-gram generator partial-aggregates (doc, n, gram) counts map-side, the per-(doc, n) top gram is a min_by hash agg over the already-reduced count rows (r13 — map-side partials, no top-1 window sort), and the 5-gram coverage pass joins positional grams back on (doc, gram) — every exchange is doc-keyed and the operator scales with documents, never their cross product",
    "q163_count_min" -> "the sketch is a bounded aggregate: the depth-fan-out token stream partial-aggregates map-side into a (row, bucket) table whose key cardinality is depth x width regardless of corpus size, so the only sketch exchange carries at most 1024 counter rows; the probe side joins the broadcast counter table and the exact top-20 twin is a TakeOrderedAndProject",
    "q164_temperature_resample" -> "the corpus never shuffles: per-group token totals and the one-row max-boost scalar broadcast back, and the keep decision is a map-side rounded-rate comparison against the md5 16-bit draw — the same stateless-under-streaming shape as mixtureResample",
    "q165_passage_keep_first" -> "same three fixed-width-key exchanges as q107's strip-both twin: positional grams partial-aggregate into the per-gram (count, min-(id,pos)) election map-side, the join-back carries only NON-first occurrences, and reconstruction is a map-side indexed array filter — no per-token window sort anywhere",
    "q166_lexical_diversity" -> "a pure map-side projection: the sliding distinct-count windows evaluate in-row over the bound token array (no explode, no join, NO shuffle at any corpus size) — the only exchange in the plan is the output sort",
    "q167_term_dispersion" -> "the (part, token) hash agg is the only corpus-width exchange (persisted: part sizes, term totals, and the probe side all derive from it); the count table prunes to the top-k tokens through a broadcast join, so the absent-part spine's left join is bounded-vs-bounded and hinted broadcast",
    "q168_quality_classifier" -> "each Newton step is one aggregation pass over the persisted feature frame whose exchange carries ~d^2 doubles per partition regardless of rows; the solve is driver arithmetic on a 5x5 system, and scoring applies the coefficients as plan literals inside WholeStageCodegen — no join, no shuffle in the score path",
    "q169_transition_matrix" -> "one shuffle: the lead window on (user; ts, id); the (from, to) count table is types^2-bounded so its aggregate collapses map-side and the row-total normalizer joins back as a BroadcastHashJoin on the from key",
    "q170_rfm_segments" -> "the event table shuffles once (the per-user agg with DECIMAL monetary partials); the 12 quintile cuts are one tiny percentile aggregate over the per-user frame that re-enters as a one-row broadcast, and banding is a map-side <=-chain",
    "q171_clustering_coeff" -> "the kNN edge build is the map-side matrix projection (no n^2 join); mutualization and the wedge closure are 8-byte-key equi-joins over the persisted n*k mutual edge list, with per-node fan-out capped at k^2 — total work O(n*k^2)",
    "q172_replication_plan" -> "the replica count is a map-side scalar (floor + seeded md5 Bernoulli, coefficients in the plan); the per-group weights enter through one BroadcastHashJoin on the group key — the corpus neither shuffles nor sorts",
    "q173_eval_contamination" -> "the train gram stream never shuffles: it semi-filters map-side against the broadcast eval gram universe, only the intersection reaches the distinct agg, and the per-eval-doc count joins against the broadcast hit set",
    "q174_canonical_text" -> "one codegen'd scalar expression inside WholeStageCodegen over the scan projection — no UDF serialization, no join, no shuffle except the output sort",
    "q175_jaro_winkler_join" -> "one equi-join on the two-token block key generates candidates (quadratic only within a block — blocking cardinality is the explicit scale knob, a hot block is an AQE skew case); the JW verify is a codegen'd map-side scalar on the joined pairs — no gram explode, no window, no second exchange",
    "q176_ewma_anomaly" -> "one shuffle: the (type, day) aggregate collapses the event stream map-side; the per-type series is a bounded array and every EWMA is an in-row prefix fold — no window, no self-join, nothing scales with row count past the first agg",
    "q177_benford" -> "the digit aggregate has 9 keys, so partial aggregation collapses the scan map-side and the exchange carries 9 counter rows; the spine join and the one-row total are broadcasts",
    "q178_rake_keywords" -> "every exchange hashes on doc_id: one running-sum window on (doc; pos) assigns phrase ids over doc-length-bounded partitions, word stats and phrase folds are doc-keyed aggs, and the top-k window ranks at most phrases-per-doc rows — nothing corpus-global anywhere",
    "q179_cusum" -> "q176's shape verbatim: one (type, day) aggregate collapsing map-side, bounded per-type series arrays, in-row prefix folds for both one-sided sums — no window, no self-join",
    "q180_kaplan_meier" -> "one per-user aggregate is the only corpus-width exchange; the observation end is a one-row broadcast, and the calendar-bounded lifetime histogram collapses to a single in-row array where the KM product evaluates as nested folds — no window, no sort of user rows",
    "q181_retrieval_metrics" -> "both retrieval sides are map-side broadcast-query scoring into k-bounded top_k_pairs aggregates (q93's shape); the metric layer is two query-keyed k-row collects joined on query_id with every metric an in-row fold — nothing past the scoring scales with the corpus",
    "q182_readability" -> "pure map-side regexp arithmetic inside WholeStageCodegen over the scan projection — no join, no aggregate, no shuffle except the output sort",
    "q183_windowed_pmi" -> "pairs generate map-side from w shifted in-array zips (no positions self-join anywhere in the plan); pair and unigram counts partial-aggregate above their generators, totals broadcast as one row, and the top-k is TakeOrderedAndProject",
    "q184_association_rules" -> "the event stream collapses to distinct (user, type) baskets map-side; the pair self-join on user fans out at most types^2 rows per user, item counts are types-bounded, and the user total broadcasts — no corpus-scale exchange after the first distinct",
    "q185_gini" -> "the per-key counts reduce to a value histogram bounded by the max count (not by keys), which collapses to one in-row array — the rank formula never sorts or windows the key population",
    "q186_chi_square" -> "one bounded contingency aggregate collapses the event stream map-side; densification is a bounded-vs-bounded cross and everything after is in-row folds over the sorted cell array",
    "q187_word_vectors" -> "the distributed side is two bounded aggregates — the top-V vocab (TakeOrderedAndProject) and the window pair table generated from in-array shifted zips with map-side partials; the V x V matrix, PPMI, and Jacobi eigen run as bounded driver arithmetic (the whitening/PCA fit-small discipline)",
    "q188_lang_id_report" -> "the NB prediction plan is q158's (one id-keyed text shuffle, broadcast model); the report layer adds one bounded (label, predicted) contingency agg and classes-bounded margin joins — nothing new scales with the corpus",
    "q189_autocorrelation" -> "q176's shape: one (type, day) aggregate collapsing map-side, then every lag's correlation is an in-row fold over the calendar-bounded series — no window, no self-join, no lag exchange",
    "q190_source_jsd" -> "the (group, token) aggregate prunes against the broadcast top-v vocab before its exchange; densification and the pair matrix are bounded-by-groups frames and both KL folds run in-row — the corpus is touched exactly twice (vocab agg + count agg)",
    "q191_wilson_interval" -> "one hash aggregate with map-side conditional partials; the interval arithmetic is a codegen'd scalar chain on the groups-bounded result — nothing else touches the corpus",
    "q192_theil" -> "the per-(group, value) histogram is bounded by the max count, not rows; group stats, the index, and the decomposition all evaluate as in-row folds over two bounded array levels — no sort or window of the key population",
    "q193_session_paths" -> "one (user; ts, id) window assigns sessions (the q64 exchange); per-session paths collect over session-bounded slices, the path-frequency agg collapses map-side, and top-k plans as TakeOrderedAndProject — no global sort",
    "q195_export_manifest" -> "one hash aggregate: the md5 row hash evaluates map-side inside WholeStageCodegen and DECIMAL partials collapse before the shards-bounded exchange — the manifest costs a single scan",
    "q156_entropy" -> "the char side is entirely in-row (alphabet-bounded distinct set, the char array bound as a multi-referenced column); the word side explodes into a (doc, token) hash agg with map-side partials and one per-doc sorted fold — one 8-byte-keyed exchange",
    "q159_trigram_ce" -> "positional trigram/bigram generators are in-array transforms (no positions self-join anywhere); five vocabulary-bounded count tables hash-aggregate map-side over tagged-xxhash64 keys and join back as 8-byte equi-joins; the token total is a one-row broadcast",
    "q194_lsh_plan" -> "no data is touched: the divisor-bounded literal frame evaluates the S-curve as codegen'd scalar arithmetic, and the best-split flag joins a one-row max scalar",
    "q196_neyman_allocation" -> "one hash aggregate carrying exact integer moment partials; the normalizer and allocations fold in-row over the strata-bounded array — the corpus is scanned once",
    "q197_heaps_fit" -> "the bucket draw is a map-side integer projection (no rank machinery); per-bucket totals and first appearances are two map-side-collapsing hash aggs, and the OLS evaluates in-row over the 10-row spine",
    "q198_oov_rate" -> "the top-v vocab is a bounded TakeOrderedAndProject that joins back as a BroadcastHashJoin; the per-doc anti-membership count partial-aggregates map-side — one full-width token exchange total",
    "q199_dedup_yield" -> "the pair stream is q22's LSH-candidate + sorted-merge exact verify (never all-pairs); banding is a map-side floor projection and the curve's suffix sums fold in-row over the <= 10-band frame",
    "q200_dataset_card" -> "two single-row aggregates (the doc-level masses with a shared Expand for the exact fingerprint distinct; the contamination totals whose train gram stream semi-filters against the broadcast eval universe) meet in a one-row broadcast cross",
    "q137_quantile_norm" -> "the global rank is DISTRIBUTED (r10): repartitionByRange on (_x, id) -> per-bucket row_number windows partitioned by spark_partition_id -> bounded per-bucket offset broadcast — NO single-partition WindowExec anywhere (PlanGuardSpec pins it); per-group ranks parallelize across groups as before and the endpoint lookups are rank-keyed equi-joins",
    "q201_hybrid_rrf" -> "both retrieval legs are k-bounded before fusion: BM25's TakeOrderedAndProject head and the dense top_k_pairs aggregate; the RRF outer join and both rank windows run over <= 20-row frames — nothing after the legs scales with the corpus",
    "q202_token_burstiness" -> "one (doc, token) tf exchange with map-side partials is the only corpus-width shuffle; the per-token moment agg rides the same keys, the one-row N broadcasts, and top-M is TakeOrderedAndProject",
    "q203_embedding_isotropy" -> "three corpus passes, zero corpus-sized exchanges: the posexplode collapses into dim-bounded per-position integer sums map-side, the scalar agg is one row, and the cos pass scores map-side against the broadcast centroid array",
    "q204_winsorize" -> "per-type cuts come from GlobalRank.groupedPercentileTable (r13): range exchange on (type, value), per-(bucket, type) row_number windows, bounded cell-count offsets, <= 2 positional rows per type pulled for driver interpolation — no aggregation state ever holds a whole group; the 5-row cuts table broadcasts back and the clip is a map-side least/greatest inside WholeStageCodegen",
    "q205_temporal_split" -> "the one-row quantile-cutoff pair broadcasts beside the stream (cardinality-1 nested loop); labeling is a map-side comparison and the audit is a 3-key hash agg with map-side partials",
    "q206_conformal_interval" -> "exact decimal moments collapse map-side into the one-row OLS fit; residuals score map-side against the broadcast fit; the threshold is a k-bounded TakeOrderedAndProject over the calibration sliver; coverage is one more single-row agg — nothing corpus-sized shuffles",
    "q207_score_auc" -> "rows collapse to the per-score histogram in ONE row-level hash aggregate; midranks come from a distinct-score prefix-sum pass (range exchange + per-pid running sums + bounded offset broadcast — the r14 histogram-midrank kernel); the U statistic folds into ONE single-row aggregate — no row-level rank pass, no join back, no single-partition WindowExec",
    "q208_ols_crossval" -> "one fold-keyed moment aggregate (k rows) + a one-row global cross; the k complement fits broadcast back and the held-out residual pass is a second fold-keyed aggregate with map-side integer partials — two scans, zero corpus-sized shuffles",
    "q209_calibration" -> "one map-side projection (rational score, DECIMAL integral bin draw, 2^20 quantizations) + ONE bin-keyed hash aggregate with map-side partials — the only exchange carries B bins, not rows; every output column BIGINT",
    "q210_calibration_summary" -> "q209's bin aggregate collapses into a single-row roll-up: the ECE fold runs over the B-row sorted bin array in-row, the Brier mass is an order-free decimal sum — nothing corpus-sized past the first exchange",
    "q211_psi" -> "token stream partial-aggregates map-side into bucket counts (the only wide exchange carries 8-byte bucket ids); spine join + one-row totals broadcast; the PSI fold is a single-row aggregate over the fixed bucket spine",
    "q218_spearman" -> "rows collapse to the joint (x, y) histogram in ONE row-level hash aggregate (persisted — three consumers); each axis's midranks come from a distinct-value prefix-sum pass (2·prefix + count + 1 — the r14 histogram-midrank kernel), join back on distinct values only, and the five moments fold count-weighted into ONE single-row aggregate — no row-level rank pass, no id join, nothing collected",
    "q219_rbo" -> "both top-k lists are k-bounded upstream products; the overlap is one tiny equi-join and the RBO fold runs in-row over the <=k max-rank array — no corpus-sized work at all past the list builders",
    "q221_mann_whitney" -> "q220's per-value union aggregate (the only corpus-wide exchange carries distinct values), ONE prefix-sum pass turns the histogram into doubled midranks, and the rank-sum + tie moments fold into ONE single-row DECIMAL aggregate — the ksTest plan with a different final formula, no nested loop anywhere",
    "q222_wasserstein" -> "q220's per-value union aggregate, three bounded prefix-sum passes (two cumulative masses + a positional index), the next-value gap via an index equi-join, per-gap floor(term*2^20) integers summed in ONE single-row aggregate beside the one-row totals broadcast — the transport integral with no window wider than a range bucket",
    "q223_pr_curve" -> "one map-side projection (rational score, DECIMAL integral bin draw) + ONE bin-keyed hash aggregate (the only exchange carries 10 bins); the per-threshold suffix sums are in-row folds over the collected bin array exploding into the 10-row report — no window, no non-equi join",
    "q224_kendall_tau" -> "the corpus collapses to the 10x10 ordinal grid in ONE distributed hash aggregate (integral DECIMAL bin draws map-side); concordant/discordant masses come from a bounded driver Fenwick pass over the collected grid (loud maxCells guard) — the quadratic pair scan exists only in the DuckDB oracle",
    "q225_uncertainty_coeff" -> "one row-level hash aggregate to label cells, two cell-sized marginal aggregates + broadcast joins, then every entropy/MI term folds in-row over SORTED collected lists (marginals derive via array_distinct of the sorted cell list) — deterministic double sums, no cross join, no window",
    "q226_rate_diff" -> "one single-row conditional aggregate per slice (map-side partials — two counters per side cross the shuffle), one broadcast meet, every display from the four integer masses in one double chain",
    "q227_mcnemar" -> "ONE single-row conditional aggregate (four map-side decision counters over the paired rules); the statistic is one double chain over two integers — the cheapest plan any query in the registry can have",
    "q228_fleiss_kappa" -> "ONE single-row conditional aggregate: per-row vote squares and C + 2 counters partial map-side, so only five numbers cross the shuffle; P-bar and P-e are integer rationals dividing once — no join, no window",
    "q229_anova" -> "ONE group-keyed hash aggregate with map-side partials (three integral DECIMAL moments per group); the between-mass folds over the SORTED collected group list in-row and F/eta2 divide once — groups are a bounded dimension, nothing corpus-sized past the first exchange",
    "q230_brown_forsythe" -> "exact group medians via the bounded groupedPercentileTable machinery broadcast back as a groups-sized table, a map-side |2v - 2m| integral projection, then q229's ANOVA plan verbatim on the doubled deviations — scale-invariance of F makes the doubling free",
    "q231_cronbach_alpha" -> "ONE single-row aggregate of 2k+2 integral DECIMAL moments (per-item and total-score sums and squares partial map-side); every variance numerator is the integer n*Sum(x^2) - Sum(x)^2 and alpha divides once — no join, no window",
    "q232_fdr_screen" -> "one hash agg to (group, value) cells, one prefix-sum pass for the global CDF, a broadcast cross with the BOUNDED group table building the per-group spine, a PARTITIONED window per group (never single-partition), one group-keyed max; the BH step-up then runs entirely in-row over the 20-row screening report",
    "q233_cochran_q" -> "ONE single-row conditional aggregate (k+2 DECIMAL masses partial map-side — per-rule passes, row-sum, row-sum squares); Q is an integer rational dividing once — q227's plan with one more counter",
    "q234_kruskal_wallis" -> "one hash agg to (group, value) cells, ONE prefix-sum pass turns the pooled value histogram into doubled midranks, per-group DECIMAL rank sums, the Σ R²/n fold over the SORTED bounded group list, tie masses beside it as a one-row broadcast — the ksTest/mannWhitney plan family generalized to k groups",
    "q215_score_drift" -> "reference deciles enter as PLAN LITERALS (percentileValues runs its own distributed-rank pass first); binning is a map-side CASE chain, the union partial-aggregates into 10 bin rows before the only exchange, and the PSI fold is a single-row agg over the fixed spine",
    "q213_fairness_audit" -> "one map-side projection (rational score, DECIMAL cross-multiplied decision) + ONE group-keyed hash aggregate with map-side partials — the only exchange carries groups, not rows; rates integer-rendered in the final project",
    "q212_drift_attribution" -> "ONE union + ONE bucket-keyed aggregate carries both sides' masses AND the min-token sample (SortAggregate — the string min buffer is variable-width so Spark skips hash agg — but partials still run map-side and only bucket rows shuffle); ppm rates are DECIMAL integral divisions; top-k is TakeOrderedAndProject — per-partition k-heaps, no global sort"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/root/repo/PLANS.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "lineitem").count()

    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit of headline queries\n\n")
    sb.append(s"Generated by `graft.tools.Plans` at `$sfDir`. Each section: the\n")
    sb.append("scale-relevant property the plan must exhibit, then the\n")
    sb.append("`explain(\"formatted\")` output proving it.\n")
    Headliners.foreach { case (name, claim) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n**Claim:** $claim\n\n```\n")
      sb.append(plan.linesIterator.take(80).mkString("\n"))
      sb.append("\n```\n")
      spark.catalog.clearCache()
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
