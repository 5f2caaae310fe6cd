package graft

import graft.functions.TextAnalysis
import graft.ingest.IngestTransform
import graft.model.Schemas
import graft.operators.{AsofJoin, Dedup, Multimodal, Similarity}
import graft.query.LogsTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (venus parity) plus the training-data-pipeline operators
  * (dedup / similarity / text analysis / multimodal).
  *
  * Oracle notes (driver compares vs DuckDB on the same parquet):
  *  - every computed column is aliased identically in Spark and SQL;
  *  - double aggregates go through DECIMAL(18,2) so both engines sum
  *    exactly and convert to double once (bit-identical, order-free);
  *  - timestamps never appear raw in output (ns-vs-us precision) — they are
  *    cast to DATE or kept internal;
  *  - every query has a total deterministic ORDER BY.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q13_star_join")(spark, "/root/testdata/sf0.001")

  // decimal-exact sum of a 2-decimal double column, emitted as double
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  // q88's written store + trigram index, memoized per input dir (build once,
  // amortize over searches — the disk analog of q39's in-plan IVF index)
  private val q88Store =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // q99's shredded store (promoted payload fields), memoized per input dir
  private val q99Store =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- venus parity: scans / filters / projections (SURVEY §2.3) ----

    "q01_point_lookup" -> ((s, dir) => {
      // correlation-id point lookup analog (reference: json_tricks.rst:28)
      // user_id=7 exists at every SF (sf0.001 only has user_id 0-14)
      Tables(s, dir, "events")
        .filter(col("user_id") === 7)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    "q02_time_range" -> ((s, dir) => {
      // time-range pruned scan + agg (reference: README.rst:74, hypertable);
      // eventsRange pushes the bounds to the parquet scan as raw-nano
      // comparisons (row-group pruning — see Tables.eventsRange)
      Tables.eventsRange(s, dir, "2024-01-10 00:00:00", "2024-01-20 00:00:00")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // ---- venus parity: JSON surface (SURVEY §2.4) ----

    "q03_json_extract" -> ((s, dir) => {
      // data->>'k' (reference: README.rst:88)
      Tables(s, dir, "events")
        .filter(col("user_id") === 7)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id"))
    }),

    "q04_json_decompose" -> ((s, dir) => {
      // jsonb_to_record ascribed-schema decomposition (reference: README.rst:90-100)
      val logsShaped = Tables(s, dir, "events")
        .select(col("event_id"), col("props").as("data_raw"))
      LogsTable(logsShaped)
        .decompose(StructType(Seq(StructField("k", IntegerType))))
        .filter(col("k") >= 50)
        .orderBy(col("event_id"))
    }),

    "q52_dynamic_widen" -> ((s, dir) => {
      // the doc's two-step strategy (json_tricks.rst:77-95): discover the
      // key universe under the constraint (distributed explode+distinct),
      // then build the wide `data->>'k' AS k` projection from the result
      val shaped = Tables(s, dir, "events")
        .filter(col("user_id") === 7)
        .select(col("event_id"), col("props").as("data_raw"))
      LogsTable(shaped).dynamicWiden().orderBy(col("event_id"))
    }),

    "q53_json_contains" -> ((s, dir) => {
      // jsonb containment `props @> '{"k": 42}'` analog (SURVEY §2.3;
      // reference: jsonb_path_ops GIN migration:37)
      val shaped = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("props").as("data_raw"))
      val lt = LogsTable(shaped)
      shaped.filter(lt.jsonContains(Map("k" -> "42")))
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))
    }),

    "q99_json_contains_shred" -> ((s, dir) => {
      // q53's containment query on the PROMOTED path: the store is written
      // once with `k` shredded into a real `p_k` column
      // (LogStore.appendShredded — the jsonb_path_ops GIN analog), so the
      // containment conjunct compiles to a parquet-pushed string equality
      // (PushedFilters, proven by ShredSpec) instead of a post-scan JSON
      // extraction. Same rows, same oracle as q53.
      val stored = q99Store.computeIfAbsent(dir, { d =>
        val root = java.nio.file.Files
          .createTempDirectory("graft-q99").toString
        val store = new graft.store.LogStore(root)
        store.appendShredded("events_shred",
          Tables(s, d, "events")
            .select(col("event_id"), col("user_id"), col("props").as("data_raw")),
          promote = Seq("k"))
        root
      })
      val df = new graft.store.LogStore(stored).read(s, "events_shred")
      df.filter(LogsTable(df).jsonContains(Map("k" -> "42")))
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))
    }),

    "q05_key_discovery" -> ((s, dir) => {
      // jsonb_object_keys + DISTINCT (reference: json_tricks.rst:52-76)
      Tables(s, dir, "events")
        .select(explode(json_object_keys(col("props"))).as("key"))
        .distinct()
        .orderBy(col("key"))
    }),

    "q06_search_ilike" -> ((s, dir) => {
      // message ILIKE ANY(...) (reference: conftest.py:169-174)
      val docs = Tables(s, dir, "documents")
      val lt = LogsTable(docs)
      docs.filter(lt.ilikeAny(col("text"), Seq("%spark%", "%merge%")))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // ---- venus parity: top-k / distinct / time-bucket (SURVEY §2.6-2.7) ----

    "q07_recent_topk" -> ((s, dir) => {
      // ORDER BY time DESC LIMIT 10 (reference: README.rst:102-103);
      // plans as TakeOrderedAndProject, no global sort
      Tables(s, dir, "events")
        .orderBy(col("ts").desc)
        .limit(10)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    "q08_time_bucket" -> ((s, dir) => {
      // time_bucket dashboard agg (reference: metabase-instructions.rst:18-22)
      Tables(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"),
          (dsum(col("value")) / count(lit(1))).as("avg_value"))
        .orderBy(col("day"))
    }),

    "q63_time_bucket_hour" -> ((s, dir) => {
      // LogsTable.timeBucket driven through the gate: hour-grain dashboard
      // series with payload-field stats (metric-table shape). Hour-truncated
      // timestamps have zero sub-second, so the value hashes identically
      // despite the ns-vs-us storage difference.
      val shaped = Tables(s, dir, "events")
        .select(col("ts").as("time"), col("props").as("data_raw"))
      LogsTable(shaped).timeBucket("hour", Some("k"))
        .orderBy(col("bucket"))
    }),

    "q14_distinct" -> ((s, dir) => {
      Tables(s, dir, "events").select("event_type").distinct()
        .orderBy("event_type")
    }),

    // ---- venus parity: joins (SURVEY §2.5) ----

    "q09_enrich_join" -> ((s, dir) => {
      // logs ⋈ context enrichment analog: broadcast the dimension
      Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_total"))
        .orderBy(col("c_mktsegment"))
    }),

    "q10_interval_join" -> ((s, dir) => {
      // span ⋈ logs interval association analog (reference: migration:54-64):
      // equi-key join with the range as post-join filter — no cross product
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey") &&
          li("l_shipdate") >= o("o_orderdate") &&
          li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    "q13_star_join" -> ((s, dir) => {
      // star-schema revenue rollup: dims broadcast, one fact shuffle
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      val revenue = sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(4, 2)))))
        .cast("double")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(revenue.as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("n_name"))
    }),

    // ---- venus parity: aggregation (SURVEY §2.6, TPC-H Q1 shape) ----

    "q11_agg_pricing" -> ((s, dir) => {
      val disc = lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))
      val charge = lit(1).cast(DecimalType(4, 2)) + col("l_tax").cast(DecimalType(4, 2))
      val base = col("l_extendedprice").cast(DecimalType(18, 2))
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(base * disc).cast("double").as("sum_disc_price"),
          sum(base * disc * charge).cast("double").as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (sum(col("l_discount").cast(DecimalType(4, 2))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q12_topk_orders" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- dedup operators ----

    "q15_dedup_exact" -> ((s, dir) => {
      Dedup.exact(Tables(s, dir, "documents"))
        .select(col("fp"), col("doc_id"), col("n_dups"))
        .orderBy(col("doc_id"))
    }),

    "q20_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLsh(Tables(s, dir, "documents"), threshold = 0.3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q21_simhash" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash(col("text")).as("simhash"))
        .orderBy(col("doc_id"))
    }),

    "q22_ngram_jaccard" -> ((s, dir) => {
      // threshold 0.1 is an exhaustive-sweep setting: 32 r=1 bands so a
      // pair at j barely over threshold still collides somewhere (miss
      // (1-j)^32; bands=8's r=2 net measurably dropped 3/260 true pairs
      // at sf0.1 — caught by the no-skip soak, round 7)
      Dedup.ngramJaccardPairs(Tables(s, dir, "documents"), n = 3,
        threshold = 0.1, bands = 32, numHashes = 32)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q25_embed_neardup" -> ((s, dir) => {
      // 8-table OR-amplification: a single 4-plane table catches ~11% of
      // pairs at this low threshold; 8 independent tables ~62% (recall
      // floor pinned by the q86 contract twin)
      Dedup.embeddingNearDup(Tables(s, dir, "embeddings"),
        planes = 4, threshold = 0.25, tables = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- similarity search ----

    "q23_knn_brute" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0), q, 10)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
        .orderBy(col("vec_id"))
    }),

    "q24_ann_lsh" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      val index = Similarity.bucketedIndex(emb.filter(col("vec_id") =!= 0), planes = 4)
      Similarity.lshTopK(index, q, 10, planes = 4)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
        .orderBy(col("vec_id"))
    }),

    "q39_ivf_ann" -> ((s, dir) => {
      // IVF: spherical-kmeans inverted lists with 3-way multi-assignment,
      // probe the 4 best of 16 — measured recall@10 0.84 vs 0.56 for LSH
      // at the same probe fraction (tools/RecallSweep)
      val emb = Tables(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      val centroids = Similarity.kmeansCentroids(emb.filter(col("vec_id") =!= 0))
      val index = Similarity.ivfIndex(emb.filter(col("vec_id") =!= 0), centroids)
      Similarity.ivfTopK(index, centroids, q, 10, nprobe = 4)
        .select(col("vec_id"), round(col("cos"), 4).as("cos"))
        .orderBy(col("vec_id"))
    }),

    // ---- text analysis ----

    "q16_token_count" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.subwordCount(col("text")).as("n_subwords"))
        .orderBy(col("doc_id"))
    }),

    "q17_quality" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          round(TextAnalysis.alphaRatio(col("text")), 4).as("alpha_ratio"),
          round(TextAnalysis.meanWordLength(col("text")), 4).as("mean_wlen"),
          round(TextAnalysis.stopwordRatio(col("text")), 4).as("stopword_ratio"))
        .orderBy(col("doc_id"))
    }),

    "q18_lang_id" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    "q19_fingerprint" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"),
          TextAnalysis.rollingHash(col("text")).as("rhash"))
        .orderBy(col("doc_id"))
    }),

    // ---- multimodal (binary columns; codec stubbed, plumbing real) ----

    "q26_multimodal_bytes" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text").cast("binary")).as("n_bytes"))
        .orderBy(col("doc_id"))
    }),

    "q27_multimodal_meta" -> ((s, dir) => {
      // full mapPartitions metadata extraction; the query projects the
      // deterministic byte-derived fields (format/bytes/duration) so the
      // DuckDB oracle can recompute them — width/height (java hashCode
      // fakes) stay spec-covered in MultimodalSpec
      val media = Multimodal.asMedia(
        Tables(s, dir, "documents").select(col("doc_id"),
          col("text").cast("binary").as("media")),
        "doc_id", "media")
      Multimodal.extractMeta(media).toDF()
        .select(col("id"), col("format"),
          col("nBytes").as("n_bytes"), col("durationMs").as("duration_ms"))
        .orderBy(col("id"))
    }),

    // ---- as-of join (training-pipeline addition; SURVEY §2.11) ----

    "q29_asof_join" -> ((s, dir) => {
      // each click joined to the user's most recent error at-or-before it;
      // one shuffle, window-fill — no range-join explosion (see AsofJoin)
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.backward(clicks, errors, Seq("user_id"), "ts", "ts", Seq("value"))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_clicks"),
          count(col("asof_ts")).as("n_matched"),
          sum(unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("lag_us_total"),
          dsum(col("asof_value")).as("sum_err_value"))
        .orderBy(col("user_id"))
    }),

    "q62_asof_forward" -> ((s, dir) => {
      // forward twin of q29: each click joined to the user's NEXT error
      // at-or-after it (same single-shuffle union+window, reversed axis)
      val ev = Tables(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.forward(clicks, errors, Seq("user_id"), "ts", "ts", Seq("value"))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_clicks"),
          count(col("asof_ts")).as("n_matched"),
          sum(unix_micros(col("asof_ts")) - unix_micros(col("ts"))).as("lead_us_total"),
          dsum(col("asof_value")).as("sum_err_value"))
        .orderBy(col("user_id"))
    }),

    // ---- Variant JSON path (Spark 4 native semi-structured type) ----

    "q30_variant_extract" -> ((s, dir) => {
      // same surface as q03 but through VariantType: parse once, typed get
      // (SURVEY §1.2 primary JSON representation)
      Tables(s, dir, "events")
        .filter(col("user_id") === 7)
        .select(col("event_id"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k"))
        .orderBy(col("event_id"))
    }),

    // ---- window / ranking ----

    "q31_window_rank" -> ((s, dir) => {
      // top-3 events per user by value: one shuffle on user_id, per-key sort
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("rn"))
        .orderBy(col("user_id"), col("rn"))
    }),

    // ---- set operations ----

    "q32_set_ops" -> ((s, dir) => {
      // users who hit errors but never made a big purchase (filters chosen
      // to be non-empty at every SF)
      val ev = Tables(s, dir, "events")
      val errored = ev.filter(col("event_type") === "error")
        .select(col("user_id")).distinct()
      val bigBuyers = ev.filter(col("event_type") === "purchase" && col("value") > 90)
        .select(col("user_id")).distinct()
      errored.except(bigBuyers).orderBy(col("user_id"))
    }),

    "q59_intersect" -> ((s, dir) => {
      // INTERSECT completes the set-op family (EXCEPT=q32, UNION ALL=q41)
      val ev = Tables(s, dir, "events")
      val clickers = ev.filter(col("event_type") === "click")
        .select(col("user_id")).distinct()
      val buyers = ev.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      clickers.intersect(buyers).orderBy(col("user_id"))
    }),

    "q60_ntile" -> ((s, dir) => {
      // quartile assignment + per-group leader via one window pass; the
      // (value desc, event_id) total order makes both deterministic
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id"))
      Tables(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          ntile(4).over(w).as("quartile"),
          first_value(col("event_id")).over(w).as("leader_id"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // ---- grouping sets / rollup ----

    "q33_rollup" -> ((s, dir) => {
      Tables(s, dir, "events")
        .rollup(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    "q40_cube" -> ((s, dir) => {
      // full cube over (event_type, month): all 4 grouping combinations in
      // one pass — partial aggregation keeps the shuffle at group
      // cardinality x 4, not row count x 4
      Tables(s, dir, "events")
        .cube(col("event_type"), month(col("ts")).as("mon"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type").asc_nulls_first, col("mon").asc_nulls_first)
    }),

    "q41_union_all" -> ((s, dir) => {
      // UNION ALL of two disjoint slices then re-aggregate (the classic
      // "combine backfill + live" shape); unionByName is a zero-shuffle
      // concatenation of lineages
      val ev = Tables(s, dir, "events")
      val a = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("value"))
      val b = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("value"))
      a.unionByName(b)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("user_id"))
    }),

    // ---- percentiles ----

    "q34_percentile" -> ((s, dir) => {
      // exact grouped p50/p90 via distributed order statistics (r13:
      // GlobalRank.groupedPercentileTable — bit-identical to the grouped
      // percentile aggregate, without its whole-group buffer)
      operators.GlobalRank.groupedPercentileTable(
        Tables(s, dir, "events"), "event_type", "value",
        Seq(0.5, 0.9), Seq("_p50", "_p90"))
        .select(col("event_type"),
          round(col("_p50"), 4).as("p50"), round(col("_p90"), 4).as("p90"))
        .orderBy(col("event_type"))
    }),

    // ---- semi / anti joins ----

    "q35_anti_join" -> ((s, dir) => {
      // customers with no order above 300k — left_anti: one shuffle, no
      // payload carried (filter chosen to be non-empty at every SF)
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    "q36_semi_join" -> ((s, dir) => {
      // suppliers that shipped at least one line — left_semi
      Tables(s, dir, "supplier")
        .join(Tables(s, dir, "lineitem"),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    // ---- approximate aggregates (HLL) ----

    "q37_approx_distinct" -> ((s, dir) => {
      // HLL++ distinct users per event type — sketches merge map-side, so
      // the shuffle carries one sketch per group, not the key universe.
      // Approx values are engine-specific -> rows-only check; exact_users
      // pins the cardinality the sketch estimates.
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          // the sketch estimate itself is engine-specific, so the checked
          // output is the bounded-error CONTRACT: |approx-exact|/exact
          // within 5% (rsd=2% sketch). Deterministic for fixed data, and
          // the oracle pins it TRUE — a broken sketch now fails the hash
          // check instead of hiding behind rows-only.
          (abs(approx_count_distinct(col("user_id"), 0.02) - countDistinct(col("user_id")))
            .cast("double") / countDistinct(col("user_id")) <= 0.05)
            .as("approx_within_5pct"))
        .orderBy(col("event_type"))
    }),

    // ---- raw SQL surface (CTE + subquery; Metabase-analog entry point) ----

    "q38_sql_cte" -> ((s, dir) => {
      // the reference's whole query surface is SQL (README.rst:84-103);
      // spark.sql over registered views is our equivalent entry point
      Tables(s, dir, "events").createOrReplaceTempView("events_v")
      s.sql(
        """WITH daily AS (
          |  SELECT CAST(ts AS DATE) AS day, user_id, count(*) AS n
          |  FROM events_v GROUP BY 1, 2
          |)
          |SELECT day, count(*) AS active_users, sum(n) AS total_events
          |FROM daily
          |WHERE n > (SELECT avg(n) FROM daily)
          |GROUP BY day ORDER BY day""".stripMargin)
    }),

    // ---- streaming-ingest transform (batch-equivalent path) ----

    "q28_ingest" -> ((s, dir) => {
      // wire-format round trip: events -> LogRecord-shaped JSON -> ingest
      // transform (parse, extract/coerce, pop, date partition col)
      val wire = Tables(s, dir, "events").select(
        to_json(struct(
          (unix_micros(col("ts").cast("timestamp")) / lit(1000000.0)).as("created"),
          col("event_type").as("message"),
          concat(lit("00000000-0000-0000-0000-"), lpad(col("user_id").cast("string"), 12, "0")).as("correlation_id"),
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))).as("value"))
      // project typed fields back OUT of the transformed envelope (raw JSON
      // key order is engine-dependent, extracted values are not) — proves
      // promotion, popping, and date derivation against the DuckDB oracle
      IngestTransform(wire)
        .select(col("message"), col("correlation_id"), col("date"),
          get_json_object(col("data_raw"), "$.event_id").cast("long").as("event_id"),
          get_json_object(col("data_raw"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id"))
    }),

    // ---- LATERAL decomposition (reference: README.rst:90-100 CROSS JOIN
    // LATERAL jsonb_to_record — literal SQL parity via Spark 4 LATERAL) ----

    "q42_lateral" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_v")
      s.sql(
        """SELECT e.event_id, x.k
          |FROM events_v e,
          |LATERAL (SELECT CAST(get_json_object(e.props, '$.k') AS INT) AS k) x
          |WHERE x.k >= 95 ORDER BY e.event_id""".stripMargin)
    }),

    // ---- grouping sets (explicit; rollup/cube are q33/q40) ----

    "q43_grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_v")
      s.sql(
        """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
          |FROM events_v
          |GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
          |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin)
    }),

    // ---- window analytics: lag + framed moving aggregate ----

    "q44_window_analytics" -> ((s, dir) => {
      // (ts, event_id) is a total order per user -> lag and the 3-row frame
      // are deterministic; the moving sum goes through DECIMAL for
      // order-free exactness (same discipline as dsum)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"),
          sum(col("value").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(-2, 0)).cast("double").as("moving_sum3"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- pivot (dashboard cross-tab; fixed value list -> stable schema) ----

    "q45_pivot" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L) // absent (day, type) combos: 0, matching the oracle's FILTER counts
        .orderBy(col("day"))
    }),

    // ---- dispersion statistics (decimal-exact sums -> identical doubles) ----

    "q46_stats" -> ((s, dir) => {
      // stddev/variance from exact decimal S1/S2 rather than the engines'
      // streaming (order-dependent) moment kernels: both sides compute
      // sqrt((n*S2 - S1^2)/(n*(n-1))) over identical doubles
      val d = col("value").cast(DecimalType(18, 2))
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("s1"),
          sum(d * d).cast("double").as("s2"))
        .select(col("event_type"), col("n"),
          round(sqrt((col("n") * col("s2") - col("s1") * col("s1")) /
            (col("n") * (col("n") - lit(1)))), 4).as("stddev_samp"),
          round((col("n") * col("s2") - col("s1") * col("s1")) /
            (col("n") * col("n")), 4).as("var_pop"))
        .orderBy(col("event_type"))
    }),

    // ---- argmax (max_by with a deterministic composite key) ----

    "q47_argmax" -> ((s, dir) => {
      // value has 2 decimals -> round(value*100) is an exact integer; the
      // composite (value_cents, event_id) key makes max_by deterministic
      // under value ties on BOTH engines
      val key = round(col("value") * 100).cast("long") * lit(10000000000L) + col("event_id")
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(max_by(col("event_id"), key).as("top_event_id"),
          max(col("value")).as("max_value"))
        .orderBy(col("event_type"))
    }),

    // ---- string/regex scalar surface (SURVEY §2.9) ----

    "q48_regex" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "[0-9]+", 0).as("first_num"),
          length(regexp_replace(col("text"), "[^A-Z]", "")).as("n_upper"))
        .orderBy(col("doc_id"))
    }),

    // ---- histogram bucketing (dashboard distribution) ----

    "q49_histogram" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(floor(col("value") / 10).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("bucket"))
    }),

    // ---- simhash Hamming-distance near-dup (pigeonhole LSH) ----

    "q51_simhash_neardup" -> ((s, dir) => {
      // guaranteed-recall distance<=3 pairs: 4 segment buckets (pigeonhole),
      // popcount verify — no pairwise pass (see Dedup.simhashNearDup)
      Dedup.simhashNearDup(Tables(s, dir, "documents"), k = 3, segments = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- skew-salted aggregation (two-phase; must equal the plain agg) ----

    "q54_salted_agg" -> ((s, dir) => {
      // event_type is a 5-key universe — exactly the hot-key shape salting
      // exists for; the decimal value column keeps the two-phase sum exact,
      // so the salted result is bit-identical to the plain GROUP BY
      val ev = Tables(s, dir, "events")
        .select(col("event_type"), col("value").cast(DecimalType(18, 2)).as("v"))
      operators.Skew.saltedSumCount(ev, Seq("event_type"), "v")
        .select(col("event_type"), col("n"), col("sum_v").cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // ---- scalar function breadth: date / math / string (SURVEY §2.9) ----

    "q55_scalar_funcs" -> ((s, dir) => {
      Tables(s, dir, "events")
        .filter(col("user_id") === 3)
        .select(col("event_id"),
          year(col("ts")).as("y"), month(col("ts")).as("mon"),
          dayofmonth(col("ts")).as("d"), hour(col("ts")).as("h"),
          round(sqrt(abs(col("value"))), 4).as("sqrt_v"),
          round(log(abs(col("value")) + 1), 4).as("ln1p_v"),
          upper(substring(col("event_type"), 1, 3)).as("typ3"),
          concat_ws("-", col("event_type"), col("user_id")).as("tag"),
          coalesce(get_json_object(col("props"), "$.missing"), lit("none")).as("fallback"))
        .orderBy(col("event_id"))
    }),

    // ---- training-pipeline dataset management (Sampling) ----

    "q56_hash_split" -> ((s, dir) => {
      // deterministic md5 train/test split: same row -> same split on every
      // run/engine/retry (rand() splits silently reshuffle under retries)
      Tables(s, dir, "documents")
        .withColumn("split", operators.Sampling.splitLabel(col("doc_id"), 90))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("split"))
    }),

    "q57_split_leakage" -> ((s, dir) => {
      // decontamination report: near-dup pairs straddling the split — every
      // row is a test doc whose near-duplicate leaked into train
      operators.Sampling.crossSplitLeakage(Tables(s, dir, "documents"),
        threshold = 0.1, trainPct = 90)
        .select(col("id_a"), col("id_b"), col("jaccard"), col("split_a"), col("split_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q58_corpus_stats" -> ((s, dir) => {
      // the corpus budget report: docs / chars / tokens per (lang, source)
      Tables(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("sum_tokens"))
        .orderBy(col("lang"), col("source"))
    }),

    // ---- heavy-hitters sketch (custom TypedImperativeAggregate) ----

    "q61_heavy_hitters" -> ((s, dir) => {
      // Misra-Gries with k=8 over a 5-key universe: counters never evict,
      // so the sketch is EXACT and the oracle pins it against GROUP BY;
      // the eviction/error-bound regime is property-tested in the spec
      Tables(s, dir, "events")
        .agg(graft.functions.HeavyHitters.heavy_hitters(col("event_type"), 8).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.key").as("key"), col("e.est_count").as("est_count"))
        .orderBy(col("key"))
    }),

    // ---- session / funnel / cohort analytics (operators.Sessions) ----

    "q64_sessionize" -> ((s, dir) => {
      // gap-based batch sessionization (12 h gap = the reference's
      // hypertable chunk interval); one shuffle for lag+running-sum+agg
      operators.Sessions.sessionize(Tables(s, dir, "events"))
        .orderBy(col("user_id"), col("session_idx"))
    }),

    "q65_funnel" -> ((s, dir) => {
      // earliest-entry ordered funnel: signup -> click-after -> purchase-after
      operators.Sessions.funnel(Tables(s, dir, "events"),
        Seq("signup", "click", "purchase"))
        .orderBy(col("stage"))
    }),

    "q74_cohort_retention" -> ((s, dir) => {
      // weekly signup-cohort x weeks-elapsed activity matrix
      operators.Sessions.cohortRetention(Tables(s, dir, "events"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // ---- corpus analytics (operators.CorpusAnalytics) ----

    "q66_word_freq" -> ((s, dir) => {
      // corpus term frequencies, distributed top-k (TakeOrderedAndProject)
      operators.CorpusAnalytics.wordFrequencies(Tables(s, dir, "documents"), k = 20)
        .orderBy(col("token"))
    }),

    "q67_tfidf" -> ((s, dir) => {
      // most-salient term per doc; deterministic (score desc, term) top-1
      operators.CorpusAnalytics.tfidfTopTerm(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("top_term"), round(col("score"), 4).as("score"))
        .orderBy(col("doc_id"))
    }),

    "q70_repetition" -> ((s, dir) => {
      // Gopher-style duplicate-bigram quality signal (map-side scalar)
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          round(operators.CorpusAnalytics.repetitionRatio(col("text")), 4).as("rep_ratio"))
        .orderBy(col("doc_id"))
    }),

    "q71_pii_redact" -> ((s, dir) => {
      // PII scrub over a synthesized wire string (the corpus has no PII, so
      // build a deterministic one: uid + email + numeric ref); emails
      // first, then 4+-digit runs on the email-free text
      val wire = Tables(s, dir, "events").filter(col("user_id") === 3)
        .select(col("event_id"),
          concat(lit("uid "), col("user_id").cast("string"),
            lit(" contact u"), col("user_id").cast("string"),
            lit("@example.com ref "), (col("event_id") * 137).cast("string"),
            lit(" t "), col("event_type")).as("msg"))
      wire.select(col("event_id"),
          operators.CorpusAnalytics.redactPii(col("msg")).as("r"))
        .select(col("event_id"), col("r.redacted").as("redacted"),
          col("r.n_emails").as("n_emails"), col("r.n_nums").as("n_nums"))
        .orderBy(col("event_id"))
    }),

    "q72_stratified_sample" -> ((s, dir) => {
      // deterministic md5-ranked 5-per-lang sample (no rand(): stable
      // across runs/engines/retries, same discipline as q56)
      operators.CorpusAnalytics.stratifiedSample(
        Tables(s, dir, "documents"), "lang", "doc_id", perStratum = 5)
        .select(col("lang"), col("doc_id"), col("rk"))
        .orderBy(col("lang"), col("rk"))
    }),

    // ---- near-dup clustering (connected components over the pair graph) ----

    "q73_neardup_clusters" -> ((s, dir) => {
      // collapse near-dup groups: cluster_id = min reachable doc id through
      // jaccard>=0.1 edges; bands=16 (r=1) is the guaranteed-recall LSH
      // setting — bands=8 measurably misses ~3/260 true pairs at this low
      // threshold on sf0.1 (ngramJaccardPairs doc), which would split
      // clusters; is_canonical marks the doc to keep
      Dedup.neardupClusters(Tables(s, dir, "documents"), threshold = 0.1)
        .orderBy(col("doc_id"))
    }),

    "q98_survivorship" -> ((s, dir) => {
      // the keep/drop pass over q73's clusters: longest member of each
      // near-dup cluster survives (tie -> lowest id), singletons keep
      // themselves. Winner election is a hash agg over the clustered
      // sliver only — singletons never shuffle by cluster.
      Dedup.survivorship(Tables(s, dir, "documents"), threshold = 0.1)
        .orderBy(col("doc_id"))
    }),

    // ---- sf0.1-soak twins of the heavy exact-pair oracles (r10 item 5):
    // the SAME engine paths over the deterministic doc_id % 3 == 0
    // subsample. Their brute-force DuckDB sides cost ~1/9 of the full
    // corpus (quadratic pair universe), so the soak can evaluate the
    // kernels ABOVE gate scale where the full oracles are 780 s-to-35 min
    // jobs it must skip. Subsetting is consistent by construction: every
    // per-doc signal (shingles, md5 split label, text length) depends
    // only on the doc itself, and pair/cluster semantics only on the
    // input set.

    "q22b_ngram_jaccard_sub3" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(
        Tables(s, dir, "documents").filter(col("doc_id") % 3 === 0),
        n = 3, threshold = 0.1, bands = 32, numHashes = 32)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q57b_split_leakage_sub3" -> ((s, dir) => {
      operators.Sampling.crossSplitLeakage(
        Tables(s, dir, "documents").filter(col("doc_id") % 3 === 0),
        threshold = 0.1, trainPct = 90)
        .select(col("id_a"), col("id_b"), col("jaccard"), col("split_a"), col("split_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q73b_neardup_clusters_sub3" -> ((s, dir) => {
      Dedup.neardupClusters(
        Tables(s, dir, "documents").filter(col("doc_id") % 3 === 0),
        threshold = 0.1)
        .orderBy(col("doc_id"))
    }),

    "q98b_survivorship_sub3" -> ((s, dir) => {
      Dedup.survivorship(
        Tables(s, dir, "documents").filter(col("doc_id") % 3 === 0),
        threshold = 0.1)
        .orderBy(col("doc_id"))
    }),

    "q100_semantic_dedup" -> ((s, dir) => {
      // SemDeDup keep/drop table: k-means partition, within-cluster exact
      // cosine components, keeper = farthest-from-centroid (tie -> lowest
      // id). Approximate-by-design (cross-cluster duplicates are invisible
      // by construction) -> rows-only here; q101 pins precision and
      // realized recall against the global brute-force duplicate graph.
      Dedup.semanticDedup(Tables(s, dir, "embeddings"), k = 16, threshold = 0.35)
        .orderBy(col("vec_id"))
    }),

    "q101_semdedup_contract" -> ((s, dir) => {
      // q100's contract twin: (1) n_exact_dup_docs / n_components ground
      // the twin in data — the oracle re-derives both by brute force +
      // recursive closure; (2) every semanticDedup drop must have an exact
      // cosine>=0.35 duplicate SOMEWHERE in the corpus (precision — pinned
      // 0 unwitnessed); (3) drops must realize at least half of the global
      // graph's optimum drop count (n_dup_docs - n_components), pinning
      // the recall the cluster partition gives up (measured ~0.9 at
      // sf0.001/0.01; floor 0.5 is scale-stable).
      val emb = Tables(s, dir, "embeddings")
      val withN = emb.select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
      val exactPairs = withN
        .select(col("vec_id").as("id_a"), col("embedding").as("v_a"), col("nrm").as("nrm_a"))
        .repartition(s.sessionState.conf.numShufflePartitions) // spread the O(n^2) verify (see q84)
        .join(withN.select(col("vec_id").as("id_b"), col("embedding").as("v_b"),
          col("nrm").as("nrm_b")), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          when(col("nrm_a") * col("nrm_b") === 0, lit(0.0))
            .otherwise(Similarity.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
            .as("cos"))
        .filter(col("cos") >= 0.35)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint() // CC rounds + containment + counts all re-consume it
      val dupDocs = exactPairs.select(col("id_a").as("id"))
        .union(exactPairs.select(col("id_b").as("id"))).distinct().persist()
      val comps = Dedup.connectedComponents(exactPairs)
      val drops = Dedup.semanticDedup(emb, k = 16, threshold = 0.35)
        .filter(!col("keep")).select(col("vec_id").as("id"))
      val unwitnessed = drops.join(dupDocs, Seq("id"), "left_anti")
      dupDocs.agg(count(lit(1)).as("n_exact_dup_docs"))
        .crossJoin(comps.agg(countDistinct(col("lbl")).as("n_components")))
        .crossJoin(drops.agg(count(lit(1)).as("_nd")))
        .crossJoin(unwitnessed.agg(count(lit(1)).as("_uw")))
        .select(col("n_exact_dup_docs"), col("n_components"),
          (col("_uw") === 0).as("all_drops_witnessed"),
          (col("_nd") >= (col("n_exact_dup_docs") - col("n_components")) * 0.5)
            .as("recall_floor_met"))
    }),

    "q102_dup_ngram_fraction" -> ((s, dir) => {
      // corpus-global boilerplate signal: per doc, share of its distinct
      // 3-grams that appear in at least one other doc (fully oracled —
      // same shingle kernel as the dedup family)
      operators.CorpusAnalytics.dupNgramFraction(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q103_decontam_bloom_contract" -> ((s, dir) => {
      // Bloom decontamination vs the exact operator (q89's split): the
      // filter may over-flag (bounded FP overhang) but must NEVER
      // under-flag — a missed contamination is a poisoned benchmark.
      // n_train / n_contaminated_exact ground the twin (oracle re-derives
      // both); no_false_negatives pinned TRUE; FP overhang bounded by 5%
      // of the train count (expected ~g*fpp per doc, orders below 5%).
      val docs = Tables(s, dir, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      val evalD = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      val exact = operators.CorpusAnalytics.decontaminate(train, evalD).persist()
      val bloomFlagged = operators.CorpusAnalytics
        .decontaminateBloom(train, evalD, expectedGrams = 1L << 17)
        .filter(col("contaminated")).select(col("doc_id")).persist()
      val exactFlagged = exact.filter(col("contaminated")).select(col("doc_id"))
      val missed = exactFlagged.join(bloomFlagged, Seq("doc_id"), "left_anti")
      exact.agg(count(lit(1)).as("n_train"),
          coalesce(sum(when(col("contaminated"), 1L)), lit(0L)).as("n_contaminated_exact"))
        .crossJoin(bloomFlagged.agg(count(lit(1)).as("_nb")))
        .crossJoin(missed.agg(count(lit(1)).as("_fn")))
        .select(col("n_train"), col("n_contaminated_exact"),
          (col("_fn") === 0).as("no_false_negatives"),
          ((col("_nb") - col("n_contaminated_exact")) <= col("n_train") * 0.05)
            .as("fp_overhang_bounded"))
    }),

    "q104_incremental_dedup" -> ((s, dir) => {
      // every 10th doc plays the newly-arrived batch, the rest the
      // already-deduped corpus: keep = fingerprint unseen in corpus AND
      // first occurrence within the batch (cost scales with the batch)
      val docs = Tables(s, dir, "documents")
      Dedup.incrementalExact(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0))
        .orderBy(col("doc_id"))
    }),

    "q114_longest_dup_run" -> ((s, dir) => {
      // islands over covered positions: template pages (one giant run)
      // vs organically repetitive text (many short runs)
      operators.CorpusAnalytics.longestDuplicatedRun(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q111_group_topk" -> ((s, dir) => {
      // group-wise top-3 by (n_chars desc, doc_id asc) via the k-bounded
      // TopKPairs aggregate — shuffle carries <= k rows per (partition,
      // group), vs a window row_number sorting every row of every group.
      // The composite ordering rides in the double score — exact only while
      // n_chars < 2^19 and doc_id < 2^33, so that invariant is ASSERTED
      // in-plan (zero-cost when it holds, loud failure when data outgrows
      // it) instead of trusted as a comment
      val docs = Tables(s, dir, "documents")
      val ordGuard = coalesce(
        assert_true(col("n_chars") < (1L << 19) && col("doc_id") < (1L << 33),
          lit("q111 composite double ordering overflows: need n_chars < 2^19 and doc_id < 2^33"))
          .cast("double"),
        lit(0.0))
      operators.GroupTopK.topK(docs, Seq("lang", "source"),
        col("n_chars").cast("double") * (1L << 33).toDouble - col("doc_id") + ordGuard,
        col("doc_id"), 3)
        .join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
        .select(col("lang"), col("source"), col("rnk"),
          col("id").as("doc_id"), col("n_chars"))
        .orderBy(col("lang"), col("source"), col("rnk"))
    }),

    "q112_gram_novelty" -> ((s, dir) => {
      // ordered first-seen novelty curve: per doc, share of its distinct
      // 3-grams first seen in an earlier doc; a re-crawl scores 0, the
      // original it copies keeps scoring 1
      operators.CorpusAnalytics.gramNovelty(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q113_mad_outliers" -> ((s, dir) => {
      // robust per-type outlier fence: median/MAD from exact interpolated
      // percentiles (q34 kernel), counts from unrounded fences
      operators.Normalize.madOutliers(Tables(s, dir, "events"), "event_type", "value")
        .orderBy(col("event_type"))
    }),

    "q108_containment_pairs" -> ((s, dir) => {
      // asymmetric shingle containment (subset/quote detection): PPJoin
      // prefix filtering generates candidates, exact array intersection
      // verifies — integer threshold arithmetic end to end
      operators.Dedup.containmentPairs(Tables(s, dir, "documents"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    "q109_mixture_resample" -> ((s, dir) => {
      // q92's uniform-mixture weights MATERIALIZED: deterministic capped
      // md5-Bernoulli per doc, one integer inequality (no float compare);
      // per-group kept count + id checksum pin every decision
      operators.CorpusAnalytics
        .mixtureResample(Tables(s, dir, "documents"), "source")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
        .orderBy(col("source"))
    }),

    "q110_quantized_ann_contract" -> ((s, dir) => {
      // int8-quantized retrieval vs exact: the oracle re-derives n_corpus,
      // n_queries, and the exact-top-10 id checksum by brute force; the
      // quantized side is pinned by a recall floor and the step/2
      // reconstruction-error bound (both TRUE)
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
      val exact = operators.Similarity.topKPerQuery(corpus, queries, 10)
      val quant = operators.Similarity.quantizedTopKPerQuery(corpus, queries, 10)
      val hits = quant.select(col("query_id"), col("vec_id"))
        .join(exact.select(col("query_id"), col("vec_id")), Seq("query_id", "vec_id"))
        .agg(count(lit(1)).as("_hits"))
      val errs = operators.Similarity.quantizeInt8(corpus)
        .select(
          array_max(zip_with(col("embedding"), col("dqvec"),
            (x, d) => abs(x.cast("double") - d.cast("double")))).as("e"),
          array_max(zip_with(col("_mxs"), col("_mns"),
            (a, b) => (a - b) / 255d)).as("st"))
        .agg(max(col("e")).as("max_err"), max(col("st")).as("max_step"))
      corpus.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(queries.agg(count(lit(1)).as("n_queries")))
        .crossJoin(exact.agg(sum(col("vec_id")).as("exact_topk_id_sum")))
        .crossJoin(hits).crossJoin(errs)
        .select(col("n_corpus"), col("n_queries"), col("exact_topk_id_sum"),
          (col("_hits") * 10 >= col("n_queries") * 7).as("recall_floor_met"),
          (col("max_err") <= col("max_step") / 2 + 1e-6).as("qerr_bound_met"))
    }),

    "q107_passage_removal" -> ((s, dir) => {
      // ExactSubstr-analog repair pass: strip every token covered by a
      // cross-doc duplicated trigram, keep the rest in order
      operators.CorpusAnalytics
        .removeDuplicatedPassages(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q115_bigram_ce" -> ((s, dir) => {
      // CCNet-style perplexity filter: per-doc cross-entropy under the
      // corpus's OWN bigram LM (ML, no smoothing — every scored bigram is
      // in the counts); both tails of the H distribution are the review set
      operators.CorpusAnalytics.bigramCrossEntropy(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q116_importance_weights" -> ((s, dir) => {
      // DSIR importance weights: md5-bucketed unigram models, the 'en'
      // slice as the target distribution; keep = at/above the corpus
      // median RAW weight (a sparse target penalizes everything through
      // smoothing, so the cut is relative) — booleans oracle-compared
      val docs = Tables(s, dir, "documents")
      operators.CorpusAnalytics
        .importanceWeights(docs, docs.filter(col("lang") === "en"),
          // the target IS a docs subset: its bucket counts derive from
          // the shared per-(doc, bucket) collapse — one token pass, not two
          targetIsSubset = true)
        .orderBy(col("doc_id"))
    }),

    "q119_hashed_features" -> ((s, dir) => {
      // hashing-trick vectorizer, oracle-compared element by element as
      // nonzero (doc, dim, value) rows. Exactness chain: tf counts are
      // integers, sum(tf^2) is exact in double on both engines (order-
      // insensitive), sqrt and the division are correctly-rounded IEEE,
      // the float cast is replicated in SQL — so 4-decimal rounding never
      // sits on an engine-dependent boundary
      // sparse path: identical nonzero (doc, dim, value) rows, no dense
      // densify/explode detour (see hashedFeaturesSparse's scaladoc)
      operators.CorpusAnalytics.hashedFeaturesSparse(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("dim").cast("long").as("dim"),
          round(col("v").cast("double"), 4).as("value"))
        .orderBy(col("doc_id"), col("dim"))
    }),

    "q120_epoch_shuffle" -> ((s, dir) => {
      // seeded reproducible epoch shuffle: positions are a pure function
      // of (seed, doc_id), so the oracle replays them exactly — the whole
      // point of the operator vs rand()
      operators.Sampling.epochShuffle(Tables(s, dir, "documents"),
        seed = 42L, shards = 8)
        .orderBy(col("doc_id"))
    }),

    "q121_corpus_overlap" -> ((s, dir) => {
      // KMV overlap sketch between the even-id and odd-id corpus halves;
      // the oracle replays the ENTIRE sketch algorithm (same md5 hashes,
      // same k-min sets, same estimate arithmetic), so this is a
      // hash-exact check of an approximate operator — the tolerance-vs-
      // exact-Jaccard contract lives in CorpusAnalyticsSpec
      val docs = Tables(s, dir, "documents")
      operators.CorpusAnalytics.corpusOverlapSketch(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    }),

    "q122_source_quota" -> ((s, dir) => {
      // per-domain contribution cap: at most 10 docs per source, chosen
      // by 32-bit md5 order (deterministic uniform draw); GroupTopK's
      // bounded heaps instead of a window sort
      operators.Sampling.sourceQuota(Tables(s, dir, "documents"), quota = 10)
        .orderBy(col("source"), col("rnk"))
    }),

    "q123_dup_spectrum" -> ((s, dir) => {
      // gram doc-frequency histogram — the dedup-sizing report; engine
      // counts on xxhash64 keys, oracle on the strings themselves (q102's
      // collision-freeness discipline)
      operators.CorpusAnalytics.duplicationSpectrum(Tables(s, dir, "documents"))
        .orderBy(col("df"))
    }),

    "q124_knn_centrality" -> ((s, dir) => {
      // PageRank over the directed 3-NN cosine graph: which documents sit
      // at the center of the similarity structure (coreset / crawl-
      // prioritization signal). 5 fixed iterations, d = 0.85; the oracle
      // replays the edge build and every iteration, so agreement at 4
      // decimals pins the whole fixpoint. Mean-1 normalization keeps the
      // display values O(1) at any corpus size.
      val edges = operators.Graphs.knnEdges(Tables(s, dir, "embeddings"), k = 3)
      operators.Graphs.pageRank(edges, iterations = 5, damping = 0.85, normalized = true)
        .select(col("v").as("vec_id"), round(col("r"), 4).as("centrality"))
        .orderBy(col("vec_id"))
    }),

    "q125_event_sequences" -> ((s, dir) => {
      // training-sequence builder: each user's first 8 events in time
      // order via bounded GroupTopK heaps (never a full window sort),
      // with totals and the truncation flag joined back
      operators.Sessions.eventSequences(Tables(s, dir, "events"), budget = 8)
        .orderBy(col("user_id"), col("rnk"))
    }),

    "q126_weighted_sample" -> ((s, dir) => {
      // quality-weighted corpus subsample: 100 docs drawn without
      // replacement proportional to n_chars (Efraimidis-Spirakis keys on
      // a seeded md5 draw — deterministic, retry-safe, engine-portable)
      operators.Sampling.weightedSample(
        Tables(s, dir, "documents"), k = 100, weightCol = "n_chars",
        keep = Seq("source", "n_chars"))
        .orderBy(col("rnk"))
    }),

    "q127_blocklist_match" -> ((s, dir) => {
      // Aho-Corasick blocklist scan: every doc x matched watchword in ONE
      // pass over the text regardless of pattern count (ILIKE ANY is
      // O(patterns) scans); map-side only, exploded for the oracle
      val pats = Seq("merge batch", "row scan", "window", "shuffle",
        "stream fast", "big table", "sort key", "agg join")
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(functions.MultiMatch.multi_match(col("text"), pats)).as("pattern"))
        .orderBy(col("doc_id"), col("pattern"))
    }),

    "q128_tfidf_keywords" -> ((s, dir) => {
      // per-doc salient terms: smoothed tf-idf, top-5, lexicographic
      // tie-break (equal-score ties at tf=1 are common — the window's
      // string ordering is the reason this is not a GroupTopK heap)
      operators.Ranking.tfidfKeywords(Tables(s, dir, "documents"), k = 5)
        .orderBy(col("doc_id"), col("rnk"))
    }),

    "q129_bm25_search" -> ((s, dir) => {
      // BM25 ranked retrieval for a fixed 4-term query: one map-side tf
      // pass (terms live in the plan), one stats row broadcast back,
      // left-associative term sum for bit parity, TakeOrderedAndProject
      operators.Ranking.bm25Rank(Tables(s, dir, "documents"),
        Seq("merge", "batch", "window", "stream"), topN = 20)
        .orderBy(col("rnk"))
    }),

    "q130_snapshot_diff" -> ((s, dir) => {
      // incremental-crawl bookkeeping: previous crawl lacked the %7 docs,
      // the new one dropped the %9 docs and re-rendered the %5 docs — one
      // full-outer id join over map-side fingerprints classifies every doc
      val docs = Tables(s, dir, "documents")
      val prev = docs.filter(col("doc_id") % 7 =!= 0)
      val cur = docs.filter(col("doc_id") % 9 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      operators.CorpusAnalytics.snapshotDiff(prev, cur)
        .orderBy(col("doc_id"))
    }),

    "q131_mmr_select" -> ((s, dir) => {
      // MMR diversified retrieval: query = vec 0, distributed top-40
      // candidate pool, greedy λ=0.7 refinement over the bounded pool; the
      // oracle replays the pool build AND all 8 selection rounds
      val emb = Tables(s, dir, "embeddings")
      val qvec = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      operators.Similarity.mmrSelect(
        emb.filter(col("vec_id") =!= 0), qvec, k = 8, poolSize = 40)
        .select(col("rnk"), col("vec_id"), round(col("score"), 4).as("score"))
        .orderBy(col("rnk"))
    }),

    "q132_personalized_pagerank" -> ((s, dir) => {
      // trusted-seed expansion: relevance flows out from the %50 seed set
      // along the 3-NN cosine graph — personalized PageRank, 5 rounds; the
      // oracle replays the edge build, the seed normalization, and every
      // (1-d)·p / dm·p term
      val emb = Tables(s, dir, "embeddings")
      val seeds = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
      val edges = operators.Graphs.knnEdges(emb, k = 3)
      operators.Graphs.pageRank(edges, iterations = 5, damping = 0.85,
        normalized = true, teleport = seeds)
        .select(col("v").as("vec_id"), round(col("r"), 4).as("ppr"))
        .orderBy(col("vec_id"))
    }),

    "q133_perplexity_bands" -> ((s, dir) => {
      // CCNet head/middle/tail split on the corpus's own bigram LM: exact
      // interpolated tercile cuts broadcast back, map-side band labels
      operators.CorpusAnalytics.perplexityBands(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q154_winnowing" -> ((s, dir) => {
      // MOSS winnowing fingerprints: distinct window-min (pos, hash)
      // pairs per doc, rightmost-min tie break encoded in the BIGINT key
      // so DuckDB replays selection exactly
      operators.CorpusAnalytics.winnowingFingerprints(
        Tables(s, dir, "documents"), k = 5, w = 4)
    }),

    "q159_trigram_ce" -> ((s, dir) => {
      // interpolated trigram-LM cross-entropy (Jelinek-Mercer
      // 0.6/0.3/0.1): the backoff-aware upgrade to q115's bigram CE
      operators.CorpusAnalytics.trigramCrossEntropy(
        Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q161_kneser_ney_ce" -> ((s, dir) => {
      // interpolated Kneser-Ney bigram cross-entropy (continuation-count
      // backoff, absolute discount 0.75): the KenLM-style upgrade to
      // q115's ML bigram CE
      operators.CorpusAnalytics.kneserNeyCrossEntropy(
        Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q200_dataset_card" -> ((s, dir) => {
      // the one-row dataset card a curation run publishes: size, token
      // mass, exact-dup rate, quality pass rate, eval-contamination rate,
      // mean length. Rates are BIGINT basis points (floor(rate*1e4+0.5)):
      // r9 shipped the card as DOUBLE, r10 as DECIMAL(20,4) — both were
      // bit-exact against the repo oracle on every local replay at sf0.01
      // AND sf0.1 yet red on the driver's gate, so the mismatch lives in
      // how a client round-trips non-integer columns, not in the values.
      // int64 renders identically through every parquet/DB client path;
      // the raw masses (n_fingerprints, n_quality_pass, n_eval_grams,
      // n_eval_hits) ride along so a residual red on ANY rate column
      // localizes to value-vs-rounding, contamination included.
      val docs = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val tok = functions.TextAnalysis.tokenCount(col("text"))
      val base = docs.agg(
        count(lit(1)).as("n_docs"),
        sum(tok.cast("long")).as("n_tokens"),
        countDistinct(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
          .as("n_fingerprints"),
        sum(when(tok >= 50, 1L).otherwise(0L)).as("n_quality_pass"))
      val contam = operators.CorpusAnalytics.evalContamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0))
        .agg(sum(col("n_grams")).as("_g"), sum(col("n_hit")).as("_h"))
      def bp(c: org.apache.spark.sql.Column) =
        floor(c * 10000 + lit(0.5)).cast("long")
      base.crossJoin(broadcast(contam)).select(
        col("n_docs"), col("n_tokens"),
        col("n_fingerprints"), col("n_quality_pass"),
        col("_g").cast("long").as("n_eval_grams"),
        col("_h").cast("long").as("n_eval_hits"),
        bp(lit(1.0) - col("n_fingerprints").cast("double") / col("n_docs"))
          .as("exact_dup_rate_bp"),
        bp(col("n_quality_pass").cast("double") / col("n_docs"))
          .as("quality_pass_rate_bp"),
        bp(col("_h").cast("double") / col("_g"))
          .as("eval_contamination_rate_bp"),
        bp(col("n_tokens").cast("double") / col("n_docs")).as("mean_tokens_bp"))
    }),

    // q200a-q200d: one-column bisection diagnostics for the dataset card
    // (r10 VERDICT item 1). Each emits n_docs plus exactly ONE of q200's
    // rates so a gate mismatch localizes WHICH column an independent
    // oracle computes differently. Same builders, same BIGINT
    // basis-point rendering as q200 itself, plus the raw integer mass
    // feeding each rate (a red on the mass = value difference; a red on
    // the bp alone = division/rounding difference).
    "q200a_card_dup_rate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").filter(col("text").isNotNull)
      def bp(c: org.apache.spark.sql.Column) =
        floor(c * 10000 + lit(0.5)).cast("long")
      docs.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
          .as("n_fingerprints"))
        .select(col("n_docs"), col("n_fingerprints"),
          bp(lit(1.0) - col("n_fingerprints").cast("double") / col("n_docs"))
            .as("exact_dup_rate_bp"))
    }),

    "q200b_card_quality_rate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val tok = functions.TextAnalysis.tokenCount(col("text"))
      def bp(c: org.apache.spark.sql.Column) =
        floor(c * 10000 + lit(0.5)).cast("long")
      docs.agg(
        count(lit(1)).as("n_docs"),
        sum(when(tok >= 50, 1L).otherwise(0L)).as("n_quality_pass"))
        .select(col("n_docs"), col("n_quality_pass"),
          bp(col("n_quality_pass").cast("double") / col("n_docs"))
            .as("quality_pass_rate_bp"))
    }),

    "q200c_card_contam_rate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").filter(col("text").isNotNull)
      def bp(c: org.apache.spark.sql.Column) =
        floor(c * 10000 + lit(0.5)).cast("long")
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val contam = operators.CorpusAnalytics.evalContamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0))
        .agg(sum(col("n_grams")).as("_g"), sum(col("n_hit")).as("_h"))
      n.crossJoin(broadcast(contam)).select(
        col("n_docs"),
        col("_g").cast("long").as("n_eval_grams"),
        col("_h").cast("long").as("n_eval_hits"),
        bp(col("_h").cast("double") / col("_g"))
          .as("eval_contamination_rate_bp"))
    }),

    "q200d_card_mean_tokens" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val tok = functions.TextAnalysis.tokenCount(col("text"))
      def bp(c: org.apache.spark.sql.Column) =
        floor(c * 10000 + lit(0.5)).cast("long")
      docs.agg(
        count(lit(1)).as("n_docs"),
        sum(tok.cast("long")).as("n_tokens"))
        .select(col("n_docs"), col("n_tokens"),
          bp(col("n_tokens").cast("double") / col("n_docs"))
            .as("mean_tokens_bp"))
    }),

    "q208_ols_crossval" -> ((s, dir) => {
      // 5-fold jackknife-complement cross-validation of the n_chars ~
      // tokens OLS: per-fold held-out slope/intercept/RMSE from ONE moment
      // aggregate (complement = global - fold) — the fit-stability audit
      val docs = Tables(s, dir, "documents")
        .withColumn("tok", functions.TextAnalysis.tokenCount(col("text")).cast("long"))
      operators.Quality.olsCrossVal(docs, xCol = "tok", yCol = "n_chars")
        .orderBy(col("fold"))
    }),

    "q209_calibration" -> ((s, dir) => {
      // reliability-diagram table of the stopword-ratio quality signal
      // read as a probability of the src0 label — q207's discrimination
      // audit completed by its calibration half (Guo et al. ICML'17:
      // the two disagree, which is the point of reporting both). Score
      // enters as the exact integer rational (stopword hits / tokens);
      // every output column is BIGINT (bin draw and fixed-point sums by
      // integral division, displays in basis points)
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      operators.Quality.calibrationReport(
        d, size(stops).cast("long"), size(toks).cast("long"),
        col("source") === "src0")
        .orderBy(col("bin"))
    }),

    "q210_calibration_summary" -> ((s, dir) => {
      // q209 rolled into the two headline numbers: ECE (bin-mass-weighted
      // |mean score - positive rate|) and mean Brier, both in basis
      // points beside their masses
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      operators.Quality.calibrationSummary(
        d, size(stops).cast("long"), size(toks).cast("long"),
        col("source") === "src0")
    }),

    "q233_cochran_q" -> ((s, dir) => {
      // Cochran's Q omnibus over the THREE keep-rules on the same
      // documents — q227's McNemar generalized: is any filter
      // systematically stricter? integer rational, one aggregate
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.cochranQ(d, Seq(
        size(stops).cast("long") * 20 >= size(toks).cast("long") * 3,
        tok >= 40,
        col("n_chars") >= 280))
    }),

    "q234_kruskal_wallis" -> ((s, dir) => {
      // Kruskal-Wallis rank ANOVA of token count across sources — the
      // nonparametric third leg beside q229 (means) and q230 (spreads):
      // histogram midranks, doubled rank sums, exact tie correction
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.kruskalWallis(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q232_fdr_screen" -> ((s, dir) => {
      // the meta-audit: per-source KS-vs-rest screen over token counts
      // (which source's length distribution deviates from the corpus?),
      // then Benjamini-Hochberg so 20 simultaneous tests don't buy one
      // false drift alarm per screen by chance
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      // persisted: the 20-row screen feeds BOTH the BH pass and the
      // join-back (intra-query lifecycle, Bench/Verify clear caches)
      val ks = operators.Quality.groupedKsTest(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source")).persist()
      // the three transcendental-derived displays go out as BIGINT basis
      // points (the q200 integer-card discipline): the BH arithmetic runs
      // on the rounded doubles as before, only the FINAL rendering is
      // integral, and reject derives from the integer form
      def bp(c: org.apache.spark.sql.Column) =
        floor(c * 10000 + lit(0.5)).cast("long")
      operators.Quality.bhAdjust(ks, col("group_key"), col("p_value"))
        .join(broadcast(ks.select(col("group_key").as("test_key"),
          col("n_g"), col("ks_d"))), "test_key")
        .select(col("test_key"), col("n_g"),
          bp(col("ks_d")).as("ks_d_bp"), bp(col("p_value")).as("p_bp"),
          col("p_rank"), bp(col("p_adj")).as("p_adj_bp"),
          (bp(col("p_adj")) <= 1000L).as("reject"))
    }),

    "q238_cvm_test" -> ((s, dir) => {
      // two-sample Cramér-von Mises over q220's even/odd event-value
      // split — the L2 leg that completes the pairwise drift triad on
      // this input: KS (q220) is the sup-norm, W1 (q222) the transport
      // cost, CvM the squared-gap integral that weights SUSTAINED
      // separation over a single spike. Integer cross-mass numerators,
      // per-class floor(term*2^30) quantization, bp display
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.cramerVonMises(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q239_ad_ksample" -> ((s, dir) => {
      // Scholz-Stephens k-sample Anderson-Darling over token counts by
      // source — the tail-sensitive omnibus beside the k-group family:
      // q229 sees mean shifts, q230 spread shifts, q234 location by
      // rank; the AD weight 1/(H(1-H)) sees the short-doc spikes and
      // truncation tails they all discount
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.andersonDarlingK(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q277_ordinal_assoc" -> ((s, dir) => {
      // gamma / Somers' D (both directions) / Stuart's tau-c over the
      // q261 token-band x char-band grid — the measures that complete
      // q224's tau-b: gamma drops ALL ties, Somers' D is the asymmetric
      // predictor-form, tau-c the non-square rescale
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.ordinalAssociationCard(d,
        when(tok < 40, 0L).when(tok < 70, 1L).otherwise(2L),
        when(col("n_chars") < 220, 0L).when(col("n_chars") < 380, 1L)
          .otherwise(2L))
    }),

    "q278_brunner_munzel" -> ((s, dir) => {
      // Brunner-Munzel over q220's even/odd event-value split — the
      // rank test that stays valid when the two sides disperse
      // differently (MWU's z is anticonservative there); studentized
      // placements with per-sample rank variances, Welch-style dof
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.brunnerMunzel(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q279_mood_median" -> ((s, dir) => {
      // Mood's median test of token count across sources — the
      // minimal-assumption k-group location screen beside q231's
      // Kruskal-Wallis: dichotomize at the pooled median, chi2 the 2xk
      // table; robust exactly when group spreads differ wildly
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.moodMedian(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q280_page_trend" -> ((s, dir) => {
      // Page's ordered trend across the window's three equal thirds,
      // blocked by user — the within-block monotone question beside
      // q242's between-group Jonckheere-Terpstra: does per-user
      // activity RISE through the observation window?
      operators.Quality.pageTrend(Tables(s, dir, "events"))
    }),

    "q281_nelson_aalen" -> ((s, dir) => {
      // Nelson-Aalen cumulative hazard on q180's lifetimes — the
      // additive twin of the KM curve: how much churn hazard has
      // accumulated by day t, with its variance; grain-quantized
      // increments so the cumulative is an order-free integer sum
      operators.Sessions.nelsonAalen(Tables(s, dir, "events"),
        churnGapDays = 1)
    }),

    "q282_weighted_logrank" -> ((s, dir) => {
      // the weighted log-rank trio (log-rank / Gehan / Tarone-Ware) on
      // q243's parity cohorts in ONE histogram pass — Gehan weights the
      // early days where the cohort still lives, catching an early-
      // divergence pattern the plain log-rank averages away
      operators.Sessions.weightedLogRankCard(Tables(s, dir, "events"),
        pmod(col("user_id"), lit(2)), churnGapDays = 1)
    }),

    "q283_kuiper_test" -> ((s, dir) => {
      // two-sample Kuiper V = D+ + D- on q220's even/odd split — the
      // equal-tail-weight companion to KS: a truncation swap that moves
      // mass tail-to-tail with the median fixed still registers
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.kuiperTest(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q284_rmst" -> ((s, dir) => {
      // restricted mean survival time: area under q180's rounded KM
      // step curve to a 30-day horizon — "expected active days in the
      // first 30", the averageable single-number retention summary
      operators.Sessions.rmst(Tables(s, dir, "events"), tauDays = 30L,
        churnGapDays = 1)
    }),

    "q285_cucconi" -> ((s, dir) => {
      // Cucconi location-scale on q220's even/odd split — ONE rank test
      // for "did the distribution move OR spread?", with the closed-form
      // Exponential(1) p = exp(-C)
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.cucconiTest(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q286_ansari_bradley" -> ((s, dir) => {
      // Ansari-Bradley rank spread test on the same split — does one
      // side take the middle of the pooled ordering while the other
      // takes the extremes? (exact midrank-score convention)
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.ansariBradley(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q287_lepage" -> ((s, dir) => {
      // Lepage L = z_W^2 + z_AB^2 on the same split — the classical
      // named-parts alternative to q285's Cucconi, p = exp(-L/2) on the
      // even dof 2
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.lepageTest(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q288_dagostino_k2" -> ((s, dir) => {
      // D'Agostino K^2 omnibus normality of token counts — the
      // separately-normalized-Z's test beside q257's raw Jarque-Bera
      // statistic (JB's chi2(2) is anticonservative at practical n)
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      operators.Quality.dagostinoK2(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"))
    }),

    "q289_cox_stuart" -> ((s, dir) => {
      // Cox-Stuart paired-halves trend sign test on the daily series —
      // the maximal-robustness screen beside q251's Mann-Kendall: one
      // wild day flips at most ONE pair
      operators.Sessions.coxStuartTrend(Tables(s, dir, "events"))
    }),

    "q290_kpss" -> ((s, dir) => {
      // KPSS level-stationarity with the Bartlett window at lag 4 —
      // the trend shelf's null REVERSAL: stationarity as the thing
      // being tested, the claim a "metric is stable" dashboard makes
      operators.Sessions.kpssTest(Tables(s, dir, "events"))
    }),

    "q294_kgroup_card" -> ((s, dir) => {
      // the k-group omnibus trio (ANOVA means + Kruskal-Wallis ranks +
      // Mood's median) from ONE (source, token-count) cell aggregate —
      // q293's fused-card economics on the k-group axis: three location
      // readings for one corpus scan
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.kGroupCard(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q297_scale_card" -> ((s, dir) => {
      // the heteroscedasticity review in ONE corpus pass: Brown-Forsythe
      // robust spread W (q230) + Bartlett's parametric T (q256, whose
      // disagreement with BF flags heavy tails) + Welch's W* location
      // answer (q295) — all from one (source, token-count) cell
      // aggregate, display chains verbatim (ScaleCardSpec pins equality)
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.scaleCard(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q295_welch_anova" -> ((s, dir) => {
      // the location answer that survives what q295 checks for: Welch's
      // heteroscedastic W* on the same (source, token-count) frame —
      // n/s^2-weighted group means + Satterthwaite denominator dof,
      // valid where q229's classic F is anticonservative
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.welchAnova(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q296_quade" -> ((s, dir) => {
      // q250's Friedman question with discriminating blocks weighted up:
      // a document where the three band raters disagree WIDELY carries
      // the rank of its range as weight — Quade beats Friedman in power
      // at small k (Conover 5.8.3), the right default for 3 raters
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      val num = size(stops).cast("long")
      val den = size(toks).cast("long")
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.quadeTest(d, Seq(
        when(num * 10 < den, 0L).when(num * 5 < den, 1L).otherwise(2L),
        when(tok < 40, 0L).when(tok < 70, 1L).otherwise(2L),
        when(col("n_chars") < 220, 0L).when(col("n_chars") < 380, 1L)
          .otherwise(2L)))
    }),

    "q293_two_sample_card" -> ((s, dir) => {
      // the ENTIRE two-sample battery in ONE corpus pass over q220's
      // even/odd split: KS + Kuiper + Watson + CvM + MWU/AUC + BM +
      // Cucconi + AB + Lepage — at 100 TB the scan is the cost, so the
      // drift review that wants all nine pays it once (q249's fused-
      // card discipline on the two-sample axis)
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.twoSampleCard(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q291_watson_u2" -> ((s, dir) => {
      // Watson U^2 on q220's even/odd split — the rotation-invariant L2
      // companion to q283's Kuiper sup: the CvM integral about the MEAN
      // gap, algebraically exact from two integer moments
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.watsonU2(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q292_grubbs" -> ((s, dir) => {
      // Grubbs' extreme-deviation test on token counts — "is the single
      // most extreme document an outlier against the normal model?",
      // the sharp single-point question beside q113's MAD fence counts
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      operators.Quality.grubbsTest(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"))
    }),

    "q276_icc" -> ((s, dir) => {
      // ICC(2,1)/(2,k) over q228's three band raters — the two-way
      // random-effects reliability: how much of the band variance is
      // the document, not the rater? (2,k) is the averaged-score form a
      // pipeline actually consumes
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      val num = size(stops).cast("long")
      val den = size(toks).cast("long")
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.intraclassCorrelation(d, Seq(
        when(num * 10 < den, 0L).when(num * 5 < den, 1L).otherwise(2L),
        when(tok < 40, 0L).when(tok < 70, 1L).otherwise(2L),
        when(col("n_chars") < 220, 0L).when(col("n_chars") < 380, 1L)
          .otherwise(2L)))
    }),

    "q275_hosmer_lemeshow" -> ((s, dir) => {
      // Hosmer-Lemeshow over q209's reliability bins — the calibration
      // TEST beside the ECE magnitude: do the bin gaps exceed chance?
      // chi2 on the 2^20-quantized expected masses, closed-form even-dof
      // survival
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      operators.Quality.hosmerLemeshow(
        d, size(stops).cast("long"), size(toks).cast("long"),
        col("source") === "src0")
    }),

    "q274_by_screen" -> ((s, dir) => {
      // q232's KS screen under Benjamini-Yekutieli — FDR under ARBITRARY
      // dependence, the honest knob for this screen: every source's
      // complement overlaps every other's, so BH's independence
      // assumption is structurally false here
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val ks = operators.Quality.groupedKsTest(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source")).persist()
      def bp(c: org.apache.spark.sql.Column) =
        floor(c * 10000 + lit(0.5)).cast("long")
      operators.Quality.byAdjust(ks, col("group_key"), col("p_value"))
        .join(broadcast(ks.select(col("group_key").as("test_key"),
          col("n_g"), col("ks_d"))), "test_key")
        .select(col("test_key"), col("n_g"),
          bp(col("ks_d")).as("ks_d_bp"), bp(col("p_value")).as("p_bp"),
          col("p_rank"), bp(col("p_adj")).as("p_adj_bp"),
          (bp(col("p_adj")) <= 1000L).as("reject"))
    }),

    "q273_sign_test" -> ((s, dir) => {
      // the sign test on q268's per-user weekend-vs-weekday difference —
      // the median-only paired question, maximally robust where the
      // signed-rank assumes a symmetric difference scale
      val e = Tables(s, dir, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
      val wk = when(dayofweek(col("ts")) === 1 || dayofweek(col("ts")) === 7,
        1L).otherwise(0L)
      val perUser = e.groupBy(col("user_id"))
        .agg(sum(wk).as("_we"), sum(lit(1L) - wk).as("_wd"))
      operators.Quality.signTest(perUser,
        lit(5L) * col("_we") - lit(2L) * col("_wd"))
    }),

    "q272_durbin_watson" -> ((s, dir) => {
      // Durbin-Watson lag-1 serial-correlation diagnostic per event
      // type — d = Sum(dx)^2/Sum((x-xbar)^2) as ONE division of exact
      // integers; reads beside q253's Ljung-Box via d ~ 2(1 - rho1)
      operators.Sessions.durbinWatson(
        Tables(s, dir, "events").filter(col("ts").isNotNull))
    }),

    "q271_gwet_ac1" -> ((s, dir) => {
      // Gwet's AC1 between the token band and the char band — the
      // kappa-paradox-robust agreement read beside q136/q259: its
      // pooled-prevalence chance term stays interpretable on prevalent
      // categories where kappa collapses
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.gwetAc1(d,
        when(tok < 40, 0L).when(tok < 70, 1L).otherwise(2L),
        when(col("n_chars") < 220, 0L).when(col("n_chars") < 380, 1L)
          .otherwise(2L))
    }),

    "q270_cohens_h" -> ((s, dir) => {
      // Cohen's h on q226's two-proportion comparison — the arcsine
      // effect size whose small/medium/large conventions transfer
      // across rates; q226's z says whether, this says how big
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      val pass = size(stops).cast("long") * 20 >= size(toks).cast("long") * 3
      operators.Quality.cohensH(
        d.filter(col("source") === "src0"),
        d.filter(col("source") === "src1"),
        pass)
    }),

    "q269_two_by_two" -> ((s, dir) => {
      // the weekend x purchase 2x2: odds and risk ratios with Woolf/
      // Katz intervals — the single-table everyday read beside q245's
      // stratified Mantel-Haenszel common OR
      val e = Tables(s, dir, "events").filter(col("ts").isNotNull)
      operators.Quality.twoByTwoCard(e,
        dayofweek(col("ts")) === 1 || dayofweek(col("ts")) === 7,
        col("event_type") === "purchase")
    }),

    "q268_signed_rank" -> ((s, dir) => {
      // Wilcoxon signed-rank on the per-user weekend-vs-weekday rate
      // difference 5*weekend - 2*weekday (zero-mean under a uniform
      // rate) — the PAIRED rank test beside q221's unpaired MWU
      val e = Tables(s, dir, "events")
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
      val wk = when(dayofweek(col("ts")) === 1 || dayofweek(col("ts")) === 7,
        1L).otherwise(0L)
      val perUser = e.groupBy(col("user_id"))
        .agg(sum(wk).as("_we"), sum(lit(1L) - wk).as("_wd"))
      operators.Quality.wilcoxonSignedRank(perUser,
        lit(5L) * col("_we") - lit(2L) * col("_wd"))
    }),

    "q299_yuen_trimmed" -> ((s, dir) => {
      // the robust location answer in VALUE units beside q267's raw
      // Welch t and q278's Brunner-Munzel dominance: 20%-trimmed mean
      // difference with winsorized variances on the same src0-vs-rest
      // token-count split — the estimator heavy-tailed length
      // distributions actually call for
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.yuenTrimmedT(
        d.filter(col("source") === "src0").select(tok.as("v")),
        d.filter(col("source") =!= "src0").select(tok.as("v")),
        "v")
    }),

    "q298_variance_ratio" -> ((s, dir) => {
      // the parametric two-sample scale question beside q286's Ansari-
      // Bradley ranks: is src0's token-count VARIANCE different from the
      // rest of the corpus? q267's src0-vs-rest framing with the
      // classical F ratio — exact integer moments per side, one division
      // each, stat-without-p. Also the batch calibration source for the
      // streaming SpreadMonitor twin.
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.varianceRatioTest(
        d.filter(col("source") === "src0").select(tok.as("v")),
        d.filter(col("source") =!= "src0").select(tok.as("v")),
        "v")
    }),

    "q267_welch" -> ((s, dir) => {
      // Welch's unequal-variance t for mean token count, src0 vs the
      // rest — the parametric mean companion to the drift family's
      // group-vs-complement screens, no equal-variance assumption
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.welchTTest(
        d.filter(col("source") === "src0").select(tok.as("v")),
        d.filter(col("source") =!= "src0").select(tok.as("v")),
        "v")
    }),

    "q266_auc_ci" -> ((s, dir) => {
      // DeLong confidence interval on q207's AUC — the same stopword
      // signal vs the src0 label, now with the structural-components
      // SE an AUC point estimate owes threshold decisions
      operators.Ranking.delongAucCi(
        Tables(s, dir, "documents").filter(col("text").isNotNull),
        functions.TextAnalysis.stopwordRatio(col("text")),
        col("source") === "src0")
    }),

    "q265_assoc_card" -> ((s, dir) => {
      // association card source x token band: chi2, the LR G-test, and
      // Cramer's V effect size in one pass — "is doc length banded
      // differently by source, and by how much?"
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.associationCard(d, col("source"),
        when(tok < 40, 0L).when(tok < 70, 1L).otherwise(2L))
    }),

    "q264_krippendorff" -> ((s, dir) => {
      // Krippendorff's interval alpha over q228's THREE band raters —
      // the distance-weighted, pooled-chance agreement coefficient
      // annotation QA standardized on; kappa (q228) treats a 0-vs-2
      // miss like an adjacent one
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      val num = size(stops).cast("long")
      val den = size(toks).cast("long")
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.krippendorffAlpha(d, Seq(
        when(num * 10 < den, 0L).when(num * 5 < den, 1L).otherwise(2L),
        when(tok < 40, 0L).when(tok < 70, 1L).otherwise(2L),
        when(col("n_chars") < 220, 0L).when(col("n_chars") < 380, 1L)
          .otherwise(2L)))
    }),

    "q263_distinct_n" -> ((s, dir) => {
      // corpus-level distinct-1/2/3 diversity — the read per-doc
      // repetition gates (q17's family) cannot give: a corpus of
      // mutually-near-identical documents passes every per-doc gate
      operators.CorpusAnalytics.distinctNgrams(
        Tables(s, dir, "documents"))
    }),

    "q262_bowker" -> ((s, dir) => {
      // Bowker's symmetry chi2 between the token band and the char band
      // — the cell-level question beside q261's margins: is every
      // off-diagonal confusion balanced, or does the banding trade
      // 0->2 for 2->0 systematically?
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.bowkerTest(d,
        when(tok < 40, 0L).when(tok < 70, 1L).otherwise(2L),
        when(col("n_chars") < 220, 0L).when(col("n_chars") < 380, 1L)
          .otherwise(2L))
    }),

    "q261_stuart_maxwell" -> ((s, dir) => {
      // Stuart-Maxwell marginal homogeneity between the token band and
      // the char band — McNemar (q237) generalized to the 3-band case:
      // did the band DISTRIBUTION shift between the two rules? closed
      // form 2x2 inverse, chi2(2), closed-form p
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.stuartMaxwell(d,
        when(tok < 40, 0L).when(tok < 70, 1L).otherwise(2L),
        when(col("n_chars") < 220, 0L).when(col("n_chars") < 380, 1L)
          .otherwise(2L))
    }),

    "q260_composition" -> ((s, dir) => {
      // corpus composition concentration card — HHI, unbiased Simpson,
      // Shannon H, and Hill's effective source count ("mixes like X
      // equal sources"): the audit read before any source re-weighting
      operators.CorpusAnalytics.compositionDiversity(
        Tables(s, dir, "documents"))
    }),

    "q259_weighted_kappa" -> ((s, dir) => {
      // quadratically weighted kappa between q228's token band and char
      // band — the ORDINAL agreement unweighted kappa can't express:
      // confusing band 0 with band 2 costs 4x an adjacent-band miss
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Normalize.weightedKappa(
        d.select(
          when(tok < 40, 0L).when(tok < 70, 1L).otherwise(2L).as("ra"),
          when(col("n_chars") < 220, 0L).when(col("n_chars") < 380, 1L)
            .otherwise(2L).as("rb")),
        "ra", "rb")
    }),

    "q258_holm_screen" -> ((s, dir) => {
      // q232's KS-vs-rest screen under Holm step-down instead of BH:
      // FWER control for the quarantine decision (one false alarm is
      // expensive) where q232's FDR is the screening-report knob
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val ks = operators.Quality.groupedKsTest(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source")).persist()
      def bp(c: org.apache.spark.sql.Column) =
        floor(c * 10000 + lit(0.5)).cast("long")
      operators.Quality.holmAdjust(ks, col("group_key"), col("p_value"))
        .join(broadcast(ks.select(col("group_key").as("test_key"),
          col("n_g"), col("ks_d"))), "test_key")
        .select(col("test_key"), col("n_g"),
          bp(col("ks_d")).as("ks_d_bp"), bp(col("p_value")).as("p_bp"),
          col("p_rank"), bp(col("p_adj")).as("p_adj_bp"),
          (bp(col("p_adj")) <= 500L).as("reject"))
    }),

    "q257_jarque_bera" -> ((s, dir) => {
      // Jarque-Bera normality screen of token count per source — which
      // source is so skewed/heavy-tailed that mean+-sigma monitoring is
      // the wrong tool? closed-form chi2(2) survival p
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.jarqueBera(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q256_bartlett" -> ((s, dir) => {
      // Bartlett's variance-homogeneity T across sources — the
      // parametric sibling of q230's Brown-Forsythe; disagreement
      // between the two is itself a heavy-tail diagnostic
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.bartlettTest(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q255_dunn_posthoc" -> ((s, dir) => {
      // Dunn's tie-corrected pairwise comparisons after q234's
      // Kruskal-Wallis omnibus: WHICH source pairs differ in token-count
      // location, on the same pooled midranks — one row per unordered
      // pair, |z| >= 3.2905 (two-sided alpha ~ 0.001) flags reject
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.dunnPostHoc(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q254_runs_test" -> ((s, dir) => {
      // Wald-Wolfowitz runs-about-the-median per event type — the
      // randomness yes/no the trend shelf lacked: too few above/below
      // runs = clustering/level shift, too many = alternation; MK
      // (q251) only sees monotone drift, Ljung-Box (q253) only linear
      // correlation
      operators.Sessions.runsTest(
        Tables(s, dir, "events").filter(col("ts").isNotNull))
    }),

    "q253_ljung_box" -> ((s, dir) => {
      // Ljung-Box portmanteau per event type — the yes/no whiteness
      // question beside ACF's plot (q189): is the daily series white
      // noise jointly over the first 6 lags? Exact integer m-scaled
      // autocovariances, closed-form even-dof chi-square survival p
      operators.Sessions.ljungBox(
        Tables(s, dir, "events").filter(col("ts").isNotNull))
    }),

    "q252_pettitt" -> ((s, dir) => {
      // Pettitt change-point locator per event type — WHERE the daily
      // series shifted: EWMA (q175) alarms on a day, CUSUM (q179) on a
      // sustained shift, MK (q251) says whether a trend exists; this
      // pinpoints the most likely split day with a distribution-free p
      operators.Sessions.pettittTest(
        Tables(s, dir, "events").filter(col("ts").isNotNull))
    }),

    "q300_trend_card" -> ((s, dir) => {
      // the whole trend review in ONE events pass: Mann-Kendall z +
      // Sen's slope (q251), the Cox-Stuart paired-halves sign (q289),
      // and the null-reversed KPSS stationarity reading (q290) — all
      // three standalones rebuild the same (type, day) daily aggregate,
      // the card builds it once; display chains verbatim, oracle
      // composed from the standalones' own SQL (TrendCardSpec pins it)
      operators.Sessions.trendCard(Tables(s, dir, "events"))
        .orderBy(col("event_type"))
    }),

    "q251_mk_trend" -> ((s, dir) => {
      // Mann-Kendall + Sen's slope per event type over daily counts —
      // the robust "is this series drifting, and how fast?" pairing
      // beside EWMA (q175)/CUSUM (q179)/ACF (q189): distribution-free
      // monotone-trend z and the median-of-pairwise-slopes rate
      operators.Sessions.mannKendallTrend(
        Tables(s, dir, "events").filter(col("ts").isNotNull))
    }),

    // ---- streaming-monitor batch replays (r17 VERDICT item 4): the
    // REAL flatMapGroupsWithState operators driven deterministically
    // over the events table (7-day calibration prefix fits the
    // reference, the remainder streams through one micro-batch), each
    // hash-pinned by a DuckDB oracle replaying the whole composition —
    // window rollover, cumulative blend, reference handoff included ----

    "q302_ph_replay" -> ((s, dir) =>
      streaming.MonitorReplay.pageHinkleyReplay(s, dir)),

    "q303_spread_replay" -> ((s, dir) =>
      streaming.MonitorReplay.spreadReplay(s, dir)),

    "q304_kuiper_replay" -> ((s, dir) =>
      streaming.MonitorReplay.kuiperReplay(s, dir)),

    "q305_cvm_replay" -> ((s, dir) =>
      streaming.MonitorReplay.cvmReplay(s, dir)),

    "q306_ks_replay" -> ((s, dir) =>
      streaming.MonitorReplay.ksReplay(s, dir)),

    "q307_w1_replay" -> ((s, dir) =>
      streaming.MonitorReplay.w1Replay(s, dir)),

    "q308_cusum_replay" -> ((s, dir) =>
      streaming.MonitorReplay.cusumReplay(s, dir)),

    "q309_conformal_replay" -> ((s, dir) =>
      streaming.MonitorReplay.conformalReplay(s, dir)),

    "q310_precision_replay" -> ((s, dir) =>
      streaming.MonitorReplay.precisionReplay(s, dir)),

    "q311_auc_replay" -> ((s, dir) =>
      streaming.MonitorReplay.aucReplay(s, dir)),

    "q312_calibration_replay" -> ((s, dir) =>
      streaming.MonitorReplay.calibrationReplay(s, dir)),

    "q313_psi_replay" -> ((s, dir) =>
      streaming.MonitorReplay.scoreDriftReplay(s, dir)),

    "q314_sprt_replay" -> ((s, dir) =>
      streaming.MonitorReplay.sprtReplay(s, dir)),

    "q315_parity_replay" -> ((s, dir) =>
      streaming.MonitorReplay.parityReplay(s, dir)),

    "q316_js_replay" -> ((s, dir) =>
      streaming.MonitorReplay.jsDriftReplay(s, dir)),

    "q317_quality_replay" -> ((s, dir) =>
      streaming.MonitorReplay.qualityReplay(s, dir)),

    "q318_transition_replay" -> ((s, dir) =>
      streaming.MonitorReplay.transitionReplay(s, dir)),


    "q250_friedman" -> ((s, dir) => {
      // Friedman chi2 + Kendall's W over q228's THREE band raters:
      // kappa (q228) asks whether the raters AGREE; this asks whether
      // one scoring rule is SYSTEMATICALLY harsher across documents —
      // within-doc midranks, exact integer sums, one division
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      val num = size(stops).cast("long")
      val den = size(toks).cast("long")
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.friedmanTest(d, Seq(
        when(num * 10 < den, 0L).when(num * 5 < den, 1L).otherwise(2L),
        when(tok < 40, 0L).when(tok < 70, 1L).otherwise(2L),
        when(col("n_chars") < 220, 0L).when(col("n_chars") < 380, 1L)
          .otherwise(2L)))
    }),

    "q249_drift_card" -> ((s, dir) => {
      // the screen triad (q232 KS+FDR / q235 W1 / q241 delta) over ONE
      // shared per-(source, token-count) histogram and ONE group-keyed
      // aggregate — value-identical to the three standalone screens
      // (DriftCardSpec pins it), one corpus pass instead of three
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.driftScreenCard(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q248_energy_distance" -> ((s, dir) => {
      // 1-D energy distance (2x Cramer distance) over the even/odd
      // event-value split — the L2^2 VALUE-units integral completing the
      // distance family's geometry beside q222's L1 transport, q220's
      // sup-norm, and q238's pooled-weighted CvM test statistic
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.energyDistance(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q247_breslow_day" -> ((s, dir) => {
      // Breslow-Day + Tarone: is q245's common odds ratio actually
      // CONSTANT across sources? The homogeneity check MH assumes —
      // same strata/exposure/outcome as q245, grain-quantized sums so
      // the chain replays with NO bound on stratum count
      operators.Quality.breslowDay(
        Tables(s, dir, "documents")
          .filter(col("lang").isNotNull && col("n_chars").isNotNull &&
            col("source").isNotNull),
        col("lang") === "en",
        col("n_chars") >= 150,
        col("source"))
    }),

    "q246_vocab_richness" -> ((s, dir) => {
      // Good-Turing unseen mass + Chao1 richness bound from the
      // frequency-of-frequencies table — the closed-form "how much new
      // vocabulary will the next crawl add?" beside q142's empirical
      // growth curve and q202's Heaps fit
      operators.CorpusAnalytics.vocabRichness(
        Tables(s, dir, "documents").filter(col("text").isNotNull))
    }),

    "q244_ca_trend" -> ((s, dir) => {
      // Cochran-Armitage: does the purchase RATE trend across the ISO
      // week? The binary-outcome sibling of q242's JT (which asks the
      // same ordered question of a metric) — one bounded hash agg,
      // integer score sums, one z chain
      operators.Quality.cochranArmitage(
        Tables(s, dir, "events").filter(col("ts").isNotNull),
        (col("event_type") === "purchase").cast("long"),
        weekday(to_date(col("ts"))) + 1)
    }),

    "q245_mantel_haenszel" -> ((s, dir) => {
      // Mantel-Haenszel: are English docs longer AFTER controlling for
      // source? The confounder-adjusted 2x2 the pooled two-proportion
      // comparison (q226) gets wrong under Simpson's paradox — one
      // strata-bounded agg, sorted-stratum in-row folds
      operators.Quality.mantelHaenszel(
        Tables(s, dir, "documents")
          .filter(col("lang").isNotNull && col("n_chars").isNotNull &&
            col("source").isNotNull),
        col("lang") === "en",
        col("n_chars") >= 150,
        col("source"))
    }),

    "q243_logrank" -> ((s, dir) => {
      // two-cohort log-rank test: does user-id-parity cohort 0's
      // retention curve differ from cohort 1's? The significance
      // companion to q180's Kaplan-Meier curve (same lifetimes, same
      // churn rule), weighting every event day by its risk set
      operators.Sessions.logRankTest(Tables(s, dir, "events"),
        pmod(col("user_id"), lit(2)), churnGapDays = 1)
    }),

    "q242_jt_trend" -> ((s, dir) => {
      // Jonckheere-Terpstra ordered trend: does event value trend
      // monotonically across the ISO week (Mon..Sun as the ordered
      // groups)? The ordered question q229/q234/q239's unordered
      // omnibus family cannot ask — JT concentrates power on
      // "later group => stochastically larger values"
      val ev = Tables(s, dir, "events")
        .filter(col("value").isNotNull && col("ts").isNotNull)
      operators.Quality.jonckheereTerpstra(ev,
        col("value"), weekday(to_date(col("ts"))) + 1)
    }),

    "q240_effect_sizes" -> ((s, dir) => {
      // standardized effect sizes over q220's even/odd event-value split
      // — the scale-free "how big?" panel beside the triad's tests:
      // Cliff's delta (ordinal dominance = 2*AUC-1, from the exact
      // doubled-midrank integer kernel), Cohen's d and Hedges' g
      // (standardized mean difference, moments as 2^-20-grain exact
      // integer sums). All displays signed BIGINT basis points
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.effectSizes(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q241_delta_screen" -> ((s, dir) => {
      // the effect-size member completing the per-source drift-screen
      // triad on the shared token-count histogram: q232 says WHICH
      // source drifted (KS + FDR), q235 what it COSTS (W1 transport),
      // this how directionally DOMINANT each source is (Cliff's delta
      // vs the complement, with the probability-of-superiority AUC twin)
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.groupedCliffsDelta(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q235_w1_screen" -> ((s, dir) => {
      // the magnitude companion to q232's KS screen: per-source
      // 1-Wasserstein distance of the token-count distribution from the
      // rest of the corpus — q232 says WHICH source drifted, this says
      // how much the drift costs in token units (q222's transport
      // distance, asked once per source against its complement)
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.groupedW1(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q236_substr_pairs" -> ((s, dir) => {
      // Lee et al. 2022 ExactSubstr pair evidence: for every doc pair
      // sharing a token run >= 6, the longest shared run and the count of
      // maximal shared runs — capped shingle postings + diagonal islands,
      // the "who shares the span with whom" report upstream of q107's
      // removal pass. All-integer output.
      operators.CorpusAnalytics.exactSubstringPairs(Tables(s, dir, "documents"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    "q237_long_passage_removal" -> ((s, dir) => {
      // the length-gated removal Lee et al. actually ship: strip only
      // positions inside cross-doc duplicated runs >= 20 tokens (scaled
      // from the paper's 50 to this corpus's ~54-token docs) — q107's
      // strip-everything pass is the minRun = n special case
      operators.CorpusAnalytics
        .removeLongDuplicatedPassages(Tables(s, dir, "documents"), minRun = 20)
        .orderBy(col("doc_id"))
    }),

    "q230_brown_forsythe" -> ((s, dir) => {
      // Brown-Forsythe robust variance-homogeneity: did the token-count
      // SPREAD change across sources where q229 asked about the mean?
      // exact group medians doubled to integers, anovaF on |2v - 2m|
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.brownForsythe(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q231_cronbach_alpha" -> ((s, dir) => {
      // Cronbach's alpha over q228's three quality bands: do the cheap
      // sub-signals hang together as one scale before anyone averages
      // them? integer variance numerators, one aggregate
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      val num = size(stops).cast("long")
      val den = size(toks).cast("long")
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.cronbachAlpha(d, Seq(
        when(num * 10 < den, 0L).when(num * 5 < den, 1L).otherwise(2L),
        when(tok < 40, 0L).when(tok < 70, 1L).otherwise(2L),
        when(col("n_chars") < 220, 0L).when(col("n_chars") < 380, 1L)
          .otherwise(2L)))
    }),

    "q228_fleiss_kappa" -> ((s, dir) => {
      // Fleiss' kappa for THREE cheap quality raters at once — stopword
      // band, token band, char band — the multi-rater agreement q136's
      // pairwise Cohen can't report; one conditional aggregate, integer
      // vote masses
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      val num = size(stops).cast("long")
      val den = size(toks).cast("long")
      val tok = functions.TextAnalysis.tokenCount(col("text")).cast("long")
      operators.Quality.fleissKappa(d, Seq(
        when(num * 10 < den, 0L).when(num * 5 < den, 1L).otherwise(2L),
        when(tok < 40, 0L).when(tok < 70, 1L).otherwise(2L),
        when(col("n_chars") < 220, 0L).when(col("n_chars") < 380, 1L)
          .otherwise(2L)),
        numCategories = 3)
    }),

    "q229_anova" -> ((s, dir) => {
      // one-way ANOVA F + eta^2 of token count across the 20 sources —
      // does the mean length differ by source, and how much variance
      // does source explain? per-group integral moments, sorted fold
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      operators.Quality.anovaF(d,
        functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        col("source"))
    }),

    "q226_rate_diff" -> ((s, dir) => {
      // two-proportion z comparison of the stopword-pass rate between
      // sources src0 and src1 — the A/B answer q191's per-group Wilson
      // CIs only hint at; four integer masses, one double chain
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      val pass = size(stops).cast("long") * 20 >= size(toks).cast("long") * 3
      operators.Quality.proportionDiff(
        d.filter(col("source") === "src0"),
        d.filter(col("source") === "src1"),
        pass)
    }),

    "q227_mcnemar" -> ((s, dir) => {
      // McNemar's paired test: the stopword keep-rule vs the token-count
      // keep-rule on the SAME documents — is their disagreement biased
      // in one direction? four decision masses, the (b-c)^2/(b+c) chain
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      operators.Quality.mcnemarTest(d,
        size(stops).cast("long") * 20 >= size(toks).cast("long") * 3,
        functions.TextAnalysis.tokenCount(col("text")).cast("long") >= 40)
    }),

    "q225_uncertainty_coeff" -> ((s, dir) => {
      // Theil's U both ways + mutual information for lang x source —
      // the DIRECTIONAL association q186's chi-square can't give: how
      // much of the language mix does knowing the source explain, and
      // the (different) reverse; sorted-list entropy folds, nats
      operators.Quality.uncertaintyCoefficient(
        Tables(s, dir, "documents")
          .filter(col("lang").isNotNull && col("source").isNotNull),
        col("lang"), col("source"))
    }),

    "q224_kendall_tau" -> ((s, dir) => {
      // Kendall tau-b between the stopword-ratio decile and the
      // token-count decile — pairwise ordinal agreement of the two
      // quality bands (q218's Spearman asks the midrank version); the
      // 10x10 grid collapses distributed, C/D via the bounded driver
      // Fenwick pass
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      val prep = d.select(
        size(stops).cast("long").as("num"),
        size(toks).cast("long").as("den"),
        functions.TextAnalysis.tokenCount(col("text")).cast("long").as("tok"))
        .selectExpr(
          "least(CAST(9 AS BIGINT), CAST(num AS DECIMAL(38,0)) * 10 div CAST(den AS DECIMAL(38,0))) AS xb",
          "least(CAST(9 AS BIGINT), tok div 10) AS yb")
      operators.Quality.kendallTauB(prep, col("xb"), col("yb"))
    }),

    "q223_pr_curve" -> ((s, dir) => {
      // operating-characteristic sweep of the calibration family's
      // stopword-rational score against the src0 label: which threshold
      // bin should the keep-filter ship? confusion masses BIGINT, rates
      // in basis points, suffix sums folded in-row over the 10-bin array
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      operators.Quality.prCurve(d,
        size(stops).cast("long"), size(toks).cast("long"),
        col("source") === "src0")
        .orderBy(col("thr_bin"))
    }),

    "q222_wasserstein" -> ((s, dir) => {
      // exact 1-Wasserstein transport distance over q220's even/odd
      // event-value split — "how much mass moved and how far": integer
      // cross-mass CDF gaps x value gaps, 2^20 fixed-point sum, plus the
      // range-normalized bp rendering
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.wassersteinDistance(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q221_mann_whitney" -> ((s, dir) => {
      // two-sample Mann-Whitney rank-sum over q220's even/odd event-value
      // split — the stochastic-dominance companion to the KS distance:
      // doubled rank sum from histogram midranks (exact integer), the
      // common-language effect size in bp, tie-corrected normal z
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.mannWhitneyU(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q220_ks_test" -> ((s, dir) => {
      // exact two-sample KS over q215's even/odd event-value split — the
      // binless CDF-distance companion to the binned PSI; the supremum is
      // an integer max of |cum_a*n_b - cum_b*n_a| cross-masses
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.ksTest(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value")
    }),

    "q219_rbo" -> ((s, dir) => {
      // rank-biased overlap between the BM25 top-10 and the dense cosine
      // top-10 (q201's two input lists): does the dense ranking agree
      // with the lexical one where the weight is — at the top?
      val sparse = operators.Ranking.bm25Rank(Tables(s, dir, "documents"),
        Seq("merge", "batch", "window", "stream"), topN = 10)
      val emb = Tables(s, dir, "embeddings")
      val dense = operators.Similarity.topKPerQuery(
        emb, emb.filter(col("vec_id") === 0)
          .withColumnRenamed("vec_id", "query_id"), k = 10)
        .withColumnRenamed("vec_id", "doc_id")
      operators.Ranking.rboOverlap(sparse, dense)
    }),

    "q218_spearman" -> ((s, dir) => {
      // Spearman rank correlation (exact tie midranks via the q137
      // distributed-rank machinery, doubled-midrank integer moments)
      // between the stopword-ratio quality signal and the token count —
      // the "can the cheap signal replace the expensive one?" audit
      val d = Tables(s, dir, "documents").filter(col("text").isNotNull)
      operators.Quality.spearmanCorrelation(d,
        functions.TextAnalysis.stopwordRatio(col("text")),
        functions.TextAnalysis.tokenCount(col("text")),
        "doc_id")
    }),

    "q217_governance_card" -> ((s, dir) => {
      // the one-row filter-governance card a curation run publishes next
      // to q200's dataset card: the audit shelf's headline numbers —
      // calibration (ECE/Brier), fairness (parity / equalized-odds
      // gaps), and corpus drift (token-mix PSI) — every column BIGINT
      // (the q200 integer-card discipline; PSI enters as
      // floor(psi*1e4+0.5) of the already-rounded statistic). Each
      // column is BISECTABLE BY CONSTRUCTION: it is exactly one already
      // hash-green standalone query's value (q210 / q214 / q211 / q220 /
      // q218), so a red here localizes without dedicated a/b/c/d twins.
      //
      // FUSED (r16 VERDICT item 4, the q293/q294 shared-aggregate
      // discipline): the r16 shape recomputed its five legs from the
      // corpus — four documents scans (three of them re-tokenizing) and
      // two events scans. Now ONE cached per-doc projection (integer
      // token masses + the q218 signal pair, tokenized once) feeds the
      // calibration, fairness, and Spearman legs through the SAME
      // operator functions as the standalone queries, and the drift/KS
      // legs fuse their even/odd sides into single scans via
      // psiStabilitySided / ksTestSided — code paths the standalone
      // forms now delegate to, so fused and standalone cannot drift.
      // GovernanceCardSpec pins column-for-column equality with the r16
      // five-leg composition.
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      val base = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"), col("source"),
          size(stops).cast("long").as("_stops"),
          size(toks).cast("long").as("_toks"),
          functions.TextAnalysis.stopwordRatio(col("text")).as("_swr"),
          functions.TextAnalysis.tokenCount(col("text")).as("_tc"))
        .persist()
      val labeled = base.filter(col("source").isNotNull)
      // the five legs are independent until the final one-row crossJoin,
      // and each one's internal rank/prefix machinery submits bounded
      // driver-side jobs at CONSTRUCTION time (offset collects, order-
      // statistic pulls) — built sequentially they serialize ~40 small
      // jobs. Construct them concurrently (guide §2.6 overlap: later
      // legs' tasks back-fill executors idled by earlier legs' tails);
      // the shared persisted `base` is race-safe (BlockManager computes
      // each cached partition once under its per-block lock). Results
      // are unchanged: the legs never communicate until the crossJoin.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val calF = Future(operators.Quality.calibrationSummary(
        labeled, col("_stops"), col("_toks"), col("source") === "src0")
        .select(col("n").as("n_docs"), col("n_pos").as("n_src0"),
          col("ece_bp"), col("brier_bp")))
      val fairF = Future(operators.Quality.fairnessGaps(labeled, "lang",
        col("_stops"), col("_toks"),
        col("source") === "src0", thrNum = 3L, thrDen = 20L)
        .select(col("n_groups"), col("parity_gap_bp"), col("eo_gap_bp")))
      val driftF = Future(operators.CorpusAnalytics.psiStabilitySided(
        Tables(s, dir, "documents")
          .withColumn("_side", pmod(col("doc_id"), lit(2)).cast("int")),
        "_side")
        .select(floor(col("psi") * 10000 + lit(0.5)).cast("long").as("psi_bp")))
      val ksF = Future(operators.Quality.ksTestSided(
        Tables(s, dir, "events").filter(col("value").isNotNull)
          .withColumn("_side", pmod(col("event_id"), lit(2)).cast("int")),
        "value", "_side")
        .select(floor(col("ks_d") * 10000 + lit(0.5)).cast("long")
          .as("ks_d_bp")))
      val spF = Future(operators.Quality.spearmanCorrelation(base,
        col("_swr"), col("_tc"), "doc_id")
        .select(floor(col("rho") * 10000 + lit(0.5)).cast("long")
          .as("spearman_bp")))
      val Seq(cal, fair, drift, ks, sp) = Await.result(
        Future.sequence(Seq(calF, fairF, driftF, ksF, spF)), Duration.Inf)
      cal.crossJoin(broadcast(fair)).crossJoin(broadcast(drift))
        .crossJoin(broadcast(ks)).crossJoin(broadcast(sp))
    }),

    "q216_grouped_calibration" -> ((s, dir) => {
      // q210's ECE/Brier per language — multicalibration-lite: a scorer
      // calibrated on average can be miscalibrated in every subpopulation
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      operators.Quality.calibrationByGroup(d, "lang",
        size(stops).cast("long"), size(toks).cast("long"),
        col("source") === "src0")
        .orderBy(col("group_key"))
    }),

    "q215_score_drift" -> ((s, dir) => {
      // numeric PSI of the event value distribution, even vs odd event
      // ids: reference-decile bins (exact distributed order statistics
      // as plan literals), one union + one bin-keyed agg, banded PSI
      val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
      operators.Quality.scoreDrift(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value", "event_id")
    }),

    "q213_fairness_audit" -> ((s, dir) => {
      // per-language confusion masses + selection/TPR/FPR of the
      // thresholded stopword-ratio filter against the src0 label — the
      // "does this quality filter starve a language?" audit. The decision
      // is the exact cross-multiplication num*20 >= den*3 (threshold
      // 0.15), so the whole report is integer-typed
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      operators.Quality.fairnessAudit(d, "lang",
        size(stops).cast("long"), size(toks).cast("long"),
        col("source") === "src0", thrNum = 3L, thrDen = 20L)
        .orderBy(col("group_key"))
    }),

    "q214_fairness_gaps" -> ((s, dir) => {
      // q213 rolled into the worst-case cross-group gaps: demographic
      // parity (selection-rate spread) and equalized odds (the larger of
      // the TPR/FPR spreads)
      val d = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && col("source").isNotNull)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val stops = filter(toks, t =>
        t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
      operators.Quality.fairnessGaps(d, "lang",
        size(stops).cast("long"), size(toks).cast("long"),
        col("source") === "src0", thrNum = 3L, thrDen = 20L)
    }),

    "q207_score_auc" -> ((s, dir) => {
      // exact ROC AUC (Mann-Whitney with midranks) of the stopword-ratio
      // quality signal against the src0 label — the "does this score
      // separate anything?" audit; global ranks via the q137 distributed
      // range-partition machinery, tie midranks as integer (min+max)
      // pairs, one decimal-exact sum
      operators.Ranking.scoreAuc(
        Tables(s, dir, "documents").filter(col("text").isNotNull),
        functions.TextAnalysis.stopwordRatio(col("text")),
        col("source") === "src0")
    }),

    "q206_conformal_interval" -> ((s, dir) => {
      // split-conformal calibration of the n_chars ~ tokens OLS predictor:
      // exact order-statistic threshold on the doc_id%5 calibration split,
      // empirical coverage audited on the rest (alpha = 0.1)
      val docs = Tables(s, dir, "documents")
        .withColumn("tok", functions.TextAnalysis.tokenCount(col("text")).cast("long"))
      operators.Quality.conformalInterval(docs, xCol = "tok", yCol = "n_chars")
    }),

    "q204_winsorize" -> ((s, dir) => {
      // per-type winsorization of event values into the exact [p05, p95]
      // band — keeps every row, bounds outlier leverage; grouped
      // distributed order statistics broadcast back, map-side clip
      operators.Normalize.winsorize(Tables(s, dir, "events"),
        groupCol = "event_type", valueCol = "value", idCol = "event_id")
        .orderBy(col("event_id"))
    }),

    "q205_temporal_split" -> ((s, dir) => {
      // embargoed (purged) temporal split over the event stream: train
      // < p60, 10% embargo band dropped, test >= p70 — the split audit
      // whose min/max make the leakage gap a checkable fact
      operators.Sampling.temporalSplit(Tables(s, dir, "events"), "ts")
        .orderBy(col("split"))
    }),

    "q201_hybrid_rrf" -> ((s, dir) => {
      // hybrid search: BM25 top-20 for the fixed term query fused with the
      // dense cosine top-20 around vec 0 by reciprocal-rank fusion — both
      // input lists are k-bounded, so the fusion is a tiny outer join
      val sparse = operators.Ranking.bm25Rank(Tables(s, dir, "documents"),
        Seq("merge", "batch", "window", "stream"), topN = 20)
      val emb = Tables(s, dir, "embeddings")
      val dense = operators.Similarity.topKPerQuery(
        emb, emb.filter(col("vec_id") === 0)
          .withColumnRenamed("vec_id", "query_id"), k = 20)
        .withColumnRenamed("vec_id", "doc_id")
      operators.Ranking.rrfFuse(sparse, dense, topN = 10)
        .orderBy(col("rnk"))
    }),

    "q202_token_burstiness" -> ((s, dir) => {
      // Church-Gale Fano factors for the 20 highest-df tokens: function
      // words sit near Poisson (~1), topical terms burst well above —
      // integer moment sums, one (doc, token) shuffle
      operators.CorpusAnalytics.tokenBurstiness(
        Tables(s, dir, "documents"), topM = 20)
        .orderBy(col("rnk"))
    }),

    "q203_embedding_isotropy" -> ((s, dir) => {
      // embedding-space health before trusting any cosine threshold:
      // centroid distance from origin vs mean norm (anisotropy), mean
      // cosine to the centroid — fixed-point integer sums for cross-row
      // determinism, dim-bounded shuffles only
      operators.Similarity.isotropyAudit(Tables(s, dir, "embeddings"))
    }),

    "q199_dedup_yield" -> ((s, dir) => {
      // dedup planning curve: exact-Jaccard pair counts per 0.05 band at
      // j >= 0.5 with suffix-cumulative "pairs removable at threshold t";
      // bands come from floor(j*20) — exact arithmetic, no rounding
      val pairs = Dedup.ngramJaccardPairs(Tables(s, dir, "documents"),
        n = 3, threshold = 0.5, bands = 32, numHashes = 32)
      val banded = pairs
        .select((floor(col("jaccard") * 20) / 20).as("band"))
        .groupBy(col("band")).agg(count(lit(1)).as("n_pairs"))
      banded.groupBy()
        .agg(sort_array(collect_list(struct(col("band"), col("n_pairs")))).as("h"))
        .select(posexplode(col("h")).as(Seq("_i", "e")), col("h"))
        .select(col("e.band").as("band"), col("e.n_pairs").as("n_pairs"),
          aggregate(
            slice(col("h"), col("_i") + 1, size(col("h")) - col("_i")),
            lit(0L), (a, x) => a + x.getField("n_pairs")).as("n_cum"))
        .orderBy(col("band"))
    }),

    "q198_oov_rate" -> ((s, dir) => {
      // per-doc OOV share against the corpus top-1000 vocab; floor-form
      // rounding on the integer-mass ratio
      operators.CorpusAnalytics.oovRate(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q197_heaps_fit" -> ((s, dir) => {
      // Heaps' law V = K*N^beta over 10 md5-random cumulative samples;
      // zipfSlope's OLS arithmetic in bucket order
      operators.CorpusAnalytics.heapsFit(Tables(s, dir, "documents"))
    }),

    "q196_neyman_allocation" -> ((s, dir) => {
      // Neyman-optimal stratified budget: 1000 rows allocated across
      // languages proportional to N_h * sigma_h of tokens-per-doc
      operators.Sampling.neymanAllocation(
        Tables(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("lang"),
            functions.TextAnalysis.tokenCount(col("text")).as("v")),
        "lang", "v", budget = 1000L)
        .orderBy(col("stratum"))
    }),

    "q195_export_manifest" -> ((s, dir) => {
      // 8-shard integrity manifest over documents: order-independent
      // DECIMAL(38) checksum of md5-prefix row hashes per shard
      operators.Export.exportManifest(
        Tables(s, dir, "documents"), "doc_id",
        Seq("doc_id", "text", "lang", "source"), shards = 8)
        .orderBy(col("shard"))
    }),

    "q194_lsh_plan" -> ((s, dir) => {
      // MMDS S-curve tuning table for 64 minhash signatures: candidate
      // probability at noise (0.3) and target (0.8) similarity per (b, r)
      // split, best split flagged — pure expression arithmetic
      operators.Dedup.lshParameterPlan(s)
        .orderBy(col("b"))
    }),

    "q193_session_paths" -> ((s, dir) => {
      // top-20 user journeys: gap-sessionized, types joined in (ts, id)
      // order, frequency + share; one user-window exchange
      operators.Sessions.sessionPaths(Tables(s, dir, "events"))
    }),

    "q192_theil" -> ((s, dir) => {
      // Theil T of tokens-per-doc decomposed between/within languages;
      // histogram folds, 0*ln0 = 0, identity pinned at 1e-9
      operators.Quality.theilDecomposition(
        Tables(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("lang"),
            functions.TextAnalysis.tokenCount(col("text")).as("v")),
        "lang", "v")
    }),

    "q191_wilson_interval" -> ((s, dir) => {
      // per-source Wilson 95% CI on the >=50-token pass rate — the
      // small-n-honest proportion interval, fixed-order scalar chain
      operators.Quality.wilsonInterval(
        Tables(s, dir, "documents").filter(col("text").isNotNull),
        "source",
        functions.TextAnalysis.tokenCount(col("text")) >= 50)
        .orderBy(col("grp"))
    }),

    "q190_source_jsd" -> ((s, dir) => {
      // pairwise Jensen-Shannon divergence between source unigram
      // distributions over the shared top-100 vocab; token-ordered KL
      // folds, zero terms exact 0
      operators.CorpusAnalytics.sourceDivergenceMatrix(
        Tables(s, dir, "documents"), groupCol = "source")
        .orderBy(col("group_a"), col("group_b"))
    }),

    "q189_autocorrelation" -> ((s, dir) => {
      // Box-Jenkins ACF of daily counts per type, lags 1..7 — fixed-order
      // in-row folds over the calendar-bounded series, exact replay
      operators.Sessions.autocorrelation(Tables(s, dir, "events"))
        .orderBy(col("event_type"), col("lag"))
    }),

    "q188_lang_id_report" -> ((s, dir) => {
      // sklearn-style per-class precision/recall/F1 over the trained NB
      // lang-id's self-predictions; the oracle wraps q158's full model
      // replay and joins the true labels back
      val docs = Tables(s, dir, "documents")
      val preds = operators.NaiveBayes.langPredict(docs)
      operators.Quality.classificationReport(
        preds.join(docs.select(col("doc_id"), col("lang").as("label")), "doc_id")
          .select(col("label"), col("lang_pred")),
        "label", "lang_pred")
        .orderBy(col("clazz"))
    }),

    "q187_word_vectors" -> ((s, dir) => {
      // Levy-Goldberg count-based word vectors: the ppmi_fro value pins
      // the whole distributed vocab + window-co-occurrence + PPMI build
      // against the oracle; the driver eigen step certifies itself
      operators.CorpusAnalytics.wordVectorContract(Tables(s, dir, "documents"))
    }),

    "q185_gini" -> ((s, dir) => {
      // Gini concentration of events-per-user and tokens-per-doc via the
      // bounded value-histogram rank formula — no global sort of keys
      val ev = Tables(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("v"))
      val docs = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(functions.TextAnalysis.tokenCount(col("text")).as("v"))
      operators.Quality.giniConcentration(ev, "v")
        .select(lit("events_per_user").as("dimension"), col("n"), col("total"), col("gini"))
        .unionAll(operators.Quality.giniConcentration(docs, "v")
          .select(lit("tokens_per_doc").as("dimension"), col("n"), col("total"), col("gini")))
        .orderBy(col("dimension"))
    }),

    "q186_chi_square" -> ((s, dir) => {
      // Pearson chi-square independence: event_type x ISO day-of-week;
      // one bounded contingency agg, margins and the statistic by in-row
      // sorted-cell folds
      operators.Quality.chiSquareIndependence(
        Tables(s, dir, "events")
          .select(col("event_type"),
            (weekday(to_date(col("ts"))) + 1).as("dow")),
        "event_type", "dow")
        .orderBy(col("a"), col("b"))
    }),

    "q184_association_rules" -> ((s, dir) => {
      // market-basket support/confidence/lift over per-user event-type
      // baskets, both rule directions; integer-mass divisions, round 4
      operators.Sessions.associationRules(Tables(s, dir, "events"))
        .orderBy(col("antecedent"), col("consequent"))
    }),

    "q183_windowed_pmi" -> ((s, dir) => {
      // word2vec-window (±3) co-occurrence PMI, canonical unordered pairs;
      // the oracle replays via a positions self-join, the engine via
      // in-array shifted zips — counts and the ln ratio agree exactly
      operators.CorpusAnalytics.windowedPmi(Tables(s, dir, "documents"))
    }),

    "q182_readability" -> ((s, dir) => {
      // Flesch-Kincaid grade + reading ease with the classic vowel-run
      // syllable and terminal-punctuation sentence proxies — map-side
      // regexp arithmetic, exact replay
      Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          functions.TextAnalysis.readability(col("text")).as("r"))
        .select(col("doc_id"), col("r.n_words").as("n_words"),
          col("r.n_sentences").as("n_sentences"),
          col("r.n_syllables").as("n_syllables"),
          col("r.fk_grade").as("fk_grade"),
          col("r.flesch_ease").as("flesch_ease"))
        .orderBy(col("doc_id"))
    }),

    "q181_retrieval_metrics" -> ((s, dir) => {
      // IR eval triple (recall@10 / MRR / NDCG@10) scoring Matryoshka-style
      // 16-dim truncated retrieval against the full-64-dim exact top-10 —
      // both sides brute-force, so the oracle replays everything
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 10)
      val exact = operators.Similarity.topKPerQuery(corpus, queries, 10)
      val approx = operators.Similarity.topKPerQuery(
        corpus.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding")),
        queries.select(col("query_id"), slice(col("embedding"), 1, 16).as("embedding")),
        10)
      operators.Similarity.retrievalMetrics(exact, approx, 10)
        .orderBy(col("query_id"))
    }),

    "q180_kaplan_meier" -> ((s, dir) => {
      // Kaplan-Meier retention curve over user lifetimes (churn = >1 day
      // silent before corpus end — the corpus's own silence distribution
      // tops out at ~2.4 days; else right-censored); integer-derived
      // counts, fixed-order nested folds, exact replay
      operators.Sessions.kaplanMeier(Tables(s, dir, "events"), churnGapDays = 1)
        .orderBy(col("t_day"))
    }),

    "q179_cusum" -> ((s, dir) => {
      // Page's CUSUM level-shift detector per event type: one-sided sums
      // with Poisson-scaled slack/threshold, explicit prefix folds
      operators.Sessions.cusumDailyCounts(Tables(s, dir, "events"))
        .orderBy(col("event_type"), col("day"))
    }),

    "q178_rake_keywords" -> ((s, dir) => {
      // RAKE top-3 keyphrases per doc: stopword-run phrases, deg/freq word
      // scores, position-ordered phrase folds, rounded-score ranking
      operators.CorpusAnalytics.rakeTopPhrases(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    "q177_benford" -> ((s, dir) => {
      // Benford first-digit audit of event values: digit from the string
      // rendering (engine-stable, no log10-floor ulp trap), 9-row spine
      operators.Quality.benfordTest(Tables(s, dir, "events"), "value")
        .orderBy(col("digit"))
    }),

    "q176_ewma_anomaly" -> ((s, dir) => {
      // EWMA control chart over daily counts per event type: explicit
      // prefix folds (DuckDB's list_reduce is the same fold, so the
      // unrounded 3-sigma comparison replays bit-for-bit)
      operators.Sessions.ewmaDailyCounts(Tables(s, dir, "events"))
        .orderBy(col("event_type"), col("day"))
    }),

    "q175_jaro_winkler_join" -> ((s, dir) => {
      // blocked Jaro-Winkler record linkage over part names: the block key
      // is the first TWO tokens (blocking cardinality is the scale knob —
      // one token leaves ~200-row blocks at sf0.1, 3M scored pairs); the
      // codegen'd kernel is bit-exact to DuckDB's jaro_winkler_similarity,
      // so the unrounded >= tau filter replays
      operators.EditJoin.jaroWinklerJoin(
        Tables(s, dir, "part"), idCol = "p_partkey", strCol = "p_name",
        tau = 0.93,
        blockKey = s => concat_ws(" ",
          slice(split(lower(trim(s)), "\\s+"), 1, 2)))
        .orderBy(col("id1"), col("id2"))
    }),

    "q174_canonical_text" -> ((s, dir) => {
      // normalize-before-you-hash canonicalization: NFC + ASCII-control
      // strip + space-run collapse + trim as ONE codegen'd expression;
      // the oracle replays it with nfc_normalize + two RE2 replaces
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          functions.CanonicalText.canonical_text(col("text")).as("clean_text"),
          (functions.CanonicalText.canonical_text(col("text")) =!= col("text"))
            .as("changed"))
        .orderBy(col("doc_id"))
    }),

    "q172_replication_plan" -> ((s, dir) => {
      // stochastic-rounding epoch replicas toward the uniform mixture:
      // n = floor(w) + md5-Bernoulli(frac(w)); E[n] = w exactly
      val docs = Tables(s, dir, "documents")
      val weights = operators.CorpusAnalytics.mixtureWeights(docs, "lang")
        .select(col("lang"), col("uniform_weight"))
      operators.Sampling.replicationPlan(
        docs.join(broadcast(weights), "lang")
          .select(col("doc_id"), col("uniform_weight").as("weight")),
        weightCol = "weight")
        .orderBy(col("doc_id"))
    }),

    "q173_eval_contamination" -> ((s, dir) => {
      // per-EVAL-example contamination (q89's eval split: doc_id % 50 = 0):
      // share of the eval doc's distinct 3-grams found anywhere in train;
      // the train gram stream semi-filters against the broadcast eval
      // universe and never shuffles
      val docs = Tables(s, dir, "documents")
      operators.CorpusAnalytics.evalContamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0))
        .orderBy(col("doc_id"))
    }),

    "q171_clustering_coeff" -> ((s, dir) => {
      // Watts-Strogatz local clustering coefficient over the mutual 5-NN
      // embedding graph: manifold-quality per vector; O(n*k^2) wedge
      // closure, never n^2
      operators.Graphs.clusteringCoefficient(Tables(s, dir, "embeddings"))
        .orderBy(col("vec_id"))
    }),

    "q169_transition_matrix" -> ((s, dir) => {
      // first-order Markov transitions over per-user event streams:
      // P(to|from) from lead-window adjacent pairs; one user shuffle,
      // types^2-bounded count table, broadcast normalizer
      operators.Sessions.transitionMatrix(Tables(s, dir, "events"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    "q170_rfm_segments" -> ((s, dir) => {
      // RFM quintile segmentation per user: exact percentile cuts rounded
      // to 4 before banding, DECIMAL-summed monetary, map-side band chain
      operators.Sessions.rfmSegments(Tables(s, dir, "events"))
        .orderBy(col("user_id"))
    }),

    "q168_quality_classifier" -> ((s, dir) => {
      // IRLS logistic quality classifier (reference-vs-rest on cheap text
      // features): contract pins the MLE identities — vanishing gradient,
      // sum-of-scores = n_pos (exact with an intercept) — plus re-derived
      // counts; coefficients are float-sum order dependent, so identities,
      // never raw coefficients, are what the oracle checks
      operators.Quality.qualityClassifierContract(
        Tables(s, dir, "documents"), labelExpr = col("source") === "src0")
    }),

    "q167_term_dispersion" -> ((s, dir) => {
      // Gries' DP over sources for the top-20 corpus terms: 0.5 * sum of
      // |term-share - part-share| with absent parts counted; sorted-part
      // left-associative fold, round 4
      operators.CorpusAnalytics.termDispersion(
        Tables(s, dir, "documents"), groupCol = "source")
        .orderBy(col("token"))
    }),

    "q166_lexical_diversity" -> ((s, dir) => {
      // TTR / Guiraud root TTR / MATTR(w=25) per doc — entirely in-row
      // sliding windows, integer-mass divisions, exact oracle replay
      operators.CorpusAnalytics.lexicalDiversity(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q165_passage_keep_first" -> ((s, dir) => {
      // faithful ExactSubstr "all but one" repair: strip tokens covered by
      // NON-FIRST occurrences of duplicated trigrams (within-doc repeats
      // included); the globally first (id, pos) copy survives
      operators.CorpusAnalytics
        .removeDuplicatedPassagesKeepFirst(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q164_temperature_resample" -> ((s, dir) => {
      // XLM-R temperature (alpha=0.5) resampling by language: keep rate
      // r_i = p_i^(alpha-1)/max_j p_j^(alpha-1) rounded to 4, md5 16-bit
      // Bernoulli draw; compared as per-lang kept aggregates (q109's shape)
      operators.CorpusAnalytics.temperatureResample(
        Tables(s, dir, "documents"), groupCol = "lang", alpha = 0.5)
        .groupBy(col("lang"), col("keep_rate"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
        .orderBy(col("lang"))
    }),

    "q163_count_min" -> ((s, dir) => {
      // Count-Min sketch: depth x width mergeable counter table over the
      // token stream, min-over-rows estimates for the exact top-20 probe
      // set; estimates can only overcount — the oracle replays the whole
      // sketch from the same md5-prefix bucket hash
      operators.CorpusAnalytics.countMinFrequencies(
        Tables(s, dir, "documents"))
        .orderBy(col("token"))
    }),

    "q162_gopher_repetition" -> ((s, dir) => {
      // Gopher/MassiveText within-doc repetition filters: top-{2,3,4}gram
      // char fraction + duplicated-5gram coverage fraction; integer-derived
      // single divisions, so the oracle replays exact doubles
      operators.CorpusAnalytics.gopherRepetitionSignals(
        Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q160_edit_join" -> ((s, dir) => {
      // Ed-Join edit-similarity self-join over customer names: rarest-first
      // positional q-gram prefix + location filtering (lossless — spec pins
      // equality with the brute-force join) + codegen'd levenshtein verify
      // at tau = 1. q = 3 because the names are digit-templated: bigrams
      // have ~100-symbol entropy and flood the candidate join (~8M pairs),
      // trigrams ~1000 (measured ~5x fewer candidates, same output — q is
      // filter tightness, never semantics)
      operators.EditJoin.editSimilarityJoin(
        Tables(s, dir, "customer"), idCol = "c_custkey", strCol = "c_name",
        q = 3, tau = 1)
        .orderBy(col("id1"), col("id2"))
    }),

    "q158_nb_lang_predict" -> ((s, dir) => {
      // trained multinomial NB over char trigrams (supervised lang-id):
      // fit + self-predict in one plan; the oracle replays the whole
      // model — counts, Laplace log-probs, sorted per-doc folds, rounded
      // argmax with lex-greatest tie-break
      operators.NaiveBayes.langPredict(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q157_ivfpq_ann_contract" -> ((s, dir) => {
      // IVFADC (coarse inverted lists + residual PQ + per-list ADC +
      // exact re-rank — the production ANN layout): exact side re-derived
      // by the oracle brute force (q110/q153 discipline); the composite
      // is pinned by a recall floor at nprobe=4/8 lists probed, plus
      // code-range and list-range invariants
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"))
      // q153's persist discipline: corpus feeds the centroid sample, the
      // residual-codebook pool, the exact side, the encode, and the
      // count agg; exact feeds the hits join AND the checksum agg (20
      // parquet scans in the before-plan without these)
      val corpus = emb.filter(col("vec_id") >= 10).persist()
      val exact = operators.Similarity.topKPerQuery(corpus, queries, 10)
        .persist()
      val cents = operators.Similarity.kmeansCentroids(corpus, k = 8, iters = 0)
      val books = operators.Similarity.pqResidualCodebooks(corpus, cents,
        m = 8, ksub = 16)
      val index = operators.Similarity.ivfPqEncode(corpus, cents, books)
        .persist()
      val ivfpq = operators.Similarity.ivfPqTopKPerQuery(index, cents, books,
        queries, 10, nprobe = 4, rerank = 80)
      val hits = ivfpq.select(col("query_id"), col("vec_id"))
        .join(exact.select(col("query_id"), col("vec_id")),
          Seq("query_id", "vec_id"))
        .agg(count(lit(1)).as("_hits"))
      val boundsOk = index.agg(
        min(array_min(col("codes"))).as("_cmin"),
        max(array_max(col("codes"))).as("_cmax"),
        min(size(col("codes"))).as("_szmin"),
        max(size(col("codes"))).as("_szmax"),
        min(col("cluster")).as("_lmin"), max(col("cluster")).as("_lmax"))
      corpus.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(queries.agg(count(lit(1)).as("n_queries")))
        .crossJoin(exact.agg(sum(col("vec_id")).as("exact_topk_id_sum")))
        .crossJoin(hits).crossJoin(boundsOk)
        .select(col("n_corpus"), col("n_queries"), col("exact_topk_id_sum"),
          (col("_hits") * 10 >= col("n_queries") * 5).as("recall_floor_met"),
          (col("_cmin") >= 0 && col("_cmax") <= 15 &&
            col("_szmin") === 8 && col("_szmax") === 8).as("codes_bounded"),
          (col("_lmin") >= 0 && col("_lmax") <= 7).as("lists_bounded"))
    }),

    "q156_entropy" -> ((s, dir) => {
      // char + word Shannon entropy per doc (gibberish detector):
      // integer counts folded in sorted key order so the oracle replays
      // the exact doubles; char side in-row, word side explode+agg
      operators.CorpusAnalytics.entropySignals(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q155_winnowing_overlap" -> ((s, dir) => {
      // MOSS "report pairs": doc pairs sharing >= minShared winnowing
      // fingerprints, PPJoin-style postings intersection with the
      // boilerplate df cap; oracle replays fingerprints + cap + pair join
      operators.CorpusAnalytics.winnowingOverlapPairs(
        Tables(s, dir, "documents"), k = 5, w = 4, minShared = 3, maxDf = 20)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q153_pq_ann_contract" -> ((s, dir) => {
      // product-quantized retrieval vs exact: the oracle re-derives
      // n_corpus, n_queries, and the exact-top-10 id checksum by brute
      // force (q110's discipline); the PQ side is pinned by a recall
      // floor (m=8, ksub=16, rerank=80 on dim-64 — ADC shortlist + exact
      // re-rank; floor 0.6 with margin under the measured recall) and
      // the code-range invariant
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding"))
      // intra-query persists (Bench/Verify clear caches): corpus feeds
      // the codebook collect, the exact side, the encode, and two count
      // aggs; exact feeds the hits join AND the checksum agg; encoded
      // feeds the ADC pass, the re-rank join, and the codes-bounded agg
      // — un-persisted, each consumer re-ran the whole upstream subtree
      // (22 parquet scans in the before-plan)
      val corpus = emb.filter(col("vec_id") >= 10).persist()
      val exact = operators.Similarity.topKPerQuery(corpus, queries, 10)
        .persist()
      val books = operators.Similarity.pqCodebooks(corpus, m = 8, ksub = 16)
      val encoded = operators.Similarity.pqEncode(corpus, books).persist()
      val pq = operators.Similarity.pqTopKPerQuery(encoded, books, queries, 10,
        rerank = 80)
      val hits = pq.select(col("query_id"), col("vec_id"))
        .join(exact.select(col("query_id"), col("vec_id")), Seq("query_id", "vec_id"))
        .agg(count(lit(1)).as("_hits"))
      val codesOk = encoded.agg(
        min(array_min(col("codes"))).as("_cmin"),
        max(array_max(col("codes"))).as("_cmax"),
        min(size(col("codes"))).as("_szmin"), max(size(col("codes"))).as("_szmax"))
      corpus.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(queries.agg(count(lit(1)).as("n_queries")))
        .crossJoin(exact.agg(sum(col("vec_id")).as("exact_topk_id_sum")))
        .crossJoin(hits).crossJoin(codesOk)
        .select(col("n_corpus"), col("n_queries"), col("exact_topk_id_sum"),
          (col("_hits") * 10 >= col("n_queries") * 6).as("recall_floor_met"),
          (col("_cmin") >= 0 && col("_cmax") <= 15 &&
            col("_szmin") === 8 && col("_szmax") === 8).as("codes_bounded"))
    }),

    "q152_kll_contract" -> ((s, dir) => {
      // KLL mergeable quantile sketch vs exact: n (total weight) must
      // match the row count EXACTLY (odd-level holdback preserves weight),
      // estimates must be monotone in p, and each estimate's true rank
      // must sit within eps*n of its target (eps = 0.05 at k = 200 —
      // ~10x slack over KLL's ~2.3/k bound; realized error at sf0.01 is
      // ~0.004). The oracle re-derives n and the exact interpolated
      // median; the sketch-side floors are pinned TRUE.
      import graft.functions.KllSketch
      val docs = Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(length(col("text")).cast("double").as("x"))
      val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
      val sk = docs.agg(KllSketch.kll_sketch(col("x"), 200).as("sk"))
      val ests = sk.select(
        (ps.zipWithIndex.map { case (p, i) =>
          KllSketch.kllQuantile(col("sk"), p).as(s"_e$i") } :+
          col("sk").getField("n").as("_sk_n")): _*)
      // the exact median comes from the distributed rank (bit-identical
      // to the ungrouped percentile aggregate it replaces, no
      // corpus-cardinality buffer) — and dropping Percentile from the agg
      // leaves a pure codegen'd count/sum HashAggregate
      val p50 = operators.GlobalRank.percentileValues(
        docs, "x", "x", Seq(0.5)).fold(lit(null).cast("double"))(a => lit(a(0)))
      val agg = docs.crossJoin(broadcast(ests)).agg(
        count(lit(1)).as("_n"),
        (round(max(p50), 4).as("exact_p50") +:
          ps.indices.map(i =>
            sum(when(col("x") <= col(s"_e$i"), 1L).otherwise(0L)).as(s"_r$i"))): _*)
      val eps = 0.05
      val rankOk = ps.zipWithIndex.map { case (p, i) =>
        abs(col(s"_r$i") - ceil(lit(p) * col("_n"))) <= lit(eps) * col("_n")
      }.reduce(_ && _)
      val monotone = ps.indices.sliding(2).map { w =>
        col(s"_e${w(0)}") <= col(s"_e${w(1)}") }.reduce(_ && _)
      agg.crossJoin(broadcast(ests.select(ps.indices.map(i => col(s"_e$i")) :+
          col("_sk_n"): _*)))
        .select(col("_n").as("n_rows"), col("exact_p50"),
          (col("_sk_n") === col("_n")).as("n_match"),
          monotone.as("monotone"), rankOk.as("rank_err_bound_met"))
    }),

    "q151_bpe_encode" -> ((s, dir) => {
      // learn 50 BPE merges on the thresholded word-type table, encode
      // every word type through the codegen'd literal codec; the greedy
      // invariants (roundtrip concat, contiguous-substring tokens) are
      // checked corpus-wide and pinned
      operators.CorpusAnalytics.bpeSegment(Tables(s, dir, "documents"),
        numMerges = 50, minFreq = 2L)
    }),

    "q149_bpe_pairs" -> ((s, dir) => {
      // first BPE iteration: adjacent char-pair counts weighted by word
      // frequency over the word-TYPE table (pairs generated once per
      // word, not per occurrence); top-30, ties lexicographic
      operators.CorpusAnalytics.bpePairStats(Tables(s, dir, "documents"), k = 30)
    }),

    "q150_zipf_slope" -> ((s, dir) => {
      // rank-frequency OLS over the top-200 tokens; sums folded in
      // explicit rank order (sorted collect_list -> aggregate), outputs
      // rounded so nothing hinges on ln ulps
      operators.CorpusAnalytics.zipfSlope(Tables(s, dir, "documents"), n = 200)
    }),

    "q147_seq_packing" -> ((s, dir) => {
      // GPT-style concat-and-chunk packing index: per doc, its token
      // offset in the id-ordered concatenated stream and the training
      // sequences (L = 256) it spans; all-integer bucketed cumsum
      operators.Packing.packSequences(Tables(s, dir, "documents"), seqLen = 256)
        .orderBy(col("doc_id"))
    }),

    "q148_distinct_sketch" -> ((s, dir) => {
      // mergeable per-source HLL vocabulary sketches + ONE union row
      // (sketches merge, tokens never recount); exact distincts ground
      // the contract, estimates pinned within 5%
      operators.CorpusAnalytics.distinctTokenSketch(Tables(s, dir, "documents"))
    }),

    "q145_data_profile" -> ((s, dir) => {
      // Deequ-style column profiles in ONE aggregation pass (shared
      // Expand for the exact distincts); min/max aggregated on native
      // types, rendered as strings
      operators.Quality.profile(Tables(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars", "text"))
        .orderBy(col("col_name"))
    }),

    "q146_constraint_report" -> ((s, dir) => {
      // declarative expectations -> pass/fail report, one agg pass;
      // in_range(n_chars <= 400) is deliberately violated so the report
      // exercises both outcomes
      import operators.Quality._
      operators.Quality.check(Tables(s, dir, "documents"), Seq(
        NotNull("doc_id"), NotNull("text"), Unique("doc_id"),
        InRange("n_chars", 1, 400),
        InSet("lang", Seq("de", "en", "es", "fr", "zh")),
        MatchesRegex("lang", "^[a-z]{2}$")))
        .orderBy(col("constraint"))
    }),

    "q143_pca_contract" -> ((s, dir) => {
      // PCA's self-certifying contract: projected covariance is
      // diag(top-k eigenvalues), eigenvalue mass equals the covariance
      // trace, and the projection rows are orthonormal — all checkable
      // without reproducing the eigenbasis; n_rows/d_in re-derived
      operators.Similarity.pcaVarianceCheck(Tables(s, dir, "embeddings"), k = 16)
    }),

    "q144_random_projection" -> ((s, dir) => {
      // Achlioptas sparse JL projection to 16 dims: the matrix is a pure
      // function of (seed, j, i) through the md5 draw, so the oracle
      // regenerates it exactly and replays the same accumulation order
      operators.Similarity.randomProject(Tables(s, dir, "embeddings"), k = 16, seed = 42L)
    }),

    "q142_whitening_contract" -> ((s, dir) => {
      // ZCA whitening's self-certifying contract: the whitened corpus
      // must have identity covariance and zero mean (the DEFINING
      // property — checkable without reproducing the eigenbasis);
      // n_rows grounds the twin in data
      operators.Similarity.whitenedIdentityCheck(Tables(s, dir, "embeddings"))
    }),

    "q139_pmi_collocations" -> ((s, dir) => {
      // top-30 PMI collocations (adjacent-pair lift over unigram
      // expectation): the phrase-mining pass before tokenizer training;
      // ordering on the ROUNDED score so rank never hinges on ln ulps
      operators.CorpusAnalytics.pmiCollocations(
        Tables(s, dir, "documents"), k = 30, minCount = 5)
    }),

    "q140_bootstrap_ci" -> ((s, dir) => {
      // per-source Poisson-bootstrap 95% CI on mean doc length — the
      // shard-friendly bootstrap (Poisson(1) multiplicities from a seeded
      // md5 draw, integer replica sums, rank-statistic band endpoints)
      operators.CorpusAnalytics.bootstrapCI(
        Tables(s, dir, "documents"), valueCol = "n_chars",
        groupCol = "source", replicas = 200)
        .orderBy(col("source"))
    }),

    "q141_vocab_growth" -> ((s, dir) => {
      // Heaps'-law vocabulary growth over trigram shingles: new distinct
      // grams per corpus decile + running vocab size — "does more crawl
      // still buy new language?"; all-integer arithmetic end to end
      operators.CorpusAnalytics.vocabularyGrowth(
        Tables(s, dir, "documents"), buckets = 10, gramSize = 3)
    }),

    "q138_coreset_select" -> ((s, dir) => {
      // facility-location coreset: 6 documents that best COVER the
      // embedding space (submodular greedy, (1-1/e)-optimal); coverage is
      // the objective after each pick — the diminishing-returns curve
      operators.Similarity.coresetSelect(Tables(s, dir, "embeddings"), k = 6)
        .select(col("rnk"), col("vec_id"), round(col("coverage"), 4).as("coverage"))
        .orderBy(col("rnk"))
    }),

    "q137_quantile_norm" -> ((s, dir) => {
      // cross-source quantile normalization of doc length onto the global
      // distribution — one threshold means the same thing for every
      // source; explicit rank-interpolation arithmetic on both engines
      operators.Normalize.quantileNormalize(
        Tables(s, dir, "documents"), "n_chars", "source")
        .orderBy(col("doc_id"))
    }),

    "q136_kappa_agreement" -> ((s, dir) => {
      // chance-corrected agreement between assigned labels and the kNN
      // geometry vote (q134's prediction) — one contingency shuffle on
      // compact label pairs, kappa near 0 documents that the synthetic
      // labels carry little geometric signal (the audit's point)
      val pred = operators.Graphs.labelConsistency(
        Tables(s, dir, "embeddings"), k = 5)
      operators.Normalize.cohenKappa(pred, "label", "predicted")
    }),

    "q134_label_noise" -> ((s, dir) => {
      // kNN label-consistency screening: majority label of the 5 nearest
      // neighbors vs the owner's — the mislabel/out-of-place first pass
      // (and an "do labels follow the geometry?" audit)
      operators.Graphs.labelConsistency(Tables(s, dir, "embeddings"), k = 5)
        .orderBy(col("vec_id"))
    }),

    "q135_hard_negatives" -> ((s, dir) => {
      // contrastive hard negatives: kNN pairs inside the [0.25, 0.35)
      // cosine band — informative but below the near-dup zone; the band
      // filters the k-bounded neighbor stream, never an all-pairs join
      operators.Graphs.hardNegatives(Tables(s, dir, "embeddings"),
        k = 5, lo = 0.25, hi = 0.35)
        .orderBy(col("vec_id"), col("neg_id"))
    }),

    "q117_distribution_drift" -> ((s, dir) => {
      // snapshot drift monitor: even-id half vs odd-id half — near-
      // identical synthetic mixes, so KL/JS sit near 0; the test is the
      // oracle agreeing on 4 decimals of a sum over EVERY smoothed bucket
      val docs = Tables(s, dir, "documents")
      operators.CorpusAnalytics.distributionDrift(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    }),

    "q211_psi" -> ((s, dir) => {
      // population stability index over q117's even/odd snapshot split,
      // with the industry decision band drawn from the rounded value
      val docs = Tables(s, dir, "documents")
      operators.CorpusAnalytics.psiStability(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    }),

    "q212_drift_attribution" -> ((s, dir) => {
      // WHERE the mix moved: top-20 hash buckets by PSI contribution with
      // raw masses, exact ppm rates, and the min-token sample per bucket
      val docs = Tables(s, dir, "documents")
      operators.CorpusAnalytics.driftAttribution(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1))
    }),

    "q118_contamination_provenance" -> ((s, dir) => {
      // q89's split at pair granularity: WHICH eval doc leaked into which
      // train doc, with the shared distinct-gram count as evidence
      val docs = Tables(s, dir, "documents")
      operators.CorpusAnalytics.contaminationProvenance(
        docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(50)) === 0))
        .orderBy(col("train_id"), col("eval_id"))
    }),

    "q106_interval_overlap" -> ((s, dir) => {
      // keyless interval-overlap join (both sides intervals) via two-sided
      // binning: a qualifying pair is emitted exactly once by its
      // canonical cell (the overlap's left edge), so there is NO dedup
      // shuffle — and no BroadcastNestedLoopJoin, which is Spark's native
      // plan for a join whose only predicate is the overlap inequality
      val epoch = lit("1970-01-01").cast("date")
      val a = Tables(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(200)) === 0)
        .select(col("o_orderkey").as("window_id"),
          datediff(col("o_orderdate"), epoch).cast("long").as("a_s"))
        .withColumn("a_e", col("a_s") + 14)
      val b = Tables(s, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(150)) === 0)
        .select(col("l_orderkey").as("ship_key"), col("l_linenumber").as("ln"),
          datediff(col("l_shipdate"), epoch).cast("long").as("b_s"))
        .withColumn("b_e", col("b_s") + pmod(col("ln"), lit(5)) * 7)
      operators.RangeJoin
        .intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e", binWidth = 16)
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_overlaps"), min(col("ship_key")).as("first_ship_key"))
        .orderBy(col("window_id"))
    }),

    "q105_curation_pipeline" -> ((s, dir) => {
      // the curation chain COMPOSED end-to-end in one declarative plan:
      // quality gate -> exact dedup (lowest id per fingerprint) ->
      // benchmark decontamination (q89's eval split) -> surviving corpus.
      // Each stage is individually oracled (q82/q15/q89); this pins that
      // they compose without intermediate materialization.
      val docs = Tables(s, dir, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      val evalD = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      val gate = operators.CorpusAnalytics
        .qualityGate(train, minTokens = 15, minAlpha = 0.81, maxRepetition = 0.05)
        .filter(col("passes")).select(col("doc_id"), col("n_tokens"))
      val gated = train.join(gate, Seq("doc_id"))
      val winners = gated
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val deduped = gated.join(winners, Seq("doc_id"))
      val clean = operators.CorpusAnalytics.decontaminate(deduped, evalD)
        .filter(!col("contaminated")).select(col("doc_id"))
      deduped.join(clean, Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_tokens").cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    "q301_training_pipeline" -> ((s, dir) => {
      // the FULL corpus->training-set composition (r17 VERDICT item 5):
      // q105's gate -> exact-dedup -> decontaminate chain, then q56's
      // deterministic md5 split and q91's per-lang 512-token packing of
      // the train split — ONE declarative plan, so schema or fingerprint
      // drift BETWEEN stages (which each stage oracle is blind to)
      // hash-fails here. Per-doc output; pack columns NULL on test rows
      // (null-safe left join). The near-dup tier is deliberately absent:
      // LSH stages are approximate (rows-only), and a hash-green
      // pipeline needs every stage exact — the near-dup family is pinned
      // separately by its contract twins (q84/q85).
      // Scale: gate predicates evaluate map-side, dedup winners and
      // contamination hits reduce to compact aggregates joined back
      // (q105's audited plan), the split label is a map-side md5, and
      // packing's per-lang running sum is q91's partitioned window (the
      // distributed bucket-prefix form is q147 — composition keeps the
      // oracled operator).
      val docs = Tables(s, dir, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      val evalD = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      val gate = operators.CorpusAnalytics
        .qualityGate(train, minTokens = 15, minAlpha = 0.81, maxRepetition = 0.05)
        .filter(col("passes")).select(col("doc_id"), col("n_tokens"))
      val gated = train.join(gate, Seq("doc_id"))
      val winners = gated
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val deduped = gated.join(winners, Seq("doc_id"))
      val clean = operators.CorpusAnalytics.decontaminate(deduped, evalD)
        .filter(!col("contaminated")).select(col("doc_id"))
      // persisted: the packing leg AND the final projection both consume
      // the survivors — un-persisted, the gate/dedup/decontaminate chain
      // (three joins + the text-feature predicates) ran twice (intra-
      // query lifecycle; at scale this is the persist-or-recompute trade
      // every multi-stage pipeline makes, and the survivors are the
      // SMALLER frame by construction)
      val surv = deduped.join(clean, Seq("doc_id"))
        .withColumn("split", operators.Sampling.splitLabel(col("doc_id"), 90))
        .persist()
      val packed = operators.CorpusAnalytics.packSequences(
        surv.filter(col("split") === "train"), "lang", "doc_id",
        windowTokens = 512L)
        .select(col("doc_id"), col("window_id"), col("window_offset"))
      surv.select(col("doc_id"), col("lang"), col("source"),
          col("n_tokens").cast("long").as("n_tokens"), col("split"))
        .join(packed, Seq("doc_id"), "left")
        .orderBy(col("doc_id"))
    }),

    // ---- scalar breadth: edit distance + array higher-order funcs ----

    "q68_levenshtein" -> ((s, dir) => {
      // pairwise edit distances over the (tiny, distinct) type universe
      val t = Tables(s, dir, "events").select(col("event_type")).distinct()
      t.select(col("event_type").as("type_a"))
        .crossJoin(t.select(col("event_type").as("type_b")))
        .filter(col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          levenshtein(col("type_a"), col("type_b")).as("dist"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    "q69_higher_order" -> ((s, dir) => {
      // transform/filter/aggregate over the token array — all codegen'd
      // higher-order functions, no UDF
      val toks = filter(split(lower(trim(col("text"))), "\\s+"),
        t => length(t) > 0)
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(filter(toks, t => length(t) > 6)).as("n_long_words"),
          aggregate(toks, lit(0), (acc, t) => acc + length(t)).as("sum_token_chars"),
          array_max(transform(toks, t => length(t))).as("max_token_len"))
        .orderBy(col("doc_id"))
    }),

    // ---- approximate quantile (contract-pinned, like q37) ----

    "q75_approx_quantile" -> ((s, dir) => {
      // approx_percentile vs exact within 2%: sketch values are
      // engine-specific, the bounded-error CONTRACT is the checked output
      // (robust at sf>=0.01 group sizes; see q37 for the same pattern).
      // The exact side is the r13 bounded grouped-order-statistic table,
      // broadcast beside the sketch agg
      val ev = Tables(s, dir, "events")
      val exact = operators.GlobalRank.groupedPercentileTable(
        ev, "event_type", "value", Seq(0.5), Seq("_ex"))
      ev.groupBy(col("event_type"))
        .agg(expr("approx_percentile(value, 0.5, 10000)").as("_ap"))
        .join(broadcast(exact), "event_type")
        .select(col("event_type"),
          round(col("_ex"), 4).as("exact_p50"),
          (abs(col("_ap") - col("_ex")) <= col("_ex") * 0.02).as("approx_close"))
        .orderBy(col("event_type"))
    }),

    // ---- embedding centroids (per-label elementwise mean) ----

    "q76_embed_centroid" -> ((s, dir) => {
      // posexplode -> (label, dim) agg: the distributed centroid kernel
      // kmeans is built from; decimal-exact sums make the mean order-free.
      // The mean itself is scaled to an INTEGER sum (x1e7) so both engines
      // perform ONE identical double division before rounding — dividing
      // a decimal sum per-engine rounds differently in the last ulp when a
      // mean lands exactly on a 0.00005 boundary (seen at sf0.1)
      Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(sum((col("v").cast(DecimalType(20, 7)) * 10000000).cast("long")).as("s7"),
          count(lit(1)).as("n"))
        .select(col("label"), col("dim"),
          // + 0.0 normalizes IEEE negative zero: Spark's round goes through
          // BigDecimal (no -0.0) while DuckDB's keeps the sign — a negative
          // mean rounding to zero would stringify as -0.0 there, 0.0 here
          (round(col("s7").cast("double") / (col("n") * 1000), 0) / 10000 + 0.0)
            .as("centroid"))
        .orderBy(col("label"), col("dim"))
    }),

    // ---- corpus curation: composite gate + token-budget trim ----

    "q82_quality_gate" -> ((s, dir) => {
      // keep-or-reject with machine-readable reasons (one map-side pass);
      // thresholds sit inside this corpus's distributions so every reject
      // path actually fires (defaults would pass 100% here)
      operators.CorpusAnalytics.qualityGate(Tables(s, dir, "documents"),
        minTokens = 15, minAlpha = 0.81, maxRepetition = 0.05)
        .orderBy(col("doc_id"))
    }),

    "q83_token_budget" -> ((s, dir) => {
      // fill each language's training mix to 5000 tokens, best-quality
      // first; keep a doc iff the budget wasn't exhausted before it
      operators.CorpusAnalytics.tokenBudget(
        Tables(s, dir, "documents"), "lang", "doc_id", budgetTokens = 5000L)
        .orderBy(col("lang"), col("doc_id"))
    }),

    "q89_decontaminate" -> ((s, dir) => {
      // benchmark decontamination: every 50th doc plays the held-out eval
      // set; flag training docs sharing any word 3-gram with it (the eval
      // gram universe broadcasts — the train stream never shuffles)
      val docs = Tables(s, dir, "documents")
      operators.CorpusAnalytics.decontaminate(
        docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(50)) === 0))
        .orderBy(col("doc_id"))
    }),

    "q90_token_rarity" -> ((s, dir) => {
      // integer-exact rarity report: rare tokens (corpus freq <= 2) and
      // mean corpus frequency per doc — the unigram-LM surprisal analog
      operators.CorpusAnalytics.tokenRarity(Tables(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    "q91_pack_sequences" -> ((s, dir) => {
      // concatenation packing into 512-token context windows per language:
      // each doc's global offset, window id, and offset within the window
      operators.CorpusAnalytics.packSequences(
        Tables(s, dir, "documents"), "lang", "doc_id", windowTokens = 512L)
        .orderBy(col("lang"), col("doc_id"))
    }),

    "q92_mixture_weights" -> ((s, dir) => {
      // per-source token shares and the uniform-rebalance sampling weights
      operators.CorpusAnalytics.mixtureWeights(
        Tables(s, dir, "documents"), "source")
        .orderBy(col("source"))
    }),

    "q93_batch_retrieval" -> ((s, dir) => {
      // exact cosine top-10 corpus matches for EVERY query vector (every
      // 100th embedding plays the query set) — scored map-side against the
      // broadcast queries, ranked by the k-bounded top_k_pairs aggregate
      // (partial buffers never exceed k entries; the window row_number
      // alternative would shuffle every scored pair). Ranked on the
      // unrounded cosine, rounded for display — same discipline as q87.
      val emb = Tables(s, dir, "embeddings")
      operators.Similarity.topKPerQuery(
        emb, emb.filter(pmod(col("vec_id"), lit(100)) === 0)
          .withColumnRenamed("vec_id", "query_id"), k = 10)
        .select(col("query_id"), col("rnk"), col("vec_id"),
          round(col("cos"), 4).as("cos"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    "q94_batch_retrieval_lsh" -> ((s, dir) => {
      // contract twin: the IVF batch path (each query scores only its
      // nprobe=4/16 inverted lists) must reach the recall@10 floor vs
      // q93's exact ground truth, computed entirely in-plan; the oracle
      // pins the floor and re-derives the query count independently.
      // (The stateless hyperplane-LSH batch path measures ~0.5 recall on
      // this weakly-clustered corpus — IVF is the batch scale path.)
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
        .withColumnRenamed("vec_id", "query_id")
      val centroids = operators.Similarity.kmeansCentroids(emb)
      val index = operators.Similarity.ivfIndex(emb, centroids)
      val exact = operators.Similarity.topKPerQuery(emb, queries, k = 10)
      val approx = operators.Similarity.ivfTopKPerQuery(
        index, centroids, queries, k = 10, nprobe = 4)
      val matched = exact.join(approx.select(col("query_id"), col("vec_id")),
          Seq("query_id", "vec_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      queries.select(col("query_id"))
        .join(matched, Seq("query_id"), "left")
        .agg(count(lit(1)).as("n_queries"),
          (sum(coalesce(col("n_hit"), lit(0L))).cast("double") /
            (count(lit(1)) * 10) >= 0.7).as("recall_floor_met"))
    }),

    "q95_range_join_binned" -> ((s, dir) => {
      // pure range join (NO equi key): lineitems shipped inside any of the
      // sampled 8-day promo windows — binned to a shuffle equi-join
      // (fanout <= 2 bins per window at binWidth 8) instead of the
      // BroadcastNestedLoopJoin Spark would otherwise plan
      val epoch = lit("1970-01-01").cast("date")
      val li = Tables(s, dir, "lineitem")
        .select(datediff(col("l_shipdate"), epoch).cast("long").as("ship_day"),
          col("l_extendedprice"))
      val win = Tables(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(100)) === 0)
        .select(col("o_orderkey").as("window_id"),
          datediff(col("o_orderdate"), epoch).cast("long").as("start_day"))
        .withColumn("end_day", col("start_day") + 7)
      operators.RangeJoin.pointInInterval(
          li, win, "ship_day", "start_day", "end_day", binWidth = 8)
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_shipped"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("window_id"))
    }),

    "q96_zscore_norm" -> ((s, dir) => {
      // per-event-type z-score normalization; moments are decimal-exact
      // (q46 discipline), the per-row scalar is the same double expression
      // DuckDB runs; +0.0 normalizes IEEE negative zero after rounding
      operators.Normalize.zscoreByGroup(Tables(s, dir, "events"), "event_type", "value")
        .select(col("event_id"), col("event_type"),
          (round(col("z"), 4) + 0.0).as("z"))
        .orderBy(col("event_id"))
    }),

    "q97_chunk_documents" -> ((s, dir) => {
      // overlapping 40-token chunks advancing by 30 (10-token overlap):
      // map-side explode, exact reconstructable text — the RAG/pretraining
      // chunking pass
      operators.CorpusAnalytics.chunkDocuments(
        Tables(s, dir, "documents"), chunkTokens = 40, overlap = 10)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // ---- window-frame / rank-family / join / reshape breadth ----

    "q77_range_frame" -> ((s, dir) => {
      // RANGE frame over event-time micros: trailing-1h sum per user
      // (q44 covered ROWS frames; RANGE is value-based — the time-window
      // twin). (user_id, ts) is unique, so the frame is deterministic.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          sum(col("value").cast(DecimalType(18, 2))).over(w)
            .cast("double").as("trailing_1h_sum"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q78_rank_family" -> ((s, dir) => {
      // rank vs dense_rank vs percent_rank vs cume_dist under real ties
      // (value alone orders — 2-decimal values collide, which is the point);
      // tied rows get identical ranks so output is deterministic anyway.
      // percent_rank/cume_dist are exact rational doubles on both engines.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("value").desc)
      Tables(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    "q79_full_outer" -> ((s, dir) => {
      // FULL OUTER completes the join family (left/semi/anti/cross done):
      // reconcile two aggregated slices keeping both unmatched sides
      val ev = Tables(s, dir, "events")
      val e = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_err"))
      val p = ev.filter(col("event_type") === "purchase" && col("value") > 95)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_big_buy"))
      e.join(p, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_err"), lit(0L)).as("n_err"),
          coalesce(col("n_big_buy"), lit(0L)).as("n_big_buy"))
        .orderBy(col("user_id"))
    }),

    "q80_unpivot" -> ((s, dir) => {
      // unpivot/melt: the wide per-type day counts (q45's shape) back to
      // long form — schema reshape without a shuffle beyond the agg's own
      val wide = Tables(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
      wide.unpivot(Array(col("day")),
          Array(col("click"), col("error"), col("purchase"), col("signup"), col("view")),
          "event_type", "n")
        .orderBy(col("day"), col("event_type"))
    }),

    "q81_correlated_exists" -> ((s, dir) => {
      // correlated EXISTS through the SQL surface: Catalyst decorrelates
      // to a semi join (q35/q36 drove the DataFrame forms; this pins the
      // subquery path the reference's analysts would write)
      Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
      Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey, c_mktsegment FROM customer_v c
          |WHERE EXISTS (SELECT 1 FROM orders_v o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // ---- contract twins for the approximate family ----
    // q20/q21/q24/q25/q39/q51 are approximate-by-design (LSH / simhash /
    // ANN), so their outputs are not DuckDB-expressible; each gets a
    // CONTRACT TWIN below whose Spark side computes the approximate result
    // AND its exact ground truth in one plan, and whose oracle re-derives
    // the ground truth independently + pins the contract (containment /
    // recall floor). Twin map: q20,q22→q84; q21,q51→q85; q24,q39,q25→q86;
    // q25's verify kernel→q87.

    "q84_lsh_contract" -> ((s, dir) => {
      // minhash-LSH candidate containment: at bands=16 (r=1, per-band
      // collision prob = j) every true pair with exact 3-gram jaccard
      // >= 0.3 must surface as a candidate (per-pair miss prob <= 0.7^16
      // ~ 0.3%, and deterministic given the fixed xxhash64 seeds).
      // n_true_pairs is brute-forced BOTH here and in the DuckDB oracle;
      // n_missed pins containment at 0.
      val docs = Tables(s, dir, "documents")
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
      val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .persist()
      val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
      val uni = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
      // brute force is quadratic BY DESIGN (it's the ground truth), but it
      // must still parallelize: the streamed side of the nested-loop join
      // inherits the 1-file scan's single partition, so without this tiny
      // round-robin shuffle the whole O(n^2/2) verify runs in ONE task
      // (observed: 15+ CPU-minutes single-threaded at sf0.1)
      val fan = s.sessionState.conf.numShufflePartitions
      val truePairs = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
        .repartition(fan)
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
          col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          when(uni === 0, lit(0.0)).otherwise(inter / uni).as("j"))
        .filter(col("j") >= 0.3)
        .persist()
      val cands = Dedup.minhashLsh(Tables(s, dir, "documents"),
        numHashes = 16, bands = 16, shingleSize = 3, threshold = 0.0)
        .select(col("id_a"), col("id_b"))
      val missed = truePairs.join(cands, Seq("id_a", "id_b"), "left_anti")
      truePairs.agg(count(lit(1)).as("n_true_pairs"))
        .crossJoin(missed.agg(count(lit(1)).as("n_missed")))
    }),

    "q85_simhash_contract" -> ((s, dir) => {
      // simhash is not DuckDB-expressible (xxhash64 bit-mix); pin it by
      // properties the oracle CAN ground: (1) n_norm_dup_pairs — pairs
      // with identical normalized text, independently re-counted by the
      // oracle from raw text; (2) among those, simhash must agree
      // (n_simhash_mismatch = 0: it is a pure function of the token
      // stream); (3) q51's pigeonhole segment join returns EXACTLY the
      // brute-force Hamming<=3 pair set (lossless candidates + exact
      // popcount verify => set equality, not an approximation)
      val docs = Tables(s, dir, "documents")
      val withSim = docs
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"),
          Dedup.simhash(col("text")).as("sim"))
        .persist()
      val normPairs = withSim
        .select(col("doc_id").as("id_a"), col("fp"), col("sim").as("sim_a"))
        .join(withSim.select(col("doc_id").as("id_b"), col("fp"),
          col("sim").as("sim_b")), "fp")
        .filter(col("id_a") < col("id_b"))
        .select((col("sim_a") === col("sim_b")).as("same"))
      val brute = withSim.select(col("doc_id").as("id_a"), col("sim").as("sim_a"))
        .repartition(s.sessionState.conf.numShufflePartitions) // spread the O(n^2) verify (see q84)
        .join(withSim.select(col("doc_id").as("id_b"), col("sim").as("sim_b")),
          col("id_a") < col("id_b"))
        .filter(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= 3)
        .select(col("id_a"), col("id_b"))
      val lsh = Dedup.simhashNearDup(docs, k = 3, segments = 4)
        .select(col("id_a"), col("id_b"))
      val onlyLsh = lsh.join(brute, Seq("id_a", "id_b"), "left_anti")
      val onlyBrute = brute.join(lsh, Seq("id_a", "id_b"), "left_anti")
      normPairs
        .agg(count(lit(1)).as("n_norm_dup_pairs"),
          coalesce(sum(when(!col("same"), 1L)), lit(0L)).as("n_simhash_mismatch"))
        .crossJoin(onlyLsh.agg(count(lit(1)).as("_l"))
          .crossJoin(onlyBrute.agg(count(lit(1)).as("_b")))
          .select((col("_l") + col("_b") === 0).as("lsh_equals_brute")))
    }),

    "q86_ann_recall" -> ((s, dir) => {
      // recall floors for the three approximate retrieval paths, scored
      // in-plan against exact brute force. Floors sit well below measured
      // recall (LSH top-10 ~0.56, IVF ~0.84, hyperplane pair recall
      // higher still) so the assertions are scale-stable while catching
      // structural regressions (broken signature / probe selection).
      // n_exact_pairs grounds the twin in data: the oracle re-derives it
      // by brute force.
      val emb = Tables(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      val corpus = emb.filter(col("vec_id") =!= 0)
      val exact = Similarity.bruteForceTopK(corpus, q, 10).select(col("vec_id"))
      val lsh = Similarity
        .lshTopK(Similarity.bucketedIndex(corpus, planes = 4), q, 10, planes = 4)
        .select(col("vec_id"))
      val cents = Similarity.kmeansCentroids(corpus)
      val ivf = Similarity
        .ivfTopK(Similarity.ivfIndex(corpus, cents), cents, q, 10, nprobe = 4)
        .select(col("vec_id"))
      // exact cosine pair ground truth (same universe as q25: all vectors)
      val withN = emb.select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
      val exactPairs = withN
        .select(col("vec_id").as("id_a"), col("embedding").as("v_a"), col("nrm").as("nrm_a"))
        .repartition(s.sessionState.conf.numShufflePartitions) // spread the O(n^2) verify (see q84)
        .join(withN.select(col("vec_id").as("id_b"), col("embedding").as("v_b"),
          col("nrm").as("nrm_b")), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          when(col("nrm_a") * col("nrm_b") === 0, lit(0.0))
            .otherwise(Similarity.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
            .as("cos"))
        .filter(col("cos") >= 0.25)
        .select(col("id_a"), col("id_b"))
        .persist()
      val lshPairs = Dedup.embeddingNearDup(emb, planes = 4, threshold = 0.25, tables = 8)
        .select(col("id_a"), col("id_b"))
      exactPairs.agg(count(lit(1)).as("n_exact_pairs"))
        .crossJoin(lshPairs.join(exactPairs, Seq("id_a", "id_b"))
          .agg(count(lit(1)).as("_hit")))
        .crossJoin(lsh.join(exact, "vec_id").agg(count(lit(1)).as("_lsh")))
        .crossJoin(ivf.join(exact, "vec_id").agg(count(lit(1)).as("_ivf")))
        .select(col("n_exact_pairs"),
          (col("_hit") >= col("n_exact_pairs") / 2).as("embed_pair_floor_met"),
          (col("_ivf") >= 5).as("ivf_top10_floor_met"),
          (col("_lsh") >= 3).as("lsh_top10_floor_met"))
    }),

    "q87_embed_pairs_exact" -> ((s, dir) => {
      // q25's verify kernel, exact and fully hash-oracled: brute-force
      // cosine>=0.25 pairs with NO LSH prefilter — the DuckDB oracle
      // recomputes every pair, so the dot/norm kernels and the threshold
      // comparison are pinned bit-for-bit (q23 pins them for top-k;
      // this pins the pair/self-join shape q25 builds on)
      val emb = Tables(s, dir, "embeddings")
      val withN = emb.select(col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
      withN
        .select(col("vec_id").as("id_a"), col("embedding").as("v_a"), col("nrm").as("nrm_a"))
        .repartition(s.sessionState.conf.numShufflePartitions) // spread the O(n^2) verify (see q84)
        .join(withN.select(col("vec_id").as("id_b"), col("embedding").as("v_b"),
          col("nrm").as("nrm_b")), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          when(col("nrm_a") * col("nrm_b") === 0, lit(0.0))
            .otherwise(Similarity.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
            .as("cos"))
        .filter(col("cos") >= 0.25)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q88_search_indexed" -> ((s, dir) => {
      // q06's ILIKE-ANY, accelerated by the trigram sidecar index (the
      // reference's GIN trigram analog, migration:36): write the corpus to
      // a store, build the per-file trigram index, search through it. The
      // oracle is the same brute-force ILIKE as q06 — hash equality proves
      // the pruning path loses no rows. The store+index build is memoized
      // per input dir (an index is built once and amortized over queries,
      // like q39's IVF index) — a repeat run times the search path alone.
      val root = q88Store.computeIfAbsent(dir, { d: String =>
        val r = java.nio.file.Files
          .createTempDirectory("graft-q88-store").toString
        Tables(s, d, "documents")
          .repartition(16, col("doc_id"))
          .write.mode("overwrite").parquet(r)
        store.SearchIndex.build(s, r, "text")
        r
      })
      store.SearchIndex.search(s, root, Seq("%spark%", "%merge%"), "text")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // ---- custom Expressions through the SQL surface (GraftExtensions) ----

    "q50_sql_custom_funcs" -> ((s, dir) => {
      // the custom WordShingles Expression invoked from SQL — registered at
      // runtime because the driver owns this session (build-time path is
      // spark.sql.extensions=graft.GraftExtensions, spec-covered)
      GraftSqlFunctions.register(s)
      Tables(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id, size(word_shingles(text, 3)) AS n_shingles
          |FROM documents_v ORDER BY doc_id""".stripMargin)
    })
  )

  /** DuckDB-equivalent SQL per query (same aliases, same ORDER BY).
    * Omitted for non-SQL-expressible ops (LSH/simhash/rolling-hash/codec
    * stubs) -> driver records a rows-only check for those.
    */
  /** q124's oracle, generated: exact 3-NN cosine edges, then `iters`
    * unrolled PageRank rounds (DuckDB has recursive CTEs, but unrolling
    * keeps every round's arithmetic explicit and engine-mirrored:
    * (1-0.85)/N and 0.85 as doubles, dangling mass via a LEFT JOIN
    * null-check, COALESCE(0) for nodes with no inbound edges).
    */
  private def q124OracleSql: String = {
    val iters = 5
    def l2(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    val cos = "list_sum(list_transform(list_zip(a.embedding, b.embedding), " +
      "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
      s"(${l2("a.embedding")} * ${l2("b.embedding")})"
    val base =
      s"WITH p AS MATERIALIZED (SELECT a.vec_id AS src, b.vec_id AS dst, $cos AS cos " +
        "FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id), " +
        "e AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst, " +
        "row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM p) WHERE rn <= 3), " +
        "n AS MATERIALIZED (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)), " +
        "cnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n), " +
        "od AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY src), " +
        "r0 AS MATERIALIZED (SELECT v, 1.0 / nn AS r FROM n CROSS JOIN cnt)"
    val rounds = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      s", c$i AS MATERIALIZED (SELECT e.dst AS v, sum($prev.r / od.od) AS c " +
        s"FROM e JOIN od USING (src) JOIN $prev ON $prev.v = e.src GROUP BY e.dst)" +
        s", d$i AS MATERIALIZED (SELECT COALESCE(sum($prev.r), CAST(0 AS DOUBLE)) AS dm " +
        s"FROM $prev LEFT JOIN od ON $prev.v = od.src WHERE od.src IS NULL)" +
        s", r$i AS MATERIALIZED (SELECT n.v, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn + " +
        s"CAST(0.85 AS DOUBLE) * (COALESCE(c$i.c, CAST(0 AS DOUBLE)) + d$i.dm / nn) AS r " +
        s"FROM n CROSS JOIN cnt CROSS JOIN d$i LEFT JOIN c$i ON c$i.v = n.v)"
    }.mkString
    base + rounds +
      s" SELECT v AS vec_id, round(r * nn, 4) AS centrality FROM r$iters CROSS JOIN cnt ORDER BY vec_id"
  }

  /** q129's oracle, generated: the term list, BM25 constants, and
    * left-associative contribution sum are written once here and mirrored
    * exactly (doubles print via shortest-repr in both builders).
    */
  private def q129OracleSql: String = {
    val terms = Seq("merge", "batch", "window", "stream")
    val (k1, b) = (1.2, 0.75)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(ts, x -> x = '$t')) AS tf$i"
    }.mkString(", ")
    val dfCols = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i").mkString(", ")
    val contrib = terms.indices.map(i =>
      s"(ln(1 + (s.n - s.df$i + 0.5) / (s.df$i + 0.5)) * " +
        s"(CAST(tf$i AS DOUBLE) * ${k1 + 1}) / " +
        s"(CAST(tf$i AS DOUBLE) + $k1 * (${1 - b} + $b * CAST(len AS DOUBLE) / s.avglen)))").mkString(" + ")
    "WITH perdoc AS (SELECT doc_id, len(ts) AS len, " + tfCols + " FROM " +
      "(SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ts " +
      "FROM documents WHERE trim(text) <> '')), " +
      "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
      "CAST(sum(len) AS DOUBLE) / count(*) AS avglen, " + dfCols + " FROM perdoc), " +
      "scored AS (SELECT doc_id, " + contrib + " AS score FROM perdoc CROSS JOIN s) " +
      "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk, " +
      "doc_id, round(score, 4) AS score " +
      "FROM scored WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20"
  }

  /** Shared exact-kNN edge CTE for the graph-family oracles (q134/q135):
    * cosine scores kept on the edges, MATERIALIZED per the q131 lesson.
    */
  /** q158's full NB model replay, shared verbatim by q188's report layer
    * (which wraps it as a CTE and joins the true labels back).
    */
  private def nbPredictOracleSql: String =
    "WITH d AS (SELECT doc_id, lang, lower(text) AS t FROM documents " +
        "WHERE text IS NOT NULL AND lang IS NOT NULL AND length(lower(text)) >= 3), " +
        "g AS (SELECT doc_id, lang, substring(t, CAST(i + 1 AS INT), 3) AS gram " +
        "FROM d, UNNEST(range(length(t) - 2)) AS u(i)), " +
        "dg AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2), " +
        "cg AS (SELECT lang, gram, count(*) AS n FROM g GROUP BY 1, 2), " +
        "nl AS (SELECT lang, sum(n) AS tot FROM cg GROUP BY 1), " +
        "v AS (SELECT count(DISTINCT gram) AS v FROM cg), " +
        "pr AS (SELECT lang, ln(count(*) * 1.0 / (SELECT count(*) FROM d)) AS prior " +
        "FROM d GROUP BY 1), " +
        "sc AS (SELECT dg.doc_id, nl.lang, " +
        "max(pr.prior) + list_reduce(list_prepend(0.0, " +
        "list(dg.cnt * ln((coalesce(cg.n, 0) + 1.0) / (nl.tot + v.v)) ORDER BY dg.gram)), " +
        "(a, b) -> a + b) AS score " +
        "FROM dg CROSS JOIN nl CROSS JOIN v " +
        "JOIN pr ON pr.lang = nl.lang " +
        "LEFT JOIN cg ON cg.gram = dg.gram AND cg.lang = nl.lang " +
        "GROUP BY dg.doc_id, nl.lang, nl.tot, v.v) " +
        "SELECT doc_id, lang AS lang_pred, score FROM (" +
        "SELECT doc_id, lang, round(score, 4) AS score, " +
        "row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY round(score, 4) DESC, lang DESC) AS rk FROM sc) " +
        "WHERE rk = 1 ORDER BY doc_id"

  private def knnCosEdgeCte(k: Int): String = {
    def l2(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    val cos = "list_sum(list_transform(list_zip(a.embedding, b.embedding), " +
      "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
      s"(${l2("a.embedding")} * ${l2("b.embedding")})"
    s"WITH pr AS MATERIALIZED (SELECT a.vec_id AS src, b.vec_id AS dst, $cos AS cos " +
      "FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id), " +
      "e AS MATERIALIZED (SELECT src, dst, cos FROM (SELECT src, dst, cos, " +
      s"row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM pr) WHERE rn <= $k)"
  }

  /** q132's oracle, generated: q124's exact 3-NN edge build, then `iters`
    * unrolled PERSONALIZED PageRank rounds — the restart distribution p
    * concentrates on the seed predicate (v % 50 = 0), normalized over the
    * seeds present in the graph, and every (1−d)·p / dm·p term is the
    * runtime-computed double the engine side also computes.
    */
  private def q132OracleSql: String = {
    val iters = 5
    def l2(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    val cos = "list_sum(list_transform(list_zip(a.embedding, b.embedding), " +
      "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
      s"(${l2("a.embedding")} * ${l2("b.embedding")})"
    val p = "(CASE WHEN n.v % 50 = 0 THEN CAST(1 AS DOUBLE) / sc.ns ELSE CAST(0 AS DOUBLE) END)"
    val base =
      s"WITH pr AS MATERIALIZED (SELECT a.vec_id AS src, b.vec_id AS dst, $cos AS cos " +
        "FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id <> b.vec_id), " +
        "e AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst, " +
        "row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn FROM pr) WHERE rn <= 3), " +
        "n AS MATERIALIZED (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)), " +
        "cnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n), " +
        "sc AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS ns FROM n WHERE v % 50 = 0), " +
        "od AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY src), " +
        s"r0 AS MATERIALIZED (SELECT n.v, $p AS r FROM n CROSS JOIN sc)"
    val rounds = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      s", c$i AS MATERIALIZED (SELECT e.dst AS v, sum($prev.r / od.od) AS c " +
        s"FROM e JOIN od USING (src) JOIN $prev ON $prev.v = e.src GROUP BY e.dst)" +
        s", d$i AS MATERIALIZED (SELECT COALESCE(sum($prev.r), CAST(0 AS DOUBLE)) AS dm " +
        s"FROM $prev LEFT JOIN od ON $prev.v = od.src WHERE od.src IS NULL)" +
        s", r$i AS MATERIALIZED (SELECT n.v, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * $p + " +
        s"CAST(0.85 AS DOUBLE) * (COALESCE(c$i.c, CAST(0 AS DOUBLE)) + d$i.dm * $p) AS r " +
        s"FROM n CROSS JOIN cnt CROSS JOIN sc CROSS JOIN d$i LEFT JOIN c$i ON c$i.v = n.v)"
    }.mkString
    base + rounds +
      s" SELECT v AS vec_id, round(r * nn, 4) AS ppr FROM r$iters CROSS JOIN cnt ORDER BY vec_id"
  }

  /** q138's oracle, generated: full self-similarity table (self = 1),
    * then `k` unrolled greedy facility-location rounds. Gains sum with
    * list_reduce over id-ORDERED lists — explicitly sequential, matching
    * the engine's ascending-id accumulation, because an aggregate SUM's
    * order is engine-arbitrary and an argmax amplifies last-ulp drift.
    */
  private def q138OracleSql: String = {
    val k = 6
    def l2(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    val cos = "list_sum(list_transform(list_zip(a.embedding, b.embedding), " +
      "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
      s"(${l2("a.embedding")} * ${l2("b.embedding")})"
    val base =
      "WITH sim AS MATERIALIZED (SELECT a.vec_id AS c, b.vec_id AS v, " +
        s"CASE WHEN a.vec_id = b.vec_id THEN CAST(1 AS DOUBLE) ELSE $cos END AS s " +
        "FROM embeddings a CROSS JOIN embeddings b), " +
        "g1 AS MATERIALIZED (SELECT c, list_reduce(list(s ORDER BY v), (x, y) -> x + y) AS gain FROM sim GROUP BY c), " +
        "p1 AS MATERIALIZED (SELECT c, gain FROM g1 ORDER BY gain DESC, c LIMIT 1), " +
        "sel1 AS MATERIALIZED (SELECT c FROM p1), " +
        "cov1 AS MATERIALIZED (SELECT sim.v, max(sim.s) AS cov FROM sim JOIN sel1 ON sim.c = sel1.c GROUP BY sim.v)"
    val rounds = (2 to k).map { i =>
      s", g$i AS MATERIALIZED (SELECT sim.c, list_reduce(list(greatest(cov${i - 1}.cov, sim.s) ORDER BY sim.v), (x, y) -> x + y) AS gain " +
        s"FROM sim JOIN cov${i - 1} ON cov${i - 1}.v = sim.v WHERE sim.c NOT IN (SELECT c FROM sel${i - 1}) GROUP BY sim.c)" +
        s", p$i AS MATERIALIZED (SELECT c, gain FROM g$i ORDER BY gain DESC, c LIMIT 1)" +
        s", sel$i AS MATERIALIZED (SELECT c FROM sel${i - 1} UNION ALL SELECT c FROM p$i)" +
        s", cov$i AS MATERIALIZED (SELECT sim.v, max(sim.s) AS cov FROM sim JOIN sel$i ON sim.c = sel$i.c GROUP BY sim.v)"
    }.mkString
    val union = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rnk, c AS vec_id, gain FROM p$i").mkString(" UNION ALL ")
    s"$base$rounds SELECT rnk, vec_id, round(gain, 4) AS coverage FROM ($union) ORDER BY rnk"
  }

  /** q131's oracle, generated: pool build (q124's cosine idiom), pairwise
    * sims, then `k` unrolled greedy MMR rounds — each round is one
    * correlated max over the selected-so-far set plus a LIMIT-1 argmax
    * with the same (score desc, id) tie order the operator uses. λ and
    * 1−λ print via shortest-repr from the SAME doubles the Scala side
    * multiplies with, so every selection replays bit-exactly. Every CTE
    * is MATERIALIZED: sel_i references sel_{i-1} three times, so inlined
    * CTEs re-expand the whole prefix 3^k times and the query never
    * finishes — materialization makes each round evaluate once.
    */
  private def q131OracleSql: String = {
    val (k, pool, lambda) = (8, 40, 0.7)
    def l2(v: String) =
      s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    def cos(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), " +
        s"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (${l2(a)} * ${l2(b)})"
    val base =
      "WITH qv AS MATERIALIZED (SELECT embedding AS q FROM embeddings WHERE vec_id = 0), " +
        s"base AS MATERIALIZED (SELECT e.vec_id, e.embedding, ${cos("e.embedding", "qv.q")} AS rel " +
        "FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0), " +
        s"pool AS MATERIALIZED (SELECT * FROM base ORDER BY rel DESC, vec_id LIMIT $pool), " +
        s"sim AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib, ${cos("a.embedding", "b.embedding")} AS s " +
        "FROM pool a JOIN pool b ON a.vec_id <> b.vec_id), " +
        s"p1 AS MATERIALIZED (SELECT vec_id, $lambda * rel AS score FROM pool ORDER BY score DESC, vec_id LIMIT 1), " +
        "sel1 AS MATERIALIZED (SELECT vec_id FROM p1)"
    val rounds = (2 to k).map { i =>
      s", c$i AS MATERIALIZED (SELECT p.vec_id, $lambda * p.rel - ${1 - lambda} * " +
        s"(SELECT max(s.s) FROM sim s JOIN sel${i - 1} t ON s.ib = t.vec_id " +
        "WHERE s.ia = p.vec_id) AS score " +
        s"FROM pool p WHERE p.vec_id NOT IN (SELECT vec_id FROM sel${i - 1}))" +
        s", p$i AS MATERIALIZED (SELECT vec_id, score FROM c$i ORDER BY score DESC, vec_id LIMIT 1)" +
        s", sel$i AS MATERIALIZED (SELECT vec_id FROM sel${i - 1} UNION ALL SELECT vec_id FROM p$i)"
    }.mkString
    val union = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rnk, vec_id, score FROM p$i").mkString(" UNION ALL ")
    s"$base$rounds SELECT rnk, vec_id, round(score, 4) AS score FROM ($union) ORDER BY rnk"
  }

  /** base query -> its doc_id%3==0 soak twin (see the q22b…q98b block in
    * [[queries]]): the twin's oracle is the base oracle with every
    * `documents` reference swapped for the subsample, so the two can
    * never drift.
    */
  private val heavySub3Twins: Seq[(String, String)] = Seq(
    "q22_ngram_jaccard" -> "q22b_ngram_jaccard_sub3",
    "q57_split_leakage" -> "q57b_split_leakage_sub3",
    "q73_neardup_clusters" -> "q73b_neardup_clusters_sub3",
    "q98_survivorship" -> "q98b_survivorship_sub3")

  def oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    // the fused trend-card oracle is composed VERBATIM from its three
    // standalone oracles (q251/q289/q290), so the card's DuckDB contract
    // cannot drift from theirs: the Spark side copies the standalones'
    // display chains (TrendCardSpec pins the equality), the oracle
    // reuses their very text
    val trendCard = "SELECT mk.event_type, mk.n_days, mk.mk_s, mk.z, " +
      "mk.sen_slope, cx.n_pairs, cx.n_pos, cx.z_bp AS cs_z_bp, " +
      "kp.eta_bp, kp.reject_5pct " +
      "FROM (" + base("q251_mk_trend") + ") mk " +
      "JOIN (" + base("q289_cox_stuart") + ") cx " +
      // null-safe meet: a NULL event_type group (none in the current
      // generator, but GROUP BY would emit one on both engines) must
      // survive the composition exactly as it survives each standalone
      "ON mk.event_type IS NOT DISTINCT FROM cx.event_type " +
      "JOIN (" + base("q290_kpss") + ") kp " +
      "ON mk.event_type IS NOT DISTINCT FROM kp.event_type"
    // q301 composes the WHOLE corpus->training-set chain from the stage
    // oracles' own text (the trendCard technique): q105's gate->dedup->
    // decontaminate SQL verbatim as the survivor subquery, q56's md5
    // split expression, q91's running-sum packing — so the composed
    // contract cannot drift from the stages'. Pack columns are NULL on
    // test rows on both engines (left join).
    val trainingPipeline = "WITH surv AS (SELECT doc_id, lang, source, n_tokens, " +
      "CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 90 " +
      "THEN 'train' ELSE 'test' END AS split " +
      "FROM (" + base("q105_curation_pipeline") + ")), " +
      "pk AS (SELECT doc_id, CAST(seq_start // 512 AS BIGINT) AS window_id, " +
      "CAST(seq_start % 512 AS BIGINT) AS window_offset FROM (" +
      "SELECT doc_id, sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS seq_start " +
      "FROM surv WHERE split = 'train')) " +
      "SELECT s.doc_id, s.lang, s.source, CAST(s.n_tokens AS BIGINT) AS n_tokens, s.split, " +
      "pk.window_id, pk.window_offset " +
      "FROM surv s LEFT JOIN pk ON s.doc_id = pk.doc_id ORDER BY s.doc_id"
    base + ("q300_trend_card" -> trendCard) +
      ("q301_training_pipeline" -> trainingPipeline) ++
      heavySub3Twins.map { case (b, twin) =>
        twin -> subsampleRewrite(b, base(b), twin)
      }
  }

  /** A base oracle with every `FROM documents` swapped for the doc_id%3
    * subsample — the sub3-twin derivation (see [[oracleSql]]). No
    * subquery alias: q98's base keeps its own (`documents d`), the
    * others reference columns unqualified (DuckDB allows unaliased
    * FROM-subqueries). Guard: every `documents` mention in the base
    * oracle must be a `FROM documents` (a JOIN/comma-list or a
    * documents-prefixed name would leave part of the twin's pair
    * universe unsubsampled — fail loudly at map construction instead).
    * Both regexes are whole-word-anchored so the guard and the rewrite
    * agree: `documentsx` / lowercase `from documents` count as mentions
    * but NOT as rewritable FROM forms → loud failure, never a silent
    * partial rewrite (SubsampleRewriteSpec pins all three behaviors).
    */
  private[graft] def subsampleRewrite(b: String, sql: String, twin: String): String = {
    val mentions = "\\bdocuments\\b".r.findAllIn(sql).length
    val fromForms = "FROM documents\\b".r.findAllIn(sql).length
    require(mentions == fromForms,
      s"$b oracle references `documents` outside a FROM clause " +
        s"($mentions mentions, $fromForms FROM forms) — the $twin " +
        "subsample rewrite would silently miss one")
    "FROM documents\\b".r.replaceAllIn(sql,
      java.util.regex.Matcher.quoteReplacement(
        "FROM (SELECT * FROM documents WHERE doc_id % 3 = 0)"))
  }

  /** Shared WITH-prefix of the four histogram-family replay oracles
    * (q304/q305/q306/q307): the filtered+binned events scan, the 7-day
    * calibration split, reference histogram/cumulative, and the per-
    * (source, day) window/cumulative cross-mass spine (`bd`). One
    * definition so an edit to the shared bin plan cannot silently
    * desynchronize a subset of the family (r18 review).
    */
  private val replayHistCte: String =
    "WITH ev AS (SELECT event_type AS source, epoch_ms(ts) // 86400000 AS d, (CASE WHEN value >= " +
    "5 THEN 1 ELSE 0 END + CASE WHEN value >= 10 THEN 1 ELSE 0 END + CASE WHEN value >= 20 THEN " +
    "1 ELSE 0 END + CASE WHEN value >= 50 THEN 1 ELSE 0 END + CASE WHEN value >= 100 THEN 1 ELSE " +
    "0 END + CASE WHEN value >= 200 THEN 1 ELSE 0 END) AS b FROM events WHERE ts IS NOT NULL AND " +
    "event_type IS NOT NULL AND value IS NOT NULL), c AS (SELECT min(d) + 7 AS cutd FROM ev), " +
    "bins AS (SELECT CAST(range AS BIGINT) AS b FROM range(7)), refh AS (SELECT bins.b, " +
    "coalesce(rc.cnt, 0) AS rc FROM bins LEFT JOIN (SELECT b, count(*) AS cnt FROM ev, c WHERE d " +
    "< cutd GROUP BY 1) rc ON bins.b = rc.b), reft AS (SELECT CAST(sum(rc) AS BIGINT) AS nref " +
    "FROM refh), refc AS (SELECT b, CAST(sum(rc) OVER (ORDER BY b) AS BIGINT) AS cref FROM " +
    "refh), sd AS (SELECT DISTINCT source, d FROM ev, c WHERE d >= cutd), cnts AS (SELECT " +
    "source, d, b, count(*) AS cnt FROM ev, c WHERE d >= cutd GROUP BY 1, 2, 3), cell AS (SELECT " +
    "sd.source, sd.d, bins.b, coalesce(cnts.cnt, 0) AS cnt FROM sd CROSS JOIN bins LEFT JOIN " +
    "cnts ON sd.source = cnts.source AND sd.d = cnts.d AND bins.b = cnts.b), cc AS (SELECT " +
    "source, d, b, cnt, CAST(sum(cnt) OVER (PARTITION BY source, b ORDER BY d) AS BIGINT) AS " +
    "cumb FROM cell), bd AS (SELECT source, d, b, cnt, cumb, CAST(sum(cnt) OVER (PARTITION BY " +
    "source, d ORDER BY b) AS BIGINT) AS wcum, CAST(sum(cumb) OVER (PARTITION BY source, d ORDER " +
    "BY b) AS BIGINT) AS ccum, CAST(sum(cnt) OVER (PARTITION BY source, d) AS BIGINT) AS wn, " +
    "CAST(sum(cumb) OVER (PARTITION BY source, d) AS BIGINT) AS cn, max(d) OVER (PARTITION BY " +
    "source) AS maxd FROM cc),  "

  private def oracleSqlBase: Map[String, String] = Map(
    "q01_point_lookup" ->
      "SELECT event_id, event_type, value FROM events WHERE user_id = 7 ORDER BY event_id",

    "q02_time_range" ->
      ("SELECT event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20' " +
        "GROUP BY event_type ORDER BY event_type"),

    "q03_json_extract" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
        "FROM events WHERE user_id = 7 ORDER BY event_id"),

    "q04_json_decompose" ->
      ("SELECT event_id, k FROM (SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
        "FROM events) WHERE k >= 50 ORDER BY event_id"),

    "q05_key_discovery" ->
      "SELECT DISTINCT unnest(json_keys(props)) AS key FROM events ORDER BY key",

    "q06_search_ilike" ->
      ("SELECT doc_id, lang, source FROM documents " +
        "WHERE lower(text) LIKE '%spark%' OR lower(text) LIKE '%merge%' ORDER BY doc_id"),

    "q07_recent_topk" ->
      ("SELECT event_id, event_type, value FROM " +
        "(SELECT * FROM events ORDER BY ts DESC LIMIT 10) ORDER BY event_id"),

    "q08_time_bucket" ->
      ("SELECT CAST(ts AS DATE) AS day, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value " +
        "FROM events GROUP BY 1 ORDER BY day"),

    "q09_enrich_join" ->
      ("SELECT c_mktsegment, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),

    "q10_interval_join" ->
      ("SELECT l_returnflag, count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),

    "q11_agg_pricing" ->
      ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge, " +
        "sum(l_quantity) / count(*) AS avg_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price, " +
        "CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc, " +
        "count(*) AS n " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),

    "q12_topk_orders" ->
      ("SELECT o_orderkey, o_totalprice, o_orderstatus FROM " +
        "(SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10) ORDER BY o_orderkey"),

    "q13_star_join" ->
      ("SELECT n_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue, count(*) AS n " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name"),

    "q14_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",

    "q63_time_bucket_hour" ->
      // avg spelled as sum/count: k is integer-valued, so the double sum is
      // exact in any order and the division is bit-identical on both engines
      ("SELECT date_trunc('hour', ts) AS bucket, count(*) AS n, " +
        "sum(CAST(json_extract_string(props, '$.k') AS DOUBLE)) / count(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS avg_value, " +
        "sum(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS sum_value " +
        "FROM events GROUP BY 1 ORDER BY bucket"),

    "q15_dedup_exact" ->
      ("SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp, " +
        "min(doc_id) AS doc_id, count(*) AS n_dups FROM documents GROUP BY 1 ORDER BY doc_id"),

    "q16_token_count" ->
      // blank guard mirrors TextAnalysis.tokenCount: DuckDB splits '' to
      // [''] (len 1) where tokenCount returns 0
      ("SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens, " +
        "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_subwords " +
        "FROM documents ORDER BY doc_id"),

    "q17_quality" ->
      ("SELECT doc_id, " +
        "round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text), 4) AS alpha_ratio, " +
        "round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1), 4) AS mean_wlen, " +
        "round(CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> list_contains(" + duckStopwords + ", t))) AS DOUBLE) / len(regexp_split_to_array(lower(trim(text)), '\\s+')), 4) AS stopword_ratio " +
        "FROM documents ORDER BY doc_id"),

    "q18_lang_id" -> langIdOracleSql,

    "q19_fingerprint" ->
      // rolling hash replicated token-for-token: same md5-prefix token hash,
      // same 1000003 multiplier, same Mersenne modulus, via list_reduce
      ("SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        "t -> CAST('0x' || left(md5(t), 15) AS BIGINT))), " +
        "(acc, h) -> (acc * 1000003 + h) % 2147483647) AS rhash " +
        "FROM documents ORDER BY doc_id"),

    "q22_ngram_jaccard" ->
      // brute-force all-pairs exact 3-gram Jaccard — the LSH prefilter in the
      // Spark plan is a candidate generator, so this oracle also pins its
      // recall at 1.0 on this corpus (verified: 25/25 pairs found)
      ("WITH sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> '') " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.1 " +
        "ORDER BY id_a, id_b"),
    "q23_knn_brute" ->
      ("WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) " +
        "SELECT vec_id, round(cos, 4) AS cos FROM (" +
        "SELECT vec_id, list_sum(list_transform(list_zip(embedding, qv), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
        "(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * " +
        "sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos " +
        "FROM embeddings, q WHERE vec_id <> 0 ORDER BY cos DESC, vec_id LIMIT 10) ORDER BY vec_id"),

    "q26_multimodal_bytes" ->
      "SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes FROM documents ORDER BY doc_id",

    "q27_multimodal_meta" ->
      // FakeCodec replica over the same bytes: format = table[first_byte % 4]
      // (documents are ASCII, so unicode(first char) == first byte),
      // duration = 10ms/byte
      ("SELECT doc_id AS id, " +
        "CASE WHEN length(text) = 0 THEN 'empty' " +
        "ELSE ['jpeg','png','wav','mp4'][(unicode(left(text, 1)) % 4) + 1] END AS format, " +
        "octet_length(CAST(text AS BLOB)) AS n_bytes, " +
        "octet_length(CAST(text AS BLOB)) * 10 AS duration_ms " +
        "FROM documents ORDER BY id"),

    "q28_ingest" ->
      ("SELECT event_type AS message, " +
        "concat('00000000-0000-0000-0000-', lpad(CAST(user_id AS VARCHAR), 12, '0')) AS correlation_id, " +
        "CAST(ts AS DATE) AS date, event_id, " +
        "CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
        "FROM events ORDER BY event_id"),

    "q37_approx_distinct" ->
      ("SELECT event_type, count(DISTINCT user_id) AS exact_users, " +
        "TRUE AS approx_within_5pct " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    "q29_asof_join" ->
      ("SELECT user_id, count(*) AS n_clicks, count(asof_ts) AS n_matched, " +
        // CAST to BIGINT: DuckDB sums BIGINT into HUGEINT, which pandas/arrow
        // render as float64 ("5.0") and the driver's value hash then differs
        // from Spark's int64 — r1's only q29/q38 mismatches were exactly this
        "CAST(sum(epoch_us(ts) - epoch_us(asof_ts)) AS BIGINT) AS lag_us_total, " +
        "CAST(sum(CAST(asof_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_err_value " +
        "FROM (SELECT a.user_id, a.ts, b.ts AS asof_ts, b.value AS asof_value " +
        "FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') a " +
        "ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') b " +
        "ON a.user_id = b.user_id AND a.ts >= b.ts) " +
        "GROUP BY user_id ORDER BY user_id"),

    "q62_asof_forward" ->
      ("SELECT user_id, count(*) AS n_clicks, count(asof_ts) AS n_matched, " +
        "CAST(sum(epoch_us(asof_ts) - epoch_us(ts)) AS BIGINT) AS lead_us_total, " +
        "CAST(sum(CAST(asof_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_err_value " +
        "FROM (SELECT a.user_id, a.ts, b.ts AS asof_ts, b.value AS asof_value " +
        "FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') a " +
        "ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') b " +
        "ON a.user_id = b.user_id AND a.ts <= b.ts) " +
        "GROUP BY user_id ORDER BY user_id"),

    "q30_variant_extract" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
        "FROM events WHERE user_id = 7 ORDER BY event_id"),

    "q31_window_rank" ->
      ("SELECT user_id, event_id, rn FROM (SELECT user_id, event_id, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn " +
        "FROM events) WHERE rn <= 3 ORDER BY user_id, rn"),

    "q32_set_ops" ->
      ("SELECT DISTINCT user_id FROM events WHERE event_type = 'error' " +
        "EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 90 " +
        "ORDER BY user_id"),

    "q33_rollup" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY ROLLUP(event_type) ORDER BY event_type NULLS FIRST"),

    "q34_percentile" ->
      ("SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50, " +
        "round(quantile_cont(value, 0.9), 4) AS p90 " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    "q35_anti_join" ->
      ("SELECT c_custkey, c_mktsegment FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000) " +
        "ORDER BY c_custkey"),

    "q36_semi_join" ->
      ("SELECT s_suppkey, s_name FROM supplier " +
        "WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey) " +
        "ORDER BY s_suppkey"),

    "q38_sql_cte" ->
      ("WITH daily AS (SELECT CAST(ts AS DATE) AS day, user_id, count(*) AS n " +
        "FROM events GROUP BY 1, 2) " +
        "SELECT day, count(*) AS active_users, CAST(sum(n) AS BIGINT) AS total_events FROM daily " +
        "WHERE n > (SELECT avg(n) FROM daily) GROUP BY day ORDER BY day"),

    "q40_cube" ->
      ("SELECT event_type, CAST(month(ts) AS INTEGER) AS mon, count(*) AS n FROM events " +
        "GROUP BY CUBE(event_type, CAST(month(ts) AS INTEGER)) " +
        "ORDER BY event_type NULLS FIRST, mon NULLS FIRST"),

    "q41_union_all" ->
      ("SELECT user_id, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value FROM (" +
        "SELECT user_id, value FROM events WHERE event_type = 'error' " +
        "UNION ALL SELECT user_id, value FROM events WHERE event_type = 'purchase') " +
        "GROUP BY user_id ORDER BY user_id"),

    "q42_lateral" ->
      ("SELECT e.event_id, x.k FROM events e, " +
        "LATERAL (SELECT CAST(json_extract_string(e.props, '$.k') AS INTEGER) AS k) x " +
        "WHERE x.k >= 95 ORDER BY e.event_id"),

    "q43_grouping_sets" ->
      ("SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n FROM events " +
        "GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ()) " +
        "ORDER BY event_type NULLS FIRST, day NULLS FIRST"),

    "q44_window_analytics" ->
      ("SELECT user_id, event_id, " +
        "lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3 " +
        "FROM events ORDER BY user_id, event_id"),

    "q45_pivot" ->
      ("SELECT CAST(ts AS DATE) AS day, " +
        "count(*) FILTER (WHERE event_type = 'click') AS click, " +
        "count(*) FILTER (WHERE event_type = 'error') AS error, " +
        "count(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
        "count(*) FILTER (WHERE event_type = 'signup') AS signup, " +
        "count(*) FILTER (WHERE event_type = 'view') AS view " +
        "FROM events GROUP BY 1 ORDER BY day"),

    "q46_stats" ->
      ("SELECT event_type, n, round(sqrt((n * s2 - s1 * s1) / (n * (n - 1))), 4) AS stddev_samp, " +
        "round((n * s2 - s1 * s1) / (n * n), 4) AS var_pop FROM (" +
        "SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2 " +
        "FROM events GROUP BY event_type) ORDER BY event_type"),

    "q47_argmax" ->
      ("SELECT event_type, " +
        "max_by(event_id, CAST(round(value * 100) AS BIGINT) * 10000000000 + event_id) AS top_event_id, " +
        "max(value) AS max_value " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    "q48_regex" ->
      ("SELECT doc_id, regexp_extract(text, '[0-9]+') AS first_num, " +
        "length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper " +
        "FROM documents ORDER BY doc_id"),

    "q49_histogram" ->
      ("SELECT CAST(floor(value / 10) AS INTEGER) AS bucket, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1 ORDER BY bucket"),

    "q52_dynamic_widen" ->
      ("SELECT event_id, json_extract_string(props, '$.k') AS k " +
        "FROM events WHERE user_id = 7 ORDER BY event_id"),

    "q53_json_contains" ->
      ("SELECT event_id, user_id FROM events " +
        "WHERE json_extract_string(props, '$.k') = '42' ORDER BY event_id"),

    "q99_json_contains_shred" ->
      // same containment semantics as q53 — the Spark side answers off the
      // shredded store's promoted column; results must be identical
      ("SELECT event_id, user_id FROM events " +
        "WHERE json_extract_string(props, '$.k') = '42' ORDER BY event_id"),

    "q54_salted_agg" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY event_type ORDER BY event_type"),

    "q55_scalar_funcs" ->
      ("SELECT event_id, year(ts) AS y, month(ts) AS mon, day(ts) AS d, hour(ts) AS h, " +
        "round(sqrt(abs(value)), 4) AS sqrt_v, " +
        "round(ln(abs(value) + 1), 4) AS ln1p_v, " +
        "upper(substr(event_type, 1, 3)) AS typ3, " +
        "concat_ws('-', event_type, user_id) AS tag, " +
        "coalesce(json_extract_string(props, '$.missing'), 'none') AS fallback " +
        "FROM events WHERE user_id = 3 ORDER BY event_id"),

    "q59_intersect" ->
      ("SELECT DISTINCT user_id FROM events WHERE event_type = 'click' " +
        "INTERSECT SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' " +
        "ORDER BY user_id"),

    "q60_ntile" ->
      ("SELECT event_type, event_id, " +
        "ntile(4) OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS quartile, " +
        "first_value(event_id) OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS leader_id " +
        "FROM events ORDER BY event_type, event_id"),

    "q56_hash_split" ->
      ("SELECT CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 90 " +
        "THEN 'train' ELSE 'test' END AS split, count(*) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM documents GROUP BY 1 ORDER BY split"),

    "q57_split_leakage" ->
      // brute-force near-dup pairs (as q22) + the md5 split labels; the LSH
      // path must find exactly the straddling pairs
      ("WITH sh AS (SELECT doc_id, " +
        "CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 90 " +
        "THEN 'train' ELSE 'test' END AS split, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> '') " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard, " +
        "a.split AS split_a, b.split AS split_b " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.split <> b.split " +
        "WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.1 " +
        "ORDER BY id_a, id_b"),

    "q58_corpus_stats" ->
      ("SELECT lang, source, count(*) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS sum_tokens " +
        "FROM documents GROUP BY lang, source ORDER BY lang, source"),

    "q61_heavy_hitters" ->
      ("SELECT event_type AS key, count(*) AS est_count FROM events " +
        "GROUP BY event_type ORDER BY key"),

    "q50_sql_custom_funcs" ->
      ("SELECT doc_id, (SELECT CASE WHEN trim(text) = '' THEN 0 " +
        "WHEN len(toks) < 3 THEN 1 " +
        "ELSE len(list_distinct(list_transform(range(len(toks)-2), " +
        "i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) AS n_shingles " +
        "FROM documents ORDER BY doc_id"),

    "q64_sessionize" ->
      // session boundary at >12h inter-event gap; session_idx is a running
      // sum of boundary flags (CAST: DuckDB window sum -> HUGEINT).
      // event_id rides along into the running-sum window so tied
      // timestamps order identically to the (ts, event_id) Spark window
      ("WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS us, " +
        "CASE WHEN lag(ts) OVER w IS NULL " +
        "OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 43200000000 THEN 1 ELSE 0 END AS is_new " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "y AS (SELECT user_id, us, CAST(sum(is_new) OVER " +
        "(PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM x) " +
        "SELECT user_id, session_idx, count(*) AS n_events, " +
        "min(us) AS start_us, max(us) AS end_us " +
        "FROM y GROUP BY user_id, session_idx ORDER BY user_id, session_idx"),

    "q65_funnel" ->
      // earliest-entry funnel: stage k = first step-k event at-or-after
      // stage k-1's time
      ("WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'signup' GROUP BY user_id), " +
        "s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 ON e.user_id = s0.user_id " +
        "AND e.ts >= s0.t0 WHERE e.event_type = 'click' GROUP BY e.user_id), " +
        "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id " +
        "AND e.ts >= s1.t1 WHERE e.event_type = 'purchase' GROUP BY e.user_id) " +
        "SELECT 0 AS stage, 'signup' AS path, count(*) AS n_users FROM s0 " +
        "UNION ALL SELECT 1, 'signup>click', count(*) FROM s1 " +
        "UNION ALL SELECT 2, 'signup>click>purchase', count(*) FROM s2 " +
        "ORDER BY stage"),

    "q74_cohort_retention" ->
      ("WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY user_id) " +
        "SELECT CAST(f.cw AS DATE) AS cohort_week, " +
        "CAST(floor((epoch_us(e.ts) - epoch_us(f.cw)) / 604800000000.0) AS BIGINT) AS week_offset, " +
        "count(DISTINCT e.user_id) AS n_users " +
        "FROM events e JOIN f ON e.user_id = f.user_id " +
        "GROUP BY 1, 2 ORDER BY cohort_week, week_offset"),

    "q66_word_freq" ->
      ("WITH toks AS (SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        "t -> length(t) > 0)) AS token FROM documents) " +
        "SELECT token, n FROM (SELECT token, count(*) AS n FROM toks GROUP BY token " +
        "ORDER BY n DESC, token LIMIT 20) ORDER BY token"),

    "q67_tfidf" ->
      ("WITH tf AS (SELECT doc_id, token AS term, count(*) AS tf FROM " +
        "(SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        "t -> length(t) > 0)) AS token FROM documents) GROUP BY doc_id, term), " +
        "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
        "scored AS (SELECT doc_id, term, tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df) AS score " +
        "FROM tf JOIN df USING (term)) " +
        "SELECT doc_id, top_term, round(score, 4) AS score FROM " +
        "(SELECT doc_id, term AS top_term, score, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM scored) " +
        "WHERE rk = 1 ORDER BY doc_id"),

    "q70_repetition" ->
      // duplicate word-bigram ratio; bigram counts mirror WordShingles
      // semantics (trim=''->0, <2 tokens->1 whole-text shingle)
      ("SELECT doc_id, round(CASE WHEN ntok - 1 <= 0 THEN 0.0 " +
        "ELSE 1.0 - nbg / (ntok - 1.0) END, 4) AS rep_ratio FROM (" +
        "SELECT doc_id, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ntok, " +
        "(SELECT CASE WHEN trim(text) = '' THEN 0 WHEN len(toks) < 2 THEN 1 " +
        "ELSE len(list_distinct(list_transform(range(len(toks)-1), i -> toks[i+1] || ' ' || toks[i+2]))) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) AS nbg " +
        "FROM documents) ORDER BY doc_id"),

    "q71_pii_redact" ->
      // DuckDB regexp_replace needs 'g' for replace-all (Spark default)
      ("WITH wire AS (SELECT event_id, 'uid ' || user_id || ' contact u' || user_id || " +
        "'@example.com ref ' || (event_id * 137) || ' t ' || event_type AS msg " +
        "FROM events WHERE user_id = 3) " +
        "SELECT event_id, " +
        "regexp_replace(regexp_replace(msg, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'[0-9]{4,}', '<NUM>', 'g') AS redacted, " +
        "len(regexp_extract_all(msg, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails, " +
        "len(regexp_extract_all(regexp_replace(msg, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), " +
        "'[0-9]{4,}')) AS n_nums " +
        "FROM wire ORDER BY event_id"),

    "q72_stratified_sample" ->
      ("SELECT lang, doc_id, rk FROM (SELECT lang, doc_id, " +
        "row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk " +
        "FROM documents) WHERE rk <= 5 ORDER BY lang, rk"),

    "q73_neardup_clusters" ->
      // transitive closure over the brute-force jaccard>=0.1 pair graph
      // (same pair universe as q22); min reachable label = cluster id
      ("WITH RECURSIVE sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> ''), " +
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.1), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs), " +
        "reach(id, lbl) AS (SELECT src, src FROM edges " +
        "UNION SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst) " +
        "SELECT id AS doc_id, min(lbl) AS cluster_id, (min(lbl) = id) AS is_canonical " +
        "FROM reach GROUP BY id ORDER BY doc_id"),

    "q98_survivorship" ->
      // q73's transitive-closure clusters + a survivorship window: longest
      // text per cluster keeps (tie -> lowest doc_id); cluster-free docs
      // coalesce to their own id and keep themselves
      ("WITH RECURSIVE sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> ''), " +
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.1), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs), " +
        "reach(id, lbl) AS (SELECT src, src FROM edges " +
        "UNION SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst), " +
        "clusters AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY id), " +
        "assigned AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, " +
        "CAST(length(d.text) AS BIGINT) AS n_chars " +
        "FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id) " +
        "SELECT doc_id, cluster_id, n_chars, " +
        "(row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) = 1) AS keep " +
        "FROM assigned ORDER BY doc_id"),

    // q100_semantic_dedup: rows-only (k-means partition is not
    // DuckDB-expressible); q101 is its contract twin.

    "q101_semdedup_contract" ->
      // brute-force cosine>=0.35 duplicate graph (same double kernels as
      // q87) + recursive min-label closure (same reach pattern as q98's
      // oracle): n_exact_dup_docs / n_components re-derived independently,
      // precision and recall-floor booleans pinned TRUE
      ("WITH RECURSIVE e AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings), " +
        "pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id " +
        "WHERE (CASE WHEN a.nrm * b.nrm = 0 THEN 0.0 " +
        "ELSE list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (a.nrm * b.nrm) END) >= 0.35), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs), " +
        "reach(id, lbl) AS (SELECT src, src FROM edges " +
        "UNION SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst), " +
        "comp AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id) " +
        "SELECT (SELECT count(*) FROM comp) AS n_exact_dup_docs, " +
        "(SELECT count(DISTINCT lbl) FROM comp) AS n_components, " +
        "TRUE AS all_drops_witnessed, TRUE AS recall_floor_met"),

    "q102_dup_ngram_fraction" ->
      // same shingle CTE as q84/q98; grams are distinct per doc, so the
      // per-gram count(*) IS the number of docs containing the gram
      ("WITH sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> ''), " +
        "g AS (SELECT doc_id, unnest(sh) AS gram FROM sh), " +
        "c AS (SELECT gram, count(*) AS n_docs_with_gram FROM g GROUP BY gram) " +
        "SELECT doc_id, count(*) AS n_grams, " +
        "round(CAST(sum(CASE WHEN n_docs_with_gram >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS dup_fraction " +
        "FROM g JOIN c USING (gram) GROUP BY doc_id ORDER BY doc_id"),

    "q103_decontam_bloom_contract" ->
      // q89's exact contamination count re-derived (same CTE); the Bloom
      // side's guarantees pinned: zero false negatives, FP overhang <= 5%
      ("WITH sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> ''), " +
        "ev AS (SELECT DISTINCT g FROM (SELECT unnest(sh) AS g FROM sh WHERE doc_id % 50 = 0)), " +
        "tg AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 50 <> 0), " +
        "hits AS (SELECT DISTINCT tg.doc_id FROM tg JOIN ev USING (g)) " +
        "SELECT (SELECT count(*) FROM documents WHERE doc_id % 50 <> 0) AS n_train, " +
        "(SELECT count(*) FROM hits) AS n_contaminated_exact, " +
        "TRUE AS no_false_negatives, TRUE AS fp_overhang_bounded"),

    "q104_incremental_dedup" ->
      // same md5 normalized-text fingerprint as q19/q85's oracles; corpus
      // membership + batch-first-occurrence joins replicated directly
      ("WITH f AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents), " +
        "c AS (SELECT DISTINCT fp FROM f WHERE doc_id % 10 <> 0), " +
        "b AS (SELECT doc_id, fp FROM f WHERE doc_id % 10 = 0), " +
        "fst AS (SELECT fp, min(doc_id) AS first_id FROM b GROUP BY fp) " +
        "SELECT b.doc_id, (c.fp IS NOT NULL) AS in_corpus, " +
        "(b.doc_id = first_id) AS first_in_batch, " +
        "(c.fp IS NULL AND b.doc_id = first_id) AS keep " +
        "FROM b LEFT JOIN c ON b.fp = c.fp JOIN fst ON b.fp = fst.fp " +
        "ORDER BY b.doc_id"),

    "q114_longest_dup_run" ->
      // q107's coverage CTE + the tpos - row_number islands trick
      ("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents), " +
        "grams AS (SELECT doc_id, i AS pos, ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] AS gram " +
        "FROM toks, UNNEST(range(len(ts) - 2)) AS t(i) WHERE len(ts) >= 3), " +
        "dup AS (SELECT gram FROM grams GROUP BY gram HAVING min(doc_id) <> max(doc_id)), " +
        "covered AS (SELECT DISTINCT g.doc_id, g.pos + o AS tpos " +
        "FROM grams g JOIN dup USING (gram), UNNEST([0,1,2]) AS u(o)), " +
        "runs AS (SELECT doc_id, tpos - row_number() OVER (PARTITION BY doc_id ORDER BY tpos) AS grp " +
        "FROM covered), " +
        "r AS (SELECT doc_id, count(*) AS run_len FROM runs GROUP BY doc_id, grp), " +
        "agg AS (SELECT doc_id, CAST(sum(run_len) AS BIGINT) AS n_covered, " +
        "max(run_len) AS longest_run FROM r GROUP BY doc_id) " +
        "SELECT t.doc_id, len(ts) AS n_tokens, coalesce(n_covered, 0) AS n_covered, " +
        "coalesce(longest_run, 0) AS longest_run " +
        "FROM toks t LEFT JOIN agg USING (doc_id) ORDER BY t.doc_id"),

    "q111_group_topk" ->
      // window ground truth with the same (n_chars DESC, doc_id) order
      ("WITH r AS (SELECT lang, source, doc_id, n_chars, " +
        "row_number() OVER (PARTITION BY lang, source ORDER BY n_chars DESC, doc_id) AS rk " +
        "FROM documents) " +
        "SELECT lang, source, CAST(rk AS BIGINT) AS rnk, doc_id, n_chars " +
        "FROM r WHERE rk <= 3 ORDER BY lang, source, rnk"),

    "q112_gram_novelty" ->
      // same shingle CTE as q102; first occurrence = min(doc_id) per gram
      ("WITH sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> ''), " +
        "g AS (SELECT doc_id, unnest(sh) AS gram FROM sh), " +
        "f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram) " +
        "SELECT doc_id, count(*) AS n_grams, " +
        "CAST(sum(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_seen, " +
        "round(1.0 - CAST(sum(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS novelty " +
        "FROM g JOIN f USING (gram) GROUP BY doc_id ORDER BY doc_id"),

    "q113_mad_outliers" ->
      // quantile_cont == Spark's interpolated percentile (q34 parity);
      // fences from unrounded values, round for display only
      ("WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type), " +
        "dev AS (SELECT d.event_type, quantile_cont(abs(d.value - med), 0.5) AS mad " +
        "FROM events d JOIN med USING (event_type) GROUP BY d.event_type), " +
        "j AS (SELECT d.event_type, d.value, med, mad " +
        "FROM events d JOIN med USING (event_type) JOIN dev USING (event_type)) " +
        "SELECT event_type, round(any_value(med), 4) AS med, round(any_value(mad), 4) AS mad, " +
        "CAST(sum(CASE WHEN abs(value - med) > 3 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, " +
        "count(*) AS n_rows FROM j GROUP BY event_type ORDER BY event_type"),

    "q108_containment_pairs" ->
      // full gram equi-join ground truth (no prefix filter): same shingle
      // CTE as q102, integer threshold, round-for-display discipline
      ("WITH sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> ''), " +
        "g AS (SELECT doc_id, unnest(sh) AS gram FROM sh), " +
        "m AS (SELECT doc_id, count(*) AS m FROM g GROUP BY doc_id), " +
        "inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter " +
        "FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id <> b.doc_id GROUP BY 1, 2) " +
        "SELECT a_id, b_id, m.m AS n_a, n_inter, " +
        "round(CAST(n_inter AS DOUBLE) / m.m, 4) AS containment " +
        "FROM inter JOIN m ON m.doc_id = a_id " +
        "WHERE n_inter * 5 >= 3 * m.m ORDER BY a_id, b_id"),

    "q109_mixture_resample" ->
      // same md5 16-bit draw as q56's split, same token count as q92's
      // weights; the capped Bernoulli is one integer inequality
      ("WITH g AS (SELECT source, sum(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)) AS n_tokens " +
        "FROM documents GROUP BY source), " +
        "t AS (SELECT sum(n_tokens) AS total_tokens, count(*) AS n_groups FROM g) " +
        "SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS kept_id_sum " +
        "FROM documents d JOIN g USING (source), t " +
        "WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) " +
        "* (n_groups * n_tokens) < 65536 * total_tokens " +
        "GROUP BY source ORDER BY source"),

    "q110_quantized_ann_contract" ->
      // exact side re-derived with q93's double cosine kernel and
      // (cos DESC, vec_id) tie-break; quantized-side floors pinned TRUE
      ("WITH e AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings WHERE vec_id >= 10), " +
        "q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn FROM (" +
        "SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings WHERE vec_id < 10)), " +
        "s AS (SELECT query_id, e.vec_id AS vec_id, " +
        "CASE WHEN e.nrm * qn = 0 THEN 0.0 " +
        "ELSE list_sum(list_transform(list_zip(e.embedding, qv), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (e.nrm * qn) END AS cos " +
        "FROM e, q WHERE e.vec_id <> query_id), " +
        "r AS (SELECT query_id, vec_id, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk FROM s) " +
        "SELECT (SELECT count(*) FROM e) AS n_corpus, " +
        "(SELECT count(*) FROM q) AS n_queries, " +
        "(SELECT CAST(sum(vec_id) AS BIGINT) FROM r WHERE rk <= 10) AS exact_topk_id_sum, " +
        "TRUE AS recall_floor_met, TRUE AS qerr_bound_met"),

    "q107_passage_removal" ->
      // positional-gram ground truth: same covered-token arithmetic,
      // string_agg reconstruction ordered by position
      ("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents), " +
        "grams AS (SELECT doc_id, i AS pos, ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] AS gram " +
        "FROM toks, UNNEST(range(len(ts) - 2)) AS t(i) WHERE len(ts) >= 3), " +
        "dup AS (SELECT gram FROM grams GROUP BY gram HAVING min(doc_id) <> max(doc_id)), " +
        "covered AS (SELECT DISTINCT g.doc_id, g.pos + o AS tpos " +
        "FROM grams g JOIN dup USING (gram), UNNEST([0,1,2]) AS u(o)), " +
        "kept AS (SELECT t.doc_id, i AS tpos, ts[i+1] AS tok " +
        "FROM toks t, UNNEST(range(len(ts))) AS x(i) " +
        "WHERE NOT EXISTS (SELECT 1 FROM covered c WHERE c.doc_id = t.doc_id AND c.tpos = i)) " +
        "SELECT toks.doc_id, len(ts) AS n_tokens, " +
        "len(ts) - coalesce(k.cnt, 0) AS n_removed, coalesce(k.txt, '') AS clean_text " +
        "FROM toks LEFT JOIN (SELECT doc_id, count(*) AS cnt, " +
        "string_agg(tok, ' ' ORDER BY tpos) AS txt FROM kept GROUP BY doc_id) k USING (doc_id) " +
        "ORDER BY toks.doc_id"),

    "q115_bigram_ce" ->
      // bigram LM ground truth via a positions self-join (the engine side
      // uses an in-array generator; counts and the ln/avg agree exactly
      // at 4 decimals, q67's log precedent)
      ("WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok, " +
        "generate_subscripts(regexp_split_to_array(lower(trim(text)), '\\s+'), 1) AS pos " +
        "FROM documents WHERE trim(text) <> ''), " +
        "bigrams AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2 " +
        "FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1), " +
        "bc AS (SELECT w1, w2, count(*) AS cb FROM bigrams GROUP BY w1, w2), " +
        "uc AS (SELECT w1, count(*) AS cu FROM bigrams GROUP BY w1), " +
        "perdoc AS (SELECT doc_id, count(*) AS n_bigrams, " +
        "round(-avg(ln(CAST(cb AS DOUBLE) / cu)), 4) AS ce " +
        "FROM bigrams JOIN bc USING (w1, w2) JOIN uc USING (w1) GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams, " +
        "COALESCE(ce, 0.0) AS cross_entropy " +
        "FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id"),

    "q116_importance_weights" ->
      // same md5-prefix bucket hash as the split family (q56), add-1
      // smoothing, exact interpolated median (quantile_cont == Spark's
      // percentile, q113 precedent); keep compared on RAW weights
      ("WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok " +
        "FROM documents WHERE trim(text) <> ''), " +
        "bucketed AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) % 4096 AS b FROM toks), " +
        "tcnt AS (SELECT b, count(*) AS ct FROM bucketed " +
        "JOIN (SELECT doc_id FROM documents WHERE lang = 'en') td USING (doc_id) GROUP BY b), " +
        "rcnt AS (SELECT b, count(*) AS cr FROM bucketed GROUP BY b), " +
        "tt AS (SELECT sum(ct) AS n FROM tcnt), rt AS (SELECT sum(cr) AS n FROM rcnt), " +
        "lw AS (SELECT bucketed.doc_id, count(*) AS n_toks, " +
        "sum(ln((COALESCE(ct, 0) + 1.0) / (tt.n + 4096)) - ln((cr + 1.0) / (rt.n + 4096))) AS lwr " +
        "FROM bucketed LEFT JOIN tcnt USING (b) JOIN rcnt USING (b), tt, rt " +
        "GROUP BY bucketed.doc_id), " +
        "med AS (SELECT quantile_cont(lwr, 0.5) AS m FROM lw) " +
        "SELECT d.doc_id, CAST(COALESCE(n_toks, 0) AS BIGINT) AS n_tokens, " +
        "round(COALESCE(lwr, 0.0), 4) AS log_weight, " +
        "COALESCE(lwr >= med.m, false) AS keep " +
        "FROM documents d LEFT JOIN lw USING (doc_id), med ORDER BY d.doc_id"),

    "q119_hashed_features" ->
      // same md5 bucket hash; norms from exact integer sums of squares,
      // float cast replicated before the display rounding
      ("WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok " +
        "FROM documents WHERE trim(text) <> ''), " +
        "bk AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) % 256 AS dim FROM toks), " +
        "tf AS (SELECT doc_id, dim, count(*) AS c FROM bk GROUP BY 1, 2), " +
        "nrm AS (SELECT doc_id, sqrt(sum(c * c)) AS n FROM tf GROUP BY doc_id) " +
        "SELECT tf.doc_id, dim, round(CAST(CAST(c / n AS FLOAT) AS DOUBLE), 4) AS value " +
        "FROM tf JOIN nrm USING (doc_id) ORDER BY doc_id, dim"),

    "q120_epoch_shuffle" ->
      // same 60-bit md5 order key; row_number per shard replays positions
      ("WITH h AS (SELECT doc_id, CAST('0x' || substring(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h " +
        "FROM documents) " +
        "SELECT doc_id, h % 8 AS shard, " +
        "CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos " +
        "FROM h ORDER BY doc_id"),

    "q121_corpus_overlap" ->
      // full KMV replay: q118's shingle idiom, the same 60-bit md5 gram
      // hash, k-min sets via ORDER BY/LIMIT, identical estimate
      // arithmetic (2^60 is a power of two — every product/division is
      // the same correctly-rounded IEEE op)
      ("WITH sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> ''), " +
        "ga AS (SELECT DISTINCT CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) AS h " +
        "FROM (SELECT unnest(sh) AS g FROM sh WHERE doc_id % 2 = 0)), " +
        "gb AS (SELECT DISTINCT CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) AS h " +
        "FROM (SELECT unnest(sh) AS g FROM sh WHERE doc_id % 2 = 1)), " +
        "ska AS (SELECT h FROM ga ORDER BY h LIMIT 256), " +
        "skb AS (SELECT h FROM gb ORDER BY h LIMIT 256), " +
        "un AS (SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb) u ORDER BY h LIMIT 256), " +
        "shared AS (SELECT count(*) AS c FROM un WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)) " +
        "SELECT CAST((SELECT count(*) FROM un) AS BIGINT) AS k_union, " +
        "CAST(shared.c AS BIGINT) AS n_shared, " +
        "round(shared.c / CAST((SELECT count(*) FROM un) AS DOUBLE), 4) AS est_jaccard, " +
        "round(((SELECT count(*) FROM ska) - 1.0) * 1152921504606846976.0 / (SELECT max(h) FROM ska), 4) AS est_distinct_a, " +
        "round(((SELECT count(*) FROM skb) - 1.0) * 1152921504606846976.0 / (SELECT max(h) FROM skb), 4) AS est_distinct_b " +
        "FROM shared"),

    "q122_source_quota" ->
      // same 32-bit md5 draw; ties (collisions) break by doc_id on both
      // engines
      ("WITH h AS (SELECT doc_id, source, CAST('0x' || substring(md5('q:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h " +
        "FROM documents), " +
        "r AS (SELECT doc_id, source, CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rnk FROM h) " +
        "SELECT doc_id, source, rnk FROM r WHERE rnk <= 10 ORDER BY source, rnk"),

    "q123_dup_spectrum" ->
      // doc-frequency histogram over the string grams themselves — per-doc
      // distinct shingles make count(*) the doc count
      ("WITH sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> ''), " +
        "dfreq AS (SELECT g, count(*) AS df FROM (SELECT doc_id, unnest(sh) AS g FROM sh) GROUP BY g), " +
        "tot AS (SELECT count(*) AS n FROM dfreq) " +
        "SELECT df, CAST(count(*) AS BIGINT) AS n_grams, " +
        "round(count(*) / CAST(tot.n AS DOUBLE), 4) AS share " +
        "FROM dfreq, tot GROUP BY df, tot.n ORDER BY df"),

    "q124_knn_centrality" ->
      // full replay of the fixpoint: exact 3-NN edge build (q23's cosine
      // idiom), then five unrolled PageRank rounds with the dangling-mass
      // term mirrored; centrality = rank * N rounded at the END only, so
      // both engines iterate on raw doubles
      (q124OracleSql),

    "q125_event_sequences" ->
      // row_number over (ts, event_id) replays the heap order; totals via
      // the count window
      ("WITH r AS (SELECT user_id, event_id, event_type, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rnk, " +
        "count(*) OVER (PARTITION BY user_id) AS n_events FROM events) " +
        "SELECT user_id, CAST(rnk AS BIGINT) AS rnk, event_id, event_type, " +
        "CAST(n_events AS BIGINT) AS n_events, n_events > 8 AS truncated " +
        "FROM r WHERE rnk <= 8 ORDER BY user_id, rnk"),

    "q126_weighted_sample" ->
      // same 32-bit md5 draw and Efraimidis-Spirakis key arithmetic;
      // adjacent key gaps are ~1e-8 minimum (ten orders above ulp), so
      // selection and ranks agree
      ("WITH h AS (SELECT doc_id, source, n_chars, " +
        "CAST('0x' || substring(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS hv " +
        "FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0), " +
        "k AS (SELECT doc_id, source, n_chars, " +
        "ln((CAST(hv AS DOUBLE) + 1) / 4294967296.0) / CAST(n_chars AS DOUBLE) AS key FROM h) " +
        "SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS rnk, " +
        "doc_id, source, n_chars FROM k ORDER BY key DESC, doc_id LIMIT 100"),

    "q127_blocklist_match" ->
      // ground truth per pattern via contains(); list_sort mirrors the
      // automaton's lexicographic output order
      ("SELECT doc_id, unnest(list_sort(list_filter(" +
        "['merge batch', 'row scan', 'window', 'shuffle', 'stream fast', 'big table', 'sort key', 'agg join'], " +
        "p -> contains(text, p)))) AS pattern " +
        "FROM documents ORDER BY doc_id, pattern"),

    "q128_tfidf_keywords" ->
      // tf and df from the same (doc, token) grain; identical smoothed-idf
      // arithmetic; ties (equal tf, equal df -> bit-equal scores) break on
      // the token string in both engines
      ("WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token " +
        "FROM documents WHERE trim(text) <> ''), " +
        "tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2), " +
        "df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1), " +
        "n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tf), " +
        "scored AS (SELECT tf.doc_id, tf.token, " +
        "CAST(tf.tf AS DOUBLE) * (ln((n.n + 1) / (CAST(df.df AS DOUBLE) + 1)) + 1) AS score " +
        "FROM tf JOIN df USING (token) CROSS JOIN n), " +
        "r AS (SELECT doc_id, token, score, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk FROM scored) " +
        "SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, token, round(score, 4) AS score " +
        "FROM r WHERE rnk <= 5 ORDER BY doc_id, rnk"),

    "q129_bm25_search" ->
      // same per-term tf from the token array, same one-row stats, and the
      // SAME left-associative term-sum order — a hash-agg sum would
      // reassociate and lose bit parity at the rank boundary
      (q129OracleSql),

    "q132_personalized_pagerank" ->
      (q132OracleSql),

    "q138_coreset_select" ->
      (q138OracleSql),

    "q142_whitening_contract" ->
      // n_rows re-derived; identity-covariance and zero-mean booleans
      // pinned TRUE (q101/q103 contract discipline)
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, TRUE AS identity_cov, " +
        "TRUE AS mean_zero FROM embeddings"),

    "q154_winnowing" ->
      // same gram hashes (md5 8-hex idiom), same composite key, same
      // window-min selection via a sliding frame truncated to full
      // windows (pos <= n-w; short docs keep their single truncated
      // window at pos 0)
      ("WITH d AS (SELECT doc_id, lower(text) AS t FROM documents " +
        "WHERE text IS NOT NULL AND length(lower(text)) >= 5), " +
        "g AS (SELECT doc_id, i AS pos, " +
        "CAST('0x' || substr(md5(substring(t, CAST(i + 1 AS INT), 5)), 1, 8) AS BIGINT) " +
        "* 2097152 + (2097151 - i) AS key, length(t) - 4 AS n " +
        "FROM d, UNNEST(range(length(t) - 4)) AS u(i)), " +
        "wm AS (SELECT doc_id, pos, n, min(key) OVER (PARTITION BY doc_id " +
        "ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey FROM g) " +
        "SELECT DISTINCT doc_id, " +
        "CAST(2097151 - (wkey % 2097152) AS BIGINT) AS pos, " +
        "CAST(wkey // 2097152 AS BIGINT) AS fp " +
        "FROM wm WHERE pos <= greatest(n - 4, 0)"),

    "q159_trigram_ce" ->
      // positions self-joins rebuild the trigram/bigram/token streams;
      // the λ·(num/den) association matches the engine exactly (q115's
      // ln/avg-at-4-decimals precedent)
      ("WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok, " +
        "generate_subscripts(regexp_split_to_array(lower(trim(text)), '\\s+'), 1) AS pos " +
        "FROM documents WHERE trim(text) <> ''), " +
        "tri AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2, c.tok AS w3 " +
        "FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 " +
        "JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2), " +
        "bi AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2 " +
        "FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1), " +
        "c3 AS (SELECT w1, w2, w3, count(*) AS n3 FROM tri GROUP BY 1, 2, 3), " +
        "cc2 AS (SELECT w1, w2, count(*) AS nc2 FROM tri GROUP BY 1, 2), " +
        "cb AS (SELECT w1, w2, count(*) AS nb FROM bi GROUP BY 1, 2), " +
        "cc1 AS (SELECT w1, count(*) AS nc1 FROM bi GROUP BY 1), " +
        "cw AS (SELECT tok, count(*) AS nw FROM toks GROUP BY 1), " +
        "nt AS (SELECT count(*) AS n_tok FROM toks), " +
        "perdoc AS (SELECT tri.doc_id, count(*) AS n_trigrams, " +
        "round(-avg(ln(" +
        "0.6 * (CAST(c3.n3 AS DOUBLE) / cc2.nc2) + " +
        "0.3 * (CAST(cb.nb AS DOUBLE) / cc1.nc1) + " +
        "0.1 * (CAST(cw.nw AS DOUBLE) / nt.n_tok))), 4) AS ce " +
        "FROM tri JOIN c3 USING (w1, w2, w3) JOIN cc2 USING (w1, w2) " +
        "JOIN cb ON cb.w1 = tri.w2 AND cb.w2 = tri.w3 " +
        "JOIN cc1 ON cc1.w1 = tri.w2 JOIN cw ON cw.tok = tri.w3 " +
        "CROSS JOIN nt GROUP BY tri.doc_id) " +
        "SELECT d.doc_id, CAST(COALESCE(n_trigrams, 0) AS BIGINT) AS n_trigrams, " +
        "COALESCE(ce, 0.0) AS cross_entropy " +
        "FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id"),

    "q161_kneser_ney_ce" ->
      // replays the full KN model: bigram counts, one-pass left-context
      // count + distinct-continuation, distinct-predecessor, bigram-type
      // total; the (c-D)/cu + (D*n1u/cu)*(n1w/nbt) association matches the
      // engine term for term (q159's precedent)
      ("WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok, " +
        "generate_subscripts(regexp_split_to_array(lower(trim(text)), '\\s+'), 1) AS pos " +
        "FROM documents WHERE trim(text) <> ''), " +
        "bi AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2 " +
        "FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1), " +
        "cb AS (SELECT w1, w2, count(*) AS cb FROM bi GROUP BY 1, 2), " +
        "cu AS (SELECT w1, count(*) AS cu, count(DISTINCT w2) AS n1u FROM bi GROUP BY 1), " +
        "cw AS (SELECT w2, count(DISTINCT w1) AS n1w FROM bi GROUP BY 1), " +
        "nbt AS (SELECT count(*) AS nbt FROM cb), " +
        "perdoc AS (SELECT bi.doc_id, count(*) AS n_bigrams, " +
        "round(-avg(ln(" +
        "(CAST(cb.cb AS DOUBLE) - 0.75) / cu.cu + " +
        "(0.75 * cu.n1u / cu.cu) * (CAST(cw.n1w AS DOUBLE) / nbt.nbt))), 4) AS ce " +
        "FROM bi JOIN cb USING (w1, w2) JOIN cu USING (w1) JOIN cw USING (w2) " +
        "CROSS JOIN nbt GROUP BY bi.doc_id) " +
        "SELECT d.doc_id, CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams, " +
        "COALESCE(ce, 0.0) AS cross_entropy " +
        "FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id"),

    "q208_ols_crossval" ->
      // q206's exact decimal moments per fold, complement subtraction in
      // decimal, double ratios once, and 2^20 fixed-point residual sums
      ("WITH b AS (SELECT doc_id AS id, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DECIMAL(18,2)) AS x, " +
        "CAST(n_chars AS DECIMAL(18,2)) AS y, doc_id % 5 AS f " +
        "FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL " +
        "AND doc_id IS NOT NULL), " +
        "fm AS (SELECT f, count(*) AS n, sum(x) AS sx, sum(y) AS sy, " +
        "sum(x * x) AS sxx, sum(x * y) AS sxy FROM b GROUP BY f), " +
        "g AS (SELECT sum(n) AS gn, sum(sx) AS gsx, sum(sy) AS gsy, " +
        "sum(sxx) AS gsxx, sum(sxy) AS gsxy FROM fm), " +
        "c AS (SELECT f, n, bb, " +
        "CAST(gsy - sy AS DOUBLE) / CAST(gn - n AS DOUBLE) - " +
        "bb * (CAST(gsx - sx AS DOUBLE) / CAST(gn - n AS DOUBLE)) AS aa " +
        "FROM (SELECT f, n, gn, gsx, gsy, sx, sy, " +
        "(CAST(gn - n AS DOUBLE) * CAST(gsxy - sxy AS DOUBLE) - " +
        "CAST(gsx - sx AS DOUBLE) * CAST(gsy - sy AS DOUBLE)) / " +
        "(CAST(gn - n AS DOUBLE) * CAST(gsxx - sxx AS DOUBLE) - " +
        "CAST(gsx - sx AS DOUBLE) * CAST(gsx - sx AS DOUBLE)) AS bb " +
        "FROM fm CROSS JOIN g)), " +
        "r AS (SELECT b.f, c.n, c.aa, c.bb, " +
        "CAST(y AS DOUBLE) - (c.aa + c.bb * CAST(x AS DOUBLE)) AS rr " +
        "FROM b JOIN c ON b.f = c.f), " +
        "q AS (SELECT f, n, aa, bb, " +
        "sum(CAST(floor(rr * rr * 1048576.0) AS BIGINT)) AS q2 " +
        "FROM r GROUP BY f, n, aa, bb) " +
        "SELECT CAST(f AS BIGINT) AS fold, CAST(n AS BIGINT) AS n_fold, " +
        "floor(bb * 10000 + 0.5) / 10000 AS slope, " +
        "floor(aa * 10000 + 0.5) / 10000 AS intercept, " +
        "round(sqrt(CAST(q2 AS DOUBLE) / 1048576.0 / CAST(n AS DOUBLE)), 4) AS rmse " +
        "FROM q ORDER BY fold"),

    "q209_calibration" ->
      // same integer rational (stopword hits / tokens), same HUGEINT
      // integral divisions for the bin draw and the 2^20 fixed-point
      // quantizations, same double-association bp renderings
      ("WITH v AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS HUGEINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS HUGEINT) AS den, " +
        "(source = 'src0') AS y FROM documents " +
        "WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "b AS (SELECT least(9, num * 10 // den) AS bin, " +
        "num * 1048576 // den AS sq20, " +
        "(num - CASE WHEN y THEN den ELSE 0 END) * (num - CASE WHEN y THEN den ELSE 0 END) " +
        "* 1048576 // (den * den) AS bq20, " +
        "CASE WHEN y THEN 1 ELSE 0 END AS pos FROM v), " +
        "p AS (SELECT bin, count(*) AS n, sum(pos) AS n_pos, " +
        "sum(sq20) AS ssum, sum(bq20) AS bsum FROM b GROUP BY bin) " +
        "SELECT bin, n, n_pos, score_q20_sum, brier_q20_sum, mean_score_bp, " +
        "pos_rate_bp, abs(mean_score_bp - pos_rate_bp) AS gap_bp FROM " +
        "(SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n, " +
        "CAST(n_pos AS BIGINT) AS n_pos, " +
        "CAST(ssum AS BIGINT) AS score_q20_sum, CAST(bsum AS BIGINT) AS brier_q20_sum, " +
        "CAST(floor(CAST(ssum AS DOUBLE) / (CAST(n AS DOUBLE) * 1048576.0) * 10000 + 0.5) AS BIGINT) AS mean_score_bp, " +
        "CAST(floor(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS pos_rate_bp " +
        "FROM p) ORDER BY bin"),

    "q210_calibration_summary" ->
      // q209's bin table folded in sorted bin order (list_reduce over the
      // ORDER BY bin list — the engine-portable left association), Brier
      // mass as an order-free integer sum
      ("WITH v AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS HUGEINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS HUGEINT) AS den, " +
        "(source = 'src0') AS y FROM documents " +
        "WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "b AS (SELECT least(9, num * 10 // den) AS bin, " +
        "num * 1048576 // den AS sq20, " +
        "(num - CASE WHEN y THEN den ELSE 0 END) * (num - CASE WHEN y THEN den ELSE 0 END) " +
        "* 1048576 // (den * den) AS bq20, " +
        "CASE WHEN y THEN 1 ELSE 0 END AS pos FROM v), " +
        "p AS (SELECT bin, count(*) AS n, sum(pos) AS n_pos, " +
        "sum(sq20) AS ssum, sum(bq20) AS bsum FROM b GROUP BY bin), " +
        "o AS (SELECT list(struct_pack(bin := bin, n := n, n_pos := n_pos, s := ssum) ORDER BY bin) AS bs, " +
        "sum(n) AS nn, sum(n_pos) AS np, sum(bsum) AS bb FROM p) " +
        "SELECT CAST(nn AS BIGINT) AS n, CAST(np AS BIGINT) AS n_pos, " +
        "CAST(floor(list_reduce(list_prepend(0.0, list_transform(bs, e -> " +
        "CAST((e).n AS DOUBLE) / CAST(nn AS DOUBLE) * " +
        "abs(CAST((e).s AS DOUBLE) / (CAST((e).n AS DOUBLE) * 1048576.0) - " +
        "CAST((e).n_pos AS DOUBLE) / CAST((e).n AS DOUBLE)))), " +
        "(x, y) -> x + y) * 10000 + 0.5) AS BIGINT) AS ece_bp, " +
        "CAST(floor(CAST(bb AS DOUBLE) / (CAST(nn AS DOUBLE) * 1048576.0) * 10000 + 0.5) AS BIGINT) AS brier_bp " +
        "FROM o"),

    "q233_cochran_q" ->
      // the same three pass indicators, k+2 HUGEINT masses, the same
      // integer-rational Q chain
      ("WITH base AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS den, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok, " +
        "n_chars FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL), " +
        "d AS (SELECT CASE WHEN num * 20 >= den * 3 THEN 1 ELSE 0 END AS r0, " +
        "CASE WHEN tok >= 40 THEN 1 ELSE 0 END AS r1, " +
        "CASE WHEN n_chars >= 280 THEN 1 ELSE 0 END AS r2 FROM base), " +
        "m AS (SELECT count(*) AS n, " +
        "COALESCE(sum(CAST(r0 + r1 + r2 AS HUGEINT)), 0) AS t, " +
        "COALESCE(sum(CAST(r0 + r1 + r2 AS HUGEINT) * CAST(r0 + r1 + r2 AS HUGEINT)), 0) AS u2, " +
        "COALESCE(sum(CAST(r0 AS HUGEINT)), 0) AS c0, " +
        "COALESCE(sum(CAST(r1 AS HUGEINT)), 0) AS c1, " +
        "COALESCE(sum(CAST(r2 AS HUGEINT)), 0) AS c2 FROM d) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(3 AS BIGINT) AS k_rules, " +
        "CASE WHEN 3 * t <> u2 THEN " +
        "floor(2.0 * CAST(3 * (c0 * c0 + c1 * c1 + c2 * c2) - t * t AS DOUBLE) / " +
        "CAST(3 * t - u2 AS DOUBLE) * 10000 + 0.5) / 10000 END AS q_stat " +
        "FROM m"),

    "q234_kruskal_wallis" ->
      // q221's midrank spelling per pooled value, per-group HUGEINT
      // doubled rank sums, the ORDER BY g fold, the same H and
      // tie-correction chains
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DOUBLE) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "pgv AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v), " +
        "pv AS (SELECT v, sum(c) AS cv FROM pgv GROUP BY v), " +
        "m2 AS (SELECT v, 2 * (sum(cv) OVER (ORDER BY v) - cv) + cv + 1 AS m2, " +
        "CAST(cv AS HUGEINT) * CAST(cv AS HUGEINT) * CAST(cv AS HUGEINT) - CAST(cv AS HUGEINT) AS t3 FROM pv), " +
        "tt AS (SELECT COALESCE(sum(t3), 0) AS tt FROM m2), " +
        "pg AS (SELECT g, sum(c) AS ng, " +
        "sum(CAST(c AS HUGEINT) * CAST(m2 AS HUGEINT)) AS r2 " +
        "FROM pgv JOIN m2 USING (v) GROUP BY g), " +
        "one AS (SELECT list(struct_pack(ng := ng, r2 := r2) ORDER BY g) AS gs, " +
        "sum(ng) AS n, count(*) AS k FROM pg), " +
        "f AS (SELECT n, k, tt, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).r2 AS DOUBLE) * CAST((e).r2 AS DOUBLE) / 4 / CAST((e).ng AS DOUBLE))), (a, b) -> a + b) AS fold " +
        "FROM one, tt), " +
        "g2 AS (SELECT n, k, " +
        "12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)) * fold - 3 * (CAST(n AS DOUBLE) + 1) AS h, " +
        "1.0 - CAST(tt AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS corr " +
        "FROM f) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups, " +
        "CASE WHEN k > 1 THEN floor(h * 10000 + 0.5) / 10000 END AS h, " +
        "CASE WHEN k > 1 AND corr > 0 THEN floor(h / corr * 10000 + 0.5) / 10000 END AS h_adj " +
        "FROM g2"),

    "q232_fdr_screen" ->
      // the per-group KS spine (groups x pooled values, per-group window
      // cumsum, HUGEINT cross-masses vs the complement), q220's display
      // chains, then the BH step-up as portable window SQL: row_number
      // for the 1-based rank and a suffix-min window for the step-up
      // (dynamic list slicing is version-sensitive across DuckDBs —
      // the r15 driver-red diagnosis; OraclePortabilitySpec pins this)
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DOUBLE) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "pgv AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v), " +
        "pv AS (SELECT v, sum(c) AS cv FROM pgv GROUP BY v), " +
        "gr AS (SELECT g, sum(c) AS ng FROM pgv GROUP BY g), " +
        "t AS (SELECT sum(cv) AS n FROM pv), " +
        "ca AS (SELECT v, sum(cv) OVER (ORDER BY v) AS cumall FROM pv), " +
        "sp AS (SELECT gr.g, gr.ng, ca.v, ca.cumall FROM gr, ca), " +
        "jj AS (SELECT sp.g, sp.ng, sp.v, sp.cumall, COALESCE(pgv.c, 0) AS c " +
        "FROM sp LEFT JOIN pgv ON pgv.g = sp.g AND pgv.v = sp.v), " +
        "w AS (SELECT g, ng, cumall, " +
        "sum(c) OVER (PARTITION BY g ORDER BY v) AS cumg FROM jj), " +
        "dd AS (SELECT g, max(ng) AS ng, " +
        "max(abs(CAST(cumg AS HUGEINT) * (CAST(n AS HUGEINT) - CAST(ng AS HUGEINT)) - " +
        "(CAST(cumall AS HUGEINT) - CAST(cumg AS HUGEINT)) * CAST(ng AS HUGEINT))) AS dnum " +
        "FROM w, t GROUP BY g), " +
        "ks AS (SELECT g, ng, CAST(n AS BIGINT) - ng AS nrest, dnum FROM dd, t), " +
        "kr AS (SELECT g, ng, nrest, " +
        "floor(CAST(dnum AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE)) * 10000 + 0.5) / 10000 AS ks_d, " +
        "floor(least(1.0, 2.0 * exp(-2.0 * " +
        "(sqrt(CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE) / (CAST(ng AS DOUBLE) + CAST(nrest AS DOUBLE))) * " +
        "(CAST(dnum AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE)))) * " +
        "(sqrt(CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE) / (CAST(ng AS DOUBLE) + CAST(nrest AS DOUBLE))) * " +
        "(CAST(dnum AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS p " +
        "FROM ks), " +
        "rk AS (SELECT g, p, row_number() OVER (ORDER BY p, g) AS j, " +
        "count(*) OVER () AS m FROM kr), " +
        "wsr AS (SELECT g, p, j, " +
        "p * CAST(m AS DOUBLE) / CAST(j AS DOUBLE) AS w FROM rk), " +
        "bh AS (SELECT g AS test_key, p AS p_value, CAST(j AS BIGINT) AS p_rank, " +
        "floor(least(1.0, min(w) OVER (ORDER BY j DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000 + 0.5) / 10000 AS p_adj " +
        "FROM wsr) " +
        "SELECT bh.test_key, CAST(kr.ng AS BIGINT) AS n_g, " +
        "CAST(floor(kr.ks_d * 10000 + 0.5) AS BIGINT) AS ks_d_bp, " +
        "CAST(floor(bh.p_value * 10000 + 0.5) AS BIGINT) AS p_bp, " +
        "bh.p_rank, " +
        "CAST(floor(bh.p_adj * 10000 + 0.5) AS BIGINT) AS p_adj_bp, " +
        "(CAST(floor(bh.p_adj * 10000 + 0.5) AS BIGINT) <= 1000) AS reject " +
        "FROM bh JOIN kr ON kr.g = bh.test_key"),

    "q238_cvm_test" ->
      // q220's per-value masses and inclusive cumulative sums, the same
      // HUGEINT cross-mass numerator per value class, the per-class
      // floor(term*2^30) quantization (order-free integer sum), and the
      // final T chain spelled left-associated exactly as Spark's
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "c AS (SELECT ca, cb, sum(ca) OVER (ORDER BY v) AS cuma, " +
        "sum(cb) OVER (ORDER BY v) AS cumb FROM pv), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pv), " +
        "q AS (SELECT CAST(floor(CAST(ca + cb AS DOUBLE) * " +
        "(CAST(abs(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT) - " +
        "CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT)) AS DOUBLE) / " +
        "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) * " +
        "(CAST(abs(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT) - " +
        "CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT)) AS DOUBLE) / " +
        "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) * 1073741824) AS BIGINT) AS qq " +
        "FROM c, t), " +
        "f AS (SELECT COALESCE(sum(qq), 0) AS s2 FROM q) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor(CAST(s2 AS DOUBLE) / 1073741824 * " +
        "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) / " +
        "(CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)) * 10000 + 0.5) AS BIGINT) " +
        "END AS t_bp FROM f, t"),

    "q239_ad_ksample" ->
      // q232's per-group spine (groups x pooled values, per-group window
      // cumsum) with the Scholz-Stephens doubled-midrank integer cores
      // inum/iden in HUGEINT and the per-cell floor(term*2^30)
      // quantization, left-associated exactly as Spark's float sequence
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DOUBLE) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "pgv AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v), " +
        "pv AS (SELECT v, sum(c) AS cv FROM pgv GROUP BY v), " +
        "gr AS (SELECT g, sum(c) AS ng FROM pgv GROUP BY g), " +
        "t AS (SELECT sum(cv) AS n, count(*) AS m FROM pv), " +
        "kt AS (SELECT count(*) AS k FROM gr), " +
        "ca AS (SELECT v, cv, sum(cv) OVER (ORDER BY v) AS cumall FROM pv), " +
        "sp AS (SELECT gr.g, gr.ng, ca.v, ca.cv, ca.cumall FROM gr, ca), " +
        "jj AS (SELECT sp.g, sp.ng, sp.v, sp.cv, sp.cumall, COALESCE(pgv.c, 0) AS c " +
        "FROM sp LEFT JOIN pgv ON pgv.g = sp.g AND pgv.v = sp.v), " +
        "w AS (SELECT g, ng, v, cv, cumall, c, " +
        "sum(c) OVER (PARTITION BY g ORDER BY v) AS cumg FROM jj), " +
        "x AS (SELECT cv, ng, " +
        "CAST(n AS HUGEINT) * (2 * CAST(cumg AS HUGEINT) - CAST(c AS HUGEINT)) - " +
        "CAST(ng AS HUGEINT) * (2 * CAST(cumall AS HUGEINT) - CAST(cv AS HUGEINT)) AS inum, " +
        "(2 * CAST(cumall AS HUGEINT) - CAST(cv AS HUGEINT)) * " +
        "(2 * CAST(n AS HUGEINT) - (2 * CAST(cumall AS HUGEINT) - CAST(cv AS HUGEINT))) - " +
        "CAST(n AS HUGEINT) * CAST(cv AS HUGEINT) AS iden, n FROM w, t), " +
        "q AS (SELECT CASE WHEN iden > 0 THEN " +
        "CAST(floor(CAST(inum AS DOUBLE) * CAST(inum AS DOUBLE) / CAST(iden AS DOUBLE) * " +
        "(CAST(cv AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(ng AS DOUBLE) * 1073741824) AS BIGINT) " +
        "END AS qq FROM x), " +
        "f AS (SELECT COALESCE(sum(qq), 0) AS s2 FROM q) " +
        "SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n, " +
        "CASE WHEN m > 1 THEN " +
        "CAST(floor(CAST(s2 AS DOUBLE) / 1073741824 * " +
        "(CAST(n - 1 AS DOUBLE) / CAST(n AS DOUBLE)) * 10000 + 0.5) AS BIGINT) " +
        "END AS a2_bp FROM f, t, kt"),

    "q297_scale_card" ->
      // the three standalone chains (q230's quantile_cont + doubled-
      // deviation ANOVA, q256's n>=2 ln folds, q295's weighted folds)
      // off ONE shared v CTE, cross-joined as one-row CTEs — names
      // matching the card's columns
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "med AS (SELECT g, CAST(quantile_cont(tok, 0.5) * 2 AS BIGINT) AS m2 FROM v GROUP BY g), " +
        "dd AS (SELECT v.g AS g, abs(2 * tok - m2) AS u FROM v JOIN med ON v.g = med.g), " +
        "bgrp AS (SELECT g, count(*) AS n, sum(CAST(u AS HUGEINT)) AS s, " +
        "sum(CAST(u AS HUGEINT) * CAST(u AS HUGEINT)) AS q FROM dd GROUP BY g), " +
        "bone AS (SELECT list(struct_pack(n := n, s := s) ORDER BY g) AS gs, " +
        "sum(n) AS n, count(*) AS k, sum(s) AS st, sum(q) AS qt FROM bgrp), " +
        "bff AS (SELECT n, k, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE) / CAST((e).n AS DOUBLE))), (a, b) -> a + b) - " +
        "CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS ssb, " +
        "CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS sst " +
        "FROM bone), " +
        "bfr AS (SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups, " +
        "CASE WHEN k > 1 AND n > k AND sst - ssb > 0 THEN " +
        "floor(ssb / (CAST(k AS DOUBLE) - 1) / ((sst - ssb) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) * 10000 + 0.5) / 10000 END AS bf_w, " +
        "CASE WHEN sst > 0 THEN CAST(floor(ssb / sst * 10000 + 0.5) AS BIGINT) END AS bf_eta2_bp " +
        "FROM bff), " +
        "pg AS (SELECT g, count(*) AS n, sum(CAST(tok AS HUGEINT)) AS s1, " +
        "sum(CAST(tok AS HUGEINT) * CAST(tok AS HUGEINT)) AS s2 FROM v GROUP BY g), " +
        "pc AS (SELECT g, n, CAST(n AS HUGEINT) * s2 - s1 * s1 AS c2 " +
        "FROM pg WHERE n >= 2), " +
        "btone AS (SELECT list(struct_pack(g := g, n := n, c2 := c2) ORDER BY g) AS gs, " +
        "sum(n) AS n, count(*) AS k FROM pc), " +
        "btf AS (SELECT n, k, CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).c2 AS DOUBLE) / CAST((e).n AS DOUBLE))), (a, b) -> a + b) AS pooled, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "(CAST((e).n AS DOUBLE) - 1) * ln(CAST((e).c2 AS DOUBLE) / " +
        "(CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1))))), (a, b) -> a + b) AS lnsum, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "1.0 / (CAST((e).n AS DOUBLE) - 1))), (a, b) -> a + b) AS invsum, " +
        "list_min(list_transform(gs, e -> (e).c2)) AS minc2 FROM btone), " +
        "btr AS (SELECT " +
        "CASE WHEN k > 1 THEN CAST(k - 1 AS BIGINT) END AS bart_df_t, " +
        "CASE WHEN k > 1 AND minc2 > 0 THEN " +
        "CAST(floor(((nd - kd) * ln(pooled / (nd - kd)) - lnsum) / " +
        "(1.0 + (invsum - 1.0 / (nd - kd)) / (3.0 * (kd - 1))) * 10000 + 0.5) AS BIGINT) " +
        "END AS bart_t_bp FROM btf), " +
        "wone AS (SELECT list(struct_pack(n := n, s := s1, q := s2) ORDER BY g) AS gs, " +
        "count(*) AS k FROM pg), " +
        "wf1 AS (SELECT k, gs, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).n AS DOUBLE) / ((CAST((e).n AS DOUBLE) * CAST((e).q AS DOUBLE) - CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE)) / (CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1))))), (a, b) -> a + b) AS wsum, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).n AS DOUBLE) / ((CAST((e).n AS DOUBLE) * CAST((e).q AS DOUBLE) - CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE)) / (CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1))) * (CAST((e).s AS DOUBLE) / CAST((e).n AS DOUBLE)))), (a, b) -> a + b) AS wmsum, " +
        "list_min(list_transform(gs, e -> (e).n)) AS minn, " +
        "list_min(list_transform(gs, e -> (CAST((e).n AS DOUBLE) * CAST((e).q AS DOUBLE) - CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE)) / (CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1)))) AS mins2 " +
        "FROM wone), " +
        "wf2 AS (SELECT k, minn, mins2, wsum, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).n AS DOUBLE) / ((CAST((e).n AS DOUBLE) * CAST((e).q AS DOUBLE) - CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE)) / (CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1))) * (CAST((e).s AS DOUBLE) / CAST((e).n AS DOUBLE) - wmsum / wsum) * (CAST((e).s AS DOUBLE) / CAST((e).n AS DOUBLE) - wmsum / wsum))), (a, b) -> a + b) / (CAST(k AS DOUBLE) - 1) AS num, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "(1.0 - CAST((e).n AS DOUBLE) / ((CAST((e).n AS DOUBLE) * CAST((e).q AS DOUBLE) - CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE)) / (CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1))) / wsum) * " +
        "(1.0 - CAST((e).n AS DOUBLE) / ((CAST((e).n AS DOUBLE) * CAST((e).q AS DOUBLE) - CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE)) / (CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1))) / wsum) / (CAST((e).n AS DOUBLE) - 1))), (a, b) -> a + b) AS lam " +
        "FROM wf1), " +
        "wr AS (SELECT " +
        "CASE WHEN k > 1 AND minn > 1 AND mins2 > 0 AND lam > 0 THEN " +
        "floor(num / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2) / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1) * lam) * 10000 + 0.5) / 10000 END AS w_star, " +
        "CASE WHEN k > 1 AND minn > 1 AND mins2 > 0 AND lam > 0 THEN " +
        "CAST(floor((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1) / (3.0 * lam) * 10000 + 0.5) AS BIGINT) END AS df2_bp " +
        "FROM wf2) " +
        "SELECT bfr.n, bfr.k_groups, bfr.bf_w, bfr.bf_eta2_bp, " +
        "btr.bart_df_t, btr.bart_t_bp, wr.w_star, wr.df2_bp " +
        "FROM bfr, btr, wr"),

    "q295_welch_anova" ->
      // q229's per-group exact integer moments; the four cross-group
      // sums fold in ORDER BY g (the engine's sorted-group association);
      // every per-group double (mean, variance, weight) one spelled chain
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS x " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "grp AS (SELECT g, count(*) AS n, sum(CAST(x AS HUGEINT)) AS s, " +
        "sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS q FROM v GROUP BY g), " +
        "one AS (SELECT list(struct_pack(n := n, s := s, q := q) ORDER BY g) AS gs, " +
        "sum(n) AS n, count(*) AS k FROM grp), " +
        "f1 AS (SELECT n, k, gs, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).n AS DOUBLE) / ((CAST((e).n AS DOUBLE) * CAST((e).q AS DOUBLE) - CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE)) / (CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1))))), (a, b) -> a + b) AS wsum, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).n AS DOUBLE) / ((CAST((e).n AS DOUBLE) * CAST((e).q AS DOUBLE) - CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE)) / (CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1))) * (CAST((e).s AS DOUBLE) / CAST((e).n AS DOUBLE)))), (a, b) -> a + b) AS wmsum, " +
        "list_min(list_transform(gs, e -> (e).n)) AS minn, " +
        "list_min(list_transform(gs, e -> (CAST((e).n AS DOUBLE) * CAST((e).q AS DOUBLE) - CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE)) / (CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1)))) AS mins2 " +
        "FROM one), " +
        "f2 AS (SELECT n, k, minn, mins2, wsum, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).n AS DOUBLE) / ((CAST((e).n AS DOUBLE) * CAST((e).q AS DOUBLE) - CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE)) / (CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1))) * (CAST((e).s AS DOUBLE) / CAST((e).n AS DOUBLE) - wmsum / wsum) * (CAST((e).s AS DOUBLE) / CAST((e).n AS DOUBLE) - wmsum / wsum))), (a, b) -> a + b) / (CAST(k AS DOUBLE) - 1) AS num, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "(1.0 - CAST((e).n AS DOUBLE) / ((CAST((e).n AS DOUBLE) * CAST((e).q AS DOUBLE) - CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE)) / (CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1))) / wsum) * " +
        "(1.0 - CAST((e).n AS DOUBLE) / ((CAST((e).n AS DOUBLE) * CAST((e).q AS DOUBLE) - CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE)) / (CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1))) / wsum) / (CAST((e).n AS DOUBLE) - 1))), (a, b) -> a + b) AS lam " +
        "FROM f1) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups, " +
        "CASE WHEN k > 1 AND minn > 1 AND mins2 > 0 AND lam > 0 THEN " +
        "floor(num / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2) / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1) * lam) * 10000 + 0.5) / 10000 END AS w_star, " +
        "CASE WHEN k > 1 AND minn > 1 AND mins2 > 0 AND lam > 0 THEN " +
        "CAST(floor((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1) / (3.0 * lam) * 10000 + 0.5) AS BIGINT) END AS df2_bp " +
        "FROM f2"),

    "q296_quade" ->
      // q250's band CTEs and doubled within-block midranks; the doubled
      // range midrank 2Q = 2*mass-below + tied + 1 from the range
      // histogram window; the one-division W chain spelled as Spark's
      ("WITH base AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS den, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok, " +
        "n_chars FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL), " +
        "r AS (SELECT " +
        "CASE WHEN num * 10 < den THEN 0 WHEN num * 5 < den THEN 1 ELSE 2 END AS r0, " +
        "CASE WHEN tok < 40 THEN 0 WHEN tok < 70 THEN 1 ELSE 2 END AS r1, " +
        "CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 380 THEN 1 ELSE 2 END AS r2 FROM base), " +
        "rk AS (SELECT " +
        "2 * (CASE WHEN r1 < r0 THEN 1 ELSE 0 END + CASE WHEN r2 < r0 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN r1 = r0 THEN 1 ELSE 0 END + CASE WHEN r2 = r0 THEN 1 ELSE 0 END) + 2 AS d0, " +
        "2 * (CASE WHEN r0 < r1 THEN 1 ELSE 0 END + CASE WHEN r2 < r1 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN r0 = r1 THEN 1 ELSE 0 END + CASE WHEN r2 = r1 THEN 1 ELSE 0 END) + 2 AS d1, " +
        "2 * (CASE WHEN r0 < r2 THEN 1 ELSE 0 END + CASE WHEN r1 < r2 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN r0 = r2 THEN 1 ELSE 0 END + CASE WHEN r1 = r2 THEN 1 ELSE 0 END) + 2 AS d2, " +
        "greatest(r0, r1, r2) - least(r0, r1, r2) AS rng FROM r), " +
        "hist AS (SELECT rng, count(*) AS hc FROM rk GROUP BY rng), " +
        "pre AS (SELECT rng, 2 * (sum(hc) OVER (ORDER BY rng " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - hc) + hc + 1 AS q2 FROM hist), " +
        "sc AS (SELECT q2, d0, d1, d2 FROM rk JOIN pre ON rk.rng = pre.rng), " +
        "a AS (SELECT count(*) AS b, " +
        "COALESCE(sum(CAST(q2 AS HUGEINT) * (CAST(d0 AS HUGEINT) - 4)), 0) AS t0, " +
        "COALESCE(sum(CAST(q2 AS HUGEINT) * (CAST(d1 AS HUGEINT) - 4)), 0) AS t1, " +
        "COALESCE(sum(CAST(q2 AS HUGEINT) * (CAST(d2 AS HUGEINT) - 4)), 0) AS t2, " +
        "COALESCE(sum(CAST(q2 AS HUGEINT) * (CAST(d0 AS HUGEINT) - 4) * CAST(q2 AS HUGEINT) * (CAST(d0 AS HUGEINT) - 4) + " +
        "CAST(q2 AS HUGEINT) * (CAST(d1 AS HUGEINT) - 4) * CAST(q2 AS HUGEINT) * (CAST(d1 AS HUGEINT) - 4) + " +
        "CAST(q2 AS HUGEINT) * (CAST(d2 AS HUGEINT) - 4) * CAST(q2 AS HUGEINT) * (CAST(d2 AS HUGEINT) - 4)), 0) AS sa FROM sc), " +
        "f AS (SELECT b, t0 * t0 + t1 * t1 + t2 * t2 AS sb, sa, " +
        "CAST(b AS HUGEINT) AS bh FROM a), " +
        "g AS (SELECT b, sb, bh * sa - sb AS deni FROM f) " +
        "SELECT CAST(b AS BIGINT) AS b, CAST(3 AS BIGINT) AS k, " +
        "CASE WHEN b > 1 AND deni > 0 THEN " +
        "floor((CAST(b AS DOUBLE) - 1) * CAST(sb AS DOUBLE) / CAST(deni AS DOUBLE) * 10000 + 0.5) / 10000 END AS w " +
        "FROM g"),

    "q294_kgroup_card" ->
      // ONE (group, value) cell agg; the ANOVA moments (q229's chains),
      // the pooled doubled midranks (q234's), and the pooled-median
      // split with grain chi2 (q279's) are all bounded derivations —
      // each display chain verbatim from its standalone oracle
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "pgv AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v), " +
        "pv AS (SELECT v, sum(c) AS cv FROM pgv GROUP BY v), " +
        "m2 AS (SELECT v, cv, sum(cv) OVER (ORDER BY v) - cv AS pfx, " +
        "2 * (sum(cv) OVER (ORDER BY v) - cv) + cv + 1 AS m2, " +
        "CAST(cv AS HUGEINT) * CAST(cv AS HUGEINT) * CAST(cv AS HUGEINT) - CAST(cv AS HUGEINT) AS t3 FROM pv), " +
        "tt AS (SELECT COALESCE(sum(t3), 0) AS tt FROM m2), " +
        "t AS (SELECT sum(cv) AS n FROM pv), " +
        "md AS (SELECT min(v) AS m FROM m2, t WHERE (pfx + cv) * 2 >= n), " +
        "pg AS (SELECT g, sum(c) AS ng, " +
        "sum(CAST(c AS HUGEINT) * CAST(pgv.v AS HUGEINT)) AS s, " +
        "sum(CAST(c AS HUGEINT) * CAST(pgv.v AS HUGEINT) * CAST(pgv.v AS HUGEINT)) AS q, " +
        "sum(CAST(c AS HUGEINT) * CAST(m2.m2 AS HUGEINT)) AS r2, " +
        "sum(CASE WHEN pgv.v > m THEN c ELSE 0 END) AS hi " +
        "FROM pgv JOIN m2 ON pgv.v = m2.v CROSS JOIN md GROUP BY g), " +
        "one AS (SELECT list(struct_pack(g := g, ng := ng, s := s, r2 := r2, hi := hi) ORDER BY g) AS gs, " +
        "sum(ng) AS n, count(*) AS k, sum(s) AS st, sum(q) AS qt, " +
        "COALESCE(sum(hi), 0) AS ta FROM pg), " +
        "fa AS (SELECT n, k, ta, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE) / CAST((e).ng AS DOUBLE))), (a, b) -> a + b) - " +
        "CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS ssb, " +
        "CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS sst, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).r2 AS DOUBLE) * CAST((e).r2 AS DOUBLE) / 4 / CAST((e).ng AS DOUBLE))), (a, b) -> a + b) AS fold " +
        "FROM one), " +
        "fk AS (SELECT *, " +
        "12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)) * fold - 3 * (CAST(n AS DOUBLE) + 1) AS h, " +
        "1.0 - CAST(tt AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) AS corr " +
        "FROM fa, tt), " +
        "mq AS (SELECT COALESCE(sum(CASE WHEN ta > 0 AND ta < n THEN " +
        "CAST(floor(((CAST(hi AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(hi AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(n AS DOUBLE)) / " +
        "(CAST(ng AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(n AS DOUBLE)) + " +
        "((CAST(ng AS DOUBLE) - CAST(hi AS DOUBLE)) - CAST(ng AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(ta AS DOUBLE)) / CAST(n AS DOUBLE)) * " +
        "((CAST(ng AS DOUBLE) - CAST(hi AS DOUBLE)) - CAST(ng AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(ta AS DOUBLE)) / CAST(n AS DOUBLE)) / " +
        "(CAST(ng AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(ta AS DOUBLE)) / CAST(n AS DOUBLE))) * 1073741824) AS BIGINT) " +
        "ELSE 0 END), 0) AS q2 FROM pg, one) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups, " +
        "CASE WHEN k > 1 AND n > k AND sst - ssb > 0 THEN " +
        "floor(ssb / (CAST(k AS DOUBLE) - 1) / ((sst - ssb) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) * 10000 + 0.5) / 10000 END AS f, " +
        "CASE WHEN sst > 0 THEN CAST(floor(ssb / sst * 10000 + 0.5) AS BIGINT) END AS eta2_bp, " +
        "CASE WHEN k > 1 THEN floor(h * 10000 + 0.5) / 10000 END AS h, " +
        "CASE WHEN k > 1 AND corr > 0 THEN floor(h / corr * 10000 + 0.5) / 10000 END AS h_adj, " +
        "m AS median_v, " +
        "CASE WHEN k > 1 AND ta > 0 AND ta < n THEN " +
        "CAST(floor(CAST(q2 AS DOUBLE) / 1073741824 * 10000 + 0.5) AS BIGINT) END AS chi2_bp, " +
        "CASE WHEN k > 1 AND ta > 0 AND ta < n THEN CAST(k - 1 AS BIGINT) END AS dof " +
        "FROM fk, mq, md"),

    "q293_two_sample_card" ->
      // ONE shared spine (per-value masses + exclusive window prefixes +
      // the signed HUGEINT gap), a single 14-moment aggregate, then each
      // leg's display chain spelled exactly as its standalone oracle
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "c AS (SELECT ca, cb, sum(ca) OVER (ORDER BY v) - ca AS xa, " +
        "sum(cb) OVER (ORDER BY v) - cb AS xb FROM pv), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pv), " +
        "sc AS (SELECT ca, cb, xa, xb, ca + cb AS cv, " +
        "2 * xa + 2 * xb + ca + cb + 1 AS m2, " +
        "least(2 * xa + 2 * xb + ca + cb + 1, " +
        "2 * (na + nb + 1) - (2 * xa + 2 * xb + ca + cb + 1)) AS s2, " +
        "CAST(xa + ca AS HUGEINT) * CAST(nb AS HUGEINT) - " +
        "CAST(xb + cb AS HUGEINT) * CAST(na AS HUGEINT) AS g FROM c, t), " +
        "m AS (SELECT " +
        "COALESCE(max(abs(g)), 0) AS dnum, " +
        "greatest(COALESCE(max(g), 0), 0) AS dp, " +
        "greatest(COALESCE(max(-g), 0), 0) AS dm, " +
        "COALESCE(sum(CAST(cv AS HUGEINT) * g), 0) AS w1, " +
        "COALESCE(sum(CAST(cv AS HUGEINT) * g * g), 0) AS w2, " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * m2), 0) AS ra2, " +
        "COALESCE(sum(CAST(cb AS HUGEINT) * m2), 0) AS rb2, " +
        "COALESCE(sum(CAST(cb AS HUGEINT) * m2 * m2), 0) AS rbm4, " +
        "COALESCE(sum(CAST(cv AS HUGEINT) * CAST(cv AS HUGEINT) * CAST(cv AS HUGEINT) - CAST(cv AS HUGEINT)), 0) AS t3, " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * (2 * CAST(xb AS HUGEINT) + cb)), 0) AS sa1, " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * (2 * CAST(xb AS HUGEINT) + cb) * (2 * CAST(xb AS HUGEINT) + cb)), 0) AS sa2, " +
        "COALESCE(sum(CAST(cb AS HUGEINT) * (2 * CAST(xa AS HUGEINT) + ca)), 0) AS sb1, " +
        "COALESCE(sum(CAST(cb AS HUGEINT) * (2 * CAST(xa AS HUGEINT) + ca) * (2 * CAST(xa AS HUGEINT) + ca)), 0) AS sb2, " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * s2), 0) AS t2a, " +
        "COALESCE(sum(CAST(cv AS HUGEINT) * s2), 0) AS sc1, " +
        "COALESCE(sum(CAST(cv AS HUGEINT) * s2 * s2), 0) AS sc2 FROM sc), " +
        "f AS (SELECT na, nb, CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd, " +
        "CAST(na + nb AS DOUBLE) AS nd, CAST(na + nb AS DOUBLE) + 1.0 AS np1, " +
        "CAST(dnum AS DOUBLE) AS dnumd, dp, dm, " +
        "CAST(w1 AS DOUBLE) AS w1d, CAST(w2 AS DOUBLE) AS w2d, " +
        "CAST(ra2 AS DOUBLE) AS ra2d, CAST(rb2 AS DOUBLE) AS rb2d, " +
        "CAST(rbm4 AS DOUBLE) AS rbm4d, CAST(t3 AS DOUBLE) AS t3d, " +
        "CAST(sa1 AS DOUBLE) AS sa1d, CAST(sa2 AS DOUBLE) AS sa2d, " +
        "CAST(sb1 AS DOUBLE) AS sb1d, CAST(sb2 AS DOUBLE) AS sb2d, " +
        "CAST(ra2 - CAST(na AS HUGEINT) * (CAST(na AS HUGEINT) + 1) AS DOUBLE) AS u2d, " +
        "CAST(t2a AS DOUBLE) AS t2ad, CAST(sc1 AS DOUBLE) AS sc1d, " +
        "CAST(sc2 AS DOUBLE) AS sc2d FROM m, t), " +
        "g1 AS (SELECT *, dnumd / (nad * nbd) AS ksd, " +
        "nad * nbd / 12 * ((nd + 1) - t3d / (nd * (nd - 1))) AS sigma2, " +
        "u2d / 2 AS ud, " +
        "ra2d / nad - (nad + 1.0) AS ka, rb2d / nbd - (nbd + 1.0) AS kb, " +
        "rbm4d / 4.0 AS sr2, " +
        "(4.0 * np1 * np1 * nbd - 4.0 * np1 * rb2d + rbm4d) / 4.0 AS sq2, " +
        "sqrt(nad * nbd * np1 * (2.0 * nd + 1) * (8.0 * nd + 11) / 5.0) AS cden, " +
        "2.0 * (nd * nd - 4) / ((2.0 * nd + 1) * (8.0 * nd + 11)) - 1.0 AS rho, " +
        "nad * sc1d / nd AS e2, " +
        "nad * nbd * (nd * sc2d - sc1d * sc1d) / (nd * nd * (nd - 1.0)) AS vart, " +
        "ra2d - nad * (nad + 1.0) AS lpu2, " +
        "nad * nbd / 12.0 * ((nd + 1.0) - t3d / (nd * (nd - 1.0))) AS varu FROM f), " +
        "g2 AS (SELECT *, sqrt(nad * nbd / (nad + nbd)) * ksd AS lambda, " +
        "(sa2d - 2.0 * ka * sa1d + nad * ka * ka) / 4.0 / (nad - 1.0) AS va, " +
        "(sb2d - 2.0 * kb * sb1d + nbd * kb * kb) / 4.0 / (nbd - 1.0) AS vb, " +
        "(6.0 * sr2 - nbd * np1 * (2.0 * nd + 1)) / cden AS cu, " +
        "(6.0 * sq2 - nbd * np1 * (2.0 * nd + 1)) / cden AS cvv, " +
        "(t2ad - e2) / sqrt(vart) AS abz, " +
        "(lpu2 - nad * nbd) / (2.0 * sqrt(varu)) AS zw FROM g1), " +
        "g3 AS (SELECT *, nad * va + nbd * vb AS pooled, " +
        "(cu * cu + cvv * cvv - 2.0 * rho * cu * cvv) / " +
        "(2.0 * (1.0 - rho * rho)) AS cst, " +
        "zw * zw + abz * abz AS l FROM g2) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor(ksd * 10000 + 0.5) AS BIGINT) END AS ks_d_bp, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor(least(1.0, 2.0 * exp(-2.0 * lambda * lambda)) * 10000 + 0.5) AS BIGINT) END AS ks_p_bp, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor(CAST(dp + dm AS DOUBLE) / (nad * nbd) * 10000 + 0.5) AS BIGINT) END AS kuiper_v_bp, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor((nd * w2d - w1d * w1d) / (nd * nd * nd * nad * nbd) * 10000 + 0.5) AS BIGINT) END AS watson_u2_bp, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor(w2d / (nd * nd * nad * nbd) * 10000 + 0.5) AS BIGINT) END AS cvm_t_bp, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor(ud / (nad * nbd) * 10000 + 0.5) AS BIGINT) END AS auc_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND sigma2 > 0 THEN " +
        "CAST(floor((ud - nad * nbd / 2) / sqrt(sigma2) * 10000 + 0.5) AS BIGINT) END AS mwu_z_bp, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor((rb2d / nbd - nbd - 1.0) / (2.0 * nad) * 10000 + 0.5) AS BIGINT) END AS bm_p_hat_bp, " +
        "CASE WHEN na >= 2 AND nb >= 2 AND pooled > 0 THEN " +
        "CAST(floor(nad * nbd * (rb2d / (2.0 * nbd) - ra2d / (2.0 * nad)) / " +
        "(nad + nbd) / sqrt(pooled) * 10000 + 0.5) AS BIGINT) END AS bm_w_bp, " +
        "CASE WHEN na >= 2 AND nb >= 2 AND pooled > 0 THEN " +
        "CAST(floor(pooled * pooled / ((nad * va) * (nad * va) / (nad - 1.0) + " +
        "(nbd * vb) * (nbd * vb) / (nbd - 1.0)) * 10000 + 0.5) AS BIGINT) END AS bm_df_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND (1.0 - rho * rho) > 0 THEN " +
        "CAST(floor(cst * 10000 + 0.5) AS BIGINT) END AS cucconi_c_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND (1.0 - rho * rho) > 0 THEN " +
        "CAST(floor(exp(-cst) * 10000 + 0.5) AS BIGINT) END AS cucconi_p_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND na + nb > 1 AND vart > 0 THEN " +
        "CAST(floor(abz * 10000 + 0.5) AS BIGINT) END AS ab_z_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND na + nb > 1 AND varu > 0 AND vart > 0 THEN " +
        "CAST(floor(l * 10000 + 0.5) AS BIGINT) END AS lepage_l_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND na + nb > 1 AND varu > 0 AND vart > 0 THEN " +
        "CAST(floor(exp(-(l / 2)) * 10000 + 0.5) AS BIGINT) END AS lepage_p_bp " +
        "FROM g3"),

    "q291_watson_u2" ->
      // q220's spine; signed integer gap numerators clear the whole
      // statistic to TWO HUGEINT moments, U^2 = (n*W2 - W1^2)/(n^3*na*nb)
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "c AS (SELECT ca, cb, sum(ca) OVER (ORDER BY v) AS cuma, " +
        "sum(cb) OVER (ORDER BY v) AS cumb FROM pv), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pv), " +
        "m AS (SELECT " +
        "COALESCE(sum(CAST(ca + cb AS HUGEINT) * " +
        "(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT) - CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT))), 0) AS w1, " +
        "COALESCE(sum(CAST(ca + cb AS HUGEINT) * " +
        "(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT) - CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT)) * " +
        "(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT) - CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT))), 0) AS w2 " +
        "FROM c, t), " +
        "f AS (SELECT na, nb, CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd, " +
        "CAST(na + nb AS DOUBLE) AS nd, CAST(w1 AS DOUBLE) AS w1d, " +
        "CAST(w2 AS DOUBLE) AS w2d FROM m, t) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor((nd * w2d - w1d * w1d) / (nd * nd * nd * nad * nbd) * 10000 + 0.5) AS BIGINT) " +
        "END AS u2_bp FROM f"),

    "q292_grubbs" ->
      // one conditional aggregate: scaled deviations and the variance
      // core c2 = n*S2 - S1^2 exact HUGEINT, the G chains spelled as
      // Spark's
      ("WITH v AS (SELECT CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS x " +
        "FROM documents WHERE text IS NOT NULL), " +
        "m AS (SELECT count(*) AS n, " +
        "COALESCE(sum(CAST(x AS HUGEINT)), 0) AS s1, " +
        "COALESCE(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)), 0) AS s2, " +
        "min(x) AS mn, max(x) AS mx FROM v), " +
        "f AS (SELECT n, mn, mx, CAST(n AS DOUBLE) AS nd, " +
        "CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d FROM m), " +
        "g AS (SELECT *, nd * s2d - s1d * s1d AS c2 FROM f), " +
        "h AS (SELECT *, sqrt(c2 / (nd * (nd - 1.0))) AS s FROM g), " +
        "k AS (SELECT *, (nd * CAST(mx AS DOUBLE) - s1d) / nd / s AS gmax, " +
        "(s1d - nd * CAST(mn AS DOUBLE)) / nd / s AS gmin FROM h) " +
        "SELECT CAST(n AS BIGINT) AS n, mn AS min_v, mx AS max_v, " +
        "CASE WHEN n >= 3 AND c2 > 0 THEN " +
        "CAST(floor(gmax * 10000 + 0.5) AS BIGINT) END AS g_max_bp, " +
        "CASE WHEN n >= 3 AND c2 > 0 THEN " +
        "CAST(floor(gmin * 10000 + 0.5) AS BIGINT) END AS g_min_bp, " +
        "CASE WHEN n >= 3 AND c2 > 0 THEN " +
        "CAST(floor(greatest(gmax, gmin) * 10000 + 0.5) AS BIGINT) END AS g_bp FROM k"),

    "q285_cucconi" ->
      // q278's per-value spine; the two squared-rank moments are exact
      // HUGEINT sums (contrary-rank moments derive algebraically from
      // the same two), U/V/rho/C chains spelled as Spark's, p = exp(-C)
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "c AS (SELECT ca, cb, sum(ca) OVER (ORDER BY v) - ca AS xa, " +
        "sum(cb) OVER (ORDER BY v) - cb AS xb FROM pv), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pv), " +
        "m AS (SELECT " +
        "COALESCE(sum(CAST(cb AS HUGEINT) * (2 * CAST(xa AS HUGEINT) + 2 * CAST(xb AS HUGEINT) + ca + cb + 1)), 0) AS r2, " +
        "COALESCE(sum(CAST(cb AS HUGEINT) * (2 * CAST(xa AS HUGEINT) + 2 * CAST(xb AS HUGEINT) + ca + cb + 1) * " +
        "(2 * CAST(xa AS HUGEINT) + 2 * CAST(xb AS HUGEINT) + ca + cb + 1)), 0) AS r4 FROM c), " +
        "f AS (SELECT na, nb, CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd, " +
        "CAST(na + nb AS DOUBLE) AS nd, CAST(na + nb AS DOUBLE) + 1.0 AS np1, " +
        "CAST(r2 AS DOUBLE) AS r2d, CAST(r4 AS DOUBLE) AS r4d FROM m, t), " +
        "g AS (SELECT *, r4d / 4.0 AS sr2, " +
        "(4.0 * np1 * np1 * nbd - 4.0 * np1 * r2d + r4d) / 4.0 AS sq2, " +
        "sqrt(nad * nbd * np1 * (2.0 * nd + 1) * (8.0 * nd + 11) / 5.0) AS den, " +
        "2.0 * (nd * nd - 4) / ((2.0 * nd + 1) * (8.0 * nd + 11)) - 1.0 AS rho FROM f), " +
        "h AS (SELECT *, (6.0 * sr2 - nbd * np1 * (2.0 * nd + 1)) / den AS uu, " +
        "(6.0 * sq2 - nbd * np1 * (2.0 * nd + 1)) / den AS vv FROM g), " +
        "k AS (SELECT *, (uu * uu + vv * vv - 2.0 * rho * uu * vv) / " +
        "(2.0 * (1.0 - rho * rho)) AS cst FROM h) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CASE WHEN na > 0 AND nb > 0 AND (1.0 - rho * rho) > 0 THEN " +
        "CAST(floor(uu * 10000 + 0.5) AS BIGINT) END AS u_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND (1.0 - rho * rho) > 0 THEN " +
        "CAST(floor(vv * 10000 + 0.5) AS BIGINT) END AS v_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND (1.0 - rho * rho) > 0 THEN " +
        "CAST(floor(cst * 10000 + 0.5) AS BIGINT) END AS c_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND (1.0 - rho * rho) > 0 THEN " +
        "CAST(floor(exp(-cst) * 10000 + 0.5) AS BIGINT) END AS p_bp FROM k"),

    "q286_ansari_bradley" ->
      // the same spine with the doubled midrank-score
      // s2 = min(m2, 2(n+1) - m2); T, its mean and variance exact
      // HUGEINT moments, z one spelled chain
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "c AS (SELECT ca, cb, sum(ca) OVER (ORDER BY v) - ca AS xa, " +
        "sum(cb) OVER (ORDER BY v) - cb AS xb FROM pv), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb, sum(ca + cb) AS n FROM pv), " +
        "sc AS (SELECT ca, cb, " +
        "least(2 * xa + 2 * xb + ca + cb + 1, " +
        "2 * (n + 1) - (2 * xa + 2 * xb + ca + cb + 1)) AS s2 FROM c, t), " +
        "m AS (SELECT " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * s2), 0) AS t2a, " +
        "COALESCE(sum(CAST(ca + cb AS HUGEINT) * s2), 0) AS sc1, " +
        "COALESCE(sum(CAST(ca + cb AS HUGEINT) * s2 * s2), 0) AS sc2 FROM sc), " +
        "f AS (SELECT na, nb, CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd, " +
        "CAST(na + nb AS DOUBLE) AS nd, CAST(t2a AS DOUBLE) AS t2ad, " +
        "CAST(sc1 AS DOUBLE) AS sc1d, CAST(sc2 AS DOUBLE) AS sc2d FROM m, t), " +
        "g AS (SELECT *, nad * sc1d / nd AS e2, " +
        "nad * nbd * (nd * sc2d - sc1d * sc1d) / (nd * nd * (nd - 1.0)) AS vart FROM f) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CASE WHEN na > 0 AND nb > 0 AND na + nb > 1 AND vart > 0 THEN " +
        "CAST(floor((t2ad - e2) / sqrt(vart) * 10000 + 0.5) AS BIGINT) END AS z_bp FROM g"),

    "q287_lepage" ->
      // one spine pass feeding BOTH component z's: the Wilcoxon rank
      // sum with the exact tie correction and q286's AB midrank-score
      // moments; L = zw^2 + zab^2, p = exp(-L/2) on the even dof 2
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "c AS (SELECT ca, cb, sum(ca) OVER (ORDER BY v) - ca AS xa, " +
        "sum(cb) OVER (ORDER BY v) - cb AS xb FROM pv), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb, sum(ca + cb) AS n FROM pv), " +
        "sc AS (SELECT ca, cb, ca + cb AS cv, " +
        "2 * xa + 2 * xb + ca + cb + 1 AS m2, " +
        "least(2 * xa + 2 * xb + ca + cb + 1, " +
        "2 * (n + 1) - (2 * xa + 2 * xb + ca + cb + 1)) AS s2 FROM c, t), " +
        "m AS (SELECT " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * m2), 0) AS ra2, " +
        "COALESCE(sum(CAST(cv AS HUGEINT) * CAST(cv AS HUGEINT) * CAST(cv AS HUGEINT) - CAST(cv AS HUGEINT)), 0) AS tt, " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * s2), 0) AS t2a, " +
        "COALESCE(sum(CAST(cv AS HUGEINT) * s2), 0) AS sc1, " +
        "COALESCE(sum(CAST(cv AS HUGEINT) * s2 * s2), 0) AS sc2 FROM sc), " +
        "f AS (SELECT na, nb, CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd, " +
        "CAST(na + nb AS DOUBLE) AS nd, CAST(ra2 AS DOUBLE) AS ra2d, " +
        "CAST(tt AS DOUBLE) AS ttd, CAST(t2a AS DOUBLE) AS t2ad, " +
        "CAST(sc1 AS DOUBLE) AS sc1d, CAST(sc2 AS DOUBLE) AS sc2d FROM m, t), " +
        "g AS (SELECT *, ra2d - nad * (nad + 1.0) AS u2, " +
        "nad * nbd / 12.0 * ((nd + 1.0) - ttd / (nd * (nd - 1.0))) AS varu, " +
        "nad * sc1d / nd AS e2, " +
        "nad * nbd * (nd * sc2d - sc1d * sc1d) / (nd * nd * (nd - 1.0)) AS vart FROM f), " +
        "h AS (SELECT *, (u2 - nad * nbd) / (2.0 * sqrt(varu)) AS zw, " +
        "(t2ad - e2) / sqrt(vart) AS zab FROM g), " +
        "k AS (SELECT *, zw * zw + zab * zab AS l FROM h) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CASE WHEN na > 0 AND nb > 0 AND na + nb > 1 AND varu > 0 AND vart > 0 THEN " +
        "CAST(floor(zw * 10000 + 0.5) AS BIGINT) END AS zw_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND na + nb > 1 AND varu > 0 AND vart > 0 THEN " +
        "CAST(floor(zab * 10000 + 0.5) AS BIGINT) END AS zab_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND na + nb > 1 AND varu > 0 AND vart > 0 THEN " +
        "CAST(floor(l * 10000 + 0.5) AS BIGINT) END AS l_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND na + nb > 1 AND varu > 0 AND vart > 0 THEN " +
        "CAST(floor(exp(-(l / 2)) * 10000 + 0.5) AS BIGINT) END AS p_bp FROM k"),

    "q288_dagostino_k2" ->
      // four exact HUGEINT power sums; the D'Agostino/Anscombe-Glynn
      // transform chains spelled layer by layer as Spark's, the cube
      // root through sign*exp(ln|t|/3) (the proven exp/ln class, not
      // cbrt whose rounding differs across libms), p = exp(-K2/2)
      ("WITH v AS (SELECT CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS x " +
        "FROM documents WHERE text IS NOT NULL), " +
        "m AS (SELECT count(*) AS n, " +
        "COALESCE(sum(CAST(x AS HUGEINT)), 0) AS s1, " +
        "COALESCE(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)), 0) AS s2, " +
        "COALESCE(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT) * CAST(x AS HUGEINT)), 0) AS s3, " +
        "COALESCE(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT) * CAST(x AS HUGEINT) * CAST(x AS HUGEINT)), 0) AS s4 FROM v), " +
        "f AS (SELECT n, CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d, " +
        "CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d, " +
        "CAST(s4 AS DOUBLE) AS s4d FROM m), " +
        "g0 AS (SELECT *, s1d / nd AS mu FROM f), " +
        "g1x AS (SELECT *, s2d / nd - mu * mu AS m2, " +
        "s3d / nd - 3.0 * mu * (s2d / nd) + 2.0 * mu * mu * mu AS m3, " +
        "s4d / nd - 4.0 * mu * (s3d / nd) + 6.0 * mu * mu * (s2d / nd) - 3.0 * mu * mu * mu * mu AS m4 FROM g0), " +
        "g2x AS (SELECT *, m3 / ((sqrt(m2) * sqrt(m2)) * sqrt(m2)) AS g1, " +
        "m4 / (m2 * m2) - 3.0 AS g2 FROM g1x), " +
        "sk AS (SELECT *, g1 * sqrt((nd + 1) * (nd + 3) / (6.0 * (nd - 2))) AS y, " +
        "3.0 * (nd * nd + 27.0 * nd - 70) * (nd + 1) * (nd + 3) / " +
        "((nd - 2) * (nd + 5) * (nd + 7) * (nd + 9)) AS b2 FROM g2x), " +
        "sk2 AS (SELECT *, sqrt(2.0 * (b2 - 1)) - 1.0 AS w2 FROM sk), " +
        "sk3 AS (SELECT *, 1.0 / sqrt(ln(sqrt(w2))) AS delta, " +
        "sqrt(2.0 / (w2 - 1)) AS alpha FROM sk2), " +
        "sk4 AS (SELECT *, delta * ln(y / alpha + sqrt((y / alpha) * (y / alpha) + 1)) AS z1 FROM sk3), " +
        "ku AS (SELECT *, 3.0 * (nd - 1) / (nd + 1) AS eb2, " +
        "24.0 * nd * (nd - 2) * (nd - 3) / ((nd + 1) * (nd + 1) * (nd + 3) * (nd + 5)) AS vb2 FROM sk4), " +
        "ku2 AS (SELECT *, (g2 + 3.0 - eb2) / sqrt(vb2) AS xx, " +
        "6.0 * (nd * nd - 5.0 * nd + 2) / ((nd + 7) * (nd + 9)) * " +
        "sqrt(6.0 * (nd + 3) * (nd + 5) / (nd * (nd - 2) * (nd - 3))) AS beta FROM ku), " +
        "ku3 AS (SELECT *, 6.0 + 8.0 / beta * (2.0 / beta + sqrt(1.0 + 4.0 / (beta * beta))) AS aa FROM ku2), " +
        "ku4 AS (SELECT *, (1.0 - 2.0 / aa) / (1.0 + xx * sqrt(2.0 / (aa - 4))) AS t FROM ku3), " +
        "ku5 AS (SELECT *, (CASE WHEN t < 0 THEN -1.0 WHEN t > 0 THEN 1.0 ELSE 0.0 END) * " +
        "exp(ln(abs(t)) / 3) AS cbrtt FROM ku4), " +
        "ku6 AS (SELECT *, ((1.0 - 2.0 / (9.0 * aa)) - cbrtt) / sqrt(2.0 / (9.0 * aa)) AS z2 FROM ku5), " +
        "k2x AS (SELECT *, z1 * z1 + z2 * z2 AS k2 FROM ku6) " +
        "SELECT CAST(n AS BIGINT) AS n, " +
        "CASE WHEN n >= 20 AND m2 > 0 AND w2 > 1 AND t <> 0 THEN " +
        "CAST(floor(g1 * 10000 + 0.5) AS BIGINT) END AS skew_bp, " +
        "CASE WHEN n >= 20 AND m2 > 0 AND w2 > 1 AND t <> 0 THEN " +
        "CAST(floor(g2 * 10000 + 0.5) AS BIGINT) END AS kurt_bp, " +
        "CASE WHEN n >= 20 AND m2 > 0 AND w2 > 1 AND t <> 0 THEN " +
        "CAST(floor(z1 * 10000 + 0.5) AS BIGINT) END AS z1_bp, " +
        "CASE WHEN n >= 20 AND m2 > 0 AND w2 > 1 AND t <> 0 THEN " +
        "CAST(floor(z2 * 10000 + 0.5) AS BIGINT) END AS z2_bp, " +
        "CASE WHEN n >= 20 AND m2 > 0 AND w2 > 1 AND t <> 0 THEN " +
        "CAST(floor(k2 * 10000 + 0.5) AS BIGINT) END AS k2_bp, " +
        "CASE WHEN n >= 20 AND m2 > 0 AND w2 > 1 AND t <> 0 THEN " +
        "CAST(floor(exp(-(k2 / 2)) * 10000 + 0.5) AS BIGINT) END AS p_bp FROM k2x"),

    "q289_cox_stuart" ->
      // the day-ordered series per type (q272's spine); the paired-
      // halves sign fold in exact integers, z the plain sign chain
      ("WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
        "FROM events WHERE ts IS NOT NULL GROUP BY 1, 2), " +
        "a AS (SELECT event_type, list(n ORDER BY day) AS xs FROM d GROUP BY 1), " +
        "b AS (SELECT event_type, xs, len(xs) AS m, " +
        "CAST((len(xs) + 1) // 2 AS INT) AS c, " +
        "CAST(len(xs) // 2 AS INT) AS half FROM a), " +
        "f AS (SELECT event_type, m, " +
        "CASE WHEN m > 1 THEN list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(range(1, half + 1), i -> " +
        "CASE WHEN xs[CAST(i + c AS INT)] > xs[CAST(i AS INT)] THEN CAST(1 AS BIGINT) " +
        "ELSE CAST(0 AS BIGINT) END)), (a, b) -> a + b) ELSE 0 END AS pos, " +
        "CASE WHEN m > 1 THEN list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(range(1, half + 1), i -> " +
        "CASE WHEN xs[CAST(i + c AS INT)] < xs[CAST(i AS INT)] THEN CAST(1 AS BIGINT) " +
        "ELSE CAST(0 AS BIGINT) END)), (a, b) -> a + b) ELSE 0 END AS neg FROM b) " +
        "SELECT event_type, CAST(m AS BIGINT) AS n_days, " +
        "CAST(pos + neg AS BIGINT) AS n_pairs, CAST(pos AS BIGINT) AS n_pos, " +
        "CASE WHEN pos + neg > 0 THEN " +
        "CAST(floor((2.0 * CAST(pos AS DOUBLE) - CAST(pos + neg AS DOUBLE)) / " +
        "sqrt(CAST(pos + neg AS DOUBLE)) * 10000 + 0.5) AS BIGINT) END AS z_bp FROM f"),

    "q290_kpss" ->
      // the same series; D_t = m*x_t - S, partial sums P_t, and the
      // lag-4 Bartlett autocovariance cores are ALL exact HUGEINT
      // integers, eta ONE division; reject from the rounded display
      ("WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
        "FROM events WHERE ts IS NOT NULL GROUP BY 1, 2), " +
        "a AS (SELECT event_type, list(n ORDER BY day) AS xs FROM d GROUP BY 1), " +
        "b AS (SELECT event_type, xs, len(xs) AS m, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(xs, x -> CAST(x AS BIGINT))), (a, b) -> a + b) AS s FROM a), " +
        "f AS (SELECT event_type, m, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(range(1, m + 1), t -> " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(list_slice(xs, 1, CAST(t AS INT)), x -> " +
        "CAST(m AS HUGEINT) * CAST(x AS HUGEINT) - CAST(s AS HUGEINT))), (p, q) -> p + q) * " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(list_slice(xs, 1, CAST(t AS INT)), x -> " +
        "CAST(m AS HUGEINT) * CAST(x AS HUGEINT) - CAST(s AS HUGEINT))), (p, q) -> p + q))), " +
        "(p, q) -> p + q) AS sump2, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(range(1, m + 1), t -> " +
        "(CAST(m AS HUGEINT) * CAST(xs[CAST(t AS INT)] AS HUGEINT) - CAST(s AS HUGEINT)) * " +
        "(CAST(m AS HUGEINT) * CAST(xs[CAST(t AS INT)] AS HUGEINT) - CAST(s AS HUGEINT)))), " +
        "(p, q) -> p + q) AS g0, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(range(1, m - 1 + 1), t -> " +
        "(CAST(m AS HUGEINT) * CAST(xs[CAST(t AS INT)] AS HUGEINT) - CAST(s AS HUGEINT)) * " +
        "(CAST(m AS HUGEINT) * CAST(xs[CAST(t + 1 AS INT)] AS HUGEINT) - CAST(s AS HUGEINT)))), " +
        "(p, q) -> p + q) AS g1, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(range(1, m - 2 + 1), t -> " +
        "(CAST(m AS HUGEINT) * CAST(xs[CAST(t AS INT)] AS HUGEINT) - CAST(s AS HUGEINT)) * " +
        "(CAST(m AS HUGEINT) * CAST(xs[CAST(t + 2 AS INT)] AS HUGEINT) - CAST(s AS HUGEINT)))), " +
        "(p, q) -> p + q) AS g2, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(range(1, m - 3 + 1), t -> " +
        "(CAST(m AS HUGEINT) * CAST(xs[CAST(t AS INT)] AS HUGEINT) - CAST(s AS HUGEINT)) * " +
        "(CAST(m AS HUGEINT) * CAST(xs[CAST(t + 3 AS INT)] AS HUGEINT) - CAST(s AS HUGEINT)))), " +
        "(p, q) -> p + q) AS g3, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(range(1, m - 4 + 1), t -> " +
        "(CAST(m AS HUGEINT) * CAST(xs[CAST(t AS INT)] AS HUGEINT) - CAST(s AS HUGEINT)) * " +
        "(CAST(m AS HUGEINT) * CAST(xs[CAST(t + 4 AS INT)] AS HUGEINT) - CAST(s AS HUGEINT)))), " +
        "(p, q) -> p + q) AS g4 FROM b), " +
        "k AS (SELECT event_type, m, 5 * sump2 AS num, " +
        "CAST(m AS HUGEINT) * (5 * g0 + 2 * 4 * g1 + 2 * 3 * g2 + 2 * 2 * g3 + 2 * 1 * g4) AS den FROM f) " +
        "SELECT event_type, CAST(m AS BIGINT) AS n_days, " +
        "CASE WHEN m > 1 AND den > 0 THEN " +
        "CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS eta_bp, " +
        "CASE WHEN m > 1 AND den > 0 THEN " +
        "CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 10000 + 0.5) AS BIGINT) > 4630 END AS reject_5pct " +
        "FROM k"),

    "q277_ordinal_assoc" ->
      // the q261 band grid; C/D/tie masses via the bounded cells
      // self-cross (q224's exact idiom), every display ONE double chain
      ("WITH base AS (SELECT " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok, " +
        "n_chars FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL), " +
        "v AS (SELECT CASE WHEN tok < 40 THEN 0 WHEN tok < 70 THEN 1 ELSE 2 END AS xb, " +
        "CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 380 THEN 1 ELSE 2 END AS yb FROM base), " +
        "cells AS (SELECT xb, yb, count(*) AS c FROM v GROUP BY xb, yb), " +
        "cd AS (SELECT " +
        "COALESCE(sum(CASE WHEN c2.xb > c1.xb AND c2.yb > c1.yb THEN " +
        "CAST(c1.c AS HUGEINT) * CAST(c2.c AS HUGEINT) ELSE 0 END), 0) AS cc, " +
        "COALESCE(sum(CASE WHEN c2.xb > c1.xb AND c2.yb < c1.yb THEN " +
        "CAST(c1.c AS HUGEINT) * CAST(c2.c AS HUGEINT) ELSE 0 END), 0) AS dd " +
        "FROM cells c1, cells c2), " +
        "t AS (SELECT sum(c) AS n, count(DISTINCT xb) AS kx, " +
        "count(DISTINCT yb) AS ky FROM cells), " +
        "tx AS (SELECT COALESCE(sum(CAST(s AS HUGEINT) * (CAST(s AS HUGEINT) - 1) // 2), 0) AS n1 " +
        "FROM (SELECT sum(c) AS s FROM cells GROUP BY xb)), " +
        "ty AS (SELECT COALESCE(sum(CAST(s AS HUGEINT) * (CAST(s AS HUGEINT) - 1) // 2), 0) AS n2 " +
        "FROM (SELECT sum(c) AS s FROM cells GROUP BY yb)), " +
        "f AS (SELECT CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1) // 2 AS n0, " +
        "n, kx, ky, cc, dd, n1, n2, least(kx, ky) AS mm FROM t, cd, tx, ty) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(kx AS BIGINT) AS k_x, " +
        "CAST(ky AS BIGINT) AS k_y, " +
        "CASE WHEN cc + dd > 0 THEN floor(CAST(cc - dd AS DOUBLE) / " +
        "CAST(cc + dd AS DOUBLE) * 10000 + 0.5) / 10000 END AS gamma, " +
        "CASE WHEN n0 > n1 THEN floor(CAST(cc - dd AS DOUBLE) / " +
        "CAST(n0 - n1 AS DOUBLE) * 10000 + 0.5) / 10000 END AS somers_d_yx, " +
        "CASE WHEN n0 > n2 THEN floor(CAST(cc - dd AS DOUBLE) / " +
        "CAST(n0 - n2 AS DOUBLE) * 10000 + 0.5) / 10000 END AS somers_d_xy, " +
        "CASE WHEN mm > 1 AND n > 0 THEN floor(2.0 * CAST(mm AS DOUBLE) * " +
        "CAST(cc - dd AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * " +
        "(CAST(mm AS DOUBLE) - 1)) * 10000 + 0.5) / 10000 END AS tau_c FROM f"),

    "q278_brunner_munzel" ->
      // q220's per-value histogram with exclusive window prefixes; the
      // doubled placements are exact HUGEINT integers, the per-sample
      // K/variance/W/df chains spelled layer by layer as Spark's
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "c AS (SELECT ca, cb, sum(ca) OVER (ORDER BY v) - ca AS xa, " +
        "sum(cb) OVER (ORDER BY v) - cb AS xb FROM pv), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pv), " +
        "m AS (SELECT " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * (2 * CAST(xa AS HUGEINT) + 2 * CAST(xb AS HUGEINT) + ca + cb + 1)), 0) AS ra2, " +
        "COALESCE(sum(CAST(cb AS HUGEINT) * (2 * CAST(xa AS HUGEINT) + 2 * CAST(xb AS HUGEINT) + ca + cb + 1)), 0) AS rb2, " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * (2 * CAST(xb AS HUGEINT) + cb)), 0) AS sa1, " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * (2 * CAST(xb AS HUGEINT) + cb) * (2 * CAST(xb AS HUGEINT) + cb)), 0) AS sa2, " +
        "COALESCE(sum(CAST(cb AS HUGEINT) * (2 * CAST(xa AS HUGEINT) + ca)), 0) AS sb1, " +
        "COALESCE(sum(CAST(cb AS HUGEINT) * (2 * CAST(xa AS HUGEINT) + ca) * (2 * CAST(xa AS HUGEINT) + ca)), 0) AS sb2 " +
        "FROM c), " +
        "f AS (SELECT na, nb, CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd, " +
        "CAST(ra2 AS DOUBLE) AS ra2d, CAST(rb2 AS DOUBLE) AS rb2d, " +
        "CAST(sa1 AS DOUBLE) AS sa1d, CAST(sa2 AS DOUBLE) AS sa2d, " +
        "CAST(sb1 AS DOUBLE) AS sb1d, CAST(sb2 AS DOUBLE) AS sb2d FROM m, t), " +
        "k AS (SELECT *, ra2d / nad - (nad + 1.0) AS ka, " +
        "rb2d / nbd - (nbd + 1.0) AS kb FROM f), " +
        "vv AS (SELECT *, " +
        "(sa2d - 2.0 * ka * sa1d + nad * ka * ka) / 4.0 / (nad - 1.0) AS va, " +
        "(sb2d - 2.0 * kb * sb1d + nbd * kb * kb) / 4.0 / (nbd - 1.0) AS vb FROM k), " +
        "p AS (SELECT *, nad * va + nbd * vb AS pooled FROM vv) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor((rb2d / nbd - nbd - 1.0) / (2.0 * nad) * 10000 + 0.5) AS BIGINT) END AS p_hat_bp, " +
        "CASE WHEN na >= 2 AND nb >= 2 AND pooled > 0 THEN " +
        "CAST(floor(nad * nbd * (rb2d / (2.0 * nbd) - ra2d / (2.0 * nad)) / " +
        "(nad + nbd) / sqrt(pooled) * 10000 + 0.5) AS BIGINT) END AS w_bp, " +
        "CASE WHEN na >= 2 AND nb >= 2 AND pooled > 0 THEN " +
        "CAST(floor(pooled * pooled / ((nad * va) * (nad * va) / (nad - 1.0) + " +
        "(nbd * vb) * (nbd * vb) / (nbd - 1.0)) * 10000 + 0.5) AS BIGINT) END AS df_bp " +
        "FROM p"),

    "q279_mood_median" ->
      // the shared per-(group, value) cell agg; pooled LOWER median by
      // doubled inclusive cumulative, per-group chi2 terms as
      // floor(term*2^30) grains (order-free integer sum)
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "cells AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v), " +
        "pv AS (SELECT v, sum(c) AS cv FROM cells GROUP BY v), " +
        "cum AS (SELECT v, cv, sum(cv) OVER (ORDER BY v) AS ci FROM pv), " +
        "t AS (SELECT sum(cv) AS n FROM pv), " +
        "md AS (SELECT min(v) AS m FROM cum, t WHERE ci * 2 >= n), " +
        "grp AS (SELECT g, sum(CASE WHEN v > m THEN c ELSE 0 END) AS hi, " +
        "sum(c) AS ng FROM cells, md GROUP BY g), " +
        "tot AS (SELECT COALESCE(sum(hi), 0) AS ta, COALESCE(sum(ng), 0) AS tn, " +
        "count(*) AS k FROM grp), " +
        "q AS (SELECT CASE WHEN ta > 0 AND ta < tn THEN " +
        "CAST(floor(((CAST(hi AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(tn AS DOUBLE)) * " +
        "(CAST(hi AS DOUBLE) - CAST(ng AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(tn AS DOUBLE)) / " +
        "(CAST(ng AS DOUBLE) * CAST(ta AS DOUBLE) / CAST(tn AS DOUBLE)) + " +
        "((CAST(ng AS DOUBLE) - CAST(hi AS DOUBLE)) - CAST(ng AS DOUBLE) * (CAST(tn AS DOUBLE) - CAST(ta AS DOUBLE)) / CAST(tn AS DOUBLE)) * " +
        "((CAST(ng AS DOUBLE) - CAST(hi AS DOUBLE)) - CAST(ng AS DOUBLE) * (CAST(tn AS DOUBLE) - CAST(ta AS DOUBLE)) / CAST(tn AS DOUBLE)) / " +
        "(CAST(ng AS DOUBLE) * (CAST(tn AS DOUBLE) - CAST(ta AS DOUBLE)) / CAST(tn AS DOUBLE))) * 1073741824) AS BIGINT) " +
        "ELSE 0 END AS qq FROM grp, tot), " +
        "f AS (SELECT COALESCE(sum(qq), 0) AS q2 FROM q) " +
        "SELECT CAST(tn AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups, " +
        "m AS median_v, " +
        "CASE WHEN k > 1 AND ta > 0 AND ta < tn THEN " +
        "CAST(floor(CAST(q2 AS DOUBLE) / 1073741824 * 10000 + 0.5) AS BIGINT) END AS chi2_bp, " +
        "CASE WHEN k > 1 AND ta > 0 AND ta < tn THEN CAST(k - 1 AS BIGINT) END AS dof " +
        "FROM f, tot, md"),

    "q280_page_trend" ->
      // exact integer-microsecond tercile boundaries from a one-row
      // window; per-user doubled midranks of the 3 period counts as
      // CASE integer sums; z chain spelled as Spark's
      ("WITH e AS (SELECT user_id AS u, epoch_us(ts) AS us FROM events " +
        "WHERE ts IS NOT NULL AND user_id IS NOT NULL), " +
        "w AS (SELECT min(us) AS t0, max(us) AS t1 FROM e), " +
        "p AS (SELECT u, least(2, CAST(floor(CAST((us - t0) * 3 AS DOUBLE) / " +
        "CAST(t1 - t0 + 1 AS DOUBLE)) AS BIGINT)) AS p FROM e, w), " +
        "pu AS (SELECT u, sum(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS x0, " +
        "sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS x1, " +
        "sum(CASE WHEN p = 2 THEN 1 ELSE 0 END) AS x2 FROM p GROUP BY u), " +
        "dr AS (SELECT " +
        "2 + (CASE WHEN x1 < x0 THEN 2 ELSE 0 END) + (CASE WHEN x2 < x0 THEN 2 ELSE 0 END) + " +
        "(CASE WHEN x1 = x0 THEN 1 ELSE 0 END) + (CASE WHEN x2 = x0 THEN 1 ELSE 0 END) AS d0, " +
        "2 + (CASE WHEN x0 < x1 THEN 2 ELSE 0 END) + (CASE WHEN x2 < x1 THEN 2 ELSE 0 END) + " +
        "(CASE WHEN x0 = x1 THEN 1 ELSE 0 END) + (CASE WHEN x2 = x1 THEN 1 ELSE 0 END) AS d1, " +
        "2 + (CASE WHEN x0 < x2 THEN 2 ELSE 0 END) + (CASE WHEN x1 < x2 THEN 2 ELSE 0 END) + " +
        "(CASE WHEN x0 = x2 THEN 1 ELSE 0 END) + (CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS d2 " +
        "FROM pu), " +
        "f AS (SELECT count(*) AS m, " +
        "COALESCE(sum(1 * d0 + 2 * d1 + 3 * d2), 0) AS l2 FROM dr) " +
        "SELECT CAST(m AS BIGINT) AS n_blocks, CAST(3 AS BIGINT) AS k_periods, " +
        "CAST(l2 AS BIGINT) AS l2, " +
        "CASE WHEN m > 0 THEN " +
        "CAST(floor((CAST(l2 AS DOUBLE) - 24.0 * CAST(m AS DOUBLE)) / " +
        "(2.0 * sqrt(2.0 * CAST(m AS DOUBLE))) * 10000 + 0.5) AS BIGINT) END AS z_bp FROM f"),

    "q281_nelson_aalen" ->
      // q180's lifetime spine; suffix risks by window prefix, per-day
      // hazard/variance increments as floor(term*2^30) grains with
      // window cumulative sums (order-free integers)
      ("WITH pu AS (SELECT user_id, min(epoch_us(ts)) AS f, " +
        "max(epoch_us(ts)) AS l FROM events GROUP BY 1), " +
        "e AS (SELECT max(epoch_us(ts)) AS endt FROM events), " +
        "lt AS (SELECT CAST(floor((l - f) / 86400000000) AS BIGINT) AS t_day, " +
        "CASE WHEN (endt - l) > 1 * 86400000000 THEN 1 ELSE 0 END AS churned " +
        "FROM pu, e), " +
        "h0 AS (SELECT t_day, count(*) AS nt, CAST(sum(churned) AS BIGINT) AS d " +
        "FROM lt GROUP BY 1), " +
        "t AS (SELECT sum(nt) AS nu FROM h0), " +
        "w AS (SELECT t_day, nt, d, " +
        "nu - (sum(nt) OVER (ORDER BY t_day) - nt) AS risk FROM h0, t), " +
        "g AS (SELECT t_day, risk, d, " +
        "CAST(floor(CAST(d AS DOUBLE) / CAST(risk AS DOUBLE) * 1073741824) AS BIGINT) AS hg, " +
        "CAST(floor(CAST(d AS DOUBLE) / (CAST(risk AS DOUBLE) * CAST(risk AS DOUBLE)) * 1073741824) AS BIGINT) AS vg " +
        "FROM w), " +
        "c AS (SELECT t_day, risk, d, sum(hg) OVER (ORDER BY t_day) AS ch, " +
        "sum(vg) OVER (ORDER BY t_day) AS cv FROM g) " +
        "SELECT t_day, CAST(risk AS BIGINT) AS n_risk, d AS n_deaths, " +
        "CAST(floor(CAST(ch AS DOUBLE) / 1073741824 * 10000 + 0.5) AS BIGINT) AS h_bp, " +
        "CAST(floor(sqrt(CAST(cv AS DOUBLE) / 1073741824) * 10000 + 0.5) AS BIGINT) AS se_bp " +
        "FROM c WHERE d > 0"),

    "q282_weighted_logrank" ->
      // q243's cohort lifetime spine; suffix risks by window prefix,
      // each weight's per-day numerator/variance terms as signed
      // floor(term*2^20) grains, z a two-division display chain; the
      // Tarone weight enters as sqrt*sqrt exactly as Spark spells it
      ("WITH pu AS (SELECT user_id, min(epoch_us(ts)) AS f, " +
        "max(epoch_us(ts)) AS l, max(user_id % 2) AS c FROM events GROUP BY 1), " +
        "e AS (SELECT max(epoch_us(ts)) AS endt FROM events), " +
        "lt AS (SELECT CAST(floor((l - f) / 86400000000) AS BIGINT) AS t_day, " +
        "CASE WHEN (endt - l) > 1 * 86400000000 THEN 1 ELSE 0 END AS churned, c " +
        "FROM pu, e), " +
        "h0 AS (SELECT t_day, " +
        "CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, " +
        "CAST(sum(CASE WHEN c <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
        "CAST(sum(CASE WHEN c = 0 THEN churned ELSE 0 END) AS BIGINT) AS d0, " +
        "CAST(sum(CASE WHEN c <> 0 THEN churned ELSE 0 END) AS BIGINT) AS d1 " +
        "FROM lt GROUP BY 1), " +
        "t AS (SELECT sum(n0) AS na, sum(n1) AS nb, sum(d0) AS oa FROM h0), " +
        "w AS (SELECT t_day, d0, d1, na, nb, " +
        "na - (sum(n0) OVER (ORDER BY t_day) - n0) AS r0, " +
        "nb - (sum(n1) OVER (ORDER BY t_day) - n1) AS r1 FROM h0, t), " +
        "x AS (SELECT CAST(d0 AS DOUBLE) AS d0d, CAST(d0 + d1 AS DOUBLE) AS dd, " +
        "CAST(r0 AS DOUBLE) AS r0d, CAST(r0 AS DOUBLE) + CAST(r1 AS DOUBLE) AS rd, " +
        "(CAST(r0 AS DOUBLE) + CAST(r1 AS DOUBLE)) / CAST(na + nb AS DOUBLE) AS rf " +
        "FROM w), " +
        "g AS (SELECT " +
        "CAST(floor(1.0 * (d0d - dd * r0d / rd) * 1048576) AS BIGINT) AS n1g, " +
        "CASE WHEN rd > 1 THEN CAST(floor(1.0 * 1.0 * " +
        "(dd * (r0d / rd) * (1.0 - r0d / rd) * (rd - dd) / (rd - 1)) * 1048576) AS BIGINT) ELSE 0 END AS v1g, " +
        "CAST(floor(rf * (d0d - dd * r0d / rd) * 1048576) AS BIGINT) AS n2g, " +
        "CASE WHEN rd > 1 THEN CAST(floor(rf * rf * " +
        "(dd * (r0d / rd) * (1.0 - r0d / rd) * (rd - dd) / (rd - 1)) * 1048576) AS BIGINT) ELSE 0 END AS v2g, " +
        "CAST(floor(sqrt(rf) * (d0d - dd * r0d / rd) * 1048576) AS BIGINT) AS n3g, " +
        "CASE WHEN rd > 1 THEN CAST(floor(sqrt(rf) * sqrt(rf) * " +
        "(dd * (r0d / rd) * (1.0 - r0d / rd) * (rd - dd) / (rd - 1)) * 1048576) AS BIGINT) ELSE 0 END AS v3g " +
        "FROM x), " +
        "f AS (SELECT COALESCE(sum(n1g), 0) AS s1n, COALESCE(sum(v1g), 0) AS s1v, " +
        "COALESCE(sum(n2g), 0) AS s2n, COALESCE(sum(v2g), 0) AS s2v, " +
        "COALESCE(sum(n3g), 0) AS s3n, COALESCE(sum(v3g), 0) AS s3v FROM g) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CAST(oa AS BIGINT) AS obs_a, " +
        "CASE WHEN na > 0 AND nb > 0 AND s1v > 0 THEN " +
        "CAST(floor((CAST(s1n AS DOUBLE) / 1048576) / sqrt(CAST(s1v AS DOUBLE) / 1048576) * 10000 + 0.5) AS BIGINT) END AS z_logrank_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND s2v > 0 THEN " +
        "CAST(floor((CAST(s2n AS DOUBLE) / 1048576) / sqrt(CAST(s2v AS DOUBLE) / 1048576) * 10000 + 0.5) AS BIGINT) END AS z_gehan_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND s3v > 0 THEN " +
        "CAST(floor((CAST(s3n AS DOUBLE) / 1048576) / sqrt(CAST(s3v AS DOUBLE) / 1048576) * 10000 + 0.5) AS BIGINT) END AS z_tarone_bp " +
        "FROM f, t"),

    "q283_kuiper_test" ->
      // q220's spine with SIGNED integer gap numerators: both one-sided
      // suprema are HUGEINT maxes clamped at zero, one division per
      // display
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "c AS (SELECT sum(ca) OVER (ORDER BY v) AS cuma, " +
        "sum(cb) OVER (ORDER BY v) AS cumb FROM pv), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pv), " +
        "m AS (SELECT " +
        "greatest(COALESCE(max(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT) - " +
        "CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT)), 0), 0) AS dp, " +
        "greatest(COALESCE(max(CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT) - " +
        "CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT)), 0), 0) AS dm FROM c, t) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor(CAST(dp AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * 10000 + 0.5) AS BIGINT) END AS d_plus_bp, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor(CAST(dm AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * 10000 + 0.5) AS BIGINT) END AS d_minus_bp, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor(CAST(dp + dm AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * 10000 + 0.5) AS BIGINT) END AS v_bp " +
        "FROM m, t"),

    "q284_rmst" ->
      // q180's KM chain verbatim through the rounded step curve, then
      // the area fold to the 30-day horizon as floor(s*gap*2^20) grains
      ("WITH pu AS (SELECT user_id, min(epoch_us(ts)) AS f, " +
        "max(epoch_us(ts)) AS l FROM events GROUP BY 1), " +
        "e AS (SELECT max(epoch_us(ts)) AS endt FROM events), " +
        "lt AS (SELECT CAST(floor((l - f) / 86400000000) AS BIGINT) AS t_day, " +
        "CASE WHEN (endt - l) > 1 * 86400000000 THEN 1 ELSE 0 END AS churned " +
        "FROM pu, e), " +
        "h0 AS (SELECT t_day, count(*) AS n_total, " +
        "CAST(sum(churned) AS BIGINT) AS n_deaths FROM lt GROUP BY 1), " +
        "o AS (SELECT list(struct_pack(t_day := t_day, n_total := n_total, " +
        "n_deaths := n_deaths) ORDER BY t_day) AS h FROM h0), " +
        "o2 AS (SELECT h, CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(h, s -> (s).n_total)), (a, b) -> a + b) AS BIGINT) AS n_users FROM o), " +
        "x AS (SELECT h, n_users, unnest(h) AS ee, generate_subscripts(h, 1) AS i FROM o2), " +
        "km AS (SELECT (ee).t_day AS td, " +
        "round(list_reduce(list_prepend(1.0, list_transform(range(1, i + 1), " +
        "j -> 1.0 - CAST((h[CAST(j AS INT)]).n_deaths AS DOUBLE) / " +
        "CAST(n_users - list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n_total)), " +
        "(a, b) -> a + b) AS DOUBLE))), (a, b) -> a * b), 4) AS s " +
        "FROM x WHERE (ee).n_deaths > 0), " +
        "ka AS (SELECT list(struct_pack(td := td, s := s) ORDER BY td) AS ks FROM km), " +
        "nu AS (SELECT count(*) AS n_users FROM pu), " +
        "a AS (SELECT ks, len(ks) AS m FROM ka), " +
        "r AS (SELECT m, " +
        "CASE WHEN m > 0 THEN least((ks[1]).td, 30) ELSE 30 END AS w0, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(range(1, m + 1), j -> " +
        "CAST(floor((ks[CAST(j AS INT)]).s * CAST(greatest(0, " +
        "(CASE WHEN j < m THEN least((ks[CAST(j + 1 AS INT)]).td, 30) ELSE 30 END) - " +
        "least((ks[CAST(j AS INT)]).td, 30)) AS DOUBLE) * 1048576) AS BIGINT))), " +
        "(a, b) -> a + b) AS BIGINT) AS grains FROM a) " +
        "SELECT CAST(30 AS BIGINT) AS tau_day, CAST(n_users AS BIGINT) AS n_users, " +
        "CAST(m AS BIGINT) AS n_curve_days, " +
        "CAST(floor((CAST(w0 AS DOUBLE) + CAST(grains AS DOUBLE) / 1048576) * 10000 + 0.5) AS BIGINT) AS rmst_bp " +
        "FROM r, nu"),

    "q276_icc" ->
      // q228's band CTEs; the nk-scaled two-way ANOVA sums as exact
      // HUGEINT integers, the MS and ICC chains spelled as Spark's
      ("WITH base AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS den, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok, " +
        "n_chars FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL), " +
        "r AS (SELECT " +
        "CASE WHEN num * 10 < den THEN 0 WHEN num * 5 < den THEN 1 ELSE 2 END AS r0, " +
        "CASE WHEN tok < 40 THEN 0 WHEN tok < 70 THEN 1 ELSE 2 END AS r1, " +
        "CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 380 THEN 1 ELSE 2 END AS r2 FROM base), " +
        "one AS (SELECT count(*) AS n, " +
        "COALESCE(sum(CAST(r0 + r1 + r2 AS HUGEINT)), 0) AS g, " +
        "COALESCE(sum(CAST(r0 + r1 + r2 AS HUGEINT) * CAST(r0 + r1 + r2 AS HUGEINT)), 0) AS tq, " +
        "COALESCE(sum(CAST(r0 AS HUGEINT) * CAST(r0 AS HUGEINT) + " +
        "CAST(r1 AS HUGEINT) * CAST(r1 AS HUGEINT) + " +
        "CAST(r2 AS HUGEINT) * CAST(r2 AS HUGEINT)), 0) AS xq, " +
        "COALESCE(sum(CAST(r0 AS HUGEINT)), 0) AS s0, " +
        "COALESCE(sum(CAST(r1 AS HUGEINT)), 0) AS s1, " +
        "COALESCE(sum(CAST(r2 AS HUGEINT)), 0) AS s2 FROM r), " +
        "f AS (SELECT n, " +
        "CAST(n AS HUGEINT) * tq - g * g AS ssr, " +
        "3 * (s0 * s0 + s1 * s1 + s2 * s2) - g * g AS ssc, " +
        "CAST(n AS HUGEINT) * 3 * xq - g * g AS sst FROM one), " +
        "m AS (SELECT n, CAST(n AS DOUBLE) AS nd, " +
        "CAST(ssr AS DOUBLE) / (CAST(n AS DOUBLE) - 1) AS msr, " +
        "CAST(ssc AS DOUBLE) / (3.0 - 1) AS msc, " +
        "CAST(sst - ssr - ssc AS DOUBLE) / " +
        "((CAST(n AS DOUBLE) - 1) * (3.0 - 1)) AS mse FROM f) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(3 AS BIGINT) AS k_raters, " +
        "CASE WHEN n > 1 AND msr + (3.0 - 1) * mse + 3.0 / nd * (msc - mse) > 0 THEN " +
        "CAST(floor((msr - mse) / (msr + (3.0 - 1) * mse + 3.0 / nd * (msc - mse)) * 10000 + 0.5) AS BIGINT) " +
        "END AS icc21_bp, " +
        "CASE WHEN n > 1 AND msr + (msc - mse) / nd > 0 THEN " +
        "CAST(floor((msr - mse) / (msr + (msc - mse) / nd) * 10000 + 0.5) AS BIGINT) " +
        "END AS icc2k_bp FROM m"),

    "q275_hosmer_lemeshow" ->
      // q209's bin CTEs (same HUGEINT bin draw and 2^20 quantization);
      // the HL fold in sorted bin order and the even-dof survival
      // spelled as Spark's
      ("WITH v AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS HUGEINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS HUGEINT) AS den, " +
        "(source = 'src0') AS y FROM documents " +
        "WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "b AS (SELECT least(9, num * 10 // den) AS bin, " +
        "num * 1048576 // den AS sq20, " +
        "CASE WHEN y THEN 1 ELSE 0 END AS pos FROM v), " +
        "p AS (SELECT bin, count(*) AS n, sum(pos) AS np, sum(sq20) AS s " +
        "FROM b GROUP BY bin), " +
        "one AS (SELECT list(struct_pack(bin := bin, n := n, np := np, s := s) " +
        "ORDER BY bin) AS bs, COALESCE(sum(n), 0) AS n, count(*) AS bu FROM p), " +
        "f AS (SELECT n, bu, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(bs, e -> " +
        "CAST(CASE WHEN CAST((e).s AS DOUBLE) / 1048576.0 > 0 AND " +
        "CAST((e).s AS DOUBLE) / 1048576.0 < CAST((e).n AS DOUBLE) " +
        "THEN 1 ELSE 0 END AS BIGINT))), (p, q) -> p + q) AS cc, " +
        "list_reduce(list_prepend(0.0, list_transform(bs, e -> " +
        "CASE WHEN CAST((e).s AS DOUBLE) / 1048576.0 > 0 AND " +
        "CAST((e).s AS DOUBLE) / 1048576.0 < CAST((e).n AS DOUBLE) THEN " +
        "(CAST((e).np AS DOUBLE) - CAST((e).s AS DOUBLE) / 1048576.0) * " +
        "(CAST((e).np AS DOUBLE) - CAST((e).s AS DOUBLE) / 1048576.0) / " +
        "((CAST((e).s AS DOUBLE) / 1048576.0) * " +
        "(1.0 - (CAST((e).s AS DOUBLE) / 1048576.0) / CAST((e).n AS DOUBLE))) " +
        "ELSE 0.0 END)), (p, q) -> p + q) AS hl FROM one) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(bu AS BIGINT) AS bins_used, " +
        "CASE WHEN cc > 2 THEN CAST(cc - 2 AS BIGINT) END AS df_hl, " +
        "CASE WHEN cc > 2 THEN CAST(floor(hl * 10000 + 0.5) AS BIGINT) END AS hl_bp, " +
        "CASE WHEN cc > 2 AND cc = bu AND bu = 10 THEN " +
        "CAST(floor(exp(-(hl / 2)) * (1.0 + 1.0 * (hl / 2) + " +
        "((0.5 * (hl / 2)) * (hl / 2)) + " +
        "(((0.16666666666666666 * (hl / 2)) * (hl / 2)) * (hl / 2))) * 10000 + 0.5) AS BIGINT) " +
        "END AS p_bp FROM f"),

    "q274_by_screen" ->
      // q232's per-group KS spine verbatim; the BY step inflates the
      // step-up weights with the ascending-order harmonic factor —
      // computed by a RECURSIVE CTE so the float fold order (ascending
      // i, left-associated) is pinned identical to Spark's aggregate()
      // fold, with no dynamic-list constructs (the r15 portability fix)
      ("WITH RECURSIVE v AS (SELECT source AS g, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DOUBLE) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "pgv AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v), " +
        "pv AS (SELECT v, sum(c) AS cv FROM pgv GROUP BY v), " +
        "gr AS (SELECT g, sum(c) AS ng FROM pgv GROUP BY g), " +
        "t AS (SELECT sum(cv) AS n FROM pv), " +
        "ca AS (SELECT v, sum(cv) OVER (ORDER BY v) AS cumall FROM pv), " +
        "sp AS (SELECT gr.g, gr.ng, ca.v, ca.cumall FROM gr, ca), " +
        "jj AS (SELECT sp.g, sp.ng, sp.v, sp.cumall, COALESCE(pgv.c, 0) AS c " +
        "FROM sp LEFT JOIN pgv ON pgv.g = sp.g AND pgv.v = sp.v), " +
        "w AS (SELECT g, ng, cumall, " +
        "sum(c) OVER (PARTITION BY g ORDER BY v) AS cumg FROM jj), " +
        "dd AS (SELECT g, max(ng) AS ng, " +
        "max(abs(CAST(cumg AS HUGEINT) * (CAST(n AS HUGEINT) - CAST(ng AS HUGEINT)) - " +
        "(CAST(cumall AS HUGEINT) - CAST(cumg AS HUGEINT)) * CAST(ng AS HUGEINT))) AS dnum " +
        "FROM w, t GROUP BY g), " +
        "ks AS (SELECT g, ng, CAST(n AS BIGINT) - ng AS nrest, dnum FROM dd, t), " +
        "kr AS (SELECT g, ng, nrest, " +
        "floor(CAST(dnum AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE)) * 10000 + 0.5) / 10000 AS ks_d, " +
        "floor(least(1.0, 2.0 * exp(-2.0 * " +
        "(sqrt(CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE) / (CAST(ng AS DOUBLE) + CAST(nrest AS DOUBLE))) * " +
        "(CAST(dnum AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE)))) * " +
        "(sqrt(CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE) / (CAST(ng AS DOUBLE) + CAST(nrest AS DOUBLE))) * " +
        "(CAST(dnum AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS p " +
        "FROM ks), " +
        "rk AS (SELECT g, p, row_number() OVER (ORDER BY p, g) AS j, " +
        "count(*) OVER () AS m FROM kr), " +
        "mm AS (SELECT count(*) AS m FROM kr), " +
        "h AS (SELECT 1 AS i, CAST(1.0 AS DOUBLE) AS s " +
        "UNION ALL SELECT i + 1, s + 1.0 / CAST(i + 1 AS DOUBLE) " +
        "FROM h, mm WHERE i < mm.m), " +
        "cmx AS (SELECT s AS cm FROM h, mm WHERE h.i = mm.m), " +
        "wsr AS (SELECT g, p, j, " +
        "p * cm * CAST(m AS DOUBLE) / CAST(j AS DOUBLE) AS w FROM rk, cmx), " +
        "bh AS (SELECT g AS test_key, p AS p_value, CAST(j AS BIGINT) AS p_rank, " +
        "floor(least(1.0, min(w) OVER (ORDER BY j DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000 + 0.5) / 10000 AS p_adj " +
        "FROM wsr) " +
        "SELECT bh.test_key, CAST(kr.ng AS BIGINT) AS n_g, " +
        "CAST(floor(kr.ks_d * 10000 + 0.5) AS BIGINT) AS ks_d_bp, " +
        "CAST(floor(bh.p_value * 10000 + 0.5) AS BIGINT) AS p_bp, " +
        "bh.p_rank, " +
        "CAST(floor(bh.p_adj * 10000 + 0.5) AS BIGINT) AS p_adj_bp, " +
        "(CAST(floor(bh.p_adj * 10000 + 0.5) AS BIGINT) <= 1000) AS reject " +
        "FROM bh JOIN kr ON kr.g = bh.test_key"),

    "q273_sign_test" ->
      // q268's per-user difference; every mass one conditional sum, the
      // z chain spelled as Spark's
      ("WITH e AS (SELECT user_id, " +
        "CASE WHEN isodow(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS wk " +
        "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL), " +
        "u AS (SELECT user_id, 5 * sum(wk) - 2 * sum(1 - wk) AS d " +
        "FROM e GROUP BY user_id), " +
        "a AS (SELECT count(*) AS n_units, " +
        "COALESCE(sum(CASE WHEN d <> 0 THEN 1 ELSE 0 END), 0) AS nz, " +
        "COALESCE(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END), 0) AS np FROM u) " +
        "SELECT CAST(n_units AS BIGINT) AS n_units, " +
        "CAST(nz AS BIGINT) AS n_nonzero, CAST(np AS BIGINT) AS n_pos, " +
        "CAST(nz - np AS BIGINT) AS n_neg, " +
        "CASE WHEN nz > 0 THEN " +
        "CAST(floor((2.0 * CAST(np AS DOUBLE) - CAST(nz AS DOUBLE)) / " +
        "sqrt(CAST(nz AS DOUBLE)) * 10000 + 0.5) AS BIGINT) END AS z_bp FROM a"),

    "q272_durbin_watson" ->
      // same day-ordered series; Sum(dx)^2 and the m-scaled centered
      // denominator are exact HUGEINT folds, d ONE division
      ("WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
        "FROM events WHERE ts IS NOT NULL GROUP BY 1, 2), " +
        "a AS (SELECT event_type, list(n ORDER BY day) AS xs FROM d GROUP BY 1), " +
        "x0 AS (SELECT event_type, xs, CAST(len(xs) AS HUGEINT) AS mh, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), list_transform(xs, f -> " +
        "CAST(f AS HUGEINT))), (p, q) -> p + q) AS s FROM a), " +
        "x AS (SELECT event_type, CAST(mh AS BIGINT) AS m, mh, " +
        "CASE WHEN len(xs) > 1 THEN " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(range(2, CAST(len(xs) + 1 AS BIGINT)), j -> " +
        "CAST((xs[CAST(j AS INT)] - xs[CAST(j - 1 AS INT)]) * " +
        "(xs[CAST(j AS INT)] - xs[CAST(j - 1 AS INT)]) AS HUGEINT))), " +
        "(p, q) -> p + q) ELSE CAST(0 AS HUGEINT) END AS dn, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), list_transform(xs, e -> " +
        "(mh * CAST(e AS HUGEINT) - s) * (mh * CAST(e AS HUGEINT) - s))), " +
        "(p, q) -> p + q) AS c2 FROM x0) " +
        "SELECT event_type, CAST(m AS BIGINT) AS n_days, " +
        "CASE WHEN m > 1 AND c2 > 0 THEN " +
        "CAST(floor(CAST(mh * mh * dn AS DOUBLE) / CAST(c2 AS DOUBLE) * 10000 + 0.5) AS BIGINT) " +
        "END AS d_bp FROM x"),

    "q271_gwet_ac1" ->
      // the band contingency; po and the pooled prevalences are exact
      // integer rationals, pe folds pi(1-pi) in sorted category order,
      // the AC1 chain spelled as Spark's
      ("WITH base AS (SELECT " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok, " +
        "n_chars FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL), " +
        "r AS (SELECT CASE WHEN tok < 40 THEN 0 WHEN tok < 70 THEN 1 ELSE 2 END AS a, " +
        "CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 380 THEN 1 ELSE 2 END AS b FROM base), " +
        "ct AS (SELECT a, b, count(*) AS c FROM r GROUP BY a, b), " +
        "one AS (SELECT COALESCE(sum(c), 0) AS n, " +
        "COALESCE(sum(CASE WHEN a = b THEN c ELSE 0 END), 0) AS agree FROM ct), " +
        "cats AS (SELECT DISTINCT v FROM " +
        "(SELECT a AS v FROM ct UNION SELECT b AS v FROM ct)), " +
        "m AS (SELECT v, COALESCE((SELECT sum(c) FROM ct WHERE a = v), 0) + " +
        "COALESCE((SELECT sum(c) FROM ct WHERE b = v), 0) AS mm FROM cats), " +
        "l AS (SELECT list(struct_pack(v := v, mm := mm) ORDER BY v) AS ms, " +
        "count(*) AS k FROM m), " +
        "f AS (SELECT n, agree, k, " +
        "list_reduce(list_prepend(0.0, list_transform(ms, e -> " +
        "(CAST((e).mm AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))) * " +
        "(1.0 - CAST((e).mm AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))))), " +
        "(p, q) -> p + q) / (CAST(k AS DOUBLE) - 1) AS pe, " +
        "CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po FROM one, l) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_cats, " +
        "CASE WHEN n > 0 THEN CAST(floor(po * 10000 + 0.5) AS BIGINT) END AS po_bp, " +
        "CASE WHEN n > 0 AND k > 1 THEN CAST(floor(pe * 10000 + 0.5) AS BIGINT) END AS pe_bp, " +
        "CASE WHEN n > 0 AND k > 1 THEN " +
        "CAST(floor((po - pe) / (1.0 - pe) * 10000 + 0.5) AS BIGINT) END AS ac1_bp FROM f"),

    "q270_cohens_h" ->
      // q226's pass masses per side; the rates are exact-integer
      // divisions and the arcsine chain is spelled as Spark's
      ("WITH d AS (SELECT source, " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) * 20 >= " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) * 3 AS pass " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "a AS (SELECT count(*) AS na, COALESCE(sum(CASE WHEN pass THEN 1 ELSE 0 END), 0) AS ka " +
        "FROM d WHERE source = 'src0'), " +
        "b AS (SELECT count(*) AS nb, COALESCE(sum(CASE WHEN pass THEN 1 ELSE 0 END), 0) AS kb " +
        "FROM d WHERE source = 'src1'), " +
        "f AS (SELECT na, nb, ka, kb, " +
        "CAST(ka AS DOUBLE) / CAST(na AS DOUBLE) AS pa, " +
        "CAST(kb AS DOUBLE) / CAST(nb AS DOUBLE) AS pb FROM a, b) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CAST(ka AS BIGINT) AS k_a, CAST(kb AS BIGINT) AS k_b, " +
        "CASE WHEN na > 0 THEN CAST(floor(pa * 10000 + 0.5) AS BIGINT) END AS rate_a_bp, " +
        "CASE WHEN nb > 0 THEN CAST(floor(pb * 10000 + 0.5) AS BIGINT) END AS rate_b_bp, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor((2.0 * asin(sqrt(pa)) - 2.0 * asin(sqrt(pb))) * 10000 + 0.5) AS BIGINT) " +
        "END AS h_bp FROM f"),

    "q269_two_by_two" ->
      // the four masses by one conditional aggregate; OR/RR exact-ratio
      // divisions, the Woolf/Katz log-scale interval chains spelled as
      // Spark's
      ("WITH v AS (SELECT (isodow(CAST(ts AS DATE)) >= 6) AS x, " +
        "(event_type = 'purchase') AS y FROM events WHERE ts IS NOT NULL), " +
        "m AS (SELECT " +
        "COALESCE(sum(CASE WHEN x AND y THEN 1 ELSE 0 END), 0) AS n11, " +
        "COALESCE(sum(CASE WHEN x AND NOT y THEN 1 ELSE 0 END), 0) AS n10, " +
        "COALESCE(sum(CASE WHEN NOT x AND y THEN 1 ELSE 0 END), 0) AS n01, " +
        "COALESCE(sum(CASE WHEN NOT x AND NOT y THEN 1 ELSE 0 END), 0) AS n00 FROM v), " +
        "f AS (SELECT n11, n10, n01, n00, " +
        "CAST(n11 AS DOUBLE) AS a, CAST(n10 AS DOUBLE) AS b, " +
        "CAST(n01 AS DOUBLE) AS c, CAST(n00 AS DOUBLE) AS d FROM m), " +
        "g AS (SELECT n11, n10, n01, n00, a, b, c, d, " +
        "a * d / (b * c) AS orr, " +
        "sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d) AS seor, " +
        "(a / (a + b)) / (c / (c + d)) AS rr, " +
        "sqrt(1.0 / a - 1.0 / (a + b) + 1.0 / c - 1.0 / (c + d)) AS serr FROM f) " +
        "SELECT CAST(n11 AS BIGINT) AS n_11, CAST(n10 AS BIGINT) AS n_10, " +
        "CAST(n01 AS BIGINT) AS n_01, CAST(n00 AS BIGINT) AS n_00, " +
        "CASE WHEN n11 > 0 AND n10 > 0 AND n01 > 0 AND n00 > 0 THEN " +
        "CAST(floor(orr * 10000 + 0.5) AS BIGINT) END AS or_bp, " +
        "CASE WHEN n11 > 0 AND n10 > 0 AND n01 > 0 AND n00 > 0 THEN " +
        "CAST(floor(exp(ln(orr) - 1.96 * seor) * 10000 + 0.5) AS BIGINT) END AS or_lo_bp, " +
        "CASE WHEN n11 > 0 AND n10 > 0 AND n01 > 0 AND n00 > 0 THEN " +
        "CAST(floor(exp(ln(orr) + 1.96 * seor) * 10000 + 0.5) AS BIGINT) END AS or_hi_bp, " +
        "CASE WHEN n11 > 0 AND n01 > 0 THEN " +
        "CAST(floor(rr * 10000 + 0.5) AS BIGINT) END AS rr_bp, " +
        "CASE WHEN n11 > 0 AND n01 > 0 THEN " +
        "CAST(floor(exp(ln(rr) - 1.96 * serr) * 10000 + 0.5) AS BIGINT) END AS rr_lo_bp, " +
        "CASE WHEN n11 > 0 AND n01 > 0 THEN " +
        "CAST(floor(exp(ln(rr) + 1.96 * serr) * 10000 + 0.5) AS BIGINT) END AS rr_hi_bp FROM g"),

    "q268_signed_rank" ->
      // the per-user integer difference, the |d| histogram with doubled
      // midranks by window prefix, exact HUGEINT 2W+ and tie mass, the
      // z chain spelled as Spark's
      ("WITH e AS (SELECT user_id, " +
        "CASE WHEN isodow(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS wk " +
        "FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL), " +
        "u AS (SELECT user_id, 5 * sum(wk) - 2 * sum(1 - wk) AS d " +
        "FROM e GROUP BY user_id), " +
        "n0 AS (SELECT count(*) AS n_units FROM u), " +
        "h AS (SELECT abs(d) AS ad, count(*) AS c, " +
        "sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS cp FROM u " +
        "WHERE d <> 0 GROUP BY abs(d)), " +
        "w AS (SELECT c, cp, 2 * (sum(c) OVER (ORDER BY ad) - c) + c + 1 AS m2 FROM h), " +
        "a AS (SELECT COALESCE(sum(c), 0) AS nz, COALESCE(sum(cp), 0) AS np, " +
        "COALESCE(sum(CAST(cp AS HUGEINT) * CAST(m2 AS HUGEINT)), 0) AS w2, " +
        "COALESCE(sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT) * CAST(c AS HUGEINT) - " +
        "CAST(c AS HUGEINT)), 0) AS tt FROM w), " +
        "f AS (SELECT n_units, nz, np, w2, tt, CAST(nz AS DOUBLE) AS nd FROM n0, a) " +
        "SELECT CAST(n_units AS BIGINT) AS n_units, CAST(nz AS BIGINT) AS n_nonzero, " +
        "CAST(np AS BIGINT) AS n_pos, CAST(nz - np AS BIGINT) AS n_neg, " +
        "CASE WHEN nz > 0 AND " +
        "nd * (nd + 1) * (2.0 * nd + 1) / 6 - CAST(tt AS DOUBLE) / 12 > 0 THEN " +
        "CAST(floor((CAST(w2 AS DOUBLE) - nd * (nd + 1) / 2) / " +
        "sqrt(nd * (nd + 1) * (2.0 * nd + 1) / 6 - CAST(tt AS DOUBLE) / 12) * 10000 + 0.5) AS BIGINT) " +
        "END AS z_bp FROM f"),

    "q267_welch" ->
      // per-side integer moment sums; c2 = n*S2 - S1^2 exact, the t and
      // Welch-Satterthwaite dof chains spelled as Spark's
      ("WITH v AS (SELECT source, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "a AS (SELECT count(*) AS na, COALESCE(sum(CAST(v AS HUGEINT)), 0) AS sa, " +
        "COALESCE(sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)), 0) AS qa " +
        "FROM v WHERE source = 'src0'), " +
        "b AS (SELECT count(*) AS nb, COALESCE(sum(CAST(v AS HUGEINT)), 0) AS sb, " +
        "COALESCE(sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)), 0) AS qb " +
        "FROM v WHERE source <> 'src0'), " +
        "f AS (SELECT na, nb, sa, sb, " +
        "CAST(na AS HUGEINT) * qa - sa * sa AS c2a, " +
        "CAST(nb AS HUGEINT) * qb - sb * sb AS c2b, " +
        "CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd FROM a, b), " +
        "g AS (SELECT na, nb, c2a, c2b, nad, nbd, " +
        "CAST(sa AS DOUBLE) / nad AS ma, CAST(sb AS DOUBLE) / nbd AS mb, " +
        "CAST(c2a AS DOUBLE) / (nad * nad * (nad - 1)) AS va, " +
        "CAST(c2b AS DOUBLE) / (nbd * nbd * (nbd - 1)) AS vb FROM f) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CASE WHEN na > 0 THEN CAST(floor(ma * 10000 + 0.5) AS BIGINT) END AS mean_a_bp, " +
        "CASE WHEN nb > 0 THEN CAST(floor(mb * 10000 + 0.5) AS BIGINT) END AS mean_b_bp, " +
        "CASE WHEN na > 1 AND nb > 1 AND (c2a > 0 OR c2b > 0) THEN " +
        "CAST(floor((ma - mb) / sqrt(va + vb) * 10000 + 0.5) AS BIGINT) END AS t_bp, " +
        "CASE WHEN na > 1 AND nb > 1 AND (c2a > 0 OR c2b > 0) THEN " +
        "CAST(floor((va + vb) * (va + vb) / " +
        "(va * va / (nad - 1) + vb * vb / (nbd - 1)) * 10000 + 0.5) AS BIGINT) " +
        "END AS df_bp FROM g"),

    "q266_auc_ci" ->
      // q207's score/label CTE collapsed to the per-score histogram; the
      // doubled placements 2*negBelow + negTied are exact HUGEINT per
      // class, both variances clear to integer numerators, the AUC/SE
      // chain spelled as Spark's
      ("WITH v AS (SELECT doc_id AS id, " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS DOUBLE) / " +
        "len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS s, " +
        "(source = 'src0') AS l FROM documents " +
        "WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "h AS (SELECT s, count(*) AS hc, " +
        "sum(CASE WHEN l THEN 1 ELSE 0 END) AS hp FROM v GROUP BY s), " +
        "w AS (SELECT s, hc, hp, sum(hc) OVER (ORDER BY s) - hc AS pfa, " +
        "sum(hp) OVER (ORDER BY s) - hp AS pfp FROM h), " +
        "t0 AS (SELECT CAST(sum(hp) AS BIGINT) AS p, " +
        "CAST(sum(hc - hp) AS BIGINT) AS ng, " +
        "sum(CAST(hp AS HUGEINT) * CAST(2 * (pfa - pfp) + (hc - hp) AS HUGEINT)) AS s1, " +
        "sum(CAST(hp AS HUGEINT) * CAST(2 * (pfa - pfp) + (hc - hp) AS HUGEINT) * " +
        "CAST(2 * (pfa - pfp) + (hc - hp) AS HUGEINT)) AS q1 FROM w), " +
        "t1 AS (SELECT p, ng, s1, q1, " +
        "sum(CAST(hc - hp AS HUGEINT) * CAST(2 * p - 2 * pfp - hp AS HUGEINT)) AS s0, " +
        "sum(CAST(hc - hp AS HUGEINT) * CAST(2 * p - 2 * pfp - hp AS HUGEINT) * " +
        "CAST(2 * p - 2 * pfp - hp AS HUGEINT)) AS q0 " +
        "FROM w, t0 GROUP BY p, ng, s1, q1), " +
        "f AS (SELECT p, ng, " +
        "CAST(s1 AS DOUBLE) / (2.0 * CAST(ng AS DOUBLE) * CAST(p AS DOUBLE)) AS auc, " +
        "CAST(CAST(p AS HUGEINT) * q1 - s1 * s1 AS DOUBLE) / " +
        "(CAST(p AS DOUBLE) * (CAST(p AS DOUBLE) - 1)) / " +
        "(4.0 * CAST(ng AS DOUBLE) * CAST(ng AS DOUBLE)) AS s10, " +
        "CAST(CAST(ng AS HUGEINT) * q0 - s0 * s0 AS DOUBLE) / " +
        "(CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) - 1)) / " +
        "(4.0 * CAST(p AS DOUBLE) * CAST(p AS DOUBLE)) AS s01 FROM t1), " +
        "z AS (SELECT p, ng, auc, " +
        "sqrt(s10 / CAST(p AS DOUBLE) + s01 / CAST(ng AS DOUBLE)) AS se FROM f) " +
        "SELECT p AS n_pos, ng AS n_neg, " +
        "CASE WHEN p > 0 AND ng > 0 THEN CAST(floor(auc * 10000 + 0.5) AS BIGINT) END AS auc_bp, " +
        "CASE WHEN p > 1 AND ng > 1 THEN CAST(floor(se * 10000 + 0.5) AS BIGINT) END AS se_bp, " +
        "CASE WHEN p > 1 AND ng > 1 THEN " +
        "CAST(floor(greatest(0.0, auc - 1.96 * se) * 10000 + 0.5) AS BIGINT) END AS lo_bp, " +
        "CASE WHEN p > 1 AND ng > 1 THEN " +
        "CAST(floor(least(1.0, auc + 1.96 * se) * 10000 + 0.5) AS BIGINT) END AS hi_bp FROM z"),

    "q265_assoc_card" ->
      // the densified source x band cross with integer margins attached,
      // folded in ascending (a, b) order; chi2/G/V chains spelled as
      // Spark's, G skipping observed-zero cells
      ("WITH base AS (SELECT source AS a, " +
        "CASE WHEN CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) < 40 THEN 0 " +
        "WHEN CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) < 70 THEN 1 " +
        "ELSE 2 END AS b FROM documents " +
        "WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "obs AS (SELECT a, b, count(*) AS o FROM base GROUP BY a, b), " +
        "cr AS (SELECT ca.a, cb.b FROM (SELECT DISTINCT a FROM obs) ca, " +
        "(SELECT DISTINCT b FROM obs) cb), " +
        "cells AS (SELECT cr.a, cr.b, COALESCE(obs.o, 0) AS o FROM cr " +
        "LEFT JOIN obs ON obs.a = cr.a AND obs.b = cr.b), " +
        "ma AS (SELECT a, sum(o) AS ra FROM cells GROUP BY a), " +
        "mb AS (SELECT b, sum(o) AS cb2 FROM cells GROUP BY b), " +
        "one AS (SELECT list(struct_pack(a := c.a, b := c.b, o := c.o, " +
        "ra := ma.ra, cb := mb.cb2) ORDER BY c.a, c.b) AS cs, " +
        "COALESCE(sum(c.o), 0) AS n, count(DISTINCT c.a) AS ka, " +
        "count(DISTINCT c.b) AS kb " +
        "FROM cells c JOIN ma ON ma.a = c.a JOIN mb ON mb.b = c.b), " +
        "f AS (SELECT n, ka, kb, CAST(n AS DOUBLE) AS nn, " +
        "list_reduce(list_prepend(0.0, list_transform(cs, e -> " +
        "(CAST((e).ra AS DOUBLE) * CAST((e).cb AS DOUBLE) / CAST(n AS DOUBLE) - CAST((e).o AS DOUBLE)) * " +
        "(CAST((e).ra AS DOUBLE) * CAST((e).cb AS DOUBLE) / CAST(n AS DOUBLE) - CAST((e).o AS DOUBLE)) / " +
        "(CAST((e).ra AS DOUBLE) * CAST((e).cb AS DOUBLE) / CAST(n AS DOUBLE)))), (p, q) -> p + q) AS chi2, " +
        "2.0 * list_reduce(list_prepend(0.0, list_transform(cs, e -> " +
        "CASE WHEN (e).o > 0 THEN CAST((e).o AS DOUBLE) * ln(CAST((e).o AS DOUBLE) / " +
        "(CAST((e).ra AS DOUBLE) * CAST((e).cb AS DOUBLE) / CAST(n AS DOUBLE))) " +
        "ELSE 0.0 END)), (p, q) -> p + q) AS g FROM one) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(ka AS BIGINT) AS k_a, " +
        "CAST(kb AS BIGINT) AS k_b, " +
        "CASE WHEN n > 0 AND ka > 1 AND kb > 1 THEN " +
        "CAST((ka - 1) * (kb - 1) AS BIGINT) END AS dof, " +
        "CASE WHEN n > 0 AND ka > 1 AND kb > 1 THEN " +
        "CAST(floor(chi2 * 10000 + 0.5) AS BIGINT) END AS chi2_bp, " +
        "CASE WHEN n > 0 AND ka > 1 AND kb > 1 THEN " +
        "CAST(floor(g * 10000 + 0.5) AS BIGINT) END AS g_bp, " +
        "CASE WHEN n > 0 AND ka > 1 AND kb > 1 THEN " +
        "CAST(floor(sqrt(chi2 / (nn * (CAST(least(ka, kb) AS DOUBLE) - 1))) * 10000 + 0.5) AS BIGINT) " +
        "END AS cramers_v_bp FROM f"),

    "q264_krippendorff" ->
      // q228's band CTEs; the per-row ordered-pair disagreement and the
      // pooled-histogram pair fold both exact HUGEINT, alpha ONE division
      ("WITH base AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS den, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok, " +
        "n_chars FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL), " +
        "r AS (SELECT " +
        "CASE WHEN num * 10 < den THEN 0 WHEN num * 5 < den THEN 1 ELSE 2 END AS r0, " +
        "CASE WHEN tok < 40 THEN 0 WHEN tok < 70 THEN 1 ELSE 2 END AS r1, " +
        "CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 380 THEN 1 ELSE 2 END AS r2 FROM base), " +
        "one AS (SELECT count(*) AS n, COALESCE(sum(CAST(2 * " +
        "(((r0 - r1) * (r0 - r1)) + ((r0 - r2) * (r0 - r2)) + " +
        "((r1 - r2) * (r1 - r2))) AS HUGEINT)), 0) AS onum FROM r), " +
        "pool AS (SELECT v, count(*) AS c FROM " +
        "(SELECT r0 AS v FROM r UNION ALL SELECT r1 FROM r " +
        "UNION ALL SELECT r2 FROM r) GROUP BY v), " +
        "pl AS (SELECT list(struct_pack(v := v, c := c) ORDER BY v) AS vs, " +
        "count(*) AS k FROM pool), " +
        "e AS (SELECT n, onum, k, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), list_transform(vs, e1 -> " +
        "CAST((e1).c AS HUGEINT) * list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(vs, e2 -> CAST((e2).c AS HUGEINT) * " +
        "CAST(((e1).v - (e2).v) * ((e1).v - (e2).v) AS HUGEINT))), " +
        "(p, q) -> p + q))), (p, q) -> p + q) AS esum FROM one, pl) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(3 AS BIGINT) AS m_raters, " +
        "CAST(k AS BIGINT) AS k_vals, " +
        "CASE WHEN n > 0 AND esum > 0 THEN " +
        "CAST(floor((1.0 - CAST(onum * (CAST(n AS HUGEINT) * 3) * " +
        "(CAST(n AS HUGEINT) * 3 - 1) AS DOUBLE) / " +
        "CAST(CAST(n AS HUGEINT) * 6 * esum AS DOUBLE)) * 10000 + 0.5) AS BIGINT) " +
        "END AS alpha_bp FROM e"),

    "q263_distinct_n" ->
      // the same whitespace tokenizer; n-grams by in-list slices, one
      // grouped exact distinct per order, the ratio ONE division
      ("WITH d AS (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t " +
        "FROM documents WHERE text IS NOT NULL AND trim(text) <> ''), " +
        "u AS (SELECT 1 AS n, unnest(t) AS g FROM d " +
        "UNION ALL SELECT 2 AS n, unnest(CASE WHEN len(t) >= 2 THEN " +
        "list_transform(range(1, len(t)), i -> " +
        "array_to_string(list_slice(t, i, i + 1), ' ')) ELSE [] END) AS g FROM d " +
        "UNION ALL SELECT 3 AS n, unnest(CASE WHEN len(t) >= 3 THEN " +
        "list_transform(range(1, len(t) - 1), i -> " +
        "array_to_string(list_slice(t, i, i + 2), ' ')) ELSE [] END) AS g FROM d) " +
        "SELECT CAST(n AS BIGINT) AS n, count(*) AS total_ngrams, " +
        "count(DISTINCT g) AS distinct_ngrams, " +
        "CAST(floor(CAST(count(DISTINCT g) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS distinct_bp " +
        "FROM u GROUP BY n"),

    "q262_bowker" ->
      // the (tok band, char band) contingency by conditional sums; the
      // three ascending-pair terms folded in the engine's spelled order
      ("WITH base AS (SELECT " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok, " +
        "n_chars FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL), " +
        "r AS (SELECT CASE WHEN tok < 40 THEN 0 WHEN tok < 70 THEN 1 ELSE 2 END AS a, " +
        "CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 380 THEN 1 ELSE 2 END AS b FROM base), " +
        "m AS (SELECT COALESCE(count(*), 0) AS n, " +
        "COALESCE(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END), 0) AS n01, " +
        "COALESCE(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END), 0) AS n10, " +
        "COALESCE(sum(CASE WHEN a = 0 AND b = 2 THEN 1 ELSE 0 END), 0) AS n02, " +
        "COALESCE(sum(CASE WHEN a = 2 AND b = 0 THEN 1 ELSE 0 END), 0) AS n20, " +
        "COALESCE(sum(CASE WHEN a = 1 AND b = 2 THEN 1 ELSE 0 END), 0) AS n12, " +
        "COALESCE(sum(CASE WHEN a = 2 AND b = 1 THEN 1 ELSE 0 END), 0) AS n21 FROM r), " +
        "f AS (SELECT n, " +
        "(CASE WHEN n01 + n10 > 0 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN n02 + n20 > 0 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN n12 + n21 > 0 THEN 1 ELSE 0 END) AS dfb, " +
        "(CASE WHEN n01 + n10 > 0 THEN CAST((n01 - n10) * (n01 - n10) AS DOUBLE) / " +
        "CAST(n01 + n10 AS DOUBLE) ELSE 0.0 END) + " +
        "(CASE WHEN n02 + n20 > 0 THEN CAST((n02 - n20) * (n02 - n20) AS DOUBLE) / " +
        "CAST(n02 + n20 AS DOUBLE) ELSE 0.0 END) + " +
        "(CASE WHEN n12 + n21 > 0 THEN CAST((n12 - n21) * (n12 - n21) AS DOUBLE) / " +
        "CAST(n12 + n21 AS DOUBLE) ELSE 0.0 END) AS chi2 FROM m), " +
        // k_cats from the OBSERVED category union (the q271 AC1 oracle's
        // discipline) — the engine reports the categories actually seen,
        // so a hardcoded 3 would fail spuriously on a corpus where one
        // band is unpopulated (r15 ADVICE); chi2/df_b already agree
        // because zero-mass pairs drop on both sides
        "kc AS (SELECT count(*) AS k FROM " +
        "(SELECT a AS c FROM r UNION SELECT b FROM r) u) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_cats, " +
        "CASE WHEN dfb > 0 THEN CAST(dfb AS BIGINT) END AS df_b, " +
        "CASE WHEN dfb > 0 THEN CAST(floor(chi2 * 10000 + 0.5) AS BIGINT) " +
        "END AS chi2_bp FROM f, kc"),

    "q261_stuart_maxwell" ->
      // the same contingency by conditional sums; the closed-form 2x2
      // inverse gives chi2 as ONE division of exact HUGEINT integers,
      // p = exp(-chi2/2) on the even dof 2
      ("WITH base AS (SELECT " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok, " +
        "n_chars FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL), " +
        "r AS (SELECT CASE WHEN tok < 40 THEN 0 WHEN tok < 70 THEN 1 ELSE 2 END AS a, " +
        "CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 380 THEN 1 ELSE 2 END AS b FROM base), " +
        "m AS (SELECT COALESCE(count(*), 0) AS n, " +
        "COALESCE(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END), 0) AS r1, " +
        "COALESCE(sum(CASE WHEN a = 2 THEN 1 ELSE 0 END), 0) AS r2, " +
        "COALESCE(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END), 0) AS c1, " +
        "COALESCE(sum(CASE WHEN b = 2 THEN 1 ELSE 0 END), 0) AS c2, " +
        "COALESCE(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END), 0) AS n11, " +
        "COALESCE(sum(CASE WHEN a = 2 AND b = 2 THEN 1 ELSE 0 END), 0) AS n22, " +
        "COALESCE(sum(CASE WHEN a = 1 AND b = 2 THEN 1 ELSE 0 END), 0) AS n12, " +
        "COALESCE(sum(CASE WHEN a = 2 AND b = 1 THEN 1 ELSE 0 END), 0) AS n21 FROM r), " +
        "s AS (SELECT n, r1 - c1 AS d1, r2 - c2 AS d2, " +
        "CAST(r1 + c1 - 2 * n11 AS HUGEINT) AS s11, " +
        "CAST(r2 + c2 - 2 * n22 AS HUGEINT) AS s22, " +
        "CAST(-(n12 + n21) AS HUGEINT) AS s12 FROM m), " +
        "f AS (SELECT n, d1, d2, " +
        "CAST(d1 AS HUGEINT) * CAST(d1 AS HUGEINT) * s22 - " +
        "2 * CAST(d1 AS HUGEINT) * CAST(d2 AS HUGEINT) * s12 + " +
        "CAST(d2 AS HUGEINT) * CAST(d2 AS HUGEINT) * s11 AS num, " +
        "s11 * s22 - s12 * s12 AS den FROM s) " +
        "SELECT CAST(n AS BIGINT) AS n, " +
        "CASE WHEN n > 0 THEN CAST(d1 AS BIGINT) END AS d1, " +
        "CASE WHEN n > 0 THEN CAST(d2 AS BIGINT) END AS d2, " +
        "CASE WHEN n > 0 AND den > 0 THEN " +
        "CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS chi2_bp, " +
        "CASE WHEN n > 0 AND den > 0 THEN " +
        "CAST(floor(exp(-((CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) / 2)) * 10000 + 0.5) AS BIGINT) " +
        "END AS p_bp FROM f"),

    "q260_composition" ->
      // the bounded per-source count list in sorted group order; HHI and
      // Simpson as exact HUGEINT ratios (one division each), Shannon as
      // the same fixed-order fold, Hill = exp(H)
      ("WITH pg AS (SELECT source AS g, count(*) AS n FROM documents " +
        "WHERE source IS NOT NULL GROUP BY 1), " +
        "one AS (SELECT list(struct_pack(g := g, n := n) ORDER BY g) AS gs, " +
        "COALESCE(sum(n), 0) AS n, count(*) AS k, " +
        "COALESCE(sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)), 0) AS sq, " +
        "COALESCE(sum(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1)), 0) AS pp, " +
        "COALESCE(max(n), 0) AS top FROM pg), " +
        "f AS (SELECT n, k, sq, pp, top, CAST(n AS DOUBLE) AS nd, " +
        "-list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "(CAST((e).n AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "ln(CAST((e).n AS DOUBLE) / CAST(n AS DOUBLE)))), (a, b) -> a + b) AS h " +
        "FROM one) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups, " +
        "CASE WHEN n > 0 THEN CAST(floor(CAST(top AS DOUBLE) / nd * 10000 + 0.5) AS BIGINT) END AS top_share_bp, " +
        "CASE WHEN n > 0 THEN CAST(floor(CAST(sq AS DOUBLE) / " +
        "CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS hhi_bp, " +
        "CASE WHEN n > 1 THEN CAST(floor(CAST(pp AS DOUBLE) / " +
        "CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1) AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS simpson_bp, " +
        "CASE WHEN n > 0 THEN CAST(floor(h * 10000 + 0.5) AS BIGINT) END AS shannon_bp, " +
        "CASE WHEN n > 0 THEN CAST(floor(exp(h) * 10000 + 0.5) AS BIGINT) END AS hill1_bp FROM f"),

    "q259_weighted_kappa" ->
      // q228's band CTEs; the observed weighted mass and the margin
      // cross rewritten as the cell-pair double fold, both exact
      // HUGEINT, ONE division
      ("WITH base AS (SELECT " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok, " +
        "n_chars FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL), " +
        "r AS (SELECT CASE WHEN tok < 40 THEN 0 WHEN tok < 70 THEN 1 ELSE 2 END AS a, " +
        "CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 380 THEN 1 ELSE 2 END AS b FROM base), " +
        "ct AS (SELECT a, b, count(*) AS c FROM r GROUP BY a, b), " +
        "one AS (SELECT list(struct_pack(a := a, b := b, c := c) ORDER BY a, b) AS cs, " +
        "sum(c) AS n, " +
        "COALESCE(sum(CAST(c AS HUGEINT) * CAST((a - b) * (a - b) AS HUGEINT)), 0) AS onum, " +
        "count(DISTINCT a) AS k_a, count(DISTINCT b) AS k_b FROM ct), " +
        "e AS (SELECT n, onum, k_a, k_b, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), list_transform(cs, e1 -> " +
        "CAST((e1).c AS HUGEINT) * list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(cs, e2 -> CAST((e2).c AS HUGEINT) * " +
        "CAST(((e1).a - (e2).b) * ((e1).a - (e2).b) AS HUGEINT))), " +
        "(p, q) -> p + q))), (p, q) -> p + q) AS esum FROM one) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(k_a AS BIGINT) AS k_a, " +
        "CAST(k_b AS BIGINT) AS k_b, " +
        "CASE WHEN esum > 0 THEN CAST(floor((1.0 - CAST(n AS DOUBLE) * " +
        "CAST(onum AS DOUBLE) / CAST(esum AS DOUBLE)) * 10000 + 0.5) AS BIGINT) " +
        "END AS kappa_w_bp FROM e"),

    "q258_holm_screen" ->
      // q232's per-group KS spine verbatim; the Holm step-down swaps
      // BH's suffix-min of p*m/i for the prefix-max of p*(m-i+1)
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DOUBLE) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "pgv AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v), " +
        "pv AS (SELECT v, sum(c) AS cv FROM pgv GROUP BY v), " +
        "gr AS (SELECT g, sum(c) AS ng FROM pgv GROUP BY g), " +
        "t AS (SELECT sum(cv) AS n FROM pv), " +
        "ca AS (SELECT v, sum(cv) OVER (ORDER BY v) AS cumall FROM pv), " +
        "sp AS (SELECT gr.g, gr.ng, ca.v, ca.cumall FROM gr, ca), " +
        "jj AS (SELECT sp.g, sp.ng, sp.v, sp.cumall, COALESCE(pgv.c, 0) AS c " +
        "FROM sp LEFT JOIN pgv ON pgv.g = sp.g AND pgv.v = sp.v), " +
        "w AS (SELECT g, ng, cumall, " +
        "sum(c) OVER (PARTITION BY g ORDER BY v) AS cumg FROM jj), " +
        "dd AS (SELECT g, max(ng) AS ng, " +
        "max(abs(CAST(cumg AS HUGEINT) * (CAST(n AS HUGEINT) - CAST(ng AS HUGEINT)) - " +
        "(CAST(cumall AS HUGEINT) - CAST(cumg AS HUGEINT)) * CAST(ng AS HUGEINT))) AS dnum " +
        "FROM w, t GROUP BY g), " +
        "ks AS (SELECT g, ng, CAST(n AS BIGINT) - ng AS nrest, dnum FROM dd, t), " +
        "kr AS (SELECT g, ng, nrest, " +
        "floor(CAST(dnum AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE)) * 10000 + 0.5) / 10000 AS ks_d, " +
        "floor(least(1.0, 2.0 * exp(-2.0 * " +
        "(sqrt(CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE) / (CAST(ng AS DOUBLE) + CAST(nrest AS DOUBLE))) * " +
        "(CAST(dnum AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE)))) * " +
        "(sqrt(CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE) / (CAST(ng AS DOUBLE) + CAST(nrest AS DOUBLE))) * " +
        "(CAST(dnum AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(nrest AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS p " +
        "FROM ks), " +
        "rk AS (SELECT g, p, row_number() OVER (ORDER BY p, g) AS j, " +
        "count(*) OVER () AS m FROM kr), " +
        "wsr AS (SELECT g, p, j, " +
        "p * (CAST(m AS DOUBLE) - CAST(j AS DOUBLE) + 1) AS w FROM rk), " +
        "hm AS (SELECT g AS test_key, p AS p_value, CAST(j AS BIGINT) AS p_rank, " +
        "floor(least(1.0, max(w) OVER (ORDER BY j " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000 + 0.5) / 10000 AS p_adj " +
        "FROM wsr) " +
        "SELECT hm.test_key, CAST(kr.ng AS BIGINT) AS n_g, " +
        "CAST(floor(kr.ks_d * 10000 + 0.5) AS BIGINT) AS ks_d_bp, " +
        "CAST(floor(hm.p_value * 10000 + 0.5) AS BIGINT) AS p_bp, " +
        "hm.p_rank, " +
        "CAST(floor(hm.p_adj * 10000 + 0.5) AS BIGINT) AS p_adj_bp, " +
        "(CAST(floor(hm.p_adj * 10000 + 0.5) AS BIGINT) <= 500) AS reject " +
        "FROM hm JOIN kr ON kr.g = hm.test_key"),

    "q257_jarque_bera" ->
      // the per-(source, value) histogram in sorted value order; mu one
      // division, each central moment a fixed-order fold, the JB chain
      // and the closed-form chi2(2) survival spelled as Spark's
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DOUBLE) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "cells AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v), " +
        "pg AS (SELECT g, list(struct_pack(v := v, c := c) ORDER BY v) AS cs, " +
        "sum(c) AS n FROM cells GROUP BY g), " +
        "f AS (SELECT g, n, cs, CAST(n AS DOUBLE) AS nd, " +
        "list_reduce(list_prepend(0.0, list_transform(cs, e -> " +
        "CAST((e).c AS DOUBLE) * (e).v)), (a, b) -> a + b) / CAST(n AS DOUBLE) AS mu FROM pg), " +
        "m AS (SELECT g, n, nd, " +
        "list_reduce(list_prepend(0.0, list_transform(cs, e -> " +
        "CAST((e).c AS DOUBLE) * (((e).v - mu) * ((e).v - mu)))), (a, b) -> a + b) / nd AS m2, " +
        "list_reduce(list_prepend(0.0, list_transform(cs, e -> " +
        "CAST((e).c AS DOUBLE) * ((((e).v - mu) * ((e).v - mu)) * ((e).v - mu)))), (a, b) -> a + b) / nd AS m3, " +
        "list_reduce(list_prepend(0.0, list_transform(cs, e -> " +
        "CAST((e).c AS DOUBLE) * (((((e).v - mu) * ((e).v - mu)) * ((e).v - mu)) * ((e).v - mu)))), (a, b) -> a + b) / nd AS m4 " +
        "FROM f), " +
        "s AS (SELECT g, n, nd, m2, " +
        "m3 / ((sqrt(m2) * sqrt(m2)) * sqrt(m2)) AS skew, " +
        "m4 / (m2 * m2) - 3 AS kurt FROM m), " +
        "jb AS (SELECT g, n, m2, skew, kurt, " +
        "nd / 6 * (skew * skew + kurt * kurt / 4) AS jbv FROM s) " +
        "SELECT g AS group_key, CAST(n AS BIGINT) AS n_g, " +
        "CASE WHEN n > 1 AND m2 > 0 THEN CAST(floor(skew * 10000 + 0.5) AS BIGINT) END AS skew_bp, " +
        "CASE WHEN n > 1 AND m2 > 0 THEN CAST(floor(kurt * 10000 + 0.5) AS BIGINT) END AS kurt_bp, " +
        "CASE WHEN n > 1 AND m2 > 0 THEN CAST(floor(jbv * 10000 + 0.5) AS BIGINT) END AS jb_bp, " +
        "CASE WHEN n > 1 AND m2 > 0 THEN CAST(floor(exp(-(jbv / 2)) * 10000 + 0.5) AS BIGINT) END AS p_bp FROM jb"),

    "q256_bartlett" ->
      // per-source integer variance numerators c2 = n*S2 - S1^2, the
      // pooled sum as one division per group over the sorted group list,
      // ln folds in fixed order, the T/C chain spelled as Spark's
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "pg AS (SELECT g, count(*) AS n, sum(CAST(v AS HUGEINT)) AS s1, " +
        "sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s2 FROM v GROUP BY g), " +
        "pc AS (SELECT g, n, CAST(n AS HUGEINT) * s2 - s1 * s1 AS c2 " +
        "FROM pg WHERE n >= 2), " +
        "one AS (SELECT list(struct_pack(g := g, n := n, c2 := c2) ORDER BY g) AS gs, " +
        "sum(n) AS n, count(*) AS k FROM pc), " +
        "f AS (SELECT n, k, CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).c2 AS DOUBLE) / CAST((e).n AS DOUBLE))), (a, b) -> a + b) AS pooled, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "(CAST((e).n AS DOUBLE) - 1) * ln(CAST((e).c2 AS DOUBLE) / " +
        "(CAST((e).n AS DOUBLE) * (CAST((e).n AS DOUBLE) - 1))))), (a, b) -> a + b) AS lnsum, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "1.0 / (CAST((e).n AS DOUBLE) - 1))), (a, b) -> a + b) AS invsum, " +
        "list_min(list_transform(gs, e -> (e).c2)) AS minc2 FROM one) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups, " +
        "CASE WHEN k > 1 THEN CAST(k - 1 AS BIGINT) END AS df_t, " +
        "CASE WHEN k > 1 AND minc2 > 0 THEN " +
        "CAST(floor(((nd - kd) * ln(pooled / (nd - kd)) - lnsum) / " +
        "(1.0 + (invsum - 1.0 / (nd - kd)) / (3.0 * (kd - 1))) * 10000 + 0.5) AS BIGINT) " +
        "END AS t_bp FROM f"),

    "q255_dunn_posthoc" ->
      // q234's midrank CTEs verbatim; pairs by a < b self-join of the
      // bounded per-group table, the exact HUGEINT rank-difference and
      // variance numerators, the z chain spelled as Spark's
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DOUBLE) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "pgv AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v), " +
        "pv AS (SELECT v, sum(c) AS cv FROM pgv GROUP BY v), " +
        "m2 AS (SELECT v, 2 * (sum(cv) OVER (ORDER BY v) - cv) + cv + 1 AS m2, " +
        "CAST(cv AS HUGEINT) * CAST(cv AS HUGEINT) * CAST(cv AS HUGEINT) - CAST(cv AS HUGEINT) AS t3 FROM pv), " +
        "tt AS (SELECT COALESCE(sum(t3), 0) AS tt FROM m2), " +
        "pg AS (SELECT g, sum(c) AS ng, " +
        "sum(CAST(c AS HUGEINT) * CAST(m2 AS HUGEINT)) AS r2 " +
        "FROM pgv JOIN m2 USING (v) GROUP BY g), " +
        "tot AS (SELECT sum(ng) AS n FROM pg), " +
        "vv AS (SELECT n, CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) + 1) * " +
        "(CAST(n AS HUGEINT) - 1) - tt AS ve FROM tot, tt), " +
        "pr AS (SELECT a.g AS group_a, b.g AS group_b, a.ng AS na, b.ng AS nb, " +
        "a.r2 * CAST(b.ng AS HUGEINT) - b.r2 * CAST(a.ng AS HUGEINT) AS dnum " +
        "FROM pg a JOIN pg b ON a.g < b.g), " +
        "zz AS (SELECT group_a, group_b, na, nb, " +
        "CASE WHEN n > 1 AND ve > 0 THEN " +
        "CAST(floor((CAST(dnum AS DOUBLE) / (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) / " +
        "sqrt(CAST(ve AS DOUBLE) / (12.0 * (CAST(n AS DOUBLE) - 1)) * " +
        "(CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) / " +
        "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) * 10000 + 0.5) AS BIGINT) END AS z_bp " +
        "FROM pr, vv) " +
        "SELECT group_a, group_b, CAST(na AS BIGINT) AS n_a, " +
        "CAST(nb AS BIGINT) AS n_b, z_bp, " +
        "CASE WHEN z_bp IS NOT NULL THEN abs(z_bp) >= 32905 END AS reject FROM zz"),

    "q254_runs_test" ->
      // same day-ordered series; doubled-median banding keeps the
      // above/below split integer-exact, ties drop, runs count by
      // adjacent-sign compares, the normal z spelled as Spark's
      ("WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
        "FROM events WHERE ts IS NOT NULL GROUP BY 1, 2), " +
        "a AS (SELECT event_type, list(n ORDER BY day) AS xs FROM d GROUP BY 1), " +
        "x AS (SELECT event_type, xs, len(xs) AS m, list_sort(xs) AS sv FROM a), " +
        "y AS (SELECT event_type, m, xs, " +
        "sv[CAST((m + 1) // 2 AS INT)] + sv[CAST((m + 2) // 2 AS INT)] AS m2 FROM x), " +
        "s AS (SELECT event_type, m, " +
        "list_filter(list_transform(xs, e -> " +
        "CASE WHEN e * 2 > m2 THEN 1 WHEN e * 2 < m2 THEN -1 ELSE 0 END), " +
        "v -> v <> 0) AS sg FROM y), " +
        "t AS (SELECT event_type, m, sg, len(sg) AS ln, " +
        "CAST(len(list_filter(sg, v -> v > 0)) AS BIGINT) AS n1 FROM s), " +
        "u AS (SELECT event_type, m, n1, CAST(ln AS BIGINT) - n1 AS n2, " +
        "CASE WHEN ln > 1 THEN 1 + list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(range(2, CAST(ln + 1 AS BIGINT)), i -> " +
        "CAST(CASE WHEN sg[CAST(i AS INT)] <> sg[CAST(i - 1 AS INT)] " +
        "THEN 1 ELSE 0 END AS BIGINT))), (p, q) -> p + q) " +
        "WHEN ln = 1 THEN 1 ELSE 0 END AS r FROM t), " +
        "v AS (SELECT event_type, m, n1, n2, r, CAST(n1 AS DOUBLE) AS n1d, " +
        "CAST(n2 AS DOUBLE) AS n2d, CAST(n1 + n2 AS DOUBLE) AS nd FROM u) " +
        "SELECT event_type, CAST(m AS BIGINT) AS n_days, n1 AS n_above, " +
        "n2 AS n_below, CAST(r AS BIGINT) AS n_runs, " +
        "CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1 " +
        "AND 2 * n1 * n2 > n1 + n2 THEN " +
        "CAST(floor((CAST(r AS DOUBLE) - (1.0 + 2.0 * n1d * n2d / nd)) / " +
        "sqrt(2.0 * n1d * n2d * (2.0 * n1d * n2d - nd) / " +
        "(nd * nd * (nd - 1))) * 10000 + 0.5) AS BIGINT) END AS z_bp FROM v"),

    "q253_ljung_box" ->
      // same day-ordered series; the m-centered values m*x_i - S and
      // every lag's autocovariance numerator as exact HUGEINT folds (the
      // m^2 factors cancel in each rho ratio), the k-ascending Q fold
      // and the even-dof chi-square survival spelled as Spark's
      ("WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
        "FROM events WHERE ts IS NOT NULL GROUP BY 1, 2), " +
        "a AS (SELECT event_type, list(n ORDER BY day) AS xs FROM d GROUP BY 1), " +
        "x0 AS (SELECT event_type, xs, CAST(len(xs) AS HUGEINT) AS mh, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), list_transform(xs, f -> " +
        "CAST(f AS HUGEINT))), (p, q) -> p + q) AS s FROM a), " +
        "x AS (SELECT event_type, CAST(mh AS BIGINT) AS m, " +
        "list_transform(xs, e -> mh * CAST(e AS HUGEINT) - s) AS cx FROM x0), " +
        "y AS (SELECT event_type, m, CAST(m AS DOUBLE) AS md, cx, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(range(1, m + 1), i -> " +
        "cx[CAST(i AS INT)] * cx[CAST(i AS INT)])), (p, q) -> p + q) AS den FROM x), " +
        "z AS (SELECT event_type, m, md, cx, den, " +
        "CASE WHEN den > 0 THEN CAST(den AS DOUBLE) ELSE 1.0 END AS dens, " +
        "list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(range(1, m), i -> " +
        "cx[CAST(i AS INT)] * cx[CAST(i + 1 AS INT)])), (p, q) -> p + q) AS num1 FROM y), " +
        "q AS (SELECT event_type, m, den, dens, num1, " +
        "md * (md + 2) * list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(range(1, 7), k -> " +
        "(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(range(1, m - k + 1), i -> " +
        "cx[CAST(i AS INT)] * cx[CAST(i + k AS INT)])), (p, q) -> p + q) AS DOUBLE) / dens) * " +
        "(CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
        "list_transform(range(1, m - k + 1), i -> " +
        "cx[CAST(i AS INT)] * cx[CAST(i + k AS INT)])), (p, q) -> p + q) AS DOUBLE) / dens) / " +
        "(md - CAST(k AS DOUBLE)))), (p, q) -> p + q) AS qs FROM z) " +
        "SELECT event_type, CAST(m AS BIGINT) AS n_days, " +
        "CASE WHEN m > 6 AND den > 0 THEN " +
        "CAST(floor((CAST(num1 AS DOUBLE) / dens) * 10000 + 0.5) AS BIGINT) END AS r1_bp, " +
        "CASE WHEN m > 6 AND den > 0 THEN " +
        "CAST(floor(qs * 10000 + 0.5) AS BIGINT) END AS q_bp, " +
        "CASE WHEN m > 6 AND den > 0 THEN " +
        "CAST(floor(exp(-(qs / 2)) * (1.0 + 1.0 * (qs / 2) + " +
        "((0.5 * (qs / 2)) * (qs / 2))) * 10000 + 0.5) AS BIGINT) END AS p_bp FROM q"),

    "q252_pettitt" ->
      // same day-ordered series; every U_t an exact integer pair fold,
      // the earliest-argmax encoded as the SAME |U|*(m+1) - t integer
      // key (so both engines break ties identically), the p chain
      // spelled as Spark's
      ("WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
        "FROM events WHERE ts IS NOT NULL GROUP BY 1, 2), " +
        "a AS (SELECT event_type, list(struct_pack(day := day, n := n) ORDER BY day) AS cs " +
        "FROM d GROUP BY 1), " +
        "x AS (SELECT event_type, cs, len(cs) AS m FROM a), " +
        "y AS (SELECT event_type, cs, m, " +
        "CASE WHEN m > 1 THEN list_transform(range(1, CAST(m AS BIGINT)), t -> " +
        "abs(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, t + 1), i -> " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(t + 1, CAST(m + 1 AS BIGINT)), j -> " +
        "CAST(CASE WHEN (cs[CAST(j AS INT)]).n > (cs[CAST(i AS INT)]).n THEN 1 " +
        "WHEN (cs[CAST(j AS INT)]).n < (cs[CAST(i AS INT)]).n THEN -1 ELSE 0 END AS BIGINT))), " +
        "(p, q) -> p + q))), (p, q) -> p + q)) * (CAST(m AS BIGINT) + 1) - t) " +
        "ELSE [] END AS keys FROM x), " +
        "z0 AS (SELECT event_type, cs, m, list_max(keys) AS bestkey FROM y), " +
        "z1 AS (SELECT event_type, cs, m, bestkey, " +
        "CAST(floor(CAST(bestkey AS DOUBLE) / (CAST(m AS BIGINT) + 1)) AS BIGINT) + " +
        "CASE WHEN bestkey % (CAST(m AS BIGINT) + 1) <> 0 THEN 1 ELSE 0 END AS k FROM z0), " +
        "z2 AS (SELECT event_type, cs, m, k, " +
        "CAST(k * (CAST(m AS BIGINT) + 1) - bestkey AS INT) AS bt, " +
        "CAST(m AS DOUBLE) AS md, CAST(k AS DOUBLE) AS kd FROM z1) " +
        "SELECT event_type, CAST(m AS BIGINT) AS n_days, " +
        "CASE WHEN m > 1 THEN k END AS k_stat, " +
        "CASE WHEN m > 1 THEN (cs[bt]).day END AS change_day, " +
        "CASE WHEN m > 1 THEN floor(least(1.0, " +
        "2.0 * exp(-6.0 * kd * kd / (md * md * md + md * md))) * 10000 + 0.5) / 10000 " +
        "END AS p_approx FROM z2"),

    "q251_mk_trend" ->
      // the same day-ordered per-type series; S and the tie mass as
      // exact integer pair folds, the tie-corrected variance and
      // continuity-corrected z spelled as Spark's, Sen's slope the exact
      // middle of the sorted pairwise-slope list (all index arithmetic
      // integer-valued, so cast rounding conventions never differ)
      ("WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
        "FROM events WHERE ts IS NOT NULL GROUP BY 1, 2), " +
        "a AS (SELECT event_type, list(struct_pack(day := day, n := n) ORDER BY day) AS cs " +
        "FROM d GROUP BY 1), " +
        "x AS (SELECT event_type, cs, len(cs) AS m FROM a), " +
        "y AS (SELECT event_type, m, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(2, CAST(m + 1 AS BIGINT)), j -> " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, j), i -> " +
        "CAST(CASE WHEN (cs[CAST(j AS INT)]).n > (cs[CAST(i AS INT)]).n THEN 1 " +
        "WHEN (cs[CAST(j AS INT)]).n < (cs[CAST(i AS INT)]).n THEN -1 ELSE 0 END AS BIGINT))), " +
        "(p, q) -> p + q))), (p, q) -> p + q) AS BIGINT) AS s, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, CAST(m + 1 AS BIGINT)), j -> " +
        "(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, e -> " +
        "CAST(CASE WHEN (e).n = (cs[CAST(j AS INT)]).n THEN 1 ELSE 0 END AS BIGINT))), (p, q) -> p + q) - 1) * " +
        "(2 * list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, e -> " +
        "CAST(CASE WHEN (e).n = (cs[CAST(j AS INT)]).n THEN 1 ELSE 0 END AS BIGINT))), (p, q) -> p + q) + 5))), " +
        "(p, q) -> p + q) AS BIGINT) AS tau, " +
        "list_sort(flatten(list_transform(range(2, CAST(m + 1 AS BIGINT)), j -> " +
        "list_transform(range(1, j), i -> " +
        "CAST((cs[CAST(j AS INT)]).n - (cs[CAST(i AS INT)]).n AS DOUBLE) / " +
        "CAST((cs[CAST(j AS INT)]).day - (cs[CAST(i AS INT)]).day AS DOUBLE))))) AS sl FROM x), " +
        "z0 AS (SELECT event_type, m, s, tau, sl, len(sl) AS p, CAST(m AS DOUBLE) AS md, " +
        "CAST(s AS DOUBLE) AS sd FROM y), " +
        "z1 AS (SELECT event_type, m, s, sl, p, sd, " +
        "(md * (md - 1) * (2.0 * md + 5) - CAST(tau AS DOUBLE)) / 18 AS vars FROM z0) " +
        "SELECT event_type, CAST(m AS BIGINT) AS n_days, s AS mk_s, " +
        "CASE WHEN m > 1 AND vars > 0 THEN floor((CASE WHEN s > 0 THEN (sd - 1) / sqrt(vars) " +
        "WHEN s < 0 THEN (sd + 1) / sqrt(vars) ELSE 0.0 END) * 10000 + 0.5) / 10000 END AS z, " +
        "CASE WHEN m > 1 THEN floor((CASE WHEN p % 2 = 1 THEN sl[CAST((p + 1) / 2 AS INT)] " +
        "ELSE (sl[CAST(p / 2 AS INT)] + sl[CAST(p / 2 + 1 AS INT)]) / 2 END) * 10000 + 0.5) / 10000 " +
        "END AS sen_slope FROM z1"),

    "q250_friedman" ->
      // q228's band CTEs; per-row doubled midranks 2R = 2*less + tied + 2
      // via the same pairwise CASE comparisons, HUGEINT rank sums, the
      // one-division chi2/W chain spelled as Spark's
      ("WITH base AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS den, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok, " +
        "n_chars FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL), " +
        "r AS (SELECT " +
        "CASE WHEN num * 10 < den THEN 0 WHEN num * 5 < den THEN 1 ELSE 2 END AS r0, " +
        "CASE WHEN tok < 40 THEN 0 WHEN tok < 70 THEN 1 ELSE 2 END AS r1, " +
        "CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 380 THEN 1 ELSE 2 END AS r2 FROM base), " +
        "rk AS (SELECT " +
        "2 * (CASE WHEN r1 < r0 THEN 1 ELSE 0 END + CASE WHEN r2 < r0 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN r1 = r0 THEN 1 ELSE 0 END + CASE WHEN r2 = r0 THEN 1 ELSE 0 END) + 2 AS d0, " +
        "2 * (CASE WHEN r0 < r1 THEN 1 ELSE 0 END + CASE WHEN r2 < r1 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN r0 = r1 THEN 1 ELSE 0 END + CASE WHEN r2 = r1 THEN 1 ELSE 0 END) + 2 AS d1, " +
        "2 * (CASE WHEN r0 < r2 THEN 1 ELSE 0 END + CASE WHEN r1 < r2 THEN 1 ELSE 0 END) + " +
        "(CASE WHEN r0 = r2 THEN 1 ELSE 0 END + CASE WHEN r1 = r2 THEN 1 ELSE 0 END) + 2 AS d2 FROM r), " +
        "a AS (SELECT count(*) AS b, " +
        "COALESCE(sum(CAST(d0 AS HUGEINT)), 0) AS s0, " +
        "COALESCE(sum(CAST(d1 AS HUGEINT)), 0) AS s1, " +
        "COALESCE(sum(CAST(d2 AS HUGEINT)), 0) AS s2x, " +
        "COALESCE(sum(CAST(d0 AS HUGEINT) * CAST(d0 AS HUGEINT) + " +
        "CAST(d1 AS HUGEINT) * CAST(d1 AS HUGEINT) + " +
        "CAST(d2 AS HUGEINT) * CAST(d2 AS HUGEINT)), 0) AS a2 FROM rk), " +
        "f AS (SELECT b, s0 * s0 + s1 * s1 + s2x * s2x AS ss, a2, " +
        "CAST(b AS HUGEINT) AS bh FROM a), " +
        "g AS (SELECT b, 2 * (ss - bh * bh * 48) AS numi, a2 - bh * 48 AS deni FROM f), " +
        "h AS (SELECT b, numi, deni, " +
        "CASE WHEN deni > 0 THEN CAST(deni AS DOUBLE) ELSE 1.0 END AS dens FROM g), " +
        "i AS (SELECT b, numi, deni, CAST(numi AS DOUBLE) / dens AS chi2 FROM h) " +
        "SELECT CAST(b AS BIGINT) AS b, CAST(3 AS BIGINT) AS k, " +
        "CASE WHEN b > 0 AND deni > 0 THEN floor(chi2 * 10000 + 0.5) / 10000 END AS chi2, " +
        "CASE WHEN b > 0 AND deni > 0 THEN " +
        "CAST(floor(chi2 / (CAST(b AS DOUBLE) * 2) * 10000 + 0.5) AS BIGINT) END AS w_bp FROM i"),

    "q249_drift_card" ->
      // ONE spine carrying cv + cumall + the lead() successor value, the
      // per-group window cumsum, then the three folds (max KS cross-mass,
      // floor(gap-term*2^20) W1 grains, doubled dominance masses) in one
      // GROUP BY — and q232's portable window-SQL BH step on the rounded
      // p values (row_number rank + suffix-min window, r15 fix)
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DOUBLE) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "pgv AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v), " +
        "pv AS (SELECT v, sum(c) AS cv FROM pgv GROUP BY v), " +
        "gr AS (SELECT g, sum(c) AS ng FROM pgv GROUP BY g), " +
        "t AS (SELECT sum(cv) AS n, min(v) AS vmin, max(v) AS vmax FROM pv), " +
        "ca AS (SELECT v, cv, sum(cv) OVER (ORDER BY v) AS cumall, " +
        "lead(v) OVER (ORDER BY v) AS vn FROM pv), " +
        "sp AS (SELECT gr.g, gr.ng, ca.v, ca.vn, ca.cv, ca.cumall FROM gr, ca), " +
        "jj AS (SELECT sp.g, sp.ng, sp.v, sp.vn, sp.cv, sp.cumall, COALESCE(pgv.c, 0) AS c " +
        "FROM sp LEFT JOIN pgv ON pgv.g = sp.g AND pgv.v = sp.v), " +
        "w AS (SELECT g, ng, v, vn, cv, cumall, c, " +
        "sum(c) OVER (PARTITION BY g ORDER BY v) AS cumg FROM jj), " +
        "dd AS (SELECT g, max(ng) AS ng, " +
        "max(abs(CAST(cumg AS HUGEINT) * (CAST(n AS HUGEINT) - CAST(ng AS HUGEINT)) - " +
        "(CAST(cumall AS HUGEINT) - CAST(cumg AS HUGEINT)) * CAST(ng AS HUGEINT))) AS dnum, " +
        "COALESCE(sum(CASE WHEN vn IS NOT NULL THEN " +
        "CAST(floor(CAST(abs(CAST(cumg AS HUGEINT) * (CAST(n AS HUGEINT) - CAST(ng AS HUGEINT)) - " +
        "(CAST(cumall AS HUGEINT) - CAST(cumg AS HUGEINT)) * CAST(ng AS HUGEINT)) AS DOUBLE) * " +
        "(vn - v) / (CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)) * 1048576) AS BIGINT) ELSE 0 END), 0) AS w1q, " +
        "COALESCE(sum(CAST(c AS HUGEINT) * " +
        "(2 * ((CAST(cumall AS HUGEINT) - CAST(cv AS HUGEINT)) - " +
        "(CAST(cumg AS HUGEINT) - CAST(c AS HUGEINT))) + " +
        "(CAST(cv AS HUGEINT) - CAST(c AS HUGEINT)))), 0) AS u2, " +
        "COALESCE(sum(CAST(floor(CAST(cv AS DOUBLE) * " +
        "(CAST(abs(CAST(cumg AS HUGEINT) * (CAST(n AS HUGEINT) - CAST(ng AS HUGEINT)) - " +
        "(CAST(cumall AS HUGEINT) - CAST(cumg AS HUGEINT)) * CAST(ng AS HUGEINT)) AS DOUBLE) / " +
        "(CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE))) * " +
        "(CAST(abs(CAST(cumg AS HUGEINT) * (CAST(n AS HUGEINT) - CAST(ng AS HUGEINT)) - " +
        "(CAST(cumall AS HUGEINT) - CAST(cumg AS HUGEINT)) * CAST(ng AS HUGEINT)) AS DOUBLE) / " +
        "(CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE))) * 1073741824.0) AS HUGEINT)), 0) AS cvmq, " +
        "COALESCE(sum(CASE WHEN vn IS NOT NULL THEN " +
        "CAST(floor((CAST(abs(CAST(cumg AS HUGEINT) * (CAST(n AS HUGEINT) - CAST(ng AS HUGEINT)) - " +
        "(CAST(cumall AS HUGEINT) - CAST(cumg AS HUGEINT)) * CAST(ng AS HUGEINT)) AS DOUBLE) / " +
        "(CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE))) * " +
        "(CAST(abs(CAST(cumg AS HUGEINT) * (CAST(n AS HUGEINT) - CAST(ng AS HUGEINT)) - " +
        "(CAST(cumall AS HUGEINT) - CAST(cumg AS HUGEINT)) * CAST(ng AS HUGEINT)) AS DOUBLE) / " +
        "(CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE))) * " +
        "(vn - v) * 1048576.0) AS HUGEINT) ELSE 0 END), 0) AS enq " +
        "FROM w, t GROUP BY g), " +
        "kr AS (SELECT g, ng, CAST(n AS BIGINT) - ng AS nrest, " +
        "floor(CAST(dnum AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)) * 10000 + 0.5) / 10000 AS ks_d, " +
        "floor(least(1.0, 2.0 * exp(-2.0 * " +
        "(sqrt(CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE) / (CAST(ng AS DOUBLE) + CAST(n - ng AS DOUBLE))) * " +
        "(CAST(dnum AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)))) * " +
        "(sqrt(CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE) / (CAST(ng AS DOUBLE) + CAST(n - ng AS DOUBLE))) * " +
        "(CAST(dnum AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS p, " +
        "floor(CAST(w1q AS DOUBLE) / 1048576 * 10000 + 0.5) / 10000 AS w1, " +
        "CASE WHEN vmax > vmin THEN " +
        "CAST(floor(CAST(w1q AS DOUBLE) / 1048576 / (vmax - vmin) * 10000 + 0.5) AS BIGINT) END AS w1_norm_bp, " +
        "CAST(floor(CAST(u2 AS DOUBLE) / (2 * CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS auc_bp, " +
        "CAST(floor((CAST(u2 AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)) - 1) * 10000 + 0.5) AS BIGINT) AS cliff_bp, " +
        "CAST(floor(CAST(cvmq AS DOUBLE) / 1073741824.0 * " +
        "(CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)) / " +
        "((CAST(ng AS DOUBLE) + CAST(n - ng AS DOUBLE)) * (CAST(ng AS DOUBLE) + CAST(n - ng AS DOUBLE))) * 10000 + 0.5) AS BIGINT) AS cvm_bp, " +
        "floor(2.0 * (CAST(enq AS DOUBLE) / 1048576.0) * 10000 + 0.5) / 10000 AS energy " +
        "FROM dd, t), " +
        "rk AS (SELECT g, p, row_number() OVER (ORDER BY p, g) AS j, " +
        "count(*) OVER () AS m FROM kr), " +
        "wsr AS (SELECT g, p, j, " +
        "p * CAST(m AS DOUBLE) / CAST(j AS DOUBLE) AS w FROM rk), " +
        "bh AS (SELECT g AS test_key, p AS p_value, CAST(j AS BIGINT) AS p_rank, " +
        "floor(least(1.0, min(w) OVER (ORDER BY j DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000 + 0.5) / 10000 AS p_adj " +
        "FROM wsr) " +
        "SELECT bh.test_key, CAST(kr.ng AS BIGINT) AS n_g, CAST(kr.nrest AS BIGINT) AS n_rest, " +
        "CAST(floor(kr.ks_d * 10000 + 0.5) AS BIGINT) AS ks_d_bp, " +
        "CAST(floor(bh.p_value * 10000 + 0.5) AS BIGINT) AS p_bp, " +
        "bh.p_rank, " +
        "CAST(floor(bh.p_adj * 10000 + 0.5) AS BIGINT) AS p_adj_bp, " +
        "(CAST(floor(bh.p_adj * 10000 + 0.5) AS BIGINT) <= 1000) AS reject, " +
        "kr.w1, kr.w1_norm_bp, kr.auc_bp, kr.cliff_bp, kr.cvm_bp, kr.energy " +
        "FROM bh JOIN kr ON kr.g = bh.test_key"),

    "q248_energy_distance" ->
      // q222's spine with the CDF gap SQUARED (spelled gap*gap, the q238
      // no-pow discipline), the same per-gap floor(term*2^20) grains,
      // final x2 and range normalization as the display chain
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cuma, " +
        "sum(cb) OVER (ORDER BY v) AS cumb, " +
        "lead(v) OVER (ORDER BY v) AS vn FROM pv), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb, " +
        "min(v) AS vmin, max(v) AS vmax FROM pv), " +
        "t2 AS (SELECT na, nb, vmin, vmax, " +
        "CASE WHEN na > 0 THEN CAST(na AS DOUBLE) ELSE 1.0 END AS nads, " +
        "CASE WHEN nb > 0 THEN CAST(nb AS DOUBLE) ELSE 1.0 END AS nbds FROM t), " +
        "q AS (SELECT CAST(floor(" +
        "(CAST(abs(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT) - " +
        "CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT)) AS DOUBLE) / " +
        "(nads * nbds)) * " +
        "(CAST(abs(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT) - " +
        "CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT)) AS DOUBLE) / " +
        "(nads * nbds)) * " +
        "(vn - v) * 1048576.0) AS BIGINT) AS qq " +
        "FROM c, t2 WHERE vn IS NOT NULL), " +
        "f AS (SELECT COALESCE(sum(qq), 0) AS s2 FROM q) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "floor(2.0 * (CAST(s2 AS DOUBLE) / 1048576.0) * 10000 + 0.5) / 10000 AS energy, " +
        "CASE WHEN vmax > vmin THEN " +
        "CAST(floor(2.0 * (CAST(s2 AS DOUBLE) / 1048576.0) / (vmax - vmin) * 10000 + 0.5) AS BIGINT) END AS energy_norm_bp " +
        "FROM f, t"),

    "q247_breslow_day" ->
      // q245's cells; the common OR and all three BD sums ride
      // floor(term*2^20) HUGEINT grains (order-free), and the fitted-cell
      // quadratic/variance/chi2 double chains are spelled layer by layer
      // exactly as Spark's
      ("WITH u AS (SELECT source AS g, " +
        "CASE WHEN lang = 'en' THEN TRUE ELSE FALSE END AS e, " +
        "CASE WHEN n_chars >= 150 THEN TRUE ELSE FALSE END AS o " +
        "FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL AND source IS NOT NULL), " +
        "ps AS (SELECT g, " +
        "CAST(sum(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
        "CAST(sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
        "CAST(sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
        "CAST(sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS d " +
        "FROM u GROUP BY g), " +
        "p0 AS (SELECT a, b, c, d, CAST(a AS DOUBLE) AS ad, CAST(b AS DOUBLE) AS bd2, " +
        "CAST(c AS DOUBLE) AS cd, CAST(d AS DOUBLE) AS dd2, " +
        "CAST(a AS DOUBLE) + CAST(b AS DOUBLE) + CAST(c AS DOUBLE) + CAST(d AS DOUBLE) AS nn FROM ps), " +
        "t AS (SELECT count(*) AS k, COALESCE(sum(a + b + c + d), 0) AS n, " +
        "COALESCE(sum(CAST(floor(ad * dd2 / nn * 1048576.0) AS HUGEINT)), 0) AS adq, " +
        "COALESCE(sum(CAST(floor(bd2 * cd / nn * 1048576.0) AS HUGEINT)), 0) AS bcq FROM p0), " +
        "r AS (SELECT k, n, adq, bcq, " +
        "CASE WHEN bcq > 0 THEN CAST(adq AS DOUBLE) / CAST(bcq AS DOUBLE) ELSE 1.0 END AS rr FROM t), " +
        "s0 AS (SELECT ad, bd2, cd, dd2, nn, rr, ad + bd2 AS m1, ad + cd AS t1, " +
        "(ad + bd2) > 0 AND (ad + cd) > 0 AND (cd + dd2) > 0 AND (bd2 + dd2) > 0 AS ok FROM p0, r), " +
        "s1 AS (SELECT *, 1.0 - rr AS aq, (nn - m1 - t1) + rr * (m1 + t1) AS bq, " +
        "-rr * m1 * t1 AS cq, greatest(0.0, m1 + t1 - nn) AS lo, least(m1, t1) AS hi FROM s0), " +
        "s2 AS (SELECT *, sqrt(greatest(bq * bq - 4.0 * aq * cq, 0.0)) AS disc FROM s1), " +
        "s3 AS (SELECT *, (-bq + disc) / (2.0 * aq) AS x1, (-bq - disc) / (2.0 * aq) AS x2 FROM s2), " +
        "s4 AS (SELECT *, CASE WHEN NOT ok THEN 0.0 WHEN abs(aq) < 1e-12 THEN m1 * t1 / nn " +
        "WHEN x1 >= lo - 1e-9 AND x1 <= hi + 1e-9 THEN x1 ELSE x2 END AS x FROM s3), " +
        "s5 AS (SELECT *, m1 - x AS xb, t1 - x AS xc, nn - m1 - t1 + x AS xd FROM s4), " +
        "s6 AS (SELECT *, CASE WHEN NOT ok THEN 0.0 WHEN x > 0 AND xb > 0 AND xc > 0 AND xd > 0 THEN " +
        "1.0 / (1.0 / x + 1.0 / xb + 1.0 / xc + 1.0 / xd) ELSE 0.0 END AS v, ad - x AS dev FROM s5), " +
        "q AS (SELECT " +
        "COALESCE(sum(CASE WHEN v > 0 THEN CAST(floor(dev * dev / v * 1048576.0) AS HUGEINT) ELSE 0 END), 0) AS bdq, " +
        "COALESCE(sum(CASE WHEN v > 0 THEN CAST(floor(dev * 1048576.0) AS HUGEINT) ELSE 0 END), 0) AS devq, " +
        "COALESCE(sum(CASE WHEN v > 0 THEN CAST(floor(v * 1048576.0) AS HUGEINT) ELSE 0 END), 0) AS vq FROM s6), " +
        "f AS (SELECT k, n, adq, bcq, rr, bdq, devq, vq, " +
        "CAST(bdq AS DOUBLE) / 1048576.0 AS bd, " +
        "CAST(devq AS DOUBLE) / 1048576.0 AS devs, " +
        "CASE WHEN vq > 0 THEN CAST(vq AS DOUBLE) / 1048576.0 ELSE 1.0 END AS vsums FROM q, r) " +
        "SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n, " +
        "CASE WHEN bcq > 0 THEN floor(rr * 10000 + 0.5) / 10000 END AS or_mh, " +
        "CASE WHEN bcq > 0 AND vq > 0 THEN floor(bd * 10000 + 0.5) / 10000 END AS bd_chi2, " +
        "CASE WHEN bcq > 0 AND vq > 0 THEN " +
        "floor((bd - devs * devs / vsums) * 10000 + 0.5) / 10000 END AS tarone_chi2 FROM f"),

    "q246_vocab_richness" ->
      // q150's token construction, the same two exact roll-ups, and the
      // two display chains spelled left-associated as Spark's
      ("WITH tk AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t " +
        "FROM documents WHERE text IS NOT NULL AND trim(text) <> ''), " +
        "tf AS (SELECT t, count(*) AS c FROM tk GROUP BY t), " +
        "fof AS (SELECT c, count(*) AS f FROM tf GROUP BY c), " +
        "a AS (SELECT COALESCE(sum(f), 0) AS v, COALESCE(sum(c * f), 0) AS n, " +
        "COALESCE(sum(CASE WHEN c = 1 THEN f END), 0) AS f1, " +
        "COALESCE(sum(CASE WHEN c = 2 THEN f END), 0) AS f2 FROM fof) " +
        "SELECT CAST(v AS BIGINT) AS v, CAST(n AS BIGINT) AS n, " +
        "CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2, " +
        "CASE WHEN n > 0 THEN " +
        "CAST(floor(CAST(f1 AS DOUBLE) / CAST(n AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS gt_unseen_bp, " +
        "CASE WHEN f2 > 0 THEN " +
        "floor((CAST(v AS DOUBLE) + CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE) / (2.0 * CAST(f2 AS DOUBLE))) * 10000 + 0.5) / 10000 " +
        "ELSE floor((CAST(v AS DOUBLE) + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1) / 2) * 10000 + 0.5) / 10000 " +
        "END AS chao1 FROM a"),

    "q244_ca_trend" ->
      // same bounded (score, n, r) masses in HUGEINT, the same pbar /
      // trend-variance / z double chain left-associated as Spark's
      ("WITH u AS (SELECT CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS s, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y " +
        "FROM events WHERE ts IS NOT NULL), " +
        "pg AS (SELECT s, count(*) AS n, CAST(sum(y) AS BIGINT) AS r FROM u GROUP BY s), " +
        "a AS (SELECT count(*) AS k, COALESCE(sum(n), 0) AS n, COALESCE(sum(r), 0) AS npos, " +
        "COALESCE(sum(CAST(s AS HUGEINT) * CAST(r AS HUGEINT)), 0) AS t, " +
        "COALESCE(sum(CAST(s AS HUGEINT) * CAST(n AS HUGEINT)), 0) AS s1, " +
        "COALESCE(sum(CAST(s AS HUGEINT) * CAST(s AS HUGEINT) * CAST(n AS HUGEINT)), 0) AS s2 FROM pg), " +
        "f AS (SELECT k, n, npos, CAST(n AS DOUBLE) AS nd, " +
        "CASE WHEN n > 0 THEN CAST(n AS DOUBLE) ELSE 1.0 END AS nds, " +
        "CAST(npos AS DOUBLE) AS rp, CAST(t AS DOUBLE) AS td, " +
        "CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d FROM a), " +
        "g AS (SELECT k, n, npos, rp / nds AS pbar, td, s1d, s2d, nds FROM f), " +
        "h AS (SELECT k, n, npos, " +
        "pbar * (1.0 - pbar) * (s2d - s1d * s1d / nds) AS vart, " +
        "td - pbar * s1d AS num FROM g) " +
        "SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n, " +
        "CAST(npos AS BIGINT) AS n_pos, " +
        "CASE WHEN n > 0 AND vart > 0 THEN " +
        "floor(num / sqrt(vart) * 10000 + 0.5) / 10000 END AS z FROM h"),

    "q245_mantel_haenszel" ->
      // same per-stratum 2x2 integer cells, the same four float folds in
      // sorted stratum order seeded 0.0, term chains spelled as Spark's
      ("WITH u AS (SELECT source AS g, " +
        "CASE WHEN lang = 'en' THEN TRUE ELSE FALSE END AS e, " +
        "CASE WHEN n_chars >= 150 THEN TRUE ELSE FALSE END AS o " +
        "FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL AND source IS NOT NULL), " +
        "ps AS (SELECT g, " +
        "CAST(sum(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
        "CAST(sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
        "CAST(sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
        "CAST(sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS d " +
        "FROM u GROUP BY g), " +
        "o1 AS (SELECT list(struct_pack(g := g, a := a, b := b, c := c, d := d) ORDER BY g) AS h FROM ps), " +
        "x AS (SELECT len(h) AS k, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(h, s -> (s).a + (s).b + (s).c + (s).d)), (p, q) -> p + q) AS n, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(h, s -> (s).a)), (p, q) -> p + q) AS suma, " +
        "list_reduce(list_prepend(0.0, list_transform(h, s -> " +
        "CAST((s).a AS DOUBLE) * CAST((s).d AS DOUBLE) / " +
        "(CAST((s).a AS DOUBLE) + CAST((s).b AS DOUBLE) + CAST((s).c AS DOUBLE) + CAST((s).d AS DOUBLE)))), (p, q) -> p + q) AS sumad, " +
        "list_reduce(list_prepend(0.0, list_transform(h, s -> " +
        "CAST((s).b AS DOUBLE) * CAST((s).c AS DOUBLE) / " +
        "(CAST((s).a AS DOUBLE) + CAST((s).b AS DOUBLE) + CAST((s).c AS DOUBLE) + CAST((s).d AS DOUBLE)))), (p, q) -> p + q) AS sumbc, " +
        "list_reduce(list_prepend(0.0, list_transform(h, s -> " +
        "(CAST((s).a AS DOUBLE) + CAST((s).b AS DOUBLE)) * (CAST((s).a AS DOUBLE) + CAST((s).c AS DOUBLE)) / " +
        "(CAST((s).a AS DOUBLE) + CAST((s).b AS DOUBLE) + CAST((s).c AS DOUBLE) + CAST((s).d AS DOUBLE)))), (p, q) -> p + q) AS sume, " +
        "list_reduce(list_prepend(0.0, list_transform(h, s -> " +
        "CASE WHEN (CAST((s).a AS DOUBLE) + CAST((s).b AS DOUBLE) + CAST((s).c AS DOUBLE) + CAST((s).d AS DOUBLE)) > 1 THEN " +
        "(CAST((s).a AS DOUBLE) + CAST((s).b AS DOUBLE)) * (CAST((s).c AS DOUBLE) + CAST((s).d AS DOUBLE)) * " +
        "(CAST((s).a AS DOUBLE) + CAST((s).c AS DOUBLE)) * (CAST((s).b AS DOUBLE) + CAST((s).d AS DOUBLE)) / " +
        "((CAST((s).a AS DOUBLE) + CAST((s).b AS DOUBLE) + CAST((s).c AS DOUBLE) + CAST((s).d AS DOUBLE)) * " +
        "(CAST((s).a AS DOUBLE) + CAST((s).b AS DOUBLE) + CAST((s).c AS DOUBLE) + CAST((s).d AS DOUBLE)) * " +
        "((CAST((s).a AS DOUBLE) + CAST((s).b AS DOUBLE) + CAST((s).c AS DOUBLE) + CAST((s).d AS DOUBLE)) - 1)) " +
        "ELSE 0.0 END)), (p, q) -> p + q) AS sumv FROM o1) " +
        "SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n, " +
        "CASE WHEN sumbc > 0 THEN floor(sumad / sumbc * 10000 + 0.5) / 10000 END AS or_mh, " +
        "CASE WHEN sumv > 0 THEN " +
        "floor((CAST(suma AS DOUBLE) - sume) / sqrt(sumv) * 10000 + 0.5) / 10000 END AS z FROM x"),

    "q243_logrank" ->
      // q180's lifetimes/censoring verbatim, split by user-id parity;
      // at-risk counts are the same in-row prefix folds, and the
      // expected/variance sums fold in ascending day order seeded 0.0 —
      // each term's double chain spelled exactly as Spark's
      ("WITH pu AS (SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l, " +
        "max(user_id % 2) AS c FROM events GROUP BY 1), " +
        "e AS (SELECT max(epoch_us(ts)) AS endt FROM events), " +
        "lt AS (SELECT CAST(floor((l - f) / 86400000000) AS BIGINT) AS t_day, " +
        "CASE WHEN (endt - l) > 1 * 86400000000 THEN 1 ELSE 0 END AS churned, c FROM pu, e), " +
        "h0 AS (SELECT t_day, " +
        "CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, " +
        "CAST(sum(CASE WHEN c <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
        "CAST(sum(CASE WHEN c = 0 THEN churned ELSE 0 END) AS BIGINT) AS d0, " +
        "CAST(sum(CASE WHEN c <> 0 THEN churned ELSE 0 END) AS BIGINT) AS d1 " +
        "FROM lt GROUP BY 1), " +
        "o AS (SELECT list(struct_pack(t_day := t_day, n0 := n0, n1 := n1, d0 := d0, d1 := d1) " +
        "ORDER BY t_day) AS h FROM h0), " +
        "o2 AS (SELECT h, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(h, s -> (s).n0)), (a, b) -> a + b) AS BIGINT) AS na, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(h, s -> (s).n1)), (a, b) -> a + b) AS BIGINT) AS nb, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(h, s -> (s).d0)), (a, b) -> a + b) AS BIGINT) AS oa FROM o), " +
        "x AS (SELECT na, nb, oa, " +
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(h) + 1), j -> " +
        "CAST((h[CAST(j AS INT)]).d0 + (h[CAST(j AS INT)]).d1 AS DOUBLE) * " +
        "CAST(na - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n0)), (p, q) -> p + q) AS DOUBLE) / " +
        "(CAST(na - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n0)), (p, q) -> p + q) AS DOUBLE) + " +
        "CAST(nb - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n1)), (p, q) -> p + q) AS DOUBLE)))), (a, b) -> a + b) AS expa, " +
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(h) + 1), j -> " +
        "CASE WHEN (CAST(na - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n0)), (p, q) -> p + q) AS DOUBLE) + " +
        "CAST(nb - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n1)), (p, q) -> p + q) AS DOUBLE)) > 1 THEN " +
        "CAST((h[CAST(j AS INT)]).d0 + (h[CAST(j AS INT)]).d1 AS DOUBLE) * " +
        "(CAST(na - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n0)), (p, q) -> p + q) AS DOUBLE) / " +
        "(CAST(na - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n0)), (p, q) -> p + q) AS DOUBLE) + " +
        "CAST(nb - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n1)), (p, q) -> p + q) AS DOUBLE))) * " +
        "(1.0 - CAST(na - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n0)), (p, q) -> p + q) AS DOUBLE) / " +
        "(CAST(na - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n0)), (p, q) -> p + q) AS DOUBLE) + " +
        "CAST(nb - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n1)), (p, q) -> p + q) AS DOUBLE))) * " +
        "((CAST(na - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n0)), (p, q) -> p + q) AS DOUBLE) + " +
        "CAST(nb - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n1)), (p, q) -> p + q) AS DOUBLE)) - " +
        "CAST((h[CAST(j AS INT)]).d0 + (h[CAST(j AS INT)]).d1 AS DOUBLE)) / " +
        "((CAST(na - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n0)), (p, q) -> p + q) AS DOUBLE) + " +
        "CAST(nb - list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n1)), (p, q) -> p + q) AS DOUBLE)) - 1) " +
        "ELSE 0.0 END)), (a, b) -> a + b) AS vara FROM o2) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CAST(oa AS BIGINT) AS obs_a, " +
        "floor(expa * 10000 + 0.5) / 10000 AS exp_a, " +
        "CASE WHEN na > 0 AND nb > 0 AND vara > 0 THEN " +
        "floor((CAST(oa AS DOUBLE) - expa) / sqrt(vara) * 10000 + 0.5) / 10000 END AS z " +
        "FROM x"),

    "q242_jt_trend" ->
      // the grouped spine with two windows: per-group value-cumulative,
      // then the EXCLUSIVE per-value prefix over lower-ordered groups;
      // 2JT = sum(c*(2A + B)) exact in HUGEINT, H&W tie-corrected var
      // chain spelled left-associated exactly as Spark's
      ("WITH u AS (SELECT CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS g, " +
        "CAST(value AS DOUBLE) AS v FROM events " +
        "WHERE value IS NOT NULL AND ts IS NOT NULL), " +
        "pgv AS (SELECT g, v, count(*) AS c FROM u GROUP BY g, v), " +
        "pv AS (SELECT v, sum(c) AS cv FROM pgv GROUP BY v), " +
        "gr AS (SELECT g, sum(c) AS ng FROM pgv GROUP BY g), " +
        "sp AS (SELECT gr.g, pv.v, COALESCE(pgv.c, 0) AS c " +
        "FROM gr CROSS JOIN pv LEFT JOIN pgv ON pgv.g = gr.g AND pgv.v = pv.v), " +
        "w1 AS (SELECT g, v, c, sum(c) OVER (PARTITION BY g ORDER BY v) AS cumg FROM sp), " +
        "w2 AS (SELECT g, v, c, " +
        "COALESCE(sum(cumg - c) OVER (PARTITION BY v ORDER BY g " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a, " +
        "COALESCE(sum(c) OVER (PARTITION BY v ORDER BY g " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b FROM w1), " +
        "jt AS (SELECT COALESCE(sum(CAST(c AS HUGEINT) * " +
        "(2 * CAST(a AS HUGEINT) + CAST(b AS HUGEINT))), 0) AS jt2 FROM w2), " +
        "gs AS (SELECT count(*) AS k, COALESCE(sum(ng), 0) AS n, " +
        "COALESCE(sum(CAST(ng AS HUGEINT) * CAST(ng AS HUGEINT)), 0) AS sq, " +
        "COALESCE(sum(CAST(ng AS HUGEINT) * (CAST(ng AS HUGEINT) - 1) * (2 * CAST(ng AS HUGEINT) + 5)), 0) AS g1, " +
        "COALESCE(sum(CAST(ng AS HUGEINT) * (CAST(ng AS HUGEINT) - 1) * (CAST(ng AS HUGEINT) - 2)), 0) AS g2, " +
        "COALESCE(sum(CAST(ng AS HUGEINT) * (CAST(ng AS HUGEINT) - 1)), 0) AS g3 FROM gr), " +
        "ts AS (SELECT " +
        "COALESCE(sum(CAST(cv AS HUGEINT) * (CAST(cv AS HUGEINT) - 1) * (2 * CAST(cv AS HUGEINT) + 5)), 0) AS t1, " +
        "COALESCE(sum(CAST(cv AS HUGEINT) * (CAST(cv AS HUGEINT) - 1) * (CAST(cv AS HUGEINT) - 2)), 0) AS t2, " +
        "COALESCE(sum(CAST(cv AS HUGEINT) * (CAST(cv AS HUGEINT) - 1)), 0) AS t3 FROM pv), " +
        "f AS (SELECT jt2, k, n, CAST(n AS DOUBLE) AS nd, " +
        "CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - sq AS p2, g1, g2, g3, t1, t2, t3 " +
        "FROM jt, gs, ts), " +
        "h AS (SELECT jt2, k, n, nd, p2, " +
        "nd * (nd - 1) * (2 * nd + 5) - CAST(g1 AS DOUBLE) - CAST(t1 AS DOUBLE) AS a1, " +
        "CASE WHEN n > 2 THEN nd * (nd - 1) * (nd - 2) ELSE 1.0 END AS d1s, " +
        "CASE WHEN n > 1 THEN nd * (nd - 1) ELSE 1.0 END AS d2s, " +
        "CASE WHEN p2 > 0 THEN CAST(p2 AS DOUBLE) ELSE 1.0 END AS p2s, " +
        "g2, g3, t2, t3 FROM f), " +
        "i AS (SELECT jt2, k, n, p2, p2s, " +
        "a1 / 72 + CAST(g2 AS DOUBLE) * CAST(t2 AS DOUBLE) / (36 * d1s) + " +
        "CAST(g3 AS DOUBLE) * CAST(t3 AS DOUBLE) / (8 * d2s) AS varjt, " +
        "CAST(jt2 AS DOUBLE) / 2 - CAST(p2 AS DOUBLE) / 4 AS num FROM h) " +
        "SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n, " +
        "CASE WHEN p2 > 0 THEN " +
        "CAST(floor(CAST(jt2 AS DOUBLE) / p2s * 10000 + 0.5) AS BIGINT) END AS po_bp, " +
        "CASE WHEN p2 > 0 AND varjt > 0 THEN " +
        "floor(num / sqrt(varjt) * 10000 + 0.5) / 10000 END AS z FROM i"),

    "q240_effect_sizes" ->
      // q221's midrank kernel for the exact doubled U, plus 2^-20-grain
      // HUGEINT moment sums per distinct value; the cliff/d/g double
      // chains spelled left-associated exactly as Spark's expressions
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "m AS (SELECT v, ca, cb, ca + cb AS ct, " +
        "2 * (sum(ca + cb) OVER (ORDER BY v) - (ca + cb)) + (ca + cb) + 1 AS m2 FROM pv), " +
        "a AS (SELECT COALESCE(sum(ca), 0) AS na, COALESCE(sum(cb), 0) AS nb, " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * CAST(m2 AS HUGEINT)), 0) AS r2, " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * CAST(floor(v * 1048576.0) AS HUGEINT)), 0) AS s1a, " +
        "COALESCE(sum(CAST(cb AS HUGEINT) * CAST(floor(v * 1048576.0) AS HUGEINT)), 0) AS s1b, " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * CAST(floor(v * v * 1048576.0) AS HUGEINT)), 0) AS s2a, " +
        "COALESCE(sum(CAST(cb AS HUGEINT) * CAST(floor(v * v * 1048576.0) AS HUGEINT)), 0) AS s2b FROM m), " +
        "f AS (SELECT na, nb, r2 - CAST(na AS HUGEINT) * (CAST(na AS HUGEINT) + 1) AS u2, " +
        "s1a, s1b, s2a, s2b, CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd FROM a), " +
        "g AS (SELECT na, nb, nad, nbd, " +
        "CAST(u2 AS DOUBLE) / (nad * nbd) - 1 AS cliff, " +
        "CAST(s1a AS DOUBLE) / 1048576.0 / nad AS m1a, " +
        "CAST(s1b AS DOUBLE) / 1048576.0 / nbd AS m1b, " +
        "CAST(s2a AS DOUBLE) / 1048576.0 AS ds2a, " +
        "CAST(s2b AS DOUBLE) / 1048576.0 AS ds2b FROM f), " +
        "h AS (SELECT na, nb, nad, nbd, cliff, m1a, m1b, " +
        "((ds2a - nad * m1a * m1a) + (ds2b - nbd * m1b * m1b)) / (nad + nbd - 2) AS sp2 FROM g), " +
        "i AS (SELECT na, nb, nad, nbd, cliff, sp2, " +
        "(m1a - m1b) / sqrt(sp2) AS d, " +
        "1.0 - 3.0 / (4.0 * (nad + nbd) - 9) AS j FROM h) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor(cliff * 10000 + 0.5) AS BIGINT) END AS cliff_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND na + nb > 2 AND sp2 > 0 THEN " +
        "CAST(floor(d * 10000 + 0.5) AS BIGINT) END AS d_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND na + nb > 2 AND sp2 > 0 THEN " +
        "CAST(floor(j * d * 10000 + 0.5) AS BIGINT) END AS g_bp FROM i"),

    "q241_delta_screen" ->
      // q232's per-group spine; the complement's strictly-below and tied
      // masses at each pooled value form the exact HUGEINT doubled
      // one-sided count u2_g = sum(c*(2*below + tie)), then ONE float
      // division per group for delta and the AUC twin
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DOUBLE) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "pgv AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v), " +
        "pv AS (SELECT v, sum(c) AS cv FROM pgv GROUP BY v), " +
        "gr AS (SELECT g, sum(c) AS ng FROM pgv GROUP BY g), " +
        "t AS (SELECT sum(cv) AS n FROM pv), " +
        "ca AS (SELECT v, cv, sum(cv) OVER (ORDER BY v) AS cumall FROM pv), " +
        "sp AS (SELECT gr.g, gr.ng, ca.v, ca.cv, ca.cumall FROM gr, ca), " +
        "jj AS (SELECT sp.g, sp.ng, sp.v, sp.cv, sp.cumall, COALESCE(pgv.c, 0) AS c " +
        "FROM sp LEFT JOIN pgv ON pgv.g = sp.g AND pgv.v = sp.v), " +
        "w AS (SELECT g, ng, v, cv, cumall, c, " +
        "sum(c) OVER (PARTITION BY g ORDER BY v) AS cumg FROM jj), " +
        "q AS (SELECT g, max(ng) AS ng, COALESCE(sum(CAST(c AS HUGEINT) * " +
        "(2 * ((CAST(cumall AS HUGEINT) - CAST(cv AS HUGEINT)) - " +
        "(CAST(cumg AS HUGEINT) - CAST(c AS HUGEINT))) + " +
        "(CAST(cv AS HUGEINT) - CAST(c AS HUGEINT)))), 0) AS u2 FROM w GROUP BY g) " +
        "SELECT q.g AS group_key, CAST(q.ng AS BIGINT) AS n_g, " +
        "CAST(n AS BIGINT) - CAST(q.ng AS BIGINT) AS n_rest, " +
        "CASE WHEN n > q.ng THEN " +
        "CAST(floor(CAST(u2 AS DOUBLE) / (2 * CAST(q.ng AS DOUBLE) * CAST(n - q.ng AS DOUBLE)) * 10000 + 0.5) AS BIGINT) END AS auc_bp, " +
        "CASE WHEN n > q.ng THEN " +
        "CAST(floor((CAST(u2 AS DOUBLE) / (CAST(q.ng AS DOUBLE) * CAST(n - q.ng AS DOUBLE)) - 1) * 10000 + 0.5) AS BIGINT) END AS cliff_bp " +
        "FROM q, t"),

    "q235_w1_screen" ->
      // q232's per-group spine (groups x pooled values, per-group window
      // cumsum, HUGEINT cross-masses vs the complement) with q222's
      // next-value gap and per-gap floor(term*2^20) integer quantization
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DOUBLE) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "pgv AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v), " +
        "pv AS (SELECT v, sum(c) AS cv FROM pgv GROUP BY v), " +
        "gr AS (SELECT g, sum(c) AS ng FROM pgv GROUP BY g), " +
        "t AS (SELECT sum(cv) AS n, min(v) AS vmin, max(v) AS vmax FROM pv), " +
        "ca AS (SELECT v, sum(cv) OVER (ORDER BY v) AS cumall, " +
        "lead(v) OVER (ORDER BY v) AS vn FROM pv), " +
        "sp AS (SELECT gr.g, gr.ng, ca.v, ca.vn, ca.cumall FROM gr, ca), " +
        "jj AS (SELECT sp.g, sp.ng, sp.v, sp.vn, sp.cumall, COALESCE(pgv.c, 0) AS c " +
        "FROM sp LEFT JOIN pgv ON pgv.g = sp.g AND pgv.v = sp.v), " +
        "w AS (SELECT g, ng, v, vn, cumall, " +
        "sum(c) OVER (PARTITION BY g ORDER BY v) AS cumg FROM jj), " +
        "q AS (SELECT g, ng, " +
        "CAST(floor(CAST(abs(CAST(cumg AS HUGEINT) * (CAST(n AS HUGEINT) - CAST(ng AS HUGEINT)) - " +
        "(CAST(cumall AS HUGEINT) - CAST(cumg AS HUGEINT)) * CAST(ng AS HUGEINT)) AS DOUBLE) * " +
        "(vn - v) / (CAST(ng AS DOUBLE) * CAST(n - ng AS DOUBLE)) * 1048576) AS BIGINT) AS qq " +
        "FROM w, t WHERE vn IS NOT NULL), " +
        "f AS (SELECT g, max(ng) AS ng, COALESCE(sum(qq), 0) AS s2 FROM q GROUP BY g) " +
        "SELECT f.g AS group_key, CAST(f.ng AS BIGINT) AS n_g, " +
        "CAST(n AS BIGINT) - CAST(f.ng AS BIGINT) AS n_rest, " +
        "floor(CAST(s2 AS DOUBLE) / 1048576 * 10000 + 0.5) / 10000 AS w1, " +
        "CASE WHEN vmax > vmin THEN " +
        "CAST(floor(CAST(s2 AS DOUBLE) / 1048576 / (vmax - vmin) * 10000 + 0.5) AS BIGINT) END AS w1_norm_bp " +
        "FROM f, t"),

    "q236_substr_pairs" ->
      // full-postings ground truth: q107's positional-gram CTE, the same
      // 2..128 occurrence gate, a raw gram self-join where the engine
      // expands capped postings in-array, then q114's islands trick over
      // covered TOKEN positions per (pair, diagonal) — run length is the
      // island's token count (the engine merges the same token intervals)
      ("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts " +
        "FROM documents WHERE text IS NOT NULL), " +
        "grams AS (SELECT doc_id, i AS pos, ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] AS gram " +
        "FROM toks, UNNEST(range(len(ts) - 2)) AS t(i) WHERE len(ts) >= 3), " +
        "keep AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) BETWEEN 2 AND 128), " +
        "m AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS apos, a.pos - b.pos AS diag " +
        "FROM grams a JOIN keep USING (gram) JOIN grams b USING (gram) " +
        "WHERE a.doc_id < b.doc_id), " +
        "cov AS (SELECT DISTINCT a_id, b_id, diag, apos + o AS tpos " +
        "FROM m, UNNEST([0,1,2]) AS u(o)), " +
        "isl AS (SELECT a_id, b_id, diag, " +
        "tpos - row_number() OVER (PARTITION BY a_id, b_id, diag ORDER BY tpos) AS grp FROM cov), " +
        "runs AS (SELECT a_id, b_id, count(*) AS run_len " +
        "FROM isl GROUP BY a_id, b_id, diag, grp) " +
        "SELECT a_id, b_id, CAST(max(run_len) AS BIGINT) AS max_run, " +
        "CAST(sum(CASE WHEN run_len >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans " +
        "FROM runs GROUP BY a_id, b_id HAVING max(run_len) >= 6 ORDER BY a_id, b_id"),

    "q237_long_passage_removal" ->
      // q107's coverage CTE + q114's islands, gated at run_len >= 20,
      // re-expanded to positions, q107's string_agg reconstruction
      ("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents), " +
        "grams AS (SELECT doc_id, i AS pos, ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] AS gram " +
        "FROM toks, UNNEST(range(len(ts) - 2)) AS t(i) WHERE len(ts) >= 3), " +
        "dup AS (SELECT gram FROM grams GROUP BY gram HAVING min(doc_id) <> max(doc_id)), " +
        "covered AS (SELECT DISTINCT g.doc_id, g.pos + o AS tpos " +
        "FROM grams g JOIN dup USING (gram), UNNEST([0,1,2]) AS u(o)), " +
        "runs AS (SELECT doc_id, tpos, " +
        "tpos - row_number() OVER (PARTITION BY doc_id ORDER BY tpos) AS grp FROM covered), " +
        "longcov AS (SELECT doc_id, tpos FROM (SELECT doc_id, tpos, " +
        "count(*) OVER (PARTITION BY doc_id, grp) AS run_len FROM runs) WHERE run_len >= 20), " +
        "kept AS (SELECT t.doc_id, i AS tpos, ts[i+1] AS tok " +
        "FROM toks t, UNNEST(range(len(ts))) AS x(i) " +
        "WHERE NOT EXISTS (SELECT 1 FROM longcov c WHERE c.doc_id = t.doc_id AND c.tpos = i)) " +
        "SELECT toks.doc_id, len(ts) AS n_tokens, " +
        "len(ts) - coalesce(k.cnt, 0) AS n_removed, coalesce(k.txt, '') AS clean_text " +
        "FROM toks LEFT JOIN (SELECT doc_id, count(*) AS cnt, " +
        "string_agg(tok, ' ' ORDER BY tpos) AS txt FROM kept GROUP BY doc_id) k USING (doc_id) " +
        "ORDER BY toks.doc_id"),

    "q230_brown_forsythe" ->
      // quantile_cont == the exact grouped order statistic (q205/q215
      // interpolation-parity precedent), doubled to an integer center,
      // then q229's ANOVA chain verbatim on the doubled deviations
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "med AS (SELECT g, CAST(quantile_cont(tok, 0.5) * 2 AS BIGINT) AS m2 FROM v GROUP BY g), " +
        "dd AS (SELECT g, abs(2 * tok - m2) AS tok2 FROM v JOIN med USING (g)), " +
        "grp AS (SELECT g, count(*) AS n, sum(CAST(tok2 AS HUGEINT)) AS s, " +
        "sum(CAST(tok2 AS HUGEINT) * CAST(tok2 AS HUGEINT)) AS q FROM dd GROUP BY g), " +
        "one AS (SELECT list(struct_pack(n := n, s := s) ORDER BY g) AS gs, " +
        "sum(n) AS n, count(*) AS k, sum(s) AS st, sum(q) AS qt FROM grp), " +
        "f AS (SELECT n, k, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE) / CAST((e).n AS DOUBLE))), (a, b) -> a + b) - " +
        "CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS ssb, " +
        "CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS sst " +
        "FROM one) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups, " +
        "CASE WHEN k > 1 AND n > k AND sst - ssb > 0 THEN " +
        "floor(ssb / (CAST(k AS DOUBLE) - 1) / ((sst - ssb) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) * 10000 + 0.5) / 10000 END AS f, " +
        "CASE WHEN sst > 0 THEN CAST(floor(ssb / sst * 10000 + 0.5) AS BIGINT) END AS eta2_bp " +
        "FROM f"),

    "q231_cronbach_alpha" ->
      // q228's band raters as items, integer variance numerators
      // n*Sum(x^2) - Sum(x)^2 per item and for the row total, the
      // k/(k-1) literal spelled as its exact double 1.5
      ("WITH base AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS den, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok, " +
        "n_chars FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL), " +
        "r AS (SELECT " +
        "CASE WHEN num * 10 < den THEN 0 WHEN num * 5 < den THEN 1 ELSE 2 END AS r0, " +
        "CASE WHEN tok < 40 THEN 0 WHEN tok < 70 THEN 1 ELSE 2 END AS r1, " +
        "CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 380 THEN 1 ELSE 2 END AS r2 FROM base), " +
        "v AS (SELECT r0, r1, r2, r0 + r1 + r2 AS t FROM r), " +
        "m AS (SELECT count(*) AS n, " +
        "sum(CAST(t AS HUGEINT)) AS st, sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)) AS qt, " +
        "sum(CAST(r0 AS HUGEINT)) AS s0, sum(CAST(r0 AS HUGEINT) * CAST(r0 AS HUGEINT)) AS q0, " +
        "sum(CAST(r1 AS HUGEINT)) AS s1, sum(CAST(r1 AS HUGEINT) * CAST(r1 AS HUGEINT)) AS q1, " +
        "sum(CAST(r2 AS HUGEINT)) AS s2, sum(CAST(r2 AS HUGEINT) * CAST(r2 AS HUGEINT)) AS q2 FROM v), " +
        "f AS (SELECT n, " +
        "(CAST(n AS HUGEINT) * q0 - s0 * s0) + (CAST(n AS HUGEINT) * q1 - s1 * s1) + " +
        "(CAST(n AS HUGEINT) * q2 - s2 * s2) AS vi, " +
        "CAST(n AS HUGEINT) * qt - st * st AS vt FROM m) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(3 AS BIGINT) AS k_items, " +
        "CASE WHEN n > 1 AND vt <> 0 THEN " +
        "floor(1.5 * (1.0 - CAST(vi AS DOUBLE) / CAST(vt AS DOUBLE)) * 10000 + 0.5) / 10000 END AS alpha " +
        "FROM f"),

    "q228_fleiss_kappa" ->
      // the same three band raters, per-row vote squares, k*C conditional
      // masses, and the P-bar/P-e/kappa double chains spelled identically
      ("WITH base AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS den, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok, " +
        "n_chars FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL), " +
        "r AS (SELECT " +
        "CASE WHEN num * 10 < den THEN 0 WHEN num * 5 < den THEN 1 ELSE 2 END AS r0, " +
        "CASE WHEN tok < 40 THEN 0 WHEN tok < 70 THEN 1 ELSE 2 END AS r1, " +
        "CASE WHEN n_chars < 220 THEN 0 WHEN n_chars < 380 THEN 1 ELSE 2 END AS r2 FROM base), " +
        "b AS (SELECT " +
        "(CASE WHEN r0 = 0 THEN 1 ELSE 0 END + CASE WHEN r1 = 0 THEN 1 ELSE 0 END + CASE WHEN r2 = 0 THEN 1 ELSE 0 END) AS v0, " +
        "(CASE WHEN r0 = 1 THEN 1 ELSE 0 END + CASE WHEN r1 = 1 THEN 1 ELSE 0 END + CASE WHEN r2 = 1 THEN 1 ELSE 0 END) AS v1, " +
        "(CASE WHEN r0 = 2 THEN 1 ELSE 0 END + CASE WHEN r1 = 2 THEN 1 ELSE 0 END + CASE WHEN r2 = 2 THEN 1 ELSE 0 END) AS v2 FROM r), " +
        "m AS (SELECT count(*) AS n, " +
        "COALESCE(sum(v0 * v0 + v1 * v1 + v2 * v2), 0) AS ss, " +
        "COALESCE(sum(v0), 0) AS c0, COALESCE(sum(v1), 0) AS c1, COALESCE(sum(v2), 0) AS c2 FROM b), " +
        "f AS (SELECT n, " +
        "(CAST(ss AS DOUBLE) - CAST(n AS DOUBLE) * 3.0) / " +
        "(CAST(n AS DOUBLE) * 3.0 * (3.0 - 1)) AS pbar, " +
        "CAST(CAST(c0 AS HUGEINT) * CAST(c0 AS HUGEINT) + CAST(c1 AS HUGEINT) * CAST(c1 AS HUGEINT) + " +
        "CAST(c2 AS HUGEINT) * CAST(c2 AS HUGEINT) AS DOUBLE) / " +
        "(CAST(n AS DOUBLE) * 3.0 * (CAST(n AS DOUBLE) * 3.0)) AS pe, " +
        "CAST(c0 AS HUGEINT) * CAST(c0 AS HUGEINT) + CAST(c1 AS HUGEINT) * CAST(c1 AS HUGEINT) + " +
        "CAST(c2 AS HUGEINT) * CAST(c2 AS HUGEINT) AS cesum FROM m) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(3 AS BIGINT) AS k_raters, " +
        "CASE WHEN n > 0 THEN floor(pbar * 10000 + 0.5) / 10000 END AS p_bar, " +
        "CASE WHEN n > 0 THEN floor(pe * 10000 + 0.5) / 10000 END AS p_e, " +
        "CASE WHEN n > 0 AND cesum <> CAST(n AS HUGEINT) * 3 * (CAST(n AS HUGEINT) * 3) THEN " +
        "floor((pbar - pe) / (1.0 - pe) * 10000 + 0.5) / 10000 END AS kappa " +
        "FROM f"),

    "q229_anova" ->
      // same per-group integral moments, the same ORDER BY group fold
      // for the between-mass, the same F and eta^2 chains
      ("WITH v AS (SELECT source AS g, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "grp AS (SELECT g, count(*) AS n, sum(CAST(tok AS HUGEINT)) AS s, " +
        "sum(CAST(tok AS HUGEINT) * CAST(tok AS HUGEINT)) AS q FROM v GROUP BY g), " +
        "one AS (SELECT list(struct_pack(n := n, s := s) ORDER BY g) AS gs, " +
        "sum(n) AS n, count(*) AS k, sum(s) AS st, sum(q) AS qt FROM grp), " +
        "f AS (SELECT n, k, " +
        "list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).s AS DOUBLE) * CAST((e).s AS DOUBLE) / CAST((e).n AS DOUBLE))), (a, b) -> a + b) - " +
        "CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS ssb, " +
        "CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS sst " +
        "FROM one) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups, " +
        "CASE WHEN k > 1 AND n > k AND sst - ssb > 0 THEN " +
        "floor(ssb / (CAST(k AS DOUBLE) - 1) / ((sst - ssb) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) * 10000 + 0.5) / 10000 END AS f, " +
        "CASE WHEN sst > 0 THEN CAST(floor(ssb / sst * 10000 + 0.5) AS BIGINT) END AS eta2_bp " +
        "FROM f"),

    "q226_rate_diff" ->
      // same integer pass masses per side, the same pooled-z double chain
      ("WITH d AS (SELECT source, " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) * 20 >= " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) * 3 AS pass " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "a AS (SELECT count(*) AS na, COALESCE(sum(CASE WHEN pass THEN 1 ELSE 0 END), 0) AS ka " +
        "FROM d WHERE source = 'src0'), " +
        "b AS (SELECT count(*) AS nb, COALESCE(sum(CASE WHEN pass THEN 1 ELSE 0 END), 0) AS kb " +
        "FROM d WHERE source = 'src1'), " +
        "f AS (SELECT na, ka, nb, kb, CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd, " +
        "CAST(ka AS DOUBLE) AS kad, CAST(kb AS DOUBLE) AS kbd FROM a, b), " +
        "g AS (SELECT *, (kad + kbd) / (nad + nbd) AS pp FROM f) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(ka AS BIGINT) AS k_a, " +
        "CAST(nb AS BIGINT) AS n_b, CAST(kb AS BIGINT) AS k_b, " +
        "CASE WHEN na > 0 THEN CAST(floor(kad / nad * 10000 + 0.5) AS BIGINT) END AS rate_a_bp, " +
        "CASE WHEN nb > 0 THEN CAST(floor(kbd / nbd * 10000 + 0.5) AS BIGINT) END AS rate_b_bp, " +
        "CASE WHEN na > 0 AND nb > 0 THEN CAST(floor((kad / nad - kbd / nbd) * 10000 + 0.5) AS BIGINT) END AS diff_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND ka + kb > 0 AND ka + kb < na + nb THEN " +
        "floor((kad / nad - kbd / nbd) / sqrt(pp * (1.0 - pp) * (1.0 / nad + 1.0 / nbd)) * 10000 + 0.5) / 10000 END AS z " +
        "FROM g"),

    "q227_mcnemar" ->
      // the same four conditional masses and the same (b-c)^2/(b+c)
      // and continuity-corrected chains
      ("WITH d AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) * 20 >= " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) * 3 AS ra, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) >= 40 AS rb " +
        "FROM documents WHERE text IS NOT NULL), " +
        "m AS (SELECT count(*) AS n, " +
        "COALESCE(sum(CASE WHEN ra AND rb THEN 1 ELSE 0 END), 0) AS nboth, " +
        "COALESCE(sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END), 0) AS b, " +
        "COALESCE(sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END), 0) AS c, " +
        "COALESCE(sum(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END), 0) AS nneither FROM d) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(nboth AS BIGINT) AS n_both, " +
        "CAST(b AS BIGINT) AS n_only_a, CAST(c AS BIGINT) AS n_only_b, " +
        "CAST(nneither AS BIGINT) AS n_neither, " +
        "CASE WHEN b + c > 0 THEN " +
        "floor((CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) * (CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) / " +
        "(CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) * 10000 + 0.5) / 10000 END AS chi2, " +
        "CASE WHEN b + c > 0 THEN " +
        "floor((abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1) * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1) / " +
        "(CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) * 10000 + 0.5) / 10000 END AS chi2_cc " +
        "FROM m"),

    "q225_uncertainty_coeff" ->
      // same cells/marginals, the same SORTED list folds (ORDER BY key =
      // Spark's sort_array + array_distinct first-occurrence order),
      // negations and ratio divisions in the same positions
      ("WITH v AS (SELECT lang AS x, source AS y FROM documents " +
        "WHERE lang IS NOT NULL AND source IS NOT NULL), " +
        "cells AS (SELECT x, y, count(*) AS c FROM v GROUP BY x, y), " +
        "rx AS (SELECT x, sum(c) AS r FROM cells GROUP BY x), " +
        "ry AS (SELECT y, sum(c) AS s FROM cells GROUP BY y), " +
        "j AS (SELECT cells.x, cells.y, c, r, s FROM cells " +
        "JOIN rx USING (x) JOIN ry USING (y)), " +
        "t AS (SELECT sum(c) AS n, (SELECT count(*) FROM rx) AS kx, " +
        "(SELECT count(*) FROM ry) AS ky FROM cells), " +
        "lx AS (SELECT list(struct_pack(m := r) ORDER BY x) AS xs FROM rx), " +
        "ly AS (SELECT list(struct_pack(m := s) ORDER BY y) AS ys FROM ry), " +
        "lc AS (SELECT list(struct_pack(c := c, r := r, s := s) ORDER BY x, y) AS cs FROM j), " +
        "f AS (SELECT n, kx, ky, " +
        "-(list_reduce(list_prepend(0.0, list_transform(xs, e -> " +
        "CAST((e).m AS DOUBLE) / CAST(n AS DOUBLE) * ln(CAST((e).m AS DOUBLE) / CAST(n AS DOUBLE)))), (a, b) -> a + b)) AS hxr, " +
        "-(list_reduce(list_prepend(0.0, list_transform(ys, e -> " +
        "CAST((e).m AS DOUBLE) / CAST(n AS DOUBLE) * ln(CAST((e).m AS DOUBLE) / CAST(n AS DOUBLE)))), (a, b) -> a + b)) AS hyr, " +
        "list_reduce(list_prepend(0.0, list_transform(cs, e -> " +
        "CAST((e).c AS DOUBLE) / CAST(n AS DOUBLE) * " +
        "ln(CAST(n AS DOUBLE) * CAST((e).c AS DOUBLE) / (CAST((e).r AS DOUBLE) * CAST((e).s AS DOUBLE))))), (a, b) -> a + b) AS mir " +
        "FROM lx, ly, lc, t) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(kx AS BIGINT) AS k_x, CAST(ky AS BIGINT) AS k_y, " +
        "floor(hxr * 10000 + 0.5) / 10000 AS h_x, " +
        "floor(hyr * 10000 + 0.5) / 10000 AS h_y, " +
        "floor(mir * 10000 + 0.5) / 10000 AS mi, " +
        "CASE WHEN kx > 1 THEN floor(mir / hxr * 10000 + 0.5) / 10000 END AS u_xy, " +
        "CASE WHEN ky > 1 THEN floor(mir / hyr * 10000 + 0.5) / 10000 END AS u_yx " +
        "FROM f"),

    "q224_kendall_tau" ->
      // same integral decile draws, the quadratic cell self-join (the
      // grid is 10x10 — the oracle can afford what the engine's Fenwick
      // pass avoids), HUGEINT tie terms, one double chain
      ("WITH v AS (SELECT " +
        "least(9, CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS HUGEINT) * 10 // " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS HUGEINT)) AS xb, " +
        "least(9, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS HUGEINT) // 10) AS yb " +
        "FROM documents WHERE text IS NOT NULL), " +
        "cells AS (SELECT xb, yb, count(*) AS c FROM v GROUP BY xb, yb), " +
        "cd AS (SELECT " +
        "COALESCE(sum(CASE WHEN c2.xb > c1.xb AND c2.yb > c1.yb " +
        "THEN CAST(c1.c AS HUGEINT) * CAST(c2.c AS HUGEINT) ELSE 0 END), 0) AS cc, " +
        "COALESCE(sum(CASE WHEN c2.xb > c1.xb AND c2.yb < c1.yb " +
        "THEN CAST(c1.c AS HUGEINT) * CAST(c2.c AS HUGEINT) ELSE 0 END), 0) AS dd " +
        "FROM cells c1, cells c2), " +
        "t AS (SELECT sum(c) AS n FROM cells), " +
        "tx AS (SELECT COALESCE(sum(CAST(s AS HUGEINT) * (CAST(s AS HUGEINT) - 1) // 2), 0) AS n1 " +
        "FROM (SELECT sum(c) AS s FROM cells GROUP BY xb)), " +
        "ty AS (SELECT COALESCE(sum(CAST(s AS HUGEINT) * (CAST(s AS HUGEINT) - 1) // 2), 0) AS n2 " +
        "FROM (SELECT sum(c) AS s FROM cells GROUP BY yb)), " +
        "f AS (SELECT CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) - 1) // 2 AS n0, " +
        "n, cc, dd, n1, n2 FROM t, cd, tx, ty) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(cc AS BIGINT) AS n_concordant, " +
        "CAST(dd AS BIGINT) AS n_discordant, " +
        "CASE WHEN n0 > n1 AND n0 > n2 THEN " +
        "floor(CAST(cc - dd AS DOUBLE) / sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE)) * 10000 + 0.5) / 10000 END AS tau_b " +
        "FROM f"),

    "q223_pr_curve" ->
      // q209's score rational and integral bin draw, a 10-row threshold
      // spine, suffix sums per threshold, integer masses and bp rates
      ("WITH v AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS HUGEINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS HUGEINT) AS den, " +
        "(source = 'src0') AS y FROM documents " +
        "WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "b AS (SELECT least(9, num * 10 // den) AS bin, " +
        "CASE WHEN y THEN 1 ELSE 0 END AS pos FROM v), " +
        "p AS (SELECT bin, count(*) AS n, sum(pos) AS np FROM b GROUP BY bin), " +
        "tot AS (SELECT COALESCE(sum(np), 0) AS pp FROM p), " +
        "sp AS (SELECT range AS thr FROM range(10)), " +
        "s AS (SELECT thr, " +
        "COALESCE(sum(CASE WHEN bin >= thr THEN np ELSE 0 END), 0) AS tp, " +
        "COALESCE(sum(CASE WHEN bin >= thr THEN n - np ELSE 0 END), 0) AS fp " +
        "FROM sp LEFT JOIN p ON true GROUP BY thr) " +
        "SELECT CAST(thr AS BIGINT) AS thr_bin, CAST(tp AS BIGINT) AS tp, " +
        "CAST(fp AS BIGINT) AS fp, CAST(pp - tp AS BIGINT) AS fn, " +
        "CASE WHEN tp + fp > 0 THEN " +
        "CAST(floor(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS precision_bp, " +
        "CASE WHEN pp > 0 THEN " +
        "CAST(floor(CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS recall_bp, " +
        "CASE WHEN 2 * tp + fp + (pp - tp) > 0 THEN " +
        "CAST(floor(CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + (pp - tp) AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS f1_bp " +
        "FROM s, tot ORDER BY thr_bin"),

    "q222_wasserstein" ->
      // q220's per-value masses and inclusive cumulative sums, lead() for
      // the next-value gap, HUGEINT cross-mass numerators, per-gap
      // floor(term*2^20) quantization summed as integers, displays once
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cuma, " +
        "sum(cb) OVER (ORDER BY v) AS cumb, " +
        "lead(v) OVER (ORDER BY v) AS vn FROM pv), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb, " +
        "min(v) AS vmin, max(v) AS vmax FROM pv), " +
        "q AS (SELECT CAST(floor(CAST(abs(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT) - " +
        "CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT)) AS DOUBLE) * (vn - v) / " +
        "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * 1048576) AS BIGINT) AS qq " +
        "FROM c, t WHERE vn IS NOT NULL), " +
        "f AS (SELECT COALESCE(sum(qq), 0) AS s2 FROM q) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "floor(CAST(s2 AS DOUBLE) / 1048576 * 10000 + 0.5) / 10000 AS w1, " +
        "CASE WHEN vmax > vmin THEN " +
        "CAST(floor(CAST(s2 AS DOUBLE) / 1048576 / (vmax - vmin) * 10000 + 0.5) AS BIGINT) END AS w1_norm_bp " +
        "FROM f, t"),

    "q299_yuen_trimmed" ->
      // per-side value histogram + inclusive-window prefix (the q221
      // idiom), integer-division trim counts, clamped retained masses,
      // winsorized HUGEINT sums, and the t/dof double chains spelled as
      // the engine's
      ("WITH d AS (SELECT source, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "hca AS (SELECT v, count(*) AS c FROM d WHERE source = 'src0' GROUP BY v), " +
        "pa AS (SELECT v, c, sum(c) OVER (ORDER BY v) - c AS pfx FROM hca), " +
        "tta AS (SELECT COALESCE(sum(c), 0) AS nn FROM hca), " +
        "wa AS (SELECT v, c, pfx, nn, nn * 1 // 5 AS g FROM pa, tta), " +
        "sa AS (SELECT max(nn) AS na, max(g) AS ga, " +
        "min(CASE WHEN pfx <= g AND g < pfx + c THEN v END) AS loa, " +
        "min(CASE WHEN pfx <= nn - g - 1 AND nn - g - 1 < pfx + c THEN v END) AS hia, " +
        "COALESCE(sum(CAST(greatest(0, least(pfx + c, nn - g) - greatest(pfx, g)) AS HUGEINT) * CAST(v AS HUGEINT)), 0) AS t1a, " +
        "COALESCE(sum(CAST(greatest(0, least(pfx + c, nn - g) - greatest(pfx, g)) AS HUGEINT) * CAST(v AS HUGEINT) * CAST(v AS HUGEINT)), 0) AS t2a " +
        "FROM wa), " +
        "hcb AS (SELECT v, count(*) AS c FROM d WHERE source <> 'src0' GROUP BY v), " +
        "pb AS (SELECT v, c, sum(c) OVER (ORDER BY v) - c AS pfx FROM hcb), " +
        "ttb AS (SELECT COALESCE(sum(c), 0) AS nn FROM hcb), " +
        "wb AS (SELECT v, c, pfx, nn, nn * 1 // 5 AS g FROM pb, ttb), " +
        "sb AS (SELECT max(nn) AS nb, max(g) AS gb, " +
        "min(CASE WHEN pfx <= g AND g < pfx + c THEN v END) AS lob, " +
        "min(CASE WHEN pfx <= nn - g - 1 AND nn - g - 1 < pfx + c THEN v END) AS hib, " +
        "COALESCE(sum(CAST(greatest(0, least(pfx + c, nn - g) - greatest(pfx, g)) AS HUGEINT) * CAST(v AS HUGEINT)), 0) AS t1b, " +
        "COALESCE(sum(CAST(greatest(0, least(pfx + c, nn - g) - greatest(pfx, g)) AS HUGEINT) * CAST(v AS HUGEINT) * CAST(v AS HUGEINT)), 0) AS t2b " +
        "FROM wb), " +
        "f AS (SELECT na, nb, ga, gb, na - 2 * ga AS hha, nb - 2 * gb AS hhb, " +
        "t1a, t1b, " +
        "t1a + CAST(ga AS HUGEINT) * (CAST(loa AS HUGEINT) + CAST(hia AS HUGEINT)) AS w1a, " +
        "t2a + CAST(ga AS HUGEINT) * (CAST(loa AS HUGEINT) * CAST(loa AS HUGEINT) + CAST(hia AS HUGEINT) * CAST(hia AS HUGEINT)) AS w2a, " +
        "t1b + CAST(gb AS HUGEINT) * (CAST(lob AS HUGEINT) + CAST(hib AS HUGEINT)) AS w1b, " +
        "t2b + CAST(gb AS HUGEINT) * (CAST(lob AS HUGEINT) * CAST(lob AS HUGEINT) + CAST(hib AS HUGEINT) * CAST(hib AS HUGEINT)) AS w2b " +
        "FROM sa, sb), " +
        "g2 AS (SELECT na, nb, hha, hhb, t1a, t1b, " +
        "CAST(na AS HUGEINT) * w2a - w1a * w1a AS c2a, " +
        "CAST(nb AS HUGEINT) * w2b - w1b * w1b AS c2b FROM f), " +
        "g3 AS (SELECT na, nb, hha, hhb, c2a, c2b, " +
        "CAST(t1a AS DOUBLE) / CAST(hha AS DOUBLE) AS tma, " +
        "CAST(t1b AS DOUBLE) / CAST(hhb AS DOUBLE) AS tmb, " +
        "CAST(c2a AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(hha AS DOUBLE) * (CAST(hha AS DOUBLE) - 1)) AS da, " +
        "CAST(c2b AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(hhb AS DOUBLE) * (CAST(hhb AS DOUBLE) - 1)) AS db " +
        "FROM g2) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CAST(hha AS BIGINT) AS h_a, CAST(hhb AS BIGINT) AS h_b, " +
        "CASE WHEN hha > 0 THEN CAST(floor(tma * 10000 + 0.5) AS BIGINT) END AS tmean_a_bp, " +
        "CASE WHEN hhb > 0 THEN CAST(floor(tmb * 10000 + 0.5) AS BIGINT) END AS tmean_b_bp, " +
        "CASE WHEN hha > 1 AND hhb > 1 AND (c2a > 0 OR c2b > 0) THEN " +
        "CAST(floor((tma - tmb) / sqrt(da + db) * 10000 + 0.5) AS BIGINT) END AS t_bp, " +
        "CASE WHEN hha > 1 AND hhb > 1 AND (c2a > 0 OR c2b > 0) THEN " +
        "CAST(floor((da + db) * (da + db) / (da * da / (CAST(hha AS DOUBLE) - 1) + db * db / (CAST(hhb AS DOUBLE) - 1)) * 10000 + 0.5) AS BIGINT) END AS df_bp " +
        "FROM g3"),

    "q298_variance_ratio" ->
      // per-side exact HUGEINT moments (the q267 welch idiom), integer
      // variance numerators c2 = n*S2 - S1^2, the two-division chain
      // s2a/s2b spelled exactly as the engine's
      ("WITH d AS (SELECT source, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS v " +
        "FROM documents WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "a AS (SELECT count(*) AS na, COALESCE(sum(CAST(v AS HUGEINT)), 0) AS sa, " +
        "COALESCE(sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)), 0) AS qa " +
        "FROM d WHERE source = 'src0'), " +
        "b AS (SELECT count(*) AS nb, COALESCE(sum(CAST(v AS HUGEINT)), 0) AS sb, " +
        "COALESCE(sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)), 0) AS qb " +
        "FROM d WHERE source <> 'src0'), " +
        "f AS (SELECT na, nb, " +
        "CAST(na AS HUGEINT) * qa - sa * sa AS c2a, " +
        "CAST(nb AS HUGEINT) * qb - sb * sb AS c2b, " +
        "CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd FROM a, b), " +
        "g AS (SELECT na, nb, c2a, c2b, " +
        "CAST(c2a AS DOUBLE) / (nad * (nad - 1)) AS va, " +
        "CAST(c2b AS DOUBLE) / (nbd * (nbd - 1)) AS vb FROM f) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CASE WHEN na > 1 THEN CAST(floor(va * 10000 + 0.5) AS BIGINT) END AS var_a_bp, " +
        "CASE WHEN nb > 1 THEN CAST(floor(vb * 10000 + 0.5) AS BIGINT) END AS var_b_bp, " +
        "CASE WHEN na > 1 AND nb > 1 AND c2b > 0 THEN " +
        "floor(va / vb * 10000 + 0.5) / 10000 END AS f " +
        "FROM g"),

    "q221_mann_whitney" ->
      // same per-value masses as q220, histogram midranks spelled
      // 2·prefix + count + 1 from the inclusive window sum, HUGEINT
      // doubled rank-sum and tie moments, and the double chain
      // left-associated exactly as the Spark expression
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "m AS (SELECT ca, cb, ca + cb AS ct, " +
        "2 * (sum(ca + cb) OVER (ORDER BY v) - (ca + cb)) + (ca + cb) + 1 AS m2 FROM pv), " +
        // COALESCE mirrors the engine's empty-frame semantics: counts of
        // an empty relation are 0, not NULL (u2 then folds to exact 0)
        "a AS (SELECT COALESCE(sum(ca), 0) AS na, COALESCE(sum(cb), 0) AS nb, " +
        "COALESCE(sum(CAST(ca AS HUGEINT) * CAST(m2 AS HUGEINT)), 0) AS r2, " +
        "COALESCE(sum(CAST(ct AS HUGEINT) * CAST(ct AS HUGEINT) * CAST(ct AS HUGEINT) - CAST(ct AS HUGEINT)), 0) AS t3 FROM m), " +
        "f AS (SELECT na, nb, r2 - CAST(na AS HUGEINT) * (CAST(na AS HUGEINT) + 1) AS u2, t3, " +
        "CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd FROM a), " +
        "g AS (SELECT na, nb, u2, nad, nbd, CAST(u2 AS DOUBLE) / 2 AS ud, " +
        "nad * nbd / 12 * ((nad + nbd + 1) - CAST(t3 AS DOUBLE) / ((nad + nbd) * (nad + nbd - 1))) AS sigma2 FROM f) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "CAST(u2 AS BIGINT) AS u2, " +
        "CASE WHEN na > 0 AND nb > 0 THEN " +
        "CAST(floor(ud / (nad * nbd) * 10000 + 0.5) AS BIGINT) END AS auc_bp, " +
        "CASE WHEN na > 0 AND nb > 0 AND sigma2 > 0 THEN " +
        "floor((ud - nad * nbd / 2) / sqrt(sigma2) * 10000 + 0.5) / 10000 END AS z " +
        "FROM g"),

    "q220_ks_test" ->
      // same per-value masses, inclusive cumulative window sums in value
      // order, the HUGEINT cross-mass max, and the same double chain
      // (lambda spelled left-associated exactly as the Spark expression)
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "pv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM u GROUP BY v), " +
        "c AS (SELECT sum(ca) OVER (ORDER BY v) AS cuma, " +
        "sum(cb) OVER (ORDER BY v) AS cumb FROM pv), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pv), " +
        "m AS (SELECT max(abs(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT) - " +
        "CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT))) AS dnum, " +
        "max(na) AS na, max(nb) AS nb FROM c, t) " +
        "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, " +
        "floor(CAST(dnum AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * 10000 + 0.5) / 10000 AS ks_d, " +
        "floor(least(1.0, 2.0 * exp(-2.0 * " +
        "(sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))) * " +
        "(CAST(dnum AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))) * " +
        "(sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))) * " +
        "(CAST(dnum AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))))) * 10000 + 0.5) / 10000 AS p_value " +
        "FROM m"),

    "q219_rbo" -> {
      // q201's bm/dn list CTEs at LIMIT 10, then the RBO fold with the
      // SAME iterated-multiplication weight literals the Spark plan uses
      // (shortest-round-trip decimal text -> identical doubles)
      val w = Array.iterate(1.0, 10)(_ * 0.9)
      val terms = (1 to 10).map { d =>
        s"${w(d - 1)} * CAST(len(list_filter(ms, m -> m <= $d)) AS DOUBLE) / ${d.toDouble}"
      }.mkString(" + ")
      ("WITH perdoc AS (SELECT doc_id, len(ts) AS len, " +
        "len(list_filter(ts, x -> x = 'merge')) AS tf0, " +
        "len(list_filter(ts, x -> x = 'batch')) AS tf1, " +
        "len(list_filter(ts, x -> x = 'window')) AS tf2, " +
        "len(list_filter(ts, x -> x = 'stream')) AS tf3 " +
        "FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ts " +
        "FROM documents WHERE trim(text) <> '')), " +
        "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(sum(len) AS DOUBLE) / count(*) AS avglen, " +
        "CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0, " +
        "CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1, " +
        "CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2, " +
        "CAST(sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3 FROM perdoc), " +
        "scored AS (SELECT doc_id, " +
        "(ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * (CAST(tf0 AS DOUBLE) * 2.2) / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(len AS DOUBLE) / s.avglen))) + " +
        "(ln(1 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5)) * (CAST(tf1 AS DOUBLE) * 2.2) / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(len AS DOUBLE) / s.avglen))) + " +
        "(ln(1 + (s.n - s.df2 + 0.5) / (s.df2 + 0.5)) * (CAST(tf2 AS DOUBLE) * 2.2) / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(len AS DOUBLE) / s.avglen))) + " +
        "(ln(1 + (s.n - s.df3 + 0.5) / (s.df3 + 0.5)) * (CAST(tf3 AS DOUBLE) * 2.2) / (CAST(tf3 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(len AS DOUBLE) / s.avglen))) AS score " +
        "FROM perdoc CROSS JOIN s), " +
        "bm AS (SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk, doc_id " +
        "FROM scored WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 10), " +
        "e AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm FROM embeddings), " +
        "qv AS (SELECT embedding AS qe, nrm AS qn FROM e WHERE vec_id = 0), " +
        "ds AS (SELECT e.vec_id, CASE WHEN e.nrm * qn = 0 THEN 0.0 " +
        "ELSE list_sum(list_transform(list_zip(e.embedding, qe), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (e.nrm * qn) END AS cos " +
        "FROM e, qv WHERE e.vec_id <> 0), " +
        "dn AS (SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk, vec_id AS doc_id " +
        "FROM ds ORDER BY cos DESC, vec_id LIMIT 10), " +
        "mdl AS (SELECT greatest(bm.rnk, dn.rnk) AS md FROM bm JOIN dn USING (doc_id)), " +
        // COALESCE: DuckDB's list() over zero rows is NULL where Spark's
        // collect_list is [] — an empty overlap must fold to rbo 0.0
        "o AS (SELECT list_sort(COALESCE(list(md), [])) AS ms, CAST(count(*) AS BIGINT) AS n_overlap FROM mdl) " +
        s"SELECT n_overlap, floor(${1.0 - 0.9} * ($terms) * 10000 + 0.5) / 10000 AS rbo FROM o")
    },

    "q218_spearman" ->
      // q207's score expression and row_number/(min+max) midrank idiom on
      // BOTH axes, exact HUGEINT moments, one double expression at the end
      ("WITH v AS (SELECT doc_id AS id, " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS DOUBLE) / " +
        "len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS x, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS DOUBLE) AS y " +
        "FROM documents WHERE text IS NOT NULL), " +
        "rx AS (SELECT id, x, row_number() OVER (ORDER BY x, id) AS r FROM v), " +
        "mx AS (SELECT x, min(r) + max(r) AS m2 FROM rx GROUP BY x), " +
        "jx AS (SELECT id, m2 AS mxv FROM rx JOIN mx USING (x)), " +
        "ry AS (SELECT id, y, row_number() OVER (ORDER BY y, id) AS r FROM v), " +
        "my AS (SELECT y, min(r) + max(r) AS m2 FROM ry GROUP BY y), " +
        "jy AS (SELECT id, m2 AS myv FROM ry JOIN my USING (y)), " +
        "j AS (SELECT mxv, myv FROM jx JOIN jy USING (id)), " +
        "a AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "sum(CAST(mxv AS HUGEINT)) AS sx, sum(CAST(myv AS HUGEINT)) AS sy, " +
        "sum(CAST(mxv AS HUGEINT) * CAST(mxv AS HUGEINT)) AS sxx, " +
        "sum(CAST(myv AS HUGEINT) * CAST(myv AS HUGEINT)) AS syy, " +
        "sum(CAST(mxv AS HUGEINT) * CAST(myv AS HUGEINT)) AS sxy FROM j) " +
        "SELECT n, floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
        "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
        "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
        "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) " +
        "* 10000 + 0.5) / 10000 AS rho FROM a"),

    "q217_governance_card" ->
      // q210's calibration CTEs, q214's fairness CTEs, and q211's PSI
      // CTEs verbatim (renamed), meeting in one integer row
      ("WITH vc AS (SELECT " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS HUGEINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS HUGEINT) AS den, " +
        "(source = 'src0') AS y FROM documents " +
        "WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "bc AS (SELECT least(9, num * 10 // den) AS bin, " +
        "num * 1048576 // den AS sq20, " +
        "(num - CASE WHEN y THEN den ELSE 0 END) * (num - CASE WHEN y THEN den ELSE 0 END) " +
        "* 1048576 // (den * den) AS bq20, " +
        "CASE WHEN y THEN 1 ELSE 0 END AS pos FROM vc), " +
        "pcal AS (SELECT bin, count(*) AS n, sum(pos) AS n_pos, " +
        "sum(sq20) AS ssum, sum(bq20) AS bsum FROM bc GROUP BY bin), " +
        "ocal AS (SELECT list(struct_pack(bin := bin, n := n, n_pos := n_pos, s := ssum) ORDER BY bin) AS bs, " +
        "sum(n) AS nn, sum(n_pos) AS np, sum(bsum) AS bb FROM pcal), " +
        "calrow AS (SELECT CAST(nn AS BIGINT) AS n_docs, CAST(np AS BIGINT) AS n_src0, " +
        "CAST(floor(list_reduce(list_prepend(0.0, list_transform(bs, e -> " +
        "CAST((e).n AS DOUBLE) / CAST(nn AS DOUBLE) * " +
        "abs(CAST((e).s AS DOUBLE) / (CAST((e).n AS DOUBLE) * 1048576.0) - " +
        "CAST((e).n_pos AS DOUBLE) / CAST((e).n AS DOUBLE)))), " +
        "(x, y) -> x + y) * 10000 + 0.5) AS BIGINT) AS ece_bp, " +
        "CAST(floor(CAST(bb AS DOUBLE) / (CAST(nn AS DOUBLE) * 1048576.0) * 10000 + 0.5) AS BIGINT) AS brier_bp " +
        "FROM ocal), " +
        "vf AS (SELECT lang AS group_key, " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS den, " +
        "(source = 'src0') AS y FROM documents " +
        "WHERE text IS NOT NULL AND source IS NOT NULL AND lang IS NOT NULL), " +
        "pf AS (SELECT group_key, y, " +
        "CAST(num AS HUGEINT) * 20 >= CAST(den AS HUGEINT) * 3 AS pred FROM vf), " +
        "af AS (SELECT group_key, count(*) AS n, " +
        "sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_label_pos, " +
        "sum(CASE WHEN pred THEN 1 ELSE 0 END) AS n_pred_pos, " +
        "sum(CASE WHEN pred AND y THEN 1 ELSE 0 END) AS tp, " +
        "sum(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END) AS fp " +
        "FROM pf GROUP BY group_key), " +
        "rf AS (SELECT " +
        "CAST(floor(CAST(n_pred_pos AS DOUBLE) / CAST(n AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS sel, " +
        "CASE WHEN n_label_pos > 0 THEN CAST(floor(CAST(tp AS DOUBLE) / CAST(n_label_pos AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS tpr, " +
        "CASE WHEN n - n_label_pos > 0 THEN CAST(floor(CAST(fp AS DOUBLE) / CAST(n - n_label_pos AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS fpr " +
        "FROM af), " +
        "gf AS (SELECT CAST(count(*) AS BIGINT) AS n_groups, " +
        "max(sel) - min(sel) AS parity_gap_bp, " +
        "max(tpr) - min(tpr) AS tpr_gap_bp, " +
        "max(fpr) - min(fpr) AS fpr_gap_bp FROM rf), " +
        "fairrow AS (SELECT n_groups, parity_gap_bp, " +
        "CASE WHEN tpr_gap_bp IS NULL THEN fpr_gap_bp " +
        "WHEN fpr_gap_bp IS NULL THEN tpr_gap_bp " +
        "ELSE greatest(tpr_gap_bp, fpr_gap_bp) END AS eo_gap_bp FROM gf), " +
        "toksd AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok " +
        "FROM documents WHERE trim(text) <> ''), " +
        "bucketd AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) % 1024 AS b FROM toksd), " +
        "ad AS (SELECT b, count(*) AS ca FROM bucketd WHERE doc_id % 2 = 0 GROUP BY b), " +
        "bd AS (SELECT b, count(*) AS cb FROM bucketd WHERE doc_id % 2 = 1 GROUP BY b), " +
        "attd AS (SELECT sum(ca) AS na FROM ad), bttd AS (SELECT sum(cb) AS nb FROM bd), " +
        "spined AS (SELECT range AS b FROM range(1024)), " +
        "probsd AS (SELECT (COALESCE(ca, 0) + 1.0) / (na + 1024) AS pa, " +
        "(COALESCE(cb, 0) + 1.0) / (nb + 1024) AS pb " +
        "FROM spined LEFT JOIN ad USING (b) LEFT JOIN bd USING (b), attd, bttd), " +
        "psirow AS (SELECT CAST(floor(round(sum((pa - pb) * ln(pa / pb)), 4) * 10000 + 0.5) AS BIGINT) AS psi_bp FROM probsd), " +
        // q220's KS CTEs verbatim (renamed), bp of the rounded ks_d
        "ksu AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s " +
        "FROM events WHERE value IS NOT NULL), " +
        "kspv AS (SELECT v, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cb FROM ksu GROUP BY v), " +
        "ksc AS (SELECT sum(ca) OVER (ORDER BY v) AS cuma, " +
        "sum(cb) OVER (ORDER BY v) AS cumb FROM kspv), " +
        "kst AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM kspv), " +
        "ksm AS (SELECT max(abs(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT) - " +
        "CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT))) AS dnum, " +
        "max(na) AS na, max(nb) AS nb FROM ksc, kst), " +
        "ksrow AS (SELECT CAST(floor(" +
        "floor(CAST(dnum AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * 10000 + 0.5) / 10000 " +
        "* 10000 + 0.5) AS BIGINT) AS ks_d_bp FROM ksm), " +
        // q218's Spearman CTEs verbatim (renamed), bp of the rounded rho
        "spv AS (SELECT doc_id AS id, " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS DOUBLE) / " +
        "len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS x, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS DOUBLE) AS y " +
        "FROM documents WHERE text IS NOT NULL), " +
        "sprx AS (SELECT id, x, row_number() OVER (ORDER BY x, id) AS r FROM spv), " +
        "spmx AS (SELECT x, min(r) + max(r) AS m2 FROM sprx GROUP BY x), " +
        "spjx AS (SELECT id, m2 AS mxv FROM sprx JOIN spmx USING (x)), " +
        "spry AS (SELECT id, y, row_number() OVER (ORDER BY y, id) AS r FROM spv), " +
        "spmy AS (SELECT y, min(r) + max(r) AS m2 FROM spry GROUP BY y), " +
        "spjy AS (SELECT id, m2 AS myv FROM spry JOIN spmy USING (y)), " +
        "spj AS (SELECT mxv, myv FROM spjx JOIN spjy USING (id)), " +
        "spa AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "sum(CAST(mxv AS HUGEINT)) AS sx, sum(CAST(myv AS HUGEINT)) AS sy, " +
        "sum(CAST(mxv AS HUGEINT) * CAST(mxv AS HUGEINT)) AS sxx, " +
        "sum(CAST(myv AS HUGEINT) * CAST(myv AS HUGEINT)) AS syy, " +
        "sum(CAST(mxv AS HUGEINT) * CAST(myv AS HUGEINT)) AS sxy FROM spj), " +
        "sprow AS (SELECT CAST(floor(" +
        "floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - " +
        "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
        "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
        "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) " +
        "* 10000 + 0.5) / 10000 * 10000 + 0.5) AS BIGINT) AS spearman_bp FROM spa) " +
        "SELECT n_docs, n_src0, ece_bp, brier_bp, n_groups, parity_gap_bp, eo_gap_bp, psi_bp, ks_d_bp, spearman_bp " +
        "FROM calrow, fairrow, psirow, ksrow, sprow"),

    "q216_grouped_calibration" ->
      // q210's fold per language group: the same per-(group, bin) masses,
      // the same ORDER BY bin list fold, the same bp renderings
      ("WITH v AS (SELECT lang AS group_key, " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS HUGEINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS HUGEINT) AS den, " +
        "(source = 'src0') AS y FROM documents " +
        "WHERE text IS NOT NULL AND source IS NOT NULL AND lang IS NOT NULL), " +
        "b AS (SELECT group_key, least(9, num * 10 // den) AS bin, " +
        "num * 1048576 // den AS sq20, " +
        "(num - CASE WHEN y THEN den ELSE 0 END) * (num - CASE WHEN y THEN den ELSE 0 END) " +
        "* 1048576 // (den * den) AS bq20, " +
        "CASE WHEN y THEN 1 ELSE 0 END AS pos FROM v), " +
        "p AS (SELECT group_key, bin, count(*) AS bn, sum(pos) AS bpos, " +
        "sum(sq20) AS bs, sum(bq20) AS bb FROM b GROUP BY group_key, bin), " +
        "o AS (SELECT group_key, " +
        "list(struct_pack(bin := bin, bn := bn, bpos := bpos, bs := bs) ORDER BY bin) AS gs, " +
        "sum(bn) AS nn, sum(bpos) AS np, sum(bb) AS bbt FROM p GROUP BY group_key) " +
        "SELECT group_key, CAST(nn AS BIGINT) AS n, CAST(np AS BIGINT) AS n_pos, " +
        "CAST(floor(list_reduce(list_prepend(0.0, list_transform(gs, e -> " +
        "CAST((e).bn AS DOUBLE) / CAST(nn AS DOUBLE) * " +
        "abs(CAST((e).bs AS DOUBLE) / (CAST((e).bn AS DOUBLE) * 1048576.0) - " +
        "CAST((e).bpos AS DOUBLE) / CAST((e).bn AS DOUBLE)))), " +
        "(x, y) -> x + y) * 10000 + 0.5) AS BIGINT) AS ece_bp, " +
        "CAST(floor(CAST(bbt AS DOUBLE) / (CAST(nn AS DOUBLE) * 1048576.0) * 10000 + 0.5) AS BIGINT) AS brier_bp " +
        "FROM o ORDER BY group_key"),

    "q215_score_drift" ->
      // quantile_cont deciles over the even-id reference (q205's exact
      // interpolation parity), the same <-chain bin draw, the same
      // smoothed PSI sum over the 10-bin spine, band from the rounded
      // value
      ("WITH r AS (SELECT CAST(value AS DOUBLE) AS v FROM events " +
        "WHERE value IS NOT NULL AND event_id % 2 = 0), " +
        "c AS (SELECT " +
        (1 until 10).map(i => s"quantile_cont(v, 0.$i) AS c$i").mkString(", ") +
        " FROM r), " +
        "u AS (SELECT CAST(value AS DOUBLE) AS v, event_id % 2 AS s FROM events " +
        "WHERE value IS NOT NULL), " +
        "b AS (SELECT CASE " +
        (1 until 10).map(i => s"WHEN v < c$i THEN ${i - 1}").mkString(" ") +
        " ELSE 9 END AS bin, s FROM u, c), " +
        "p AS (SELECT bin, sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS cr, " +
        "sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS cc FROM b GROUP BY bin), " +
        "t AS (SELECT sum(cr) AS nr, sum(cc) AS nc FROM p), " +
        "spine AS (SELECT range AS bin FROM range(10)), " +
        "probs AS (SELECT (COALESCE(cr, 0) + 1.0) / (nr + 10) AS pr, " +
        "(COALESCE(cc, 0) + 1.0) / (nc + 10) AS pc, nr, nc " +
        "FROM spine LEFT JOIN p USING (bin), t), " +
        "f AS (SELECT CAST(max(nr) AS BIGINT) AS n_ref, CAST(max(nc) AS BIGINT) AS n_cur, " +
        "round(sum((pr - pc) * ln(pr / pc)), 4) AS psi FROM probs) " +
        "SELECT n_ref, n_cur, psi, " +
        "CASE WHEN psi < 0.1 THEN 'stable' WHEN psi < 0.25 THEN 'moderate' ELSE 'major' END AS band FROM f"),

    "q213_fairness_audit" ->
      // same rational, same HUGEINT cross-multiplied decision, same
      // NULL-when-undefined rate semantics
      ("WITH v AS (SELECT lang AS group_key, " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS den, " +
        "(source = 'src0') AS y FROM documents " +
        "WHERE text IS NOT NULL AND source IS NOT NULL AND lang IS NOT NULL), " +
        "p AS (SELECT group_key, y, " +
        "CAST(num AS HUGEINT) * 20 >= CAST(den AS HUGEINT) * 3 AS pred FROM v), " +
        "a AS (SELECT group_key, count(*) AS n, " +
        "sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_label_pos, " +
        "sum(CASE WHEN pred THEN 1 ELSE 0 END) AS n_pred_pos, " +
        "sum(CASE WHEN pred AND y THEN 1 ELSE 0 END) AS tp, " +
        "sum(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END) AS fp, " +
        "sum(CASE WHEN NOT pred AND y THEN 1 ELSE 0 END) AS fn, " +
        "sum(CASE WHEN NOT pred AND NOT y THEN 1 ELSE 0 END) AS tn " +
        "FROM p GROUP BY group_key) " +
        "SELECT group_key, CAST(n AS BIGINT) AS n, " +
        "CAST(n_label_pos AS BIGINT) AS n_label_pos, " +
        "CAST(n_pred_pos AS BIGINT) AS n_pred_pos, " +
        "CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, " +
        "CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn, " +
        "CAST(floor(CAST(n_pred_pos AS DOUBLE) / CAST(n AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS selection_rate_bp, " +
        "CASE WHEN n_label_pos > 0 THEN CAST(floor(CAST(tp AS DOUBLE) / CAST(n_label_pos AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS tpr_bp, " +
        "CASE WHEN n - n_label_pos > 0 THEN CAST(floor(CAST(fp AS DOUBLE) / CAST(n - n_label_pos AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS fpr_bp " +
        "FROM a ORDER BY group_key"),

    "q214_fairness_gaps" ->
      // q213's per-group rates reduced to integer max-min spreads; the
      // equalized-odds CASE mirrors Spark's null-skipping greatest
      ("WITH v AS (SELECT lang AS group_key, " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS BIGINT) AS num, " +
        "CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS den, " +
        "(source = 'src0') AS y FROM documents " +
        "WHERE text IS NOT NULL AND source IS NOT NULL AND lang IS NOT NULL), " +
        "p AS (SELECT group_key, y, " +
        "CAST(num AS HUGEINT) * 20 >= CAST(den AS HUGEINT) * 3 AS pred FROM v), " +
        "a AS (SELECT group_key, count(*) AS n, " +
        "sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_label_pos, " +
        "sum(CASE WHEN pred THEN 1 ELSE 0 END) AS n_pred_pos, " +
        "sum(CASE WHEN pred AND y THEN 1 ELSE 0 END) AS tp, " +
        "sum(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END) AS fp " +
        "FROM p GROUP BY group_key), " +
        "r AS (SELECT " +
        "CAST(floor(CAST(n_pred_pos AS DOUBLE) / CAST(n AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS sel, " +
        "CASE WHEN n_label_pos > 0 THEN CAST(floor(CAST(tp AS DOUBLE) / CAST(n_label_pos AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS tpr, " +
        "CASE WHEN n - n_label_pos > 0 THEN CAST(floor(CAST(fp AS DOUBLE) / CAST(n - n_label_pos AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS fpr " +
        "FROM a), " +
        "g AS (SELECT CAST(count(*) AS BIGINT) AS n_groups, " +
        "max(sel) - min(sel) AS parity_gap_bp, " +
        "max(tpr) - min(tpr) AS tpr_gap_bp, " +
        "max(fpr) - min(fpr) AS fpr_gap_bp FROM r) " +
        "SELECT n_groups, parity_gap_bp, tpr_gap_bp, fpr_gap_bp, " +
        "CASE WHEN tpr_gap_bp IS NULL THEN fpr_gap_bp " +
        "WHEN fpr_gap_bp IS NULL THEN tpr_gap_bp " +
        "ELSE greatest(tpr_gap_bp, fpr_gap_bp) END AS eo_gap_bp FROM g"),

    "q207_score_auc" ->
      // same score expression as q17's oracle (unrounded), ranks via
      // row_number (the two engines' rank machineries agree because ties
      // break on id), integer midrank pairs, divisions once at the end
      ("WITH v AS (SELECT doc_id AS id, " +
        "CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains($duckStopwords, t))) AS DOUBLE) / " +
        "len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS s, " +
        "(source = 'src0') AS l FROM documents " +
        "WHERE text IS NOT NULL AND source IS NOT NULL), " +
        "r AS (SELECT id, s, l, row_number() OVER (ORDER BY s, id) AS rk FROM v), " +
        "m AS (SELECT s, min(rk) + max(rk) AS m2 FROM r GROUP BY s), " +
        "a AS (SELECT CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS np, " +
        "CAST(sum(CASE WHEN l THEN 0 ELSE 1 END) AS BIGINT) AS nn, " +
        "CAST(sum(CASE WHEN l THEN m2 ELSE 0 END) AS DOUBLE) AS sp2 " +
        "FROM r JOIN m USING (s)) " +
        "SELECT np AS n_pos, nn AS n_neg, " +
        "floor(((sp2 / 2 - CAST(np AS DOUBLE) * (np + 1) / 2) / " +
        "(CAST(np AS DOUBLE) * CAST(nn AS DOUBLE))) * 10000 + 0.5) / 10000 AS auc " +
        "FROM a"),

    "q206_conformal_interval" ->
      // same exact decimal moments -> double OLS, same residual chain,
      // same integer-rank order statistic (rank via row_number instead of
      // the k-bounded TakeOrdered — both select the k-th smallest), and
      // k from the exact integer form of ceil(0.9 * (n_cal + 1))
      ("WITH b AS (SELECT doc_id AS id, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DECIMAL(18,2)) AS x, " +
        "CAST(n_chars AS DECIMAL(18,2)) AS y " +
        "FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL " +
        "AND doc_id IS NOT NULL), " +
        "m AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(x) AS DOUBLE) AS sx, " +
        "CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(x * x) AS DOUBLE) AS sxx, " +
        "CAST(sum(x * y) AS DOUBLE) AS sxy FROM b), " +
        "f AS (SELECT bb, sy / n - bb * (sx / n) AS aa FROM (" +
        "SELECT n, sx, sy, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS bb FROM m)), " +
        "s AS (SELECT id, abs(CAST(y AS DOUBLE) - (aa + bb * CAST(x AS DOUBLE))) AS r, " +
        "(id % 5 = 0) AS cal FROM b, f), " +
        "kk AS (SELECT CAST(count(*) AS BIGINT) AS n_cal, " +
        "least((9 * (CAST(count(*) AS BIGINT) + 1) + 9) // 10, CAST(count(*) AS BIGINT)) AS k " +
        "FROM s WHERE cal), " +
        "q AS (SELECT r AS qh FROM (SELECT r, row_number() OVER (ORDER BY r, id) AS rk " +
        "FROM s WHERE cal), kk WHERE rk = kk.k) " +
        "SELECT kk.n_cal AS n_cal, CAST(count(*) AS BIGINT) AS n_eval, kk.k AS k, " +
        "floor(f.bb * 10000 + 0.5) / 10000 AS slope, " +
        "floor(f.aa * 10000 + 0.5) / 10000 AS intercept, " +
        "floor(q.qh * 10000 + 0.5) / 10000 AS q_hat, " +
        "floor((CAST(sum(CASE WHEN s.r <= q.qh THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000 AS coverage " +
        "FROM s, kk, q, f WHERE NOT s.cal " +
        "GROUP BY kk.n_cal, kk.k, f.bb, f.aa, q.qh"),

    "q204_winsorize" ->
      // same exact interpolated percentiles (quantile_cont = the q34-
      // proven kernel), same least/greatest clip, floor-form display
      ("WITH c AS (SELECT event_type, " +
        "quantile_cont(CAST(value AS DOUBLE), 0.05) AS lo, " +
        "quantile_cont(CAST(value AS DOUBLE), 0.95) AS hi " +
        "FROM events GROUP BY 1) " +
        "SELECT e.event_type, e.event_id, CAST(e.value AS DOUBLE) AS value, " +
        "floor(least(greatest(CAST(e.value AS DOUBLE), c.lo), c.hi) * 10000 + 0.5) / 10000 AS clipped, " +
        "(CAST(e.value AS DOUBLE) < c.lo OR CAST(e.value AS DOUBLE) > c.hi) AS was_clipped " +
        "FROM events e JOIN c USING (event_type) ORDER BY e.event_id"),

    "q205_temporal_split" ->
      // same exact time quantiles over epoch micros, same boundary
      // comparisons; min/max are exact integers
      ("WITH v AS (SELECT epoch_us(ts) AS t FROM events WHERE ts IS NOT NULL), " +
        "c AS (SELECT quantile_cont(CAST(t AS DOUBLE), 0.6) AS t1, " +
        "quantile_cont(CAST(t AS DOUBLE), 0.7) AS t2 FROM v) " +
        "SELECT CASE WHEN CAST(t AS DOUBLE) < c.t1 THEN 'train' " +
        "WHEN CAST(t AS DOUBLE) >= c.t2 THEN 'test' ELSE 'embargo' END AS split, " +
        "CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(min(t) AS BIGINT) AS min_ts, CAST(max(t) AS BIGINT) AS max_ts " +
        "FROM v, c GROUP BY 1 ORDER BY split"),

    "q201_hybrid_rrf" ->
      // q129's BM25 CTE and q93's cosine kernel verbatim, then the RRF
      // arithmetic: 1/(60+rank) sums over integer ranks, floor-form round
      ("WITH perdoc AS (SELECT doc_id, len(ts) AS len, " +
        "len(list_filter(ts, x -> x = 'merge')) AS tf0, " +
        "len(list_filter(ts, x -> x = 'batch')) AS tf1, " +
        "len(list_filter(ts, x -> x = 'window')) AS tf2, " +
        "len(list_filter(ts, x -> x = 'stream')) AS tf3 " +
        "FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ts " +
        "FROM documents WHERE trim(text) <> '')), " +
        "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
        "CAST(sum(len) AS DOUBLE) / count(*) AS avglen, " +
        "CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0, " +
        "CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1, " +
        "CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2, " +
        "CAST(sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3 FROM perdoc), " +
        "scored AS (SELECT doc_id, " +
        "(ln(1 + (s.n - s.df0 + 0.5) / (s.df0 + 0.5)) * (CAST(tf0 AS DOUBLE) * 2.2) / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(len AS DOUBLE) / s.avglen))) + " +
        "(ln(1 + (s.n - s.df1 + 0.5) / (s.df1 + 0.5)) * (CAST(tf1 AS DOUBLE) * 2.2) / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(len AS DOUBLE) / s.avglen))) + " +
        "(ln(1 + (s.n - s.df2 + 0.5) / (s.df2 + 0.5)) * (CAST(tf2 AS DOUBLE) * 2.2) / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(len AS DOUBLE) / s.avglen))) + " +
        "(ln(1 + (s.n - s.df3 + 0.5) / (s.df3 + 0.5)) * (CAST(tf3 AS DOUBLE) * 2.2) / (CAST(tf3 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(len AS DOUBLE) / s.avglen))) AS score " +
        "FROM perdoc CROSS JOIN s), " +
        "bm AS (SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk, doc_id " +
        "FROM scored WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20), " +
        "e AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm FROM embeddings), " +
        "qv AS (SELECT embedding AS qe, nrm AS qn FROM e WHERE vec_id = 0), " +
        "ds AS (SELECT e.vec_id, CASE WHEN e.nrm * qn = 0 THEN 0.0 " +
        "ELSE list_sum(list_transform(list_zip(e.embedding, qe), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (e.nrm * qn) END AS cos " +
        "FROM e, qv WHERE e.vec_id <> 0), " +
        "dn AS (SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk, vec_id AS doc_id " +
        "FROM ds ORDER BY cos DESC, vec_id LIMIT 20), " +
        "f AS (SELECT COALESCE(bm.doc_id, dn.doc_id) AS doc_id, " +
        "COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + bm.rnk AS DOUBLE), 0.0) + " +
        "COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + dn.rnk AS DOUBLE), 0.0) AS fs, " +
        "bm.rnk IS NOT NULL AS in_sparse, dn.rnk IS NOT NULL AS in_dense " +
        "FROM bm FULL OUTER JOIN dn ON bm.doc_id = dn.doc_id), " +
        "t AS (SELECT * FROM f ORDER BY fs DESC, doc_id LIMIT 10) " +
        "SELECT CAST(row_number() OVER (ORDER BY fs DESC, doc_id) AS BIGINT) AS rnk, " +
        "doc_id, floor(fs * 10000 + 0.5) / 10000 AS rrf, in_sparse, in_dense " +
        "FROM t ORDER BY rnk"),

    "q202_token_burstiness" ->
      // same tokenizer as q129's oracle; df/Σc/Σc² integer moments, every
      // double division once at the end, floor-form display
      ("WITH base AS (SELECT doc_id, text FROM documents " +
        "WHERE text IS NOT NULL AND trim(text) <> ''), " +
        "tf AS (SELECT doc_id, token, count(*) AS c FROM (" +
        "SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token " +
        "FROM base) GROUP BY doc_id, token), " +
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base), " +
        "m AS (SELECT token, count(*) AS df, sum(c) AS s1, sum(c * c) AS s2 " +
        "FROM tf GROUP BY token), " +
        "top AS (SELECT token, df, s1, s2 FROM m ORDER BY df DESC, token LIMIT 20) " +
        "SELECT CAST(row_number() OVER (ORDER BY df DESC, token) AS BIGINT) AS rnk, " +
        "token, CAST(df AS BIGINT) AS df, CAST(s1 AS BIGINT) AS n_total, " +
        "floor(((CAST(s2 AS DOUBLE) / n.n - (CAST(s1 AS DOUBLE) / n.n) * (CAST(s1 AS DOUBLE) / n.n)) / (CAST(s1 AS DOUBLE) / n.n)) * 10000 + 0.5) / 10000 AS fano " +
        "FROM top, n ORDER BY rnk"),

    "q203_embedding_isotropy" ->
      // same 2^20 fixed-point quantization for every cross-row sum, same
      // in-order list folds for the per-row norms/dot as q23's kernel
      ("WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL), " +
        "nb AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(max(len(embedding)) AS BIGINT) AS dim, " +
        "sum(CAST(floor(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1048576.0) AS BIGINT)) AS qn FROM v), " +
        "px AS (SELECT unnest(range(len(embedding))) AS p, unnest(embedding) AS x FROM v), " +
        "ps AS (SELECT p, sum(CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS s FROM px GROUP BY p), " +
        "cs AS (SELECT list(s ORDER BY p) AS cs FROM ps), " +
        "cent AS (SELECT list_transform(cs.cs, s -> CAST(s AS DOUBLE) / CAST(nb.n AS DOUBLE) / 1048576.0) AS c, " +
        "nb.n AS n, nb.dim AS dim, nb.qn AS qn FROM cs, nb), " +
        "qc AS (SELECT sum(CAST(floor((CASE WHEN nrm * cn = 0 THEN 0.0 ELSE dp / (nrm * cn) END) * 1048576.0) AS BIGINT)) AS qc FROM (" +
        "SELECT sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm, " +
        "sqrt(list_sum(list_transform(c.c, y -> y * y))) AS cn, " +
        "list_sum(list_transform(list_zip(v.embedding, c.c), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dp " +
        "FROM v, cent c)) " +
        "SELECT cent.n AS n, cent.dim AS dim, " +
        "floor((CAST(cent.qn AS DOUBLE) / CAST(cent.n AS DOUBLE) / 1048576.0) * 10000 + 0.5) / 10000 AS mean_norm, " +
        "round(sqrt(list_sum(list_transform(cent.c, y -> y * y))), 4) AS centroid_norm, " +
        "floor((CAST(qc.qc AS DOUBLE) / CAST(cent.n AS DOUBLE) / 1048576.0) * 10000 + 0.5) / 10000 AS mean_cos_centroid, " +
        "round(sqrt(list_sum(list_transform(cent.c, y -> y * y))) / (CAST(cent.qn AS DOUBLE) / CAST(cent.n AS DOUBLE) / 1048576.0), 4) AS anisotropy " +
        "FROM cent, qc"),

    "q200_dataset_card" ->
      // q15's fingerprint, q109's token count, q191's pass predicate,
      // q173's contamination chain — all re-derived in one statement
      ("WITH d AS (SELECT * FROM documents WHERE text IS NOT NULL), " +
        "base AS (SELECT count(*) AS n_docs, " +
        "sum(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)) AS n_tokens, " +
        "count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS fps, " +
        "CAST(sum(CASE WHEN CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) >= 50 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS npass FROM d), " +
        "shx AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM d WHERE trim(text) <> ''), " +
        "ev AS (SELECT doc_id, unnest(sh) AS g FROM shx WHERE doc_id % 50 = 0), " +
        "tg AS (SELECT DISTINCT g FROM (SELECT unnest(sh) AS g FROM shx WHERE doc_id % 50 <> 0)), " +
        "con AS (SELECT count(*) AS gt, " +
        "CAST(sum(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ht " +
        "FROM ev LEFT JOIN tg ON ev.g = tg.g) " +
        // Every non-integer rendering of this card (r9 DOUBLE, r10
        // DECIMAL(20,4)) was bit-exact against this oracle on local
        // replay yet red on the driver's gate, so as of r12 the card is
        // integer-only: BIGINT basis points (floor(rate*1e4+0.5)) plus
        // the raw masses. All sums/counts re-cast to BIGINT in the FINAL
        // projection (DuckDB sum(BIGINT) is HUGEINT, which some client
        // conversions render as float64 — the r9/r10 n_tokens leak).
        "SELECT CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, " +
        "CAST(fps AS BIGINT) AS n_fingerprints, CAST(npass AS BIGINT) AS n_quality_pass, " +
        "CAST(gt AS BIGINT) AS n_eval_grams, CAST(ht AS BIGINT) AS n_eval_hits, " +
        "CAST(floor((1.0 - CAST(fps AS DOUBLE) / n_docs) * 10000 + 0.5) AS BIGINT) AS exact_dup_rate_bp, " +
        "CAST(floor(CAST(npass AS DOUBLE) / n_docs * 10000 + 0.5) AS BIGINT) AS quality_pass_rate_bp, " +
        "CAST(floor(CAST(ht AS DOUBLE) / gt * 10000 + 0.5) AS BIGINT) AS eval_contamination_rate_bp, " +
        "CAST(floor(CAST(n_tokens AS DOUBLE) / n_docs * 10000 + 0.5) AS BIGINT) AS mean_tokens_bp " +
        "FROM base, con"),

    "q200a_card_dup_rate" ->
      // q200's exact-dup column in isolation (bisection diagnostic):
      // raw fingerprint count + integer basis points
      ("SELECT CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS BIGINT) AS n_fingerprints, " +
        "CAST(floor((1.0 - CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS DOUBLE) " +
        "/ count(*)) * 10000 + 0.5) AS BIGINT) AS exact_dup_rate_bp " +
        "FROM documents WHERE text IS NOT NULL"),

    "q200b_card_quality_rate" ->
      // q200's quality-pass column in isolation (bisection diagnostic):
      // raw pass count + integer basis points
      ("WITH base AS (SELECT count(*) AS n_docs, " +
        "sum(CASE WHEN CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) >= 50 " +
        "THEN 1 ELSE 0 END) AS npass " +
        "FROM documents WHERE text IS NOT NULL) " +
        "SELECT CAST(n_docs AS BIGINT) AS n_docs, CAST(npass AS BIGINT) AS n_quality_pass, " +
        "CAST(floor(CAST(npass AS DOUBLE) / n_docs * 10000 + 0.5) AS BIGINT) AS quality_pass_rate_bp " +
        "FROM base"),

    "q200c_card_contam_rate" ->
      // q200's eval-contamination column in isolation (bisection
      // diagnostic): same %50 eval split, same <3-token whole-doc shingle
      ("WITH d AS (SELECT * FROM documents WHERE text IS NOT NULL), " +
        "shx AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM d WHERE trim(text) <> ''), " +
        "ev AS (SELECT doc_id, unnest(sh) AS g FROM shx WHERE doc_id % 50 = 0), " +
        "tg AS (SELECT DISTINCT g FROM (SELECT unnest(sh) AS g FROM shx WHERE doc_id % 50 <> 0)), " +
        "con AS (SELECT count(*) AS gt, " +
        "CAST(sum(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ht " +
        "FROM ev LEFT JOIN tg ON ev.g = tg.g), " +
        "n AS (SELECT count(*) AS n_docs FROM d) " +
        "SELECT CAST(n_docs AS BIGINT) AS n_docs, " +
        "CAST(gt AS BIGINT) AS n_eval_grams, CAST(ht AS BIGINT) AS n_eval_hits, " +
        "CAST(floor(CAST(ht AS DOUBLE) / gt * 10000 + 0.5) AS BIGINT) AS eval_contamination_rate_bp " +
        "FROM n, con"),

    "q200d_card_mean_tokens" ->
      // q200's token-mass columns in isolation (bisection diagnostic);
      // n_tokens re-cast at the FINAL projection (HUGEINT discipline),
      // mean as BIGINT basis points
      ("WITH base AS (SELECT count(*) AS n_docs, " +
        "sum(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)) AS n_tokens " +
        "FROM documents WHERE text IS NOT NULL) " +
        "SELECT CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, " +
        "CAST(floor(CAST(n_tokens AS DOUBLE) / n_docs * 10000 + 0.5) AS BIGINT) AS mean_tokens_bp " +
        "FROM base"),

    "q199_dedup_yield" ->
      // q22's brute-force exact-Jaccard ground truth at threshold 0.5,
      // same floor(j*20)/20 banding and suffix-cumulative fold
      ("WITH sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> ''), " +
        "pr AS (SELECT floor((CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
        "len(list_distinct(list_concat(a.sh, b.sh)))) * 20) / 20 AS band " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
        "len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5), " +
        "bd AS (SELECT band, count(*) AS n_pairs FROM pr GROUP BY 1), " +
        "o AS (SELECT list(struct_pack(band := band, n_pairs := n_pairs) ORDER BY band, n_pairs) AS h FROM bd), " +
        "x AS (SELECT unnest(h) AS e, generate_subscripts(h, 1) AS i, h FROM o) " +
        "SELECT (e).band AS band, CAST((e).n_pairs AS BIGINT) AS n_pairs, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(list_slice(h, i, len(h)), p -> (p).n_pairs)), (u, w) -> u + w) AS BIGINT) AS n_cum " +
        "FROM x ORDER BY band"),

    "q198_oov_rate" ->
      // same top-1000 vocab (count DESC, token tie-break), same
      // anti-membership counts, floor-form ratio
      ("WITH tk AS (SELECT doc_id, unnest(list_filter(" +
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS w " +
        "FROM documents WHERE text IS NOT NULL AND trim(text) <> ''), " +
        "voc AS (SELECT w FROM (SELECT w, count(*) AS c FROM tk GROUP BY 1 " +
        "ORDER BY c DESC, w LIMIT 1000)), " +
        "agg AS (SELECT doc_id, count(*) AS n_tokens, " +
        "CAST(sum(CASE WHEN voc.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov " +
        "FROM tk LEFT JOIN voc ON voc.w = tk.w GROUP BY 1) " +
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, n_oov, " +
        "floor(CAST(n_oov AS DOUBLE) / n_tokens * 10000 + 0.5) / 10000 AS oov_rate " +
        "FROM agg ORDER BY doc_id"),

    "q197_heaps_fit" ->
      // same md5 bucket draw, same prefix folds, same OLS chain
      ("WITH d AS (SELECT CAST((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) * 10) // 65536 AS INT) AS bucket, text " +
        "FROM documents WHERE text IS NOT NULL AND trim(text) <> ''), " +
        "tk AS (SELECT bucket, unnest(list_filter(" +
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS w FROM d), " +
        "pb AS (SELECT bucket, count(*) AS toks FROM tk GROUP BY 1), " +
        "nw AS (SELECT first_bucket AS bucket, count(*) AS news FROM (" +
        "SELECT w, min(bucket) AS first_bucket FROM tk GROUP BY 1) GROUP BY 1), " +
        "sp AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bucket), " +
        "o AS (SELECT list(struct_pack(bucket := sp.bucket, " +
        "toks := coalesce(pb.toks, 0), news := coalesce(nw.news, 0)) ORDER BY sp.bucket) AS h " +
        "FROM sp LEFT JOIN pb ON pb.bucket = sp.bucket LEFT JOIN nw ON nw.bucket = sp.bucket), " +
        "p AS (SELECT list_filter(list_transform(range(1, 11), i -> " +
        "CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(i AS INT)), e -> (e).toks)), (a, b) -> a + b) > 0 " +
        "AND list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(i AS INT)), e -> (e).news)), (a, b) -> a + b) > 0 " +
        "THEN struct_pack(x := ln(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(i AS INT)), e -> (e).toks)), (a, b) -> a + b) AS DOUBLE)), " +
        "y := ln(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_slice(h, 1, CAST(i AS INT)), e -> (e).news)), (a, b) -> a + b) AS DOUBLE))) " +
        "ELSE NULL END), q -> q IS NOT NULL) AS pts FROM o) " +
        "SELECT CAST(len(pts) AS BIGINT) AS n_points, " +
        "round((list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).x * (q).y)), (a, b) -> a + b) - " +
        "list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).x)), (a, b) -> a + b) * " +
        "list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).y)), (a, b) -> a + b) / len(pts)) / " +
        "(list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).x * (q).x)), (a, b) -> a + b) - " +
        "list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).x)), (a, b) -> a + b) * " +
        "list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).x)), (a, b) -> a + b) / len(pts)), 4) AS beta, " +
        "round(list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).y)), (a, b) -> a + b) / len(pts) - " +
        "((list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).x * (q).y)), (a, b) -> a + b) - " +
        "list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).x)), (a, b) -> a + b) * " +
        "list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).y)), (a, b) -> a + b) / len(pts)) / " +
        "(list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).x * (q).x)), (a, b) -> a + b) - " +
        "list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).x)), (a, b) -> a + b) * " +
        "list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).x)), (a, b) -> a + b) / len(pts))) * " +
        "(list_reduce(list_prepend(0.0, list_transform(pts, q -> (q).x)), (a, b) -> a + b) / len(pts)), 4) AS ln_k " +
        "FROM p"),

    "q196_neyman_allocation" ->
      // same exact integer moments, same sigma chain, same stratum-ordered
      // normalizer fold and floor-form rounding
      ("WITH dv AS (SELECT lang AS stratum, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS v " +
        "FROM documents WHERE text IS NOT NULL), " +
        "per AS (SELECT stratum, count(*) AS n, " +
        "sqrt(CAST(sum(v * v) AS DOUBLE) * count(*) - CAST(sum(v) AS DOUBLE) * sum(v)) / count(*) AS sigma " +
        "FROM dv GROUP BY 1), " +
        "o AS (SELECT list(struct_pack(stratum := stratum, n := n, sigma := sigma) ORDER BY stratum, n, sigma) AS gs FROM per), " +
        "o2 AS (SELECT gs, list_reduce(list_prepend(0.0, list_transform(gs, g -> (g).n * (g).sigma)), " +
        "(x, y) -> x + y) AS z FROM o), " +
        "x AS (SELECT unnest(gs) AS g, z FROM o2) " +
        "SELECT (g).stratum AS stratum, CAST((g).n AS BIGINT) AS n, " +
        "floor((g).sigma * 10000 + 0.5) / 10000 AS sigma, " +
        "floor((g).n * (g).sigma / z * 10000 + 0.5) / 10000 AS share, " +
        "CAST(floor(1000.0 * ((g).n * (g).sigma / z) + 0.5) AS BIGINT) AS alloc_n " +
        "FROM x ORDER BY stratum"),

    "q195_export_manifest" ->
      // same '|'-joined row hash (32-bit md5 prefix), same shard modulus,
      // HUGEINT sum cast to match the DECIMAL(38,0) exactly
      ("SELECT CAST(doc_id % 8 AS BIGINT) AS shard, count(*) AS n_rows, " +
        "CAST(sum(CAST('0x' || substr(md5(" +
        "CAST(doc_id AS VARCHAR) || '|' || text || '|' || lang || '|' || source" +
        "), 1, 8) AS BIGINT)) AS VARCHAR) AS content_checksum " +
        "FROM documents GROUP BY 1 ORDER BY shard"),

    "q194_lsh_plan" ->
      // same S-curve arithmetic; divisions forced to DOUBLE (DuckDB's
      // bare 1.0/b is DECIMAL division and would diverge)
      ("WITH g AS (SELECT b, 64 // b AS r FROM (SELECT unnest([1, 2, 4, 8, 16, 32, 64]) AS b)), " +
        "sc AS (SELECT b, r, " +
        "(1.0 - pow(1.0 - pow(0.8, CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) - " +
        "(1.0 - pow(1.0 - pow(0.3, CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) AS score FROM g) " +
        "SELECT b, r, " +
        "round(pow(CAST(1 AS DOUBLE) / b, CAST(1 AS DOUBLE) / r), 4) AS threshold_mid, " +
        "round(1.0 - pow(1.0 - pow(0.3, CAST(r AS DOUBLE)), CAST(b AS DOUBLE)), 4) AS p_noise, " +
        "round(1.0 - pow(1.0 - pow(0.8, CAST(r AS DOUBLE)), CAST(b AS DOUBLE)), 4) AS p_target, " +
        "score = (SELECT max(score) FROM sc) AS is_best " +
        "FROM sc ORDER BY b"),

    "q193_session_paths" ->
      // q64's session assignment replay + ordered string_agg paths
      ("WITH w AS (SELECT user_id, event_id, event_type, ts, " +
        "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL " +
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 43200000000 " +
        "THEN 1 ELSE 0 END AS isnew FROM events), " +
        "s AS (SELECT user_id, event_type, ts, event_id, " +
        "sum(isnew) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_idx FROM w), " +
        "p AS (SELECT user_id, session_idx, " +
        "string_agg(event_type, '>' ORDER BY ts, event_id) AS path FROM s GROUP BY 1, 2), " +
        "t AS (SELECT count(*) AS n_sessions FROM p), " +
        "c AS (SELECT path, count(*) AS n FROM p GROUP BY 1) " +
        "SELECT path, CAST(n AS BIGINT) AS n, " +
        "round(n / CAST(n_sessions AS DOUBLE), 4) AS share " +
        "FROM c, t ORDER BY n DESC, path LIMIT 20"),

    "q192_theil" ->
      // same per-(lang, value) histograms, same value-ordered group folds
      // and group-ordered decomposition folds; identity booleans TRUE
      ("WITH dv AS (SELECT lang AS grp, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS v " +
        "FROM documents WHERE text IS NOT NULL), " +
        "h0 AS (SELECT grp, v, count(*) AS m FROM dv GROUP BY 1, 2), " +
        "pg AS (SELECT grp, list(struct_pack(v := v, m := m) ORDER BY v, m) AS h, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list(struct_pack(v := v, m := m) ORDER BY v, m), e -> (e).m)), (x, y) -> x + y) AS BIGINT) AS ng, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list(struct_pack(v := v, m := m) ORDER BY v, m), e -> (e).m * (e).v)), (x, y) -> x + y) AS BIGINT) AS sg " +
        "FROM h0 GROUP BY 1), " +
        "o AS (SELECT list(struct_pack(grp := grp, h := h, ng := ng, sg := sg) ORDER BY grp, ng, sg) AS gs FROM pg), " +
        "o2 AS (SELECT gs, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(gs, g -> (g).ng)), (x, y) -> x + y) AS BIGINT) AS n, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(gs, g -> (g).sg)), (x, y) -> x + y) AS BIGINT) AS s FROM o) " +
        "SELECT n, s AS total, " +
        "round(list_reduce(list_prepend(0.0, list_transform(gs, g -> " +
        "list_reduce(list_prepend(0.0, list_transform((g).h, e -> " +
        "CASE WHEN (e).v > 0 THEN (e).m * (CAST((e).v AS DOUBLE) / (CAST(s AS DOUBLE) / n)) * " +
        "ln(CAST((e).v AS DOUBLE) / (CAST(s AS DOUBLE) / n)) ELSE 0.0 END)), (x, y) -> x + y))), " +
        "(x, y) -> x + y) / n, 4) AS theil_total, " +
        "round(list_reduce(list_prepend(0.0, list_transform(gs, g -> " +
        "(CAST((g).sg AS DOUBLE) / s) * ln((CAST((g).sg AS DOUBLE) / (g).ng) / (CAST(s AS DOUBLE) / n)))), " +
        "(x, y) -> x + y), 4) AS theil_between, " +
        "round(list_reduce(list_prepend(0.0, list_transform(gs, g -> " +
        "(CAST((g).sg AS DOUBLE) / s) * (list_reduce(list_prepend(0.0, list_transform((g).h, e -> " +
        "CASE WHEN (e).v > 0 THEN (e).m * (CAST((e).v AS DOUBLE) / (CAST((g).sg AS DOUBLE) / (g).ng)) * " +
        "ln(CAST((e).v AS DOUBLE) / (CAST((g).sg AS DOUBLE) / (g).ng)) ELSE 0.0 END)), (x, y) -> x + y) / (g).ng))), " +
        "(x, y) -> x + y), 4) AS theil_within, " +
        "TRUE AS decomposition_ok " +
        "FROM o2"),

    "q191_wilson_interval" ->
      // same token-count pass predicate, same z = 1.96 chain with the
      // identical op order, same [0,1] clips
      ("WITH b AS (SELECT source AS grp, count(*) AS n, " +
        "CAST(sum(CASE WHEN CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) >= 50 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_pass " +
        "FROM documents WHERE text IS NOT NULL GROUP BY 1) " +
        "SELECT grp, CAST(n AS BIGINT) AS n, n_pass, " +
        "round(CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE), 4) AS rate, " +
        "round(greatest(0.0, " +
        "((CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE) + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))) - " +
        "1.96 * sqrt((CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE)) * (1.0 - CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + " +
        "CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / " +
        "(1.0 + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / CAST(n AS DOUBLE))), 4) AS ci_low, " +
        "round(least(1.0, " +
        "((CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE) + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))) + " +
        "1.96 * sqrt((CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE)) * (1.0 - CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + " +
        "CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / " +
        "(1.0 + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / CAST(n AS DOUBLE))), 4) AS ci_high " +
        "FROM b ORDER BY grp"),

    "q190_source_jsd" ->
      // same top-100 vocab, same densified token-ordered count arrays,
      // same two KL folds with (p+q)/2.0 mixture and p>0 guards
      ("WITH tk AS (SELECT source AS grp, unnest(list_filter(" +
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS tok " +
        "FROM documents WHERE text IS NOT NULL), " +
        "voc AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM tk GROUP BY 1 " +
        "ORDER BY c DESC, tok LIMIT 100)), " +
        "c0 AS (SELECT grp, tk.tok, count(*) AS c FROM tk JOIN voc ON voc.tok = tk.tok " +
        "GROUP BY 1, 2), " +
        "dn AS (SELECT g.grp, v.tok, coalesce(c0.c, 0) AS c " +
        "FROM (SELECT DISTINCT grp FROM c0) g CROSS JOIN voc v " +
        "LEFT JOIN c0 ON c0.grp = g.grp AND c0.tok = v.tok), " +
        "ar AS (SELECT grp, list_transform(list(struct_pack(tok := tok, c := c) ORDER BY tok, c), " +
        "e -> CAST((e).c AS DOUBLE)) AS cs FROM dn GROUP BY 1), " +
        "ar2 AS (SELECT grp, cs, list_reduce(list_prepend(0.0, cs), (x, y) -> x + y) AS t FROM ar) " +
        "SELECT l.grp AS group_a, r.grp AS group_b, " +
        "round(0.5 * list_reduce(list_prepend(0.0, list_transform(range(1, len(l.cs) + 1), i -> " +
        "CASE WHEN l.cs[CAST(i AS INT)] / l.t > 0 THEN (l.cs[CAST(i AS INT)] / l.t) * " +
        "ln((l.cs[CAST(i AS INT)] / l.t) / ((l.cs[CAST(i AS INT)] / l.t + r.cs[CAST(i AS INT)] / r.t) / 2.0)) " +
        "ELSE 0.0 END)), (x, y) -> x + y) + " +
        "0.5 * list_reduce(list_prepend(0.0, list_transform(range(1, len(r.cs) + 1), i -> " +
        "CASE WHEN r.cs[CAST(i AS INT)] / r.t > 0 THEN (r.cs[CAST(i AS INT)] / r.t) * " +
        "ln((r.cs[CAST(i AS INT)] / r.t) / ((r.cs[CAST(i AS INT)] / r.t + l.cs[CAST(i AS INT)] / l.t) / 2.0)) " +
        "ELSE 0.0 END)), (x, y) -> x + y), 4) AS jsd " +
        "FROM ar2 l JOIN ar2 r ON l.grp < r.grp ORDER BY group_a, group_b"),

    "q189_autocorrelation" ->
      // same day-ordered series, same mu/denominator/lag-product folds
      ("WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
        "FROM events GROUP BY 1, 2), " +
        "a AS (SELECT event_type, list_transform(" +
        "list(struct_pack(day := day, n := n) ORDER BY day), " +
        "e -> CAST((e).n AS DOUBLE)) AS xs FROM d GROUP BY 1), " +
        "x AS (SELECT event_type, xs, unnest(range(1, 8)) AS lag FROM a) " +
        "SELECT event_type, CAST(lag AS BIGINT) AS lag, CAST(len(xs) AS BIGINT) AS n_days, " +
        "round(CASE WHEN list_reduce(list_prepend(0.0, list_transform(xs, v -> " +
        "(v - list_reduce(list_prepend(0.0, xs), (p, q) -> p + q) / len(xs)) * " +
        "(v - list_reduce(list_prepend(0.0, xs), (p, q) -> p + q) / len(xs)))), " +
        "(p, q) -> p + q) > 0 THEN " +
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(xs) - lag + 1), t -> " +
        "(xs[CAST(t AS INT)] - list_reduce(list_prepend(0.0, xs), (p, q) -> p + q) / len(xs)) * " +
        "(xs[CAST(t + lag AS INT)] - list_reduce(list_prepend(0.0, xs), (p, q) -> p + q) / len(xs)))), " +
        "(p, q) -> p + q) / " +
        "list_reduce(list_prepend(0.0, list_transform(xs, v -> " +
        "(v - list_reduce(list_prepend(0.0, xs), (p, q) -> p + q) / len(xs)) * " +
        "(v - list_reduce(list_prepend(0.0, xs), (p, q) -> p + q) / len(xs)))), " +
        "(p, q) -> p + q) ELSE 0.0 END, 4) AS acf " +
        "FROM x WHERE lag < len(xs) ORDER BY event_type, lag"),

    "q188_lang_id_report" ->
      // q158's model replay as a CTE + label join-back + the same margin
      // divisions and (2pr)/(p+r) on unrounded p, r
      ("WITH preds AS (" + nbPredictOracleSql.replace(" ORDER BY doc_id", "") + "), " +
        "lp AS (SELECT d.lang AS label, p.lang_pred AS predicted " +
        "FROM preds p JOIN documents d USING (doc_id)), " +
        "c AS (SELECT label, predicted, count(*) AS n FROM lp GROUP BY 1, 2), " +
        "cls AS (SELECT DISTINCT clazz FROM (SELECT label AS clazz FROM c " +
        "UNION ALL SELECT predicted FROM c)), " +
        "tp AS (SELECT label AS clazz, n AS tp FROM c WHERE label = predicted), " +
        "lt AS (SELECT label AS clazz, CAST(sum(n) AS BIGINT) AS support FROM c GROUP BY 1), " +
        "pt AS (SELECT predicted AS clazz, CAST(sum(n) AS BIGINT) AS npred FROM c GROUP BY 1) " +
        "SELECT cls.clazz, coalesce(lt.support, 0) AS support, " +
        "CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp, " +
        "round(CASE WHEN coalesce(pt.npred, 0) > 0 " +
        "THEN coalesce(tp.tp, 0) / CAST(pt.npred AS DOUBLE) ELSE 0.0 END, 4) AS precision, " +
        "round(CASE WHEN coalesce(lt.support, 0) > 0 " +
        "THEN coalesce(tp.tp, 0) / CAST(lt.support AS DOUBLE) ELSE 0.0 END, 4) AS recall, " +
        "round(CASE WHEN (CASE WHEN coalesce(pt.npred, 0) > 0 THEN coalesce(tp.tp, 0) / CAST(pt.npred AS DOUBLE) ELSE 0.0 END) + " +
        "(CASE WHEN coalesce(lt.support, 0) > 0 THEN coalesce(tp.tp, 0) / CAST(lt.support AS DOUBLE) ELSE 0.0 END) > 0 " +
        "THEN 2.0 * (CASE WHEN coalesce(pt.npred, 0) > 0 THEN coalesce(tp.tp, 0) / CAST(pt.npred AS DOUBLE) ELSE 0.0 END) * " +
        "(CASE WHEN coalesce(lt.support, 0) > 0 THEN coalesce(tp.tp, 0) / CAST(lt.support AS DOUBLE) ELSE 0.0 END) / " +
        "((CASE WHEN coalesce(pt.npred, 0) > 0 THEN coalesce(tp.tp, 0) / CAST(pt.npred AS DOUBLE) ELSE 0.0 END) + " +
        "(CASE WHEN coalesce(lt.support, 0) > 0 THEN coalesce(tp.tp, 0) / CAST(lt.support AS DOUBLE) ELSE 0.0 END)) " +
        "ELSE 0.0 END, 4) AS f1 " +
        "FROM cls LEFT JOIN lt USING (clazz) LEFT JOIN pt USING (clazz) " +
        "LEFT JOIN tp USING (clazz) ORDER BY cls.clazz"),

    "q187_word_vectors" ->
      // re-derives the top-50 vocab, the +-3 symmetric window pair table,
      // marginals, PPMI with the same num/den association, and the
      // (w1, w2)-ordered Frobenius fold; eigen identities pinned TRUE
      ("WITH d AS (SELECT doc_id, list_filter(" +
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS ts " +
        "FROM documents WHERE text IS NOT NULL), " +
        "tk AS (SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS pos FROM d), " +
        "voc AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM tk GROUP BY 1 " +
        "ORDER BY c DESC, tok LIMIT 50)), " +
        "pr AS (SELECT a.tok AS w1, b.tok AS w2 FROM tk a JOIN tk b " +
        "ON a.doc_id = b.doc_id AND a.pos <> b.pos AND abs(a.pos - b.pos) <= 3 " +
        "WHERE a.tok IN (SELECT tok FROM voc) AND b.tok IN (SELECT tok FROM voc)), " +
        "pc AS (SELECT w1, w2, count(*) AS c FROM pr GROUP BY 1, 2), " +
        "t AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM pc), " +
        "ma AS (SELECT w1 AS w, CAST(sum(c) AS BIGINT) AS ca FROM pc GROUP BY 1), " +
        "ent AS (SELECT pc.w1, pc.w2, greatest(0.0, " +
        "ln((CAST(pc.c AS DOUBLE) * tt) / (CAST(m1.ca AS DOUBLE) * m2.ca))) AS p " +
        "FROM pc JOIN ma m1 ON m1.w = pc.w1 JOIN ma m2 ON m2.w = pc.w2, t), " +
        "fr AS (SELECT list(p ORDER BY w1, w2) AS ps FROM ent) " +
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM voc) AS vocab_size, " +
        "(SELECT tt FROM t) AS t_pairs, " +
        "round(sqrt(list_reduce(list_prepend(0.0, list_transform(ps, x -> x * x)), " +
        "(u, w) -> u + w)), 4) AS ppmi_fro, " +
        "TRUE AS eigs_orthonormal, TRUE AS eigen_residual_ok, TRUE AS trace_ok " +
        "FROM fr"),

    "q185_gini" ->
      // same value histograms, same double-exact rank-formula folds
      ("WITH ev AS (SELECT user_id, count(*) AS v FROM events GROUP BY 1), " +
        "dv AS (SELECT CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS v " +
        "FROM documents WHERE text IS NOT NULL), " +
        "he AS (SELECT v, count(*) AS m FROM ev GROUP BY 1), " +
        "hd AS (SELECT v, count(*) AS m FROM dv GROUP BY 1), " +
        "ge AS (SELECT list(struct_pack(v := v, m := m) ORDER BY v) AS h FROM he), " +
        "gd AS (SELECT list(struct_pack(v := v, m := m) ORDER BY v) AS h FROM hd), " +
        "u AS (SELECT 'events_per_user' AS dimension, h FROM ge " +
        "UNION ALL SELECT 'tokens_per_doc', h FROM gd) " +
        "SELECT dimension, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(h, e -> (e).m)), (x, y) -> x + y) AS BIGINT) AS n, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(h, e -> (e).m * (e).v)), (x, y) -> x + y) AS BIGINT) AS total, " +
        "round(2.0 * list_reduce(list_prepend(0.0, list_transform(range(1, len(h) + 1), j -> " +
        "CAST((h[CAST(j AS INT)]).v AS DOUBLE) * (" +
        "CAST((h[CAST(j AS INT)]).m AS DOUBLE) * CAST(1 + list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), p -> (p).m)), (x, y) -> x + y) AS DOUBLE) + " +
        "CAST((h[CAST(j AS INT)]).m AS DOUBLE) * (CAST((h[CAST(j AS INT)]).m AS DOUBLE) - 1) / 2.0))), " +
        "(x, y) -> x + y) / " +
        "(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(h, e -> (e).m)), (x, y) -> x + y) AS DOUBLE) * " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(h, e -> (e).m * (e).v)), (x, y) -> x + y)) - " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(h, e -> (e).m)), (x, y) -> x + y) + 1 AS DOUBLE) / " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(h, e -> (e).m)), (x, y) -> x + y), 4) AS gini " +
        "FROM u ORDER BY dimension"),

    "q186_chi_square" ->
      // same sorted cell array, same margin folds per cell, same
      // fixed-order chi2 fold; dow = isodow matches weekday()+1
      ("WITH cx AS (SELECT event_type AS a, CAST(isodow(CAST(ts AS DATE)) AS INT) AS b, " +
        "count(*) AS o FROM events GROUP BY 1, 2), " +
        "c0 AS (SELECT aa.a, bb.b, coalesce(cx.o, 0) AS o " +
        "FROM (SELECT DISTINCT a FROM cx) aa CROSS JOIN (SELECT DISTINCT b FROM cx) bb " +
        "LEFT JOIN cx ON cx.a = aa.a AND cx.b = bb.b), " +
        "o1 AS (SELECT list(struct_pack(a := a, b := b, o := o) ORDER BY a, b, o) AS cs FROM c0), " +
        "o2 AS (SELECT cs, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, e -> (e).o)), (x, y) -> x + y) AS DOUBLE) AS nn, " +
        "len(list_distinct(list_transform(cs, e -> (e).a))) AS ka, " +
        "len(list_distinct(list_transform(cs, e -> (e).b))) AS kb FROM o1), " +
        "x AS (SELECT cs, nn, ka, kb, unnest(cs) AS ee FROM o2) " +
        "SELECT (ee).a AS a, (ee).b AS b, (ee).o AS n_obs, " +
        "round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).a = (ee).a THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) * " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).b = (ee).b THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) / nn, 4) AS n_exp, " +
        "round((CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).a = (ee).a THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) * " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).b = (ee).b THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) / nn " +
        "- CAST((ee).o AS DOUBLE)) * " +
        "(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).a = (ee).a THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) * " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).b = (ee).b THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) / nn " +
        "- CAST((ee).o AS DOUBLE)) / " +
        "(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).a = (ee).a THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) * " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).b = (ee).b THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) / nn), 4) AS contribution, " +
        "round(list_reduce(list_prepend(0.0, list_transform(cs, e2 -> " +
        "(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).a = (e2).a THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) * " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).b = (e2).b THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) / nn " +
        "- CAST((e2).o AS DOUBLE)) * " +
        "(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).a = (e2).a THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) * " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).b = (e2).b THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) / nn " +
        "- CAST((e2).o AS DOUBLE)) / " +
        "(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).a = (e2).a THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) * " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(cs, f -> " +
        "CASE WHEN (f).b = (e2).b THEN (f).o ELSE CAST(0 AS BIGINT) END)), (p, q) -> p + q) AS DOUBLE) / nn))), " +
        "(x2, y2) -> x2 + y2), 4) AS chi2_total, " +
        "CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof " +
        "FROM x ORDER BY a, b"),

    "q184_association_rules" ->
      // same distinct baskets, canonical pair self-join unioned to both
      // directions, same division chains
      ("WITH b AS (SELECT DISTINCT user_id AS u, event_type AS item FROM events), " +
        "n AS (SELECT count(DISTINCT u) AS n_users FROM b), " +
        "ic AS (SELECT item, count(*) AS n_item FROM b GROUP BY 1), " +
        "pc AS (SELECT x.item AS i1, y.item AS i2, count(*) AS n_both " +
        "FROM b x JOIN b y ON x.u = y.u AND x.item < y.item GROUP BY 1, 2), " +
        "bo AS (SELECT i1 AS antecedent, i2 AS consequent, n_both FROM pc " +
        "UNION ALL SELECT i2, i1, n_both FROM pc) " +
        "SELECT antecedent, consequent, CAST(n_both AS BIGINT) AS n_both, " +
        "round(n_both / CAST(n_users AS DOUBLE), 4) AS support, " +
        "round(n_both / CAST(ia.n_item AS DOUBLE), 4) AS confidence, " +
        "round((CAST(n_both AS DOUBLE) * n_users) / (CAST(ia.n_item AS DOUBLE) * ib.n_item), 4) AS lift " +
        "FROM bo JOIN ic ia ON ia.item = antecedent JOIN ic ib ON ib.item = consequent, n " +
        "WHERE n_both / CAST(n_users AS DOUBLE) >= 0.01 " +
        "ORDER BY antecedent, consequent"),

    "q183_windowed_pmi" ->
      // positions self-join ground truth for the in-array shifted zips;
      // same canonical least/greatest pairs, same num/den association,
      // rounded-score ordering with pair tie-break
      ("WITH d AS (SELECT doc_id, list_filter(" +
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS ts " +
        "FROM documents WHERE text IS NOT NULL), " +
        "tk AS (SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS pos FROM d), " +
        "tot AS (SELECT count(*) AS t_uni FROM tk), " +
        "pr AS (SELECT least(a.tok, b.tok) AS w1, greatest(a.tok, b.tok) AS w2 " +
        "FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 3), " +
        "tp AS (SELECT count(*) AS t_pair FROM pr), " +
        "uni AS (SELECT tok AS w, count(*) AS n_w FROM tk GROUP BY 1), " +
        "bi AS (SELECT w1, w2, count(*) AS n_ab FROM pr GROUP BY 1, 2 HAVING count(*) >= 5) " +
        "SELECT w1 || ' ' || w2 AS pair, CAST(n_ab AS BIGINT) AS n_ab, " +
        "round(ln((CAST(n_ab AS DOUBLE) * t_uni * t_uni) / " +
        "(CAST(t_pair AS DOUBLE) * ua.n_w * ub.n_w)), 4) AS pmi " +
        "FROM bi JOIN uni ua ON ua.w = w1 JOIN uni ub ON ub.w = w2, tot, tp " +
        "ORDER BY pmi DESC, pair LIMIT 30"),

    "q182_readability" ->
      // same token count (q109's CASE), same vowel-run and punctuation-run
      // proxies, same literal constants
      ("WITH b AS (SELECT doc_id, " +
        "CAST(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS DOUBLE) AS w, " +
        "CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS DOUBLE) AS sen, " +
        "CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) AS vr " +
        "FROM documents WHERE text IS NOT NULL) " +
        "SELECT doc_id, CAST(w AS BIGINT) AS n_words, CAST(sen AS BIGINT) AS n_sentences, " +
        "CAST(greatest(w, vr) AS BIGINT) AS n_syllables, " +
        "round(0.39 * (w / sen) + 11.8 * (greatest(w, vr) / greatest(w, 1.0)) - 15.59, 4) AS fk_grade, " +
        "round(206.835 - 1.015 * (w / sen) - 84.6 * (greatest(w, vr) / greatest(w, 1.0)), 4) AS flesch_ease " +
        "FROM b ORDER BY doc_id"),

    "q181_retrieval_metrics" ->
      // q110's cosine kernel on both the full and the 16-dim-truncated
      // sides, then the same rank-ordered discount folds (ln(2) cancels in
      // DCG/IDCG and is dropped on both engines)
      ("WITH ec AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings WHERE vec_id >= 10), " +
        "qf AS (SELECT vec_id AS query_id, embedding AS qv, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn " +
        "FROM embeddings WHERE vec_id < 10), " +
        "s1 AS (SELECT query_id, ec.vec_id AS vec_id, " +
        "CASE WHEN ec.nrm * qn = 0 THEN 0.0 " +
        "ELSE list_sum(list_transform(list_zip(ec.embedding, qv), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (ec.nrm * qn) END AS cos " +
        "FROM ec, qf WHERE ec.vec_id <> query_id), " +
        "r1 AS (SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk FROM s1), " +
        "fe AS (SELECT query_id, list(vec_id ORDER BY rk) AS eids FROM r1 WHERE rk <= 10 GROUP BY 1), " +
        "et AS (SELECT vec_id, list_slice(embedding, 1, 16) AS embedding, " +
        "sqrt(list_sum(list_transform(list_slice(embedding, 1, 16), x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings WHERE vec_id >= 10), " +
        "qt AS (SELECT vec_id AS query_id, list_slice(embedding, 1, 16) AS qv, " +
        "sqrt(list_sum(list_transform(list_slice(embedding, 1, 16), x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn " +
        "FROM embeddings WHERE vec_id < 10), " +
        "s2 AS (SELECT query_id, et.vec_id AS vec_id, " +
        "CASE WHEN et.nrm * qn = 0 THEN 0.0 " +
        "ELSE list_sum(list_transform(list_zip(et.embedding, qv), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (et.nrm * qn) END AS cos " +
        "FROM et, qt WHERE et.vec_id <> query_id), " +
        "r2 AS (SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk FROM s2), " +
        "te AS (SELECT query_id, list(vec_id ORDER BY rk) AS aids FROM r2 WHERE rk <= 10 GROUP BY 1), " +
        "m AS (SELECT fe.query_id, eids, aids FROM fe JOIN te USING (query_id)) " +
        "SELECT query_id, " +
        "round(len(list_intersect(aids, eids)) / CAST(10 AS DOUBLE), 4) AS recall_k, " +
        "round(CASE WHEN list_position(aids, eids[1]) = 0 THEN 0.0 " +
        "ELSE 1.0 / list_position(aids, eids[1]) END, 4) AS mrr, " +
        "round(list_reduce(list_prepend(0.0, list_transform(range(1, 11), i -> " +
        "CASE WHEN list_contains(eids, aids[CAST(i AS INT)]) THEN 1.0 / ln(CAST(i + 1 AS DOUBLE)) ELSE 0.0 END)), (a, b) -> a + b) / " +
        "list_reduce(list_prepend(0.0, list_transform(range(1, 11), i -> " +
        "1.0 / ln(CAST(i + 1 AS DOUBLE)))), (a, b) -> a + b), 4) AS ndcg " +
        "FROM m ORDER BY query_id"),

    "q180_kaplan_meier" ->
      // same floor-division lifetimes, same censoring rule, same in-row
      // histogram with nested prefix/product folds
      ("WITH pu AS (SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l " +
        "FROM events GROUP BY 1), " +
        "e AS (SELECT max(epoch_us(ts)) AS endt FROM events), " +
        "lt AS (SELECT CAST(floor((l - f) / 86400000000) AS BIGINT) AS t_day, " +
        "CASE WHEN (endt - l) > 1 * 86400000000 THEN 1 ELSE 0 END AS churned FROM pu, e), " +
        "h0 AS (SELECT t_day, count(*) AS n_total, CAST(sum(churned) AS BIGINT) AS n_deaths " +
        "FROM lt GROUP BY 1), " +
        "o AS (SELECT list(struct_pack(t_day := t_day, n_total := n_total, n_deaths := n_deaths) " +
        "ORDER BY t_day) AS h FROM h0), " +
        "o2 AS (SELECT h, CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(h, s -> (s).n_total)), (a, b) -> a + b) AS BIGINT) AS n_users FROM o), " +
        "x AS (SELECT h, n_users, unnest(h) AS ee, generate_subscripts(h, 1) AS i FROM o2) " +
        "SELECT (ee).t_day AS t_day, " +
        "n_users - CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(list_slice(h, 1, i - 1), s -> (s).n_total)), (a, b) -> a + b) AS BIGINT) AS n_risk, " +
        "(ee).n_deaths AS n_deaths, " +
        "(ee).n_total - (ee).n_deaths AS n_censored, " +
        "round(list_reduce(list_prepend(1.0, list_transform(range(1, i + 1), j -> " +
        "1.0 - CAST((h[CAST(j AS INT)]).n_deaths AS DOUBLE) / " +
        "CAST(n_users - list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(list_slice(h, 1, CAST(j - 1 AS INT)), s -> (s).n_total)), " +
        "(a, b) -> a + b) AS DOUBLE))), (a, b) -> a * b), 4) AS survival " +
        "FROM x WHERE (ee).n_deaths > 0 ORDER BY t_day"),

    "q179_cusum" ->
      // same folds: mu from the in-row integer sum, k = 0.5*sqrt(mu),
      // h = 4.0*sqrt(mu), max(0, acc + ...) left folds seeded 0.0
      ("WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
        "FROM events GROUP BY 1, 2), " +
        "a AS (SELECT event_type, list(struct_pack(day := day, n := n) ORDER BY day) AS cs " +
        "FROM d GROUP BY 1), " +
        "x AS (SELECT event_type, unnest(cs) AS ee, generate_subscripts(cs, 1) AS i, cs, " +
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(cs, s -> (s).n)), (p, q) -> p + q) AS DOUBLE) / len(cs) AS mu FROM a) " +
        "SELECT event_type, (ee).day AS day, (ee).n AS n, " +
        "round(list_reduce(list_prepend(0.0, list_transform(list_slice(cs, 1, i), s -> CAST((s).n AS DOUBLE))), " +
        "(acc, c) -> greatest(0.0, acc + (c - mu - 0.5 * sqrt(mu)))), 4) AS cusum_up, " +
        "round(list_reduce(list_prepend(0.0, list_transform(list_slice(cs, 1, i), s -> CAST((s).n AS DOUBLE))), " +
        "(acc, c) -> greatest(0.0, acc + (mu - c - 0.5 * sqrt(mu)))), 4) AS cusum_down, " +
        "(list_reduce(list_prepend(0.0, list_transform(list_slice(cs, 1, i), s -> CAST((s).n AS DOUBLE))), " +
        "(acc, c) -> greatest(0.0, acc + (c - mu - 0.5 * sqrt(mu)))) > 4.0 * sqrt(mu) OR " +
        "list_reduce(list_prepend(0.0, list_transform(list_slice(cs, 1, i), s -> CAST((s).n AS DOUBLE))), " +
        "(acc, c) -> greatest(0.0, acc + (mu - c - 0.5 * sqrt(mu)))) > 4.0 * sqrt(mu)) AS alarm " +
        "FROM x ORDER BY event_type, day"),

    "q178_rake_keywords" ->
      // full RAKE replay: same stopword list (interpolated from the one
      // Scala constant), same running-sum phrase ids, same deg/freq
      // divisions, same position-ordered fold and rounded-score ranking
      ("WITH tk AS (SELECT doc_id, tok, pos, tok IN (" +
        graft.functions.TextAnalysis.DefaultStopwords
          .map(w => s"'$w'").mkString(", ") + ") AS is_stop FROM (" +
        "SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) - 1 AS pos FROM (" +
        "SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS ts " +
        "FROM documents WHERE text IS NOT NULL AND trim(text) <> ''))), " +
        "ip AS (SELECT doc_id, pos, tok, is_stop, " +
        "sum(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id " +
        "FROM tk), " +
        "ip2 AS (SELECT doc_id, pos, tok, phrase_id FROM ip WHERE NOT is_stop), " +
        "ph AS (SELECT doc_id, phrase_id, count(*) AS plen, " +
        "string_agg(tok, ' ' ORDER BY pos) AS phrase FROM ip2 GROUP BY 1, 2), " +
        "wsc AS (SELECT ip2.doc_id, tok, " +
        "CAST(count(*) + sum(plen - 1) AS DOUBLE) / count(*) AS wscore " +
        "FROM ip2 JOIN ph USING (doc_id, phrase_id) GROUP BY ip2.doc_id, tok), " +
        "psc AS (SELECT ip2.doc_id, ip2.phrase_id, " +
        "round(list_reduce(list_prepend(0.0, list(wscore ORDER BY pos)), (a, b) -> a + b), 4) AS score " +
        "FROM ip2 JOIN wsc ON wsc.doc_id = ip2.doc_id AND wsc.tok = ip2.tok GROUP BY 1, 2), " +
        "r AS (SELECT p.doc_id, phrase, score, " +
        "row_number() OVER (PARTITION BY p.doc_id ORDER BY score DESC, phrase) AS rnk " +
        "FROM psc p JOIN ph ON ph.doc_id = p.doc_id AND ph.phrase_id = p.phrase_id) " +
        "SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, phrase, score FROM r " +
        "WHERE rnk <= 3 ORDER BY doc_id, rnk"),

    "q177_benford" ->
      // same string-rendered first significant digit, same 9-digit spine,
      // same ln ratio for the expected share
      ("WITH c AS (SELECT CAST(regexp_extract(CAST(value AS VARCHAR), '[1-9]') AS INT) AS digit, " +
        "count(*) AS n FROM events " +
        "WHERE value IS NOT NULL AND regexp_extract(CAST(value AS VARCHAR), '[1-9]') <> '' " +
        "GROUP BY 1), " +
        "t AS (SELECT CAST(sum(n) AS DOUBLE) AS tt FROM c), " +
        "sp AS (SELECT unnest(range(1, 10)) AS digit) " +
        "SELECT CAST(sp.digit AS INT) AS digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n, " +
        "round(coalesce(c.n, 0) / tt, 4) AS observed, " +
        "round(ln(1.0 + 1.0 / sp.digit) / ln(10.0), 4) AS expected, " +
        "round(abs(coalesce(c.n, 0) / tt - ln(1.0 + 1.0 / sp.digit) / ln(10.0)), 4) AS abs_dev " +
        "FROM sp LEFT JOIN c ON c.digit = sp.digit, t ORDER BY sp.digit"),

    "q176_ewma_anomaly" ->
      // same fold, same constants: (1.0 - 0.3) written as the expression,
      // NOT 0.7 — the two parse to different doubles and the folds would
      // diverge; list_reduce seeds with the first element exactly like
      // the engine's aggregate(init = c_0)
      ("WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
        "FROM events GROUP BY 1, 2), " +
        "a AS (SELECT event_type, list(struct_pack(day := day, n := n) ORDER BY day) AS cs " +
        "FROM d GROUP BY 1), " +
        "x AS (SELECT event_type, unnest(cs) AS ee, generate_subscripts(cs, 1) AS i, cs FROM a) " +
        "SELECT event_type, (ee).day AS day, (ee).n AS n, " +
        "floor(list_reduce(list_transform(list_slice(cs, 1, i), s -> CAST((s).n AS DOUBLE)), " +
        "(e, c) -> 0.3 * c + (1.0 - 0.3) * e) * 10000 + 0.5) / 10000 AS ewma, " +
        "CASE WHEN i = 1 THEN FALSE ELSE " +
        "abs(CAST((ee).n AS DOUBLE) - list_reduce(list_transform(list_slice(cs, 1, i - 1), s -> CAST((s).n AS DOUBLE)), " +
        "(e, c) -> 0.3 * c + (1.0 - 0.3) * e)) " +
        "> 3.0 * sqrt(list_reduce(list_transform(list_slice(cs, 1, i - 1), s -> CAST((s).n AS DOUBLE)), " +
        "(e, c) -> 0.3 * c + (1.0 - 0.3) * e)) END AS anomaly " +
        "FROM x ORDER BY event_type, day"),

    "q175_jaro_winkler_join" ->
      // DuckDB's native jaro_winkler_similarity IS the kernel's contract
      // (bit-exact, validated over 3000 random pairs); same first-token
      // block, same unrounded threshold
      ("WITH s AS (SELECT p_partkey AS id, p_name AS s, " +
        "array_to_string(list_slice(regexp_split_to_array(lower(trim(p_name)), '\\s+'), 1, 2), ' ') AS blk " +
        "FROM part WHERE p_name IS NOT NULL) " +
        "SELECT a.id AS id1, b.id AS id2, " +
        "round(jaro_winkler_similarity(a.s, b.s), 4) AS sim " +
        "FROM s a JOIN s b ON a.blk = b.blk AND a.id < b.id " +
        "WHERE jaro_winkler_similarity(a.s, b.s) >= 0.93 " +
        "ORDER BY id1, id2"),

    "q174_canonical_text" ->
      // identical contract: nfc_normalize, ASCII controls -> spaces,
      // space-run collapse, trim
      ("SELECT doc_id, trim(regexp_replace(regexp_replace(" +
        "nfc_normalize(text), '[\\x00-\\x1f\\x7f]', ' ', 'g'), ' +', ' ', 'g')) AS clean_text, " +
        "trim(regexp_replace(regexp_replace(nfc_normalize(text), '[\\x00-\\x1f\\x7f]', ' ', 'g'), ' +', ' ', 'g')) <> text AS changed " +
        "FROM documents ORDER BY doc_id"),

    "q172_replication_plan" ->
      // q92's rounded-6 uniform weights, then floor + the seeded 16-bit
      // md5 draw against the rounded-4 fractional part
      ("WITH g AS (SELECT lang, sum(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)) AS n_tokens " +
        "FROM documents GROUP BY lang), " +
        "t AS (SELECT sum(n_tokens) AS total_tokens, count(*) AS n_groups FROM g), " +
        "wgt AS (SELECT lang, round(CAST(total_tokens AS DOUBLE) / (n_groups * n_tokens), 6) AS w " +
        "FROM g, t) " +
        "SELECT d.doc_id, w AS weight, " +
        "CAST(floor(w) + CASE WHEN CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|rep'), 1, 4) AS BIGINT) AS DOUBLE) " +
        "< 65536.0 * round(w - floor(w), 4) THEN 1 ELSE 0 END AS BIGINT) AS n_replicas " +
        "FROM documents d JOIN wgt USING (lang) ORDER BY d.doc_id"),

    "q173_eval_contamination" ->
      // q89's shingle construction and eval split, aggregated per EVAL doc
      ("WITH sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> ''), " +
        "ev AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 50 = 0), " +
        "tg AS (SELECT DISTINCT g FROM (SELECT unnest(sh) AS g FROM sh WHERE doc_id % 50 <> 0)), " +
        "h AS (SELECT ev.doc_id, count(*) AS n_grams, " +
        "CAST(sum(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit " +
        "FROM ev LEFT JOIN tg ON ev.g = tg.g GROUP BY ev.doc_id) " +
        "SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, n_hit, " +
        "round(n_hit / CAST(n_grams AS DOUBLE), 4) AS contamination " +
        "FROM h ORDER BY doc_id"),

    "q171_clustering_coeff" ->
      // q134's exact 5-NN edge CTE, then mutualization, canonical-pair
      // wedge closure, and C = 2T/d(d-1) — all integer-derived
      (knnCosEdgeCte(5) +
        ", m AS MATERIALIZED (SELECT e1.src, e1.dst FROM e e1 " +
        "JOIN e e2 ON e1.src = e2.dst AND e1.dst = e2.src), " +
        "deg AS (SELECT src AS v, count(*) AS degree FROM m GROUP BY 1), " +
        "eu AS (SELECT src AS a, dst AS b FROM m WHERE src < dst), " +
        "tri AS (SELECT m1.src AS v, count(*) AS t FROM m m1 " +
        "JOIN m m2 ON m1.src = m2.src AND m1.dst < m2.dst " +
        "JOIN eu ON eu.a = m1.dst AND eu.b = m2.dst GROUP BY m1.src) " +
        "SELECT emb.vec_id, CAST(coalesce(deg.degree, 0) AS BIGINT) AS degree, " +
        "CAST(coalesce(tri.t, 0) AS BIGINT) AS triangles, " +
        "CASE WHEN coalesce(deg.degree, 0) >= 2 " +
        "THEN round(2.0 * coalesce(tri.t, 0) / (deg.degree * (deg.degree - 1)), 4) " +
        "ELSE 0.0 END AS coefficient " +
        "FROM embeddings emb LEFT JOIN deg ON deg.v = emb.vec_id " +
        "LEFT JOIN tri ON tri.v = emb.vec_id ORDER BY emb.vec_id"),

    "q169_transition_matrix" ->
      // lead-window pair replay with the same (ts, event_id) total order;
      // probabilities are one integer-derived division, round 4
      ("WITH p AS (SELECT user_id, event_type, " +
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type " +
        "FROM events), " +
        "c AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n " +
        "FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2), " +
        "t AS (SELECT from_type, sum(n) AS ft FROM c GROUP BY 1) " +
        "SELECT from_type, to_type, CAST(n AS BIGINT) AS n, " +
        "round(n / CAST(ft AS DOUBLE), 4) AS p " +
        "FROM c JOIN t USING (from_type) ORDER BY from_type, to_type"),

    "q170_rfm_segments" ->
      // same DECIMAL(18,2) monetary sum as q08, epoch-us recency, exact
      // quantile_cont cuts rounded to 4 (the q34 percentile parity), same
      // <=-chain banding
      ("WITH pu AS (SELECT user_id, max(epoch_us(ts)) AS recency_us, " +
        "count(*) AS frequency, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary " +
        "FROM events GROUP BY 1), " +
        "c AS (SELECT list_transform(quantile_cont(CAST(recency_us AS DOUBLE), [0.2, 0.4, 0.6, 0.8]), x -> round(x, 4)) AS rc, " +
        "list_transform(quantile_cont(CAST(frequency AS DOUBLE), [0.2, 0.4, 0.6, 0.8]), x -> round(x, 4)) AS fc, " +
        "list_transform(quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]), x -> round(x, 4)) AS mc FROM pu), " +
        "s AS (SELECT user_id, recency_us, frequency, round(monetary, 2) AS monetary, " +
        "CASE WHEN CAST(recency_us AS DOUBLE) <= rc[1] THEN 1 WHEN CAST(recency_us AS DOUBLE) <= rc[2] THEN 2 " +
        "WHEN CAST(recency_us AS DOUBLE) <= rc[3] THEN 3 WHEN CAST(recency_us AS DOUBLE) <= rc[4] THEN 4 ELSE 5 END AS r_score, " +
        "CASE WHEN CAST(frequency AS DOUBLE) <= fc[1] THEN 1 WHEN CAST(frequency AS DOUBLE) <= fc[2] THEN 2 " +
        "WHEN CAST(frequency AS DOUBLE) <= fc[3] THEN 3 WHEN CAST(frequency AS DOUBLE) <= fc[4] THEN 4 ELSE 5 END AS f_score, " +
        "CASE WHEN pu.monetary <= mc[1] THEN 1 WHEN pu.monetary <= mc[2] THEN 2 " +
        "WHEN pu.monetary <= mc[3] THEN 3 WHEN pu.monetary <= mc[4] THEN 4 ELSE 5 END AS m_score " +
        "FROM pu, c) " +
        "SELECT user_id, recency_us, frequency, monetary, r_score, f_score, m_score, " +
        "CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment " +
        "FROM s ORDER BY user_id"),

    "q168_quality_classifier" ->
      // counts re-derived exactly; the MLE-identity booleans are pinned
      // TRUE (gradient < 1e-6, |sum p - n_pos| < 1e-3, scores in (0,1))
      ("SELECT CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos, " +
        "TRUE AS converged, TRUE AS calibrated, TRUE AS probs_bounded " +
        "FROM documents WHERE text IS NOT NULL AND trim(text) <> ''"),

    "q167_term_dispersion" ->
      // replays counts, shares, the absent-part spine, and the part-order
      // left-associative |v-s| fold
      ("WITH tk AS (SELECT source AS part, unnest(list_filter(" +
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS tok " +
        "FROM documents WHERE text IS NOT NULL), " +
        "c AS (SELECT part, tok, count(*) AS c FROM tk GROUP BY 1, 2), " +
        "ps AS (SELECT part, CAST(sum(c) AS BIGINT) AS ptok FROM c GROUP BY 1), " +
        "t AS (SELECT CAST(sum(ptok) AS DOUBLE) AS ttok FROM ps), " +
        "sh AS (SELECT part, ptok / ttok AS s FROM ps, t), " +
        "top AS (SELECT tok, CAST(sum(c) AS BIGINT) AS total_count FROM c " +
        "GROUP BY 1 ORDER BY total_count DESC, tok LIMIT 20), " +
        "sp AS (SELECT tok, total_count, part, s FROM top, sh), " +
        "d AS (SELECT sp.tok, sp.total_count, sp.part, " +
        "abs(coalesce(c.c, 0) / CAST(sp.total_count AS DOUBLE) - sp.s) AS d " +
        "FROM sp LEFT JOIN c ON c.tok = sp.tok AND c.part = sp.part) " +
        "SELECT tok AS token, total_count, " +
        "round(0.5 * list_reduce(list_prepend(0.0, list(d ORDER BY part)), " +
        "(a, b) -> a + b), 4) AS dp " +
        "FROM d GROUP BY tok, total_count ORDER BY token"),

    "q166_lexical_diversity" ->
      // replays the window arithmetic: same token list, list_slice +
      // list_distinct per window, BIGINT distinct-count sum, one division;
      // short docs fall back to plain TTR
      ("WITH d AS (SELECT doc_id, list_filter(" +
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS ts " +
        "FROM documents WHERE text IS NOT NULL), " +
        "b AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS n_tokens, " +
        "CAST(len(list_distinct(ts)) AS BIGINT) AS n_types FROM d), " +
        "m AS (SELECT doc_id, CAST(list_reduce(list_prepend(0, " +
        "list_transform(range(len(ts) - 25 + 1), " +
        "i -> len(list_distinct(list_slice(ts, CAST(i + 1 AS INT), CAST(i + 25 AS INT)))))), " +
        "(a, x) -> a + x) AS BIGINT) AS wsum, " +
        "CAST(len(ts) - 25 + 1 AS BIGINT) AS nwin FROM b WHERE n_tokens >= 25) " +
        "SELECT b.doc_id, n_tokens, n_types, " +
        "CASE WHEN n_tokens > 0 THEN floor(CAST(n_types AS DOUBLE) / n_tokens * 10000 + 0.5) / 10000 ELSE 0.0 END AS ttr, " +
        "CASE WHEN n_tokens > 0 THEN floor(n_types / sqrt(CAST(n_tokens AS DOUBLE)) * 10000 + 0.5) / 10000 ELSE 0.0 END AS root_ttr, " +
        "CASE WHEN n_tokens >= 25 THEN floor(CAST(wsum AS DOUBLE) / (nwin * 25) * 10000 + 0.5) / 10000 " +
        "WHEN n_tokens > 0 THEN floor(CAST(n_types AS DOUBLE) / n_tokens * 10000 + 0.5) / 10000 " +
        "ELSE 0.0 END AS mattr " +
        "FROM b LEFT JOIN m USING (doc_id) ORDER BY b.doc_id"),

    "q165_passage_keep_first" ->
      // q107's positional-gram ground truth with the keep-first twist:
      // occurrence rank by (doc_id, pos) per gram, covered = non-first
      // occurrences of grams with count >= 2 (within-doc repeats count)
      ("WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents), " +
        "grams AS (SELECT doc_id, i AS pos, ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] AS gram " +
        "FROM toks, UNNEST(range(len(ts) - 2)) AS t(i) WHERE len(ts) >= 3), " +
        "r AS (SELECT doc_id, pos, gram, " +
        "row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk, " +
        "count(*) OVER (PARTITION BY gram) AS c FROM grams), " +
        "covered AS (SELECT DISTINCT doc_id, pos + o AS tpos " +
        "FROM r, UNNEST([0,1,2]) AS u(o) WHERE c >= 2 AND rk > 1), " +
        "kept AS (SELECT t.doc_id, i AS tpos, ts[i+1] AS tok " +
        "FROM toks t, UNNEST(range(len(ts))) AS x(i) " +
        "WHERE NOT EXISTS (SELECT 1 FROM covered cv WHERE cv.doc_id = t.doc_id AND cv.tpos = i)) " +
        "SELECT toks.doc_id, len(ts) AS n_tokens, " +
        "len(ts) - coalesce(k.cnt, 0) AS n_removed, coalesce(k.txt, '') AS clean_text " +
        "FROM toks LEFT JOIN (SELECT doc_id, count(*) AS cnt, " +
        "string_agg(tok, ' ' ORDER BY tpos) AS txt FROM kept GROUP BY doc_id) k USING (doc_id) " +
        "ORDER BY toks.doc_id"),

    "q164_temperature_resample" ->
      // same token count as q109, same md5 16-bit draw; the pow/div boost
      // chain is rounded to 4 before the comparison so no boundary row can
      // flip on cross-engine ulp drift
      ("WITH g AS (SELECT lang, sum(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)) AS gtok " +
        "FROM documents GROUP BY lang), " +
        "t AS (SELECT CAST(sum(gtok) AS DOUBLE) AS ttok FROM g), " +
        "bo AS (SELECT lang, pow(gtok / ttok, -0.5) AS boost FROM g, t), " +
        "mx AS (SELECT max(boost) AS bmax FROM bo), " +
        "r AS (SELECT lang, round(boost / bmax, 4) AS keep_rate FROM bo, mx) " +
        "SELECT d.lang, keep_rate, count(*) AS n_kept, " +
        "CAST(sum(doc_id) AS BIGINT) AS kept_id_sum " +
        "FROM documents d JOIN r USING (lang) " +
        "WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) AS DOUBLE) " +
        "< 65536.0 * keep_rate " +
        "GROUP BY 1, 2 ORDER BY d.lang"),

    "q163_count_min" ->
      // replays the entire sketch: same md5-prefix bucket hash (i|token,
      // first 8 hex chars mod 256), same depth-4 counter table, same
      // min-over-rows estimates for the same top-20 probe set
      ("WITH tk AS (SELECT unnest(list_filter(" +
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS tok " +
        "FROM documents WHERE text IS NOT NULL), " +
        "f AS (SELECT tok, i FROM tk, (SELECT unnest([0, 1, 2, 3]) AS i) d), " +
        "sk AS (SELECT i, CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || tok), 1, 8) AS BIGINT) % 256 AS bucket, " +
        "count(*) AS cnt FROM f GROUP BY 1, 2), " +
        "ex AS (SELECT tok, count(*) AS exact_count FROM tk GROUP BY 1 " +
        "ORDER BY exact_count DESC, tok LIMIT 20), " +
        "pr AS (SELECT tok, exact_count, i, " +
        "CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || tok), 1, 8) AS BIGINT) % 256 AS bucket " +
        "FROM ex, (SELECT unnest([0, 1, 2, 3]) AS i) d) " +
        "SELECT tok AS token, exact_count, min(cnt) AS cms_estimate, " +
        "min(cnt) - exact_count AS overestimate " +
        "FROM pr JOIN sk USING (i, bucket) GROUP BY tok, exact_count ORDER BY token"),

    "q162_gopher_repetition" ->
      // replays the signals exactly: same token list, lockstep-unnest
      // positional grams, (c DESC, gram) top-1 per (doc, n), coverage via
      // DISTINCT covered positions; all ratios are single divisions of
      // integer masses, round 4
      ("WITH d AS (SELECT doc_id, list_filter(" +
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS ts " +
        "FROM documents WHERE text IS NOT NULL), " +
        "b AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS n_tokens, " +
        "CAST(list_reduce(list_prepend(0, list_transform(ts, t -> len(t))), " +
        "(a, x) -> a + x) AS BIGINT) AS tok_chars FROM d), " +
        "g AS (SELECT doc_id, n, unnest(list_transform(range(len(ts) - n + 1), " +
        "i -> array_to_string(list_slice(ts, CAST(i + 1 AS INT), CAST(i + n AS INT)), ' '))) AS gram " +
        "FROM b, (SELECT unnest([2, 3, 4]) AS n) ns WHERE len(ts) >= n), " +
        "gc AS (SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3), " +
        "tops AS (SELECT doc_id, n, c * (length(gram) - (n - 1)) AS top_chars, " +
        "row_number() OVER (PARTITION BY doc_id, n ORDER BY c DESC, gram) AS rk FROM gc), " +
        "tp AS (SELECT doc_id, " +
        "max(CASE WHEN n = 2 THEN top_chars END) AS t2, " +
        "max(CASE WHEN n = 3 THEN top_chars END) AS t3, " +
        "max(CASE WHEN n = 4 THEN top_chars END) AS t4 " +
        "FROM tops WHERE rk = 1 GROUP BY doc_id), " +
        "g5 AS (SELECT doc_id, unnest(range(len(ts) - 4)) AS pos, " +
        "unnest(list_transform(range(len(ts) - 4), " +
        "i -> array_to_string(list_slice(ts, CAST(i + 1 AS INT), CAST(i + 5 AS INT)), ' '))) AS gram " +
        "FROM b WHERE len(ts) >= 5), " +
        "d5 AS (SELECT doc_id, gram FROM g5 GROUP BY doc_id, gram HAVING count(*) >= 2), " +
        "cov AS (SELECT DISTINCT doc_id, tpos FROM (SELECT g5.doc_id AS doc_id, " +
        "unnest(range(pos, pos + 5)) AS tpos FROM g5 JOIN d5 USING (doc_id, gram)) u), " +
        "cc AS (SELECT cov.doc_id, CAST(sum(len(ts[CAST(tpos + 1 AS INT)])) AS BIGINT) AS cov_chars " +
        "FROM cov JOIN b USING (doc_id) GROUP BY cov.doc_id) " +
        "SELECT b.doc_id, n_tokens, tok_chars, " +
        "CASE WHEN tok_chars > 0 THEN floor(COALESCE(t2, 0) / CAST(tok_chars AS DOUBLE) * 10000 + 0.5) / 10000 ELSE 0.0 END AS top_2gram_frac, " +
        "CASE WHEN tok_chars > 0 THEN floor(COALESCE(t3, 0) / CAST(tok_chars AS DOUBLE) * 10000 + 0.5) / 10000 ELSE 0.0 END AS top_3gram_frac, " +
        "CASE WHEN tok_chars > 0 THEN floor(COALESCE(t4, 0) / CAST(tok_chars AS DOUBLE) * 10000 + 0.5) / 10000 ELSE 0.0 END AS top_4gram_frac, " +
        "CASE WHEN tok_chars > 0 THEN floor(COALESCE(cov_chars, 0) / CAST(tok_chars AS DOUBLE) * 10000 + 0.5) / 10000 ELSE 0.0 END AS dup_5gram_frac " +
        "FROM b LEFT JOIN tp USING (doc_id) LEFT JOIN cc USING (doc_id) ORDER BY b.doc_id"),

    "q160_edit_join" ->
      // replays the whole Ed-Join plan: distinct positional bigrams, global
      // df, rarest-first (df, gram) prefix of q*tau+1 = 3, sentinel bucket
      // for degenerate strings, pair join, length cull, levenshtein verify
      ("WITH b AS (SELECT c_custkey AS id, c_name AS s FROM customer " +
        "WHERE c_name IS NOT NULL), " +
        "g AS (SELECT DISTINCT id, substring(s, CAST(i + 1 AS INT), 2) AS gram " +
        "FROM b, UNNEST(range(length(s) - 1)) AS u(i)), " +
        "f AS (SELECT gram, count(*) AS df FROM g GROUP BY 1), " +
        "pre AS (SELECT id, gram FROM (" +
        "SELECT g.id, g.gram, row_number() OVER (PARTITION BY g.id " +
        "ORDER BY f.df, g.gram) AS rk FROM g JOIN f USING (gram)) WHERE rk <= 3 " +
        "UNION ALL SELECT id, '' AS gram FROM b WHERE length(s) - 1 <= 2), " +
        "cand AS (SELECT DISTINCT p1.id AS id1, p2.id AS id2 " +
        "FROM pre p1 JOIN pre p2 ON p1.gram = p2.gram AND p1.id < p2.id) " +
        "SELECT id1, id2, CAST(levenshtein(b1.s, b2.s) AS BIGINT) AS dist " +
        "FROM cand JOIN b b1 ON b1.id = id1 JOIN b b2 ON b2.id = id2 " +
        "WHERE abs(length(b1.s) - length(b2.s)) <= 1 " +
        "AND levenshtein(b1.s, b2.s) <= 1 ORDER BY id1, id2"),

    "q158_nb_lang_predict" ->
      // full model replay (shared with q188's report layer): see nbPredictOracleSql
      nbPredictOracleSql,

    "q157_ivfpq_ann_contract" ->
      // q153's exact-side oracle verbatim (brute-force cosine + (cos DESC,
      // vec_id) tie-break); the IVFADC floors and range invariants pinned
      // TRUE — recall floor 0.5 at nprobe=4/8 with margin under measured
      ("WITH e AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings WHERE vec_id >= 10), " +
        "q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn FROM (" +
        "SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings WHERE vec_id < 10)), " +
        "s AS (SELECT query_id, e.vec_id AS vec_id, " +
        "CASE WHEN e.nrm * qn = 0 THEN 0.0 " +
        "ELSE list_sum(list_transform(list_zip(e.embedding, qv), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (e.nrm * qn) END AS cos " +
        "FROM e, q WHERE e.vec_id <> query_id), " +
        "r AS (SELECT query_id, vec_id, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk FROM s) " +
        "SELECT (SELECT count(*) FROM e) AS n_corpus, " +
        "(SELECT count(*) FROM q) AS n_queries, " +
        "(SELECT CAST(sum(vec_id) AS BIGINT) FROM r WHERE rk <= 10) AS exact_topk_id_sum, " +
        "TRUE AS recall_floor_met, TRUE AS codes_bounded, TRUE AS lists_bounded"),

    "q156_entropy" ->
      // same sorted-key left-associative folds: char terms in char order
      // (in-list counts), word terms in token order (list(c ORDER BY tok));
      // ln once per term, one division, round 4 — q150's float discipline
      ("WITH d AS (SELECT doc_id, lower(text) AS t, text FROM documents " +
        "WHERE text IS NOT NULL AND length(text) > 0), " +
        "ch AS (SELECT doc_id, t, " +
        "list_transform(range(length(t)), i -> substring(t, CAST(i + 1 AS INT), 1)) AS cs " +
        "FROM d), " +
        "ce AS (SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars, " +
        "round(ln(length(t)) - list_reduce(list_prepend(0.0, " +
        "list_transform(list_sort(list_distinct(cs)), " +
        "c -> len(list_filter(cs, x -> x = c)) * ln(len(list_filter(cs, x -> x = c))))), " +
        "(a, b) -> a + b) / length(t), 4) AS char_entropy FROM ch), " +
        "tk AS (SELECT doc_id, unnest(list_filter(" +
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS tok " +
        "FROM d), " +
        "tc AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2), " +
        "we AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, " +
        "round(ln(sum(c)) - list_reduce(list_prepend(0.0, " +
        "list_transform(list(c ORDER BY tok), x -> x * ln(x))), " +
        "(a, b) -> a + b) / sum(c), 4) AS word_entropy FROM tc GROUP BY doc_id) " +
        "SELECT ce.doc_id, n_chars, char_entropy, " +
        "coalesce(n_tokens, 0) AS n_tokens, " +
        "coalesce(word_entropy, 0.0) AS word_entropy " +
        "FROM ce LEFT JOIN we ON ce.doc_id = we.doc_id ORDER BY ce.doc_id"),

    "q155_winnowing_overlap" ->
      // q154's fingerprint CTE verbatim (same md5 gram hashes, composite
      // keys, sliding frame, full-window filter), then postings distinct,
      // the 2..maxDf df band, and the same self-join + HAVING
      ("WITH d AS (SELECT doc_id, lower(text) AS t FROM documents " +
        "WHERE text IS NOT NULL AND length(lower(text)) >= 5), " +
        "g AS (SELECT doc_id, i AS pos, " +
        "CAST('0x' || substr(md5(substring(t, CAST(i + 1 AS INT), 5)), 1, 8) AS BIGINT) " +
        "* 2097152 + (2097151 - i) AS key, length(t) - 4 AS n " +
        "FROM d, UNNEST(range(length(t) - 4)) AS u(i)), " +
        "wm AS (SELECT doc_id, pos, n, min(key) OVER (PARTITION BY doc_id " +
        "ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey FROM g), " +
        "fps AS (SELECT DISTINCT doc_id, CAST(wkey // 2097152 AS BIGINT) AS fp " +
        "FROM wm WHERE pos <= greatest(n - 4, 0)), " +
        "rare AS (SELECT fp FROM (SELECT fp, count(*) AS df FROM fps GROUP BY fp) " +
        "WHERE df BETWEEN 2 AND 20), " +
        "pr AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare r USING (fp)) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(count(*) AS BIGINT) AS shared_fps " +
        "FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY 1, 2"),

    "q153_pq_ann_contract" ->
      // exact side re-derived with q110's brute-force cosine kernel and
      // (cos DESC, vec_id) tie-break; PQ-side floors pinned TRUE
      ("WITH e AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings WHERE vec_id >= 10), " +
        "q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn FROM (" +
        "SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings WHERE vec_id < 10)), " +
        "s AS (SELECT query_id, e.vec_id AS vec_id, " +
        "CASE WHEN e.nrm * qn = 0 THEN 0.0 " +
        "ELSE list_sum(list_transform(list_zip(e.embedding, qv), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (e.nrm * qn) END AS cos " +
        "FROM e, q WHERE e.vec_id <> query_id), " +
        "r AS (SELECT query_id, vec_id, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk FROM s) " +
        "SELECT (SELECT count(*) FROM e) AS n_corpus, " +
        "(SELECT count(*) FROM q) AS n_queries, " +
        "(SELECT CAST(sum(vec_id) AS BIGINT) FROM r WHERE rk <= 10) AS exact_topk_id_sum, " +
        "TRUE AS recall_floor_met, TRUE AS codes_bounded"),

    "q152_kll_contract" ->
      // n and the exact interpolated median re-derived (quantile_cont ==
      // Spark percentile, the q113 precedent); the sketch-side weight,
      // monotonicity, and rank-error floors pinned TRUE
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "round(quantile_cont(CAST(length(text) AS DOUBLE), 0.5), 4) AS exact_p50, " +
        "TRUE AS n_match, TRUE AS monotone, TRUE AS rank_err_bound_met " +
        "FROM documents WHERE text IS NOT NULL"),

    "q151_bpe_encode" ->
      // n_word_types re-derived from the same tokenization; the greedy
      // BPE invariant booleans pinned TRUE, n_merges pinned to the call
      ("SELECT CAST(count(DISTINCT t) AS BIGINT) AS n_word_types, " +
        "CAST(50 AS BIGINT) AS n_merges, TRUE AS roundtrip_ok, TRUE AS substring_ok " +
        "FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t " +
        "FROM documents WHERE trim(text) <> '')"),

    "q149_bpe_pairs" ->
      // same word-type table, same char-pair windows (substring is
      // char-based on both engines), integer weights — exact
      ("WITH w AS (SELECT t AS w, count(*) AS freq FROM " +
        "(SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t " +
        "FROM documents WHERE trim(text) <> '') GROUP BY t), " +
        "p AS (SELECT unnest(list_transform(range(1, length(w)), " +
        "i -> substring(w, CAST(i AS INT), 2))) AS pair, freq FROM w WHERE length(w) >= 2) " +
        "SELECT pair, CAST(sum(freq) AS BIGINT) AS weight FROM p " +
        "GROUP BY pair ORDER BY weight DESC, pair LIMIT 30"),

    "q150_zipf_slope" ->
      // same top-200 head (ties lex), same rank-ordered left-associative
      // fold (list_reduce over list_prepend(0.0, ...) mirrors the
      // aggregate fold), same division chain, rounded outputs
      ("WITH tk AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t " +
        "FROM documents WHERE trim(text) <> ''), " +
        "f AS (SELECT t, count(*) AS freq FROM tk GROUP BY t ORDER BY freq DESC, t LIMIT 200), " +
        "r AS (SELECT row_number() OVER (ORDER BY freq DESC, t) AS rank, freq FROM f), " +
        "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, " +
        "list_reduce(list_prepend(0.0, list(ln(rank) ORDER BY rank)), (a,b) -> a+b) AS sx, " +
        "list_reduce(list_prepend(0.0, list(ln(freq) ORDER BY rank)), (a,b) -> a+b) AS sy, " +
        "list_reduce(list_prepend(0.0, list(ln(rank)*ln(freq) ORDER BY rank)), (a,b) -> a+b) AS sxy, " +
        "list_reduce(list_prepend(0.0, list(ln(rank)*ln(rank) ORDER BY rank)), (a,b) -> a+b) AS sxx FROM r) " +
        "SELECT CAST(n AS BIGINT) AS n_ranks, " +
        "round((sxy - sx*sy/n)/(sxx - sx*sx/n), 4) AS slope, " +
        "round(sy/n - ((sxy - sx*sy/n)/(sxx - sx*sx/n))*(sx/n), 4) AS intercept FROM s"),

    "q147_seq_packing" ->
      // same tokenization, id-ordered window cumsum, BIGINT floor
      // division — every value integral, so the replay is exact
      ("WITH d AS (SELECT doc_id, " +
        "len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens " +
        "FROM documents WHERE trim(text) <> ''), " +
        "c AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, " +
        "CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off FROM d) " +
        "SELECT doc_id, n_tokens, start_off, " +
        "CAST(start_off // 256 AS BIGINT) AS first_seq, " +
        "CAST((start_off + n_tokens - 1) // 256 AS BIGINT) AS last_seq " +
        "FROM c ORDER BY doc_id"),

    "q148_distinct_sketch" ->
      // exact per-source + global distincts re-derived; the 5%-band
      // booleans pinned TRUE (q101/q103 contract discipline)
      ("WITH tk AS (SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t " +
        "FROM documents WHERE trim(text) <> '') " +
        "SELECT * FROM (" +
        "SELECT source, CAST(count(DISTINCT t) AS BIGINT) AS n_exact, TRUE AS est_ok " +
        "FROM tk GROUP BY source " +
        "UNION ALL SELECT 'ALL', CAST(count(DISTINCT t) AS BIGINT), TRUE FROM tk" +
        ") ORDER BY source"),

    "q145_data_profile" ->
      // per-column profile re-derived exactly; completeness rounds
      // half-up on both engines; min/max aggregated natively then cast
      (Seq("doc_id", "lang", "source", "n_chars", "text").map { c =>
        s"SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n, " +
          s"CAST(count(*) - count($c) AS BIGINT) AS n_null, " +
          s"CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct, " +
          s"round(CAST(count($c) AS DOUBLE) / count(*), 4) AS completeness, " +
          s"CAST(min($c) AS VARCHAR) AS min_str, " +
          s"CAST(max($c) AS VARCHAR) AS max_str FROM documents"
      }.mkString(" UNION ALL ") + " ORDER BY col_name"),

    "q146_constraint_report" ->
      // each constraint's violation count re-derived by filter/distinct
      // arithmetic; regex anchored so search-vs-match semantics agree
      ("WITH n AS (SELECT count(*) AS c FROM documents) " +
        "SELECT * FROM (" +
        "SELECT 'not_null(doc_id)' AS \"constraint\", " +
        "count(*) FILTER (WHERE doc_id IS NULL) = 0 AS passed, " +
        "CAST(count(*) FILTER (WHERE doc_id IS NULL) AS BIGINT) AS violations, " +
        "CAST((SELECT c FROM n) AS BIGINT) AS checked FROM documents " +
        "UNION ALL SELECT 'not_null(text)', " +
        "count(*) FILTER (WHERE text IS NULL) = 0, " +
        "CAST(count(*) FILTER (WHERE text IS NULL) AS BIGINT), " +
        "CAST((SELECT c FROM n) AS BIGINT) FROM documents " +
        "UNION ALL SELECT 'unique(doc_id)', " +
        "count(doc_id) - count(DISTINCT doc_id) = 0, " +
        "CAST(count(doc_id) - count(DISTINCT doc_id) AS BIGINT), " +
        "CAST((SELECT c FROM n) AS BIGINT) FROM documents " +
        "UNION ALL SELECT 'in_range(n_chars)', " +
        "count(*) FILTER (WHERE n_chars IS NOT NULL AND (n_chars < 1 OR n_chars > 400)) = 0, " +
        "CAST(count(*) FILTER (WHERE n_chars IS NOT NULL AND (n_chars < 1 OR n_chars > 400)) AS BIGINT), " +
        "CAST((SELECT c FROM n) AS BIGINT) FROM documents " +
        "UNION ALL SELECT 'in_set(lang)', " +
        "count(*) FILTER (WHERE lang IS NOT NULL AND lang NOT IN ('de','en','es','fr','zh')) = 0, " +
        "CAST(count(*) FILTER (WHERE lang IS NOT NULL AND lang NOT IN ('de','en','es','fr','zh')) AS BIGINT), " +
        "CAST((SELECT c FROM n) AS BIGINT) FROM documents " +
        "UNION ALL SELECT 'matches_regex(lang)', " +
        "count(*) FILTER (WHERE lang IS NOT NULL AND NOT regexp_matches(lang, '^[a-z]{2}$')) = 0, " +
        "CAST(count(*) FILTER (WHERE lang IS NOT NULL AND NOT regexp_matches(lang, '^[a-z]{2}$')) AS BIGINT), " +
        "CAST((SELECT c FROM n) AS BIGINT) FROM documents" +
        ") ORDER BY \"constraint\""),

    "q143_pca_contract" ->
      // n_rows and d_in re-derived from the data, k pinned to the call;
      // the three defining-property booleans pinned TRUE
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(max(len(embedding)) AS BIGINT) AS d_in, " +
        "CAST(16 AS BIGINT) AS k, TRUE AS trace_ok, " +
        "TRUE AS orthonormal_ok, TRUE AS proj_diag_ok FROM embeddings"),

    "q144_random_projection" ->
      // regenerate the exact Achlioptas matrix from the same md5 draw
      // (mod-6 over the first 8 hex chars) and replay the engine's
      // left-to-right double accumulation: list_prepend(0.0, ...) mirrors
      // the acc = 0.0 start, list ORDER BY i mirrors the index loop
      ("WITH r AS (SELECT j, i, CASE (CAST('0x' || substring(md5(" +
        "'rp:42:' || CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 8) " +
        "AS BIGINT) % 6) WHEN 0 THEN sqrt(3.0/16.0) WHEN 1 THEN -sqrt(3.0/16.0) " +
        "ELSE 0.0 END AS w FROM range(16) t1(j), range(64) t2(i)), " +
        "terms AS (SELECT e.vec_id, r.j AS dim, " +
        "list(r.w * CAST(e.embedding[r.i + 1] AS DOUBLE) ORDER BY r.i) AS ts " +
        "FROM embeddings e, r GROUP BY e.vec_id, r.j) " +
        "SELECT vec_id, CAST(dim AS INT) AS dim, " +
        "list_reduce(list_prepend(0.0, ts), (a, b) -> a + b) AS val " +
        "FROM terms ORDER BY vec_id, dim"),

    "q139_pmi_collocations" ->
      // same tokenization, same left-associative double product chain and
      // single ln; ordering on the rounded score, ties on the pair text
      ("WITH tk AS MATERIALIZED (SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        "t -> length(t) > 0) AS ts FROM documents WHERE text IS NOT NULL), " +
        "tn AS MATERIALIZED (SELECT ts, len(ts) AS n FROM tk), " +
        "totals AS (SELECT sum(n) AS t_uni, sum(greatest(n - 1, 0)) AS t_bi FROM tn), " +
        "uni AS MATERIALIZED (SELECT w, count(*) AS n_w FROM (SELECT unnest(ts) AS w FROM tn) GROUP BY w), " +
        "bi AS (SELECT p[1] AS w1, p[2] AS w2 FROM (SELECT unnest(list_transform(range(1, n), " +
        "i -> [ts[i], ts[i + 1]])) AS p FROM tn WHERE n >= 2)), " +
        "bc AS (SELECT w1, w2, count(*) AS n_ab FROM bi GROUP BY w1, w2 HAVING count(*) >= 5), " +
        "scored AS (SELECT w1 || ' ' || w2 AS bigram, n_ab, " +
        "round(ln((CAST(n_ab AS DOUBLE) * t_uni * t_uni) / (CAST(t_bi AS DOUBLE) * a.n_w * b.n_w)), 4) AS pmi " +
        "FROM bc JOIN uni a ON a.w = bc.w1 JOIN uni b ON b.w = bc.w2 CROSS JOIN totals) " +
        "SELECT * FROM (SELECT bigram, n_ab, pmi FROM scored ORDER BY pmi DESC, bigram LIMIT 30) " +
        "ORDER BY pmi DESC, bigram"),

    "q140_bootstrap_ci" ->
      // same seeded md5 Poisson(1) inverse-CDF (hard decimal thresholds),
      // BIGINT replica sums, one double division per mean, integer-rank
      // band endpoints (ceil(.025*200)=5, ceil(.975*200)=195)
      ("WITH base AS MATERIALIZED (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x " +
        "FROM documents WHERE n_chars IS NOT NULL), " +
        "obs AS (SELECT source, count(*) AS n_rows, " +
        "round(CAST(sum(x) AS DOUBLE) / count(*), 4) AS mean_obs FROM base GROUP BY source), " +
        "drawn AS MATERIALIZED (SELECT source, b, x, " +
        "CASE WHEN u < 0.36787944117144233 THEN 0 WHEN u < 0.7357588823428847 THEN 1 " +
        "WHEN u < 0.9196986029286058 THEN 2 WHEN u < 0.9810118431238462 THEN 3 " +
        "WHEN u < 0.9963401531726563 THEN 4 WHEN u < 0.9994058151824183 THEN 5 " +
        "WHEN u < 0.9999167588507119 THEN 6 WHEN u < 0.9999897508033253 THEN 7 " +
        "WHEN u < 0.9999988747433402 THEN 8 WHEN u < 0.9999998885745217 THEN 9 ELSE 10 END AS k " +
        "FROM (SELECT base.*, r.range AS b, " +
        "(CAST(CAST('0x' || substring(md5('boot:' || CAST(doc_id AS VARCHAR) || ':' || CAST(r.range AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) + 1.0) / 4294967296.0 AS u " +
        "FROM base CROSS JOIN range(0, 200) r)), " +
        "reps AS MATERIALIZED (SELECT source, b, " +
        "CAST(sum(k * x) AS DOUBLE) / CAST(sum(k) AS DOUBLE) AS m " +
        "FROM drawn GROUP BY source, b HAVING sum(k) > 0), " +
        "rk AS (SELECT source, m, row_number() OVER (PARTITION BY source ORDER BY m, b) AS r FROM reps), " +
        "band AS (SELECT source, round(max(CASE WHEN r = 5 THEN m END), 4) AS ci_lo, " +
        "round(max(CASE WHEN r = 195 THEN m END), 4) AS ci_hi FROM rk GROUP BY source) " +
        "SELECT obs.source, n_rows, mean_obs, ci_lo, ci_hi " +
        "FROM obs JOIN band ON obs.source = band.source ORDER BY obs.source"),

    "q141_vocab_growth" ->
      // same global row_number bucketing (floor of one double division),
      // q102's trigram-shingle CTE, min-bucket first appearance,
      // 10-row running sum
      ("WITH d AS MATERIALIZED (SELECT doc_id, text FROM documents WHERE trim(text) <> ''), " +
        "nd AS (SELECT count(*) AS n_docs FROM d), " +
        "bk AS MATERIALIZED (SELECT CAST(floor((row_number() OVER (ORDER BY doc_id) - 1) * 10 / n_docs) AS INT) AS bucket, " +
        "text FROM d CROSS JOIN nd), " +
        "sh AS (SELECT bucket, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh FROM bk), " +
        "fs AS (SELECT w, min(bucket) AS first_bucket FROM " +
        "(SELECT bucket, unnest(sh) AS w FROM sh) GROUP BY w), " +
        "nt AS (SELECT first_bucket AS bucket, count(*) AS new_tokens FROM fs GROUP BY first_bucket) " +
        "SELECT bucket, new_tokens, CAST(sum(new_tokens) OVER (ORDER BY bucket " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size FROM nt ORDER BY bucket"),

    "q137_quantile_norm" ->
      // same per-source ranks (ties by id), same global rank table, and
      // the same explicit g_lo + (g_hi - g_lo)·frac interpolation — no
      // quantile aggregate on either side, so every double op is mirrored
      ("WITH v AS MATERIALIZED (SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS x " +
        "FROM documents WHERE n_chars IS NOT NULL), " +
        "srk AS MATERIALIZED (SELECT doc_id, source, x, " +
        "row_number() OVER (PARTITION BY source ORDER BY x, doc_id) - 1 AS r, " +
        "count(*) OVER (PARTITION BY source) AS ns FROM v), " +
        "g AS MATERIALIZED (SELECT x AS gx, row_number() OVER (ORDER BY x, doc_id) - 1 AS gi FROM v), " +
        "n AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS nn FROM v), " +
        "m AS (SELECT doc_id, source, x, " +
        "CASE WHEN ns = 1 THEN 0.5 ELSE CAST(r AS DOUBLE) / (ns - 1) END AS q FROM srk), " +
        "p AS (SELECT doc_id, source, x, q * (nn - 1) AS pos, " +
        "CAST(floor(q * (nn - 1)) AS BIGINT) AS li FROM m CROSS JOIN n) " +
        "SELECT p.doc_id, p.source, p.x AS n_chars, " +
        "round(glo.gx + (ghi.gx - glo.gx) * (p.pos - p.li), 4) AS normalized " +
        "FROM p JOIN g glo ON glo.gi = p.li CROSS JOIN n " +
        "JOIN g ghi ON ghi.gi = least(p.li + 1, nn - 1) ORDER BY p.doc_id"),

    "q136_kappa_agreement" ->
      // q134's prediction pipeline verbatim, then the kappa arithmetic:
      // integer marginal cross-products (order-exact), divisions once at
      // the end, same 1-pe degenerate guard
      (knnCosEdgeCte(5) +
        ", votes AS MATERIALIZED (SELECT e.src, l.label, count(*) AS c " +
        "FROM e JOIN embeddings l ON l.vec_id = e.dst GROUP BY e.src, l.label), " +
        "win AS MATERIALIZED (SELECT src, label AS predicted FROM (SELECT src, label, " +
        "row_number() OVER (PARTITION BY src ORDER BY c DESC, label) AS rn FROM votes) WHERE rn = 1), " +
        "base AS (SELECT o.label AS a, w.predicted AS b FROM embeddings o JOIN win w ON w.src = o.vec_id), " +
        "ct AS MATERIALIZED (SELECT a, b, count(*) AS c FROM base GROUP BY a, b), " +
        "st AS (SELECT sum(c) AS n, sum(CASE WHEN a = b THEN c ELSE 0 END) AS agree FROM ct), " +
        "pe AS (SELECT COALESCE(sum(ma.ca * mb.cb), 0) AS pesum FROM " +
        "(SELECT a, sum(c) AS ca FROM ct GROUP BY a) ma JOIN " +
        "(SELECT b, sum(c) AS cb FROM ct GROUP BY b) mb ON ma.a = mb.b) " +
        "SELECT CAST(st.n AS BIGINT) AS n, " +
        "round(CAST(agree AS DOUBLE) / CAST(st.n AS DOUBLE), 4) AS po, " +
        "round(CAST(pesum AS DOUBLE) / (CAST(st.n AS DOUBLE) * CAST(st.n AS DOUBLE)), 4) AS pe, " +
        "CASE WHEN 1.0 - CAST(pesum AS DOUBLE) / (CAST(st.n AS DOUBLE) * CAST(st.n AS DOUBLE)) = 0 THEN 1.0 " +
        "ELSE round((CAST(agree AS DOUBLE) / CAST(st.n AS DOUBLE) - CAST(pesum AS DOUBLE) / (CAST(st.n AS DOUBLE) * CAST(st.n AS DOUBLE))) / " +
        "(1.0 - CAST(pesum AS DOUBLE) / (CAST(st.n AS DOUBLE) * CAST(st.n AS DOUBLE))), 4) END AS kappa " +
        "FROM st, pe"),

    "q134_label_noise" ->
      // same 5-NN build with scores; the majority vote replays with the
      // identical (count desc, label asc) argmax order
      (knnCosEdgeCte(5) +
        ", votes AS MATERIALIZED (SELECT e.src, l.label, count(*) AS c " +
        "FROM e JOIN embeddings l ON l.vec_id = e.dst GROUP BY e.src, l.label), " +
        "win AS (SELECT src, label AS predicted FROM (SELECT src, label, " +
        "row_number() OVER (PARTITION BY src ORDER BY c DESC, label) AS rn FROM votes) WHERE rn = 1) " +
        "SELECT o.vec_id, o.label, w.predicted, o.label <> w.predicted AS noisy " +
        "FROM embeddings o JOIN win w ON w.src = o.vec_id ORDER BY o.vec_id"),

    "q135_hard_negatives" ->
      // band filter on the same unrounded kNN cosines; 0.25/0.35 parse to
      // the identical doubles the Spark filter compares against
      (knnCosEdgeCte(5) +
        " SELECT src AS vec_id, dst AS neg_id, round(cos, 4) AS cos FROM e " +
        "WHERE cos >= 0.25 AND cos < 0.35 ORDER BY vec_id, neg_id"),

    "q133_perplexity_bands" ->
      // q115's bigram-LM CTEs verbatim (rounded ce), then quantile_cont
      // tercile cuts (== Spark percentile, q113 precedent) and the same
      // <= / > band comparisons; perdoc is MATERIALIZED because both the
      // cuts and the final projection read it
      ("WITH toks AS MATERIALIZED (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok, " +
        "generate_subscripts(regexp_split_to_array(lower(trim(text)), '\\s+'), 1) AS pos " +
        "FROM documents WHERE trim(text) <> ''), " +
        "bigrams AS MATERIALIZED (SELECT a.doc_id, a.tok AS w1, b.tok AS w2 " +
        "FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1), " +
        "bc AS MATERIALIZED (SELECT w1, w2, count(*) AS cb FROM bigrams GROUP BY w1, w2), " +
        "uc AS MATERIALIZED (SELECT w1, count(*) AS cu FROM bigrams GROUP BY w1), " +
        "perdoc AS MATERIALIZED (SELECT doc_id, " +
        "round(-avg(ln(CAST(cb AS DOUBLE) / cu)), 4) AS ce " +
        "FROM bigrams JOIN bc USING (w1, w2) JOIN uc USING (w1) GROUP BY doc_id), " +
        s"cuts AS MATERIALIZED (SELECT quantile_cont(ce, ${1.0 / 3}) AS c_lo, " +
        s"quantile_cont(ce, ${2.0 / 3}) AS c_hi FROM perdoc) " +
        "SELECT doc_id, ce AS cross_entropy, " +
        "CASE WHEN ce <= c_lo THEN 'head' WHEN ce > c_hi THEN 'tail' ELSE 'middle' END AS band " +
        "FROM perdoc CROSS JOIN cuts ORDER BY doc_id"),

    "q130_snapshot_diff" ->
      // same q15 normalized fingerprint on both sides of the full outer
      // join; the %5 re-render and the %7/%9 crawl gaps replay exactly
      ("WITH prev AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fa " +
        "FROM documents WHERE doc_id % 7 <> 0), " +
        "cur AS (SELECT doc_id, md5(regexp_replace(lower(trim(" +
        "CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END)), '\\s+', ' ', 'g')) AS fb " +
        "FROM documents WHERE doc_id % 9 <> 0) " +
        "SELECT doc_id, CASE WHEN fa IS NULL THEN 'added' WHEN fb IS NULL THEN 'removed' " +
        "WHEN fa <> fb THEN 'changed' ELSE 'unchanged' END AS status " +
        "FROM prev FULL JOIN cur USING (doc_id) ORDER BY doc_id"),

    "q131_mmr_select" ->
      (q131OracleSql),

    "q117_distribution_drift" ->
      // same md5 bucket hash, full-spine smoothing; the sums run over all
      // 1024 buckets on both engines (unseen buckets included), rounded
      // at 4 decimals
      ("WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok " +
        "FROM documents WHERE trim(text) <> ''), " +
        "bucketed AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) % 1024 AS b FROM toks), " +
        "a AS (SELECT b, count(*) AS ca FROM bucketed WHERE doc_id % 2 = 0 GROUP BY b), " +
        "bb AS (SELECT b, count(*) AS cb FROM bucketed WHERE doc_id % 2 = 1 GROUP BY b), " +
        "att AS (SELECT sum(ca) AS na FROM a), btt AS (SELECT sum(cb) AS nb FROM bb), " +
        "spine AS (SELECT range AS b FROM range(1024)), " +
        "probs AS (SELECT (COALESCE(ca, 0) + 1.0) / (na + 1024) AS pa, " +
        "(COALESCE(cb, 0) + 1.0) / (nb + 1024) AS pb, na, nb " +
        "FROM spine LEFT JOIN a USING (b) LEFT JOIN bb USING (b), att, btt) " +
        "SELECT CAST(max(na) AS BIGINT) AS n_tokens_a, CAST(max(nb) AS BIGINT) AS n_tokens_b, " +
        "round(sum(pa * ln(pa / pb)), 4) AS kl_ab, " +
        "round(sum(pb * ln(pb / pa)), 4) AS kl_ba, " +
        "round(sum(pa * ln(pa / ((pa + pb) / 2))) / 2 + sum(pb * ln(pb / ((pa + pb) / 2))) / 2, 4) AS js " +
        "FROM probs"),

    "q211_psi" ->
      // q117's bucket/smoothing machinery, the PSI sum, band from the
      // rounded value
      ("WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok " +
        "FROM documents WHERE trim(text) <> ''), " +
        "bucketed AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) % 1024 AS b FROM toks), " +
        "a AS (SELECT b, count(*) AS ca FROM bucketed WHERE doc_id % 2 = 0 GROUP BY b), " +
        "bb AS (SELECT b, count(*) AS cb FROM bucketed WHERE doc_id % 2 = 1 GROUP BY b), " +
        "att AS (SELECT sum(ca) AS na FROM a), btt AS (SELECT sum(cb) AS nb FROM bb), " +
        "spine AS (SELECT range AS b FROM range(1024)), " +
        "probs AS (SELECT (COALESCE(ca, 0) + 1.0) / (na + 1024) AS pa, " +
        "(COALESCE(cb, 0) + 1.0) / (nb + 1024) AS pb, na, nb " +
        "FROM spine LEFT JOIN a USING (b) LEFT JOIN bb USING (b), att, btt), " +
        "s AS (SELECT CAST(max(na) AS BIGINT) AS n_tokens_a, CAST(max(nb) AS BIGINT) AS n_tokens_b, " +
        "round(sum((pa - pb) * ln(pa / pb)), 4) AS psi FROM probs) " +
        "SELECT n_tokens_a, n_tokens_b, psi, " +
        "CASE WHEN psi < 0.1 THEN 'stable' WHEN psi < 0.25 THEN 'moderate' ELSE 'major' END AS band FROM s"),

    "q212_drift_attribution" ->
      // same bucket draw with the token kept; one grouped agg carries both
      // sides' masses and the min-token sample; HUGEINT integral ppm
      // rates; top-20 by the identically-associated double term
      ("WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok " +
        "FROM documents WHERE trim(text) <> ''), " +
        "bucketed AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) % 1024 AS b, tok FROM toks), " +
        "counts AS (SELECT b, sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS ca, " +
        "sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS cb, min(tok) AS sample_tok " +
        "FROM bucketed GROUP BY b), " +
        "t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM counts), " +
        "spine AS (SELECT range AS b FROM range(1024)), " +
        "x AS (SELECT b, COALESCE(ca, 0) AS n_a, COALESCE(cb, 0) AS n_b, sample_tok, na, nb, " +
        "((COALESCE(ca, 0) + 1.0) / (na + 1024) - (COALESCE(cb, 0) + 1.0) / (nb + 1024)) * " +
        "ln(((COALESCE(ca, 0) + 1.0) / (na + 1024)) / ((COALESCE(cb, 0) + 1.0) / (nb + 1024))) AS term " +
        "FROM spine LEFT JOIN counts USING (b), t) " +
        "SELECT CAST(b AS BIGINT) AS bucket, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, sample_tok, " +
        "CAST(CAST(n_a AS HUGEINT) * 1000000 // CAST(na AS HUGEINT) AS BIGINT) AS rate_a_ppm, " +
        "CAST(CAST(n_b AS HUGEINT) * 1000000 // CAST(nb AS HUGEINT) AS BIGINT) AS rate_b_ppm, " +
        "CAST(floor(term * 1000000 + 0.5) AS BIGINT) AS psi_term_ppm " +
        "FROM x ORDER BY term DESC, b LIMIT 20"),

    "q118_contamination_provenance" ->
      // q89's exact shingle construction, kept at pair granularity
      ("WITH sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> ''), " +
        "tg AS (SELECT doc_id AS train_id, unnest(sh) AS g FROM sh WHERE doc_id % 50 <> 0), " +
        "eg AS (SELECT doc_id AS eval_id, unnest(sh) AS g FROM sh WHERE doc_id % 50 = 0) " +
        "SELECT train_id, eval_id, count(*) AS n_shared_grams " +
        "FROM tg JOIN eg USING (g) GROUP BY 1, 2 ORDER BY train_id, eval_id"),

    "q106_interval_overlap" ->
      // nested-loop overlap ground truth, same day arithmetic
      ("WITH a AS (SELECT o_orderkey AS window_id, " +
        "date_diff('day', DATE '1970-01-01', o_orderdate) AS a_s, " +
        "date_diff('day', DATE '1970-01-01', o_orderdate) + 14 AS a_e " +
        "FROM orders WHERE o_orderkey % 200 = 0), " +
        "b AS (SELECT l_orderkey AS ship_key, " +
        "date_diff('day', DATE '1970-01-01', l_shipdate) AS b_s, " +
        "date_diff('day', DATE '1970-01-01', l_shipdate) + (l_linenumber % 5) * 7 AS b_e " +
        "FROM lineitem WHERE l_orderkey % 150 = 0) " +
        "SELECT window_id, count(*) AS n_overlaps, min(ship_key) AS first_ship_key " +
        "FROM a JOIN b ON a_s <= b_e AND b_s <= a_e " +
        "GROUP BY window_id ORDER BY window_id"),

    "q105_curation_pipeline" ->
      // q82's gate thresholds (unrounded values drive the comparisons) ->
      // q15/q104's md5 fingerprint dedup -> q89's shingle decontamination,
      // chained over the train split exactly as the Spark plan composes
      ("WITH gated AS (SELECT doc_id, text, lang, source, ntok FROM (" +
        "SELECT doc_id, text, lang, source, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ntok, " +
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
        "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha, " +
        "(SELECT CASE WHEN nt - 1 <= 0 THEN 0.0 ELSE 1.0 - nbg / (nt - 1.0) END FROM (" +
        "SELECT CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nt, " +
        "(SELECT CASE WHEN trim(text) = '' THEN 0 WHEN len(toks) < 2 THEN 1 " +
        "ELSE len(list_distinct(list_transform(range(len(toks)-1), i -> toks[i+1] || ' ' || toks[i+2]))) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) AS nbg)) AS rep " +
        "FROM documents WHERE doc_id % 50 <> 0) " +
        "WHERE ntok >= 15 AND alpha >= 0.81 AND rep <= 0.05), " +
        "ded AS (SELECT min(doc_id) AS doc_id FROM (" +
        "SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp FROM gated) GROUP BY fp), " +
        "dd AS (SELECT g.* FROM gated g JOIN ded USING (doc_id)), " +
        "evsh AS (SELECT DISTINCT g FROM (SELECT unnest((" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks))) AS g " +
        "FROM documents WHERE doc_id % 50 = 0 AND trim(text) <> '')), " +
        "cont AS (SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest((" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks))) AS g FROM dd) t " +
        "JOIN evsh USING (g)) " +
        "SELECT doc_id, lang, source, CAST(ntok AS BIGINT) AS n_tokens " +
        "FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM cont) ORDER BY doc_id"),

    // ---- streaming-monitor replay oracles (r17 VERDICT item 4): each
    // replays the ENTIRE replay composition in SQL — the 7-day
    // calibration split, the reference fit, per-day state windows, the
    // cumulative blend, and the monitor's emit-time arithmetic spelled
    // term-for-term (every emitted day = every day but each source's
    // last, the close-on-rollover contract) ----

    "q302_ph_replay" ->
      // Page-Hinkley on daily counts: mu integral (floor of the
      // calibration week's per-(day,type) mean), delta=1, lambda=100 —
      // every PH sum is an exact integer-valued double, so the window
      // cumulative is association-free
      ("WITH ev AS (SELECT event_type AS source, epoch_ms(ts) // 86400000 AS d " +
        "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL), " +
        "c AS (SELECT min(d) + 7 AS cutd FROM ev), " +
        "fit AS (SELECT floor(CAST(count(*) AS DOUBLE) / (7.0 * count(DISTINCT source))) AS mu FROM ev, c WHERE d < cutd), " +
        "daily AS (SELECT source, d, count(*) AS n FROM ev, c WHERE d >= cutd GROUP BY 1, 2), " +
        "seq AS (SELECT source, d, n, " +
        "sum(n - mu - 1) OVER (PARTITION BY source ORDER BY d) AS m_up, " +
        "sum(mu - n - 1) OVER (PARTITION BY source ORDER BY d) AS m_dn, " +
        "max(d) OVER (PARTITION BY source) AS maxd FROM daily, fit), " +
        "ph AS (SELECT source, d, n, maxd, " +
        "m_up - least(0, min(m_up) OVER (PARTITION BY source ORDER BY d)) AS pu, " +
        "m_dn - least(0, min(m_dn) OVER (PARTITION BY source ORDER BY d)) AS pd FROM seq) " +
        "SELECT source AS event_type, CAST(d AS BIGINT) AS day, CAST(n AS BIGINT) AS n, " +
        "CAST(pu AS DOUBLE) AS ph_up, CAST(pd AS DOUBLE) AS ph_down, " +
        "(pu > 100.0 OR pd > 100.0) AS alarm " +
        "FROM ph WHERE d < maxd ORDER BY event_type, day"),

    "q303_spread_replay" ->
      // variance-ratio on integral values (floor(value+0.5)): reference
      // moments from the calibration week, daily windows, the monitor's
      // exact c2 = n*S2 - S1^2 numerators (all < 2^53 — exact doubles)
      ("WITH ev AS (SELECT event_type AS source, epoch_ms(ts) // 86400000 AS d, " +
        "CAST(floor(value + 0.5) AS BIGINT) AS v " +
        "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL), " +
        "c AS (SELECT min(d) + 7 AS cutd FROM ev), " +
        "fit AS (SELECT CAST(count(*) AS BIGINT) AS rn, CAST(sum(v) AS BIGINT) AS rs1, " +
        "CAST(sum(v*v) AS BIGINT) AS rs2 FROM ev, c WHERE d < cutd), " +
        "win AS (SELECT source, d, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s1, " +
        "CAST(sum(v*v) AS BIGINT) AS s2 FROM ev, c WHERE d >= cutd GROUP BY 1, 2), " +
        "cum AS (SELECT source, d, n, s1, s2, " +
        "CAST(sum(n) OVER w AS BIGINT) AS cn, CAST(sum(s1) OVER w AS BIGINT) AS cs1, " +
        "CAST(sum(s2) OVER w AS BIGINT) AS cs2, max(d) OVER (PARTITION BY source) AS maxd " +
        "FROM win WINDOW w AS (PARTITION BY source ORDER BY d)), " +
        "r AS (SELECT source, d, n, cn, maxd, " +
        "floor(CAST(n*s2 - s1*s1 AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) / vref * 10000 + 0.5) / 10000 AS vr, " +
        "floor(CAST(cn*cs2 - cs1*cs1 AS DOUBLE) / (CAST(cn AS DOUBLE) * (CAST(cn AS DOUBLE) - 1)) / vref * 10000 + 0.5) / 10000 AS cvr " +
        "FROM cum, (SELECT CAST(rn*rs2 - rs1*rs1 AS DOUBLE) / (CAST(rn AS DOUBLE) * (CAST(rn AS DOUBLE) - 1)) AS vref FROM fit)) " +
        "SELECT source, CAST(d * 86400000 AS BIGINT) AS window_start, CAST(n AS BIGINT) AS n_events, " +
        "CAST(vr AS DOUBLE) AS var_ratio, CAST(cvr AS DOUBLE) AS cum_var_ratio, " +
        "(vr > 4.0 OR vr * 4.0 < 1.0) AS alarm " +
        "FROM r WHERE d < maxd AND n >= 2 AND cn >= 2 ORDER BY source, window_start"),

    "q304_kuiper_replay" ->
      // Kuiper V on the literal 7-bin plan: reference histogram from the
      // calibration week, signed integer cross-masses at every bin
      // boundary, both one-sided maxes clamped at zero, ONE division
      (replayHistCte +
        "stat AS (SELECT source, d, wn, cn, maxd, nref, greatest(0, max(cref * wn - wcum * nref)) + " +
        "greatest(0, max(wcum * nref - cref * wn)) AS vnum, greatest(0, max(cref * cn - ccum * " +
        "nref)) + greatest(0, max(ccum * nref - cref * cn)) AS cnum FROM bd JOIN refc USING (b), " +
        "reft GROUP BY source, d, wn, cn, maxd, nref), disp AS (SELECT source, d, wn, maxd, " +
        "floor(CAST(vnum AS DOUBLE) / (CAST(nref AS DOUBLE) * CAST(wn AS DOUBLE)) * 10000 + 0.5) / " +
        "10000 AS v, floor(CAST(cnum AS DOUBLE) / (CAST(nref AS DOUBLE) * CAST(cn AS DOUBLE)) * " +
        "10000 + 0.5) / 10000 AS cv FROM stat) SELECT source, CAST(d * 86400000 AS BIGINT) AS " +
        "window_start, CAST(wn AS BIGINT) AS n_events, CAST(v AS DOUBLE) AS kuiper_v, CAST(cv AS " +
        "DOUBLE) AS cum_kuiper_v, (v > 0.2) AS alarm FROM disp WHERE d < maxd ORDER BY source, " +
        "window_start"),
    "q305_cvm_replay" ->
      // CvM on the same bin plan: per-bin floor(h*gap^2*2^30) LONG grains
      // summed per window (the batch operator's order-free-integer
      // discipline), one final scale, basis-point display
      (replayHistCte +
        "g AS (SELECT source, d, b, cnt, cumb, wn, cn, maxd, nref, rc, CAST(abs(cref * wn - wcum * " +
        "nref) AS DOUBLE) / (CAST(nref AS DOUBLE) * CAST(wn AS DOUBLE)) AS gapw, CAST(abs(cref * cn " +
        "- ccum * nref) AS DOUBLE) / (CAST(nref AS DOUBLE) * CAST(cn AS DOUBLE)) AS gapc FROM bd " +
        "JOIN refc USING (b) JOIN refh USING (b), reft), s AS (SELECT source, d, wn, cn, maxd, nref, " +
        "CAST(sum(CAST(floor(CAST(rc + cnt AS DOUBLE) * gapw * gapw * 1073741824.0) AS BIGINT)) AS " +
        "BIGINT) AS sw, CAST(sum(CAST(floor(CAST(rc + cumb AS DOUBLE) * gapc * gapc * 1073741824.0) " +
        "AS BIGINT)) AS BIGINT) AS sc FROM g GROUP BY source, d, wn, cn, maxd, nref), disp AS " +
        "(SELECT source, d, wn, maxd, CAST(floor(CAST(sw AS DOUBLE) / 1073741824.0 * (CAST(nref AS " +
        "DOUBLE) * CAST(wn AS DOUBLE)) / ((CAST(nref AS DOUBLE) + CAST(wn AS DOUBLE)) * (CAST(nref " +
        "AS DOUBLE) + CAST(wn AS DOUBLE))) * 10000 + 0.5) AS BIGINT) AS bp, CAST(floor(CAST(sc AS " +
        "DOUBLE) / 1073741824.0 * (CAST(nref AS DOUBLE) * CAST(cn AS DOUBLE)) / ((CAST(nref AS " +
        "DOUBLE) + CAST(cn AS DOUBLE)) * (CAST(nref AS DOUBLE) + CAST(cn AS DOUBLE))) * 10000 + 0.5) " +
        "AS BIGINT) AS cbp FROM s) SELECT source, CAST(d * 86400000 AS BIGINT) AS window_start, " +
        "CAST(wn AS BIGINT) AS n_events, bp AS cvm_bp, cbp AS cum_cvm_bp, (bp > 500) AS alarm FROM " +
        "disp WHERE d < maxd ORDER BY source, window_start"),
    "q306_ks_replay" ->
      // KS on the shared bin plan: the single max abs cross-mass at any
      // bin boundary (Kuiper's two clamped one-sided maxes collapse to
      // one), ONE division, floor-1e4 display
      (replayHistCte +
        "stat AS (SELECT source, d, wn, cn, maxd, nref, max(abs(cref * wn - wcum * nref)) AS dnum, " +
        "max(abs(cref * cn - ccum * nref)) AS cnum FROM bd JOIN refc USING (b), reft GROUP BY " +
        "source, d, wn, cn, maxd, nref), disp AS (SELECT source, d, wn, maxd, floor(CAST(dnum AS " +
        "DOUBLE) / (CAST(nref AS DOUBLE) * CAST(wn AS DOUBLE)) * 10000 + 0.5) / 10000 AS ks, " +
        "floor(CAST(cnum AS DOUBLE) / (CAST(nref AS DOUBLE) * CAST(cn AS DOUBLE)) * 10000 + 0.5) / " +
        "10000 AS cks FROM stat) SELECT source, CAST(d * 86400000 AS BIGINT) AS window_start, " +
        "CAST(wn AS BIGINT) AS n_events, CAST(ks AS DOUBLE) AS ks_d, CAST(cks AS DOUBLE) AS " +
        "cum_ks_d, (ks > 0.15) AS alarm FROM disp WHERE d < maxd ORDER BY source, window_start"),
    "q307_w1_replay" ->
      // W1 on the shared bin plan: cross-mass gaps at MASS bin
      // boundaries weighted by bin-index distance, folded as the
      // monitor's exact floor(term*2^20) integer grains per window —
      // the window and cumulative legs walk their OWN mass axes
      (replayHistCte +
        "jb AS (SELECT bd.*, refc.cref, refh.rc, reft.nref FROM bd JOIN refc USING (b) JOIN refh " +
        "USING (b), reft), gw AS (SELECT source, d, b, wn, maxd, nref, abs(cref * wn - wcum * nref) " +
        "AS num, lag(abs(cref * wn - wcum * nref)) OVER (PARTITION BY source, d ORDER BY b) AS lnum, " +
        "lag(b) OVER (PARTITION BY source, d ORDER BY b) AS lb FROM jb WHERE rc + cnt > 0), tw AS " +
        "(SELECT source, d, wn, maxd, nref, CAST(sum(CASE WHEN lb IS NULL THEN 0 ELSE " +
        "CAST(floor(CAST(lnum AS DOUBLE) * (b - lb) / (CAST(nref AS DOUBLE) * CAST(wn AS DOUBLE)) * " +
        "1048576.0) AS BIGINT) END) AS BIGINT) AS s2 FROM gw GROUP BY source, d, wn, maxd, nref), gc " +
        "AS (SELECT source, d, b, cn, abs(cref * cn - ccum * nref) AS num, lag(abs(cref * cn - ccum " +
        "* nref)) OVER (PARTITION BY source, d ORDER BY b) AS lnum, lag(b) OVER (PARTITION BY " +
        "source, d ORDER BY b) AS lb FROM jb WHERE rc + cumb > 0), tc AS (SELECT source, d, cn, " +
        "CAST(sum(CASE WHEN lb IS NULL THEN 0 ELSE CAST(floor(CAST(lnum AS DOUBLE) * (b - lb) / " +
        "(CAST(nref AS DOUBLE) * CAST(cn AS DOUBLE)) * 1048576.0) AS BIGINT) END) AS BIGINT) AS s2 " +
        "FROM gc, reft GROUP BY source, d, cn), disp AS (SELECT tw.source, tw.d, tw.wn, tw.maxd, " +
        "floor(CAST(tw.s2 AS DOUBLE) / 1048576.0 * 10000 + 0.5) / 10000 AS w1, floor(CAST(tc.s2 AS " +
        "DOUBLE) / 1048576.0 * 10000 + 0.5) / 10000 AS cw1 FROM tw JOIN tc ON tw.source = tc.source " +
        "AND tw.d = tc.d) SELECT source, CAST(d * 86400000 AS BIGINT) AS window_start, CAST(wn AS " +
        "BIGINT) AS n_events, CAST(w1 AS DOUBLE) AS w1, CAST(cw1 AS DOUBLE) AS cum_w1, (w1 > 1.0) AS " +
        "alarm FROM disp WHERE d < maxd ORDER BY source, window_start"),
    "q308_cusum_replay" ->
      // CUSUM daily counts: the same prefix-sum/running-min identity as
      // q302 (S+ = m - min(0, running min m)) at slack 2 / threshold 50
      // — mu integral, so every sum is an exact integer-valued double
      ("WITH ev AS (SELECT event_type, epoch_ms(ts) // 86400000 AS d " +
        "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL), " +
        "c AS (SELECT min(d) + 7 AS cutd FROM ev), " +
        "fit AS (SELECT floor(CAST(count(*) AS DOUBLE) / (7.0 * count(DISTINCT event_type))) AS mu FROM ev, c WHERE d < cutd), " +
        "daily AS (SELECT event_type, d, count(*) AS n FROM ev, c WHERE d >= cutd GROUP BY 1, 2), " +
        "seq AS (SELECT event_type, d, n, " +
        "sum(n - mu - 2) OVER (PARTITION BY event_type ORDER BY d) AS m_up, " +
        "sum(mu - n - 2) OVER (PARTITION BY event_type ORDER BY d) AS m_dn, " +
        "max(d) OVER (PARTITION BY event_type) AS maxd FROM daily, fit), " +
        "cs AS (SELECT event_type, d, n, maxd, " +
        "m_up - least(0, min(m_up) OVER (PARTITION BY event_type ORDER BY d)) AS su, " +
        "m_dn - least(0, min(m_dn) OVER (PARTITION BY event_type ORDER BY d)) AS sd FROM seq) " +
        "SELECT event_type, CAST(d AS BIGINT) AS day, CAST(n AS BIGINT) AS n, " +
        "CAST(su AS DOUBLE) AS s_up, CAST(sd AS DOUBLE) AS s_down, " +
        "(su > 50.0 OR sd > 50.0) AS alarm " +
        "FROM cs WHERE d < maxd ORDER BY event_type, day"),

    "q309_conformal_replay" ->
      // conformal coverage: the |y - (10 + 2x)| <= 60 hit predicate is
      // bit-identical on both engines (2x and 10 + 2x are exact), the
      // coverage a raw IEEE division; alarm bound written as the SAME
      // 0.8 - 0.05 subtraction the monitor computes
      ("WITH ev AS (SELECT event_type AS source, epoch_ms(ts) // 86400000 AS d, " +
        "CAST(user_id % 97 AS DOUBLE) AS x, value AS y " +
        "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL), " +
        "c AS (SELECT min(d) + 7 AS cutd FROM ev), " +
        "m AS (SELECT source, d, count(*) AS n, " +
        "sum(CASE WHEN abs(y - (10.0 + 2.0 * x)) <= 60.0 THEN 1 ELSE 0 END) AS cov " +
        "FROM ev, c WHERE d >= cutd GROUP BY 1, 2), " +
        "w AS (SELECT source, d, n, cov, " +
        "CAST(sum(n) OVER pw AS BIGINT) AS cn, CAST(sum(cov) OVER pw AS BIGINT) AS ccov, " +
        "max(d) OVER (PARTITION BY source) AS maxd FROM m " +
        "WINDOW pw AS (PARTITION BY source ORDER BY d)) " +
        "SELECT source, CAST(d * 86400000 AS BIGINT) AS window_start, " +
        "CAST(n AS BIGINT) AS n_eval, CAST(cov AS BIGINT) AS covered, " +
        "CAST(cov AS DOUBLE) / CAST(n AS DOUBLE) AS coverage, " +
        "CAST(ccov AS DOUBLE) / CAST(cn AS DOUBLE) AS cum_coverage, " +
        "(CAST(cov AS DOUBLE) / CAST(n AS DOUBLE) < (0.8 - 0.05)) AS alarm " +
        "FROM w WHERE d < maxd ORDER BY source, window_start"),

    "q310_precision_replay" ->
      // precision/recall/F1 at threshold bin 1 of 10 over the clamped
      // rational floor(value)/200: confusion cells are integer counts,
      // bp displays the floor-form chain, NULL when a denominator is 0
      ("WITH ev AS (SELECT event_type AS source, epoch_ms(ts) // 86400000 AS d, " +
        "greatest(0, least(CAST(floor(value) AS BIGINT), 200)) AS n0, " +
        "(user_id % 3 = 0) AS label " +
        "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL), " +
        "c AS (SELECT min(d) + 7 AS cutd FROM ev), " +
        "m AS (SELECT source, d, count(*) AS n, " +
        "sum(CASE WHEN least(9, n0 * 10 // 200) >= 1 AND label THEN 1 ELSE 0 END) AS tp, " +
        "sum(CASE WHEN least(9, n0 * 10 // 200) >= 1 AND NOT label THEN 1 ELSE 0 END) AS fp, " +
        "sum(CASE WHEN least(9, n0 * 10 // 200) < 1 AND label THEN 1 ELSE 0 END) AS fn " +
        "FROM ev, c WHERE d >= cutd GROUP BY 1, 2), " +
        "w AS (SELECT source, d, n, tp, fp, fn, " +
        "max(d) OVER (PARTITION BY source) AS maxd FROM m), " +
        "disp AS (SELECT source, d, n, tp, fp, fn, maxd, " +
        "CASE WHEN tp + fp > 0 THEN CAST(floor(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS pbp, " +
        "CASE WHEN tp + fn > 0 THEN CAST(floor(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS rbp, " +
        "CASE WHEN 2 * tp + fp + fn > 0 THEN CAST(floor(CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS fbp " +
        "FROM w) " +
        "SELECT source, CAST(d * 86400000 AS BIGINT) AS window_start, " +
        "CAST(n AS BIGINT) AS n_events, CAST(tp AS BIGINT) AS tp, " +
        "CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn, " +
        "pbp AS precision_bp, rbp AS recall_bp, fbp AS f1_bp, " +
        "((pbp IS NOT NULL AND pbp < 5000) OR (rbp IS NOT NULL AND rbp < 5000)) AS alarm " +
        "FROM disp WHERE d < maxd ORDER BY source, window_start"),

    "q311_auc_replay" ->
      // binned rank AUC on 10 bins over [0, 250): the rank numerator is
      // the exact half-integer sum doubled into one BIGINT
      // (pos_b·(2·negBelow + neg_b)), halved back in DOUBLE (exact),
      // one division, floor-form display; single-class windows read NaN
      // on both engines and never alarm
      ("WITH ev AS (SELECT event_type AS source, epoch_ms(ts) // 86400000 AS d, " +
        "least(9, greatest(0, CAST(floor(value / 25.0) AS BIGINT))) AS b, " +
        "(user_id % 3 = 0) AS label " +
        "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL), " +
        "c AS (SELECT min(d) + 7 AS cutd FROM ev), " +
        "bins AS (SELECT CAST(range AS BIGINT) AS b FROM range(10)), " +
        "sd AS (SELECT DISTINCT source, d FROM ev, c WHERE d >= cutd), " +
        "cnts AS (SELECT source, d, b, " +
        "sum(CASE WHEN label THEN 1 ELSE 0 END) AS pos, " +
        "sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS neg " +
        "FROM ev, c WHERE d >= cutd GROUP BY 1, 2, 3), " +
        "cell AS (SELECT sd.source, sd.d, bins.b, coalesce(cnts.pos, 0) AS pos, coalesce(cnts.neg, 0) AS neg " +
        "FROM sd CROSS JOIN bins LEFT JOIN cnts ON sd.source = cnts.source AND sd.d = cnts.d AND bins.b = cnts.b), " +
        "cc AS (SELECT source, d, b, pos, neg, " +
        "CAST(sum(pos) OVER pb AS BIGINT) AS cpos, CAST(sum(neg) OVER pb AS BIGINT) AS cneg " +
        "FROM cell WINDOW pb AS (PARTITION BY source, b ORDER BY d)), " +
        "bd AS (SELECT source, d, b, pos, neg, cpos, cneg, " +
        "coalesce(CAST(sum(neg) OVER (PARTITION BY source, d ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS negbelow, " +
        "coalesce(CAST(sum(cneg) OVER (PARTITION BY source, d ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cnegbelow, " +
        "max(d) OVER (PARTITION BY source) AS maxd FROM cc), " +
        "s AS (SELECT source, d, maxd, " +
        "CAST(sum(pos) AS BIGINT) AS p, CAST(sum(neg) AS BIGINT) AS n, " +
        "CAST(sum(pos * (2 * negbelow + neg)) AS BIGINT) AS num2, " +
        "CAST(sum(cpos) AS BIGINT) AS cp, CAST(sum(cneg) AS BIGINT) AS cn, " +
        "CAST(sum(cpos * (2 * cnegbelow + cneg)) AS BIGINT) AS cnum2 " +
        "FROM bd GROUP BY source, d, maxd), " +
        "disp AS (SELECT source, d, p, n, maxd, " +
        "CASE WHEN p > 0 AND n > 0 THEN floor(CAST(num2 AS DOUBLE) / 2.0 / (CAST(p AS DOUBLE) * CAST(n AS DOUBLE)) * 10000 + 0.5) / 10000 " +
        "ELSE CAST('nan' AS DOUBLE) END AS auc, " +
        "CASE WHEN cp > 0 AND cn > 0 THEN floor(CAST(cnum2 AS DOUBLE) / 2.0 / (CAST(cp AS DOUBLE) * CAST(cn AS DOUBLE)) * 10000 + 0.5) / 10000 " +
        "ELSE CAST('nan' AS DOUBLE) END AS cauc FROM s) " +
        "SELECT source, CAST(d * 86400000 AS BIGINT) AS window_start, " +
        "CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg, " +
        "CAST(auc AS DOUBLE) AS auc, CAST(cauc AS DOUBLE) AS cum_auc, " +
        "(NOT isnan(auc) AND auc < 0.6) AS alarm " +
        "FROM disp WHERE d < maxd ORDER BY source, window_start"),

    "q312_calibration_replay" ->
      // ECE/Brier over the clamped rational floor(value)/200, 10 bins:
      // per-row (bin, score, Brier) terms are exact 2^20 integer grains,
      // the ECE fold replays q210's sorted-bin list_reduce chain per
      // (source, window) on both the window and cumulative ledgers
      ("WITH ev AS (SELECT event_type AS source, epoch_ms(ts) // 86400000 AS d, greatest(0, " +
        "least(CAST(floor(value) AS BIGINT), 200)) AS n0, (user_id % 2 = 0) AS label FROM events " +
        "WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL AND user_id IS NOT " +
        "NULL), c AS (SELECT min(d) + 7 AS cutd FROM ev), rows_ AS (SELECT source, d, least(9, n0 * " +
        "10 // 200) AS b, n0 * 1048576 // 200 AS s20, (n0 - CASE WHEN label THEN 200 ELSE 0 END) * " +
        "(n0 - CASE WHEN label THEN 200 ELSE 0 END) * 1048576 // 40000 AS b20, CASE WHEN label THEN " +
        "1 ELSE 0 END AS pos FROM ev, c WHERE d >= cutd), bins AS (SELECT CAST(range AS BIGINT) AS b " +
        "FROM range(10)), sd AS (SELECT DISTINCT source, d FROM rows_), cnts AS (SELECT source, d, " +
        "b, count(*) AS n, sum(pos) AS np, sum(s20) AS ssum, sum(b20) AS bsum FROM rows_ GROUP BY 1, " +
        "2, 3), cell AS (SELECT sd.source, sd.d, bins.b, coalesce(cnts.n, 0) AS n, coalesce(cnts.np, " +
        "0) AS np, coalesce(cnts.ssum, 0) AS ssum, coalesce(cnts.bsum, 0) AS bsum FROM sd CROSS JOIN " +
        "bins LEFT JOIN cnts ON sd.source = cnts.source AND sd.d = cnts.d AND bins.b = cnts.b), cc " +
        "AS (SELECT source, d, b, n, np, ssum, bsum, CAST(sum(n) OVER pb AS BIGINT) AS cn, " +
        "CAST(sum(np) OVER pb AS BIGINT) AS cnp, CAST(sum(ssum) OVER pb AS BIGINT) AS cssum FROM " +
        "cell WINDOW pb AS (PARTITION BY source, b ORDER BY d)), o AS (SELECT source, d, " +
        "list(struct_pack(b := b, n := n, np := np, s := ssum) ORDER BY b) FILTER (WHERE n > 0) AS " +
        "bs, list(struct_pack(b := b, n := cn, np := cnp, s := cssum) ORDER BY b) FILTER (WHERE cn > " +
        "0) AS cbs, CAST(sum(n) AS BIGINT) AS tot, CAST(sum(np) AS BIGINT) AS npos, CAST(sum(bsum) " +
        "AS BIGINT) AS btot, CAST(sum(cn) AS BIGINT) AS ctot FROM cc GROUP BY source, d), w AS " +
        "(SELECT source, d, tot, npos, btot, ctot, bs, cbs, max(d) OVER (PARTITION BY source) AS " +
        "maxd FROM o), disp AS (SELECT source, d, tot, npos, btot, maxd, " +
        "CAST(floor(list_reduce(list_prepend(0.0, list_transform(bs, e -> CAST((e).n AS DOUBLE) / " +
        "CAST(tot AS DOUBLE) * abs(CAST((e).s AS DOUBLE) / (CAST((e).n AS DOUBLE) * 1048576.0) - " +
        "CAST((e).np AS DOUBLE) / CAST((e).n AS DOUBLE)))), (x, y) -> x + y) * 10000 + 0.5) AS " +
        "BIGINT) AS ece, CAST(floor(list_reduce(list_prepend(0.0, list_transform(cbs, e -> " +
        "CAST((e).n AS DOUBLE) / CAST(ctot AS DOUBLE) * abs(CAST((e).s AS DOUBLE) / (CAST((e).n AS " +
        "DOUBLE) * 1048576.0) - CAST((e).np AS DOUBLE) / CAST((e).n AS DOUBLE)))), (x, y) -> x + y) " +
        "* 10000 + 0.5) AS BIGINT) AS cece FROM w) SELECT source, CAST(d * 86400000 AS BIGINT) AS " +
        "window_start, tot AS n, npos AS n_pos, ece AS ece_bp, CAST(floor(CAST(btot AS DOUBLE) / " +
        "(CAST(tot AS DOUBLE) * 1048576.0) * 10000 + 0.5) AS BIGINT) AS brier_bp, cece AS " +
        "cum_ece_bp, (ece >= 1000) AS alarm FROM disp WHERE d < maxd ORDER BY source, window_start"),
    "q313_psi_replay" ->
      // add-1-smoothed PSI on the shared 7-bin plan, sorted-bin fold via
      // the q210 list_reduce idiom over ALL bins (smoothing gives zero
      // bins mass), display round(s, 4) — the q220 HALF_UP pairing
      ("WITH ev AS (SELECT event_type AS source, epoch_ms(ts) // 86400000 AS d, " +
        "(CASE WHEN value >= 5 THEN 1 ELSE 0 END + CASE WHEN value >= 10 THEN 1 ELSE 0 END + " +
        "CASE WHEN value >= 20 THEN 1 ELSE 0 END + CASE WHEN value >= 50 THEN 1 ELSE 0 END + " +
        "CASE WHEN value >= 100 THEN 1 ELSE 0 END + CASE WHEN value >= 200 THEN 1 ELSE 0 END) AS b " +
        "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL), " +
        "c AS (SELECT min(d) + 7 AS cutd FROM ev), " +
        "bins AS (SELECT CAST(range AS BIGINT) AS b FROM range(7)), " +
        "refh AS (SELECT bins.b, coalesce(rc.cnt, 0) AS rc FROM bins LEFT JOIN " +
        "(SELECT b, count(*) AS cnt FROM ev, c WHERE d < cutd GROUP BY 1) rc ON bins.b = rc.b), " +
        "reft AS (SELECT CAST(sum(rc) AS BIGINT) AS nref FROM refh), " +
        "sd AS (SELECT DISTINCT source, d FROM ev, c WHERE d >= cutd), " +
        "cnts AS (SELECT source, d, b, count(*) AS cnt FROM ev, c WHERE d >= cutd GROUP BY 1, 2, 3), " +
        "cell AS (SELECT sd.source, sd.d, bins.b, coalesce(cnts.cnt, 0) AS cnt " +
        "FROM sd CROSS JOIN bins LEFT JOIN cnts ON sd.source = cnts.source AND sd.d = cnts.d AND bins.b = cnts.b), " +
        "cc AS (SELECT source, d, b, cnt, " +
        "CAST(sum(cnt) OVER (PARTITION BY source, b ORDER BY d) AS BIGINT) AS cumb FROM cell), " +
        "o AS (SELECT cc.source, cc.d, " +
        "list(struct_pack(b := cc.b, cnt := cc.cnt, cum := cc.cumb, rc := refh.rc) ORDER BY cc.b) AS bs, " +
        "CAST(sum(cc.cnt) AS BIGINT) AS wn, CAST(sum(cc.cumb) AS BIGINT) AS cn " +
        "FROM cc JOIN refh ON cc.b = refh.b GROUP BY cc.source, cc.d), " +
        "w AS (SELECT source, d, wn, cn, bs, max(d) OVER (PARTITION BY source) AS maxd, nref FROM o, reft), " +
        "disp AS (SELECT source, d, wn, maxd, " +
        "round(list_reduce(list_prepend(0.0, list_transform(bs, e -> " +
        "((CAST((e).rc AS DOUBLE) + 1.0) / (CAST(nref AS DOUBLE) + 7) - (CAST((e).cnt AS DOUBLE) + 1.0) / (CAST(wn AS DOUBLE) + 7)) * " +
        "ln(((CAST((e).rc AS DOUBLE) + 1.0) / (CAST(nref AS DOUBLE) + 7)) / ((CAST((e).cnt AS DOUBLE) + 1.0) / (CAST(wn AS DOUBLE) + 7))))), " +
        "(x, y) -> x + y), 4) AS psi, " +
        "round(list_reduce(list_prepend(0.0, list_transform(bs, e -> " +
        "((CAST((e).rc AS DOUBLE) + 1.0) / (CAST(nref AS DOUBLE) + 7) - (CAST((e).cum AS DOUBLE) + 1.0) / (CAST(cn AS DOUBLE) + 7)) * " +
        "ln(((CAST((e).rc AS DOUBLE) + 1.0) / (CAST(nref AS DOUBLE) + 7)) / ((CAST((e).cum AS DOUBLE) + 1.0) / (CAST(cn AS DOUBLE) + 7))))), " +
        "(x, y) -> x + y), 4) AS cpsi FROM w) " +
        "SELECT source, CAST(d * 86400000 AS BIGINT) AS window_start, " +
        "CAST(wn AS BIGINT) AS n_events, CAST(psi AS DOUBLE) AS psi, " +
        "CAST(cpsi AS DOUBLE) AS cum_psi, (psi > 0.25) AS alarm " +
        "FROM disp WHERE d < maxd ORDER BY source, window_start"),

    "q314_sprt_replay" ->
      // SPRT on pass = (value >= 20) daily trials: the ONLY replay whose
      // state resets on decision, so the oracle folds the day sequence
      // per source with WITH RECURSIVE; the log-likelihood weights embed
      // as Java's own double literals, making k*w1 + (n-k)*w0 bit-exact
      ("WITH RECURSIVE ev AS (SELECT event_type AS source, epoch_ms(ts) // 86400000 AS d, " +
        "CASE WHEN value >= 20.0 THEN 1 ELSE 0 END AS pass " +
        "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL), " +
        "c AS (SELECT min(d) + 7 AS cutd FROM ev), " +
        "daily AS (SELECT source, d, count(*) AS n, sum(pass) AS k FROM ev, c WHERE d >= cutd GROUP BY 1, 2), " +
        "days AS (SELECT source, d, n, k, " +
        "row_number() OVER (PARTITION BY source ORDER BY d) AS i, " +
        "count(*) OVER (PARTITION BY source) AS m FROM daily), " +
        "rec AS (" +
        "SELECT source, i, d, m, CAST(n AS BIGINT) AS accn, CAST(k AS BIGINT) AS acck FROM days WHERE i = 1 " +
        "UNION ALL " +
        "SELECT dy.source, dy.i, dy.d, dy.m, " +
        s"CASE WHEN r.acck * (${streaming.MonitorReplay.SprtWPass}) + (r.accn - r.acck) * (${streaming.MonitorReplay.SprtWFail}) >= (${streaming.MonitorReplay.SprtUpper}) " +
        s"OR r.acck * (${streaming.MonitorReplay.SprtWPass}) + (r.accn - r.acck) * (${streaming.MonitorReplay.SprtWFail}) <= (${streaming.MonitorReplay.SprtLower}) " +
        "THEN 0 ELSE r.accn END + dy.n, " +
        s"CASE WHEN r.acck * (${streaming.MonitorReplay.SprtWPass}) + (r.accn - r.acck) * (${streaming.MonitorReplay.SprtWFail}) >= (${streaming.MonitorReplay.SprtUpper}) " +
        s"OR r.acck * (${streaming.MonitorReplay.SprtWPass}) + (r.accn - r.acck) * (${streaming.MonitorReplay.SprtWFail}) <= (${streaming.MonitorReplay.SprtLower}) " +
        "THEN 0 ELSE r.acck END + dy.k " +
        "FROM rec r JOIN days dy ON dy.source = r.source AND dy.i = r.i + 1), " +
        "res AS (SELECT source, i, d, m, accn, acck, " +
        s"acck * (${streaming.MonitorReplay.SprtWPass}) + (accn - acck) * (${streaming.MonitorReplay.SprtWFail}) AS llr FROM rec) " +
        "SELECT source, CAST(d * 86400000 AS BIGINT) AS window_start, " +
        "CAST(accn AS BIGINT) AS n_trials, CAST(acck AS BIGINT) AS n_pass, " +
        "CAST(floor(llr * 10000 + 0.5) / 10000 AS DOUBLE) AS llr, " +
        s"CASE WHEN llr >= (${streaming.MonitorReplay.SprtUpper}) THEN 'reject_h0' " +
        s"WHEN llr <= (${streaming.MonitorReplay.SprtLower}) THEN 'accept_h0' " +
        "ELSE 'continue' END AS decision, " +
        s"(llr >= (${streaming.MonitorReplay.SprtUpper})) AS alarm " +
        "FROM res WHERE i < m ORDER BY source, window_start"),

    "q315_parity_replay" ->
      // demographic parity: integer pass counts per (source, day, group
      // slot), floor-form bp rates, gap = max - min over ACTIVE slots,
      // tie names resolve to the least (ASCII binary order both engines)
      ("WITH ev AS (SELECT event_type AS source, epoch_ms(ts) // 86400000 AS d, " +
        "CASE WHEN user_id % 4 <= 2 THEN 'g' || CAST(user_id % 4 AS VARCHAR) ELSE '__other__' END AS grp, " +
        "CASE WHEN value >= 30.0 THEN 1 ELSE 0 END AS pred " +
        "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL), " +
        "c AS (SELECT min(d) + 7 AS cutd FROM ev), " +
        "grps AS (SELECT unnest(['g0', 'g1', 'g2', '__other__']) AS grp), " +
        "sd AS (SELECT DISTINCT source, d FROM ev, c WHERE d >= cutd), " +
        "cells AS (SELECT source, d, grp, count(*) AS n, sum(pred) AS np " +
        "FROM ev, c WHERE d >= cutd GROUP BY 1, 2, 3), " +
        "cell AS (SELECT sd.source, sd.d, grps.grp, coalesce(cells.n, 0) AS n, coalesce(cells.np, 0) AS np " +
        "FROM sd CROSS JOIN grps LEFT JOIN cells ON sd.source = cells.source AND sd.d = cells.d AND grps.grp = cells.grp), " +
        "cc AS (SELECT source, d, grp, n, np, " +
        "CAST(sum(n) OVER pg AS BIGINT) AS cn, CAST(sum(np) OVER pg AS BIGINT) AS cnp " +
        "FROM cell WINDOW pg AS (PARTITION BY source, grp ORDER BY d)), " +
        "rates AS (SELECT source, d, grp, n, " +
        "CASE WHEN n > 0 THEN CAST(floor(CAST(np AS DOUBLE) / CAST(n AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS r, " +
        "CASE WHEN cn > 0 THEN CAST(floor(CAST(cnp AS DOUBLE) / CAST(cn AS DOUBLE) * 10000 + 0.5) AS BIGINT) END AS cr " +
        "FROM cc), " +
        "mm AS (SELECT source, d, CAST(sum(n) AS BIGINT) AS n_events, " +
        "CAST(count(*) FILTER (WHERE n > 0) AS BIGINT) AS act, " +
        "max(r) AS mx, min(r) AS mn, max(cr) AS cmx, min(cr) AS cmn " +
        "FROM rates GROUP BY 1, 2), " +
        "nm AS (SELECT r.source, r.d, " +
        "min(CASE WHEN r.r = mm.mx THEN r.grp END) AS maxg, " +
        "min(CASE WHEN r.r = mm.mn THEN r.grp END) AS ming " +
        "FROM rates r JOIN mm ON r.source = mm.source AND r.d = mm.d GROUP BY 1, 2), " +
        "w AS (SELECT mm.*, nm.maxg, nm.ming, " +
        "max(mm.d) OVER (PARTITION BY mm.source) AS maxd " +
        "FROM mm JOIN nm ON mm.source = nm.source AND mm.d = nm.d) " +
        "SELECT source, CAST(d * 86400000 AS BIGINT) AS window_start, " +
        "n_events, act AS n_groups_active, " +
        "CAST(mx - mn AS BIGINT) AS parity_gap_bp, maxg AS max_group, ming AS min_group, " +
        "CAST(cmx - cmn AS BIGINT) AS cum_parity_gap_bp, (mx - mn >= 2000) AS alarm " +
        "FROM w WHERE d < maxd ORDER BY source, window_start"),

    "q316_js_replay" ->
      // token-mix JS divergence over md5 buckets mod 16: the reference
      // fit, bucket draw ('0x' || first 8 md5 hex chars — the batch
      // conv(substring(md5)) value), add-1 smoothing over ALL buckets,
      // and the two bucket-ordered KL folds (q210 list_reduce idiom)
      // halved and summed exactly as the monitor accumulates them
      ("WITH ev AS (SELECT event_type AS source, epoch_ms(ts) // 86400000 AS d, props " +
        "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL), " +
        "c AS (SELECT min(d) + 7 AS cutd FROM ev), " +
        "bins AS (SELECT CAST(range AS BIGINT) AS b FROM range(16)), " +
        "rtok AS (SELECT unnest(list_filter(regexp_split_to_array(lower(trim(props)), '\\s+'), t -> length(t) > 0)) AS t " +
        "FROM ev, c WHERE d < cutd), " +
        "refh AS (SELECT bins.b, coalesce(rc.cnt, 0) AS rc FROM bins LEFT JOIN " +
        "(SELECT CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 16 AS b, count(*) AS cnt FROM rtok GROUP BY 1) rc ON bins.b = rc.b), " +
        "reft AS (SELECT CAST(sum(rc) AS BIGINT) AS nref FROM refh), " +
        "sd AS (SELECT DISTINCT source, d FROM ev, c WHERE d >= cutd), " +
        "tok AS (SELECT source, d, unnest(list_filter(regexp_split_to_array(lower(trim(props)), '\\s+'), t -> length(t) > 0)) AS t " +
        "FROM ev, c WHERE d >= cutd), " +
        "cnts AS (SELECT source, d, CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 16 AS b, count(*) AS cnt " +
        "FROM tok GROUP BY 1, 2, 3), " +
        "cell AS (SELECT sd.source, sd.d, bins.b, coalesce(cnts.cnt, 0) AS cnt " +
        "FROM sd CROSS JOIN bins LEFT JOIN cnts ON sd.source = cnts.source AND sd.d = cnts.d AND bins.b = cnts.b), " +
        "cc AS (SELECT source, d, b, cnt, " +
        "CAST(sum(cnt) OVER (PARTITION BY source, b ORDER BY d) AS BIGINT) AS cumb FROM cell), " +
        "o AS (SELECT cc.source, cc.d, " +
        "list(struct_pack(b := cc.b, cnt := cc.cnt, cum := cc.cumb, rc := refh.rc) ORDER BY cc.b) AS bs, " +
        "CAST(sum(cc.cnt) AS BIGINT) AS wn, CAST(sum(cc.cumb) AS BIGINT) AS cn " +
        "FROM cc JOIN refh ON cc.b = refh.b GROUP BY cc.source, cc.d), " +
        "w AS (SELECT source, d, wn, cn, bs, max(d) OVER (PARTITION BY source) AS maxd, nref FROM o, reft), " +
        "disp AS (SELECT source, d, wn, maxd, " +
        "round(list_reduce(list_prepend(0.0, list_transform(bs, e -> " +
        "((CAST((e).rc AS DOUBLE) + 1.0) / (CAST(nref AS DOUBLE) + 16)) * " +
        "ln(((CAST((e).rc AS DOUBLE) + 1.0) / (CAST(nref AS DOUBLE) + 16)) / " +
        "((((CAST((e).rc AS DOUBLE) + 1.0) / (CAST(nref AS DOUBLE) + 16)) + ((CAST((e).cnt AS DOUBLE) + 1.0) / (CAST(wn AS DOUBLE) + 16))) / 2.0)))), " +
        "(x, y) -> x + y) / 2.0 + " +
        "list_reduce(list_prepend(0.0, list_transform(bs, e -> " +
        "((CAST((e).cnt AS DOUBLE) + 1.0) / (CAST(wn AS DOUBLE) + 16)) * " +
        "ln(((CAST((e).cnt AS DOUBLE) + 1.0) / (CAST(wn AS DOUBLE) + 16)) / " +
        "((((CAST((e).rc AS DOUBLE) + 1.0) / (CAST(nref AS DOUBLE) + 16)) + ((CAST((e).cnt AS DOUBLE) + 1.0) / (CAST(wn AS DOUBLE) + 16))) / 2.0)))), " +
        "(x, y) -> x + y) / 2.0, 4) AS js, " +
        "round(list_reduce(list_prepend(0.0, list_transform(bs, e -> " +
        "((CAST((e).rc AS DOUBLE) + 1.0) / (CAST(nref AS DOUBLE) + 16)) * " +
        "ln(((CAST((e).rc AS DOUBLE) + 1.0) / (CAST(nref AS DOUBLE) + 16)) / " +
        "((((CAST((e).rc AS DOUBLE) + 1.0) / (CAST(nref AS DOUBLE) + 16)) + ((CAST((e).cum AS DOUBLE) + 1.0) / (CAST(cn AS DOUBLE) + 16))) / 2.0)))), " +
        "(x, y) -> x + y) / 2.0 + " +
        "list_reduce(list_prepend(0.0, list_transform(bs, e -> " +
        "((CAST((e).cum AS DOUBLE) + 1.0) / (CAST(cn AS DOUBLE) + 16)) * " +
        "ln(((CAST((e).cum AS DOUBLE) + 1.0) / (CAST(cn AS DOUBLE) + 16)) / " +
        "((((CAST((e).rc AS DOUBLE) + 1.0) / (CAST(nref AS DOUBLE) + 16)) + ((CAST((e).cum AS DOUBLE) + 1.0) / (CAST(cn AS DOUBLE) + 16))) / 2.0)))), " +
        "(x, y) -> x + y) / 2.0, 4) AS cjs FROM w) " +
        "SELECT source, CAST(d * 86400000 AS BIGINT) AS window_start, " +
        "CAST(wn AS BIGINT) AS n_tokens, CAST(js AS DOUBLE) AS js, " +
        "CAST(cjs AS DOUBLE) AS cum_js, (js > 0.05) AS alarm " +
        "FROM disp WHERE d < maxd AND wn > 0 ORDER BY source, window_start"),

    "q317_quality_replay" ->
      // the built-in watermark + windowed-aggregation path: four
      // row-local constraint violation counts per 1-day window; with
      // delay 0 the final watermark is max(ts), and every window whose
      // end it reached emits
      ("WITH ev AS (SELECT epoch_ms(ts) // 86400000 AS d, epoch_ms(ts) AS tms, " +
        "event_type, value, props FROM events WHERE ts IS NOT NULL), " +
        "wm AS (SELECT max(tms) AS w FROM ev), " +
        "m AS (SELECT d, count(*) AS checked, " +
        "sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS v0, " +
        "sum(CASE WHEN value IS NOT NULL AND (value < 0.0 OR value > 150.0) THEN 1 ELSE 0 END) AS v1, " +
        "sum(CASE WHEN event_type IS NOT NULL AND event_type NOT IN ('click', 'view', 'signup') THEN 1 ELSE 0 END) AS v2, " +
        "sum(CASE WHEN props IS NOT NULL AND NOT regexp_matches(props, '^\\{\"k\": [0-9]+\\}$') THEN 1 ELSE 0 END) AS v3 " +
        "FROM ev GROUP BY d), " +
        "u AS (SELECT d, 'not_null(value)' AS con, v0 AS violations, checked FROM m " +
        "UNION ALL SELECT d, 'in_range(value)', v1, checked FROM m " +
        "UNION ALL SELECT d, 'in_set(event_type)', v2, checked FROM m " +
        "UNION ALL SELECT d, 'matches_regex(props)', v3, checked FROM m) " +
        "SELECT CAST(d * 86400000 AS BIGINT) AS window_start, con AS \"constraint\", " +
        "(violations = 0) AS passed, CAST(violations AS BIGINT) AS violations, " +
        "CAST(checked AS BIGINT) AS checked " +
        "FROM u, wm WHERE (d + 1) * 86400000 <= w ORDER BY window_start, \"constraint\""),

    "q318_transition_replay" ->
      // per-user transition pairs in (ts, event_id) total order reduced
      // to counts — lag() over the SAME order the monitor sorts by; the
      // Spark side feeds two micro-batches, so a hash match here pins
      // the cross-batch LastEvent state bridge too
      ("WITH ev AS (SELECT user_id, epoch_ms(ts) AS tms, event_id, event_type " +
        "FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL), " +
        "t AS (SELECT user_id, " +
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY tms, event_id) AS from_type, " +
        "event_type AS to_type FROM ev) " +
        "SELECT user_id, from_type, to_type, CAST(count(*) AS BIGINT) AS n " +
        "FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2, 3 " +
        "ORDER BY user_id, from_type, to_type"),

    "q68_levenshtein" ->
      ("WITH t AS (SELECT DISTINCT event_type FROM events) " +
        "SELECT a.event_type AS type_a, b.event_type AS type_b, " +
        "levenshtein(a.event_type, b.event_type) AS dist " +
        "FROM t a, t b WHERE a.event_type < b.event_type ORDER BY type_a, type_b"),

    "q69_higher_order" ->
      // coalesce: DuckDB list_sum([]) is NULL where Spark's aggregate
      // with a 0 seed yields 0; list_max([]) is NULL on both
      ("SELECT doc_id, " +
        "len(list_filter(toks, t -> length(t) > 6)) AS n_long_words, " +
        "CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS INTEGER) AS sum_token_chars, " +
        "CAST(list_max(list_transform(toks, t -> length(t))) AS INTEGER) AS max_token_len " +
        "FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        "t -> length(t) > 0) AS toks FROM documents) ORDER BY doc_id"),

    "q75_approx_quantile" ->
      ("SELECT event_type, round(quantile_cont(value, 0.5), 4) AS exact_p50, " +
        "TRUE AS approx_close FROM events GROUP BY event_type ORDER BY event_type"),

    "q76_embed_centroid" ->
      // range(1,65): dims are fixed at 64; integer-scaled exact sums, one
      // double division, mirroring the Spark side bit for bit
      ("SELECT label, i - 1 AS dim, " +
        "round(CAST(sum(CAST(CAST(embedding[i] AS DECIMAL(20,7)) * 10000000 AS BIGINT)) AS DOUBLE) " +
        "/ (count(*) * 1000), 0) / 10000 + 0.0 AS centroid " +
        "FROM embeddings, range(1, 65) t(i) " +
        "GROUP BY label, i ORDER BY label, dim"),

    "q77_range_frame" ->
      ("SELECT user_id, event_id, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_1h_sum " +
        "FROM events ORDER BY user_id, event_id"),

    "q78_rank_family" ->
      ("SELECT event_type, event_id, " +
        "rank() OVER w AS rnk, dense_rank() OVER w AS drnk, " +
        "percent_rank() OVER w AS prnk, cume_dist() OVER w AS cdist " +
        "FROM events WINDOW w AS (PARTITION BY event_type ORDER BY value DESC) " +
        "ORDER BY event_type, event_id"),

    "q79_full_outer" ->
      ("SELECT coalesce(e.user_id, p.user_id) AS user_id, " +
        "coalesce(n_err, 0) AS n_err, coalesce(n_big_buy, 0) AS n_big_buy FROM " +
        "(SELECT user_id, count(*) AS n_err FROM events WHERE event_type = 'error' GROUP BY user_id) e " +
        "FULL OUTER JOIN " +
        "(SELECT user_id, count(*) AS n_big_buy FROM events WHERE event_type = 'purchase' AND value > 95 GROUP BY user_id) p " +
        "ON e.user_id = p.user_id ORDER BY user_id"),

    "q80_unpivot" ->
      ("WITH daily AS (SELECT CAST(ts AS DATE) AS day, " +
        "count(*) FILTER (WHERE event_type = 'click') AS click, " +
        "count(*) FILTER (WHERE event_type = 'error') AS error, " +
        "count(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
        "count(*) FILTER (WHERE event_type = 'signup') AS signup, " +
        "count(*) FILTER (WHERE event_type = 'view') AS view " +
        "FROM events GROUP BY 1) " +
        "SELECT day, 'click' AS event_type, click AS n FROM daily " +
        "UNION ALL SELECT day, 'error', error FROM daily " +
        "UNION ALL SELECT day, 'purchase', purchase FROM daily " +
        "UNION ALL SELECT day, 'signup', signup FROM daily " +
        "UNION ALL SELECT day, 'view', view FROM daily " +
        "ORDER BY day, event_type"),

    "q81_correlated_exists" ->
      ("SELECT c_custkey, c_mktsegment FROM customer c " +
        "WHERE EXISTS (SELECT 1 FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000) " +
        "ORDER BY c_custkey"),

    "q82_quality_gate" ->
      // raw (unrounded) values drive the thresholds, rounded ones are
      // displayed — mirrors qualityGate exactly; concat_ws skips NULL
      // branches on both engines
      ("SELECT doc_id, ntok AS n_tokens, round(alpha, 4) AS alpha_ratio, " +
        "round(rep, 4) AS rep_ratio, (reasons = '') AS passes, reasons FROM (" +
        "SELECT doc_id, ntok, alpha, rep, concat_ws(',', " +
        "CASE WHEN ntok < 15 THEN 'too_short' END, " +
        "CASE WHEN alpha < 0.81 THEN 'low_alpha' END, " +
        "CASE WHEN rep > 0.05 THEN 'repetitive' END) AS reasons FROM (" +
        "SELECT doc_id, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ntok, " +
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
        "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha, " +
        "(SELECT CASE WHEN nt - 1 <= 0 THEN 0.0 ELSE 1.0 - nbg / (nt - 1.0) END FROM (" +
        "SELECT CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nt, " +
        "(SELECT CASE WHEN trim(text) = '' THEN 0 WHEN len(toks) < 2 THEN 1 " +
        "ELSE len(list_distinct(list_transform(range(len(toks)-1), i -> toks[i+1] || ' ' || toks[i+2]))) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) AS nbg)) AS rep " +
        "FROM documents)) ORDER BY doc_id"),

    "q83_token_budget" ->
      ("SELECT lang, doc_id, n_tokens, quality, CAST(cum AS BIGINT) AS cum_tokens FROM (" +
        "SELECT lang, doc_id, n_tokens, quality, " +
        "sum(n_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum " +
        "FROM (SELECT lang, doc_id, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens, " +
        "round(CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
        "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS quality " +
        "FROM documents)) WHERE cum - n_tokens < 5000 ORDER BY lang, doc_id"),

    "q89_decontaminate" ->
      // same 3-gram shingle construction as q84's oracle; eval set = every
      // 50th doc; n_hit_grams = distinct shared grams per training doc
      ("WITH sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> ''), " +
        "ev AS (SELECT DISTINCT g FROM (SELECT unnest(sh) AS g FROM sh WHERE doc_id % 50 = 0)), " +
        "tg AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 50 <> 0), " +
        "hits AS (SELECT tg.doc_id, count(*) AS n FROM tg JOIN ev USING (g) GROUP BY tg.doc_id) " +
        "SELECT d.doc_id, CAST(COALESCE(n, 0) AS BIGINT) AS n_hit_grams, " +
        "COALESCE(n, 0) > 0 AS contaminated " +
        "FROM documents d LEFT JOIN hits USING (doc_id) " +
        "WHERE d.doc_id % 50 <> 0 ORDER BY d.doc_id"),

    "q90_token_rarity" ->
      // rare = corpus frequency <= 2; mean frequency is one double
      // division of exact integer sums (deterministic across engines)
      ("WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token " +
        "FROM documents WHERE trim(text) <> ''), " +
        "freq AS (SELECT token, count(*) AS freq FROM toks GROUP BY token), " +
        "perdoc AS (SELECT doc_id, count(*) AS n_tokens, " +
        "sum(CASE WHEN freq <= 2 THEN 1 ELSE 0 END) AS n_rare, " +
        "round(CAST(sum(freq) AS DOUBLE) / count(*), 6) AS mtf " +
        "FROM toks JOIN freq USING (token) GROUP BY doc_id) " +
        "SELECT d.doc_id, CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens, " +
        "CAST(COALESCE(n_rare, 0) AS BIGINT) AS n_rare_tokens, " +
        "COALESCE(mtf, 0.0) AS mean_token_freq " +
        "FROM documents d LEFT JOIN perdoc USING (doc_id) ORDER BY d.doc_id"),

    "q91_pack_sequences" ->
      // same token-count expression as q83's oracle; pure integer
      // arithmetic downstream of one running sum
      ("SELECT lang, doc_id, n_tokens, CAST(seq_start AS BIGINT) AS seq_start, " +
        "CAST(seq_start // 512 AS BIGINT) AS window_id, " +
        "CAST(seq_start % 512 AS BIGINT) AS window_offset FROM (" +
        "SELECT lang, doc_id, n_tokens, " +
        "sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS seq_start " +
        "FROM (SELECT lang, doc_id, " +
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens " +
        "FROM documents)) ORDER BY lang, doc_id"),

    "q92_mixture_weights" ->
      ("WITH g AS (SELECT source, count(*) AS n_docs, " +
        "sum(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)) AS n_tokens " +
        "FROM documents GROUP BY source), " +
        "t AS (SELECT sum(n_tokens) AS total_tokens, count(*) AS n_groups FROM g) " +
        "SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens, " +
        "round(CAST(n_tokens AS DOUBLE) / total_tokens, 6) AS token_share, " +
        "round(CAST(total_tokens AS DOUBLE) / (n_groups * n_tokens), 6) AS uniform_weight " +
        "FROM g, t ORDER BY source"),

    "q93_batch_retrieval" ->
      // brute-force per-query ranking with the same double cosine kernel as
      // q87's oracle; rank on the unrounded value, round for display
      ("WITH e AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn FROM e WHERE vec_id % 100 = 0), " +
        "s AS (SELECT query_id, e.vec_id AS vec_id, " +
        "CASE WHEN e.nrm * qn = 0 THEN 0.0 " +
        "ELSE list_sum(list_transform(list_zip(e.embedding, qv), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (e.nrm * qn) END AS cos " +
        "FROM e, q WHERE e.vec_id <> query_id), " +
        "r AS (SELECT query_id, vec_id, cos, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk FROM s) " +
        "SELECT query_id, CAST(rk AS BIGINT) AS rnk, vec_id, round(cos, 4) AS cos " +
        "FROM r WHERE rk <= 10 ORDER BY query_id, rnk"),

    "q94_batch_retrieval_lsh" ->
      // floor pinned TRUE; query count re-derived independently
      ("SELECT CAST(count(*) AS BIGINT) AS n_queries, TRUE AS recall_floor_met " +
        "FROM embeddings WHERE vec_id % 100 = 0"),

    "q95_range_join_binned" ->
      // nested-loop ground truth for the binned range join (inclusive ends)
      ("SELECT o_orderkey AS window_id, count(*) AS n_shipped, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
        "FROM orders, lineitem " +
        "WHERE o_orderkey % 100 = 0 " +
        "AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 7 DAY " +
        "GROUP BY 1 ORDER BY 1"),

    "q96_zscore_norm" ->
      // identical moment + scalar arithmetic as the Spark side: exact
      // decimal S1/S2 cast to double, then the same divisions/sqrt;
      // + 0.0 folds IEEE -0.0 (engines disagree on the sign after round)
      ("WITH g AS (SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2 " +
        "FROM events GROUP BY 1) " +
        "SELECT event_id, e.event_type, " +
        "CASE WHEN n < 2 OR n * s2 - s1 * s1 <= 0 THEN NULL " +
        "ELSE round((value - s1 / n) / sqrt((n * s2 - s1 * s1) / (n * (n - 1))), 4) + 0.0 END AS z " +
        "FROM events e JOIN g ON e.event_type = g.event_type ORDER BY event_id"),

    "q97_chunk_documents" ->
      // same tokenizer as the quality family; start grid = multiples of 30
      // while new tokens remain (a trailing all-overlap start is dropped);
      // chunk_idx = start // step because only trailing starts filter out
      ("WITH t AS (SELECT doc_id, " +
        "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS toks " +
        "FROM documents), " +
        "s AS (SELECT doc_id, toks, " +
        "unnest(list_filter(range(0, greatest(len(toks) - 1, 0) + 1, 30), v -> v = 0 OR v + 10 < len(toks))) AS st " +
        "FROM t WHERE len(toks) > 0) " +
        "SELECT doc_id, CAST(st // 30 AS BIGINT) AS chunk_idx, " +
        "CAST(st AS BIGINT) AS token_start, " +
        "CAST(least(len(toks) - st, 40) AS BIGINT) AS n_chunk_tokens, " +
        "array_to_string(toks[st + 1 : st + 40], ' ') AS chunk_text " +
        "FROM s ORDER BY doc_id, chunk_idx"),

    // ---- contract-twin oracles for the approximate family ----
    // Each twin's ground-truth side (n_true_pairs / n_norm_dup_pairs /
    // n_exact_pairs) is re-derived by brute force HERE, independently of
    // the Spark plan; the contract side (containment, set-equality, recall
    // floors) is pinned to its required value — a Spark-side miss breaks
    // the hash compare.

    "q84_lsh_contract" ->
      // brute-force 3-gram jaccard (same shingle kernel as q22's oracle),
      // threshold 0.3; n_missed pinned to 0 = candidate containment at the
      // guaranteed-recall bands=16 setting
      ("WITH sh AS (SELECT doc_id, (" +
        "SELECT CASE WHEN len(toks) < 3 THEN list_distinct([array_to_string(toks, ' ')]) " +
        "ELSE list_distinct(list_transform(range(len(toks)-2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) END " +
        "FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') toks)) sh " +
        "FROM documents WHERE trim(text) <> '') " +
        "SELECT count(*) AS n_true_pairs, CAST(0 AS BIGINT) AS n_missed " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.3"),

    "q85_simhash_contract" ->
      // normalized-duplicate pair count re-derived from raw text (same
      // normalization as q19's fingerprint oracle); simhash determinism and
      // pigeonhole-LSH = brute-force set equality pinned
      ("WITH d AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp " +
        "FROM documents WHERE trim(text) <> '') " +
        "SELECT count(*) AS n_norm_dup_pairs, CAST(0 AS BIGINT) AS n_simhash_mismatch, " +
        "TRUE AS lsh_equals_brute " +
        "FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id"),

    "q86_ann_recall" ->
      // exact cosine>=0.25 pair count by brute force (same double kernels
      // as q23's oracle); the three recall floors pinned TRUE
      ("WITH e AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings) " +
        "SELECT count(*) AS n_exact_pairs, TRUE AS embed_pair_floor_met, " +
        "TRUE AS ivf_top10_floor_met, TRUE AS lsh_top10_floor_met " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id " +
        "WHERE (CASE WHEN a.nrm * b.nrm = 0 THEN 0.0 " +
        "ELSE list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (a.nrm * b.nrm) END) >= 0.25"),

    "q87_embed_pairs_exact" ->
      // full brute-force pair set, hash-compared row-for-row (filter on the
      // unrounded cosine, then round for display — same order as Spark)
      ("WITH e AS (SELECT vec_id, embedding, " +
        "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm " +
        "FROM embeddings) " +
        "SELECT id_a, id_b, round(cos, 4) AS cos FROM (" +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        "CASE WHEN a.nrm * b.nrm = 0 THEN 0.0 " +
        "ELSE list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / (a.nrm * b.nrm) END AS cos " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id) " +
        "WHERE cos >= 0.25 ORDER BY id_a, id_b"),

    "q88_search_indexed" ->
      // identical to q06's oracle: the trigram-index path must return
      // exactly the rows the brute-force scan returns
      ("SELECT doc_id, lang, source FROM documents " +
        "WHERE lower(text) LIKE '%spark%' OR lower(text) LIKE '%merge%' ORDER BY doc_id")
  ).filter(_._2 != null)

  private def duckStopwords: String =
    TextAnalysis.DefaultStopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** DuckDB replica of [[TextAnalysis.langId]], generated from the same
    * LangProfiles so the two can't drift: per-language distinct-token hit
    * counts, argmax with the exact tie-break Spark's array_max over
    * struct(hits, lang) applies (greatest hits, then lexicographically
    * greatest language code), 'und' on zero hits.
    */
  private def langIdOracleSql: String = {
    val toks = "list_distinct(regexp_split_to_array(lower(trim(text)), '[\\s[:punct:]]+'))"
    val hitExprs = TextAnalysis.LangProfiles.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter($toks, t -> list_contains($list, t))) AS h_$lang"
    }
    val langsDesc = TextAnalysis.LangProfiles.map(_._1).sorted.reverse
    val g = langsDesc.map(l => s"h_$l").mkString("greatest(", ", ", ")")
    val cases = langsDesc.map(l => s"WHEN h_$l = $g THEN '$l'").mkString(" ")
    s"SELECT doc_id, CASE WHEN $g = 0 THEN 'und' $cases END AS lang_pred " +
      s"FROM (SELECT doc_id, ${hitExprs.mkString(", ")} FROM documents) ORDER BY doc_id"
  }
}
