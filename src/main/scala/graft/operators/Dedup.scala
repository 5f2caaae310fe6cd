package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus-scale pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: every variant is a map-side signature computation followed
  * by ONE shuffle on a compact key (hash / band / bucket). Candidate
  * verification only ever touches rows that collided, so the quadratic
  * pairwise step never materializes at corpus scale.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: keep the lowest-id row per normalized-text fingerprint.
    * One hash-aggregate shuffle on a 128-bit key; at 100 TB this is the
    * cheapest possible dedup (shuffle carries only (fingerprint, id)).
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingles of a document, lowercased, distinct.
    * Single-pass custom Expression (see WordShingles scaladoc).
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.WordShingles.word_shingles(text, n)

  // -------------------------------------------------------------- minhash

  /** MinHash signature: k independent permutations approximated by
    * xxhash64(shingle, seed_i); signature element i = min over shingles.
    * Single-pass custom Expression (see MinHashSignature's scaladoc for why
    * the built-in composition is 20x slower) — per-row, shuffle-free.
    */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int): Column =
    graft.functions.MinHashSignature.minhash_signature(
      shingles(text, shingleSize), numHashes)

  /** Distinct LSH candidate pairs (id_a < id_b) plus the persisted
    * signature frame they were banded from. The bucket self-join carries
    * ONLY (band_id, band_hash, id) — with many bands (r=1 sweeps) a true
    * pair collides in several buckets, and deduplicating bare id pairs
    * BEFORE any verification payload (signatures, shingles) is joined back
    * keeps the widest shuffle of the pipeline at 3 narrow columns. Callers
    * own the returned `sigs` cache lifecycle (Bench/Verify clearCache).
    */
  /** Threshold-conditional LSH banding plan: the cheapest (numHashes,
    * bands) whose per-pair collision probability at j = `threshold` clears
    * `targetRecall`, by the standard S-curve 1 - (1 - j^r)^b. Rows-per-band
    * r is searched largest-first (more rows per band = fewer, more
    * selective buckets = fewer junk candidates); for each r the band count
    * is the smallest b with (1 - t^r)^b <= 1 - target, and the first
    * (r, b) fitting the `maxHashes` signature budget wins. Very low
    * thresholds (t where even r=1 can't clear the target within budget)
    * fall back to the exhaustive-sweep setting (maxHashes r=1 bands) —
    * the conditional form of the always-wide net q57 used to hardcode:
    * a leakage sweep at t=0.1 still gets (32, 32), but the same call at
    * t=0.3 gets a 10-band net instead of paying the 32-band explode.
    */
  def lshBandPlan(
      threshold: Double,
      targetRecall: Double = 0.97,
      maxHashes: Int = 32): (Int, Int) = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0, 1)")
    require(targetRecall > 0 && targetRecall < 1, "targetRecall must be in (0, 1)")
    val logMiss = math.log(1 - targetRecall)
    for (r <- 8 to 1 by -1) {
      val b = math.ceil(logMiss / math.log(1 - math.pow(threshold, r)))
      if (b >= 1 && b <= maxHashes / r) return (b.toInt * r, b.toInt)
    }
    (maxHashes, maxHashes)
  }

  private def lshCandidates(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int,
      bands: Int,
      shingleSize: Int,
      diffTag: Option[Column => Column] = None): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    // blank/whitespace-only docs have an EMPTY shingle set (Jaccard 0 vs
    // everything, including each other) — exclude them up front; their
    // all-sentinel minhash signatures would otherwise collide in every band
    // and report unrelated blank docs as perfect near-duplicates.
    // The caller's partition tag (e.g. the train/test split label) is
    // computed ONCE PER DOC here — not per bucket collision, where the
    // same md5 would be re-evaluated hundreds of times per hot doc
    val tagged = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(Seq(col(idCol).as("id"),
        minhashSignature(col(textCol), numHashes, shingleSize).as("sig")) ++
        diffTag.map(f => f(col(idCol)).as("_tag")).toSeq: _*)
    val sigs = tagged.persist()

    // band -> (band_id, hash of the band's signature slice); derived from
    // the cached sigs, so each self-join side re-bands from memory instead
    // of re-shingling the corpus. r=1 sweeps skip the slice/concat/rehash:
    // the minhash element IS the band hash (bucket keys only need to be
    // consistent, and posexplode supplies the band index)
    val banded =
      if (rowsPerBand == 1)
        sigs.select(Seq(col("id")) ++ diffTag.map(_ => col("_tag")).toSeq :+
          posexplode(col("sig")): _*)
          .withColumnRenamed("pos", "band_id")
          .withColumnRenamed("col", "band_hash")
      else
        sigs.select(Seq(col("id")) ++ diffTag.map(_ => col("_tag")).toSeq :+
          posexplode(transform(
            sequence(lit(0), lit(bands - 1)),
            b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b))): _*)
          .withColumnRenamed("pos", "band_id")
          .withColumnRenamed("col", "band_hash")

    val tagA = diffTag.map(_ => col("_tag").as("_tag_a")).toSeq
    val tagB = diffTag.map(_ => col("_tag").as("_tag_b")).toSeq
    val a = banded.select(Seq(col("band_id"), col("band_hash"), col("id").as("id_a")) ++ tagA: _*)
    val b = banded.select(Seq(col("band_id"), col("band_hash"), col("id").as("id_b")) ++ tagB: _*)
    // the cross-partition predicate applies BEFORE the pair dedup and any
    // payload join-back: a filter on a deterministic per-doc tag can't
    // change which TRUE pairs collide, so recall is untouched while the
    // distinct and the wide verify joins see only pairs the caller keeps
    // (~5x fewer at a 90/10 split)
    val raw = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
    val cands = diffTag.fold(raw)(_ => raw.filter(col("_tag_a") =!= col("_tag_b")))
      .select(col("id_a"), col("id_b"))
      .distinct()
    (cands, sigs)
  }

  /** MinHash+LSH near-duplicate candidate pairs: signatures are banded;
    * documents sharing any band bucket are candidates; candidates are
    * verified by estimated Jaccard (signature agreement rate) >= threshold.
    *
    * Shuffle profile: one narrow exchange on (band_id, band_hash) — the
    * classic LSH bucket join — then the per-bucket self-join (bounded by
    * bucket skew, not corpus size), pair dedup, and a signature join-back
    * that computes est-Jaccard once per UNIQUE pair rather than once per
    * bucket collision. Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    *
    * Caching note (applies to every pair operator here): the signature /
    * shingle intermediates are `persist()`ed because both sides of the
    * self-join consume them; Spark evicts them LRU under pressure, but a
    * long-lived session running many dedup calls should
    * `spark.catalog.clearCache()` between them (Bench/Verify do).
    */
  def minhashLsh(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numHashes: Int = 16,
      bands: Int = 8,
      shingleSize: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val (cands, sigs) = lshCandidates(docs, textCol, idCol, numHashes, bands, shingleSize)
    cands
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (graft.functions.SortedIntersect
          .positional_agree_count(col("sig_a"), col("sig_b"))
          .cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  // --------------------------------------------------------------- simhash

  /** 64-bit SimHash over word tokens: per-bit majority vote of token hashes.
    * Near-duplicates have small Hamming distance. Single-pass custom
    * Expression (built-in composition replicates the tokenizer per bit).
    */
  def simhash(text: Column): Column =
    graft.functions.SimHash.simhash64(split(lower(trim(text)), "\\s+"))

  /** SimHash exact-collision duplicate GROUPS (Hamming distance 0) — the
    * per-bucket report form of [[simhashNearDup]]'s pair stream: one row
    * per simhash value with more than one member, its full population `n`,
    * and up to `maxIds` member ids (sorted) as evidence. The id list is
    * CAPPED by construction: an uncapped collect_list buffers the whole
    * group in one aggregation state, and a degenerate hot value (template
    * spam, empty-ish docs all hashing alike) makes that an executor OOM at
    * corpus scale — the grouped-percentile failure shape, one level down.
    * Plan: one exchange on simhash; the rank/count windows are sort-based
    * (spillable, never a whole-group heap) and the follow-up aggregate
    * reuses their partitioning with its collect_list bounded at `maxIds`
    * rows per group. For distance<=k at scale use [[simhashNearDup]]
    * (pigeonhole segment LSH), which never materializes a group at all.
    */
  def simhashDuplicates(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxIds: Int = 100): DataFrame = {
    require(maxIds > 0, "maxIds must be positive")
    import org.apache.spark.sql.expressions.Window
    val byHash = Window.partitionBy(col("simhash"))
    docs
      .withColumn("simhash", simhash(col(textCol)))
      .select(col("simhash"), col(idCol))
      .withColumn("_rn", row_number().over(byHash.orderBy(col(idCol))))
      .withColumn("_n", count(lit(1)).over(byHash))
      .filter(col("_n") > 1 && col("_rn") <= maxIds)
      .groupBy(col("simhash"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"),
        first(col("_n")).as("n"))
  }

  /** Pigeonhole segments of a 64-bit simhash for Hamming-distance-k LSH:
    * two docs within distance k share at least one of k+1 segments exactly.
    * Segments tile the FULL 64 bits (width 64/segments) — a narrower mask
    * would leave high bits outside every bucket key, letting unrelated
    * documents (differing only in the unmasked bits) collide in all
    * segments.
    */
  def simhashBands(sim: Column, segments: Int = 4): Column = {
    require(64 % segments == 0, "segments must divide 64")
    val width = 64 / segments
    val mask = if (width == 64) -1L else (1L << width) - 1
    array((0 until segments).map { i =>
      struct(lit(i).as("seg"),
        shiftright(sim, i * width).bitwiseAND(lit(mask)).as("val"))
    }: _*)
  }

  /** SimHash near-duplicate pairs within Hamming distance <= k, via the
    * pigeonhole LSH of [[simhashBands]]: with `segments >= k+1` segments
    * tiling the 64 bits, two signatures within distance k MUST agree on at
    * least one whole segment — so the segment equi-join is a lossless
    * candidate generator, and `bit_count(a XOR b) <= k` verifies exactly.
    *
    * Shuffle profile: one exchange on (segment_index, segment_value) —
    * identical shape to MinHash LSH banding; candidate verification is a
    * 2-instruction popcount, so the per-bucket self-join is cheap even for
    * hot buckets. Guaranteed-recall near-dup at corpus scale without any
    * pairwise pass.
    */
  def simhashNearDup(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 3,
      segments: Int = 4): DataFrame = {
    require(segments >= k + 1, s"need >= k+1 segments for distance-$k recall")
    // blank docs tokenize to [""] -> identical simhash -> Hamming-0 "perfect
    // duplicates"; exclude them, same invariant as minhashLsh
    val base = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("id"), simhash(col(textCol)).as("sim"))
      .persist() // both self-join sides and the verify join-back consume it
    // segment self-join on bare (seg, id); near-identical docs agree on
    // several segments, so dedup the id pairs before the popcount verify
    val segs = base.select(col("id"),
      explode(simhashBands(col("sim"), segments)).as("seg"))
    val cands = segs.select(col("seg"), col("id").as("id_a"))
      .join(segs.select(col("seg"), col("id").as("id_b")), Seq("seg"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cands
      .join(base.select(col("id").as("id_a"), col("sim").as("sim_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("sim").as("sim_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .filter(col("hamming") <= k)
  }

  // ------------------------------------------------------- n-gram jaccard

  /** Exact n-gram Jaccard similarity between two text columns. */
  def jaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = shingles(a, n)
    val sb = shingles(b, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** N-gram Jaccard near-dup pairs with LSH prefiltering: MinHash bands
    * generate candidates (one shuffle), exact Jaccard verifies them.
    * This is the scale-correct shape: exact set intersection only on
    * collided pairs.
    *
    * `bands`/`numHashes` are the recall/cost dial. Measured at threshold
    * 0.1 on the sf0.1 corpus: default bands=8 (r=2, per-pair collision
    * 1-(1-j^2)^8) finds 257/260 true pairs at ~1s; bands=16 (r=1,
    * collision 1-(1-j)^16) finds 260/260 but admits ~8x the candidate
    * volume (~8s); bands=numHashes=32 (r=1, miss (1-j)^32 — 0.5% even for
    * a pair at j=0.15) is the exhaustive-sweep setting the brute-force
    * oracle comparisons run at. r=1 for guaranteed-recall sweeps at low
    * thresholds, r=2 for routine dedup where j>=0.3 pairs (collision
    * >=54% per band set) are the target. The widest shuffle always
    * carries (band, hash, id) only — more bands is linearly more rows,
    * never wider ones.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      threshold: Double = 0.8,
      bands: Int = 8,
      numHashes: Int = 16,
      diffTag: Option[Column => Column] = None): DataFrame = {
    // bare candidate ids only — the est-Jaccard of minhashLsh would be
    // discarded here anyway (exact Jaccard is the verdict), so skip the
    // signature join-back entirely
    val (cands, _) = lshCandidates(docs, textCol, idCol,
      numHashes = numHashes, bands = bands, shingleSize = n,
      diffTag = diffTag)
    // verify on HASHED shingles: each doc's shingle set becomes a sorted
    // array of xxhash64 longs (computed once, persisted); the per-pair work
    // is then ONE allocation-free merge scan (sorted_intersect_count) and
    // |A∪B| = |A|+|B|-|A∩B| — vs array_intersect+array_union building two
    // hash sets of strings per pair. A cross-doc 64-bit collision altering
    // a Jaccard value has probability ~|A||B|/2^64 per pair (zero in
    // practice; q22's brute-force string-ngram oracle pins the values).
    // SHUFFLE_HASH on the array side: ids are unique, so the per-partition
    // build map is bounded and nothing SORTS rows carrying a 250-element
    // array payload (sort-merge would — measured ~40% of the sweep's cost
    // at sf0.1; shuffled hash join spills if a partition outgrows memory)
    val sh = docs.select(col(idCol),
      array_sort(transform(shingles(col(textCol), n), s => xxhash64(s))).as("hs"))
      .withColumn("sz", size(col("hs")))
      .persist()
    val inter = graft.functions.SortedIntersect
      .sorted_intersect_count(col("hs_a"), col("hs_b")).cast("double")
    val union = (col("sz_a") + col("sz_b")).cast("double") - inter
    cands
      .join(sh.select(col(idCol).as("id_a"), col("hs").as("hs_a"), col("sz").as("sz_a"))
        .hint("SHUFFLE_HASH"), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("hs").as("hs_b"), col("sz").as("sz_b"))
        .hint("SHUFFLE_HASH"), "id_b")
      .select(col("id_a"), col("id_b"),
        when(union === 0, lit(0.0)).otherwise(inter / union).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: random-hyperplane
    * signs bucket the vectors (map-side), exact cosine verifies within
    * buckets. See [[Similarity.cosine]] for the distance kernel.
    *
    * `tables` is the OR-amplification dial (the minhash-banding analog for
    * hyperplane LSH): one signature of `planes * tables` bits is sliced
    * into `tables` independent bucket keys, and a pair is a candidate if
    * it collides in ANY table. Per-pair recall goes from p^planes (one
    * table) to 1-(1-p^planes)^tables, at the cost of a `tables`-way
    * explode before the bucket join — the standard cost/recall trade.
    * Low thresholds need it: at cos>=0.25 a single 4-plane table catches
    * only ~11% of true pairs, 8 tables ~62% (pinned by q86's floor).
    */
  def embeddingNearDup(
      emb: DataFrame,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      planes: Int = 8,
      threshold: Double = 0.95,
      tables: Int = 1): DataFrame = {
    require(planes * tables <= 64, "planes*tables must fit the 64-bit signature")
    val mask = if (planes == 64) -1L else (1L << planes) - 1
    // signature + norm computed once per row (not per pair), before the join
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig", Similarity.hyperplaneSignature(col("v"), planes * tables))
      .withColumn("nrm", Similarity.norm(col("v")))
      .persist()
    // bucket self-join carries ONLY (bucket, id): with OR-amplification a
    // true pair collides in several tables, so pairs are deduped as bare
    // ids BEFORE the vectors are joined back — the cosine verify then runs
    // once per unique pair instead of once per table collision, and the
    // widest shuffle never carries the embedding arrays
    val buckets = base.select(col("id"),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          shiftright(col("sig"), t * planes).bitwiseAND(lit(mask)).as("val"))
      }: _*)).as("bucket"))
    val cands = buckets.select(col("bucket"), col("id").as("id_a"))
      .join(buckets.select(col("bucket"), col("id").as("id_b")), "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cands
      .join(base.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        when(col("nrm_a") * col("nrm_b") === 0, lit(0.0))
          .otherwise(Similarity.dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
          .as("cos"))
      .filter(col("cos") >= threshold)
  }

  // ------------------------------------------------- near-dup clustering

  /** Connected components over the near-duplicate pair graph: every doc
    * that appears in at least one near-dup pair gets a `cluster_id` (the
    * smallest doc id reachable through near-dup edges) and an
    * `is_canonical` flag (the cluster representative to keep). This is the
    * standard "collapse near-dup groups to one exemplar" dedup step.
    *
    * Algorithm: min-label propagation accelerated with pointer jumping —
    * each round every node takes the min of its own label and its
    * neighbours' labels (one join + one aggregation on the edge list),
    * then chases its label's label (`lbl := lbl(lbl)`, one self-join),
    * which compresses label chains geometrically: convergence in
    * O(log diameter) rounds instead of O(diameter). The pair list is
    * `localCheckpoint`ed ONCE up front so the LSH candidate pipeline runs
    * exactly one time; each round's `localCheckpoint` truncates the
    * growing lineage so round N doesn't replay rounds 1..N-1 (on a
    * cluster, a reliable `checkpoint` to the checkpoint dir does the same
    * job). Nothing is collected to the driver except the per-round
    * convergence flag.
    *
    * `bands` defaults to 16 (r=1), the guaranteed-recall LSH setting per
    * [[ngramJaccardPairs]]'s measurements: clustering is the one consumer
    * where a missed edge is not a soft miss but a structurally split
    * cluster, so it pays the wider candidate net. Routine pair listing at
    * j>=0.3 can pass bands=8.
    */
  def neardupClusters(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      threshold: Double = 0.8,
      maxIters: Int = 50,
      bands: Int = 16): DataFrame = {
    // materialize the pair graph ONCE: both union sides and every CC round
    // consume it, and its lineage (the whole LSH pipeline) must not be
    // re-derived per round
    val pairs = ngramJaccardPairs(docs, textCol, idCol, n, threshold, bands)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    connectedComponents(pairs, maxIters)
      .select(col("id").as(idCol), col("lbl").as("cluster_id"),
        (col("id") === col("lbl")).as("is_canonical"))
  }

  /** Min-label connected components over an (id_a, id_b) edge list.
    * Returns (id, lbl) for every node WITH an edge; lbl = the smallest id
    * reachable from the node.
    *
    * Two tiers, size-gated the way GraphFrames' CC falls back to a local
    * solve: the near-dup edge list is a SLIVER of the corpus at any
    * realistic threshold (pairs that passed an exact-similarity verify),
    * so when it fits one driver page (`localEdgeLimit`, default 1M edges
    * ≈ 16 MB — a bounded, documented collect per the engine's driver-step
    * policy) it is solved with union-find in-process: one cached-scan
    * count + one bounded collect, versus ~10 driver jobs PER ROUND of the
    * distributed loop (each round is 3 joins + a checkpoint + the
    * convergence probe, and AQE materializes every broadcast as its own
    * job — pure fixed cost that dwarfs the data at this size). Union by
    * smaller-root-wins keeps the DSU root the component minimum, so both
    * tiers produce bit-identical labels.
    *
    * Past the gate (or for non-long ids, or when `localEdgeLimit = 0` —
    * specs force this to exercise the scale path) the distributed
    * pointer-jumping loop runs: labels only ever decrease, chasing one
    * hop per round (lbl(lbl(v))) halves chain depth — convergence in
    * O(log diameter) rounds. Each round `localCheckpoint`s to truncate
    * the growing lineage (on a cluster, a reliable `checkpoint` does the
    * same job); the driver only ever sees the per-round convergence flag.
    * Callers pass a materialized (checkpointed/persisted) pair list so CC
    * rounds don't replay its derivation.
    */
  private[graft] def connectedComponents(
      pairs: DataFrame,
      maxIters: Int = 50,
      localEdgeLimit: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val longIds = pairs.schema.fields.take(2).forall(_.dataType == LongType)
    if (localEdgeLimit > 0 && longIds && pairs.count() <= localEdgeLimit) {
      val spark = pairs.sparkSession
      val es = pairs.select(col("id_a"), col("id_b")).collect()
      val parent = new scala.collection.mutable.LongMap[Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { e =>
        val (a, b) = (find(e.getLong(0)), find(e.getLong(1)))
        if (a < b) parent(b) = a else if (b < a) parent(a) = b
      }
      val nodes = es.iterator.flatMap(e => Iterator(e.getLong(0), e.getLong(1)))
        .toArray.distinct
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("lbl", LongType, nullable = false)))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(
          nodes.toIndexedSeq.map(n => org.apache.spark.sql.Row(n, find(n))),
          math.max(1, math.min(32, nodes.length / 4096 + 1))),
        schema)
    }
    // undirected: propagate labels both ways
    val edges = pairs
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .persist()
    // init folds the first propagation in: label = min(self, neighbors) —
    // the node-discovery distinct and round 1's neighbor-min are the SAME
    // aggregation, so starting from it saves a whole join round (driver
    // job count is the scarce resource here, not per-row work)
    var labels = edges
      .groupBy(col("id_a").as("id"))
      .agg(min(col("id_b")).as("_nb"))
      .select(col("id"), least(col("id"), col("_nb")).as("lbl"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels, edges("id_b") === labels("id"))
        .groupBy(edges("id_a").as("nid"))
        .agg(min(col("lbl")).as("nbr_lbl"))
      val stepped = labels.as("l")
        .join(nbrMin, col("l.id") === col("nid"), "left")
        .select(col("l.id").as("id"),
          least(col("l.lbl"), coalesce(col("nbr_lbl"), col("l.lbl"))).as("lbl"),
          col("l.lbl").as("_old"))
      // pointer jump: the "hash-to-min" shortcut (see scaladoc); the
      // previous round's label rides along so the convergence check below
      // is a scan of the checkpointed frame, not another join job
      val next = stepped.as("c")
        .join(stepped.select(col("id").as("_pid"), col("lbl").as("_plbl")),
          col("c.lbl") === col("_pid"), "left")
        .select(col("c.id").as("id"),
          coalesce(col("_plbl"), col("c.lbl")).as("lbl"),
          col("_old"))
        .localCheckpoint()
      converged = next.filter(col("lbl") =!= col("_old")).isEmpty
      labels = next.drop("_old")
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Dedup survivorship: one keep/drop decision per document. Docs in a
    * near-dup cluster (per [[neardupClusters]]) keep only the "best"
    * member — longest text wins, ties broken by lowest id — and every
    * cluster-free doc keeps itself. This is the pass that turns a cluster
    * report into an actual training-set filter (reference corpus semantics:
    * dedup drops rows, it doesn't annotate them).
    *
    * Cost on top of clustering: the winner election runs ONLY over docs
    * that [[neardupClusters]] actually clustered (docs with at least one
    * near-dup edge — a sliver of the corpus), as a hash aggregate
    * (`max_by` over a (n_chars, -id) ordering struct, map-side partials)
    * plus a join-back of the tiny per-cluster winner table. Singleton docs
    * — the overwhelming majority at corpus scale — never shuffle by
    * cluster at all: they short-circuit to keep=true on the null side of
    * the left join. (A naive full-corpus window on cluster_id would sort
    * every singleton into its own one-row partition — pure wasted I/O at
    * 100 TB.) Policy is deterministic (no rand()): retries and engine
    * comparisons reproduce the same keep set.
    */
  def survivorship(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      threshold: Double = 0.8,
      bands: Int = 16,
      lengthCol: Option[String] = None): DataFrame = {
    val clusters = neardupClusters(docs, textCol, idCol, n, threshold, bands = bands)
      .select(col(idCol), col("cluster_id"))
    val len = lengthCol.map(col).getOrElse(length(col(textCol)).cast("long"))
    val corpus = docs.select(col(idCol), len.as("n_chars"))
    // clustered slice only: id, n_chars, cluster_id for docs with an edge
    val assigned = corpus.join(clusters, Seq(idCol))
    // longest text wins, tie -> lowest id: max over the (n_chars, -id)
    // lexicographic struct. Hash agg with map-side combine — no sort.
    val winners = assigned
      .groupBy(col("cluster_id"))
      .agg(max_by(col(idCol), struct(col("n_chars"), negate(col(idCol)))).as("keep_id"))
    corpus
      .join(assigned.join(winners, Seq("cluster_id"))
              .select(col(idCol), col("cluster_id"), col("keep_id")),
            Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"),
        col("n_chars"),
        coalesce(col(idCol) === col("keep_id"), lit(true)).as("keep"))
  }

  // --------------------------------------------------- incremental dedup

  /** Incremental exact dedup: one keep/drop decision per NEW-batch doc
    * against an already-deduped corpus — the shape every periodically-fed
    * training corpus needs (re-deduping 100 TB because 100 GB arrived is
    * the anti-pattern). A new doc keeps iff (1) its normalized fingerprint
    * does not exist in the corpus and (2) it is the first occurrence
    * (lowest id) of that fingerprint within the batch.
    *
    * Scale: the corpus side reduces to DISTINCT fingerprints before the
    * join (a corpus-side hash agg that at scale is a pre-materialized
    * fingerprint index — [[graft.store.BucketedStore]] bucketed by
    * fingerprint makes it a zero-shuffle join); the batch side is one hash
    * agg + broadcast-size join-back, proportional to the BATCH, not the
    * corpus. A Bloom prefilter ([[CorpusAnalytics.decontaminateBloom]]'s
    * pattern) drops the corpus probe to a bitmap when even the fingerprint
    * index is too wide to shuffle.
    */
  def incrementalExact(
      batch: DataFrame,
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val fp = (d: DataFrame) => d.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val corpusFps = fp(corpus).select(col("fp")).distinct()
    val batchFp = fp(batch)
    // lowest id per batch fingerprint: hash agg, map-side partials
    val firstInBatch = batchFp.groupBy(col("fp"))
      .agg(min(col(idCol)).as("_first_id"))
    batchFp
      .join(corpusFps.withColumn("_in_corpus", lit(true)), Seq("fp"), "left")
      .join(firstInBatch, Seq("fp"))
      .select(col(idCol),
        coalesce(col("_in_corpus"), lit(false)).as("in_corpus"),
        (col(idCol) === col("_first_id")).as("first_in_batch"),
        (coalesce(col("_in_corpus"), lit(false)) === false &&
          col(idCol) === col("_first_id")).as("keep"))
  }

  // ------------------------------------------------------ semantic dedup

  /** SemDeDup-style semantic deduplication over an embedding column
    * (Abbas et al. 2023, arXiv:2303.09540): k-means-partition the corpus,
    * find exact-cosine duplicate pairs WITHIN each cluster only, group
    * duplicates into connected components, and keep one representative per
    * component — the member farthest from its centroid (lowest cosine to
    * the assigned centroid, the paper's best-performing keeper policy),
    * ties broken by lowest id. Every un-clustered / un-duplicated row
    * keeps itself.
    *
    * Scale design: the quadratic pair step runs per cluster, never
    * globally — one shuffle keyed by cluster id, O(sum of cluster^2)
    * comparisons. k is the knob that bounds cluster size: scale k with
    * corpus size (k ~ n / target_cluster_rows) so per-cluster work stays
    * constant as the corpus grows; centroids stay driver-resident (k*dim
    * doubles compiled into the plan as literals, see
    * [[Similarity.kmeansCentroids]]). The CC step touches only rows with a
    * duplicate edge — a sliver of the corpus at any realistic threshold.
    *
    * Duplicate pairs whose endpoints never share a cluster are invisible —
    * the recall/cost trade the paper accepts. `replicas` softens it the
    * same way [[Similarity.ivfIndex]]'s multi-assignment does: candidate
    * pairs are generated from each vector's top-`replicas` clusters, so a
    * boundary vector sees neighbors on both sides of the cut (measured on
    * the sf0.001 embeddings at tau=0.35: drop recall vs the global-graph
    * optimum rises 0.25 -> 0.86 from R=1 to R=3 at linear candidate cost —
    * the same replica-beats-iterations result as IVF). q101's contract
    * twin pins the realized recall against the global brute-force graph.
    *
    * Returns one row per input row: (idCol, cluster, component_id,
    * centroid_cos, keep) — `keep=false` rows are the semantic duplicates a
    * training-set filter would drop. Intra-query persists are
    * caller-released (Bench/Verify clearCache), matching
    * [[lshCandidates]]'s contract.
    */
  def semanticDedup(
      emb: DataFrame,
      k: Int = 16,
      threshold: Double = 0.35,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      maxIters: Int = 20,
      replicas: Int = 3): DataFrame = {
    // iters = 0: SemDeDup only needs a cluster PARTITION, and distributed
    // Lloyd refinement measurably doesn't move the realized drop recall
    // (q101's contract pins it) — the pool-converged centroids cost ONE
    // Spark job instead of one per iteration (see kmeansCentroids scaladoc)
    val centroids =
      Similarity.kmeansCentroids(emb, k, iters = 0, vecCol = vecCol, idCol = idCol)
    val rawNorm = Similarity.norm(col(vecCol))
    // zero vectors: define cosine as 0 everywhere (norm 1 sentinel) so they
    // are never duplicates of anything, matching embeddingNearDup
    val base = emb.select(col(idCol), col(vecCol),
      when(rawNorm === 0, lit(1.0)).otherwise(rawNorm).as("nrm"))
    // centroid scores once: centroids are unit vectors, so dot/own-norm IS
    // the cosine; sorted desc, head = primary assignment (reported +
    // keeper policy), top-R = candidate-generation assignments
    val scoredArr = sort_array(array(centroids.zipWithIndex.map { case (c, i) =>
      struct((Similarity.dot(col(vecCol), array(c.map(lit(_)): _*)) /
        col("nrm")).as("s"), lit(i).as("i"))
    }: _*), asc = false)
    val assigned = base
      .withColumn("_top", slice(scoredArr, 1, math.min(replicas, centroids.length)))
      .select(col(idCol), col(vecCol), col("nrm"),
        element_at(col("_top"), 1).getField("i").as("cluster"),
        element_at(col("_top"), 1).getField("s").as("centroid_cos"),
        transform(col("_top"), t => t.getField("i")).as("_clusters"))
      .persist()
    // candidate pairs from every shared top-R cluster: the join key is a
    // cluster id, so the pair explosion is bounded by the largest cluster
    // times R, never the corpus. Bare-id distinct BEFORE anything joins
    // back (a pair can co-occur in up to R shared clusters).
    val replicated = assigned
      .select(col(idCol), col(vecCol), col("nrm"),
        explode(col("_clusters")).as("rcluster"))
      .repartition(col("rcluster"))
    val pairs = replicated
      .select(col("rcluster"), col(idCol).as("id_a"),
        col(vecCol).as("v_a"), col("nrm").as("nrm_a"))
      .join(replicated.select(col("rcluster"), col(idCol).as("id_b"),
        col(vecCol).as("v_b"), col("nrm").as("nrm_b")), Seq("rcluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(Similarity.dot(col("v_a"), col("v_b")) /
        (col("nrm_a") * col("nrm_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
      .distinct()
      .localCheckpoint()
    val labels = connectedComponents(pairs, maxIters)
    // keeper per component: farthest from centroid (lowest centroid_cos),
    // tie -> lowest id; min over the (centroid_cos, id) lexicographic
    // struct — hash agg, map-side partials, no sort
    val winners = labels
      .join(assigned.select(col(idCol).as("id"), col("centroid_cos")), "id")
      .groupBy(col("lbl"))
      .agg(min_by(col("id"), struct(col("centroid_cos"), col("id"))).as("keep_id"))
    assigned
      .join(labels.select(col("id").as(idCol), col("lbl")), Seq(idCol), "left")
      .join(winners, Seq("lbl"), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("lbl"), col(idCol)).as("component_id"),
        round(col("centroid_cos"), 4).as("centroid_cos"),
        coalesce(col(idCol) === col("keep_id"), lit(true)).as("keep"))
  }

  // ---------------------------------------------------------- containment

  /** Asymmetric shingle-containment pairs: (a, b) with
    * |S(a) ∩ S(b)| / |S(a)| >= tauNum/tauDen over distinct word n-gram
    * shingles — the quote/subset/superset detector that symmetric Jaccard
    * misses (a short doc fully quoted inside a long one has tiny Jaccard
    * but containment 1.0). Both directions are emitted independently.
    * Returns (a_id, b_id, n_a, n_inter, containment). The threshold is an
    * integer rational and every comparison is integer arithmetic, so the
    * result is engine-portable with no float-boundary risk.
    *
    * EXACT at scale via PPJoin-style prefix filtering (Xiao et al.,
    * WWW'08): order each doc's shingles rarest-first (global df, then
    * gram); a qualifying pair must share >= ceil(tau*|S(a)|) grams, so it
    * must share one of a's first |S(a)| - ceil(tau*|S(a)|) + 1 grams —
    * only that prefix enters the candidate join, and rare-first ordering
    * makes prefix postings the SHORT ones (stop-gram postings never
    * generate candidates). Verification re-counts the intersection
    * exactly on collected gram arrays, so the filter only prunes, never
    * approximates. Shuffles: df agg, df join + per-doc rank window, the
    * candidate equi-join, two array joins, and a survivor distinct — all on
    * 8-byte xxhash64 gram keys (prefix filtering only needs a CONSISTENT
    * global order, and (df, hash) is one; collision odds and the q108
    * oracle pin follow dupNgramFraction's argument), and the gram arrays
    * stay bounded by doc length.
    *
    * Persist lifecycle (the [[GlobalRank]] discipline): the internal
    * per-doc gram relation is persisted because three downstream legs
    * (prefix generation and both verify joins) consume it. A caller that
    * hands the result onward LAZILY must leave the pin alone — it is what
    * keeps the legs consistent and cheap; Bench/Verify clear caches
    * between queries. A library caller that consumes the result EAGERLY
    * and wants the memory back should use [[containmentPairsWithHandle]]
    * and unpersist the handle after the consume.
    */
  def containmentPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      tauNum: Int = 3,
      tauDen: Int = 5): DataFrame =
    containmentPairsWithHandle(docs, textCol, idCol, n, tauNum, tauDen)._1

  /** [[containmentPairs]] plus the persisted internal per-doc frame, for
    * eager consumers: collect/write the pairs first, then
    * `handle.unpersist()` to release the pin (unpersisting the RESULT is
    * a no-op — the CacheManager matches the persisted plan, never its
    * descendants).
    */
  def containmentPairsWithHandle(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      tauNum: Int = 3,
      tauDen: Int = 5): (DataFrame, DataFrame) = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen, "tau must be in (0, 1]")
    // NOT persisted (measured): the df aggregate and the perDoc join both
    // consume the gram stream, so a pin looks attractive — but at sf0.1
    // the pin's materialization job + two cache scans cost ~0.3s more
    // than simply re-shingling (two parquet scans of a small corpus).
    // The double text scan is the price; revisit only with evidence at a
    // scale where shingling dominates the pin overhead.
    val grams = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        explode(transform(shingles(col(textCol), n), g => xxhash64(g))).as("gram"))
    val df = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    // ONE per-doc relation serves prefix generation AND verification: the
    // rarest-first order comes from an in-array sort after a hash agg
    // (doc-length-bounded), never a window sort of the full gram stream.
    // Persisted: the prefix side and both verify joins consume it.
    val perDoc = grams
      .join(df, "gram")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("df"), col("gram")))).as("gd"))
      .select(col(idCol),
        transform(col("gd"), e => e("gram")).as("gs"),
        size(col("gd")).cast("long").as("m"))
      .persist()
    // prefixLen(m) = m - ceil(tau*m) + 1, all-integer
    val prefix = perDoc
      .select(col(idCol).as("a_id"), col("m").as("m_a"),
        explode(slice(col("gs"), lit(1),
          (col("m") - floor((col("m") * tauNum + (tauDen - 1)) / tauDen) + 1)
            .cast("int"))).as("gram"))
    // PPJoin length filter (Xiao et al. WWW'08 §3.2): the intersection is
    // capped by |S(b)|, so containment >= tau forces
    // m_b*tauDen >= m_a*tauNum — prune those pairs in the candidate
    // stage, before the array-verify joins. Lossless: drops only pairs
    // that can never reach the threshold. Probe side re-explodes the
    // persisted perDoc gram sets (same distinct grams as the raw stream)
    // so m_b rides along for free.
    //
    // NO pre-verify distinct: a pair re-enters once per shared prefix
    // gram, but measured at sf0.1 that is only ~5% duplicate rows
    // (598k raw vs 570k distinct) while the distinct itself costs a full
    // exchange + two HashAggregates over every candidate. Verify the raw
    // stream and dedupe the survivors instead (threshold survivors are
    // ~0.1% of candidates; duplicate candidates produce bit-identical
    // verify rows, so a post-filter distinct yields the same result set).
    val candidates = perDoc
      .select(col(idCol).as("b_id"), col("m").as("m_b"),
        explode(col("gs")).as("gram"))
      .join(prefix, "gram")
      .filter(col("a_id") =!= col("b_id") &&
        col("m_b") * tauDen >= col("m_a") * tauNum)
      .select(col("a_id"), col("b_id"))
    // SHUFFLE_HASH: unique-id build sides — don't sort gram-array rows
    // (same reasoning as ngramJaccardPairs' verify joins). The verify
    // arrays are re-sorted by gram VALUE in the per-doc projection under
    // the join (once per doc, not per pair) so the per-pair intersection
    // is ONE allocation-free merge scan (sorted_intersect_count) instead
    // of array_intersect's per-pair hash-set build — same distinct-count
    // semantics on the distinct-element gram sets (ngramJaccardPairs'
    // collision argument applies unchanged).
    val pairs = candidates
      .join(perDoc.select(col(idCol).as("a_id"),
        sort_array(col("gs")).as("ga"),
        col("m").as("n_a")).hint("SHUFFLE_HASH"), "a_id")
      .join(perDoc.select(col(idCol).as("b_id"),
        sort_array(col("gs")).as("gb")).hint("SHUFFLE_HASH"), "b_id")
      .select(col("a_id"), col("b_id"), col("n_a"),
        graft.functions.SortedIntersect
          .sorted_intersect_count(col("ga"), col("gb"))
          .cast("long").as("n_inter"))
      .filter(col("n_inter") * tauDen >= col("n_a") * tauNum)
      .distinct()
      .select(col("a_id"), col("b_id"), col("n_a"), col("n_inter"),
        round(col("n_inter").cast("double") / col("n_a"), 4).as("containment"))
    (pairs, perDoc)
  }

  /** LSH parameter planner — the S-curve (b, r) tuning table every
    * MinHash deployment works from (Leskovec-Rajaraman-Ullman, MMDS ch.3):
    * with b bands of r rows, a pair at Jaccard J becomes a candidate with
    * p = 1 − (1 − J^r)^b. For every (b, r) split of `numHashes`
    * signatures the planner reports the S-curve midpoint (1/b)^(1/r), the
    * candidate probability at a "noise" similarity `jLow` (false-positive
    * pressure) and at the "target" similarity `jHigh` (recall), and flags
    * the split maximizing recall − noise. Pure expression arithmetic over
    * a bands-bounded literal frame — replayable, no data touched.
    */
  def lshParameterPlan(
      spark: org.apache.spark.sql.SparkSession,
      numHashes: Int = 64,
      jLow: Double = 0.3,
      jHigh: Double = 0.8): DataFrame = {
    require(numHashes >= 2, "need at least 2 signatures")
    import spark.implicits._
    val splits = (1 to numHashes)
      .filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
      .filter(_._2 >= 1)
    val base = splits.toDF("b", "r")
    def pAt(j: Double): Column =
      lit(1.0) - pow(lit(1.0) - pow(lit(j), col("r").cast("double")),
        col("b").cast("double"))
    val scored = base.select(col("b"), col("r"),
      round(pow(lit(1.0) / col("b"), lit(1.0) / col("r")), 4).as("threshold_mid"),
      round(pAt(jLow), 4).as("p_noise"),
      round(pAt(jHigh), 4).as("p_target"),
      (pAt(jHigh) - pAt(jLow)).as("_score"))
    val best = scored.agg(max(col("_score")).as("_best"))
    scored.crossJoin(broadcast(best))
      .select(col("b"), col("r"), col("threshold_mid"),
        col("p_noise"), col("p_target"),
        (col("_score") === col("_best")).as("is_best"))
  }
}
