package graft

import graft.operators.{CorpusAnalytics, Dedup}
import org.apache.spark.sql.functions._

class CorpusAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("wordFrequencies counts tokens and breaks count ties lexicographically") {
    val docs = Seq(
      (1L, "a b b c"),
      (2L, "B c d")
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.wordFrequencies(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // b:3 (case-folded), c:2, then a/d tie at 1 -> 'a' first
    assert(got == Seq(("b", 3L), ("c", 2L), ("a", 1L)))
  }

  test("tfidfTopTerm prefers rare terms over common ones") {
    val docs = Seq(
      (1L, "common rare1 common common"),
      (2L, "common rare2"),
      (3L, "common other")
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.tfidfTopTerm(docs)
      .orderBy("doc_id").collect()
    // 'common' appears in all docs -> idf ln(1) = 0; rare terms win
    assert(got.map(_.getString(1)).toSeq == Seq("rare1", "rare2", "other"))
    assert(got.forall(_.getDouble(2) > 0))
  }

  test("repetitionRatio: 0 for all-distinct bigrams, high for repeated text") {
    val docs = Seq(
      (1L, "a b c d"),          // 3 bigrams, all distinct -> 0.0
      (2L, "a b a b a b"),      // 5 bigrams, 2 distinct -> 0.6
      (3L, "single"),           // <2 tokens -> 0.0
      (4L, "")                  // blank -> 0.0
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        CorpusAnalytics.repetitionRatio(col("text")).as("r"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    assert(got(0)._2 == 0.0)
    assert(math.abs(got(1)._2 - 0.6) < 1e-9)
    assert(got(2)._2 == 0.0 && got(3)._2 == 0.0)
  }

  test("redactPii scrubs emails before digit runs and counts both") {
    val df = Seq(
      (1L, "reach me at john.doe99@corp.example.org or call 5551234567"),
      (2L, "no pii here, just 123 small numbers"),
      (3L, "two mails a@b.co x@y.io and 1234 9999")
    ).toDF("id", "msg")
    val got = df.select(col("id"), CorpusAnalytics.redactPii(col("msg")).as("r"))
      .select(col("id"), col("r.redacted"), col("r.n_emails"), col("r.n_nums"))
      .orderBy("id").collect()
    assert(got(0).getString(1) == "reach me at <EMAIL> or call <NUM>")
    assert(got(0).getInt(2) == 1 && got(0).getInt(3) == 1)
    // 3-digit run is NOT redacted (4+ threshold)
    assert(got(1).getString(1).contains("123"))
    assert(got(1).getInt(2) == 0 && got(1).getInt(3) == 0)
    assert(got(2).getInt(2) == 2 && got(2).getInt(3) == 2)
    // the email's own digits never count as a number run
    assert(!got(0).getString(1).contains("99"))
  }

  test("stratifiedSample takes exactly min(n, perStratum) per stratum, deterministically") {
    val docs = Tables(spark, sf(), "documents")
    val s1 = CorpusAnalytics.stratifiedSample(docs, "lang", "doc_id", 5)
    val s2 = CorpusAnalytics.stratifiedSample(docs, "lang", "doc_id", 5)
    val got = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    val avail = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    avail.foreach { case (lang, n) =>
      assert(got(lang) == math.min(n, 5L), s"lang=$lang")
    }
    assert(s1.select("doc_id").as[Long].collect().toSet ==
      s2.select("doc_id").as[Long].collect().toSet)
  }

  test("qualityGate rejects with stacked reasons; clean docs pass") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "hi"),                                     // too_short
      (3L, "1 2 3 4 5 6 7 8 9 10 11 12"),             // low_alpha
      (4L, "go go go go go go go go go go")           // repetitive (not short)
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.qualityGate(docs)
      .select("doc_id", "passes", "reasons")
      .orderBy("doc_id").as[(Long, Boolean, String)].collect().toSeq
    assert(got(0) == ((1L, true, "")))
    assert(got(1)._3.contains("too_short"))
    assert(got(2) == ((3L, false, "low_alpha")))
    assert(got(3) == ((4L, false, "repetitive")))
  }

  test("tokenBudget keeps best-quality docs until the stratum budget is exhausted") {
    val docs = Seq(
      // lang a: qualities 1.0 > 0.5; budget 5 tokens admits the first
      // (4 tokens) and the second (budget not yet exhausted: 4 < 5)
      (1L, "aaaa bbbb cccc dddd", "a"),       // 4 tokens, alpha 1.0 -> ranked 1st
      (2L, "a1 b2 c3 d4 e5 f6", "a"),         // 6 tokens, alpha ~0.35 -> 2nd
      (3L, "x9 y8 z7 w6 v5 u4 t3 s2", "a"),   // 8 tokens, lowest alpha+id -> cut
      (4L, "hello world", "b")                // other stratum: untouched
    ).toDF("doc_id", "text", "lang")
    val got = CorpusAnalytics.tokenBudget(docs, "lang", "doc_id", budgetTokens = 5L)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L))
  }

  test("neardupClusters groups transitively-connected near-dups under min id") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),  // ~ 1
      (3L, "the quick brown fox jumps over the lazy cat !"), // ~ 2 (and 1)
      (5L, "completely unrelated text about spark engines and shuffles"),
      (6L, "completely unrelated text about spark engines and shuffles too") // ~ 5
    ).toDF("doc_id", "text")
    val got = Dedup.neardupClusters(docs, threshold = 0.3)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    // docs 1-2-3 one component (via transitivity), 5-6 another
    val clusters = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(clusters(1L) == Set(1L, 2L, 3L))
    assert(clusters(5L) == Set(5L, 6L))
    // exactly one canonical per cluster: the min id
    assert(got.filter(_._3).map(_._1).toSet == Set(1L, 5L))
  }

  test("decontaminate flags train docs sharing an n-gram with the eval set") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),  // shares "the quick brown" etc.
      (2L, "entirely different content here"),
      (3L, "")                            // blank: no grams, not contaminated
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, "the quick brown fox runs")).toDF("doc_id", "text")
    val got = CorpusAnalytics.decontaminate(train, eval_)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    // doc 1 shares 3-grams "the quick brown" and "quick brown fox"
    assert(got == Seq((1L, 2L, true), (2L, 0L, false), (3L, 0L, false)))
  }

  test("tokenRarity counts rare tokens and exact mean corpus frequency") {
    val docs = Seq(
      (1L, "a a b"),   // corpus freqs: a=4, b=1 -> rare(<=2): b; mean (4+4+1)/3
      (2L, "a a c"),   // c=1 rare; mean (4+4+1)/3 = 3.0
      (3L, "")         // no tokens
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.tokenRarity(docs)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1L, 3.0),
      (2L, 3L, 1L, 3.0),
      (3L, 0L, 0L, 0.0)))
  }

  test("packSequences assigns exact window offsets with straddling docs") {
    val docs = Seq(
      (1L, "en", ("w " * 3).trim),   // 3 tokens, start 0, window 0 offset 0
      (2L, "en", ("w " * 4).trim),   // start 3, window 0 offset 3
      (3L, "en", ("w " * 2).trim),   // start 7 -> window 1 offset 2 (budget 5)
      (4L, "fr", ("w " * 6).trim)    // separate stratum restarts at 0
    ).toDF("doc_id", "lang", "text")
    val got = CorpusAnalytics.packSequences(docs, "lang", "doc_id", windowTokens = 5L)
      .orderBy("lang", "doc_id")
      .select("doc_id", "seq_start", "window_id", "window_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 0L), (2L, 3L, 0L, 3L), (3L, 7L, 1L, 2L),
      (4L, 0L, 0L, 0L)))
  }

  test("chunkDocuments: overlap windows, short tail kept, blanks dropped") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"),  // 7 tokens
      (2L, "a b"),                    // fits one chunk
      (3L, "")                        // blank: no chunks
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.chunkDocuments(docs, chunkTokens = 3, overlap = 1)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 3L, "t0 t1 t2"),
      (1L, 1L, 2L, 3L, "t2 t3 t4"),
      (1L, 2L, 4L, 3L, "t4 t5 t6"),
      // start 6 would add only overlap (6+1 !< 7): dropped
      (2L, 0L, 0L, 2L, "a b")))
    // consecutive chunks share exactly `overlap` tokens
    assert(got(0)._5.split(" ").last == got(1)._5.split(" ").head)
  }

  test("mixtureWeights: shares sum to 1, uniform weights rebalance") {
    val docs = Seq(
      (1L, "web", "one two three four five six"),  // 6 tokens
      (2L, "web", "one two"),                      // web total 8
      (3L, "book", "one two")                      // book total 2
    ).toDF("doc_id", "source", "text")
    val got = CorpusAnalytics.mixtureWeights(docs, "source")
      .orderBy("source")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("book", 1L, 2L, 0.2, 2.5),   // share 2/10; weight 10/(2*2)
      ("web", 2L, 8L, 0.8, 0.625))) // share 8/10; weight 10/(2*8)
  }

  test("decontaminateBloom: never misses a truly contaminated doc") {
    val train = Seq(
      (1L, "the quick brown fox jumps high"),   // shares "the quick brown" etc.
      (2L, "totally unrelated training text body here"),
      (3L, "the quick brown fox jumps high today")
    ).toDF("doc_id", "text")
    val evalD = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val exact = CorpusAnalytics.decontaminate(train, evalD)
      .filter($"contaminated").select("doc_id").as[Long].collect().toSet
    val bloom = CorpusAnalytics
      .decontaminateBloom(train, evalD, expectedGrams = 1024)
      .filter($"contaminated").select("doc_id").as[Long].collect().toSet
    assert(exact == Set(1L, 3L))
    assert(exact.subsetOf(bloom)) // no false negatives, ever
  }

  test("dupNgramFraction: corpus-shared 3-gram share per doc") {
    val docs = Seq(
      (1L, "a b c d e"),   // grams {a b c, b c d, c d e}; shares "a b c"
      (2L, "a b c x y"),   // grams {a b c, b c x, c x y}; shares "a b c"
      (3L, "zz yy xx"),    // < 4 tokens -> one gram, unshared
      (4L, "   ")          // blank -> excluded entirely
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.dupNgramFraction(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 0.3333),
      (2L, 3L, 0.3333),
      (3L, 1L, 0.0)))
  }

  test("gramNovelty: re-crawl scores 0, the original keeps scoring 1") {
    val docs = Seq(
      (1L, "a b c d e"),  // all grams first seen here -> novelty 1
      (2L, "a b c d e"),  // verbatim re-crawl -> novelty 0
      (3L, "a b c z z")   // one of three grams seen earlier ("a b c")
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.gramNovelty(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 0L, 1.0),
      (2L, 3L, 3L, 0.0),
      (3L, 3L, 1L, 0.6667)))
  }

  test("mixtureResample keeps under-represented groups whole, downsamples the rest") {
    // big: 60 docs x 8 tokens = 480; small: 3 docs x 2 tokens = 6
    // weights: big 486/(2*480) ~ 0.51 (downsample), small 486/12 > 1 (cap)
    val docs = ((0L until 60L).map(i => (i, "t t t t t t t t", "big")) ++
      Seq((100L, "s s", "small"), (101L, "s s", "small"), (102L, "s s", "small")))
      .toDF("doc_id", "text", "source")
    val kept = CorpusAnalytics.mixtureResample(docs, "source")
      .select("doc_id").as[Long].collect().toSet
    assert(Set(100L, 101L, 102L).subsetOf(kept)) // weight >= 1 -> all kept
    val bigKept = kept.count(_ < 100L)
    assert(bigKept > 0 && bigKept < 60) // actually downsampled, not emptied
    // decision replay: the keep set is exactly the integer inequality
    val expected = docs.filter(col("source") === "big")
      .filter(conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
        .cast("long") * 2 * 480 < 65536L * 486)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.filter(_ < 100L) == expected)
    // rerun is byte-identical (determinism under retry)
    val again = CorpusAnalytics.mixtureResample(docs, "source")
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("removeDuplicatedPassages strips cross-doc trigram spans only") {
    val docs = Seq(
      (1L, "a b c d e"),    // "a b c" shared with doc 2 -> positions 0-2 go
      (2L, "x a b c"),      // same shared gram at the tail -> positions 1-3 go
      (3L, "p q r s"),      // all grams unique -> untouched
      (4L, "a b"),          // shorter than a trigram -> untouched
      (5L, "m n o"),        // fully covered by doc 6's copy -> ""
      (6L, "m n o")
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.removeDuplicatedPassages(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 3L, "d e"),
      (2L, 4L, 3L, "x"),
      (3L, 4L, 0L, "p q r s"),
      (4L, 2L, 0L, "a b"),
      (5L, 3L, 3L, ""),
      (6L, 3L, 3L, "")))
  }

  test("longestDuplicatedRun: island lengths, untouched and fully-covered docs") {
    val docs = Seq(
      (1L, "a b c x y z d e f"), // "a b c" and "d e f" shared: runs 0-2 and 6-8
      (2L, "a b c q d e f"),     // runs 0-2 and 4-6 -> longest 3, covered 6
      (3L, "p q r s"),           // no dup grams -> 0/0
      (4L, "m n o"), (5L, "m n o") // fully covered: one run of 3
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.longestDuplicatedRun(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 9L, 6L, 3L),
      (2L, 7L, 6L, 3L),
      (3L, 4L, 0L, 0L),
      (4L, 3L, 3L, 3L),
      (5L, 3L, 3L, 3L)))
  }

  test("removeDuplicatedPassages: within-doc repeats alone are not removed") {
    // "a b c" occurs twice in ONE doc — cross-doc min!=max test must not fire
    val docs = Seq((1L, "a b c a b c"), (2L, "q r s t")).toDF("doc_id", "text")
    val got = CorpusAnalytics.removeDuplicatedPassages(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 6L, 0L, "a b c a b c"), (2L, 4L, 0L, "q r s t")))
  }

  test("removeDuplicatedPassages: NULL text is excluded, not emitted as -1/''") {
    val docs = Seq((1L, "a b c d"), (2L, null), (3L, "a b c e"))
      .toDF("doc_id", "text")
    val got = CorpusAnalytics.removeDuplicatedPassages(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 2 drops (same semantics as dupNgramFraction); no n_tokens = -1 row
    assert(got.map(_._1) == Seq(1L, 3L))
    assert(got.forall(_._2 > 0))
  }

  test("decontaminateBloom: empty eval set flags nothing (NULL-bitmap short-circuit)") {
    val train = Seq((1L, "one two three"), (2L, "four five six"))
      .toDF("doc_id", "text")
    val emptyEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val blankEval = Seq((9L, "   ")).toDF("doc_id", "text")
    for (evalD <- Seq(emptyEval, blankEval)) {
      val got = CorpusAnalytics.decontaminateBloom(train, evalD)
        .orderBy("doc_id")
        .as[(Long, Long, Boolean)].collect().toSeq
      assert(got == Seq((1L, 0L, false), (2L, 0L, false)))
    }
  }

  test("bigramCrossEntropy: ML bigram LM, hand-checked probabilities") {
    val docs = Seq(
      (1L, "a b"),  // P(b|a) = 2/3 -> H = -ln(2/3)
      (2L, "a b"),
      (3L, "a c"),  // P(c|a) = 1/3 -> H = -ln(1/3)
      (4L, "x")     // < 2 tokens: no bigrams, no signal
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.bigramCrossEntropy(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 0.4055), (2L, 1L, 0.4055), (3L, 1L, 1.0986), (4L, 0L, 0.0)))
  }

  test("importanceWeights: target-like docs score above, blanks never pass") {
    val docs = Seq(
      (1L, "alpha alpha alpha alpha"),  // pure target language
      (2L, "omega omega omega omega"),  // pure non-target
      (3L, "alpha alpha omega omega"),  // mixed — the interpolated middle
      (4L, "   ")                       // blank: no signal, keep = false
    ).toDF("doc_id", "text")
    val target = docs.filter($"doc_id" === 1)
    val got = CorpusAnalytics.importanceWeights(docs, target)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got.map(_._2) == Seq(4L, 4L, 4L, 0L))
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(1L)._3 > byId(3L)._3 && byId(3L)._3 > byId(2L)._3,
      s"weights must order target > mixed > non-target: $got")
    // median of (w1, w2, w3) is w3 -> docs 1 and 3 keep, 2 and blank don't
    assert(byId(1L)._4 && byId(3L)._4 && !byId(2L)._4 && !byId(4L)._4)
    // the production bucket hash (xxhash64) preserves the ordering and the
    // keep set — any uniform hash does, only the oracle replay needs md5
    val fast = CorpusAnalytics.importanceWeights(docs, target,
      bucketHash = Some(t => pmod(xxhash64(t), lit(4096))))
      .orderBy("doc_id").as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(fast.map(g => (g._1, g._4)) == got.map(g => (g._1, g._4)))
  }

  test("distributionDrift: identical corpora diverge 0, disjoint vocabularies diverge") {
    val a = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma epsilon zeta"))
      .toDF("doc_id", "text")
    val same = CorpusAnalytics.distributionDrift(a, a)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(same == ((8L, 8L, 0.0, 0.0, 0.0)))
    val b = Seq((3L, "omega psi chi phi"), (4L, "psi chi upsilon tau"))
      .toDF("doc_id", "text")
    val (na, nb, klAb, klBa, js) = CorpusAnalytics.distributionDrift(a, b)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(na == 8L && nb == 8L)
    assert(klAb > 0 && klBa > 0, s"disjoint vocabularies must diverge ($klAb, $klBa)")
    assert(js > 0 && js <= math.log(2) + 1e-9, s"JS bounded by ln 2 ($js)")
  }

  test("psiStability: identical corpora are stable at 0; disjoint vocabularies band up") {
    val a = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma epsilon zeta"))
      .toDF("doc_id", "text")
    val same = CorpusAnalytics.psiStability(a, a)
      .as[(Long, Long, Double, String)].head()
    assert(same == ((8L, 8L, 0.0, "stable")))
    val b = Seq((3L, "omega psi chi phi"), (4L, "psi chi upsilon tau"))
      .toDF("doc_id", "text")
    val (na, nb, psi, band) = CorpusAnalytics.psiStability(a, b)
      .as[(Long, Long, Double, String)].head()
    assert(na == 8L && nb == 8L && psi > 0)
    assert(Set("stable", "moderate", "major").contains(band))
    // band is drawn from the displayed value
    assert((psi < 0.1) == (band == "stable"))
    assert((psi >= 0.1 && psi < 0.25) == (band == "moderate"))
  }

  test("driftAttribution: top buckets carry the moved vocabulary with exact masses") {
    // corpus A is dominated by one token absent from B: its bucket must
    // lead the attribution with the token as the sample
    val a = Seq((1L, Seq.fill(50)("driftword").mkString(" ")),
      (2L, "shared common words here")).toDF("doc_id", "text")
    val b = Seq((3L, "shared common words here"),
      (4L, "shared common words here")).toDF("doc_id", "text")
    val top = CorpusAnalytics.driftAttribution(a, b, k = 3)
      .as[(Long, Long, Long, String, Long, Long, Long)].collect()
    assert(top.length == 3)
    val lead = top.head
    assert(lead._4 == "driftword" && lead._2 == 50L && lead._3 == 0L)
    // exact integral ppm: 50 tokens of 54 on side A
    assert(lead._5 == 50L * 1000000L / 54L && lead._6 == 0L)
    assert(lead._7 > 0L, "the dominant moved bucket has a positive PSI term")
  }

  test("driftAttribution at k=buckets sums back to psiStability's statistic") {
    val a = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma epsilon zeta"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "omega psi chi phi"), (4L, "psi chi upsilon tau"))
      .toDF("doc_id", "text")
    val psi = CorpusAnalytics.psiStability(a, b)
      .as[(Long, Long, Double, String)].head()._3
    val termSum = CorpusAnalytics.driftAttribution(a, b, k = 1024)
      .agg(sum(col("psi_term_ppm"))).as[Long].head() / 1e6
    assert(math.abs(termSum - psi) < 1e-3,
      s"attribution terms must reconstruct PSI ($termSum vs $psi)")
  }

  test("contaminationProvenance: pair-level shared-gram evidence") {
    val train = Seq(
      (1L, "the quick brown fox jumps high"),   // shares grams with eval 100
      (2L, "totally unrelated training text body here")
    ).toDF("doc_id", "text")
    val evalD = Seq(
      (100L, "the quick brown fox sleeps"),     // 2 shared grams with doc 1
      (101L, "nothing in common at all")
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.contaminationProvenance(train, evalD)
      .orderBy("train_id", "eval_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc1 x eval100 share "the quick brown" and "quick brown fox"
    assert(got == Seq((1L, 100L, 2L)))
  }

  test("hashedFeatures: unit norm, duplicate texts identical, blanks zero") {
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "alpha beta alpha gamma"),  // duplicate text -> identical vector
      (3L, "omega psi chi"),
      (4L, "   ")                      // blank -> all-zero vector
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.hashedFeatures(docs, dim = 64)
      .orderBy("doc_id")
      .as[(Long, Seq[Float])].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_.length == 64))
    def norm(v: Seq[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm(got(1L)) - 1.0) < 1e-6)
    assert(got(1L) == got(2L), "identical texts must vectorize identically")
    assert(norm(got(4L)) == 0.0)
  }

  test("hashedFeatures feeds the similarity family: planted near-dup is top-1") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (3L, "completely different subject matter entirely here"),
      (4L, "unrelated tokens about storage engines and parquet")
    ).toDF("doc_id", "text")
    val vecs = CorpusAnalytics.hashedFeatures(docs, dim = 128)
    val query = vecs.filter($"doc_id" === 1)
      .select($"features").as[Seq[Float]].head()
    val top = graft.operators.Similarity.bruteForceTopK(
      vecs.filter($"doc_id" =!= 1), query, k = 1,
      vecCol = "features", idCol = "doc_id")
      .select($"doc_id").as[Long].head()
    assert(top == 2L, "text-only on-ramp must rank the near-duplicate first")
  }

  test("decontaminateBloom: expectedGrams above the session ceiling degrades, not fails") {
    // 1 << 24 items exceeds the default 4M maxNumItems conf — the operator
    // must clamp to the ceiling (higher realized fpp) instead of throwing
    val train = Seq((1L, "the quick brown fox jumps"), (2L, "unrelated text body here now"))
      .toDF("doc_id", "text")
    val evalD = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val got = CorpusAnalytics
      .decontaminateBloom(train, evalD, expectedGrams = 1L << 24)
      .filter($"contaminated").select("doc_id").as[Long].collect().toSet
    assert(got.contains(1L)) // still zero false negatives after the clamp
  }

  test("corpusOverlapSketch: identical corpora 1.0, disjoint 0.0, estimate near exact") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val even = docs.filter($"doc_id" % 2 === 0)
    val odd = docs.filter($"doc_id" % 2 === 1)
    val same = CorpusAnalytics.corpusOverlapSketch(even, even).head()
    assert(same.getAs[Double]("est_jaccard") == 1.0)
    val aSide = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val bSide = Seq((2L, "one two three four five six")).toDF("doc_id", "text")
    val disj = CorpusAnalytics.corpusOverlapSketch(aSide, bSide).head()
    assert(disj.getAs[Double]("est_jaccard") == 0.0)
    // tolerance contract vs the exact distinct-gram Jaccard: KMV stderr at
    // k=256 is sqrt(J(1-J)/256) ~ 0.027 here; 0.1 is a ~3.5 sigma band
    val est = CorpusAnalytics.corpusOverlapSketch(even, odd)
      .head().getAs[Double]("est_jaccard")
    val gramsOf = (d: org.apache.spark.sql.DataFrame) => d
      .filter(trim($"text") =!= "")
      .select(explode(Dedup.shingles($"text", 3)).as("g")).distinct()
    val ga = gramsOf(even).withColumnRenamed("g", "ga")
    val gb = gramsOf(odd).withColumnRenamed("g", "gb")
    val inter = ga.join(gb, $"ga" === $"gb").count().toDouble
    val exact = inter / (ga.count() + gb.count() - inter)
    assert(math.abs(est - exact) < 0.1, s"est $est vs exact $exact")
    // the distinct-count estimates land within 20% of the true counts
    val row = CorpusAnalytics.corpusOverlapSketch(even, odd).head()
    val estA = row.getAs[Double]("est_distinct_a")
    assert(math.abs(estA - ga.count()) / ga.count() < 0.2, s"est_distinct_a $estA")
  }

  test("duplicationSpectrum: hand case, shares sum to 1, mass equals pair count") {
    val docs = Seq(
      (1L, "a b c d"), // grams: "a b c", "b c d"
      (2L, "a b c x") // grams: "a b c", "b c x"
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.duplicationSpectrum(docs)
      .orderBy($"df").as[(Long, Long, Double)].collect().toSeq
    // "a b c" in both docs (df=2); "b c d"/"b c x" in one each (df=1)
    assert(got == Seq((1L, 2L, 0.6667), (2L, 1L, 0.3333)))
    val corpus = Tables(spark, sf("sf0.01"), "documents")
    val spec = CorpusAnalytics.duplicationSpectrum(corpus)
      .as[(Long, Long, Double)].collect()
    assert(math.abs(spec.map(_._3).sum - 1.0) < 0.01) // display rounding only
    // sum(df * n_grams) must equal the total (doc, distinct-gram) pairs
    val pairs = corpus.filter(trim($"text") =!= "")
      .select($"doc_id", explode(Dedup.shingles($"text", 3)).as("g")).count()
    assert(spec.map(r => r._1 * r._2).sum == pairs)
  }

  test("perplexityBands: bands are ce-ordered terciles, no-bigram docs excluded") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val got = CorpusAnalytics.perplexityBands(docs)
      .as[(Long, Double, String)].collect()
    val eligible = docs.filter(
      size(split(lower(trim($"text")), "\\s+")) >= 2 && trim($"text") =!= "").count()
    assert(got.length == eligible)
    val byBand = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBand.keySet == Set("head", "middle", "tail"))
    // bands partition the ce axis in order
    assert(byBand("head").max <= byBand("middle").min)
    assert(byBand("middle").max <= byBand("tail").min)
    // tercile cuts keep the bands within a few percent of n/3
    val n = got.length.toDouble
    byBand.values.foreach(b =>
      assert(math.abs(b.length - n / 3) < 0.05 * n, s"band size ${b.length} vs ${n / 3}"))
  }

  test("pmiCollocations: planted pair tops the list, hapax pairs suppressed") {
    // "new york" always adjacent; "a"/"b" frequent but independent; the
    // rare pair "rare gem" co-occurs once and must fall under minCount
    val docs = (1L to 40L).map { i =>
      (i, s"new york a b a b a b new york" + (if (i == 1) " rare gem" else ""))
    }.toDF("doc_id", "text")
    val got = CorpusAnalytics.pmiCollocations(docs, k = 10, minCount = 5)
      .as[(String, Long, Double)].collect()
    assert(got.head._1 == "new york", s"top was ${got.head}")
    assert(!got.exists(_._1 == "rare gem"))
    // PMI of the planted pair: p(ab) certainty vs unigram product
    assert(got.head._3 > got.last._3)
    // deterministic under re-run
    val again = CorpusAnalytics.pmiCollocations(docs, k = 10, minCount = 5)
      .as[(String, Long, Double)].collect()
    assert(got.toSeq == again.toSeq)
  }

  test("bootstrapCI: band brackets the observed mean, deterministic") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val got = CorpusAnalytics
      .bootstrapCI(docs, valueCol = "n_chars", groupCol = "source")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.length == docs.select("source").distinct().count())
    got.foreach { case (src, n, mean, lo, hi) =>
      assert(n > 0)
      assert(lo <= hi, s"$src: lo $lo > hi $hi")
      // a 95% band from 200 replicas must bracket the point estimate
      assert(lo <= mean && mean <= hi, s"$src: [$lo, $hi] misses $mean")
      // and be non-degenerate but far tighter than the value range
      assert(hi - lo > 0 && hi - lo < mean, s"$src: width ${hi - lo}")
    }
    val again = CorpusAnalytics
      .bootstrapCI(docs, valueCol = "n_chars", groupCol = "source")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.toSeq == again.toSeq)
  }

  test("vocabularyGrowth: hand case — first appearances, cumulative size") {
    // bucket 0 = docs 1..2, bucket 1 = docs 3..4 (4 docs, 2 buckets);
    // doc 3 repeats doc 1's vocab, doc 4 adds one new word
    val docs = Seq(
      (1L, "alpha beta"), (2L, "beta gamma"),
      (3L, "alpha beta"), (4L, "delta")
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.vocabularyGrowth(docs, buckets = 2, gramSize = 1)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == Seq((0, 3L, 3L), (1, 1L, 4L)))
    // saturated corpus: every later bucket introduces nothing -> one row
    val flat = Seq((1L, "x y"), (2L, "x y"), (3L, "y x"), (4L, "x")).toDF("doc_id", "text")
    val sat = CorpusAnalytics.vocabularyGrowth(flat, buckets = 2, gramSize = 1)
      .as[(Int, Long, Long)].collect().toSeq
    assert(sat == Seq((0, 2L, 2L)))
  }

  test("snapshotDiff: added/removed/changed/unchanged, normalization-blind") {
    val prev = Seq(
      (1L, "gone"), (2L, "same"), (3L, "old render"),
      (5L, "Hello  World")
    ).toDF("doc_id", "text")
    val cur = Seq(
      (2L, "same"), (3L, "new render"), (4L, "brand new"),
      (5L, "hello world") // case/whitespace churn only
    ).toDF("doc_id", "text")
    val got = CorpusAnalytics.snapshotDiff(prev, cur)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(got.toSeq == Seq(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"),
      (4L, "added"), (5L, "unchanged")))
  }

  test("bpePairStats: hand case — type-weighted pairs, ties lexicographic") {
    import spark.implicits._
    // low x2, lower x1: lo/ow carry 2+1, we/er carry 1; single-char and
    // blank tokens contribute nothing
    val docs = Seq((1L, "low low lower"), (2L, "a  "), (3L, "low")).toDF("doc_id", "text")
    val got = CorpusAnalytics.bpePairStats(docs, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("lo", 4L), ("ow", 4L), ("er", 1L), ("we", 1L)))
  }

  test("zipfSlope: exact power law fits slope -1, formula replayed") {
    import spark.implicits._
    // freqs 8,4,2,1 at ranks 1..4 are 2^-x on log2 — not a perfect ln-ln
    // line vs rank, so replay the exact OLS; then check a true 1/rank law
    val docs = Seq((1L, (("a " * 8) + ("b " * 4) + ("c " * 2) + "d").trim)).toDF("doc_id", "text")
    val got = CorpusAnalytics.zipfSlope(docs, n = 4)
      .as[(Long, Double, Double)].head()
    val xs = Seq(1, 2, 3, 4).map(r => math.log(r.toDouble))
    val ys = Seq(8, 4, 2, 1).map(f => math.log(f.toDouble))
    val n = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val intercept = sy / n - slope * (sx / n)
    assert(got._1 == 4L)
    assert(math.abs(got._2 - slope) < 1e-3 && math.abs(got._3 - intercept) < 1e-3)
    // exact 1/rank law: freqs 12,6,4,3 = 12/rank -> slope exactly -1
    val zdocs = Seq((1L, (("a " * 12) + ("b " * 6) + ("c " * 4) + ("d " * 3)).trim))
      .toDF("doc_id", "text")
    val z = CorpusAnalytics.zipfSlope(zdocs, n = 4).as[(Long, Double, Double)].head()
    assert(math.abs(z._2 - (-1.0)) < 1e-9, s"power-law slope ${z._2}")
  }

  test("distinctTokenSketch: exact counts grounded, union row merges sketches") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a", "s1"), (2L, "c d", "s1"),
      (3L, "a e", "s2"), (4L, " ", "s2")
    ).toDF("doc_id", "text", "source")
    val got = CorpusAnalytics.distinctTokenSketch(docs)
      .as[(String, Long, Boolean)].collect().toSeq
    // s1: {a,b,c,d} = 4; s2: {a,e} = 2; ALL: {a,b,c,d,e} = 5 (NOT 6 —
    // the union merges, it does not add)
    assert(got == Seq(("ALL", 5L, true), ("s1", 4L, true), ("s2", 2L, true)))
  }

  test("distinctTokenSketch: 5% band holds on the real corpus, every source") {
    import spark.implicits._
    val docs = Tables(spark, sf(), "documents")
    val got = CorpusAnalytics.distinctTokenSketch(docs)
      .as[(String, Long, Boolean)].collect()
    assert(got.length > 1 && got.forall(_._3),
      s"sketch out of band: ${got.filterNot(_._3).mkString(",")}")
  }
}
