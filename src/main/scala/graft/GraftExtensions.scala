package graft

import graft.functions._
import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SQL surface for the custom Catalyst expressions: every graft Expression
  * becomes a SQL function, so `spark.sql("SELECT word_shingles(text, 3) ...")`
  * works exactly like the Column API — the reference's whole query surface is
  * SQL (reference: README.rst:84-103, doc/metabase-instructions.rst), so SQL
  * parity for our additions is part of capability parity.
  *
  * Two registration paths, same builders:
  *  - build-time: `.config("spark.sql.extensions", "graft.GraftExtensions")`
  *    or `.withExtensions(new GraftExtensions)` on the session builder;
  *  - runtime: [[GraftSqlFunctions.register]] on an already-built session
  *    (what SparkEntry uses — the driver owns its SparkSession).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSqlFunctions.registrations.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftExtensions", null, name, usage, ""),
        builder))
    }
}

object GraftSqlFunctions {

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$fn: argument must be an INT literal, got $other")
  }

  private def litStrings(args: Seq[Expression], fn: String): Seq[String] =
    args.map {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: arguments must be STRING literals, got $other")
    }

  /** (name, usage, builder) for every exposed function. */
  val registrations: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("word_shingles",
      "word_shingles(text, n) - distinct lowercase word n-gram shingles",
      (args: Seq[Expression]) => WordShingles(args(0), litInt(args(1), "word_shingles"))),
    ("minhash_signature",
      "minhash_signature(shingles, k) - k-element MinHash signature",
      (args: Seq[Expression]) => MinHashSignature(args(0), litInt(args(1), "minhash_signature"))),
    ("simhash64",
      "simhash64(tokens) - 64-bit SimHash of a token array",
      (args: Seq[Expression]) => SimHash(args(0))),
    ("vector_dot",
      "vector_dot(a, b) - inner product of float/double arrays (NULL-safe)",
      (args: Seq[Expression]) => VectorDot(args(0), args(1))),
    ("vector_norm",
      "vector_norm(a) - L2 norm of a float/double array (NULL-safe)",
      (args: Seq[Expression]) => VectorNorm(args(0))),
    ("hyperplane_sig",
      "hyperplane_sig(v, planes) - random-hyperplane LSH signature bits",
      (args: Seq[Expression]) => HyperplaneSig(args(0), litInt(args(1), "hyperplane_sig"))),
    ("json_drop_keys",
      "json_drop_keys(json, k1, k2, ...) - remove top-level keys from a JSON object",
      (args: Seq[Expression]) => JsonDropKeys(args.head, litStrings(args.tail, "json_drop_keys"))),
    ("misra_gries",
      "misra_gries(key, k) - heavy-hitters sketch aggregate: ~top-k keys with counts",
      (args: Seq[Expression]) => MisraGries(args(0), litInt(args(1), "misra_gries"))),
    ("multi_match",
      "multi_match(text, p1, p2, ...) - sorted subset of the literal patterns occurring in text (Aho-Corasick, one scan)",
      (args: Seq[Expression]) => MultiMatch(args.head, litStrings(args.tail, "multi_match"))),
    ("sorted_intersect_count",
      "sorted_intersect_count(a, b) - |A∩B| of two sorted BIGINT arrays (merge scan)",
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    ("positional_agree_count",
      "positional_agree_count(a, b) - positions where two BIGINT arrays hold equal values",
      (args: Seq[Expression]) => PositionalAgreeCount(args(0), args(1))),
    ("top_k_pairs",
      "top_k_pairs(struct(score, id), k) - bounded top-k aggregate over (score, id) pairs",
      (args: Seq[Expression]) => TopKPairs(args(0), litInt(args(1), "top_k_pairs"))),
    ("kll_sketch",
      "kll_sketch(CAST(x AS DOUBLE), k) - KLL mergeable quantile sketch: struct(n, items[(v, w)])",
      (args: Seq[Expression]) => KllDoubleSketch(args(0), litInt(args(1), "kll_sketch"))),
    // Spark ships these two for runtime join filtering but leaves them out
    // of the public registry; expose them so SQL/BI users get the same
    // Bloom set-membership path decontaminateBloom uses
    ("bloom_agg",
      "bloom_agg(xxhash64(x), items, bits) - Bloom-filter bitmap aggregate over LONG hashes",
      (args: Seq[Expression]) => new BloomFilterAggregate(args(0), args(1), args(2))),
    ("bloom_might_contain",
      "bloom_might_contain(filter, xxhash64(x)) - membership probe, no false negatives; " +
        "filter must be a constant or scalar subquery, e.g. (SELECT bloom_agg(...) FROM ...)",
      (args: Seq[Expression]) => BloomFilterMightContain(args(0), args(1)))
  )

  /** Runtime registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      GraftBridge.registerTempFunction(spark, name, builder)
    }
}
