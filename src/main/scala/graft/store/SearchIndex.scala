package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Per-file character-trigram sidecar index for substring search — the
  * analog of the reference's trigram GIN index on `logs.message`
  * (reference: alembic/versions/37716151a213_initialise_database.py:36,
  * pg_trgm extension at :21). Postgres GIN maps trigram -> row ids; at
  * 100 TB the Spark-native granularity is trigram -> FILE: an
  * unconstrained `ILIKE '%needle%'` prunes to the files whose trigram
  * set covers the needle's trigrams, instead of scanning the table.
  *
  * Layout: one sidecar row per data file — `(file, buckets ARRAY<INT>)`,
  * the file's distinct lowercased text trigrams hashed into
  * [[SearchIndex.NumBuckets]] buckets (a per-file bloom with k=1 and an
  * explicit sorted-set representation; parquet RLE+dict makes the sorted
  * int arrays tiny). Stored under `<table>/_searchidx` — the underscore
  * prefix makes it invisible to normal reads of the table path.
  *
  * Query path: extract the literal runs from each LIKE pattern (the text
  * between `%`/`_` wildcards); a file is a candidate for a pattern iff its
  * bucket set contains EVERY trigram bucket of that pattern's literals
  * (zero false negatives — a file containing the substring necessarily
  * contains all its trigrams; false positives only cost a scan of that
  * file). Files appended after the last [[build]] are always candidates
  * (stale-index safety), so the index can be maintained offline like the
  * compaction pass — it accelerates, never filters, correctness.
  *
  * Scale: the pruning query reads only the sidecar (one row per file —
  * ~millions of rows at 100 TB, a sub-second scan), and the candidate
  * list drives a normal pruned parquet read with `basePath` set so hive
  * partition columns survive. Patterns whose literals are all shorter
  * than the trigram width cannot prune and fall back to the full scan.
  */
object SearchIndex {

  /** Trigram width (pg_trgm uses 3). */
  val N = 3

  /** Bucket space for trigram hashing. Distinct trigrams of lowercased
    * text are at most ~50k in practice; 2^20 buckets keeps per-file
    * false-positive rates negligible while the sorted int array stays
    * dictionary-compressible.
    */
  val NumBuckets = 1 << 20

  private val Seed = 42L // Spark's xxhash64 default seed

  private def indexPath(tableRoot: String) = s"$tableRoot/_searchidx"

  /** Distinct character n-grams of `lower(c)`, hashed to bucket ids.
    * `sequence(a, b)` with b < a counts DOWN in Spark, so short strings
    * are guarded explicitly to yield an empty array.
    */
  def trigramBuckets(c: Column): Column = {
    val s = lower(c)
    val grams = when(s.isNull || length(s) < N, array())
      .otherwise(transform(
        sequence(lit(1), length(s) - N + 1),
        i => s.substr(i, lit(N))))
    array_distinct(transform(grams,
      g => pmod(xxhash64(g), lit(NumBuckets)).cast("int")))
  }

  /** Same bucket function, driver-side, for hashing query literals —
    * must match [[trigramBuckets]] bit-for-bit (Spark's `xxhash64` is
    * XxHash64Function at seed 42).
    */
  def bucketOf(gram: String): Int = {
    val h = XxHash64Function.hash(UTF8String.fromString(gram), StringType, Seed)
    java.lang.Math.floorMod(h, NumBuckets.toLong).toInt
  }

  /** Build (or rebuild) the sidecar for every data file under
    * `tableRoot`. One pass over the table: per-row distinct trigrams
    * explode against `input_file_name`, one (file, bucket) distinct
    * shuffle, then a per-file collect_set — fully distributed, no
    * driver-side text.
    */
  def build(spark: SparkSession, tableRoot: String, textCol: String): Unit =
    spark.read.parquet(tableRoot)
      .select(input_file_name().as("file"),
        explode(trigramBuckets(col(textCol))).as("bucket"))
      .distinct()
      .groupBy("file")
      .agg(sort_array(collect_set(col("bucket"))).as("buckets"))
      .write.mode("overwrite").parquet(indexPath(tableRoot))

  /** Literal runs of a SQL LIKE pattern: the text between `%` / `_`
    * wildcards (no escape handling — the reference's query surface,
    * conftest.py:169-174, interpolates plain substrings). Lowercased to
    * match the case-insensitive ILIKE semantics.
    */
  private[graft] def literalRuns(pattern: String): Seq[String] =
    pattern.toLowerCase(java.util.Locale.ROOT)
      .split("[%_]").toSeq.filter(_.nonEmpty)

  /** Required trigram buckets for one pattern — every trigram of every
    * literal run must be present in a candidate file. None when no run
    * is trigram-wide (the pattern cannot prune).
    */
  private[graft] def requiredBuckets(pattern: String): Option[Seq[Int]] = {
    val grams = literalRuns(pattern)
      .filter(_.length >= N)
      .flatMap(_.sliding(N))
      .distinct
    if (grams.isEmpty) None else Some(grams.map(bucketOf))
  }

  /** All data files currently under the table (driver-side listing —
    * the same footprint as Spark's own file-index build), hidden dirs
    * (`_searchidx`, `_SUCCESS`, dot-files) excluded.
    */
  private def listDataFiles(spark: SparkSession, tableRoot: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(tableRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          if (st.isDirectory) walk(st.getPath)
          else if (name.endsWith(".parquet")) out += st.getPath.toUri.toString
        }
      }
    walk(root)
    out.toSeq
  }

  /** Candidate files for an ILIKE-ANY over `patterns`: files the sidecar
    * proves compatible with at least one pattern, plus any file the
    * sidecar has never seen (appended since the last [[build]]). Returns
    * None when any pattern lacks a trigram-wide literal — then nothing
    * can be excluded and the caller should full-scan.
    */
  def candidateFiles(
      spark: SparkSession,
      tableRoot: String,
      patterns: Seq[String]): Option[Seq[String]] = {
    val required = patterns.map(requiredBuckets)
    if (required.exists(_.isEmpty)) return None
    val idx = spark.read.parquet(indexPath(tableRoot))
    val cond = required.flatten
      .map(bs => bs.map(b => array_contains(col("buckets"), b)).reduce(_ && _))
      .reduce(_ || _)
    val matched = idx.filter(cond).select(col("file"))
      .collect().map(_.getString(0))
    val indexed = idx.select(col("file")).collect().map(_.getString(0)).toSet
    val unindexed = listDataFiles(spark, tableRoot).filterNot(indexed)
    Some((matched ++ unindexed).distinct)
  }

  /** Index-accelerated `message ILIKE ANY(patterns)` over a stored
    * table: prune files via the sidecar, read only the candidates
    * (`basePath` keeps hive partition columns), then apply the exact
    * predicate — identical semantics to the full scan, fewer bytes read.
    */
  def search(
      spark: SparkSession,
      tableRoot: String,
      patterns: Seq[String],
      textCol: String): DataFrame = {
    val full = spark.read.parquet(tableRoot)
    val exact = patterns
      .map(p => lower(col(textCol)).like(p.toLowerCase(java.util.Locale.ROOT)))
      .reduce(_ || _)
    candidateFiles(spark, tableRoot, patterns) match {
      case None => full.filter(exact)
      case Some(files) if files.isEmpty => full.filter(lit(false))
      case Some(files) =>
        spark.read.option("basePath", tableRoot)
          .parquet(files: _*).filter(exact)
    }
  }
}
