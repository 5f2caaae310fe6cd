package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: exact recall of the LSH-prefiltered n-gram Jaccard pass
  * (q22's operator) vs a Spark-side brute-force all-pairs pass at a given
  * SF — validates the candidate generator beyond the sf0.01 oracle.
  * Usage: runMain graft.tools.RecallLsh [sfDir] [threshold]
  */
object RecallLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val threshold = if (args.length > 1) args(1).toDouble else 0.1
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables(spark, sfDir, "documents")
    val lsh = Dedup.ngramJaccardPairs(docs, n = 3, threshold = threshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute force: shingle once, all pairs via self-join on a dummy key split
    // into ranges to keep tasks balanced
    val sh = docs.filter(trim(col("text")) =!= "")
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .persist()
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    val exact = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("j", when(union === 0, 0.0).otherwise(inter / union))
      .filter(col("j") >= threshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val missed = exact -- lsh
    val extra = lsh -- exact
    println(s"RECALL_LSH sf=$sfDir threshold=$threshold exact=${exact.size} " +
      s"lsh=${lsh.size} missed=${missed.size} extra=${extra.size} " +
      s"recall=${if (exact.isEmpty) 1.0 else (exact.size - missed.size).toDouble / exact.size}")
    spark.stop()
  }
}
