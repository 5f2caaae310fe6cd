package graft.tools

import graft.functions.{MinHashSignature, SimHash, VectorOps, WordShingles, HyperplaneSig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostics main for interactive debugging. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      // fail loudly if the generated Java for our Expressions doesn't
      // compile, instead of silently dropping to interpreted mode
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox", Array(1.0f, 2.0f, 3.0f)))
      .toDF("id", "text", "vec")
    val out = docs.select(
      WordShingles.word_shingles(col("text"), 2).as("sh"),
      MinHashSignature.minhash_signature(
        WordShingles.word_shingles(col("text"), 2), 8).as("mh"),
      SimHash.simhash64(split(col("text"), " ")).as("simhash"),
      VectorOps.vector_dot(col("vec"), col("vec")).as("dot"),
      VectorOps.vector_norm(col("vec")).as("norm"),
      HyperplaneSig.hyperplane_sig(col("vec"), 4).as("sig"))
    out.collect().foreach(println)
    println("CODEGEN_OK")
    spark.stop()
  }
}
