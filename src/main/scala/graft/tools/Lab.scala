package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for stage-by-stage timing experiments during the
  * optimization rounds. Contents change per experiment; not a runtime
  * surface.
  */
object Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables(spark, sfDir, "lineitem").count()
    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[lab] $label pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n)")
      }
    }

    // ---- q236 stage dissection ----
    val n = 3; val dfCap = 128
    val docs = graft.Tables(spark, sfDir, "documents")
    val toks = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id").as("id"), split(col("text"), " ", -1).as("ts"))
    val grams = toks
      .filter(size(col("ts")) >= n)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), size(col("ts")) - n),
        i => xxhash64(concat_ws(" ", slice(col("ts"), i + 1, lit(n)))))).as(Seq("pos", "gram")))
      .persist()
    time("grams count")(grams.count())
    val keep = grams
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= 2 && col("_c") <= dfCap)
      .select(col("gram"))
    time("keep count")(keep.count())
    val kept = grams.join(keep, "gram").persist()
    time("kept count")(kept.count())
    val matches = kept
      .join(kept.select(col("gram"), col("id").as("_bid"), col("pos").as("_bpos")),
        Seq("gram"))
      .filter(col("id") < col("_bid"))
      .select(col("id").as("a_id"), col("_bid").as("b_id"),
        col("pos").as("apos"), (col("pos") - col("_bpos")).as("diag"))
    time("matches count")(matches.count())
    val runs = matches
      .groupBy(col("a_id"), col("b_id"), col("diag"))
      .agg(sort_array(collect_list(col("apos"))).as("ps"))
    time("runs count")(runs.count())
    spark.stop()
  }
}
