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
    // ---- q160: dedup candidates before the attach-joins? ----
    val q = 3; val tau = 1
    val df0 = graft.Tables(spark, sfDir, "customer")
    val base = df0.filter(col("c_name").isNotNull)
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
      .persist()
    val grams = base
      .filter(length(col("s")) >= q)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), length(col("s")) - q),
        i => col("s").substr(i + 1, lit(q)))).as(Seq("pos", "gram")))
    val dfreq = grams.select(col("id"), col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val prefix = grams
      .join(dfreq, "gram")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("gram"), col("pos")))).as("gd"))
      .select(col("id"), explode(slice(col("gd"), 1, q * tau + 1)).as("e"))
      .select(col("id"), col("e").getField("gram").as("gram"),
        col("e").getField("pos").as("pos"))
    val postings = prefix
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .persist()
    postings.count()
    val candidates = postings.as("p1")
      .join(postings.as("p2"),
        col("p1.gram") === col("p2.gram") && col("p1.id") < col("p2.id") &&
          abs(col("p1.pos") - col("p2.pos")) <= tau)
      .select(col("p1.id").as("id1"), col("p2.id").as("id2"))
    def verify(c: org.apache.spark.sql.DataFrame) = c
      .join(base.select(col("id").as("id1"), col("s").as("s1")), "id1")
      .join(base.select(col("id").as("id2"), col("s").as("s2")), "id2")
      .filter(abs(length(col("s1")) - length(col("s2"))) <= tau)
      .withColumn("dist", levenshtein(col("s1"), col("s2"), tau).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id1"), col("id2"), col("dist"))
    time("A: distinct candidates count")(candidates.distinct().count())
    time("B: verify(distinct cands), no final distinct")(verify(candidates.distinct()).count())
    time("C: current verify(raw) + distinct")(verify(candidates).distinct().count())
    spark.stop()
  }
}
