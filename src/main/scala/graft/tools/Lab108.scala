package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostics for q108_containment_pairs: decompose the
  * PPJoin pipeline into legs (perDoc build, prefix/probe cardinalities,
  * candidate join, verify) and time each with the noop sink so we know
  * which leg to optimize before touching the operator.
  *   sbt "runMain graft.tools.Lab108 /root/testdata/sf0.1"
  */
object Lab108 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lab108] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables(spark, sfDir, "documents")
    docs.count() // warm

    import graft.operators.Dedup.shingles
    val n = 3; val tauNum = 3; val tauDen = 5
    val textCol = "text"; val idCol = "doc_id"
    val grams = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol),
        explode(transform(shingles(col(textCol), n), g => xxhash64(g))).as("gram"))
    println(s"[lab108] total gram occurrences = ${grams.count()}")
    val df = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    println(s"[lab108] distinct grams = ${df.count()}")
    val perDoc = grams
      .join(df, "gram")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("df"), col("gram")))).as("gd"))
      .select(col(idCol),
        transform(col("gd"), e => e("gram")).as("gs"),
        size(col("gd")).cast("long").as("m"))
      .persist()
    t("perDoc materialize")(noop(perDoc))
    val prefix = perDoc
      .select(col(idCol).as("a_id"), col("m").as("m_a"),
        explode(slice(col("gs"), lit(1),
          (col("m") - floor((col("m") * tauNum + (tauDen - 1)) / tauDen) + 1)
            .cast("int"))).as("gram"))
    println(s"[lab108] prefix rows = ${prefix.count()}")
    val probe = perDoc
      .select(col(idCol).as("b_id"), col("m").as("m_b"),
        explode(col("gs")).as("gram"))
    println(s"[lab108] probe rows = ${probe.count()}")
    val candidates = probe
      .join(prefix, "gram")
      .filter(col("a_id") =!= col("b_id") &&
        col("m_b") * tauDen >= col("m_a") * tauNum)
      .select(col("a_id"), col("b_id"))
    println(s"[lab108] raw candidate rows (pre-distinct) = ${t("cand pre-distinct count")(candidates.count())}")
    val cand2 = candidates.distinct()
    println(s"[lab108] distinct candidates = ${t("cand distinct count")(cand2.count())}")
    val pairs = cand2
      .join(perDoc.select(col(idCol).as("a_id"), col("gs").as("ga"),
        col("m").as("n_a")).hint("SHUFFLE_HASH"), "a_id")
      .join(perDoc.select(col(idCol).as("b_id"), col("gs").as("gb"))
        .hint("SHUFFLE_HASH"), "b_id")
      .select(col("a_id"), col("b_id"), col("n_a"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("n_inter"))
      .filter(col("n_inter") * tauDen >= col("n_a") * tauNum)
    t("verify leg")(noop(pairs))
    t("full operator (fresh, end to end)") {
      spark.catalog.clearCache()
      graft.operators.Dedup.containmentPairs(docs).count()
    }
    spark.stop()
  }
}
