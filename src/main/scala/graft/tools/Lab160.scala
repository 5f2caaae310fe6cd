package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: decompose q160_edit_join's candidate funnel at a given SF —
  * posting sizes, gram-equal pairs, location-filtered pairs, length-
  * filtered pairs, verified pairs — so the verify-stage cost has a
  * measured denominator instead of a guessed one.
  *   sbt "runMain graft.tools.Lab160 /root/testdata/sf0.1"
  */
object Lab160 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val q = 3; val tau = 1
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.Tables(spark, sfDir, "customer")
    val base = df.filter(col("c_name").isNotNull)
      .select(col("c_custkey").as("id"), col("c_name").as("s")).persist()
    println(s"[lab160] strings: ${base.count()}")
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
    val postings = prefix.persist()
    println(s"[lab160] postings: ${postings.count()}")
    val byGram = postings.groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("grams"), sum(col("n")).as("rows"),
        max(col("n")).as("maxPosting"),
        sum(col("n") * col("n")).as("sumSq")).collect()(0)
    println(s"[lab160] distinct prefix grams=${byGram.getLong(0)} rows=${byGram.getLong(1)} maxPosting=${byGram.getLong(2)} sum n^2=${byGram.getLong(3)}")
    val t0 = System.nanoTime()
    val gramEq = postings.as("p1").join(postings.as("p2"),
      col("p1.gram") === col("p2.gram") && col("p1.id") < col("p2.id")).count()
    println(f"[lab160] gram-equal ordered pairs: $gramEq (${(System.nanoTime()-t0)/1e9}%.2f s)")
    val t1 = System.nanoTime()
    val locOk = postings.as("p1").join(postings.as("p2"),
      col("p1.gram") === col("p2.gram") && col("p1.id") < col("p2.id") &&
        abs(col("p1.pos") - col("p2.pos")) <= tau).count()
    println(f"[lab160] + location filter: $locOk (${(System.nanoTime()-t1)/1e9}%.2f s)")
    val cand = postings.as("p1").join(postings.as("p2"),
      col("p1.gram") === col("p2.gram") && col("p1.id") < col("p2.id") &&
        abs(col("p1.pos") - col("p2.pos")) <= tau)
      .select(col("p1.id").as("id1"), col("p2.id").as("id2"))
    val t2 = System.nanoTime()
    val lenOk = cand
      .join(base.select(col("id").as("id1"), length(col("s")).as("l1")), "id1")
      .join(base.select(col("id").as("id2"), length(col("s")).as("l2")), "id2")
      .filter(abs(col("l1") - col("l2")) <= tau).count()
    println(f"[lab160] + length filter: $lenOk (${(System.nanoTime()-t2)/1e9}%.2f s)")
    val t3 = System.nanoTime()
    val verified = cand
      .join(base.select(col("id").as("id1"), col("s").as("s1")), "id1")
      .join(base.select(col("id").as("id2"), col("s").as("s2")), "id2")
      .filter(abs(length(col("s1")) - length(col("s2"))) <= tau)
      .withColumn("dist", levenshtein(col("s1"), col("s2"), tau).cast("long"))
      .filter(col("dist") >= 0).count()
    println(f"[lab160] verified (pre-distinct): $verified (${(System.nanoTime()-t3)/1e9}%.2f s)")
    spark.stop()
  }
}
