package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off wall-time scaling probe (VERDICT r14 item 6): time the heavy
  * kernels at sf0.1 and at the ~3x vocabulary-isolated slice
  * `tools/make_sf03.py` builds, and report the per-kernel scale factor.
  * The 100x claims for these kernels rest on plan shape (candidate
  * generation bounded by postings/cluster/prefix disciplines); a
  * superlinear reading here means one of those bounds is looser than
  * claimed. Expect ~linear (factor ~3 on 3x rows) modulo fixed overhead.
  *
  * Usage: runMain graft.tools.ScaleProbe [dirA] [dirB] [reps] [q,...]
  */
object ScaleProbe {
  private val DefaultKernels = Seq(
    "q108_containment_pairs",
    "q100_semantic_dedup",
    "q22_ngram_jaccard",
    "q20_minhash_lsh",
    "q160_edit_join",
    "q236_substr_pairs")

  def main(args: Array[String]): Unit = {
    val dirA = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dirB = if (args.length > 1) args(1) else "/tmp/graft_sf03"
    val reps = if (args.length > 2) args(2).toInt else 3
    val kernels = if (args.length > 3) args(3).split(",").toSeq else DefaultKernels
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String, dir: String): (Double, Long) = {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm-up pass, discarded
      spark.catalog.clearCache()
      var rows = 0L
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        rows = fn(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }.sorted
      (secs(reps / 2), rows)
    }

    graft.Tables(spark, dirA, "documents").count() // warm session
    println(f"${"kernel"}%-28s ${"tA(s)"}%8s ${"tB(s)"}%8s ${"factor"}%7s ${"rowsA"}%8s ${"rowsB"}%8s")
    kernels.foreach { q =>
      val (ta, ra) = time(q, dirA)
      val (tb, rb) = time(q, dirB)
      println(f"$q%-28s $ta%8.2f $tb%8.2f ${tb / ta}%7.2f $ra%8d $rb%8d")
    }
    spark.stop()
  }
}
