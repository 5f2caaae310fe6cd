package graft

import org.apache.spark.sql.functions._

/** The fused governance card (q217, r16 VERDICT item 4) must agree
  * column-for-column with the r16 five-standalone-leg composition it
  * replaced — the KGroupCardSpec contract on the audit-card axis. The
  * expected side below IS the r16 q217 body verbatim (separate documents
  * scans per leg, two-DataFrame psiStability/ksTest), so any drift
  * between the fused shared-projection/sided-scan plan and the standalone
  * operators fails here, not in the driver's hash two rounds later.
  */
class GovernanceCardSpec extends SparkSpec {

  private def r16Card(dir: String) = {
    val s = spark
    val d = Tables(s, dir, "documents")
      .filter(col("text").isNotNull && col("source").isNotNull)
    val toks = split(lower(trim(col("text"))), "\\s+")
    val stops = filter(toks, t =>
      t.isin(functions.TextAnalysis.DefaultStopwords.map(lit(_)): _*))
    val cal = operators.Quality.calibrationSummary(
      d, size(stops).cast("long"), size(toks).cast("long"),
      col("source") === "src0")
      .select(col("n").as("n_docs"), col("n_pos").as("n_src0"),
        col("ece_bp"), col("brier_bp"))
    val fair = operators.Quality.fairnessGaps(d, "lang",
      size(stops).cast("long"), size(toks).cast("long"),
      col("source") === "src0", thrNum = 3L, thrDen = 20L)
      .select(col("n_groups"), col("parity_gap_bp"), col("eo_gap_bp"))
    val docs = Tables(s, dir, "documents")
    val drift = operators.CorpusAnalytics.psiStability(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0),
      docs.filter(pmod(col("doc_id"), lit(2)) === 1))
      .select(floor(col("psi") * 10000 + lit(0.5)).cast("long").as("psi_bp"))
    val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
    val ks = operators.Quality.ksTest(
      ev.filter(pmod(col("event_id"), lit(2)) === 0),
      ev.filter(pmod(col("event_id"), lit(2)) === 1),
      "value")
      .select(floor(col("ks_d") * 10000 + lit(0.5)).cast("long")
        .as("ks_d_bp"))
    val dsp = Tables(s, dir, "documents").filter(col("text").isNotNull)
    val sp = operators.Quality.spearmanCorrelation(dsp,
      functions.TextAnalysis.stopwordRatio(col("text")),
      functions.TextAnalysis.tokenCount(col("text")),
      "doc_id")
      .select(floor(col("rho") * 10000 + lit(0.5)).cast("long")
        .as("spearman_bp"))
    cal.crossJoin(broadcast(fair)).crossJoin(broadcast(drift))
      .crossJoin(broadcast(ks)).crossJoin(broadcast(sp))
  }

  test("fused card equals the r16 five-leg composition column-for-column") {
    val dir = sf()
    val fused = SparkEntry.queries("q217_governance_card")(spark, dir).head()
    val legs = r16Card(dir).head()
    assert(fused.schema.fieldNames.toSeq == legs.schema.fieldNames.toSeq,
      s"schema drift: ${fused.schema.fieldNames.toSeq} vs " +
        s"${legs.schema.fieldNames.toSeq}")
    for (f <- fused.schema.fieldNames) {
      val i = fused.fieldIndex(f)
      assert(fused.get(i) == legs.get(i),
        s"column $f: fused=${fused.get(i)} standalone=${legs.get(i)}")
    }
    spark.catalog.clearCache()
  }

  test("sided KS equals two-frame KS on the same split") {
    val ev = Tables(spark, sf(), "events").filter(col("value").isNotNull)
    val two = operators.Quality.ksTest(
      ev.filter(pmod(col("event_id"), lit(2)) === 0),
      ev.filter(pmod(col("event_id"), lit(2)) === 1), "value").head()
    val one = operators.Quality.ksTestSided(
      ev.withColumn("_side", pmod(col("event_id"), lit(2)).cast("int")),
      "value", "_side").head()
    assert(two == one, s"$two vs $one")
  }

  test("sided PSI equals two-frame PSI on the same split") {
    val docs = Tables(spark, sf(), "documents")
    val two = operators.CorpusAnalytics.psiStability(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0),
      docs.filter(pmod(col("doc_id"), lit(2)) === 1)).head()
    val one = operators.CorpusAnalytics.psiStabilitySided(
      docs.withColumn("_side", pmod(col("doc_id"), lit(2)).cast("int")),
      "_side").head()
    assert(two == one, s"$two vs $one")
  }
}
