package graft

import graft.query.LogsTable
import org.apache.spark.sql.functions._

class VariantSpec extends SparkSpec {
  import spark.implicits._

  private lazy val logs = Seq(
    """{"filename":"sender.py","lineno":42,"random_timing_data":1.25,"nested":{"msg":"true story"}}""",
    """{"filename":"other.py","lineno":"not-a-number"}"""
  ).toDF("data_raw")

  test("variantField: typed access, NULL on mismatch/absence") {
    val lt = LogsTable(logs).withVariantPayload()
    val got = lt.df.select(
      lt.variantField("filename").as("f"),
      lt.variantField("lineno", "int").as("l"),
      lt.variantField("random_timing_data", "double").as("r"),
      lt.variantField("nested.msg").as("n"))
      .as[(Option[String], Option[Int], Option[Double], Option[String])]
      .collect().toSeq
    assert(got == Seq(
      (Some("sender.py"), Some(42), Some(1.25), Some("true story")),
      (Some("other.py"), None, None, None)))
  }

  test("variant round-trips through parquet storage") {
    val dir = java.nio.file.Files.createTempDirectory("graft-variant").toString
    LogsTable(logs).withVariantPayload().df.write.parquet(s"$dir/t")
    val back = spark.read.parquet(s"$dir/t")
    val got = back.select(
      try_variant_get(col("data"), "$.filename", "string").as("f"))
      .as[Option[String]].collect().toSet
    assert(got == Set(Some("sender.py"), Some("other.py")))
  }
}
