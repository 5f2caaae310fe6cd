package graft

import graft.operators.GroupTopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  test("topK: k best per group, score desc, id-asc ties, small groups intact") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
      ("b", 5L, 1.0)
    ).toDF("g", "id", "v")
    val got = GroupTopK.topK(df, Seq("g"), col("v"), col("id"), 2)
      .select("g", "rnk", "id").as[(String, Long, Long)].collect().toSet
    // group a: 30.0 ties -> id 2 before id 4; group b: single row survives
    assert(got == Set(("a", 1L, 2L), ("a", 2L, 4L), ("b", 1L, 5L)))
  }

  test("topK agrees with window row_number on real data") {
    val docs = Tables(spark, sf(), "documents")
    val got = GroupTopK.topK(docs, Seq("lang", "source"),
      col("n_chars").cast("double") * (1L << 33).toDouble - col("doc_id"),
      col("doc_id"), 3)
      .select("lang", "source", "rnk", "id")
      .as[(String, String, Long, Long)].collect().toSet
    val w = Window.partitionBy("lang", "source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val expect = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("lang"), col("source"), col("rk").cast("long"), col("doc_id"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }
}
