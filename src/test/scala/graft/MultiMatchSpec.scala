package graft

import graft.functions.MultiMatch
import org.apache.spark.sql.functions._

class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, pats: Seq[String]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(MultiMatch.multi_match($"t", pats).as("m"))
      .as[Seq[String]].head()

  test("classic overlapping-pattern automaton (he/she/his/hers)") {
    // "ushers" contains she, he, hers — the fail-link outputs — but not his
    assert(run("ushers", Seq("he", "she", "his", "hers")) == Seq("he", "hers", "she"))
    assert(run("his house", Seq("he", "she", "his", "hers")) == Seq("his"))
    assert(run("his hero", Seq("he", "she", "his", "hers")) == Seq("he", "his"))
    assert(run("nothing here", Seq("xyz", "qqq")) == Nil)
  }

  test("null text, duplicate patterns, prefix/suffix positions") {
    val r = Seq((1L, "abc"), (2L, null)).toDF("id", "t")
      .select($"id", MultiMatch.multi_match($"t", Seq("ab", "bc", "ab")).as("m"))
      .orderBy("id").as[(Long, Option[Seq[String]])].collect()
    assert(r(0)._2.get == Seq("ab", "bc")) // dup pattern collapsed, both ends hit
    assert(r(1)._2.isEmpty) // NULL in -> NULL out
  }

  test("agrees with per-pattern contains() over the real corpus") {
    val pats = Seq("merge batch", "row scan", "window", "shuffle")
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val auto = docs
      .select($"doc_id", explode(MultiMatch.multi_match($"text", pats)).as("p"))
      .as[(Long, String)].collect().sorted
    val brute = pats.flatMap { p =>
      docs.filter($"text".contains(p)).select($"doc_id").as[Long]
        .collect().map(id => (id, p))
    }.sorted
    assert(auto.toSeq == brute)
  }

  test("SQL-callable via graft extensions") {
    graft.GraftSqlFunctions.register(spark)
    val m = spark.sql("SELECT multi_match('ushers', 'he', 'she', 'his', 'hers') AS m")
      .as[Seq[String]].head()
    assert(m == Seq("he", "hers", "she"))
  }
}
