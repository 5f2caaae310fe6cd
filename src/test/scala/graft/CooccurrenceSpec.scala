package graft

import graft.operators.{CorpusAnalytics, Sessions}
import java.sql.Timestamp

/** Windowed PMI and association rules: window-distance sensitivity,
  * planted associations, and hand-computed support/confidence/lift.
  */
class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  test("windowed PMI catches pairs adjacent PMI is blind to") {
    // "alpha" and "beta" always at distance 2, never adjacent
    val docs = (1L to 10L).map(i => (i, "alpha mid beta"))
      .toDF("doc_id", "text")
    val wide = CorpusAnalytics.windowedPmi(docs, win = 2, minCount = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(wide.contains("alpha beta") && wide("alpha beta") == 10L)
    val narrow = CorpusAnalytics.windowedPmi(docs, win = 1, minCount = 5)
      .collect().map(_.getString(0)).toSet
    assert(!narrow.contains("alpha beta"))
    assert(narrow.contains("alpha mid") && narrow.contains("beta mid"))
  }

  test("planted pair outranks an independent one") {
    // "p q" always together; "u"/"v" appear equally often but never near
    val docs = ((1L to 10L).map(i => (i, "p q filler" + i % 7)) ++
      (11L to 20L).map(i => (i, "u w1 w2 w3 w4 v" + i % 3)))
      .toDF("doc_id", "text")
    val out = CorpusAnalytics.windowedPmi(docs, win = 3, minCount = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.contains("p q"))
    assert(!out.contains("u v")) // distance 5 > window
  }

  test("hand-computed association rules") {
    def ev(id: Long, u: Long, t: String) = (id, new Timestamp(id * 1000), u, t)
    val events = Seq(
      ev(1, 1, "x"), ev(2, 1, "y"), ev(3, 1, "x"), // duplicates collapse
      ev(4, 2, "x"), ev(5, 2, "y"),
      ev(6, 3, "x"),
      ev(7, 4, "z")).toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessions.associationRules(events, minSupport = 0.01)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // x -> y: both in 2 of 4 users; x in 3, y in 2
    assert(out(("x", "y")) == ((2L, 0.5, 0.6667, 1.3333)))
    // y -> x: confidence 1.0 (every y user has x), same lift
    assert(out(("y", "x")) == ((2L, 0.5, 1.0, 1.3333)))
    // z co-occurs with nothing
    assert(!out.keys.exists(k => k._1 == "z" || k._2 == "z"))
  }

  test("lift separates association from popularity") {
    def ev(id: Long, u: Long, t: String) = (id, new Timestamp(id * 1000), u, t)
    // "pop" appears for every user; "a" and "b" appear together only
    val rows = (1L to 8L).flatMap { u =>
      val base = Seq(ev(u * 10, u, "pop"))
      if (u <= 2) base ++ Seq(ev(u * 10 + 1, u, "a"), ev(u * 10 + 2, u, "b"))
      else base
    }
    val out = Sessions.associationRules(rows.toDF("event_id", "ts", "user_id", "event_type"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(out(("a", "b")) == 4.0)   // 2/8 both, 2/8 each: lift 8*2/(2*2)
    assert(out(("a", "pop")) == 1.0) // independent of the universal item
  }

  test("window_pair_cells == the zip_with expression form (randomized, 12 rounds)") {
    // the r19 compiled kernel behind windowedPmi: the summed (w1, w2)
    // cell counts must be the IDENTICAL integer multiset the chained
    // zip_with slices produced — canonical least/greatest pair order,
    // every gap 1..win, short docs included
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(1919)
    for (round <- 1 to 12) {
      val win = 1 + round % 4
      val docs = (1 to 30).map { _ =>
        val n = rnd.nextInt(12) // 0..11 tokens
        (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar.toString)
      }
      val df = docs.toDF("ts").select(col("ts"), size(col("ts")).as("n"))
      val expected = df.filter(col("n") >= 2)
        .select(explode(flatten(array((1 to win).map { d =>
          zip_with(
            slice(col("ts"), lit(1), greatest(col("n") - d, lit(0))),
            slice(col("ts"), lit(1 + d), greatest(col("n") - d, lit(0))),
            (a, b) => struct(least(a, b).as("w1"), greatest(a, b).as("w2")))
        }: _*))).as("p"))
        .groupBy(col("p.w1"), col("p.w2")).agg(count(lit(1)).as("n_ab"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val got = df.filter(col("n") >= 2)
        .select(explode(graft.functions.WordPairs
          .window_pair_cells(col("ts"), win)).as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(sum(col("p.c")).as("n_ab"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == expected, s"round $round (win=$win): cell sums diverge")
    }
  }
}
