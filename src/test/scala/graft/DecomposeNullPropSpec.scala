package graft

import graft.query.LogsTable
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: ascribed-schema decomposition reproduces `jsonb_to_record`
  * NULL semantics (reference: doc/json_tricks.rst:97-99 and FIXTURES.md §3):
  * absent keys -> NULL, type-mismatched values -> NULL, well-typed values
  * -> the value. Checked over randomized documents (raw ScalaCheck with
  * fixed seeds — scalatestplus bridge is not on the offline classpath).
  */
class DecomposeNullPropSpec extends SparkSpec {
  import spark.implicits._

  private val keyPool = Vector("a", "b", "c", "d", "e")

  // JSON value + whether it parses as INT / DOUBLE
  private case class V(json: String, isInt: Boolean, isNum: Boolean)
  private val valueGen: Gen[V] = Gen.oneOf(
    Gen.choose(-1000000, 1000000).map(i => V(i.toString, isInt = true, isNum = true)),
    Gen.choose(-1e6, 1e6).map(d => V(f"$d%.3f", isInt = false, isNum = true)),
    Gen.alphaStr.map(s => V("\"x" + s.take(8) + "\"", isInt = false, isNum = false)),
    Gen.const(V("[1,2]", isInt = false, isNum = false)),
    Gen.const(V("{\"n\":1}", isInt = false, isNum = false))
  )

  private val docGen: Gen[Map[String, V]] = for {
    n <- Gen.choose(0, keyPool.size)
    keys <- Gen.pick(n, keyPool)
    vals <- Gen.listOfN(n, valueGen)
  } yield keys.zip(vals).toMap

  test("decompose: NULL for absent or mistyped, value for well-typed") {
    val listGen = Gen.listOfN(4, docGen)
    for (trial <- 0 until 30) {
      val docs = listGen.apply(Gen.Parameters.default, Seed(trial.toLong))
        .getOrElse(sys.error(s"gen failed at trial $trial"))
      val jsons = docs.map(d =>
        d.map { case (k, v) => s""""$k":${v.json}""" }.mkString("{", ",", "}"))
      val df = jsons.toDF("data_raw")
      val schema = StructType(Seq(
        StructField("a", IntegerType), StructField("b", DoubleType),
        StructField("c", StringType), StructField("d", IntegerType),
        StructField("e", DoubleType)))
      val rows = LogsTable(df).decompose(schema).collect()
      rows.zip(docs).foreach { case (row, doc) =>
        def check(key: String, ok: V => Boolean, expect: V => Any): Unit = {
          val i = row.fieldIndex(key)
          doc.get(key) match {
            case Some(v) if ok(v) => assert(row.get(i) == expect(v), s"key=$key doc=$doc")
            case Some(_) => assert(row.isNullAt(i), s"mistyped $key should be NULL in $doc")
            case None => assert(row.isNullAt(i), s"absent $key should be NULL in $doc")
          }
        }
        check("a", _.isInt, v => v.json.toInt)
        check("d", _.isInt, v => v.json.toInt)
        check("b", _.isNum, v => v.json.toDouble)
        check("e", _.isNum, v => v.json.toDouble)
      }
    }
  }
}
