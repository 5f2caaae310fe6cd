package graft

import org.apache.spark.sql.functions._

/** q301: the composed corpus->training-set pipeline must agree with its
  * stages — same survivor set as q105, pack columns that replay q91's
  * running-sum arithmetic over the surviving train slice, NULL pack
  * columns on test rows. Run at sf0.01 (sf0.001's 50-doc corpus leaves
  * the gate too few survivors to exercise packing across windows).
  */
class PipelineCompositionSpec extends SparkSpec {

  private lazy val out =
    SparkEntry.queries("q301_training_pipeline")(spark, sf("sf0.01"))
      .collect().toSeq

  test("survivor set equals q105's (the stage chain is unchanged)") {
    val q105 = SparkEntry.queries("q105_curation_pipeline")(spark, sf("sf0.01"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == q105)
    assert(out.nonEmpty)
  }

  test("train rows replay q91's packing arithmetic; test rows carry NULLs") {
    val (train, test) = out.partition(_.getString(4) == "train")
    assert(train.nonEmpty && test.nonEmpty)
    test.foreach { r =>
      assert(r.isNullAt(5) && r.isNullAt(6),
        s"test doc ${r.getLong(0)} must carry NULL pack columns")
    }
    // independent driver-side replay: per lang in doc_id order, the
    // running token offset decomposes into (window, offset) base 512
    train.groupBy(_.getString(1)).foreach { case (_, docs) =>
      var off = 0L
      docs.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(5) == off / 512 && r.getLong(6) == off % 512,
          s"doc ${r.getLong(0)}: (${r.getLong(5)}, ${r.getLong(6)}) vs offset $off")
        off += r.getLong(3)
      }
    }
  }
}
