package graft

import java.nio.file.Files

import graft.store.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits: Morton layout puts dim-1 bits on even positions") {
    val got = spark.range(1).select(
      ZOrder.interleaveBits(lit(3L), lit(0L), 4),   // 0b11, 0b00 -> 0b0101
      ZOrder.interleaveBits(lit(0L), lit(3L), 4),   // 0b00, 0b11 -> 0b1010
      ZOrder.interleaveBits(lit(3L), lit(3L), 4),   // -> 0b1111
      ZOrder.interleaveBits(lit(5L), lit(2L), 4))   // 0b101,0b010 -> 0b011001
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((5L, 10L, 15L, 25L)))
  }

  test("z-ordered files stay prunable on BOTH dimensions, single-sort does not") {
    val events = Tables(spark, sf(), "events").select("event_id", "user_id", "value")
    val base = Files.createTempDirectory("graft-zorder").toString
    val zdir = s"$base/z"
    val vdir = s"$base/v"
    ZOrder.clusteredWrite(events, zdir, "user_id", "value", numFiles = 16)
    events.repartitionByRange(16, col("value"))
      .sortWithinPartitions(col("value"))
      .write.mode("overwrite").parquet(vdir)
    // files CONTAINING matches = what tight min/max stats would admit
    def filesTouched(path: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(cond)
        .select(input_file_name()).distinct().count()
    val userCond = col("user_id") === 7       // narrow in dim 1 only
    val valueCond = col("value").between(100, 120) // narrow in dim 2 only
    val (zUser, zValue) = (filesTouched(zdir, userCond), filesTouched(zdir, valueCond))
    val (vUser, vValue) = (filesTouched(vdir, userCond), filesTouched(vdir, valueCond))
    // single-dim sort: perfect on its own dimension, useless on the other
    assert(vValue <= 3, s"value-sorted layout should nail the value box ($vValue)")
    assert(vUser >= 12, s"value-sorted layout should spread user 7 everywhere ($vUser)")
    // z-order: good on BOTH dimensions at once
    assert(zUser < vUser, s"z user files $zUser !< single-sort $vUser")
    assert(zUser <= 8 && zValue <= 8, s"z-order not tight on both: $zUser / $zValue")
  }

  test("quantile bucketing keeps pruning alive on a zipf-skewed dimension") {
    // power-law dim: value = 20000/(k+1) for uniform k — ~80% of rows land
    // in the lowest linear bucket, so the linear z-key degenerates to a
    // single-dim sort there; quantile cuts spread the mass by population
    val rows = spark.range(20000).select(
      (lit(20000) / (col("id") % 1000 + 1)).cast("long").as("skew"),
      (col("id") % 256).as("uni"))
    val base = Files.createTempDirectory("graft-zorder-q").toString
    val ldir = s"$base/linear"
    val qdir = s"$base/quantile"
    ZOrder.clusteredWrite(rows, ldir, "skew", "uni", numFiles = 16, bits = 8)
    ZOrder.clusteredWrite(rows, qdir, "skew", "uni", numFiles = 16, bits = 8,
      quantile = true)
    def filesTouched(path: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(cond)
        .select(input_file_name()).distinct().count()
    val denseCond = col("skew") === 22      // ~4% of rows, deep in the hot range
    val uniCond = col("uni").between(40, 50)
    val (lDense, qDense) = (filesTouched(ldir, denseCond), filesTouched(qdir, denseCond))
    val (lUni, qUni) = (filesTouched(ldir, uniCond), filesTouched(qdir, uniCond))
    // linear: the hot bucket swallows the dense range -> rows spread wide
    assert(lDense >= 12, s"expected the linear hot bucket to spread skew=22 ($lDense)")
    // quantile: the same slice stays clustered; the uniform dim still prunes
    assert(qDense <= 6, s"quantile z-order not tight on the skewed dim ($qDense)")
    assert(qUni <= 12, s"quantile z-order lost the uniform dim ($qUni vs linear $lUni)")
  }
}
