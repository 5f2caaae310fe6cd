package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Group-wise feature normalization — the per-domain scaling pass a
  * training pipeline runs before mixing heterogeneous sources (a "value"
  * from one event family is not commensurable with another's).
  *
  * Scale shape: one group aggregation (decimal-exact S1/S2 moments — the
  * q46 discipline, so results are independent of aggregation order), then
  * the tiny per-group stats table joins back (broadcast under AQE) and the
  * z-score is a map-side scalar. Nothing shuffles the fact table except
  * the one stats agg.
  */
object Normalize {

  /** z-score of `valueCol` within each `groupCol`: (x - mean) / stddev_samp,
    * null when the group has fewer than 2 rows or zero variance. Moments
    * are exact decimal sums; the per-row arithmetic is the same double
    * expression on any engine, so results are reproducible bit-for-bit.
    */
  def zscoreByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val d = col(valueCol).cast(DecimalType(18, 2))
    val stats = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"),
        sum(d).cast("double").as("_s1"),
        sum(d * d).cast("double").as("_s2"))
    val varNum = col("_n") * col("_s2") - col("_s1") * col("_s1")
    val std = sqrt(varNum / (col("_n") * (col("_n") - lit(1))))
    df.join(stats, groupCol)
      .withColumn("z",
        when(col("_n") < 2 || varNum <= 0, lit(null).cast("double"))
          .otherwise((col(valueCol) - col("_s1") / col("_n")) / std))
      .drop("_n", "_s1", "_s2")
  }
}
