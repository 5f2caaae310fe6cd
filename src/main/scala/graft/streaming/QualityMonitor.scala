package graft.streaming

import graft.operators.Quality
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The [[graft.operators.Quality]] constraint gate lifted onto the ingest
  * stream: per event-time window, how many rows violated each declared
  * expectation — the live "is the crawl drop going bad RIGHT NOW" panel
  * beside the batch accept/reject report (same Deequ-style constraint
  * ADT, same semantics, so a rule tuned on the batch side monitors
  * unchanged on the stream side).
  *
  * Row-local constraints only: `Unique` needs cross-row state and is
  * rejected here — streaming uniqueness is exactly what
  * [[graft.operators.Dedup.incrementalDedup]] / the curate pipeline's
  * fingerprint state already provide. Everything else evaluates map-side
  * into windowed conditional-count partials, so the stream shuffles one
  * counter row per (window, constraint-set) partial — never the events.
  * The watermark bounds window state exactly as in the ingest rollups.
  */
object QualityMonitor {

  def monitor(
      stream: DataFrame,
      constraints: Seq[Quality.Constraint],
      tsCol: String = "ts",
      windowDuration: String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame = {
    require(constraints.nonEmpty, "monitor at least one constraint")
    require(!constraints.exists(_.isInstanceOf[Quality.Unique]),
      "Unique needs cross-row state: use incrementalDedup on the stream, " +
        "or run Unique in the batch Quality.check gate")
    val aggs = constraints.zipWithIndex.map { case (c, i) =>
      c.violations.as(s"_v$i")
    }
    val wide = stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration).as("w"))
      .agg(count(lit(1)).as("_n"), aggs: _*)
    val entries = array(constraints.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("constraint"), col(s"_v$i").as("v"))
    }: _*)
    wide
      .select(col("w.start").as("window_start"), col("_n").as("checked"),
        explode(entries).as("e"))
      .select(
        col("window_start"),
        col("e.constraint").as("constraint"),
        (col("e.v") === 0L).as("passed"),
        col("e.v").as("violations"),
        col("checked"))
  }
}
