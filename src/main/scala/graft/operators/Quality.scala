package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling and constraint validation — the Deequ-style
  * (Schelter et al., VLDB 2018) "unit tests for data" gate a training-data
  * pipeline runs before accepting a crawl drop: column profiles first to
  * SEE the data, then declarative constraints that turn expectations into
  * a pass/fail report.
  *
  * Scale shape: both entry points are ONE aggregation pass over the input.
  * `profile`/`check` fold every metric into a single wide `agg` row —
  * Spark plans the exact `count(distinct)`s via a shared Expand (rows ×
  * distinct-columns before the partial agg, the textbook multi-distinct
  * plan), everything else is a map-side conditional partial — then pivot
  * the one driver row into the per-column/per-constraint report with a
  * literal-array explode (no second scan, no join). At 100 TB the wide
  * row is still one row; the only distributed cost is the scan plus one
  * exchange of partials per Expand group.
  */
object Quality {

  /** One profile row per column: row count, nulls, exact distincts,
    * completeness ratio (rounded 4, the engine-parity rounding), min/max
    * rendered as strings AFTER native-type aggregation (numeric min, not
    * lexicographic).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val entries = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"_nn_$c").as("nn"),
        col(s"_nd_$c").as("nd"),
        col(s"_mn_$c").as("mn"),
        col(s"_mx_$c").as("mx"))
    }: _*)
    wide
      .select(col("_n").as("n"), explode(entries).as("e"))
      .select(
        col("e.col_name").as("col_name"),
        col("n"),
        (col("n") - col("e.nn")).as("n_null"),
        col("e.nd").as("n_distinct"),
        round(col("e.nn").cast("double") / col("n"), 4).as("completeness"),
        col("e.mn").as("min_str"),
        col("e.mx").as("max_str"))
  }

  /** A declarative expectation over one column. `name` is the stable
    * report key (also what the oracle groups on).
    */
  sealed trait Constraint {
    def column: String
    def name: String
    /** violation count as an aggregate over the full table */
    private[graft] def violations: Column
  }

  /** no NULLs allowed */
  final case class NotNull(column: String) extends Constraint {
    val name = s"not_null($column)"
    private[graft] def violations =
      coalesce(sum(when(col(column).isNull, 1L)), lit(0L))
  }

  /** values must be unique (violations = surplus duplicate rows among
    * non-null values: count − count distinct)
    */
  final case class Unique(column: String) extends Constraint {
    val name = s"unique($column)"
    private[graft] def violations = count(col(column)) - countDistinct(col(column))
  }

  /** non-null values must fall in [lo, hi] */
  final case class InRange(column: String, lo: Double, hi: Double) extends Constraint {
    val name = s"in_range($column)"
    private[graft] def violations =
      coalesce(sum(when(col(column).isNotNull &&
        (col(column) < lo || col(column) > hi), 1L)), lit(0L))
  }

  /** non-null values must be one of `values` */
  final case class InSet(column: String, values: Seq[String]) extends Constraint {
    val name = s"in_set($column)"
    private[graft] def violations =
      coalesce(sum(when(col(column).isNotNull &&
        !col(column).isin(values: _*), 1L)), lit(0L))
  }

  /** non-null values must match `regex` (keep patterns in the common
    * Java-regex/RE2 subset so the oracle agrees)
    */
  final case class MatchesRegex(column: String, regex: String) extends Constraint {
    val name = s"matches_regex($column)"
    private[graft] def violations =
      coalesce(sum(when(col(column).isNotNull && !col(column).rlike(regex), 1L)), lit(0L))
  }

  /** Run every constraint in ONE aggregation pass; report
    * (constraint, passed, violations, checked) per constraint.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "check at least one constraint")
    val aggs: Seq[Column] = constraints.zipWithIndex.map { case (c, i) =>
      c.violations.as(s"_v$i")
    }
    val wide = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val entries = array(constraints.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("constraint"), col(s"_v$i").as("v"))
    }: _*)
    wide
      .select(col("_n").as("n"), explode(entries).as("e"))
      .select(
        col("e.constraint").as("constraint"),
        (col("e.v") === 0L).as("passed"),
        col("e.v").as("violations"),
        col("n").as("checked"))
  }
}
