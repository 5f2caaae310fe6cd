package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable oracle-portability guard — the PlanGuard discipline applied
  * to the DuckDB half of the correctness contract.
  *
  * Background (r15 verdict): four oracles (q232/q249/q258/q274) were
  * hash-red in the driver's DuckDB while bit-identical replays passed on
  * DuckDB 1.0.0 — an oracle-PORTABILITY failure, not an engine bug. The
  * diagnosis isolated the version-sensitive construct family to dynamic
  * list arithmetic: `ps[j].field` (dynamic indexing into a list of
  * structs + field access), `list_min`/`list_max` over variable-bound
  * slices (`ws[j:m]`, `ws[1:j]`), and plain-identifier slices. Checked
  * mechanically across all 284 registered oracles, those constructs
  * appeared in the four red queries and NOWHERE green — every other list
  * idiom (fixed-index `xs[1]`, `list_transform` over a list or a range,
  * `list_reduce` folds, scalar dynamic indexing `ts[i]`,
  * `list_min`/`list_max` over whole lists, arithmetic-bound slices) is
  * exonerated by green r15 rows on the driver's own DuckDB.
  *
  * This spec scans every registered oracle string and fails on the
  * non-exonerated constructs, so the class can't recur: a new oracle that
  * reaches for the dynamic-slice adjust idiom fails HERE, with a pointer
  * to the portable window-SQL pattern (row_number rank + running
  * min/max window — see the q232 oracle), instead of failing two rounds
  * later in a driver whose DuckDB version we cannot see.
  */
class OraclePortabilitySpec extends AnyFunSuite {

  /** Construct -> (regex, why it is banned, portable replacement). */
  private val banned: Seq[(String, scala.util.matching.Regex, String)] = Seq(
    ("dynamic struct-list indexing (ps[j].field)",
      """\[\s*[A-Za-z_]\w*\s*\]\s*\.""".r,
      "rank the rows with row_number() and carry fields as columns"),
    ("list_min/list_max over an indexed or sliced list (list_min(ws[j:m]))",
      """list_(?:min|max)\s*\(\s*\w+\s*\[""".r,
      "a running min(w)/max(w) OVER (ORDER BY j [DESC] ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) window"),
    ("plain-identifier list slice (ws[j:m])",
      """\[\s*[A-Za-z_]\w*\s*:\s*[A-Za-z_]\w*\s*\]""".r,
      "a window frame over ranked rows instead of a materialized slice"))

  test("no registered oracle uses a version-sensitive dynamic-list construct") {
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      (label, rx, fix) <- banned
      hit <- rx.findFirstIn(sql)
    } yield s"$name: $label at '${hit.take(40)}' — use $fix"
    assert(offenders.isEmpty,
      "version-sensitive oracle constructs (see r15 VERDICT diagnosis):\n  " +
        offenders.mkString("\n  "))
  }

  test("the guard regexes actually catch the r15 red construct family") {
    // self-test on the literal tails that were red in r15, so a regex
    // typo can't silently disarm the guard
    val redTails = Seq(
      "floor(least(1.0, list_min(ws[j:m])) * 10000 + 0.5) / 10000",
      "floor(least(1.0, list_max(ws[1:j])) * 10000 + 0.5) / 10000",
      "SELECT ps[j].k AS test_key, ps[j].p AS p_value")
    for (tail <- redTails)
      assert(banned.exists(_._2.findFirstIn(tail).isDefined),
        s"guard no longer catches: $tail")
  }
}
