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

  // --- r16 item 2: pin oracle output TYPES, not just values ---------------
  //
  // The r16 red set (q232/q249/q258/q274) was caused by an oracle output
  // column typed HUGEINT (un-cast DuckDB `sum()`), invisible to both the
  // driver's row-count/name-schema checks and our string-canonicalized
  // value replays. tools/oracle_types.py runs `DESCRIBE <sql>` for every
  // registered oracle against sf0.001 views and flags HUGEINT / UHUGEINT /
  // DECIMAL output columns. We shell out to it because DuckDB only exists
  // on this box as a python package — if python3+duckdb or the testdata
  // directory is missing, the test cancels rather than fails.

  private def duckdbAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb").start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Dump a name->sql map as JSON and run the DESCRIBE sweep over it.
    * Returns (exitCode, stdout). */
  private def describeSweep(oracles: Map[String, String]): (Int, String) = {
    val json = oracles.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${jsonEscape(k)}": "${jsonEscape(v)}"""" }
      .mkString("{", ", ", "}")
    val f = java.io.File.createTempFile("oracle_sql", ".json")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, json.getBytes("UTF-8"))
    val pb = new ProcessBuilder(
      "python3", "tools/oracle_types.py", "/root/testdata/sf0.001",
      f.getAbsolutePath)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    (p.waitFor(), out)
  }

  test("no registered oracle emits a HUGEINT/UHUGEINT/DECIMAL output column") {
    assume(duckdbAvailable, "python3+duckdb not on this box")
    assume(new java.io.File("/root/testdata/sf0.001/region.parquet").exists(),
      "sf0.001 testdata missing")
    val (rc, out) = describeSweep(SparkEntry.oracleSql)
    assert(rc == 0,
      "oracle output columns with un-pinned types (CAST them in the " +
        "final select — the r16 red-set root cause):\n" + out)
  }

  test("the DESCRIBE sweep actually catches an un-cast sum(c) AS n") {
    assume(duckdbAvailable, "python3+duckdb not on this box")
    assume(new java.io.File("/root/testdata/sf0.001/region.parquet").exists(),
      "sf0.001 testdata missing")
    val (rc, out) = describeSweep(Map(
      "self_test_uncast" -> "SELECT sum(r_regionkey) AS n FROM region"))
    assert(rc == 1 && out.contains("self_test_uncast") &&
      out.toUpperCase.contains("HUGEINT"),
      s"type guard no longer catches un-cast sum(): rc=$rc out=$out")
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
