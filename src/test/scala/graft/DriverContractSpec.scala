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

  test("oracle SQL is non-empty, single-statement, and newline-normalized") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(!sql.contains(";"), s"$name: multi-statement oracle")
      assert(!sql.contains("\r") && !sql.contains("\t"),
        s"$name: carriage return/tab would stress the JSON escape path")
    }
  }
}
