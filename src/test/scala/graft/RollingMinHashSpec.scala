package graft

import scala.util.Random

import graft.exprs.RollingMinHash

/** The custom Catalyst expression: registration through
  * SparkSessionExtensions, codegen path, null contract, and equivalence of
  * the O(n) rolling update with a naive per-window recompute.
  */
class RollingMinHashSpec extends SparkSpec {
  import spark.implicits._

  /** Naive per-window reference (what the DuckDB oracle spells out). */
  private def naive(s: String): Option[Long] = {
    if (s.length < RollingMinHash.K) return None
    Some((0 to s.length - RollingMinHash.K).map { i =>
      s.substring(i, i + RollingMinHash.K).foldLeft(0L)((h, c) =>
        (h * RollingMinHash.B + c) % RollingMinHash.P)
    }.min)
  }

  test("rolling update equals the naive per-window fold (randomized)") {
    val rnd = new Random(42)
    for (_ <- 1 to 200) {
      val s = rnd.alphanumeric.take(rnd.nextInt(64) + 8).mkString
      assert(Option(RollingMinHash.compute(s)).map(_.longValue) == naive(s))
    }
  }

  test("strings shorter than the window hash to null") {
    assert(RollingMinHash.compute("1234567") == null)
    assert(RollingMinHash.compute("") == null)
  }

  test("registered in SQL and Column surfaces via SparkSessionExtensions") {
    val r = spark.sql("SELECT rolling_min_hash('abcdefghij') AS h").head().getLong(0)
    assert(r == naive("abcdefghij").get)
    val viaExpr = Seq("abcdefghij").toDF("s")
      .selectExpr("rolling_min_hash(s) AS h").head().getLong(0)
    assert(viaExpr == r)
  }

  test("codegen path evaluates over a real column (many rows, with nulls)") {
    val df = Seq("the quick brown fox", "short", "another document body")
      .toDF("s").selectExpr("rolling_min_hash(s) AS h")
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(naive("the quick brown fox"), None, naive("another document body")))
  }
}
