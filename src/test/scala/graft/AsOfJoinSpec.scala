package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.AsOfJoin

/** Property-based checks for the generic as-of join against a brute-force
  * in-memory oracle, plus regressions for the torn-payload and
  * column-collision hazards.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private type L = (Long, Int, Int)                 // id, k, t
  private type R = (Int, Int, Option[Double], Long) // k, t, v, ord

  /** Brute-force reference: latest right row (t <= leftT), tie → max ord. */
  private def oracle(ls: List[L], rs: List[R]): Map[Long, Option[R]] =
    ls.map { case (id, k, t) =>
      val cand = rs.filter(r => r._1 == k && r._2 <= t)
      id -> (if (cand.isEmpty) None else Some(cand.maxBy(r => (r._2, r._4))))
    }.toMap

  private def runAsof(ls: List[L], rs: List[R]): Map[Long, (Option[Double], Option[Long])] = {
    val left = ls.toDF("id", "k", "t")
    val right = rs.toDF("rk", "rt", "v", "ord")
    AsOfJoin.asof(left, right, "k", "rk", "t", "rt", Seq("v", "ord"), "ord")
      .collect()
      .map { r =>
        r.getAs[Long]("id") ->
          ((Option(r.get(r.fieldIndex("asof_v"))).map(_.asInstanceOf[Double]),
            Option(r.get(r.fieldIndex("asof_ord"))).map(_.asInstanceOf[Long])))
      }.toMap
  }

  private val genData: Gen[(List[L], List[R])] = for {
    nl <- Gen.choose(1, 20)
    nr <- Gen.choose(0, 20)
    ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 20)))
    rs <- Gen.listOfN(nr, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 20),
      Gen.option(Gen.choose(0.0, 99.0))))
  } yield (
    ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
    rs.zipWithIndex.map { case ((k, t, v), i) => (k, t, v, i.toLong) })

  test("asof matches the brute-force oracle; payload is one consistent row") {
    val prop = Prop.forAll(genData) { case (ls, rs) =>
      val got = runAsof(ls, rs)
      val want = oracle(ls, rs)
      ls.forall { case (id, _, _) =>
        val (gv, gord) = got(id)
        want(id) match {
          case None => gv.isEmpty && gord.isEmpty
          case Some((_, _, v, ord)) =>
            // whole payload from row `ord`: v matches exactly, including
            // null (no back-fill from an older right row)
            gord.contains(ord) && gv == v
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("torn-payload regression: null field of the latest row is NOT back-filled") {
    val ls = List((0L, 1, 10))
    val rs: List[R] = List((1, 1, Some(5.0), 100L), (1, 9, None, 200L))
    // latest right row (t=9, ord=200) has null v: result must be (null, 200),
    // never (5.0, 200) mixing two right rows
    assert(runAsof(ls, rs)(0L) == ((None, Some(200L))))
  }

  test("equal-time right rows resolve to max tiebreak; boundary t is visible") {
    val ls = List((0L, 1, 10))
    val rs: List[R] = List((1, 10, Some(1.0), 1L), (1, 10, Some(2.0), 2L))
    assert(runAsof(ls, rs)(0L) == ((Some(2.0), Some(2L))))
  }

  test("result time precedes or equals event time (no future leakage)") {
    val ls = List((0L, 1, 5))
    val rs: List[R] = List((1, 6, Some(9.0), 1L)) // only a FUTURE order
    assert(runAsof(ls, rs)(0L) == ((None, None)))
  }

  test("skew-safe variant is semantically identical to asof (property)") {
    val prop = Prop.forAll(genData, Gen.oneOf(1L, 3L, 7L, 1000L)) {
      case ((ls, rs), width) =>
        val left = ls.toDF("id", "k", "t")
        val right = rs.toDF("rk", "rt", "v", "ord")
        val a = AsOfJoin.asof(left, right, "k", "rk", "t", "rt",
          Seq("v", "ord"), "ord").collect().map(_.toSeq).toSet
        val b = AsOfJoin.asofSkewSafe(left, right, "k", "rk", "t", "rt",
          Seq("v", "ord"), "ord", bucketWidth = width).collect().map(_.toSeq).toSet
        a == b
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("skew-safe: carry-in crosses empty and right-only buckets") {
    val ls = List((0L, 1, 100)) // left far in the future
    val rs: List[R] = List((1, 1, Some(7.0), 5L)) // right long ago
    val left = ls.toDF("id", "k", "t")
    val right = rs.toDF("rk", "rt", "v", "ord")
    val got = AsOfJoin.asofSkewSafe(left, right, "k", "rk", "t", "rt",
      Seq("v", "ord"), "ord", bucketWidth = 10).collect()
    assert(got.length == 1)
    assert(got.head.getDouble(got.head.fieldIndex("asof_v")) == 7.0)
  }

  test("skew-safe accepts DATE-typed time columns under ANSI (no DATE→BIGINT cast)") {
    val left = Seq((0L, 1, "2024-03-10"), (1L, 1, "2024-01-01"))
      .toDF("id", "k", "ds").withColumn("t", col("ds").cast("date")).drop("ds")
    val right = Seq((1, "2024-02-15", 7.0, 5L), (1, "2024-03-01", 9.0, 6L))
      .toDF("rk", "rds", "v", "ord")
      .withColumn("rt", col("rds").cast("date")).drop("rds")
    val got = AsOfJoin.asofSkewSafe(left, right, "k", "rk", "t", "rt",
      Seq("v", "ord"), "ord", bucketWidth = 7L * 24 * 3600)
      .collect().map(r => r.getLong(r.fieldIndex("id")) ->
        Option(r.get(r.fieldIndex("asof_v")))).toMap
    assert(got(0L).contains(9.0)) // latest order on/before 2024-03-10
    assert(got(1L).isEmpty)       // nothing before 2024-01-01
  }

  test("column collisions are rejected, not silently overwritten") {
    val left = Seq((1L, 1, 1)).toDF("id", "k", "v") // "v" collides with payload
    val right = Seq((1, 1, 1.0, 1L)).toDF("rk", "rt", "v", "ord")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, right, "k", "rk", "id", "rt", Seq("v", "ord"), "ord")
    }
    assert(e.getMessage.contains("collide"))
  }
}
