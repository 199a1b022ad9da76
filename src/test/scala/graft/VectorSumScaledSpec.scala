package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The vector_sum_scaled UDAF must equal the posexplode + per-component
  * scaled-sum formulation it replaced, across many groups and partitions
  * (merge path exercised by the 4-core shuffle).
  */
class VectorSumScaledSpec extends SparkSpec {
  import spark.implicits._

  test("vector_sum_scaled == posexplode reference over sf0.001 embeddings") {
    val v = Tables.embeddings(spark, sf0001)
      .select((col("vec_id") % 7).as("g"), col("embedding").as("e"))
    val got = v.groupBy(col("g"))
      .agg(call_function("vector_sum_scaled", col("e"), lit(1e6)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = v.select(col("g"), posexplode(col("e")))
      .groupBy(col("g"), col("pos"))
      .agg(sum(floor(col("col").cast("double") * lit(1e6)).cast("long")).as("s"))
      .collect()
    assert(want.nonEmpty && got.nonEmpty)
    want.foreach { r =>
      assert(got(r.getLong(0))(r.getInt(1)) == r.getLong(2),
        s"mismatch at g=${r.getLong(0)} pos=${r.getInt(1)}")
    }
  }

  test("callable from SQL; null vectors are skipped; floor handles negatives") {
    val rows = Seq(Some(Array(1.25, -0.5)), None, Some(Array(0.75, 2.0)))
      .toDF("e").createOrReplaceTempView("vs")
    val s = spark.sql("SELECT vector_sum_scaled(e, 4) AS s FROM vs")
      .head().getSeq[Long](0)
    // floor(1.25*4)+floor(0.75*4) = 5+3; floor(-0.5*4)+floor(2*4) = -2+8
    assert(s == Seq(8L, 6L))
  }

  test("mismatched vector lengths in one group fail loudly") {
    val rows = Seq(Array(1.0, 2.0), Array(1.0)).toDF("e")
    val ex = intercept[Exception] {
      rows.agg(call_function("vector_sum_scaled", col("e"), lit(1e6))).collect()
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(_.getMessage != null))
  }
}
