package graft

import org.apache.spark.sql.functions._

import graft.operators.SaltedJoin
import graft.sources.Tables

/** The salted join must be result-identical to the plain join — salt moves
  * rows between tasks, never between groups — and must actually spread each
  * orderkey across salt values.
  */
class SaltedJoinSpec extends SparkSpec {

  test("salted join result == plain join result at sf0.001") {
    val salted = SaltedJoin.lineitemOrdersSalted(spark, sf0001).collect()
    val plain = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
      .collect()
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("salt actually fans hot keys out across salt values") {
    val fanout = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"))
      .withColumn("_salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(SaltedJoin.numSalts.toLong)))
      .groupBy(col("_salt")).count().collect()
    assert(fanout.length == SaltedJoin.numSalts) // every salt value used
  }
}
