package graft

import org.apache.spark.sql.functions._

import graft.engine.Bucketing
import graft.sources.Tables

/** The scale property bucketing buys: joining two tables bucketed on the
  * join key produces a plan with NO shuffle (Exchange) — the write-time
  * shuffle is paid once, every later join is co-located.
  */
class BucketingSpec extends SparkSpec {

  private def rmrf(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles.foreach(rmrf)
    p.delete(); ()
  }

  test("bucketed fact-fact join plans with zero Exchange") {
    // drop any orphan managed-table locations from earlier sessions
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("orders_b", "lineitem_b").foreach(t => rmrf(new java.io.File(wh, t)))

    Bucketing.writeBucketed(
      Tables.orders(spark, sf0001), "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf0001), "lineitem_b", "l_orderkey", 4)

    // At sf0.001 the planner would rather broadcast the small side (which
    // also bypasses bucketing); disable it so the plan shows what happens
    // when BOTH sides are big — the case bucketing exists for.
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "lineitem_b", "orders_b",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")

      // and it computes the right thing: every lineitem finds its order
      assert(joined.count() == Tables.lineitem(spark, sf0001).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("q52 query surface: zero Exchange below the bucketed sort-merge join") {
    val df = Bucketing.bucketedOrdersJoinAgg(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // tree-string order: the join's scan subtrees print AFTER the join
    // node, parents (agg/sort) before — so everything after the SMJ line
    // must be Exchange-free for the join inputs to be co-located
    val parts = plan.split("SortMergeJoin", 2)
    assert(parts.length == 2, s"no SortMergeJoin in the q52 plan:\n$plan")
    assert(!parts(1).contains("Exchange"),
      s"shuffle below the bucketed join:\n$plan")
  }

  test("unbucketed twin of the same join DOES shuffle (the property is real)") {
    val plain = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
    // disable broadcast so the comparison is shuffle-vs-bucket, not size
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
