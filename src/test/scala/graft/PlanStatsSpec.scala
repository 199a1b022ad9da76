package graft

import org.apache.spark.sql.functions._

/** Plan-stats hygiene at scale (round-7 verdict item 8): a real deployment
  * runs ANALYZE TABLE and enables CBO — the engine's plans must stay
  * GOOD under that regime, not just under file-size estimation:
  *
  *   - with catalog stats present and CBO on, the q5/q8-shaped dimension
  *     joins must still plan as broadcast joins (stats should confirm,
  *     never pessimize, the broadcast decision);
  *   - with runtime skew, the UNSALTED q29-shaped join must engage AQE's
  *     skew-join split — the runtime half of the engine's skew story
  *     (operators/Salted.scala is the compile-time half; README §scale
  *     documents when each applies).
  */
class PlanStatsSpec extends SparkSpec {

  test("ANALYZE TABLE + CBO: dimension joins still broadcast, stats reach the optimizer") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    ss.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    // driver-side .stats reads SQLConf from the ACTIVE session — make the
    // CBO-enabled clone active for the duration of the test
    org.apache.spark.sql.SparkSession.setActiveSession(ss)
    val tables = Seq("region", "nation", "customer", "orders")
    try {
      tables.foreach { t =>
        ss.sql(s"DROP TABLE IF EXISTS ${t}_st")
        ss.sql(s"CREATE TABLE ${t}_st USING parquet LOCATION '$sf0001/$t.parquet'")
        ss.sql(s"ANALYZE TABLE ${t}_st COMPUTE STATISTICS")
      }
      // the stats actually reach the optimizer: exact row counts
      val st = ss.table("region_st").queryExecution.optimizedPlan.stats
      assert(st.rowCount.isDefined && st.rowCount.get.toInt == 5,
        s"ANALYZE stats missing from the optimizer: $st")
      val q = ss.sql(
        """SELECT n_name, count(*) AS n
          |FROM region_st
          |JOIN nation_st ON n_regionkey = r_regionkey
          |JOIN customer_st ON c_nationkey = n_nationkey
          |JOIN orders_st ON o_custkey = c_custkey
          |WHERE r_name = 'ASIA'
          |GROUP BY n_name""".stripMargin)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"dimension joins stopped broadcasting with stats present:\n$plan")
      assert(!plan.contains("CartesianProduct"))
    } finally {
      tables.foreach(t => ss.sql(s"DROP TABLE IF EXISTS ${t}_st"))
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("runtime skew: the unsalted join engages AQE skew-join splitting") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    // force the shuffle join (the skew path under test), thresholds sized
    // so the constructed hot key trips the splitter at test scale
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100KB")
    val pad = "x" * 64
    // one pathological key holding ~90% of the fact side — the q29 shape
    // without the salt
    val fact = ss.range(0, 200000).select(
      when(pmod(col("id"), lit(10)) =!= 0, lit(0L)).otherwise(col("id")).as("k"),
      concat(lit(pad), col("id")).as("payload"))
    val dim = ss.range(0, 1000).select(col("id").as("k"),
      pmod(col("id"), lit(7)).as("grp"))
    // group on a NON-join-key column (the q29 shape: agg key differs from
    // the join key) — grouping on the join key itself would let the final
    // aggregate reuse the join's distribution, and AQE then refuses a
    // skew split that would break it (forceOptimizeSkewedJoin territory).
    // The payload is aggregated (not pruned) so the hot partition carries
    // real shuffle bytes — skew detection measures compressed bytes, and
    // a pruned constant-key partition compresses to nothing.
    val j = fact.join(dim, "k").groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), max(col("payload")).as("p"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark/split the skewed join at runtime:\n$plan")
  }
}
