package graft

/** Row-count regression pins for every relational query at sf0.001.
  * Expected values derived from the DuckDB oracle over the same parquet
  * (full value/hash equality at sf0.01 is the driver's CORRECTNESS gate;
  * this is the fast in-repo regression net).
  */
class RelationalSpec extends SparkSpec {

  private val expected = Map(
    "q1_pricing_summary" -> 6L,
    "q2_selective_filter" -> 1L,
    "q3_shipping_priority" -> 10L,
    "q4_order_priority" -> 5L,
    "q5_local_supplier" -> 1L,
    "q6_topk_orders" -> 15L,
    "q7_window_rank" -> 449L,
    "q8_distinct_agg" -> 3L,
    "q9_setops" -> 25L,
    "q10_rollup" -> 10L,
    "q11_anti_join" -> 57L,
    "q12_part_agg" -> 25L,
    "q13_events_json" -> 50L,
    "q14_events_daily" -> 150L,
    "q15_asof_join" -> 202L,
    "q16_range_join" -> 5L,
    "q17_above_type_avg" -> 102L,
    "q22_cube" -> 24L,
    "q23_percentiles" -> 5L,
    "q24_sessions" -> 946L,
    "q25_window_suite" -> 499L,
    "q26_string_funcs" -> 25L,
    "q27_date_funcs" -> 200L,
    "q28_stream_hourly" -> 867L,
    "q29_salted_join" -> 5L,
    "s3_ann_ivf" -> 30L,
    "m2_frame_sample" -> 2000L,
    "b1_bottomk_sketch" -> 5L,
    "b2_kmv_estimate" -> 5L,
    "c1_chunking" -> 705L,
    "c2_hash_sample" -> 126L,
    "d7_dup_clusters" -> 342L,
    "q30_stream_dedup" -> 792L,
    "q31_topk_per_key" -> 449L,
    "c3_contamination" -> 413L,
    "q32_stream_funnel" -> 5L,
    "q33_full_outer" -> 1L,
    "q34_pivot" -> 5L,
    "s4_quantized_topk" -> 30L,
    "q35_latest_per_key" -> 15L)

  for ((name, n) <- expected.toSeq.sortBy(_._1)) {
    test(s"$name returns $n rows at sf0.001") {
      assert(SparkEntry.queries(name)(spark, sf0001).count() == n)
    }
  }

  test("entry() runs the flagship pipeline and yields rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle") {
    // since round 4 even the approx aggregates (q40) are oracle-checked,
    // via exact twins + tolerance booleans — no rows-only exceptions left
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("q51 bucketed rolling window == q48 single-key window, and shuffles on (type, bucket)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val q48 = graft.operators.Relational.q48RollingRange(spark, sf0001).collect()
    val df51 = graft.operators.Relational.q51RollingRangeBucketed(spark, sf0001)
    val q51 = df51.collect()
    assert(q51.toSeq == q48.toSeq) // identical rows in identical order
    // the point of q51: window parallelism is types x buckets, so the
    // exchange must hash on BOTH keys, not event_type alone
    val helper = new AdaptiveSparkPlanHelper {}
    val exprs = helper.collect(df51.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e.outputPartitioning.toString
    }
    assert(exprs.exists(p => p.contains("event_type") && p.contains("bucket")),
      s"no (event_type, bucket) exchange found in: $exprs")
  }
}
