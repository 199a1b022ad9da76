package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, to_json}

import graft.operators._
import graft.pipeline.OohPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is an operator from SURVEY.md §2 (or a
  * scale-oriented extension); every entry in `oracleSql` is equivalent ANSI
  * SQL the driver runs in DuckDB over the same parquet tables. Column names
  * and row ordering match exactly on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5LocalSupplier(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> Relational.q1PricingSummary _,
    "q2_selective_filter" -> Relational.q2SelectiveFilter _,
    "q3_shipping_priority" -> Relational.q3ShippingPriority _,
    "q4_order_priority" -> Relational.q4OrderPriority _,
    "q5_local_supplier" -> Relational.q5LocalSupplier _,
    "q6_topk_orders" -> Relational.q6TopkOrders _,
    "q7_window_rank" -> Relational.q7WindowRank _,
    "q8_distinct_agg" -> Relational.q8DistinctAgg _,
    "q9_setops" -> Relational.q9SetOps _,
    "q10_rollup" -> Relational.q10Rollup _,
    "q11_anti_join" -> Relational.q11AntiJoin _,
    "q12_part_agg" -> Relational.q12PartAgg _,
    "q13_events_json" -> Relational.q13EventsJson _,
    "q14_events_daily" -> Relational.q14EventsDaily _,
    "q15_asof_join" -> Relational.q15AsofJoin _,
    "q16_range_join" -> Relational.q16RangeJoin _,
    "q17_above_type_avg" -> Relational.q17AboveTypeAvg _,
    "ooh_occupations" -> ((s: SparkSession, _: String) => oohOccupationsFlat(s)),
    "ooh_report" -> ((s: SparkSession, _: String) => oohReportFlat(s)),
  )

  /** The OOH wide projection over the checked-in fixture, map/array columns
    * serialized with to_json so the DuckDB oracle (which cannot read XML)
    * hash-checks the full extraction against golden VALUES literals.
    */
  private def oohOccupationsFlat(spark: SparkSession): DataFrame =
    OohPipeline.occupations(OohPipeline.read(spark, OohPipeline.fixturePath))
      .select(
        col("title"),
        col("workSchedules").as("work_schedules"),
        to_json(col("importantQualities")).as("iq_json"),
        col("medianPayAnnual").as("median_pay_annual"),
        col("numberOfJobs").as("n_jobs"),
        col("whatTheyDo").as("what_they_do"),
        to_json(col("pay")).as("pay_json"),
        to_json(col("similarOccupations")).as("similar_json"),
        to_json(col("topIndustries")).as("industries_json"))
      .orderBy(col("title"))

  /** The reference's filtered report (index.js:177-183) over the fixture. */
  private def oohReportFlat(spark: SparkSession): DataFrame =
    OohPipeline.run(spark, OohPipeline.fixturePath)
      .select(
        col("title"),
        col("medianPayAnnual").as("median_pay_annual"),
        col("employmentOutlookCode").as("outlook_code"),
        to_json(col("importantQualities")).as("iq_json"))
      .orderBy(col("title"))

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_selective_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(o_orderdate AS DATE) AS orderdate,
        |  o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 47)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(o_orderdate AS DATE) AS orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 15""".stripMargin,

    "q7_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |      AS running_spend
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q8_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q9_setops" ->
      """SELECT 'intersect' AS op, nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  INTERSECT
        |  SELECT DISTINCT s_nationkey AS nationkey FROM supplier) a
        |UNION ALL
        |SELECT 'except' AS op, nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  EXCEPT
        |  SELECT DISTINCT s_nationkey AS nationkey FROM supplier) b
        |ORDER BY op, nationkey""".stripMargin,

    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q11_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q12_part_agg" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q13_events_json" ->
      """SELECT event_type,
        |  CAST(floor(CAST(regexp_extract(props, '"k":\s*([0-9]+)', 1) AS INT) / 10.0) * 10 AS INT) AS k_bucket,
        |  count(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY event_type, k_bucket""".stripMargin,

    "q14_events_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin,

    "q15_asof_join" ->
      """SELECT e.event_id, e.user_id,
        |  (SELECT max(o.o_orderkey) FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |     AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
        |                          WHERE o2.o_custkey = e.user_id
        |                            AND o2.o_orderdate <= e.ts)) AS asof_orderkey,
        |  (SELECT round(max_by(o.o_totalprice, o.o_orderkey), 2) FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |     AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
        |                          WHERE o2.o_custkey = e.user_id
        |                            AND o2.o_orderdate <= e.ts)) AS asof_totalprice
        |FROM events e
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin,

    "q16_range_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 7 DAY
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q17_above_type_avg" ->
      """SELECT p_partkey, p_type, p_retailprice, type_avg FROM (
        |  SELECT p_partkey, p_type, p_retailprice,
        |    round(avg(p_retailprice) OVER (PARTITION BY p_type), 2) AS type_avg
        |  FROM part) t
        |WHERE p_retailprice > type_avg
        |ORDER BY p_partkey""".stripMargin,

    // Golden-VALUES oracles: DuckDB cannot read the XML fixture, so the
    // expected extraction output is inlined literally (hand-derived from
    // /root/reference/index.js semantics over FIXTURES.md §A).
    "ooh_occupations" ->
      """SELECT title, work_schedules, iq_json,
        |  CAST(median_pay_annual AS DOUBLE) AS median_pay_annual,
        |  n_jobs, what_they_do, pay_json, similar_json, industries_json
        |FROM (VALUES
        |  ('Archivists', 'Weekdays.', '{"Organizational skills plus care":"They keep originals safe."}', 57120.0, '7,100', 'Catalog history.', '{"archivists":27.46}', '["Curators"]', '{"Museums":"33","Government":"28"}'),
        |  ('Boundary Testers', 'Odd hours.', '{"abcdefghijklmnopqrstuvwxyz":"Twenty-six chars exactly.","abcdefghijklmnopqrstuvwxyzX":"Twenty-seven chars."}', 70000.0, '5,000', 'Probe edges.', '{"boundary testers":33.65}', '["Edge Finders"]', '{"QA":"90"}'),
        |  ('Data Engineers', 'Most work full time.', '{"Analytical skills":"They reason about data.","Very long quality name over 26 chars":"Sentence body."}', 104000.0, '168,000', 'One paragraph.', '{"data engineers":50.0,"junior data engineers":35.5}', '["Database Administrators"]', '{"Tech":"45","Finance":"20"}'),
        |  ('Military Careers', 'Deployments vary.', '{"Discipline":"They follow orders."}', NULL, NULL, NULL, NULL, NULL, NULL),
        |  ('Mystery Workers', NULL, NULL, 50000.0, '1,000', 'Unknown.', '{}', '["Nobody"]', '{"Misc":"100"}'),
        |  ('Statisticians', 'Full time, some overtime.', '{"Math skills":"They use statistics daily."}', 98920.0, '34,200', 'First part.Second part.', '{"statisticians":47.56}', '["Mathematicians","Actuaries"]', '{"Government":"40","Research":"25","Finance":"10"}'),
        |  ('Surveyors', 'Outdoor hours.', '{"Precision":"They measure twice."}', 63800.0, '48,100', 'Measure.', '{"surveyors":30.67}', '["Cartographers"]', '{"Engineering":"71","Government":null}'),
        |  ('Web Developers', 'Many are self-employed.', '{"Creativity":"They design things people enjoy."}', 80730.0, '190,200', 'Create sites.', '{"web developers":38.81,"digital designers":29.13}', '["Graphic Designers"]', '{"Design services":"17","Self-employed":"16"}')
        |) AS t(title, work_schedules, iq_json, median_pay_annual, n_jobs, what_they_do, pay_json, similar_json, industries_json)
        |ORDER BY title""".stripMargin,

    "ooh_report" ->
      """SELECT title, CAST(median_pay_annual AS DOUBLE) AS median_pay_annual,
        |  outlook_code, iq_json
        |FROM (VALUES
        |  ('Archivists', 57120.0, '6', '{"Organizational skills plus care":"They keep originals safe."}'),
        |  ('Boundary Testers', 70000.0, '5', '{"abcdefghijklmnopqrstuvwxyz":"Twenty-six chars exactly.","abcdefghijklmnopqrstuvwxyzX":"Twenty-seven chars."}'),
        |  ('Data Engineers', 104000.0, '7', '{"Analytical skills":"They reason about data.","Very long quality name over 26 chars":"Sentence body."}')
        |) AS t(title, median_pay_annual, outlook_code, iq_json)
        |ORDER BY title""".stripMargin,
  )
}
