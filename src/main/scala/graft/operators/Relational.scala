package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational query suite over the harness tables.
  *
  * The reference pipeline (`/root/reference/index.js`) is single-table —
  * SURVEY.md §2.4 — so these queries exercise the engine surface the
  * reference's users would expect from a general engine (joins,
  * aggregation, windows, sorts, set ops) expressed Spark-first:
  *
  *   - dimension tables are explicitly `broadcast()` so the big fact scan
  *     never shuffles for a join it doesn't need;
  *   - filters are applied on the base table *before* joins so Catalyst
  *     pushes them into the parquet scan (PushedFilters);
  *   - every query ends with a deterministic total ORDER BY so results are
  *     hash-comparable against the DuckDB oracle;
  *   - double-typed aggregates are `round`-ed so floating-point summation
  *     order (which legitimately differs between engines and between
  *     partitionings) cannot flip the last bits of the result.
  */
object Relational {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** TPC-H Q1 style pricing summary: scan-heavy single-table aggregation.
    * At 100 TB this is a pure map-side-partial-agg + 1 shuffle on a
    * low-cardinality key (6 groups): the ideal Spark plan, no tuning needed.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= ts("2000-12-31 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q6 style selective filter + global agg: tests that all three
    * predicates reach the parquet scan (PushedFilters) and nothing else is
    * read (ReadSchema should be 4 columns).
    */
  def q2SelectiveFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** TPC-H Q3 style shipping priority: filtered dim broadcast into two fact
    * joins, then top-10 by revenue. customer is tiny → broadcast; orders ⋈
    * lineitem shuffles on orderkey (co-partitioned, single shuffle each).
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = ts("1998-06-30 00:00:00")
    val c = Tables.customer(spark, dir)
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // customer is unbounded at scale: no forced broadcast hint — AQE
    // broadcasts the filtered key set while it fits and falls back to a
    // shuffle join when it doesn't.
    l.join(o.join(c, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), to_date(col("o_orderdate")).as("orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4 style: EXISTS → left-semi join, then count by priority.
    * The distinct-orderkey side is aggregated before the join so the semi
    * join input is minimal; at scale this is shuffle(orderkey) + semi.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .where(col("l_quantity") > 47).select("l_orderkey")
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q5 style: snowflake join region→nation→{customer,supplier} with
    * the two fact tables. Bounded dims (region/nation/supplier) carry
    * explicit broadcast hints; customer is UNBOUNDED at scale so it gets no
    * hint — AQE broadcasts it while it fits and degrades to a shuffle join
    * (rather than an OOM'd forced broadcast) when it doesn't. The only
    * guaranteed shuffles are the fact-fact join on orderkey and the final
    * 25-group agg.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).where(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val c = Tables.customer(spark, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Top-k by sort: TakeOrderedAndProject — no full sort at scale, each
    * partition keeps k rows and the driver merges.
    */
  def q6TopkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)

  /** Window functions: top-3 orders per customer by value. One shuffle on
    * o_custkey, in-partition sort; row_number is fully tie-broken so the
    * result is deterministic.
    */
  def q7WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        round(sum(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_spend"))
      .where(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Distinct aggregation: COUNT(DISTINCT) per group — expands to a
    * two-phase agg in Spark; partial distinct happens map-side.
    */
  def q8DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Set operations: INTERSECT / EXCEPT over nation keys present among
    * customers vs suppliers; tagged and unioned into one result.
    */
  def q9SetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")).distinct()
    c.intersect(s).withColumn("op", lit("intersect"))
      .unionByName(c.except(s).withColumn("op", lit("except")))
      .select(col("op"), col("nationkey"))
      .orderBy(col("op"), col("nationkey"))
  }

  /** ROLLUP aggregation with explicit NULLS FIRST ordering (Spark's default
    * asc ordering is nulls-first; DuckDB's is nulls-last, so the oracle SQL
    * pins NULLS FIRST too).
    */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Anti join: customers with no high-value order. The filter on the right
    * side is pushed into the orders scan before the anti join, so only the
    * qualifying keys shuffle; at scale this is shuffle(custkey) + anti.
    */
  def q11AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .where(col("o_totalprice") > 450000).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Broadcast fact⋈dim join + agg by brand: `part` is a classic broadcast
    * dimension — zero shuffle for the join, one for the 25-group agg.
    */
  def q12PartAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))

  /** Semi-structured JSON extraction from the events.props column.
    * regexp_extract keeps it inside whole-stage codegen (and is portable to
    * the DuckDB oracle, unlike engine-specific JSON path dialects).
    */
  def q13EventsJson(spark: SparkSession, dir: String): DataFrame = {
    // regexp_extract returns the EMPTY STRING on no match (not null), and
    // under ANSI casting "" to int THROWS — so a single malformed props
    // row would kill the job. Empty → null first; the cast then only ever
    // sees digit strings (or null, which casts to null).
    val kStr = regexp_extract(col("props"), "\"k\":\\s*([0-9]+)", 1)
    Tables.events(spark, dir)
      .select(col("event_type"),
        when(kStr === lit(""), lit(null)).otherwise(kStr).cast("int").as("k"))
      .select(col("event_type"),
        (floor(col("k") / 10.0) * 10).cast("int").as("k_bucket"))
      .groupBy(col("event_type"), col("k_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("k_bucket"))
  }

  /** Tumbling time-window aggregation over the event stream table — batch
    * twin of [[graft.streaming.EventsStream.runDailyAvailableNow]], which
    * runs the same daily aggregation as a Structured Streaming query
    * (q18 checks both paths against one oracle).
    */
  def q14EventsDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("day"), col("event_type"))

  /** As-of join: for each purchase event, the most recent order (by
    * o_orderdate, tie-broken by largest o_orderkey) of the same
    * customer/user at or before the event timestamp.
    *
    * Spark has no ASOF JOIN operator; the scalable pattern is a tagged
    * UNION + single window pass: both sides shuffle ONCE on the key, sort
    * by time in-partition, and `last(..., ignoreNulls)` carries the latest
    * order forward. This is O(n log n) per key and never builds the
    * O(events × orders) range-join intermediate, so it survives 100 TB.
    */
  def q15AsofJoin(spark: SparkSession, dir: String): DataFrame =
    AsOfJoin.eventsToOrders(spark, dir)

  /** Range-predicate join: lineitems shipped within 7 days of their order
    * date. Equi-key (orderkey) carries the join; the range predicate is a
    * post-join filter, so this stays a plain shuffled hash join.
    */
  def q16RangeJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate", "l_extendedprice")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("o_orderpriority"))

  /** CUBE grouping sets: all four aggregation levels over two dims in one
    * pass — Spark expands to a single Expand + hash aggregate (one
    * shuffle), not four scans.
    */
  def q22Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Exact interpolated percentiles per group (both engines use linear
    * interpolation; sort-based exact computation, no sketch).
    */
  def q23Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))
      .orderBy(col("o_orderpriority"))

  /** Window-function breadth: lead/lag deltas, ntile, percent_rank in one
    * pass — still a single shuffle on the partition key.
    */
  def q25WindowSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"))
      .where(col("o_custkey") < 50)
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** String/regex function breadth over nation/region names: split_part,
    * levenshtein, translate, lpad — each portable to the oracle.
    */
  def q26StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .select(col("n_name"),
        split_part(col("n_name"), lit(" "), lit(1)).as("first_word"),
        levenshtein(col("n_name"), lit("UNITED STATES")).as("lev_us"),
        translate(col("n_name"), "AEIOU", "aeiou").as("lower_vowels"),
        lpad(col("n_name"), 20, ".").as("padded"),
        length(regexp_replace(col("n_name"), "[^A-Z]", "")).as("n_upper"))
      .orderBy(col("n_name"))

  /** Date-function breadth: extraction, arithmetic, month boundaries —
    * dialect notes pinned in the oracle (DuckDB dayofweek is 0-based
    * Sunday, Spark's is 1-based).
    */
  def q27DateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .where(col("o_orderkey") < 200)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        (dayofweek(col("o_orderdate")) - 1).as("dow"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since_95"))
      .orderBy(col("o_orderkey"))

  /** Correlated-subquery pattern (parts above their type's average price),
    * decorrelated by hand into a window aggregate: one shuffle on p_type,
    * no self-join.
    */
  def q17AboveTypeAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_type"))
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_type"), col("p_retailprice"),
        round(avg(col("p_retailprice")).over(w), 2).as("type_avg"))
      .where(col("p_retailprice") > col("type_avg"))
      .orderBy(col("p_partkey"))
  }

  /** Full-outer join of two independent per-nation aggregates (rich
    * BUILDING customers vs rich suppliers) — nations present on either
    * side survive, missing counts zero-filled. Both sides pre-aggregate
    * BEFORE the join, so at scale the outer join shuffles one row per
    * group, not the base tables.
    */
  def q33FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .where(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir)
      .where(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    c.join(s, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** Pivot (dynamic columns from values): total order value per priority,
    * one column per order status. Explicit value list so the plan is a
    * single pass (no extra distinct-values job) — the right call at scale
    * whenever the pivot domain is known.
    */
  def q34Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum(col("o_totalprice")), 2))
      .orderBy(col("o_orderpriority"))

  /** Histogram bucket width for [[q36Histogram]]. */
  val histWidth = 50000

  /** Equi-width histogram of order totals — the profiling primitive behind
    * range-partition planning and skew detection. bucket = floor(x/width):
    * one partial-agg shuffle on ~dozens of buckets; at 100 TB this is a
    * map-side-combined scan, the cheapest possible full-data profile.
    */
  def q36Histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") / lit(histWidth.toDouble)).cast("bigint").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** Multiset difference (EXCEPT ALL): urgent-order customers minus
    * finished-urgent-order customers, KEEPING multiplicity — a customer
    * with 3 urgent orders and 1 finished one survives twice, which
    * DISTINCT-based EXCEPT (q9) cannot express. Spark plans this as one
    * aggregation computing per-row count deltas — same cost model as a
    * group-by, no join.
    */
  def q42ExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      .exceptAll(
        o.where(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "F")
          .select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** Gap filling — resample the per-day event counts onto a dense
    * (day × event_type) spine so time-series consumers see explicit
    * zeros. The spine is generated (sequence over the min..max span
    * crossed with the distinct types), both sides tiny after their
    * aggregations, then the sparse counts left-join onto it. At 100 TB
    * the spine stays spine-sized: days × types is thousands of rows
    * regardless of event volume, so the join broadcasts.
    */
  def q43GapFill(spark: SparkSession, dir: String): DataFrame =
    gapFill(Tables.events(spark, dir)
      .select(col("event_type"), col("ts").cast("date").as("day")))

  /** Core of [[q43GapFill]] over any (event_type, day) frame — split out
    * so the zero-fill branch is testable with constructed gaps (the
    * harness tables happen to be gap-free at every SF).
    */
  def gapFill(ev: DataFrame): DataFrame = {
    val daily = ev.groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
    val spine = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      .crossJoin(ev.select(col("event_type")).distinct())
    spine.join(daily, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("day"), col("event_type"))
  }

  /** Approximate aggregates next to their exact twins — the sketches that
    * replace exact distinct/percentile at 100 TB: HyperLogLog++
    * (`approx_count_distinct`, one fixed-size sketch per group merged
    * associatively — no shuffle of distinct values) and the KLL-style
    * `percentile_approx` (mergeable quantile sketch vs a full sort).
    * Deterministic given the data (hash-based, no RNG) but not
    * reproducible in DuckDB's different sketch implementations, so the
    * oracle-checkable surface is the exact twins plus tolerance booleans:
    * the raw sketch values never leave the plan, and the oracle pins the
    * booleans as literal TRUE (HLL++ rsd defaults to 5%; the quantile
    * sketch at accuracy 1000 is near-exact at gate scale, so the bounds
    * below are generous without being vacuous).
    */
  def q40ApproxAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        percentile_approx(col("value"), lit(0.9), lit(1000)).as("p90_approx"),
        expr("percentile(value, 0.9)").as("p90_exact"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          greatest(col("exact_users") * 0.15, lit(10.0))).as("users_ok"),
        (abs(col("p90_approx") - col("p90_exact")) <=
          greatest(abs(col("p90_exact")) * 0.05, lit(1.0))).as("p90_ok"))
      .orderBy(col("event_type"))

  /** Collection-function suite over per-group collected arrays:
    * `collect_list` (made deterministic with `array_sort` — collect order
    * is partition-arrival order and NEVER stable, so every collect in
    * this engine sorts or aggregates immediately), negative `element_at`,
    * `slice`, `transform`, `array_join`. One shuffle; the array stays
    * group-sized, never corpus-sized.
    */
  def q46CollectSuite(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_orderkey") % 100 === 0)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(col("l_quantity"))).as("qs"))
      .select(col("l_orderkey"),
        size(col("qs")).as("n_items"),
        element_at(col("qs"), -1).as("max_qty"),
        array_join(transform(slice(col("qs"), 1, 3),
          x => x.cast("int").cast("string")), ",").as("low3"))
      .orderBy(col("l_orderkey"))

  /** Union by NAME with schema evolution (`allowMissingColumns`) — the
    * set-op for combining frames whose schemas drifted: columns align by
    * name, absent columns null-fill. The positional union (q9) would
    * silently mis-align these. Both sides pre-aggregate, so the union
    * moves group rows, not base tables.
    */
  def q49UnionByName(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nationkey"))
      // exact decimal sum, NO rounding of a ratio: nationkey 17 averages
      // to exactly 4201.315, where Spark's round(double) (HALF_UP on the
      // shortest decimal string) says .32 and DuckDB's (binary value,
      // which is just below the half) says .31 — an engine disagreement
      // no summation fix can reconcile, so the op emits the exact sum
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_cust_bal"))
      .withColumn("side", lit("customer"))
    val s = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
      .withColumn("side", lit("supplier"))
    c.unionByName(s, allowMissingColumns = true)
      .orderBy(col("side"), col("nationkey"))
  }

  /** Rolling 7-day window per event type — a RANGE frame over event time
    * (every event sees the aggregate of its type's trailing week,
    * including same-timestamp peers regardless of row order — which is
    * what makes RANGE, unlike ROWS, deterministic under ties). Time is
    * compared in exact epoch MICROseconds on both engines, so frame
    * membership is integer arithmetic, not float or second-truncated.
    * At scale this is one shuffle on the partition key; the frame
    * evaluation is streaming per partition (no per-row rescan).
    */
  def q48RollingRange(spark: SparkSession, dir: String): DataFrame = {
    val week = 7L * 86400L * 1000000L // µs
    val w = Window.partitionBy(col("event_type")).orderBy(col("us"))
      .rangeBetween(-week, 0)
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("us"), col("value"))
      .select(col("event_id"), col("event_type"),
        count(lit(1)).over(w).as("n_7d"),
        round(sum(col("value")).over(w), 2).as("sum_7d"))
      .orderBy(col("event_id"))
  }

  /** q48's rolling week re-planned for 100 TB (q51): the single-key window
    * above partitions by `event_type` alone — 5 distinct values caps
    * parallelism at 5 tasks of ~20 TB each at scale. This variant is the
    * SCALE.md two-pass rewrite, gate-checked against the SAME oracle:
    *
    * 1. Re-key by (event_type, time_bucket) with bucket width = the frame
    *    length, so partitions number types × buckets and AQE can split
    *    further.
    * 2. Emit every event twice: into its own bucket (a real row AND a
    *    contributor) and as a GHOST contributor into the NEXT bucket. A
    *    row's trailing-week frame spans at most its own and the previous
    *    bucket (width ≥ frame), so with ghosts present one per-bucket
    *    RANGE window computes the exact global frame; ghost rows' own
    *    aggregates are discarded.
    *
    * Cost: one shuffle of 2× the events on the composite key, bounded
    * per-task work — versus one shuffle with a hard 5-way ceiling. The
    * ghost trick replaces the broadcast suffix-table stitch sketched in
    * SCALE.md with pure window machinery (no driver state, no second
    * join); aggregates must be decomposable over duplicates being
    * filtered, which count/sum are since ghosts never emit.
    */
  def q51RollingRangeBucketed(spark: SparkSession, dir: String): DataFrame = {
    val week = 7L * 86400L * 1000000L // µs
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("bucket", floor(col("us") / week))
    val contributors = ev.withColumn("is_ghost", lit(false))
      .unionByName(ev.withColumn("bucket", col("bucket") + 1)
        .withColumn("is_ghost", lit(true)))
    val w = Window.partitionBy(col("event_type"), col("bucket"))
      .orderBy(col("us")).rangeBetween(-week, 0)
    contributors
      .select(col("event_id"), col("event_type"), col("is_ghost"),
        count(lit(1)).over(w).as("n_7d"),
        round(sum(col("value")).over(w), 2).as("sum_7d"))
      .where(!col("is_ghost"))
      .select(col("event_id"), col("event_type"), col("n_7d"), col("sum_7d"))
      .orderBy(col("event_id"))
  }

  /** GROUPING SETS via the Dataset API (Spark 4's `groupingSets`) — the
    * subtotal shape CUBE can't express: (status, priority) detail plus
    * status subtotals plus the grand total, skipping the priority-only
    * lattice level. grouping_id disambiguates a real NULL from a
    * rolled-up level. One expand + one aggregation, same cost model as
    * rollup/cube.
    */
  def q37GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"),
        grouping_id().cast("bigint").as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
}
