package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.Tables

/** Scalable as-of join (a.k.a. point-in-time join).
  *
  * Spark has no native ASOF JOIN. The naive formulation
  * (`a JOIN b ON key AND b.t <= a.t` + max-per-group) materializes an
  * O(|a| x |b per key|) intermediate. Instead we tag and UNION both sides,
  * shuffle once on the key, sort by (time, side, tiebreak) within each
  * partition, and carry the right side's payload forward with
  * `last(..., ignoreNulls = true)` over an unbounded-preceding window.
  *
  * The payload travels as ONE struct column, so the carried value is always
  * a consistent snapshot of a single right row — a NULL in one payload
  * field of the latest right row stays NULL instead of back-filling from an
  * older row (which per-column `last` would silently do).
  *
  * At 100 TB this is one shuffle of each input and a streaming in-partition
  * sort — the same cost as a sort-merge join — with per-key skew handled by
  * AQE. No state is held beyond the window frame's single carried struct.
  */
object AsOfJoin {

  /** Generic as-of: for each left row, attach the payload of the latest
    * right row with the same key and rightTime <= leftTime. Right rows tie
    * on time are resolved by the greatest `tiebreak` value.
    *
    * Left columns must not collide with payload names or the internal
    * `_k/_t/_side/_p` tags — rejected up front rather than silently
    * overwritten.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("_k", "_t", "_side", "_p")
    val collisions = leftCols.toSet.intersect(payload.toSet) ++
      leftCols.toSet.intersect(reserved.toSet)
    require(collisions.isEmpty,
      s"asof: left columns collide with payload/internal names: ${collisions.mkString(", ")}")
    require(payload.contains(tiebreak), "asof: tiebreak must be a payload column")

    val payloadType = StructType(payload.map(p => right.schema(p)))
    val l = left.select(
      col(leftKey).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(payloadType).as("_p") +: leftCols.map(col): _*)
    val r = right.select(
      col(rightKey).as("_k") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        struct(payload.map(col): _*).as("_p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Right rows (side=0) sort before left rows (side=1) at equal time, so
    // an order landing exactly at the event timestamp IS visible to it;
    // equal-time right rows resolve to the max tiebreak (last in frame).
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_p").getField(tiebreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_carried", last(col("_p"), ignoreNulls = true).over(w))

    carried.where(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("_carried").getField(p).as(s"asof_$p")): _*)
  }

  /** Skew-safe as-of: identical semantics to [[asof]], but the window
    * partitions on (key, time-bucket) instead of key alone, so one hot key
    * no longer serializes into a single window task (AQE's skew handling
    * splits joins, not windows — this is the window-side equivalent).
    *
    * Mechanics: bucket rows by `floor(time_bucket_of(t))`; compute each
    * bucket's latest right row per key (an aggregation, splittable); carry
    * the running latest across buckets with a window over the tiny
    * (key × bucket) domain; inject that carry-in as a synthetic right row
    * at each bucket start. Every left row then resolves inside its own
    * (key, bucket) window: in-bucket right rows cover times within the
    * bucket, the synthetic row covers everything earlier. Costs one extra
    * small aggregation + window vs [[asof]]; per-task work is bounded by
    * bucket width rather than key frequency.
    *
    * `bucketWidth` is in the time column's underlying unit (e.g. seconds
    * for timestamps cast to long at the call site).
    */
  def asofSkewSafe(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tiebreak: String,
      bucketWidth: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("_k", "_t", "_b", "_side", "_p")
    val collisions = leftCols.toSet.intersect(payload.toSet) ++
      leftCols.toSet.intersect(reserved.toSet)
    require(collisions.isEmpty,
      s"asofSkewSafe: left columns collide with payload/internal names: ${collisions.mkString(", ")}")
    require(payload.contains(tiebreak), "asofSkewSafe: tiebreak must be a payload column")

    val payloadType = StructType(payload.map(p => right.schema(p)))
    // ANSI forbids a direct timestamp→long cast; route timestamps through
    // epoch seconds (session is UTC; any monotone mapping works — bucket
    // boundaries need no particular alignment).
    def bucketOf(t: Column, dt: org.apache.spark.sql.types.DataType): Column = {
      val epoch = dt match {
        case _: org.apache.spark.sql.types.TimestampType => unix_timestamp(t)
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          unix_timestamp(t.cast("timestamp"))
        // ANSI also forbids DATE→BIGINT: route dates through epoch seconds.
        case _: org.apache.spark.sql.types.DateType =>
          unix_timestamp(t.cast("timestamp"))
        case _ => t.cast("long")
      }
      floor(epoch / bucketWidth).cast("long")
    }

    val l = left.select(
      col(leftKey).as("_k") +: col(leftTime).as("_t") +:
        bucketOf(col(leftTime), left.schema(leftTime).dataType).as("_b") +: lit(1).as("_side") +:
        lit(null).cast(payloadType).as("_p") +: leftCols.map(col): _*)
    val r = right.select(
      col(rightKey).as("_k") +: col(rightTime).as("_t") +:
        bucketOf(col(rightTime), right.schema(rightTime).dataType).as("_b") +: lit(0).as("_side") +:
        struct(payload.map(col): _*).as("_p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Latest right row per (key, bucket): max over (time, tiebreak).
    val bucketLatest = r
      .groupBy(col("_k"), col("_b"))
      .agg(max_by(col("_p"),
        struct(col("_t"), col("_p").getField(tiebreak))).as("_pl"))
    // Carry the running latest to the START of each bucket that has any
    // activity (left or right): window over the small (key x bucket) set.
    val activeBuckets = l.select(col("_k"), col("_b"))
      .union(r.select(col("_k"), col("_b"))).distinct()
    val carryIn = activeBuckets
      .join(bucketLatest, Seq("_k", "_b"), "left")
      .withColumn("_carry", last(col("_pl"), ignoreNulls = true).over(
        Window.partitionBy(col("_k")).orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .where(col("_carry").isNotNull)
      // synthetic right row sorting before everything in its bucket
      .select(col("_k"), lit(null).cast(l.schema("_t").dataType).as("_t"),
        col("_b"), lit(-1).as("_side"), col("_carry").as("_p"))
    val carryPadded = leftCols.foldLeft(carryIn)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select((Seq("_k", "_t", "_b", "_side", "_p") ++ leftCols).map(col): _*)

    // Null _t sorts first (asc_nulls_first): the synthetic carry-in row is
    // visible to every row of its bucket; then right-before-left at equal
    // time, then the payload tiebreak — same order contract as asof().
    val w = Window.partitionBy(col("_k"), col("_b"))
      .orderBy(col("_t").asc_nulls_first, col("_side"),
        col("_p").getField(tiebreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r).unionByName(carryPadded)
      .withColumn("_carried", last(col("_p"), ignoreNulls = true).over(w))

    carried.where(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("_carried").getField(p).as(s"asof_$p")): _*)
  }

  /** Harness instance: purchase events joined as-of to the customer's most
    * recent order (events.user_id = orders.o_custkey, o_orderdate <= ts).
    */
  def eventsToOrders(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val ord = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    asof(ev, ord,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("o_totalprice", "o_orderkey"),
      tiebreak = "o_orderkey")
      .select(col("event_id"), col("user_id"),
        col("asof_o_orderkey").as("asof_orderkey"),
        round(col("asof_o_totalprice"), 2).as("asof_totalprice"))
      .orderBy(col("event_id"))
  }

  /** Same harness join through the skew-safe path (30-day time buckets) —
    * registered as q21 with q15's oracle, so the correctness gate proves
    * the two implementations agree on real data.
    */
  def eventsToOrdersSkewSafe(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val ord = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    asofSkewSafe(ev, ord,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("o_totalprice", "o_orderkey"),
      tiebreak = "o_orderkey",
      bucketWidth = 30L * 24 * 3600)
      .select(col("event_id"), col("user_id"),
        col("asof_o_orderkey").as("asof_orderkey"),
        round(col("asof_o_totalprice"), 2).as("asof_totalprice"))
      .orderBy(col("event_id"))
  }
}
