package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * At 100 TB this is one shuffle of each input and a streaming in-partition
  * sort — the same cost as a sort-merge join — with per-key skew handled by
  * AQE. No state is held beyond the window frame's single carried row per
  * column.
  */
object AsOfJoin {

  /** Generic as-of: for each left row, attach the payload of the latest
    * right row with the same key and rightTime <= leftTime.
    *
    * @param left      left (probe) side
    * @param right     right (reference) side
    * @param leftKey   join key column name on the left
    * @param rightKey  join key column name on the right
    * @param leftTime  event-time column on the left
    * @param rightTime event-time column on the right
    * @param payload   right-side columns to carry; tie-broken by the last
    *                  payload column ascending (rows with equal time sort by
    *                  it, and `last` takes the greatest).
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
    val leftCols = left.columns
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val lPadded = payload.foldLeft(l)((df, p) =>
      df.withColumn(p, lit(null).cast(right.schema(p).dataType)))
    val r0 = right
      .withColumn("_k", col(rightKey)).withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select((Seq("_k", "_t", "_side") ++ payload).map(col): _*)
    val rPadded = leftCols.foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = lPadded.select((Seq("_k", "_t", "_side") ++ payload ++ leftCols).map(col): _*)
      .unionByName(rPadded.select((Seq("_k", "_t", "_side") ++ payload ++ leftCols).map(col): _*))

    // Right rows (side=0) sort before left rows (side=1) at equal time, so
    // an order landing exactly at the event timestamp IS visible to it.
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col(tiebreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(s"asof_$p", last(col(p), ignoreNulls = true).over(w)))

    carried.where(col("_side") === 1)
      .select((leftCols.map(col) ++ payload.map(p => col(s"asof_$p"))): _*)
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
}
