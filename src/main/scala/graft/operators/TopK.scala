package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.plans.TopKPerKey
import graft.sources.Tables

/** Column-API front end for the custom [[graft.plans.TopKPerKey]] operator
  * (see that file for the why and the physical design).
  */
object TopK {

  /** Per distinct combination of `keys`, the first `k` rows of `df` under
    * `orderSpec` (column name → ascending?). Make the spec total (add a
    * unique tie-break column) for a deterministic result.
    */
  def perKey(df: DataFrame, keys: Seq[String], orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val lp = df.queryExecution.analyzed
    def attr(n: String) = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"TopK.perKey: no column '$n' in ${lp.output.map(_.name).mkString(", ")}"))
    val ordering = orderSpec.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    PlanBridge.ofRows(df.sparkSession, TopKPerKey(keys.map(attr), ordering, k, lp))
  }

  /** q31: the 3 highest-value orders per customer — the canonical per-key
    * top-k. The window formulation shuffles and sorts every order; this
    * shuffles at most 3 orders per customer per mapper.
    */
  /** q35: latest event per user — the CDC/upsert "last record wins"
    * compaction, which is exactly per-key top-1: TopKPerKey with k=1 and
    * (ts DESC, event_id DESC) ordering. At scale this replaces the
    * window-over-everything formulation of snapshot compaction with one
    * bounded shuffle of one row per user per mapper.
    */
  def latestEventPerUser(spark: SparkSession, dir: String): DataFrame =
    perKey(
      Tables.events(spark, dir).select(col("user_id"), col("event_id"), col("ts"), col("event_type")),
      keys = Seq("user_id"),
      orderSpec = Seq("ts" -> false, "event_id" -> false),
      k = 1)
      .orderBy(col("user_id"))

  def topOrdersPerCustomer(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    perKey(
      Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      keys = Seq("o_custkey"),
      orderSpec = Seq("o_totalprice" -> false, "o_orderkey" -> true),
      k = k)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
}
