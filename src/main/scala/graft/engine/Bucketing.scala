package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketed-table support: the co-location strategy for repeated big-big
  * joins at scale.
  *
  * A shuffle on the join key is the dominant cost of a fact-fact join at
  * 100 TB. Writing both facts bucketed (and sorted) by the key moves that
  * shuffle to WRITE time, once: every subsequent join on the key is a
  * zero-Exchange sort-merge join (bucket i of A only ever meets bucket i
  * of B). `BucketingSpec` asserts the no-Exchange plan property.
  *
  * Bucket count rule of thumb at scale: total size / bucket ≈ 100–200 MB
  * per bucket per partition; bucket counts of joined tables must be equal
  * (or integer multiples, with spark.sql.bucketing.coalesceBucketsInJoin).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — with equal bucket
    * counts this plans as a sort-merge join with NO Exchange on either
    * side (and no sort, since buckets are written sorted).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))

  /** Bucketed tables already written this session, per input dir — the
    * write-time shuffle is the one-off cost bucketing exists to pay once,
    * so repeat queries against the same input reuse the tables (mode
    * overwrite keeps a fresh session from trusting stale warehouse dirs).
    */
  private val written = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (String, String)]

  /** Drop the written-tables memo — the bench calls this in the same
    * per-pass reset as [[graft.ops.Dedup.clearCaches]], so every pass pays
    * the bucketed write and q52's per-query MIN measures the same
    * write+read work on every sample (the memo previously survived across
    * passes, making pass 1 structurally slower than the rest).
    */
  def clearCaches(): Unit = written.clear()

  /** Drop a managed table AND its warehouse location: the in-memory
    * catalog forgets tables between sessions but their directories
    * persist, and saveAsTable refuses to adopt an orphan location
    * (LOCATION_ALREADY_EXISTS) even in overwrite mode. Removal goes
    * through the Hadoop FileSystem API so a non-file warehouse
    * (hdfs/s3) cleans up the same way local disk does.
    */
  def dropStale(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** q52 correctness surface: the canonical repeated fact-fact join
    * (lineitem ⋈ orders on orderkey), planned through bucketed tables so
    * the join itself is a zero-Exchange sort-merge join (BucketingSpec pins
    * the no-shuffle plan property; this query pins the VALUES against the
    * DuckDB oracle). The `merge` hint keeps the planner from broadcasting
    * the small side at test scale — at 100 TB neither fact broadcasts, and
    * the bucketed SMJ is exactly the plan this would pick.
    *
    * Only the columns the query needs are written into the bucketed copies
    * (column pruning at write time — the bucketed table is a projection,
    * not a second copy of the fact).
    */
  def bucketedOrdersJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val (lt, ot) = written.computeIfAbsent((spark, dir), _ => {
      val suffix = (dir.hashCode.toLong & 0xffffffffL).toHexString
      val lt = s"graft_lineitem_b_$suffix"
      val ot = s"graft_orders_b_$suffix"
      dropStale(spark, lt)
      dropStale(spark, ot)
      writeBucketed(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice")),
        lt, "l_orderkey", 8)
      writeBucketed(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_totalprice")),
        ot, "o_orderkey", 8)
      (lt, ot)
    })
    spark.table(lt).hint("merge")
      .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(sum(col("o_totalprice")), 2).as("sum_order_price"))
      .orderBy(col("l_returnflag"))
  }
}
