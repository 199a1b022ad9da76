package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (see /root/repo/TESTDATA.md).
  *
  * All reads go through `spark.read.parquet`, so the vectorized parquet
  * reader, predicate pushdown, and column pruning apply automatically —
  * callers should select/filter on the returned DataFrame and let Catalyst
  * push the work into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; with `spark.sql.legacy.parquet.nanosAsLong` (pinned at session
    * creation by [[graft.GraftSession]]) it reads as a long (nanos since
    * epoch), converted here to a microsecond timestamp with integer division
    * — lossless for this data (the generator emits microsecond-resolution
    * values; DuckDB performs the same nanos→micros truncation).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))

  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  private val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region" -> region _, "nation" -> nation _, "customer" -> customer _,
    "supplier" -> supplier _, "part" -> part _, "orders" -> orders _,
    "lineitem" -> lineitem _, "events" -> events _,
    "documents" -> documents _, "embeddings" -> embeddings _)

  /** Register every harness table as a temp view for spark.sql queries.
    * Routed through the per-table loaders so the registered views carry the
    * same normalizations (notably events.ts nanos→timestamp) as the
    * DataFrame path — a spark.sql query and its DataFrame twin must see
    * identical schemas.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => loaders(n)(spark, dir).createOrReplaceTempView(n))
}
