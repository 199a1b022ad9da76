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
    * rejects; read it as a long (nanos since epoch) and convert to a
    * microsecond timestamp with integer division (lossless for this data —
    * the generator emits microsecond-resolution values; DuckDB performs the
    * same nanos→micros truncation).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register every harness table as a temp view for spark.sql queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
