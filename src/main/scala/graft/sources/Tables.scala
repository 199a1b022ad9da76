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

  /** Normalize the events `ts` column to `TimestampType`, whatever the
    * physical parquet encoding was. The harness has shipped `ts` as both
    * parquet TIMESTAMP(NANOS) — which Spark's vectorized reader rejects
    * unless `spark.sql.legacy.parquet.nanosAsLong` (pinned at session
    * creation by [[graft.GraftSession]]) maps it to a long of nanos since
    * epoch — and as plain TIMESTAMP_MICROS, which Spark reads natively as
    * `TimestampType`. Branching on the *read* schema makes the loader
    * robust to either encoding: a long gets the nanos→micros truncation
    * (lossless here — the generator emits microsecond-resolution values,
    * and DuckDB truncates identically), a timestamp passes through, and a
    * TIMESTAMP_NTZ casts to timestamp — an identity reinterpretation under
    * the session timezone [[graft.GraftSession]] pins to UTC.
    *
    * This is the single definition site for the normalization; the batch
    * loader ([[events]]) and the streaming loader
    * ([[graft.streaming.EventsStream.readEventsStream]]) both route
    * through it so an encoding drift is a one-site fix.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case TimestampType => df
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other; expected TIMESTAMP, TIMESTAMP_NTZ, or nanos-as-long")
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventsTs(table(spark, dir, "events"))

  /** Normalize an integer id-like column to LongType IFF the read schema
    * drifted to a narrower integer (the events-ts lesson generalized: the
    * harness has changed a physical parquet type under us once, so every
    * loader branches on what it actually read). When the type already
    * matches, the column is untouched — no cast node, so filter pushdown
    * on the id stays intact.
    */
  private def widenIntegral(df: DataFrame, column: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.schema(column).dataType match {
      case LongType => df
      case ByteType | ShortType | IntegerType =>
        df.withColumn(column, col(column).cast(LongType))
      case other => throw new IllegalStateException(
        s"$column has unsupported physical type $other; expected an integral type")
    }
  }

  /** documents with drift-tolerant ids/counts: doc_id and n_chars widen
    * from any narrower integral encoding to the canonical LongType.
    */
  def documents(spark: SparkSession, dir: String): DataFrame =
    widenIntegral(widenIntegral(table(spark, dir, "documents"), "doc_id"), "n_chars")

  /** embeddings with a drift-tolerant vector column: the canonical
    * encoding is array<float>; an array<double> drift (parquet writers
    * flip this readily) narrows back so every consumer keeps seeing
    * FloatType elements and the float→double promotion happens exactly
    * once, inside the consumers' own dot products, as today. vec_id
    * widens like every id.
    */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val df = widenIntegral(table(spark, dir, "embeddings"), "vec_id")
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case ArrayType(DoubleType, _) =>
        df.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case other => throw new IllegalStateException(
        s"embeddings.embedding has unsupported physical type $other; expected array<float|double>")
    }
  }

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
