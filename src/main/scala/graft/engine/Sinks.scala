package graft.engine

import org.apache.spark.sql.DataFrame

/** Engine sinks (SURVEY §2.1 S5/S6). The reference's only sink is
  * console.log (index.js:177-183); the engine's production sinks are
  * columnar files. All writes are partition-parallel; callers choose
  * partitioning via the DataFrame they pass in.
  */
object Sinks {

  /** S6: columnar file sink. `partitionBy` keys become directory partitions
    * so downstream readers get partition pruning for free.
    */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** S6 variant: line-delimited JSON (the reference's package.json:4
    * "generate java data" intent — a machine-readable record dump).
    */
  def json(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** S5: console report sink (reference index.js:177-183). Collects at most
    * `limit` rows to the driver — a debugging sink, never the scale path.
    */
  def show(df: DataFrame, limit: Int = 20): Unit = df.show(limit, truncate = false)

  /** Sink→source round trip: write `df` as line-delimited JSON, read it
    * back under the SAME schema (never inference — at scale schema
    * inference is an extra full scan, and type widening would corrupt the
    * contract). Proves the file sink and the JSON source compose; the
    * q39 gate hash-compares the round-tripped rows against the oracle.
    */
  def jsonRoundTrip(df: DataFrame, path: String): DataFrame = {
    json(df, path)
    df.sparkSession.read.schema(df.schema).json(path)
  }

  /** S6 variant: headered CSV — the interchange format real ingest still
    * arrives in. Splittable parallel read like JSON; same explicit-schema
    * discipline (CSV "inference" costs a full scan AND guesses types).
    */
  def csv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** CSV sink→source round trip under the writer's schema; the q50 gate
    * hash-compares the round-tripped rows against the batch oracle —
    * which is what pins the lossless text encoding of dates/longs/doubles
    * (doubles print shortest-round-trip form, so read-back is exact).
    *
    * CAVEAT the format imposes: CSV cannot portably distinguish a null
    * string from an empty one (both sides of the default nullValue/
    * emptyValue conventions conflate them), so "" and null string fields
    * may swap identities through this round trip. Callers with nullable
    * or empty string columns should use [[jsonRoundTrip]], which
    * preserves the distinction.
    */
  def csvRoundTrip(df: DataFrame, path: String): DataFrame = {
    csv(df, path)
    df.sparkSession.read.schema(df.schema).option("header", "true").csv(path)
  }

  /** S6 variant: ORC — the other columnar lake format real deployments mix
    * with parquet (Hive-lineage tables). Same splittable parallel scan,
    * predicate pushdown, and column pruning class as parquet under Spark's
    * native vectorized ORC reader.
    */
  def orc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  /** ORC sink→source round trip under the writer's schema; the q85 gate
    * hash-compares the round-tripped rows against the batch oracle. ORC
    * stores types natively (no text encoding), so the trip is exact for
    * every Spark SQL type the engine emits.
    */
  def orcRoundTrip(df: DataFrame, path: String): DataFrame = {
    orc(df, path)
    df.sparkSession.read.schema(df.schema).orc(path)
  }

  /** S6 variant: Avro — the row-major interchange format of streaming /
    * message-bus pipelines (splittable container files). Spark 4 bundles
    * the connector classes in spark-sql, but this distribution does not
    * list them in the `DataSourceRegister` service file, so the `"avro"`
    * shortname fails lookup — the fully-qualified provider is the stable
    * spelling (works whether or not the shortname is registered).
    */
  def avro(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).format("org.apache.spark.sql.avro.AvroFileFormat").save(path)

  /** Avro sink→source round trip under the writer's schema; the q86 gate
    * hash-compares against the batch oracle. Dates/timestamps travel as
    * Avro logical types, decimals as fixed/bytes — exact, not text.
    */
  def avroRoundTrip(df: DataFrame, path: String): DataFrame = {
    avro(df, path)
    df.sparkSession.read.schema(df.schema).format("org.apache.spark.sql.avro.AvroFileFormat").load(path)
  }

  /** S6 variant: XML — the engine's own SOURCE domain (SURVEY §2.1 S1:
    * the reference pipeline reads occupation XML), so the sink matrix owes
    * it a writer. Spark 4's built-in XML source writes too: one `rowTag`
    * element per row, splittable on read exactly like the ooh scan.
    */
  def xml(df: DataFrame, path: String, rowTag: String = "row",
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).format("xml").option("rowTag", rowTag).save(path)

  /** XML sink→source round trip under the writer's schema (explicit, as
    * everywhere — XML inference is an extra full scan); the q87 gate
    * hash-compares against the batch oracle.
    *
    * Type-fidelity caveats the FORMAT imposes (the q50 CSV note's twin):
    * values travel as element TEXT — dates/timestamps as ISO-8601 strings
    * re-parsed by the explicit schema (exact), doubles in
    * shortest-round-trip form (exact) — and like CSV, XML cannot portably
    * distinguish a null string from an empty one (a null field writes no
    * element; an empty string writes an empty element that the reader may
    * also surface as null). Callers with nullable/empty string columns
    * should use [[jsonRoundTrip]], which preserves the distinction.
    */
  def xmlRoundTrip(df: DataFrame, path: String, rowTag: String = "row"): DataFrame = {
    xml(df, path, rowTag)
    df.sparkSession.read.schema(df.schema)
      .format("xml").option("rowTag", rowTag).load(path)
  }
}
