package graft

import org.apache.spark.sql.types._

import graft.sources.Tables

/** Physical-schema canary for the live testdata (companion to
  * [[EventsTsCanarySpec]], which proves the events loader across
  * encodings). The harness regenerates `/root/testdata` between rounds and
  * has already changed a physical type once (events.ts, r10); this spec
  * pins the column types the engine's expressions actually depend on so
  * the next drift fails as a named one-line assertion, not as a
  * DATATYPE_MISMATCH buried in some query's plan.
  *
  * Only load-bearing columns are pinned — ones where a type change alters
  * expression semantics (float vs double cosine, long ids in hash exprs,
  * string JSON for from_json) — not every column, so benign widenings
  * don't produce false alarms.
  */
class SchemaCanarySpec extends SparkSpec {

  private def dt(table: String, col: String): DataType =
    Tables.table(spark, sf0001, table).schema(col).dataType

  test("documents: ids are long, text is string") {
    assert(dt("documents", "doc_id") == LongType)
    assert(dt("documents", "text") == StringType)
  }

  test("embeddings: vector is array<float>") {
    assert(dt("embeddings", "vec_id") == LongType)
    assert(dt("embeddings", "embedding") == ArrayType(FloatType, containsNull = true))
  }

  test("events: props is a JSON string, value is double") {
    assert(dt("events", "props") == StringType)
    assert(dt("events", "value") == DoubleType)
    assert(dt("events", "user_id") == LongType)
  }

  test("drift tolerance: narrowed ids and a double vector normalize back to canon") {
    import org.apache.spark.sql.functions.col
    // synthetic drifted fixtures: int32 ids, array<double> embedding
    val dir = graft.util.TmpDirs.scratch("graft_canary_drift_").toString
    Tables.documents(spark, sf0001).limit(50)
      .withColumn("doc_id", col("doc_id").cast(IntegerType))
      .withColumn("n_chars", col("n_chars").cast(IntegerType))
      .write.parquet(s"$dir/documents.parquet")
    Tables.embeddings(spark, sf0001).limit(50)
      .withColumn("vec_id", col("vec_id").cast(IntegerType))
      .withColumn("embedding", col("embedding").cast(ArrayType(DoubleType)))
      .write.parquet(s"$dir/embeddings.parquet")
    val docs = Tables.documents(spark, dir)
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("n_chars").dataType == LongType)
    val emb = Tables.embeddings(spark, dir)
    assert(emb.schema("vec_id").dataType == LongType)
    assert(emb.schema("embedding").dataType == ArrayType(FloatType, containsNull = true))
    // and the canonical encoding passes through with NO cast node (so id
    // filter pushdown survives — the no-op branch must stay a no-op)
    val plain = Tables.documents(spark, sf0001).where(col("doc_id") < 10)
      .queryExecution.executedPlan.toString
    assert(plain.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]"),
      s"doc_id pushdown lost:\n$plain")
  }

  test("lineitem/orders: decimals stayed double, dates stayed timestamp_ntz") {
    assert(dt("lineitem", "l_quantity") == DoubleType)
    assert(dt("lineitem", "l_extendedprice") == DoubleType)
    // parquet micros WITHOUT isAdjustedToUTC → Spark reads TIMESTAMP_NTZ;
    // the oracle's DuckDB read is naive too, so NTZ is the verified regime
    assert(dt("lineitem", "l_shipdate") == TimestampNTZType)
    assert(dt("orders", "o_orderdate") == TimestampNTZType)
    assert(dt("orders", "o_totalprice") == DoubleType)
  }
}
