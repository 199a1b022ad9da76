package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Schema-drift canary for the events `ts` column.
  *
  * The harness has shipped `events.ts` under more than one physical parquet
  * encoding (TIMESTAMP(NANOS) in earlier rounds — surfaced as a nanos long
  * under the pinned `nanosAsLong` conf — and TIMESTAMP_MICROS now). The
  * loader must normalize EITHER encoding to `TimestampType` with identical
  * values; this spec writes a tiny fixture per encoding and proves it, so
  * the next drift fails here with a named assertion instead of killing two
  * dozen queries with a DATATYPE_MISMATCH deep in a plan.
  */
class EventsTsCanarySpec extends SparkSpec {

  // one microsecond instant, exactly representable in every encoding
  private val micros = 1723500000123456L // 2024-08-12T22:00:00.123456Z

  private def writeFixture(schemaTs: DataType, tsValue: Any): String = {
    val dir = Files.createTempDirectory("events-ts-canary").toFile
    dir.deleteOnExit()
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", schemaTs),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, tsValue, "click", 1.5)), schema)
    df.coalesce(1).write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  private def loadedMicros(dir: String): (DataType, Long) = {
    val ev = Tables.events(spark, dir)
    val got = ev.selectExpr("unix_micros(ts) AS m").head().getLong(0)
    (ev.schema("ts").dataType, got)
  }

  test("native TIMESTAMP_MICROS passes through unchanged") {
    val dir = writeFixture(TimestampType, java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plusNanos(micros * 1000L)))
    val (dt, m) = loadedMicros(dir)
    assert(dt == TimestampType)
    assert(m == micros)
  }

  test("nanos-as-long converts with micros truncation") {
    // what TIMESTAMP(NANOS) looks like post-read under nanosAsLong: a long
    // of nanos since epoch; 789 trailing nanos must truncate, not round
    val dir = writeFixture(LongType, micros * 1000L + 789L)
    val (dt, m) = loadedMicros(dir)
    assert(dt == TimestampType)
    assert(m == micros)
  }

  test("TIMESTAMP_NTZ reinterprets as a UTC instant") {
    val dir = writeFixture(TimestampNTZType,
      java.time.LocalDateTime.ofEpochSecond(
        micros / 1000000L, ((micros % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC))
    val (dt, m) = loadedMicros(dir)
    assert(dt == TimestampType)
    assert(m == micros)
  }

  test("the live testdata loads as TimestampType") {
    assert(Tables.events(spark, sf0001).schema("ts").dataType == TimestampType)
  }
}
