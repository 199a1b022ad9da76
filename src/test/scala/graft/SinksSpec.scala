package graft

import graft.engine.Sinks
import graft.operators.Relational

/** The sink-format matrix's round-trip halves: every file format the engine
  * writes must read back the identical rows under the writer's schema. JSON
  * (q39) and CSV (q50) are pinned by the correctness gate; this spec pins
  * the two formats added to complete the matrix — ORC (q85, columnar,
  * Hive-lineage) and Avro (q86, row-major interchange) — against the parquet
  * write of the same aggregate, so all four agree with each other, not just
  * each with the oracle.
  */
class SinksSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("ORC and Avro round trips reproduce the batch aggregate exactly") {
    val base = Relational.q14EventsDaily(spark, sf0001)
    val want = rowsOf(base)
    assert(want.nonEmpty)
    val orc = Sinks.orcRoundTrip(base,
      graft.util.TmpDirs.scratch("graft_sinks_orc_").toString)
    val avro = Sinks.avroRoundTrip(base,
      graft.util.TmpDirs.scratch("graft_sinks_avro_").toString)
    assert(rowsOf(orc) == want, "ORC round trip must be exact")
    assert(rowsOf(avro) == want, "Avro round trip must be exact")
    // names + types pin the no-inference contract; nullability legitimately
    // widens through any file round trip (file readers can't prove non-null)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(orc.schema) == shape(base.schema) &&
      shape(avro.schema) == shape(base.schema),
      "round trips read under the writer's schema, never inference")
  }

  test("XML round trip reproduces the batch aggregate exactly (q87 — the source domain's sink)") {
    val base = Relational.q14EventsDaily(spark, sf0001)
    val want = rowsOf(base)
    assert(want.nonEmpty)
    val xml = Sinks.xmlRoundTrip(base,
      graft.util.TmpDirs.scratch("graft_sinks_xml_").toString)
    assert(rowsOf(xml) == want, "XML round trip must be exact")
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(xml.schema) == shape(base.schema),
      "XML reads under the writer's schema, never inference")
    // the written files really are one rowTag element per row — the
    // read-back above could not otherwise parse them, but pin the tag
    // so a silent rowTag default change cannot slip through
    val dir = graft.util.TmpDirs.scratch("graft_sinks_xml_tag_").toString
    Sinks.xml(base, dir, rowTag = "event_day")
    assert(spark.read.schema(base.schema).format("xml")
      .option("rowTag", "event_day").load(dir).count() == base.count())
  }

  test("XML caveat pinned: dates/doubles exact; a null string and an empty string conflate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1, Some("a"), "2024-03-01"),
      (2, None, "2024-12-31"))
      .toDF("id", "s", "d")
      .withColumn("d", to_date(col("d")))
      .withColumn("x", col("id").cast("double") / 3.0)
    val back = Sinks.xmlRoundTrip(df,
      graft.util.TmpDirs.scratch("graft_sinks_xml2_").toString)
    assert(rowsOf(back) == rowsOf(df),
      "non-string types must round-trip exactly through XML text encoding")
  }

  test("null fields and date types survive both new formats") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1, Some("a"), "2024-03-01"),
      (2, None, "2024-12-31"),
      (3, Some(""), "1999-01-01"))
      .toDF("id", "s", "d")
      .withColumn("d", to_date(col("d")))
      .withColumn("ts", col("d").cast("timestamp"))
      .withColumn("x", col("id").cast("double") / 3.0)
    val want = rowsOf(df)
    assert(rowsOf(Sinks.orcRoundTrip(df,
      graft.util.TmpDirs.scratch("graft_sinks_orc2_").toString)) == want)
    assert(rowsOf(Sinks.avroRoundTrip(df,
      graft.util.TmpDirs.scratch("graft_sinks_avro2_").toString)) == want)
  }
}
