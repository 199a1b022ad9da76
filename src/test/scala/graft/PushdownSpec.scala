package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

/** Proof that filters and projections reach the parquet scan — the two
  * properties that decide whether a 100 TB query reads 100 TB or a sliver:
  * `PushedFilters` (row-group skipping via min/max stats) and `ReadSchema`
  * (column pruning in a columnar format).
  */
class PushdownSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    df.collect() // materialize so AQE finalizes the plan
    collect(df.queryExecution.executedPlan) { case s: FileSourceScanExec => s }
  }

  test("q2's selective filter is pushed to the lineitem scan") {
    val ss = scans(Relational.q2SelectiveFilter(spark, sf0001))
    assert(ss.nonEmpty)
    val li = ss.find(_.metadata("Location").contains("lineitem")).get
    val pushed = li.metadata("PushedFilters")
    assert(pushed != "[]", s"no pushed filters: $pushed")
  }

  test("q36's two-column aggregate prunes the 9-column orders schema") {
    val ss = scans(Relational.q36Histogram(spark, sf0001))
    val o = ss.find(_.metadata("Location").contains("orders")).get
    val readSchema = o.metadata("ReadSchema")
    assert(readSchema.contains("o_totalprice"))
    assert(!readSchema.contains("o_comment") && !readSchema.contains("o_orderdate"),
      s"schema not pruned: $readSchema")
  }

  test("a projection over documents reads only the selected columns") {
    val df = Tables.documents(spark, sf0001).select(col("doc_id"), col("lang"))
    val s = scans(df).head
    val readSchema = s.metadata("ReadSchema")
    assert(readSchema.contains("doc_id") && readSchema.contains("lang"))
    assert(!readSchema.contains("text"), s"text not pruned: $readSchema")
  }

  test("partitionBy sink yields partition-pruned reads (S6 directory partitioning)") {
    // the sink's partitionBy contract: a filter on the partition key must
    // prune DIRECTORIES (file listing), not just row groups — at 100 TB
    // the difference between touching one day and every file of the table
    val out = graft.util.TmpDirs.scratch("graft_part_sink_").toString
    val days = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("value"),
        col("ts").cast("date").as("day"))
    graft.engine.Sinks.parquet(days, out, partitionBy = Seq("day"))
    val back = spark.read.parquet(out)
    val oneDay = days.select(col("day")).distinct().orderBy(col("day")).head().getDate(0)
    val q = back.where(col("day") === lit(oneDay))
    val s = scans(q).head
    // partition filter recorded, and only the matching directory's files read
    assert(s.metadata("PartitionFilters").contains("day"),
      s"no partition filter: ${s.metadata("PartitionFilters")}")
    assert(s.relation.location.inputFiles.length > 1) // table spans many days
    assert(s.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${s.selectedPartitions.partitionCount}")
    // and the data read back for that day matches the source
    assert(q.count() == days.where(col("day") === lit(oneDay)).count())
  }

  test("the q53 query surface itself prunes to one event_type directory") {
    val df = SparkEntry.queries("q53_partitioned_prune")(spark, sf0001)
    val s = scans(df).head
    assert(s.metadata("PartitionFilters").contains("event_type"),
      s"no partition filter: ${s.metadata("PartitionFilters")}")
    assert(s.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${s.selectedPartitions.partitionCount}")
  }
}
