package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{IncrementalDedup, LabelState}

/** Ad-hoc plan probe for the LabelState delta chassis (not part of the
  * engine surface): builds a 2-generation d12 state, then prints the
  * physical plan of the edge-collect job a third merge would run — the
  * thing to check is whether the label FOLD subtree (referenced by both
  * the affected-component filter and the seed build) shows up as a
  * ReusedExchange/reused aggregate or executes twice.
  */
object DeltaPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("delta-plan-probe", 16)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val docs = graft.sources.Tables.documents(spark, dir)
    val state = graft.util.TmpDirs.scratch("graft_deltaplan_").toString
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 0))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 1))

    val live = IncrementalDedup.completeVersions(spark, state)
    val edges = LabelState.seedEdges(spark, state, live,
      spark.read.parquet(s"$state/v1/pairs"))
    edges.collect()
    println("=== edges plan (AQE final) ===")
    println(edges.queryExecution.executedPlan.toString)
    val finalSection = edges.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val folds = "partial_max_by".r.findAllIn(finalSection).size
    println(s"PROBE fold executions in final plan: $folds (want 1)")
  }
}
