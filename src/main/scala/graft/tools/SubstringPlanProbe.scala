package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.IncrementalSubstring

/** Ad-hoc plan probe for the d20/q58 merge join (not part of the engine
  * surface): builds a one-generation substring state, then prints the
  * physical plan of a second batch's candidate-hit job — the thing to
  * check is whether the (small) new-batch anchor side broadcasts, or the
  * full persisted anchor union pays a shuffle per micro-batch.
  */
object SubstringPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("substring-plan-probe", 16)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docs = graft.sources.Tables.documents(spark, dir)
    val state = graft.util.TmpDirs.scratch("graft_subplan_").toString
    IncrementalSubstring.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(8)) =!= 0))
    // batch 2 = 1/8 of the corpus — the streaming micro-batch shape
    val scratch2 = graft.util.TmpDirs.scratch("graft_subplan_b2_").toString
    IncrementalSubstring.merge(spark, scratch2,
      docs.where(pmod(col("doc_id"), lit(8)) === 0))
    val hot = spark.read.parquet(s"$state/v0/occ", s"$scratch2/v0/occ")
      .groupBy(col("anchor")).agg(sum(col("aocc")).as("aocc"))
      .where(col("aocc") > graft.ops.Dedup.anchorMaxOcc).select(col("anchor"))
    val cand = IncrementalSubstring.candidateHits(
      spark.read.parquet(s"$scratch2/v0/anchors"),
      spark.read.parquet(s"$state/v0/anchors"), hot)
    cand.collect()
    val plan = cand.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    println("=== candidateHits plan (final) ===")
    println(plan)
    println(s"PROBE broadcast joins: ${"BroadcastHashJoin".r.findAllIn(plan).size}, " +
      s"sortmerge joins: ${"SortMergeJoin".r.findAllIn(plan).size}, " +
      s"shuffles: ${"Exchange hashpartitioning".r.findAllIn(plan).size}")
  }
}
