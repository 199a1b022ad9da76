package graft

import org.apache.spark.sql.functions._

import graft.ops.{IncrementalDedup, LabelState}

/** The label-DELTA contract of the generational dedup states
  * ([[graft.ops.LabelState]]): per-ingest label writes cover only the
  * components a new pair touches — NOT the whole corpus labeling — and
  * the latest-wins fold still reproduces the one-shot clustering exactly.
  * This is the 100 TB shape: a daily ingest that duplicates nothing new
  * must not rewrite (nor re-cluster) the corpus-sized label table.
  */
class LabelDeltaSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  test("pair-free ingest writes an EMPTY label delta, not a full snapshot") {
    val state = graft.util.TmpDirs.scratch("graft_delta_t1_").toString
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    val full = IncrementalDedup.stateLabels(spark, state).count()
    assert(full > 0, "sf0.001 should contain near-dup clusters; pin is vacuous")
    // an empty batch: generation commits, delta is zero rows
    IncrementalDedup.merge(spark, state, docs.where(lit(false)))
    assert(spark.read.parquet(s"$state/v2/labels").count() == 0,
      "a pair-free batch must write an empty delta")
    assert(IncrementalDedup.stateLabels(spark, state).count() == full)
  }

  test("a delta covers ONLY the components the batch touches") {
    import spark.implicits._
    // two disjoint exact-dup clusters: A = {0, 1} (text ta), B = {2, 3}
    // (text tb) — identical text gives identical signatures, Hamming 0
    val ta = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val tb = "kilo lima mike november oscar papa quebec romeo sierra tango"
    val state = graft.util.TmpDirs.scratch("graft_delta_t2_").toString
    IncrementalDedup.merge(spark, state,
      Seq((0L, ta), (1L, ta), (2L, tb), (3L, tb)).toDF("doc_id", "text"))
    // batch 2: one more copy of tb — touches B, must not rewrite A
    IncrementalDedup.merge(spark, state, Seq((4L, tb)).toDF("doc_id", "text"))
    val delta = spark.read.parquet(s"$state/v1/labels")
      .select("node").as[Long].collect().toSet
    assert(delta == Set(2L, 3L, 4L),
      s"v1 delta should cover exactly B's members plus the new doc, got $delta")
    val clusters = IncrementalDedup.clusters(spark, state)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(clusters == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("seed construction executes the label fold ONCE (plan pin)") {
    val state = graft.util.TmpDirs.scratch("graft_delta_t4_").toString
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    val edges = LabelState.seedEdges(spark, state, Seq(0, 1),
      spark.read.parquet(s"$state/v1/pairs"))
    // the fold (scan label deltas + max_by) must appear exactly once in
    // the physical plan — the two-semi-join formulation ran it twice and
    // neither ReuseExchange nor AQE unified the stages
    val plan = edges.queryExecution.executedPlan.toString
    val folds = "partial_max_by".r.findAllIn(plan).size
    assert(folds == 1, s"label fold appears $folds times in the seed plan:\n$plan")
  }

  test("single live generation: the fold is a plain scan, no shuffle") {
    val state = graft.util.TmpDirs.scratch("graft_delta_t5_").toString
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    val before = IncrementalDedup.stateLabels(spark, state)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    IncrementalDedup.compact(spark, state)
    val after = IncrementalDedup.stateLabels(spark, state)
    assert(after.collect().map(_.toSeq).sortBy(_.toString).toSeq == before,
      "compaction changed the folded labeling")
    // a lone generation is a snapshot by construction (initial build or
    // compact output) — reading it must not pay the fold aggregation
    val plan = after.queryExecution.executedPlan.toString
    assert(!plan.contains("max_by") && !plan.contains("Exchange"),
      s"single-generation fold should be a plain scan:\n$plan")
  }

  test("folded(): the latest generation wins per node") {
    import spark.implicits._
    val state = graft.util.TmpDirs.scratch("graft_delta_t3_").toString
    Seq((5L, 5L, 0), (7L, 7L, 0)).toDF("node", "label", "gen")
      .write.parquet(s"$state/v0/labels")
    Seq((7L, 5L, 1), (9L, 5L, 1)).toDF("node", "label", "gen")
      .write.parquet(s"$state/v1/labels")
    val got = LabelState.folded(spark, state, Seq(0, 1))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((5L, 5L), (7L, 5L), (9L, 5L)))
  }
}
