package graft

import org.apache.spark.sql.functions._

import graft.ops.{ConnectedComponents, Dedup, IncrementalMinHash}

/** d15: the MinHash modality's incremental state merge must be
  * hash-identical to clustering the one-shot d3 pair graph on the union,
  * for any batch split, and must touch old documents only through the
  * persisted band/set generations.
  */
class IncrementalMinHashSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  /** One-shot twin: CC over d3's verified Jaccard pairs. */
  private def oneShot = {
    val pairs = Dedup.minhashLshPairs(spark, sf0001).select(col("d1"), col("d2"))
    val ckpt = ConnectedComponents.durable(spark,
      graft.util.TmpDirs.sessionCheckpointDir(spark))
    val labels = ConnectedComponents.labelPropagation(pairs, 50, ckpt)
      .map(_._1)
      .getOrElse(ConnectedComponents.starContraction(pairs, ckpt = ckpt)._1)
    clustersSorted(Dedup.clustersOf(labels))
  }

  private def clustersSorted(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "cluster_id", "cluster_size", "is_keeper")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("split-ingest-then-merge equals CC over the one-shot d3 graph, any split") {
    val full = oneShot
    assert(full.nonEmpty, "sf0.001 should contain minhash near-dup clusters")
    for (mod <- Seq(2, 3)) {
      val state = graft.util.TmpDirs.scratch(s"graft_d15_t_${mod}_").toString
      (0 until mod).foreach { r =>
        IncrementalMinHash.merge(spark, state,
          docs.where(pmod(col("doc_id"), lit(mod)) === r))
      }
      assert(IncrementalMinHash.latestVersion(spark, state).contains(mod - 1))
      assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) == full,
        s"$mod-way split-ingest diverged from the one-shot clustering")
    }
  }

  test("candidate job reads old docs ONLY via the persisted slim band index") {
    val state = graft.util.TmpDirs.scratch("graft_d15_plan_").toString
    IncrementalMinHash.merge(spark, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))

    // batch 2's signature job: exactly one shingle+minhash pass
    val batch2 = docs.where(pmod(col("doc_id"), lit(5)) === 0)
    val signPlan = Dedup.minhashSigsOf(batch2).queryExecution.optimizedPlan.toString
    assert("minhash_sig".r.findAllIn(signPlan).size == 1,
      s"batch signing should contain exactly one minhash pass:\n$signPlan")

    // the candidate join, exactly as merge builds it (new bands written,
    // full index = persisted v0 bands + new): no signature recompute, no
    // document re-read; only slim band parquet scans
    val newDir = graft.util.TmpDirs.scratch("graft_d15_plan_bands_").toString
    Dedup.bandRowsOf(Dedup.minhashSigsOf(batch2)).write.mode("overwrite").parquet(newDir)
    val cand = IncrementalMinHash.candidatePairs(
      spark.read.parquet(newDir),
      spark.read.parquet(s"$state/v0/bands", newDir))
    val plan = cand.queryExecution.executedPlan.toString
    assert(!plan.contains("minhash_sig"), s"candidate job re-signs documents:\n$plan")
    assert(!plan.contains("documents"), s"candidate job re-reads document text:\n$plan")
    assert(plan.contains("bands"), s"candidate job skips the persisted band index:\n$plan")
    // slim: the shingle payload column never enters the candidate subtree
    assert(!plan.contains("sh#"), s"candidate job carries shingle payloads:\n$plan")
  }

  test("compaction folds bands AND sets, preserves labels; post-compact merges stay exact") {
    val state = graft.util.TmpDirs.scratch("graft_d15_cpt_").toString
    IncrementalMinHash.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 0))
    IncrementalMinHash.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 1))
    val before = clustersSorted(IncrementalMinHash.clusters(spark, state))
    val v = IncrementalMinHash.compact(spark, state)
    assert(IncrementalMinHash.completeVersions(spark, state) == Seq(v))
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) == before)
    val f = graft.ops.GenState.fs(spark, state)
    for (sub <- Seq("bands", "sets")) {
      assert(f.exists(new org.apache.hadoop.fs.Path(s"$state/v$v/$sub/_SUCCESS")),
        s"compacted generation is missing $sub")
    }
    // the verification payload survived the fold: a further ingest whose
    // pairs span old docs still verifies against persisted sets
    IncrementalMinHash.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 2))
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) == oneShot)
  }

  test("threshold is pinned per state dir; empty first batch commits") {
    val state = graft.util.TmpDirs.scratch("graft_d15_cfg_").toString
    IncrementalMinHash.merge(spark, state, docs.where(col("doc_id") < 10), threshold = 0.8)
    val e = intercept[IllegalArgumentException] {
      IncrementalMinHash.merge(spark, state,
        docs.where(col("doc_id") >= 10 && col("doc_id") < 20), threshold = 0.7)
    }
    assert(e.getMessage.contains("threshold"))

    val fresh = graft.util.TmpDirs.scratch("graft_d15_empty_").toString
    assert(IncrementalMinHash.latestVersion(spark, fresh).isEmpty)
    assert(IncrementalMinHash.clusters(spark, fresh).count() == 0)
    IncrementalMinHash.merge(spark, fresh, docs.where(col("doc_id") === 0))
    assert(IncrementalMinHash.latestVersion(spark, fresh).contains(0))
  }

  test("d31 delete: tombstoned clustering == CC over the survivors' pair graph; compact purges") {
    // one-shot over survivors: CC over d3 pairs with both endpoints alive
    def oneShotSurviving(mods: Seq[Int]) = {
      val dead = (id: org.apache.spark.sql.Column) =>
        mods.map(m => pmod(id, lit(7)) === m).reduce(_ || _)
      val pairs = Dedup.minhashLshPairs(spark, sf0001)
        .where(!dead(col("d1")) && !dead(col("d2")))
        .select(col("d1"), col("d2"))
      val ckpt = ConnectedComponents.durable(spark,
        graft.util.TmpDirs.sessionCheckpointDir(spark))
      val labels = ConnectedComponents.labelPropagation(pairs, 50, ckpt)
        .map(_._1)
        .getOrElse(ConnectedComponents.starContraction(pairs, ckpt = ckpt)._1)
      clustersSorted(Dedup.clustersOf(labels))
    }
    val state = graft.util.TmpDirs.scratch("graft_d31_del_").toString
    IncrementalMinHash.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalMinHash.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    IncrementalMinHash.delete(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id")))
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) ==
      oneShotSurviving(Seq(0)))
    // compact: purge + pairs retention, then a FURTHER delete still works
    val v = IncrementalMinHash.compact(spark, state)
    val f = graft.ops.GenState.fs(spark, state)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$state/v$v/tombstones")))
    for (t <- Seq("bands", "sets"))
      assert(spark.read.parquet(s"$state/v$v/$t")
        .where(pmod(col("doc_id"), lit(7)) === 0).count() == 0,
        s"purged $t still holds deleted docs")
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) ==
      oneShotSurviving(Seq(0)))
    IncrementalMinHash.delete(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 1).select(col("doc_id")))
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) ==
      oneShotSurviving(Seq(0, 1)),
      "delete after compact diverged — pairs retention broken")
  }
}
