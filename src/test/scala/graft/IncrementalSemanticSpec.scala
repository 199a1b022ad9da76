package graft

import org.apache.spark.sql.functions._

import graft.ops.{IncrementalSemantic, Similarity}

/** d23: the incremental twin of d22's semantic dedup — split-ingest under
  * the frozen model must equal the one-shot cluster table exactly
  * (cells, cluster labels, AND the least-prototypical keeper), and the
  * verification regime is pinned in state config.
  */
class IncrementalSemanticSpec extends SparkSpec {

  private lazy val modelDir = {
    val d = graft.util.TmpDirs.scratch("graft_d23spec_model_").toString
    Similarity.persistedIvfCentroids(spark, sf0001, d)
    d
  }

  private def cents = Similarity.persistedIvfCentroids(spark, sf0001, modelDir)

  private def vecs = graft.sources.Tables.embeddings(spark, sf0001)

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_id", "cell", "cluster_id", "is_keeper")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("split-ingest equals d22's one-shot clusters (cells, labels, keepers), any split") {
    val full = sorted(Similarity.semDedupClusters(spark, sf0001))
    for (mod <- Seq(2, 5)) {
      val state = graft.util.TmpDirs.scratch(s"graft_d23_t_${mod}_").toString
      (0 until mod).foreach { r =>
        IncrementalSemantic.merge(spark, state, cents,
          vecs.where(pmod(col("vec_id"), lit(mod)) === r))
      }
      assert(sorted(IncrementalSemantic.clusters(spark, state)) == full,
        s"$mod-way split-ingest diverged from the one-shot clustering")
    }
  }

  test("compact folds state without changing the clustering") {
    val state = graft.util.TmpDirs.scratch("graft_d23_cpt_").toString
    (0 until 3).foreach { r =>
      IncrementalSemantic.merge(spark, state, cents,
        vecs.where(pmod(col("vec_id"), lit(3)) === r))
    }
    val before = sorted(IncrementalSemantic.clusters(spark, state))
    assert(IncrementalSemantic.maybeCompact(spark, state, maxLive = 4).isEmpty)
    val v = IncrementalSemantic.maybeCompact(spark, state, maxLive = 2)
    assert(v.nonEmpty)
    assert(IncrementalSemantic.completeVersions(spark, state) == Seq(v.get))
    assert(sorted(IncrementalSemantic.clusters(spark, state)) == before)
  }

  test("the verification regime is pinned: a drifted threshold fails loudly") {
    val state = graft.util.TmpDirs.scratch("graft_d23_cfg_").toString
    IncrementalSemantic.merge(spark, state, cents,
      vecs.where(col("vec_id") < 100))
    intercept[IllegalArgumentException] {
      IncrementalSemantic.merge(spark, state, cents,
        vecs.where(col("vec_id") >= 100), threshold = 0.9)
    }
  }

  test("streaming drain equals the one-shot clustering") {
    val got = sorted(graft.streaming.DocumentsStream
      .runSemanticDedupAvailableNow(spark, sf0001, modelDir))
    assert(got == sorted(Similarity.semDedupClusters(spark, sf0001)))
  }

  test("d34 delete: == one-shot SemDeDup over survivors under the FROZEN model; compact purges") {
    // one-shot twin: survivors materialized as a scratch corpus, clustered
    // with the centroids trained on the FULL corpus (the frozen-model
    // contract deletes must respect — a delete never retrains)
    def oneShotSurviving(mods: Seq[Int]) = {
      val alive = mods.map(m => pmod(col("vec_id"), lit(7)) =!= m).reduce(_ && _)
      val dir = graft.util.TmpDirs.scratch("graft_d34_oneshot_").toString
      vecs.where(alive).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      sorted(Similarity.semDedupClusters(spark, dir, centroids = Some(cents)))
    }
    val state = graft.util.TmpDirs.scratch("graft_d34_del_").toString
    IncrementalSemantic.merge(spark, state, cents,
      vecs.where(pmod(col("vec_id"), lit(2)) === 0))
    IncrementalSemantic.merge(spark, state, cents,
      vecs.where(pmod(col("vec_id"), lit(2)) === 1))
    IncrementalSemantic.delete(spark, state,
      vecs.where(pmod(col("vec_id"), lit(7)) === 0).select(col("vec_id")))
    assert(sorted(IncrementalSemantic.clusters(spark, state)) ==
      oneShotSurviving(Seq(0)))
    // compact: physical purge, pairs retained, serve unchanged; a FURTHER
    // delete composes
    val v = IncrementalSemantic.compact(spark, state)
    val f = graft.ops.GenState.fs(spark, state)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$state/v$v/tombstones")))
    assert(spark.read.parquet(s"$state/v$v/vecs")
      .where(pmod(col("vec_id"), lit(7)) === 0).count() == 0,
      "purged vecs still hold deleted vectors")
    assert(sorted(IncrementalSemantic.clusters(spark, state)) ==
      oneShotSurviving(Seq(0)))
    IncrementalSemantic.delete(spark, state,
      vecs.where(pmod(col("vec_id"), lit(7)) === 1).select(col("vec_id")))
    assert(sorted(IncrementalSemantic.clusters(spark, state)) ==
      oneShotSurviving(Seq(0, 1)),
      "delete after compact diverged — pairs retention broken")
  }
}
