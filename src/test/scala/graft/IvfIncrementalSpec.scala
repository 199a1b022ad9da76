package graft

import org.apache.spark.sql.functions._

import graft.ops.{IncrementalIvf, Similarity}

/** s8: incremental ANN ingest over the frozen s7 model — split-ingest
  * must equal s7's one-shot exactly (assignment is a pure function of
  * vector × frozen centroids), ingest must be write-only, model drift
  * must be refused, and compaction must not change the answer.
  */
class IvfIncrementalSpec extends SparkSpec {

  private lazy val modelDir = {
    val dir = graft.util.TmpDirs.scratch("graft_s8_spec_model_").toString
    Similarity.persistedIvfCentroids(spark, sf0001, dir)
    dir
  }

  private def vecs = graft.sources.Tables.embeddings(spark, sf0001)

  private lazy val oneShot = Similarity.annIvfPersisted(spark, sf0001, modelDir)
    .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("split-ingest postings equal the s7 one-shot, any split") {
    for (mod <- Seq(2, 4)) {
      val state = graft.util.TmpDirs.scratch(s"graft_s8_t_${mod}_").toString
      (0 until mod).foreach(r => IncrementalIvf.merge(spark, state, modelDir,
        vecs.where(pmod(col("vec_id"), lit(mod)) === r)))
      assert(IncrementalIvf.completeVersions(spark, state).size == mod)
      val got = IncrementalIvf.annTopK(spark, state, modelDir)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(got == oneShot, s"$mod-way split-ingest diverged from s7")
    }
  }

  test("ingest is write-only: a later merge never touches prior generations") {
    val state = graft.util.TmpDirs.scratch("graft_s8_wo_").toString
    IncrementalIvf.merge(spark, state, modelDir, vecs.where(col("vec_id") < 50))
    val f = graft.ops.GenState.fs(spark, state)
    val v0 = new org.apache.hadoop.fs.Path(s"$state/v0/postings/_SUCCESS")
    val before = f.getFileStatus(v0).getModificationTime
    IncrementalIvf.merge(spark, state, modelDir, vecs.where(col("vec_id") >= 50))
    assert(f.getFileStatus(v0).getModificationTime == before)
    assert(IncrementalIvf.latestVersion(spark, state).contains(1))
  }

  test("a merge with a different model is refused (mixed assignment regimes)") {
    val state = graft.util.TmpDirs.scratch("graft_s8_drift_").toString
    IncrementalIvf.merge(spark, state, modelDir, vecs.where(col("vec_id") < 50))
    // an UNTRAINED model (first-k centroids, not Lloyd's) in another dir
    val other = graft.util.TmpDirs.scratch("graft_s8_drift_model_").toString
    import spark.implicits._
    Similarity.firstKCentroids(spark, sf0001)
      .map { case (cid, ce, cn) => (cid, ce.toSeq, cn) }
      .toDF("cid", "ce", "cn").coalesce(1).write.mode("overwrite").parquet(other)
    val e = intercept[IllegalArgumentException] {
      IncrementalIvf.merge(spark, state, other, vecs.where(col("vec_id") >= 50))
    }
    assert(e.getMessage.contains("refusing"))
    // and an untrained model dir is refused outright
    val missing = graft.util.TmpDirs.scratch("graft_s8_missing_").toString + "/nope"
    assert(intercept[IllegalArgumentException] {
      IncrementalIvf.merge(spark, state, missing, vecs)
    }.getMessage.contains("no trained model"))
  }

  test("compact folds postings to one generation without changing the answer") {
    val state = graft.util.TmpDirs.scratch("graft_s8_cpt_").toString
    (0 until 3).foreach(r => IncrementalIvf.merge(spark, state, modelDir,
      vecs.where(pmod(col("vec_id"), lit(3)) === r)))
    assert(IncrementalIvf.maybeCompact(spark, state, maxLive = 4).isEmpty)
    val v = IncrementalIvf.maybeCompact(spark, state, maxLive = 2)
    assert(v.nonEmpty)
    assert(IncrementalIvf.completeVersions(spark, state) == Seq(v.get))
    val got = IncrementalIvf.annTopK(spark, state, modelDir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == oneShot)
    // post-compact ingest still works and totals stay exact
    assert(IncrementalIvf.merge(spark, state, modelDir,
      vecs.limit(0)) == v.get + 1)
  }

  test("s9: tombstone-after-ingest equals never-ingested (same frozen model)") {
    val del = pmod(col("vec_id"), lit(7)) === 3
    // reference: the survivors ingested alone
    val ref = graft.util.TmpDirs.scratch("graft_s9_ref_").toString
    IncrementalIvf.merge(spark, ref, modelDir, vecs.where(!del))
    val want = IncrementalIvf.annTopK(spark, ref, modelDir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // full ingest then tombstone
    val state = graft.util.TmpDirs.scratch("graft_s9_del_").toString
    (0 until 3).foreach(r => IncrementalIvf.merge(spark, state, modelDir,
      vecs.where(pmod(col("vec_id"), lit(3)) === r)))
    IncrementalIvf.delete(spark, state, vecs.where(del).select(col("vec_id")))
    val got = IncrementalIvf.annTopK(spark, state, modelDir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == want && want != oneShot,
      "tombstoned search diverged from the never-ingested reference")

    // LSM shadowing: a tombstone deletes OLDER generations only — a
    // later re-ingest of a deleted id is live again
    val back = vecs.where(col("vec_id") === 3)
    IncrementalIvf.merge(spark, state, modelDir, back)
    assert(IncrementalIvf.livePostings(spark, state)
      .where(col("vec_id") === 3).count() == 1)

    // compact: tombstones applied PHYSICALLY (purge) and dropped; the
    // answer is unchanged and the folded parquet holds no deleted ids
    IncrementalIvf.delete(spark, state, back.select(col("vec_id"))) // re-delete 3
    val answer = IncrementalIvf.annTopK(spark, state, modelDir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val cv = IncrementalIvf.compact(spark, state)
    assert(IncrementalIvf.completeVersions(spark, state) == Seq(cv))
    assert(IncrementalIvf.annTopK(spark, state, modelDir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == answer)
    val folded = spark.read.parquet(s"$state/v$cv/postings")
    assert(folded.where(del).count() == 0, "purged generation still holds tombstoned rows")
    val f = graft.ops.GenState.fs(spark, state)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$state/v$cv/deletes")),
      "compacted generation carries tombstones forward")
  }
}
