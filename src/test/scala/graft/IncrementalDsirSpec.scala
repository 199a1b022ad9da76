package graft

import org.apache.spark.sql.functions._

import graft.ops.{Corpus, IncrementalDsir}

/** c12: the write-only incremental twin of c11's importance selection —
  * split-ingest must equal the one-shot selection for any split (weights
  * are a pure function of the summed counts), a merge must never read
  * prior state, re-delivered keyed batches are no-ops, and compaction
  * folds the count generations without changing the selection.
  */
class IncrementalDsirSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "rnk", "score")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("split-ingest-then-select equals c11's one-shot, any split") {
    val full = sorted(Corpus.importanceSelect(spark, sf0001))
    for (mod <- Seq(2, 4)) {
      val state = graft.util.TmpDirs.scratch(s"graft_c12_t_${mod}_").toString
      (0 until mod).foreach { r =>
        IncrementalDsir.merge(spark, state,
          docs.where(pmod(col("doc_id"), lit(mod)) === r))
      }
      assert(sorted(IncrementalDsir.select(spark, state)) == full,
        s"$mod-way split-ingest diverged from the one-shot selection")
    }
  }

  test("ingest is WRITE-ONLY and never touches committed generations") {
    val state = graft.util.TmpDirs.scratch("graft_c12_wo_").toString
    IncrementalDsir.merge(spark, state, docs.where(col("doc_id") < 100))
    val f = graft.ops.GenState.fs(spark, state)
    val v0 = new org.apache.hadoop.fs.Path(s"$state/v0/counts/_SUCCESS")
    val before = f.getFileStatus(v0).getModificationTime
    IncrementalDsir.merge(spark, state, docs.where(col("doc_id") >= 100))
    assert(f.getFileStatus(v0).getModificationTime == before)
    assert(IncrementalDsir.latestVersion(spark, state).contains(1))
  }

  test("keyed re-delivery is a no-op; compact preserves the selection and markers") {
    val state = graft.util.TmpDirs.scratch("graft_c12_idem_").toString
    val b0 = docs.where(col("doc_id") < 100)
    val b1 = docs.where(col("doc_id") >= 100)
    val v0 = IncrementalDsir.merge(spark, state, b0, Some("b0"))
    assert(IncrementalDsir.merge(spark, state, b0, Some("b0")) == v0)
    assert(IncrementalDsir.completeVersions(spark, state) == Seq(v0))
    IncrementalDsir.merge(spark, state, b1, Some("b1"))
    val full = sorted(Corpus.importanceSelect(spark, sf0001))
    assert(sorted(IncrementalDsir.select(spark, state)) == full)
    IncrementalDsir.compact(spark, state)
    assert(IncrementalDsir.completeVersions(spark, state).size == 1)
    // markers travel with the fold: re-delivery after compact still no-op
    IncrementalDsir.merge(spark, state, b0, Some("b0"))
    IncrementalDsir.merge(spark, state, b1, Some("b1"))
    assert(IncrementalDsir.completeVersions(spark, state).size == 1,
      "re-delivery after compact appended a generation")
    assert(sorted(IncrementalDsir.select(spark, state)) == full)
    // compaction policy bounds live generations
    IncrementalDsir.merge(spark, state, b0)
    assert(IncrementalDsir.maybeCompact(spark, state, maxLive = 3).isEmpty)
    assert(IncrementalDsir.maybeCompact(spark, state, maxLive = 1).nonEmpty)
  }

  test("streaming drain equals the one-shot selection") {
    val got = sorted(graft.streaming.DocumentsStream
      .runDsirSelectAvailableNow(spark, sf0001))
    assert(got == sorted(Corpus.importanceSelect(spark, sf0001)))
  }
}
