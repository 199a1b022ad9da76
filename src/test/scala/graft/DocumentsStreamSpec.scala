package graft

import graft.ops.{Dedup, IncrementalDedup}
import graft.streaming.DocumentsStream

/** q54: the foreachBatch-driven incremental dedup must actually run
  * MULTIPLE micro-batch merges against one state dir and still land on
  * d7's one-shot labeling.
  */
class DocumentsStreamSpec extends SparkSpec {

  test("streamed micro-batch merges accumulate generations and match batch d7") {
    val state = graft.util.TmpDirs.scratch("graft_q54_spec_state_").toString
    val out = DocumentsStream.runIncrementalDedupAvailableNow(
      spark, sf0001, stateDir = Some(state))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // one generation per staged file — the stream really merged per batch
    assert(IncrementalDedup.latestVersion(spark, state)
      .contains(DocumentsStream.defaultStreamFiles - 1))
    val full = Dedup.dupClusters(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(out == full)
  }
}
