package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.ops.{Dedup, IncrementalDedup}
import graft.streaming.{DocumentsStream, EventsStream}

/** q54: the foreachBatch-driven incremental dedup must actually run
  * MULTIPLE micro-batch merges against one state dir and still land on
  * d7's one-shot labeling — including across a mid-stream crash and a
  * checkpoint resume, in both halves of the at-least-once window (crash
  * before the merge, and crash after the merge but before the stream
  * commit, which re-delivers an already-merged batch).
  */
class DocumentsStreamSpec extends SparkSpec {

  private def fullD7 = Dedup.dupClusters(spark, sf0001)
    .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("streamed micro-batch merges accumulate generations and match batch d7") {
    val state = graft.util.TmpDirs.scratch("graft_q54_spec_state_").toString
    val out = DocumentsStream.runIncrementalDedupAvailableNow(
      spark, sf0001, stateDir = Some(state))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // one generation per staged file — the stream really merged per batch
    assert(IncrementalDedup.latestVersion(spark, state)
      .contains(DocumentsStream.defaultStreamFiles - 1))
    assert(out == fullD7)
    // REGRESSION (batch-key discipline): a SECOND drain into the same
    // persistent state gets fresh content-derived keys — batch ids restart
    // at 0 with every fresh checkpoint, so keying by the id alone would
    // silently drop the second drain's documents as "already ingested".
    // The re-drained corpus re-merges (pair-graph dedup keeps the
    // clustering exact) and the generation count GROWS.
    val before = IncrementalDedup.completeVersions(spark, state).size
    val out2 = DocumentsStream.runIncrementalDedupAvailableNow(
      spark, sf0001, stateDir = Some(state))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(IncrementalDedup.completeVersions(spark, state).size > before,
      "a second drain's batches must not be dropped by batch-id key collisions")
    assert(out2 == fullD7)
  }

  test("q55: streamed MinHash merges accumulate generations and match the one-shot d3 clustering") {
    val state = graft.util.TmpDirs.scratch("graft_q55_spec_state_").toString
    val out = DocumentsStream.runMinHashDedupAvailableNow(
      spark, sf0001, stateDir = Some(state))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(graft.ops.IncrementalMinHash.latestVersion(spark, state)
      .contains(DocumentsStream.defaultStreamFiles - 1))
    // one-shot twin: CC over d3's verified pairs (IncrementalMinHashSpec
    // derivation, reproduced over the full corpus)
    val pairs = Dedup.minhashLshPairs(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("d1"),
        org.apache.spark.sql.functions.col("d2"))
    val ckpt = graft.ops.ConnectedComponents.durable(spark,
      graft.util.TmpDirs.sessionCheckpointDir(spark))
    val labels = graft.ops.ConnectedComponents.labelPropagation(pairs, 50, ckpt)
      .map(_._1)
      .getOrElse(graft.ops.ConnectedComponents.starContraction(pairs, ckpt = ckpt)._1)
    val full = Dedup.clustersOf(labels)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(out == full)
  }

  test("q57: streamed exact-dedup generations re-aggregate to d1's one-shot") {
    val state = graft.util.TmpDirs.scratch("graft_q57_spec_state_").toString
    val out = DocumentsStream.runExactDedupAvailableNow(
      spark, sf0001, stateDir = Some(state))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(graft.ops.IncrementalExact.latestVersion(spark, state)
      .contains(DocumentsStream.defaultStreamFiles - 1))
    val full = Dedup.exactDedup(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(out == full)
  }

  test("q58: streamed substring merges accumulate anchor generations and match d13's spans") {
    val state = graft.util.TmpDirs.scratch("graft_q58_spec_state_").toString
    val out = DocumentsStream.runSubstringDedupAvailableNow(
      spark, sf0001, stateDir = Some(state))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(graft.ops.IncrementalSubstring.latestVersion(spark, state)
      .contains(DocumentsStream.defaultStreamFiles - 1))
    val full = Dedup.exactSubstringPairs(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(out == full)
  }

  test("q60: streamed media merges accumulate signature generations and match m5's pairs") {
    val state = graft.util.TmpDirs.scratch("graft_q60_spec_state_").toString
    val out = DocumentsStream.runMediaDedupAvailableNow(
      spark, sf0001, stateDir = Some(state))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    // 6 fixture assets stage into up to `defaultStreamFiles` parquet files
    // (empty round-robin partitions write none) — require MULTIPLE
    // micro-batch merges, not an exact count
    assert(graft.ops.IncrementalMedia.latestVersion(spark, state).exists(_ >= 1))
    val want = graft.ops.Multimodal.ppmNearDup(spark)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(out == want)
  }

  test("q61: streamed count-partial training scores identically to one-shot t17") {
    val state = graft.util.TmpDirs.scratch("graft_q61_spec_state_").toString
    val out = DocumentsStream.runClassifierTrainAvailableNow(
      spark, sf0001, stateDir = Some(state))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(graft.ops.IncrementalClassifier.latestVersion(spark, state)
      .contains(DocumentsStream.defaultStreamFiles - 1))
    val want = graft.ops.TextAnalysis.qualityClassifier(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(out == want)
  }

  test("q59: streamed ANN ingest over the frozen model matches s7's one-shot top-k") {
    val model = graft.util.TmpDirs.scratch("graft_q59_spec_model_").toString
    graft.ops.Similarity.persistedIvfCentroids(spark, sf0001, model)
    val state = graft.util.TmpDirs.scratch("graft_q59_spec_state_").toString
    val out = DocumentsStream.runAnnIngestAvailableNow(
      spark, sf0001, model, stateDir = Some(state))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(graft.ops.IncrementalIvf.latestVersion(spark, state)
      .contains(DocumentsStream.defaultStreamFiles - 1))
    val full = graft.ops.Similarity.annIvfPersisted(spark, sf0001, model)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(out == full)
  }

  test("q56: streamed embedding merges match d11's one-shot clustering") {
    val state = graft.util.TmpDirs.scratch("graft_q56_spec_state_").toString
    val out = DocumentsStream.runEmbeddingDedupAvailableNow(
      spark, sf0001, stateDir = Some(state))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(graft.ops.IncrementalEmbedding.latestVersion(spark, state)
      .contains(DocumentsStream.defaultStreamFiles - 1))
    val full = graft.ops.Similarity.embeddingDupClusters(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(out == full)
  }

  /** One AvailableNow pass over `src` with a STABLE checkpoint, merging
    * each micro-batch into `state`; `boomAt` crashes batch `id` —
    * `afterMerge=false` models a crash before any work landed,
    * `afterMerge=true` the crash after the generation committed but
    * before the stream checkpointed the batch (the re-delivery window).
    */
  private def runPass(src: String, ckpt: String, state: String,
      boomAt: Option[Long], afterMerge: Boolean = false): Unit = {
    val ss = EventsStream.streamSession(spark)
    val schema = ss.read.parquet(src).schema
    val q = ss.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (boomAt.contains(id) && !afterMerge) sys.error(s"boom before merge $id")
        IncrementalDedup.merge(batch.sparkSession, state, batch)
        if (boomAt.contains(id) && afterMerge) sys.error(s"boom after merge $id")
        ()
      }
      .start()
    try q.awaitTermination()
    catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
      assert(boomAt.isDefined, s"unexpected stream failure: $e") }
  }

  /** The q57 variant of [[runPass]]: exact-modality merges, KEYED by the
    * foreachBatch batch id as the production runner does.
    */
  private def runExactPass(src: String, ckpt: String, state: String,
      boomAt: Option[Long], afterMerge: Boolean = false): Unit = {
    val ss = EventsStream.streamSession(spark)
    val schema = ss.read.parquet(src).schema
    val q = ss.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (boomAt.contains(id) && !afterMerge) sys.error(s"boom before merge $id")
        graft.ops.IncrementalExact.merge(batch.sparkSession, state, batch,
          Some(s"b$id"))
        if (boomAt.contains(id) && afterMerge) sys.error(s"boom after merge $id")
        ()
      }
      .start()
    try q.awaitTermination()
    catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
      assert(boomAt.isDefined, s"unexpected stream failure: $e") }
  }

  test("q77/q78: streamed delete feeds serve the survivors; re-ingest restores the corpus") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val docs = graft.sources.Tables.documents(spark, sf0001)
    // exact modality: ingest stream + keyed delete stream == survivors
    val state = graft.util.TmpDirs.scratch("graft_q77_spec_state_").toString
    val served = DocumentsStream.runExactDeleteAvailableNow(
        spark, sf0001, stateDir = Some(state))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val survivors = docs.where(pmod(col("doc_id"), lit(7)) =!= 3)
    val want = survivors
      .select(col("doc_id"), org.apache.spark.sql.functions.sha2(
        graft.ops.Text.normalized(col("text")).cast("binary"), 256).as("h"))
      .groupBy(col("h"))
      .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("keeper"),
        org.apache.spark.sql.functions.count(lit(1)).as("n_copies"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(served == want,
      "streamed deletes diverged from the survivors-only aggregate")
    // the s9 liveness path under streaming: re-ingest the tombstoned docs
    // as one more keyed merge — the full-corpus aggregate returns
    graft.ops.IncrementalExact.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 3), Some("reingest"))
    val full = graft.ops.IncrementalExact.dedup(spark, state)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val wantFull = graft.ops.Dedup.exactDedup(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(full == wantFull, "re-ingested docs must be live after their tombstones")
    // clustering modality: streamed d29 tombstones == survivors' one-shot
    val cstate = graft.util.TmpDirs.scratch("graft_q78_spec_state_").toString
    val cserved = DocumentsStream.runClusterDeleteAvailableNow(
        spark, sf0001, stateDir = Some(cstate))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val sdir = graft.util.TmpDirs.scratch("graft_q78_oneshot_").toString
    survivors.write.mode("overwrite").parquet(s"$sdir/documents.parquet")
    val cwant = Dedup.dupClusters(spark, sdir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(cserved == cwant,
      "streamed cluster deletes diverged from the survivors' one-shot clustering")
  }

  test("maybeCompact firing BETWEEN delete micro-batches: mid-stream purge, drain stays exact") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val survivors = docs.where(pmod(col("doc_id"), lit(7)) =!= 3)
    // exact modality: ingest two keyed batches, then a TWO-batch delete
    // feed with the compaction policy firing INSIDE the feed — after the
    // first delete micro-batch the state compacts (tombstone purged
    // physically, mid-stream), and the second delete batch lands on the
    // freshly-compacted state
    val state = graft.util.TmpDirs.scratch("graft_q77_interleave_").toString
    graft.ops.IncrementalExact.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("b0"))
    graft.ops.IncrementalExact.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b1"))
    val delSrc = graft.util.TmpDirs.scratch("graft_q77_interleave_del_").toString
    docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id"))
      .repartition(2).write.mode("overwrite").parquet(delSrc)
    val ss = EventsStream.streamSession(spark)
    var compactsFired = 0
    val q = ss.readStream
      .schema(ss.read.parquet(delSrc).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(delSrc)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        graft.util.TmpDirs.scratch("graft_q77_interleave_ckpt_").toString)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.ops.IncrementalExact.delete(batch.sparkSession, state, batch,
          Some(s"del$id"))
        // the interleave under test: maintenance racing the delete feed
        if (graft.ops.IncrementalExact.maybeCompact(
            batch.sparkSession, state, maxLive = 2).nonEmpty)
          compactsFired += 1
        ()
      }
      .start()
    q.awaitTermination()
    assert(compactsFired >= 1,
      "the compaction policy never fired mid-feed — the interleave was not exercised")
    val out = graft.ops.IncrementalExact.dedup(spark, state)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val want = survivors
      .select(col("doc_id"), org.apache.spark.sql.functions.sha2(
        graft.ops.Text.normalized(col("text")).cast("binary"), 256).as("h"))
      .groupBy(col("h"))
      .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("keeper"),
        org.apache.spark.sql.functions.count(lit(1)).as("n_copies"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(out == want,
      "mid-stream compaction between delete batches broke the survivors-only drain")
    // and the purge really happened between the batches: the final state
    // carries no tombstones from before the last compact, yet the
    // still-live tombstone generation (if any) keeps shadowing — either
    // way the sidecar of the newest compacted generation holds no purged
    // doc: certify by re-folding once more and checking the disk
    graft.ops.IncrementalExact.compact(spark, state)
    val vlast = graft.ops.IncrementalExact.completeVersions(spark, state).last
    assert(spark.read.parquet(s"$state/v$vlast/docs")
      .where(pmod(col("doc_id"), lit(7)) === 3).count() == 0,
      "deleted docs survived the interleaved purges on disk")
    // clustering modality: the same interleave over the d29 tombstones
    val cstate = graft.util.TmpDirs.scratch("graft_q78_interleave_").toString
    IncrementalDedup.merge(spark, cstate, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalDedup.merge(spark, cstate, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    val q2 = ss.readStream
      .schema(ss.read.parquet(delSrc).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(delSrc)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        graft.util.TmpDirs.scratch("graft_q78_interleave_ckpt_").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IncrementalDedup.delete(batch.sparkSession, cstate, batch)
        IncrementalDedup.maybeCompact(batch.sparkSession, cstate, maxLive = 2)
        ()
      }
      .start()
    q2.awaitTermination()
    val cout = IncrementalDedup.clusters(spark, cstate)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val sdir = graft.util.TmpDirs.scratch("graft_q78_interleave_oneshot_").toString
    survivors.write.mode("overwrite").parquet(s"$sdir/documents.parquet")
    val cwant = Dedup.dupClusters(spark, sdir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(cout == cwant,
      "mid-stream compaction between cluster-delete batches broke the drain")
  }

  test("q80: streamed correction feed serves the corrected rollup, split-invariant vs q79") {
    // the stream splits the ingest over defaultStreamFiles triggers and the
    // corrections over 2; q79's batch path uses a 2/1 split. Equal serves
    // across DIFFERENT splits is the abelian split-invariance claim.
    val served = DocumentsStream.runViewCorrectionAvailableNow(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val want = SparkEntry.queries("q79_view_retraction")(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(served == want,
      "streamed corrections diverged from the batch retraction path")
  }

  test("q57 re-delivery window: duplicated exact-ingest batch is a no-op, counts stay exact") {
    val src = graft.util.TmpDirs.scratch("graft_q57_redel_src_").toString
    val ckpt = graft.util.TmpDirs.scratch("graft_q57_redel_ckpt_").toString
    val state = graft.util.TmpDirs.scratch("graft_q57_redel_state_").toString
    graft.sources.Tables.documents(spark, sf0001)
      .repartition(4).write.mode("overwrite").parquet(src)

    runExactPass(src, ckpt, state, boomAt = Some(2L), afterMerge = true)
    // batch 2's generation COMMITTED even though the stream didn't
    assert(graft.ops.IncrementalExact.latestVersion(spark, state).contains(2))

    runExactPass(src, ckpt, state, boomAt = None)
    // batch 2 re-delivered but NOT re-appended (the keyed merge no-ops):
    // exactly one generation per staged file, unlike q54's harmless extra
    assert(graft.ops.IncrementalExact.completeVersions(spark, state) ==
      Seq(0, 1, 2, 3),
      "re-delivered exact batch appended a duplicate partial-aggregate generation")
    val out = graft.ops.IncrementalExact.dedup(spark, state)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val full = Dedup.exactDedup(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(out == full, "q57 diverged from d1's one-shot after re-delivery")
  }

  test("crash BEFORE batch 2's merge, resume from checkpoint: parity with one-shot d7") {
    val src = graft.util.TmpDirs.scratch("graft_q54_crash_src_").toString
    val ckpt = graft.util.TmpDirs.scratch("graft_q54_crash_ckpt_").toString
    val state = graft.util.TmpDirs.scratch("graft_q54_crash_state_").toString
    graft.sources.Tables.documents(spark, sf0001)
      .repartition(4).write.mode("overwrite").parquet(src)

    runPass(src, ckpt, state, boomAt = Some(2L))
    // batches 0 and 1 committed their generations; nothing else
    assert(IncrementalDedup.latestVersion(spark, state).contains(1))

    runPass(src, ckpt, state, boomAt = None)
    // the checkpoint resumed at batch 2 — exactly 4 generations total
    assert(IncrementalDedup.latestVersion(spark, state).contains(3))
    assert(IncrementalDedup.clusters(spark, state)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == fullD7)
  }

  test("crash AFTER batch 2's merge (re-delivery window): duplicate re-merge stays exact") {
    val src = graft.util.TmpDirs.scratch("graft_q54_redel_src_").toString
    val ckpt = graft.util.TmpDirs.scratch("graft_q54_redel_ckpt_").toString
    val state = graft.util.TmpDirs.scratch("graft_q54_redel_state_").toString
    graft.sources.Tables.documents(spark, sf0001)
      .repartition(4).write.mode("overwrite").parquet(src)

    runPass(src, ckpt, state, boomAt = Some(2L), afterMerge = true)
    // batch 2's generation COMMITTED even though the stream didn't
    assert(IncrementalDedup.latestVersion(spark, state).contains(2))

    runPass(src, ckpt, state, boomAt = None)
    // batch 2 re-delivered and re-merged as a 5th generation: band rows
    // duplicate until compact, but the labeling must be unchanged-exact
    assert(IncrementalDedup.latestVersion(spark, state).contains(4))
    assert(IncrementalDedup.clusters(spark, state)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == fullD7)
    // and compact() sweeps the bloat back to one generation, same labels
    IncrementalDedup.compact(spark, state)
    assert(IncrementalDedup.completeVersions(spark, state).size == 1)
    assert(IncrementalDedup.clusters(spark, state)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == fullD7)
  }
}
