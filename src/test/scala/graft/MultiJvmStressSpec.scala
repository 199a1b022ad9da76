package graft

import org.apache.spark.sql.functions._

import graft.ops.{GenState, IncrementalExact, IncrementalMinHash}

/** Multi-JVM claim/fence stress: the concurrency protocol across REAL
  * process boundaries.
  *
  * Every other concurrency spec races threads inside one JVM; a real
  * 100 TB deployment's first collision is two SEPARATE Spark jobs — own
  * drivers, own claim-backend instances, nothing shared but the
  * filesystem. This spec forks [[graft.tools.MultiJvmStressWorker]] as
  * actual `java` processes (each builds its own SparkSession) against one
  * shared state dir and asserts, per family:
  *
  *   - every concurrent merge COMMITS (the fresh allocator never treats a
  *     live sibling's in-flight generation as a crash leftover);
  *   - the concurrent compactor folds or aborts CLEANLY (exit-code
  *     contract: 0 committed, 2 clean protocol abort, anything else a
  *     real failure);
  *   - the served state equals SEQUENTIAL ingest of the same batches —
  *     for the count-partial exact family bit-for-bit counts, for the
  *     probe-at-merge MinHash family the one-shot clustering (the
  *     `_PROBED` reconciliation must repair cross pairs across process
  *     boundaries exactly as it does across threads).
  *
  * Both merge+compactor races run under BOTH claim backends (round 19):
  * the in-tree `_CLAIM` files (O_EXCL — the HDFS/ABFS shape) and the
  * external conditional-put store, where every worker process builds its
  * OWN [[GenState.ExternalCpClaimBackend]] against one shared store root
  * — separate drivers against one DynamoDB table / S3 prefix, the actual
  * object-store deployment shape. The remaining local-FS boundary is the
  * fenced table publish's RENAME, which [[PointerPublishSpec]] removes
  * with the pointer publish mode on a rename-less filesystem.
  */
class MultiJvmStressSpec extends SparkSpec {

  import MultiJvmHarness.{drain, fork}

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  /** Backend axis: None = in-tree FS claims; Some(()=>store) = a fresh
    * external conditional-put store root shared by the spec JVM and every
    * forked worker.
    */
  private val backends: Seq[(String, () => Option[String])] = Seq(
    "fs" -> (() => None),
    "external-cp" -> (() =>
      Some(graft.util.TmpDirs.scratch("graft_mjvm_cpstore_").toString)))

  private def withBackend[T](store: Option[String])(body: => T): T = {
    val before = GenState.claimBackend
    store.foreach(s => GenState.claimBackend = new GenState.ExternalCpClaimBackend(s))
    try body finally GenState.claimBackend = before
  }

  for ((bk, mkStore) <- backends)
  test(s"[$bk] exact family: 3 merge processes + 1 compactor process — all clean, state equals sequential ingest") {
    val store = mkStore()
    withBackend(store) {
    val state = graft.util.TmpDirs.scratch("graft_mjvm_exact_").toString
    // seed one committed generation so the racing compactor always has
    // something to fold whatever the interleaving
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(4)) === 3), Some("seed"))
    val ws = Seq(
      fork("exact", "merge", state, sf0001, 4, 0, "j0", store),
      fork("exact", "merge", state, sf0001, 4, 1, "j1", store),
      fork("exact", "merge", state, sf0001, 4, 2, "j2", store),
      fork("exact", "compact", state, sf0001, 4, -1, "comp", store))
    val out = drain(ws)
    val bad = out.filterNot { case (tag, rc, _) =>
      rc == 0 || (rc == 2 && tag.contains("compact")) }
    assert(bad.isEmpty, s"non-clean worker outcomes:\n${bad.mkString("\n\n")}")
    assert(out.filter(_._1.contains("merge")).forall(_._2 == 0),
      s"every cross-process merge must commit (fresh allocation never aborts a sibling):\n$out")
    // exactly-once keys survived the cross-process race
    assert(GenState.ingestedKeys(spark, state, "hashes") ==
      Set("seed", "j0", "j1", "j2"), "all four batch keys must be recorded")
    // served state == sequential ingest of the same four batches
    val seq = graft.util.TmpDirs.scratch("graft_mjvm_exact_seq_").toString
    IncrementalExact.merge(spark, seq, docs.where(pmod(col("doc_id"), lit(4)) === 3), Some("seed"))
    IncrementalExact.merge(spark, seq, docs.where(pmod(col("doc_id"), lit(4)) === 0), Some("j0"))
    IncrementalExact.merge(spark, seq, docs.where(pmod(col("doc_id"), lit(4)) === 1), Some("j1"))
    IncrementalExact.merge(spark, seq, docs.where(pmod(col("doc_id"), lit(4)) === 2), Some("j2"))
    val got = IncrementalExact.dedup(spark, state).collect().map(_.toString).sorted.toSeq
    val want = IncrementalExact.dedup(spark, seq).collect().map(_.toString).sorted.toSeq
    assert(got == want, "cross-process state must serve exactly the sequential-ingest answer")
    // and the state still compacts to one generation afterwards
    val v = IncrementalExact.compact(spark, state)
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(v))
    assert(IncrementalExact.dedup(spark, state).collect().map(_.toString).sorted.toSeq == want)
    }
  }

  test("exact family: TWO compactor processes racing — never a double-fold, state intact either way") {
    val state = graft.util.TmpDirs.scratch("graft_mjvm_2comp_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("a"))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b"))
    val total = IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    val ws = Seq(
      fork("exact", "compact", state, sf0001, 2, -1, "c1"),
      fork("exact", "compact", state, sf0001, 2, -1, "c2"))
    val out = drain(ws)
    // valid cross-process outcomes: both folded (they serialized in time —
    // JVM startup jitter usually exceeds the fold) or one folded and one
    // failed fast on the live _MAINT lease (exit 2). Never anything else,
    // and never a served double-count: the _MAINT lease + commit fence +
    // read-side overlap shadow make a double-fold unservable even if both
    // commit.
    assert(out.forall(o => o._2 == 0 || o._2 == 2),
      s"non-clean compactor outcomes:\n${out.mkString("\n\n")}")
    assert(out.exists(_._2 == 0), s"at least one compactor must fold:\n$out")
    out.filter(_._2 == 2).foreach { case (_, _, log) =>
      assert(log.contains("CLEAN-ABORT"), s"loser must abort via the protocol: $log")
    }
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == total,
      "racing cross-process compactors must never change the served counts")
    // whatever happened, the store remains compactable and single-live
    val v = IncrementalExact.compact(spark, state)
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(v))
  }

  test("FULL object-store simulation: 3 merges + compactor as processes, pointer publish, NO renames, external claims") {
    // the strongest local approximation of the S3 deployment: separate
    // JVMs, a filesystem that THROWS on every protocol rename
    // (NoRenameFs), the rename-free pointer commit, and claims through
    // the external conditional-put store — all four axes at once
    spark.sparkContext.hadoopConfiguration.setClass("fs.norename.impl",
      classOf[NoRenameFs], classOf[org.apache.hadoop.fs.FileSystem])
    val store = Some(graft.util.TmpDirs.scratch("graft_mjvm_s3sim_store_").toString)
    val state = s"norename://${graft.util.TmpDirs.scratch("graft_mjvm_s3sim_")}"
    val beforeMode = GenState.publishMode
    GenState.publishMode = GenState.PointerPublish
    try withBackend(store) {
      IncrementalExact.merge(spark, state,
        docs.where(pmod(col("doc_id"), lit(4)) === 3), Some("seed"))
      val ws = Seq(
        fork("exact", "merge", state, sf0001, 4, 0, "j0", store, "pointer"),
        fork("exact", "merge", state, sf0001, 4, 1, "j1", store, "pointer"),
        fork("exact", "merge", state, sf0001, 4, 2, "j2", store, "pointer"),
        fork("exact", "compact", state, sf0001, 4, -1, "comp", store, "pointer"))
      val out = drain(ws)
      val bad = out.filterNot { case (tag, rc, _) =>
        rc == 0 || (rc == 2 && tag.contains("compact")) }
      assert(bad.isEmpty, s"non-clean worker outcomes:\n${bad.mkString("\n\n")}")
      assert(out.filter(_._1.contains("merge")).forall(_._2 == 0),
        s"every cross-process pointer-mode merge must commit:\n$out")
      assert(GenState.ingestedKeys(spark, state, "hashes") ==
        Set("seed", "j0", "j1", "j2"))
      val seq = graft.util.TmpDirs.scratch("graft_mjvm_s3sim_seq_").toString
      for ((r, k) <- Seq(3 -> "seed", 0 -> "j0", 1 -> "j1", 2 -> "j2"))
        IncrementalExact.merge(spark, seq,
          docs.where(pmod(col("doc_id"), lit(4)) === r), Some(k))
      val got = IncrementalExact.dedup(spark, state).collect().map(_.toString).sorted.toSeq
      val want = IncrementalExact.dedup(spark, seq).collect().map(_.toString).sorted.toSeq
      assert(got == want,
        "cross-process pointer-mode state must serve exactly the sequential-ingest answer")
      val v = IncrementalExact.compact(spark, state)
      assert(GenState.completeVersions(spark, state, "hashes") == Seq(v))
      assert(IncrementalExact.dedup(spark, state)
        .collect().map(_.toString).sorted.toSeq == want)
    } finally GenState.publishMode = beforeMode
  }

  for ((bk, mkStore) <- backends)
  test(s"[$bk] MinHash family: 3 merge processes + 1 compactor process — clustering equals the one-shot") {
    val store = mkStore()
    withBackend(store) {
    val state = graft.util.TmpDirs.scratch("graft_mjvm_mh_").toString
    IncrementalMinHash.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(4)) === 3), batchKey = Some("seed"))
    val ws = Seq(
      fork("minhash", "merge", state, sf0001, 4, 0, "j0", store),
      fork("minhash", "merge", state, sf0001, 4, 1, "j1", store),
      fork("minhash", "merge", state, sf0001, 4, 2, "j2", store),
      fork("minhash", "compact", state, sf0001, 4, -1, "comp", store))
    val out = drain(ws)
    val bad = out.filterNot { case (tag, rc, _) =>
      rc == 0 || (rc == 2 && tag.contains("compact")) }
    assert(bad.isEmpty, s"non-clean worker outcomes:\n${bad.mkString("\n\n")}")
    assert(out.filter(_._1.contains("merge")).forall(_._2 == 0),
      s"every cross-process merge must commit:\n$out")
    // probe-at-merge invariant across PROCESS boundaries: whatever pairs
    // the concurrent merges missed, reconciliation serves the one-shot
    def sortedClusters(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "cluster_id", "cluster_size", "is_keeper")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val fresh = graft.util.TmpDirs.scratch("graft_mjvm_mh_oneshot_").toString
    IncrementalMinHash.merge(spark, fresh, docs)
    val want = sortedClusters(IncrementalMinHash.clusters(spark, fresh))
    assert(sortedClusters(IncrementalMinHash.clusters(spark, state)) == want,
      "cross-process MinHash state must serve exactly the one-shot clustering")
    // durable after a fold: compact and re-serve
    IncrementalMinHash.compact(spark, state)
    assert(sortedClusters(IncrementalMinHash.clusters(spark, state)) == want)
    }
  }
}
