package graft

import org.apache.spark.sql.functions._

import graft.ops.{GenState, IncrementalExact, IncrementalMinHash}

/** The object-store-safe publish mode: [[GenState.PointerPublish]] writes
  * every generation table to a final-named nonce dir and flips one
  * `_COMMIT` pointer with the conditional create-if-absent primitive — no
  * rename anywhere in the state protocol. These scenarios run the full
  * merge/delete/compact/concurrency surface on [[NoRenameFs]] (a store
  * that THROWS on every non-committer rename) with claims through the
  * external conditional-put backend — the closest local approximation of
  * the S3 deployment shape: no atomic rename, claims outside the tree,
  * one conditional PUT as the only atomic primitive.
  */
class PointerPublishSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  private def registerNoRename(): Unit =
    spark.sparkContext.hadoopConfiguration.setClass("fs.norename.impl",
      classOf[NoRenameFs], classOf[org.apache.hadoop.fs.FileSystem])

  /** Run `body` under PointerPublish with claims in an external
    * conditional-put store; restore both globals after.
    */
  private def withPointerMode[T](external: Boolean = true)(body: => T): T = {
    val beforeMode = GenState.publishMode
    val beforeBackend = GenState.claimBackend
    GenState.publishMode = GenState.PointerPublish
    if (external)
      GenState.claimBackend = new GenState.ExternalCpClaimBackend(
        graft.util.TmpDirs.scratch("graft_ptr_cpstore_").toString)
    try body
    finally {
      GenState.publishMode = beforeMode
      GenState.claimBackend = beforeBackend
    }
  }

  private def noRenameState(prefix: String): String = {
    registerNoRename()
    s"norename://${graft.util.TmpDirs.scratch(prefix)}"
  }

  private def fsOf(state: String) = GenState.fs(spark, state)

  private def exists(state: String, rel: String): Boolean =
    fsOf(state).exists(new org.apache.hadoop.fs.Path(s"$state/$rel"))

  private def lsV(state: String, v: Int): Seq[String] =
    fsOf(state).listStatus(new org.apache.hadoop.fs.Path(s"$state/v$v"))
      .map(_.getPath.getName).toSeq.sorted

  test("NoRenameFs self-test: protocol renames throw, committer (_temporary) renames pass") {
    registerNoRename()
    val dir = s"norename://${graft.util.TmpDirs.scratch("graft_norename_self_")}"
    val f = fsOf(dir)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/a"))
    intercept[java.io.IOException] {
      f.rename(new org.apache.hadoop.fs.Path(s"$dir/a"),
        new org.apache.hadoop.fs.Path(s"$dir/b"))
    }
    // a Spark parquet write lands THROUGH the committer's _temporary
    // renames — the connector-level machinery the shim deliberately allows
    spark.range(10).toDF("id").write.mode("overwrite").parquet(s"$dir/t")
    assert(spark.read.parquet(s"$dir/t").count() == 10)
  }

  test("rename-mode publish genuinely NEEDS rename: the default mode fails on this store") {
    // the control arm: without PointerPublish the very first fenced write
    // aborts on the refused stage rename — proving the gap the pointer
    // mode closes is real, not hypothetical
    val state = noRenameState("graft_ptr_control_")
    val ex = intercept[Exception] {
      IncrementalExact.merge(spark, state, docs.where(col("doc_id") < 50), Some("b0"))
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(chain(ex).exists(_.contains("rename")), s"unexpected failure: $ex")
  }

  test("exact family end-to-end on a rename-less store: merge, re-delivery, delete, compact — all pointer-committed") {
    val state = noRenameState("graft_ptr_exact_")
    withPointerMode() {
      val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
      val v0 = IncrementalExact.merge(spark, state, b1, Some("b0"))
      assert(v0 == 0)
      // pointer layout, not rename layout: _COMMIT present, the commit
      // table lives in a nonce dir, no plain-named table dir exists
      assert(exists(state, "v0/_COMMIT"))
      val names = lsV(state, 0)
      assert(names.exists(_.startsWith("hashes.g")), names.toString)
      assert(!names.contains("hashes"), names.toString)
      IncrementalExact.merge(spark, state, b2, Some("b1"))
      val total = IncrementalExact.dedup(spark, state)
        .agg(sum(col("n_copies"))).collect()(0).getLong(0)
      assert(total == docs.count())
      // exactly-once: a re-delivered batch key is a no-op (returns the
      // latest complete generation, appends nothing)
      val liveBefore = GenState.completeVersions(spark, state, "hashes")
      assert(IncrementalExact.merge(spark, state, b1, Some("b0")) == liveBefore.last)
      assert(GenState.completeVersions(spark, state, "hashes") == liveBefore)
      assert(IncrementalExact.dedup(spark, state)
        .agg(sum(col("n_copies"))).collect()(0).getLong(0) == total)
      // tombstone delete + compact, still rename-free
      val dead = docs.where(col("doc_id") < 10).select(col("doc_id"))
      IncrementalExact.delete(spark, state, dead, Some("d0"))
      val afterDel = IncrementalExact.dedup(spark, state)
        .agg(sum(col("n_copies"))).collect()(0).getLong(0)
      assert(afterDel == docs.count() - dead.count())
      val vc = IncrementalExact.compact(spark, state)
      assert(GenState.completeVersions(spark, state, "hashes") == Seq(vc))
      assert(IncrementalExact.dedup(spark, state)
        .agg(sum(col("n_copies"))).collect()(0).getLong(0) == afterDel)
    }
  }

  test("MinHash family on a rename-less store serves the same clusters as rename mode on the local FS") {
    val state = noRenameState("graft_ptr_minhash_")
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val got = withPointerMode() {
      IncrementalMinHash.merge(spark, state, b1, batchKey = Some("m0"))
      IncrementalMinHash.merge(spark, state, b2, batchKey = Some("m1"))
      IncrementalMinHash.compact(spark, state)
      IncrementalMinHash.clusters(spark, state)
        .collect().map(_.toString).sorted.toSeq
    }
    val ref = graft.util.TmpDirs.scratch("graft_ptr_minhash_ref_").toString
    IncrementalMinHash.merge(spark, ref, b1, batchKey = Some("m0"))
    IncrementalMinHash.merge(spark, ref, b2, batchKey = Some("m1"))
    val want = IncrementalMinHash.clusters(spark, ref)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want && want.nonEmpty,
      "pointer-published state must serve the exact rename-mode clustering")
  }

  test("write fencing under pointer mode: a stalled loser's nonce dirs lose cleanly to a stale-lease steal") {
    val state = noRenameState("graft_ptr_fence_")
    withPointerMode() {
      val tokenA = GenState.claimGeneration(spark, state, 0, "hashes")
      // A crashes: its lease ages past the ttl (backdate both mtime
      // authorities the way GenStateClaimSpec does)
      val f = fsOf(state)
      val old = System.currentTimeMillis() - GenState.leaseTtlMs(spark, state) - 60000
      Seq("_LEASE", "_CLAIM").foreach { n =>
        val p = new org.apache.hadoop.fs.Path(s"$state/v0/$n")
        if (f.exists(p)) f.setTimes(p, old, -1)
      }
      val tokenB = GenState.claimGeneration(spark, state, 0, "hashes")
      GenState.fencedParquet(spark, state, 0, "hashes", tokenB, "hashes")(
        spark.range(7).toDF("id"))
      assert(GenState.completeVersions(spark, state, "hashes") == Seq(0))
      // A wakes and resumes: its job lands in its OWN nonce dir (harmless
      // by construction), the fence aborts, and the junk dir is cleaned
      val ex = intercept[IllegalStateException] {
        GenState.fencedParquet(spark, state, 0, "hashes", tokenA, "hashes")(
          spark.range(999).toDF("id"))
      }
      assert(ex.getMessage.contains("committed by another writer"), ex.getMessage)
      assert(spark.read.parquet(
        GenState.tablePath(spark, state, 0, "hashes")).count() == 7,
        "the thief's pointer-committed table must survive the stalled loser")
      val junk = lsV(state, 0).filter(n =>
        n.startsWith("hashes.g") && n != s"hashes.g${tokenB.take(13)}")
      assert(junk.isEmpty, s"the loser's aborted nonce dir must not linger: $junk")
    }
  }

  test("the pointer-commit flip is single-winner: a pre-existing _COMMIT aborts the commit, and the stale pointer is steal-recoverable") {
    val state = noRenameState("graft_ptr_race_")
    withPointerMode() {
      val (v, claim) = GenState.claimFresh(spark, state, "hashes")
      // a racing sibling's flip landed first (its table dirs are gone —
      // the thief-deleted-the-loser's-dirs shape): the conditional put at
      // the same key models S3's If-None-Match PUT, so our commit must
      // lose rather than overwrite
      val f = fsOf(state)
      assert(GenState.FsClaimBackend.tryClaim(f,
        new org.apache.hadoop.fs.Path(s"$state/v$v/_COMMIT"), "dead-nonce"))
      val ex = intercept[IllegalStateException] {
        GenState.fencedParquet(spark, state, v, "hashes", claim, "hashes")(
          spark.range(3).toDF("id"))
      }
      assert(ex.getMessage.contains("pointer-commit race"), ex.getMessage)
      // a pointer naming vanished dirs is NOT a committed generation…
      assert(GenState.completeVersions(spark, state, "hashes").isEmpty)
      // …and the targeted claim's redo-wholesale steal recovers the slot
      // (the vN delete removes the stale in-tree pointer with the dir)
      val old = System.currentTimeMillis() - GenState.leaseTtlMs(spark, state) - 60000
      Seq("_LEASE", "_CLAIM").foreach { n =>
        val p = new org.apache.hadoop.fs.Path(s"$state/v$v/$n")
        if (f.exists(p)) f.setTimes(p, old, -1)
      }
      val tokenB = GenState.claimGeneration(spark, state, v, "hashes")
      GenState.fencedParquet(spark, state, v, "hashes", tokenB, "hashes")(
        spark.range(5).toDF("id"))
      assert(GenState.completeVersions(spark, state, "hashes") == Seq(v))
      assert(spark.read.parquet(
        GenState.tablePath(spark, state, v, "hashes")).count() == 5)
    }
  }

  test("POST-FLIP AUDIT: a flip racing a redo-wholesale steal retracts its pointer and aborts — never a false success") {
    // the one interleaving the conditional put alone cannot catch: writer
    // A passes the fence, stalls, a thief steals the generation wholesale
    // (tables deleted, claim released), and A's flip then lands on the
    // gutted vN. Model the steal INSIDE the pointer put via the
    // pointerBackend seam: the thief's actions run just before the put.
    val state = noRenameState("graft_ptr_audit_")
    withPointerMode() {
      val (v, claim) = GenState.claimFresh(spark, state, "hashes")
      val f = fsOf(state)
      val stealing = new GenState.ClaimBackend {
        def tryClaim(fs2: org.apache.hadoop.fs.FileSystem,
            p: org.apache.hadoop.fs.Path, token: String): Boolean = {
          if (p.getName == "_COMMIT") {
            // the thief: redo-wholesale delete + claim release, landing in
            // the stall window between A's fence and A's flip
            f.delete(new org.apache.hadoop.fs.Path(s"$state/v$v"), true)
            GenState.claimBackend.releaseClaim(f,
              new org.apache.hadoop.fs.Path(s"$state/v$v/_CLAIM"))
          }
          GenState.FsClaimBackend.tryClaim(fs2, p, token)
        }
        def readClaim(fs2: org.apache.hadoop.fs.FileSystem,
            p: org.apache.hadoop.fs.Path): Option[String] =
          GenState.FsClaimBackend.readClaim(fs2, p)
        def releaseClaim(fs2: org.apache.hadoop.fs.FileSystem,
            p: org.apache.hadoop.fs.Path): Unit =
          GenState.FsClaimBackend.releaseClaim(fs2, p)
      }
      val before = GenState.pointerBackend
      try {
        GenState.pointerBackend = stealing
        val ex = intercept[IllegalStateException] {
          GenState.fencedParquet(spark, state, v, "hashes", claim, "hashes")(
            spark.range(9).toDF("id"))
        }
        assert(ex.getMessage.contains("STOLEN"), ex.getMessage)
      } finally GenState.pointerBackend = before
      // the false-success footprint must be fully retracted: no pointer,
      // no committed generation — the batch retry re-merges cleanly
      assert(!exists(state, s"v$v/_COMMIT"),
        "the aborting writer must retract its own stranded pointer")
      assert(GenState.completeVersions(spark, state, "hashes").isEmpty)
    }
  }

  test("two genuinely concurrent merges both pointer-commit; state equals sequential ingest") {
    val state = noRenameState("graft_ptr_conc_")
    withPointerMode() {
      val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
      val start = new java.util.concurrent.CountDownLatch(1)
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
      def writer(batch: org.apache.spark.sql.DataFrame, key: String) = new Thread(() => {
        start.await()
        results.add(
          try Right(IncrementalExact.merge(spark, state, batch, Some(key)))
          catch { case t: Throwable => Left(t) })
      })
      val ts = Seq(writer(b1, "c1"), writer(b2, "c2"))
      ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(120000))
      val out = results.toArray(Array.empty[Either[Throwable, Int]]).toSeq
      assert(out.size == 2 && out.forall(_.isRight),
        s"both concurrent pointer-mode merges must commit, got: $out")
      assert(out.collect { case Right(v) => v }.toSet.size == 2)
      val seqState = graft.util.TmpDirs.scratch("graft_ptr_conc_seq_").toString
      IncrementalExact.merge(spark, seqState, b1, Some("c1"))
      IncrementalExact.merge(spark, seqState, b2, Some("c2"))
      val got = IncrementalExact.dedup(spark, state).collect().map(_.toString).sorted
      val want = IncrementalExact.dedup(spark, seqState).collect().map(_.toString).sorted
      assert(got.sameElements(want))
    }
  }

  test("a forged duplicate-key pointer commit is shadowed at read — completeness checks see pointer commits") {
    val state = noRenameState("graft_ptr_dupkey_")
    withPointerMode() {
      val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      assert(IncrementalExact.merge(spark, state, b1, Some("k0")) == 0)
      // forge the racing sibling THROUGH the protocol: fresh claim, same
      // key marker, same content, pointer-committed
      val (vDup, tok) = GenState.claimFresh(spark, state, "hashes")
      GenState.writeIngestMarker(spark, state, vDup, "k0", tok, "hashes")
      GenState.fencedParquet(spark, state, vDup, "docs", tok, "hashes")(
        spark.read.parquet(GenState.tablePath(spark, state, 0, "docs")))
      GenState.fencedParquet(spark, state, vDup, "hashes", tok, "hashes")(
        spark.read.parquet(GenState.tablePath(spark, state, 0, "hashes")))
      // the forged generation IS complete on disk (pointer + pointed dir)…
      assert(exists(state, s"v$vDup/_COMMIT"))
      // …but shadowed as a duplicate-key re-delivery
      assert(GenState.completeVersions(spark, state, "hashes") == Seq(0))
      assert(IncrementalExact.dedup(spark, state)
        .agg(sum(col("n_copies"))).collect()(0).getLong(0) == b1.count())
    }
  }

  test("POST-FLIP AUDIT retraction is compare-and-delete: a SECOND steal's COMMITTED pointer survives a stalled auditor") {
    // the interleaving one step past the single-steal audit test: A's flip
    // and read-back SUCCEED, then A stalls inside its own audit; a second
    // redo-wholesale steal guts the vN (taking A's stranded pointer with
    // the dir), rebuilds it, and pointer-commits its own batch. A then
    // wakes, sees stolen=true — and its retraction must NOT touch the
    // thief's committed pointer (a blind release here would silently
    // un-commit a batch whose writer already reported success, violating
    // "never delete a committed generation"). Model the steal inside the
    // audit's claim read via the claimBackend seam.
    val state = noRenameState("graft_ptr_audit2_")
    withPointerMode(external = false) {
      val (v, claimA) = GenState.claimFresh(spark, state, "hashes")
      val f = fsOf(state)
      val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      val trap = new GenState.ClaimBackend {
        def tryClaim(fs2: org.apache.hadoop.fs.FileSystem,
            p: org.apache.hadoop.fs.Path, token: String): Boolean =
          GenState.FsClaimBackend.tryClaim(fs2, p, token)
        def readClaim(fs2: org.apache.hadoop.fs.FileSystem,
            p: org.apache.hadoop.fs.Path): Option[String] = {
          // fire exactly once, on the post-flip AUDIT's claim read — the
          // only _CLAIM read that happens after A's _COMMIT exists
          if (p.getName == "_CLAIM" &&
            f.exists(new org.apache.hadoop.fs.Path(s"$state/v$v/_COMMIT")) &&
            fired.compareAndSet(false, true)) {
            // the second thief runs with the real backend (one-shot trap)
            GenState.claimBackend = GenState.FsClaimBackend
            f.delete(new org.apache.hadoop.fs.Path(s"$state/v$v"), true)
            val tokenB = GenState.claimGeneration(spark, state, v, "hashes")
            GenState.fencedParquet(spark, state, v, "hashes", tokenB, "hashes")(
              spark.range(7).toDF("id"))
          }
          GenState.FsClaimBackend.readClaim(fs2, p)
        }
        def releaseClaim(fs2: org.apache.hadoop.fs.FileSystem,
            p: org.apache.hadoop.fs.Path): Unit =
          GenState.FsClaimBackend.releaseClaim(fs2, p)
      }
      GenState.claimBackend = trap
      try {
        val ex = intercept[IllegalStateException] {
          GenState.fencedParquet(spark, state, v, "hashes", claimA, "hashes")(
            spark.range(999).toDF("id"))
        }
        assert(ex.getMessage.contains("STOLEN"), ex.getMessage)
      } finally GenState.claimBackend = GenState.FsClaimBackend
      assert(fired.get(), "the trap must have exercised the double-steal window")
      // the thief's batch must NOT be un-committed by A's retraction
      assert(exists(state, s"v$v/_COMMIT"),
        "the second steal's committed pointer must survive the loser's audit")
      assert(GenState.completeVersions(spark, state, "hashes") == Seq(v))
      assert(spark.read.parquet(
        GenState.tablePath(spark, state, v, "hashes")).count() == 7,
        "the committed batch must still serve after the loser aborts")
    }
  }

  test("sweep clears a stalled loser's orphan nonce dirs INSIDE a committed generation; fresh and committed dirs survive") {
    // a loser whose vN was re-claimed and committed by a thief leaves its
    // <table>.g<nonce> dirs inside a LIVE generation — the abandoned-
    // version walk never touches live vNs, so sweepLeftovers' pass 2 must
    // take them (they are unservable by construction: no pointer names
    // them) once their mtime ages past the lease TTL.
    val state = graft.util.TmpDirs.scratch("graft_ptr_orphan_").toString
    withPointerMode(external = false) {
      val batch = docs.where(col("doc_id") < 50)
      val cnt = batch.count()
      IncrementalExact.merge(spark, state, batch, Some("b0"))
      val f = fsOf(state)
      def mkOrphan(name: String): org.apache.hadoop.fs.Path = {
        val p = new org.apache.hadoop.fs.Path(s"$state/v0/$name")
        f.mkdirs(p)
        val out = f.create(new org.apache.hadoop.fs.Path(p, "part-00000"), true)
        try out.write(Array[Byte](1, 2, 3)) finally out.close()
        p
      }
      val oldHashes = mkOrphan("hashes.gdeadbeef-dead")
      val oldDocs = mkOrphan("docs.gdeadbeef-dead")
      val freshOrphan = mkOrphan("hashes.gcafecafe-cafe")
      // a dir whose suffix is NOT nonce-shaped is never the sweep's to take
      val odd = mkOrphan("hashes.gnotanonce")
      val past = System.currentTimeMillis() -
        GenState.leaseTtlMs(spark, state) - 60000
      Seq(oldHashes, oldDocs, odd).foreach(p => f.setTimes(p, past, -1))
      GenState.sweepLeftovers(spark, state, "hashes")
      assert(!f.exists(oldHashes) && !f.exists(oldDocs),
        "expired loser nonce dirs inside the live generation must be swept")
      assert(f.exists(freshOrphan),
        "a fresh nonce dir (a possibly mid-write loser) must survive the TTL horizon")
      assert(f.exists(odd), "non-nonce-shaped names must never be touched")
      // the committed generation is untouched and still serves
      assert(GenState.completeVersions(spark, state, "hashes") == Seq(0))
      assert(IncrementalExact.dedup(spark, state)
        .agg(sum(col("n_copies"))).collect()(0).getLong(0) == cnt)
      // once the fresh orphan ages out, a later sweep takes it too
      f.setTimes(freshOrphan, past, -1)
      GenState.sweepLeftovers(spark, state, "hashes")
      assert(!f.exists(freshOrphan))
    }
  }

  test("mixed-mode store: rename-mode generations and pointer-mode generations serve together; compact folds both") {
    // reads are mode-agnostic per GENERATION (pointer wins when present),
    // so a deployment can flip modes without rebuilding state
    val state = graft.util.TmpDirs.scratch("graft_ptr_mixed_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    IncrementalExact.merge(spark, state, b1, Some("b0")) // rename mode
    withPointerMode(external = false) {
      IncrementalExact.merge(spark, state, b2, Some("b1")) // pointer mode
      assert(exists(state, "v1/_COMMIT") && !exists(state, "v0/_COMMIT"))
      assert(IncrementalExact.dedup(spark, state)
        .agg(sum(col("n_copies"))).collect()(0).getLong(0) == docs.count())
      val vc = IncrementalExact.compact(spark, state)
      assert(GenState.completeVersions(spark, state, "hashes") == Seq(vc))
    }
    // back in rename mode, the pointer-compacted generation still serves
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == docs.count())
  }
}
