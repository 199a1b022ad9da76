package graft

import org.apache.spark.sql.functions._

import graft.ops.{GenState, IncrementalExact}

/** The single-writer guard: generation numbers are allocated by directory
  * listing, so two CONCURRENT writers into one state dir could both pick
  * vN and interleave table writes. The claim protocol must resolve every
  * such race as SERIALIZATION (exactly one writer commits) or a CLEAN
  * ABORT (the loser throws before its commit write) — never a committed
  * generation mixing two writers' rows — while leaving the documented
  * crash-recovery path (an incomplete generation is redone wholesale by
  * the next merge) fully intact.
  */
class GenStateClaimSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  /** Backdate the held lease (and the claim publish — a fresh _CLAIM also
    * proves a live claimant to the sweep guard) past the TTL — simulating
    * a crashed holder without waiting out the store's leaseTtlMs.
    */
  private def expireLease(state: String, v: Int): Unit = {
    val f = GenState.fs(spark, state)
    val old = System.currentTimeMillis() - GenState.leaseTtlMs(spark, state) - 60000
    Seq("_LEASE", "_CLAIM").foreach { n =>
      val p = new org.apache.hadoop.fs.Path(s"$state/v$v/$n")
      if (f.exists(p)) f.setTimes(p, old, -1)
    }
  }

  /** The two claim-backend shapes every parameterized scenario must hold
    * under: the default in-tree `_CLAIM` file, and the external
    * conditional-put store (one slot object per claim, OUTSIDE the state
    * dir tree — the S3/DynamoDB deployment shape, where a recursive vN
    * delete never implicitly releases a claim).
    */
  private def backends: Seq[(String, () => GenState.ClaimBackend)] = Seq(
    "fs" -> (() => GenState.FsClaimBackend),
    "external-cp" -> (() => new GenState.ExternalCpClaimBackend(
      graft.util.TmpDirs.scratch("graft_claim_cpstore_").toString)))

  private def withBackend[T](b: GenState.ClaimBackend)(body: => T): T = {
    val before = GenState.claimBackend
    GenState.claimBackend = b
    try body finally GenState.claimBackend = before
  }

  for ((bk, mk) <- backends)
  test(s"[$bk] a live holder's lease makes contention LOUD: the second writer fails fast, naming the holder") {
    withBackend(mk()) {
    val state = graft.util.TmpDirs.scratch("graft_claim_lease_").toString
    // writer A is mid-merge: claimed v0, lease fresh (renewed at the claim
    // and at every guarded write)
    val tokenA = GenState.claimGeneration(spark, state, 0, "hashes")
    // writer B launched against the same single-writer family: the fresh
    // lease proves A is LIVE, so B must NOT steal — it aborts with the
    // contract-violation message naming the holder, and A's work survives
    val ex = intercept[IllegalStateException] {
      GenState.claimGeneration(spark, state, 0, "hashes")
    }
    assert(ex.getMessage.contains("held by a LIVE writer"), ex.getMessage)
    assert(ex.getMessage.contains("single-writer by contract"), ex.getMessage)
    // the message names the holder (host:pid from the lease file)
    assert(ex.getMessage.matches("(?s).*\\(\\S+:\\d+;.*"), ex.getMessage)
    // A is untouched: its claim still verifies and its merge may proceed
    GenState.assertClaimed(spark, state, 0, tokenA)
    }
  }

  for ((bk, mk) <- backends)
  test(s"[$bk] claim race: the second claimant steals a STALE claim, the stalled first aborts before commit") {
    withBackend(mk()) {
    val state = graft.util.TmpDirs.scratch("graft_claim_race_").toString
    // writer A mid-merge: claimed v0, tables not yet committed
    val tokenA = GenState.claimGeneration(spark, state, 0, "hashes")
    // A crashes (stops heartbeating): its lease ages past the ttl
    expireLease(state, 0)
    // writer B arrives: v0 is incomplete+claimed with a STALE lease — a
    // crash leftover, so B redoes it wholesale (deletes + re-claims)
    val tokenB = GenState.claimGeneration(spark, state, 0, "hashes")
    assert(tokenA != tokenB)
    // A wakes at its pre-commit check: its claim is gone — clean abort
    val ex = intercept[IllegalStateException] {
      GenState.assertClaimed(spark, state, 0, tokenA)
    }
    assert(ex.getMessage.contains("single-writer"))
    // B serializes: its claim holds and its commit may proceed
    GenState.assertClaimed(spark, state, 0, tokenB)
    }
  }

  test("stale version listing: claiming an already-committed generation aborts") {
    val state = graft.util.TmpDirs.scratch("graft_claim_stale_").toString
    IncrementalExact.merge(spark, state, docs.where(col("doc_id") < 50))
    // a writer that listed versions BEFORE that commit still thinks v0 is
    // free — its claim must abort instead of rebuilding a committed gen
    val ex = intercept[IllegalStateException] {
      GenState.claimGeneration(spark, state, 0, "hashes")
    }
    assert(ex.getMessage.contains("already committed"))
  }

  test("a sibling merge never steals a live claim: both writers serialize into distinct generations") {
    val state = graft.util.TmpDirs.scratch("graft_claim_e2e_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    // writer A stalls right after claiming its fresh generation (v0)
    val (vA, tokenA) = GenState.claimFresh(spark, state, "hashes")
    assert(vA == 0)
    // writer B runs a COMPLETE merge of b1 — the multi-writer allocator
    // must NOT treat A's in-flight v0 as a crash leftover: B lands at v1
    assert(IncrementalExact.merge(spark, state, b1) == 1)
    // A's claim survived B's merge — A may still finish its own generation
    GenState.assertClaimed(spark, state, vA, tokenA)
    val served = IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    assert(served == b1.count(),
      "the committed generation must hold exactly the completed writer's batch")
  }

  for ((bk, mk) <- backends)
  test(s"[$bk] crash recovery under fresh allocation: the retry lands at a fresh generation; compact sweeps the leftover") {
    withBackend(mk()) {
    val state = graft.util.TmpDirs.scratch("graft_claim_crash_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    IncrementalExact.merge(spark, state, b1, Some("b0"))
    // simulate a crash mid-merge of b2: claim + marker written, commit not
    val (vDead, tok) = GenState.claimFresh(spark, state, "hashes")
    assert(vDead == 1)
    GenState.writeIngestMarker(spark, state, vDead, "b1", tok, "hashes")
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(0))
    // the retry (same batch, same key) skips the abandoned number — no
    // later writer can know v1's claimant is dead rather than stalled —
    // and ingests into a FRESH generation
    assert(IncrementalExact.merge(spark, state, b2, Some("b1")) == 2)
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(0, 2))
    val total = IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    assert(total == docs.count())
    // the abandoned dir is inert but on disk — QUIESCED compaction is the
    // sweep point (under quiesce any incomplete dir is abandoned). While
    // its lease is still FRESH the sweep leaves it alone (defense in
    // depth: it might be a live merge racing a contract-violating
    // compact); once the lease ages out, the sweep takes it.
    val fs = GenState.fs(spark, state)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$state/v1")))
    IncrementalExact.compact(spark, state)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$state/v1")),
      "a fresh-leased incomplete dir must survive the sweep (it could be a live merge)")
    expireLease(state, 1)
    IncrementalExact.compact(spark, state)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$state/v1")),
      "compaction must sweep abandoned claim leftovers once the lease is stale")
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == total)
    // the sweep released the leftover's claim wherever the backend keeps
    // it — external claim rows must not leak once their dir is gone
    assert(GenState.claimBackend.readClaim(fs,
      new org.apache.hadoop.fs.Path(s"$state/v1/_CLAIM")).isEmpty,
      "sweeping a generation must release its claim in the backend's store")
    }
  }

  test("external conditional-put store: a recursive vN delete does NOT release the claim; the protocol's explicit release points do") {
    val store = graft.util.TmpDirs.scratch("graft_claim_cpsem_").toString
    withBackend(new GenState.ExternalCpClaimBackend(store)) {
      val state = graft.util.TmpDirs.scratch("graft_claim_cpext_").toString
      val (v, _) = GenState.claimFresh(spark, state, "hashes")
      val fs = GenState.fs(spark, state)
      val claimP = new org.apache.hadoop.fs.Path(s"$state/v$v/_CLAIM")
      assert(GenState.claimBackend.readClaim(fs, claimP).isDefined)
      // the semantic difference from the in-tree backend: deleting the
      // generation dir leaves the external claim row standing — exactly
      // what an S3 slot object or DynamoDB lock item would do
      fs.delete(new org.apache.hadoop.fs.Path(s"$state/v$v"), true)
      assert(GenState.claimBackend.readClaim(fs, claimP).isDefined,
        "an external claim must survive the dir delete (that IS the deployment shape)")
      // a rival claimFresh must not contest the still-claimed number: it
      // lands past it even though no vN dir exists on disk any more
      val (v2, tok2) = GenState.claimFresh(spark, state, "hashes")
      assert(v2 != v, s"claimFresh must skip the externally-claimed v$v")
      // the explicit release points clean up: abandonFresh for the rival,
      // and for the orphan the steal path or sweep (exercised above)
      GenState.abandonFresh(spark, state, v2, "hashes")
      assert(GenState.claimBackend.readClaim(fs,
        new org.apache.hadoop.fs.Path(s"$state/v$v2/_CLAIM")).isEmpty)
    }
  }

  test("external store, no mtime authority: a held claim with NO lease file is spared by the sweep (refuse-blind)") {
    val store = graft.util.TmpDirs.scratch("graft_claim_cpblind_store_").toString
    withBackend(new GenState.ExternalCpClaimBackend(store)) {
      val state = graft.util.TmpDirs.scratch("graft_claim_cpblind_").toString
      IncrementalExact.merge(spark, state, docs.where(col("doc_id") < 40), Some("seed"))
      val (v, _) = GenState.claimFresh(spark, state, "hashes")
      val fs = GenState.fs(spark, state)
      // model the best-effort lease write having FAILED: the in-flight dir
      // then has no _LEASE and (external backend) no in-tree _CLAIM — zero
      // filesystem mtime evidence either way
      fs.delete(new org.apache.hadoop.fs.Path(s"$state/v$v/_LEASE"), false)
      assert(!GenState.abandonedVersions(spark, state, "hashes").contains(v),
        "a held external claim with no mtime authority must be spared, not swept blind")
      // once the claim is released (crash recovery's out-of-band step, or
      // abandonFresh), the evidence-free dir becomes sweepable
      GenState.claimBackend.releaseClaim(fs,
        new org.apache.hadoop.fs.Path(s"$state/v$v/_CLAIM"))
      assert(GenState.abandonedVersions(spark, state, "hashes").contains(v),
        "a claim-free lease-free incomplete dir is an ordinary crash leftover")
    }
  }

  test("loser waking MID-TABLE-WRITES after a steal committed: every guarded write refuses") {
    // the steal protocol still guards the TARGETED claim path (compaction,
    // probe-at-merge modalities) — drive it directly
    val state = graft.util.TmpDirs.scratch("graft_claim_midwrite_").toString
    // writer A stalls after claiming v0 — BEFORE any of its table writes —
    // and past the lease ttl (its heartbeat stops)
    val tokenA = GenState.claimGeneration(spark, state, 0, "hashes")
    expireLease(state, 0)
    // writer B steals the incomplete claimed v0 (the crash-leftover rule),
    // records its marker, and COMMITS
    val tokenB = GenState.claimGeneration(spark, state, 0, "hashes")
    GenState.writeIngestMarker(spark, state, 0, "bB", tokenB, "hashes")
    GenState.assertWritable(spark, state, 0, tokenB, "hashes")
    spark.range(1).write.parquet(s"$state/v0/hashes")
    // A wakes believing it still owns v0 and tries to resume its writes.
    // Every per-generation write is fenced by assertWritable — the
    // commit-exists check fires FIRST, so A cannot overwrite any of B's
    // committed tables even though A's stale token check would also fail:
    val exTable = intercept[IllegalStateException] {
      GenState.assertWritable(spark, state, 0, tokenA, "hashes")
    }
    assert(exTable.getMessage.contains("committed by another writer"))
    // …and the marker write refuses the same way WITHOUT deleting B's
    // markers (exactly-once re-delivery must survive the stalled loser)
    intercept[IllegalStateException] {
      GenState.writeIngestMarker(spark, state, 0, "bA", tokenA, "hashes")
    }
    assert(GenState.ingestedKeys(spark, state, "hashes") == Set("bB"),
      "a stalled loser's refused marker write must not clear the committed markers")
  }

  for ((bk, mk) <- backends)
  test(s"[$bk] two genuinely concurrent merges both commit; state equals sequential ingest of both batches") {
    withBackend(mk()) {
    val state = graft.util.TmpDirs.scratch("graft_claim_conc_").toString
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
    ts.foreach(_.start())
    start.countDown()
    ts.foreach(_.join(120000))
    val out = results.toArray(Array.empty[Either[Throwable, Int]]).toSeq
    assert(out.size == 2 && out.forall(_.isRight),
      s"both concurrent merges must commit, got: $out")
    val gens = out.collect { case Right(v) => v }
    assert(gens.toSet.size == 2, s"writers must land in distinct generations, got $gens")
    assert(GenState.completeVersions(spark, state, "hashes").size == 2)
    // data parity with sequential ingest of the same two batches
    val seqState = graft.util.TmpDirs.scratch("graft_claim_conc_seq_").toString
    IncrementalExact.merge(spark, seqState, b1, Some("c1"))
    IncrementalExact.merge(spark, seqState, b2, Some("c2"))
    val got = IncrementalExact.dedup(spark, state).collect().map(_.toString).sorted
    val want = IncrementalExact.dedup(spark, seqState).collect().map(_.toString).sorted
    assert(got.sameElements(want),
      "concurrent state must serve exactly the sequential-ingest answer")
    // and the exactly-once markers carried both keys
    assert(GenState.ingestedKeys(spark, state, "hashes") == Set("c1", "c2"))
    }
  }

  test("a same-key double-commit is shadowed at every read and swept at compact") {
    // the one window allocateFresh cannot close without leases: two
    // GENUINELY simultaneous deliveries of the same batch key both pass the
    // post-claim re-check and both commit. The read side must then serve
    // exactly-once anyway: the younger duplicate is excluded everywhere.
    val state = graft.util.TmpDirs.scratch("graft_claim_dupkey_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    assert(IncrementalExact.merge(spark, state, b1, Some("k0")) == 0)
    // forge the racing sibling: a COMPLETE generation carrying the same
    // key marker and the same batch content (what the loser would commit)
    val (vDup, tok) = GenState.claimFresh(spark, state, "hashes")
    GenState.writeIngestMarker(spark, state, vDup, "k0", tok, "hashes")
    spark.read.parquet(s"$state/v0/docs").write.parquet(s"$state/v$vDup/docs")
    spark.read.parquet(s"$state/v0/hashes").write.parquet(s"$state/v$vDup/hashes")
    // shadowed: the duplicate is complete on disk but invisible to reads
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(0),
      "the younger duplicate-key generation must be shadowed")
    val served = IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    assert(served == b1.count(), "the duplicate must not double-count")
    // REGRESSION: compact while the shadowed dup is the NEWEST on-disk
    // generation — a targeted versions.last+1 claim would collide with the
    // committed dup dir and abort every compact; the fresh allocation must
    // land past it, manifest the dup, and sweep its bytes
    val vCompact = IncrementalExact.compact(spark, state)
    assert(vCompact > vDup, "compaction must allocate past the shadowed dup")
    val fs = GenState.fs(spark, state)
    // round 17: the dup is manifest-listed and sweep-eligible but lingers
    // under the reader-grace horizon; the grace-expired sweep takes it
    GenState.sweepLeftovers(spark, state, "hashes", graceMs = 0L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$state/v$vDup")),
      "compaction must sweep the shadowed duplicate physically")
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == served)
    // the exactly-once marker survived the fold: a re-delivery still no-ops
    assert(IncrementalExact.merge(spark, state, b1, Some("k0")) == vCompact)
    // a later DISTINCT-key ingest lands beyond the compacted state and serves
    IncrementalExact.merge(spark, state, b2, Some("k1"))
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == docs.count())
  }

  test("concurrent registry appends and top-k merges serialize (write-only families share the allocator)") {
    // registry: set-union appends commute — two concurrent suite appends
    // must both commit and screen identically to sequential appends
    val bench = docs.where(col("source") === graft.ops.Corpus.benchmarkSource)
    val reg = graft.util.TmpDirs.scratch("graft_claim_reg_conc_").toString
    val start = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def appender(half: Int) = new Thread(() => {
      start.await()
      try graft.ops.Corpus.appendContaminationRegistry(spark, reg,
        bench.where(pmod(col("doc_id"), lit(2)) === half))
      catch { case t: Throwable => errs.add(t) }
    })
    val ts = Seq(appender(0), appender(1))
    ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"concurrent registry appends must both commit: ${errs.toArray.toSeq}")
    val seqReg = graft.util.TmpDirs.scratch("graft_claim_reg_seq_").toString
    graft.ops.Corpus.appendContaminationRegistry(spark, seqReg,
      bench.where(pmod(col("doc_id"), lit(2)) === 0))
    graft.ops.Corpus.appendContaminationRegistry(spark, seqReg,
      bench.where(pmod(col("doc_id"), lit(2)) === 1))
    val train = docs.where(col("source") =!= graft.ops.Corpus.benchmarkSource)
    val got = graft.ops.Corpus.contaminationAgainstRegistry(spark, reg, train)
      .collect().map(_.toString).sorted.toSeq
    val want = graft.ops.Corpus.contaminationAgainstRegistry(spark, seqReg, train)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want && want.nonEmpty)

    // top-k: per-doc count generations are write-only — two concurrent
    // keyed merges both commit and serve the sequential answer
    val tk = graft.util.TmpDirs.scratch("graft_claim_topk_conc_").toString
    val start2 = new java.util.concurrent.CountDownLatch(1)
    def topkWriter(half: Int) = new Thread(() => {
      start2.await()
      try graft.ops.IncrementalTopK.merge(spark, tk,
        docs.where(pmod(col("doc_id"), lit(2)) === half), Some(s"t$half"))
      catch { case t: Throwable => errs.add(t) }
    })
    val ts2 = Seq(topkWriter(0), topkWriter(1))
    ts2.foreach(_.start()); start2.countDown(); ts2.foreach(_.join(120000))
    assert(errs.isEmpty, s"concurrent top-k merges must both commit: ${errs.toArray.toSeq}")
    val tkSeq = graft.util.TmpDirs.scratch("graft_claim_topk_seq_").toString
    graft.ops.IncrementalTopK.merge(spark, tkSeq,
      docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("t0"))
    graft.ops.IncrementalTopK.merge(spark, tkSeq,
      docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("t1"))
    val g2 = graft.ops.IncrementalTopK.topK(spark, tk).collect().map(_.toString).toSeq
    val w2 = graft.ops.IncrementalTopK.topK(spark, tkSeq).collect().map(_.toString).toSeq
    assert(g2 == w2 && w2.nonEmpty)
  }

  test("concurrent view ingests serialize; the served view equals sequential maintenance") {
    val state = graft.util.TmpDirs.scratch("graft_claim_view_conc_").toString
    val ev = graft.sources.Tables.events(spark, sf0001)
    val h1 = ev.where(pmod(col("event_id"), lit(2)) === 0)
    val h2 = ev.where(pmod(col("event_id"), lit(2)) === 1)
    val start = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(batch: org.apache.spark.sql.DataFrame, key: String) = new Thread(() => {
      start.await()
      try graft.ops.IncrementalView.merge(spark, state, batch, Some(key))
      catch { case t: Throwable => errs.add(t) }
    })
    val ts = Seq(writer(h1, "w1"), writer(h2, "w2"))
    ts.foreach(_.start())
    start.countDown()
    ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"concurrent view merges must both commit: ${errs.toArray.toSeq}")
    val seqState = graft.util.TmpDirs.scratch("graft_claim_view_seq_").toString
    graft.ops.IncrementalView.merge(spark, seqState, h1, Some("w1"))
    graft.ops.IncrementalView.merge(spark, seqState, h2, Some("w2"))
    val got = graft.ops.IncrementalView.serve(spark, state).collect().map(_.toString)
    val want = graft.ops.IncrementalView.serve(spark, seqState).collect().map(_.toString)
    assert(got.sameElements(want))
  }

  test("a claimant committing MID-STEAL aborts the thief — a committed generation is never deleted") {
    val state = graft.util.TmpDirs.scratch("graft_claim_midsteal_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    // A claims v1 and stalls past the lease ttl (incomplete + claimed +
    // stale lease: the redo-wholesale steal precondition)
    GenState.claimGeneration(spark, state, 1, "hashes")
    expireLease(state, 1)
    val fs = GenState.fs(spark, state)
    val marker = new org.apache.hadoop.fs.Path(s"$state/v1/hashes/_SUCCESS")
    // a backend whose claim READ side-effects the claimant's commit —
    // modeling A (stalled but LIVE) committing v1 in the window between
    // the thief's entry commit check and its recursive delete. The
    // pre-delete re-check must abort the steal; before round 14 this
    // window silently destroyed A's committed generation.
    val racing = new GenState.ClaimBackend {
      def tryClaim(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path, token: String): Boolean =
        GenState.FsClaimBackend.tryClaim(f, p, token)
      def readClaim(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path): Option[String] = {
        val t = GenState.FsClaimBackend.readClaim(f, p)
        if (t.isDefined && !f.exists(marker)) f.create(marker, false).close()
        t
      }
      def releaseClaim(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path): Unit =
        GenState.FsClaimBackend.releaseClaim(f, p)
    }
    val before = GenState.claimBackend
    try {
      GenState.claimBackend = racing
      val ex = intercept[IllegalStateException] {
        GenState.claimGeneration(spark, state, 1, "hashes")
      }
      assert(ex.getMessage.contains("committed by its claimant"), ex.getMessage)
    } finally GenState.claimBackend = before
    // the committed generation survived the attempted steal intact
    assert(fs.exists(marker),
      "the thief deleted a generation that committed mid-steal")
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(0, 1))
  }

  test("claim read-back: a claim deleted between publish and read-back aborts cleanly") {
    val state = graft.util.TmpDirs.scratch("graft_claim_readback_").toString
    // a backend whose publish succeeds but whose claim is immediately
    // stolen (simulating the delete/create interleaving where a
    // concurrent claimant's redo-wholesale delete removes the
    // just-published claim) — the read-back must catch it
    val thief = new GenState.ClaimBackend {
      def tryClaim(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path, token: String): Boolean = {
        GenState.FsClaimBackend.tryClaim(f, p, token) && {
          f.delete(p, false) // the racing claimant's recursive dir delete
          GenState.FsClaimBackend.tryClaim(f, p, "the-other-writer")
        }
      }
      def readClaim(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path): Option[String] =
        GenState.FsClaimBackend.readClaim(f, p)
      def releaseClaim(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path): Unit =
        GenState.FsClaimBackend.releaseClaim(f, p)
    }
    val before = GenState.claimBackend
    try {
      GenState.claimBackend = thief
      val ex = intercept[IllegalStateException] {
        GenState.claimGeneration(spark, state, 0, "hashes")
      }
      assert(ex.getMessage.contains("did not survive"))
    } finally GenState.claimBackend = before
    // nothing was committed by the aborted claimant
    assert(GenState.completeVersions(spark, state, "hashes").isEmpty)
  }

  for ((bk, mk) <- backends)
  test(s"[$bk] write fencing: a stalled writer's staged table loses cleanly to a stale-lease steal") {
    withBackend(mk()) {
    val state = graft.util.TmpDirs.scratch("graft_claim_fence_").toString
    // writer A claims v0 and stalls INSIDE a guarded write: its table job
    // has landed in the stage dir, the publish rename has not yet run
    val tokenA = GenState.claimGeneration(spark, state, 0, "hashes")
    expireLease(state, 0)
    // writer B steals (stale lease ⇒ crash leftover), rebuilds, COMMITS
    val tokenB = GenState.claimGeneration(spark, state, 0, "hashes")
    GenState.fencedParquet(spark, state, 0, "hashes", tokenB, "hashes")(
      spark.range(7).toDF("id"))
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(0))
    // A wakes and resumes its fenced write: the stage job runs (harmless —
    // it lands in A's own token-suffixed stage dir), but the fence refuses
    // before the rename, so B's committed table is never clobbered
    val ex = intercept[IllegalStateException] {
      GenState.fencedParquet(spark, state, 0, "hashes", tokenA, "hashes")(
        spark.range(999).toDF("id"))
    }
    assert(ex.getMessage.contains("committed by another writer"), ex.getMessage)
    assert(spark.read.parquet(s"$state/v0/hashes").count() == 7,
      "the thief's committed table must survive the stalled loser's late write")
    // and the loser's aborted stage dir was cleaned up
    val fs = GenState.fs(spark, state)
    val junk = fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/v0"))
      .map(_.getPath.getName).filter(_.contains(".stage-"))
    assert(junk.isEmpty, s"aborted stage dirs must not linger: ${junk.toSeq}")
    }
  }

  test("leaseTtlMs rides _CONFIG per store: a pinned short ttl steals immediately; a mixed ttl is refused") {
    val state = graft.util.TmpDirs.scratch("graft_claim_ttlcfg_").toString
    // pin a 1 ms ttl the way a merge parameter is pinned
    GenState.checkConfig(spark, state, Map("leaseTtlMs" -> "1", "k" -> "v"))
    assert(GenState.leaseTtlMs(spark, state) == 1L)
    // a claim whose lease is older than the PINNED ttl is a crash leftover
    // — no LIVE-writer abort, the steal proceeds without any backdating
    GenState.claimGeneration(spark, state, 0, "hashes")
    Thread.sleep(50)
    val tokenB = GenState.claimGeneration(spark, state, 0, "hashes")
    GenState.assertClaimed(spark, state, 0, tokenB)
    // a later merge presenting a DIFFERENT ttl is refused like any other
    // mixed parameter — the knob is per-store state, not a process global
    val ex = intercept[IllegalArgumentException] {
      GenState.checkConfig(spark, state, Map("leaseTtlMs" -> "900000", "k" -> "v"))
    }
    assert(ex.getMessage.contains("leaseTtlMs"), ex.getMessage)
    // an unpinned store uses the default
    val plain = graft.util.TmpDirs.scratch("graft_claim_ttldef_").toString
    assert(GenState.leaseTtlMs(spark, plain) == GenState.DefaultLeaseTtlMs)
  }

  test("allocateFresh refuses an invalid batch key BEFORE claiming — no leftover dir") {
    val state = graft.util.TmpDirs.scratch("graft_claim_badkey_").toString
    IncrementalExact.merge(spark, state, docs.where(col("doc_id") < 50), Some("ok"))
    intercept[IllegalArgumentException] {
      GenState.allocateFresh(spark, state, Some("bad/key"), "hashes")
    }
    val fs = GenState.fs(spark, state)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(state))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs == Set("v0"),
      s"an invalid key must not leave a claimed empty generation behind, got $dirs")
  }

  test("_CONFIG publish is atomic no-replace: concurrent DIFFERENT first merges — exactly one wins, the loser refuses") {
    // POSIX rename(2) silently replaces, so a rename-based publish would
    // let both writers see success and the loser overwrite the winner's
    // pin; the link-based publish + unconditional read-back must instead
    // serialize them: exactly one checkConfig returns, the other throws
    // the mixed-parameter refusal, and the surviving pin is the winner's.
    for (round <- 0 until 8) {
      val state = graft.util.TmpDirs.scratch(s"graft_claim_cfgrace_${round}_").toString
      val start = new java.util.concurrent.CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[(String, Throwable)]()
      def publisher(tag: String, params: Map[String, String]) = new Thread(() => {
        start.await()
        try GenState.checkConfig(spark, state, params)
        catch { case t: Throwable => errs.add((tag, t)) }
      })
      val ts = Seq(publisher("a", Map("threshold" -> "0.8")),
        publisher("b", Map("threshold" -> "0.7")))
      ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(60000))
      val losers = errs.toArray(Array.empty[(String, Throwable)]).toSeq
      assert(losers.size == 1,
        s"round $round: exactly one of two different-param publishers must lose, got $losers")
      assert(losers.head._2.getMessage.contains("mixed parameters"))
      // the surviving pin is the winner's, and the winner can re-present it
      val pinned = GenState.readConfig(spark, state)("threshold")
      val winner = if (losers.head._1 == "a") "0.7" else "0.8"
      assert(pinned == winner, s"round $round: pin $pinned is not the winner's $winner")
      GenState.checkConfig(spark, state, Map("threshold" -> pinned))
    }
  }

  test("pluggable ClaimBackend: a conditional-put style backend drives the same steal/abort protocol") {
    // an in-memory backend with a truly atomic compare-and-set publish —
    // the shape an S3 deployment plugs in (conditional PUT / DynamoDB
    // lock item) without touching any merge code
    val cas = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val casBackend = new GenState.ClaimBackend {
      def tryClaim(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path, token: String): Boolean =
        cas.putIfAbsent(p.toString, token) == null
      def readClaim(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path): Option[String] =
        Option(cas.get(p.toString))
      def releaseClaim(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path): Unit =
        cas.remove(p.toString)
    }
    val state = graft.util.TmpDirs.scratch("graft_claim_cas_").toString
    val before = GenState.claimBackend
    try {
      GenState.claimBackend = casBackend
      val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      // a full merge claims THROUGH the plugged backend and commits
      assert(IncrementalExact.merge(spark, state, b1, Some("b0")) == 0)
      assert(cas.size() == 1, "the merge must have claimed via the CAS backend")
      // the steal protocol runs identically through the external store:
      // A claims v1 and stalls past the ttl; B treats the incomplete
      // claimed v1 with its stale lease as a crash leftover, releases A's
      // claim via the backend, re-claims
      val tokenA = GenState.claimGeneration(spark, state, 1, "hashes")
      expireLease(state, 1)
      val tokenB = GenState.claimGeneration(spark, state, 1, "hashes")
      assert(tokenA != tokenB)
      // the stalled loser aborts at its next guarded write; the thief may write
      intercept[IllegalStateException] {
        GenState.assertWritable(spark, state, 1, tokenA, "hashes")
      }
      GenState.assertWritable(spark, state, 1, tokenB, "hashes")
    } finally GenState.claimBackend = before
  }
}
