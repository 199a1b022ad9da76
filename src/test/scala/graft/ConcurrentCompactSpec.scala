package graft

import org.apache.spark.sql.functions._

import graft.ops.{Deletes, GenState, IncrementalExact, IncrementalMinHash}

/** Concurrent-safe compaction — the retirement of the engine's last
  * quiesced operation (round 17). Three mechanisms under test:
  *
  *   1. the `_MAINT` lease serializes compactors per store (fail fast
  *      naming the live holder; a stale lease — a crashed compactor — is
  *      stolen; the commit-time maintenance fence revokes a stalled
  *      compactor before its double-fold can land);
  *   2. the GRACE-horizon sweep: folded sources stay on disk one store
  *      TTL after the fold commits, so a racing reader or merge probe
  *      whose version listing predates the fold never loses parquet
  *      files mid-scan — and the GDPR purge overrides the grace
  *      explicitly for immediate erasure;
  *   3. the read-side double-fold shadow: two would-be-live generations
  *      whose `_COMPACTED` manifests overlap are a lost maintenance race
  *      — the subset fold is excluded from every serve (transitive
  *      manifests keep the exclusion durable across sweeps), and
  *      INCOMPARABLE overlaps refuse loudly instead of guessing.
  */
class ConcurrentCompactSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  private def fsOf(state: String) = GenState.fs(spark, state)

  private def exists(state: String, rel: String): Boolean =
    fsOf(state).exists(new org.apache.hadoop.fs.Path(s"$state/$rel"))

  /** Backdate the `_MAINT` lease past the TTL — a crashed compactor. */
  private def expireMaint(state: String): Unit = {
    val old = System.currentTimeMillis() - GenState.leaseTtlMs(spark, state) - 60000
    fsOf(state).setTimes(new org.apache.hadoop.fs.Path(s"$state/_MAINT"), old, -1)
  }

  /** Backdate a live generation's commit so its manifest's fold stamp
    * ages past the grace horizon — "the TTL elapsed" without waiting.
    */
  private def expireGrace(state: String, liveGen: Int,
      commitTable: String = "hashes"): Unit = {
    val old = System.currentTimeMillis() - GenState.leaseTtlMs(spark, state) - 60000
    fsOf(state).setTimes(
      new org.apache.hadoop.fs.Path(s"$state/v$liveGen/$commitTable/_SUCCESS"), old, -1)
  }

  /** Forge a COMPLETE generation carrying an arbitrary `_COMPACTED`
    * manifest — the on-disk footprint a lost-race double-fold leaves.
    */
  private def forgeCompacted(state: String, v: Int, manifest: Seq[Int]): Unit = {
    spark.read.parquet(s"$state/v${GenState.completeVersions(spark, state, "hashes").head}/hashes")
      .write.mode("overwrite").parquet(s"$state/v$v/hashes")
    val f = fsOf(state)
    val out = f.create(new org.apache.hadoop.fs.Path(s"$state/v$v/_COMPACTED"), true)
    try out.write(manifest.sorted.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  test("compaction is serialized: a second compactor fails fast naming the live holder") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_lease_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("a"))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b"))
    val tokenA = GenState.acquireMaintenance(spark, state)
    val ex = intercept[IllegalStateException] { IncrementalExact.compact(spark, state) }
    assert(ex.getMessage.contains("held by a LIVE compactor"), ex.getMessage)
    // the message names the holder (host:pid from the lease content)
    assert(ex.getMessage.matches("(?s).*\\(\\S+:\\d+ .*"), ex.getMessage)
    GenState.releaseMaintenance(spark, state, tokenA)
    val v = IncrementalExact.compact(spark, state)
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(v))
  }

  test("a stale maintenance lease is stolen; the stalled compactor is revoked at its commit fence") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_steal_").toString
    IncrementalExact.merge(spark, state, docs, Some("a"))
    val tokenA = GenState.acquireMaintenance(spark, state)
    // A crashes (stops heartbeating): its lease ages past the ttl
    expireMaint(state)
    val tokenB = GenState.acquireMaintenance(spark, state)
    // the stalled A wakes at its commit fence: revoked BEFORE a double-fold lands
    val ex = intercept[IllegalStateException] {
      GenState.verifyMaintenance(spark, state, tokenA)
    }
    assert(ex.getMessage.contains("taken over mid-compact"), ex.getMessage)
    // B is the legitimate holder; its fence renews the lease (a heartbeat)
    GenState.verifyMaintenance(spark, state, tokenB)
    GenState.releaseMaintenance(spark, state, tokenB)
    // a released lease leaves the store compactable
    IncrementalExact.compact(spark, state)
  }

  test("merge racing compact (exact family): both commit; state equals sequential; the next compact folds them") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_race_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(3)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(3)) === 1)
    val b3 = docs.where(pmod(col("doc_id"), lit(3)) === 2)
    IncrementalExact.merge(spark, state, b1, Some("b1"))
    IncrementalExact.merge(spark, state, b2, Some("b2"))
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, (String, Int)]]()
    def run(tag: String)(body: => Int) = new Thread(() => {
      start.await()
      results.add(try Right((tag, body)) catch { case t: Throwable => Left(t) })
    })
    val ts = Seq(
      run("compact")(IncrementalExact.compact(spark, state)),
      run("merge")(IncrementalExact.merge(spark, state, b3, Some("b3"))))
    ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(240000))
    val out = results.toArray(Array.empty[Either[Throwable, (String, Int)]]).toSeq
    assert(out.size == 2 && out.forall(_.isRight),
      s"a merge racing a compact must never abort: $out")
    // whatever the interleaving (merge folded by the compact, or live
    // beside the compacted generation), the served state is exact
    val total = IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    assert(total == docs.count(), s"served $total of ${docs.count()} docs")
    assert(GenState.ingestedKeys(spark, state, "hashes") == Set("b1", "b2", "b3"),
      "exactly-once keys must survive the race")
    val v = IncrementalExact.compact(spark, state)
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(v))
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == total)
  }

  test("merge racing compact (MinHash label family): clusters equal the one-shot either way") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_mh_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(3)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(3)) === 1)
    val b3 = docs.where(pmod(col("doc_id"), lit(3)) === 2)
    IncrementalMinHash.merge(spark, state, b1, batchKey = Some("b1"))
    IncrementalMinHash.merge(spark, state, b2, batchKey = Some("b2"))
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
    def run(body: => Int) = new Thread(() => {
      start.await()
      results.add(try Right(body) catch { case t: Throwable => Left(t) })
    })
    val ts = Seq(run(IncrementalMinHash.compact(spark, state)),
      run(IncrementalMinHash.merge(spark, state, b3, batchKey = Some("b3"))))
    ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(240000))
    val out = results.toArray(Array.empty[Either[Throwable, Int]]).toSeq
    assert(out.size == 2 && out.forall(_.isRight), s"an op aborted: $out")
    def sortedClusters(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "cluster_id", "cluster_size", "is_keeper")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val fresh = graft.util.TmpDirs.scratch("graft_ccomp_mh_oneshot_").toString
    IncrementalMinHash.merge(spark, fresh, docs)
    val want = sortedClusters(IncrementalMinHash.clusters(spark, fresh))
    // the _PROBED reconciliation treats (compacted gen, racing merge) as a
    // genuinely concurrent pair: missing cross pairs recomputed at read
    assert(sortedClusters(IncrementalMinHash.clusters(spark, state)) == want,
      "a merge racing a compact must serve exactly the one-shot clustering")
    val v = IncrementalMinHash.compact(spark, state)
    assert(IncrementalMinHash.completeVersions(spark, state) == Seq(v))
    assert(sortedClusters(IncrementalMinHash.clusters(spark, state)) == want)
  }

  test("folded sources are retained under the reader grace, then swept once it expires") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_grace_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("a"))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b"))
    // a reader's snapshot: the plan resolved against {v0, v1} pre-compact
    val preCompact = IncrementalExact.dedup(spark, state)
    val v = IncrementalExact.compact(spark, state)
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(v),
      "folded sources must be non-live immediately")
    assert(exists(state, "v0") && exists(state, "v1"),
      "folded sources must stay on disk under the grace horizon")
    // the racing reader finishes its scan — no vanished files
    assert(preCompact.agg(sum(col("n_copies"))).collect()(0).getLong(0) == docs.count())
    // re-sweeping within the grace is a no-op
    GenState.sweepLeftovers(spark, state, "hashes")
    assert(exists(state, "v0") && exists(state, "v1"))
    // the TTL elapses: the next sweep takes the expired sources
    expireGrace(state, v)
    GenState.sweepLeftovers(spark, state, "hashes")
    assert(!exists(state, "v0") && !exists(state, "v1"),
      "expired folded sources must sweep")
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == docs.count())
  }

  test("GDPR purge overrides the grace: deleted bytes leave disk immediately") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_purge_").toString
    import spark.implicits._
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("a"))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b"))
    val victims = docs.select(col("doc_id")).limit(5)
    val survivors = docs.count() - 5
    val gen = Deletes.purge(spark, state, "exact", victims)
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(gen))
    // the forced sweep: NOTHING but the compacted generation remains
    val dirs = fsOf(state).listStatus(new org.apache.hadoop.fs.Path(state)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName).filter(_.startsWith("v"))
    assert(dirs == Seq(s"v$gen"),
      s"purge must erase all non-live dirs immediately, found $dirs")
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == survivors)
  }

  test("double-fold read-side: the equal/subset manifest is shadowed; serving is unchanged") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_dfold_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("a"))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b"))
    val v = IncrementalExact.compact(spark, state) // manifest {0, 1}
    val total = IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    // forge the lost-race twin: a complete generation that also folded
    // {0, 1} (what a stalled compactor crashed between commit and audit
    // would leave behind)
    forgeCompacted(state, v + 1, Seq(0, 1))
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(v),
      "the equal-manifest double-fold must be shadowed (earlier number wins)")
    assert(GenState.overlapShadowedVersions(spark, state, "hashes") == Seq(v + 1))
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == total,
      "a shadowed double-fold must not double the served counts")
    // a strict-subset twin shadows the same way
    forgeCompacted(state, v + 2, Seq(0))
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(v))
    // a shadowed double-fold WAS live and served until its twin committed,
    // so it keeps the full reader grace (stamped no earlier than the
    // newest live fold's commit) — a default-grace sweep spares it
    GenState.sweepLeftovers(spark, state, "hashes")
    assert(exists(state, s"v${v + 1}") && exists(state, s"v${v + 2}"),
      "a freshly shadowed double-fold must survive the grace-horizon sweep")
    // the forced sweep reclaims the shadowed twins' bytes
    GenState.sweepLeftovers(spark, state, "hashes", graceMs = 0L)
    assert(!exists(state, s"v${v + 1}") && !exists(state, s"v${v + 2}"))
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(v))
  }

  test("incomparable double-folds REFUSE loudly instead of guessing a winner") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_refuse_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 0), Some("a"))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 1), Some("b"))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 2), Some("c"))
    // two forged folds that OVERLAP on v0 but each cover a generation the
    // other missed — shadowing either would drop a merge's content
    forgeCompacted(state, 3, Seq(0, 1))
    forgeCompacted(state, 4, Seq(0, 2))
    val ex = intercept[IllegalStateException] {
      GenState.completeVersions(spark, state, "hashes")
    }
    assert(ex.getMessage.contains("no safe automatic winner"), ex.getMessage)
    assert(ex.getMessage.contains("v3") && ex.getMessage.contains("v4"), ex.getMessage)
    // operator repair: delete one twin; serving resumes from the other
    GenState.deleteVersions(spark, state, Seq(4))
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(2, 3))
  }

  test("transitive manifests keep a stale double-fold shadowed after its twin's sources left disk") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_trans_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("a"))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b"))
    val c1 = IncrementalExact.compact(spark, state) // manifest {0, 1}
    IncrementalExact.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 3).select(
        (col("doc_id") + 100000).as("doc_id"), col("text")), Some("c"))
    val c2 = IncrementalExact.compact(spark, state) // manifest {c1, m} ∪ {0, 1}
    assert(GenState.readManifest(fsOf(state), state, c2).toSet.intersect(Set(0, 1)) == Set(0, 1),
      "a compacted generation must inherit its sources' fold history")
    val total = IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    // everything but c2 leaves disk
    GenState.sweepLeftovers(spark, state, "hashes", graceMs = 0L)
    assert(!exists(state, "v0") && !exists(state, s"v$c1"))
    // an ANCIENT stalled compactor finally commits its fold of the long-
    // dead {0, 1}: the transitive manifest still overlaps — shadowed, not
    // resurrected
    forgeCompacted(state, c2 + 1, Seq(0, 1))
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(c2),
      "a stale double-fold must never resurrect after its twin's sources are swept")
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == total)
  }

  test("operational _CONFIG keys: an out-of-band leaseTtlMs pin does not brick later merges") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_opkey_").toString
    // a real merge pins the verification regime
    IncrementalMinHash.merge(spark, state, docs.where(col("doc_id") < 40), batchKey = Some("a"))
    // the operator follows the lease-steal advice: adds the ttl line to
    // the existing _CONFIG out of band
    val f = fsOf(state)
    val p = new org.apache.hadoop.fs.Path(s"$state/_CONFIG")
    val prior = {
      val in = f.open(p)
      try {
        val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
        in.readFully(buf); new String(buf, "UTF-8")
      } finally in.close()
    }
    val out = f.create(p, true)
    try out.write((prior + "\nleaseTtlMs=120000").getBytes("UTF-8")) finally out.close()
    assert(GenState.leaseTtlMs(spark, state) == 120000L)
    // later merges (whose fixed params map cannot know the key) proceed
    IncrementalMinHash.merge(spark, state, docs.where(col("doc_id") >= 40), batchKey = Some("b"))
    // but a caller PRESENTING a conflicting operational value is refused
    val ex = intercept[IllegalArgumentException] {
      GenState.checkConfig(spark, state,
        Map("threshold" -> "0.8", "leaseTtlMs" -> "1"))
    }
    assert(ex.getMessage.contains("leaseTtlMs"), ex.getMessage)
    // and mixed REGIME parameters still refuse
    val ex2 = intercept[IllegalArgumentException] {
      GenState.checkConfig(spark, state, Map("threshold" -> "0.5"))
    }
    assert(ex2.getMessage.contains("mixed parameters"), ex2.getMessage)
  }

  test("write fence vs the sweep: a stalled writer's commit after its dir was reclaimed aborts — no torn generation") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_torn_").toString
    IncrementalExact.merge(spark, state, docs.where(col("doc_id") < 40), Some("a"))
    // writer B claims a fresh generation, writes a non-commit table, then
    // stalls past the TTL mid-merge
    val (vB, tokB) = GenState.claimFresh(spark, state, "hashes")
    spark.read.parquet(s"$state/v0/docs").limit(1)
      .write.mode("overwrite").parquet(s"$state/v$vB/docs")
    val old = System.currentTimeMillis() - GenState.leaseTtlMs(spark, state) - 60000
    Seq("_LEASE", "_CLAIM").foreach { n =>
      val p = new org.apache.hadoop.fs.Path(s"$state/v$vB/$n")
      if (fsOf(state).exists(p)) fsOf(state).setTimes(p, old, -1)
    }
    // a concurrent sweep (any compact) reclaims the stale in-flight dir
    GenState.sweepLeftovers(spark, state, "hashes")
    assert(!exists(state, s"v$vB"))
    // B wakes and attempts its COMMIT write: the fence aborts it — the
    // commit table can never land alone in a recreated dir
    intercept[IllegalStateException] {
      GenState.fencedParquet(spark, state, vB, "hashes", tokB, "hashes")(
        spark.read.parquet(s"$state/v0/hashes").limit(1))
    }
    assert(!exists(state, s"v$vB/hashes/_SUCCESS"),
      "a stalled writer's commit must not land after the sweep reclaimed its dir")
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(0))
  }

  /** Append operational lines to an existing `_CONFIG` out of band (the
    * documented pinning route for operational keys on a live store).
    */
  private def appendConfig(state: String, lines: String): Unit = {
    val f = fsOf(state)
    val p = new org.apache.hadoop.fs.Path(s"$state/_CONFIG")
    val prior = if (!f.exists(p)) "" else {
      val in = f.open(p)
      try {
        val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
        in.readFully(buf); new String(buf, "UTF-8") + "\n"
      } finally in.close()
    }
    val out = f.create(p, true)
    try out.write((prior + lines).getBytes("UTF-8")) finally out.close()
  }

  test("the _MAINT heartbeat survives a store whose setTimes is unsupported (write-based fallback)") {
    spark.sparkContext.hadoopConfiguration.setClass("fs.crash.impl",
      classOf[CrashFs], classOf[org.apache.hadoop.fs.FileSystem])
    CrashFs.disarm()
    CrashFs.failSetTimes = true
    try {
      val local = graft.util.TmpDirs.scratch("graft_maint_hb_")
      val state = s"crash://$local"
      val token = GenState.acquireMaintenance(spark, state)
      // a long fold: the lease has not been touched for a while — model it
      // by backdating the file UNDERNEATH the failing-setTimes facade
      val maintLocal = local.resolve("_MAINT")
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000)
      java.nio.file.Files.setLastModifiedTime(maintLocal, old)
      val f = fsOf(state)
      val p = new org.apache.hadoop.fs.Path(s"$state/_MAINT")
      val before = f.getFileStatus(p).getModificationTime
      // the fence: setTimes throws, so without the write fallback the
      // mtime would stay stale and ANY compact spanning more than one TTL
      // between fenced writes would be silently stealable mid-fold
      GenState.verifyMaintenance(spark, state, token)
      assert(f.getFileStatus(p).getModificationTime > before,
        "the heartbeat must renew by rewriting the lease when setTimes is unsupported")
      // the rewrite preserved the token: the holder's fences keep passing
      GenState.verifyMaintenance(spark, state, token)
      GenState.releaseMaintenance(spark, state, token)
    } finally CrashFs.failSetTimes = false
  }

  test("heartbeat read-back mismatch is a taken-over ABORT, never a re-stomp of the thief's token") {
    // the write-based heartbeat (setTimes unsupported) rewrites the
    // holder's token, then reads back. A mismatch there is NOT a torn
    // write (the rewrite closed) — it means a rival legitimately stole
    // the stale lease in the rewrite/read-back window. The pre-round-19
    // "repair" rewrote the holder's token AGAIN, stomping the live
    // thief's claim (dueling heartbeats, wasted double-folds); the fix
    // aborts with the fence's taken-over error so exactly one compactor
    // survives — and the thief's token must still be standing afterwards.
    spark.sparkContext.hadoopConfiguration.setClass("fs.crash.impl",
      classOf[CrashFs], classOf[org.apache.hadoop.fs.FileSystem])
    CrashFs.disarm()
    CrashFs.failSetTimes = true
    val thief = new GenState.ClaimBackend {
      @volatile var armed = false
      private val reads = new java.util.concurrent.atomic.AtomicInteger(0)
      def tryClaim(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path, token: String): Boolean =
        GenState.FsClaimBackend.tryClaim(f, p, token)
      def readClaim(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path): Option[String] = {
        if (armed && p.getName == "_MAINT" && reads.incrementAndGet() == 2) {
          // the post-rewrite read-back: the rival's steal (release +
          // re-claim) landed between the holder's rewrite and this read
          GenState.FsClaimBackend.releaseClaim(f, p)
          GenState.FsClaimBackend.tryClaim(f, p, "rival-token")
        }
        GenState.FsClaimBackend.readClaim(f, p)
      }
      def releaseClaim(f: org.apache.hadoop.fs.FileSystem,
          p: org.apache.hadoop.fs.Path): Unit =
        GenState.FsClaimBackend.releaseClaim(f, p)
    }
    val before = GenState.claimBackend
    try {
      GenState.claimBackend = thief
      val local = graft.util.TmpDirs.scratch("graft_maint_stomp_")
      val state = s"crash://$local"
      val token = GenState.acquireMaintenance(spark, state)
      thief.armed = true
      val ex = intercept[IllegalStateException] {
        GenState.verifyMaintenance(spark, state, token)
      }
      assert(ex.getMessage.contains("taken over"), ex.getMessage)
      // the regression half: the thief's live claim survived the abort —
      // no dueling-heartbeat stomp
      val f = fsOf(state)
      assert(GenState.FsClaimBackend.readClaim(f,
        new org.apache.hadoop.fs.Path(s"$state/_MAINT")).contains("rival-token"),
        "the aborting holder must not rewrite over the thief's token")
    } finally {
      GenState.claimBackend = before
      CrashFs.failSetTimes = false
    }
  }

  test("sweepGraceMs decouples the reader grace from the writer-staleness TTL") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_sgrace_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("a"))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b"))
    // deployment choice: instant sweeps (no long readers) but the DEFAULT
    // 15-minute writer TTL — previously impossible, the two were one knob
    appendConfig(state, "sweepGraceMs=0")
    assert(GenState.sweepGraceMs(spark, state) == 0L)
    assert(GenState.leaseTtlMs(spark, state) == GenState.DefaultLeaseTtlMs,
      "pinning the sweep grace must not move the writer-staleness TTL")
    val v = IncrementalExact.compact(spark, state)
    // the compact's own sweep (default grace = the store's sweepGraceMs)
    // already reclaimed the folded sources — zero lingering, zero waiting
    assert(!exists(state, "v0") && !exists(state, "v1"),
      "sweepGraceMs=0 must reclaim folded sources at the compact itself")
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(v))
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == docs.count())
    // operational-key discipline holds for the new key too: later merges
    // that don't present it proceed, a conflicting presenter is refused
    IncrementalExact.merge(spark, state, docs.limit(1), Some("c"))
    val ex = intercept[IllegalArgumentException] {
      GenState.checkConfig(spark, state, Map("sweepGraceMs" -> "999"))
    }
    assert(ex.getMessage.contains("sweepGraceMs"), ex.getMessage)
  }

  test("purge's zero-grace erase is scoped to its own fold lineage: a concurrent fold's sources keep their grace") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_pscope_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 0), Some("a"))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 1), Some("b"))
    val f1 = IncrementalExact.compact(spark, state) // the purge's own fold: manifest {0, 1}
    // the advice's window, replayed deterministically: after the purge's
    // compact released _MAINT but BEFORE its forced sweep runs, a merge
    // lands and a CONCURRENT compact folds {f1, merge} into f2
    val m = IncrementalExact.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(3)) === 2), Some("c"))
    // a reader resolves its listing NOW: {f1, m} — exactly the set the
    // concurrent fold is about to make non-live, and the set the unscoped
    // zero-grace sweep used to erase under it
    val racingReader = IncrementalExact.dedup(spark, state)
    val f2 = IncrementalExact.compact(spark, state)
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(f2))
    // the purge's forced erase arrives late, presenting ITS fold f1
    Deletes.purgeErase(spark, state, "hashes", f1)
    // f1's own lineage (v0, v1 — the dirs that held the purged rows) is
    // erased with zero grace; the CONCURRENT fold's sources are spared
    assert(!exists(state, "v0") && !exists(state, "v1"),
      "the purge lineage must erase immediately")
    assert(exists(state, s"v$m") && exists(state, s"v$f2"),
      "a concurrent fold's just-folded sources must keep their reader grace")
    assert(exists(state, s"v$f1"), "the purge's own compacted generation is the except")
    assert(racingReader.agg(sum(col("n_copies"))).collect()(0).getLong(0) == docs.count(),
      "a post-purge reader mid-scan must not lose files to the forced sweep")
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == docs.count())
  }

  test("purge's forced erase covers overlap-shadowed double-folds: no manifest records them, but they hold the purged rows") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_pshadow_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("a"))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b"))
    val survivor = IncrementalExact.compact(spark, state) // manifest {0, 1}
    // the lost-race twin: a complete double-fold of the same sources — a
    // physical COPY of the pre-purge corpus that appears in NO manifest
    forgeCompacted(state, survivor + 1, Seq(0, 1))
    assert(GenState.overlapShadowedVersions(spark, state, "hashes") == Seq(survivor + 1))
    // the purge's forced erase must take the twin with zero grace too —
    // its bytes are exactly the rows the regulation wants gone, and any
    // reader still holding it predates the survivor fold (pre-purge)
    Deletes.purgeErase(spark, state, "hashes", survivor)
    assert(!exists(state, "v0") && !exists(state, "v1"),
      "the purge lineage must erase immediately")
    assert(!exists(state, s"v${survivor + 1}"),
      "an overlap-shadowed double-fold holds purged rows and must erase with the lineage")
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(survivor))
    assert(IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0) == docs.count())
  }

  test("a merge racing a compact is spliceOnly, not blind: reads skip the corpus-scale re-probe") {
    val state = graft.util.TmpDirs.scratch("graft_ccomp_splice_").toString
    IncrementalMinHash.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 0), batchKey = Some("a"))
    IncrementalMinHash.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 1), batchKey = Some("b"))
    val c = IncrementalMinHash.compact(spark, state) // direct sources {0, 1}
    val m = IncrementalMinHash.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(3)) === 2), batchKey = Some("c"))
    // doctor the race's exact footprint: pretend the merge listed the
    // PRE-compact sources (it committed while the compact was in flight)
    val f = fsOf(state)
    val pp = new org.apache.hadoop.fs.Path(s"$state/v$m/_PROBED")
    val out = f.create(pp, true)
    try out.write(s"0\n1\n$m".getBytes("UTF-8")) finally out.close()
    // classified spliceOnly: the merge probed exactly what the fold folded,
    // so its stored pairs already carry every cross edge — no blind pair
    val (blind, spliceOnly) = GenState.classifyUnreconciled(spark, state,
      IncrementalMinHash.completeVersions(spark, state))
    assert(blind.isEmpty, s"maintenance race must not be blind: $blind")
    assert(spliceOnly == Seq((c, m)), s"expected spliceOnly ($c,$m), got $spliceOnly")
    // and the served clustering is still exactly the one-shot
    def sortedClusters(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "cluster_id", "cluster_size", "is_keeper")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val fresh = graft.util.TmpDirs.scratch("graft_ccomp_splice_oneshot_").toString
    IncrementalMinHash.merge(spark, fresh, docs)
    assert(sortedClusters(IncrementalMinHash.clusters(spark, state)) ==
      sortedClusters(IncrementalMinHash.clusters(spark, fresh)))
  }
}
