package graft

import org.apache.spark.sql.functions._

import graft.ops.{GenState, IncrementalExact, IncrementalMinHash}

/** Real kill-signal crash tests — the composition round 18's VERDICT asked
  * for: [[CrashSoakSpec]] proves the protocol against SIMULATED crashes (a
  * thrown exception at the Kth filesystem mutation, inside one JVM);
  * here a forked worker process ([[graft.tools.MultiJvmStressWorker]]) is
  * destroyed with an actual SIGKILL at a randomized delay — the OS drops
  * whatever buffered/unflushed state the process held, the way a real
  * executor loss or OOM-kill does. The two CrashSoak invariants must hold
  * at EVERY kill point:
  *
  *   - **prefix-exact reads**: the surviving state serves exactly some
  *     prefix of the intended history — never a torn generation, never a
  *     partial count;
  *   - **total recovery**: re-running the killed operation (same batch
  *     key) converges the state to the full sequential answer.
  *
  * Kill timing is ADAPTIVE with a logged seed: a kill that lands before
  * the worker wrote anything, or after it committed, is a valid (and
  * asserted) data point but not the interesting one — the loop retries,
  * nudging the delay toward the window where the worker dies MID-PROTOCOL
  * (on-disk footprint without a commit), and the test requires at least
  * one such kill before it passes.
  */
class KillSignalSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  private val seed = 20260816L
  private val maxAttempts = 10

  /** All vN dirs on disk, complete or not. */
  private def vDirs(state: String): Seq[Int] = {
    val f = GenState.fs(spark, state)
    val root = new org.apache.hadoop.fs.Path(state)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.drop(1).forall(_.isDigit) =>
        n.drop(1).toInt }.sorted
  }

  private def appendConfig(state: String, line: String): Unit = {
    val f = GenState.fs(spark, state)
    val p = new org.apache.hadoop.fs.Path(s"$state/_CONFIG")
    val prior = if (!f.exists(p)) "" else {
      val in = f.open(p)
      try {
        val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
        in.readFully(buf); new String(buf, "UTF-8") + "\n"
      } finally in.close()
    }
    val out = f.create(p, true)
    try out.write((prior + line).getBytes("UTF-8")) finally out.close()
  }

  /** Fork, sleep `delayMs`, SIGKILL, reap. Returns whether the process was
    * still alive at kill time.
    */
  private def forkAndKill(family: String, role: String, state: String,
      key: String, delayMs: Long): Boolean = {
    val w = MultiJvmHarness.fork(family, role, state, sf0001, 2, 0, key)
    Thread.sleep(delayMs)
    val aliveAtKill = w.proc.isAlive
    w.proc.destroyForcibly()
    w.proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS)
    aliveAtKill
  }

  test("SIGKILL mid-merge (exact): prefix-exact reads, total recovery — seeds logged") {
    val rnd = new scala.util.Random(seed)
    info(s"seed=$seed")
    val seedBatch = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val killBatch = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val seedCount = seedBatch.count()
    val fullCount = docs.count()
    var midProtocol = false
    var delayMs = 7000L
    for (attempt <- 1 to maxAttempts if !midProtocol) {
      val state = graft.util.TmpDirs.scratch(s"graft_kill_exact_${attempt}_").toString
      IncrementalExact.merge(spark, state, seedBatch, Some("seed"))
      val jitter = rnd.nextInt(2000) - 1000
      info(s"attempt $attempt: SIGKILL after ${delayMs + jitter} ms")
      forkAndKill("exact", "merge", state, "k", delayMs + jitter)
      val committed = GenState.ingestedKeys(spark, state, "hashes").contains("k")
      val footprint = vDirs(state).size > 1
      midProtocol = footprint && !committed
      if (committed) delayMs = math.max(3000L, delayMs - 2000L) // killed too late
      else if (!footprint) delayMs += 2000L // killed before any mutation
      // invariant 1: PREFIX-EXACT — the served counts equal a legitimate
      // prefix of the history (seed alone, or seed + the killed batch),
      // never a torn in-between
      val served = IncrementalExact.dedup(spark, state)
        .agg(sum(col("n_copies"))).collect()(0).getLong(0)
      assert(served == seedCount || served == fullCount,
        s"attempt $attempt: served $served is neither prefix " +
          s"($seedCount) nor full ($fullCount) — a SIGKILL tore a generation")
      assert((served == fullCount) == committed,
        "the commit marker and the served content must agree")
      // invariant 2: TOTAL RECOVERY — the at-least-once retry (same batch
      // key) converges to the sequential answer; the dead worker's
      // leftover (if any) is inert
      IncrementalExact.merge(spark, state, killBatch, Some("k"))
      val seqState = graft.util.TmpDirs.scratch(s"graft_kill_exact_seq_${attempt}_").toString
      IncrementalExact.merge(spark, seqState, seedBatch, Some("seed"))
      IncrementalExact.merge(spark, seqState, killBatch, Some("k"))
      val got = IncrementalExact.dedup(spark, state).collect().map(_.toString).sorted
      val want = IncrementalExact.dedup(spark, seqState).collect().map(_.toString).sorted
      assert(got.sameElements(want),
        s"attempt $attempt: recovered state must equal sequential ingest")
    }
    assert(midProtocol,
      s"no attempt of $maxAttempts killed the worker mid-protocol — " +
        "widen the delay schedule")
  }

  test("SIGKILL mid-merge (MinHash): prefix-exact clustering, total recovery — seeds logged") {
    val rnd = new scala.util.Random(seed + 1)
    info(s"seed=${seed + 1}")
    val seedBatch = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val killBatch = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    def sortedClusters(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "cluster_id", "cluster_size", "is_keeper")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // the two legitimate prefixes of the intended history
    val seedOnly = graft.util.TmpDirs.scratch("graft_kill_mh_p0_").toString
    IncrementalMinHash.merge(spark, seedOnly, seedBatch, batchKey = Some("seed"))
    val wantPrefix = sortedClusters(IncrementalMinHash.clusters(spark, seedOnly))
    val full = graft.util.TmpDirs.scratch("graft_kill_mh_p1_").toString
    IncrementalMinHash.merge(spark, full, seedBatch, batchKey = Some("seed"))
    IncrementalMinHash.merge(spark, full, killBatch, batchKey = Some("k"))
    val wantFull = sortedClusters(IncrementalMinHash.clusters(spark, full))
    var midProtocol = false
    var delayMs = 9000L
    for (attempt <- 1 to maxAttempts if !midProtocol) {
      val state = graft.util.TmpDirs.scratch(s"graft_kill_mh_${attempt}_").toString
      IncrementalMinHash.merge(spark, state, seedBatch, batchKey = Some("seed"))
      val jitter = rnd.nextInt(2000) - 1000
      info(s"attempt $attempt: SIGKILL after ${delayMs + jitter} ms")
      forkAndKill("minhash", "merge", state, "k", delayMs + jitter)
      val committed = GenState.ingestedKeys(spark, state, "labels").contains("k")
      val footprint = vDirs(state).size > 1
      midProtocol = footprint && !committed
      if (committed) delayMs = math.max(3000L, delayMs - 2000L)
      else if (!footprint) delayMs += 2000L
      // invariant 1: the served clustering is a legitimate prefix
      val got = sortedClusters(IncrementalMinHash.clusters(spark, state))
      assert(got == wantPrefix || got == wantFull,
        s"attempt $attempt: served clustering matches neither prefix — torn state")
      assert((got == wantFull) == committed,
        "the commit marker and the served clustering must agree")
      // invariant 2: total recovery via the keyed retry
      IncrementalMinHash.merge(spark, state, killBatch, batchKey = Some("k"))
      assert(sortedClusters(IncrementalMinHash.clusters(spark, state)) == wantFull,
        s"attempt $attempt: recovered clustering must equal sequential ingest")
    }
    assert(midProtocol,
      s"no attempt of $maxAttempts killed the worker mid-protocol — " +
        "widen the delay schedule")
  }

  test("SIGKILL mid-compact (exact): reads never change, a later compact recovers the fold") {
    val rnd = new scala.util.Random(seed + 2)
    info(s"seed=${seed + 2}")
    var midProtocol = false
    var delayMs = 8000L
    for (attempt <- 1 to maxAttempts if !midProtocol) {
      val state = graft.util.TmpDirs.scratch(s"graft_kill_comp_${attempt}_").toString
      IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("a"))
      IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b"))
      // a dead compactor holds its _MAINT lease until the TTL — pin a
      // short one so recovery (the steal) is testable without waiting out
      // the default. Operational key, appended out of band per the
      // checkConfig contract (the exact family pins no regime keys).
      appendConfig(state, "leaseTtlMs=4000")
      val total = IncrementalExact.dedup(spark, state)
        .agg(sum(col("n_copies"))).collect()(0).getLong(0)
      val jitter = rnd.nextInt(2000) - 1000
      info(s"attempt $attempt: SIGKILL after ${delayMs + jitter} ms")
      forkAndKill("exact", "compact", state, s"comp$attempt", delayMs + jitter)
      val liveAfter = GenState.completeVersions(spark, state, "hashes")
      val folded = liveAfter.size == 1
      val footprint = vDirs(state).size > 2 ||
        GenState.fs(spark, state).exists(new org.apache.hadoop.fs.Path(s"$state/_MAINT"))
      midProtocol = footprint && !folded
      if (folded) delayMs = math.max(3000L, delayMs - 2000L)
      else if (!footprint) delayMs += 2000L
      // invariant 1: a killed compactor never changes what reads serve
      assert(IncrementalExact.dedup(spark, state)
        .agg(sum(col("n_copies"))).collect()(0).getLong(0) == total,
        s"attempt $attempt: a SIGKILLed compactor changed the served counts")
      // invariant 2: recovery — once the dead compactor's lease is stale,
      // a later compact steals it and folds to one live generation
      Thread.sleep(4500)
      val v = IncrementalExact.compact(spark, state)
      assert(GenState.completeVersions(spark, state, "hashes") == Seq(v))
      assert(IncrementalExact.dedup(spark, state)
        .agg(sum(col("n_copies"))).collect()(0).getLong(0) == total)
    }
    assert(midProtocol,
      s"no attempt of $maxAttempts killed the compactor mid-fold — " +
        "widen the delay schedule")
  }
}
