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
  * What this does and does not prove: the processes share one LOCAL
  * filesystem, so the atomic primitive under test is the OS's O_EXCL
  * create (plus link(2) for `_CONFIG`) — the same primitives HDFS/ABFS
  * provide natively. An object-store deployment swaps the claim primitive
  * for a conditional PUT ([[GenState.ExternalCpClaimBackend]], proven in
  * GenStateClaimSpec); what the local FS CANNOT prove is S3's rename
  * semantics for the fenced table publish — see SCALE.md's multi-JVM
  * note for that boundary.
  */
class MultiJvmStressSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  /** The forked workers must open the same JDK modules as this (Spark-
    * capable) test JVM. Inherit the flags from the RUNNING JVM so the
    * list cannot drift from build.sbt's; fall back to the known Spark 4 /
    * JDK 17 set only if the runtime reports none (non-forked runner).
    */
  private val addOpens: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val paired = jvmArgs.sliding(2).collect {
      case Seq("--add-opens", v) => Seq("--add-opens", v) }.flatten.toSeq
    val fused = jvmArgs.filter(_.startsWith("--add-opens="))
      .flatMap(a => Seq("--add-opens", a.stripPrefix("--add-opens=")))
    val inherited = paired ++ fused
    if (inherited.nonEmpty) inherited
    else Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
  }

  private case class Worker(tag: String, proc: Process, log: java.io.File)

  private def fork(family: String, role: String, state: String,
      mod: Int, residue: Int, key: String): Worker = {
    val cmd = Seq(s"${System.getProperty("java.home")}/bin/java") ++ addOpens ++
      Seq("-Xmx3g", "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.MultiJvmStressWorker",
        family, role, state, sf0001, mod.toString, residue.toString, key)
    // log to a file, not a pipe: four concurrent Spark drivers write more
    // startup chatter than a pipe buffer holds, and a writer blocked on a
    // full pipe would serialize the very race under test
    val log = java.io.File.createTempFile(s"graft_mjvm_${role}_$key", ".log")
    log.deleteOnExit()
    val proc = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).redirectOutput(log).start()
    Worker(s"$family/$role/$key", proc, log)
  }

  /** Wait for all workers; return (tag, exitCode, output-tail). */
  private def drain(ws: Seq[Worker]): Seq[(String, Int, String)] = ws.map { w =>
    val done = w.proc.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    assert(done, s"worker ${w.tag} did not finish in 10 minutes")
    val out = new String(java.nio.file.Files.readAllBytes(w.log.toPath), "UTF-8")
    (w.tag, w.proc.exitValue(), out.linesIterator.toSeq.takeRight(12).mkString("\n"))
  }

  test("exact family: 3 merge processes + 1 compactor process — all clean, state equals sequential ingest") {
    val state = graft.util.TmpDirs.scratch("graft_mjvm_exact_").toString
    // seed one committed generation so the racing compactor always has
    // something to fold whatever the interleaving
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(4)) === 3), Some("seed"))
    val ws = Seq(
      fork("exact", "merge", state, 4, 0, "j0"),
      fork("exact", "merge", state, 4, 1, "j1"),
      fork("exact", "merge", state, 4, 2, "j2"),
      fork("exact", "compact", state, 4, -1, "comp"))
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

  test("exact family: TWO compactor processes racing — never a double-fold, state intact either way") {
    val state = graft.util.TmpDirs.scratch("graft_mjvm_2comp_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("a"))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b"))
    val total = IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    val ws = Seq(
      fork("exact", "compact", state, 2, -1, "c1"),
      fork("exact", "compact", state, 2, -1, "c2"))
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

  test("MinHash family: 3 merge processes + 1 compactor process — clustering equals the one-shot") {
    val state = graft.util.TmpDirs.scratch("graft_mjvm_mh_").toString
    IncrementalMinHash.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(4)) === 3), batchKey = Some("seed"))
    val ws = Seq(
      fork("minhash", "merge", state, 4, 0, "j0"),
      fork("minhash", "merge", state, 4, 1, "j1"),
      fork("minhash", "merge", state, 4, 2, "j2"),
      fork("minhash", "compact", state, 4, -1, "comp"))
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
