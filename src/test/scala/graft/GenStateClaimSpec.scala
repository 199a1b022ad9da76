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

  test("claim race: the second claimant steals, the stalled first aborts before commit") {
    val state = graft.util.TmpDirs.scratch("graft_claim_race_").toString
    // writer A mid-merge: claimed v0, tables not yet committed
    val tokenA = GenState.claimGeneration(spark, state, 0, "hashes")
    // writer B arrives: v0 is incomplete+claimed — indistinguishable from
    // a crash leftover, so B redoes it wholesale (deletes + re-claims)
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

  test("two-writer end to end: the winner's generation is never mixed with the loser's") {
    val state = graft.util.TmpDirs.scratch("graft_claim_e2e_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    // writer A stalls right after claiming v0
    val tokenA = GenState.claimGeneration(spark, state, 0, "hashes")
    // writer B runs a COMPLETE merge of b1 — steals A's claim, rebuilds
    // v0 wholesale, commits
    assert(IncrementalExact.merge(spark, state, b1) == 0)
    // A wakes: pre-commit check aborts it, so v0 stays exactly B's batch
    intercept[IllegalStateException] {
      GenState.assertClaimed(spark, state, 0, tokenA)
    }
    val served = IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    assert(served == b1.count(),
      "committed generation does not hold exactly the winning writer's batch")
  }

  test("crash recovery is unchanged: an incomplete claimed generation is redone wholesale") {
    val state = graft.util.TmpDirs.scratch("graft_claim_crash_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    IncrementalExact.merge(spark, state, b1, Some("b0"))
    // simulate a crash mid-merge of b2: claim + marker written, commit not
    val tok = GenState.claimGeneration(spark, state, 1, "hashes")
    GenState.writeIngestMarker(spark, state, 1, "b1", tok, "hashes")
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(0))
    // the retry (same batch, same key) must redo v1 and commit it
    assert(IncrementalExact.merge(spark, state, b2, Some("b1")) == 1)
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(0, 1))
    val total = IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    assert(total == docs.count())
  }

  test("loser waking MID-TABLE-WRITES after the thief committed: every guarded write refuses") {
    val state = graft.util.TmpDirs.scratch("graft_claim_midwrite_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    // writer A stalls after claiming v0 — BEFORE any of its table writes
    val tokenA = GenState.claimGeneration(spark, state, 0, "hashes")
    // writer B steals, rebuilds v0 wholesale, COMMITS
    assert(IncrementalExact.merge(spark, state, b1, Some("bB")) == 0)
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
    // the committed generation still holds exactly B's batch
    val served = IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    assert(served == b1.count())
    // and a re-delivery of B's batch key stays a no-op
    assert(IncrementalExact.merge(spark, state, b1, Some("bB")) == 0)
    assert(served == IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0))
  }

  test("a claimant committing MID-STEAL aborts the thief — a committed generation is never deleted") {
    val state = graft.util.TmpDirs.scratch("graft_claim_midsteal_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    // A claims v1 and stalls (incomplete + claimed: the redo-wholesale
    // steal precondition)
    GenState.claimGeneration(spark, state, 1, "hashes")
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
      // A claims v1 and stalls; B treats the incomplete claimed v1 as a
      // crash leftover, releases A's claim via the backend, re-claims
      val tokenA = GenState.claimGeneration(spark, state, 1, "hashes")
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
