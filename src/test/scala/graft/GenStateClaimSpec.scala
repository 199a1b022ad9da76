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
    GenState.claimGeneration(spark, state, 1, "hashes")
    GenState.writeIngestMarker(spark, state, 1, "b1")
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(0))
    // the retry (same batch, same key) must redo v1 and commit it
    assert(IncrementalExact.merge(spark, state, b2, Some("b1")) == 1)
    assert(GenState.completeVersions(spark, state, "hashes") == Seq(0, 1))
    val total = IncrementalExact.dedup(spark, state)
      .agg(sum(col("n_copies"))).collect()(0).getLong(0)
    assert(total == docs.count())
  }
}
