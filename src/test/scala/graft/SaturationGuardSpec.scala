package graft

import org.apache.spark.sql.functions._

import graft.ops.{GenState, IncrementalDedup}

/** The d12 32-bit saturation guard: SCALE.md's measured cliff (21×
  * split-ingest blowup across the 100k→1M decade, band buckets at
  * occupancy ~15) made operational — every 32-bit merge estimates the
  * half-band index's mean bucket occupancy from the slim band dirs'
  * on-disk bytes (a metadata walk, no extra job) and warns, or refuses
  * under `saturationAction=refuse`, once it crosses the
  * `saturationOccupancy` pin. Plus the migration contract: width is the
  * state, so the escape from a saturating 32-bit dir is re-ingest into a
  * fresh width=64 dir — and an in-place width flip is REFUSED.
  */
class SaturationGuardSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  private def appendConfig(state: String, lines: String): Unit = {
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
    try out.write((prior + lines).getBytes("UTF-8")) finally out.close()
  }

  test("a saturating 32-bit index trips the advisory; saturationAction=refuse turns it into an error") {
    val state = graft.util.TmpDirs.scratch("graft_sat_refuse_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    // first merge pins the regime and is far below the default threshold
    IncrementalDedup.merge(spark, state, b1, batchKey = Some("b0"))
    // pin a synthetic-saturation threshold (operational keys are appended
    // out of band per the checkConfig contract) + the hard action
    appendConfig(state, "saturationOccupancy=0.0000001\nsaturationAction=refuse")
    val ex = intercept[IllegalStateException] {
      IncrementalDedup.merge(spark, state, b2, batchKey = Some("b1"))
    }
    assert(ex.getMessage.contains("SATURATING"), ex.getMessage)
    assert(ex.getMessage.contains("width=64"), "the advisory must name the escape dial")
    assert(ex.getMessage.contains("re-ingest"), "the advisory must state the migration")
    // the refusal fires BEFORE any write and abandons its fresh claim: a
    // deterministic refusal retried by a scheduler must not accumulate
    // orphaned claimed generations (or pay the sign-and-write job first)
    val dirs = GenState.fs(spark, state)
      .listStatus(new org.apache.hadoop.fs.Path(state))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs == Set("v0"),
      s"a refused merge must leave no claimed leftover, got $dirs")
    // and the already-ingested generation still serves
    assert(GenState.completeVersions(spark, state) == Seq(0))
  }

  test("default action is a WARNING: the merge itself still commits (availability over refusal)") {
    val state = graft.util.TmpDirs.scratch("graft_sat_warn_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    IncrementalDedup.merge(spark, state, b1, batchKey = Some("b0"))
    appendConfig(state, "saturationOccupancy=0.0000001")
    // trips the advisory (same estimate as above) but only logs — the
    // merge commits and the state serves
    val v = IncrementalDedup.merge(spark, state, b2, batchKey = Some("b1"))
    assert(GenState.completeVersions(spark, state).contains(v))
    assert(IncrementalDedup.clusters(spark, state).count() >= 0)
    // the 64-bit regime is exempt by construction: no guard, no trip
    val state64 = graft.util.TmpDirs.scratch("graft_sat_w64_").toString
    IncrementalDedup.merge(spark, state64, b1, width = 64, batchKey = Some("b0"))
    appendConfig(state64, "saturationOccupancy=0.0000001\nsaturationAction=refuse")
    IncrementalDedup.merge(spark, state64, b2, width = 64, batchKey = Some("b1"))
  }

  test("malformed guard config fails LOUDLY naming the key: bad occupancy numbers and typo'd actions never silently degrade") {
    // a fat-fingered _CONFIG must not brick every merge with a bare
    // NumberFormatException, and a typo of 'refuse' must not silently
    // weaken the refuse contract back to warn
    val state = graft.util.TmpDirs.scratch("graft_sat_badcfg_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    IncrementalDedup.merge(spark, state, b1, batchKey = Some("b0"))
    appendConfig(state, "saturationOccupancy=eight")
    val exNum = intercept[IllegalArgumentException] {
      IncrementalDedup.merge(spark, state, b2, batchKey = Some("b1"))
    }
    assert(exNum.getMessage.contains("saturationOccupancy") &&
      exNum.getMessage.contains("eight"), exNum.getMessage)
    // negative / zero thresholds are rejected the same way
    val stateNeg = graft.util.TmpDirs.scratch("graft_sat_negcfg_").toString
    IncrementalDedup.merge(spark, stateNeg, b1, batchKey = Some("b0"))
    appendConfig(stateNeg, "saturationOccupancy=-3")
    val exNeg = intercept[IllegalArgumentException] {
      IncrementalDedup.merge(spark, stateNeg, b2, batchKey = Some("b1"))
    }
    assert(exNeg.getMessage.contains("saturationOccupancy"), exNeg.getMessage)
    // an unknown action is an error that NAMES the accepted values
    val stateAct = graft.util.TmpDirs.scratch("graft_sat_actcfg_").toString
    IncrementalDedup.merge(spark, stateAct, b1, batchKey = Some("b0"))
    appendConfig(stateAct, "saturationAction=refues")
    val exAct = intercept[IllegalArgumentException] {
      IncrementalDedup.merge(spark, stateAct, b2, batchKey = Some("b1"))
    }
    assert(exAct.getMessage.contains("saturationAction") &&
      exAct.getMessage.contains("refues") &&
      exAct.getMessage.contains("'warn'") &&
      exAct.getMessage.contains("'refuse'"), exAct.getMessage)
  }

  test("width migration: an in-place 32→64 flip is REFUSED; re-ingest into a fresh width=64 dir serves the 64-bit answer") {
    val state32 = graft.util.TmpDirs.scratch("graft_sat_mig32_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    IncrementalDedup.merge(spark, state32, b1, batchKey = Some("b0"))
    // the flip is a mixed verification regime — checkConfig refuses it
    // before anything is written (signatures ARE the state; folding 64-bit
    // blocks into a 32-bit half-band index would match no one-shot)
    val ex = intercept[IllegalArgumentException] {
      IncrementalDedup.merge(spark, state32, b2, width = 64, batchKey = Some("b1"))
    }
    assert(ex.getMessage.contains("mixed parameters"), ex.getMessage)
    // the documented migration: re-ingest the corpus into a FRESH dir
    // under width=64 — split-ingest there equals the 64-bit one-shot
    val state64 = graft.util.TmpDirs.scratch("graft_sat_mig64_").toString
    IncrementalDedup.merge(spark, state64, b1, width = 64, batchKey = Some("b0"))
    IncrementalDedup.merge(spark, state64, b2, width = 64, batchKey = Some("b1"))
    val oneShot = graft.util.TmpDirs.scratch("graft_sat_mig64_one_").toString
    IncrementalDedup.merge(spark, oneShot, docs, width = 64, batchKey = Some("all"))
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(sorted(IncrementalDedup.clusters(spark, state64)) ==
      sorted(IncrementalDedup.clusters(spark, oneShot)),
      "the migrated 64-bit state must serve exactly the 64-bit one-shot clustering")
  }
}
