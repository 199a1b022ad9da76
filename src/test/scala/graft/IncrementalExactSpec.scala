package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, IncrementalExact}

/** d18: the write-only incremental twin of d1's exact-dedup aggregate —
  * split-ingest must be hash-identical to the one-shot for any split, a
  * merge must never read prior state, and compaction must shrink the
  * index to one row per distinct content without changing the answer.
  */
class IncrementalExactSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.select("h", "keeper", "n_copies")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("split-ingest equals d1's one-shot aggregate, any split") {
    val full = sorted(Dedup.exactDedup(spark, sf0001))
    for (mod <- Seq(2, 5)) {
      val state = graft.util.TmpDirs.scratch(s"graft_d18_t_${mod}_").toString
      (0 until mod).foreach { r =>
        IncrementalExact.merge(spark, state,
          docs.where(pmod(col("doc_id"), lit(mod)) === r))
      }
      assert(sorted(IncrementalExact.dedup(spark, state)) == full,
        s"$mod-way split-ingest diverged from the one-shot aggregate")
    }
  }

  test("ingest is WRITE-ONLY: a merge plans no read of prior generations") {
    val state = graft.util.TmpDirs.scratch("graft_d18_wo_").toString
    IncrementalExact.merge(spark, state, docs.where(col("doc_id") < 100))
    // the second batch's write job, as merge builds it: only the
    // documents scan — no parquet read of the state dir anywhere
    val batch2 = docs.where(col("doc_id") >= 100)
    val plan = batch2
      .select(col("doc_id"),
        sha2(graft.ops.Text.normalized(col("text")).cast("binary"), 256).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains(state), s"merge reads prior state:\n$plan")
    // and the API-level merge indeed appends without touching v0's data
    // (mtime check: v0's hashes dir is untouched by the second merge)
    val f = graft.ops.GenState.fs(spark, state)
    val v0 = new org.apache.hadoop.fs.Path(s"$state/v0/hashes/_SUCCESS")
    val before = f.getFileStatus(v0).getModificationTime
    IncrementalExact.merge(spark, state, batch2)
    assert(f.getFileStatus(v0).getModificationTime == before)
    assert(IncrementalExact.latestVersion(spark, state).contains(1))
  }

  test("keyed merge is idempotent: a re-delivered batch is a no-op, even across compact") {
    val state = graft.util.TmpDirs.scratch("graft_d18_idem_").toString
    val b0 = docs.where(col("doc_id") < 100)
    val b1 = docs.where(col("doc_id") >= 100)
    val v0 = IncrementalExact.merge(spark, state, b0, Some("b0"))
    val before = sorted(IncrementalExact.dedup(spark, state))
    // the q57 crash window: generation committed, stream checkpoint
    // didn't — the re-delivered keyed batch must not append a generation
    assert(IncrementalExact.merge(spark, state, b0, Some("b0")) == v0)
    assert(IncrementalExact.completeVersions(spark, state) == Seq(v0))
    assert(sorted(IncrementalExact.dedup(spark, state)) == before,
      "re-delivered batch inflated the partial aggregates")
    IncrementalExact.merge(spark, state, b1, Some("b1"))
    val full = sorted(Dedup.exactDedup(spark, sf0001))
    assert(sorted(IncrementalExact.dedup(spark, state)) == full)
    // markers travel with compaction: both keys stay no-ops afterwards
    IncrementalExact.compact(spark, state)
    IncrementalExact.merge(spark, state, b0, Some("b0"))
    IncrementalExact.merge(spark, state, b1, Some("b1"))
    assert(IncrementalExact.completeVersions(spark, state).size == 1,
      "re-delivery after compact appended a generation")
    assert(sorted(IncrementalExact.dedup(spark, state)) == full)
    // an UNKEYED merge of fresh data still appends (legacy batch path)
    IncrementalExact.merge(spark, state, b0)
    assert(IncrementalExact.completeVersions(spark, state).size == 2)
  }

  test("compact re-aggregates to one row per content; answer unchanged; policy bounds live count") {
    val state = graft.util.TmpDirs.scratch("graft_d18_cpt_").toString
    (0 until 3).foreach(r => IncrementalExact.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(3)) === r)))
    val before = sorted(IncrementalExact.dedup(spark, state))
    assert(IncrementalExact.maybeCompact(spark, state, maxLive = 4).isEmpty)
    val v = IncrementalExact.maybeCompact(spark, state, maxLive = 2)
    assert(v.nonEmpty)
    assert(IncrementalExact.completeVersions(spark, state) == Seq(v.get))
    assert(sorted(IncrementalExact.dedup(spark, state)) == before)
    // folded index is fully re-aggregated: exactly one row per hash
    val idx = spark.read.parquet(s"$state/v${v.get}/hashes")
    assert(idx.count() == idx.select("h").distinct().count())
    // post-compact ingest still exact
    val more = graft.sources.Tables.documents(spark, sf0001) // same corpus again
    IncrementalExact.merge(spark, state, more)
    val want = sorted(Dedup.exactDedup(spark, sf0001)
      .select(col("h"), col("keeper"), (col("n_copies") * 2).as("n_copies")))
    assert(sorted(IncrementalExact.dedup(spark, state)) == want,
      "doubled corpus should double every n_copies with the same keepers")
  }

  // one-shot d1 aggregate over an arbitrary surviving subset
  private def oneShotOver(surviving: org.apache.spark.sql.DataFrame) =
    sorted(surviving
      .select(col("doc_id"),
        sha2(graft.ops.Text.normalized(col("text")).cast("binary"), 256).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies")))

  test("d28 delete: tombstoned serve == one-shot aggregate over the survivors") {
    val state = graft.util.TmpDirs.scratch("graft_d28_del_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    val dead = docs.where(pmod(col("doc_id"), lit(7)) === 3)
    IncrementalExact.delete(spark, state, dead.select(col("doc_id")))
    val want = oneShotOver(docs.where(pmod(col("doc_id"), lit(7)) =!= 3))
    assert(sorted(IncrementalExact.dedup(spark, state)) == want,
      "tombstoned serve diverged from the one-shot over surviving docs")
    // deleting a keeper hands keeper-ship to the next-smallest copy and
    // zero-survivor groups vanish — both covered by the equality above;
    // sanity: the deleted set was non-trivial and spanned both generations
    assert(dead.count() > 0)
    assert(dead.where(pmod(col("doc_id"), lit(2)) === 0).count() > 0)
    assert(dead.where(pmod(col("doc_id"), lit(2)) === 1).count() > 0)
  }

  test("d28 re-ingest after delete is LIVE again (s9 shadowing semantics)") {
    val state = graft.util.TmpDirs.scratch("graft_d28_reing_").toString
    IncrementalExact.merge(spark, state, docs)
    val deadIds = docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id"))
    IncrementalExact.delete(spark, state, deadIds)
    // re-ingest the very same docs: a tombstone shadows OLDER generations
    // only, so the re-ingested copies are live
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(7)) === 3))
    assert(sorted(IncrementalExact.dedup(spark, state)) ==
      sorted(Dedup.exactDedup(spark, sf0001)),
      "re-ingested docs must be live again after their tombstone")
  }

  test("d28 compact purges tombstones physically; serve unchanged; deletes survive maintenance") {
    val state = graft.util.TmpDirs.scratch("graft_d28_purge_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    IncrementalExact.delete(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
    val before = sorted(IncrementalExact.dedup(spark, state))
    val v = IncrementalExact.compact(spark, state)
    assert(IncrementalExact.completeVersions(spark, state) == Seq(v))
    assert(sorted(IncrementalExact.dedup(spark, state)) == before)
    val f = graft.ops.GenState.fs(spark, state)
    // no tombstones carried — they were consumed by the physical purge
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$state/v$v/tombstones")),
      "compacted generation must not carry tombstones")
    // and the purged sidecar no longer holds ANY deleted doc_id — the
    // right-to-be-forgotten certification point (bytes left the disk with
    // the source generations)
    val leaked = spark.read.parquet(s"$state/v$v/docs")
      .where(pmod(col("doc_id"), lit(7)) === 3).count()
    assert(leaked == 0, s"purged sidecar still holds $leaked deleted rows")
    // deletes keep holding after further ingest + a second compact
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(7)) === 3))
    assert(sorted(IncrementalExact.dedup(spark, state)) ==
      sorted(Dedup.exactDedup(spark, sf0001)))
  }

  test("tombstone bound: generations ingested AFTER the newest tombstone never join the correction") {
    // the r14 read-path bound: a tombstone shadows strictly-older
    // generations only, so newer generations serve from their stored
    // aggregates — their SIDECARS must not even be scanned. This pins the
    // plan shape so a refactor can't silently reintroduce the
    // correction-scans-everything behavior (whose cost grows with every
    // post-delete ingest instead of being frozen at delete-time size).
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val state = graft.util.TmpDirs.scratch("graft_d28_bound_").toString
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    IncrementalExact.delete(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
    // two post-delete ingests (disjoint ids)
    IncrementalExact.merge(spark, state,
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars")))
    IncrementalExact.merge(spark, state,
      docs.select((col("doc_id") + 2000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars")))
    val served = IncrementalExact.dedup(spark, state)
    val roots = served.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten
    // pre-delete sidecars participate in the correction…
    assert(roots.exists(_.contains("/v0/docs")) && roots.exists(_.contains("/v1/docs")),
      s"correction must read pre-delete sidecars; scanned: $roots")
    // …post-delete sidecars must NOT (their aggregates serve untouched)
    assert(!roots.exists(_.contains("/v3/docs")) && !roots.exists(_.contains("/v4/docs")),
      s"post-delete sidecars leaked into the correction scan: $roots")
    // while their aggregate partials ARE unioned in
    assert(roots.exists(_.contains("/v3/hashes")) && roots.exists(_.contains("/v4/hashes")),
      s"post-delete aggregates missing from the serve union: $roots")
    // and the served answer is the survivors + replicas one-shot
    val surv = docs.where(pmod(col("doc_id"), lit(7)) =!= 3)
    val want = oneShotOver(surv
      .unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars")))
      .unionByName(docs.select((col("doc_id") + 2000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))))
    assert(sorted(served) == want)
  }

  test("d28 delete refuses a pre-sidecar state dir (nothing to subtract from)") {
    val state = graft.util.TmpDirs.scratch("graft_d28_presid_").toString
    IncrementalExact.merge(spark, state, docs.where(col("doc_id") < 100))
    // simulate the pre-sidecar layout: drop the docs table
    val f = graft.ops.GenState.fs(spark, state)
    f.delete(new org.apache.hadoop.fs.Path(s"$state/v0/docs"), true)
    val ex = intercept[IllegalArgumentException] {
      IncrementalExact.delete(spark, state,
        docs.where(col("doc_id") < 10).select(col("doc_id")))
    }
    assert(ex.getMessage.contains("sidecar"))
    // the sidecar-less dir still serves and compacts the original way
    assert(sorted(IncrementalExact.dedup(spark, state)) ==
      oneShotOver(docs.where(col("doc_id") < 100)))
    val v = IncrementalExact.compact(spark, state)
    assert(sorted(IncrementalExact.dedup(spark, state)) ==
      oneShotOver(docs.where(col("doc_id") < 100)))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$state/v$v/docs")),
      "pre-sidecar compact must not invent a partial sidecar")
  }
}
