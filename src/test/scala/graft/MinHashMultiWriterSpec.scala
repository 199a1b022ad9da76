package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, GenState, IncrementalMinHash, LabelState}

/** Multi-writer ingest on the MinHash d15 family — the first
  * LABEL-BEARING probe-at-merge modality to shed the single-writer
  * contract (round 17; the media chassis proved the `_PROBED` pattern in
  * round 16). Two invariants under test, for ANY interleaving of
  * concurrent merges:
  *
  *   1. the served clustering equals the one-shot recompute — missing
  *      cross pairs between concurrent batches are reconciled from the
  *      frozen band/set generations at the pinned threshold;
  *   2. the label FOLD corruption concurrency inflicts (two blind deltas
  *      latest-wins-splitting a shared old component, even with NO cross
  *      pair between the batches) is repaired by re-labeling the affected
  *      components from their stored pairs — the stored-endpoint half of
  *      the reconciliation scope.
  */
class MinHashMultiWriterSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  private def clustersSorted(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "cluster_id", "cluster_size", "is_keeper")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  /** One-shot twin of an arbitrary doc frame: a single merge into a fresh
    * state dir (pinned hash-identical to CC over the one-shot d3 graph by
    * IncrementalMinHashSpec).
    */
  private def oneShotOf(df: org.apache.spark.sql.DataFrame, tag: String) = {
    val fresh = graft.util.TmpDirs.scratch(s"graft_mhmw_oneshot_${tag}_").toString
    IncrementalMinHash.merge(spark, fresh, df)
    clustersSorted(IncrementalMinHash.clusters(spark, fresh))
  }

  test("two genuinely concurrent merges both commit; clusters equal the one-shot; compact is durable") {
    val state = graft.util.TmpDirs.scratch("graft_mhmw_conc_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
    def writer(batch: org.apache.spark.sql.DataFrame, key: String) = new Thread(() => {
      start.await()
      results.add(
        try Right(IncrementalMinHash.merge(spark, state, batch, batchKey = Some(key)))
        catch { case t: Throwable => Left(t) })
    })
    val ts = Seq(writer(b1, "c1"), writer(b2, "c2"))
    ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(240000))
    val out = results.toArray(Array.empty[Either[Throwable, Int]]).toSeq
    assert(out.size == 2 && out.forall(_.isRight),
      s"both concurrent merges must commit (the loud single-writer abort is " +
        s"RETIRED for this family): $out")
    assert(out.collect { case Right(v) => v }.toSet.size == 2,
      "writers must land in distinct generations")
    val want = oneShotOf(docs, "conc")
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) == want,
      "concurrent ingest must serve exactly the one-shot clustering")
    // compact folds + reconciles durably into one generation
    val v = IncrementalMinHash.compact(spark, state)
    assert(IncrementalMinHash.completeVersions(spark, state) == Seq(v))
    assert(GenState.readProbed(spark, state, v) == Some(Set(v)),
      "the compacted generation must have nothing left to reconcile")
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) == want)
    // and the exactly-once markers carried both keys through the fold
    assert(GenState.ingestedKeys(spark, state) == Set("c1", "c2"))
  }

  test("four concurrent writers: clusters equal the one-shot") {
    val state = graft.util.TmpDirs.scratch("graft_mhmw_four_").toString
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
    val threads = (0 until 4).map { k =>
      new Thread(() => {
        start.await()
        results.add(
          try Right(IncrementalMinHash.merge(spark, state,
            docs.where(pmod(xxhash64(col("doc_id")), lit(4)) === k),
            batchKey = Some(s"w$k")))
          catch { case t: Throwable => Left(t) })
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join(240000))
    val out = results.toArray(Array.empty[Either[Throwable, Int]]).toSeq
    assert(out.size == 4 && out.forall(_.isRight), s"a concurrent merge aborted: $out")
    assert(out.collect { case Right(v) => v }.toSet.size == 4)
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) ==
      oneShotOf(docs, "four"),
      "4-writer serve diverged from the one-shot")
  }

  /** Doctor generation `target` of `state` into exactly what a merge that
    * never saw generations > `sawUpTo` would have written: tables copied
    * from a sibling state dir that REALLY ran that blind history, label
    * delta re-stamped to `target`'s number, `_PROBED` = the blind view.
    */
  private def doctorBlind(state: String, target: Int, soloGen: Int,
      solo: String, sawUpTo: Int): Unit = {
    for (t <- Seq("sets", "bands", "pairs"))
      spark.read.parquet(s"$solo/v$soloGen/$t")
        .write.mode("overwrite").parquet(s"$state/v$target/$t")
    spark.read.parquet(s"$solo/v$soloGen/labels")
      .withColumn("gen", lit(target))
      .write.mode("overwrite").parquet(s"$state/v$target/labels")
    val f = GenState.fs(spark, state)
    val probed = ((0 to sawUpTo) :+ target).mkString("\n")
    val out = f.create(new org.apache.hadoop.fs.Path(s"$state/v$target/_PROBED"), true)
    try out.write(probed.getBytes("UTF-8")) finally out.close()
  }

  test("reconciliation recovers the cross pairs two concurrent commits both missed") {
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val state = graft.util.TmpDirs.scratch("graft_mhmw_recon_").toString
    IncrementalMinHash.merge(spark, state, b1)
    IncrementalMinHash.merge(spark, state, b2)
    // doctor v1 into the image of a merge that never saw v0: the blind
    // history really run in a sibling dir, then transplanted
    val solo = graft.util.TmpDirs.scratch("graft_mhmw_recon_solo_").toString
    IncrementalMinHash.merge(spark, solo, b2)
    doctorBlind(state, target = 1, soloGen = 0, solo = solo, sawUpTo = -1)
    // precondition: the stored pair generations now hold NO cross pair
    val stored = spark.read.parquet(s"$state/v0/pairs", s"$state/v1/pairs")
      .select(pmod(col("d1"), lit(2)).as("p1"), pmod(col("d2"), lit(2)).as("p2"))
      .where(col("p1") =!= col("p2")).count()
    assert(stored == 0, "precondition: cross pairs must be missing from storage")
    val want = oneShotOf(docs, "recon")
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) == want,
      "the read must reconcile the missing cross pairs")
    // compact makes it durable
    val v = IncrementalMinHash.compact(spark, state)
    assert(IncrementalMinHash.completeVersions(spark, state) == Seq(v))
    assert(GenState.readProbed(spark, state, v) == Some(Set(v)))
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) == want)
  }

  /** Synthetic corpus for the fold-split scenario: an old component
    * {10, 11} (near-identical long texts), writer A's doc 2 a variant of
    * doc 10, writer B's doc 30 a variant of doc 11 — tails sized so that
    * A's and B's docs are NOT near-dups of each other (no cross pair
    * exists to reconcile), yet both pull the shared old component into
    * their blind label deltas. Doc 2's id undercuts the component minimum,
    * so the latest-wins fold SPLITS doc 2 out — the exact corruption the
    * stored-endpoint reconciliation scope repairs.
    */
  private def foldSplitDocs = {
    import spark.implicits._
    val base = (0 until 100).map(i => s"w$i").mkString(" ")
    val base11 = ((0 until 99).map(i => s"w$i") :+ "x99").mkString(" ")
    val tailA = (0 until 15).map(i => s"a$i").mkString(" ")
    val tailB = (0 until 15).map(i => s"b$i").mkString(" ")
    Seq(
      (10L, base),
      (11L, base11),
      (2L, s"$base $tailA"),
      (30L, s"$base11 $tailB"),
      (50L, (0 until 60).map(i => s"z$i").mkString(" ")) // unrelated singleton
    ).toDF("doc_id", "text")
  }

  test("stored-endpoint scope repairs the label-fold split of a shared old component (no cross pair exists)") {
    val all = foldSplitDocs
    val want = oneShotOf(all, "split")
    // precondition: the one-shot clusters {2, 10, 11, 30} into ONE
    // component labeled 2 — otherwise the scenario under test is vacuous
    assert(want.count(r => r(1) == 2L) == 4,
      s"precondition: synthetic docs must form one 4-member component labeled 2, got $want")
    val state = graft.util.TmpDirs.scratch("graft_mhmw_split_").toString
    IncrementalMinHash.merge(spark, state, all.where(col("doc_id").isin(10L, 11L, 50L)))
    IncrementalMinHash.merge(spark, state, all.where(col("doc_id") === 2L))
    // writer B's blind image: a sibling history that saw ONLY the base
    val solo = graft.util.TmpDirs.scratch("graft_mhmw_split_solo_").toString
    IncrementalMinHash.merge(spark, solo, all.where(col("doc_id").isin(10L, 11L, 50L)))
    IncrementalMinHash.merge(spark, solo, all.where(col("doc_id") === 30L))
    val v2 = GenState.claimFresh(spark, state) match { case (v, _) => v }
    doctorBlind(state, target = v2, soloGen = 1, solo = solo, sawUpTo = 0)
    // precondition 1: A's and B's batches share NO cross pair anywhere
    val live = IncrementalMinHash.completeVersions(spark, state)
    val storedPairs = spark.read.parquet(live.map(v => s"$state/v$v/pairs"): _*)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!storedPairs.contains((2L, 30L)),
      "precondition: the two concurrent batches must not pair with each other")
    // precondition 2: the NAIVE fold (no reconciliation) is actually
    // corrupt — doc 2 split out of the shared component
    val folded = clustersSorted(graft.ops.Dedup.clustersOf(
      LabelState.deletedAwareLabels(spark, state, live, "sets", "doc_id")))
    assert(folded != want,
      "precondition: the uncorrected fold must be split, or this test is vacuous")
    // the reconciled read repairs it; compact makes it durable
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) == want,
      "reconciliation must repair the fold split from stored pair endpoints")
    val vc = IncrementalMinHash.compact(spark, state)
    assert(IncrementalMinHash.completeVersions(spark, state) == Seq(vc))
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) == want)
  }

  test("tombstones compose with reconciliation: deletes over a concurrent history serve the survivors' one-shot") {
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val state = graft.util.TmpDirs.scratch("graft_mhmw_tomb_").toString
    IncrementalMinHash.merge(spark, state, b1)
    IncrementalMinHash.merge(spark, state, b2)
    val solo = graft.util.TmpDirs.scratch("graft_mhmw_tomb_solo_").toString
    IncrementalMinHash.merge(spark, solo, b2)
    doctorBlind(state, target = 1, soloGen = 0, solo = solo, sawUpTo = -1)
    IncrementalMinHash.delete(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id")))
    val survivors = docs.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val want = oneShotOf(survivors, "tomb")
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) == want,
      "reconciled + tombstoned serve must equal the survivors' one-shot")
    val v = IncrementalMinHash.compact(spark, state)
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) == want)
    // the purge left no deleted doc behind, reconciliation included
    assert(spark.read.parquet(s"$state/v$v/sets")
      .where(pmod(col("doc_id"), lit(7)) === 0).count() == 0)
  }

  test("re-delivered batch keys are exactly-once under fresh allocation, surviving compaction") {
    val state = graft.util.TmpDirs.scratch("graft_mhmw_keys_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val v0 = IncrementalMinHash.merge(spark, state, b1, batchKey = Some("b0"))
    val replay = IncrementalMinHash.merge(spark, state, b1, batchKey = Some("b0"))
    assert(replay == v0, "a re-delivered key must be a no-op")
    assert(IncrementalMinHash.completeVersions(spark, state) == Seq(v0))
    val vc = IncrementalMinHash.compact(spark, state)
    assert(GenState.ingestedKeys(spark, state) == Set("b0"))
    val replay2 = IncrementalMinHash.merge(spark, state, b1, batchKey = Some("b0"))
    assert(replay2 == vc, "a key re-delivered AFTER compaction must still be a no-op")
    assert(IncrementalMinHash.completeVersions(spark, state) == Seq(vc))
  }

  test("a legacy state without probe manifests reads as its single-writer history") {
    val state = graft.util.TmpDirs.scratch("graft_mhmw_legacy_").toString
    IncrementalMinHash.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalMinHash.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    val want = clustersSorted(IncrementalMinHash.clusters(spark, state))
    val f = GenState.fs(spark, state)
    Seq(0, 1).foreach(v =>
      f.delete(new org.apache.hadoop.fs.Path(s"$state/v$v/_PROBED"), false))
    // the default (everything below me was probed) matches the sequential
    // history, so nothing reconciles and the serve is unchanged
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) == want)
    assert(clustersSorted(IncrementalMinHash.clusters(spark, state)) ==
      oneShotOf(docs, "legacy"))
  }
}
