package graft

import org.apache.spark.sql.functions._

import graft.ops.{GenState, IncrementalSubstring}

/** Multi-writer ingest on the exact-substring d20 family — round 17's
  * `_PROBED` pattern on the POSITIONAL modality. Spans are per-pair facts
  * (no label machinery), so the repair is the d33 shape: the cross HITS of
  * two concurrent commits are recomputed at read from the frozen anchor
  * generations and unioned in; the occurrence cap needs nothing — occ
  * partials are per-batch facts whose fold is a commutative sum, and a
  * merge-side cold filter that saw a subset of history only keeps MORE
  * candidates, which the read-side FINAL-count cap drops exactly.
  */
class SubstringMultiWriterSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  private def spansSorted(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.toString).toSeq

  private def oneShotOf(df: org.apache.spark.sql.DataFrame, tag: String) = {
    val fresh = graft.util.TmpDirs.scratch(s"graft_smw_oneshot_${tag}_").toString
    IncrementalSubstring.merge(spark, fresh, df)
    spansSorted(IncrementalSubstring.spans(spark, fresh))
  }

  test("two genuinely concurrent merges both commit; spans equal the one-shot; compact durable") {
    val state = graft.util.TmpDirs.scratch("graft_smw_conc_").toString
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
    def writer(half: Int) = new Thread(() => {
      start.await()
      results.add(
        try Right(IncrementalSubstring.merge(spark, state,
          docs.where(pmod(col("doc_id"), lit(2)) === half), Some(s"c$half")))
        catch { case t: Throwable => Left(t) })
    })
    val ts = Seq(writer(0), writer(1))
    ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(240000))
    val out = results.toArray(Array.empty[Either[Throwable, Int]]).toSeq
    assert(out.size == 2 && out.forall(_.isRight),
      s"both concurrent d20 merges must commit: $out")
    assert(out.collect { case Right(v) => v }.toSet.size == 2)
    val want = oneShotOf(docs, "conc")
    assert(want.nonEmpty, "sf0.001 should contain shared spans")
    assert(spansSorted(IncrementalSubstring.spans(spark, state)) == want,
      "concurrent d20 ingest must serve exactly the one-shot spans")
    val v = IncrementalSubstring.compact(spark, state)
    assert(IncrementalSubstring.completeVersions(spark, state) == Seq(v))
    assert(GenState.readProbed(spark, state, v) == Some(Set(v)),
      "the compacted generation must have nothing left to reconcile")
    assert(spansSorted(IncrementalSubstring.spans(spark, state)) == want)
    assert(GenState.ingestedKeys(spark, state, "hits") == Set("c0", "c1"))
  }

  test("reconciliation recovers the cross hits two concurrent commits both missed") {
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val state = graft.util.TmpDirs.scratch("graft_smw_recon_").toString
    IncrementalSubstring.merge(spark, state, b1)
    IncrementalSubstring.merge(spark, state, b2)
    // doctor v1 into the image of a merge that never saw v0: within-batch
    // hits + a self-only probe manifest, from a sibling dir that really
    // ran the blind history (occ/anchors/docs are batch-pure — identical
    // either way — so only hits and the manifest need transplanting)
    val solo = graft.util.TmpDirs.scratch("graft_smw_recon_solo_").toString
    IncrementalSubstring.merge(spark, solo, b2)
    spark.read.parquet(s"$solo/v0/hits")
      .write.mode("overwrite").parquet(s"$state/v1/hits")
    val f = GenState.fs(spark, state)
    val out = f.create(new org.apache.hadoop.fs.Path(s"$state/v1/_PROBED"), true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
    // precondition: no cross-parity hit is stored anywhere
    val crossStored = spark.read.parquet(s"$state/v0/hits", s"$state/v1/hits")
      .where(pmod(col("d1"), lit(2)) =!= pmod(col("d2"), lit(2))).count()
    assert(crossStored == 0, "cross hits must be missing from storage")
    val want = oneShotOf(docs, "recon")
    assert(spansSorted(IncrementalSubstring.spans(spark, state)) == want,
      "the read must reconcile the missing cross hits")
    // d27 removal consumes the same reconciled runs
    val removal = IncrementalSubstring.removal(spark, sf0001, state)
    val fresh = graft.util.TmpDirs.scratch("graft_smw_recon_rm_").toString
    IncrementalSubstring.merge(spark, fresh, docs)
    assert(spansSorted(removal) ==
      spansSorted(IncrementalSubstring.removal(spark, sf0001, fresh)),
      "span removal must see the reconciled hit set")
    // compact makes it durable
    val v = IncrementalSubstring.compact(spark, state)
    assert(GenState.readProbed(spark, state, v) == Some(Set(v)))
    assert(spansSorted(IncrementalSubstring.spans(spark, state)) == want)
  }

  test("tombstones compose with reconciliation") {
    import spark.implicits._
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val state = graft.util.TmpDirs.scratch("graft_smw_tomb_").toString
    IncrementalSubstring.merge(spark, state, b1)
    IncrementalSubstring.merge(spark, state, b2)
    val solo = graft.util.TmpDirs.scratch("graft_smw_tomb_solo_").toString
    IncrementalSubstring.merge(spark, solo, b2)
    spark.read.parquet(s"$solo/v0/hits")
      .write.mode("overwrite").parquet(s"$state/v1/hits")
    val f = GenState.fs(spark, state)
    val out = f.create(new org.apache.hadoop.fs.Path(s"$state/v1/_PROBED"), true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
    IncrementalSubstring.delete(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id")))
    // the one-shot over survivors: NOTE the occurrence cap deliberately
    // keeps counting deleted docs (the d32 monotone-occurrence contract),
    // so the oracle is the incremental state's own sequential twin —
    // merge survivors' batches sequentially, then the same delete
    val seq = graft.util.TmpDirs.scratch("graft_smw_tomb_seq_").toString
    IncrementalSubstring.merge(spark, seq, b1)
    IncrementalSubstring.merge(spark, seq, b2)
    IncrementalSubstring.delete(spark, seq,
      docs.where(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id")))
    val want = spansSorted(IncrementalSubstring.spans(spark, seq))
    assert(spansSorted(IncrementalSubstring.spans(spark, state)) == want,
      "reconciled + tombstoned d20 serve must equal the sequential twin")
    val v = IncrementalSubstring.compact(spark, state)
    assert(spansSorted(IncrementalSubstring.spans(spark, state)) == want)
    assert(spark.read.parquet(s"$state/v$v/anchors")
      .where(pmod(col("doc_id"), lit(7)) === 0).count() == 0,
      "compact must purge deleted docs' anchors")
  }

  test("re-delivered batch keys are exactly-once under fresh allocation, surviving compaction") {
    val state = graft.util.TmpDirs.scratch("graft_smw_keys_").toString
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val v0 = IncrementalSubstring.merge(spark, state, b1, Some("b0"))
    assert(IncrementalSubstring.merge(spark, state, b1, Some("b0")) == v0)
    assert(IncrementalSubstring.completeVersions(spark, state) == Seq(v0))
    val vc = IncrementalSubstring.compact(spark, state)
    assert(GenState.ingestedKeys(spark, state, "hits") == Set("b0"))
    assert(IncrementalSubstring.merge(spark, state, b1, Some("b0")) == vc,
      "a key re-delivered AFTER compaction must still be a no-op")
  }

  test("a legacy state without probe manifests reads as its single-writer history") {
    val state = graft.util.TmpDirs.scratch("graft_smw_legacy_").toString
    IncrementalSubstring.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalSubstring.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    val want = spansSorted(IncrementalSubstring.spans(spark, state))
    val f = GenState.fs(spark, state)
    Seq(0, 1).foreach(v =>
      f.delete(new org.apache.hadoop.fs.Path(s"$state/v$v/_PROBED"), false))
    assert(spansSorted(IncrementalSubstring.spans(spark, state)) == want)
    assert(want == oneShotOf(docs, "legacy"))
  }
}
