package graft

import org.apache.spark.sql.functions._

import graft.ops.{GenState, IncrementalDedup, IncrementalSemantic, Similarity}

/** Multi-writer ingest on the SimHash (d12) and semantic (d23) families —
  * round 17 carries the `_PROBED` reconciliation pattern from MinHash
  * (whose MinHashMultiWriterSpec pins the shared LabelState mechanism,
  * including the engineered fold-split repair) to the remaining two
  * label-bearing probe-at-merge modalities. Invariant: for ANY
  * interleaving of concurrent merges, the served clustering equals the
  * one-shot recompute, and compact makes the reconciliation durable.
  */
class DedupMultiWriterSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)
  private def vecs = graft.sources.Tables.embeddings(spark, sf0001)

  private def clustersSorted(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.toString).toSeq

  // ---- SimHash d12 ---------------------------------------------------------

  private def simOneShot(tag: String, width: Int = 32) = {
    val fresh = graft.util.TmpDirs.scratch(s"graft_dmw_sim_oneshot_${tag}_").toString
    IncrementalDedup.merge(spark, fresh, docs, width = width)
    clustersSorted(IncrementalDedup.clusters(spark, fresh))
  }

  test("d12: two genuinely concurrent merges both commit; clusters equal the one-shot; compact durable") {
    val state = graft.util.TmpDirs.scratch("graft_dmw_sim_conc_").toString
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
    def writer(half: Int) = new Thread(() => {
      start.await()
      results.add(
        try Right(IncrementalDedup.merge(spark, state,
          docs.where(pmod(col("doc_id"), lit(2)) === half),
          batchKey = Some(s"c$half")))
        catch { case t: Throwable => Left(t) })
    })
    val ts = Seq(writer(0), writer(1))
    ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(240000))
    val out = results.toArray(Array.empty[Either[Throwable, Int]]).toSeq
    assert(out.size == 2 && out.forall(_.isRight),
      s"both concurrent d12 merges must commit: $out")
    assert(out.collect { case Right(v) => v }.toSet.size == 2)
    val want = simOneShot("conc")
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) == want,
      "concurrent d12 ingest must serve exactly the one-shot clustering")
    val v = IncrementalDedup.compact(spark, state)
    assert(IncrementalDedup.completeVersions(spark, state) == Seq(v))
    assert(GenState.readProbed(spark, state, v) == Some(Set(v)))
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) == want)
    assert(GenState.ingestedKeys(spark, state) == Set("c0", "c1"))
  }

  /** Doctor the newest generation into a blind concurrent image: tables
    * transplanted from a sibling state dir that really ran the blind
    * history, label delta re-stamped, `_PROBED` = the blind view.
    */
  private def doctorBlind(state: String, target: Int, solo: String,
      soloGen: Int, sawUpTo: Int, tables: Seq[String]): Unit = {
    for (t <- tables)
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

  test("d12: reconciliation recovers the cross pairs two concurrent commits both missed (32 and 64 bit)") {
    for (width <- Seq(32, 64)) {
      val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
      val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
      val state = graft.util.TmpDirs.scratch(s"graft_dmw_sim_recon_${width}_").toString
      IncrementalDedup.merge(spark, state, b1, width = width)
      IncrementalDedup.merge(spark, state, b2, width = width)
      val solo = graft.util.TmpDirs.scratch(s"graft_dmw_sim_solo_${width}_").toString
      IncrementalDedup.merge(spark, solo, b2, width = width)
      doctorBlind(state, target = 1, solo = solo, soloGen = 0, sawUpTo = -1,
        tables = Seq("bands", "pairs"))
      // precondition: no cross-parity pair is stored anywhere
      val crossStored = spark.read.parquet(s"$state/v0/pairs", s"$state/v1/pairs")
        .where(pmod(col("d1"), lit(2)) =!= pmod(col("d2"), lit(2))).count()
      assert(crossStored == 0, s"width $width: cross pairs must be missing from storage")
      val want = simOneShot(s"recon$width", width)
      assert(clustersSorted(IncrementalDedup.clusters(spark, state)) == want,
        s"width $width: the read must reconcile the missing cross pairs")
      val v = IncrementalDedup.compact(spark, state)
      assert(GenState.readProbed(spark, state, v) == Some(Set(v)))
      assert(clustersSorted(IncrementalDedup.clusters(spark, state)) == want)
    }
  }

  test("d12: tombstones compose with reconciliation") {
    import spark.implicits._
    val b1 = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val b2 = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val state = graft.util.TmpDirs.scratch("graft_dmw_sim_tomb_").toString
    IncrementalDedup.merge(spark, state, b1)
    IncrementalDedup.merge(spark, state, b2)
    val solo = graft.util.TmpDirs.scratch("graft_dmw_sim_tomb_solo_").toString
    IncrementalDedup.merge(spark, solo, b2)
    doctorBlind(state, target = 1, solo = solo, soloGen = 0, sawUpTo = -1,
      tables = Seq("bands", "pairs"))
    IncrementalDedup.delete(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id")))
    val survivors = docs.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val fresh = graft.util.TmpDirs.scratch("graft_dmw_sim_tomb_oneshot_").toString
    IncrementalDedup.merge(spark, fresh, survivors)
    val want = clustersSorted(IncrementalDedup.clusters(spark, fresh))
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) == want,
      "reconciled + tombstoned d12 serve must equal the survivors' one-shot")
    val v = IncrementalDedup.compact(spark, state)
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) == want)
    assert(spark.read.parquet(s"$state/v$v/bands")
      .where(pmod(col("doc_id"), lit(7)) === 0).count() == 0)
  }

  // ---- semantic d23 --------------------------------------------------------

  private lazy val modelDir = {
    val d = graft.util.TmpDirs.scratch("graft_dmw_sem_model_").toString
    Similarity.persistedIvfCentroids(spark, sf0001, d)
    d
  }

  private def cents = Similarity.persistedIvfCentroids(spark, sf0001, modelDir)

  private def semOneShot(tag: String, c: Seq[Similarity.Centroid]) = {
    val fresh = graft.util.TmpDirs.scratch(s"graft_dmw_sem_oneshot_${tag}_").toString
    IncrementalSemantic.merge(spark, fresh, c, vecs)
    clustersSorted(IncrementalSemantic.clusters(spark, fresh))
  }

  test("d23: two genuinely concurrent merges both commit; clusters equal the one-shot; compact durable") {
    val c = cents
    val state = graft.util.TmpDirs.scratch("graft_dmw_sem_conc_").toString
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
    def writer(half: Int) = new Thread(() => {
      start.await()
      results.add(
        try Right(IncrementalSemantic.merge(spark, state, c,
          vecs.where(pmod(col("vec_id"), lit(2)) === half),
          batchKey = Some(s"s$half")))
        catch { case t: Throwable => Left(t) })
    })
    val ts = Seq(writer(0), writer(1))
    ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(240000))
    val out = results.toArray(Array.empty[Either[Throwable, Int]]).toSeq
    assert(out.size == 2 && out.forall(_.isRight),
      s"both concurrent d23 merges must commit: $out")
    val want = semOneShot("conc", c)
    assert(clustersSorted(IncrementalSemantic.clusters(spark, state)) == want,
      "concurrent d23 ingest must serve exactly the one-shot clustering")
    val v = IncrementalSemantic.compact(spark, state)
    assert(IncrementalSemantic.completeVersions(spark, state) == Seq(v))
    assert(GenState.readProbed(spark, state, v) == Some(Set(v)))
    assert(clustersSorted(IncrementalSemantic.clusters(spark, state)) == want)
  }

  test("d23: reconciliation recovers the cross pairs two concurrent commits both missed") {
    val c = cents
    val b1 = vecs.where(pmod(col("vec_id"), lit(2)) === 0)
    val b2 = vecs.where(pmod(col("vec_id"), lit(2)) === 1)
    val state = graft.util.TmpDirs.scratch("graft_dmw_sem_recon_").toString
    IncrementalSemantic.merge(spark, state, c, b1)
    IncrementalSemantic.merge(spark, state, c, b2)
    val solo = graft.util.TmpDirs.scratch("graft_dmw_sem_solo_").toString
    IncrementalSemantic.merge(spark, solo, c, b2)
    doctorBlind(state, target = 1, solo = solo, soloGen = 0, sawUpTo = -1,
      tables = Seq("vecs", "pairs"))
    val crossStored = spark.read.parquet(s"$state/v0/pairs", s"$state/v1/pairs")
      .where(pmod(col("d1"), lit(2)) =!= pmod(col("d2"), lit(2))).count()
    assert(crossStored == 0, "cross pairs must be missing from storage")
    val want = semOneShot("recon", c)
    assert(clustersSorted(IncrementalSemantic.clusters(spark, state)) == want,
      "the read must reconcile the missing cross pairs")
    val v = IncrementalSemantic.compact(spark, state)
    assert(GenState.readProbed(spark, state, v) == Some(Set(v)))
    assert(clustersSorted(IncrementalSemantic.clusters(spark, state)) == want)
  }

  // ---- embedding d14 -------------------------------------------------------

  private def embOneShot(tag: String) = {
    val fresh = graft.util.TmpDirs.scratch(s"graft_dmw_emb_oneshot_${tag}_").toString
    graft.ops.IncrementalEmbedding.merge(spark, fresh, vecs)
    clustersSorted(graft.ops.IncrementalEmbedding.clusters(spark, fresh))
  }

  test("d14: two genuinely concurrent merges both commit; clusters equal the one-shot; compact durable") {
    import graft.ops.IncrementalEmbedding
    val state = graft.util.TmpDirs.scratch("graft_dmw_emb_conc_").toString
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
    def writer(half: Int) = new Thread(() => {
      start.await()
      results.add(
        try Right(IncrementalEmbedding.merge(spark, state,
          vecs.where(pmod(col("vec_id"), lit(2)) === half),
          batchKey = Some(s"e$half")))
        catch { case t: Throwable => Left(t) })
    })
    val ts = Seq(writer(0), writer(1))
    ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(240000))
    val out = results.toArray(Array.empty[Either[Throwable, Int]]).toSeq
    assert(out.size == 2 && out.forall(_.isRight),
      s"both concurrent d14 merges must commit: $out")
    val want = embOneShot("conc")
    assert(clustersSorted(IncrementalEmbedding.clusters(spark, state)) == want,
      "concurrent d14 ingest must serve exactly the one-shot clustering")
    val v = IncrementalEmbedding.compact(spark, state)
    assert(IncrementalEmbedding.completeVersions(spark, state) == Seq(v))
    assert(GenState.readProbed(spark, state, v) == Some(Set(v)))
    assert(clustersSorted(IncrementalEmbedding.clusters(spark, state)) == want)
    assert(GenState.ingestedKeys(spark, state) == Set("e0", "e1"))
  }

  test("d14: reconciliation recovers the cross pairs two concurrent commits both missed") {
    import graft.ops.IncrementalEmbedding
    val b1 = vecs.where(pmod(col("vec_id"), lit(2)) === 0)
    val b2 = vecs.where(pmod(col("vec_id"), lit(2)) === 1)
    val state = graft.util.TmpDirs.scratch("graft_dmw_emb_recon_").toString
    IncrementalEmbedding.merge(spark, state, b1)
    IncrementalEmbedding.merge(spark, state, b2)
    val solo = graft.util.TmpDirs.scratch("graft_dmw_emb_solo_").toString
    IncrementalEmbedding.merge(spark, solo, b2)
    doctorBlind(state, target = 1, solo = solo, soloGen = 0, sawUpTo = -1,
      tables = Seq("vecs", "pairs"))
    val crossStored = spark.read.parquet(s"$state/v0/pairs", s"$state/v1/pairs")
      .where(pmod(col("d1"), lit(2)) =!= pmod(col("d2"), lit(2))).count()
    assert(crossStored == 0, "cross pairs must be missing from storage")
    val want = embOneShot("recon")
    assert(clustersSorted(IncrementalEmbedding.clusters(spark, state)) == want,
      "the read must reconcile the missing cross pairs")
    val v = IncrementalEmbedding.compact(spark, state)
    assert(GenState.readProbed(spark, state, v) == Some(Set(v)))
    assert(clustersSorted(IncrementalEmbedding.clusters(spark, state)) == want)
  }

  test("legacy states without probe manifests read as their single-writer histories (both families)") {
    val simState = graft.util.TmpDirs.scratch("graft_dmw_sim_legacy_").toString
    IncrementalDedup.merge(spark, simState, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalDedup.merge(spark, simState, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    val want = clustersSorted(IncrementalDedup.clusters(spark, simState))
    val f = GenState.fs(spark, simState)
    Seq(0, 1).foreach(v =>
      f.delete(new org.apache.hadoop.fs.Path(s"$simState/v$v/_PROBED"), false))
    assert(clustersSorted(IncrementalDedup.clusters(spark, simState)) == want)
    assert(want == simOneShot("legacy"))
  }
}
