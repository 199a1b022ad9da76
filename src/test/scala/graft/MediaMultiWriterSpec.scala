package graft

import org.apache.spark.sql.functions._

import graft.ops.{GenState, IncrementalMedia, Png}

/** Multi-writer ingest on the media chassis — the first probe-at-merge
  * family to shed the single-writer contract. The invariant under test:
  * for ANY interleaving of concurrent merges, the served pair table
  * equals the one-shot recompute — sequential histories carry every pair
  * in stored generations, and genuinely-concurrent commits (neither
  * probed the other, per the `_PROBED` manifests) have their missing
  * cross pairs RECONCILED at read time and made durable at compact.
  */
class MediaMultiWriterSpec extends SparkSpec {

  private def fixtureMedia = spark.read.format("binaryFile").load(Png.pngFixtureDir)
    .select(substring_index(col("path"), "/", -1).as("name"), col("content"))

  private val goldenPairs = Seq(
    ("imga.png", "imga_bright.png", 2),
    ("imga.png", "imga_recode.png", 0),
    ("imga_bright.png", "imga_recode.png", 2))

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq

  test("two genuinely concurrent merges both commit; served pairs equal the one-shot") {
    val state = graft.util.TmpDirs.scratch("graft_mw_conc_").toString
    val media = fixtureMedia
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
    def writer(pred: org.apache.spark.sql.Column) = new Thread(() => {
      start.await()
      results.add(
        try Right(IncrementalMedia.merge(spark, state, media.where(pred),
          codec = "png-dhash"))
        catch { case e: Throwable => Left(e) })
    })
    val t1 = writer(!col("name").contains("_"))
    val t2 = writer(col("name").contains("_"))
    t1.start(); t2.start(); start.countDown(); t1.join(); t2.join()
    val out = results.toArray(Array.empty[Either[Throwable, Int]]).toSeq
    assert(out.forall(_.isRight), s"a concurrent merge aborted: $out")
    assert(out.collect { case Right(v) => v }.toSet.size == 2,
      "the two merges must land in distinct generations")
    // whatever the interleaving (one probed the other, or neither did),
    // the served pairs are the one-shot golden set
    assert(collectPairs(IncrementalMedia.pairs(spark, state)) == goldenPairs)
    // ...and compact folds + reconciles durably into one generation
    val v = IncrementalMedia.compact(spark, state)
    assert(IncrementalMedia.completeVersions(spark, state) == Seq(v))
    assert(GenState.readProbed(spark, state, v) == Some(Set(v)),
      "the compacted generation must have nothing left to reconcile")
    assert(collectPairs(IncrementalMedia.pairs(spark, state)) == goldenPairs)
  }

  test("four concurrent writers over a generated corpus: recall equals the one-shot") {
    import graft.tools.MediaCorpus
    val corpus = "/tmp/graft_mw_corpus_ppm_60"
    val planted = MediaCorpus.generate(spark, corpus, "ppm", 60, seed = 19L)
    assert(planted.nonEmpty)
    val media = spark.read.format("binaryFile").load(corpus)
      .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      .where(!col("name").startsWith("_"))
    val oneShot = graft.ops.Multimodal.ppmNearDup(spark, corpus)
      .select("name1", "name2").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val state = graft.util.TmpDirs.scratch("graft_mw_four_").toString
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Int]]()
    val threads = (0 until 4).map { k =>
      new Thread(() => {
        start.await()
        results.add(
          try Right(IncrementalMedia.merge(spark, state,
            media.where(pmod(xxhash64(col("name")), lit(4)) === k)))
          catch { case e: Throwable => Left(e) })
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    val out = results.toArray(Array.empty[Either[Throwable, Int]]).toSeq
    assert(out.forall(_.isRight), s"a concurrent merge aborted: $out")
    assert(out.collect { case Right(v) => v }.toSet.size == 4)
    val served = IncrementalMedia.pairs(spark, state)
      .select("name1", "name2").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(served == oneShot,
      s"4-writer serve diverged from the one-shot: missing ${(oneShot -- served).take(5)}, " +
        s"extra ${(served -- oneShot).take(5)}")
    assert(planted.forall(p => served.contains((p.name1, p.name2))),
      "planted recall must hold under concurrent ingest")
    // compact folds + reconciles durably; the serve is unchanged
    IncrementalMedia.compact(spark, state)
    val afterCompact = IncrementalMedia.pairs(spark, state)
      .select("name1", "name2").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(afterCompact == oneShot)
  }

  /** The deterministic image of a concurrent commit: doctor generation 1
    * into exactly what a merge that never saw generation 0 would have
    * written — a self-only probe manifest and within-batch-only pairs.
    */
  private def doctorConcurrent(state: String): Unit = {
    val copySigs = spark.read.parquet(s"$state/v1/sigs")
    IncrementalMedia.candidatePairs(copySigs, copySigs, 3)
      .write.mode("overwrite").parquet(s"$state/v1/pairs")
    val f = GenState.fs(spark, state)
    val out = f.create(new org.apache.hadoop.fs.Path(s"$state/v1/_PROBED"), true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
  }

  test("reconciliation recovers the cross pairs two concurrent commits both missed") {
    val state = graft.util.TmpDirs.scratch("graft_mw_recon_").toString
    val media = fixtureMedia
    IncrementalMedia.merge(spark, state, media.where(!col("name").contains("_")),
      codec = "png-dhash")
    IncrementalMedia.merge(spark, state, media.where(col("name").contains("_")),
      codec = "png-dhash")
    doctorConcurrent(state)
    // stored generations now carry ONLY within-batch pairs — the golden
    // cross pairs (imga×bright, imga×recode) exist nowhere on disk
    val stored = spark.read.parquet(s"$state/v0/pairs", s"$state/v1/pairs")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!stored.contains(("imga.png", "imga_bright.png")),
      "precondition: the cross pair must be missing from storage")
    // the read reconciles them back
    assert(collectPairs(IncrementalMedia.pairs(spark, state)) == goldenPairs)
    // compact makes it durable: one generation, stored pairs == golden
    val v = IncrementalMedia.compact(spark, state)
    assert(collectPairs(spark.read.parquet(s"$state/v$v/pairs")
      .orderBy(col("name1"), col("name2"))) == goldenPairs)
  }

  test("tombstones shadow reconciled pairs exactly like stored ones") {
    import spark.implicits._
    val state = graft.util.TmpDirs.scratch("graft_mw_tomb_").toString
    val media = fixtureMedia
    IncrementalMedia.merge(spark, state, media.where(!col("name").contains("_")),
      codec = "png-dhash")
    IncrementalMedia.merge(spark, state, media.where(col("name").contains("_")),
      codec = "png-dhash")
    doctorConcurrent(state)
    graft.ops.Deletes.tombstone(spark, state, "png", Seq("imga.png").toDF("name"))
    assert(collectPairs(IncrementalMedia.pairs(spark, state)) ==
      goldenPairs.filterNot(p => p._1 == "imga.png" || p._2 == "imga.png"))
    // purge: the deleted name never resurfaces through reconciliation
    val v = graft.ops.Deletes.purge(spark, state, "png", Seq("imga.png").toDF("name"))
    val sigNames = spark.read.parquet(s"$state/v$v/sigs")
      .select("name").as[String].collect().toSet
    assert(!sigNames.contains("imga.png"))
    assert(collectPairs(IncrementalMedia.pairs(spark, state)) ==
      goldenPairs.filterNot(p => p._1 == "imga.png" || p._2 == "imga.png"))
  }

  test("a legacy state without probe manifests reads as its single-writer history") {
    val state = graft.util.TmpDirs.scratch("graft_mw_legacy_").toString
    val media = fixtureMedia
    IncrementalMedia.merge(spark, state, media.where(!col("name").contains("_")),
      codec = "png-dhash")
    IncrementalMedia.merge(spark, state, media.where(col("name").contains("_")),
      codec = "png-dhash")
    // strip the manifests: a state dir written before round 16
    val f = GenState.fs(spark, state)
    Seq(0, 1).foreach(v =>
      f.delete(new org.apache.hadoop.fs.Path(s"$state/v$v/_PROBED"), false))
    // the default (everything below me was probed) matches the sequential
    // history, so nothing reconciles and the serve is unchanged
    assert(collectPairs(IncrementalMedia.pairs(spark, state)) == goldenPairs)
  }

  test("orbit chassis: doctored-concurrent commits reconcile to the one-shot m6 pairs") {
    import graft.ops.{IncrementalRotMedia, Multimodal}
    val rotMedia = spark.read.format("binaryFile")
      .load(Multimodal.ppmRotFixtureDir)
      .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.select("name1", "name2", "hamming")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val oneShot = sorted(Multimodal.ppmRotNearDup(spark))
    val state = graft.util.TmpDirs.scratch("graft_mw_rot_").toString
    IncrementalRotMedia.merge(spark, state, rotMedia.where(!col("name").contains("_")))
    IncrementalRotMedia.merge(spark, state, rotMedia.where(col("name").contains("_")))
    // doctor gen 1 into what a concurrent merge would have written:
    // within-batch-only pairs (both direction-combos of the orbit distance
    // are computable from the batch's own sigs) and a self-only manifest
    val copySigs = spark.read.parquet(s"$state/v1/sigs")
    IncrementalRotMedia.mergePairs(copySigs, copySigs, 3)
      .write.mode("overwrite").parquet(s"$state/v1/pairs")
    val f = GenState.fs(spark, state)
    val out = f.create(new org.apache.hadoop.fs.Path(s"$state/v1/_PROBED"), true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
    // read reconciles; compact makes it durable
    assert(sorted(IncrementalRotMedia.pairs(spark, state)) == oneShot)
    val v = IncrementalRotMedia.compact(spark, state)
    assert(IncrementalRotMedia.completeVersions(spark, state) == Seq(v))
    assert(sorted(IncrementalRotMedia.pairs(spark, state)) == oneShot)
  }

  test("re-delivered batch keys are exactly-once under fresh allocation, surviving compaction") {
    val state = graft.util.TmpDirs.scratch("graft_mw_keys_").toString
    val media = fixtureMedia
    val v0 = IncrementalMedia.merge(spark, state,
      media.where(!col("name").contains("_")), codec = "png-dhash",
      batchKey = Some("b0"))
    val replay = IncrementalMedia.merge(spark, state,
      media.where(!col("name").contains("_")), codec = "png-dhash",
      batchKey = Some("b0"))
    assert(replay == v0, "a re-delivered key must be a no-op")
    assert(IncrementalMedia.completeVersions(spark, state) == Seq(v0))
    // maintenance must not erase the exactly-once ledger: the compacted
    // generation carries the folded generations' ingest markers forward
    val vc = IncrementalMedia.compact(spark, state)
    assert(GenState.ingestedKeys(spark, state, "pairs") == Set("b0"))
    val replay2 = IncrementalMedia.merge(spark, state,
      media.where(!col("name").contains("_")), codec = "png-dhash",
      batchKey = Some("b0"))
    assert(replay2 == vc, "a key re-delivered AFTER compaction must still be a no-op")
    assert(IncrementalMedia.completeVersions(spark, state) == Seq(vc))
  }
}
