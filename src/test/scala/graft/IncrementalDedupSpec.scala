package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, IncrementalDedup}

/** d12: incremental state merge must be EXACT (hash-identical to the full
  * recompute on the union, for any batch split) and must touch the old
  * corpus only through its persisted band index — never re-reading or
  * re-signing old documents.
  */
class IncrementalDedupSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  private def clustersSorted(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "cluster_id", "cluster_size", "is_keeper")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("split-ingest-then-merge equals d7's full recompute on the union") {
    val state = graft.util.TmpDirs.scratch("graft_d12_t1_").toString
    assert(IncrementalDedup.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(5)) =!= 0)) == 0)
    assert(IncrementalDedup.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(5)) === 0)) == 1)
    val inc = clustersSorted(IncrementalDedup.clusters(spark, state))
    val full = clustersSorted(Dedup.dupClusters(spark, sf0001))
    assert(inc == full)
  }

  test("three-batch ingest (different split) also equals the full recompute") {
    val state = graft.util.TmpDirs.scratch("graft_d12_t2_").toString
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 0))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 1))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 2))
    assert(IncrementalDedup.latestVersion(spark, state).contains(2))
    val inc = clustersSorted(IncrementalDedup.clusters(spark, state))
    val full = clustersSorted(Dedup.dupClusters(spark, sf0001))
    assert(inc == full)
  }

  test("merge jobs: new batch signed once; pair job reads old docs ONLY via the band index") {
    val state = graft.util.TmpDirs.scratch("graft_d12_t3_").toString
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))

    // the band-WRITE job of batch 2, exactly as merge builds it: one
    // simhash pass over the new batch only
    val batch2 = docs.where(pmod(col("doc_id"), lit(5)) === 0)
    val signPlan = Dedup.halfBandsOf(Dedup.signedDocs(batch2))
      .queryExecution.optimizedPlan.toString
    assert("simhash32".r.findAllIn(signPlan).size == 1,
      s"batch signing should contain exactly one simhash pass:\n$signPlan")

    // the PAIR job, exactly as merge builds it (new bands read back from
    // the generation dir, old bands from persisted generations): no
    // simhash anywhere, no documents scan anywhere — the old corpus
    // enters only as parquet band scans
    val newDir = graft.util.TmpDirs.scratch("graft_d12_t3_bands_").toString
    Dedup.halfBandsOf(Dedup.signedDocs(batch2)).write.mode("overwrite").parquet(newDir)
    val newBands = spark.read.parquet(newDir)
    val fullIndex = spark.read.parquet(s"$state/v0/bands", newDir)
    val pairs = IncrementalDedup.batchPairs(
      newBands.select(col("doc_id"), col("sigint")).distinct(), fullIndex, 3)
    // executedPlan: FileScan nodes render their Location, so the scan
    // SOURCES (band dirs vs document text) are visible
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("simhash32"),
      s"pair job re-signs documents:\n$plan")
    assert(!plan.contains("documents"),
      s"pair job re-reads document text:\n$plan")
    assert(plan.contains("bands"),
      s"pair job does not read the persisted band index:\n$plan")
  }

  test("compaction folds generations, preserves the labeling, and merges keep working") {
    val state = graft.util.TmpDirs.scratch("graft_d12_t5_").toString
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 0))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 1))
    val before = clustersSorted(IncrementalDedup.clusters(spark, state))
    val v = IncrementalDedup.compact(spark, state)
    assert(IncrementalDedup.completeVersions(spark, state) == Seq(v),
      "compaction must leave exactly one generation")
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) == before,
      "compaction changed the labeling")
    // a further ingest on the compacted (non-contiguous) state still
    // reaches full-recompute parity
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 2))
    val inc = clustersSorted(IncrementalDedup.clusters(spark, state))
    val full = clustersSorted(Dedup.dupClusters(spark, sf0001))
    assert(inc == full)
  }

  test("crash between compact's commit and its deletes: manifest keeps recovery idempotent") {
    val state = graft.util.TmpDirs.scratch("graft_d12_t6_").toString
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 0))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 1))
    val before = clustersSorted(IncrementalDedup.clusters(spark, state))

    // replay compact's exact write sequence but CRASH before the deletes:
    // fold v0+v1 into v2, manifest, commit labels — leave v0/v1 on disk
    val claim = graft.ops.GenState.claimGeneration(spark, state, 2)
    spark.read.parquet(s"$state/v0/bands", s"$state/v1/bands")
      .write.mode("overwrite").parquet(s"$state/v2/bands")
    graft.ops.GenState.writeCompactManifest(spark, state, 2, Seq(0, 1), claim)
    graft.ops.LabelState.foldedSnapshot(spark, state, Seq(0, 1), 2)
      .write.mode("overwrite").parquet(s"$state/v2/labels")

    // the folded sources are complete on disk but NOT live: no duplicated
    // band rows ever enter a union (read amplification stays 1)
    assert(IncrementalDedup.completeVersions(spark, state) == Seq(2),
      "manifest-folded generations leaked back into the live set")
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) == before)

    // further ingest works and stays exact…
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(3)) === 2))
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) ==
      clustersSorted(Dedup.dupClusters(spark, sf0001)))

    // …and the next compact makes the crash leftovers sweep-eligible —
    // physically deleted once the reader-grace horizon passes (round 17:
    // folded sources linger one store TTL so racing snapshots never lose
    // files mid-scan; the forced sweep is the grace-expired equivalent)
    val v = IncrementalDedup.compact(spark, state)
    assert(IncrementalDedup.completeVersions(spark, state) == Seq(v))
    graft.ops.GenState.sweepLeftovers(spark, state, "labels", graceMs = 0L)
    val f = graft.ops.GenState.fs(spark, state)
    for (old <- Seq(0, 1, 2, 3)) {
      assert(!f.exists(new org.apache.hadoop.fs.Path(s"$state/v$old")),
        s"compact left the folded v$old on disk")
    }
  }

  test("64-bit width dial (d19): split-ingest equals CC over the one-shot d17 graph; width pinned") {
    // one-shot twin: CC over simhashPairs64
    val pairs = Dedup.simhashPairs64(spark, sf0001).select(col("d1"), col("d2"))
    val ckpt = graft.ops.ConnectedComponents.durable(spark,
      graft.util.TmpDirs.sessionCheckpointDir(spark))
    val labels = graft.ops.ConnectedComponents.labelPropagation(pairs, 50, ckpt)
      .map(_._1)
      .getOrElse(graft.ops.ConnectedComponents.starContraction(pairs, ckpt = ckpt)._1)
    val full = clustersSorted(
      Dedup.clustersOf(labels).withColumnRenamed("label", "cluster_id"))
    assert(full.nonEmpty, "sf0.001 should contain 64-bit near-dup clusters")
    val state = graft.util.TmpDirs.scratch("graft_d19_t_").toString
    IncrementalDedup.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(3)) === 0), width = 64)
    IncrementalDedup.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(3)) === 1), width = 64)
    IncrementalDedup.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(3)) === 2), width = 64)
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) == full)
    // the signature WIDTH is part of the pinned regime: a 32-bit merge
    // into 64-bit state must be refused
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.merge(spark, state, docs.where(col("doc_id") < 3), width = 32)
    }
    assert(e.getMessage.contains("width"))
  }

  test("merge parameters are pinned per state dir (mixed regimes refused)") {
    val state = graft.util.TmpDirs.scratch("graft_d12_t7_").toString
    IncrementalDedup.merge(spark, state, docs.where(col("doc_id") < 10), maxHamming = 3)
    val e = intercept[IllegalArgumentException] {
      IncrementalDedup.merge(spark, state,
        docs.where(col("doc_id") >= 10 && col("doc_id") < 20), maxHamming = 2)
    }
    assert(e.getMessage.contains("maxHamming"))

    val estate = graft.util.TmpDirs.scratch("graft_d14_t7_").toString
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    graft.ops.IncrementalEmbedding.merge(spark, estate,
      vecs.where(col("vec_id") < 10), threshold = 0.4)
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.IncrementalEmbedding.merge(spark, estate,
        vecs.where(col("vec_id") >= 10 && col("vec_id") < 20), threshold = 0.5)
    }
    assert(e2.getMessage.contains("threshold"))
  }

  test("embedding twin (d14): split-ingest equals d11's full recompute, any split") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val full = graft.ops.Similarity.embeddingDupClusters(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    for (mod <- Seq(2, 3)) {
      val state = graft.util.TmpDirs.scratch(s"graft_d14_t_${mod}_").toString
      (0 until mod).foreach { r =>
        graft.ops.IncrementalEmbedding.merge(spark, state,
          vecs.where(pmod(col("vec_id"), lit(mod)) === r))
      }
      val inc = graft.ops.IncrementalEmbedding.clusters(spark, state)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(inc == full, s"$mod-way split-ingest diverged from the one-shot clustering")
    }
  }

  test("embedding twin (d14): compact folds vecs, preserves labels, later merges stay exact") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val state = graft.util.TmpDirs.scratch("graft_d14_cpt_").toString
    graft.ops.IncrementalEmbedding.merge(spark, state,
      vecs.where(pmod(col("vec_id"), lit(3)) === 0))
    graft.ops.IncrementalEmbedding.merge(spark, state,
      vecs.where(pmod(col("vec_id"), lit(3)) === 1))
    val before = graft.ops.IncrementalEmbedding.clusters(spark, state)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val v = graft.ops.IncrementalEmbedding.compact(spark, state)
    assert(graft.ops.IncrementalEmbedding.completeVersions(spark, state) == Seq(v))
    assert(graft.ops.IncrementalEmbedding.clusters(spark, state)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == before)
    // folded float vectors verify bit-identically: post-compact ingest
    // still equals the one-shot recompute
    graft.ops.IncrementalEmbedding.merge(spark, state,
      vecs.where(pmod(col("vec_id"), lit(3)) === 2))
    val full = graft.ops.Similarity.embeddingDupClusters(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(graft.ops.IncrementalEmbedding.clusters(spark, state)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == full)
  }

  test("maybeCompact policy: triggers only past maxLive, result unchanged") {
    val state = graft.util.TmpDirs.scratch("graft_d12_policy_").toString
    (0 until 3).foreach(r => IncrementalDedup.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(3)) === r)))
    val before = clustersSorted(IncrementalDedup.clusters(spark, state))
    // 3 live generations: maxLive=4 is under threshold — no fold
    assert(IncrementalDedup.maybeCompact(spark, state, maxLive = 4).isEmpty)
    assert(IncrementalDedup.completeVersions(spark, state).size == 3)
    // maxLive=2 exceeded — folds to one generation, labeling unchanged
    val v = IncrementalDedup.maybeCompact(spark, state, maxLive = 2)
    assert(v.nonEmpty)
    assert(IncrementalDedup.completeVersions(spark, state) == Seq(v.get))
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) == before)
    // and is now idempotent at that threshold
    assert(IncrementalDedup.maybeCompact(spark, state, maxLive = 2).isEmpty)
  }

  test("pair-free batch fast path: labels carried forward verbatim, all modalities") {
    val state = graft.util.TmpDirs.scratch("graft_d12_ff_").toString
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    val before = clustersSorted(IncrementalDedup.clusters(spark, state))
    IncrementalDedup.merge(spark, state, docs.where(lit(false)))
    assert(IncrementalDedup.latestVersion(spark, state).contains(2))
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) == before)

    val mstate = graft.util.TmpDirs.scratch("graft_d15_ff_").toString
    graft.ops.IncrementalMinHash.merge(spark, mstate, docs)
    val mbefore = graft.ops.IncrementalMinHash.clusters(spark, mstate)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    graft.ops.IncrementalMinHash.merge(spark, mstate, docs.where(lit(false)))
    assert(graft.ops.IncrementalMinHash.clusters(spark, mstate)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == mbefore)

    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val estate = graft.util.TmpDirs.scratch("graft_d14_ff_").toString
    graft.ops.IncrementalEmbedding.merge(spark, estate, vecs)
    val ebefore = graft.ops.IncrementalEmbedding.clusters(spark, estate)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    graft.ops.IncrementalEmbedding.merge(spark, estate, vecs.where(lit(false)))
    assert(graft.ops.IncrementalEmbedding.clusters(spark, estate)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == ebefore)
  }

  test("empty prior state: first merge is the initial build; no-dup batch is fine") {
    val state = graft.util.TmpDirs.scratch("graft_d12_t4_").toString
    assert(IncrementalDedup.latestVersion(spark, state).isEmpty)
    assert(IncrementalDedup.stateLabels(spark, state).count() == 0)
    // a batch with no near-dup pairs at all still commits a generation
    IncrementalDedup.merge(spark, state, docs.where(col("doc_id") === 0))
    assert(IncrementalDedup.latestVersion(spark, state).contains(0))
  }

  // one-shot d7 clustering over an arbitrary surviving subset: materialize
  // the survivors as a scratch corpus dir and run the one-shot job on it
  private def oneShotOver(surviving: org.apache.spark.sql.DataFrame) = {
    val dir = graft.util.TmpDirs.scratch("graft_d29_oneshot_").toString
    surviving.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    clustersSorted(Dedup.dupClusters(spark, dir))
  }

  test("d29 delete: tombstoned clustering == one-shot d7 over the survivors") {
    val state = graft.util.TmpDirs.scratch("graft_d29_del_").toString
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    for (mod <- Seq(7, 3)) {
      val state2 = graft.util.TmpDirs.scratch(s"graft_d29_del_${mod}_").toString
      IncrementalDedup.merge(spark, state2, docs.where(pmod(col("doc_id"), lit(2)) === 0))
      IncrementalDedup.merge(spark, state2, docs.where(pmod(col("doc_id"), lit(2)) === 1))
      IncrementalDedup.delete(spark, state2,
        docs.where(pmod(col("doc_id"), lit(mod)) === 0).select(col("doc_id")))
      assert(clustersSorted(IncrementalDedup.clusters(spark, state2)) ==
        oneShotOver(docs.where(pmod(col("doc_id"), lit(mod)) =!= 0)),
        s"mod-$mod delete diverged from the survivors' one-shot clustering")
    }
  }

  test("d29 split: deleting a bridge doc splits its component (handcrafted state)") {
    // a 3-chain 1—2—3 where 2 is the only bridge: deleting 2 must split
    // the component into two singletons, which leave the clustering
    // entirely — the case no row-level label shadowing can get right
    import spark.implicits._
    val state = graft.util.TmpDirs.scratch("graft_d29_bridge_").toString
    Seq((1L, 0, 0L), (2L, 0, 0L), (3L, 0, 0L)).toDF("doc_id", "band", "half")
      .write.parquet(s"$state/v0/bands")
    Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2").write.parquet(s"$state/v0/pairs")
    Seq((1L, 1L, 0), (2L, 1L, 0), (3L, 1L, 0)).toDF("node", "label", "gen")
      .write.parquet(s"$state/v0/labels")
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)).map(_.head) ==
      Seq(1L, 2L, 3L))
    IncrementalDedup.delete(spark, state, Seq(2L).toDF("doc_id"))
    assert(IncrementalDedup.clusters(spark, state).count() == 0,
      "bridge deletion must dissolve the chain into unclustered singletons")
    // a 4-chain 1—2—3—4 loses 2: {3,4} survives as a pair, 1 is a singleton
    val state2 = graft.util.TmpDirs.scratch("graft_d29_chain4_").toString
    Seq((1L, 0, 0L), (2L, 0, 0L), (3L, 0, 0L), (4L, 0, 0L))
      .toDF("doc_id", "band", "half").write.parquet(s"$state2/v0/bands")
    Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("d1", "d2")
      .write.parquet(s"$state2/v0/pairs")
    Seq((1L, 1L, 0), (2L, 1L, 0), (3L, 1L, 0), (4L, 1L, 0))
      .toDF("node", "label", "gen").write.parquet(s"$state2/v0/labels")
    IncrementalDedup.delete(spark, state2, Seq(2L).toDF("doc_id"))
    assert(clustersSorted(IncrementalDedup.clusters(spark, state2)) ==
      Seq(Seq(3L, 3L, 2L, 1), Seq(4L, 3L, 2L, 0)),
      "4-chain minus its bridge must re-label {3,4} with min-id 3 and drop 1")
  }

  test("d30 embedding delete: == one-shot clustering over surviving vectors; compact purges") {
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    def oneShotSurviving(mods: Seq[Int]) = {
      val dead = (id: org.apache.spark.sql.Column) =>
        mods.map(m => pmod(id, lit(7)) === m).reduce(_ || _)
      val pairs = graft.ops.Similarity.embeddingNearDupPairs(spark, sf0001)
        .where(!dead(col("v1")) && !dead(col("v2")))
        .select(col("v1"), col("v2"))
      val labels = graft.ops.ConnectedComponents.adaptiveMinLabels(spark, pairs)
      Dedup.clustersOf(labels).withColumnRenamed("doc_id", "vec_id")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    }
    val state = graft.util.TmpDirs.scratch("graft_d30_del_").toString
    graft.ops.IncrementalEmbedding.merge(spark, state,
      vecs.where(pmod(col("vec_id"), lit(2)) === 0))
    graft.ops.IncrementalEmbedding.merge(spark, state,
      vecs.where(pmod(col("vec_id"), lit(2)) === 1))
    graft.ops.IncrementalEmbedding.delete(spark, state,
      vecs.where(pmod(col("vec_id"), lit(7)) === 0).select(col("vec_id")))
    def served = graft.ops.IncrementalEmbedding.clusters(spark, state)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(served == oneShotSurviving(Seq(0)))
    val v = graft.ops.IncrementalEmbedding.compact(spark, state)
    val f = graft.ops.GenState.fs(spark, state)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$state/v$v/tombstones")))
    assert(spark.read.parquet(s"$state/v$v/vecs")
      .where(pmod(col("vec_id"), lit(7)) === 0).count() == 0,
      "purged vecs still hold deleted vectors")
    assert(served == oneShotSurviving(Seq(0)))
    graft.ops.IncrementalEmbedding.delete(spark, state,
      vecs.where(pmod(col("vec_id"), lit(7)) === 1).select(col("vec_id")))
    assert(served == oneShotSurviving(Seq(0, 1)),
      "delete after compact diverged — pairs retention broken")
  }

  test("d29 re-ingest after delete is LIVE again (s9 shadowing semantics)") {
    val state = graft.util.TmpDirs.scratch("graft_d29_reing_").toString
    IncrementalDedup.merge(spark, state, docs)
    IncrementalDedup.delete(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id")))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(7)) === 0))
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) ==
      clustersSorted(Dedup.dupClusters(spark, sf0001)),
      "re-ingested docs must rejoin their clusters after their tombstone")
  }

  test("delete-then-re-ingest-then-compact: pre-delete rows leave disk (per-generation purge)") {
    // the r14 purge rule ([[LabelState.purgeByGen]]): a tombstone shadows
    // rows of generations OLDER than itself even when the id was
    // re-ingested later — without it, a delete-then-re-ingest retained
    // the doc's PRE-delete band rows through maintenance, doubling its
    // index footprint forever
    val state = graft.util.TmpDirs.scratch("graft_d29_reingpurge_").toString
    IncrementalDedup.merge(spark, state, docs)
    IncrementalDedup.delete(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id")))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(7)) === 0))
    val v = IncrementalDedup.compact(spark, state)
    // the folded band index holds each doc's rows exactly ONCE: the
    // re-ingested copies (identical content → identical rows) survive,
    // the pre-delete copies were purged — equal-row duplicates would
    // betray retention
    val bands = spark.read.parquet(s"$state/v$v/bands")
    assert(bands.count() == bands.distinct().count(),
      "pre-delete band rows survived compaction for re-ingested docs")
    // and the re-ingested docs are fully live: clustering == one-shot
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) ==
      clustersSorted(Dedup.dupClusters(spark, sf0001)))
    // same certification for the pair table (per-gen purge + doc-level
    // exclusion — [[LabelState.purgePairsByGen]])
    val pairs = spark.read.parquet(s"$state/v$v/pairs")
    assert(pairs.count() == pairs.distinct().count(),
      "duplicate pair rows survived compaction")
  }

  test("d29 compact purges tombstones physically; deletes survive and compose with maintenance") {
    val state = graft.util.TmpDirs.scratch("graft_d29_purge_").toString
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    IncrementalDedup.delete(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 0).select(col("doc_id")))
    val before = clustersSorted(IncrementalDedup.clusters(spark, state))
    val v = IncrementalDedup.compact(spark, state)
    assert(IncrementalDedup.completeVersions(spark, state) == Seq(v))
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) == before)
    val f = graft.ops.GenState.fs(spark, state)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$state/v$v/tombstones")),
      "compacted generation must not carry tombstones")
    // purge certification: no deleted doc left in bands OR pairs
    assert(spark.read.parquet(s"$state/v$v/bands")
      .where(pmod(col("doc_id"), lit(7)) === 0).count() == 0,
      "purged band index still holds deleted docs")
    val pairsLeft = spark.read.parquet(s"$state/v$v/pairs")
      .where(pmod(col("d1"), lit(7)) === 0 || pmod(col("d2"), lit(7)) === 0).count()
    assert(pairsLeft == 0, s"purged pair table still holds $pairsLeft deleted-incident edges")
    // pairs retention through compact: a FURTHER delete still works
    IncrementalDedup.delete(spark, state,
      docs.where(pmod(col("doc_id"), lit(7)) === 1).select(col("doc_id")))
    assert(clustersSorted(IncrementalDedup.clusters(spark, state)) ==
      oneShotOver(docs.where(
        pmod(col("doc_id"), lit(7)) =!= 0 && pmod(col("doc_id"), lit(7)) =!= 1)),
      "delete after compact diverged — pairs retention broken")
  }
}
