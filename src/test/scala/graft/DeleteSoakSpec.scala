package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{IncrementalCard, IncrementalExact, IncrementalTopK, TextAnalysis}

/** Randomized (seed-pinned) SOAK over the delete protocol: a scripted
  * interleaving of merge / tombstone / re-ingest / no-op-delete /
  * compact steps on a tiny synthetic corpus, with the served state
  * checked against a survivors-only one-shot after EVERY step — for both
  * the subtractive modality (exact, d28) and the count-distinct one
  * (card, t26). Hand-written scenarios pin each transition once; the
  * soak pins their COMPOSITIONS (delete after compact after re-ingest
  * after delete …), which is where shadowing protocols historically rot.
  */
class DeleteSoakSpec extends SparkSpec {

  // 40 base docs over 12 distinct texts: every hash group has 2-5
  // members, so deletes routinely reassign keepers and sometimes empty a
  // group — the interesting transitions
  private val texts = (0 until 12).map(i => s"soak document body number ${i % 12} content")
  private def docRow(id: Long) =
    (id, texts((id % texts.size).toInt), "en", "web", texts((id % texts.size).toInt).length.toLong)

  private def toDf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(docRow).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def sortedRows(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.toString).toSeq

  private def oneShotExact(live: Seq[Long]) = sortedRows(
    toDf(live)
      .select(col("doc_id"),
        sha2(graft.ops.Text.normalized(col("text")).cast("binary"), 256).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies")))

  private def oneShotCard(live: Seq[Long]) =
    sortedRows(TextAnalysis.cardOf(TextAnalysis.cardDocStats(toDf(live))))

  // the soak corpus has ~17 distinct tokens, all high-frequency, so a
  // 64-capacity sketch tracks exactly and a top-5 is always provable
  private def oneShotTopK(live: Seq[Long]) = sortedRows(
    toDf(live)
      .select(explode(graft.ops.Text.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(5))

  // extra soak seeds opt-in (e.g. GRAFT_SOAK_SEEDS=1,2,3 for a longer
  // hunt); the default single seed keeps the suite fast while the walk
  // machinery stays exercised on every run. The step-mix RICHNESS guard
  // (enough delete/revive events) is asserted strictly only for the
  // pinned default seeds — an arbitrary hunt seed may legitimately draw
  // a tamer walk, and its step-level correctness checks still ran.
  private def soakSeeds(default: Int): Seq[(Int, Boolean)] =
    sys.env.get("GRAFT_SOAK_SEEDS")
      .map(_.split(',').toSeq.map(s => (s.trim.toInt, false)))
      .getOrElse(Seq((default, true)))

  test("soak: random merge/delete/re-ingest/compact interleavings stay exact on the subtractive modalities") {
    soakSeeds(42).foreach { case (s, strict) => subtractiveWalk(s, strict) }
  }

  private def subtractiveWalk(seed: Int, requireRich: Boolean): Unit = {
    val rnd = new scala.util.Random(seed)
    val exactState = graft.util.TmpDirs.scratch(s"graft_soak_exact_${seed}_").toString
    val cardState = graft.util.TmpDirs.scratch(s"graft_soak_card_${seed}_").toString
    val topkState = graft.util.TmpDirs.scratch(s"graft_soak_topk_${seed}_").toString

    var nextId = 0L
    var live = Seq.empty[Long]     // ids currently ingested and not deleted
    var deleted = Seq.empty[Long]  // ids currently tombstoned
    var batch = 0
    var deletes = 0
    var revivals = 0

    def mergeBoth(ids: Seq[Long]): Unit = {
      IncrementalExact.merge(spark, exactState, toDf(ids), Some(s"b$batch"))
      IncrementalCard.merge(spark, cardState, toDf(ids), Some(s"b$batch"))
      IncrementalTopK.merge(spark, topkState, toDf(ids), Some(s"b$batch"))
      batch += 1
    }
    def deleteBoth(ids: Seq[Long]): Unit = {
      import spark.implicits._
      val df = ids.toDF("doc_id")
      IncrementalExact.delete(spark, exactState, df)
      IncrementalCard.delete(spark, cardState, df)
      IncrementalTopK.delete(spark, topkState, df)
    }

    // seed state: two disjoint batches
    (0 until 2).foreach { _ =>
      val ids = (nextId until nextId + 12); nextId += 12
      live ++= ids; mergeBoth(ids)
    }

    (0 until 14).foreach { step =>
      // compact every fifth step (maintenance interleaves the walk at
      // fixed points); the other steps draw from a delete-biased mix
      if (step % 5 == 4) {
        IncrementalExact.compact(spark, exactState)
        IncrementalCard.compact(spark, cardState)
        IncrementalTopK.compact(spark, topkState)
      } else rnd.nextInt(6) match {
        case 0 => // fresh-ingest a new batch
          val n = 4 + rnd.nextInt(8)
          val ids = (nextId until nextId + n); nextId += n
          live ++= ids; mergeBoth(ids)
        case 1 | 2 if live.nonEmpty => // tombstone a random live subset
          val ids = rnd.shuffle(live).take(1 + rnd.nextInt(6))
          live = live.filterNot(ids.contains); deleted ++= ids
          deletes += 1
          deleteBoth(ids)
        case 3 | 4 if deleted.nonEmpty => // re-ingest previously-deleted ids
          val ids = rnd.shuffle(deleted).take(1 + rnd.nextInt(3))
          deleted = deleted.filterNot(ids.contains); live ++= ids
          revivals += 1
          mergeBoth(ids)
        case _ => // tombstone ids never ingested: must be a harmless no-op
          deleteBoth(Seq(900000L + step, 900001L + step))
      }
      val want = oneShotExact(live)
      assert(sortedRows(IncrementalExact.dedup(spark, exactState)) == want,
        s"exact modality diverged at soak seed $seed step $step (live=${live.sorted})")
      assert(sortedRows(IncrementalCard.serve(spark, cardState)) == oneShotCard(live),
        s"card modality diverged at soak seed $seed step $step (live=${live.sorted})")
      if (live.nonEmpty)
        assert(sortedRows(IncrementalTopK.topK(spark, topkState, topN = 5, capacity = 64)) ==
          oneShotTopK(live),
          s"topk modality diverged at soak seed $seed step $step (live=${live.sorted})")
    }
    // the walk must actually have exercised deletion and revival (with
    // seed 42 it does both several times — every delete also happened to
    // be fully revived later, which is why this counts EVENTS, not the
    // end-state tombstone set)
    if (requireRich) assert(deletes >= 2 && revivals >= 1,
      s"soak seed $seed too tame (deletes=$deletes revivals=$revivals) — widen the step mix")
  }

  test("soak: the pair-graph modality (component re-label) survives the same interleavings") {
    // seed 7's walk is the one that caught the delete-revive-delete
    // revival bug (newest-tombstone-per-node) — keep it as the default
    soakSeeds(7).foreach { case (s, strict) => pairGraphWalk(s, strict) }
  }

  private def pairGraphWalk(seed: Int, requireRich: Boolean): Unit = {
    // the third delete mechanism — tombstones re-label affected
    // components over surviving stored edges — soaked with identical-text
    // duplicate groups (SimHash distance 0), checked after every step
    // against the one-shot clustering of the survivors
    import graft.ops.{Dedup, IncrementalDedup}
    val rnd = new scala.util.Random(seed)
    val state = graft.util.TmpDirs.scratch(s"graft_soak_cluster_${seed}_").toString
    var nextId = 0L
    var live = Seq.empty[Long]
    var deleted = Seq.empty[Long]
    var deletes = 0
    var revivals = 0

    def oneShot(ids: Seq[Long]) = {
      val dir = graft.util.TmpDirs.scratch("graft_soak_oneshot_").toString
      toDf(ids).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      sortedRows(Dedup.dupClusters(spark, dir)
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"), col("is_keeper")))
    }
    def served() = sortedRows(IncrementalDedup.clusters(spark, state)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"), col("is_keeper")))

    val seedIds = (nextId until nextId + 16); nextId += 16
    live ++= seedIds
    IncrementalDedup.merge(spark, state, toDf(seedIds))

    (0 until 10).foreach { step =>
      if (step % 5 == 4) IncrementalDedup.compact(spark, state)
      else rnd.nextInt(6) match {
        case 0 =>
          val n = 4 + rnd.nextInt(6)
          val ids = (nextId until nextId + n); nextId += n
          live ++= ids
          IncrementalDedup.merge(spark, state, toDf(ids))
        case 1 | 2 if live.nonEmpty =>
          val ids = rnd.shuffle(live).take(1 + rnd.nextInt(5))
          live = live.filterNot(ids.contains); deleted ++= ids; deletes += 1
          IncrementalDedup.delete(spark, state, toDf(ids).select(col("doc_id")))
        case 3 | 4 if deleted.nonEmpty =>
          val ids = rnd.shuffle(deleted).take(1 + rnd.nextInt(3))
          deleted = deleted.filterNot(ids.contains); live ++= ids; revivals += 1
          IncrementalDedup.merge(spark, state, toDf(ids))
        case _ =>
          IncrementalDedup.delete(spark, state,
            toDf(Seq(900000L + step)).select(col("doc_id")))
      }
      assert(served() == oneShot(live),
        s"cluster modality diverged at soak seed $seed step $step (live=${live.sorted})")
    }
    if (requireRich) assert(deletes >= 2 && revivals >= 1,
      s"cluster soak seed $seed too tame (deletes=$deletes revivals=$revivals)")
  }
}
