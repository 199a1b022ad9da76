package graft

import org.apache.spark.sql.functions._

import graft.ops.{IncrementalTopK, TextAnalysis}

/** b5/b6/q82: the incremental heavy-hitters state — split-ingest parity
  * with the one-shot b4, exactly-once re-delivery, row-level tombstone
  * deletes with revival, compaction (physical purge) invariance, and the
  * weighted Misra-Gries form's guarantee over pre-counted partials.
  */
class IncrementalTopKSpec extends SparkSpec {

  private def oneShot = TextAnalysis.heavyHitters(spark, sf0001)
    .collect().map(_.toSeq).toSeq

  private def serve(state: String) = IncrementalTopK.topK(spark, state)
    .collect().map(_.toSeq).toSeq

  test("split-ingest == one-shot b4 for any split; re-delivered batch is a no-op") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    Seq(Seq(0), Seq(0, 1), Seq(0, 1, 2)).foreach { mods =>
      val state = graft.util.TmpDirs.scratch("graft_b5_spec_").toString
      mods.foreach(m => IncrementalTopK.merge(spark, state,
        docs.where(pmod(col("doc_id"), lit(mods.size)) === m), Some(s"k$m")))
      assert(serve(state) == oneShot, s"diverged at ${mods.size}-way split")
    }
    // exactly-once: re-delivering an already-merged batch key changes nothing
    val state = graft.util.TmpDirs.scratch("graft_b5_redeliver_").toString
    IncrementalTopK.merge(spark, state, docs.where(col("doc_id") % 2 === 0), Some("k0"))
    IncrementalTopK.merge(spark, state, docs.where(col("doc_id") % 2 === 1), Some("k1"))
    IncrementalTopK.merge(spark, state, docs.where(col("doc_id") % 2 === 1), Some("k1"))
    assert(IncrementalTopK.latestVersion(spark, state).contains(1),
      "a re-delivered batch key must not append a generation")
    assert(serve(state) == oneShot)
  }

  test("weighted misra_gries over pre-counted partials keeps the heavy-hitter guarantee") {
    import spark.implicits._
    // raw stream: t_i appears 2^(11-i) times, plus 2000 singletons
    val raw = (0 until 11).flatMap(i => Seq.fill(1 << (11 - i))(s"t$i")) ++
      (0 until 2000).map(i => s"rare$i")
    val capacity = 48
    val bound = raw.size / (capacity + 1)
    val heavy = raw.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > bound).keySet
    assert(heavy.nonEmpty)
    // pre-counted form: SPLIT each token's total across two partial rows
    // (the state's shape: one row per (doc, token)) — the guarantee must
    // survive weighted folding of partials, any partitioning
    val partials = raw.groupBy(identity).toSeq.flatMap { case (t, occ) =>
      val n = occ.size.toLong
      if (n == 1) Seq((t, 1L)) else Seq((t, n / 2), (t, n - n / 2))
    }
    Seq(1, 13).foreach { parts =>
      val cands = partials.toDF("token", "n").repartition(parts)
        .agg(expr(s"misra_gries(token, n, $capacity)"))
        .collect()(0).getSeq[String](0).toSet
      assert(heavy.subsetOf(cands), s"parts=$parts: lost ${heavy -- cands}")
      assert(cands.size <= capacity)
    }
  }

  test("b6: tombstone shadows row-level, facade purge erases, re-ingest revives") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val deleted = docs.where(pmod(col("doc_id"), lit(7)) === 3)
    val survivors = docs.where(pmod(col("doc_id"), lit(7)) =!= 3)
    val sdir = graft.util.TmpDirs.scratch("graft_b6_oneshot_").toString
    survivors.write.mode("overwrite").parquet(s"$sdir/documents.parquet")
    val want = TextAnalysis.heavyHitters(spark, sdir).collect().map(_.toSeq).toSeq

    val state = graft.util.TmpDirs.scratch("graft_b6_spec_").toString
    IncrementalTopK.merge(spark, state, docs, Some("k0"))
    graft.ops.Deletes.tombstone(spark, state, "topk", deleted.select(col("doc_id")))
    assert(serve(state) == want, "post-delete serve diverged from survivors' one-shot")
    // physical erasure: after the facade purge no generation holds a
    // tombstoned doc's count rows
    graft.ops.Deletes.purge(spark, state, "topk", deleted.select(col("doc_id")))
    val live = IncrementalTopK.completeVersions(spark, state)
    val remaining = spark.read.parquet(live.map(v => s"$state/v$v/counts"): _*)
      .join(deleted.select(col("doc_id")), Seq("doc_id")).count()
    assert(remaining == 0, "purge must erase the tombstoned docs' count rows")
    assert(serve(state) == want, "compaction changed the served top-k")
    // revival: re-ingesting the deleted docs restores the full-corpus answer
    IncrementalTopK.merge(spark, state, deleted, Some("reingest"))
    assert(serve(state) == oneShot, "re-ingested docs must be live after their tombstones")
  }
}
