package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops._

/** Corpus-scale timing of the GDPR facade — the op a compliance team
  * actually times: build one state store per [[Deletes]] modality (all
  * eighteen since the tiff alias), then run the full right-to-be-forgotten pass (tombstone +
  * physical compact, [[Deletes.purge]] per store — exactly the loop body
  * of [[Deletes.purgeSweep]]) and print SCALE.md-ready rows.
  *
  * Two id frames drive the sweep, matching real GDPR semantics ("forget
  * entity k wherever it appears"): one numeric frame for the doc_id /
  * vec_id stores, one name frame (the union of every-100th asset name
  * from all five media corpora) for the media-chassis stores — a name
  * absent from a given store is a no-op delete there, which is the point
  * of sweeping.
  *
  * After each purge the probe ASSERTS the erasure is physical: the
  * compacted generation carries no tombstone table, and spot-checked
  * per-row tables (exact docs sidecar, media sigs) hold none of the
  * forgotten ids.
  *
  * Usage: runMain graft.tools.PurgeSweepProbe [sfDir [nMedia]]
  *   (defaults /root/testdata/sf0.1 and 10000; media corpora cache under
  *   /tmp/graft_media_<mod>_<n> via [[MediaCorpus]])
  */
object PurgeSweepProbe {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length >= 1) args(0) else "/root/testdata/sf0.1"
    val nMedia = if (args.length >= 2) args(1).toInt else 10000
    val spark = GraftSession.create("purge-sweep-probe")
    import spark.implicits._

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)

    def mediaOf(dir: String): DataFrame =
      spark.read.format("binaryFile").load(dir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
        .where(!col("name").startsWith("_"))

    val mediaDirs = Seq("ppm", "png", "tiff", "wav", "y4m").map { mod =>
      val dir = s"/tmp/graft_media_${mod}_$nMedia"
      MediaCorpus.generate(spark, dir, mod, nMedia, seed = 77L)
      mod -> dir
    }.toMap

    // frozen vector models (the ivf/semantic/ivfpq stores assign against
    // these; training is outside the timed sweep, as in production)
    val ivfModel = graft.util.TmpDirs.scratch("graft_purgeprobe_ivfmodel_").toString
    val cents = Similarity.persistedIvfCentroids(spark, sfDir, ivfModel)
    val pqModel = graft.util.TmpDirs.scratch("graft_purgeprobe_pqmodel_").toString
    IncrementalIvfPq.persistedRefVectors(spark, sfDir, pqModel)

    // one state store per facade modality, ingested from the real tables
    val builds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
      "exact" -> ((s, st) => { IncrementalExact.merge(s, st, docs); () }),
      "cluster" -> ((s, st) => { IncrementalDedup.merge(s, st, docs); () }),
      "minhash" -> ((s, st) => { IncrementalMinHash.merge(s, st, docs); () }),
      "substring" -> ((s, st) => { IncrementalSubstring.merge(s, st, docs); () }),
      "dsir" -> ((s, st) => { IncrementalDsir.merge(s, st, docs); () }),
      "classifier" -> ((s, st) => { IncrementalClassifier.merge(s, st, docs); () }),
      "card" -> ((s, st) => { IncrementalCard.merge(s, st, docs); () }),
      "topk" -> ((s, st) => { IncrementalTopK.merge(s, st, docs); () }),
      "embedding" -> ((s, st) => { IncrementalEmbedding.merge(s, st, vecs); () }),
      "semantic" -> ((s, st) => { IncrementalSemantic.merge(s, st, cents, vecs); () }),
      "ivf" -> ((s, st) => { IncrementalIvf.merge(s, st, ivfModel, vecs); () }),
      "ivfpq" -> ((s, st) => { IncrementalIvfPq.merge(s, st, pqModel, vecs); () }),
      "media" -> ((s, st) => {
        IncrementalMedia.merge(s, st, mediaOf(mediaDirs("ppm")), codec = "ppm-dhash"); () }),
      "png" -> ((s, st) => {
        IncrementalMedia.merge(s, st, mediaOf(mediaDirs("png")), codec = "png-dhash"); () }),
      "tiff" -> ((s, st) => {
        IncrementalMedia.merge(s, st, mediaOf(mediaDirs("tiff")), codec = "tiff-dhash"); () }),
      "audio" -> ((s, st) => {
        IncrementalMedia.merge(s, st, mediaOf(mediaDirs("wav")), codec = "wav-denergy"); () }),
      "video" -> ((s, st) => {
        IncrementalMedia.merge(s, st, mediaOf(mediaDirs("y4m")),
          maxHamming = 6, codec = "y4m-framehash"); () }),
      "rotmedia" -> ((s, st) => {
        IncrementalRotMedia.merge(s, st, mediaOf(mediaDirs("ppm"))); () }))
    require(builds.map(_._1).toSet == Deletes.modalities.keySet,
      s"probe stores must cover the facade exactly; missing: " +
        s"${(Deletes.modalities.keySet -- builds.map(_._1)).toSeq.sorted}")

    println("| store | ingest s | purge (tombstone+compact) s |")
    println("|---|---|---|")

    // forget 1% of entities wherever they appear
    val forgetIds = docs.select(col("doc_id"))
      .where(pmod(col("doc_id"), lit(100)) === 7)
      .union(vecs.select(col("vec_id")).where(pmod(col("vec_id"), lit(100)) === 7))
      .distinct()
    val forgetNames = mediaDirs.values.toSeq.sorted
      .map(d => mediaOf(d).select("name"))
      .reduce(_ union _)
      .where(!col("name").contains("_") &&
        pmod(xxhash64(col("name")), lit(100)) === 7)
      .distinct()

    var totalPurge = 0.0
    val results = builds.map { case (modality, build) =>
      val state = graft.util.TmpDirs.scratch(s"graft_purgeprobe_${modality}_").toString
      val (_, tIngest) = time(build(spark, state))
      val idCol = Deletes.modalities(modality)._1
      val ids = if (idCol == "name") forgetNames else forgetIds
      val (gen, tPurge) = time(Deletes.purge(spark, state, modality, ids))
      totalPurge += tPurge
      // erasure assertions: compacted gen only, tombstone-free
      val f = GenState.fs(spark, state)
      require(!f.exists(new org.apache.hadoop.fs.Path(s"$state/v$gen/tombstones")),
        s"$modality purge carried tombstones into the compacted generation")
      if (modality == "exact")
        require(spark.read.parquet(s"$state/v$gen/docs")
          .where(pmod(col("doc_id"), lit(100)) === 7).count() == 0,
          "exact purge left forgotten rows in the docs sidecar")
      if (modality == "media") {
        val survivors = spark.read.parquet(s"$state/v$gen/sigs")
          .where(pmod(xxhash64(col("name")), lit(100)) === 7 &&
            !col("name").contains("_")).count()
        require(survivors == 0, s"media purge left $survivors forgotten sigs on disk")
      }
      println(f"| $modality | $tIngest%.2f | $tPurge%.2f |")
      (modality, tIngest, tPurge)
    }

    println(f"\npurgeSweep total over ${results.size} stores: $totalPurge%.2f s " +
      s"(docs=${docs.count()}, vecs=${vecs.count()}, media=5x$nMedia assets)")
    spark.stop()
  }
}
