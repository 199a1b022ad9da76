package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d15: incremental MinHash-LSH dedup-state merge — the Jaccard-threshold
  * twin of [[IncrementalDedup]] (d12 covers the SimHash modality, d14 the
  * embedding one; this closes the last dedup family without an
  * incremental path). Persisted state per generation:
  *
  *   - `vN/bands`: batch N's SLIM LSH band rows (doc_id, band, bh) — the
  *     same [[Dedup.bandRowsOf]] construction the one-shot d3 join uses.
  *   - `vN/sets`: batch N's distinct-shingle sets (doc_id, sh) — the
  *     verification payload, persisted so old TEXT is never re-read and
  *     old docs never re-shingled.
  *   - `vN/labels`: batch N's label DELTA ([[LabelState]] — the current
  *     labeling is the latest-wins fold); its `_SUCCESS` commits the
  *     generation.
  *
  * A merge shingles and signs ONLY the new batch, finds candidates by
  * exact (band, band-hash) equality of the new rows against the union of
  * persisted band generations (band equality is a deterministic function
  * of the document and symmetric, so probing just the new side yields
  * every new-new and new-old candidate and by construction never an
  * old-old one), verifies with the same rounded exact-Jaccard threshold
  * d3 uses — shingle sets joined back BY KEY only for surviving candidate
  * pairs — and runs seeded CC with the previous labeling as star edges.
  * The pair graph after n ingests is therefore identical to the one-shot
  * d3 graph over the union, and min-label CC is associative over
  * components, so the incremental clustering is hash-identical to a full
  * recompute for ANY batch split (the oracle replays d3 + reachability).
  *
  * Scale shape: per-ingest write volume is O(|batch|); the candidate join
  * carries 3 slim columns; shingle payloads cross the wire once per
  * corpus row (hash-partitioned key join), not once per candidate; CC
  * work scales with the new edge set (old components arrive as
  * pre-contracted stars). Read amplification over generations is handled
  * the LSM way — [[compact]] folds live generations back to one.
  */
object IncrementalMinHash {

  def completeVersions(spark: SparkSession, stateDir: String): Seq[Int] =
    GenState.completeVersions(spark, stateDir)

  def latestVersion(spark: SparkSession, stateDir: String): Option[Int] =
    GenState.latestVersion(spark, stateDir)

  private def bandsPath(stateDir: String, v: Int) = s"$stateDir/v$v/bands"
  private def setsPath(stateDir: String, v: Int) = s"$stateDir/v$v/sets"
  private def labelsPath(stateDir: String, v: Int) = s"$stateDir/v$v/labels"
  private def pairsPath(stateDir: String, v: Int) = s"$stateDir/v$v/pairs"

  /** Slim candidate pairs of one merge: the new batch's band rows against
    * the full persisted index on exact (band, bh) equality — both
    * orientations of a new-old pair admitted, then normalized and
    * deduplicated. Lazy — [[merge]] executes it; the plan spec inspects
    * that no shingle payload enters this subtree.
    */
  private[graft] def candidatePairs(newBands: DataFrame, fullIndex: DataFrame): DataFrame =
    newBands.as("a")
      .join(fullIndex.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"))
      .dropDuplicates("d1", "d2")

  /** Ingest `newDocs` (a (doc_id, text, …) projection whose doc_ids are
    * disjoint from prior ingests); returns the new generation number. The
    * first call is the initial build — same path, empty index, no seeds.
    */
  def merge(spark: SparkSession, stateDir: String, newDocs: DataFrame,
      threshold: Double = 0.8): Int = {
    // pin the verification regime across ingests (see GenState.checkConfig)
    GenState.checkConfig(spark, stateDir, Map("threshold" -> threshold.toString))
    val prev = latestVersion(spark, stateDir)
    val next = prev.map(_ + 1).getOrElse(0)
    val claim = GenState.claimGeneration(spark, stateDir, next)

    // 1. shingle + sign the new batch ONCE; the generation dirs double as
    // the materialized copies every downstream join reads (no recompute
    // of the signature job across consumers). Bands and sets land before
    // labels — a crash leaves an uncommitted generation the next merge
    // overwrites.
    val sigs = Dedup.minhashSigsOf(newDocs).repartition(col("doc_id"))
    GenState.assertWritable(spark, stateDir, next, claim)
    sigs.select(col("doc_id"), col("sh"))
      .write.mode("overwrite").parquet(setsPath(stateDir, next))
    GenState.assertWritable(spark, stateDir, next, claim)
    Dedup.bandRowsOf(
        spark.read.parquet(setsPath(stateDir, next))
          .withColumn("sig", call_function("minhash_sig", col("sh"))))
      .write.mode("overwrite").parquet(bandsPath(stateDir, next))

    // 2. candidates: new band rows vs the UNION of every complete
    // generation's bands plus the new one — old docs touched ONLY through
    // their persisted 3-column band index
    val live = completeVersions(spark, stateDir)
    val allBands = spark.read.parquet(
      (live.map(bandsPath(stateDir, _)) :+ bandsPath(stateDir, next)): _*)
    val newBands = spark.read.parquet(bandsPath(stateDir, next))
    val cand = candidatePairs(newBands, allBands)

    // 3. verify surviving candidates with d3's exact rounded Jaccard —
    // shingle sets joined back by key from the persisted set generations
    val sets = spark.read.parquet(
      (live.map(setsPath(stateDir, _)) :+ setsPath(stateDir, next)): _*)
    val inter = size(array_intersect(col("sh1"), col("sh2"))).cast("double")
    val jac = inter / (size(col("sh1")) + size(col("sh2")) - inter)
    val pairs = cand
      .join(sets.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
      .where(round(jac, 6) >= threshold)
      .select(col("d1"), col("d2"))

    // materialize the candidate+verify join ONCE to the generation dir
    // (crash-abandoned with the rest of vN); emptiness probe and CC read
    // the slim parquet back instead of re-executing the join (see
    // IncrementalEmbedding — the shared merge hot-path contract).
    GenState.assertWritable(spark, stateDir, next, claim)
    pairs.write.mode("overwrite").parquet(pairsPath(stateDir, next))
    val matPairs = spark.read.parquet(pairsPath(stateDir, next))

    // 4. affected-component-scoped seeded CC → this batch's label DELTA
    // (empty for a pair-free batch — the common streaming case; see
    // [[LabelState]] for the fold/delta contract all three modalities share)
    val labels = LabelState.deltaLabels(spark, stateDir, live, matPairs, next)

    // 5. commit: labels' _SUCCESS marks the generation complete
    GenState.assertWritable(spark, stateDir, next, claim)
    labels.write.mode("overwrite").parquet(labelsPath(stateDir, next))
    next
  }

  /** LSM maintenance, [[IncrementalDedup.compact]]'s shape with TWO index
    * tables: fold every live generation's bands and sets into one new
    * generation (labels carried forward unchanged), record the folded
    * sources in the `_COMPACTED` manifest BEFORE the commit, then delete
    * them plus any crash-window leftovers. Returns the new generation.
    */
  def compact(spark: SparkSession, stateDir: String): Int = {
    val versions = completeVersions(spark, stateDir)
    require(versions.nonEmpty, s"IncrementalMinHash.compact: no state at $stateDir")
    val leftovers = GenState.foldedLeftovers(spark, stateDir)
    val next = versions.last + 1
    val claim = GenState.claimGeneration(spark, stateDir, next)
    // tombstones applied PHYSICALLY at the fold, per-GENERATION
    // ([[LabelState.purgeByGen]]): pre-delete rows leave disk even for
    // re-ingested ids — the d29 purge protocol without the re-ingest
    // retention hole. Tombstone-free state keeps the multi-path scans.
    val hasTombs = LabelState.tombstoneVersions(spark, stateDir, versions).nonEmpty
    def tombs = LabelState.tombstonesByGen(spark, stateDir, versions)
    def foldTable(path: Int => String): DataFrame =
      if (!hasTombs) spark.read.parquet(versions.map(path): _*)
      else LabelState.purgeByGen(tombs,
        versions.map(v => (v, spark.read.parquet(path(v)))), Seq("doc_id"))
    GenState.assertWritable(spark, stateDir, next, claim)
    foldTable(bandsPath(stateDir, _))
      .write.mode("overwrite").parquet(bandsPath(stateDir, next))
    GenState.assertWritable(spark, stateDir, next, claim)
    foldTable(setsPath(stateDir, _))
      .write.mode("overwrite").parquet(setsPath(stateDir, next))
    val pairVs = versions.filter(v => GenState.fs(spark, stateDir).exists(
      new org.apache.hadoop.fs.Path(s"${pairsPath(stateDir, v)}/_SUCCESS")))
    if (pairVs == versions) {
      GenState.assertWritable(spark, stateDir, next, claim)
      (if (!hasTombs)
         spark.read.parquet(pairVs.map(pairsPath(stateDir, _)): _*)
           .select(col("d1").cast("long"), col("d2").cast("long"))
       else LabelState.purgePairsByGen(tombs,
         LabelState.effectiveTombstones(spark, stateDir, versions, "sets", "doc_id"),
         pairVs.map(v => (v, spark.read.parquet(pairsPath(stateDir, v))
           .select(col("d1").cast("long"), col("d2").cast("long")))),
         Seq("d1", "d2")))
        .dropDuplicates("d1", "d2")
        .write.mode("overwrite").parquet(pairsPath(stateDir, next))
    }
    GenState.writeCompactManifest(spark, stateDir, next, versions, claim)
    GenState.assertWritable(spark, stateDir, next, claim)
    LabelState.deletedAwareLabels(spark, stateDir, versions, "sets", "doc_id")
      .withColumn("gen", lit(next))
      .write.mode("overwrite").parquet(labelsPath(stateDir, next))
    GenState.deleteVersions(spark, stateDir, versions ++ leftovers)
    next
  }

  /** [[GenState.maybeCompact]] policy over [[compact]]. */
  def maybeCompact(spark: SparkSession, stateDir: String, maxLive: Int): Option[Int] =
    GenState.maybeCompact(spark, stateDir, maxLive)(compact(spark, stateDir))

  /** The d7-shaped cluster table from the current state (latest-wins fold
    * over the live label deltas — see [[LabelState]]).
    */
  def clusters(spark: SparkSession, stateDir: String): DataFrame =
    Dedup.clustersOf(
      LabelState.deletedAwareLabels(spark, stateDir,
        completeVersions(spark, stateDir), "sets", "doc_id"))

  /** d31: TOMBSTONE a set of documents — [[IncrementalDedup.delete]]'s
    * d29 protocol on the Jaccard modality (same shadowing semantics, same
    * affected-component re-labeling, same physical purge at [[compact]]).
    */
  def delete(spark: SparkSession, stateDir: String, ids: DataFrame): Int = {
    val live = completeVersions(spark, stateDir)
    require(live.nonEmpty, s"IncrementalMinHash.delete: no state at $stateDir")
    live.foreach(v => require(
      GenState.fs(spark, stateDir).exists(
        new org.apache.hadoop.fs.Path(s"${pairsPath(stateDir, v)}/_SUCCESS")),
      s"IncrementalMinHash.delete: generation v$v at $stateDir has no pairs " +
        "table (pre-retention layout) — rebuild the state dir first"))
    val next = live.last + 1
    val claim = GenState.claimGeneration(spark, stateDir, next)
    GenState.assertWritable(spark, stateDir, next, claim)
    ids.select(col("doc_id").cast("long").as("node")).dropDuplicates("node")
      .write.mode("overwrite").parquet(LabelState.tombsPath(stateDir, next))
    GenState.assertWritable(spark, stateDir, next, claim)
    spark.read.parquet(setsPath(stateDir, live.head)).limit(0)
      .write.mode("overwrite").parquet(setsPath(stateDir, next))
    GenState.assertWritable(spark, stateDir, next, claim)
    spark.read.parquet(bandsPath(stateDir, live.head)).limit(0)
      .write.mode("overwrite").parquet(bandsPath(stateDir, next))
    GenState.assertWritable(spark, stateDir, next, claim)
    spark.read.parquet(pairsPath(stateDir, live.head)).limit(0)
      .write.mode("overwrite").parquet(pairsPath(stateDir, next))
    GenState.assertWritable(spark, stateDir, next, claim)
    LabelState.emptyDelta(spark)
      .write.mode("overwrite").parquet(labelsPath(stateDir, next))
    next
  }
}
