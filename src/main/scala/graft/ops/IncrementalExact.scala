package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Text.normalized

/** d18: incremental EXACT dedup — the workhorse modality (sha256 of
  * normalized text, d1) gains the generational state path the fuzzy
  * modalities got in d12/d15/d14, and it is the cheapest of the four
  * because the d1 aggregate is ASSOCIATIVE: each generation stores only
  * its batch's partial aggregate `vN/hashes` = (h, keeper, n_copies),
  * and the corpus-wide answer is one re-aggregation over the slim
  * partials (min of keepers, sum of counts).
  *
  * That associativity makes ingest WRITE-ONLY: a merge hashes its batch
  * and appends a generation — it never reads prior state at all (no
  * probe join, no CC), so daily-ingest cost is O(|batch|) with zero read
  * amplification on the write path. Reads union the live generations
  * (O(live) dirs — [[maybeCompact]] bounds it), and
  * split-ingest-then-read is hash-identical to d1's one-shot aggregate
  * for ANY batch split, by associativity + commutativity of (min, sum).
  *
  * Commit marker is `hashes/_SUCCESS` itself (single-table generations);
  * compaction reuses the `_COMPACTED` manifest protocol, folding the
  * partials WITH re-aggregation so the index shrinks to one row per
  * distinct content.
  */
object IncrementalExact {

  private val commitTable = "hashes"

  def completeVersions(spark: SparkSession, stateDir: String): Seq[Int] =
    GenState.completeVersions(spark, stateDir, commitTable)

  def latestVersion(spark: SparkSession, stateDir: String): Option[Int] =
    GenState.latestVersion(spark, stateDir, commitTable)

  private def hashesPath(stateDir: String, v: Int) = s"$stateDir/v$v/hashes"

  /** The d1 partial aggregate of one batch. */
  private def partialOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), sha2(normalized(col("text")).cast("binary"), 256).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))

  /** Ingest `newDocs` (doc_ids disjoint from prior ingests): WRITE-ONLY —
    * hashes the batch, partial-aggregates it, appends a generation.
    * Returns the generation number holding the batch.
    *
    * `batchKey` makes the ingest IDEMPOTENT under at-least-once
    * re-delivery (the q54/q57 foreachBatch crash window): unlike the
    * pair-graph modalities — where a re-merged batch's duplicate pairs
    * dedup away in CC — re-appending a partial aggregate would double
    * `n_copies`. A keyed merge whose key a complete generation already
    * records is a no-op; the marker commits atomically with the
    * generation ([[GenState.writeIngestMarker]] writes it into the vN dir
    * BEFORE `hashes/_SUCCESS`, and only complete generations count), so
    * every crash point resolves to exactly-once ingest. The membership
    * probe is an O(live generations) file listing — the write path stays
    * read-free of parquet DATA; streaming callers should pass the
    * foreachBatch batch id.
    */
  def merge(spark: SparkSession, stateDir: String, newDocs: DataFrame,
      batchKey: Option[String] = None): Int = {
    val live = latestVersion(spark, stateDir)
    batchKey.foreach { k =>
      if (GenState.ingestedKeys(spark, stateDir, commitTable).contains(k))
        return live.get // already ingested: re-delivery is a no-op
    }
    val next = live.map(_ + 1).getOrElse(0)
    val claim = GenState.claimGeneration(spark, stateDir, next, commitTable)
    batchKey.foreach(GenState.writeIngestMarker(spark, stateDir, next, _))
    GenState.assertClaimed(spark, stateDir, next, claim)
    partialOf(newDocs).write.mode("overwrite").parquet(hashesPath(stateDir, next))
    next
  }

  /** The corpus-wide d1 result from the current state: one re-aggregation
    * over the unioned slim partials.
    */
  def dedup(spark: SparkSession, stateDir: String): DataFrame = {
    val versions = completeVersions(spark, stateDir)
    if (versions.isEmpty) {
      import spark.implicits._
      return Seq.empty[(String, Long, Long)].toDF("h", "keeper", "n_copies")
    }
    spark.read.parquet(versions.map(hashesPath(stateDir, _)): _*)
      .groupBy(col("h"))
      .agg(min(col("keeper")).as("keeper"), sum(col("n_copies")).as("n_copies"))
      .orderBy(col("keeper"))
  }

  /** Fold the live partials into ONE re-aggregated generation (the index
    * returns to one row per distinct content); `_COMPACTED` manifest
    * before the commit, crash-idempotent as in d12.
    */
  def compact(spark: SparkSession, stateDir: String): Int = {
    val versions = completeVersions(spark, stateDir)
    require(versions.nonEmpty, s"IncrementalExact.compact: no state at $stateDir")
    val leftovers = GenState.foldedLeftovers(spark, stateDir, commitTable)
    val next = versions.last + 1
    val claim = GenState.claimGeneration(spark, stateDir, next, commitTable)
    val folded = spark.read.parquet(versions.map(hashesPath(stateDir, _)): _*)
      .groupBy(col("h"))
      .agg(min(col("keeper")).as("keeper"), sum(col("n_copies")).as("n_copies"))
    // manifest BEFORE the commit write: _COMPACTED must exist whenever the
    // compacted generation is complete. (The single-table layout writes
    // the manifest first, then the table whose _SUCCESS commits.)
    GenState.writeCompactManifest(spark, stateDir, next, versions)
    // markers travel with the fold: a re-delivered batch key must stay a
    // no-op even after its generation was compacted away
    GenState.copyIngestMarkers(spark, stateDir, versions, next)
    GenState.assertClaimed(spark, stateDir, next, claim)
    folded.write.mode("overwrite").parquet(hashesPath(stateDir, next))
    GenState.deleteVersions(spark, stateDir, versions ++ leftovers)
    next
  }

  /** [[GenState.maybeCompact]] policy over [[compact]]. */
  def maybeCompact(spark: SparkSession, stateDir: String, maxLive: Int): Option[Int] =
    GenState.maybeCompact(spark, stateDir, maxLive, commitTable)(compact(spark, stateDir))
}
