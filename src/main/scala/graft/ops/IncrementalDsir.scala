package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c12: incremental DSIR — the data-SELECTION model joins the generational
  * state family. The insight is the same one that made d18/t18 write-only:
  * everything c11 needs downstream of feature extraction derives from the
  * slim per-doc bucket count table `(doc_id, source, b, cnt)`, and counts
  * are a commutative monoid over disjoint doc batches. So:
  *
  *   - **ingest** runs the expensive text pass ([[Corpus.dsirCounts]]) on
  *     the BATCH only and appends the result as a generation — write-only,
  *     O(|batch|), zero read amplification; feature extraction runs once
  *     per document ever;
  *   - **select** folds the live generations (a union of slim counts) and
  *     runs c11's cheap half ([[Corpus.dsirSelectFromCounts]]): model
  *     sums, frozen integer weights, integer-dot scores, top-N. The
  *     selection is corpus-GLOBAL by nature (new raw counts shift every
  *     weight), but re-selection after an ingest costs a slim-state scan
  *     plus a 256-row model fit — never a corpus text re-read. That is
  *     the production shape for CONTINUOUS data selection: ingest daily,
  *     re-select on demand.
  *
  * Split-ingest-then-select is identical to c11's one-shot for ANY batch
  * split (count associativity; the weight table is a pure function of the
  * summed counts) — c12 shares c11's oracle. Batch-key markers give
  * exactly-once ingest under at-least-once re-delivery (re-appending a
  * count generation would double every affected bucket), the d18
  * protocol verbatim.
  */
object IncrementalDsir {

  private val commitTable = "counts"

  def completeVersions(spark: SparkSession, stateDir: String): Seq[Int] =
    GenState.completeVersions(spark, stateDir, commitTable)

  def latestVersion(spark: SparkSession, stateDir: String): Option[Int] =
    GenState.latestVersion(spark, stateDir, commitTable)

  private def countsPath(stateDir: String, v: Int) = s"$stateDir/v$v/counts"

  /** Ingest one batch (doc_ids disjoint from prior ingests): one text
    * pass over the batch, one slim generation append. Both target
    * (benchmark-source) and raw docs land in the same table — the select
    * side splits them, so a mixed micro-batch needs no routing.
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
    batchKey.foreach(GenState.writeIngestMarker(spark, stateDir, next, _, claim, commitTable))
    GenState.assertWritable(spark, stateDir, next, claim, commitTable)
    Corpus.dsirCounts(newDocs)
      .write.mode("overwrite").parquet(countsPath(stateDir, next))
    next
  }

  /** The folded count state: a plain union of the live generations
    * (per-doc rows are disjoint across generations, so no re-aggregation
    * is needed to read).
    */
  def counts(spark: SparkSession, stateDir: String): DataFrame = {
    val versions = completeVersions(spark, stateDir)
    require(versions.nonEmpty, s"IncrementalDsir: no state at $stateDir")
    spark.read.parquet(versions.map(countsPath(stateDir, _)): _*)
  }

  /** c11's selection over the accumulated state — equals the one-shot
    * [[Corpus.importanceSelect]] on the union of all ingested batches.
    */
  def select(spark: SparkSession, stateDir: String): DataFrame =
    Corpus.dsirSelectFromCounts(spark, counts(spark, stateDir))

  /** Fold the live generations into one (pure concatenation — rows are
    * already disjoint; the win is directory count and file count, the
    * LSM read-amplification bound).
    */
  def compact(spark: SparkSession, stateDir: String): Int = {
    val versions = completeVersions(spark, stateDir)
    require(versions.nonEmpty, s"IncrementalDsir.compact: no state at $stateDir")
    val leftovers = GenState.foldedLeftovers(spark, stateDir, commitTable)
    val next = versions.last + 1
    val claim = GenState.claimGeneration(spark, stateDir, next, commitTable)
    val folded = spark.read.parquet(versions.map(countsPath(stateDir, _)): _*)
    GenState.writeCompactManifest(spark, stateDir, next, versions, claim, commitTable)
    GenState.copyIngestMarkers(spark, stateDir, versions, next, claim, commitTable)
    GenState.assertWritable(spark, stateDir, next, claim, commitTable)
    folded.write.mode("overwrite").parquet(countsPath(stateDir, next))
    GenState.deleteVersions(spark, stateDir, versions ++ leftovers)
    next
  }

  /** [[GenState.maybeCompact]] policy over [[compact]]. */
  def maybeCompact(spark: SparkSession, stateDir: String, maxLive: Int): Option[Int] =
    GenState.maybeCompact(spark, stateDir, maxLive, commitTable)(compact(spark, stateDir))
}
