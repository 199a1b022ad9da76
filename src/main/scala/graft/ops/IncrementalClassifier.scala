package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t18: INCREMENTAL classifier training — d18's write-only partial-
  * aggregate pattern applied to MODEL state instead of dedup state.
  * Naive Bayes' sufficient statistics are pure associative counts
  * ((feature, bin) × class occurrence), so training state is
  * generational the same way d18's hash partials are: each ingest
  * featurizes ONLY its batch and appends `vN/counts` =
  * (feature, v, c1, c0) — a write-only merge with zero read
  * amplification — and the served model is one re-aggregation over the
  * slim count partials. Split-training is therefore bit-identical to
  * t17's one-shot training for ANY batch split (associativity +
  * commutativity of sums; t17's oracle gates it end to end), and the
  * streaming surface (q61) drives the same merge from foreachBatch —
  * online learning as aggregation, no parameter server in sight.
  *
  * Re-delivery: count partials DOUBLE on a re-merged batch (the d18
  * hazard, not the pair-graph one), so the merge takes the d18 batch-key
  * ingest markers — a keyed re-merge is a no-op, markers survive
  * compaction.
  *
  * Scale shape: count state is O(features × bins) per generation
  * (40 rows + 1 class row here) regardless of corpus size — the entire
  * model history for a 100 TB corpus fits in kilobytes; scoring is one
  * featurize pass over the corpus with the re-aggregated counts
  * broadcast back.
  */
object IncrementalClassifier {

  private val commitTable = "counts"

  def completeVersions(spark: SparkSession, stateDir: String): Seq[Int] =
    GenState.completeVersions(spark, stateDir, commitTable)

  def latestVersion(spark: SparkSession, stateDir: String): Option[Int] =
    GenState.latestVersion(spark, stateDir, commitTable)

  private def countsPath(stateDir: String, v: Int) = s"$stateDir/v$v/counts"

  /** Ingest one raw (doc_id, text, source, …) batch: featurize, count,
    * append — write-only. `batchKey` gives d18-style exactly-once ingest
    * under at-least-once re-delivery.
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
    TextAnalysis.nbCounts(TextAnalysis.qualityFeatures(newDocs))
      .write.mode("overwrite").parquet(countsPath(stateDir, next))
    next
  }

  /** The trained model from the current state: one re-aggregation over
    * the unioned count partials — (feature, v) sums.
    */
  def modelCounts(spark: SparkSession, stateDir: String): DataFrame = {
    val versions = completeVersions(spark, stateDir)
    require(versions.nonEmpty, s"IncrementalClassifier.modelCounts: no state at $stateDir")
    spark.read.parquet(versions.map(countsPath(stateDir, _)): _*)
      .groupBy(col("feature"), col("v"))
      .agg(sum(col("c1")).as("c1"), sum(col("c0")).as("c0"))
  }

  /** Score `docs` with the incrementally-trained model — t17's output
    * shape, bit-identical to t17 when the ingested batches partition the
    * same corpus.
    */
  def classify(spark: SparkSession, stateDir: String, docs: DataFrame): DataFrame =
    TextAnalysis.nbClassify(TextAnalysis.qualityFeatures(docs),
      modelCounts(spark, stateDir))

  /** Fold the live count partials into ONE re-aggregated generation —
    * the model returns to 41 rows; markers travel with the fold.
    */
  def compact(spark: SparkSession, stateDir: String): Int = {
    val versions = completeVersions(spark, stateDir)
    require(versions.nonEmpty, s"IncrementalClassifier.compact: no state at $stateDir")
    val leftovers = GenState.foldedLeftovers(spark, stateDir, commitTable)
    val next = versions.last + 1
    val claim = GenState.claimGeneration(spark, stateDir, next, commitTable)
    val folded = spark.read.parquet(versions.map(countsPath(stateDir, _)): _*)
      .groupBy(col("feature"), col("v"))
      .agg(sum(col("c1")).as("c1"), sum(col("c0")).as("c0"))
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
