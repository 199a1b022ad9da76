package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d14: incremental EMBEDDING dedup-state merge — the semantic-space twin
  * of [[IncrementalDedup]] (d12). Persisted state per generation:
  *
  *   - `vN/vecs`: batch N's LSH index rows — (vec_id, the raw FLOAT
  *     embedding, its norm, the deterministic SRP sign bucket). Floats
  *     and doubles round-trip parquet losslessly, so verification
  *     arithmetic on reloaded vectors is bit-identical to fresh ones.
  *   - `vN/labels`: the full labeling (slim), whose `_SUCCESS` commits
  *     the generation.
  *
  * A merge buckets ONLY the new batch, finds candidate pairs by exact
  * bucket equality against the union of persisted vec generations
  * (bucket equality is a deterministic function of the vector and is
  * symmetric, so probing just the new side against the union yields
  * every new-new and new-old candidate — no recall argument needed, this
  * is set algebra), verifies with the same rounded-cosine threshold d6
  * uses, and runs seeded CC with the previous labeling as star edges.
  * Result: hash-identical to d11's one-shot recompute on the union, for
  * ANY batch split (shared oracle).
  *
  * Scale: per-ingest write volume is O(|batch|) vectors; old vectors are
  * re-read ONLY as index rows for the candidate join (unavoidable — the
  * verifier needs the vector payloads of matched candidates; the join
  * itself is bucket-partitioned so only same-bucket rows meet).
  */
object IncrementalEmbedding {

  def completeVersions(spark: SparkSession, stateDir: String): Seq[Int] =
    GenState.completeVersions(spark, stateDir)

  def latestVersion(spark: SparkSession, stateDir: String): Option[Int] =
    GenState.latestVersion(spark, stateDir)

  private def vecsPath(stateDir: String, v: Int) = s"$stateDir/v$v/vecs"
  private def labelsPath(stateDir: String, v: Int) = s"$stateDir/v$v/labels"

  /** Ingest `newVecs` (a (vec_id, embedding) projection with vec_ids
    * disjoint from prior ingests); returns the new generation number.
    */
  def merge(spark: SparkSession, stateDir: String, newVecs: DataFrame,
      threshold: Double = 0.4): Int = {
    // pin the verification regime across ingests (see GenState.checkConfig)
    GenState.checkConfig(spark, stateDir, Map("threshold" -> threshold.toString))
    val prev = latestVersion(spark, stateDir)
    val next = prev.map(_ + 1).getOrElse(0)

    // 1. index the new batch once (norm + SRP bucket) and persist it —
    // the generation dir doubles as the materialized copy the join reads
    newVecs
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", sqrt(call_function("array_dot", col("e"), col("e"))))
      .withColumn("bucket", call_function("srp_bucket", col("e")))
      .write.mode("overwrite").parquet(vecsPath(stateDir, next))
    val newIdx = spark.read.parquet(vecsPath(stateDir, next))

    // 2. candidates: new side vs the UNION of all generations' index rows
    // on exact bucket equality; verification mirrors d6 exactly (rounded
    // cosine against the threshold)
    val allPaths = completeVersions(spark, stateDir)
      .map(vecsPath(stateDir, _)) :+ vecsPath(stateDir, next)
    val fullIdx = spark.read.parquet(allPaths: _*)
    val cos = call_function("array_dot", col("a.e"), col("b.e")) /
      (col("a.nrm") * col("b.nrm"))
    val pairs = newIdx.as("a")
      .join(fullIdx.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(least(col("a.vec_id"), col("b.vec_id")).as("d1"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("d2"),
        round(cos, 6).as("cosine"))
      .where(col("cosine") >= threshold)
      .select(col("d1"), col("d2"))
      .dropDuplicates("d1", "d2")

    // 3. seeded CC: previous labeling as pre-contracted star edges
    val seeds = prev.map(v => spark.read.parquet(labelsPath(stateDir, v))
        .where(col("node") =!= col("label"))
        .select(col("node").as("d1"), col("label").as("d2")))
      .getOrElse(pairs.limit(0))
    val edges = pairs.unionByName(seeds)
    val ckpt = ConnectedComponents.durable(spark,
      graft.util.TmpDirs.sessionCheckpointDir(spark))
    val labels = ConnectedComponents.labelPropagation(edges, 50, ckpt)
      .map(_._1)
      .getOrElse(ConnectedComponents.starContraction(edges, ckpt = ckpt)._1)

    // 4. commit (labels' _SUCCESS marks the generation complete)
    labels.write.mode("overwrite").parquet(labelsPath(stateDir, next))
    next
  }

  /** The d11-shaped cluster table from the current state. */
  def clusters(spark: SparkSession, stateDir: String): DataFrame =
    latestVersion(spark, stateDir) match {
      case Some(v) =>
        Dedup.clustersOf(spark.read.parquet(labelsPath(stateDir, v)))
          .withColumnRenamed("doc_id", "vec_id")
      case None =>
        import spark.implicits._
        Seq.empty[(Long, Long, Long, Int)]
          .toDF("vec_id", "cluster_id", "cluster_size", "is_keeper")
    }
}
