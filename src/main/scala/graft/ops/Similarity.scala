package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`, 64-dim).
  *
  * Two paths, per the standard ANN playbook:
  *   - `cosineTopK`: brute-force baseline for a SMALL query set — the
  *     query side is broadcast, so cost is O(|queries| × corpus) scanned
  *     partition-parallel with no shuffle of the corpus. Correct reference
  *     answer; the per-query cost is what the LSH path then cuts.
  *   - `annLsh`: sign-random-projection LSH — 8 deterministic hyperplanes
  *     (components ±1 from md5 hex parity, so the oracle reproduces them
  *     exactly), bucket = 8 sign bits, candidates only within a bucket.
  *     At scale this is one shuffle on bucket id and per-bucket
  *     brute force over ~n/256 vectors.
  *
  * All arithmetic is forced to DOUBLE and folded in array order, so both
  * engines compute bit-identical sums (same operand sequence, IEEE 754).
  */
object Similarity {

  /** Sequential-fold dot product in double precision — the native
    * [[graft.exprs.ArrayDot]] codegen expression (same fold order as the
    * `aggregate(zip_with(...))` HOF it replaces, one compiled loop per row).
    */
  private def dot(a: Column, b: Column): Column =
    call_function("array_dot", a, b)

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))

  /** Brute-force cosine top-k for the query set `vec_id < nQueries`.
    * The filtered query side is broadcast: the corpus is scanned once,
    * never shuffled; top-k per query via window over the (small)
    * queries×corpus result.
    */
  def cosineTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val v = withNorm(Tables.embeddings(spark, dir))
    val q = v.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
    val cos = dot(col("qe"), col("e")) / (col("qn") * col("nrm"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
    v.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cos.as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("qid"), col("rnk"))
  }

  val numPlanes: Int = graft.exprs.SrpBucket.numPlanes

  /** 8-bit sign bucket of a vector under fixed ±1 hyperplanes (component
    * (p, j) = +1 when the first hex digit of md5("h<p>:<j>") is odd).
    * Native [[graft.exprs.SrpBucket]] codegen expression: the hyperplanes
    * are CONSTANTS, precomputed once — the HOF formulation recomputed 512
    * md5 calls per row for them.
    */
  def lshBucket(e: Column): Column =
    call_function("srp_bucket", e)

  /** Embedding-cosine near-duplicate pairs: candidates from LSH bucket
    * equality (same deterministic hyperplanes as [[annLsh]]), verified by
    * exact cosine >= threshold. The near-dup analog of MinHash-LSH for the
    * embedding space: one shuffle on bucket, candidate count bounded by
    * bucket geometry, never all-pairs.
    */
  def embeddingNearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val v = withNorm(Tables.embeddings(spark, dir))
      .withColumn("bucket", lshBucket(col("e")))
      .repartition(col("vec_id"))
    val b = v.select(col("vec_id").as("v2"), col("e").as("ne"),
      col("nrm").as("nn"), col("bucket").as("nb"))
    val cos = dot(col("e"), col("ne")) / (col("nrm") * col("nn"))
    v.join(b, col("bucket") === col("nb") && col("vec_id") < col("v2"))
      .select(col("vec_id").as("v1"), col("v2"), round(cos, 6).as("cosine"))
      .where(col("cosine") >= threshold)
      .orderBy(col("v1"), col("v2"))
  }

  /** ANN: nearest neighbor per vector among same-bucket candidates.
    * One shuffle (bucket equi-join); vectors alone in their bucket emit no
    * row — the recall/cost dial is `numPlanes`.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    // repartition = materialization barrier: the 8-plane bucket aggregation
    // is computed once and reused by both self-join branches.
    val v = withNorm(Tables.embeddings(spark, dir))
      .withColumn("bucket", lshBucket(col("e")))
      .repartition(col("vec_id"))
    val a = v.select(col("vec_id"), col("e"), col("nrm"), col("bucket"))
    val b = v.select(col("vec_id").as("nid"), col("e").as("ne"),
      col("nrm").as("nn"), col("bucket").as("nb"))
    val cos = dot(col("e"), col("ne")) / (col("nrm") * col("nn"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cosine").desc, col("nid"))
    a.join(b, col("bucket") === col("nb") && col("vec_id") =!= col("nid"))
      .select(col("vec_id"), col("bucket"), col("nid"), cos.as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") === 1)
      .select(col("vec_id"), col("bucket"), col("nid").as("neighbor"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy(col("vec_id"))
  }
}
