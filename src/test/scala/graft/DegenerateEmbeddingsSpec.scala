package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The embedding twin of DegenerateCorpusSpec: zero-norm vectors (a
  * padding row, a failed encoder) and verbatim duplicates are facts of
  * real embedding tables, and under ANSI every unguarded cosine division
  * is a crash. Runs the whole similarity/dedup family over a corpus
  * seeded with both; the contract is no-crash plus zero-vector exclusion
  * where cosine is undefined.
  */
class DegenerateEmbeddingsSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = graft.util.TmpDirs.scratch("graft_degen_emb_").toString
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(16)((r.nextDouble() * 2 - 1).toFloat)
    }
    val rows: Seq[(Long, Seq[Float], Int)] =
      (0 until 16).map(i => (i.toLong, vec(i), 0)) ++ Seq(
        (16L, Seq.fill(16)(0.0f), 0),         // zero vector
        (17L, vec(3), 1),                     // duplicate of 3
        (18L, vec(200), 0), (19L, vec(201), 1),
        (20L, Seq.fill(16)(0.0f), 1),         // second zero vector
        (21L, vec(202), 0), (22L, vec(203), 1), (23L, vec(204), 0))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "s1_cosine" -> ((s: SparkSession, d: String) => graft.ops.Similarity.cosineTopK(s, d)),
    "s2_lsh" -> (graft.ops.Similarity.annLsh _),
    "s3_ivf" -> ((s: SparkSession, d: String) => graft.ops.Similarity.annIvf(s, d)),
    "s4_quantized" -> ((s: SparkSession, d: String) => graft.ops.Similarity.quantizedCosineTopK(s, d)),
    "s5_trained" -> ((s: SparkSession, d: String) => graft.ops.Similarity.annIvfTrained(s, d)),
    "s6_wide" -> ((s: SparkSession, d: String) =>
      graft.ops.Similarity.annIvfWide(s, d, k = 3)),
    "s10_recall" -> ((s: SparkSession, d: String) => graft.ops.Similarity.annRecallAudit(s, d)),
    "s11_pq" -> ((s: SparkSession, d: String) => graft.ops.Quantization.pqAdcTopK(s, d)),
    "s12_ivfpq" -> ((s: SparkSession, d: String) => graft.ops.Quantization.ivfPqTopK(s, d)),
    "s14_pq_recall" -> ((s: SparkSession, d: String) => graft.ops.Quantization.pqRecallAudit(s, d)),
    "d6_neardup" -> ((s: SparkSession, d: String) => graft.ops.Similarity.embeddingNearDupPairs(s, d)),
    "d11_clusters" -> ((s: SparkSession, d: String) => graft.ops.Similarity.embeddingDupClusters(s, d)),
    "d16_banded" -> ((s: SparkSession, d: String) => graft.ops.Similarity.srpBandedPairs(s, d)),
    "d22_semdedup" -> ((s: SparkSession, d: String) => graft.ops.Similarity.semDedupClusters(s, d)),
    "d14_incremental" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions.{col, lit, pmod}
      val state = graft.util.TmpDirs.scratch("graft_degen_d14_").toString
      val vecs = graft.sources.Tables.embeddings(s, d)
      graft.ops.IncrementalEmbedding.merge(s, state, vecs.where(pmod(col("vec_id"), lit(2)) === 0))
      graft.ops.IncrementalEmbedding.merge(s, state, vecs.where(pmod(col("vec_id"), lit(2)) === 1))
      graft.ops.IncrementalEmbedding.clusters(s, state)
    }))

  test("no embedding operator crashes on zero-norm vectors or duplicates") {
    val failures = ops.flatMap { case (name, fn) =>
      try { fn(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getMessage.linesIterator.next().take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("zero-norm vectors never surface where cosine is undefined") {
    val s1 = graft.ops.Similarity.cosineTopK(spark, dir).collect()
    assert(!s1.exists(r => r.getLong(2) == 16L || r.getLong(2) == 20L))
    val d6 = graft.ops.Similarity.embeddingNearDupPairs(spark, dir).collect()
    assert(!d6.exists(r => Set(16L, 20L).contains(r.getLong(0)) ||
      Set(16L, 20L).contains(r.getLong(1))))
    // the two zero vectors are byte-identical but must NOT pair: their
    // cosine is undefined, not 1.0
    val s3 = graft.ops.Similarity.annIvf(spark, dir).collect()
    assert(!s3.exists(r => Set(16L, 20L).contains(r.getLong(2))))
  }
}
