package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real corpora contain empty documents, whitespace-only documents, and
  * single-token fragments; under Spark 4's ANSI default a zero-token doc
  * turns every unguarded per-doc ratio into a job-killing
  * DIVIDE_BY_ZERO. This suite stages exactly that corpus and runs the
  * document-facing operator families end to end — the contract is "no
  * degenerate row may crash a corpus job", plus pinned scores for the
  * defined-to-be-zero cases.
  */
class DegenerateCorpusSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = graft.util.TmpDirs.scratch("graft_degen_spec_").toString
    Seq(
      (0L, "", "en", "src1", 0L),
      (1L, " ", "en", "src1", 1L),
      (2L, "one", "de", "src2", 3L),
      (3L, "two tokens", "es", "src0", 10L),
      (4L, "a a a a a a a a a a a a a a a a", "en", "src1", 31L),
      (5L, "normal looking document with several distinct tokens inside it", "fr", "src2", 62L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "t1_lang_stats" -> (graft.ops.TextAnalysis.langStats _),
    "t2_lang_id" -> (graft.ops.TextAnalysis.langId _),
    "t3_quality" -> ((s: SparkSession, d: String) => graft.ops.TextAnalysis.qualityScores(s, d)),
    "t4_fingerprints" -> (graft.ops.TextAnalysis.fingerprints _),
    "t5_token_freq" -> ((s: SparkSession, d: String) => graft.ops.TextAnalysis.tokenFreq(s, d)),
    "t6_tfidf" -> ((s: SparkSession, d: String) => graft.ops.TextAnalysis.tfidfTop(s, d)),
    "t7_pii" -> (graft.ops.TextAnalysis.redactPii _),
    "t8_surprisal" -> (graft.ops.TextAnalysis.unigramSurprisal _),
    "t9_bpeish" -> ((s: SparkSession, d: String) => graft.ops.TextAnalysis.bpeishTokens(s, d)),
    "t10_gopher" -> ((s: SparkSession, d: String) => graft.ops.TextAnalysis.gopherRules(s, d)),
    "t15_repetition" -> ((s: SparkSession, d: String) => graft.ops.TextAnalysis.repetitionProfile(s, d)),
    "t21_normalize" -> ((s: SparkSession, d: String) => graft.ops.TextAnalysis.normalizeAudit(s, d)),
    "t22_dataset_card" -> ((s: SparkSession, d: String) => graft.ops.TextAnalysis.datasetCard(s, d)),
    "d1_exact" -> (graft.ops.Dedup.exactDedup _),
    "d2_jaccard" -> ((s: SparkSession, d: String) => graft.ops.Dedup.ngramJaccardPairs(s, d)),
    "d26_span_removal" -> ((s: SparkSession, d: String) => graft.ops.Dedup.spanRemoval(s, d)),
    "c1_chunk" -> (graft.ops.Corpus.chunk _),
    "c2_sample" -> (graft.ops.Corpus.hashSample _),
    "c5_rebalance" -> ((s: SparkSession, d: String) => graft.ops.Corpus.rebalance(s, d)),
    "c13_temperature" -> ((s: SparkSession, d: String) => graft.ops.Corpus.temperatureSample(s, d)),
    "c14_export" -> ((s: SparkSession, d: String) => graft.ops.Corpus.shuffleExport(s, d)))

  test("no document-facing operator crashes on empty/whitespace/single-token docs") {
    val failures = ops.flatMap { case (name, fn) =>
      try { fn(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getMessage.linesIterator.next().take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("empty and whitespace-only docs score zero, not NaN or error") {
    val scored = graft.ops.TextAnalysis.scored(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(scored(0L) == ((0, 0.0, 0.0)))
    assert(scored(1L) == ((0, 0.0, 0.0)))
    assert(scored(5L)._1 > 0 && scored(5L)._3 > 0)
    // langStats aggregates over a group containing the empty docs
    val stats = graft.ops.TextAnalysis.langStats(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(!stats("en").isNaN)
  }
}
