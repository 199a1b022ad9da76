package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, collect_list, concat, concat_ws, count, lit, pmod, sort_array, substring_index, to_json}

import graft.operators._
import graft.ops.{Corpus, Dedup, Quantization, Similarity, TextAnalysis}
import graft.pipeline.OohPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is an operator from SURVEY.md §2 (or a
  * scale-oriented extension); every entry in `oracleSql` is equivalent ANSI
  * SQL the driver runs in DuckDB over the same parquet tables. Column names
  * and row ordering match exactly on both sides.
  */
object SparkEntry {

  /** Flagship: the reference's own pipeline end-to-end (XML scan → 20-col
    * extraction → quality filter → report); driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    OohPipeline.run(spark, OohPipeline.fixturePath)

  /** Stable d10 state dir per (session, input) — see the d10 entry. */
  private val d10StateDirs = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]

  private def d10StateDir(s: SparkSession, d: String): String =
    d10StateDirs.computeIfAbsent((s, d), _ =>
      graft.util.TmpDirs.scratch("graft_d10_state_").toString)

  /** Stable s7 model dir per (session, input) — first invocation trains
    * and writes, later ones exercise the advertised reload path.
    */
  private val s7ModelDirs = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]

  private def s7ModelDir(s: SparkSession, d: String): String =
    s7ModelDirs.computeIfAbsent((s, d), _ =>
      graft.util.TmpDirs.scratch("graft_s7_model_").toString)

  /** s13's PQ codebook dir, same lifecycle as [[s7ModelDirs]]. */
  private val s13ModelDirs = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]

  private def s13ModelDir(s: SparkSession, d: String): String =
    s13ModelDirs.computeIfAbsent((s, d), _ =>
      graft.util.TmpDirs.scratch("graft_s13_model_").toString)

  /** s15's frozen reference-vector dir, same lifecycle as [[s7ModelDirs]]. */
  private val s15ModelDirs = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]

  private def s15ModelDir(s: SparkSession, d: String): String =
    s15ModelDirs.computeIfAbsent((s, d), _ =>
      graft.util.TmpDirs.scratch("graft_s15_model_").toString)

  /** t16's BPE model dir, same lifecycle as [[s7ModelDirs]]. */
  private val t16ModelDirs = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]

  private def t16ModelDir(s: SparkSession, d: String): String =
    t16ModelDirs.computeIfAbsent((s, d), _ =>
      graft.util.TmpDirs.scratch("graft_t16_model_").toString)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> Relational.q1PricingSummary _,
    "q2_selective_filter" -> Relational.q2SelectiveFilter _,
    "q3_shipping_priority" -> Relational.q3ShippingPriority _,
    "q4_order_priority" -> Relational.q4OrderPriority _,
    "q5_local_supplier" -> Relational.q5LocalSupplier _,
    "q6_topk_orders" -> Relational.q6TopkOrders _,
    "q7_window_rank" -> Relational.q7WindowRank _,
    "q8_distinct_agg" -> Relational.q8DistinctAgg _,
    "q9_setops" -> Relational.q9SetOps _,
    "q10_rollup" -> Relational.q10Rollup _,
    "q11_anti_join" -> Relational.q11AntiJoin _,
    "q12_part_agg" -> Relational.q12PartAgg _,
    "q13_events_json" -> Relational.q13EventsJson _,
    "q14_events_daily" -> Relational.q14EventsDaily _,
    "q15_asof_join" -> Relational.q15AsofJoin _,
    "q16_range_join" -> Relational.q16RangeJoin _,
    "q17_above_type_avg" -> Relational.q17AboveTypeAvg _,
    "q18_streaming_daily" -> graft.streaming.EventsStream.runDailyAvailableNow _,
    "q21_asof_skew_safe" -> AsOfJoin.eventsToOrdersSkewSafe _,
    "q22_cube" -> Relational.q22Cube _,
    "q23_percentiles" -> Relational.q23Percentiles _,
    "q24_sessions" -> graft.streaming.Sessionize.sessionsBatch _,
    "q25_window_suite" -> Relational.q25WindowSuite _,
    "q26_string_funcs" -> Relational.q26StringFuncs _,
    "q27_date_funcs" -> Relational.q27DateFuncs _,
    "q19_sql_pricing" -> graft.engine.SqlQueries.pricingSummarySql _,
    "q20_sql_brand_agg" -> graft.engine.SqlQueries.brandAggSql _,
    "m1_media_features" -> graft.ops.Multimodal.mediaFeaturesFlat _,
    "ooh_occupations" -> ((s: SparkSession, _: String) => oohOccupationsFlat(s)),
    "ooh_report" -> ((s: SparkSession, _: String) => oohReportFlat(s)),
    "d1_exact_dedup" -> Dedup.exactDedup _,
    "d2_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ngramJaccardPairs(s, d)),
    "d3_minhash_lsh" -> ((s: SparkSession, d: String) => Dedup.minhashLshPairs(s, d)),
    "d4_simhash_sig" -> Dedup.simhashSignatures _,
    "d5_simhash_pairs" -> ((s: SparkSession, d: String) => Dedup.simhashPairs(s, d)),
    // 64-bit SimHash twin (the scale dial): 4 exact 16-bit blocks, no
    // probe fan-out; stricter hamming<=3 predicate at 2^32 lower
    // collision rate.
    "d17_simhash64_pairs" -> ((s: SparkSession, d: String) => Dedup.simhashPairs64(s, d)),
    "d7_dup_clusters" -> ((s: SparkSession, d: String) => Dedup.dupClusters(s, d)),
    // Soft dedup: keep every copy with probability 1/cluster_size via the
    // exact integer accept test (no keeper join at train time).
    "d25_soft_dedup" -> ((s: SparkSession, d: String) => Dedup.softDedup(s, d)),
    "s1_cosine_topk" -> ((s: SparkSession, d: String) => Similarity.cosineTopK(s, d)),
    "s2_ann_lsh" -> Similarity.annLsh _,
    "t1_lang_stats" -> TextAnalysis.langStats _,
    "t2_lang_id" -> TextAnalysis.langId _,
    "t3_quality_scores" -> ((s: SparkSession, d: String) => TextAnalysis.qualityScores(s, d)),
    "t4_fingerprints" -> TextAnalysis.fingerprints _,
    "t5_token_freq" -> ((s: SparkSession, d: String) => TextAnalysis.tokenFreq(s, d)),
    "d6_embedding_neardup" -> ((s: SparkSession, d: String) => Similarity.embeddingNearDupPairs(s, d)),
    // Connected components over the embedding near-dup graph — the
    // semantic-space twin of d7's lexical clusters.
    "d11_embedding_clusters" -> ((s: SparkSession, d: String) => Similarity.embeddingDupClusters(s, d)),
    // Incremental EMBEDDING dedup: the d12 generational-state merge in
    // semantic space — 80/20 split-ingest must equal d11's one-shot
    // recompute (shared oracle).
    "d14_embedding_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d14_state_").toString
      val vecs = graft.sources.Tables.embeddings(s, d)
      graft.ops.IncrementalEmbedding.merge(s, state, vecs.where(pmod(col("vec_id"), lit(5)) =!= 0))
      graft.ops.IncrementalEmbedding.merge(s, state, vecs.where(pmod(col("vec_id"), lit(5)) === 0))
      graft.ops.IncrementalEmbedding.clusters(s, state)
    }),
    // SemDeDup-style semantic dedup: k-means cells (s5's trained
    // centroids), within-cell exact-cosine pairs, CC, keeper = member
    // FARTHEST from its centroid (the paper's least-prototypical rule).
    "d22_semantic_dedup" -> ((s: SparkSession, d: String) =>
      Similarity.semDedupClusters(s, d, centroids =
        Some(Similarity.persistedIvfCentroids(s, d, s7ModelDir(s, d))))),
    // Incremental semantic dedup: d22 under generational state against
    // the FROZEN s7 model (assignments persisted with the vectors);
    // 80/20 split-ingest == d22's one-shot (shared oracle).
    "d23_semantic_incremental" -> ((s: SparkSession, d: String) => {
      val cents = Similarity.persistedIvfCentroids(s, d, s7ModelDir(s, d))
      val state = graft.util.TmpDirs.scratch("graft_d23_state_").toString
      val vecs = graft.sources.Tables.embeddings(s, d)
      graft.ops.IncrementalSemantic.merge(s, state, cents,
        vecs.where(pmod(col("vec_id"), lit(5)) =!= 0))
      graft.ops.IncrementalSemantic.merge(s, state, cents,
        vecs.where(pmod(col("vec_id"), lit(5)) === 0))
      graft.ops.IncrementalSemantic.clusters(s, state)
    }),
    // d34: the d29 delete protocol on the SemDeDup modality — the model
    // stays FROZEN (trained on the full corpus), survivors re-cluster;
    // oracle = d22's replay with the survivors filter on the cells CTE
    // (training unfiltered, assignment/pairing filtered).
    "d34_semantic_delete" -> ((s: SparkSession, d: String) => {
      val cents = Similarity.persistedIvfCentroids(s, d, s7ModelDir(s, d))
      val state = graft.util.TmpDirs.scratch("graft_d34_state_").toString
      val vecs = graft.sources.Tables.embeddings(s, d)
      graft.ops.IncrementalSemantic.merge(s, state, cents,
        vecs.where(pmod(col("vec_id"), lit(5)) =!= 0))
      graft.ops.IncrementalSemantic.merge(s, state, cents,
        vecs.where(pmod(col("vec_id"), lit(5)) === 0))
      graft.ops.IncrementalSemantic.delete(s, state,
        vecs.where(pmod(col("vec_id"), lit(7)) === 3).select(col("vec_id")))
      graft.ops.IncrementalSemantic.clusters(s, state)
    }),
    // Streaming semantic dedup: the q54 chassis over d23 state with the
    // frozen model; drained clustering == one-shot d22.
    "q63_stream_semantic_dedup" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runSemanticDedupAvailableNow(s, d, s7ModelDir(s, d))),
    // Multi-band SRP near-dup pairs: 4 × 8-plane bands of ONE 32-plane
    // signature, OR-construction candidates, occupancy-capped, exact
    // cosine verify — the recall-preserving wide-signature geometry.
    "d16_srp_banded" -> ((s: SparkSession, d: String) => Similarity.srpBandedPairs(s, d)),
    "t6_tfidf" -> ((s: SparkSession, d: String) => TextAnalysis.tfidfTop(s, d)),
    "w1_rolling_fingerprint" -> ((s: SparkSession, d: String) =>
      graft.sources.Tables.documents(s, d)
        .selectExpr("doc_id", "rolling_min_hash(text) AS rolling_min")
        .orderBy("doc_id")),
    "s3_ann_ivf" -> ((s: SparkSession, d: String) => Similarity.annIvf(s, d)),
    "s5_ann_ivf_trained" -> ((s: SparkSession, d: String) => Similarity.annIvfTrained(s, d)),
    // IVF with the NATIVE ivf_probe assignment expression at 64 cells —
    // past the literal-centroid codegen ceiling (s6; plan is O(1) in k).
    "s6_ann_ivf_wide" -> ((s: SparkSession, d: String) => Similarity.annIvfWide(s, d)),
    // ANN quality monitoring: recall@k of the s3 IVF index against the
    // s1 exact top-k, per sampled query.
    "s10_ann_recall_audit" -> ((s: SparkSession, d: String) => Similarity.annRecallAudit(s, d)),
    // Product quantization (IVF-PQ's compression half): 8x16-entry
    // codebooks, 8-byte codes (32x), ADC lookup-table scoring against
    // the full-precision query.
    "s11_pq_topk" -> ((s: SparkSession, d: String) => Quantization.pqAdcTopK(s, d)),
    // IVF-PQ: probes bound WHICH vectors a query touches, codes bound
    // what each costs — the production composed index shape.
    "s12_ivf_pq" -> ((s: SparkSession, d: String) => Quantization.ivfPqTopK(s, d)),
    // Persisted PQ codebooks (model registry): derive+write once per
    // (session, input), reload as a parquet scan — must equal deriving
    // fresh exactly (s11's oracle; the s7 freeze contract for PQ).
    "s13_pq_persisted" -> ((s: SparkSession, d: String) =>
      Quantization.pqAdcTopKPersisted(s, d, s13ModelDir(s, d))),
    // PQ quality monitoring: recall@k of the ADC top-k vs the exact
    // brute force — the number that prices a PQ bit budget.
    "s14_pq_recall_audit" -> ((s: SparkSession, d: String) =>
      Quantization.pqRecallAudit(s, d)),
    // Streaming IVF-PQ ingest: the s15 encode-and-append per micro-batch;
    // drained index == one-shot s12.
    "q74_stream_ivfpq_ingest" -> ((s: SparkSession, d: String) => {
      val model = s15ModelDir(s, d)
      graft.ops.IncrementalIvfPq.persistedRefVectors(s, d, model)
      graft.streaming.DocumentsStream.runIvfPqIngestAvailableNow(s, d, model)
    }),
    // Incremental IVF-PQ: batches encoded map-side against the frozen
    // model into write-only 8-byte code generations; union query == s12.
    "s15_ivfpq_incremental" -> ((s: SparkSession, d: String) => {
      val model = s15ModelDir(s, d)
      graft.ops.IncrementalIvfPq.persistedRefVectors(s, d, model)
      val state = graft.util.TmpDirs.scratch("graft_s15_state_").toString
      val vecs = graft.sources.Tables.embeddings(s, d)
      (0 until 3).foreach(r => graft.ops.IncrementalIvfPq.merge(s, state, model,
        vecs.where(pmod(col("vec_id"), lit(3)) === r)))
      graft.ops.IncrementalIvfPq.annTopK(s, d, state, model)
    }),
    // s16: tombstone deletes over the s15 code postings — the s9 protocol
    // on the quantized index: ingest everything, tombstone vec_id ≡ 3
    // (mod 7), query the shadowed union; queries stay full-precision from
    // the corpus (ADC is asymmetric), candidates are survivors only.
    // compact() purges the deleted 8-byte code rows physically.
    "s16_ivfpq_delete" -> ((s: SparkSession, d: String) => {
      val model = s15ModelDir(s, d)
      graft.ops.IncrementalIvfPq.persistedRefVectors(s, d, model)
      val state = graft.util.TmpDirs.scratch("graft_s16_state_").toString
      val vecs = graft.sources.Tables.embeddings(s, d)
      (0 until 3).foreach(r => graft.ops.IncrementalIvfPq.merge(s, state, model,
        vecs.where(pmod(col("vec_id"), lit(3)) === r)))
      graft.ops.IncrementalIvfPq.delete(s, state,
        vecs.where(pmod(col("vec_id"), lit(7)) === 3).select(col("vec_id")))
      graft.ops.IncrementalIvfPq.annTopK(s, d, state, model)
    }),
    // Persisted trained centroids (model registry): train+write once per
    // (session, input), reload as a parquet scan after — must equal
    // training fresh exactly (s5's oracle; composes s5 x s6).
    "s7_ann_ivf_persisted" -> ((s: SparkSession, d: String) =>
      Similarity.annIvfPersisted(s, d, s7ModelDir(s, d))),
    // Incremental ANN ingest: 3-way split of the corpus assigned to the
    // FROZEN s7 model per batch (generational postings, write-only
    // ingest); the query over the union must equal s7's one-shot exactly
    // (cell assignment is a pure function of vector x frozen centroids).
    "s8_ann_ivf_incremental" -> ((s: SparkSession, d: String) => {
      val model = s7ModelDir(s, d)
      Similarity.persistedIvfCentroids(s, d, model) // train-or-load once
      val state = graft.util.TmpDirs.scratch("graft_s8_state_").toString
      val vecs = graft.sources.Tables.embeddings(s, d)
      (0 until 3).foreach(r => graft.ops.IncrementalIvf.merge(s, state, model,
        vecs.where(pmod(col("vec_id"), lit(3)) === r)))
      graft.ops.IncrementalIvf.annTopK(s, state, model)
    }),
    // s9: tombstone deletes over the s8 state — the right-to-be-forgotten
    // path: ingest everything, tombstone vec_id % 7 == 3, query the
    // shadowed union; equals the s5 search restricted to survivors (the
    // model froze before the deletes, so training replays the FULL
    // corpus). compact() applies tombstones physically.
    "s9_ann_delete" -> ((s: SparkSession, d: String) => {
      val model = s7ModelDir(s, d)
      Similarity.persistedIvfCentroids(s, d, model)
      val state = graft.util.TmpDirs.scratch("graft_s9_state_").toString
      val vecs = graft.sources.Tables.embeddings(s, d)
      (0 until 3).foreach(r => graft.ops.IncrementalIvf.merge(s, state, model,
        vecs.where(pmod(col("vec_id"), lit(3)) === r)))
      graft.ops.IncrementalIvf.delete(s, state,
        vecs.where(pmod(col("vec_id"), lit(7)) === 3).select(col("vec_id")))
      graft.ops.IncrementalIvf.annTopK(s, state, model)
    }),
    "q28_stream_hourly" -> graft.streaming.EventsStream.runHourlyAppendAvailableNow _,
    "q29_salted_join" -> graft.operators.SaltedJoin.lineitemOrdersSalted _,
    "q30_stream_dedup" -> graft.streaming.EventsStream.runDedupAvailableNow _,
    "q32_stream_funnel" -> graft.streaming.EventsStream.runFunnelJoinAvailableNow _,
    "q33_full_outer" -> Relational.q33FullOuter _,
    "s4_quantized_topk" -> ((s: SparkSession, d: String) => Similarity.quantizedCosineTopK(s, d)),
    "q34_pivot" -> Relational.q34Pivot _,
    // custom LogicalPlan + Strategy + SparkPlan operator (plans/TopKPerKey)
    "q31_topk_per_key" -> ((s: SparkSession, d: String) => TopK.topOrdersPerCustomer(s, d)),
    "q35_latest_per_key" -> TopK.latestEventPerUser _,
    "m2_frame_sample" -> ((s: SparkSession, d: String) => graft.ops.Multimodal.frameSampleFlat(s, d)),
    // UDAF extension surface: TypedImperativeAggregate bottom-k (KMV)
    // sketch, grouped per language, next to the exact distinct count it
    // would estimate at scale.
    "b1_bottomk_sketch" -> ((s: SparkSession, d: String) =>
      graft.sources.Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(
          org.apache.spark.sql.functions.expr("bottom_k_md5(text, 8)").as("sk"),
          org.apache.spark.sql.functions.countDistinct(col("text")).as("n_distinct"))
        // serialize the sketch: the gate harness only handles scalar columns
        .select(col("lang"),
          org.apache.spark.sql.functions.array_join(col("sk"), ",").as("sketch"),
          col("n_distinct"))
        .orderBy(col("lang"))),
    "b2_kmv_estimate" -> ((s: SparkSession, d: String) => Corpus.kmvEstimate(s, d)),
    // KMV sketch set ops: per-source-pair union/intersection estimates
    // from merged bottom-k sketches — no corpus-level text join.
    "b3_kmv_setops" -> ((s: SparkSession, d: String) => Corpus.kmvSetOps(s, d)),
    // Provably-exact heavy hitters: Misra-Gries mergeable sketch for the
    // candidate set (shuffle O(partitions x capacity), never the distinct
    // token table) + candidate-bounded exact recount; exact-or-refuse
    // in-plan via the MG bound. Same answer as t5, scale-proof plan.
    "b4_heavy_hitters" -> ((s: SparkSession, d: String) =>
      TextAnalysis.heavyHitters(s, d)),
    // Incremental heavy hitters: per-doc token-count generations
    // (tokenize once per doc ever), b4's weighted sketch + exact recount
    // over the folded slim state — split-ingest == one-shot t5/b4.
    "b5_topk_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_b5_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalTopK.merge(s, state, docs.where(col("doc_id") % 2 === 0), Some("k0"))
      graft.ops.IncrementalTopK.merge(s, state, docs.where(col("doc_id") % 2 === 1), Some("k1"))
      graft.ops.IncrementalTopK.topK(s, state)
    }),
    // Its streaming drain: micro-batch b5 merges == the same oracle.
    "q82_stream_topk" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runTopKAvailableNow(s, d)),
    // Tombstone delete on the top-k state (c15's row-level rule): the
    // served top-20 over survivors == the one-shot over survivors.
    "b6_topk_delete" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val state = graft.util.TmpDirs.scratch("graft_b6_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalTopK.merge(s, state, docs, Some("k0"))
      graft.ops.Deletes.tombstone(s, state, "topk",
        docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
      graft.ops.IncrementalTopK.topK(s, state)
    }),
    "c1_chunking" -> ((s: SparkSession, d: String) => Corpus.chunk(s, d)),
    "c2_hash_sample" -> ((s: SparkSession, d: String) => Corpus.hashSample(s, d)),
    "c3_contamination" -> ((s: SparkSession, d: String) => Corpus.contamination(s, d)),
    "c4_pack" -> ((s: SparkSession, d: String) => Corpus.pack(s, d)),
    // Curriculum packing: the c4 manifest with the per-language stream
    // ordered by quality score (desc) instead of doc_id.
    "c8_curriculum_pack" -> ((s: SparkSession, d: String) => Corpus.curriculumPack(s, d)),
    // Contamination registry: benchmark shingles persisted once, each
    // ingest batch screened independently; batch union == one-shot c3.
    "c9_contamination_registry" -> ((s: SparkSession, d: String) => {
      val reg = graft.util.TmpDirs.scratch("graft_c9_registry_").toString
      Corpus.buildContaminationRegistry(s, d, reg)
      val train = graft.sources.Tables.documents(s, d)
        .where(col("source") =!= Corpus.benchmarkSource)
      Corpus.contaminationAgainst(s, reg, train.where(pmod(col("doc_id"), lit(5)) =!= 0))
        .unionByName(
          Corpus.contaminationAgainst(s, reg, train.where(pmod(col("doc_id"), lit(5)) === 0)))
        .orderBy(col("doc_id"))
    }),
    // c16: the Bloom-screened registry gate — only an 8-bit-per-shingle
    // filter is broadcast; the exact set joins Bloom SURVIVORS only (the
    // over-broadcast-size registry path). No false negatives + exact
    // verify behind the screen => value-identical to c3 (shared oracle).
    "c16_bloom_decontamination" -> ((s: SparkSession, d: String) => {
      val reg = graft.util.TmpDirs.scratch("graft_c16_registry_").toString
      Corpus.buildContaminationRegistry(s, d, reg)
      Corpus.buildRegistryBloom(s, reg)
      val train = graft.sources.Tables.documents(s, d)
        .where(col("source") =!= Corpus.benchmarkSource)
      Corpus.contaminationBloomScreened(s, reg, train).orderBy(col("doc_id"))
    }),
    // c10: the APPENDABLE registry — benchmark suites land as generational
    // shingle-set appends (set union is associative, so append-then-screen
    // == rebuild-then-screen exactly); batches screened against the union.
    "c10_registry_append" -> ((s: SparkSession, d: String) => {
      val reg = graft.util.TmpDirs.scratch("graft_c10_registry_").toString
      val docs = graft.sources.Tables.documents(s, d)
      val bench = docs.where(col("source") === Corpus.benchmarkSource)
      Corpus.appendContaminationRegistry(s, reg, bench.where(pmod(col("doc_id"), lit(2)) === 0))
      Corpus.appendContaminationRegistry(s, reg, bench.where(pmod(col("doc_id"), lit(2)) === 1))
      val train = docs.where(col("source") =!= Corpus.benchmarkSource)
      Corpus.contaminationAgainstRegistry(s, reg, train.where(pmod(col("doc_id"), lit(5)) =!= 0))
        .unionByName(
          Corpus.contaminationAgainstRegistry(s, reg, train.where(pmod(col("doc_id"), lit(5)) === 0)))
        .orderBy(col("doc_id"))
    }),
    // DSIR-style importance selection: hashed n-gram bag models for the
    // benchmark target vs the raw corpus, integer micro-nat weights,
    // deterministic top-N most-target-like raw docs.
    "c11_importance_select" -> ((s: SparkSession, d: String) => Corpus.importanceSelect(s, d)),
    // Incremental DSIR: write-only per-batch count generations (feature
    // extraction once per doc), selection re-fit over the folded slim
    // state; 80/20 split-ingest == c11's one-shot (shared oracle).
    "c12_importance_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_c12_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalDsir.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))
      graft.ops.IncrementalDsir.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) === 0))
      graft.ops.IncrementalDsir.select(s, state)
    }),
    // c15: right-to-be-forgotten for the SELECTION MODEL — tombstone
    // doc_id ≡ 3 (mod 7); the count state is per-doc, so the model sums,
    // weights, and scores all re-fit over the survivors at the next
    // select (the selection is corpus-global by nature); == one-shot c11
    // over the surviving corpus.
    "c15_dsir_delete" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_c15_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalDsir.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))
      graft.ops.IncrementalDsir.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) === 0))
      graft.ops.IncrementalDsir.delete(s, state,
        docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
      graft.ops.IncrementalDsir.select(s, state)
    }),
    // Streaming DSIR: the q54 chassis over c12 state — continuous
    // selection-model maintenance; drained selection == one-shot c11.
    // Streaming decontamination: frozen registry, each micro-batch
    // screened map-side in foreachBatch; union == one-shot c3.
    "q72_stream_decontamination" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runDecontaminationAvailableNow(s, d)),
    // Streaming soft dedup: micro-batches merge into the d12 state, the
    // d25 accept test reads the drained cluster sizes — live
    // duplication-aware sampling weights at O(batch) per trigger.
    "q73_stream_soft_dedup" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runSoftDedupAvailableNow(s, d)),
    "q62_stream_importance" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runDsirSelectAvailableNow(s, d)),
    "t7_pii_redact" -> ((s: SparkSession, d: String) => TextAnalysis.redactPii(s, d)),
    // Deterministic hash-bucket train/val/test assignment (per-language
    // audit counts).
    "c6_train_val_test" -> ((s: SparkSession, d: String) => Corpus.trainValTestSplit(s, d)),
    "q36_histogram" -> Relational.q36Histogram _,
    "q37_grouping_sets" -> Relational.q37GroupingSets _,
    "q38_stream_static" -> graft.streaming.EventsStream.runStaticEnrichedAvailableNow _,
    "d8_keeper_quality" -> ((s: SparkSession, d: String) => Dedup.keeperByQuality(s, d)),
    // Asymmetric containment dedup: catches doc-inside-doc duplication
    // that symmetric Jaccard misses.
    "d9_containment" -> ((s: SparkSession, d: String) => Dedup.containmentPairs(s, d)),
    // Dedup-state persistence across runs: labels written to a parquet
    // state dir and the clustering rebuilt from the read-back — must be
    // byte-identical to computing fresh (d7's oracle). The state dir is
    // STABLE per (session, input): the first invocation builds and writes
    // state, every later one exercises the reload branch the query name
    // advertises (a fresh dir per call would re-pay the write forever).
    "d10_clusters_persisted" -> ((s: SparkSession, d: String) =>
      Dedup.dupClustersFromState(s, d, d10StateDir(s, d))),
    // Incremental dedup-state merge: ingest 80% of the corpus, then merge
    // the remaining 20% as a new batch — new-new and new-old pairs only
    // via the persisted band index, old-old never recomputed; the result
    // must be hash-identical to d7's full recompute on the union (shared
    // oracle). A fresh state dir per invocation so every run (and every
    // bench pass) measures the full two-ingest flow.
    "d12_incremental_dedup" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d12_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalDedup.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))
      graft.ops.IncrementalDedup.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) === 0))
      graft.ops.IncrementalDedup.clusters(s, state)
    }),
    // The 64-bit width dial on the incremental path: same generational
    // merge, exact-block probes (zero fan-out), == one-shot d17 clustering.
    "d19_simhash64_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d19_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalDedup.merge(s, state,
        docs.where(pmod(col("doc_id"), lit(5)) =!= 0), width = 64)
      graft.ops.IncrementalDedup.merge(s, state,
        docs.where(pmod(col("doc_id"), lit(5)) === 0), width = 64)
      graft.ops.IncrementalDedup.clusters(s, state)
    }),
    // Incremental EXACT dedup: write-only generational partial aggregates
    // (associative min/sum), split-ingest == d1's one-shot aggregate.
    "d18_exact_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d18_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalExact.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))
      graft.ops.IncrementalExact.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) === 0))
      graft.ops.IncrementalExact.dedup(s, state)
    }),
    // d28: right-to-be-forgotten for the write-only exact modality —
    // split-ingest, then TOMBSTONE every doc_id ≡ 3 (mod 7); the served
    // aggregate re-derives affected hash groups from the per-doc sidecar
    // and must equal the one-shot d1 aggregate over the SURVIVING docs.
    "d28_exact_delete" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d28_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalExact.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))
      graft.ops.IncrementalExact.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) === 0))
      graft.ops.IncrementalExact.delete(s, state,
        docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
      graft.ops.IncrementalExact.dedup(s, state)
    }),
    // d29: right-to-be-forgotten for the CLUSTERING modality — tombstone
    // every doc_id ≡ 3 (mod 7) after split-ingest; the served clustering
    // re-labels only the affected components over surviving stored edges
    // (splits included) and must equal the one-shot d7 clustering over
    // the surviving corpus.
    "d29_cluster_delete" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d29_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalDedup.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))
      graft.ops.IncrementalDedup.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) === 0))
      graft.ops.IncrementalDedup.delete(s, state,
        docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
      graft.ops.IncrementalDedup.clusters(s, state)
    }),
    // Incremental MinHash-LSH dedup state (the Jaccard modality's d12):
    // split-ingest into a fresh generational state dir, clusters compared
    // against reachability over the one-shot d3 pair graph.
    "d15_minhash_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d15_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalMinHash.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))
      graft.ops.IncrementalMinHash.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) === 0))
      graft.ops.IncrementalMinHash.clusters(s, state)
    }),
    // d30/d31: the d29 tombstone-delete protocol on the other two
    // pair-graph modalities — embedding (vec space) and MinHash (Jaccard)
    // — each must equal its one-shot clustering over the survivors.
    "d30_embedding_cluster_delete" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d30_state_").toString
      val vecs = graft.sources.Tables.embeddings(s, d)
      graft.ops.IncrementalEmbedding.merge(s, state, vecs.where(pmod(col("vec_id"), lit(5)) =!= 0))
      graft.ops.IncrementalEmbedding.merge(s, state, vecs.where(pmod(col("vec_id"), lit(5)) === 0))
      graft.ops.IncrementalEmbedding.delete(s, state,
        vecs.where(pmod(col("vec_id"), lit(7)) === 3).select(col("vec_id")))
      graft.ops.IncrementalEmbedding.clusters(s, state)
    }),
    "d31_minhash_cluster_delete" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d31_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalMinHash.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))
      graft.ops.IncrementalMinHash.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) === 0))
      graft.ops.IncrementalMinHash.delete(s, state,
        docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
      graft.ops.IncrementalMinHash.clusters(s, state)
    }),
    // d32: deletes for the substring modality — tombstoned-incident hits
    // drop from the served spans; occurrence (the cap) is append-only by
    // design (see IncrementalSubstring.delete), which the oracle pins:
    // pair join over survivors, cap over the full ingest history.
    "d32_substring_delete" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d32_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalSubstring.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))
      graft.ops.IncrementalSubstring.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) === 0))
      graft.ops.IncrementalSubstring.delete(s, state,
        docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
      graft.ops.IncrementalSubstring.spans(s, state)
    }),
    // d33: deletes for the perceptual media modality — pair facts are
    // per-item, so shadowing is a plain anti-join; oracle = m5's golden
    // pairs minus the tombstoned name's incidences.
    // q77/q78: the delete feeds under the STREAMING chassis — ingest
    // micro-batches, then tombstone micro-batches; drained serve == the
    // one-shot over the survivors (d28's / d29's oracle).
    "q77_stream_exact_delete" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runExactDeleteAvailableNow(s, d)),
    "q78_stream_cluster_delete" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runClusterDeleteAvailableNow(s, d)),
    "d33_media_delete" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d33_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Multimodal.ppmNearFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalMedia.merge(s, state, media.where(col("name") < "imga_r"))
      graft.ops.IncrementalMedia.merge(s, state, media.where(col("name") >= "imga_r"))
      graft.ops.IncrementalMedia.delete(s, state,
        media.where(col("name") === "imga_bright.ppm").select(col("name")))
      graft.ops.IncrementalMedia.pairs(s, state)
    }),
    // Incremental EXACT-SUBSTRING dedup (the last modality outside the
    // state matrix): generational positional anchor index, merge-time
    // cold-anchor probe + read-time final-count cap (the two EXACT halves
    // of d13's occurrence cap), split-ingest == d13's one-shot spans.
    "d20_substring_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d20_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalSubstring.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))
      graft.ops.IncrementalSubstring.merge(s, state, docs.where(pmod(col("doc_id"), lit(5)) === 0))
      graft.ops.IncrementalSubstring.spans(s, state)
    }),
    // k-anonymity audit over quasi-identifier combinations.
    "t11_kanonymity" -> ((s: SparkSession, d: String) => TextAnalysis.kAnonymityAudit(s, d)),
    // End-to-end curation verdict: benchmark/quality/duplicate/
    // contaminated/keep per document — t10+d7+c3 composed, all gates in
    // exact integer arithmetic.
    "c7_curation" -> ((s: SparkSession, d: String) => Corpus.curate(s, d)),
    // Exact-substring dedup: anchor-index candidates + diagonal-run exact
    // span verification (the third dedup modality: verbatim spans).
    "d13_exact_substring" -> ((s: SparkSession, d: String) => Dedup.exactSubstringPairs(s, d)),
    // Duplicated-span REMOVAL: every >= minSpan token run also present in
    // an earlier doc is cut from the later one — the span survives once,
    // unique remainders survive with it.
    "d26_span_removal" -> ((s: SparkSession, d: String) => Dedup.spanRemoval(s, d)),
    // Incremental removal: the d26 cut served from d20's drained anchor
    // state (split-ingest == one-shot by the d20 parity contract).
    "d27_span_removal_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d27_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalSubstring.merge(s, state,
        docs.where(pmod(col("doc_id"), lit(4)) =!= 0), Some("b0"))
      graft.ops.IncrementalSubstring.merge(s, state,
        docs.where(pmod(col("doc_id"), lit(4)) === 0), Some("b1"))
      graft.ops.IncrementalSubstring.removal(s, d, state)
    }),
    // Streaming removal: q58's ingest with the removal cut at drain.
    "q75_stream_span_removal" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runSpanRemovalAvailableNow(s, d)),
    "t8_unigram_surprisal" -> ((s: SparkSession, d: String) => TextAnalysis.unigramSurprisal(s, d)),
    // Held-out bigram Stupid-Backoff surprisal: benchmark slice scored
    // against a model fit on the rest — the backoff path actually fires.
    "t19_bigram_surprisal" -> ((s: SparkSession, d: String) => TextAnalysis.bigramSurprisal(s, d)),
    // Tokenizer fertility audit over the learned BPE: per-language
    // tokens/word and chars/token — the multilingual quality report.
    "t20_bpe_fertility" -> ((s: SparkSession, d: String) => TextAnalysis.bpeFertility(s, d)),
    // Text normalization audit: NFC compose (native codegen expression) +
    // control/format strip + whitespace collapse; Unicode gauntlet rides
    // along since the synthetic corpus is ASCII.
    "t21_normalize_audit" -> ((s: SparkSession, d: String) => TextAnalysis.normalizeAudit(s, d)),
    // Dataset card: the per-source datasheet — volume, language spread,
    // exact duplication rate, mean quality; every number engine-exact.
    "t22_dataset_card" -> ((s: SparkSession, d: String) => TextAnalysis.datasetCard(s, d)),
    // Incremental card: the count-distinct view maintained via slim
    // distinct-key generations; split-ingest == one-shot t22.
    "t23_card_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_t23_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalCard.merge(s, state,
        docs.where(pmod(col("doc_id"), lit(3)) =!= 0), Some("b0"))
      graft.ops.IncrementalCard.merge(s, state,
        docs.where(pmod(col("doc_id"), lit(3)) === 0), Some("b1"))
      graft.ops.IncrementalCard.serve(s, state)
    }),
    // t26: right-to-be-forgotten for the maintained datasheet — the
    // COUNT-DISTINCT delete: tombstone doc_id ≡ 3 (mod 7); additive
    // columns subtract, and a distinct key leaves only when its LAST
    // surviving carrier goes (multiplicity via the per-doc sidecar);
    // == one-shot t22 over the surviving corpus.
    "t26_card_delete" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_t26_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalCard.merge(s, state,
        docs.where(pmod(col("doc_id"), lit(3)) =!= 0), Some("b0"))
      graft.ops.IncrementalCard.merge(s, state,
        docs.where(pmod(col("doc_id"), lit(3)) === 0), Some("b1"))
      graft.ops.IncrementalCard.delete(s, state,
        docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
      graft.ops.IncrementalCard.serve(s, state)
    }),
    // Streaming card maintenance: a live datasheet at O(batch)/trigger.
    "q76_stream_card" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runCardMaintenanceAvailableNow(s, d)),
    // Approximate card: folded HLL sketches instead of distinct-key
    // tables — O(1) state per group. DataSketches estimates have no
    // DuckDB twin, so the q40 pattern applies: the entry carries the
    // exact columns plus TOLERANCE BOOLEANS comparing the estimates to
    // the exact fold — the oracle asserts the booleans true, making the
    // accuracy claim itself the hash-checked value.
    "t24_card_approx" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_t24_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalCard.merge(s, state,
        docs.where(pmod(col("doc_id"), lit(2)) === 0), Some("b0"))
      graft.ops.IncrementalCard.merge(s, state,
        docs.where(pmod(col("doc_id"), lit(2)) === 1), Some("b1"))
      val est = graft.ops.IncrementalCard.serveApprox(s, state)
        .select(col("source"), col("n_langs_est"), col("n_distinct_est"))
      graft.ops.IncrementalCard.serve(s, state)
        .join(est, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
          col("avg_score"),
          (col("n_langs_est") === col("n_langs")).cast("int").as("langs_ok"),
          (org.apache.spark.sql.functions.abs(
            col("n_distinct_est") - col("n_distinct_texts")).cast("double") <
            col("n_distinct_texts").cast("double") * 0.05).cast("int").as("distinct_ok"))
        .orderBy(col("source"))
    }),
    "c5_rebalance" -> ((s: SparkSession, d: String) => Corpus.rebalance(s, d)),
    "c13_temperature_sample" -> ((s: SparkSession, d: String) => Corpus.temperatureSample(s, d)),
    // Deterministic global shuffle + shard assignment: one salted md5
    // drives shard and within-shard order — reproducible export shards.
    "c14_shuffle_export" -> ((s: SparkSession, d: String) => Corpus.shuffleExport(s, d)),
    // S6 sink composed with the JSON source: q14's result written as
    // line-delimited JSON, read back under the same schema, hash-checked
    // against q14's oracle.
    "q39_sink_roundtrip" -> ((s: SparkSession, d: String) =>
      graft.engine.Sinks.jsonRoundTrip(Relational.q14EventsDaily(s, d),
          graft.util.TmpDirs.scratch("graft_q39_roundtrip_").toString)
        .orderBy(col("day"), col("event_type"))),
    // S6 CSV twin of q39: same batch aggregate through the headered-CSV
    // sink and source under the writer's schema.
    "q50_csv_roundtrip" -> ((s: SparkSession, d: String) =>
      graft.engine.Sinks.csvRoundTrip(Relational.q14EventsDaily(s, d),
          graft.util.TmpDirs.scratch("graft_q50_roundtrip_").toString)
        .orderBy(col("day"), col("event_type"))),
    // S6 ORC twin of q39: the Hive-lineage columnar format through the
    // native vectorized ORC writer/reader, hash-checked against q14's
    // oracle — closes the sink-format matrix's columnar half.
    "q85_orc_roundtrip" -> ((s: SparkSession, d: String) =>
      graft.engine.Sinks.orcRoundTrip(Relational.q14EventsDaily(s, d),
          graft.util.TmpDirs.scratch("graft_q85_roundtrip_").toString)
        .orderBy(col("day"), col("event_type"))),
    // S6 Avro twin: the row-major message-bus interchange format (Spark 4
    // bundles the connector); dates travel as Avro logical types — exact.
    "q86_avro_roundtrip" -> ((s: SparkSession, d: String) =>
      graft.engine.Sinks.avroRoundTrip(Relational.q14EventsDaily(s, d),
          graft.util.TmpDirs.scratch("graft_q86_roundtrip_").toString)
        .orderBy(col("day"), col("event_type"))),
    // S6 XML twin: the engine's own SOURCE domain (the reference pipeline
    // is XML ingest) finally gets its sink — one rowTag element per row,
    // read back under the writer's schema (dates as ISO text, re-parsed
    // exactly; see Sinks.xmlRoundTrip for the format's null/"" caveat).
    "q87_xml_roundtrip" -> ((s: SparkSession, d: String) =>
      graft.engine.Sinks.xmlRoundTrip(Relational.q14EventsDaily(s, d),
          graft.util.TmpDirs.scratch("graft_q87_roundtrip_").toString)
        .orderBy(col("day"), col("event_type"))),
    // Approximate aggregates (HLL++, quantile sketch): the sketch values
    // are not DuckDB-reproducible, so the query emits exact twins plus
    // |approx − exact| ≤ tol booleans and the oracle asserts literal TRUEs
    // — hash-checked like every other entry.
    "q40_approx_aggs" -> Relational.q40ApproxAggs _,
    "q41_stream_foreachbatch" -> graft.streaming.EventsStream.runDailyToParquetAvailableNow _,
    "q42_except_all" -> Relational.q42ExceptAll _,
    "q43_gapfill" -> Relational.q43GapFill _,
    "q44_exists_sql" -> graft.engine.SqlQueries.existsSql _,
    "q45_stream_running_max" -> graft.streaming.EventsStream.runRunningMaxAvailableNow _,
    "q46_collect_suite" -> Relational.q46CollectSuite _,
    "t9_bpeish_tokens" -> ((s: SparkSession, d: String) => TextAnalysis.bpeishTokens(s, d)),
    // Real vocab-based BPE: greedy ranked merges + token ids, the DuckDB
    // oracle replays the merge loop with a recursive CTE.
    "t12_bpe_tokens" -> ((s: SparkSession, d: String) => TextAnalysis.bpeVocabTokens(s, d)),
    // BPE merge TRAINING: learn the ranked merge table from the corpus
    // (greedy argmax rounds over the word-frequency vocab); the oracle
    // unrolls the same fixed round count.
    "t13_bpe_train" -> ((s: SparkSession, d: String) => TextAnalysis.bpeTrainTable(s, d)),
    // t12's counting on the LEARNED table — train + tokenize end to end.
    "t14_bpe_learned_tokens" -> ((s: SparkSession, d: String) => TextAnalysis.bpeLearnedTokens(s, d)),
    // Tokenizer-model registry: the learned table persisted to a parquet
    // model dir and reloaded (never retrained) — must equal t14 exactly.
    "t16_bpe_persisted" -> ((s: SparkSession, d: String) =>
      TextAnalysis.bpePersistedTokens(s, d, t16ModelDir(s, d))),
    "t10_gopher_rules" -> ((s: SparkSession, d: String) => TextAnalysis.gopherRules(s, d)),
    // Token-level repetition signals (top-bigram mass, longest token run,
    // type/token collapse) — the Gopher repetition family t10 lacks.
    "t15_repetition" -> ((s: SparkSession, d: String) => TextAnalysis.repetitionProfile(s, d)),
    // LEARNED quality classifier: provenance-labeled Naive Bayes over
    // integer-decile shape features, trained and scored in one pass —
    // all-integer arithmetic (decimal(38,0) cross-multiplied posteriors),
    // so the oracle replays training to bit-identical predictions.
    "t17_quality_classifier" -> ((s: SparkSession, d: String) => TextAnalysis.qualityClassifier(s, d)),
    // t18: d18's write-only pattern applied to MODEL state — NB count
    // partials per batch, model = one re-aggregation; split-training ==
    // t17's one-shot training exactly (counts are associative).
    "t18_classifier_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_t18_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalClassifier.merge(s, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
      graft.ops.IncrementalClassifier.merge(s, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
      graft.ops.IncrementalClassifier.classify(s, state, docs)
    }),
    // t25: right-to-be-forgotten for the TRAINED MODEL — tombstone
    // doc_id ≡ 3 (mod 7); the deleted docs' count contributions subtract
    // from the served model via the per-doc feature sidecar (counts are
    // an abelian group), and the survivors score == one-shot t17 trained
    // and scored on the surviving corpus alone.
    "t25_classifier_delete" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_t25_state_").toString
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.IncrementalClassifier.merge(s, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
      graft.ops.IncrementalClassifier.merge(s, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
      graft.ops.IncrementalClassifier.delete(s, state,
        docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
      graft.ops.IncrementalClassifier.classify(s, state,
        docs.where(pmod(col("doc_id"), lit(7)) =!= 3))
    }),
    // q61: the same training driven by the streaming chassis (batch-keyed
    // exactly-once ingest); drained model scores == t17.
    "q61_stream_classifier_train" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runClassifierTrainAvailableNow(s, d)),
    "q47_stream_funnel_outer" -> graft.streaming.EventsStream.runFunnelLeftOuterAvailableNow _,
    // Streaming incremental dedup: each micro-batch foreachBatch-merged
    // into persistent d12 state; drained result == d7's batch recompute.
    "q54_stream_incremental_dedup" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runIncrementalDedupAvailableNow(s, d)),
    // The MinHash modality under the same streaming chassis: micro-batch
    // d15 merges; drained result == CC over the one-shot d3 pair graph.
    "q55_stream_minhash_dedup" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runMinHashDedupAvailableNow(s, d)),
    // The embedding modality: micro-batch d14 merges; == one-shot d11.
    "q56_stream_embedding_dedup" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runEmbeddingDedupAvailableNow(s, d)),
    // The exact modality: write-only d18 generations per micro-batch;
    // drained re-aggregation == d1's one-shot.
    "q57_stream_exact_dedup" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runExactDedupAvailableNow(s, d)),
    // The exact-substring modality: micro-batch d20 merges into one
    // anchor-index state; drained span table == d13's one-shot.
    "q58_stream_substring_dedup" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runSubstringDedupAvailableNow(s, d)),
    // Streaming ANN ingest: micro-batch s8 merges against the frozen s7
    // model; drained top-k == s7's one-shot (assignment is per-vector).
    "q59_stream_ann_ingest" -> ((s: SparkSession, d: String) => {
      val model = s7ModelDir(s, d)
      Similarity.persistedIvfCentroids(s, d, model)
      graft.streaming.DocumentsStream.runAnnIngestAvailableNow(s, d, model)
    }),
    "m3_media_dedup" -> ((s: SparkSession, d: String) => graft.ops.Multimodal.mediaDedup(s, d)),
    // Real codec path: P6 PPM decode over checked-in binary fixtures,
    // reduced to exact integer stats (golden-VALUES oracle). The media
    // ops take a real mediaDir; the board entries bind the fixture
    // default because their golden oracles enumerate the fixture sets.
    "m4_ppm_decode" -> ((s: SparkSession, _: String) =>
      graft.ops.Multimodal.ppmDecode(s)),
    // Perceptual media near-dup: decode -> 64-bit dHash -> d17 blocked
    // Hamming candidates -> exact bit_count verify (golden-VALUES oracle
    // derived from an independent reference dHash implementation).
    "m5_ppm_near_dup" -> ((s: SparkSession, _: String) =>
      graft.ops.Multimodal.ppmNearDup(s)),
    // Rotation/mirror-robust perceptual near-dup: dihedral-orbit dHash
    // signatures, identity-probe vs orbit block index, min-Hamming
    // verify (golden-VALUES oracle from the independent reference
    // implementation in tools/gen_ppmrot_fixtures.py).
    "m6_rot_robust_dedup" -> ((s: SparkSession, _: String) =>
      graft.ops.Multimodal.ppmRotNearDup(s)),
    // Audio modality, real codec: RIFF/PCM WAV decode over checked-in
    // fixtures, reduced to exact integer stats (golden-VALUES oracle from
    // the independent reference in tools/gen_wav_fixtures.py).
    "m7_wav_decode" -> ((s: SparkSession, _: String) =>
      graft.ops.Audio.wavDecode(s)),
    // Audio perceptual near-dup: mono mix -> 64-bit delta-energy
    // fingerprint (gain- and stereo-spread-invariant) -> m5's blocked
    // Hamming candidates -> exact bit_count verify (golden-VALUES oracle).
    "m8_wav_near_dup" -> ((s: SparkSession, _: String) =>
      graft.ops.Audio.wavNearDup(s)),
    // Video modality, real codec: YUV4MPEG2 raw-video decode over
    // checked-in fixtures, exact integer luma stats (golden-VALUES
    // oracle from the independent reference in tools/gen_y4m_fixtures.py).
    "m9_y4m_decode" -> ((s: SparkSession, _: String) =>
      graft.ops.Video.y4mDecode(s)),
    // Video perceptual near-dup: 4 evenly-sampled luma frames -> per-frame
    // dHash -> frame-axis blocked-Hamming candidates -> exact summed
    // bit_count verify (re-wrap and luma lift land at 0; golden-VALUES).
    "m10_video_near_dup" -> ((s: SparkSession, _: String) =>
      graft.ops.Video.videoNearDup(s)),
    // The orbit row of the incremental media matrix: originals ingested
    // first, transformed copies in a second merge — every golden pair is
    // discovered cross-batch (or new-new) at its newer member's merge.
    "d24_rotmedia_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d24_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Multimodal.ppmRotFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalRotMedia.merge(s, state, media.where(!col("name").contains("_")))
      graft.ops.IncrementalRotMedia.merge(s, state, media.where(col("name").contains("_")))
      graft.ops.IncrementalRotMedia.pairs(s, state)
    }),
    // d35: the d33 tombstone protocol on the ORBIT modality — delete one
    // golden-pair member; its pairs leave the served table, unrelated
    // pairs survive; compact() purges the orbit signature rows physically.
    "d35_rotmedia_delete" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d35_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Multimodal.ppmRotFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalRotMedia.merge(s, state, media.where(!col("name").contains("_")))
      graft.ops.IncrementalRotMedia.merge(s, state, media.where(col("name").contains("_")))
      graft.ops.IncrementalRotMedia.delete(s, state,
        media.where(col("name") === "imga_rot90.ppm").select(col("name")))
      graft.ops.IncrementalRotMedia.pairs(s, state)
    }),
    "q69_stream_rot_media" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runRotMediaDedupAvailableNow(s, d)),
    // The media column of the incremental dedup matrix: assets decoded +
    // dHashed once at their own ingest, generational signature state,
    // split-ingest == m5's one-shot pair table (shared golden oracle).
    "d21_media_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d21_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Multimodal.ppmNearFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalMedia.merge(s, state, media.where(col("name") < "imga_r"))
      graft.ops.IncrementalMedia.merge(s, state, media.where(col("name") >= "imga_r"))
      graft.ops.IncrementalMedia.pairs(s, state)
    }),
    // And its streaming drain: micro-batch d21 merges == the same oracle.
    "q60_stream_media_dedup" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runMediaDedupAvailableNow(s, d)),
    // The AUDIO column of the incremental matrix: the wav-denergy codec
    // in the same codec-parametric chassis — originals ingested first,
    // copies second, every golden pair found cross-batch; == m8's
    // one-shot pair table (shared golden oracle).
    "d36_audio_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d36_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Audio.wavFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalMedia.merge(s, state,
        media.where(!col("name").contains("_")), codec = "wav-denergy")
      graft.ops.IncrementalMedia.merge(s, state,
        media.where(col("name").contains("_")), codec = "wav-denergy")
      graft.ops.IncrementalMedia.pairs(s, state)
    }),
    // Its streaming drain: micro-batch d36 merges == the same oracle.
    "q81_stream_audio_dedup" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runAudioDedupAvailableNow(s, d)),
    // The VIDEO column of the incremental matrix: the y4m-framehash
    // codec in the multi-row-signature chassis (4 rows per asset,
    // summed-Hamming verify) — originals first, copies second; == m10's
    // one-shot pair table (shared golden oracle).
    "d38_video_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d38_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Video.y4mFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalMedia.merge(s, state,
        media.where(!col("name").contains("_")), maxHamming = 6, codec = "y4m-framehash")
      graft.ops.IncrementalMedia.merge(s, state,
        media.where(col("name").contains("_")), maxHamming = 6, codec = "y4m-framehash")
      graft.ops.IncrementalMedia.pairs(s, state)
    }),
    // Its streaming drain: micro-batch d38 merges == the same oracle.
    "q83_stream_video_dedup" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runVideoDedupAvailableNow(s, d)),
    // Tombstone delete on the video modality (codec-agnostic chassis):
    // delete vida.y4m, its pairs leave the serve.
    "d39_video_delete" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val state = graft.util.TmpDirs.scratch("graft_d39_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Video.y4mFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalMedia.merge(s, state, media,
        maxHamming = 6, codec = "y4m-framehash")
      graft.ops.Deletes.tombstone(s, state, "video", Seq("vida.y4m").toDF("name"))
      graft.ops.IncrementalMedia.pairs(s, state)
    }),
    // Tombstone delete on the audio modality (d33's string-keyed
    // protocol, unchanged — the chassis is codec-agnostic downstream of
    // the signature): delete tonea.wav, its pairs leave the serve.
    "d37_audio_delete" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val state = graft.util.TmpDirs.scratch("graft_d37_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Audio.wavFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalMedia.merge(s, state, media, codec = "wav-denergy")
      graft.ops.Deletes.tombstone(s, state, "audio", Seq("tonea.wav").toDF("name"))
      graft.ops.IncrementalMedia.pairs(s, state)
    }),
    // Standard-format images via javax.imageio (the JDK codec registry —
    // PNG here; JPEG/GIF/BMP dispatch through the same entry point):
    // decode to exact integer stats. PNG is lossless, so the golden
    // VALUES oracle comes from the independent pure-Python encoder +
    // reference in tools/gen_png_fixtures.py.
    "m11_png_decode" -> ((s: SparkSession, _: String) =>
      graft.ops.Png.imageDecode(s)),
    // PNG perceptual near-dup: the m5 dHash/blocked-Hamming chassis over
    // ImageIO-decoded rasters (re-encoded copy at 0, brightness-lifted
    // two-pixel retouch at 2, unrelated at 25-27 — correctly absent).
    "m12_png_near_dup" -> ((s: SparkSession, _: String) =>
      graft.ops.Png.imageNearDup(s)),
    // The PNG column of the incremental matrix: the png-dhash codec in
    // the codec-parametric chassis — originals first, copies second,
    // every golden pair found cross-batch; == m12's one-shot pair table.
    "d40_png_incremental" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d40_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Png.pngFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalMedia.merge(s, state,
        media.where(!col("name").contains("_")), codec = "png-dhash")
      graft.ops.IncrementalMedia.merge(s, state,
        media.where(col("name").contains("_")), codec = "png-dhash")
      graft.ops.IncrementalMedia.pairs(s, state)
    }),
    // Streaming drain of the PNG modality: micro-batch d40 merges through
    // the q60 chassis == m12's one-shot pair table (shared oracle).
    "q84_stream_png_dedup" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runPngDedupAvailableNow(s, d)),
    // m13: deterministic thumbnail resize — ImageIO decode + integer
    // box-average downscale to 9x7, exact stats + sha256 of the resized
    // raster bytes (the oracle pins every output pixel; golden VALUES
    // from the independent Python box_resize in tools/gen_png_fixtures.py).
    "m13_resize" -> ((s: SparkSession, _: String) =>
      graft.ops.Png.imageResize(s)),
    // Tombstone delete on the PNG modality (codec-agnostic chassis):
    // delete imga.png, its pairs leave the serve; bright-recode survives.
    "d41_png_delete" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val state = graft.util.TmpDirs.scratch("graft_d41_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Png.pngFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalMedia.merge(s, state, media, codec = "png-dhash")
      graft.ops.Deletes.tombstone(s, state, "png", Seq("imga.png").toDF("name"))
      graft.ops.IncrementalMedia.pairs(s, state)
    }),
    // m14: JPEG through the same ImageIO registry dispatch — the format
    // real corpora lead with. Lossy (decoder-dependent rounding), so the
    // oracle pins decode INVARIANTS, not pixel sums: accepted?, header
    // dimensions; the header-truncated fixture rejects whole.
    "m14_jpeg_decode" -> ((s: SparkSession, _: String) =>
      graft.ops.Png.jpegDecode(s)),
    // The JPEG column of the incremental matrix (jpeg-dhash codec in the
    // codec-parametric chassis): the same-raster re-quality encode is the
    // only pair within Hamming 3 (margins verified at fixture generation,
    // 1 vs 55+ — graft.tools.GenJpegFixtures). Names only in the output:
    // the exact Hamming is decoder-rounded, not contract.
    "d42_jpeg_incremental" -> ((s: SparkSession, _: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d42_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Png.jpgFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalMedia.merge(s, state,
        media.where(!col("name").contains("_")), codec = "jpeg-dhash")
      graft.ops.IncrementalMedia.merge(s, state,
        media.where(col("name").contains("_")), codec = "jpeg-dhash")
      graft.ops.IncrementalMedia.pairs(s, state)
        .select(col("name1"), col("name2"))
        .orderBy(col("name1"), col("name2"))
    }),
    // d44: tombstone delete on the JPEG modality through the Deletes
    // facade's "jpeg" alias — the last image container to get its GDPR
    // board entry (the chassis is codec-parametric, so this pins the
    // FACADE wiring: tombstone("jpeg", ...) must route, shadow the
    // victim's pairs at read, and revive them on re-ingest). Counts and
    // names only (JPEG hamming is decoder-rounded, the d42 contract).
    "d44_jpeg_delete" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      val state = graft.util.TmpDirs.scratch("graft_d44_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Png.jpgFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalMedia.merge(s, state, media, codec = "jpeg-dhash")
      graft.ops.Deletes.tombstone(s, state, "jpeg", Seq("imga.jpg").toDF("name"))
      def snap(phase: String) = graft.ops.IncrementalMedia.pairs(s, state)
        .agg(count(lit(1)).cast("int").as("n_pairs"),
          concat_ws("|", sort_array(collect_list(
            concat(col("name1"), lit("|"), col("name2"))))).as("names"))
        .select(lit(phase).as("phase"), col("n_pairs"), col("names"))
      // materialize the post-delete snapshot before the revive mutates
      // state — a 1-row global aggregate, bounded by construction
      val afterDelete = snap("after_delete").collect().toSeq
      graft.ops.IncrementalMedia.merge(s, state,
        media.where(col("name") === "imga.jpg"), codec = "jpeg-dhash")
      val afterRevive = snap("after_revive")
      s.createDataFrame(s.sparkContext.parallelize(afterDelete), afterRevive.schema)
        .unionAll(afterRevive).orderBy(col("phase"))
    }),
    // m15/m16: BMP and GIF through the same registry — both lossless for
    // these fixtures (the rasters palettize exactly), so the goldens are
    // the m11 stats of the SAME rasters re-containered: one raster through
    // three container formats must decode bit-identically.
    "m15_bmp_decode" -> ((s: SparkSession, _: String) =>
      graft.ops.Png.imageDecode(s, graft.ops.Png.bmpFixtureDir)),
    "m16_gif_decode" -> ((s: SparkSession, _: String) =>
      graft.ops.Png.imageDecode(s, graft.ops.Png.gifFixtureDir)),
    // m17: TIFF through the same registry (the JDK plugin, Java 9+) —
    // baseline uncompressed RGB is lossless, so the golden is again the
    // m11 stats of the same rasters: one raster, FOUR containers,
    // bit-identical decodes.
    "m17_tiff_decode" -> ((s: SparkSession, _: String) =>
      graft.ops.Png.imageDecode(s, graft.ops.Png.tiffFixtureDir)),
    // d43: the TIFF column of the incremental matrix — the tiff-dhash
    // codec in the codec-parametric chassis, originals first, the
    // brightness-retouched copy second; the golden pair is found
    // CROSS-batch (same raster as d40's imga_bright, hamming 2).
    "d43_tiff_incremental" -> ((s: SparkSession, _: String) => {
      val state = graft.util.TmpDirs.scratch("graft_d43_state_").toString
      val media = s.read.format("binaryFile")
        .load(graft.ops.Png.tiffFixtureDir)
        .select(substring_index(col("path"), "/", -1).as("name"), col("content"))
      graft.ops.IncrementalMedia.merge(s, state,
        media.where(!col("name").contains("_")), codec = "tiff-dhash")
      graft.ops.IncrementalMedia.merge(s, state,
        media.where(col("name").contains("_")), codec = "tiff-dhash")
      graft.ops.IncrementalMedia.pairs(s, state)
    }),
    "q48_rolling_range" -> Relational.q48RollingRange _,
    // the two-pass bucketed re-plan of q48 (types x buckets parallelism
    // instead of a 5-way ceiling); must equal q48 exactly
    "q51_rolling_bucketed" -> Relational.q51RollingRangeBucketed _,
    "q49_union_by_name" -> Relational.q49UnionByName _,
    // Bucketed co-located fact-fact join: write-time shuffle paid once,
    // the join itself is zero-Exchange (plan pinned in BucketingSpec,
    // values pinned here against the plain-join oracle).
    "q52_bucketed_join" -> graft.engine.Bucketing.bucketedOrdersJoinAgg _,
    // Partitioned sink + pruned read-back: the partition-directory filter
    // must change WHICH FILES are read (pinned in PushdownSpec), never
    // WHAT the surviving rows compute (pinned here).
    "q53_partitioned_prune" -> ((s: SparkSession, d: String) => {
      val out = graft.util.TmpDirs.scratch("graft_q53_part_").toString
      graft.engine.Sinks.parquet(Relational.q14EventsDaily(s, d), out,
        partitionBy = Seq("event_type"))
      s.read.parquet(out).where(col("event_type") === "purchase")
        .select(col("day"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("day"))
    }),
    // Z-order clustered sink: events rewritten along the (user_id, day)
    // Morton curve, read back through a 2-D box predicate — both range
    // filters push to the scan and the interleaved layout makes every
    // file's min/max tight on BOTH columns (ZOrderSpec proves the
    // skipping; results are layout-independent, which is the oracle).
    "q64_zorder_prune" -> ((s: SparkSession, d: String) => {
      val out = graft.util.TmpDirs.scratch("graft_q64_zorder_").toString
      import org.apache.spark.sql.functions.{count, countDistinct, datediff, round, sum, to_date}
      val ev = graft.sources.Tables.events(s, d)
        .withColumn("day", datediff(to_date(col("ts")), lit("2024-01-01")))
      graft.engine.ZOrder.writeZOrdered(ev, out,
        col("user_id"), col("day"), numFiles = 16)
      s.read.parquet(out)
        .where(col("user_id").between(100, 299) && col("day").between(8, 15))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),
    // Incremental materialized-view maintenance (batch): the q14 daily
    // rollup maintained as write-only generational partials — three
    // disjoint ingests (event_id mod 3), a lossless compaction mid-way,
    // and a keyed re-delivery proven a no-op, then one serve. Answer ==
    // one-shot q14 for any split, by associativity of (count, sum).
    "q65_incremental_view" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_q65_state_").toString
      val ev = graft.sources.Tables.events(s, d)
      graft.ops.IncrementalView.merge(s, state, ev.where(col("event_id") % 3 === 0), Some("k0"))
      graft.ops.IncrementalView.merge(s, state, ev.where(col("event_id") % 3 === 1), Some("k1"))
      graft.ops.IncrementalView.compact(s, state)
      graft.ops.IncrementalView.merge(s, state, ev.where(col("event_id") % 3 === 2), Some("k2"))
      // at-least-once re-delivery of an already-ingested batch: no-op
      graft.ops.IncrementalView.merge(s, state, ev.where(col("event_id") % 3 === 1), Some("k1"))
      graft.ops.IncrementalView.serve(s, state)
    }),
    // q79: RETRACTIONS — the view under CORRECTION batches. Two late
    // fixes arrive after ingest: click events with event_id ≡ 3 (mod 10)
    // were MISCATEGORIZED (actually views — retract from 'click',
    // re-ingest as 'view'; counts and sums move between groups), and
    // error events with event_id ≡ 5 (mod 17) were spurious (retract, no
    // replacement). Counts and sums are an abelian group, so each
    // correction is one more write-only negated partial; the served view
    // must equal the direct rollup over the CORRECTED event set. The
    // corrections deliberately keep every event's original `value` (the
    // 2-decimal source doubles): group sums stay multiples of 0.01, so
    // the subtract-then-round arithmetic can never land on a rounding
    // boundary.
    "q79_view_retraction" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_q79_state_").toString
      val ev = graft.sources.Tables.events(s, d)
      graft.ops.IncrementalView.merge(s, state, ev.where(col("event_id") % 2 === 0), Some("k0"))
      graft.ops.IncrementalView.merge(s, state, ev.where(col("event_id") % 2 === 1), Some("k1"))
      val misfiled = ev.where(col("event_type") === "click" && col("event_id") % 10 === 3)
      graft.ops.IncrementalView.retract(s, state, misfiled, Some("r0"))
      graft.ops.IncrementalView.merge(s, state,
        misfiled.withColumn("event_type", lit("view")), Some("k2"))
      val spurious = ev.where(col("event_type") === "error" && col("event_id") % 17 === 5)
      graft.ops.IncrementalView.retract(s, state, spurious, Some("r1"))
      // at-least-once re-delivery of an already-applied retraction: no-op
      graft.ops.IncrementalView.retract(s, state, spurious, Some("r1"))
      graft.ops.IncrementalView.serve(s, state)
    }),
    // Streaming twin: the same view maintained by foreachBatch merges
    // (write-only per trigger, exactly-once via batch-id keys).
    "q66_stream_view_maintenance" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runViewMaintenanceAvailableNow(s, d)),
    // Streaming corrections: q79's retraction semantics as a second
    // streamed feed (the q77 chassis) — completes the mutation matrix.
    "q80_stream_view_correction" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runViewCorrectionAvailableNow(s, d)),
    // Time travel: the view as of the second ingest — a shorter fold over
    // the immutable generations, no snapshot copies.
    "q67_view_time_travel" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_q67_state_").toString
      val ev = graft.sources.Tables.events(s, d)
      graft.ops.IncrementalView.merge(s, state, ev.where(col("event_id") % 3 === 0), Some("k0"))
      val v1 = graft.ops.IncrementalView.merge(s, state, ev.where(col("event_id") % 3 === 1), Some("k1"))
      graft.ops.IncrementalView.merge(s, state, ev.where(col("event_id") % 3 === 2), Some("k2"))
      graft.ops.IncrementalView.serveAsOf(s, state, v1)
    }),
    // View chaining: a weekly view maintained ONLY from the daily view's
    // raw change feed — the rollup-pyramid pattern; never reads events.
    "q70_view_chaining" -> ((s: SparkSession, d: String) => {
      val daily = graft.util.TmpDirs.scratch("graft_q70_daily_").toString
      val weekly = graft.util.TmpDirs.scratch("graft_q70_weekly_").toString
      val ev = graft.sources.Tables.events(s, d)
      val v0 = graft.ops.IncrementalView.merge(s, daily, ev.where(col("event_id") % 3 === 0), Some("k0"))
      val v1 = graft.ops.IncrementalView.merge(s, daily, ev.where(col("event_id") % 3 === 1), Some("k1"))
      val v2 = graft.ops.IncrementalView.merge(s, daily, ev.where(col("event_id") % 3 === 2), Some("k2"))
      graft.ops.IncrementalView.Weekly.merge(s, weekly,
        graft.ops.IncrementalView.changeFeedRaw(s, daily, -1, v1), Some("w0"))
      graft.ops.IncrementalView.Weekly.merge(s, weekly,
        graft.ops.IncrementalView.changeFeedRaw(s, daily, v1, v2), Some("w1"))
      val _ = v0
      graft.ops.IncrementalView.Weekly.serve(s, weekly)
    }),
    // Streaming rollup pyramid: daily + chained weekly per trigger.
    "q71_stream_view_chaining" -> ((s: SparkSession, d: String) =>
      graft.streaming.DocumentsStream.runViewChainingAvailableNow(s, d)),
    // Change feed: the additive CDC deltas between two generations —
    // partials ARE deltas, so the feed is a fold over just the window.
    "q68_view_change_feed" -> ((s: SparkSession, d: String) => {
      val state = graft.util.TmpDirs.scratch("graft_q68_state_").toString
      val ev = graft.sources.Tables.events(s, d)
      graft.ops.IncrementalView.merge(s, state, ev.where(col("event_id") % 3 === 0), Some("k0"))
      val v1 = graft.ops.IncrementalView.merge(s, state, ev.where(col("event_id") % 3 === 1), Some("k1"))
      val v2 = graft.ops.IncrementalView.merge(s, state, ev.where(col("event_id") % 3 === 2), Some("k2"))
      graft.ops.IncrementalView.changeFeed(s, state, v1, v2)
    }),
  )

  /** The OOH wide projection over the checked-in fixture, map/array columns
    * serialized with to_json so the DuckDB oracle (which cannot read XML)
    * hash-checks the full extraction against golden VALUES literals.
    */
  private def oohOccupationsFlat(spark: SparkSession): DataFrame =
    OohPipeline.occupations(OohPipeline.read(spark, OohPipeline.fixturePath))
      .select(
        col("title"),
        col("workSchedules").as("work_schedules"),
        to_json(col("importantQualities")).as("iq_json"),
        col("medianPayAnnual").as("median_pay_annual"),
        col("numberOfJobs").as("n_jobs"),
        col("whatTheyDo").as("what_they_do"),
        to_json(col("pay")).as("pay_json"),
        to_json(col("similarOccupations")).as("similar_json"),
        to_json(col("topIndustries")).as("industries_json"))
      .orderBy(col("title"))

  /** The reference's filtered report (index.js:177-183) over the fixture. */
  private def oohReportFlat(spark: SparkSession): DataFrame =
    OohPipeline.run(spark, OohPipeline.fixturePath)
      .select(
        col("title"),
        col("medianPayAnnual").as("median_pay_annual"),
        col("employmentOutlookCode").as("outlook_code"),
        to_json(col("importantQualities")).as("iq_json"))
      .orderBy(col("title"))

  private val correctedRollupSql =
    """WITH corrected AS (
      |  SELECT ts,
      |    CASE WHEN event_type = 'click' AND event_id % 10 = 3
      |         THEN 'view' ELSE event_type END AS event_type,
      |    value
      |  FROM events
      |  WHERE NOT (event_type = 'error' AND event_id % 17 = 5))
      |SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM corrected
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin

  def oracleSql: Map[String, String] = {
    // q19/q20 run the IDENTICAL SQL text on both engines (spark.sql is the
    // engine's second query surface), so their oracles are q1/q12's text.
    val m = baseOracleSql
    m + ("q19_sql_pricing" -> m("q1_pricing_summary")) +
      ("q20_sql_brand_agg" -> m("q12_part_agg")) +
      // the skew-safe as-of must produce exactly the plain as-of's result
      ("q21_asof_skew_safe" -> m("q15_asof_join")) +
      // clustering rebuilt from persisted state == clustering computed fresh
      ("d10_clusters_persisted" -> m("d7_dup_clusters")) +
      // split-ingest-then-merge == full recompute on the union
      ("d12_incremental_dedup" -> m("d7_dup_clusters")) +
      // tombstoned clustering == d7's one-shot over the SURVIVING docs
      // (same CTE text, survivors filter pushed into the corpus scan)
      ("d29_cluster_delete" -> m("d7_dup_clusters")
        .replace("FROM documents)", "FROM documents WHERE doc_id % 7 <> 3)")) +
      // the same delete protocol on the embedding and Jaccard modalities
      ("d30_embedding_cluster_delete" -> m("d11_embedding_clusters")
        .replace("FROM embeddings)", "FROM embeddings WHERE vec_id % 7 <> 3)")) +
      ("d31_minhash_cluster_delete" -> m("d15_minhash_incremental")
        .replace("FROM documents)", "FROM documents WHERE doc_id % 7 <> 3)")) +
      // substring deletes: survivors filter on the PAIR JOIN only — the
      // occurrence cap stays over the full corpus (append-only occurrence,
      // the semantics IncrementalSubstring.delete documents)
      ("d32_substring_delete" -> m("d13_exact_substring")
        .replace("ON a.anchor = b.anchor AND a.doc_id < b.doc_id),",
          "ON a.anchor = b.anchor AND a.doc_id < b.doc_id " +
            "WHERE a.doc_id % 7 <> 3 AND b.doc_id % 7 <> 3),")) +
      // streamed delete feeds: == the same survivors-only one-shots
      ("q77_stream_exact_delete" ->
        """SELECT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h,
          |  min(doc_id) AS keeper, count(*) AS n_copies
          |FROM documents WHERE doc_id % 7 <> 3
          |GROUP BY 1 ORDER BY keeper""".stripMargin) +
      ("q78_stream_cluster_delete" -> m("d7_dup_clusters")
        .replace("FROM documents)", "FROM documents WHERE doc_id % 7 <> 3)")) +
      // media deletes: m5's golden pairs minus the tombstoned name
      ("d33_media_delete" ->
        """SELECT name1, name2, hamming FROM (VALUES
          |  ('imga.ppm', 'imga_recode.ppm', CAST(0 AS INT))
          |) AS t(name1, name2, hamming)
          |ORDER BY name1, name2""".stripMargin) +
      // write-only partial-agg ingest == d1's one-shot exact aggregate
      ("d18_exact_incremental" -> m("d1_exact_dedup")) +
      // tombstoned state == d1's one-shot aggregate over the SURVIVORS
      ("d28_exact_delete" ->
        """SELECT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h,
          |  min(doc_id) AS keeper, count(*) AS n_copies
          |FROM documents WHERE doc_id % 7 <> 3
          |GROUP BY 1 ORDER BY keeper""".stripMargin) +
      // per-batch registry screening unioned == one-shot contamination
      ("c9_contamination_registry" -> m("c3_contamination")) +
      // Bloom pre-screen + exact verify on survivors == one-shot
      // contamination (false positives verified away, no false negatives)
      ("c16_bloom_decontamination" -> m("c3_contamination")) +
      // suite-split generational appends screened == one-shot contamination
      ("c10_registry_append" -> m("c3_contamination")) +
      // streaming per-batch screens unioned == one-shot contamination
      ("q72_stream_decontamination" -> m("c3_contamination")) +
      // drained d12 state sizes + d25 accept test == one-shot soft dedup
      ("q73_stream_soft_dedup" -> m("d25_soft_dedup")) +
      // persisted PQ codebooks reload bit-identically == deriving fresh
      ("s13_pq_persisted" -> m("s11_pq_topk")) +
      // frozen-model batch encodings unioned == one-shot s12 encoding
      ("s15_ivfpq_incremental" -> m("s12_ivf_pq")) +
      // and its streaming drain: == the same one-shot s12
      ("q74_stream_ivfpq_ingest" -> m("s12_ivf_pq")) +
      // stream-vs-batch parity: micro-batch-merged state == one-shot d7
      ("q54_stream_incremental_dedup" -> m("d7_dup_clusters")) +
      // same parity for the MinHash modality: == CC over the d3 graph
      ("q55_stream_minhash_dedup" -> m("d15_minhash_incremental")) +
      // and the embedding modality: == d11's one-shot clustering
      ("q56_stream_embedding_dedup" -> m("d11_embedding_clusters")) +
      // and the exact modality: == d1's one-shot aggregate
      ("q57_stream_exact_dedup" -> m("d1_exact_dedup")) +
      // anchor-index split-ingest == d13's one-shot span table (the cap
      // split into merge-time and read-time halves is exact)
      ("d20_substring_incremental" -> m("d13_exact_substring")) +
      // and its streaming drain: == the same one-shot spans
      ("q58_stream_substring_dedup" -> m("d13_exact_substring")) +
      // state-served removal == one-shot d26 (d20 parity + shared cut)
      ("d27_span_removal_incremental" -> m("d26_span_removal")) +
      ("q75_stream_span_removal" -> m("d26_span_removal")) +
      // distinct-key generations folded == the one-shot card
      ("t23_card_incremental" -> m("t22_dataset_card")) +
      ("q76_stream_card" -> m("t22_dataset_card")) +
      // persisted model reload == training fresh (bit-exact parquet
      // round-trip of the centroid doubles)
      ("s7_ann_ivf_persisted" -> m("s5_ann_ivf_trained")) +
      // split-ingested postings over the frozen model == s7's one-shot
      ("s8_ann_ivf_incremental" -> m("s5_ann_ivf_trained")) +
      // and the streaming drain of the same ingest: == s7's one-shot
      ("q59_stream_ann_ingest" -> m("s5_ann_ivf_trained")) +
      // split-trained NB counts re-aggregated == t17's one-shot training
      ("t18_classifier_incremental" -> m("t17_quality_classifier")) +
      // and the streaming drain of the same training: == t17
      ("q61_stream_classifier_train" -> m("t17_quality_classifier")) +
      // frozen-model cell split-ingest == d22's one-shot clustering
      ("d23_semantic_incremental" -> m("d22_semantic_dedup")) +
      // semantic deletes: frozen full-corpus model, survivors-only
      // assignment/pairing — the filter lands on the cells CTE, training
      // stays unfiltered
      ("d34_semantic_delete" -> m("d22_semantic_dedup")
        .replace("FROM rkd WHERE rc = 1 AND nrm > 0)",
          "FROM rkd WHERE rc = 1 AND nrm > 0 AND vec_id % 7 <> 3)")) +
      // IVF-PQ deletes: model and codebooks froze on the full corpus,
      // queries stay full-precision from the corpus — only the CANDIDATE
      // side (the served code postings) shrinks to the survivors
      ("s16_ivfpq_delete" -> m("s12_ivf_pq")
        .replace("JOIN cells x ON x.cell = p.pcell AND x.vec_id <> p.qid),",
          "JOIN cells x ON x.cell = p.pcell AND x.vec_id <> p.qid " +
            "AND x.vec_id % 7 <> 3),")) +
      // orbit-media deletes: m6's golden pairs minus every pair touching
      // the tombstoned asset (imga_rot90 carried two of the four)
      ("d35_rotmedia_delete" ->
        """SELECT name1, name2, hamming FROM (VALUES
          |  ('imga.ppm', 'imga_flip_bright.ppm', CAST(2 AS INT)),
          |  ('imgb.ppm', 'imgb_rot180.ppm', CAST(0 AS INT))
          |) AS t(name1, name2, hamming)
          |ORDER BY name1, name2""".stripMargin) +
      // DSIR deletes: the selection is corpus-global, so the oracle is
      // c11's full replay (model sums, weights, scores, top-N) over the
      // surviving corpus alone
      ("c15_dsir_delete" -> m("c11_importance_select")
        .replace("AS t FROM documents),",
          "AS t FROM documents WHERE doc_id % 7 <> 3),")) +
      // classifier deletes: training AND scoring over the survivors —
      // one-shot t17 on the surviving corpus
      ("t25_classifier_delete" -> m("t17_quality_classifier")
        .replace("AS t FROM documents),",
          "AS t FROM documents WHERE doc_id % 7 <> 3),")) +
      // card deletes: the count-distinct delete — one-shot t22 over the
      // survivors (a distinct key leaves only with its last carrier)
      ("t26_card_delete" -> m("t22_dataset_card")
        .replace("AS t FROM documents),",
          "AS t FROM documents WHERE doc_id % 7 <> 3),")) +
      // view retractions: the direct rollup over the CORRECTED event set
      // (clicks with event_id ≡ 3 mod 10 recategorized as views, spurious
      // errors with event_id ≡ 5 mod 17 removed); the streamed correction
      // feed (q80) serves the same corrected rollup
      ("q79_view_retraction" -> correctedRollupSql) +
      ("q80_stream_view_correction" -> correctedRollupSql) +
      // and the streaming drain of the same merge: == d22
      ("q63_stream_semantic_dedup" -> m("d22_semantic_dedup")) +
      // count-generation split-ingest == c11's one-shot selection
      ("c12_importance_incremental" -> m("c11_importance_select")) +
      // and the streaming drain of the same ingest: == c11
      ("q62_stream_importance" -> m("c11_importance_select")) +
      // media split-ingest == m5's one-shot pair table (golden oracle)
      ("d21_media_incremental" -> m("m5_ppm_near_dup")) +
      // orbit split-ingest and its streaming drain == m6's golden pairs
      ("d24_rotmedia_incremental" -> m("m6_rot_robust_dedup")) +
      ("q69_stream_rot_media" -> m("m6_rot_robust_dedup")) +
      // and its streaming drain: == the same golden pairs
      ("q60_stream_media_dedup" -> m("m5_ppm_near_dup")) +
      // audio split-ingest and its streaming drain == m8's golden pairs
      ("d36_audio_incremental" -> m("m8_wav_near_dup")) +
      ("q81_stream_audio_dedup" -> m("m8_wav_near_dup")) +
      // top-k split-ingest and its streaming drain == t5's exact top-20
      ("b5_topk_incremental" -> m("t5_token_freq")) +
      ("q82_stream_topk" -> m("t5_token_freq")) +
      // PNG split-ingest and its streaming drain == m12's golden pairs
      ("d40_png_incremental" -> m("m12_png_near_dup")) +
      ("q84_stream_png_dedup" -> m("m12_png_near_dup")) +
      // PNG tombstone delete: imga.png's pairs leave the serve
      ("d41_png_delete" ->
        """SELECT name1, name2, hamming FROM (VALUES
          |  ('imga_bright.png', 'imga_recode.png', CAST(2 AS INT))
          |) AS t(name1, name2, hamming)
          |ORDER BY name1, name2""".stripMargin) +
      // video split-ingest and its streaming drain == m10's golden pairs
      ("d38_video_incremental" -> m("m10_video_near_dup")) +
      ("q83_stream_video_dedup" -> m("m10_video_near_dup")) +
      // video tombstone delete: vida.y4m's pairs leave the serve
      ("d39_video_delete" ->
        """SELECT name1, name2, hamming FROM (VALUES
          |  ('vida_bright.y4m', 'vida_recode.y4m', CAST(0 AS INT)),
          |  ('vida_bright.y4m', 'vida_retouch.y4m', CAST(2 AS INT)),
          |  ('vida_recode.y4m', 'vida_retouch.y4m', CAST(2 AS INT))
          |) AS t(name1, name2, hamming)
          |ORDER BY name1, name2""".stripMargin) +
      // audio tombstone delete: tonea.wav's pairs leave the serve
      ("d37_audio_delete" ->
        """SELECT name1, name2, hamming FROM (VALUES
          |  ('tonea_click.wav', 'tonea_gain.wav', CAST(1 AS INT)),
          |  ('toneb.wav', 'toneb_stereo.wav', CAST(0 AS INT))
          |) AS t(name1, name2, hamming)
          |ORDER BY name1, name2""".stripMargin) +
      // persisted BPE model reload == training fresh (lossless
      // string/long round-trip)
      ("t16_bpe_persisted" -> m("t14_bpe_learned_tokens")) +
      // embedding split-ingest-then-merge == d11's full recompute
      ("d14_embedding_incremental" -> m("d11_embedding_clusters")) +
      // sink round-trip and the foreachBatch drain must both reproduce
      // the batch daily aggregation exactly
      ("q39_sink_roundtrip" -> m("q14_events_daily")) +
      // the bucketed rolling window must reproduce the single-key window
      ("q51_rolling_bucketed" -> m("q48_rolling_range")) +
      ("q50_csv_roundtrip" -> m("q14_events_daily")) +
      // ORC and Avro twins of the same round trip — all four file-sink
      // formats reproduce the identical batch aggregate
      ("q85_orc_roundtrip" -> m("q14_events_daily")) +
      ("q86_avro_roundtrip" -> m("q14_events_daily")) +
      // XML twin — the source domain's sink: all FIVE file-sink formats
      // plus XML reproduce the identical batch aggregate
      ("q87_xml_roundtrip" -> m("q14_events_daily")) +
      ("q41_stream_foreachbatch" -> m("q14_events_daily")) +
      // incremental view maintenance serves exactly the q14 rollup
      ("q65_incremental_view" -> m("q14_events_daily")) +
      ("q66_stream_view_maintenance" -> m("q14_events_daily")) +
      // time travel to the second ingest == the rollup over batches 0+1;
      // the change feed (v1, v2] == the rollup over batch 2 alone
      ("q67_view_time_travel" ->
        """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
          |  count(*) AS n, round(sum(value), 2) AS sum_value
          |FROM events WHERE event_id % 3 < 2
          |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin) +
      ("q68_view_change_feed" ->
        """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
          |  count(*) AS n, round(sum(value), 2) AS sum_value
          |FROM events WHERE event_id % 3 = 2
          |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin) +
      // the chained weekly view (batch q70 and its streaming drain q71)
      // == the weekly rollup straight off events
      ("q71_stream_view_chaining" ->
        """SELECT CAST(date_trunc('week', ts) AS DATE) AS week, event_type,
          |  count(*) AS n, round(sum(value), 2) AS sum_value
          |FROM events
          |GROUP BY 1, 2 ORDER BY week, event_type""".stripMargin) +
      ("q70_view_chaining" ->
        """SELECT CAST(date_trunc('week', ts) AS DATE) AS week, event_type,
          |  count(*) AS n, round(sum(value), 2) AS sum_value
          |FROM events
          |GROUP BY 1, 2 ORDER BY week, event_type""".stripMargin)
  }

  /** Shared oracle CTE pipeline for the SimHash family (d5 pairs, d7
    * clusters): tokens → per-token md5 → 32-bit signature bitstring →
    * four 8-bit bands → candidate pairs → exact Hamming verify. (Spark
    * generates candidates with two probed 16-bit halves instead — same
    * verified output, different candidate geometry; see Dedup.simhashPairs.)
    * One definition, two consumers — the final `ham` relation is
    * (d1, d2, hamming) for all candidate pairs.
    */
  private val simhashHamCte: String =
    """toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      |hs AS (SELECT doc_id, [md5(x) for x in t] AS hs FROM toks),
      |bits AS (SELECT doc_id,
      |  array_to_string([CASE WHEN list_sum([
      |      ((CAST(floor((strpos('0123456789abcdef', h[CAST(b // 4 AS INT) + 1]) - 1) / (2 ** (3 - b % 4))) AS INT) % 2) * 2 - 1)
      |    for h in hs]) > 0 THEN '1' ELSE '0' END for b in range(0, 32)], '') AS simhash
      |  FROM hs),
      |bands AS (SELECT doc_id, simhash, b, simhash[b*8+1 : b*8+8] AS bv
      |          FROM bits, (SELECT unnest(range(0, 4)) AS b)),
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.simhash AS s1, b.simhash AS s2
      |         FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
      |ham AS (SELECT d1, d2,
      |          CAST(list_sum([CASE WHEN s1[i] <> s2[i] THEN 1 ELSE 0 END for i in range(1, 33)]) AS INT) AS hamming
      |        FROM cand)""".stripMargin

  /** Unrolled BPE TRAINING replay (t13/t14): exactly
    * [[graft.ops.TextAnalysis.trainBpeMerges]]'s semantics — the
    * word-frequency vocab, then `bpeTrainRounds` rounds of
    * (adjacent-pair count weighted by word freq → argmax with the
    * count-desc/pair-asc tie-break → apply the winning merge). The s5
    * Lloyd's precedent: a FIXED round count so the replay is a finite
    * unroll, no golden values anywhere.
    *
    * Applying one merge is NON-recursive on purpose: a word's symbol
    * state is a delimited string (single space at the ends, double space
    * between symbols — a symbol can never contain a space, the words were
    * split on it), and the leftmost-to-fixpoint merge loop over ONE pair
    * equals one left-to-right non-overlapping `replace` — the pattern
    * `' a  b '` keeps one boundary space on each side so adjacent
    * occurrences still match, and a merge's output can never recreate its
    * own pair (`ab = a` or `ab = b` is impossible by length). Applying
    * merges IN RANK ORDER equals the trainer's greedy lowest-rank
    * re-encode because a learned pair's symbols are always outputs of
    * strictly earlier merges. Every CTE is MATERIALIZED: the first draft
    * used a per-round recursive re-encode walk, and DuckDB re-evaluated
    * the nested CTE chain per reference — exponential in rounds (87 s at
    * sf0.001); this form is one cheap scan per round.
    */
  private def bpeTrainCtes: String = {
    val lst = "string_split(trim(s, ' '), '  ')"
    val pairs = s"[l[i] || ' ' || l[i+1] for i in range(1, len(l))]"
    val rounds = (0 until graft.ops.TextAnalysis.bpeTrainRounds).map { r =>
      // coalesce to an unmatchable chr(1) pattern if the corpus ran out of
      // pairs before round r (the Scala trainer just stops learning)
      val pat = s"coalesce((SELECT ' ' || replace(pair, ' ', '  ') || ' ' FROM m$r), chr(1))"
      val rep = s"coalesce((SELECT ' ' || replace(pair, ' ', '') || ' ' FROM m$r), chr(1))"
      s"""p$r AS MATERIALIZED (SELECT pair, CAST(sum(f) AS BIGINT) AS n FROM (
         |    SELECT f, unnest($pairs) AS pair
         |    FROM (SELECT f, $lst AS l FROM s$r))
         |  GROUP BY pair),
         |m$r AS MATERIALIZED (SELECT pair, n FROM p$r ORDER BY n DESC, pair LIMIT 1),
         |s${r + 1} AS MATERIALIZED (SELECT w, f, replace(s, $pat, $rep) AS s FROM s$r)""".stripMargin
    }.mkString(",\n")
    s"""dw AS MATERIALIZED (SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w FROM documents),
       |v0 AS MATERIALIZED (SELECT w, count(*) AS f FROM dw GROUP BY w),
       |s0 AS MATERIALIZED (SELECT w, f,
       |    ' ' || array_to_string([w[i] for i in range(1, length(w)+1)], '  ') || ' ' AS s
       |  FROM v0),
       |$rounds""".stripMargin
  }

  /** 64-bit SimHash candidate+hamming replay shared by d17 and d19: the
    * per-bit md5 vote at 64 bits, 4 exact 16-char block bands, char-wise
    * hamming; ends at CTE `ham` (d1, d2, hamming).
    */
  private val simhash64HamCte: String =
    """toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      |hs AS (SELECT doc_id, [md5(x) for x in t] AS hs FROM toks),
      |bits AS (SELECT doc_id,
      |  array_to_string([CASE WHEN list_sum([
      |      ((CAST(floor((strpos('0123456789abcdef', h[CAST(b // 4 AS INT) + 1]) - 1) / (2 ** (3 - b % 4))) AS INT) % 2) * 2 - 1)
      |    for h in hs]) > 0 THEN '1' ELSE '0' END for b in range(0, 64)], '') AS simhash
      |  FROM hs),
      |bands AS (SELECT doc_id, simhash, b, simhash[b*16+1 : b*16+16] AS bv
      |          FROM bits, (SELECT unnest(range(0, 4)) AS b)),
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.simhash AS s1, b.simhash AS s2
      |         FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id),
      |ham AS (SELECT d1, d2,
      |          CAST(list_sum([CASE WHEN s1[i] <> s2[i] THEN 1 ELSE 0 END for i in range(1, 65)]) AS INT) AS hamming
      |        FROM cand)""".stripMargin

  /** The exact rounded Jaccard of two shingle-set columns sh1/sh2 —
    * shared by the d3 verifier and d15's pair CTE.
    */
  private val minhashJacSql =
    "round(CAST(len(list_intersect(sh1, sh2)) AS DOUBLE) / " +
      "(len(sh1) + len(sh2) - len(list_intersect(sh1, sh2))), 6)"

  /** MinHash-LSH candidate replay shared by d3 and d15: trigram shingle
    * sets, the 12 universal-hash minhashes generated from the SAME
    * constants the Spark operator uses (graft.ops.Dedup.minhashA/B — one
    * definition, two engines), 4×3 banding, and the band-equality
    * candidate join; ends at CTE `cand` (d1, d2, sh1, sh2).
    */
  private def minhashCandCte: String = {
    val p = graft.ops.Dedup.minhashP
    val sigEntries = (0 until graft.ops.Dedup.numHashes).map { i =>
      val a = graft.ops.Dedup.minhashA(i); val b = graft.ops.Dedup.minhashB(i)
      s"list_sort([($a * hh + $b) % $p for hh in hs])[1]"
    }.mkString(",\n        |           ")
    s"""toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
      |shl AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)]) AS sh FROM toks),
      |shn AS (SELECT doc_id, sh FROM shl WHERE len(sh) > 0),
      |hb AS (SELECT doc_id, sh,
      |         [CAST(list_sum([(strpos('0123456789abcdef', md5(s)[i]) - 1) * (16 ** (8 - i)) for i in range(1, 9)]) AS BIGINT) % $p for s in sh] AS hs
      |       FROM shn),
      |mh AS (SELECT doc_id, sh,
      |         [$sigEntries] AS sig
      |       FROM hb),
      |bands AS (SELECT doc_id, sh, b,
      |            CAST(sig[3*b+1] AS VARCHAR) || ':' || CAST(sig[3*b+2] AS VARCHAR) || ':' || CAST(sig[3*b+3] AS VARCHAR) AS bh
      |          FROM mh, (SELECT unnest(range(0, 4)) AS b)),
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.sh AS sh1, b.sh AS sh2
      |         FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** Checked-in-table BPE encode replay shared by t12 and c4: CTEs `dw`
    * (the exploded word stream carrying `keyCols`), the distinct vocab,
    * the greedy lowest-rank/leftmost merge walk to fixpoint (rank/id CASE
    * tables interpolated from the SAME [[graft.exprs.BpeStats.merges]]
    * constant the native expression parses), and `wid` — per-word
    * (ntok, idsum); ids are base-alphabet (ascii−baseLo) for single chars,
    * baseSize+rank for merge outputs, unknown −1. Callers join `dw` (with
    * multiplicity) back to `wid`.
    */
  private def bpeWidCtes(keyCols: String): String = {
    import graft.exprs.BpeStats
    val sentinel = 999999
    val rankCase = (i: String) =>
      s"CASE syms[$i] || ' ' || syms[$i+1] " +
        BpeStats.merges.zipWithIndex.map { case ((a, b), r) =>
          s"WHEN '$a $b' THEN $r" }.mkString(" ") + s" ELSE $sentinel END"
    val mergedIdCase = "CASE sym " +
      BpeStats.merges.zipWithIndex.map { case ((a, b), r) =>
        s"WHEN '$a$b' THEN ${BpeStats.baseSize + r}" }.mkString(" ") + " ELSE -1 END"
    s"""dw AS (
      |  SELECT $keyCols, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |  FROM documents),
      |wrd AS (SELECT DISTINCT w FROM dw),
      |s0 AS (SELECT w, [w[i] for i in range(1, length(w)+1)] AS syms FROM wrd),
      |steps(w, syms) AS (
      |  SELECT w, syms FROM s0
      |  UNION ALL
      |  SELECT w,
      |    syms[1:p-1] || [syms[p] || syms[p+1]] || syms[p+2:]
      |  FROM (SELECT w, syms, coalesce(list_min(rks), $sentinel) AS mr,
      |          list_position(rks, list_min(rks)) AS p
      |        FROM (SELECT w, syms,
      |                [${rankCase("i")} for i in range(1, len(syms))] AS rks
      |              FROM steps))
      |  WHERE mr < $sentinel),
      |fin AS (
      |  SELECT w, syms
      |  FROM (SELECT w, syms,
      |          coalesce(list_min([${rankCase("i")} for i in range(1, len(syms))]),
      |                   $sentinel) AS mr
      |        FROM steps)
      |  WHERE mr >= $sentinel),
      |wid AS (
      |  SELECT w, count(*) AS ntok, sum(
      |    CASE WHEN length(sym) = 1
      |         THEN CASE WHEN ascii(sym) BETWEEN ${BpeStats.baseLo} AND ${BpeStats.baseHi}
      |                   THEN ascii(sym) - ${BpeStats.baseLo} ELSE -1 END
      |         ELSE $mergedIdCase END) AS idsum
      |  FROM (SELECT w, unnest(syms) AS sym FROM fin)
      |  GROUP BY w)""".stripMargin
  }

  /** First-k-centroid IVF oracle, parameterized by cell count (s3/s6). */
  private def ivfFirstKOracle(cells: Int): String =
    s"""WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
      |n AS (SELECT vec_id, e, sqrt(list_sum([e[i] * e[i] for i in range(1, len(e)+1)])) AS nrm FROM v),
      |c AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM n WHERE vec_id < $cells),
      |a1 AS (SELECT n.vec_id, n.e, n.nrm, c.cid,
      |         list_sum([n.e[i] * c.ce[i] for i in range(1, len(n.e)+1)]) / (n.nrm * c.cn) AS ccos
      |       FROM n, c),
      |rkd AS (SELECT vec_id, e, nrm, cid, ccos,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rc
      |        FROM a1),
      |cells AS (SELECT vec_id, e, nrm, cid AS cell FROM rkd WHERE rc = 1),
      |probes AS (SELECT vec_id AS qid, e AS qe, nrm AS qn, cid AS pcell
      |           FROM rkd WHERE vec_id < 10 AND rc <= ${graft.ops.Similarity.ivfProbes}),
      |cand AS (SELECT p.qid, x.vec_id, x.cell,
      |           list_sum([p.qe[i] * x.e[i] for i in range(1, len(p.qe)+1)]) / (p.qn * x.nrm) AS cosine
      |         FROM probes p JOIN cells x ON x.cell = p.pcell AND x.vec_id <> p.qid),
      |r AS (SELECT qid, vec_id, cell, cosine,
      |        row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk FROM cand)
      |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, cell, round(cosine, 6) AS cosine
      |FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin

  /** The s5 training-replay oracle, parameterized for the delete family:
    * first-k init, ivfLloydIters unrolled CTE rounds of (assign by
    * cosine, ties → smaller cid) then (component mean via exact
    * scaled-integer sums, empty/degenerate cell keeps its previous
    * centroid), then the s3 probe/top-k shape over the trained cells.
    * `searchPred` restricts which vectors may be QUERIES, `candPred`
    * which may be CANDIDATES (`x.`-qualified) — both empty for s5/s7/s8;
    * s9 excludes its tombstoned ids from both (the model itself always
    * trains on the FULL corpus: it froze before the deletes). Every
    * constant interpolated from graft.ops.Similarity; every float fold
    * is double, ascending index.
    */
  /** The shared training-replay CTE prefix: first-k init, ivfLloydIters
    * unrolled Lloyd's rounds, final assignment ranked per vector in `rkd`
    * (vec_id, e, nrm, cid, ccos, rc). Consumers append their own CTEs —
    * the s5 family builds probe/top-k over it; d22 builds within-cell
    * pair pruning. Emitted with WITH RECURSIVE so a consumer may append a
    * recursive CTE (harmless for the ones that don't).
    */
  private def ivfTrainedRkdPrefix: String = {
    val iters = graft.ops.Similarity.ivfLloydIters
    val iterCtes = (0 until iters).map { i =>
      s"""a$i AS (SELECT n.vec_id, n.e, c.cid,
        |         list_sum([n.e[i] * c.ce[i] for i in range(1, len(n.e)+1)]) / (n.nrm * c.cn) AS ccos
        |       FROM n, c$i c WHERE n.nrm > 0),
        |r$i AS (SELECT vec_id, e, cid,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rc FROM a$i),
        |g$i AS (SELECT cid, j, sum(CAST(floor(x * 1000000) AS BIGINT)) AS s, count(*) AS cnt
        |       FROM (SELECT cid, unnest(e) AS x, generate_subscripts(e, 1) AS j FROM r$i WHERE rc = 1)
        |       GROUP BY cid, j),
        |m$i AS (SELECT cid, list(CAST(s AS DOUBLE) / (cnt * 1000000.0) ORDER BY j) AS ce FROM g$i GROUP BY cid),
        |k$i AS (SELECT p.cid,
        |         CASE WHEN m.ce IS NOT NULL AND list_sum([x * x for x in m.ce]) > 0
        |              THEN m.ce ELSE p.ce END AS ce
        |       FROM c$i p LEFT JOIN m$i m USING (cid)),
        |c${i + 1} AS (SELECT cid, ce, sqrt(list_sum([x * x for x in ce])) AS cn FROM k$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
      |n AS (SELECT vec_id, e, sqrt(list_sum([e[i] * e[i] for i in range(1, len(e)+1)])) AS nrm FROM v),
      |c0 AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM n WHERE vec_id < ${graft.ops.Similarity.ivfCells}),
      |$iterCtes,
      |aa AS (SELECT n.vec_id, n.e, n.nrm, c.cid,
      |         list_sum([n.e[i] * c.ce[i] for i in range(1, len(n.e)+1)]) / (n.nrm * c.cn) AS ccos
      |       FROM n, c$iters c),
      |rkd AS (SELECT vec_id, e, nrm, cid, ccos,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rc FROM aa)""".stripMargin
  }

  private def ivfTrainedOracle(searchPred: String = "", candPred: String = ""): String = {
    s"""$ivfTrainedRkdPrefix,
      |cells AS (SELECT vec_id, e, nrm, cid AS cell FROM rkd WHERE rc = 1),
      |probes AS (SELECT vec_id AS qid, e AS qe, nrm AS qn, cid AS pcell
      |           FROM rkd WHERE vec_id < 10$searchPred AND rc <= ${graft.ops.Similarity.ivfProbes}),
      |cand AS (SELECT p.qid, x.vec_id, x.cell,
      |           list_sum([p.qe[i] * x.e[i] for i in range(1, len(p.qe)+1)]) / (p.qn * x.nrm) AS cosine
      |         FROM probes p JOIN cells x ON x.cell = p.pcell AND x.vec_id <> p.qid$candPred),
      |r AS (SELECT qid, vec_id, cell, cosine,
      |        row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk FROM cand)
      |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, cell, round(cosine, 6) AS cosine
      |FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin
  }

  private def baseOracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_selective_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(o_orderdate AS DATE) AS orderdate,
        |  o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 47)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(o_orderdate AS DATE) AS orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 15""".stripMargin,

    "q7_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |      AS running_spend
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q8_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q9_setops" ->
      """SELECT 'intersect' AS op, nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  INTERSECT
        |  SELECT DISTINCT s_nationkey AS nationkey FROM supplier) a
        |UNION ALL
        |SELECT 'except' AS op, nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
        |  EXCEPT
        |  SELECT DISTINCT s_nationkey AS nationkey FROM supplier) b
        |ORDER BY op, nationkey""".stripMargin,

    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q11_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q12_part_agg" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q13_events_json" ->
      """SELECT event_type,
        |  CAST(floor(CAST(regexp_extract(props, '"k":\s*([0-9]+)', 1) AS INT) / 10.0) * 10 AS INT) AS k_bucket,
        |  count(*) AS n
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY event_type, k_bucket""".stripMargin,

    "q14_events_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin,

    "q15_asof_join" ->
      """SELECT e.event_id, e.user_id,
        |  (SELECT max(o.o_orderkey) FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |     AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
        |                          WHERE o2.o_custkey = e.user_id
        |                            AND o2.o_orderdate <= e.ts)) AS asof_orderkey,
        |  (SELECT round(max_by(o.o_totalprice, o.o_orderkey), 2) FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |     AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
        |                          WHERE o2.o_custkey = e.user_id
        |                            AND o2.o_orderdate <= e.ts)) AS asof_totalprice
        |FROM events e
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin,

    "q16_range_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 7 DAY
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q17_above_type_avg" ->
      """SELECT p_partkey, p_type, p_retailprice, type_avg FROM (
        |  SELECT p_partkey, p_type, p_retailprice,
        |    round(avg(p_retailprice) OVER (PARTITION BY p_type), 2) AS type_avg
        |  FROM part) t
        |WHERE p_retailprice > type_avg
        |ORDER BY p_partkey""".stripMargin,

    "q22_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q23_percentiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q24_sessions" ->
      """WITH e AS (SELECT user_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, value) AS prev_ts
        |  FROM events),
        |f AS (SELECT user_id, ts, value,
        |    CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800
        |         THEN 1 ELSE 0 END AS new_session FROM e),
        |g AS (SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM f)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM g GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,

    "q25_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  date_diff('day',
        |    CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
        |    CAST(o_orderdate AS DATE)) AS days_since_prev,
        |  CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS quartile,
        |  round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 6) AS pct_rank
        |FROM orders
        |WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q26_string_funcs" ->
      """SELECT n_name,
        |  split_part(n_name, ' ', 1) AS first_word,
        |  CAST(levenshtein(n_name, 'UNITED STATES') AS INT) AS lev_us,
        |  translate(n_name, 'AEIOU', 'aeiou') AS lower_vowels,
        |  lpad(n_name, 20, '.') AS padded,
        |  CAST(length(regexp_replace(n_name, '[^A-Z]', '', 'g')) AS INT) AS n_upper
        |FROM nation ORDER BY n_name""".stripMargin,

    "q27_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(dayofweek(o_orderdate) AS INT) AS dow,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin,

    // Streaming path must equal the batch daily aggregation — same oracle
    // as q14 (the driver thereby checks batch/stream parity end-to-end).
    "q18_streaming_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin,

    // Multimodal: byte-bucket histogram features over the documents-derived
    // media table (ASCII text ⇒ byte == char code, so DuckDB replicates the
    // extraction character-wise).
    "m1_media_features" ->
      """WITH ch AS (SELECT doc_id, length(text) AS n,
        |    [ascii(text[i]) // 32 for i in range(1, length(text)+1)] AS bk
        |  FROM documents)
        |SELECT doc_id AS media_id, CAST(n AS INT) AS n_bytes,
        |  round(CAST(len(list_filter(bk, b -> b = 0)) AS DOUBLE) / n, 6) AS f0,
        |  round(CAST(len(list_filter(bk, b -> b = 1)) AS DOUBLE) / n, 6) AS f1,
        |  round(CAST(len(list_filter(bk, b -> b = 2)) AS DOUBLE) / n, 6) AS f2,
        |  round(CAST(len(list_filter(bk, b -> b = 3)) AS DOUBLE) / n, 6) AS f3,
        |  round(CAST(len(list_filter(bk, b -> b = 4)) AS DOUBLE) / n, 6) AS f4,
        |  round(CAST(len(list_filter(bk, b -> b = 5)) AS DOUBLE) / n, 6) AS f5,
        |  round(CAST(len(list_filter(bk, b -> b = 6)) AS DOUBLE) / n, 6) AS f6,
        |  round(CAST(len(list_filter(bk, b -> b = 7)) AS DOUBLE) / n, 6) AS f7
        |FROM ch ORDER BY media_id""".stripMargin,

    // Golden-VALUES oracles: DuckDB cannot read the XML fixture, so the
    // expected extraction output is inlined literally (hand-derived from
    // /root/reference/index.js semantics over FIXTURES.md §A).
    "ooh_occupations" ->
      """SELECT title, work_schedules, iq_json,
        |  CAST(median_pay_annual AS DOUBLE) AS median_pay_annual,
        |  n_jobs, what_they_do, pay_json, similar_json, industries_json
        |FROM (VALUES
        |  ('Archivists', 'Weekdays.', '{"Organizational skills plus care":"They keep originals safe."}', 57120.0, '7,100', 'Catalog history.', '{"archivists":27.46}', '["Curators"]', '{"Museums":"33","Government":"28"}'),
        |  ('Boundary Testers', 'Odd hours.', '{"abcdefghijklmnopqrstuvwxyz":"Twenty-six chars exactly.","abcdefghijklmnopqrstuvwxyzX":"Twenty-seven chars."}', 70000.0, '5,000', 'Probe edges.', '{"boundary testers":33.65}', '["Edge Finders"]', '{"QA":"90"}'),
        |  ('Data Engineers', 'Most work full time.', '{"Analytical skills":"They reason about data.","Very long quality name over 26 chars":"Sentence body."}', 104000.0, '168,000', 'One paragraph.', '{"data engineers":50.0,"junior data engineers":35.5}', '["Database Administrators"]', '{"Tech":"45","Finance":"20"}'),
        |  ('Military Careers', 'Deployments vary.', '{"Discipline":"They follow orders."}', NULL, NULL, NULL, NULL, NULL, NULL),
        |  ('Mystery Workers', NULL, NULL, 50000.0, '1,000', 'Unknown.', '{}', '["Nobody"]', '{"Misc":"100"}'),
        |  ('Statisticians', 'Full time, some overtime.', '{"Math skills":"They use statistics daily."}', 98920.0, '34,200', 'First part.Second part.', '{"statisticians":47.56}', '["Mathematicians","Actuaries"]', '{"Government":"40","Research":"25","Finance":"10"}'),
        |  ('Surveyors', 'Outdoor hours.', '{"Precision":"They measure twice."}', 63800.0, '48,100', 'Measure.', '{"surveyors":30.67}', '["Cartographers"]', '{"Engineering":"71","Government":null}'),
        |  ('Web Developers', 'Many are self-employed.', '{"Creativity":"They design things people enjoy."}', 80730.0, '190,200', 'Create sites.', '{"web developers":38.81,"digital designers":29.13}', '["Graphic Designers"]', '{"Design services":"17","Self-employed":"16"}')
        |) AS t(title, work_schedules, iq_json, median_pay_annual, n_jobs, what_they_do, pay_json, similar_json, industries_json)
        |ORDER BY title""".stripMargin,

    "ooh_report" ->
      """SELECT title, CAST(median_pay_annual AS DOUBLE) AS median_pay_annual,
        |  outlook_code, iq_json
        |FROM (VALUES
        |  ('Archivists', 57120.0, '6', '{"Organizational skills plus care":"They keep originals safe."}'),
        |  ('Boundary Testers', 70000.0, '5', '{"abcdefghijklmnopqrstuvwxyz":"Twenty-six chars exactly.","abcdefghijklmnopqrstuvwxyzX":"Twenty-seven chars."}'),
        |  ('Data Engineers', 104000.0, '7', '{"Analytical skills":"They reason about data.","Very long quality name over 26 chars":"Sentence body."}')
        |) AS t(title, median_pay_annual, outlook_code, iq_json)
        |ORDER BY title""".stripMargin,

    // LLM-data-pipeline ops. The MinHash/SimHash/LSH constructions hash
    // with md5 hex STRINGS (lexicographic mins, parity bits) specifically
    // so DuckDB reproduces them bit-for-bit; float work is DOUBLE in
    // identical fold order on both engines.
    "d1_exact_dedup" ->
      """SELECT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h,
        |  min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin,

    // The shingle document-frequency cap is interpolated from the SAME
    // constant the Spark operator uses (graft.ops.Dedup.maxShingleDf) — one
    // definition drives both engines.
    "d2_ngram_jaccard" ->
      s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])) AS shingle FROM toks),
        |dfq AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= ${graft.ops.Dedup.maxShingleDf}),
        |idx AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfq USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |          FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT d1, d2, round(CAST(inter AS DOUBLE) / (s1.n + s2.n - inter), 6) AS jaccard
        |FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        |WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.8
        |ORDER BY d1, d2""".stripMargin,

    "d3_minhash_lsh" ->
      s"""WITH $minhashCandCte
        |SELECT d1, d2, $minhashJacSql AS jaccard
        |FROM cand
        |WHERE $minhashJacSql >= 0.8
        |ORDER BY d1, d2""".stripMargin,

    // Incremental MinHash state: after any split-ingest sequence the pair
    // graph equals one-shot d3's, so the clustering is reachability over
    // it — the d7-style recursive walk on the d3 candidate CTE.
    "d15_minhash_incremental" ->
      s"""WITH RECURSIVE $minhashCandCte,
        |pairs AS (SELECT d1, d2 FROM cand WHERE $minhashJacSql >= 0.8),
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
        |walk(node, lab) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, w.lab FROM walk w JOIN edges e ON w.node = e.src),
        |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM walk GROUP BY node),
        |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
        |SELECT c.doc_id, c.cluster_id, s.cluster_size,
        |  CAST(CASE WHEN c.doc_id = c.cluster_id THEN 1 ELSE 0 END AS INT) AS is_keeper
        |FROM comp c JOIN sz s USING (cluster_id)
        |ORDER BY c.doc_id""".stripMargin,

    // Directional containment over the SAME df-capped inverted index as
    // d2; each unordered pair emits both directions, denominator = the
    // source doc's (uncapped) distinct-shingle count.
    "d9_containment" ->
      s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])) AS shingle FROM toks),
        |dfq AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= ${graft.ops.Dedup.maxShingleDf}),
        |idx AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfq USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |          FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |dirs AS (SELECT d1 AS src, d2 AS dst, inter FROM pairs
        |         UNION ALL SELECT d2, d1, inter FROM pairs)
        |SELECT src, dst, round(CAST(inter AS DOUBLE) / s.n, 6) AS containment
        |FROM dirs JOIN sizes s ON src = s.doc_id
        |WHERE CAST(inter AS DOUBLE) / s.n >= 0.9
        |ORDER BY src, dst""".stripMargin,

    // Exact-substring dedup: the oracle runs the IDENTICAL relational
    // algorithm — positional anchor windows, occurrence cap, anchor
    // equi-join, islands-and-gaps per alignment diagonal — constants
    // interpolated from graft.ops.Dedup (one definition, both engines).
    "d13_exact_substring" -> {
      val k = graft.ops.Dedup.anchorTokens
      s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS t FROM documents),
        |anch AS (SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+${k - 1}], ' ') AS anchor
        |         FROM (SELECT doc_id, t, unnest(range(1, len(t) - ${k - 2})) AS i
        |               FROM toks WHERE len(t) >= $k)),
        |idx AS (SELECT doc_id, pos, anchor FROM (
        |          SELECT doc_id, pos, anchor,
        |            count(*) OVER (PARTITION BY anchor) AS aocc FROM anch)
        |        WHERE aocc <= ${graft.ops.Dedup.anchorMaxOcc}),
        |m AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS i, b.pos AS j
        |      FROM idx a JOIN idx b ON a.anchor = b.anchor AND a.doc_id < b.doc_id),
        |r AS (SELECT d1, d2, j - i AS diag, i,
        |        i - row_number() OVER (PARTITION BY d1, d2, j - i ORDER BY i) AS grp FROM m),
        |runs AS (SELECT d1, d2, diag, grp, count(*) AS run FROM r GROUP BY 1, 2, 3, 4)
        |SELECT d1, d2, CAST(max(run) + ${k - 1} AS BIGINT) AS span_len
        |FROM runs GROUP BY d1, d2
        |HAVING max(run) + ${k - 1} >= ${graft.ops.Dedup.minSpanTokens}
        |ORDER BY d1, d2""".stripMargin
    },

    // Span removal: the d13 run CTEs extended with positions (min j per
    // run = the span's start in the LATER doc), coverage = union of the
    // qualifying runs' position ranges, cut = comprehension keeping the
    // uncovered tokens, sha256 over the single-space rejoin — the same
    // token/join convention both engines already share.
    "d26_span_removal" -> {
      val k = graft.ops.Dedup.anchorTokens
      s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS t FROM documents),
        |anch AS (SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+${k - 1}], ' ') AS anchor
        |         FROM (SELECT doc_id, t, unnest(range(1, len(t) - ${k - 2})) AS i
        |               FROM toks WHERE len(t) >= $k)),
        |idx AS (SELECT doc_id, pos, anchor FROM (
        |          SELECT doc_id, pos, anchor,
        |            count(*) OVER (PARTITION BY anchor) AS aocc FROM anch)
        |        WHERE aocc <= ${graft.ops.Dedup.anchorMaxOcc}),
        |m AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS i, b.pos AS j
        |      FROM idx a JOIN idx b ON a.anchor = b.anchor AND a.doc_id < b.doc_id),
        |r AS (SELECT d1, d2, j - i AS diag, i, j,
        |        i - row_number() OVER (PARTITION BY d1, d2, j - i ORDER BY i) AS grp FROM m),
        |runs AS (SELECT d1, d2, diag, grp, min(j) AS startj, count(*) AS run
        |         FROM r GROUP BY 1, 2, 3, 4),
        |cpos AS (SELECT DISTINCT d2 AS doc_id, unnest(range(startj, startj + run + ${k - 1})) AS cpos
        |         FROM runs WHERE run + ${k - 1} >= ${graft.ops.Dedup.minSpanTokens}),
        |cov AS (SELECT doc_id, list(cpos) AS cov FROM cpos GROUP BY doc_id),
        |cut AS (SELECT t2.doc_id, t2.t,
        |          CASE WHEN cov.cov IS NULL THEN t2.t
        |               ELSE [t2.t[i] for i in range(1, len(t2.t)+1) if NOT list_contains(cov.cov, i - 1)]
        |          END AS kept
        |        FROM toks t2 LEFT JOIN cov ON t2.doc_id = cov.doc_id)
        |SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
        |  CAST(len(t) - len(kept) AS INT) AS n_removed,
        |  sha256(coalesce(array_to_string(kept, ' '), '')) AS sha
        |FROM cut ORDER BY doc_id""".stripMargin
    },

    // k-anonymity: groups of quasi-identifiers smaller than k, exact
    // integer arithmetic throughout.
    "t11_kanonymity" ->
      """SELECT lang, source, CAST(floor(n_chars / 100.0) AS BIGINT) AS size_bucket,
        |  count(*) AS n
        |FROM documents
        |GROUP BY 1, 2, 3
        |HAVING count(*) < 5
        |ORDER BY lang, source, size_bucket""".stripMargin,

    // End-to-end curation: the d7 component walk + t10 quality stats +
    // c3 contamination screen, composed under the same rule precedence
    // the Spark surface applies; every threshold is an exact integer
    // cross-multiplication interpolated from graft.ops.Corpus.
    "c7_curation" -> {
      import graft.ops.Corpus._
      s"""WITH RECURSIVE $simhashHamCte,
        |pairs AS (SELECT d1, d2 FROM ham WHERE hamming <= 3),
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
        |walk(node, lab) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, w.lab FROM walk w JOIN edges e ON w.node = e.src),
        |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM walk GROUP BY node),
        |dups AS (SELECT doc_id FROM comp WHERE doc_id <> cluster_id),
        |q AS (SELECT d.doc_id, d.source,
        |        len(t.t) AS ntok, greatest(len(t.t) - 2, 0) AS ntri,
        |        len(list_distinct([array_to_string(t.t[i:i+2], ' ') for i in range(1, len(t.t)-1)])) AS ndis,
        |        length(d.text) AS nchar,
        |        length(d.text) - length(regexp_replace(d.text, '[^A-Za-z0-9 ]', '', 'g')) AS nsym,
        |        coalesce(CAST(list_sum([len(x) for x in t.t]) AS BIGINT), 0) AS totlen
        |      FROM documents d JOIN toks t USING (doc_id)),
        |sh2 AS (SELECT td.doc_id, d2.source,
        |          unnest(list_distinct([array_to_string(td.t[i:i+2], ' ') for i in range(1, len(td.t)-1)])) AS shingle
        |        FROM toks td JOIN documents d2 USING (doc_id)),
        |bench AS (SELECT DISTINCT shingle FROM sh2 WHERE source = '$benchmarkSource'),
        |own AS (SELECT doc_id, count(*) AS n_own FROM sh2 WHERE source <> '$benchmarkSource' GROUP BY 1),
        |shared AS (SELECT s.doc_id, count(*) AS n_shared
        |           FROM sh2 s JOIN bench USING (shingle) WHERE s.source <> '$benchmarkSource' GROUP BY 1),
        |cont AS (SELECT doc_id, n_shared, n_own FROM own JOIN shared USING (doc_id))
        |SELECT q.doc_id,
        |  CASE WHEN q.source = '$benchmarkSource' THEN 'benchmark'
        |       WHEN q.ntok < $curationMinTokens
        |            OR q.totlen < $curationMwlMin * q.ntok
        |            OR q.totlen > $curationMwlMax * q.ntok
        |            OR $curationSymbolPct * q.nsym > q.nchar
        |            OR 10 * (q.ntri - q.ndis) > $curationTriPct10 * q.ntri THEN 'quality'
        |       WHEN q.doc_id IN (SELECT doc_id FROM dups) THEN 'duplicate'
        |       WHEN $curationContHalf * cont.n_shared >= cont.n_own THEN 'contaminated'
        |       ELSE 'keep' END AS verdict
        |FROM q LEFT JOIN cont USING (doc_id)
        |ORDER BY q.doc_id""".stripMargin
    },

    "d4_simhash_sig" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |hs AS (SELECT doc_id, [md5(x) for x in t] AS hs FROM toks)
        |SELECT doc_id,
        |  array_to_string([CASE WHEN list_sum([
        |      ((CAST(floor((strpos('0123456789abcdef', h[CAST(b // 4 AS INT) + 1]) - 1) / (2 ** (3 - b % 4))) AS INT) % 2) * 2 - 1)
        |    for h in hs]) > 0 THEN '1' ELSE '0' END for b in range(0, 32)], '') AS simhash
        |FROM hs ORDER BY doc_id""".stripMargin,

    "d5_simhash_pairs" ->
      s"""WITH $simhashHamCte
        |SELECT d1, d2, hamming FROM ham WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin,

    // 64-bit SimHash replay: same per-bit vote from the md5 hex nibbles,
    // 64 bits wide; candidates from the 4 exact 16-char blocks (the
    // pigeonhole geometry the Spark job joins on), hamming char-wise.
    "d17_simhash64_pairs" ->
      s"""WITH $simhash64HamCte
        |SELECT d1, d2, hamming FROM ham WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin,

    // The 64-bit dial applied to the INCREMENTAL path: after any split
    // ingest the pair graph equals one-shot d17's, so the clustering is
    // reachability over it (the d7-style walk).
    "d19_simhash64_incremental" ->
      s"""WITH RECURSIVE $simhash64HamCte,
        |pairs AS (SELECT d1, d2 FROM ham WHERE hamming <= 3),
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
        |walk(node, lab) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, w.lab FROM walk w JOIN edges e ON w.node = e.src),
        |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM walk GROUP BY node),
        |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
        |SELECT c.doc_id, c.cluster_id, s.cluster_size,
        |  CAST(CASE WHEN c.doc_id = c.cluster_id THEN 1 ELSE 0 END AS INT) AS is_keeper
        |FROM comp c JOIN sz s USING (cluster_id)
        |ORDER BY c.doc_id""".stripMargin,

    // Connected components over the d5 pair graph: DuckDB walks
    // reachability with a recursive CTE (label `lab` reaches `node`), so
    // min(lab) per node is exactly the min-doc_id-in-component the Spark
    // label propagation converges to.
    "d7_dup_clusters" ->
      s"""WITH RECURSIVE $simhashHamCte,
        |pairs AS (SELECT d1, d2 FROM ham WHERE hamming <= 3),
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
        |walk(node, lab) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, w.lab FROM walk w JOIN edges e ON w.node = e.src),
        |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM walk GROUP BY node),
        |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
        |SELECT c.doc_id, c.cluster_id, s.cluster_size,
        |  CAST(CASE WHEN c.doc_id = c.cluster_id THEN 1 ELSE 0 END AS INT) AS is_keeper
        |FROM comp c JOIN sz s USING (cluster_id)
        |ORDER BY c.doc_id""".stripMargin,

    // Soft dedup: d7's cluster sizes (recursive-CTE CC replay) joined to
    // ALL docs (absent => size 1), salted md5 bucket, exact integer accept
    // test bucket*size < buckets — the same construction on both engines.
    "d25_soft_dedup" ->
      s"""WITH RECURSIVE $simhashHamCte,
        |pairs AS (SELECT d1, d2 FROM ham WHERE hamming <= 3),
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
        |walk(node, lab) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, w.lab FROM walk w JOIN edges e ON w.node = e.src),
        |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM walk GROUP BY node),
        |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id),
        |sizes AS (SELECT c.doc_id, s.cluster_size FROM comp c JOIN sz s USING (cluster_id)),
        |b AS (SELECT d.doc_id,
        |  CAST(COALESCE(sizes.cluster_size, 1) AS BIGINT) AS cluster_size,
        |  CAST(CAST(list_sum([(strpos('0123456789abcdef', md5('soft:' || CAST(d.doc_id AS VARCHAR))[i]) - 1) * (16 ** (8 - i)) for i in range(1, 9)]) AS BIGINT) % ${Dedup.softDedupBuckets} AS INT) AS bucket
        |  FROM documents d LEFT JOIN sizes ON d.doc_id = sizes.doc_id)
        |SELECT doc_id, cluster_size, bucket,
        |  CAST(CASE WHEN bucket * cluster_size < ${Dedup.softDedupBuckets} THEN 1 ELSE 0 END AS INT) AS kept
        |FROM b ORDER BY doc_id""".stripMargin,

    "s1_cosine_topk" ->
      """WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n0 AS (SELECT vec_id, e, sqrt(list_sum([e[i] * e[i] for i in range(1, len(e)+1)])) AS nrm FROM v),
        |n AS (SELECT * FROM n0 WHERE nrm > 0),
        |p AS (SELECT q.vec_id AS qid, c.vec_id AS vec_id,
        |        list_sum([q.e[i] * c.e[i] for i in range(1, len(q.e)+1)]) / (q.nrm * c.nrm) AS cosine
        |      FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |r AS (SELECT qid, vec_id, cosine,
        |        row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk FROM p)
        |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, round(cosine, 6) AS cosine
        |FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,

    "s2_ann_lsh" ->
      """WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_sum([e[i] * e[i] for i in range(1, len(e)+1)])) AS nrm FROM v),
        |bk AS (SELECT vec_id, e, nrm,
        |  array_to_string([CASE WHEN list_sum([
        |      (((strpos('0123456789abcdef', md5('h' || CAST(p AS VARCHAR) || ':' || CAST(j-1 AS VARCHAR))[1]) - 1) % 2) * 2 - 1) * e[j]
        |    for j in range(1, len(e)+1)]) > 0 THEN '1' ELSE '0' END for p in range(0, 8)], '') AS bucket
        |  FROM n),
        |p2 AS (SELECT a.vec_id AS vec_id, a.bucket AS bucket, b2.vec_id AS neighbor,
        |         list_sum([a.e[i] * b2.e[i] for i in range(1, len(a.e)+1)]) / (a.nrm * b2.nrm) AS cosine
        |       FROM bk a JOIN bk b2 ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id),
        |r AS (SELECT vec_id, bucket, neighbor, cosine,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor) AS rnk FROM p2)
        |SELECT vec_id, bucket, neighbor, round(cosine, 6) AS cosine
        |FROM r WHERE rnk = 1 ORDER BY vec_id""".stripMargin,

    // avg_stop_ratio: per-doc ratio floored to an integer at 1e12 scale,
    // summed exactly, divided once — aggregation-order-insensitive on both
    // engines (a plain avg(double) hash-flips on Spark's partial-agg order).
    "t1_lang_stats" ->
      """WITH toks AS (SELECT lang, n_chars,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents)
        |SELECT lang, count(*) AS n_docs, CAST(sum(len(t)) AS BIGINT) AS total_tokens,
        |  round(avg(len(t)), 4) AS avg_tokens,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  round(CAST(sum(CAST(floor((CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(t)) * 1e12) AS BIGINT)) AS DOUBLE) / count(*) / 1e12, 6) AS avg_stop_ratio
        |FROM toks GROUP BY lang ORDER BY lang""".stripMargin,

    "t2_lang_id" ->
      """WITH toks AS (SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |s AS (SELECT lang,
        |  len(list_filter(t, x -> x IN ('the','a','of','and'))) AS s_en,
        |  len(list_filter(t, x -> x IN ('der','die','und','nicht'))) AS s_de,
        |  len(list_filter(t, x -> x IN ('el','la','los','que'))) AS s_es,
        |  len(list_filter(t, x -> x IN ('le','les','des','est'))) AS s_fr
        |  FROM toks)
        |SELECT lang,
        |  CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
        |       WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
        |       WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
        |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
        |       ELSE 'fr' END AS predicted,
        |  count(*) AS n
        |FROM s GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,

    "t3_quality_scores" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |f AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS ntok,
        |        CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS dr,
        |        CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS sr
        |      FROM toks)
        |SELECT doc_id, CAST(ntok AS INT) AS ntok, round(dr, 6) AS distinct_ratio,
        |  round(CAST(0.4 AS DOUBLE) * least(ntok / 128, CAST(1.0 AS DOUBLE))
        |      + CAST(0.4 AS DOUBLE) * dr
        |      + CAST(0.2 AS DOUBLE) * least(sr * 4, CAST(1.0 AS DOUBLE)), 6) AS score
        |FROM f ORDER BY score DESC, doc_id LIMIT 25""".stripMargin,

    "t4_fingerprints" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |shl AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)]) AS sh FROM toks)
        |SELECT d.doc_id,
        |  array_to_string(list_sort([md5(s) for s in shl.sh])[1:5], '') AS bottomk,
        |  md5(lower(trim(regexp_replace(d.text, '\s+', ' ', 'g')))) AS content_md5
        |FROM documents d JOIN shl ON d.doc_id = shl.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "t5_token_freq" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    // the occupancy cap mirrors Similarity.maxBucketOccupancy: buckets
    // holding more vectors are dropped from candidate generation
    "d6_embedding_neardup" ->
      s"""WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_sum([e[i] * e[i] for i in range(1, len(e)+1)])) AS nrm FROM v),
        |bk AS (SELECT vec_id, e, nrm,
        |  array_to_string([CASE WHEN list_sum([
        |      (((strpos('0123456789abcdef', md5('h' || CAST(p AS VARCHAR) || ':' || CAST(j-1 AS VARCHAR))[1]) - 1) % 2) * 2 - 1) * e[j]
        |    for j in range(1, len(e)+1)]) > 0 THEN '1' ELSE '0' END for p in range(0, 8)], '') AS bucket
        |  FROM n),
        |occ AS (SELECT bucket FROM bk GROUP BY bucket HAVING count(*) <= ${graft.ops.Similarity.maxBucketOccupancy}),
        |bko AS (SELECT bk.* FROM bk JOIN occ USING (bucket)),
        |p2 AS (SELECT a.vec_id AS v1, b2.vec_id AS v2,
        |         round(list_sum([a.e[i] * b2.e[i] for i in range(1, len(a.e)+1)]) / (a.nrm * b2.nrm), 6) AS cosine
        |       FROM bko a JOIN bko b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
        |SELECT v1, v2, cosine FROM p2 WHERE cosine >= 0.4 ORDER BY v1, v2""".stripMargin,

    // d6's pair CTE (occupancy cap included) + d7's recursive component
    // walk, in embedding space.
    "d11_embedding_clusters" ->
      s"""WITH RECURSIVE v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_sum([e[i] * e[i] for i in range(1, len(e)+1)])) AS nrm FROM v),
        |bk AS (SELECT vec_id, e, nrm,
        |  array_to_string([CASE WHEN list_sum([
        |      (((strpos('0123456789abcdef', md5('h' || CAST(p AS VARCHAR) || ':' || CAST(j-1 AS VARCHAR))[1]) - 1) % 2) * 2 - 1) * e[j]
        |    for j in range(1, len(e)+1)]) > 0 THEN '1' ELSE '0' END for p in range(0, 8)], '') AS bucket
        |  FROM n),
        |occ AS (SELECT bucket FROM bk GROUP BY bucket HAVING count(*) <= ${graft.ops.Similarity.maxBucketOccupancy}),
        |bko AS (SELECT bk.* FROM bk JOIN occ USING (bucket)),
        |p2 AS (SELECT a.vec_id AS v1, b2.vec_id AS v2,
        |         round(list_sum([a.e[i] * b2.e[i] for i in range(1, len(a.e)+1)]) / (a.nrm * b2.nrm), 6) AS cosine
        |       FROM bko a JOIN bko b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id),
        |pairs AS (SELECT v1, v2 FROM p2 WHERE cosine >= 0.4),
        |edges AS (SELECT v1 AS src, v2 AS dst FROM pairs UNION ALL SELECT v2, v1 FROM pairs),
        |walk(node, lab) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, w.lab FROM walk w JOIN edges e ON w.node = e.src),
        |comp AS (SELECT node AS vec_id, min(lab) AS cluster_id FROM walk GROUP BY node),
        |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
        |SELECT c.vec_id, c.cluster_id, s.cluster_size,
        |  CAST(CASE WHEN c.vec_id = c.cluster_id THEN 1 ELSE 0 END AS INT) AS is_keeper
        |FROM comp c JOIN sz s USING (cluster_id)
        |ORDER BY c.vec_id""".stripMargin,

    // SemDeDup replay: trained cells from the shared Lloyd's prefix,
    // within-cell pairs at the tighter semantic threshold, recursive-CTE
    // CC, keeper = min rounded centroid-cosine (ties → min vec_id).
    "d22_semantic_dedup" ->
      s"""$ivfTrainedRkdPrefix,
        |cells AS (SELECT vec_id, e, nrm, cid AS cell, round(ccos, 6) AS ccos
        |          FROM rkd WHERE rc = 1 AND nrm > 0),
        |p2 AS (SELECT a.vec_id AS v1, b2.vec_id AS v2,
        |         round(list_sum([a.e[i] * b2.e[i] for i in range(1, len(a.e)+1)]) / (a.nrm * b2.nrm), 6) AS cosine
        |       FROM cells a JOIN cells b2 ON a.cell = b2.cell AND a.vec_id < b2.vec_id),
        |pairs AS (SELECT v1, v2 FROM p2 WHERE cosine >= ${graft.ops.Similarity.semDedupThreshold}),
        |edges AS (SELECT v1 AS src, v2 AS dst FROM pairs UNION ALL SELECT v2, v1 FROM pairs),
        |walk(node, lab) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, w.lab FROM walk w JOIN edges e ON w.node = e.src),
        |comp AS (SELECT node AS vec_id, min(lab) AS cluster_id FROM walk GROUP BY node),
        |lab2 AS (SELECT c.vec_id, x.cell, c.cluster_id,
        |          row_number() OVER (PARTITION BY c.cluster_id ORDER BY x.ccos, c.vec_id) AS rk
        |        FROM comp c JOIN cells x USING (vec_id))
        |SELECT vec_id, cell, cluster_id,
        |  CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INT) AS is_keeper
        |FROM lab2 ORDER BY vec_id""".stripMargin,

    // 32-plane signature sliced into 4 band keys; candidates when ANY band
    // matches (OR-construction), per-band occupancy cap, exact verify.
    "d16_srp_banded" ->
      s"""WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_sum([e[i] * e[i] for i in range(1, len(e)+1)])) AS nrm FROM v),
        |sg AS (SELECT vec_id,
        |  array_to_string([CASE WHEN list_sum([
        |      (((strpos('0123456789abcdef', md5('h' || CAST(p AS VARCHAR) || ':' || CAST(j-1 AS VARCHAR))[1]) - 1) % 2) * 2 - 1) * e[j]
        |    for j in range(1, len(e)+1)]) > 0 THEN '1' ELSE '0' END for p in range(0, ${graft.ops.Similarity.srpBands * graft.ops.Similarity.srpBandWidth})], '') AS sig
        |  FROM n),
        |bands AS (SELECT vec_id,
        |    CAST(b AS VARCHAR) || ':' || substr(sig, CAST(b * ${graft.ops.Similarity.srpBandWidth} + 1 AS INT), ${graft.ops.Similarity.srpBandWidth}) AS bkey
        |  FROM sg, range(0, ${graft.ops.Similarity.srpBands}) t(b)),
        |occ AS (SELECT bkey FROM bands GROUP BY bkey HAVING count(*) <= ${graft.ops.Similarity.maxBucketOccupancy}),
        |bo AS (SELECT bands.* FROM bands JOIN occ USING (bkey)),
        |cand AS (SELECT DISTINCT a.vec_id AS v1, b2.vec_id AS v2
        |         FROM bo a JOIN bo b2 ON a.bkey = b2.bkey AND a.vec_id < b2.vec_id),
        |p AS (SELECT v1, v2,
        |        round(list_sum([x.e[i] * y.e[i] for i in range(1, len(x.e)+1)]) / (x.nrm * y.nrm), 6) AS cosine
        |      FROM cand JOIN n x ON cand.v1 = x.vec_id JOIN n y ON cand.v2 = y.vec_id)
        |SELECT v1, v2, cosine FROM p WHERE cosine >= 0.4 ORDER BY v1, v2""".stripMargin,

    "t6_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token FROM documents),
        |nt AS (SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x <> '')) AS ntok FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM documents)
        |SELECT tf.doc_id, tf.token,
        |  round((CAST(tf.tf AS DOUBLE) / nt.ntok) * ln(CAST(nn.n AS DOUBLE) / df.df), 6) AS tfidf
        |FROM tf JOIN nt USING (doc_id) JOIN df USING (token) CROSS JOIN nn
        |ORDER BY tfidf DESC, doc_id, token LIMIT 25""".stripMargin,

    // IVF ANN: centroids = vectors with vec_id < cells; assignment and
    // probe ranking tie-break by smaller cell id, top-k by smaller vec_id —
    // all constants interpolated from graft.ops.Similarity. One template,
    // two surfaces: s3 (literal-centroid path, 16 cells) and s6 (native
    // ivf_probe path, 64 cells) — the engine-side plans differ, the
    // semantics must not.
    "s3_ann_ivf" -> ivfFirstKOracle(graft.ops.Similarity.ivfCells),
    "s6_ann_ivf_wide" -> ivfFirstKOracle(graft.ops.Similarity.ivfCellsWide),

    // Recall audit: the s1 exact-top-k CTEs and the s3 IVF CTEs composed
    // (shared v/n0 prefix; s3's `n` is literally n0), one left join on
    // (query, neighbor), per-query hit count / recall.
    "s10_ann_recall_audit" ->
      s"""WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n0 AS (SELECT vec_id, e, sqrt(list_sum([e[i] * e[i] for i in range(1, len(e)+1)])) AS nrm FROM v),
        |nex AS (SELECT * FROM n0 WHERE nrm > 0),
        |ep AS (SELECT q.vec_id AS qid, c.vec_id AS vec_id,
        |        list_sum([q.e[i] * c.e[i] for i in range(1, len(q.e)+1)]) / (q.nrm * c.nrm) AS cosine
        |      FROM nex q, nex c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |er AS (SELECT qid, vec_id,
        |        row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk FROM ep),
        |ex AS (SELECT qid, vec_id FROM er WHERE rnk <= 3),
        |c AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM n0 WHERE vec_id < ${graft.ops.Similarity.ivfCells}),
        |a1 AS (SELECT n0.vec_id, n0.e, n0.nrm, c.cid,
        |         list_sum([n0.e[i] * c.ce[i] for i in range(1, len(n0.e)+1)]) / (n0.nrm * c.cn) AS ccos
        |       FROM n0, c),
        |rkd AS (SELECT vec_id, e, nrm, cid, ccos,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rc
        |        FROM a1),
        |cells AS (SELECT vec_id, e, nrm, cid AS cell FROM rkd WHERE rc = 1),
        |probes AS (SELECT vec_id AS qid, e AS qe, nrm AS qn, cid AS pcell
        |           FROM rkd WHERE vec_id < 10 AND rc <= ${graft.ops.Similarity.ivfProbes}),
        |cand AS (SELECT p.qid, x.vec_id,
        |           list_sum([p.qe[i] * x.e[i] for i in range(1, len(p.qe)+1)]) / (p.qn * x.nrm) AS cosine
        |         FROM probes p JOIN cells x ON x.cell = p.pcell AND x.vec_id <> p.qid),
        |ar AS (SELECT qid, vec_id,
        |        row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk FROM cand),
        |ap AS (SELECT qid, vec_id FROM ar WHERE rnk <= 3)
        |SELECT e.qid, CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS recall
        |FROM ex e LEFT JOIN ap a ON a.qid = e.qid AND a.vec_id = e.vec_id
        |GROUP BY e.qid ORDER BY e.qid""".stripMargin,

    // Product quantization replay: codebooks = subvectors of the first
    // pqCodes vectors (code = rank in vec_id order), assignment argmax on
    // 2<x,c> - |c|^2 with ties to the smaller code, ADC = per-subspace
    // partial dots summed in ascending-subspace order, score divided by
    // the reconstruction norm. Every float fold is double, ascending
    // index — bit-identical to the Spark expressions.
    "s11_pq_topk" -> {
      val m = graft.ops.Quantization.pqSubspaces
      val kc = graft.ops.Quantization.pqCodes
      val nq = graft.ops.Quantization.pqQueries
      val k = graft.ops.Quantization.pqTopK
      s"""WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |sp AS (SELECT CAST(r.range AS INT) AS s FROM range(0, $m) r),
        |sub AS (SELECT vec_id, s, e[(s*(len(e)//$m)+1):((s+1)*(len(e)//$m))] AS x FROM v, sp),
        |cbk AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, vec_id FROM v WHERE vec_id < $kc),
        |cbs AS (SELECT cbk.code, sub.s, sub.x AS c,
        |          list_sum([sub.x[i]*sub.x[i] for i in range(1, len(sub.x)+1)]) AS cc
        |        FROM cbk JOIN sub ON cbk.vec_id = sub.vec_id),
        |sco AS (SELECT t.vec_id, t.s, c2.code,
        |          2*list_sum([t.x[i]*c2.c[i] for i in range(1, len(t.x)+1)]) - c2.cc AS score
        |        FROM sub t JOIN cbs c2 ON t.s = c2.s),
        |enc AS (SELECT vec_id, s, code FROM sco
        |        QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY score DESC, code) = 1),
        |rn AS (SELECT e2.vec_id, sqrt(list_sum(list(c2.cc ORDER BY e2.s))) AS rn
        |       FROM enc e2 JOIN cbs c2 ON e2.s = c2.s AND e2.code = c2.code GROUP BY e2.vec_id),
        |qn AS (SELECT vec_id AS qid, sqrt(list_sum([e[i]*e[i] for i in range(1, len(e)+1)])) AS qn
        |       FROM v WHERE vec_id < $nq),
        |parts AS (SELECT q.vec_id AS qid, e3.vec_id AS vec_id, q.s,
        |            list_sum([q.x[i]*c3.c[i] for i in range(1, len(q.x)+1)]) AS part
        |          FROM sub q JOIN enc e3 ON q.vec_id < $nq AND e3.vec_id <> q.vec_id AND e3.s = q.s
        |          JOIN cbs c3 ON c3.s = e3.s AND c3.code = e3.code),
        |adc AS (SELECT qid, vec_id, list_sum(list(part ORDER BY s)) AS adc FROM parts GROUP BY qid, vec_id),
        |sc2 AS (SELECT a.qid, a.vec_id, a.adc / (q2.qn * r2.rn) AS approx_cosine
        |        FROM adc a JOIN qn q2 ON a.qid = q2.qid JOIN rn r2 ON a.vec_id = r2.vec_id
        |        WHERE q2.qn > 0 AND r2.rn > 0),
        |rk AS (SELECT qid, vec_id, approx_cosine,
        |         row_number() OVER (PARTITION BY qid ORDER BY approx_cosine DESC, vec_id) AS rnk FROM sc2)
        |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, round(approx_cosine, 6) AS approx_cosine
        |FROM rk WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
    },

    // PQ recall audit: the s1 exact-top-k CTEs and the s11 encode/ADC
    // CTEs composed (s10's shape on the quantization axis), one left
    // join on (query, neighbor), per-query hit count / recall.
    "s14_pq_recall_audit" -> {
      val m = graft.ops.Quantization.pqSubspaces
      val kc = graft.ops.Quantization.pqCodes
      val nq = graft.ops.Quantization.pqQueries
      val k = graft.ops.Quantization.pqTopK
      s"""WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n0 AS (SELECT vec_id, e, sqrt(list_sum([e[i] * e[i] for i in range(1, len(e)+1)])) AS nrm FROM v),
        |nex AS (SELECT * FROM n0 WHERE nrm > 0),
        |ep AS (SELECT q.vec_id AS qid, c.vec_id AS vec_id,
        |        list_sum([q.e[i] * c.e[i] for i in range(1, len(q.e)+1)]) / (q.nrm * c.nrm) AS cosine
        |      FROM nex q, nex c WHERE q.vec_id < $nq AND c.vec_id <> q.vec_id),
        |er AS (SELECT qid, vec_id,
        |        row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk FROM ep),
        |ex AS (SELECT qid, vec_id FROM er WHERE rnk <= $k),
        |sp AS (SELECT CAST(r.range AS INT) AS s FROM range(0, $m) r),
        |sub AS (SELECT vec_id, s, e[(s*(len(e)//$m)+1):((s+1)*(len(e)//$m))] AS x FROM v, sp),
        |cbk AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, vec_id FROM v WHERE vec_id < $kc),
        |cbs AS (SELECT cbk.code, sub.s, sub.x AS c,
        |          list_sum([sub.x[i]*sub.x[i] for i in range(1, len(sub.x)+1)]) AS cc
        |        FROM cbk JOIN sub ON cbk.vec_id = sub.vec_id),
        |sco AS (SELECT t.vec_id, t.s, c2.code,
        |          2*list_sum([t.x[i]*c2.c[i] for i in range(1, len(t.x)+1)]) - c2.cc AS score
        |        FROM sub t JOIN cbs c2 ON t.s = c2.s),
        |enc AS (SELECT vec_id, s, code FROM sco
        |        QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY score DESC, code) = 1),
        |rn AS (SELECT e2.vec_id, sqrt(list_sum(list(c2.cc ORDER BY e2.s))) AS rn
        |       FROM enc e2 JOIN cbs c2 ON e2.s = c2.s AND e2.code = c2.code GROUP BY e2.vec_id),
        |qn AS (SELECT vec_id AS qid, sqrt(list_sum([e[i]*e[i] for i in range(1, len(e)+1)])) AS qn
        |       FROM v WHERE vec_id < $nq),
        |parts AS (SELECT q.vec_id AS qid, e3.vec_id AS vec_id, q.s,
        |            list_sum([q.x[i]*c3.c[i] for i in range(1, len(q.x)+1)]) AS part
        |          FROM sub q JOIN enc e3 ON q.vec_id < $nq AND e3.vec_id <> q.vec_id AND e3.s = q.s
        |          JOIN cbs c3 ON c3.s = e3.s AND c3.code = e3.code),
        |adcq AS (SELECT qid, vec_id, list_sum(list(part ORDER BY s)) AS adc FROM parts GROUP BY qid, vec_id),
        |sc2 AS (SELECT a.qid, a.vec_id, a.adc / (q2.qn * r2.rn) AS approx_cosine
        |        FROM adcq a JOIN qn q2 ON a.qid = q2.qid JOIN rn r2 ON a.vec_id = r2.vec_id
        |        WHERE q2.qn > 0 AND r2.rn > 0),
        |rk2 AS (SELECT qid, vec_id,
        |         row_number() OVER (PARTITION BY qid ORDER BY approx_cosine DESC, vec_id) AS rnk FROM sc2),
        |ap AS (SELECT qid, vec_id FROM rk2 WHERE rnk <= $k)
        |SELECT e.qid, CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS recall
        |FROM ex e LEFT JOIN ap a ON a.qid = e.qid AND a.vec_id = e.vec_id
        |GROUP BY e.qid ORDER BY e.qid""".stripMargin
    },

    // IVF-PQ: the s3 cell/probe CTEs composed with the s11 encode/ADC
    // CTEs — candidates restricted to each query's probed cells, scored
    // by ADC against the codes.
    "s12_ivf_pq" -> {
      val m = graft.ops.Quantization.pqSubspaces
      val kc = graft.ops.Quantization.pqCodes
      val nq = graft.ops.Quantization.pqQueries
      val k = graft.ops.Quantization.pqTopK
      val cells = graft.ops.Similarity.ivfCells
      val probes = graft.ops.Similarity.ivfProbes
      s"""WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |n AS (SELECT vec_id, e, sqrt(list_sum([e[i] * e[i] for i in range(1, len(e)+1)])) AS nrm FROM v),
        |c AS (SELECT vec_id AS cid, e AS ce, nrm AS cn FROM n WHERE vec_id < $cells),
        |a1 AS (SELECT n.vec_id, n.nrm, c.cid,
        |         list_sum([n.e[i] * c.ce[i] for i in range(1, len(n.e)+1)]) / (n.nrm * c.cn) AS ccos
        |       FROM n, c),
        |rkd AS (SELECT vec_id, cid, ccos,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rc
        |        FROM a1),
        |cells AS (SELECT vec_id, cid AS cell FROM rkd WHERE rc = 1),
        |prb AS (SELECT vec_id AS qid, cid AS pcell FROM rkd WHERE vec_id < $nq AND rc <= $probes),
        |sp AS (SELECT CAST(r.range AS INT) AS s FROM range(0, $m) r),
        |sub AS (SELECT vec_id, s, e[(s*(len(e)//$m)+1):((s+1)*(len(e)//$m))] AS x FROM v, sp),
        |cbk AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, vec_id FROM v WHERE vec_id < $kc),
        |cbs AS (SELECT cbk.code, sub.s, sub.x AS c,
        |          list_sum([sub.x[i]*sub.x[i] for i in range(1, len(sub.x)+1)]) AS cc
        |        FROM cbk JOIN sub ON cbk.vec_id = sub.vec_id),
        |sco AS (SELECT t.vec_id, t.s, c2.code,
        |          2*list_sum([t.x[i]*c2.c[i] for i in range(1, len(t.x)+1)]) - c2.cc AS score
        |        FROM sub t JOIN cbs c2 ON t.s = c2.s),
        |enc AS (SELECT vec_id, s, code FROM sco
        |        QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY score DESC, code) = 1),
        |rn AS (SELECT e2.vec_id, sqrt(list_sum(list(c2.cc ORDER BY e2.s))) AS rn
        |       FROM enc e2 JOIN cbs c2 ON e2.s = c2.s AND e2.code = c2.code GROUP BY e2.vec_id),
        |qn AS (SELECT vec_id AS qid, sqrt(list_sum([e[i]*e[i] for i in range(1, len(e)+1)])) AS qn
        |       FROM v WHERE vec_id < $nq),
        |cand AS (SELECT p.qid, x.vec_id, x.cell FROM prb p
        |         JOIN cells x ON x.cell = p.pcell AND x.vec_id <> p.qid),
        |parts AS (SELECT cand.qid, cand.vec_id, cand.cell, q.s,
        |            list_sum([q.x[i]*c3.c[i] for i in range(1, len(q.x)+1)]) AS part
        |          FROM cand JOIN sub q ON q.vec_id = cand.qid
        |          JOIN enc e3 ON e3.vec_id = cand.vec_id AND e3.s = q.s
        |          JOIN cbs c3 ON c3.s = e3.s AND c3.code = e3.code),
        |adc AS (SELECT qid, vec_id, any_value(cell) AS cell,
        |          list_sum(list(part ORDER BY s)) AS adc
        |        FROM parts GROUP BY qid, vec_id),
        |sc2 AS (SELECT a.qid, a.vec_id, a.cell, a.adc / (q2.qn * r2.rn) AS approx_cosine
        |        FROM adc a JOIN qn q2 ON a.qid = q2.qid JOIN rn r2 ON a.vec_id = r2.vec_id
        |        WHERE q2.qn > 0 AND r2.rn > 0),
        |rk AS (SELECT qid, vec_id, cell, approx_cosine,
        |         row_number() OVER (PARTITION BY qid ORDER BY approx_cosine DESC, vec_id) AS rnk FROM sc2)
        |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, cell, round(approx_cosine, 6) AS approx_cosine
        |FROM rk WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
    },

    // IVF with Lloyd's-TRAINED centroids: the oracle replays the full
    // deterministic training loop — first-k init, ivfLloydIters unrolled
    // CTE rounds of (assign by cosine, ties → smaller cid) then
    // (component mean via exact scaled-integer sums, empty/degenerate
    // cell keeps its previous centroid) — then the s3 probe/top-k shape
    // over the trained cells. Every constant interpolated from
    // graft.ops.Similarity; every float fold is double, ascending index.
    "s5_ann_ivf_trained" -> ivfTrainedOracle(),

    // s9: the SAME trained model and probe shape, with the tombstoned
    // vec_ids excluded from BOTH probe sides (queries and candidates) —
    // the model is frozen before deletes, so training still replays over
    // the full corpus; only the search corpus shrinks.
    "s9_ann_delete" -> ivfTrainedOracle(searchPred = " AND (vec_id % 7) <> 3",
      candPred = " AND (x.vec_id % 7) <> 3"),

    // Append-mode watermarked windows: only windows closed by the FINAL
    // watermark (max event time truncated to Spark's millisecond watermark
    // precision, minus the delay) are emitted — the oracle replicates that
    // eviction predicate exactly.
    "q28_stream_hourly" ->
      """WITH mx AS (SELECT date_trunc('millisecond', max(ts)) - INTERVAL 10 MINUTE AS wm FROM events),
        |w AS (SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |        count(*) AS n, round(sum(value), 2) AS sum_value
        |      FROM events GROUP BY 1, 2)
        |SELECT hour_start, event_type, n, sum_value
        |FROM w, mx
        |WHERE hour_start + INTERVAL 1 HOUR <= wm
        |ORDER BY hour_start, event_type""".stripMargin,

    // The salted join must produce exactly the plain join's result — the
    // salt moves rows between tasks, never between groups.
    "q29_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // Frame sampling over ASCII payloads: byte offsets == char offsets, so
    // DuckDB reproduces the byte-range extraction with substr arithmetic.
    "m2_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(f AS INT) AS frame_no, CAST(off AS INT) AS frame_off,
        |  substr(text, CAST(off AS INT) + 1, 16) AS frame_text
        |FROM (SELECT doc_id, text, f,
        |        (CAST(f AS BIGINT) * greatest(length(text) - 16, 0)) // 3 AS off
        |      FROM documents, (SELECT unnest(range(0, 4)) AS f))
        |ORDER BY media_id, frame_no""".stripMargin,

    // Streaming dedup emits the distinct key set (see
    // EventsStream.runDedupAvailableNow for why that is deterministic).
    "q30_stream_dedup" ->
      """SELECT user_id, event_type, CAST(date_trunc('day', ts) AS DATE) AS day_ts
        |FROM events GROUP BY 1, 2, 3
        |ORDER BY user_id, event_type, day_ts""".stripMargin,

    // Int8-quantized cosine: scales cancel, so qcos = cosine of the int
    // vectors; integer dots are exact in doubles on both engines.
    "s4_quantized_topk" ->
      """WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS e FROM embeddings),
        |sc AS (SELECT vec_id, e, list_max([abs(x) for x in e]) / 127.0 AS s FROM v),
        |q AS (SELECT vec_id, [round(x / s) for x in e] AS q FROM sc WHERE s > 0),
        |n AS (SELECT vec_id, q, sqrt(list_sum([x*x for x in q])) AS qnrm FROM q),
        |p AS (SELECT a.vec_id AS qid, b.vec_id AS vec_id,
        |        list_sum([a.q[i]*b.q[i] for i in range(1, len(a.q)+1)]) / (a.qnrm*b.qnrm) AS qcos
        |      FROM n a, n b WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id),
        |r AS (SELECT qid, vec_id, qcos,
        |        row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, vec_id) AS rnk FROM p)
        |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, round(qcos, 6) AS qcos
        |FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,

    "q33_full_outer" ->
      """WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer
        |           WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000 GROUP BY 1),
        |s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier
        |      WHERE s_acctbal > 9000 GROUP BY 1)
        |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,

    // Pivot = conditional aggregation, spelled out per status value.
    "q34_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // CDC "last record wins" compaction = per-key top-1.
    "q35_latest_per_key" ->
      """WITH r AS (SELECT user_id, event_id, ts, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, ts, event_type FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    // Stream-stream funnel join: the batch interval join the streaming
    // inner join provably equals on a drained source.
    "q32_stream_funnel" ->
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
        |  a.ts AS click_ts, b.ts AS purchase_ts
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        |  AND a.event_type = 'click' AND b.event_type = 'purchase'
        |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY a.user_id, click_id, purchase_id""".stripMargin,

    // The custom bounded-heap operator must produce exactly what the
    // window formulation produces — the oracle IS the window formulation.
    "q31_topk_per_key" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice FROM r WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    // KMV bottom-k sketch: k smallest distinct md5 digests per group,
    // ascending — DuckDB replicates the whole aggregate declaratively.
    "b1_bottomk_sketch" ->
      """SELECT lang,
        |  array_to_string(list_sort(list_distinct(list(md5(text))))[1:8], ',') AS sketch,
        |  count(DISTINCT text) AS n_distinct
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // KMV distinct estimate from the b1 sketch: (k-1)/fraction-of-hash-
    // space of the k-th smallest hash. Only the first 13 hex digits (52
    // bits) enter the arithmetic so every step before the final division
    // is exact on both engines.
    "b2_kmv_estimate" -> {
      val k = Corpus.kmvK
      val num = (k - 1).toDouble * math.pow(2, 52)
      s"""WITH sk AS (SELECT lang, list_sort(list_distinct(list(md5(text))))[1:$k] AS sk,
        |              count(DISTINCT text) AS n_exact
        |            FROM documents GROUP BY lang)
        |SELECT lang, n_exact,
        |  round(CASE WHEN len(sk) < $k THEN CAST(len(sk) AS DOUBLE)
        |    ELSE $num / list_sum([(strpos('0123456789abcdef', sk[$k][i]) - 1) * (16.0 ** (13 - i)) for i in range(1, 14)])
        |  END, 3) AS kmv_estimate
        |FROM sk ORDER BY lang""".stripMargin
    },

    // KMV set-op replay: per-source sketches, pairwise bottom-k merges,
    // theta-style intersection share; same 52-bit hex arithmetic as b2.
    "b3_kmv_setops" -> {
      val k = Corpus.kmvK
      val num = (k - 1).toDouble * math.pow(2, 52)
      s"""WITH sk AS (SELECT source, list_sort(list_distinct(list(md5(text))))[1:$k] AS sk
        |            FROM documents GROUP BY source),
        |p AS (SELECT a.source AS src1, b.source AS src2, a.sk AS ska, b.sk AS skb
        |      FROM sk a JOIN sk b ON a.source < b.source),
        |u AS (SELECT src1, src2, ska, skb, list_sort(list_distinct(ska || skb))[1:$k] AS us FROM p),
        |m AS (SELECT src1, src2, us,
        |        len(list_filter(us, x -> list_contains(ska, x) AND list_contains(skb, x))) AS n_common
        |      FROM u),
        |e AS (SELECT src1, src2, n_common, us,
        |        CASE WHEN len(us) < $k THEN CAST(len(us) AS DOUBLE)
        |          ELSE $num / list_sum([(strpos('0123456789abcdef', us[$k][i]) - 1) * (16.0 ** (13 - i)) for i in range(1, 14)])
        |        END AS eu
        |      FROM m),
        |dx AS (SELECT DISTINCT source, text FROM documents),
        |ex AS (SELECT x.source AS src1, y.source AS src2, count(DISTINCT x.text) AS n_exact_common
        |       FROM dx x JOIN dx y ON x.text = y.text AND x.source < y.source GROUP BY 1, 2)
        |SELECT e.src1, e.src2, CAST(n_common AS BIGINT) AS n_common,
        |  round(eu, 3) AS est_union,
        |  round((CAST(n_common AS DOUBLE) / len(us)) * eu, 3) AS est_intersect,
        |  COALESCE(ex.n_exact_common, 0) AS n_exact_common
        |FROM e LEFT JOIN ex ON e.src1 = ex.src1 AND e.src2 = ex.src2
        |ORDER BY e.src1, e.src2""".stripMargin
    },

    // Heavy hitters: the sketch+recount is provably exact (it raises
    // in-plan otherwise), so the oracle is the direct exact top-20 —
    // t5's text, deliberately shared (b5/q82 share it too, via m(...)).
    "b4_heavy_hitters" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    // Top-k after a doc-level delete: the direct top-20 over survivors.
    "b6_topk_delete" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |      FROM documents WHERE doc_id % 7 <> 3)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    // Token-window chunking: same geometry constants as Corpus.chunk.
    "c1_chunking" -> {
      val w = Corpus.chunkTokens
      val s = Corpus.strideTokens
      s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |nc AS (SELECT doc_id, t,
        |         CASE WHEN len(t) <= $w THEN 1
        |              ELSE CAST(ceil((len(t) - $w) / $s.0) AS INT) + 1 END AS nc
        |       FROM toks),
        |ch AS (SELECT doc_id, t, unnest(range(0, nc)) AS c FROM nc)
        |SELECT doc_id, CAST(c AS INT) AS chunk_no,
        |  CAST(len(t[c*$s+1 : c*$s+$w]) AS INT) AS n_tokens,
        |  array_to_string(t[c*$s+1 : c*$s+$w], ' ') AS chunk_text
        |FROM ch ORDER BY doc_id, chunk_no""".stripMargin
    },

    // Deterministic stratified sampling: bucket 0..99 from the first 32
    // md5 bits of the doc id; rates interpolated from Corpus.sampleRates.
    "c2_hash_sample" -> {
      val rateCase = "CASE lang " +
        Corpus.sampleRates.map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ") +
        s" ELSE ${Corpus.defaultRate} END"
      s"""WITH b AS (SELECT doc_id, lang,
        |  CAST(CAST(list_sum([(strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[i]) - 1) * (16 ** (8 - i)) for i in range(1, 9)]) AS BIGINT) % 100 AS INT) AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM b
        |WHERE bucket < $rateCase
        |ORDER BY doc_id""".stripMargin
    },

    // Decontamination: shared distinct 3-shingles between each training
    // doc and the benchmark slice (source interpolated from Corpus).
    "c3_contamination" -> {
      val b = Corpus.benchmarkSource
      s"""WITH toks AS (SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |sh AS (SELECT doc_id, source, unnest(list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])) AS shingle FROM toks),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE source = '$b'),
        |own AS (SELECT doc_id, count(*) AS n_own FROM sh WHERE source <> '$b' GROUP BY 1),
        |shared AS (SELECT s.doc_id, count(*) AS n_shared
        |           FROM sh s JOIN bench USING (shingle) WHERE s.source <> '$b' GROUP BY 1)
        |SELECT o.doc_id, n_shared, n_own, round(CAST(n_shared AS DOUBLE) / n_own, 6) AS ratio
        |FROM own o JOIN shared s2 ON o.doc_id = s2.doc_id
        |ORDER BY o.doc_id""".stripMargin
    },

    // DSIR replay: hashed unigram+bigram bags (2 md5 hex digits → 256
    // buckets), Laplace-smoothed log-ratio weights frozen to integer
    // micro-nats, per-doc INTEGER dot-product score, top-N. The scaled
    // integers make the sum aggregation-order-exact in both engines.
    "c11_importance_select" -> {
      val b = Corpus.benchmarkSource
      val nb = Corpus.dsirBuckets
      val n = Corpus.dsirSelectN
      s"""WITH toks AS (SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |fstr AS (SELECT doc_id, source, unnest(t) AS f FROM toks
        |         UNION ALL
        |         SELECT doc_id, source, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS f FROM toks),
        |feats AS (SELECT doc_id, source,
        |            (strpos('0123456789abcdef', md5(f)[1]) - 1) * 16 + (strpos('0123456789abcdef', md5(f)[2]) - 1) AS b
        |          FROM fstr),
        |tb AS (SELECT b, CAST(count(*) AS BIGINT) AS tc FROM feats WHERE source = '$b' GROUP BY b),
        |rb AS (SELECT b, CAST(count(*) AS BIGINT) AS rc FROM feats WHERE source <> '$b' GROUP BY b),
        |sp AS (SELECT unnest(range(0, $nb)) AS b),
        |w AS (SELECT sp.b, COALESCE(tc, 0) AS tc, COALESCE(rc, 0) AS rc
        |      FROM sp LEFT JOIN tb ON sp.b = tb.b LEFT JOIN rb ON sp.b = rb.b),
        |wt AS (SELECT b,
        |         CAST(round((ln(tc + 1) - ln(rc + 1)) * 1000000) AS BIGINT) AS lw,
        |         CAST(round((ln((SELECT CAST(sum(rc) AS BIGINT) FROM w) + $nb)
        |                   - ln((SELECT CAST(sum(tc) AS BIGINT) FROM w) + $nb)) * 1000000) AS BIGINT) AS c
        |       FROM w),
        |db AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS cnt FROM feats WHERE source <> '$b' GROUP BY doc_id, b),
        |sc AS (SELECT doc_id, CAST(sum(cnt * lw) + sum(cnt) * max(c) AS BIGINT) AS ss
        |       FROM db JOIN wt USING (b) GROUP BY doc_id),
        |r AS (SELECT doc_id, ss, row_number() OVER (ORDER BY ss DESC, doc_id) AS rnk FROM sc)
        |SELECT doc_id, CAST(rnk AS INT) AS rnk, round(CAST(ss AS DOUBLE) / 1000000, 6) AS score
        |FROM r WHERE rnk <= $n ORDER BY rnk""".stripMargin
    },

    // Train/val/test split: c2's md5 bucket cut at interpolated
    // percentages — one definition drives both engines.
    "c6_train_val_test" -> {
      val t = Corpus.trainPct
      val v = Corpus.trainPct + Corpus.valPct
      s"""WITH b AS (SELECT lang,
        |  CAST(CAST(list_sum([(strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[i]) - 1) * (16 ** (8 - i)) for i in range(1, 9)]) AS BIGINT) % 100 AS INT) AS bucket
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN bucket < $t THEN 'train' WHEN bucket < $v THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n
        |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
    },

    "q36_histogram" ->
      s"""SELECT CAST(floor(o_totalprice / ${graft.operators.Relational.histWidth}.0) AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q37_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    // Stream-static enrichment join: weights interpolated from
    // EventsStream.typeWeights (one definition, both engines).
    "q38_stream_static" -> {
      val vals = graft.streaming.EventsStream.typeWeights
        .map { case (t, w) => s"('$t', CAST($w AS DOUBLE))" }.mkString(", ")
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n, round(sum(value * w), 2) AS weighted_value
        |FROM events JOIN (VALUES $vals) AS d(event_type, w) USING (event_type)
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin
    },

    // Quality-aware keeper: d7's component CTE + t3's score formula, one
    // window argmax per cluster.
    "d8_keeper_quality" ->
      s"""WITH RECURSIVE $simhashHamCte,
        |pairs AS (SELECT d1, d2 FROM ham WHERE hamming <= 3),
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
        |walk(node, lab) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, w.lab FROM walk w JOIN edges e ON w.node = e.src),
        |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM walk GROUP BY node),
        |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id),
        |f AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS ntok,
        |        CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS dr,
        |        CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS sr
        |      FROM toks),
        |sc AS (SELECT doc_id,
        |        round(CAST(0.4 AS DOUBLE) * least(ntok / 128, CAST(1.0 AS DOUBLE))
        |            + CAST(0.4 AS DOUBLE) * dr
        |            + CAST(0.2 AS DOUBLE) * least(sr * 4, CAST(1.0 AS DOUBLE)), 6) AS score
        |      FROM f),
        |r AS (SELECT c.cluster_id, s.cluster_size, c.doc_id, sc.score,
        |        row_number() OVER (PARTITION BY c.cluster_id ORDER BY sc.score DESC, c.doc_id) AS rnk
        |      FROM comp c JOIN sz s USING (cluster_id) JOIN sc ON sc.doc_id = c.doc_id)
        |SELECT cluster_id, cluster_size, doc_id AS keeper_doc, score AS keeper_score
        |FROM r WHERE rnk = 1 ORDER BY cluster_id""".stripMargin,

    // Approximate aggregates: the sketches aren't reproducible in DuckDB,
    // so the checkable surface is exact twins + tolerance booleans. The
    // oracle recomputes the exact side and pins the booleans TRUE — a
    // Spark-side sketch drifting outside tolerance flips a boolean and
    // fails the hash.
    "q40_approx_aggs" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS users_ok, TRUE AS p90_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q42_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "q43_gapfill" ->
      """WITH ev AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |daily AS (SELECT event_type, day, count(*) AS n FROM ev GROUP BY 1, 2),
        |spine AS (SELECT CAST(unnest(generate_series(min_d, max_d, INTERVAL 1 DAY)) AS DATE) AS day
        |          FROM (SELECT min(day) AS min_d, max(day) AS max_d FROM ev)),
        |grid AS (SELECT day, event_type FROM spine, (SELECT DISTINCT event_type FROM ev))
        |SELECT g.day, g.event_type, coalesce(d.n, 0) AS n
        |FROM grid g LEFT JOIN daily d ON g.day = d.day AND g.event_type = d.event_type
        |ORDER BY g.day, g.event_type""".stripMargin,

    // Runs as LITERAL text on both engines (the q19/q20 pattern): Spark
    // decorrelates the EXISTS into a left-semi join.
    "q44_exists_sql" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |  AND o_totalprice > 300000
        |ORDER BY o_orderkey""".stripMargin,

    // Monotone running aggregates: the final state per user equals the
    // batch aggregate for any micro-batch split.
    "q45_stream_running_max" ->
      """SELECT user_id, count(*) AS n_events, max(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Collected arrays are sorted before use (collect order is never
    // deterministic); int-cast before string join so both engines render
    // identically.
    "q46_collect_suite" ->
      """SELECT l_orderkey, len(qs) AS n_items, qs[-1] AS max_qty,
        |  array_to_string([CAST(CAST(x AS INT) AS VARCHAR) for x in qs[1:3]], ',') AS low3
        |FROM (SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
        |      FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY 1)
        |ORDER BY l_orderkey""".stripMargin,

    // BPE-ish pretokenizer counts; the regex is interpolated (single
    // quotes doubled for the SQL literal) so one pattern drives both
    // engines.
    "t9_bpeish_tokens" -> {
      val pat = TextAnalysis.bpeishRe.replace("'", "''")
      s"""SELECT lang,
        |  CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '$pat'))) AS BIGINT) AS bpe_tokens,
        |  round(CAST(sum(len(regexp_extract_all(text, '$pat'))) AS DOUBLE)
        |        / sum(len(list_filter(string_split(text, ' '), x -> x <> ''))), 6) AS bpe_per_ws
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
    },

    // Real BPE replayed in SQL: the recursive CTE drives each distinct
    // word's symbol list to its merge fixpoint — per step, find the
    // lowest-rank adjacent pair (leftmost occurrence) and merge it —
    // using rank/id CASE tables interpolated from the SAME
    // graft.exprs.BpeStats.merges constant the native expression parses.
    // A word's final row is the one where no pair is mergeable
    // (sentinel rank); ids are base-alphabet (ascii−33) for single chars
    // and baseSize+rank for merge outputs, unknown −1.
    "t12_bpe_tokens" ->
      s"""WITH RECURSIVE ${bpeWidCtes("lang")}
        |SELECT lang, count(*) AS n_words,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(sum(idsum) AS BIGINT) AS sum_token_id
        |FROM dw JOIN wid USING (w)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // BPE training replayed round by round (fixed unroll — see
    // bpeTrainCtes); the learned table itself is the result.
    "t13_bpe_train" -> {
      val R = graft.ops.TextAnalysis.bpeTrainRounds
      val union = (0 until R).map(r =>
        s"SELECT $r AS rank, pair, n AS freq FROM m$r").mkString(" UNION ALL ")
      s"""WITH
        |${bpeTrainCtes}
        |SELECT rank, pair, freq FROM ($union) ORDER BY rank""".stripMargin
    },

    // Train, then tokenize with what was learned: final encoded vocab
    // state s{R} + last-wins merge-output ids, aggregated per language
    // (t12's output shape).
    "t14_bpe_learned_tokens" -> {
      import graft.exprs.BpeStats
      val R = graft.ops.TextAnalysis.bpeTrainRounds
      val mg = (0 until R).map(r => s"SELECT $r AS r, pair FROM m$r").mkString(" UNION ALL ")
      s"""WITH
        |${bpeTrainCtes},
        |mg AS ($mg),
        |ids AS (SELECT replace(pair, ' ', '') AS osym, ${BpeStats.baseSize} + max(r) AS id
        |        FROM mg GROUP BY 1),
        |fs AS (SELECT w, unnest(string_split(trim(s, ' '), '  ')) AS sym FROM s$R),
        |wid AS (SELECT fs.w, count(*) AS ntok,
        |    sum(CASE WHEN length(sym) = 1
        |         THEN CASE WHEN ascii(sym) BETWEEN ${BpeStats.baseLo} AND ${BpeStats.baseHi}
        |              THEN ascii(sym) - ${BpeStats.baseLo} ELSE -1 END
        |         ELSE coalesce(i.id, -1) END) AS idsum
        |  FROM fs LEFT JOIN ids i ON fs.sym = i.osym
        |  GROUP BY fs.w)
        |SELECT lang, count(*) AS n_words,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(sum(idsum) AS BIGINT) AS sum_token_id
        |FROM dw JOIN wid USING (w)
        |GROUP BY lang ORDER BY lang""".stripMargin
    },

    // Fertility: the t14 training+encoding replay, aggregated to the two
    // per-language ratios; chars = non-space length (≡ word chars under
    // the single-space tokenizer), divided once at the end.
    "t20_bpe_fertility" -> {
      val R = graft.ops.TextAnalysis.bpeTrainRounds
      val mg = (0 until R).map(r => s"SELECT $r AS r, pair FROM m$r").mkString(" UNION ALL ")
      s"""WITH
        |${bpeTrainCtes},
        |mg AS ($mg),
        |fs AS (SELECT w, unnest(string_split(trim(s, ' '), '  ')) AS sym FROM s$R),
        |wid AS (SELECT fs.w, count(*) AS ntok FROM fs GROUP BY fs.w),
        |lt AS (SELECT lang, count(*) AS n_words, CAST(sum(ntok) AS BIGINT) AS n_tokens
        |       FROM dw JOIN wid USING (w) GROUP BY lang),
        |ch AS (SELECT lang, CAST(sum(length(replace(text, ' ', ''))) AS BIGINT) AS n_chars
        |       FROM documents GROUP BY lang)
        |SELECT lt.lang AS lang, n_words, n_tokens, n_chars,
        |  round(CAST(n_tokens AS DOUBLE) / n_words, 6) AS fertility,
        |  round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS chars_per_token
        |FROM lt JOIN ch ON lt.lang = ch.lang
        |ORDER BY lt.lang""".stripMargin
    },

    // Approximate card (q40 pattern): exact columns + the accuracy claim
    // as booleans the oracle asserts true — HLL has no DuckDB twin, the
    // tolerance comparison does.
    "t24_card_approx" ->
      """WITH toks AS (SELECT doc_id, source, lang, n_chars, text,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |f AS (SELECT source, CAST(len(t) AS BIGINT) AS ntok, n_chars,
        |        CAST(floor((CAST(0.4 AS DOUBLE) * least(CAST(len(t) AS DOUBLE) / 128, CAST(1.0 AS DOUBLE))
        |          + CAST(0.4 AS DOUBLE) * (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE))
        |          + CAST(0.2 AS DOUBLE) * least((CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 4, CAST(1.0 AS DOUBLE))) * 1e12) AS BIGINT) AS sc
        |      FROM toks)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  round(CAST(sum(sc) AS DOUBLE) / count(*) / 1e12, 6) AS avg_score,
        |  CAST(1 AS INT) AS langs_ok,
        |  CAST(1 AS INT) AS distinct_ok
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    // Dataset card: d1's content hash + t3's score formula + t1's
    // scaled-integer mean, aggregated by source — all fragments already
    // verified in their own oracles.
    "t22_dataset_card" ->
      """WITH toks AS (SELECT doc_id, source, lang, n_chars, text,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |f AS (SELECT source, lang, n_chars, CAST(len(t) AS BIGINT) AS ntok,
        |        CAST(floor((CAST(0.4 AS DOUBLE) * least(CAST(len(t) AS DOUBLE) / 128, CAST(1.0 AS DOUBLE))
        |          + CAST(0.4 AS DOUBLE) * (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE))
        |          + CAST(0.2 AS DOUBLE) * least((CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / CAST(len(t) AS DOUBLE)) * 4, CAST(1.0 AS DOUBLE))) * 1e12) AS BIGINT) AS sc,
        |        sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
        |      FROM toks)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_texts,
        |  round(CAST(1.0 AS DOUBLE) - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 6) AS dup_rate,
        |  round(CAST(sum(sc) AS DOUBLE) / count(*) / 1e12, 6) AS avg_score
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    // Normalization audit: DuckDB's nfc_normalize is the NFC twin; the
    // regex strip/collapse runs the SAME patterns (RE2 and Java agree on
    // \p{Cc}/\p{Cf} and ASCII-only \s — the gauntlet pins it). Gauntlet
    // strings are chr()-built from the shared normGauntlet table so both
    // engines see byte-identical inputs.
    "t21_normalize_audit" -> {
      val rows = graft.ops.TextAnalysis.normGauntlet
        .map { case (id, _, sql) => s"(CAST($id AS BIGINT), $sql)" }
        .mkString(", ")
      s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES $rows) g(doc_id, text)),
        |n AS (SELECT doc_id, text,
        |        trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |          '[\\p{Cc}\\p{Cf}]', '', 'g'), '\\s+', ' ', 'g')) AS norm
        |      FROM corpus)
        |SELECT doc_id,
        |  CAST(CASE WHEN norm <> text THEN 1 ELSE 0 END AS INT) AS changed,
        |  CAST(length(text) AS INT) AS n_raw,
        |  CAST(length(norm) AS INT) AS n_norm,
        |  sha256(norm) AS sha
        |FROM n ORDER BY doc_id""".stripMargin
    },

    // Left-outer interval join replay: matched rows are the plain interval
    // join; an unmatched click appears (with nulls) iff the final global
    // watermark — min over both sides of (side max ts − delay) — passed
    // click_ts + window, which is exactly Spark's state-eviction rule for
    // outer emission (verified empirically at sf0.001: 204/204).
    "q47_stream_funnel_outer" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id AS p_user, ts AS purchase_ts
        |      FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT click_id, user_id, click_ts, purchase_id, purchase_ts
        |      FROM c JOIN p ON user_id = p_user
        |        AND purchase_ts > click_ts AND purchase_ts <= click_ts + INTERVAL 1 HOUR),
        |wm AS (SELECT least((SELECT max(click_ts) FROM c), (SELECT max(purchase_ts) FROM p))
        |         - INTERVAL 1 HOUR AS w),
        |um AS (SELECT c.click_id, c.user_id, c.click_ts,
        |         CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS TIMESTAMP) AS purchase_ts
        |       FROM c, wm
        |       WHERE c.click_id NOT IN (SELECT click_id FROM m)
        |         AND c.click_ts + INTERVAL 1 HOUR < wm.w)
        |SELECT * FROM m UNION ALL SELECT * FROM um
        |ORDER BY click_id, purchase_id""".stripMargin,

    // DuckDB's UNION ALL BY NAME mirrors unionByName(allowMissing).
    "q49_union_by_name" ->
      """SELECT * FROM (
        |  SELECT c_nationkey AS nationkey, count(*) AS n_cust,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_cust_bal,
        |    'customer' AS side
        |  FROM customer GROUP BY 1
        |  UNION ALL BY NAME
        |  SELECT s_nationkey AS nationkey, count(*) AS n_supp, 'supplier' AS side
        |  FROM supplier GROUP BY 1
        |) ORDER BY side, nationkey""".stripMargin,

    // RANGE frame in exact epoch microseconds on both engines.
    "q48_rolling_range" ->
      """SELECT event_id, event_type,
        |  count(*) OVER w AS n_7d,
        |  round(sum(value) OVER w, 2) AS sum_7d
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // Binary-payload dedup: sha256 over the raw bytes (payload here is
    // the UTF-8 text, so the oracle hashes the string directly).
    "m3_media_dedup" ->
      """SELECT sha256(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies,
        |  min(length(text)) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin,

    // PPM decode: golden VALUES derived from the deterministic fixture
    // generator (pixel (x,y,c) of image i = (7x + 13y + 29c + 31i) mod 256);
    // corrupt.ppm is truncated and must reject to an all-NULL stats row.
    "m4_ppm_decode" ->
      """SELECT name, width, height, n_pixels, sum_r, sum_g, sum_b
        |FROM (VALUES
        |  ('corrupt.ppm', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('img0.ppm', CAST(8 AS INT), CAST(6 AS INT), CAST(48 AS BIGINT), CAST(2736 AS BIGINT), CAST(4128 AS BIGINT), CAST(5520 AS BIGINT)),
        |  ('img1.ppm', CAST(5 AS INT), CAST(7 AS INT), CAST(35 AS BIGINT), CAST(2940 AS BIGINT), CAST(3955 AS BIGINT), CAST(4970 AS BIGINT)),
        |  ('img2.ppm', CAST(16 AS INT), CAST(4 AS INT), CAST(64 AS BIGINT), CAST(8576 AS BIGINT), CAST(10432 AS BIGINT), CAST(11776 AS BIGINT))
        |) AS t(name, width, height, n_pixels, sum_r, sum_g, sum_b)
        |ORDER BY name""".stripMargin,

    // Audio decode: golden VALUES from tools/gen_wav_fixtures.py's
    // independent reference decoder (exact integer sums; corrupt.wav is
    // a truncated data chunk and must reject whole).
    "m7_wav_decode" ->
      """SELECT name, sample_rate, n_channels, n_frames, sum_abs, peak
        |FROM (VALUES
        |  ('corrupt.wav', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS INT)),
        |  ('tonea.wav', CAST(8000 AS INT), CAST(1 AS INT), CAST(8000 AS BIGINT), CAST(47847068 AS BIGINT), CAST(16148 AS INT)),
        |  ('tonea_click.wav', CAST(8000 AS INT), CAST(1 AS INT), CAST(8000 AS BIGINT), CAST(51261358 AS BIGINT), CAST(31000 AS INT)),
        |  ('tonea_gain.wav', CAST(8000 AS INT), CAST(1 AS INT), CAST(8000 AS BIGINT), CAST(23923571 AS BIGINT), CAST(8074 AS INT)),
        |  ('toneb.wav', CAST(8000 AS INT), CAST(1 AS INT), CAST(8000 AS BIGINT), CAST(42049350 AS BIGINT), CAST(14778 AS INT)),
        |  ('toneb_stereo.wav', CAST(8000 AS INT), CAST(2 AS INT), CAST(8000 AS BIGINT), CAST(42049350 AS BIGINT), CAST(14778 AS INT))
        |) AS t(name, sample_rate, n_channels, n_frames, sum_abs, peak)
        |ORDER BY name""".stripMargin,

    // Audio near-dup: golden VALUES from the reference fingerprint
    // (tonea_gain = -6 dB uniform gain, Hamming 0; tonea_click = one
    // retouched window, Hamming 1; toneb_stereo = the same signal spread
    // to stereo, Hamming 0 to toneb; cross-tone pairs at 31-32 —
    // correctly absent).
    "m8_wav_near_dup" ->
      """SELECT name1, name2, hamming FROM (VALUES
        |  ('tonea.wav', 'tonea_click.wav', CAST(1 AS INT)),
        |  ('tonea.wav', 'tonea_gain.wav', CAST(0 AS INT)),
        |  ('tonea_click.wav', 'tonea_gain.wav', CAST(1 AS INT)),
        |  ('toneb.wav', 'toneb_stereo.wav', CAST(0 AS INT))
        |) AS t(name1, name2, hamming)
        |ORDER BY name1, name2""".stripMargin,

    // Video decode: golden VALUES from tools/gen_y4m_fixtures.py's
    // independent reference decoder (exact luma sums; corrupt.y4m is
    // truncated mid-frame and must reject whole).
    "m9_y4m_decode" ->
      """SELECT name, width, height, n_frames, sum_luma
        |FROM (VALUES
        |  ('corrupt.y4m', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BIGINT)),
        |  ('vida.y4m', CAST(48 AS INT), CAST(32 AS INT), CAST(12 AS INT), CAST(2355144 AS BIGINT)),
        |  ('vida_bright.y4m', CAST(48 AS INT), CAST(32 AS INT), CAST(12 AS INT), CAST(2499905 AS BIGINT)),
        |  ('vida_recode.y4m', CAST(48 AS INT), CAST(32 AS INT), CAST(12 AS INT), CAST(2355144 AS BIGINT)),
        |  ('vida_retouch.y4m', CAST(48 AS INT), CAST(32 AS INT), CAST(12 AS INT), CAST(2355806 AS BIGINT)),
        |  ('vidb.y4m', CAST(48 AS INT), CAST(32 AS INT), CAST(12 AS INT), CAST(2349987 AS BIGINT))
        |) AS t(name, width, height, n_frames, sum_luma)
        |ORDER BY name""".stripMargin,

    // Video near-dup: golden VALUES from the reference 4-frame signature
    // (vida_recode = re-wrapped container, distance 0; vida_bright =
    // uniform luma lift, 0; vida_retouch = one sampled frame retouched,
    // 2; vidb unrelated at ~100 — correctly absent).
    "m10_video_near_dup" ->
      """SELECT name1, name2, hamming FROM (VALUES
        |  ('vida.y4m', 'vida_bright.y4m', CAST(0 AS INT)),
        |  ('vida.y4m', 'vida_recode.y4m', CAST(0 AS INT)),
        |  ('vida.y4m', 'vida_retouch.y4m', CAST(2 AS INT)),
        |  ('vida_bright.y4m', 'vida_recode.y4m', CAST(0 AS INT)),
        |  ('vida_bright.y4m', 'vida_retouch.y4m', CAST(2 AS INT)),
        |  ('vida_recode.y4m', 'vida_retouch.y4m', CAST(2 AS INT))
        |) AS t(name1, name2, hamming)
        |ORDER BY name1, name2""".stripMargin,

    // PNG decode: golden VALUES from tools/gen_png_fixtures.py's
    // independent pure-Python encoder + stats reference (PNG is lossless,
    // so the ImageIO decode must agree to the bit; corrupt.png is
    // truncated mid-IDAT and must reject whole).
    "m11_png_decode" ->
      """SELECT name, width, height, n_pixels, sum_r, sum_g, sum_b
        |FROM (VALUES
        |  ('corrupt.png', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('imga.png', CAST(16 AS INT), CAST(12 AS INT), CAST(192 AS BIGINT), CAST(23840 AS BIGINT), CAST(24672 AS BIGINT), CAST(24224 AS BIGINT)),
        |  ('imga_bright.png', CAST(16 AS INT), CAST(12 AS INT), CAST(192 AS BIGINT), CAST(25455 AS BIGINT), CAST(26065 AS BIGINT), CAST(25759 AS BIGINT)),
        |  ('imga_recode.png', CAST(16 AS INT), CAST(12 AS INT), CAST(192 AS BIGINT), CAST(23840 AS BIGINT), CAST(24672 AS BIGINT), CAST(24224 AS BIGINT)),
        |  ('imgb.png', CAST(16 AS INT), CAST(12 AS INT), CAST(192 AS BIGINT), CAST(24544 AS BIGINT), CAST(24352 AS BIGINT), CAST(23904 AS BIGINT))
        |) AS t(name, width, height, n_pixels, sum_r, sum_g, sum_b)
        |ORDER BY name""".stripMargin,

    // PNG near-dup: golden VALUES from the generator's reference dHash
    // (imga_recode = identical raster, different bytes, Hamming 0;
    // imga_bright = +8 lift with two retouched pixels, Hamming 2; imgb
    // unrelated at 25-27 — correctly absent).
    "m12_png_near_dup" ->
      """SELECT name1, name2, hamming FROM (VALUES
        |  ('imga.png', 'imga_bright.png', CAST(2 AS INT)),
        |  ('imga.png', 'imga_recode.png', CAST(0 AS INT)),
        |  ('imga_bright.png', 'imga_recode.png', CAST(2 AS INT))
        |) AS t(name1, name2, hamming)
        |ORDER BY name1, name2""".stripMargin,

    // Resize: golden VALUES from the generator's independent box_resize
    // (floor-average integer cells — the resized raster is pinned to the
    // BYTE by its sha256; the recoded copy resizes to the identical bytes,
    // corrupt rejects whole).
    "m13_resize" ->
      """SELECT name, out_w, out_h, sum_r, sum_g, sum_b, raster_sha256
        |FROM (VALUES
        |  ('corrupt.png', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)),
        |  ('imga.png', CAST(9 AS INT), CAST(7 AS INT), CAST(7744 AS BIGINT), CAST(8093 AS BIGINT), CAST(8054 AS BIGINT), '48457222e02640adf557625f2e8bec6da7d670db094b22b88edc9af0973e5220'),
        |  ('imga_bright.png', CAST(9 AS INT), CAST(7 AS INT), CAST(8266 AS BIGINT), CAST(8562 AS BIGINT), CAST(8557 AS BIGINT), 'b9ec9a79c17944a6d73ce9a9715491c982ca99dcdf8b95b906b25a399d5ed1f5'),
        |  ('imga_recode.png', CAST(9 AS INT), CAST(7 AS INT), CAST(7744 AS BIGINT), CAST(8093 AS BIGINT), CAST(8054 AS BIGINT), '48457222e02640adf557625f2e8bec6da7d670db094b22b88edc9af0973e5220'),
        |  ('imgb.png', CAST(9 AS INT), CAST(7 AS INT), CAST(8299 AS BIGINT), CAST(7916 AS BIGINT), CAST(7961 AS BIGINT), '6d21e5c019703943d57572b20e4891b8a77acfe864e6ce2b16deb55e495e388f')
        |) AS t(name, out_w, out_h, sum_r, sum_g, sum_b, raster_sha256)
        |ORDER BY name""".stripMargin,

    // JPEG decode: lossy-safe INVARIANT oracle (accepted?, header dims) —
    // pixel values are decoder-rounded, so exact sums would pin one JDK's
    // IDCT rather than the contract. corrupt.jpg is a header truncation
    // (the JDK JPEG reader tolerates scan-data tail truncation).
    "m14_jpeg_decode" ->
      """SELECT name, ok, w, h FROM (VALUES
        |  ('corrupt.jpg', CAST(FALSE AS BOOLEAN), CAST(NULL AS INT), CAST(NULL AS INT)),
        |  ('imga.jpg', CAST(TRUE AS BOOLEAN), CAST(72 AS INT), CAST(56 AS INT)),
        |  ('imga_requality.jpg', CAST(TRUE AS BOOLEAN), CAST(72 AS INT), CAST(56 AS INT)),
        |  ('imgb.jpg', CAST(TRUE AS BOOLEAN), CAST(72 AS INT), CAST(56 AS INT))
        |) AS t(name, ok, w, h)
        |ORDER BY name""".stripMargin,

    // JPEG near-dup geometry through the incremental chassis: only the
    // re-quality encode of the same raster pairs with its source (names
    // only — the exact Hamming is decoder-dependent; generation-time
    // margins were 1 vs 55+ against threshold 3).
    // JPEG tombstone + revive through the facade's "jpeg" alias: deleting
    // imga.jpg empties the pair serve (its requality twin has no other
    // neighbor); re-ingesting it revives the pair — both phases pinned.
    "d44_jpeg_delete" ->
      """SELECT phase, n_pairs, names FROM (VALUES
        |  ('after_delete', CAST(0 AS INT), ''),
        |  ('after_revive', CAST(1 AS INT), 'imga.jpg|imga_requality.jpg')
        |) AS t(phase, n_pairs, names)
        |ORDER BY phase""".stripMargin,
    "d42_jpeg_incremental" ->
      """SELECT name1, name2 FROM (VALUES
        |  ('imga.jpg', 'imga_requality.jpg')
        |) AS t(name1, name2)
        |ORDER BY name1, name2""".stripMargin,

    // BMP / GIF decode: both lossless for these fixtures, so the goldens
    // are the m11 rasters' exact stats re-containered (independent
    // pure-Python encoders in tools/gen_bmp_gif_fixtures.py); corrupt.*
    // are header truncations rejecting whole.
    "m15_bmp_decode" ->
      """SELECT name, width, height, n_pixels, sum_r, sum_g, sum_b FROM (VALUES
        |  ('corrupt.bmp', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('imga.bmp', CAST(16 AS INT), CAST(12 AS INT), CAST(192 AS BIGINT), CAST(23840 AS BIGINT), CAST(24672 AS BIGINT), CAST(24224 AS BIGINT)),
        |  ('imgb.bmp', CAST(16 AS INT), CAST(12 AS INT), CAST(192 AS BIGINT), CAST(24544 AS BIGINT), CAST(24352 AS BIGINT), CAST(23904 AS BIGINT))
        |) AS t(name, width, height, n_pixels, sum_r, sum_g, sum_b)
        |ORDER BY name""".stripMargin,

    "m16_gif_decode" ->
      """SELECT name, width, height, n_pixels, sum_r, sum_g, sum_b FROM (VALUES
        |  ('corrupt.gif', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('imga.gif', CAST(16 AS INT), CAST(12 AS INT), CAST(192 AS BIGINT), CAST(23840 AS BIGINT), CAST(24672 AS BIGINT), CAST(24224 AS BIGINT)),
        |  ('imgb.gif', CAST(16 AS INT), CAST(12 AS INT), CAST(192 AS BIGINT), CAST(24544 AS BIGINT), CAST(24352 AS BIGINT), CAST(23904 AS BIGINT))
        |) AS t(name, width, height, n_pixels, sum_r, sum_g, sum_b)
        |ORDER BY name""".stripMargin,

    // TIFF decode: baseline uncompressed RGB — lossless, so the golden is
    // the same rasters' exact stats once more (independent pure-Python
    // encoder in tools/gen_tiff_fixtures.py); corrupt.tiff is an IFD
    // truncation rejecting whole.
    "m17_tiff_decode" ->
      """SELECT name, width, height, n_pixels, sum_r, sum_g, sum_b FROM (VALUES
        |  ('corrupt.tiff', CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
        |  ('imga.tiff', CAST(16 AS INT), CAST(12 AS INT), CAST(192 AS BIGINT), CAST(23840 AS BIGINT), CAST(24672 AS BIGINT), CAST(24224 AS BIGINT)),
        |  ('imga_bright.tiff', CAST(16 AS INT), CAST(12 AS INT), CAST(192 AS BIGINT), CAST(25455 AS BIGINT), CAST(26065 AS BIGINT), CAST(25759 AS BIGINT)),
        |  ('imgb.tiff', CAST(16 AS INT), CAST(12 AS INT), CAST(192 AS BIGINT), CAST(24544 AS BIGINT), CAST(24352 AS BIGINT), CAST(23904 AS BIGINT))
        |) AS t(name, width, height, n_pixels, sum_r, sum_g, sum_b)
        |ORDER BY name""".stripMargin,

    // TIFF split-ingest: the d40 shape on the tiff container — the
    // brightness retouch shares imga_bright.png's raster, so the golden
    // pair and hamming carry over from the PNG generator's reference
    "d43_tiff_incremental" ->
      """SELECT name1, name2, hamming FROM (VALUES
        |  ('imga.tiff', 'imga_bright.tiff', CAST(2 AS INT))
        |) AS t(name1, name2, hamming)
        |ORDER BY name1, name2""".stripMargin,

    // Perceptual near-dup: golden VALUES from the fixture generator's
    // reference dHash (imga_recode = identical raster re-encoded, Hamming
    // 0; imga_bright = +8 brightness with two retouched pixels, Hamming 3;
    // imgb/imgc unrelated at Hamming 34-38 — correctly absent).
    "m5_ppm_near_dup" ->
      """SELECT name1, name2, hamming FROM (VALUES
        |  ('imga.ppm', 'imga_bright.ppm', CAST(3 AS INT)),
        |  ('imga.ppm', 'imga_recode.ppm', CAST(0 AS INT)),
        |  ('imga_bright.ppm', 'imga_recode.ppm', CAST(3 AS INT))
        |) AS t(name1, name2, hamming)
        |ORDER BY name1, name2""".stripMargin,

    // Rotation-robust near-dup: golden VALUES from the reference orbit
    // distance (imga_rot90 = pure 90° rotation, d 0; imga_flip_bright =
    // mirrored +8 brightness with two retouched pixels, d 2; imgb_rot180
    // pairs with imgb at 0; unrelated rasters at 22-28 — correctly
    // absent).
    "m6_rot_robust_dedup" ->
      """SELECT name1, name2, hamming FROM (VALUES
        |  ('imga.ppm', 'imga_flip_bright.ppm', CAST(2 AS INT)),
        |  ('imga.ppm', 'imga_rot90.ppm', CAST(0 AS INT)),
        |  ('imga_flip_bright.ppm', 'imga_rot90.ppm', CAST(2 AS INT)),
        |  ('imgb.ppm', 'imgb_rot180.ppm', CAST(0 AS INT))
        |) AS t(name1, name2, hamming)
        |ORDER BY name1, name2""".stripMargin,

    // Gopher rules: all ratios divide exact integers once.
    "t10_gopher_rules" ->
      """WITH toks AS (SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |f AS (SELECT doc_id, len(t) AS ntok, greatest(len(t) - 2, 0) AS ntri,
        |    len(list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])) AS ndis,
        |    length(text) AS nchar,
        |    length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS nsym,
        |    CAST(list_sum([len(x) for x in t]) AS BIGINT) AS totlen
        |  FROM toks)
        |SELECT doc_id, CAST(ntok AS INT) AS ntok,
        |  round(CASE WHEN ntri > 0 THEN CAST(ntri - ndis AS DOUBLE) / ntri ELSE 0.0 END, 6) AS dup_trigram_frac,
        |  round(CASE WHEN ntok > 0 THEN CAST(totlen AS DOUBLE) / ntok ELSE 0.0 END, 6) AS mean_word_len,
        |  round(CASE WHEN nchar > 0 THEN CAST(nsym AS DOUBLE) / nchar ELSE 0.0 END, 6) AS symbol_ratio
        |FROM f ORDER BY doc_id""".stripMargin,

    // Learned quality classifier: the oracle REPLAYS the Naive Bayes
    // training — same integer-decile features, same class/bin counts,
    // same Laplace cross-multiplication (HUGEINT here, decimal(38,0) in
    // Spark; both exact at ~10^25) — and must land on identical preds.
    "t17_quality_classifier" ->
      s"""WITH toks AS (SELECT doc_id, source, text, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |raw AS (SELECT doc_id, source, len(t) AS ntok, greatest(len(t) - 2, 0) AS ntri,
        |    len(list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)])) AS ndis3,
        |    length(text) AS nchar,
        |    length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS nsym,
        |    CAST(list_sum([len(x) for x in t]) AS BIGINT) AS totlen,
        |    len(list_distinct(t)) AS ndtok
        |  FROM toks),
        |feats AS (SELECT doc_id,
        |    least(9, (ntri - ndis3) * 10 // greatest(ntri, 1)) AS f_dup,
        |    least(9, totlen // greatest(CAST(ntok AS BIGINT), 1)) AS f_wlen,
        |    least(9, nsym * 10 // greatest(nchar, 1)) AS f_sym,
        |    least(9, (ntok - ndtok) * 10 // greatest(ntok, 1)) AS f_ttr,
        |    CASE WHEN source IN (${graft.ops.TextAnalysis.qualitySources.map(s => s"'$s'").mkString(", ")}) THEN 1 ELSE 0 END AS label
        |  FROM raw),
        |cls AS (SELECT sum(label) AS n1, count(*) - sum(label) AS n0 FROM feats),
        |cd AS (SELECT f_dup AS v, sum(label) AS c1, count(*) - sum(label) AS c0 FROM feats GROUP BY 1),
        |cw AS (SELECT f_wlen AS v, sum(label) AS c1, count(*) - sum(label) AS c0 FROM feats GROUP BY 1),
        |cy AS (SELECT f_sym AS v, sum(label) AS c1, count(*) - sum(label) AS c0 FROM feats GROUP BY 1),
        |ct AS (SELECT f_ttr AS v, sum(label) AS c1, count(*) - sum(label) AS c0 FROM feats GROUP BY 1)
        |SELECT f.doc_id, CAST(f.f_dup AS BIGINT) AS f_dup, CAST(f.f_wlen AS BIGINT) AS f_wlen,
        |  CAST(f.f_sym AS BIGINT) AS f_sym, CAST(f.f_ttr AS BIGINT) AS f_ttr,
        |  CAST(f.label AS BIGINT) AS label,
        |  CAST(CASE WHEN CAST(n1 AS HUGEINT) * (cd.c1 + 1) * (cw.c1 + 1) * (cy.c1 + 1) * (ct.c1 + 1)
        |         * (n0 + 10) * (n0 + 10) * (n0 + 10) * (n0 + 10)
        |       > CAST(n0 AS HUGEINT) * (cd.c0 + 1) * (cw.c0 + 1) * (cy.c0 + 1) * (ct.c0 + 1)
        |         * (n1 + 10) * (n1 + 10) * (n1 + 10) * (n1 + 10)
        |       THEN 1 ELSE 0 END AS BIGINT) AS pred
        |FROM feats f
        |JOIN cd ON f.f_dup = cd.v JOIN cw ON f.f_wlen = cw.v
        |JOIN cy ON f.f_sym = cy.v JOIN ct ON f.f_ttr = ct.v
        |CROSS JOIN cls
        |ORDER BY f.doc_id""".stripMargin,

    // Repetition profile: bigram mode by multiplicity, longest same-token
    // run via the islands trick (i − rank within (doc, token) groups), and
    // the type/token complement — all integer ratios divided once.
    "t15_repetition" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
        |base AS (SELECT doc_id, t, len(t) AS ntok, len(list_distinct(t)) AS ndis FROM toks),
        |bg AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bg
        |       FROM base WHERE ntok >= 2),
        |bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
        |top AS (SELECT doc_id, max(c) AS topc FROM bgc GROUP BY doc_id),
        |tk AS (SELECT doc_id, u.tok AS tok, u.i AS i
        |       FROM (SELECT doc_id,
        |               unnest([{'tok': t[i], 'i': i} for i in range(1, len(t)+1)]) AS u
        |             FROM base)),
        |isl AS (SELECT doc_id, tok,
        |          i - row_number() OVER (PARTITION BY doc_id, tok ORDER BY i) AS grp
        |        FROM tk),
        |runs AS (SELECT doc_id, count(*) AS run FROM isl GROUP BY doc_id, tok, grp),
        |mr AS (SELECT doc_id, max(run) AS max_run FROM runs GROUP BY doc_id)
        |SELECT b.doc_id,
        |  round(CASE WHEN b.ntok >= 2 THEN CAST(coalesce(t2.topc, 0) AS DOUBLE) / (b.ntok - 1) ELSE 0.0 END, 6) AS top_bigram_frac,
        |  CAST(coalesce(m.max_run, 0) AS INT) AS max_token_run,
        |  round(CASE WHEN b.ntok > 0 THEN CAST(b.ntok - b.ndis AS DOUBLE) / b.ntok ELSE 0.0 END, 6) AS dup_token_frac
        |FROM base b LEFT JOIN top t2 USING (doc_id) LEFT JOIN mr m ON b.doc_id = m.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // Unigram surprisal: per-token -ln(p) floored at 1e6 scale, summed
    // exactly (the t1 order-insensitivity rule).
    "t8_unigram_surprisal" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token FROM documents),
        |freq AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
        |tot AS (SELECT count(*) AS total FROM toks)
        |SELECT doc_id, count(*) AS ntok,
        |  round(CAST(sum(CAST(floor(-ln(CAST(cnt AS DOUBLE) / total) * 1e6) AS BIGINT)) AS DOUBLE)
        |        / count(*) / 1e6, 6) AS avg_surprisal
        |FROM toks JOIN freq USING (token), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Stupid-backoff replay: same floored micro-nat arithmetic as t8,
    // bigram/unigram/OOV cases split exactly as the engine splits them.
    "t19_bigram_surprisal" -> {
      val b = Corpus.benchmarkSource
      s"""WITH trt AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |             FROM documents WHERE source <> '$b'),
        |tet AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |        FROM documents WHERE source = '$b'),
        |trb AS (SELECT t[i] AS prev, t[i+1] AS w
        |        FROM (SELECT t, unnest(range(1, len(t))) AS i FROM trt)),
        |c2 AS (SELECT prev, w, count(*) AS c2 FROM trb GROUP BY 1, 2),
        |c1 AS (SELECT token, count(*) AS c1
        |       FROM (SELECT unnest(t) AS token FROM trt) GROUP BY 1),
        |tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS total FROM c1),
        |teb AS (SELECT doc_id, t[i] AS prev, t[i+1] AS w
        |        FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tet)),
        |sc AS (SELECT doc_id, c2.c2, p.c1 AS c1p, ww.c1 AS c1w, total
        |       FROM teb LEFT JOIN c2 USING (prev, w)
        |       LEFT JOIN c1 p ON teb.prev = p.token
        |       LEFT JOIN c1 ww ON teb.w = ww.token, tot)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(sum(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
        |  round(CAST(sum(CAST(CASE
        |      WHEN c2 IS NOT NULL THEN floor(-ln(CAST(c2 AS DOUBLE) / CAST(c1p AS DOUBLE)) * 1e6)
        |      WHEN c1w IS NOT NULL THEN floor(-ln(0.4 * CAST(c1w AS DOUBLE) / total) * 1e6)
        |      ELSE floor(-ln(0.4 / total) * 1e6) END AS BIGINT)) AS DOUBLE)
        |    / count(*) / 1e6, 6) AS avg_surprisal
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // Rebalance: exact integer comparison bucket*n_lang < 100*n_min (the
    // c2 md5 bucket), per-language audit counts.
    "c5_rebalance" ->
      """WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
        |m AS (SELECT min(n_lang) AS n_min FROM c),
        |b AS (SELECT doc_id, lang,
        |  CAST(CAST(list_sum([(strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[i]) - 1) * (16 ** (8 - i)) for i in range(1, 9)]) AS BIGINT) % 100 AS INT) AS bucket
        |  FROM documents)
        |SELECT b.lang, count(*) AS n_orig,
        |  CAST(sum(CASE WHEN bucket * n_lang < 100 * n_min THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM b JOIN c ON b.lang = c.lang, m
        |GROUP BY b.lang ORDER BY b.lang""".stripMargin,

    // Temperature sampling (α = 1/2): exact integer accept test
    // bucket²·n_lang < B²·n_min on the md5 bucket mod B=1000 — the
    // square encodes the √-rate without any float math.
    "c13_temperature_sample" -> {
      val b = Corpus.temperatureBuckets
      s"""WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
        |m AS (SELECT min(n_lang) AS n_min FROM c),
        |k AS (SELECT doc_id, lang,
        |  CAST(list_sum([(strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[i]) - 1) * (16 ** (8 - i)) for i in range(1, 9)]) AS BIGINT) % $b AS bucket
        |  FROM documents)
        |SELECT k.lang, count(*) AS n_orig,
        |  CAST(sum(CASE WHEN bucket * bucket * n_lang < ${b.toLong * b} * n_min THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM k JOIN c ON k.lang = c.lang, m
        |GROUP BY k.lang ORDER BY k.lang""".stripMargin
    },

    // Deterministic shuffle-shard export: skey = md5('shuf:'||doc_id),
    // shard = leading-32-bit bucket of skey mod exportShards, pos = rank
    // of skey within the shard — identical hash and rank on both engines.
    "c14_shuffle_export" -> {
      val ns = Corpus.exportShards
      s"""WITH k AS (SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS skey FROM documents),
        |s AS (SELECT doc_id, skey,
        |  CAST(CAST(list_sum([(strpos('0123456789abcdef', skey[i]) - 1) * (16 ** (8 - i)) for i in range(1, 9)]) AS BIGINT) % $ns AS INT) AS shard
        |  FROM k)
        |SELECT shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS BIGINT) AS pos,
        |  doc_id
        |FROM s ORDER BY shard, pos""".stripMargin
    },

    // Sequence packing: pack id = floor(per-language token prefix-sum /
    // capacity); capacity interpolated from Corpus.packTokens. Token
    // counts are the REAL BPE counts — the same t12 merge-walk replay
    // (bpeWidCtes), summed per document; a doc whose every word drops
    // would still pack with ntok 0 (LEFT JOIN + coalesce).
    "c4_pack" ->
      s"""WITH RECURSIVE ${bpeWidCtes("lang, doc_id")},
        |dt AS (SELECT lang, doc_id, CAST(sum(ntok) AS BIGINT) AS ntok
        |       FROM dw JOIN wid USING (w) GROUP BY lang, doc_id),
        |t AS (SELECT d.lang, d.doc_id, coalesce(dt.ntok, 0) AS ntok
        |      FROM documents d LEFT JOIN dt
        |        ON d.lang = dt.lang AND d.doc_id = dt.doc_id),
        |c AS (SELECT lang, doc_id, ntok,
        |    sum(ntok) OVER (PARTITION BY lang ORDER BY doc_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        |SELECT lang, CAST(floor((cum - ntok) / ${Corpus.packTokens}.0) AS BIGINT) AS pack_id,
        |  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin,

    // Curriculum packing: c4's BPE-counted manifest with the stream
    // ordered by t3's quality score (desc, doc_id tie-break); score
    // expression shared verbatim with the t3 oracle.
    "c8_curriculum_pack" ->
      s"""WITH RECURSIVE ${bpeWidCtes("lang, doc_id")},
        |dt AS (SELECT lang, doc_id, CAST(sum(ntok) AS BIGINT) AS ntok
        |       FROM dw JOIN wid USING (w) GROUP BY lang, doc_id),
        |t AS (SELECT d.lang, d.doc_id, coalesce(dt.ntok, 0) AS ntok
        |      FROM documents d LEFT JOIN dt
        |        ON d.lang = dt.lang AND d.doc_id = dt.doc_id),
        |toks2 AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tt FROM documents),
        |f AS (SELECT doc_id, CAST(len(tt) AS DOUBLE) AS ntokd,
        |        CAST(len(list_distinct(tt)) AS DOUBLE) / CAST(len(tt) AS DOUBLE) AS dr,
        |        CAST(len(list_filter(tt, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / CAST(len(tt) AS DOUBLE) AS sr
        |      FROM toks2),
        |sc AS (SELECT doc_id,
        |  round(CAST(0.4 AS DOUBLE) * least(ntokd / 128, CAST(1.0 AS DOUBLE))
        |      + CAST(0.4 AS DOUBLE) * dr
        |      + CAST(0.2 AS DOUBLE) * least(sr * 4, CAST(1.0 AS DOUBLE)), 6) AS score
        |  FROM f),
        |c AS (SELECT t.lang, t.doc_id, t.ntok, sc.score,
        |    sum(t.ntok) OVER (PARTITION BY t.lang ORDER BY sc.score DESC, t.doc_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t JOIN sc USING (doc_id))
        |SELECT lang, CAST(floor((cum - ntok) / ${Corpus.packTokens}.0) AS BIGINT) AS pack_id,
        |  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  round(min(score), 6) AS min_score, round(max(score), 6) AS max_score
        |FROM c GROUP BY lang, pack_id ORDER BY lang, pack_id""".stripMargin,

    // PII redaction over the inline golden corpus — rows and patterns both
    // interpolated from TextAnalysis so one definition drives both engines.
    // DuckDB's regexp_replace needs the explicit 'g' flag (Spark replaces
    // all matches by default).
    "t7_pii_redact" -> {
      val rows = TextAnalysis.piiCorpus
        .map { case (id, t) => s"(CAST($id AS BIGINT), '$t')" }.mkString(",\n  ")
      val e = TextAnalysis.emailRe
      val p = TextAnalysis.phoneRe
      val ip = TextAnalysis.ipRe
      s"""SELECT id,
        |  len(regexp_extract_all(text, '$e')) AS n_email,
        |  len(regexp_extract_all(text, '$p')) AS n_phone,
        |  len(regexp_extract_all(text, '$ip')) AS n_ip,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '$e', '[EMAIL]', 'g'), '$p', '[PHONE]', 'g'), '$ip', '[IP]', 'g') AS redacted
        |FROM (VALUES
        |  $rows) AS t(id, text)
        |ORDER BY id""".stripMargin
    },

    // The bucketed join must produce exactly the plain join's aggregate —
    // bucketing moves the shuffle to write time, never changes results.
    "q52_bucketed_join" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(sum(o_totalprice), 2) AS sum_order_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // Partition pruning selects files, not rows: the pruned read-back of
    // the partitioned daily aggregate equals computing it with the filter.
    "q53_partitioned_prune" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1, 2
        |ORDER BY day""".stripMargin,

    "q64_zorder_prune" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE user_id BETWEEN 100 AND 299
        |  AND datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) BETWEEN 8 AND 15
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "w1_rolling_fingerprint" -> {
      // Same Rabin-Karp constants as graft.exprs.RollingMinHash; the
      // sequential-mod fold is spelled out per window position.
      val steps = (0 until graft.exprs.RollingMinHash.K).foldLeft("CAST(0 AS BIGINT)")((acc, j) =>
        s"(($acc * ${graft.exprs.RollingMinHash.B} + ascii(text[i+$j])) % ${graft.exprs.RollingMinHash.P})")
      s"""SELECT doc_id,
        |  CASE WHEN length(text) < 8 THEN NULL ELSE
        |    list_sort([$steps for i in range(1, length(text) - 6)])[1]
        |  END AS rolling_min
        |FROM documents ORDER BY doc_id""".stripMargin
    },
  )
}
