package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product quantization (PQ) — the vector-COMPRESSION scale path for ANN,
  * complementing the cell-PARTITION path ([[Similarity.annIvf]]) and the
  * uniform int8 path ([[Similarity.quantizedCosineTopK]]).
  *
  * The 64-dim float32 embedding (256 bytes) is split into
  * [[pqSubspaces]] = 8 contiguous 8-dim subvectors; each subvector is
  * replaced by the id of its nearest entry in a per-subspace
  * [[pqCodes]] = 16-entry codebook. A vector becomes 8 codes of 4 bits —
  * 8 BYTES, a 32× compression (a 100 TB embedding corpus fits the RAM of
  * a modest cluster), and that compression is what makes billion-scale
  * indexes (FAISS IVF-PQ) possible at all.
  *
  * Queries run ADC (asymmetric distance computation): the query stays
  * full-precision; per subspace a 16-entry lookup table of partial dot
  * products ⟨q_s, c⟩ is computed ONCE per query, and each corpus vector's
  * approximate dot is just 8 table lookups summed — no float math per
  * candidate component. Approximate cosine divides by the RECONSTRUCTION
  * norm √Σ_s‖c_{s,code_s}‖² (the norm of the decoded vector), so the
  * score is exactly cos(q, decode(codes)).
  *
  * Scale shape: codebooks are model metadata (8×16×8 doubles) embedded as
  * literals — cell encoding is a pure projection (128 compiled `array_dot`
  * calls per row, no join, map-side); the ENCODED corpus (vec_id + 8 int
  * codes) is what a deployment persists and scans; the query side
  * (queries × luts) is broadcast. The corpus is scanned once, never
  * shuffled; per-(query, vector) work is 8 array lookups.
  *
  * Determinism contract (what lets DuckDB replay it bit-for-bit):
  * codebooks are the first [[pqCodes]] vectors' subvectors (code = rank in
  * vec_id order); assignment argmax on score = 2⟨x_s,c⟩ − ‖c‖² (the
  * −‖x_s‖² term is constant under the argmax), ties → smaller code; all
  * dots fold ascending in DOUBLE ([[graft.exprs.ArrayDot]] ≡ DuckDB
  * `list_sum` comprehensions); the 8-term ADC and norm sums are
  * left-associated in ascending subspace order on both engines.
  */
object Quantization {

  /** Number of contiguous subspaces (M in the PQ literature). */
  val pqSubspaces = 8

  /** Codebook entries per subspace (2^nbits; 16 ⇒ 4-bit codes). */
  val pqCodes = 16

  val pqQueries = 10
  val pqTopK = 3

  private def dot(a: Column, b: Column): Column =
    call_function("array_dot", a, b)

  /** One codebook entry: (code, subvector components, ‖c‖²). */
  type PqEntry = (Int, Array[Double], Double)

  /** Per-subspace codebooks derived from the first [[pqCodes]] vectors
    * (ascending vec_id; code = rank, robust to non-dense ids). Model-sized:
    * collected once to the driver and inlined as plan literals, exactly
    * like the IVF centroid sets.
    */
  def pqCodebooks(spark: SparkSession, dir: String): IndexedSeq[IndexedSeq[PqEntry]] = {
    val rows = Tables.embeddings(spark, dir)
      .where(col("vec_id") < pqCodes)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    // fail loud, not with an opaque rows.head error or a silently
    // under-sized codebook: code = rank is only "robust to non-dense ids"
    // when pqCodes vectors actually have vec_id < pqCodes
    require(rows.length == pqCodes,
      s"pqCodebooks: need $pqCodes vectors with vec_id < $pqCodes at $dir, " +
        s"found ${rows.length} — codebooks must be exactly $pqCodes entries " +
        "per subspace (4-bit codes)")
    val dim = rows.head.length
    val subDim = dim / pqSubspaces
    require(subDim * pqSubspaces == dim,
      s"embedding dim $dim not divisible into $pqSubspaces subspaces")
    (0 until pqSubspaces).map { s =>
      rows.toIndexedSeq.zipWithIndex.map { case (e, code) =>
        val sub = e.slice(s * subDim, (s + 1) * subDim)
        // ascending-index fold — the operand order ArrayDot and DuckDB's
        // list_sum share, so ‖c‖² is bit-identical across engines
        val cc = sub.foldLeft(0.0)((a, x) => a + x * x)
        (code, sub, cc)
      }
    }
  }

  /** Encode the corpus: vec_id + one 4-bit code per subspace (here as int
    * columns `code0..code7`) + the reconstruction norm. This slim table is
    * the persisted artifact of a PQ deployment — 8 B/vector payload.
    */
  private[graft] def encode(spark: SparkSession, dir: String,
      cb: IndexedSeq[IndexedSeq[PqEntry]]): DataFrame = {
    val subDim = cb.head.head._2.length
    val v = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding").as("e"))
    val codeCols = (0 until pqSubspaces).map { s =>
      val xs = slice(col("e"), s * subDim + 1, subDim)
      // argmax(2⟨x,c⟩ − ‖c‖²) as ONE array_max over (score, −code) structs:
      // each codebook dot computed exactly once, ties to the smaller code
      val best = array_max(array(cb(s).map { case (code, sub, cc) =>
        struct((lit(2.0) * dot(xs, typedlit(sub)) - lit(cc)).as("sc"),
          lit(-code).as("negcode"))
      }: _*))
      (-best.getField("negcode")).as(s"code$s")
    }
    val enc = v.select(col("vec_id") +: codeCols: _*)
    // ‖decode(codes)‖² = Σ_s ‖c_{s,code_s}‖² — literal-array lookups,
    // left-associated ascending like the oracle's ordered list_sum
    val rn2 = (0 until pqSubspaces).map { s =>
      element_at(typedlit(cb(s).map(_._3).toArray), col(s"code$s").cast("int") + 1)
    }.reduceLeft(_ + _)
    enc.withColumn("rn", sqrt(rn2))
  }

  /** s11: PQ-ADC approximate cosine top-k for the query set
    * `vec_id < nQueries` — same query surface as the exact baseline
    * ([[Similarity.cosineTopK]], s1), scored against 8-byte codes instead
    * of 256-byte vectors.
    */
  def pqAdcTopK(spark: SparkSession, dir: String,
      nQueries: Int = pqQueries, k: Int = pqTopK): DataFrame =
    pqAdcTopKWith(spark, dir, pqCodebooks(spark, dir), nQueries, k)

  private def pqAdcTopKWith(spark: SparkSession, dir: String,
      cb: IndexedSeq[IndexedSeq[PqEntry]], nQueries: Int, k: Int): DataFrame = {
    val subDim = cb.head.head._2.length
    val enc = encode(spark, dir, cb).where(col("rn") > 0)

    val q0 = Tables.embeddings(spark, dir)
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("e"))
      .withColumn("qn", sqrt(dot(col("e"), col("e"))))
      .where(col("qn") > 0)
    // per-query ADC lookup tables: lut_s[c] = ⟨q_s, codebook_s[c]⟩
    val lutCols = (0 until pqSubspaces).map { s =>
      val qs = slice(col("e"), s * subDim + 1, subDim)
      array(cb(s).map { case (_, sub, _) => dot(qs, typedlit(sub)) }: _*)
        .as(s"lut$s")
    }
    val ql = q0.select(Seq(col("qid"), col("qn")) ++ lutCols: _*)

    // approximate dot = 8 table lookups, left-associated ascending
    val adc = (0 until pqSubspaces).map { s =>
      element_at(col(s"lut$s"), col(s"code$s").cast("int") + 1)
    }.reduceLeft(_ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("approx_cosine").desc, col("vec_id"))
    enc.join(broadcast(ql), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), (adc / (col("qn") * col("rn"))).as("approx_cosine"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("int").as("rnk"), col("vec_id"),
        round(col("approx_cosine"), 6).as("approx_cosine"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** s14: PQ RECALL AUDIT — recall@k of the ADC top-k (s11) against the
    * exact brute force (s1), per query: s10's monitoring pattern applied
    * to the quantization axis. This is THE number that prices a PQ bit
    * budget — 8 subspaces × 4 bits trades recall for 32× compression, and
    * whether that trade holds on YOUR embedding distribution (not the
    * paper's) is exactly what this query measures. Reuses the two
    * oracle-verified operators verbatim; one slim (query, neighbor) left
    * join + per-query count.
    */
  def pqRecallAudit(spark: SparkSession, dir: String,
      nQueries: Int = pqQueries, k: Int = pqTopK): DataFrame = {
    val exact = Similarity.cosineTopK(spark, dir, nQueries, k)
      .select(col("qid"), col("vec_id"))
    // thread ONE derived codebook into the ADC side: the audit already
    // pays the exact-baseline scan, it should not pay a second
    // driver-side codebook collect on top
    val approx = pqAdcTopKWith(spark, dir, pqCodebooks(spark, dir), nQueries, k)
      .select(col("qid").as("aqid"), col("vec_id").as("avid"))
    exact.join(approx,
        col("qid") === col("aqid") && col("vec_id") === col("avid"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("avid").isNotNull, 1L).otherwise(0L)).as("n_hit"))
      .select(col("qid"), col("n_exact"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_exact"), 6).as("recall"))
      .orderBy(col("qid"))
  }

  /** s13: PERSISTED PQ codebooks — the model-registry shape for the PQ
    * artifact (the s7/t16 pattern): derive once, write the per-subspace
    * entries to a parquet model dir, and every later run reloads them as
    * a plain scan — no corpus pass. Parquet stores doubles losslessly, so
    * the reloaded codebooks (and therefore codes, reconstruction norms,
    * and ADC scores) are bit-identical to deriving fresh — s13 shares
    * s11's oracle. Operationally this is the contract that matters for
    * PQ: codes persisted with the corpus are only decodable against THE
    * codebook that produced them, so the codebook must be a durable
    * artifact with the same freeze semantics as the IVF model (retrain =
    * re-encode, a scheduled rebuild, never an ingest-path event).
    */
  /** Session-scoped memo of the loaded frozen codebooks (the
    * [[IncrementalIvfPq]] pattern): frozen by contract — a retrain is a
    * new modelDir — so the per-call collect was a fixed cost. Cleared
    * per bench pass.
    */
  private val codebookCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), IndexedSeq[IndexedSeq[PqEntry]]]

  def clearCaches(): Unit = codebookCache.clear()

  /** FREEZE CONTRACT (memoized API): `modelDir` is an immutable model
    * artifact — a retrain writes a NEW dir; an in-place rewrite within one
    * session serves the previously loaded codebooks until [[clearCaches]].
    * Stopped sessions' entries are purged on every lookup.
    */
  def persistedPqCodebooks(spark: SparkSession, dir: String,
      modelDir: String): IndexedSeq[IndexedSeq[PqEntry]] = {
    codebookCache.keySet.removeIf(_._1.sparkContext.isStopped)
    codebookCache.computeIfAbsent((spark, modelDir), _ => {
      val marker = new org.apache.hadoop.fs.Path(modelDir, "_SUCCESS")
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) {
        import spark.implicits._
        pqCodebooks(spark, dir).zipWithIndex
          .flatMap { case (entries, s) =>
            entries.map { case (code, sub, cc) => (s, code, sub.toSeq, cc) }
          }
          .toDF("s", "code", "sub", "cc")
          .coalesce(1).write.mode("overwrite").parquet(modelDir)
      }
      val rows = spark.read.parquet(modelDir).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray, r.getDouble(3)))
      rows.groupBy(_._1).toIndexedSeq.sortBy(_._1)
        .map { case (_, es) =>
          es.sortBy(_._2).map { case (_, code, sub, cc) => (code, sub, cc) }.toIndexedSeq
        }
    })
  }

  def pqAdcTopKPersisted(spark: SparkSession, dir: String, modelDir: String,
      nQueries: Int = pqQueries, k: Int = pqTopK): DataFrame =
    pqAdcTopKWith(spark, dir, persistedPqCodebooks(spark, dir, modelDir), nQueries, k)

  /** s12: IVF-PQ — the two scale levers COMPOSED, which is the actual
    * production ANN index shape (FAISS IVF-PQ): the IVF cells bound WHICH
    * vectors a query touches (probes/cells of the corpus, s3's lever) and
    * the PQ codes bound what each touched vector COSTS (8 table lookups
    * over 8 bytes, s11's lever). At 100 TB neither lever suffices alone —
    * probing 1/8th of 100 TB still reads 12 TB of floats, and ADC over
    * the whole corpus still scans every row; together the scan is
    * probes/cells × 8 B/vector.
    *
    * One projection over one corpus scan computes cell + codes + norm
    * (centroids and codebooks are both literal model metadata); the
    * probe join is broadcast (queries × probe cells); the corpus never
    * shuffles. Cell semantics are exactly s3's (cosine argmax, ties →
    * smaller cid, zero-norm → out-of-domain cell −1); code/ADC semantics
    * are exactly s11's — so the oracle is the composition of the two
    * already-verified CTE chains.
    */
  /** IVF cell of the `e`/`nrm` columns under literal `cents` — s3's exact
    * assignment semantics (cosine argmax, ties → smaller cid, zero-norm →
    * out-of-domain cell −1).
    */
  private[ops] def cellCol(cents: Seq[Similarity.Centroid]): Column = {
    val bestC = array_max(array(cents.map { c =>
      struct((dot(col("e"), typedlit(c._2)) / (col("nrm") * lit(c._3))).as("c"),
        lit(-c._1).as("negcid"))
    }: _*))
    // zero-norm branch FIRST: under ANSI mode (Spark 4 default) a double
    // division by zero THROWS rather than yielding NaN, so the guard must
    // keep the division from ever executing — CaseWhen evaluates only the
    // taken branch, which makes this safe where an isnan() post-check of
    // the divided value would already have crashed
    when(col("nrm") <= lit(0.0), lit(-1L))
      .otherwise(-bestC.getField("negcid"))
  }

  /** The per-subspace code columns (`code0..codeM`) of the `e` column. */
  private[ops] def codeColsOf(cb: IndexedSeq[IndexedSeq[PqEntry]]): Seq[Column] = {
    val subDim = cb.head.head._2.length
    (0 until pqSubspaces).map { s =>
      val xs = slice(col("e"), s * subDim + 1, subDim)
      val best = array_max(array(cb(s).map { case (code, sub, cc) =>
        struct((lit(2.0) * dot(xs, typedlit(sub)) - lit(cc)).as("sc"),
          lit(-code).as("negcode"))
      }: _*))
      (-best.getField("negcode")).as(s"code$s")
    }
  }

  /** Reconstruction norm √Σ_s ‖c_{s,code_s}‖² from the code columns. */
  private[ops] def rnCol(cb: IndexedSeq[IndexedSeq[PqEntry]]): Column =
    sqrt((0 until pqSubspaces).map { s =>
      element_at(typedlit(cb(s).map(_._3).toArray), col(s"code$s").cast("int") + 1)
    }.reduceLeft(_ + _))

  def ivfPqTopK(spark: SparkSession, dir: String,
      nQueries: Int = pqQueries, k: Int = pqTopK): DataFrame = {
    val cb = pqCodebooks(spark, dir)
    val cents = Similarity.firstKCentroids(spark, dir)
    // corpus: cell + 8 codes + reconstruction norm, one map-side pass
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
    val enc = v.select(Seq(col("vec_id"), cellCol(cents).as("cell")) ++ codeColsOf(cb): _*)
      .withColumn("rn", rnCol(cb))
      .where(col("rn") > 0)
    ivfPqTopKFrom(spark, dir, cb, cents, enc, nQueries, k)
  }

  /** The query half of IVF-PQ over an ALREADY-ENCODED corpus `enc`
    * (vec_id, cell, code0..codeM, rn) — one-shot (s12) and incremental
    * (s15) encoders share it, so their results agree whenever their
    * encodings do (which the frozen-model contract guarantees).
    */
  private[ops] def ivfPqTopKFrom(spark: SparkSession, dir: String,
      cb: IndexedSeq[IndexedSeq[PqEntry]], cents: Seq[Similarity.Centroid],
      enc: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val subDim = cb.head.head._2.length

    // queries: ADC luts + their ivfProbes nearest cells
    val q0 = Tables.embeddings(spark, dir)
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("e"))
      .withColumn("qn", sqrt(dot(col("e"), col("e"))))
      .where(col("qn") > 0)
    val lutCols = (0 until pqSubspaces).map { s =>
      val qs = slice(col("e"), s * subDim + 1, subDim)
      array(cb(s).map { case (_, sub, _) => dot(qs, typedlit(sub)) }: _*)
        .as(s"lut$s")
    }
    val probeCol = explode(array(cents.map { c =>
      struct(lit(c._1).as("pcell"),
        (dot(col("e"), typedlit(c._2)) / (col("qn") * lit(c._3))).as("ccos"))
    }: _*)).as("pc")
    val wq = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("pcell"))
    val probes = q0
      .select(Seq(col("qid"), col("qn"), probeCol) ++ lutCols: _*)
      .select(Seq(col("qid"), col("qn"), col("pc.pcell"), col("pc.ccos")) ++
        (0 until pqSubspaces).map(s => col(s"lut$s")): _*)
      .withColumn("rc", row_number().over(wq))
      .where(col("rc") <= Similarity.ivfProbes)
      .drop("ccos", "rc")

    val adc = (0 until pqSubspaces).map { s =>
      element_at(col(s"lut$s"), col(s"code$s").cast("int") + 1)
    }.reduceLeft(_ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("approx_cosine").desc, col("vec_id"))
    enc.join(broadcast(probes),
        col("cell") === col("pcell") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cell"),
        (adc / (col("qn") * col("rn"))).as("approx_cosine"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("int").as("rnk"), col("vec_id"),
        col("cell"), round(col("approx_cosine"), 6).as("approx_cosine"))
      .orderBy(col("qid"), col("rnk"))
  }
}
