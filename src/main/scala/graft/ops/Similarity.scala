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

  private[graft] def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))

  /** Brute-force cosine top-k for the query set `vec_id < nQueries`.
    * The filtered query side is broadcast: the corpus is scanned once,
    * never shuffled; top-k per query via window over the (small)
    * queries×corpus result.
    */
  def cosineTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 3): DataFrame = {
    // zero-norm vectors have undefined cosine — drop them BEFORE the
    // divide (NaN ordering differs between Spark and DuckDB, so a NaN
    // must never reach the rank sort)
    val v = withNorm(Tables.embeddings(spark, dir)).where(col("nrm") > 0)
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

  /** Int8 symmetric quantization + quantized cosine top-k — the
    * memory/bandwidth scale path for ANN: per-vector scale = max|x|/127,
    * components rounded to integers in [-127, 127]. A 100 TB float32
    * embedding corpus becomes 25 TB (4× less RAM and shuffle), and the
    * inner loop is an integer dot product. The per-vector scales CANCEL
    * in cosine (cos(s·q₁, s·q₂) = cos(q₁, q₂)), so quantized cosine is
    * just the cosine of the int vectors — computed here exactly (integer
    * sums ≤ 127²·64 are exact in doubles), making the result
    * engine-deterministic despite quantization.
    */
  def quantizedCosineTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 3): DataFrame = {
    // one codegen pass per vector ([[graft.exprs.Int8Quantize]]); null ⇔
    // scale 0 ⇔ all-zero vector, whose cosine is undefined — filtered
    // before the divide so no NaN ever reaches the rank sort
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        call_function("int8_quantize", col("embedding")).as("q"))
      .where(col("q").isNotNull)
      .withColumn("qnrm", sqrt(dot(col("q"), col("q"))))
    val qs = v.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("qnrm").as("qn"))
    val qcos = dot(col("qq"), col("q")) / (col("qn") * col("qnrm"))
    val w = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("vec_id"))
    v.join(broadcast(qs), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), qcos.as("qcos"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), round(col("qcos"), 6).as("qcos"))
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

  /** Per-bucket occupancy cap for SRP candidate generation (d6/d11/d14/
    * d16) — the embedding-space twin of [[Dedup.maxShingleDf]]: a bucket
    * holding more than this many vectors is dropped from candidate
    * generation entirely, so one degenerate hot bucket (the all-zeros
    * region, a mode-collapsed encoder) cannot make the pair join
    * quadratic — worst-case candidate output is O(buckets · cap²),
    * corpus-independent. The oracle applies the identical cap. Recall in a
    * capped bucket is forfeited BY DESIGN (precision is untouched — every
    * emitted pair is still exact-cosine-verified); near-dups concentrate
    * in ordinary buckets, and a bucket past the cap is evidence the
    * geometry (plane count) is too coarse for the corpus — the fix at
    * scale is more planes or banding ([[srpBandedPairs]]), not unbounded
    * fan-out.
    */
  val maxBucketOccupancy = 100

  /** Slim candidate phase shared by d6/d11: (v1, v2) pairs from exact
    * bucket equality, hot buckets dropped. The self-join carries ONLY
    * (vec_id, bucket) — the embedding payload never enters a candidate
    * shuffle (SCALE.md's slim-candidate rule; at 100 TB the old
    * vector-carrying join duplicated every embedding once per candidate
    * pair in shuffle writes). One exchange on bucket feeds the occupancy
    * aggregation and both self-join sides (ReuseExchange); the cap table
    * is ≤ 2^numPlanes rows, broadcast.
    */
  private[graft] def cappedCandidatePairs(spark: SparkSession, dir: String,
      cap: Int = maxBucketOccupancy): DataFrame = {
    val slim = Tables.embeddings(spark, dir)
      .select(col("vec_id"), lshBucket(col("embedding")).as("bucket"))
      .repartition(col("bucket"))
    val cold = slim.groupBy(col("bucket")).agg(count(lit(1)).as("occ"))
      .where(col("occ") <= cap).select(col("bucket"))
    val c = slim.join(broadcast(cold), "bucket")
    c.as("a").join(c.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
  }

  /** Exact-cosine verification of slim (v1, v2) candidate pairs: the
    * embedding payloads are joined back BY KEY — two 1:1 equi-joins on
    * vec_id, each carrying one vector per corpus row, not one per
    * candidate pair. Shared by d6, d16 and (shape-wise) d14.
    */
  private[graft] def verifyPairs(spark: SparkSession, dir: String,
      pairs: DataFrame, threshold: Double): DataFrame = {
    // zero-norm vectors have undefined cosine; ANSI double division
    // THROWS on /0, and the oracle's NaN fails every threshold anyway —
    // exclusion is both crash-proof and value-identical
    val pay = withNorm(Tables.embeddings(spark, dir)).where(col("nrm") > 0)
    val p1 = pay.select(col("vec_id").as("v1"), col("e").as("e1"), col("nrm").as("n1"))
    val p2 = pay.select(col("vec_id").as("v2"), col("e").as("e2"), col("nrm").as("n2"))
    val cos = dot(col("e1"), col("e2")) / (col("n1") * col("n2"))
    pairs.join(p1, "v1").join(p2, "v2")
      .select(col("v1"), col("v2"), round(cos, 6).as("cosine"))
      .where(col("cosine") >= threshold)
      .orderBy(col("v1"), col("v2"))
  }

  /** Embedding-cosine near-duplicate pairs: candidates from LSH bucket
    * equality (same deterministic hyperplanes as [[annLsh]]), hot buckets
    * capped ([[maxBucketOccupancy]]), verified by exact cosine >=
    * threshold. The near-dup analog of MinHash-LSH for the embedding
    * space: one slim shuffle on bucket, candidate count bounded by
    * bucket geometry AND the occupancy cap, never all-pairs.
    */
  def embeddingNearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame =
    verifyPairs(spark, dir, cappedCandidatePairs(spark, dir), threshold)

  /** Band count × width for the multi-band SRP OR-construction (d16). */
  val srpBands = 4
  val srpBandWidth = 8

  /** d16: multi-band SRP near-dup pairs — the RECALL-preserving way to use
    * a wider signature. One 32-plane signature per vector (one codegen
    * pass; plane p is width-independent, so band 0 is exactly the d6
    * bucket), sliced into 4 × 8-bit band keys: vectors are candidates when
    * ANY band matches (OR-construction, the d3 MinHash-LSH geometry in
    * sign space). Versus one 8-bit bucket: the bucket DOMAIN per band is
    * the same 256 values, but 4 independent chances at collision push
    * near-dup recall toward 1 while the occupancy cap still bounds every
    * band's fan-out; versus one 32-bit bucket: ~4 B distinct keys would
    * shatter genuine near-dups apart (0.63^32 ≈ 4e-7 collision at
    * cosine 0.4). Key space = bands × 2^width, so join parallelism scales
    * with the banding, not a fixed 256.
    */
  def srpBandedPairs(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val nP = srpBands * srpBandWidth
    val bandKeys = (0 until srpBands).map { b =>
      concat(lit(s"$b:"), substring(col("sig"), b * srpBandWidth + 1, srpBandWidth))
    }
    val slim = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        call_function("srp_bucket", col("embedding"), lit(nP)).as("sig"))
      .select(col("vec_id"), explode(array(bandKeys: _*)).as("bkey"))
      .repartition(col("bkey"))
    val cold = slim.groupBy(col("bkey")).agg(count(lit(1)).as("occ"))
      .where(col("occ") <= maxBucketOccupancy).select(col("bkey"))
    val c = slim.join(broadcast(cold), "bkey")
    val pairs = c.as("a").join(c.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      .dropDuplicates("v1", "v2")
    verifyPairs(spark, dir, pairs, threshold)
  }

  /** Duplicate clusters in EMBEDDING space (d11): connected components
    * over the [[embeddingNearDupPairs]] graph, labeling every clustered
    * vector with its component's min vec_id — the same keeper-assignment
    * step d7 performs for text near-dups, over the semantic (embedding)
    * duplicate relation instead of the lexical one. A training pipeline
    * needs BOTH: lexical dedup misses paraphrases; embedding dedup misses
    * nothing a good encoder maps together.
    *
    * Same scale story as [[graft.ops.Dedup.dupClusters]]: pair candidates
    * only from LSH bucket equality, CC via pointer-jumped label
    * propagation (O(log diameter) rounds, checkpointed) with the
    * star-contraction fallback.
    */
  def embeddingDupClusters(spark: SparkSession, dir: String,
      threshold: Double = 0.4): DataFrame = {
    import graft.ops.ConnectedComponents
    val pairs = embeddingNearDupPairs(spark, dir, threshold)
      .select(col("v1"), col("v2"))
    val labels = ConnectedComponents.adaptiveMinLabels(spark, pairs)
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("node").as("vec_id"), col("label").as("cluster_id"),
        col("cluster_size"),
        (col("node") === col("label")).cast("int").as("is_keeper"))
      .orderBy(col("vec_id"))
  }

  val ivfCells = 16
  val ivfProbes = 2

  /** IVF (inverted-file) ANN — the scale path beyond one-shot LSH:
    * partition the corpus into `ivfCells` cells by nearest centroid, then
    * answer each query by brute-forcing only its `ivfProbes` nearest cells
    * (candidates = probes/cells of the corpus, here 1/8th).
    *
    * Centroids are the first `ivfCells` vectors (deterministic — a
    * production build would k-means them; the IVF mechanics are identical
    * and this keeps the DuckDB oracle exact). They are collected to the
    * driver (16 rows — centroids are model metadata, like a broadcast
    * model: at 100 TB the corpus never moves, only cell ids shuffle) and
    * embedded as literal arrays, so cell assignment is a pure
    * codegen-friendly projection: 16 `array_dot`s per row, no join.
    *
    * Tie-breaks are deterministic everywhere: equal cosine → smaller cell
    * id (assignment and probe ranking), then smaller vec_id (top-k).
    */
  def annIvf(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 3): DataFrame =
    ivfTopK(spark, dir, firstKCentroids(spark, dir), nQueries, k)

  /** A centroid payload: (cid, components-as-double, norm). Passed by
    * value, never indexed by cid — centroid ids need not be dense or
    * zero-based.
    */
  type Centroid = (Long, Array[Double], Double)

  private def centCos(c: Centroid): Column =
    dot(col("e"), typedlit(c._2)) / (col("nrm") * lit(c._3))

  /** The fixed deterministic centroid set: the first `n` vectors
    * (ascending vec_id) — the oracle-exact twin [[trainIvfCentroids]]
    * starts from.
    */
  def firstKCentroids(spark: SparkSession, dir: String, n: Int = ivfCells): Seq[Centroid] =
    withNorm(Tables.embeddings(spark, dir))
      .where(col("vec_id") < n).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getDouble(2)))
      .sortBy(_._1).toSeq

  /** Fixed Lloyd's iterations for [[trainIvfCentroids]] — a constant so
    * the DuckDB oracle unrolls exactly this many CTE rounds.
    */
  val ivfLloydIters = 2

  /** Deterministic Lloyd's (k-means) training for the IVF cells: first-k
    * init, `iters` fixed iterations, every step engine-reproducible so the
    * DuckDB oracle replays training bit-for-bit:
    *
    *   - assignment: nearest centroid by cosine, ties → smaller cid (the
    *     same rule the query path uses); zero-norm vectors never train;
    *   - update: component-wise mean via SCALED-INTEGER sums —
    *     Σ floor(e_j·1e6) is exact and aggregation-order-insensitive
    *     (a plain double sum would flip bits under Spark's partial-agg
    *     order), divided once by (n·1e6) in double;
    *   - an empty cell (or a degenerate all-zero mean) keeps its previous
    *     centroid, so the cell count never silently shrinks.
    *
    * Scale shape: per iteration, one assignment projection (16 compiled
    * array_dots per row, no join) plus one (cell, component) aggregation
    * collecting cells×dims rows to the driver — centroids are model
    * metadata, like a broadcast model: the corpus never shuffles, and at
    * 100 TB each iteration is one map-side pass plus a 1024-row collect.
    */
  def trainIvfCentroids(spark: SparkSession, dir: String,
      iters: Int = ivfLloydIters): Seq[Centroid] = {
    val v = withNorm(Tables.embeddings(spark, dir)).where(col("nrm") > 0)
    var cents = firstKCentroids(spark, dir)
    for (_ <- 1 to iters) {
      // same argmax-as-array_max construction as the query path: max
      // (cos, −cid) struct = best cosine, ties to the smaller cell id
      val bestS = array_max(array(cents.map { c =>
        struct(centCos(c).as("c"), lit(-c._1).as("negcid"))
      }: _*))
      // component sums via the vector_sum_scaled UDAF: one buffer of dim
      // longs per cell, mergeable map-side — no dim× row explosion, and
      // floored scaled-integer sums are exact, so the result is identical
      // under any partitioning (and to the oracle's per-component sums)
      val sums = v.select((-bestS.getField("negcid")).as("cell"), col("e"))
        .groupBy(col("cell"))
        .agg(call_function("vector_sum_scaled", col("e"), lit(1e6)).as("s"),
          count(lit(1)).as("cnt"))
        .collect()
      val byCell = sums.map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
      cents = cents.map { case (cid, ce, cn) =>
        byCell.get(cid).map { case (s, cnt) =>
          val arr = Array.tabulate(ce.length)(j => s(j).toDouble / (cnt * 1e6))
          // ascending-index fold — the same operand order as ArrayDot and
          // DuckDB's list_sum, so norms are bit-identical across engines
          val nrm = math.sqrt(arr.foldLeft(0.0)((a, x) => a + x * x))
          if (nrm > 0) (cid, arr, nrm) else (cid, ce, cn)
        }.getOrElse((cid, ce, cn))
      }
    }
    cents
  }

  /** s5: IVF ANN over Lloyd's-trained centroids — same query mechanics as
    * [[annIvf]], better-centered cells (IvfTrainingSpec pins recall@k vs
    * the exact brute force at ≥ the fixed-centroid baseline).
    */
  def annIvfTrained(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 3): DataFrame =
    ivfTopK(spark, dir, trainIvfCentroids(spark, dir), nQueries, k)

  /** s7: PERSISTED trained centroids — the model-registry shape a real
    * deployment uses: train once, write the centroid table to a model
    * dir, and every later run reloads it as a plain parquet scan (no
    * training job, no corpus pass). Parquet stores doubles losslessly,
    * so the reloaded model — and therefore the query result — is
    * bit-identical to training fresh (s7 shares s5's oracle; the reload
    * path feeds the NATIVE assignment expression, composing s5 × s6).
    */
  /** Session-scoped memo of the loaded frozen centroid model (the
    * [[IncrementalIvfPq]] pattern): the model is frozen by contract —a
    * retrain is a new modelDir — so re-collecting the same parquet per
    * merge/serve was a fixed per-call cost. Cleared per bench pass.
    * Entries of STOPPED sessions are purged on every lookup so a
    * long-lived multi-session JVM cannot grow the memo unboundedly.
    */
  private val centroidCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Seq[Centroid]]

  def clearCaches(): Unit = centroidCache.clear()

  /** FREEZE CONTRACT (memoized API): `modelDir` is an immutable model
    * artifact — a retrain writes a NEW dir. Deleting or rewriting a
    * modelDir in place within one session serves the previously loaded
    * model until [[clearCaches]] (exactly the in-memory residency a
    * serving deployment wants; never do in-place rewrites).
    */
  def persistedIvfCentroids(spark: SparkSession, dir: String,
      modelDir: String): Seq[Centroid] = {
    centroidCache.keySet.removeIf(_._1.sparkContext.isStopped)
    centroidCache.computeIfAbsent((spark, modelDir), _ => {
      val marker = new org.apache.hadoop.fs.Path(modelDir, "_SUCCESS")
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) {
        import spark.implicits._
        trainIvfCentroids(spark, dir)
          .map { case (cid, ce, cn) => (cid, ce.toSeq, cn) }
          .toDF("cid", "ce", "cn")
          .coalesce(1).write.mode("overwrite").parquet(modelDir)
      }
      spark.read.parquet(modelDir).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
        .sortBy(_._1).toSeq
    })
  }

  def annIvfPersisted(spark: SparkSession, dir: String, modelDir: String,
      nQueries: Int = 10, k: Int = 3): DataFrame =
    ivfTopKNative(spark, dir, persistedIvfCentroids(spark, dir, modelDir), nQueries, k)

  private def ivfTopK(spark: SparkSession, dir: String, cents: Seq[Centroid],
      nQueries: Int, k: Int): DataFrame = {
    val v = withNorm(Tables.embeddings(spark, dir))

    // corpus → cell: argmax centroid cosine as ONE array_max over
    // (cos, −cid) structs — each centroid dot computed exactly once (the
    // previous greatest + when-fold re-evaluated every dot in the tie
    // scan and doubled the generated code), and struct ordering gives the
    // tie-break for free: max cos, then max −cid = smallest cid —
    // matching the oracle's ORDER BY cos DESC, cid ASC. A zero-norm
    // vector's cosines are all NaN (sorts greatest): such rows get the
    // out-of-domain cell −1, as before, and never join a probe.
    val bestS = array_max(array(cents.map { c =>
      struct(centCos(c).as("c"), lit(-c._1).as("negcid"))
    }: _*))
    // zero-norm branch FIRST: ANSI double division THROWS on /0, so the
    // out-of-domain −1 must short-circuit before any centroid cosine
    // evaluates (CaseWhen runs only the taken branch)
    val cell = when(col("nrm") <= lit(0.0), lit(-1L))
      .otherwise(-bestS.getField("negcid"))
    val asg = v.withColumn("cell", cell)

    // queries → their ivfProbes nearest cells (rank over 16 rows per
    // query); zero-norm queries have no defined ranking and are excluded
    // (same contract as the s1 brute force)
    val qc = v.where(col("vec_id") < nQueries).where(col("nrm") > 0)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"),
        explode(array(cents.map { c =>
          struct(lit(c._1).as("pcell"), centCos(c).as("ccos"))
        }: _*)).as("pc"))
      .select(col("qid"), col("qe"), col("qn"), col("pc.pcell"), col("pc.ccos"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("pcell"))
    val probes = qc.withColumn("rc", row_number().over(wq))
      .where(col("rc") <= ivfProbes)
      .select(col("qid"), col("qe"), col("qn"), col("pcell"))

    probeTopK(asg, probes, k)
  }

  /** The number of cells for the NATIVE-assignment IVF surface (s6) — past
    * the literal-centroid codegen ceiling (the inlined `array_max` tree is
    * O(cells·dim) generated code; 64 cells × 64 dims would be ~4096
    * inlined struct fields, where the native path is one call at ANY k).
    */
  val ivfCellsWide = 64

  /** s6: IVF ANN with cell assignment and probe ranking computed by the
    * native [[graft.exprs.IvfProbe]] expression — the centroid matrix is
    * a codegen reference object, so the plan (and its generated code) is
    * O(1) in the cell count. Semantics are bit-identical to the literal
    * path ([[annIvf]]) at equal centroids (IvfNativeSpec pins it); this
    * surface runs at `ivfCellsWide` = 64 cells, where the literal
    * construction would already be pathological.
    */
  def annIvfWide(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 3): DataFrame =
    ivfTopKNative(spark, dir, firstKCentroids(spark, dir, ivfCellsWide), nQueries, k)

  /** s10: ANN RECALL AUDIT — recall@k of the IVF index ([[annIvf]], s3)
    * against the exact brute-force top-k ([[cosineTopK]], s1), per query.
    * Every production ANN deployment monitors exactly this number: the
    * index trades recall for probe cost, and the trade must be MEASURED
    * on real data, not assumed from the paper.
    *
    * Both sides are the already-oracle-verified operators, reused
    * verbatim; the audit itself is one left join on (query, neighbor) and
    * a per-query count — so the audit is as cheap as the queries it
    * audits. At 100 TB the exact side is the expensive one, which is
    * exactly how production recall audits run: brute-force a SAMPLE of
    * queries (nQueries here), never the full workload, and track the
    * estimate over time. Output: (qid, n_exact, n_hit, recall).
    */
  def annRecallAudit(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 3): DataFrame = {
    val exact = cosineTopK(spark, dir, nQueries, k)
      .select(col("qid"), col("vec_id"))
    val approx = annIvf(spark, dir, nQueries, k)
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

  private[graft] def ivfTopKNative(spark: SparkSession, dir: String,
      cents: Seq[Centroid], nQueries: Int, k: Int): DataFrame = {
    val spec = graft.exprs.IvfProbe.render(cents)
    val v = withNorm(Tables.embeddings(spark, dir))
    // corpus → cell: top-1 probe; NaN best cosine (zero-norm vector) maps
    // to the out-of-domain cell −1, exactly like the literal path
    val best = element_at(
      call_function("ivf_probe", col("e"), lit(spec), lit(1)), 1)
    val cell = when(isnan(best.getField("ccos")), lit(-1L))
      .otherwise(best.getField("cid"))
    val asg = v.withColumn("cell", cell)
    // queries → their ivfProbes nearest cells: the expression returns them
    // already ranked (ccos desc, cid asc) — no window needed
    val probes = v.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"),
        explode(call_function("ivf_probe", col("e"), lit(spec), lit(ivfProbes))).as("pc"))
      .select(col("qid"), col("qe"), col("qn"), col("pc.cid").as("pcell"))
    probeTopK(asg, probes, k)
  }

  /** Shared IVF tail: probe the assigned corpus with the broadcast query
    * probe list and take the per-query top-k. The corpus is scanned once,
    * never shuffled; a corpus vector is in exactly one cell, so no
    * cross-probe duplicates to dedup.
    */
  private[graft] def probeTopK(asg: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val cos = dot(col("qe"), col("e")) / (col("qn") * col("nrm"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
    asg.join(broadcast(probes.where(col("qn") > 0)),
        col("cell") === col("pcell") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("cell"), cos.as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), col("cell"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** ANN: nearest neighbor per vector among same-bucket candidates.
    * One shuffle (bucket equi-join); vectors alone in their bucket emit no
    * row — the recall/cost dial is `numPlanes`.
    */
  /** Cosine threshold for d22 semantic dedup — the SAME 0.4 relation the
    * d6/d11 LSH path verifies, on purpose: with the threshold held fixed,
    * any membership difference between d11's clusters and d22's is
    * attributable purely to candidate GEOMETRY (SRP buckets vs k-means
    * cells). A production deployment calibrates this per-corpus (the
    * SemDeDup paper tunes it to the target dedup fraction).
    */
  val semDedupThreshold = 0.4

  /** d22: SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication") — the cluster-then-prune alternative to the d6/d11
    * LSH-bucket geometry:
    *
    *   1. k-means the embedding space (the s5 deterministic Lloyd's
    *      training, reused verbatim — same centroids, same oracle replay);
    *   2. candidate pairs ONLY within a cluster cell (the paper's core
    *      trick: k scales with the corpus so cells stay O(cap), making
    *      pairwise work O(n·cap), never O(n²) — here k = [[ivfCells]] at
    *      test scale, a deployment sets k ∝ n);
    *   3. exact-cosine verify at [[semDedupThreshold]], connected
    *      components over surviving pairs;
    *   4. keeper = the member with the LOWEST cosine to its cell centroid
    *      (ties → smaller vec_id): the paper keeps the example FARTHEST
    *      from the centroid — the least prototypical member carries the
    *      most marginal information for training.
    *
    * Scale shape: assignment is one map-side compiled argmax vs broadcast
    * centroids (no join); the within-cell self-join carries only
    * (vec_id, cell) — slim-candidate rule — with payloads joined back by
    * key in [[verifyPairs]]; CC runs over verified pairs only. Contrast
    * with d11: LSH buckets approximate the similarity relation (recall
    * loss at bucket boundaries), k-means cells partition the space by
    * actual geometry, so recall within a cell is exact — the trade is a
    * training pass for the model.
    *
    * Keeper comparisons use the 6-dp ROUNDED centroid cosine, so the
    * argmin is decided on values both engines agree on bit-for-bit.
    */
  def semDedupClusters(spark: SparkSession, dir: String,
      threshold: Double = semDedupThreshold,
      centroids: Option[Seq[Centroid]] = None): DataFrame = {
    // callers holding the persisted s7 model pass it in (bit-identical
    // to training fresh — the registry contract); default trains
    val cents = centroids.getOrElse(trainIvfCentroids(spark, dir))
    // zero-norm vectors assign to no cell and never pair — filtered
    // BEFORE the argmax projection (ANSI double division throws on /0)
    val v = withNorm(Tables.embeddings(spark, dir)).where(col("nrm") > 0)
    val bestS = array_max(array(cents.map { c =>
      struct(centCos(c).as("c"), lit(-c._1).as("negcid"))
    }: _*))
    val asg = v.select(col("vec_id"),
        (-bestS.getField("negcid")).as("cell"),
        round(bestS.getField("c"), 6).as("ccos"))
      // one materialization of the 16-dot argmax projection feeds the
      // self-join's both sides AND the keeper join below
      .repartition(col("cell"))
    val slim = asg.select(col("vec_id"), col("cell"))
    val pairs = slim.as("a").join(slim.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
    val verified = verifyPairs(spark, dir, pairs, threshold)
      .select(col("v1"), col("v2"))
    val labels = ConnectedComponents.adaptiveMinLabels(spark, verified)
    val labeled = labels
      .select(col("node").as("vec_id"), col("label").as("cluster_id"))
      .join(asg, "vec_id")
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("ccos"), col("vec_id"))
    labeled
      .withColumn("is_keeper", (row_number().over(w) === 1).cast("int"))
      .select(col("vec_id"), col("cell"), col("cluster_id"), col("is_keeper"))
      .orderBy(col("vec_id"))
  }

  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    // repartition = materialization barrier: the 8-plane bucket aggregation
    // is computed once and reused by both self-join branches.
    val v = withNorm(Tables.embeddings(spark, dir))
      .where(col("nrm") > 0)
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
