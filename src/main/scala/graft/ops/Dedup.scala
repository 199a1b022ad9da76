package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication operators over the `documents` table — the four standard
  * families for LLM training-data pipelines: exact (hash group), n-gram
  * Jaccard (inverted-index join), MinHash-LSH (banded signature join), and
  * SimHash (bit-signature banding).
  *
  * Scale design (the 100 TB question for dedup is always "how do you avoid
  * the O(n²) pair space?"):
  *   - exact: one shuffle on a 256-bit hash — embarrassingly scalable;
  *   - n-gram Jaccard: pairs are generated ONLY through a shingle
  *     inverted-index equi-join (shuffle on shingle), with a document-
  *     frequency cap dropping degenerate hot shingles, then verified
  *     exactly — never an all-pairs product;
  *   - MinHash-LSH: candidate pairs come from equality on banded signature
  *     hashes (shuffle on (band, signature)); the candidate count is
  *     controlled by band geometry, independent of corpus size;
  *   - SimHash: 32-bit signatures, candidates via 8-bit band equality —
  *     a pair within Hamming distance 3 must agree on ≥1 of 4 bands.
  */
object Dedup {
  import Text._

  /** Exact dedup: group on sha256 of normalized text. Output one row per
    * distinct content with the keeper (min doc_id) and duplicate count.
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), sha2(normalized(col("text")).cast("binary"), 256).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy(col("keeper"))

  /** Distinct 3-shingles per doc, exploded (the inverted index). */
  private def shingleIndex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))

  /** Max shingle document frequency: shingles appearing in more docs are
    * dropped from candidate generation (a stopword-shingle guard: the pair
    * fan-out of one shingle is O(df²), so the cap bounds worst-case join
    * output at corpus-independent cost; near-dup pairs share many RARE
    * shingles, so recall is unaffected). The oracle applies the identical
    * cap.
    */
  val maxShingleDf = 100

  /** Near-dup pairs by exact n-gram Jaccard >= threshold, candidates from
    * the shingle inverted index. Two shuffles (shingle join, pair group);
    * no cross join anywhere.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val sh = shingleIndex(spark, dir)
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxShingleDf)
    val idx = sh.join(df.select("shingle"), "shingle")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = idx.as("a")
      .join(idx.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    val jac = col("inter").cast("double") /
      (col("s1.n") + col("s2.n") - col("inter"))
    pairs
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .where(jac >= threshold)
      .select(col("d1"), col("d2"), round(jac, 6).as("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** MinHash geometry: 12 hashes = 4 bands x 3 rows. For Jaccard j the
    * candidate probability is 1-(1-j^3)^4 (≈0.9998 at j=0.9, ≈0.03 at
    * j=0.2) — the standard S-curve for a 0.8 threshold.
    */
  val numHashes = 12
  val numBands = 4
  val rowsPerBand = 3

  /** Universal-hash family for MinHash: hash_i(s) = (a_i·h(s) + b_i) mod p
    * over base hash h(s) = first 32 md5 bits — ONE md5 per shingle, the 12
    * permutations are pure integer arithmetic (12× cheaper than hashing
    * every shingle 12 times, and exactly reproducible in any engine:
    * a·(h mod p) + b < 2^62 never overflows a 64-bit long).
    */
  val minhashP = 2147483647L // 2^31 - 1 (Mersenne prime)
  val minhashA: Seq[Long] = Seq(973717083L, 388916825L, 1122824377L,
    1156439251L, 1550959721L, 1241362649L, 2005430819L, 1558641197L,
    689046827L, 1927793921L, 1123562147L, 1653359563L)
  val minhashB: Seq[Long] = Seq(1852938293L, 1706799503L, 1472706723L,
    1205230523L, 982616981L, 1121324977L, 1398263921L, 2044101221L,
    1870037483L, 1035371213L, 1497247889L, 656987819L)

  /** MinHash signatures (docs with no shingles have none — they cannot
    * near-dup match). The repartition between base-hash and signature
    * projection is a materialization barrier: `hs` is referenced by all 12
    * mins, and without the exchange CollapseProject would inline (and
    * recompute) the md5 array once per reference.
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("hs", transform(col("sh"), s =>
        conv(substring(md5(s), 1, 8), 16, 10).cast("long") % minhashP))
      .repartition(col("doc_id"))
      .withColumn("sig", array((0 until numHashes).map(i =>
        array_min(transform(col("hs"),
          h => (lit(minhashA(i)) * h + lit(minhashB(i))) % minhashP))): _*))
      .drop("hs")

  /** LSH near-dup: band the signatures, equi-join on (band, band hash),
    * then verify candidates with exact Jaccard >= threshold.
    */
  def minhashLshPairs(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    // The repartition is a deliberate materialization barrier: without it,
    // CollapseProject inlines the signature expression into every
    // element_at reference (12x recompute per doc) and the self-join
    // branches recompute the whole subtree again. With the exchange, the
    // signature is computed once and BOTH join branches reuse the
    // materialized exchange (ReuseExchange).
    val sigs = minhashSignatures(spark, dir).repartition(col("doc_id"))
    // Candidates travel SLIM: only (doc_id, band, band-hash) shuffles
    // through the equi-join and the pair dedup; the heavyweight shingle
    // sets are joined back afterwards, once per SURVIVING pair.
    val bands = sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(numBands - 1)), b =>
        struct(b.as("band"),
          concat_ws(":", (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("bh")))).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bh"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .dropDuplicates("d1", "d2")
    val sets = sigs.select(col("doc_id"), col("sh"))
    val inter = size(array_intersect(col("sh1"), col("sh2"))).cast("double")
    val jac = inter / (size(col("sh1")) + size(col("sh2")) - inter)
    cand
      .join(sets.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
      .select(col("d1"), col("d2"), round(jac, 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy(col("d1"), col("d2"))
  }

  /** 32-bit SimHash over tokens (term frequency preserved): bit b is the
    * sign of Σ_tokens (2·bit_b(md5(token)) − 1). Signature rendered as a
    * 32-char bitstring.
    *
    * Implementation: one conv per TOKEN (first 8 md5 hex chars → 32-bit
    * int → bin() bitstring), then a single fold summing all 32 bit counts
    * at once — bit-identical to extracting each hex nibble separately
    * (which is how the DuckDB oracle spells it), at 1/32nd the expression
    * evaluations. Sign test: Σ(2·bit−1) > 0 ⟺ 2·ones > n_tokens.
    */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val hsBits = transform(toks, t =>
      lpad(bin(conv(substring(md5(t), 1, 8), 16, 10).cast("long")), 32, "0"))
    val zeros = array_repeat(lit(0), 32)
    val ones = aggregate(hsBits, zeros, (acc, s) =>
      zip_with(acc, slice(split(s, ""), 1, 32), (a, c) =>
        a + when(c === "1", 1).otherwise(0)))
    val n = size(toks)
    val simhash = array_join(
      transform(ones, o => when(o * 2 > n, lit("1")).otherwise(lit("0"))), "")
    Tables.documents(spark, dir)
      .select(col("doc_id"), simhash.as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs: candidates share one of four 8-bit bands
    * (necessary condition for Hamming distance <= 3), verified by exact
    * Hamming count over the 32 bits.
    */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    // Signature doubled as an integer so Hamming distance is a single
    // bit_count(xor) — semantically identical to comparing the 32 chars
    // (the oracle does it character-wise; outputs match).
    // repartition = materialization barrier (see minhashLshPairs): the
    // 32-bit signature aggregation runs once, not once per join branch.
    val sigs = simhashSignatures(spark, dir)
      .withColumn("sigint", conv(col("simhash"), 2, 10).cast("long"))
      .repartition(col("doc_id"))
    val bands = sigs.select(col("doc_id"), col("sigint"),
      explode(transform(sequence(lit(0), lit(3)), b =>
        struct(b.as("band"), col("simhash").substr(b * 8 + 1, lit(8)).as("bv")))).as("e"))
      .select(col("doc_id"), col("sigint"), col("e.band"), col("e.bv"))
    // Verify BEFORE deduplicating: the <=maxHamming filter runs on the raw
    // join output (cheap bit_count, no wide strings), so the pair-dedup
    // shuffle only carries survivors.
    val hamming = bit_count(col("a.sigint").bitwiseXOR(col("b.sigint"))).cast("int")
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"), hamming.as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("d1", "d2")
      .orderBy(col("d1"), col("d2"))
  }
}
