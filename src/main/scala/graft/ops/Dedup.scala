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
    * dropped from candidate generation (a stopword-shingle guard; at scale
    * this caps the worst-case join fan-out per shingle). Non-binding at
    * harness scale; the oracle applies the identical cap.
    */
  val maxShingleDf = 1000

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

  /** MinHash signatures: hash_i(shingle) = md5("i:" ++ shingle), min taken
    * LEXICOGRAPHICALLY over the hex strings — identical in any engine with
    * a standard md5, which is what makes the oracle reproducible. Docs with
    * no shingles have no signature (cannot near-dup match).
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", transform(sequence(lit(0), lit(numHashes - 1)), i =>
        array_min(transform(col("sh"), s =>
          md5(concat(i.cast("string"), lit(":"), s))))))

  /** LSH near-dup: band the signatures, equi-join on (band, band hash),
    * then verify candidates with exact Jaccard >= threshold.
    */
  def minhashLshPairs(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val sigs = minhashSignatures(spark, dir)
    val bands = sigs.select(
      col("doc_id"), col("sh"),
      explode(transform(sequence(lit(0), lit(numBands - 1)), b =>
        struct(b.as("band"),
          md5(concat((0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*)).as("bh")))).as("e"))
      .select(col("doc_id"), col("sh"), col("e.band"), col("e.bh"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.sh").as("sh1"), col("b.sh").as("sh2"))
      .dropDuplicates("d1", "d2")
    val inter = size(array_intersect(col("sh1"), col("sh2"))).cast("double")
    val jac = inter / (size(col("sh1")) + size(col("sh2")) - inter)
    cand
      .select(col("d1"), col("d2"), round(jac, 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy(col("d1"), col("d2"))
  }

  /** 32-bit SimHash over tokens (term frequency preserved): bit b is the
    * sign of Σ_tokens (2·bit_b(md5(token)) − 1). Signature rendered as a
    * 32-char bitstring. Hex-digit decoding uses conv(·,16,10), mirrored by
    * strpos arithmetic in the oracle.
    */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val hs = transform(tokens(col("text")), t => md5(t))
    val bits = transform(sequence(lit(0), lit(31)), b => {
      val contrib = aggregate(hs, lit(0), (acc, h) => {
        val nibble = conv(h.substr((b / 4).cast("int") + 1, lit(1)), 16, 10).cast("int")
        val bit = floor(nibble / pow(lit(2), lit(3) - b % 4)).cast("int") % 2
        acc + (bit * 2 - 1)
      })
      when(contrib > 0, lit("1")).otherwise(lit("0"))
    })
    Tables.documents(spark, dir)
      .select(col("doc_id"), array_join(bits, "").as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs: candidates share one of four 8-bit bands
    * (necessary condition for Hamming distance <= 3), verified by exact
    * Hamming count over the 32 bits.
    */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(spark, dir)
    val bands = sigs.select(col("doc_id"), col("simhash"),
      explode(transform(sequence(lit(0), lit(3)), b =>
        struct(b.as("band"), col("simhash").substr(b * 8 + 1, lit(8)).as("bv")))).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.band"), col("e.bv"))
    val hamming = aggregate(sequence(lit(1), lit(32)), lit(0), (acc, i) =>
      acc + when(col("s1").substr(i, lit(1)) =!= col("s2").substr(i, lit(1)), 1).otherwise(0))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.simhash").as("s1"), col("b.simhash").as("s2"))
      .dropDuplicates("d1", "d2")
      .select(col("d1"), col("d2"), hamming.as("hamming"))
      .where(col("hamming") <= maxHamming)
      .orderBy(col("d1"), col("d2"))
  }
}
