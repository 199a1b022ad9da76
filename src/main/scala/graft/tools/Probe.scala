package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.{Dedup, Similarity}

/** Ad-hoc plan/size probe (not part of the engine surface). */
object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("probe", 16)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // d5 stages
    val sigs = Dedup.simhashSignatures(spark, dir)
    time("d5 signatures")(sigs.count())
    val sigsR = sigs
      .withColumn("sigint", conv(col("simhash"), 2, 10).cast("long"))
      .repartition(col("doc_id"))
    val bands = sigsR.select(col("doc_id"), col("sigint"),
      explode(transform(sequence(lit(0), lit(3)), b =>
        struct(b.as("band"), col("simhash").substr(b * 8 + 1, lit(8)).as("bv")))).as("e"))
      .select(col("doc_id"), col("sigint"), col("e.band"), col("e.bv"))
    time("d5 bands")(bands.count())
    val joined = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
    time("d5 raw join")(joined.count())
    val ham = bit_count(col("a.sigint").bitwiseXOR(col("b.sigint"))).cast("int")
    val filtered = joined
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"), ham.as("hamming"))
      .where(col("hamming") <= 3)
    time("d5 filtered")(filtered.count())
    time("d5 full")(Dedup.simhashPairs(spark, dir).count())

    // d6 stages
    Similarity.cosineTopK(spark, dir).count() // warm the embeddings scan
    time("d6 full")(Similarity.embeddingNearDupPairs(spark, dir).count())
    time("s2 full")(Similarity.annLsh(spark, dir).count())

    // d3 stages
    time("d3 minhash sigs")(Dedup.minhashSignatures(spark, dir).count())
    time("d3 full")(Dedup.minhashLshPairs(spark, dir).count())

    // d2 stages
    time("d2 full")(Dedup.ngramJaccardPairs(spark, dir).count())

    // d7/d8: pairs re-timed warm, then the iterative label propagation on
    // top of them — the delta is the per-round cost.
    time("d7 pairs warm")(Dedup.simhashPairs(spark, dir).count())
    time("d7 full")(Dedup.dupClusters(spark, dir).count())
    time("d8 full")(Dedup.keeperByQuality(spark, dir).count())
    spark.stop()
  }
}
