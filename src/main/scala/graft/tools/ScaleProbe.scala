package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Empirical scale validation (not part of the engine surface): derive a
  * 10× "sf1" corpus from sf0.1 and measure each heavy op at both scales,
  * printing the time ratio — the SCALE.md O(·) arguments, measured.
  *
  * Derivation keeps the scaling HONEST for the dedup/similarity family:
  * sf1 is 10 structurally isomorphic replicas of sf0.1 that are pairwise
  * DISJOINT for every candidate key the operators derive —
  *
  *   - documents: every word prefixed with the replica tag (r0…r9), so
  *     shingle/anchor/minhash/simhash vocabularies are disjoint across
  *     replicas and intra-replica dup structure is exactly sf0.1's: true
  *     pair counts scale ×10, never ×100;
  *   - embeddings: a per-replica cyclic DIMENSION permutation — norms and
  *     all intra-replica dot products are preserved bit-for-bit, while
  *     cross-replica cosines decorrelate (no spurious near-dups);
  *   - events: ids/users offset per replica, timestamps preserved (group
  *     counts per (day, type) scale ×10 in rows, groups unchanged).
  *
  * Usage: runMain graft.tools.ScaleProbe <query> [query...]
  * Env: SPARK_GRAFT_SCALE_BASE (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_SCALE_DIR (default /tmp/graft_sf1),
  *      SPARK_GRAFT_SCALE_REPLICAS (default 10).
  */
object ScaleProbe {

  def replicate(spark: SparkSession, base: String, out: String, n: Int): Unit = {
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(s"$out/_READY"))) return
    fs.delete(new Path(out), true)
    val reps = spark.range(n).select(col("id").cast("int").as("r"))

    val docs = Tables.documents(spark, base)
    docs.crossJoin(reps)
      .select(
        (col("doc_id") * n + col("r")).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(lit("r"), col("r"), w)), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = Tables.embeddings(spark, base)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    emb.crossJoin(reps)
      .select(
        (col("vec_id") * n + col("r")).as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => element_at(col("embedding"),
            pmod(i + col("r") * lit(7), lit(dim)) + 1)).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    Tables.events(spark, base).crossJoin(reps)
      .select(
        (col("event_id") * n + col("r")).as("event_id"), col("ts"),
        (col("user_id") + col("r") * lit(10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val ok = fs.create(new Path(s"$out/_READY"), true); ok.close()
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe <queryName> [queryName...]")
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_sf1")
    val n = sys.env.get("SPARK_GRAFT_SCALE_REPLICAS").flatMap(_.toIntOption).getOrElse(10)
    val spark = GraftSession.create("scale-probe")
    replicate(spark, base, out, n)
    println(s"PROBE sf1 dir ready: ${Tables.documents(spark, out).count()} docs, " +
      s"${Tables.embeddings(spark, out).count()} vecs, " +
      s"${Tables.events(spark, out).count()} events")

    def timeOne(name: String, dir: String): Double = {
      graft.ops.Dedup.clearCaches()
      graft.engine.Bucketing.clearCaches()
      graft.ops.TextAnalysis.clearCaches()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both dirs once (first-read + codegen), then one timed run each
    args.headOption.foreach { h => timeOne(h, base); timeOne(h, out) }
    println(f"| op | sf0.1 s | sf1 s | ratio (${n}x rows) |")
    println("|---|---|---|---|")
    args.foreach { name =>
      val a = timeOne(name, base)
      val b = timeOne(name, out)
      println(f"| $name | $a%.2f | $b%.2f | ${b / a}%.1f |")
    }
    spark.stop()
  }
}
