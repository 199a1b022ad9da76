package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.IncrementalExact
import graft.sources.Tables

/** Empirical check of the round-14 TOMBSTONE BOUND on the d28 read path
  * (not part of the engine surface): only generations STRICTLY OLDER than
  * the newest tombstone can be affected by it, so the delete-correction
  * term (gen tags + sidecar scan + affected-group joins) is bounded by
  * the corpus AT DELETE TIME — it must stay FLAT as post-delete ingest
  * generations accumulate, while the plain union term grows the same way
  * it would with no delete at all.
  *
  * A/B: for n ∈ {2, 8, 16} post-delete generations, time the served
  * aggregate over (A) a state with a tombstone after its first two
  * ingests and (B) the identical state with no tombstone. The reported
  * DELTA (A − B) isolates the correction term; the bound predicts it is
  * ~constant in n. Post-delete batches are id-offset replicas of the
  * corpus (disjoint doc_ids, shared content hashes — the realistic case
  * where later ingests keep touching the same hash groups).
  *
  * Usage: runMain graft.tools.DeleteReadProbe
  * Env: SPARK_GRAFT_SCALE_BASE (default /root/testdata/sf0.1).
  */
object DeleteReadProbe {

  private def timeServe(spark: SparkSession, state: String): Double = {
    val t0 = System.nanoTime()
    IncrementalExact.dedup(spark, state).count()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val spark = GraftSession.create("delete-read-probe")
    val docs = Tables.documents(spark, base)
    def batch(k: Int) = docs.select(
      (col("doc_id") + lit(1000000L) * (k + 1)).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars"))

    def build(withDelete: Boolean, n: Int): String = {
      val state = graft.util.TmpDirs.scratch(
        s"graft_delread_${if (withDelete) "del" else "plain"}_${n}_").toString
      IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
      IncrementalExact.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
      if (withDelete)
        IncrementalExact.delete(spark, state,
          docs.where(pmod(col("doc_id"), lit(7)) === 3).select(col("doc_id")))
      (0 until n).foreach(k => IncrementalExact.merge(spark, state, batch(k)))
      state
    }

    // warm once (codegen + first reads), then one timed serve per cell
    timeServe(spark, build(withDelete = true, 2))
    println("| post-delete gens | serve w/ delete s | serve plain s | delta s |")
    println("|---|---|---|---|")
    for (n <- Seq(2, 8, 16)) {
      val a = timeServe(spark, build(withDelete = true, n))
      val b = timeServe(spark, build(withDelete = false, n))
      println(f"| $n | $a%.2f | $b%.2f | ${a - b}%.2f |")
    }
    spark.stop()
  }
}
