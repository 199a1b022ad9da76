package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.IncrementalDedup
import graft.sources.Tables

/** Phase attribution for the two superlinear-looking delete paths in
  * SCALE.md's round-13 table — d29 (cluster delete, 5.7× per 10× rows)
  * and q78 (streamed cluster deletes, 4.0×). Both ENTRIES bundle their
  * ingest with the delete: d29 is two split merges + tombstone + serve,
  * q78 is a 4-micro-batch ingest stream + 2 delete batches + serve. The
  * round-19 VERDICT asks which term actually grows: the re-label scope
  * (real, bounded by affected-component size) or the ingest the entry
  * rides behind (already accounted by d12's own row in the table).
  *
  * This probe times each phase separately at the base corpus (sf0.1) and
  * the [[ScaleProbe.replicate]]d 10× corpus, printing per-phase decade
  * ratios. The tombstone write itself is a fixed-size generation append;
  * the re-label happens at SERVE ([[IncrementalDedup.clusters]] →
  * deletedAwareLabels), so "serve after delete" is the re-label cost and
  * "serve before delete" is the baseline fold — their DELTA is the
  * delete's true marginal term.
  *
  * Usage: runMain graft.tools.DeleteScaleProbe [d29|q78|all]
  * Env: SPARK_GRAFT_SCALE_BASE (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_SCALE_DIR (default /tmp/graft_sf1).
  */
object DeleteScaleProbe {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def victims(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).where(pmod(col("doc_id"), lit(7)) === 3)
      .select(col("doc_id"))

  /** d29 phases: split ingest (two merges) / tombstone / serve-before /
    * serve-after (the re-label).
    */
  private def d29Phases(spark: SparkSession, dir: String): Seq[(String, Double)] = {
    val docs = Tables.documents(spark, dir)
    val state = graft.util.TmpDirs.scratch("graft_d29p_state_").toString
    val (_, tIngest) = time {
      IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))
      IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(5)) === 0))
    }
    val (_, tServe0) = time { IncrementalDedup.clusters(spark, state).count() }
    val (_, tTomb) = time { IncrementalDedup.delete(spark, state, victims(spark, dir)) }
    val (_, tServe1) = time { IncrementalDedup.clusters(spark, state).count() }
    // the re-label is paid per SERVE until compact folds the tombstones
    // into purged base tables — measure that the fold restores flat serve
    val (_, tCompact) = time { IncrementalDedup.compact(spark, state) }
    val (_, tServe2) = time { IncrementalDedup.clusters(spark, state).count() }
    Seq("ingest" -> tIngest, "serve-before" -> tServe0,
      "tombstone" -> tTomb, "serve-after" -> tServe1,
      "relabel-delta" -> math.max(0.0, tServe1 - tServe0),
      "compact" -> tCompact, "serve-compacted" -> tServe2)
  }

  /** q78 phases: the streaming chassis split at its seams — ingest drain
    * (4 micro-batch merges), delete drain (2 tombstone batches), serve.
    */
  private def q78Phases(spark: SparkSession, dir: String): Seq[(String, Double)] = {
    val state = graft.util.TmpDirs.scratch("graft_q78p_state_").toString
    val (_, tIngest) = time {
      graft.streaming.DocumentsStream.drainMerges(spark, dir, 4, "q78pi")(
        (b, _) => IncrementalDedup.merge(b.sparkSession, state, b))
    }
    val (_, tServe0) = time { IncrementalDedup.clusters(spark, state).count() }
    val (_, tDel) = time {
      graft.streaming.DocumentsStream.drainMerges(spark, dir, 2, "q78pd",
        table = (ss, d) => victims(ss, d))(
        (b, _) => IncrementalDedup.delete(b.sparkSession, state, b))
    }
    val (_, tServe1) = time { IncrementalDedup.clusters(spark, state).count() }
    Seq("ingest-drain" -> tIngest, "serve-before" -> tServe0,
      "delete-drain" -> tDel, "serve-after" -> tServe1,
      "relabel-delta" -> math.max(0.0, tServe1 - tServe0))
  }

  private def table(tag: String, base: Seq[(String, Double)],
      big: Seq[(String, Double)]): Unit = {
    println(s"\n### $tag phase attribution (sf0.1 vs 10x)\n")
    println("| phase | sf0.1 s | sf1 s | ratio |")
    println("|---|---|---|---|")
    base.zip(big).foreach { case ((k, a), (_, b)) =>
      println(f"| $k | $a%.2f | $b%.2f | ${b / math.max(1e-9, a)}%.1f |")
    }
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_sf1")
    val spark = GraftSession.create("delete-scale-probe")
    ScaleProbe.replicate(spark, base, out, 10)
    println(s"corpus: base=${Tables.documents(spark, base).count()} docs, " +
      s"10x=${Tables.documents(spark, out).count()} docs")
    if (which == "all" || which == "d29")
      table("d29 cluster delete", d29Phases(spark, base), d29Phases(spark, out))
    if (which == "all" || which == "q78")
      table("q78 streamed cluster deletes", q78Phases(spark, base), q78Phases(spark, out))
    spark.stop()
  }
}
