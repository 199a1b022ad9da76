package graft.tools

import scala.util.control.NonFatal

import graft.GraftSession

/** Time a SUBSET of SparkEntry queries with Bench's protocol (warm-up,
  * interleaved passes, per-query min headline) — the dev loop for one
  * optimization without the full 168-query sweep.
  * Usage: runMain graft.tools.TimeQueries <name> [name...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_PASSES (3).
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQueries <queryName> [queryName...]")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES").flatMap(_.toIntOption)
      .filter(_ > 0).getOrElse(3)
    val spark = GraftSession.create("time-queries")
    def warm(f: => Long): Unit = try { f; () } catch { case NonFatal(_) => () }
    warm(graft.sources.Tables.documents(spark, dir).count())
    warm(graft.sources.Tables.events(spark, dir).count())
    val samples = args.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    for (p <- 1 to passes; name <- args) {
      if (name == args.head) {
        graft.ops.Dedup.clearCaches()
        graft.engine.Bucketing.clearCaches()
        graft.ops.TextAnalysis.clearCaches()
      }
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      samples(name) += sec
      println(f"PASS $p $name: $sec%.2f s")
    }
    args.foreach(n => println(f"MIN $n: ${samples(n).min}%.2f s"))
    spark.stop()
  }
}
