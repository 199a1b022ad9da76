package graft.tools

/** Run one SparkEntry query in a tight loop (for driver stack sampling —
  * guide §7.3: the interesting thread is the one whose deep stack repeats).
  * Usage: runMain graft.tools.LoopQuery <queryName> <iterations>
  */
object LoopQuery {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 20
    val spark = graft.GraftSession.create("loop-query")
    val fn = graft.SparkEntry.queries(args(0))
    for (i <- 1 to n) {
      graft.ops.Dedup.clearCaches()
      graft.engine.Bucketing.clearCaches()
      graft.ops.TextAnalysis.clearCaches()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"LOOP $i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
