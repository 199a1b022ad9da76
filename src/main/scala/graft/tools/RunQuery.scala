package graft.tools

import graft.GraftSession

/** Run one named SparkEntry query and show its result — dev loop for a
  * single operator without the full Verify sweep.
  * Usage: runMain graft.tools.RunQuery <queryName> [sfDir] [numRows]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    if (args.length > 1 && args(1) == "--oracle") {
      // print the DuckDB oracle SQL for out-of-band checking
      println(graft.SparkEntry.oracleSql(name))
      return
    }
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val n = if (args.length > 2) args(2).toInt else 20
    val spark = GraftSession.create("runquery", 8)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.show(n, truncate = 60)
    val t0 = System.nanoTime()
    println(s"rows=${df.count()}")
    println(f"count_sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
