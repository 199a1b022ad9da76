package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.TopK

/** Head-to-head: WindowExec (shuffle + per-partition sort of every row)
  * vs the custom bounded-heap TopKPerKey on the same per-key top-k task.
  * Synthetic input so the scan is negligible and the operator dominates.
  * Run: runMain graft.tools.TopKBench [nRows] [nKeys] [k]
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val keys = if (args.length > 1) args(1).toLong else 100000L
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = GraftSession.create("topk-bench", 8)
    // withRewrite=false plan: keep rn in output so RewriteWindowTopK
    // cannot fire and WindowExec stays.
    val df = spark.range(n).select(
      (col("id") % keys).as("key"), (col("id") * 2654435761L % 1000000).as("v"), col("id"))
      .persist()
    df.count() // materialize input outside the timed region

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TOPK $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r rows)")
    }

    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id"))
    // The rewrite rule would silently turn the "window" branch into the
    // heap operator (ColumnPruning drops rn, making the pattern match), so
    // exclude it there — and ASSERT each branch runs the operator it
    // claims to measure.
    val excludeKey = graft.plans.RewriteWindowTopK.enabledKey
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    for (_ <- 1 to 2) {
      time("window rank") {
        spark.conf.set(excludeKey, "false")
        try {
          val q = df.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
          assert(planOf(q).contains("Window"), "window branch lost its WindowExec")
          q.count()
        } finally spark.conf.unset(excludeKey)
      }
      time("topk heap") {
        val q = TopK.perKey(df, Seq("key"), Seq("v" -> false, "id" -> true), k)
        assert(planOf(q).contains("TopKPerKey"), "heap branch is not running TopKPerKey")
        q.count()
      }
      time("topk heap ranked") {
        // keep-rank idiom → rank-emitting rewrite (select forces the
        // Project(Filter(Window)) shape with rn surviving)
        val q = df.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
          .select(col("key"), col("rn"), col("id"))
        assert(planOf(q).contains("TopKPerKey"), "ranked branch is not running TopKPerKey")
        q.count()
      }
    }
    spark.stop()
  }
}
