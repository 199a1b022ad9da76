package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.IncrementalSubstring

/** Ad-hoc cost breakdown for the d20/q58 incremental-substring path (not
  * part of the engine surface): times each of 8 micro-batch merges and the
  * final spans read separately, and prints anchor-index row counts, to see
  * whether per-trigger probe scans or the read-side occurrence aggregate
  * dominate at the current SF.
  */
object SubstringCostProbe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("substring-cost-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.sources.Tables.documents(spark, dir)
    println(s"PROBE documents rows: ${docs.count()}")
    val state = graft.util.TmpDirs.scratch("graft_subcost_").toString
    for (r <- 0 until 8) {
      time(s"merge $r") {
        IncrementalSubstring.merge(spark, state,
          docs.where(pmod(col("doc_id"), lit(8)) === r), Some(s"b$r"))
      }
    }
    val anch = spark.read.parquet((0 until 8).map(v => graft.ops.GenState.tablePath(spark, state, v, "anchors")): _*)
    println(s"PROBE anchor rows total: ${anch.count()}")
    val hits = spark.read.parquet((0 until 8).map(v => graft.ops.GenState.tablePath(spark, state, v, "hits")): _*)
    println(s"PROBE hit rows total: ${hits.count()}")
    time("spans read")(IncrementalSubstring.spans(spark, state).count())
    time("spans read (2nd)")(IncrementalSubstring.spans(spark, state).count())
    spark.stop()
  }
}
