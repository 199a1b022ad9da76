package graft.tools

import graft.GraftSession
import graft.ops.GenState
import graft.SparkEntry

/** Price of [[GenState.PointerPublish]] vs [[GenState.RenamePublish]] on
  * the heaviest streaming/incremental entries — the number an
  * object-store deployment needs to choose a mode with (round-19 VERDICT:
  * PointerPublishFamiliesSpec proves parity, nothing measures cost).
  *
  * Pointer mode's marginal work per generation commit is metadata-only:
  * one conditional `_COMMIT` put + read-back + post-flip audit (a claim
  * read + an exists) replaces the stage-dir rename, and every subsequent
  * table-path resolution pays one pointer probe (exists + small read).
  * Micro-batch streaming is the WORST CASE per byte — hundreds of tiny
  * generations, so the per-commit constant is maximally exposed; a batch
  * deployment amortizes it over real data.
  *
  * Both arms run on the same local store (the mode seam only — backend
  * swaps are priced by the store, not by us), interleaved A/B/A/B per
  * query so box drift lands on both arms.
  *
  * Usage: runMain graft.tools.PublishModeProbe [passes] [query...]
  *   (defaults: 2 passes; q54/q58/q77)
  */
object PublishModeProbe {

  private val defaultQueries = Seq(
    "q54_stream_incremental_dedup",
    "q58_stream_substring_dedup",
    "q77_stream_exact_delete")

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val passes = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    val queries = {
      val qs = args.drop(if (args.headOption.exists(_.toIntOption.isDefined)) 1 else 0)
      if (qs.nonEmpty) qs.toSeq else defaultQueries
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val spark = GraftSession.create("publish-mode-probe")

    def run(q: String, mode: GenState.PublishMode): Double = {
      val before = GenState.publishMode
      GenState.publishMode = mode
      try time { SparkEntry.queries(q)(spark, dir).count(); () }
      finally GenState.publishMode = before
    }

    println("| query | rename s (min) | pointer s (min) | pointer/rename |")
    println("|---|---|---|---|")
    queries.foreach { q =>
      // warm once per query (codegen + parquet footer caches), unmeasured
      run(q, GenState.RenamePublish)
      val (rs, ps) = (Array.fill(passes)(0.0), Array.fill(passes)(0.0))
      for (p <- 0 until passes) {
        rs(p) = run(q, GenState.RenamePublish)
        ps(p) = run(q, GenState.PointerPublish)
      }
      val (r, pt) = (rs.min, ps.min)
      println(f"| $q | $r%.2f | $pt%.2f | ${pt / r}%.2f |")
    }
    spark.stop()
  }
}
