package graft.tools

import graft.GraftSession

/** Dump formatted physical plans for plan-audit (PushedFilters, broadcast
  * choice, codegen spans). Not part of the engine surface.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("explain", 8)
    val dir = "/root/testdata/sf0.01"
    val targets = if (args.nonEmpty) args.toSeq
    else Seq("q1_pricing_summary", "q5_local_supplier", "s1_cosine_topk",
      "d2_ngram_jaccard", "t5_token_freq", "m1_media_features",
      "d5_simhash_pairs", "s3_ann_ivf", "q29_salted_join",
      "q31_topk_per_key", "c1_chunking", "c2_hash_sample")
    targets.foreach { name =>
      println(s"\n===== $name =====")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
