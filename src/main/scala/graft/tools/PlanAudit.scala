package graft.tools
import graft.GraftSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("planaudit", 8)
    val dir = "/root/testdata/sf0.01"
    val names = Seq("c4_pack", "t7_pii_redact", "q36_histogram", "q37_grouping_sets",
      "d8_keeper_quality", "t8_unigram_surprisal", "c5_rebalance", "q39_sink_roundtrip",
      "q40_approx_aggs", "q42_except_all", "q43_gapfill", "q44_exists_sql",
      "t15_repetition", "d17_simhash64_pairs", "d16_srp_banded")
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      val ex = "ShuffleExchange".r.findAllIn(p).length // not Broadcast/ReusedExchange
      val bc = "BroadcastHashJoin|BroadcastNestedLoop".r.findAllIn(p).length
      val smj = "SortMergeJoin".r.findAllIn(p).length
      val wsc = "WholeStageCodegen".r.findAllIn(p).length
      println(s"AUDIT $n: exchanges=$ex broadcastJoins=$bc smj=$smj codegenSpans=$wsc")
    }
    spark.stop()
  }
}
