package graft

import org.apache.spark.sql.functions._

import graft.exprs.MisraGries
import graft.ops.TextAnalysis

/** b4: the Misra-Gries summary's guarantee (every item above
  * total/(capacity+1) is a candidate), its partitioning-invariance as a
  * mergeable aggregate, the exact-or-refuse contract of the recount, and
  * the serializer's robustness to hostile token bytes.
  */
class MisraGriesSpec extends SparkSpec {

  private def mg(colName: String, capacity: Int) =
    expr(s"misra_gries($colName, $capacity)")

  test("guarantee: every token above total/(capacity+1) survives, any split") {
    import spark.implicits._
    // zipf-ish: token t_i appears 2^(12-i) times — head items dwarf the bound
    val rows = (0 until 12).flatMap(i => Seq.fill(1 << (12 - i))(s"t$i")) ++
      (0 until 3000).map(i => s"rare$i")
    val total = rows.size
    val capacity = 64
    val bound = total / (capacity + 1)
    val heavy = rows.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > bound).keySet
    assert(heavy.nonEmpty)
    Seq(1, 7, 32).foreach { parts =>
      val cands = rows.toDF("token").repartition(parts)
        .agg(mg("token", capacity)).collect()(0).getSeq[String](0).toSet
      assert(heavy.subsetOf(cands),
        s"parts=$parts: missing heavy tokens ${heavy -- cands}")
      assert(cands.size <= capacity)
    }
  }

  test("b4 == t5 on the corpus; partitioning does not change the served top-20") {
    val want = TextAnalysis.tokenFreq(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val got = TextAnalysis.heavyHitters(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got == want, "sketch+recount diverged from the exact groupBy")
  }

  test("exact-or-refuse: a flat distribution raises instead of serving a maybe-wrong top-k") {
    import spark.implicits._
    // 500 distinct tokens, once each: with capacity 8 nothing can clear
    // total/(capacity+1), so serving any 'top' 5 would be arbitrary
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // 500 singletons, capacity 8: nothing survives the shared decrements,
    // so the candidate floor refuses up front
    val flat = (0 until 500).map(i => f"u$i%03d").toDF("text")
      .select(col("text").as("token"))
    val exFloor = intercept[Exception](
      TextAnalysis.heavyHittersOf(flat, topN = 5, capacity = 8).collect())
    assert(msgs(exFloor).exists(_.contains("candidates survived the sketch")),
      s"expected the candidate-floor refusal, got: $exFloor")
    // 200 tokens x5 each, capacity 30: survivors exist but none can PROVE
    // top-5 membership (true counts sit below total/(capacity+1)) — one
    // of the two refusals must fire, never a silently-arbitrary top-5
    val even = (0 until 200).flatMap(i => Seq.fill(5)(f"v$i%03d")).toDF("token")
    val exBound = intercept[Exception](
      TextAnalysis.heavyHittersOf(even, topN = 5, capacity = 30).collect())
    assert(msgs(exBound).exists(m => m.contains("does not clear the MG bound") ||
      m.contains("candidates survived the sketch")),
      s"expected a refusal, got: $exBound")
  }

  test("serializer: tokens with tabs/newlines/unicode survive the shuffle exchange") {
    import spark.implicits._
    val nasty = Seq("a\tb", "c\nd", "ef", "日本語", "")
    val rows = nasty.flatMap(t => Seq.fill(50)(t)) ++ (0 until 10).map(_.toString)
    val cands = rows.toDF("token").repartition(9)
      .agg(mg("token", 16)).collect()(0).getSeq[String](0).toSet
    nasty.foreach(t => assert(cands.contains(t), s"lost token ${t.getBytes.toSeq}"))
  }

  test("merge reduction: over-capacity union subtracts the (capacity+1)-th largest") {
    val a = new java.util.HashMap[String, Long]()
    a.put("x", 10L); a.put("y", 4L)
    val b = new java.util.HashMap[String, Long]()
    b.put("z", 6L); b.put("y", 1L)
    val agg = MisraGries(
      org.apache.spark.sql.catalyst.expressions.Literal("t"), 2)
    val merged = agg.merge(a, b) // x=10 y=5 z=6, 3rd largest = 5
    assert(merged.size() <= 2)
    assert(merged.get("x") == 5L && merged.get("z") == 1L && !merged.containsKey("y"))
  }

  test("b4 plan shape: sketch aggregates map-side; recount joins broadcast, top-N is TakeOrdered") {
    import spark.implicits._
    val toks = (0 until 50).flatMap(i => Seq.fill(i + 1)(s"t$i")).toDF("token")
    // the sketch phase: partial ObjectHashAggregate per partition, final
    // merge — the map-side combine IS the scale claim (each mapper ships
    // <= capacity entries, never its distinct-token set)
    val sketchPlan = toks.agg(mg("token", 64))
      .queryExecution.executedPlan.toString
    assert(sketchPlan.contains("ObjectHashAggregate"), s"no object agg in:\n$sketchPlan")
    assert("ObjectHashAggregate".r.findAllIn(sketchPlan).size >= 2,
      s"sketch must aggregate in partial+final phases (map-side combine):\n$sketchPlan")
    // the recount phase: candidate set joins BROADCAST (model-sized),
    // top-N runs as TakeOrderedAndProject (no full sort)
    val served = TextAnalysis.heavyHittersOf(toks, topN = 5, capacity = 64)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast candidate join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"recount must not sort-merge:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject in:\n$plan")
    assert(served.collect().length == 5)
  }

  test("misra_gries is registered for SQL with analysis-time arg checks") {
    import spark.implicits._
    Seq("a", "a", "b").toDF("t").createOrReplaceTempView("mg_in")
    val out = spark.sql("SELECT misra_gries(t, 4) AS c FROM mg_in")
      .collect()(0).getSeq[String](0)
    assert(out.contains("a"))
    intercept[Exception](spark.sql("SELECT misra_gries(t) FROM mg_in").collect())
  }
}
