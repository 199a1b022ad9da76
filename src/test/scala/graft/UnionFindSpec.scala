package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LabelState

/** The driver fast path of [[graft.ops.LabelState.deltaLabels]] must
  * produce the exact min-label component labeling the distributed loop
  * produces — property-checked against a brute-force fixpoint reference
  * (pure JVM; the Spark-side equivalence is pinned by the split-ingest
  * parity specs, which route through the fast path at test scale).
  */
class UnionFindSpec extends AnyFunSuite {

  /** Brute-force reference: flood min labels over the symmetric edge
    * relation until fixpoint.
    */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var labels = nodes.map(n => n -> n).toMap
    var changed = true
    while (changed) {
      changed = false
      for (n <- nodes) {
        val m = (adj.getOrElse(n, Seq.empty).map(labels) :+ labels(n)).min
        if (m < labels(n)) { labels += n -> m; changed = true }
      }
    }
    labels
  }

  private val edgeList: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(0L, 40L)))

  test("unionFindMinLabels == brute-force min-label fixpoint, any edge list") {
    val prop = Prop.forAll(edgeList) { edges =>
      LabelState.unionFindMinLabels(edges.toArray).toMap == reference(edges)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("deterministic shapes: chain, star, merged components, self-loop") {
    // a 5-chain labels everything 0, whatever the edge order
    assert(LabelState.unionFindMinLabels(
      Array((4L, 3L), (1L, 0L), (2L, 1L), (3L, 2L))).toMap ==
      (0L to 4L).map(_ -> 0L).toMap)
    // two components stay separate
    assert(LabelState.unionFindMinLabels(Array((1L, 5L), (7L, 9L))).toMap ==
      Map(1L -> 1L, 5L -> 1L, 7L -> 7L, 9L -> 7L))
    // a bridge edge merges them to the global min
    assert(LabelState.unionFindMinLabels(
      Array((1L, 5L), (7L, 9L), (5L, 9L))).toMap ==
      Map(1L -> 1L, 5L -> 1L, 7L -> 1L, 9L -> 1L))
    // self-loops are harmless
    assert(LabelState.unionFindMinLabels(Array((3L, 3L))).toMap == Map(3L -> 3L))
  }
}
