package graft

import org.apache.spark.sql.functions._

import graft.ops.{ConnectedComponents, Dedup}

/** The two connected-components algorithms agree with each other and with
  * ground truth — including the adversarial deep-chain shape that defeats
  * diameter-bounded propagation, which is exactly what the star-contraction
  * fallback exists for.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction: deep chain converges in O(log n) rounds, not O(n)") {
    // a 300-node path: diameter 299. Propagation with pointer jumping needs
    // ~log2(299) ≈ 9 rounds; plain flooding would need 299. Star contraction
    // must land in the same logarithmic ballpark on this worst case.
    val n = 300L
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = ConnectedComponents.starContraction(chain)
    assert(rounds <= 12, s"star contraction took $rounds rounds on a ${n}-node chain")
    val m = labelsOf(labels)
    assert(m.size == n)
    assert(m.values.forall(_ == 0L), "every chain node must label to the min (0)")
  }

  test("star contraction == label propagation on a mixed-shape graph") {
    // several components of different shapes: a chain, a star, a clique,
    // a triangle-with-tail, and two singleton edges
    val edges = (
      (100L to 119L).sliding(2).map(s => (s(0), s(1))).toSeq ++      // chain
        (1L to 8L).map(i => (0L, i)) ++                               // star
        (for { a <- 200L to 204L; b <- 200L to 204L if a < b } yield (a, b)) ++ // clique
        Seq((300L, 301L), (301L, 302L), (302L, 300L), (302L, 303L), (303L, 304L)) ++
        Seq((400L, 401L), (500L, 501L))
      ).toDF("src", "dst")
    val (star, _) = ConnectedComponents.starContraction(edges)
    val Some((prop, _)) = ConnectedComponents.labelPropagation(edges, 50)
    assert(labelsOf(star) == labelsOf(prop))
    // spot-check ground truth
    val m = labelsOf(star)
    assert((100L to 119L).forall(m(_) == 100L))
    assert((0L to 8L).forall(m(_) == 0L))
    assert((300L to 304L).forall(m(_) == 300L))
  }

  test("star contraction handles duplicate, reversed, and self-loop-free input") {
    val edges = Seq((2L, 1L), (1L, 2L), (2L, 3L), (2L, 3L), (7L, 6L))
      .toDF("src", "dst")
    val (labels, _) = ConnectedComponents.starContraction(edges)
    assert(labelsOf(labels) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 6L -> 6L, 7L -> 6L))
  }

  test("dupClusters falls back to star contraction and matches the fast path") {
    // maxIters = 0 starves label propagation, forcing the fallback; the
    // output must be identical to the default path's (same d7 contract)
    val viaStar = Dedup.dupClusters(spark, sf0001, maxIters = 0).collect().toSeq
    val viaProp = Dedup.dupClusters(spark, sf0001).collect().toSeq
    assert(viaStar == viaProp)
    assert(viaStar.nonEmpty)
  }
}
