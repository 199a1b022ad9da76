package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.sources.Tables

/** d22 SemDeDup invariants (threshold/geometry parity with the DuckDB
  * replay is the Verify gate's job; these pin the operator's structural
  * contract on the real sf0.001 corpus):
  *
  *   1. pairs are CELL-SCOPED — a connected component never spans two
  *      k-means cells, so each cluster maps to exactly one cell;
  *   2. exactly one keeper per cluster;
  *   3. the keeper is the least-prototypical member — min 6-dp-rounded
  *      centroid cosine, ties to the smaller vec_id (the SemDeDup rule),
  *      recomputed here independently from the trained centroids;
  *   4. within a cell, candidate recall is EXACT: every member pair of a
  *      cluster that sits above the threshold appears regardless of any
  *      bucket geometry (no LSH boundary loss) — checked by brute-force
  *      cosine over each cluster's members.
  */
class SemDedupSpec extends SparkSpec {

  private lazy val out = Similarity.semDedupClusters(spark, sf0001).collect()

  test("clusters are non-empty and cell-scoped with one keeper each") {
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getLong(2))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.map(_.getLong(1)).distinct.length == 1,
        s"cluster $cid spans multiple cells")
      assert(rows.count(_.getInt(3) == 1) == 1,
        s"cluster $cid keeper count != 1")
      assert(rows.length >= 2, s"cluster $cid is a singleton")
    }
  }

  test("keeper = min rounded centroid-cosine, ties to smaller vec_id") {
    val cents = Similarity.trainIvfCentroids(spark, sf0001)
    val byId = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def ccos(id: Long): Double = {
      val e = byId(id)
      val nrm = math.sqrt(e.foldLeft(0.0)((a, x) => a + x * x))
      val best = cents.map { case (_, ce, cn) =>
        val d = (e, ce).zipped.foldLeft(0.0) { case (a, (x, y)) => a + x * y }
        d / (nrm * cn)
      }.max
      BigDecimal(best).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.groupBy(_.getLong(2)).foreach { case (cid, rows) =>
      val expected = rows.map(r => (ccos(r.getLong(0)), r.getLong(0))).min._2
      val keeper = rows.find(_.getInt(3) == 1).get.getLong(0)
      assert(keeper == expected, s"cluster $cid keeper $keeper != $expected")
    }
  }

  test("within-cell recall is exact: no above-threshold member pair is missed") {
    val byId = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (byId(a), byId(b))
      val d = (x, y).zipped.foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
      val nx = math.sqrt(x.foldLeft(0.0)((s, v) => s + v * v))
      val ny = math.sqrt(y.foldLeft(0.0)((s, v) => s + v * v))
      d / (nx * ny)
    }
    // every above-threshold pair WITHIN a cell must land in one cluster:
    // group the output rows by cell, brute-force their pairwise cosines
    val byCell = out.groupBy(_.getLong(1))
    byCell.foreach { case (cell, rows) =>
      val ids = rows.map(_.getLong(0))
      val cluster = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
      for (i <- ids; j <- ids if i < j
           if cos(i, j) >= Similarity.semDedupThreshold + 1e-9) {
        assert(cluster(i) == cluster(j),
          s"cell $cell pair ($i,$j) above threshold but split across clusters")
      }
    }
  }
}
