package graft

import graft.ops.Corpus

/** b3 KMV set operations — estimator properties on corpora with KNOWN
  * overlap (the sf gate only checks engine parity; these pin that the
  * arithmetic estimates the right quantity):
  *
  *   - below sketch capacity the "estimates" are exact counts (the union
  *     sketch holds every distinct hash);
  *   - above capacity the union/intersection estimates land near the
  *     true values (k = 32 → ~18% relative std for the union; the
  *     intersection inherits the sample-share variance on top);
  *   - the intersection sample count never exceeds the sketch size.
  */
class KmvSetOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ops(rows: Seq[(String, String)]) =
    Corpus.kmvSetOpsOf(rows.toDF("source", "text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))

  test("below sketch capacity, union and intersection are exact") {
    // |A|=10, |B|=5, overlap 3 → union 12 < k=32
    val a = (0 until 10).map(i => ("A", s"text $i"))
    val b = (7 until 12).map(i => ("B", s"text $i"))
    val Seq((s1, s2, nc, eu, ei, nx)) = ops(a ++ b).toSeq
    assert((s1, s2) == ("A", "B"))
    assert(nx == 3)
    assert(eu == 12.0, s"union below capacity must be exact, got $eu")
    assert(ei == 3.0, s"intersection below capacity must be exact, got $ei")
    assert(nc == 3)
  }

  test("above capacity, estimates land near the true cardinalities") {
    // |A|=600, |B|=600, overlap 200 → union 1000, well past k=32
    val a = (0 until 600).map(i => ("A", s"doc $i"))
    val b = (400 until 1000).map(i => ("B", s"doc $i"))
    val Seq((_, _, nc, eu, ei, nx)) = ops(a ++ b).toSeq
    assert(nx == 200)
    assert(nc <= Corpus.kmvK)
    assert(eu > 500 && eu < 2000, s"union estimate $eu far from 1000")
    assert(ei >= 0 && ei < 700, s"intersection estimate $ei far from 200")
  }

  test("disjoint sources estimate an empty intersection") {
    val a = (0 until 300).map(i => ("A", s"left $i"))
    val b = (0 until 300).map(i => ("B", s"right $i"))
    val Seq((_, _, nc, _, ei, nx)) = ops(a ++ b).toSeq
    // md5 collisions between disjoint text sets are impossible at this
    // scale, so no union minimum can be in both sketches
    assert(nc == 0 && ei == 0.0 && nx == 0)
  }
}
