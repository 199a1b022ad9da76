package graft

import org.apache.spark.sql.functions._

/** t24: the sketched card read. The HLL estimate has no cross-engine
  * oracle (DataSketches is Spark-side), so its contract is pinned here
  * instead: accuracy against the exact fold, split invariance of the
  * sketch union, and survival of compaction.
  */
class CardSketchSpec extends SparkSpec {

  private def approx(state: String) =
    graft.ops.IncrementalCard.serveApprox(spark, state).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5))).toSeq

  test("estimates track the exact fold; unions are split-invariant; compaction preserves") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val exact = graft.ops.TextAnalysis.datasetCard(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getLong(5)))).toMap

    val s2 = graft.util.TmpDirs.scratch("graft_t24_s2_").toString
    (0 until 2).foreach(r => graft.ops.IncrementalCard.merge(spark, s2,
      docs.where(pmod(col("doc_id"), lit(2)) === r), Some(s"a$r")))
    val s5 = graft.util.TmpDirs.scratch("graft_t24_s5_").toString
    (0 until 5).foreach(r => graft.ops.IncrementalCard.merge(spark, s5,
      docs.where(pmod(col("doc_id"), lit(5)) === r), Some(s"b$r")))

    val a2 = approx(s2)
    // sketch union is associative: 2-way and 5-way splits estimate alike
    assert(a2 == approx(s5))
    a2.foreach { case (src, _, nLangsEst, nDistEst) =>
      val (nl, nd) = exact(src)
      assert(nLangsEst == nl, s"$src langs: est $nLangsEst vs exact $nl")
      assert(math.abs(nDistEst - nd).toDouble / nd < 0.05,
        s"$src distinct: est $nDistEst vs exact $nd")
    }
    // compaction folds sketches without changing the estimates
    graft.ops.IncrementalCard.compact(spark, s2)
    assert(approx(s2) == a2)
  }
}
