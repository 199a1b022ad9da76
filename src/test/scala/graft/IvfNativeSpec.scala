package graft

import graft.ops.Similarity

/** s6: the native `ivf_probe` assignment must be a pure plan-shape change —
  * bit-identical results to the literal-centroid construction at equal
  * centroids — while keeping generated-code size O(1) in the cell count
  * (the literal `array_max(array(struct...))` tree grows O(cells·dim) and
  * hits Janino limits long before production cell counts).
  */
class IvfNativeSpec extends SparkSpec {

  test("render/parse round-trips centroids exactly") {
    val cents = Similarity.firstKCentroids(spark, sf0001)
    val parsed = graft.exprs.IvfProbe.parse(graft.exprs.IvfProbe.render(cents))
    assert(parsed.length == cents.length)
    parsed.zip(cents).foreach { case (p, (cid, ce, cn)) =>
      assert(p.cid == cid)
      assert(p.cn == cn) // exact double round-trip, not approximate
      assert(p.ce.toSeq == ce.toSeq)
    }
  }

  test("native ivf_probe == literal-centroid path bit-for-bit at k=16") {
    val cents = Similarity.firstKCentroids(spark, sf0001)
    val lit = Similarity.annIvf(spark, sf0001).collect().toSeq
    val nat = Similarity.ivfTopKNative(spark, sf0001, cents, 10, 3).collect().toSeq
    assert(nat == lit)
  }

  test("generated code size is O(1) in the cell count (16 vs 64 cells)") {
    import org.apache.spark.sql.execution.debug._
    def gen(cells: Int): String = {
      val cents = Similarity.firstKCentroids(spark, sf0001, cells)
      val df = Similarity.ivfTopKNative(spark, sf0001, cents, 10, 3)
      df.collect() // materialize so AQE's final plan (and its codegen) exists
      df.queryExecution.debug.codegenToSeq().map(_._2).mkString("\n")
    }
    val g16 = gen(16).length
    val g64 = gen(64).length
    assert(g16 > 0, "no whole-stage codegen found in the native IVF plan")
    // the centroid matrix rides as a reference object, so the generated
    // source must not grow with k (small jitter from comment/id noise ok)
    assert(math.abs(g64 - g16) < g16 / 10,
      s"generated code grew with cell count: k=16 → $g16 chars, k=64 → $g64 chars")
  }

  test("native assignment composes with Lloyd's-trained centroids (s5 parity)") {
    val cents = Similarity.trainIvfCentroids(spark, sf0001)
    val lit = Similarity.annIvfTrained(spark, sf0001).collect().toSeq
    val nat = Similarity.ivfTopKNative(spark, sf0001, cents, 10, 3).collect().toSeq
    assert(nat == lit)
  }

  test("persisted model (s7): parquet round-trip is bit-exact and reload skips training") {
    val modelDir = graft.util.TmpDirs.scratch("graft_s7_spec_").toString
    val trained = Similarity.trainIvfCentroids(spark, sf0001)
    val first = Similarity.persistedIvfCentroids(spark, sf0001, modelDir)
    val reload = Similarity.persistedIvfCentroids(spark, sf0001, modelDir)
    def flat(cs: Seq[Similarity.Centroid]) = cs.map { case (cid, ce, cn) => (cid, ce.toSeq, cn) }
    assert(flat(first) == flat(trained), "persisted model differs from fresh training")
    assert(flat(reload) == flat(trained), "reloaded model differs from fresh training")
  }

  test("wide surface (64 cells) returns ranked top-k for every query") {
    val rows = Similarity.annIvfWide(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).toSeq == (1 to rs.length))
    }
  }
}
