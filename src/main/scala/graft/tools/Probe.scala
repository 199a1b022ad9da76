package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.Dedup

/** Ad-hoc plan/size probe (not part of the engine surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("probe", 16)
    val dir = "/root/testdata/sf0.1"
    val sigs = Dedup.minhashSignatures(spark, dir)
    var t0 = System.nanoTime()
    println("sigs count: " + sigs.count() + " in " + (System.nanoTime()-t0)/1e9)
    val bands = sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(3)), b =>
        struct(b.as("band"),
          md5(concat((0 until 3).map(r =>
            element_at(col("sig"), b * 3 + r + 1)): _*)).as("bh")))).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bh"))
    t0 = System.nanoTime()
    val nBands = bands.count()
    println("band rows: " + nBands + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    println("raw cand: " + cand.count() + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    println("dedup cand: " + cand.dropDuplicates("d1","d2").count() + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    println("full d3: " + Dedup.minhashLshPairs(spark, dir).count() + " in " + (System.nanoTime()-t0)/1e9)
    spark.stop()
  }
}
