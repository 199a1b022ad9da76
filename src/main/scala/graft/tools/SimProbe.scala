package graft.tools

object SimProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.create("sim-probe")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    time("warm")(graft.sources.Tables.embeddings(spark, dir).count())
    time("s1_cosine")(graft.ops.Similarity.cosineTopK(spark, dir).count())
    time("s4_quantized")(graft.ops.Similarity.quantizedCosineTopK(spark, dir).count())
    time("s4_again")(graft.ops.Similarity.quantizedCosineTopK(spark, dir).count())
    time("s3_ivf")(graft.ops.Similarity.annIvf(spark, dir).count())
    time("s3_again")(graft.ops.Similarity.annIvf(spark, dir).count())
    println("=== s4 explain ===")
    graft.ops.Similarity.quantizedCosineTopK(spark, dir).explain("formatted")
    spark.stop()
  }
}
