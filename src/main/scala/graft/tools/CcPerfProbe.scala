package graft.tools

object CcPerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.create("cc-perf")
    sys.env.get("PROBE_SHUFFLE").foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    time("warm_sigs")(graft.ops.Dedup.simhashSignatures(spark, dir).count())
    time("d5_pairs")(graft.ops.Dedup.simhashPairs(spark, dir).count())
    time("d5_again")(graft.ops.Dedup.simhashPairs(spark, dir).count())
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.simhashPairs(spark, dir)
      .select(org.apache.spark.sql.functions.col("d1"), org.apache.spark.sql.functions.col("d2"))
    graft.ops.ConnectedComponents.labelPropagation(pairs, 50) match {
      case Some((labels, rounds)) =>
        println(f"PROBE lp ${(System.nanoTime()-t0)/1e9}%.2f s rounds=$rounds rows=${labels.count()}")
      case None =>
        println(f"PROBE lp ${(System.nanoTime()-t0)/1e9}%.2f s DID NOT CONVERGE in 50 rounds")
    }
    time("d7")(graft.ops.Dedup.dupClusters(spark, dir).count())
    time("d8")(graft.ops.Dedup.keeperByQuality(spark, dir).count())
    spark.stop()
  }
}
