package graft.tools
object CcTimeProbe extends App {
  val spark = graft.GraftSession.create("cctime", cores = 8)
  val dir = "/root/testdata/sf0.1"
  // warm
  graft.ops.Dedup.simhashPairs(spark, dir).count()
  for (i <- 1 to 3) {
    graft.ops.Dedup.clearCaches()
    val t0 = System.nanoTime()
    graft.ops.Dedup.dupClusters(spark, dir).count()
    println(f"d7 pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
  spark.stop()
}
