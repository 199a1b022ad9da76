package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Times the q32 funnel join with per-micro-batch breakdowns — the probe
  * behind SCALE.md's streaming-floor numbers. Runs the ENGINE's join body
  * ([[graft.streaming.EventsStream.funnelJoin]]) and partition knob, so
  * the measurement cannot drift from what the gate query executes.
  * PROBE_ROCKSDB=1 swaps in the RocksDB state store for comparison.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.create("stream-probe")
    graft.sources.Tables.events(spark, dir).count()
    val es = graft.streaming.EventsStream
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", es.streamShufflePartitions)
    if (sys.env.contains("PROBE_ROCKSDB"))
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val t0 = System.nanoTime()
    val q = es.funnelJoin(ss, dir, joinType = "inner", delay = es.dedupHorizon)
      .select(col("user_id"), col("click_id"), col("purchase_id"))
      .writeStream.format("memory").queryName("probe_q32")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    println(f"PROBE q32 total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    q.recentProgress.foreach { p =>
      println(s"BATCH ${p.batchId} rows=${p.numInputRows} durMs=${p.batchDuration} " +
        s"trigger=${p.durationMs}")
    }
    spark.stop()
  }
}
