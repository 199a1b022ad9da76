package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.create("stream-probe")
    graft.sources.Tables.events(spark, dir).count()
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions",
      sys.env.get("SPARK_GRAFT_STREAM_PARTITIONS").map(_.toInt).getOrElse(8))
    if (sys.env.contains("PROBE_ROCKSDB"))
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val es = graft.streaming.EventsStream
    val ev = es.readEventsStream(ss, dir)
    val clicks = ev
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", es.dedupHorizon)
    val purchases = ev
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", es.dedupHorizon)
    val t0 = System.nanoTime()
    val q = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") > col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL ${es.funnelWindow}"))
      .select(col("user_id"), col("click_id"), col("purchase_id"))
      .writeStream.format("memory").queryName("probe_q32")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    println(f"PROBE q32 total ${(System.nanoTime()-t0)/1e9}%.2f s")
    q.recentProgress.foreach { p =>
      println(s"BATCH ${p.batchId} rows=${p.numInputRows} durMs=${p.batchDuration} " +
        s"trigger=${p.durationMs}")
    }
    spark.stop()
  }
}
