package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.ops.IncrementalDedup
import graft.sources.Tables
import graft.util.TmpDirs

/** q54: STREAMING incremental dedup — the d12 merge driven by Structured
  * Streaming's foreachBatch (the q41 sink pattern): documents arrive as a
  * file stream (one parquet file per micro-batch under AvailableNow), and
  * every micro-batch is merged into the SAME persistent dedup state —
  * sign the batch, probe the accumulated band index, seeded CC, commit a
  * generation. After the drain, the state's clustering must equal d7's
  * one-shot batch recompute over the whole corpus (the shared oracle) —
  * exactness of the incremental merge is split-invariant, so ANY
  * micro-batch partitioning of the corpus converges to the same labeling.
  *
  * This is the production shape for continuous corpus ingestion: the
  * stream's checkpoint gives at-least-once batch delivery, and the state
  * generations make re-merging an already-committed batch idempotent in
  * the failure window (the generation is simply rebuilt).
  *
  * Scale notes: per micro-batch cost is the d12 merge cost — O(batch)
  * signing plus a band-index probe join — and stream state is ZERO
  * (foreachBatch is stateless; all durable state lives in the dedup state
  * dir), so watermarks/state stores are not involved at all.
  */
object DocumentsStream {

  val defaultStreamFiles = 4

  def runIncrementalDedupAvailableNow(spark: SparkSession, dir: String,
      stateDir: Option[String] = None, files: Int = defaultStreamFiles): DataFrame = {
    val ss = EventsStream.streamSession(spark)
    val src = TmpDirs.scratch("graft_q54_src_").toString
    val state = stateDir.getOrElse(TmpDirs.scratch("graft_q54_state_").toString)
    // stage the corpus as `files` parquet files — the file-stream source
    // with maxFilesPerTrigger=1 then delivers `files` micro-batches
    Tables.documents(ss, dir).repartition(files).write.mode("overwrite").parquet(src)
    val schema = ss.read.parquet(src).schema
    val q = ss.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", TmpDirs.scratch("graft_q54_stream_ckpt_").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IncrementalDedup.merge(batch.sparkSession, state, batch)
        ()
      }
      .start()
    q.awaitTermination()
    IncrementalDedup.clusters(spark, state)
  }
}
