package graft

import graft.operators.Relational
import graft.streaming.EventsStream

/** Batch/stream parity: the Structured Streaming daily aggregation must
  * produce exactly the batch q14 result on the same input.
  */
class EventsStreamSpec extends SparkSpec {

  test("availableNow streaming daily agg equals batch q14 at sf0.001") {
    val stream = EventsStream.runDailyAvailableNow(spark, sf0001).collect()
    val batch = Relational.q14EventsDaily(spark, sf0001).collect()
    assert(stream.length == batch.length)
    assert(stream.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("append-mode hourly windows = batch windows closed by the final watermark") {
    import org.apache.spark.sql.functions._
    val stream = EventsStream.runHourlyAppendAvailableNow(spark, sf0001).collect()
    val ev = graft.sources.Tables.events(spark, sf0001)
    val all = EventsStream.hourlyAggWatermarked(ev) // watermark is a no-op in batch
      .orderBy(col("hour_start"), col("event_type")).collect()
    val wm = ev.agg(max(col("ts"))).head().getTimestamp(0).getTime - 10 * 60 * 1000
    val closed = all.filter(_.getTimestamp(0).getTime + 3600 * 1000 <= wm)
    assert(stream.nonEmpty && stream.length < all.length) // tail windows withheld
    assert(stream.map(_.toSeq).toSeq == closed.map(_.toSeq).toSeq)
  }

  test("streaming source schema matches the batch loader (ts normalized)") {
    val s = EventsStream.readEventsStream(spark, sf0001).schema
    val b = graft.sources.Tables.events(spark, sf0001).schema
    assert(s == b)
  }
}
