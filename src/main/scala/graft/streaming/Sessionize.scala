package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.sources.Tables

/** Sessionization: split each user's event stream into sessions at
  * inactivity gaps > `gapSeconds`, emitting one summary row per session.
  *
  * Two implementations, one semantics:
  *   - [[sessionsBatch]]: lag/cumsum over a window — one shuffle on
  *     user_id, no state. The classic batch formulation.
  *   - [[sessionsStreamingAvailableNow]]: `flatMapGroupsWithState` — the
  *     engine's custom-state streaming surface (GroupState carries the
  *     open session across micro-batches; with AvailableNow the final
  *     batch closes every session). At scale the state per key is one
  *     open-session summary — bounded, and evictable by timeout when run
  *     continuously.
  *
  * q24 checks the batch path against a DuckDB lag/cumsum oracle, and
  * `SessionizeSpec` checks streaming == batch.
  */
object Sessionize {

  val gapSeconds = 1800L // 30 min

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Batch: gap flag via lag, session index via running sum, then one
    * aggregation. Deterministic tie handling: events sorted by (ts,
    * value) within a user.
    */
  def sessionsBatch(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("value"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Pure sessionizer shared by the streaming path and its tests. */
  def sessionize(events: Seq[Ev]): Seq[Session] = {
    val sorted = events.sortBy(e => (e.ts.getTime, e.value))
    val out = Seq.newBuilder[Session]
    var cur: Option[Session] = None
    for (e <- sorted) {
      cur match {
        // Truncate each timestamp to whole seconds BEFORE differencing —
        // the batch twin diffs unix_timestamp() (second-floored) values, so
        // a raw-millis diff would disagree on gaps in (gap, gap+1) seconds.
        case Some(s) if e.ts.getTime / 1000 - s.session_end.getTime / 1000 <= gapSeconds =>
          cur = Some(s.copy(session_end = e.ts, n_events = s.n_events + 1,
            sum_value = s.sum_value + e.value))
        case other =>
          other.foreach(out += _)
          cur = Some(Session(e.user_id, e.ts, e.ts, 1L, e.value))
      }
    }
    cur.foreach(out += _)
    out.result()
  }

  /** Merge a carried open session with the first fresh session when the
    * inactivity gap permits.
    */
  private def mergeCarry(carry: Option[Session], fresh: Seq[Session]): Seq[Session] =
    (carry, fresh) match {
      case (Some(open), h +: t)
          if h.session_start.getTime / 1000 - open.session_end.getTime / 1000 <= gapSeconds =>
        open.copy(session_end = h.session_end,
          n_events = open.n_events + h.n_events,
          sum_value = open.sum_value + h.sum_value) +: t
      case (Some(open), f) => open +: f
      case (None, f) => f
    }

  /** Streaming state handler for the one-shot drain: sessionize the
    * batch's events, merge any open session carried in GroupState from a
    * previous micro-batch, emit everything, clear state. (A continuously
    * running variant would keep the last session open in state and flush
    * it via GroupStateTimeout; AvailableNow over a static table delivers
    * one batch, where emit-all is exact.)
    */
  private def handleGroup(userId: Long, events: Iterator[Ev],
      state: GroupState[Session]): Iterator[Session] = {
    val sessions = mergeCarry(state.getOption, sessionize(events.toSeq))
    state.remove()
    sessions.iterator
  }

  /** One-shot streaming run over the events table: custom state via
    * flatMapGroupsWithState, AvailableNow, ordered like the batch twin.
    */
  def sessionsStreamingAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStream.streamSession(spark)
    import ss.implicits._
    val name = s"graft_sessions_${System.identityHashCode(ss)}_${java.util.UUID.randomUUID.toString.take(8)}"
    val ev = EventsStream.readEventsStream(ss, dir)
      .select(col("user_id"), col("ts"), col("value")).as[Ev]
    val q = ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(handleGroup)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), round(col("sum_value"), 2).as("sum_value"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name).orderBy(col("user_id"), col("session_start"))
  }
}
