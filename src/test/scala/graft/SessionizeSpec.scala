package graft

import java.sql.Timestamp

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Ev, Session}

/** Sessionization: batch/stream parity (the stateful streaming surface)
  * plus gap-boundary semantics of the shared sessionizer.
  */
class SessionizeSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("gap boundary: exactly 1800s continues the session, 1801s splits") {
    val same = Sessionize.sessionize(Seq(Ev(1, ts(0), 1.0), Ev(1, ts(1800), 2.0)))
    assert(same.length == 1 && same.head.n_events == 2)
    val split = Sessionize.sessionize(Seq(Ev(1, ts(0), 1.0), Ev(1, ts(1801), 2.0)))
    assert(split.length == 2)
    assert(split.map(_.sum_value) == Seq(1.0, 2.0))
  }

  test("sub-second gap boundary matches batch unix_timestamp (second-floor) semantics") {
    // Raw-ms gap is 1800.099s (> 1800), but second-floored timestamps differ
    // by exactly 1800 — the batch twin keeps these in ONE session, and so
    // must the streaming sessionizer.
    val merged = Sessionize.sessionize(
      Seq(Ev(1, new Timestamp(900L), 1.0), Ev(1, new Timestamp(1800999L), 2.0)))
    assert(merged.length == 1 && merged.head.n_events == 2)
    // Floored diff 1801 → split, even though the sub-second parts are close.
    val split = Sessionize.sessionize(
      Seq(Ev(1, new Timestamp(999L), 1.0), Ev(1, new Timestamp(1801000L), 2.0)))
    assert(split.length == 2)
  }

  test("flatMapGroupsWithState streaming sessions equal the batch twin") {
    val stream = Sessionize.sessionsStreamingAvailableNow(spark, sf0001).collect()
    val batch = Sessionize.sessionsBatch(spark, sf0001).collect()
    assert(stream.length == batch.length)
    assert(stream.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }
}
