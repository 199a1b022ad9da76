package graft

import org.apache.spark.sql.functions._

import graft.ops.IncrementalView
import graft.operators.Relational

/** q65/q66: incremental materialized-view maintenance of the q14 daily
  * rollup — split-ingest must equal the one-shot aggregate for any split,
  * re-delivery must be a no-op, compaction must be lossless, and late
  * data for an old day must fold in with no watermark contract.
  */
class IncrementalViewSpec extends SparkSpec {

  private def events = graft.sources.Tables.events(spark, sf0001)

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.select("day", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("split-ingest serves the one-shot q14 rollup, any split") {
    val full = sorted(Relational.q14EventsDaily(spark, sf0001))
    for (mod <- Seq(2, 5)) {
      val state = graft.util.TmpDirs.scratch(s"graft_q65_t_${mod}_").toString
      (0 until mod).foreach { r =>
        IncrementalView.merge(spark, state,
          events.where(pmod(col("event_id"), lit(mod)) === r))
      }
      assert(sorted(IncrementalView.serve(spark, state)) == full,
        s"$mod-way split-ingest diverged from the one-shot rollup")
    }
  }

  test("keyed merge is idempotent; compaction is lossless and folds to one generation") {
    val full = sorted(Relational.q14EventsDaily(spark, sf0001))
    val state = graft.util.TmpDirs.scratch("graft_q65_idem_").toString
    val b0 = events.where(col("event_id") % 2 === 0)
    val b1 = events.where(col("event_id") % 2 === 1)
    IncrementalView.merge(spark, state, b0, Some("b0"))
    IncrementalView.merge(spark, state, b1, Some("b1"))
    // re-delivery: same key, would double-count if it appended
    IncrementalView.merge(spark, state, b1, Some("b1"))
    assert(IncrementalView.completeVersions(spark, state) == Seq(0, 1))
    assert(sorted(IncrementalView.serve(spark, state)) == full)
    // compaction: one generation, same served view, markers survive
    val v = IncrementalView.compact(spark, state)
    assert(IncrementalView.completeVersions(spark, state) == Seq(v))
    assert(sorted(IncrementalView.serve(spark, state)) == full)
    IncrementalView.merge(spark, state, b0, Some("b0"))
    assert(IncrementalView.completeVersions(spark, state) == Seq(v),
      "re-delivered key must stay a no-op after its generation was compacted away")
    assert(sorted(IncrementalView.serve(spark, state)) == full)
  }

  test("late data: an event for an old day folds in after compaction — no watermark bound") {
    val state = graft.util.TmpDirs.scratch("graft_q65_late_").toString
    val days = events.select(date_trunc("day", col("ts")).cast("date").as("d"))
      .agg(min(col("d")), max(col("d"))).head()
    val (first, last) = (days.getDate(0), days.getDate(1))
    // ingest everything EXCEPT the oldest day, compact, then the oldest
    // day arrives arbitrarily late
    val onTime = events.where(date_trunc("day", col("ts")).cast("date") > lit(first))
    val late = events.where(date_trunc("day", col("ts")).cast("date") === lit(first))
    assert(late.limit(1).count() == 1 && first != last)
    IncrementalView.merge(spark, state, onTime, Some("ontime"))
    IncrementalView.compact(spark, state)
    val served0 = sorted(IncrementalView.serve(spark, state))
    assert(!served0.exists(_.head == first), "old day must be absent before the late batch")
    IncrementalView.merge(spark, state, late, Some("late"))
    assert(sorted(IncrementalView.serve(spark, state)) ==
      sorted(Relational.q14EventsDaily(spark, sf0001)))
  }

  test("time travel: as-of each generation equals the rollup over its prefix; vacuumed history errors") {
    val state = graft.util.TmpDirs.scratch("graft_q67_spec_").toString
    val slices = (0 until 3).map(r => events.where(col("event_id") % 3 === r))
    def rollupOf(pred: org.apache.spark.sql.Column) = sorted(
      events.where(pred)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value")))
    val vs = slices.zipWithIndex.map { case (s, i) =>
      IncrementalView.merge(spark, state, s, Some(s"k$i")) }
    assert(sorted(IncrementalView.serveAsOf(spark, state, vs(0))) ==
      rollupOf(col("event_id") % 3 === 0))
    assert(sorted(IncrementalView.serveAsOf(spark, state, vs(1))) ==
      rollupOf(col("event_id") % 3 < 2))
    assert(sorted(IncrementalView.serveAsOf(spark, state, vs(2))) ==
      sorted(Relational.q14EventsDaily(spark, sf0001)))
    // before-everything is empty, and valid even after compaction
    assert(IncrementalView.serveAsOf(spark, state, -1).count() == 0)
    // compaction vacuums history: as-of an intermediate generation errors
    val vc = IncrementalView.compact(spark, state)
    assert(sorted(IncrementalView.serveAsOf(spark, state, vc)) ==
      sorted(Relational.q14EventsDaily(spark, sf0001)))
    intercept[IllegalArgumentException] {
      IncrementalView.serveAsOf(spark, state, vs(1))
    }
  }

  test("change feed: window folds are additive deltas; a straddling compaction is refused") {
    val state = graft.util.TmpDirs.scratch("graft_q68_spec_").toString
    val slices = (0 until 3).map(r => events.where(col("event_id") % 3 === r))
    val vs = slices.zipWithIndex.map { case (s, i) =>
      IncrementalView.merge(spark, state, s, Some(s"k$i")) }
    def rollupOf(pred: org.apache.spark.sql.Column) = sorted(
      events.where(pred)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value")))
    assert(sorted(IncrementalView.changeFeed(spark, state, vs(0), vs(2))) ==
      rollupOf(col("event_id") % 3 >= 1))
    assert(sorted(IncrementalView.changeFeed(spark, state, vs(1), vs(2))) ==
      rollupOf(col("event_id") % 3 === 2))
    // feed since before everything == the full view
    assert(sorted(IncrementalView.changeFeed(spark, state, -1, vs(2))) ==
      sorted(IncrementalView.serve(spark, state)))
    // a compacted generation straddling the window start is refused (it
    // folded pre-window history the feed would re-report)...
    val vc = IncrementalView.compact(spark, state)
    intercept[IllegalArgumentException] {
      IncrementalView.changeFeed(spark, state, vs(1), vc)
    }
    // ...but feeds aligned at-or-after the fold still work
    val v3 = IncrementalView.merge(spark, state, slices(1), Some("k3"))
    assert(sorted(IncrementalView.changeFeed(spark, state, vc, v3)) ==
      rollupOf(col("event_id") % 3 === 1))
  }

  test("view chaining: the weekly view built only from raw daily feeds equals the direct rollup") {
    val direct = events
      .groupBy(date_trunc("week", col("ts")).cast("date").as("week"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    for (mod <- Seq(2, 4)) {
      val daily = graft.util.TmpDirs.scratch(s"graft_q70_d_${mod}_").toString
      val weekly = graft.util.TmpDirs.scratch(s"graft_q70_w_${mod}_").toString
      var prev = -1
      (0 until mod).foreach { r =>
        val v = IncrementalView.merge(spark, daily,
          events.where(pmod(col("event_id"), lit(mod)) === r), Some(s"k$r"))
        // chain every daily generation into the weekly view as it lands
        IncrementalView.Weekly.merge(spark, weekly,
          IncrementalView.changeFeedRaw(spark, daily, prev, v), Some(s"w$r"))
        prev = v
      }
      val got = IncrementalView.Weekly.serve(spark, weekly)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(got == direct, s"$mod-way chained weekly view diverged")
      // re-delivered weekly batch is a no-op
      IncrementalView.Weekly.merge(spark, weekly,
        IncrementalView.changeFeedRaw(spark, daily, -1, prev), Some("w0"))
      assert(IncrementalView.Weekly.serve(spark, weekly)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq == direct)
    }
  }

  test("q71 streaming pyramid drain equals the direct weekly rollup") {
    val got = graft.streaming.DocumentsStream
      .runViewChainingAvailableNow(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val direct = events
      .groupBy(date_trunc("week", col("ts")).cast("date").as("week"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == direct)
  }

  test("q79 retraction: corrected serve == direct rollup over corrected events; emptied groups vanish") {
    import spark.implicits._
    val state = graft.util.TmpDirs.scratch("graft_q79_spec_").toString
    // synthetic micro-corpus: two days, three types; the 'error' group on
    // day 1 is FULLY retracted and must leave the served view
    val ev = Seq(
      (1L, "2024-03-01 10:00:00", "click", 1.25),
      (2L, "2024-03-01 11:00:00", "click", 2.50),
      (3L, "2024-03-01 12:00:00", "error", 9.99),
      (4L, "2024-03-02 09:00:00", "view", 0.75),
      (5L, "2024-03-02 10:00:00", "click", 4.00))
      .toDF("event_id", "raw_ts", "event_type", "value")
      .withColumn("ts", col("raw_ts").cast("timestamp")).drop("raw_ts")
    IncrementalView.merge(spark, state, ev, Some("k0"))
    // correction 1: event 2 was a view, not a click (retract + re-ingest)
    val misfiled = ev.where(col("event_id") === 2)
    IncrementalView.retract(spark, state, misfiled, Some("r0"))
    IncrementalView.merge(spark, state,
      misfiled.withColumn("event_type", lit("view")), Some("k1"))
    // correction 2: the error event was spurious — its whole group empties
    IncrementalView.retract(spark, state, ev.where(col("event_id") === 3), Some("r1"))
    // re-delivered retraction is a no-op (exactly-once via batch keys)
    IncrementalView.retract(spark, state, ev.where(col("event_id") === 3), Some("r1"))
    val corrected = ev.where(col("event_id") =!= 3)
      .withColumn("event_type",
        when(col("event_id") === 2, lit("view")).otherwise(col("event_type")))
    val want = sorted(corrected
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value")))
    assert(sorted(IncrementalView.serve(spark, state)) == want)
    assert(!sorted(IncrementalView.serve(spark, state)).exists(_(1) == "error"),
      "a fully-retracted group must leave the served view")
    // time travel still sees the PRE-correction view (generations are
    // immutable deltas; the correction is just two more of them)
    val preCorrection = sorted(ev
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value")))
    assert(sorted(IncrementalView.serveAsOf(spark, state, 0)) == preCorrection)
    // compaction folds the signed partials losslessly
    IncrementalView.compact(spark, state)
    assert(sorted(IncrementalView.serve(spark, state)) == want)
    // over-retraction (events never ingested) is refused loudly at serve
    IncrementalView.retract(spark, state, ev.where(col("event_id") === 3), Some("r2"))
    val ex = intercept[Exception] {
      IncrementalView.serve(spark, state).collect()
    }
    assert(ex.getMessage != null && ex.toString.contains("negative count"),
      s"expected the negative-count refusal, got: $ex")
  }

  test("q79 change feed across a retraction window: negative and zero-net deltas survive") {
    import spark.implicits._
    val state = graft.util.TmpDirs.scratch("graft_q79_feed_").toString
    val ev = Seq(
      (1L, "2024-03-01 10:00:00", "click", 1.25),
      (2L, "2024-03-01 11:00:00", "click", 2.50),
      (3L, "2024-03-01 12:00:00", "error", 9.99))
      .toDF("event_id", "raw_ts", "event_type", "value")
      .withColumn("ts", col("raw_ts").cast("timestamp")).drop("raw_ts")
    val v0 = IncrementalView.merge(spark, state, ev, Some("k0"))
    // window (v0, v2]: a pure retraction (the error was spurious) and a
    // zero-net VALUE correction (event 2 re-filed at 3.00: n cancels,
    // sum moves by +0.50)
    IncrementalView.retract(spark, state, ev.where(col("event_id") === 3), Some("r0"))
    IncrementalView.retract(spark, state, ev.where(col("event_id") === 2), Some("r1"))
    val v2 = IncrementalView.merge(spark, state,
      ev.where(col("event_id") === 2).withColumn("value", lit(3.00)), Some("k1"))
    val feed = IncrementalView.changeFeed(spark, state, v0, v2)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // the retraction surfaces as a NEGATIVE delta (a chained consumer
    // applies it by adding), not an error...
    assert(feed.exists(r => r(1) == "error" && r(2) == -1L),
      s"the feed must report the retraction as a negative delta: $feed")
    // ...and the zero-net correction row KEEPS its sum delta (dropping
    // n == 0 rows here would lose the 0.50 the consumer needs)
    assert(feed.exists(r => r(1) == "click" && r(2) == 0L && r(3) == 0.5),
      s"the feed must keep the zero-count sum correction: $feed")
    // while the SERVED view applies the presentation rule: the emptied
    // error group is gone and the click group shows the corrected sum
    val served = sorted(IncrementalView.serve(spark, state))
    assert(!served.exists(_(1) == "error"))
    assert(served.exists(r => r(1) == "click" && r(2) == 2L && r(3) == 4.25), served.toString)
  }

  test("q79 over-retraction: the daily AND chained weekly serves refuse a negative count") {
    import spark.implicits._
    val daily = graft.util.TmpDirs.scratch("graft_q79_neg_d_").toString
    val weekly = graft.util.TmpDirs.scratch("graft_q79_neg_w_").toString
    val ev = Seq((1L, "2024-03-01 10:00:00", "click", 1.25))
      .toDF("event_id", "raw_ts", "event_type", "value")
      .withColumn("ts", col("raw_ts").cast("timestamp")).drop("raw_ts")
    val phantom = Seq((9L, "2024-03-01 10:00:00", "view", 2.00))
      .toDF("event_id", "raw_ts", "event_type", "value")
      .withColumn("ts", col("raw_ts").cast("timestamp")).drop("raw_ts")
    IncrementalView.merge(spark, daily, ev, Some("k0"))
    // retract events never ingested: the raw feed carries the negative
    // delta (deltas are deltas), but every SERVING surface refuses
    val v1 = IncrementalView.retract(spark, daily, phantom, Some("r0"))
    IncrementalView.Weekly.merge(spark, weekly,
      IncrementalView.changeFeedRaw(spark, daily, -1, v1), Some("w0"))
    val exDaily = intercept[Exception] {
      IncrementalView.serve(spark, daily).collect()
    }
    assert(exDaily.toString.contains("negative count"), exDaily.toString)
    val exWeekly = intercept[Exception] {
      IncrementalView.Weekly.serve(spark, weekly).collect()
    }
    assert(exWeekly.toString.contains("negative count"), exWeekly.toString)
  }

  test("q79 chaining: the weekly view stays correct through a retraction window") {
    val daily = graft.util.TmpDirs.scratch("graft_q79_chain_d_").toString
    val weekly = graft.util.TmpDirs.scratch("graft_q79_chain_w_").toString
    val misfiled = events.where(col("event_type") === "click" && col("event_id") % 10 === 3)
    val spurious = events.where(col("event_type") === "error" && col("event_id") % 17 === 5)
    // window 1: everything as originally (mis)recorded
    val v0 = IncrementalView.merge(spark, daily, events, Some("k0"))
    IncrementalView.Weekly.merge(spark, weekly,
      IncrementalView.changeFeedRaw(spark, daily, -1, v0), Some("w0"))
    // window 2: the corrections — two retractions and a re-ingest
    IncrementalView.retract(spark, daily, misfiled, Some("r0"))
    IncrementalView.merge(spark, daily,
      misfiled.withColumn("event_type", lit("view")), Some("k1"))
    val v1 = IncrementalView.retract(spark, daily, spurious, Some("r1"))
    IncrementalView.Weekly.merge(spark, weekly,
      IncrementalView.changeFeedRaw(spark, daily, v0, v1), Some("w1"))
    // the chained weekly view == the weekly rollup over corrected events
    val corrected = events
      .where(!(col("event_type") === "error" && col("event_id") % 17 === 5))
      .withColumn("event_type",
        when(col("event_type") === "click" && col("event_id") % 10 === 3, lit("view"))
          .otherwise(col("event_type")))
    val direct = corrected
      .groupBy(date_trunc("week", col("ts")).cast("date").as("week"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val got = IncrementalView.Weekly.serve(spark, weekly)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == direct, "chained weekly view diverged through the retraction window")
  }

  test("empty state serves an empty view with the q14 schema") {
    val state = graft.util.TmpDirs.scratch("graft_q65_empty_").toString
    val df = IncrementalView.serve(spark, state)
    assert(df.columns.toSeq == Seq("day", "event_type", "n", "sum_value"))
    assert(df.count() == 0)
  }

  test("q66 streaming drain equals batch q14 (chassis: one merge per micro-batch)") {
    val got = sorted(graft.streaming.DocumentsStream
      .runViewMaintenanceAvailableNow(spark, sf0001))
    assert(got == sorted(Relational.q14EventsDaily(spark, sf0001)))
  }
}
