package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The events twin of the degenerate-data program: duplicate timestamps
  * (every tie-break must actually fire), single-event users, boundary
  * values, and malformed JSON props. Contracts: no event-family operator
  * crashes, and every result is RUN-TO-RUN DETERMINISTIC — a tie broken
  * by partition luck would pass a single run and flap across executions.
  */
class DegenerateEventsSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = graft.util.TmpDirs.scratch("graft_degen_ev_").toString
    // the relational queries join orders/lineitem etc. — reuse sf0.001's
    // copies and replace only events
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(s"$sf0001/$t.parquet"),
        fs, new org.apache.hadoop.fs.Path(s"$d/$t.parquet"),
        false, spark.sparkContext.hadoopConfiguration)
    }
    def ts(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      // user 1: three events at the SAME instant (ties everywhere)
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, """{"k": 1}"""),
      (2L, ts("2024-01-01 10:00:00"), 1L, "click", 2.0, """{"k": 2}"""),
      (3L, ts("2024-01-01 10:00:00"), 1L, "purchase", 3.0, """{"k": 3}"""),
      // user 2: a single event, malformed props
      (4L, ts("2024-01-02 00:00:00"), 2L, "view", 0.0, "not json"),
      // user 3: boundary values, empty props object, negative value
      (5L, ts("2024-01-02 23:59:59"), 3L, "click", -7.5, "{}"),
      (6L, ts("2024-01-03 00:00:00"), 3L, "purchase", 0.0, """{"k": 0}"""),
      // user 4: a long same-type run across days for windows/gapfill
      (7L, ts("2024-01-04 09:00:00"), 4L, "view", 10.0, """{"k": 4}"""),
      (8L, ts("2024-01-05 09:00:00"), 4L, "view", 11.0, """{"k": 5}"""),
      (9L, ts("2024-01-06 09:00:00"), 4L, "view", 12.0, """{"k": 6}"""),
      // duplicate event content under distinct ids (stream-dedup bait)
      (10L, ts("2024-01-06 09:00:00"), 4L, "view", 12.0, """{"k": 6}"""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q13_events_json" -> (graft.operators.Relational.q13EventsJson _),
    "q14_events_daily" -> (graft.operators.Relational.q14EventsDaily _),
    "q15_asof" -> (graft.operators.Relational.q15AsofJoin _),
    "q21_asof_skew" -> (graft.operators.AsOfJoin.eventsToOrdersSkewSafe _),
    "q24_sessions" -> (graft.streaming.Sessionize.sessionsBatch _),
    "q25_windows" -> (graft.operators.Relational.q25WindowSuite _),
    "q35_latest" -> (graft.operators.TopK.latestEventPerUser _),
    "q36_histogram" -> (graft.operators.Relational.q36Histogram _),
    "q43_gapfill" -> (graft.operators.Relational.q43GapFill _),
    "q48_rolling" -> (graft.operators.Relational.q48RollingRange _),
    "q51_rolling_bucketed" -> (graft.operators.Relational.q51RollingRangeBucketed _))

  test("event operators survive ties, singletons, and malformed props — deterministically") {
    val failures = ops.flatMap { case (name, fn) =>
      try {
        val a = fn(spark, dir).collect().map(_.toString).toSeq
        val b = fn(spark, dir).collect().map(_.toString).toSeq
        if (a != b) Some(s"$name: nondeterministic under ties") else None
      } catch { case e: Throwable =>
        Some(s"$name: ${e.getMessage.linesIterator.next().take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("malformed props parse to null, not an error") {
    val j = graft.operators.Relational.q13EventsJson(spark, dir).collect()
    assert(j.nonEmpty) // the query ran; 'not json' rows contributed nulls
  }
}
