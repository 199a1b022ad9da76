package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables

/** Structured Streaming analog of the events pipeline: the same tumbling
  * daily aggregation as `Relational.q14EventsDaily`, run as a stream.
  *
  * The aggregation is defined ONCE ([[dailyAgg]]) and used by both the
  * batch and streaming paths — batch/stream parity is a property of the
  * shared plan, not of two implementations kept in sync by hand.
  *
  * Scale notes: the file source is splittable and incremental (new files
  * per trigger); the aggregation state is one row per (day, event_type) —
  * bounded and tiny. In production the trigger would be continuous with a
  * watermark on `ts` for append-mode output to a columnar sink; here
  * `Trigger.AvailableNow` drains the table once so the result is directly
  * comparable to the batch query (complete-mode memory sink).
  */
object EventsStream {

  /** Tumbling one-day window aggregation, UTC. Identical semantics to
    * date_trunc('day', ts) grouping in the batch q14.
    */
  def dailyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").cast("date").as("day"), col("event_type"),
        col("n"), col("sum_value"))

  /** Schema of `<dir>/events.parquet`, read once per (JVM, dir): every
    * streaming query needs the explicit schema (inference on a stream is
    * disabled for good reason — at scale it is an extra full listing+scan
    * per query start), but reading the footer is a driver job, and nine
    * streaming queries were each paying it.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** The raw events parquet as a stream, `ts` normalized by the same
    * shared [[Tables.normalizeEventsTs]] the batch loader uses — stream
    * and batch see identical schemas by construction, whatever physical
    * encoding the table carries.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val rawSchema = schemaCache.computeIfAbsent(dir,
      d => spark.read.parquet(s"$d/events.parquet").schema)
    // The file stream source wants a directory: stream the sf dir with a
    // glob restricted to the events table.
    Tables.normalizeEventsTs(
      spark.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  private val runId = new AtomicInteger(0)

  /** Shuffle-partition count for the streaming queries, settable via
    * SPARK_GRAFT_STREAM_PARTITIONS. Streaming state parallelism is FROZEN
    * into the checkpoint at first run, and every state store instance pays
    * a per-micro-batch commit (a stream-stream join carries FOUR stores
    * per partition), so partitions should match state size, not core
    * count: the events stream's state is thousands of keys, where 32-way
    * state parallelism is pure commit overhead. A production deployment
    * sizes this to horizon-bounded key cardinality / target per-task state
    * (and can NOT change it without a new checkpoint — start high enough
    * for peak state, it is the one non-elastic knob in the pipeline).
    */
  val streamShufflePartitions: Int =
    sys.env.get("SPARK_GRAFT_STREAM_PARTITIONS").map { v =>
      // fail with a message naming the env var: a bare .toInt here dies as
      // an ExceptionInInitializerError that never mentions the cause
      v.trim.toIntOption.filter(_ > 0).getOrElse(throw new IllegalArgumentException(
        s"SPARK_GRAFT_STREAM_PARTITIONS must be a positive int, got '$v'"))
    }.getOrElse(8)

  /** A same-context session whose shuffle-partition conf is sized for
    * streaming state ([[streamShufflePartitions]]). Cloning (not mutating
    * the caller's conf) keeps concurrently-planned batch queries on the
    * batch setting; the returned DataFrames carry the clone, so downstream
    * actions are unaffected.
    *
    * Caller conf that MUST survive the clone is copied explicitly:
    * `newSession()` starts from the context defaults, so a state-store
    * provider chosen on the caller's session (e.g. RocksDB for large
    * state) would otherwise be silently dropped exactly where it matters —
    * inside the stateful query (StateStoreParitySpec proves end-to-end
    * that the choice reaches the stream).
    */
  private[streaming] val inheritedConfs = Seq(
    "spark.sql.streaming.stateStore.providerClass")

  private[graft] def streamSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", streamShufflePartitions)
    inheritedConfs.foreach(k =>
      spark.conf.getOption(k).foreach(v => s.conf.set(k, v)))
    s
  }

  /** Watermark delay for the append-mode hourly pipeline. */
  val watermarkDelay = "10 minutes"

  /** Tumbling one-hour windows with a watermark, for APPEND output — the
    * production shape for writing to a columnar sink: a window row is
    * emitted exactly once, when the watermark (max event time −
    * [[watermarkDelay]]) passes its end, and late events beyond the delay
    * are dropped. State is bounded by the watermark horizon (windows ×
    * event types), independent of stream length.
    */
  def hourlyAggWatermarked(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** One-shot append-mode run: only windows CLOSED by the final watermark
    * (window end <= max(ts) − delay) appear — that is the semantic the
    * oracle replicates; it is what makes this a different operator from
    * the complete-mode daily aggregation, not just a narrower window.
    */
  def runHourlyAppendAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(spark)
    val name = s"graft_stream_hourly_${runId.incrementAndGet()}"
    val q = hourlyAggWatermarked(readEventsStream(ss, dir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name).orderBy(col("hour_start"), col("event_type"))
  }

  /** Dedup-state horizon for [[runDedupAvailableNow]]. Deliberately wider
    * than the test table's whole time span: within-watermark dedup only
    * equals global DISTINCT when no key's state expires mid-stream, and
    * that must hold for ANY batching of the input (a span-sized horizon
    * makes the oracle parity a property, not an artifact of the file
    * arriving as one micro-batch). Production sets this to the max
    * expected duplicate spacing, trading state size for dedup reach.
    */
  val dedupHorizon = "40 days"

  /** Streaming dedup — the stream-side sibling of exact dedup (d1): at
    * most one emitted row per (user_id, event_type, day) via
    * `dropDuplicatesWithinWatermark`. State holds one entry per key seen
    * within the watermark horizon and is evicted as the watermark passes
    * its expiry — bounded by per-horizon key cardinality, not stream
    * length (plain `dropDuplicates` on a stream would grow state forever).
    *
    * The output is the KEY projection: which physical row survives depends
    * on arrival order, but its key does not, so the emitted set is
    * deterministic and equals batch `SELECT DISTINCT` — the batch/stream
    * parity the oracle checks.
    */
  def runDedupAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(spark)
    val name = s"graft_stream_dedup_${runId.incrementAndGet()}"
    val q = readEventsStream(ss, dir)
      .withColumn("day_ts", col("ts").cast("date"))
      .withWatermark("ts", dedupHorizon)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "day_ts")
      .select(col("user_id"), col("event_type"), col("day_ts"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name).orderBy(col("user_id"), col("event_type"), col("day_ts"))
  }

  /** Event-type weight dimension for [[runStaticEnrichedAvailableNow]]
    * (interpolated into the oracle's VALUES list — one definition).
    */
  val typeWeights: Seq[(String, Double)] = Seq(
    "view" -> 0.1, "click" -> 1.0, "purchase" -> 5.0, "signup" -> 2.0)

  /** Stream-static join: enrich the event stream with a static dimension
    * (per-type weights), then the tumbling daily aggregation of weighted
    * value. Event types absent from the dim (e.g. "error") drop out —
    * the inner join IS the filter.
    *
    * The production shape for dimension enrichment: the static side is
    * planned once and broadcast into every micro-batch (no state store,
    * no watermark needed — only stream-stream joins buffer), so a 100 TB/
    * day stream pays one hash-probe per event against an executor-local
    * table.
    */
  def runStaticEnrichedAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(spark)
    val name = s"graft_stream_enrich_${runId.incrementAndGet()}"
    val dim = broadcast(
      ss.createDataFrame(typeWeights).toDF("event_type", "weight"))
    val q = readEventsStream(ss, dir)
      .join(dim, "event_type")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value") * col("weight")), 2).as("weighted_value"))
      .select(col("window.start").cast("date").as("day"), col("event_type"),
        col("n"), col("weighted_value"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name).orderBy(col("day"), col("event_type"))
  }

  /** Stream-stream LEFT OUTER interval join — the funnel with explicit
    * non-conversions: every click emits, either with its attributed
    * purchase(s) or, once the watermark proves no purchase can still
    * arrive inside the attribution window, with nulls. Unlike the inner
    * join (q32), outer emission REQUIRES the watermark: an unmatched
    * click is only known unmatched when the global watermark passes
    * click_ts + window, so the delay here is the real [[funnelWindow]]
    * (state eviction is the feature, not a hazard) and the final no-data
    * micro-batch flushes the evictions before AvailableNow terminates.
    */
  def runFunnelLeftOuterAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(spark)
    val name = s"graft_stream_funnel_outer_${runId.incrementAndGet()}"
    val q = funnelJoin(ss, dir, joinType = "left_outer", delay = funnelWindow)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name)
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** foreachBatch file sink — the production path for streaming into a
    * columnar store that has no native streaming sink: each micro-batch
    * lands as parquet via the same [[graft.engine.Sinks]] the batch engine
    * uses (transactionality comes from the checkpoint + batchId, which a
    * real deployment would write into the directory name for idempotent
    * replay). Complete-mode over AvailableNow drains to exactly one batch,
    * so the directory holds the final aggregate and reading it back equals
    * batch q14 — the oracle check.
    */
  def runDailyToParquetAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(spark)
    val out = graft.util.TmpDirs.scratch(s"graft_stream_fb_${runId.incrementAndGet()}_").toString
    val q = dailyAgg(readEventsStream(ss, dir))
      .writeStream
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.engine.Sinks.parquet(batch.repartition(1), out)
      }
      .start()
    q.awaitTermination()
    ss.read.parquet(out).orderBy(col("day"), col("event_type"))
  }

  /** Per-user running aggregate via `mapGroupsWithState` — the third
    * stateful-API surface next to `flatMapGroupsWithState` (Sessionize)
    * and the built-in stateful ops: arbitrary user state (here running
    * count + max), one emitted row per key per micro-batch in update
    * mode. State is a fixed-size record per user — bounded by key
    * cardinality, not stream length.
    *
    * Both tracked quantities are monotone, so taking the per-user max
    * over the update log makes the result identical for ANY micro-batch
    * split of the input — the oracle replays it as a plain batch
    * aggregate.
    */
  def runRunningMaxAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(spark)
    import ss.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val name = s"graft_stream_runmax_${runId.incrementAndGet()}"
    val q = readEventsStream(ss, dir)
      .select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) { (uid, evs, state) =>
        var (n, mx) = state.getOption.getOrElse((0L, Double.NegativeInfinity))
        evs.foreach { e => n += 1; if (e._2 > mx) mx = e._2 }
        state.update((n, mx))
        (uid, n, mx)
      }
      .toDF("user_id", "n_events", "max_value")
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"), max(col("max_value")).as("max_value"))
      .orderBy(col("user_id"))
  }

  /** Attribution window for [[runFunnelJoinAvailableNow]]. */
  val funnelWindow = "1 hour"

  /** Stream-stream interval join — the funnel query: every (click,
    * purchase) pair by the same user with the purchase inside
    * (click_ts, click_ts + [[funnelWindow]]].
    *
    * The production-shape stream-stream join: BOTH sides carry a
    * watermark and the join condition bounds event-time distance, so each
    * side's buffered state is evicted once the other side's watermark
    * passes the window — state is bounded by the horizon, not stream
    * length. The watermark delay here is [[dedupHorizon]] (wider than the
    * table's whole span), NOT the 1-hour attribution window: the oracle
    * parity must hold for ANY batching of the input, and a tight delay
    * would drop cross-batch late arrivals (production sets it to the real
    * out-of-orderness bound; the join window alone already bounds state).
    * Inner-join rows are emitted as soon as both sides arrive; drained
    * with AvailableNow the emitted set is exactly the batch interval
    * join, which is what the oracle replays.
    */
  /** The funnel interval join BODY, shared by the inner (q32) and
    * left-outer (q47) runs and by the perf probe — one definition, so a
    * probe or a variant can never silently drift from what the gate
    * queries execute. `delay` is the watermark on both sides (see the
    * run methods for why inner uses [[dedupHorizon]] and outer the real
    * [[funnelWindow]]).
    */
  def funnelJoin(ss: SparkSession, dir: String, joinType: String,
      delay: String): DataFrame = {
    val clicks = readEventsStream(ss, dir)
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val purchases = readEventsStream(ss, dir)
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $funnelWindow"),
      joinType)
  }

  def runFunnelJoinAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(spark)
    val name = s"graft_stream_funnel_${runId.incrementAndGet()}"
    val q = funnelJoin(ss, dir, joinType = "inner", delay = dedupHorizon)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name).orderBy(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** One-shot streaming run: drain the events table with AvailableNow into
    * a complete-mode memory sink and return the result, ordered like q14.
    */
  def runDailyAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamSession(spark)
    val name = s"graft_stream_daily_${runId.incrementAndGet()}"
    val q = dailyAgg(readEventsStream(ss, dir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name).orderBy(col("day"), col("event_type"))
  }
}
