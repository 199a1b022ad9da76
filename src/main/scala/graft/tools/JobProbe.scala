package graft.tools

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-JOB wall-clock breakdown of one SparkEntry query — the round-20
  * optimization-loop microscope: the bench answers WHICH query is slow,
  * this answers WHERE inside it the time goes (each Spark action = one
  * job; gaps between jobs = driver/FS work). Runs the query twice (warm,
  * then measured) and prints every job's duration, description and stage
  * count, plus the total driver-side gap — the share no job accounts for.
  * Usage: runMain graft.tools.JobProbe <queryName> [queryName...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object JobProbe {
  final case class Job(id: Int, start: Long, var end: Long = -1L,
      desc: String = "", stages: Int = 0)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProbe <queryName> [queryName...]")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.create("job-probe")
    def warm(f: => Long): Unit = try { f; () } catch { case NonFatal(_) => () }
    warm(graft.sources.Tables.documents(spark, dir).count())
    warm(graft.sources.Tables.events(spark, dir).count())

    val jobs = mutable.ArrayBuffer.empty[Job]
    var record = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        if (record) jobs += Job(js.jobId, js.time,
          desc = Option(js.properties).map(_.getProperty("spark.job.description", ""))
            .getOrElse(""),
          stages = js.stageInfos.size)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        jobs.find(_.id == je.jobId).foreach(_.end = je.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm pass: JIT/codegen/table-cache effects out of the measurement
      graft.ops.Dedup.clearCaches()
      graft.engine.Bucketing.clearCaches()
      graft.ops.TextAnalysis.clearCaches()
      graft.ops.Similarity.clearCaches()
      graft.ops.Quantization.clearCaches()
      graft.ops.IncrementalIvfPq.clearCaches()
      try { fn(spark, dir).count(); () } catch { case NonFatal(e) =>
        println(s"WARM $name failed: ${e.getMessage}") }
      graft.ops.Dedup.clearCaches()
      graft.engine.Bucketing.clearCaches()
      graft.ops.TextAnalysis.clearCaches()
      graft.ops.Similarity.clearCaches()
      graft.ops.Quantization.clearCaches()
      graft.ops.IncrementalIvfPq.clearCaches()
      jobs.clear()
      record = true
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val total = (System.nanoTime() - t0) / 1e9
      record = false
      val snap = jobs.synchronized(jobs.toVector)
      println(f"\n===== $name total $total%.2f s, ${snap.size} jobs =====")
      val jobSum = snap.collect { case j if j.end > 0 => (j.end - j.start) / 1e3 }.sum
      // gaps: time between consecutive job ends/starts = driver+FS work
      val sorted = snap.sortBy(_.start)
      var prevEnd = if (sorted.nonEmpty) sorted.head.start else 0L
      sorted.foreach { j =>
        val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        // driver/FS time since last job end, CLAMPED at 0: concurrent jobs
        // (GenState.inParallel writes) overlap, and a negative "gap" would
        // make the census misleading exactly for the paths it measures —
        // overlapping jobs are flagged instead
        val rawGap = (j.start - prevEnd) / 1e3
        val gap = math.max(0.0, rawGap)
        val overlap = if (rawGap < 0) " [overlaps prev]" else ""
        prevEnd = math.max(prevEnd, if (j.end > 0) j.end else j.start)
        println(f"  job ${j.id}%4d gap ${gap}%7.3f  dur ${dur}%7.3f s stages=${j.stages} ${j.desc.take(80)}$overlap")
      }
      println(f"  JOB-SUM $jobSum%.2f s  DRIVER/FS GAP ${total - jobSum}%.2f s")
    }
    spark.stop()
  }
}
