package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Phase-attributed job census of the d12 merge loop: replicates
  * d12_incremental_dedup (2 merges + serve) with a job description set
  * around every engine call, so each of the ~34 jobs lands in a named
  * phase. Pure diagnostics for the round-20 optimization loop.
  */
object MergePhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.create("merge-probe")
    graft.sources.Tables.documents(spark, dir).count()

    val jobs = mutable.ArrayBuffer.empty[(Int, Long, String, Int)] // id, start, desc, stages
    val ends = mutable.HashMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        jobs += ((js.jobId, js.time,
          Option(js.properties).map(_.getProperty("spark.job.description", "?"))
            .getOrElse("?"), js.stageInfos.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        ends(je.jobId) = je.time
      }
    })

    // warm once
    {
      val st = graft.util.TmpDirs.scratch("graft_probe_warm_").toString
      val docs = graft.sources.Tables.documents(spark, dir)
      graft.ops.IncrementalDedup.merge(spark, st, docs.where(pmod(col("doc_id"), lit(5)) =!= 0))
      graft.ops.IncrementalDedup.merge(spark, st, docs.where(pmod(col("doc_id"), lit(5)) === 0))
      graft.ops.IncrementalDedup.clusters(spark, st).count()
    }

    def phase[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }

    jobs.clear(); ends.clear()
    val state = graft.util.TmpDirs.scratch("graft_probe_d12_").toString
    val docs = graft.sources.Tables.documents(spark, dir)
    val t0 = System.nanoTime()
    phase("merge1")(graft.ops.IncrementalDedup.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(5)) =!= 0)))
    phase("merge2")(graft.ops.IncrementalDedup.merge(spark, state,
      docs.where(pmod(col("doc_id"), lit(5)) === 0)))
    phase("serve")(graft.ops.IncrementalDedup.clusters(spark, state).count())
    val total = (System.nanoTime() - t0) / 1e9

    println(f"\nTOTAL $total%.2f s, ${jobs.size} jobs")
    val snap = jobs.synchronized(jobs.toVector)
    val byPhase = snap.groupBy(_._3)
    byPhase.toSeq.sortBy(-_._2.size).foreach { case (desc, js) =>
      val dur = js.map(j => ends.getOrElse(j._1, j._2) - j._2).sum / 1e3
      val stages = js.map(_._4).sum
      println(f"  ${js.size}%3d jobs $stages%3d stages ${dur}%6.2f s  $desc")
    }
    spark.stop()
  }
}
