package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.ops.{IncrementalDedup, IncrementalEmbedding, IncrementalMinHash}

/** The merge hot-path contract (round-9 verdict finding 1): a d12/d14/d15
  * merge executes its candidate+verify join EXACTLY ONCE. The old code
  * probed `pairs.limit(1).count()` for the empty fast path and — when
  * pairs existed — re-executed the whole join from scratch inside CC, so
  * every duplicate-bearing micro-batch paid the candidate join twice. Now
  * the join is materialized to `vN/pairs` and everything downstream reads
  * the slim parquet back.
  *
  * The pin counts QueryExecutions that scan the modality's INDEX table
  * (bands / sets / vecs) during a duplicate-bearing merge — the verify
  * join is the only pair-path consumer of those dirs, so a re-execution
  * would show up as an extra scan. Listener delivery is async; the bus is
  * drained before counting (`waitUntilEmpty` is private[spark] but public
  * in bytecode — reflection, the same trick Spark's own tests use).
  */
class MergeExecOnceSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sf0001)
  private def vecs = graft.sources.Tables.embeddings(spark, sf0001)

  /** Count QueryExecutions during `body` that scan a parquet relation
    * whose root path satisfies `wanted` (matched on the ANALYZED plan's
    * file-index roots, so AQE re-planning can't hide or double scans).
    */
  private def executionsScanning(wanted: String => Boolean)(body: => Unit): Int = {
    val hits = new AtomicInteger(0)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        val scans = qe.analyzed.collect {
          case r: LogicalRelation => r.relation match {
            case h: HadoopFsRelation => h.location.rootPaths.exists(p => wanted(p.toString))
            case _ => false
          }
        }
        if (scans.contains(true)) hits.incrementAndGet()
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try { body; drainListenerBus() }
    finally spark.listenerManager.unregister(listener)
    hits.get
  }

  private def drainListenerBus(): Unit = {
    val sc = spark.sparkContext
    val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
    bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
  }

  private def nonEmptyPairs(state: String, v: Int): Boolean =
    !spark.read.parquet(s"$state/v$v/pairs").isEmpty

  test("d12 merge: the probe+verify join scans the band index exactly once") {
    val state = graft.util.TmpDirs.scratch("graft_once_d12_").toString
    IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    // exactly ONE execution of batch 2's merge scans this state's bands:
    // the pairs materialization. CC reads vN/pairs, never the index.
    val n = executionsScanning(p => p.contains(state) && p.contains("/bands")) {
      IncrementalDedup.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    }
    assert(n == 1, s"band index scanned by $n executions (want 1: the pairs write)")
    // and the merge was duplicate-BEARING — the expensive path was exercised
    assert(nonEmptyPairs(state, 1), "split produced no cross pairs; pin is vacuous")
  }

  test("d14 merge: the bucket+cosine join scans the vec index exactly once") {
    val state = graft.util.TmpDirs.scratch("graft_once_d14_").toString
    IncrementalEmbedding.merge(spark, state, vecs.where(pmod(col("vec_id"), lit(2)) === 0))
    val n = executionsScanning(p => p.contains(state) && p.contains("/vecs")) {
      IncrementalEmbedding.merge(spark, state, vecs.where(pmod(col("vec_id"), lit(2)) === 1))
    }
    assert(n == 1, s"vec index scanned by $n executions (want 1: the pairs write)")
    assert(nonEmptyPairs(state, 1), "split produced no cross pairs; pin is vacuous")
  }

  test("d15 merge: the band probe + Jaccard verify scans the shingle sets exactly twice") {
    val state = graft.util.TmpDirs.scratch("graft_once_d15_").toString
    IncrementalMinHash.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 0))
    // two LEGITIMATE sets-scanning executions in a merge: the bands write
    // (signs the new batch from its persisted sets) and the pairs write
    // (the verify join). A re-execution inside CC would make it three.
    val n = executionsScanning(p => p.contains(state) && p.contains("/sets")) {
      IncrementalMinHash.merge(spark, state, docs.where(pmod(col("doc_id"), lit(2)) === 1))
    }
    assert(n == 2, s"shingle sets scanned by $n executions (want 2: bands + pairs writes)")
    assert(nonEmptyPairs(state, 1), "split produced no cross pairs; pin is vacuous")
  }
}
