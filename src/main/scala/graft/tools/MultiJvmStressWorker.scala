package graft.tools

import graft.GraftSession
import graft.ops.{IncrementalExact, IncrementalMinHash}

/** One writer PROCESS of the multi-JVM claim/fence stress.
  *
  * Every intra-process concurrency spec (GenStateClaimSpec,
  * ConcurrentCompactSpec, the MultiWriterSpecs) races threads inside one
  * JVM against one filesystem; the deployment reality the protocol was
  * designed for is SEPARATE Spark drivers — distinct JVMs, distinct
  * driver state, nothing shared but the storage. graft.MultiJvmStressSpec
  * forks several of these workers as real `java` processes against one
  * shared state dir and asserts the multi-writer invariants hold across
  * the process boundary: every merge commits (fresh allocation never
  * aborts a live sibling), the compactor folds or aborts CLEANLY, and
  * the served state equals sequential ingest of the same batches.
  *
  * Usage:
  *   MultiJvmStressWorker <family> <role> <stateDir> <sfDir> <mod> <residue> <key> [claimStore] [publish]
  *     family: exact | minhash      role: merge | compact
  *     claimStore: "-" (default) = in-tree FsClaimBackend; any other value
  *       = the external conditional-put backend rooted there
  *       ([[graft.ops.GenState.ExternalCpClaimBackend]]) — each forked
  *       worker builds its OWN backend instance against the shared store
  *       root, exactly as separate Spark drivers against one DynamoDB
  *       table / S3 prefix would.
  *     publish: "rename" (default) | "pointer" —
  *       [[graft.ops.GenState.PointerPublish]], the rename-free
  *       object-store commit path.
  *
  * A `norename://` stateDir registers the test-classpath NoRenameFs by
  * class NAME (the worker ships on the test classpath when forked by the
  * specs), so cross-process runs can target the rename-less filesystem.
  *
  * Exit codes (the spec's contract):
  *   0 — the operation committed;
  *   2 — a CLEAN protocol abort (IllegalStateException from the
  *       claim/lease machinery: nothing written, retry is safe);
  *   anything else — a real failure the spec must surface.
  */
object MultiJvmStressWorker {
  def main(args: Array[String]): Unit = {
    val Array(family, role, stateDir, sfDir, mod, residue, key) = args.take(7)
    args.drop(7).headOption.filter(_ != "-").foreach { store =>
      graft.ops.GenState.claimBackend = new graft.ops.GenState.ExternalCpClaimBackend(store)
    }
    if (args.drop(8).headOption.contains("pointer"))
      graft.ops.GenState.publishMode = graft.ops.GenState.PointerPublish
    val spark = GraftSession.create(s"mjvm-$family-$role-$key", cores = 4)
    if (stateDir.startsWith("norename:"))
      spark.sparkContext.hadoopConfiguration.set("fs.norename.impl", "graft.NoRenameFs")
    val outcome: Either[IllegalStateException, String] =
      try {
        import org.apache.spark.sql.functions.{col, lit, pmod}
        Right((family, role) match {
          case (_, "merge") =>
            val batch = graft.sources.Tables.documents(spark, sfDir)
              .where(pmod(col("doc_id"), lit(mod.toInt)) === residue.toInt)
            val v = family match {
              case "exact" =>
                IncrementalExact.merge(spark, stateDir, batch, Some(key))
              case "minhash" =>
                IncrementalMinHash.merge(spark, stateDir, batch, batchKey = Some(key))
            }
            s"OK v=$v"
          case ("exact", "compact") =>
            s"OK compacted=${IncrementalExact.compact(spark, stateDir)}"
          case ("minhash", "compact") =>
            s"OK compacted=${IncrementalMinHash.compact(spark, stateDir)}"
        })
      } catch {
        case e: IllegalStateException => Left(e)
      } finally spark.stop()
    outcome match {
      case Right(msg) => println(msg)
      case Left(e) =>
        println(s"CLEAN-ABORT ${e.getMessage.linesIterator.mkString(" / ")}")
        sys.exit(2)
    }
  }
}
