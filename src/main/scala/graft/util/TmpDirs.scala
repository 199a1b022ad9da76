package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

import scala.collection.mutable
import scala.util.control.NonFatal

/** Self-cleaning scratch directories for sink demos (q39 round trip, the
  * foreachBatch parquet sink): every directory handed out is deleted
  * recursively by a single JVM shutdown hook, so repeated Verify/Bench
  * runs do not accumulate parquet litter in the system temp dir.
  *
  * The hook — not eager deletion — because the DataFrames read back from
  * these directories are LAZY: the driver materializes them after the
  * operator returns, so the files must outlive the call and only die with
  * the process.
  */
object TmpDirs {

  private val created = mutable.ArrayBuffer.empty[Path]

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.synchronized(created.foreach(deleteRecursively))))
  }

  /** A fresh directory under `java.io.tmpdir`, unique per call (two
    * concurrent JVMs — sbt test + Bench — must not read back each other's
    * output), deleted on JVM exit.
    */
  def scratch(prefix: String): Path = {
    hook
    val dir = Files.createTempDirectory(prefix)
    created.synchronized(created += dir)
    dir
  }

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
    } catch { case NonFatal(_) => () }
}
