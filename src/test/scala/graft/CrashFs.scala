package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Fault-injecting local filesystem for the crash-point soak
  * ([[CrashSoakSpec]]): scheme `crash://` delegates to the local FS but
  * counts every MUTATING call (create, append, rename, delete, mkdirs,
  * setTimes) against a global budget — once the budget is exhausted,
  * every further mutation throws, which is how a process that died at
  * mutation K looks to the storage: a prefix of its writes landed,
  * nothing after. Reads are never injected (the surviving readers and
  * the recovery writer see exactly what a crashed writer left behind).
  *
  * Registered per-test via `fs.crash.impl`; the counter/budget are
  * JVM-global statics because Spark's local-mode tasks instantiate the
  * filesystem through the Hadoop cache on executor threads.
  */
class CrashFs extends RawLocalFileSystem {
  override def getScheme: String = "crash"
  override def getUri: URI = URI.create("crash:///")

  private def tick(): Unit = CrashFs.tick()

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    tick()
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def createNonRecursive(f: Path, permission: FsPermission,
      flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag],
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    tick()
    super.createNonRecursive(f, permission, flags, bufferSize, replication,
      blockSize, progress)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = {
    tick(); super.append(f, bufferSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    tick(); super.rename(src, dst)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    tick(); super.delete(p, recursive)
  }

  override def mkdirs(f: Path): Boolean = { tick(); super.mkdirs(f) }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    tick(); super.mkdirs(f, permission)
  }

  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = {
    tick()
    // some object stores don't support mtime mutation at all — the
    // heartbeat-fallback pin flips this to model them
    if (CrashFs.failSetTimes)
      throw new UnsupportedOperationException("setTimes unsupported (injected)")
    super.setTimes(p, mtime, atime)
  }
}

object CrashFs {
  /** Mutations remaining before the "process dies". MaxValue = injection
    * off (pure counting mode).
    */
  private val budget = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)

  /** Total mutations observed since the last [[reset]] — the counting
    * pass reads this to learn each operation's mutation span.
    */
  val mutations = new java.util.concurrent.atomic.AtomicLong(0L)

  final class InjectedCrash(k: Long)
    extends java.io.IOException(s"CRASH-INJECTED at mutation $k")

  /** Model a store whose setTimes is unsupported (no-op/throw) — the
    * `_MAINT` heartbeat must then fall back to a content rewrite.
    */
  @volatile var failSetTimes: Boolean = false

  private def tick(): Unit = {
    val k = mutations.incrementAndGet()
    if (budget.decrementAndGet() < 0) throw new InjectedCrash(k)
  }

  def reset(newBudget: Long = Long.MaxValue): Unit = {
    mutations.set(0L)
    budget.set(newBudget)
  }

  def disarm(): Unit = budget.set(Long.MaxValue)
}
