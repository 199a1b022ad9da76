package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A local filesystem that REFUSES every rename — the S3 semantic the
  * pointer-publish mode ([[graft.ops.GenState.PointerPublish]]) is built
  * for. Scheme `norename://` delegates to the local FS for everything
  * except `rename`, which throws unless the SOURCE path is inside a
  * `_temporary` tree: those renames belong to Hadoop's FileOutputCommitter
  * (the storage CONNECTOR's job-commit machinery — on real S3 the S3A
  * committers replace them with multipart uploads, public machinery
  * outside this protocol's scope). Every rename the STATE PROTOCOL itself
  * would issue — stage-dir publishes, `_CONFIG` pins, commit markers —
  * fails loudly, so a green concurrency suite on this filesystem IS the
  * proof that PointerPublish performs zero protocol renames.
  *
  * Registered per-test via `fs.norename.impl`, the [[CrashFs]] pattern.
  */
class NoRenameFs extends RawLocalFileSystem {
  override def getScheme: String = "norename"
  override def getUri: URI = URI.create("norename:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (!src.toString.contains("_temporary"))
      throw new java.io.IOException(
        s"NoRenameFs: rename($src -> $dst) refused — this store has no " +
          "rename; the state protocol must publish without one")
    super.rename(src, dst)
  }

  /** The store's ONE atomic primitive, modeled faithfully: a non-overwrite
    * create decides its winner atomically (OS O_EXCL — what a real object
    * store's `If-None-Match: *` PUT guarantees), unlike RawLocal's
    * check-then-act exists+create, which would let two racing claimants
    * both "win". The content write after the winning create is not atomic
    * here (a real PUT is whole-object); the protocol's read-back
    * discipline covers that local-emulation gap, as documented on
    * [[graft.ops.GenState.FsClaimBackend]].
    */
  private def atomicReserve(f: Path): Unit = {
    val local = java.nio.file.Paths.get(f.toUri.getPath)
    java.nio.file.Files.createDirectories(local.getParent)
    try java.nio.file.Files.createFile(local)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    }
  }

  // RawLocalFileSystem routes FileSystem.create(Path, boolean) through
  // THIS overload (not the FsPermission one), so both are guarded
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) {
      atomicReserve(f)
      super.create(f, true, bufferSize, replication, blockSize, progress)
    } else super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path, permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) {
      atomicReserve(f)
      super.create(f, permission, true, bufferSize, replication, blockSize, progress)
    } else super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
}
