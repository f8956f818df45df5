package graft.sources

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Test-only Hadoop `FileSystem` registered under its own scheme
  * (`graftfs://`), delegating storage to the local disk — the standard
  * fake-FS pattern for proving scheme ROUTING without a real cluster:
  * if any step of the index lifecycle resolved paths through
  * `java.nio.file` (the bug class [[IndexFs]] exists to close), that
  * step would bypass this FS and the traffic counter would expose it.
  * Instantiated reflectively by Hadoop via `fs.graftfs.impl`; extends
  * the RAW local FS, so no checksum wrapper and no `.crc` sidecars. */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")

  /** ATOMIC create-if-absent — the primitive the commit-log protocol
    * documents as its requirement ([[IndexFs.createUtf8]]) and real
    * stores provide (HDFS, ABFS, GCS): `RawLocalFileSystem`'s
    * `create(overwrite = false)` is a non-atomic exists-then-create,
    * which under the concurrency specs' barrier-released writers lets
    * BOTH racers "win" and silently clobber one another's pointer.
    * Reserve the name with POSIX `O_CREAT|O_EXCL` first, so exactly one
    * winner proceeds and the loser gets the Hadoop exception the
    * protocol's race handling is written against. */
  private def reserveOnce(f: Path): Unit = {
    val local = pathToFile(f).toPath
    if (local.getParent != null)
      java.nio.file.Files.createDirectories(local.getParent)
    try java.nio.file.Files.createFile(local)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    }
  }

  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) {
      reserveOnce(f)
      super.create(f, permission, true, bufferSize, replication,
        blockSize, progress)
    } else super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  /** The non-permission overload `FileSystem.create(p, false)` actually
    * lands on in `RawLocalFileSystem` — must reserve atomically too. */
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) {
      reserveOnce(f)
      super.create(f, true, bufferSize, replication, blockSize, progress)
    } else super.create(f, overwrite, bufferSize, replication, blockSize,
      progress)
  }

  /** The raw local FS loads permissions LAZILY via `new File(pathUri)`,
    * which throws on any non-`file:` scheme — re-wrap into a plain
    * `FileStatus` with eager default permissions (content metadata is
    * what the protocol reads; posix bits are irrelevant to the test). */
  private def eager(s: FileStatus): FileStatus = new FileStatus(
    s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
    s.getModificationTime, s.getAccessTime,
    if (s.isDirectory) FsPermission.getDirDefault
    else FsPermission.getFileDefault,
    "", "", s.getPath)

  override def getFileStatus(f: Path): FileStatus = {
    GraftTestFs.ops.incrementAndGet()
    eager(super.getFileStatus(f))
  }

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
}

object GraftTestFs {
  /** Status probes served under the `graftfs` scheme — strictly
    * positive once any real traffic routes through the fake FS. */
  val ops = new AtomicLong(0L)
}
