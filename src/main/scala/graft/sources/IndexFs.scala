package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem operations for persisted-index METADATA (commit-log
  * markers, batch-tagged publish renames, staging cleanup), resolved
  * through the Hadoop `FileSystem` of the index root's SCHEME — the
  * same layer Spark itself writes the parquet artifacts through. The
  * exactly-once append guard is only as portable as its filesystem
  * calls: `java.nio.file` against a driver-local path silently
  * no-ops the marker/recovery protocol the moment `indexDir` moves to
  * `hdfs://` or `s3a://` (markers land on the driver's local disk
  * beside nothing, recovery scans an empty local dir while orphans
  * accumulate remotely). Routing every metadata touch through the
  * root's own `FileSystem` keeps the guard and the data on the same
  * store — local paths resolve to `file://` and behave exactly as
  * before.
  *
  * Rename caveat (documented, not hidden): the publish step's per-file
  * rename is atomic on `file://` and `hdfs://`; on object stores
  * without atomic rename (raw `s3a://`) the batch-TAGGED names still
  * make any partial copy identifiable and recovery still converges —
  * the protocol degrades from atomic to idempotent-with-cleanup, which
  * is the strongest guarantee the store itself offers.
  */
final class IndexFs(val fs: FileSystem, val root: Path) {

  /** `root/name0/name1/…` as a qualified path on the root's store. */
  def child(names: String*): Path = names.foldLeft(root)(new Path(_, _))

  def exists(p: Path): Boolean = fs.exists(p)

  def mkdirs(p: Path): Unit = fs.mkdirs(p)

  /** Store-reported modification time (ms epoch) — the staleness input
    * for lease-horizon reclaim; callers own the clock-skew caveat. */
  def modTimeOf(p: Path): Long = fs.getFileStatus(p).getModificationTime

  /** Create an empty marker file (parents included); fails if present —
    * markers are create-once by protocol. */
  def touch(p: Path): Unit = {
    fs.mkdirs(p.getParent)
    fs.create(p, false).close()
  }

  def deleteRecursive(p: Path): Unit =
    if (fs.exists(p)) fs.delete(p, true)

  def deleteFile(p: Path): Unit =
    if (fs.exists(p)) fs.delete(p, false)

  /** Every regular file under `p` (recursive), path-sorted for
    * deterministic publish naming; empty when `p` is absent. */
  def listFilesRec(p: Path): Vector[Path] = {
    if (!fs.exists(p)) return Vector.empty
    val it = fs.listFiles(p, true)
    val out = Vector.newBuilder[Path]
    while (it.hasNext) out += it.next().getPath
    out.result().sortBy(_.toString)
  }

  /** Direct children of `p` (non-recursive); empty when absent. */
  def listDir(p: Path): Vector[Path] =
    if (!fs.exists(p)) Vector.empty
    else fs.listStatus(p).toVector.map(_.getPath).sortBy(_.toString)

  /** Move `src` onto `dst` (parents created, an existing `dst`
    * replaced) — the publish-step rename. */
  def move(src: Path, dst: Path): Unit = {
    fs.mkdirs(dst.getParent)
    if (fs.exists(dst)) fs.delete(dst, false)
    require(fs.rename(src, dst), s"rename failed: $src -> $dst")
  }

  /** Create-ONCE a tiny metadata file with `content` (UTF-8) — fails if
    * present, the same atomicity primitive as [[touch]]: on stores with
    * atomic create-if-absent, whichever writer lands first wins and the
    * loser sees the failure instead of silently clobbering.
    *
    * PRIMITIVE REQUIREMENT, stated: the commit-log protocol assumes the
    * store's `create(overwrite = false)` is atomic — HDFS, ABFS and GCS
    * provide it (S3 via conditional PUT). `RawLocalFileSystem`'s is a
    * non-atomic exists-then-create; single-JVM local mode never races
    * it across processes, and the concurrency specs run on
    * `GraftTestFs`, which supplies the atomic primitive. Content lands
    * AFTER the create (no store gives one-shot create-with-content), so
    * readers of create-once pointers must treat an empty/invalid read
    * as not-yet-published — [[graft.operators.Similarity]]'s alias
    * resolution and the streaming routing claim both do. */
  def createUtf8(p: Path, content: String): Unit = {
    fs.mkdirs(p.getParent)
    val out = fs.create(p, false)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a tiny metadata file written by [[createUtf8]]. */
  def readUtf8(p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](4096)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}

object IndexFs {

  /** Resolve the `FileSystem` for `root`'s scheme from the session's
    * Hadoop configuration (plain local paths resolve to `file://`).
    * A `ChecksumFileSystem` wrapper (the local FS) is unwrapped to its
    * raw FS: markers and renamed batch files are metadata, and the
    * `.crc` sidecars the wrapper creates would pollute the append log
    * (marker counts, prefix scans). `hdfs://` and object stores are
    * not checksum-wrapped — unaffected. */
  def on(spark: SparkSession, root: String): IndexFs = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf()) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    new IndexFs(fs, p)
  }
}
