package graft.fls

import org.apache.hadoop.fs.{FileSystem, Path, UnsupportedFileSystemException}

/** The one commit primitive every versioned fls log rides on: atomically
  * expose a fully-written temp file at a version path iff that version
  * does not exist yet. Local filesystems use a hard link (the one local
  * primitive that is both create-exclusive and atomic — a plain
  * create-exclusive open would expose a partially-written newest version
  * to readers); HDFS-likes use no-overwrite rename (atomic server-side,
  * fails on an existing destination). Returns false on a lost race.
  *
  * Shared by [[FlsManifest]] (data-file log) and [[FlsTableMeta]]
  * (schema/metadata log) so both logs carry identical concurrency
  * semantics: optimistic CAS, losers re-read and re-merge. */
private[fls] object FlsCas {

  def publishExclusive(fs: FileSystem, tmp: Path, dst: Path,
      conf: org.apache.hadoop.conf.Configuration): Boolean = {
    val qTmp = fs.makeQualified(tmp)
    val qDst = fs.makeQualified(dst)
    if ("file" == Option(qDst.toUri.getScheme).getOrElse("file")) {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(qDst.toUri.getPath),
          java.nio.file.Paths.get(qTmp.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(qDst.toUri, conf)
        fc.rename(qTmp, qDst) // Rename.NONE: atomic, fails if dst exists
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: UnsupportedOperationException | _: UnsupportedFileSystemException =>
          // stores without FileContext: exists-check + rename — the
          // strongest primitive available there (same caveat as every
          // catalogless format on such stores)
          if (fs.exists(qDst)) false else fs.rename(qTmp, qDst)
      }
    }
  }

  /** `v<20-digit-N>` version-file naming, shared across logs. */
  def versionName(v: Long): String = f"v$v%020d"

  def parseVersionName(name: String): Option[Long] =
    if (name.startsWith("v") && name.length > 1 && name.drop(1).forall(_.isDigit))
      scala.util.Try(name.drop(1).toLong).toOption
    else None

  /** Best-effort retention: keep the newest `keep` versions of a log. */
  /** `protect`: versions never GC'd regardless of age — TAGGED manifest
    * versions stay readable for as long as the tag exists. */
  def gcOldVersions(fs: FileSystem, logDir: Path, newest: Long, keep: Int,
      protect: Set[Long] = Set.empty): Unit = {
    val cutoff = newest - keep + 1
    if (cutoff <= 0) return
    try fs.listStatus(logDir).foreach { s =>
      parseVersionName(s.getPath.getName).foreach { v =>
        if (v < cutoff && !protect.contains(v))
          try fs.delete(s.getPath, false) catch { case _: Throwable => () }
      }
    } catch { case _: Throwable => () }
  }
}
