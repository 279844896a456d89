package graft.fls

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path, UnsupportedFileSystemException}

/** Manifest commit for object stores. Rename-based task commit is atomic
  * on HDFS/local but copy+delete on S3-like stores — a visible
  * non-atomic window per file. In `commit_mode=manifest` the table's
  * contents are defined by ONE small file, `_fls_manifest`, written
  * atomically at job commit: tasks write data files directly under
  * attempt-unique final names (no renames at all), and readers trust the
  * manifest instead of directory listing — which also removes the
  * recursive-listing RPC from planning entirely (a 100k-file table plans
  * from one manifest read). Files on disk but not in the manifest
  * (losing speculative attempts, crashed jobs, junk) are invisible.
  *
  * The reference has no cluster commit story at all (single-process
  * writer, /root/reference/src/writer/fls_writer.cpp:332-347); this and
  * the staged-rename protocol are the Spark-scale additions.
  *
  * Format (UTF-8 text): header line `#fls-manifest v1`, then one line
  * per data file: `<length>\t<mtime>\t<relativePath>`. mtime 0 means
  * "immutable" (manifest-mode files are never rewritten in place);
  * lengths ride along so readers can build FileStatus without a
  * per-file stat. Concurrent APPENDING jobs to the same manifest table
  * race the read-modify-write and are not supported (single-writer per
  * table, like most manifest-based formats without a catalog lock). */
object FlsManifest {
  val FileName = "_fls_manifest"
  private val Header = "#fls-manifest v1"

  final case class Entry(rel: String, length: Long, mtime: Long)

  def manifestPath(dir: Path): Path = new Path(dir, FileName)

  /** Entries, or None when the table has no manifest (listing mode). */
  def read(fs: FileSystem, dir: Path): Option[Seq[Entry]] = {
    val p = manifestPath(dir)
    val st =
      try fs.getFileStatus(p)
      catch { case _: java.io.FileNotFoundException => return None }
    val buf = new Array[Byte](st.getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    val lines = new String(buf, StandardCharsets.UTF_8).split('\n').filter(_.nonEmpty)
    require(lines.nonEmpty && lines(0) == Header, s"fls: corrupt manifest at $p")
    Some(lines.drop(1).toSeq.map { l =>
      val a = l.split('\t')
      require(a.length == 3, s"fls: corrupt manifest line '$l' in $p")
      Entry(a(2), a(0).toLong, a(1).toLong)
    })
  }

  /** Write the manifest atomically: stage under `_temporary/<writeId>`
    * and rename into place with OVERWRITE semantics (FileContext.rename
    * is a single atomic replace on local/HDFS — no delete-then-rename
    * window in which readers see no manifest and fall back to listing a
    * mid-commit directory; a crash can never leave the table
    * manifest-less). Stores without FileContext support fall back to
    * delete+rename, accepting that window. */
  def write(fs: FileSystem, dir: Path, writeId: String,
      entries: Seq[Entry], conf: org.apache.hadoop.conf.Configuration): Unit = {
    val tmp = new Path(new Path(new Path(dir, "_temporary"), writeId), FileName)
    val out = fs.create(tmp, true)
    try {
      val sb = new StringBuilder(Header).append('\n')
      entries.sortBy(_.rel).foreach { e =>
        require(!e.rel.contains('\n') && !e.rel.contains('\t'),
          s"fls: unsupported character in file name '${e.rel}'")
        sb.append(e.length).append('\t').append(e.mtime).append('\t').append(e.rel).append('\n')
      }
      out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
    val dst = fs.makeQualified(manifestPath(dir))
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
      fc.rename(fs.makeQualified(tmp), dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: UnsupportedFileSystemException =>
        if (fs.exists(dst)) fs.delete(dst, false)
        if (!fs.rename(tmp, dst))
          throw new java.io.IOException(s"fls commit: rename $tmp -> $dst failed")
    }
  }

  /** The FileStatus view of the manifest — what listing would have
    * produced, without any listStatus RPC. */
  def statuses(fs: FileSystem, dir: Path, entries: Seq[Entry]): Seq[FileStatus] = {
    val qualified = fs.makeQualified(dir)
    entries.map { e =>
      new FileStatus(e.length, false, 1, 128L * 1024 * 1024, e.mtime,
        new Path(qualified, e.rel))
    }
  }

  def delete(fs: FileSystem, dir: Path): Unit = {
    try fs.delete(manifestPath(dir), false) catch { case _: Throwable => () }
  }
}
