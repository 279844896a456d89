package graft.util

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Version-stamped cache markers for the memoized gate tables.
  *
  * The correctness/bench gates memoize their fls copies of the parquet
  * testdata (and a few streaming fixtures) under `/tmp/graft_fls_cache_v4`
  * behind `_done` marker files. Those markers used to be EMPTY files, so
  * a codec or write-path change did not invalidate them and a gate could
  * silently run against bytes written by a previous code version
  * (VERDICT r18, "What's missing" #2). Markers now carry a fingerprint
  * of the compiled `graft.fls.**` (format, codecs, connector, DML) and
  * `graft.queries.**` (the gate build recipes) bytecode: any recompile
  * of either package changes the stamp, `valid` then wipes the stale
  * directory, and the caller's build path sees a cold cache.
  *
  * The fingerprint is computed from class BYTES on the classpath — not a
  * hand-bumped constant — so forgetting to bump a version can never
  * re-introduce the stale-cache hole.
  */
object CacheStamp {
  /** Bump only if the marker protocol itself changes shape. */
  private val protocol = "graft-cache-stamp-1"

  private val stampedPackages = Seq("graft/fls", "graft/queries")

  lazy val stamp: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(protocol.getBytes("UTF-8"))
    val cl = getClass.getClassLoader
    stampedPackages.foreach { pkg =>
      cl.getResources(pkg).asScala.toSeq.foreach { url =>
        url.getProtocol match {
          case "file" =>
            val base = Paths.get(url.toURI)
            val classes = Files.walk(base).iterator().asScala
              .filter(_.toString.endsWith(".class"))
              .map(p => base.relativize(p).toString.replace('\\', '/') -> p)
              .toSeq.sortBy(_._1)
            classes.foreach { case (rel, p) =>
              md.update(rel.getBytes("UTF-8"))
              md.update(Files.readAllBytes(p))
            }
          case "jar" =>
            val conn =
              url.openConnection().asInstanceOf[java.net.JarURLConnection]
            val jar = conn.getJarFile
            val names = jar.entries().asScala.map(_.getName)
              .filter(n => n.startsWith(pkg + "/") && n.endsWith(".class"))
              .toSeq.sorted
            names.foreach { n =>
              md.update(n.getBytes("UTF-8"))
              val in = jar.getInputStream(jar.getJarEntry(n))
              try md.update(in.readAllBytes()) finally in.close()
            }
          case _ => ()
        }
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** True iff the marker exists and was written by THIS code version.
    * A marker from any other version (including the pre-r19 empty
    * markers) means every byte in its parent directory is suspect, so
    * the directory is wiped before returning false — the caller's
    * build path then runs against a cold cache.
    *
    * Cross-PROCESS safety (ADVICE r19): the wipe/rebuild sequence is
    * serialized against other gate JVMs sharing the cache root via an
    * exclusive OS file lock kept OUTSIDE the wiped directory
    * (`<root>/<dir>.lock`). The fast path (marker already valid) takes
    * no lock; on a miss the lock is acquired BEFORE wiping — blocking
    * until any concurrent rebuild of the same fixture finishes — the
    * marker is re-checked (the peer may have just built it), and on a
    * confirmed miss the lock is HELD through the caller's build until
    * [[write]] releases it. Two same-version JVMs (e.g. Bench and
    * Verify launched together against a stale cache) therefore rebuild
    * once, sequentially, instead of wiping each other's half-built
    * fixtures. (Two DIFFERENT code versions sharing a root stay
    * unserializable at the read level — one's valid() is the other's
    * stale — and remain out of scope; gate runs are same-version.)
    * A build that dies before write() leaves the lock to be released
    * by JVM exit, so no deadlock outlives the crashed process. */
  def valid(marker: File): Boolean = {
    if (stampMatches(marker)) { release(marker); true }
    else {
      acquire(marker)
      if (stampMatches(marker)) { release(marker); true }
      else {
        rmrf(marker.getParentFile)
        false
      }
    }
  }

  /** Write the marker with the current stamp, via temp file + atomic
    * rename: a crash mid-write can never leave a marker whose content
    * accidentally equals a real stamp. Releases the cross-process
    * rebuild lock [[valid]] acquired on the miss path. */
  def write(marker: File): Unit = {
    val dir = marker.getParentFile
    if (dir != null) dir.mkdirs()
    val tmp = new File(dir, marker.getName + ".tmp")
    Files.write(tmp.toPath, stamp.getBytes("UTF-8"))
    Files.move(tmp.toPath, marker.toPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    release(marker)
  }

  private def stampMatches(marker: File): Boolean =
    marker.exists() && {
      (try new String(Files.readAllBytes(marker.toPath), "UTF-8")
       catch { case _: Exception => "" }) == stamp
    }

  /** One lock file per cached directory, OUTSIDE it so the wipe cannot
    * delete a held lock: `/tmp/cache_root/<dir>.lock` guards
    * `/tmp/cache_root/<dir>/`. In-JVM reentrancy is tracked in [[held]]
    * (callers already hold their per-object monitor, but valid() can
    * legitimately run again on the same marker after a failed build). */
  private val held = scala.collection.mutable.HashMap[
    String, (java.io.RandomAccessFile, java.nio.channels.FileLock)]()

  private def lockFile(marker: File): File = {
    val dir = marker.getParentFile
    val root = if (dir == null) null else dir.getParentFile
    if (dir == null) new File(marker.getName + ".lock")
    else if (root == null) new File(dir.getName + ".lock")
    else new File(root, dir.getName + ".lock")
  }

  private def acquire(marker: File): Unit = held.synchronized {
    val lf = lockFile(marker)
    val key = lf.getAbsolutePath
    if (!held.contains(key)) {
      if (lf.getParentFile != null) lf.getParentFile.mkdirs()
      val raf = new java.io.RandomAccessFile(lf, "rw")
      held(key) = (raf, raf.getChannel.lock())
    }
  }

  private def release(marker: File): Unit = held.synchronized {
    held.remove(lockFile(marker).getAbsolutePath).foreach { case (raf, l) =>
      try l.release() catch { case _: Exception => () }
      try raf.close() catch { case _: Exception => () }
    }
  }

  private def rmrf(f: File): Unit = {
    if (f == null) return
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rmrf)
    }
    f.delete()
  }
}
