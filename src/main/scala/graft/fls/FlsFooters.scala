package graft.fls

import java.util.concurrent.{Callable, ConcurrentHashMap, Executors}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.fls.Format._

/** Driver-side footer planning: parallel footer reads + a per-session
  * cache keyed by (path, mtime, length).
  *
  * The reference opens footers one by one at bind time
  * (/root/reference/src/reader/fls_multi_file_info.cpp:99-110) — fine in
  * a single process over local disk, but on a cluster-scale table (tens
  * of thousands of files on object storage) serial driver IO at every
  * scan would dominate planning. So: uncached footers are fetched on a
  * bounded thread pool (the same trick Spark's parquet footer reader
  * uses), and results are reused across scans of the same table within
  * the session; a rewritten file invalidates itself via mtime/length. */
object FlsFooters {

  final case class Entry(file: Path, table: TableDesc, fileSize: Long)

  private final case class Cached(mtime: Long, len: Long, table: TableDesc)
  private val cache = new ConcurrentHashMap[String, Cached]()
  private val MaxEntries = 100000
  private val IoThreads = 16

  /** All .fls footers under `paths`, in deterministic (path-order,
    * name-sorted) order — the order planInputPartitions depends on. */
  def list(paths: Seq[String], conf: Configuration): Seq[Entry] = {
    val seen = scala.collection.mutable.LinkedHashMap[String, org.apache.hadoop.fs.FileStatus]()
    paths.foreach { p =>
      FlsFile.listDataStatuses(new Path(p), conf).foreach { st =>
        seen.getOrElseUpdate(st.getPath.toString, st)
      }
    }
    val statuses = seen.values.toSeq
    val need = statuses.filter { st =>
      val c = cache.get(st.getPath.toString)
      c == null || c.mtime != st.getModificationTime || c.len != st.getLen
    }
    if (need.nonEmpty) {
      if (cache.size() > MaxEntries) cache.clear()
      val pool = Executors.newFixedThreadPool(math.min(need.length, IoThreads))
      try {
        need.map { st =>
          pool.submit(new Callable[Unit] {
            override def call(): Unit = {
              val r = new FlsFileReader(st.getPath, conf)
              val t = try r.table finally r.close()
              cache.put(st.getPath.toString,
                Cached(st.getModificationTime, st.getLen, t))
            }
          })
        }.foreach(_.get())
      } finally pool.shutdown()
    }
    statuses.map { st =>
      // re-validate instead of assuming our puts survived: a concurrent
      // list() may have purged the cache (MaxEntries) or clear() ran —
      // fall back to a direct footer read rather than NPE mid-planning
      val c = cache.get(st.getPath.toString)
      val table =
        if (c != null && c.mtime == st.getModificationTime && c.len == st.getLen) c.table
        else {
          val r = new FlsFileReader(st.getPath, conf)
          try r.table finally r.close()
        }
      Entry(st.getPath, table, st.getLen)
    }
  }

  /** Test hook: observe/clear cache state. */
  def cachedCount: Int = cache.size()
  def clear(): Unit = cache.clear()
}
