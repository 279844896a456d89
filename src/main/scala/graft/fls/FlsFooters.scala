package graft.fls

import java.util.concurrent.{Callable, Executors}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.fls.Format._

/** Driver-side footer planning: parallel footer reads + a per-session
  * LRU cache keyed by (path, mtime, length).
  *
  * The reference opens footers one by one at bind time
  * (/root/reference/src/reader/fls_multi_file_info.cpp:99-110) — fine in
  * a single process over local disk, but on a cluster-scale table (tens
  * of thousands of files on object storage) serial driver IO at every
  * scan would dominate planning. So: uncached footers are fetched on a
  * bounded thread pool (the same trick Spark's parquet footer reader
  * uses), and results are reused across scans of the same table within
  * the session; a rewritten file invalidates itself via mtime/length.
  *
  * Eviction is access-ordered LRU: overflowing `MaxEntries` drops only
  * the coldest entries, so the hot table's footers survive — a clear-all
  * evict would re-read every footer on the next planning pass exactly
  * when the table count is largest (thundering herd).
  *
  * Caveat (documented, not defended): the (mtime, length) key cannot see
  * an in-place overwrite that preserves length within the store's mtime
  * granularity. Connector-managed writes always create unique
  * writeId-derived names, so this only affects externally rewritten
  * files; for those tables set the JVM property
  * `graft.fls.footerCache=false` to bypass the cache entirely. */
object FlsFooters {

  /** `dv`: ABSOLUTE path of the file's current delete-vector sidecar
    * (None = no deletes) — resolved from the manifest metadata at
    * planning so executors can open it directly
    * ([[FlsDeleteVectors]]).
    * `ndv`: per-column HLL registers from the manifest stats ([[Hll]],
    * empty = file predates sketches or its writer sketched nothing) —
    * merged at plan time into CBO distinct counts. */
  final case class Entry(file: Path, table: TableDesc, fileSize: Long,
      dv: Option[String] = None, ndv: Map[String, Array[Byte]] = Map.empty,
      /** Applicable equality-delete predicates ([[FlsEqDeletes]] JSON,
        * planning-injected at listing) — applied at decode like the DV;
        * their presence disables value-producing metadata shortcuts. */
      eq: Seq[String] = Nil)

  private final case class Cached(mtime: Long, len: Long, table: TableDesc)

  /** Test hook: eviction bound (access-ordered LRU above this size). */
  private[fls] var MaxEntries = 100000
  private val IoThreads = 16

  private val cache: java.util.Map[String, Cached] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Cached](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Cached]): Boolean = size() > MaxEntries
      })

  private def cacheEnabled: Boolean =
    !sys.props.get("graft.fls.footerCache").contains("false")

  /** All .fls footers under `paths`, in deterministic (path-order,
    * name-sorted) order — the order planInputPartitions depends on.
    * `pinnedManifestVersion` plans from exactly that manifest version
    * (see [[FlsFile.listDataStatuses]]). */
  def list(paths: Seq[String], conf: Configuration,
      pinnedManifestVersion: Option[Long] = None,
      ref: String = FlsManifest.MainRef): Seq[Entry] =
    fetchMeta(listStatuses(paths, conf, pinnedManifestVersion, ref), conf)

  /** [[fetch]] plus per-file manifest metadata: resolves each entry's
    * delete-vector pointer (rel in the metadata JSON → absolute next to
    * the data file) so the scan can apply it at decode. */
  def fetchMeta(listed: Seq[(org.apache.hadoop.fs.FileStatus, Option[String])],
      conf: Configuration): Seq[Entry] =
    fetch(listed.map(_._1), conf).zip(listed).map { case (e, (st, meta)) =>
      val (dv, ndv, eq) = meta.map(FlsFileStats.metaOf)
        .getOrElse((None, Map.empty[String, Array[Byte]], Nil))
      val withDv = dv match {
        case Some(rel) =>
          e.copy(dv = Some(new Path(st.getPath.getParent, rel).toString))
        case None => e
      }
      val withNdv = if (ndv.nonEmpty) withDv.copy(ndv = ndv) else withDv
      if (eq.nonEmpty) withNdv.copy(eq = eq) else withNdv
    }

  /** Phase 1 of planning — the file LIST with manifest-carried stats,
    * NO footer IO. Callers prune this (partition values from paths,
    * file-level min/max from stats — [[FlsFileStats]]) and [[fetch]]
    * footers only for survivors: on a cold driver over a large filtered
    * table this is the difference between O(files) and O(survivors)
    * footer reads. */
  def listStatuses(paths: Seq[String], conf: Configuration,
      pinnedManifestVersion: Option[Long] = None,
      ref: String = FlsManifest.MainRef,
      /** Point-lookup rel range — segmented manifests skip chunks
        * outside it ([[FlsManifest.readVersionedSubset]] semantics:
        * the listing is then a SUPERSET of in-range files, a subset
        * of the table; pass only when the caller filters to an
        * explicit file set afterwards). */
      relBounds: Option[(String, String)] = None)
    : Seq[(org.apache.hadoop.fs.FileStatus, Option[String])] = {
    val seen = scala.collection.mutable.LinkedHashMap[
      String, (org.apache.hadoop.fs.FileStatus, Option[String])]()
    paths.foreach { p =>
      FlsFile.listDataWithStats(new Path(p), conf, pinnedManifestVersion,
          ref, relBounds).foreach { e =>
        seen.getOrElseUpdate(e._1.getPath.toString, e)
      }
    }
    seen.values.toSeq
  }

  /** Phase 2 — footer reads (parallel, session-cached) for exactly the
    * given files. */
  def fetch(statuses: Seq[org.apache.hadoop.fs.FileStatus],
      conf: Configuration): Seq[Entry] = {
    val useCache = cacheEnabled
    val need = statuses.filter { st =>
      val c = if (useCache) cache.get(st.getPath.toString) else null
      c == null || c.mtime != st.getModificationTime || c.len != st.getLen
    }
    val fetched = new java.util.concurrent.ConcurrentHashMap[String, TableDesc]()
    if (need.nonEmpty) {
      footerReads.addAndGet(need.length)
      val pool = Executors.newFixedThreadPool(math.min(need.length, IoThreads))
      try {
        val futures = need.map { st =>
          pool.submit(new Callable[Unit] {
            override def call(): Unit = {
              val r = new FlsFileReader(st.getPath, conf)
              val t = try r.table finally r.close()
              fetched.put(st.getPath.toString, t)
              if (useCache)
                cache.put(st.getPath.toString,
                  Cached(st.getModificationTime, st.getLen, t))
            }
          })
        }
        // surface the ORIGINAL failure ("not an fls file", IO message),
        // not an opaque ExecutionException wrapper
        try futures.foreach(_.get())
        catch {
          case e: java.util.concurrent.ExecutionException if e.getCause != null =>
            throw e.getCause
        }
      } finally pool.shutdown()
    }
    statuses.map { st =>
      val key = st.getPath.toString
      val table = Option(fetched.get(key)).getOrElse {
        // not fetched this call: serve the cache, re-validated — or, if
        // LRU eviction raced it out between put and here, re-read rather
        // than NPE mid-planning
        val c = if (useCache) cache.get(key) else null
        if (c != null && c.mtime == st.getModificationTime && c.len == st.getLen) c.table
        else {
          val r = new FlsFileReader(st.getPath, conf)
          try r.table finally r.close()
        }
      }
      Entry(st.getPath, table, st.getLen)
    }
  }

  /** Observability + test hook: cumulative count of actual (uncached)
    * footer reads — the number manifest-stats pruning exists to shrink. */
  private val footerReads = new java.util.concurrent.atomic.AtomicLong(0)
  def footerReadCount: Long = footerReads.get()

  /** Test hook: observe/clear cache state. */
  def cachedCount: Int = cache.size()
  def clear(): Unit = cache.clear()
  private[fls] def cachedKeys: Set[String] = cache.synchronized {
    import scala.jdk.CollectionConverters._
    cache.keySet().asScala.toSet
  }
}
