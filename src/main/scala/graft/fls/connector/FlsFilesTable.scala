package graft.fls.connector

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.fls.{FlsFileStats, FlsManifest}

/** `SELECT * FROM <catalog>.<ns>.<table>.files` — one row per LIVE data
  * file of the newest manifest version: the operational questions a
  * DV-era table raises ("which files carry delete vectors?", "how big
  * are my partitions?", "what did the last compaction leave behind?")
  * answered from SQL. Modeled on Iceberg's `.files` metadata table;
  * sibling of [[FlsHistoryTable]].
  *
  * Served as a [[LocalScan]] like `.history`: the manifest already
  * carries every column here (rel, length, stats JSON), so the result
  * is O(live files) driver-side rows from ONE manifest read — no
  * executor jobs, no footer opens. At a million files that is a ~100 MB
  * driver materialization, the same order as planning the table at all;
  * tables beyond that operate partition-subsetted anyway.
  *
  * `n_rows` is null for entries predating manifest stats. `partition`
  * is the hive-style subdirectory of the file (null for flat tables) —
  * `GROUP BY partition` is the partition-size report. `version_added`
  * is the earliest RETAINED version naming the file (files older than
  * the retention window report the oldest retained version that still
  * vouches them — manifests before it are GC'd). */
class FlsFilesTable(tableName: String, dir: Path, conf: Configuration)
  extends Table with SupportsRead {

  override def name(): String = s"$tableName.files"
  override def schema(): StructType = FlsFilesTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
      import org.apache.spark.sql.sources.Filter

      private var pruning: Array[Filter] = Array.empty

      /** Partition/file-name predicates prune entries BEFORE the rows
        * (with their stats parse and version back-tracking) materialize
        * on the driver — the one LocalScan that grows with table size
        * stays filter-sized. Conservative: only provably-false entries
        * drop, and EVERY filter is returned as residual so Spark
        * re-evaluates exactly (three-valued semantics included). */
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pruning = filters
        filters // all residual — pruning here is best-effort only
      }
      override def pushedFilters(): Array[Filter] = Array.empty

      /** Rel range the pushed `file` predicates bound, if any — a
        * point lookup (`WHERE file = '...'` / IN / prefix) then opens
        * only the manifest chunks intersecting it
        * ([[FlsManifest.readVersionedSubset]]), instead of resolving a
        * million entries to serve one row. Conservative: unsupported
        * shapes yield None (full read, exact as before). */
      private def relBounds: Option[(String, String)] = {
        import org.apache.spark.sql.sources._
        def boundsOf(f: Filter): Option[(String, String)] = f match {
          case EqualTo("file", v: String) => Some((v, v))
          case In("file", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
            val ss = vs.map(_.asInstanceOf[String])
            Some((ss.min, ss.max))
          case StringStartsWith("file", p) if p.nonEmpty =>
            Some((p, p + "￿"))
          case And(l, r) => (boundsOf(l), boundsOf(r)) match {
            case (Some((a, b)), Some((c, d))) =>
              Some((if (a > c) a else c, if (b < d) b else d))
            case (one, other) => one.orElse(other)
          }
          case _ => None
        }
        // ONE conjunct bounding the range suffices (others re-check)
        pruning.flatMap(boundsOf(_)).headOption
      }

      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = FlsFilesTable.Schema
        override def rows(): Array[InternalRow] = {
          val fs = dir.getFileSystem(conf)
          relBounds match {
            case Some((lo, hi)) =>
              FlsManifest.readVersionedSubset(fs, dir, lo, hi) match {
                case None => Array.empty
                case Some((headV, entries)) =>
                  build(headV, entries, Some((lo, hi)))
              }
            case None =>
              FlsManifest.readVersioned(fs, dir) match {
                case None => Array.empty
                case Some((headV, entries)) => build(headV, entries, None)
              }
          }
        }
        private def build(headV: Long, entries: Seq[FlsManifest.Entry],
            bounds: Option[(String, String)]): Array[InternalRow] = {
          val fs = dir.getFileSystem(conf)
          val kept = entries.filter(e =>
            pruning.forall(f => FlsFilesTable.mayMatch(f, e.rel)))
          FlsFilesTable.lastMaterialized.set(kept.length.toLong)
          // earliest retained version naming each SURVIVING rel —
          // O(retained versions) small manifest reads (chunk-bounded
          // under a point lookup), oldest first so the first sighting
          // wins; only survivors are tracked
          val keptRels = kept.map(_.rel).toSet
          val firstSeen = scala.collection.mutable.HashMap[String, Long]()
          FlsManifest.versionsWithTimes(fs, dir).foreach { case (v, _) =>
            val es =
              if (v == headV) entries
              else try bounds match {
                case Some((lo, hi)) =>
                  FlsManifest.readVersionSubset(fs, dir, v, lo, hi)
                case None => FlsManifest.readVersion(fs, dir, v)
              }
              catch { case _: java.io.FileNotFoundException => Nil } // GC race
            es.foreach(e =>
              if (keptRels.contains(e.rel)) firstSeen.getOrElseUpdate(e.rel, v))
          }
          kept.sortBy(_.rel).map { e =>
            val dv = FlsFileStats.dvOf(e.stats)
            val nRows: Any = Option(e.stats).flatMap(FlsFileStats.toDesc)
              .map(_.numRows).orNull
            val slash = e.rel.lastIndexOf('/')
            val partition: Any =
              if (slash < 0) null else UTF8String.fromString(e.rel.substring(0, slash))
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(e.rel), e.length, nRows, partition,
              dv.isDefined, dv.map(UTF8String.fromString).orNull,
              firstSeen.getOrElse(e.rel, headV)))
          }.toArray
        }
        override def description(): String =
          s"FlsFiles ${dir}" + (if (pruning.isEmpty) ""
            else s", pruning=[${pruning.mkString(", ")}]")
      }
    }
}

object FlsFilesTable {
  /** Test/observability hook: rows materialized by the last `.files`
    * scan (post-pruning). */
  val lastMaterialized = new java.util.concurrent.atomic.AtomicLong(-1L)

  /** Can entry `rel` possibly satisfy `f`? Decides only the
    * string-typed `partition` (the file's parent subdirectory; null
    * for root files) and `file` columns; anything else keeps the
    * entry. False ONLY on provable exclusion — Spark re-applies every
    * filter on the served rows, so this is pruning, not evaluation. */
  private[connector] def mayMatch(f: org.apache.spark.sql.sources.Filter,
      rel: String): Boolean = {
    import org.apache.spark.sql.sources._
    val slash = rel.lastIndexOf('/')
    val partition: String = if (slash < 0) null else rel.substring(0, slash)
    def str(v: Any): Option[String] = v match {
      case s: String => Some(s)
      case s: UTF8String => Some(s.toString)
      case _ => None
    }
    f match {
      case And(l, r) => mayMatch(l, rel) && mayMatch(r, rel)
      case Or(l, r) => mayMatch(l, rel) || mayMatch(r, rel)
      case EqualTo("partition", v) =>
        str(v).forall(s => partition != null && partition == s)
      case EqualTo("file", v) => str(v).forall(_ == rel)
      case In("partition", vs) =>
        partition != null && vs.flatMap(str(_)).contains(partition)
      case In("file", vs) => vs.flatMap(str(_)).contains(rel)
      case StringStartsWith("partition", p) =>
        partition != null && partition.startsWith(p)
      case StringStartsWith("file", p) => rel.startsWith(p)
      case IsNull("partition") => partition == null
      case IsNotNull("partition") => partition != null
      case _ => true // undecidable here — Spark's residual decides
    }
  }

  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = true),
    StructField("partition", StringType, nullable = true),
    StructField("has_dv", BooleanType, nullable = false),
    StructField("dv_file", StringType, nullable = true),
    StructField("version_added", LongType, nullable = false)))
}
