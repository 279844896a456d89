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

/** `SELECT * FROM <catalog>.<ns>.<table>.history` — one row per
  * RETAINED manifest version of an fls table, the index time travel
  * resolves against (`VERSION AS OF` any listed `version`,
  * `TIMESTAMP AS OF` any instant at or after the oldest
  * `committed_at`). Modeled on the Iceberg/Delta history tables; the
  * reference has no multi-version story at all (single-process writer,
  * /root/reference/src/writer/fls_writer.cpp:332-347).
  *
  * Served as a [[LocalScan]]: the whole result is O(retained versions)
  * rows built from one tiny-directory listing plus that many small
  * manifest reads — driver-side BY DESIGN; shipping executors to read
  * eight ~KB files would cost more than the answer. `n_rows` is null
  * unless every entry of that version carries manifest stats (legacy
  * entries predate them). */
class FlsHistoryTable(tableName: String, dir: Path, conf: Configuration)
  extends Table with SupportsRead {

  override def name(): String = s"$tableName.history"
  override def schema(): StructType = FlsHistoryTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = FlsHistoryTable.Schema
        override def rows(): Array[InternalRow] = {
          val fs = dir.getFileSystem(conf)
          FlsManifest.versionsWithTimes(fs, dir).map { case (v, millis) =>
            val entries =
              try FlsManifest.readVersion(fs, dir, v)
              catch { case _: java.io.FileNotFoundException => Nil } // GC race
            val meta =
              try FlsManifest.versionMeta(fs, dir, v)
              catch { case _: java.io.FileNotFoundException => None }
            val op: Any = meta.map(m => UTF8String.fromString(m.op)).orNull
            val schemaV: Any = meta.flatMap(_.schemaVersion)
              .map(Long.box).orNull
            val rowCounts = entries.map(e =>
              Option(e.stats).flatMap(FlsFileStats.toDesc).map(_.numRows))
            val nRows: Any =
              if (rowCounts.nonEmpty && rowCounts.forall(_.isDefined))
                rowCounts.map(_.get).sum
              else null
            new GenericInternalRow(Array[Any](
              v, millis * 1000L, op, schemaV, entries.length.toLong,
              entries.map(_.length).sum, nRows))
          }.reverse.toArray // newest first, like DESCRIBE HISTORY
        }
        override def description(): String = s"FlsHistory ${dir}"
      }
    }
}

object FlsHistoryTable {
  val Schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    /** Commit kind from the manifest's #op tag (append / overwrite /
      * delete / update / merge / compact / upgrade / rollback); null
      * for versions written before op tags existed. */
    StructField("operation", StringType, nullable = true),
    /** The table-metadata (schema) version this commit was stamped
      * with (#schema header) — which schema epoch `VERSION AS OF`
      * serves this version through; null for pre-stamp versions and
      * path tables (no metadata log). */
    StructField("schema_version", LongType, nullable = true),
    StructField("n_files", LongType, nullable = false),
    StructField("total_bytes", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = true)))
}
