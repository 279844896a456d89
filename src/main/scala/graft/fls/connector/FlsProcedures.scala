package graft.fls.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

import graft.fls.FlsMaintenance

/** SQL maintenance surface: `CALL <catalog>.system.compact(...)` /
  * `CALL <catalog>.system.vacuum(...)` via Spark 4's DSv2 procedure
  * catalog — the last maintenance operations that still required Scala.
  * A pure-SQL operator can now run the whole table lifecycle: DDL,
  * DML, time travel, compaction, vacuum.
  *
  * {{{
  *   CALL fls.system.compact(`table` => 'db.events',
  *                           zorder_by => 'ts,user_id')
  *   CALL fls.system.vacuum(`table` => 'db.events', older_than_hours => 0)
  * }}}
  *
  * Each returns its stats as a one-row result (LocalScan — the stats
  * are already on the driver; the heavy lifting inside ran as normal
  * distributed Spark jobs). The reference has no maintenance surface
  * at all (write-once files, single-process writer —
  * /root/reference/src/writer/fls_writer.cpp). */
object FlsProcedures {

  val Namespace: Array[String] = Array("system")

  def list(namespace: Array[String]): Array[Identifier] =
    if (!namespace.sameElements(Namespace)) Array.empty
    else Array("compact", "vacuum", "rollback").map(Identifier.of(Namespace, _))

  def load(ident: Identifier, resolveDir: Seq[String] => Path,
      session: SparkSession): UnboundProcedure = {
    require(ident.namespace.sameElements(Namespace),
      s"fls: unknown procedure namespace ${ident.namespace.mkString(".")} — " +
        "maintenance procedures live under `system`")
    ident.name match {
      case "compact" => new CompactProcedure(resolveDir, session)
      case "vacuum" => new VacuumProcedure(resolveDir, session)
      case "rollback" => new RollbackProcedure(resolveDir, session)
      case other => throw new IllegalArgumentException(
        s"fls: unknown procedure system.$other — have: compact, vacuum, rollback")
    }
  }

  private def str(input: InternalRow, i: Int): String =
    if (input.isNullAt(i)) null else input.getUTF8String(i).toString

  private def tableDir(resolveDir: Seq[String] => Path, table: String): Path = {
    require(table != null && table.nonEmpty,
      "fls procedure: `table` is required (e.g. 'db.events')")
    resolveDir(table.split('.').toSeq)
  }

  private def resultScan(schema: StructType, row: InternalRow): Scan =
    new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(row)
    }

  private def single(s: Scan): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(s).iterator()

  /** `system.compact(table, target_rows_per_file, sort_by, zorder_by)`
    * — [[FlsMaintenance.compact]]: many small files → few
    * `target_rows_per_file`-row files; `sort_by` range-clusters on one
    * axis, `zorder_by` interleaves several (comma-separated columns) so
    * zone maps prune on each. */
  final class CompactProcedure(resolveDir: Seq[String] => Path,
      session: SparkSession) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "Rewrite an fls table into few large files, optionally clustered " +
        "(sort_by) or Z-ordered (zorder_by) for zone-map pruning"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name relative to the catalog, e.g. 'db.events'").build(),
      ProcedureParameter.in("target_rows_per_file", LongType)
        .defaultValue(s"CAST(${graft.fls.Format.DefaultRowGroupSize.toLong * 16} AS BIGINT)")
        .build(),
      ProcedureParameter.in("sort_by", StringType).defaultValue("''")
        .comment("comma-separated clustering columns").build(),
      ProcedureParameter.in("zorder_by", StringType).defaultValue("''")
        .comment("comma-separated Z-order columns").build())

    private val schema = StructType(Seq(
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false),
      StructField("rows", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(resolveDir, str(input, 0))
      val target = input.getLong(1)
      def cols(i: Int): Seq[String] = Option(str(input, i)).getOrElse("")
        .split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val stats = FlsMaintenance.compact(session, dir.toString,
        targetRowsPerFile = target, sortBy = cols(2), zorderBy = cols(3))
      single(resultScan(schema, new GenericInternalRow(
        Array[Any](stats.filesBefore, stats.filesAfter, stats.rows))))
    }
  }

  /** `system.vacuum(table, older_than_hours)` —
    * [[FlsMaintenance.vacuum]]: reclaim files no RETAINED manifest
    * version names (replaced by DML/compaction AND aged past the
    * version-retention window) plus expired staging junk. Time-travel
    * safe at any horizon. */
  final class VacuumProcedure(resolveDir: Seq[String] => Path,
      session: SparkSession) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "Reclaim files no retained manifest version references"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name relative to the catalog, e.g. 'db.events'").build(),
      ProcedureParameter.in("older_than_hours", LongType)
        .defaultValue("CAST(24 AS BIGINT)").build())

    private val schema = StructType(Seq(
      StructField("deleted_files", IntegerType, nullable = false),
      StructField("reclaimed_bytes", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(resolveDir, str(input, 0))
      val stats = FlsMaintenance.vacuum(session, dir.toString,
        olderThanHours = input.getLong(1))
      single(resultScan(schema, new GenericInternalRow(
        Array[Any](stats.deleted, stats.bytes))))
    }
  }

  /** `system.rollback(table, version)` — [[FlsMaintenance.rollback]]:
    * restore the head to a retained version's entry set as a NEW
    * version (history preserved, metadata-only, no data moves). The
    * bad-commit recovery that previously required manual pinned reads
    * plus a rewrite. */
  final class RollbackProcedure(resolveDir: Seq[String] => Path,
      session: SparkSession) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "rollback"
    override def description(): String =
      "Restore the table head to a retained manifest version (published " +
        "as a new version; metadata-only)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name relative to the catalog, e.g. 'db.events'").build(),
      ProcedureParameter.in("version", LongType)
        .comment("retained manifest version to restore").build())

    private val schema = StructType(Seq(
      StructField("previous_version", LongType, nullable = false),
      StructField("restored_version", LongType, nullable = false),
      StructField("new_version", LongType, nullable = false),
      StructField("files", IntegerType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(resolveDir, str(input, 0))
      val stats = FlsMaintenance.rollback(session, dir.toString, input.getLong(1))
      single(resultScan(schema, new GenericInternalRow(
        Array[Any](stats.fromVersion, stats.restoredVersion,
          stats.newVersion, stats.files))))
    }
  }
}
