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
    else Array("compact", "vacuum", "rollback", "evolve_partition_spec",
      "create_branch", "drop_branch", "create_tag", "drop_tag",
      "fast_forward", "absorb_deletes").map(Identifier.of(Namespace, _))

  def load(ident: Identifier, resolveDir: Seq[String] => Path,
      session: SparkSession): UnboundProcedure = {
    require(ident.namespace.sameElements(Namespace),
      s"fls: unknown procedure namespace ${ident.namespace.mkString(".")} — " +
        "maintenance procedures live under `system`")
    ident.name match {
      case "compact" => new CompactProcedure(resolveDir, session)
      case "vacuum" => new VacuumProcedure(resolveDir, session)
      case "rollback" => new RollbackProcedure(resolveDir, session)
      case "evolve_partition_spec" =>
        new EvolvePartitionSpecProcedure(resolveDir, session)
      case "absorb_deletes" => new AbsorbDeletesProcedure(resolveDir, session)
      case "create_branch" | "drop_branch" | "create_tag" | "drop_tag" |
           "fast_forward" =>
        new RefProcedure(ident.name, resolveDir, session)
      case other => throw new IllegalArgumentException(
        s"fls: unknown procedure system.$other — have: compact, vacuum, " +
          "rollback, evolve_partition_spec, create_branch, drop_branch, " +
          "create_tag, drop_tag, fast_forward, absorb_deletes")
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

  /** `system.absorb_deletes(table, target_rows_per_file)` —
    * [[FlsMaintenance.absorbDeletes]]: rewrite ONLY the files the
    * active equality-delete predicates apply to (birth version <= the
    * newest predicate's), drop the absorbed predicates, re-arm the
    * metadata shortcuts. O(subject files), never O(table) — the
    * targeted alternative to a full compact after a GDPR delete. */
  final class AbsorbDeletesProcedure(resolveDir: Seq[String] => Path,
      session: SparkSession) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "absorb_deletes"
    override def description(): String =
      "Rewrite only the files subject to active equality-delete " +
        "predicates, then drop the predicates"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name relative to the catalog, e.g. 'db.events'").build(),
      ProcedureParameter.in("target_rows_per_file", LongType)
        .defaultValue(s"CAST(${graft.fls.Format.DefaultRowGroupSize.toLong * 16} AS BIGINT)")
        .build())

    private val schema = StructType(Seq(
      StructField("predicates_absorbed", IntegerType, nullable = false),
      StructField("files_rewritten", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false),
      StructField("rows", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(resolveDir, str(input, 0))
      val stats = graft.fls.FlsMaintenance.absorbDeletes(session,
        dir.toString, targetRowsPerFile = input.getLong(1))
      single(resultScan(schema, new GenericInternalRow(
        Array[Any](stats.predicates, stats.subjectFiles, stats.filesAfter,
          stats.rows))))
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

  /** `system.evolve_partition_spec(table, partition_by)` — change how
    * FUTURE writes are partitioned, without touching a byte of data
    * (Iceberg's partition-spec evolution, re-expressed on hive-style
    * paths): an O(1) metadata commit sets the new spec; files already
    * on disk keep serving under the layout their paths encode, new
    * files land under the new one, and the scan unions the per-file
    * layouts ([[FlsPartitioning]] heterogeneous discovery — a column
    * reads from the file's path where the path carries it, from the
    * file's data otherwise). Pruning stays correct on BOTH
    * generations: path values prune files of their own spec, zone
    * maps/manifest stats prune the other generation where the key is a
    * data column. A full physical re-layout remains available as
    * `system.compact` after the evolution. Refused: unknown/nested
    * columns, evolving to flat (old files' path columns would vanish),
    * and tables without a metadata log. */
  final class EvolvePartitionSpecProcedure(resolveDir: Seq[String] => Path,
      session: SparkSession) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "evolve_partition_spec"
    override def description(): String =
      "Change the partition spec for future writes (metadata-only; " +
        "existing files keep serving under their own layout)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name relative to the catalog, e.g. 'db.events'").build(),
      ProcedureParameter.in("partition_by", StringType)
        .comment("comma-separated new partition columns").build())

    private val schema = StructType(Seq(
      StructField("previous_spec", StringType, nullable = false),
      StructField("new_spec", StringType, nullable = false),
      StructField("meta_version", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(resolveDir, str(input, 0))
      val newKeys = Option(str(input, 1)).getOrElse("")
        .split(',').map(_.trim).filter(_.nonEmpty).toSeq
      require(newKeys.nonEmpty,
        "fls evolve_partition_spec: the new spec must name at least one " +
          "column — evolving to FLAT would orphan the old generations' " +
          "path-stored values (rewrite with system.compact instead)")
      val conf = session.sessionState.newHadoopConf()
      val fs = dir.getFileSystem(conf)
      require(graft.fls.FlsTableMeta.read(fs, dir).isDefined,
        s"fls evolve_partition_spec: $dir has no table metadata log — " +
          "spec evolution needs a catalog table (the spec lives in " +
          "table metadata)")
      var prevSpec: Seq[String] = Nil
      val v = graft.fls.FlsTableMeta.commit(fs, dir,
          java.util.UUID.randomUUID().toString, conf) { cur =>
        val m = cur.getOrElse(throw new IllegalStateException(
          s"fls evolve_partition_spec: table metadata at $dir vanished"))
        prevSpec = m.partitionBy
        require(newKeys != m.partitionBy,
          s"fls evolve_partition_spec: the table is already partitioned " +
            s"by [${newKeys.mkString(",")}]")
        newKeys.foreach { k =>
          val f = m.schema.fields.find(_.name == k).getOrElse(
            throw new IllegalArgumentException(
              s"fls evolve_partition_spec: '$k' is not a column of the " +
                s"table [${m.schema.fieldNames.mkString(", ")}]"))
          // same legality as CREATE ... PARTITIONED BY: path-storable
          // scalar types only (FlsPartitioning.pathString's domain)
          require(Set[org.apache.spark.sql.types.DataType](IntegerType,
            LongType, ShortType, ByteType, DateType, StringType, BooleanType)
            .contains(f.dataType),
            s"fls evolve_partition_spec: cannot partition by '$k' of type " +
              s"${f.dataType.simpleString}")
        }
        require(newKeys.length < m.schema.fields.length,
          "fls evolve_partition_spec: cannot partition by every column")
        m.copy(partitionBy = newKeys,
          properties = m.properties + ("spec_evolved" -> "true"))
      }
      single(resultScan(schema, new GenericInternalRow(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(prevSpec.mkString(",")),
        org.apache.spark.unsafe.types.UTF8String.fromString(newKeys.mkString(",")),
        v))))
    }
  }

  /** Named refs on the manifest log (write-audit-publish,
    * [[graft.fls.FlsManifest.createBranch]]):
    * `create_branch(table, name)` forks the main head into a sibling
    * lineage — writes with `.option("branch", name)` commit there,
    * invisible to main readers; `fast_forward(table, name)` publishes
    * the audited branch head as a new main version (refusing loudly if
    * main advanced past the fork); `create_tag(table, name[, version])`
    * pins a main version against log GC so `VERSION AS OF '<tag>'`
    * outlives the retention window; `drop_branch`/`drop_tag` release
    * them (vacuum then reclaims unpublished branch files). All are O(1)
    * metadata operations. */
  final class RefProcedure(op: String, resolveDir: Seq[String] => Path,
      session: SparkSession) extends UnboundProcedure with BoundProcedure {
    override def name(): String = op
    override def description(): String = op match {
      case "create_branch" => "Fork the main head into a named branch lineage"
      case "drop_branch" => "Delete a branch lineage (unpublished files fall to vacuum)"
      case "create_tag" => "Pin a main version under an immutable name (GC-exempt)"
      case "drop_tag" => "Release a tag (the version rejoins normal retention)"
      case _ => "Publish a branch head as the new main version"
    }
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = {
      val base = Array(
        ProcedureParameter.in("table", StringType)
          .comment("table name relative to the catalog, e.g. 'db.events'").build(),
        ProcedureParameter.in("name", StringType)
          .comment("ref name ([A-Za-z0-9_-]+)").build())
      if (op == "create_tag")
        base :+ ProcedureParameter.in("version", LongType)
          .defaultValue("CAST(-1 AS BIGINT)")
          .comment("main version to pin (default: head)").build()
      else base
    }

    private val schema = StructType(Seq(
      StructField("ref", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dir = tableDir(resolveDir, str(input, 0))
      val refName = str(input, 1)
      val conf = session.sessionState.newHadoopConf()
      val fs = dir.getFileSystem(conf)
      val v: Long = op match {
        case "create_branch" => graft.fls.FlsManifest.createBranch(fs, dir, refName, conf)
        case "drop_branch" => graft.fls.FlsManifest.dropBranch(fs, dir, refName); -1L
        case "create_tag" =>
          val req = input.getLong(2)
          graft.fls.FlsManifest.createTag(fs, dir, refName,
            if (req < 0) None else Some(req), conf)
        case "drop_tag" => graft.fls.FlsManifest.dropTag(fs, dir, refName); -1L
        case _ => graft.fls.FlsManifest.fastForward(fs, dir, refName, conf)._2
      }
      single(resultScan(schema, new GenericInternalRow(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(refName), v))))
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
