package graft.fls.connector

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.fls.{FlsManifest, FlsTableMeta, Format}
import graft.fls.Format.ColumnType

/** Directory-backed [[TableCatalog]] for fls tables — the user surface
  * for the full table lifecycle including SCHEMA EVOLUTION, which the
  * reference engine lacks entirely (its schema is frozen at write,
  * /root/reference/src/writer/fls_writer.cpp; the closest analog is the
  * read-time promotion lattice at
  * /root/reference/src/reader/schema_builder.cpp:132-172, reused here as
  * the widening rule).
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.fls", classOf[FlsCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.fls.path", "/data/warehouse")
  *   spark.sql("CREATE TABLE fls.db.events (id BIGINT, v INT) USING fls")
  *   spark.sql("INSERT INTO fls.db.events SELECT ...")
  *   spark.sql("ALTER TABLE fls.db.events ADD COLUMN tag STRING")
  *   spark.sql("ALTER TABLE fls.db.events ALTER COLUMN v TYPE BIGINT")
  * }}}
  *
  * Layout: one directory per namespace under the warehouse root, one
  * directory per table under its namespace. Table metadata (declared
  * schema, partition columns, properties) lives in the table's own
  * versioned [[FlsTableMeta]] log, so EVERY metadata operation is an
  * O(1) CAS commit against that table — no central metastore, no lock
  * wider than one table, which is what lets 1000 concurrent writers on a
  * 100 TB warehouse alter disjoint tables without coordination.
  *
  * Evolution semantics (scan-side reconciliation is per file, by name —
  * the same machinery `union_by_name` reads use):
  *  - ADD COLUMN: appended, always nullable (old files have no values to
  *    serve — they read as NULL). Re-adding a previously dropped name is
  *    rejected: old files still store the dropped column's bytes, and a
  *    name-bound scan would resurrect them into the new column.
  *  - ALTER COLUMN TYPE: only WIDENINGS on the promotion lattice
  *    ([[Format.promote]] — e.g. INT→BIGINT, FLOAT→DOUBLE, decimal scale
  *    growth). Old files keep the narrow physical type; the reader
  *    widens at decode, zone maps compare in each file's own physical
  *    domain.
  *  - DROP COLUMN: metadata-only (the column vanishes from the declared
  *    schema; file bytes are reclaimed by the next compaction rewrite).
  *    The name is tombstoned in `fls.dropped` against re-adding.
  *  - RENAME COLUMN: metadata-only; the old name is recorded in the
  *    field's `fls.previous_names` metadata and the scan binds old files
  *    through it. */
class FlsCatalog extends TableCatalog with SupportsNamespaces
  with ProcedureCatalog {

  private var catalogName: String = _
  private var root: Path = _
  private var conf: org.apache.hadoop.conf.Configuration = _
  private var session: org.apache.spark.sql.SparkSession = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val p = Option(options.get("path")).orElse(Option(options.get("warehouse")))
      .getOrElse(throw new IllegalArgumentException(
        s"fls catalog '$name': set spark.sql.catalog.$name.path to the warehouse root"))
    // `.active` at INITIALIZE only — the one DSv2 entry point with no
    // session handle; everything downstream threads this capture
    session = org.apache.spark.sql.SparkSession.active
    conf = session.sessionState.newHadoopConf()
    root = new Path(p)
    fs.mkdirs(root)
  }

  // ---------------------------------------------------- SQL procedures

  override def loadProcedure(ident: Identifier)
    : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    FlsProcedures.load(ident, resolveTableDir, session)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    FlsProcedures.list(namespace)

  /** Procedure-side table resolution: same layout rule as tableDir,
    * and the table must exist (a typo'd CALL should not mkdir). */
  private def resolveTableDir(parts: Seq[String]): Path = {
    val ident = Identifier.of(parts.dropRight(1).toArray, parts.last)
    val dir = tableDir(ident)
    if (FlsTableMeta.read(fs, dir).isEmpty) throw new NoSuchTableException(ident)
    dir
  }

  override def name(): String = catalogName
  private def fs: FileSystem = root.getFileSystem(conf)

  /** Column DEFAULTs are supported: stored in field metadata
    * (CURRENT_DEFAULT for new INSERTs — Spark materializes it at write
    * analysis; EXISTS_DEFAULT for rows predating the column — the scan
    * serves it at decode, [[FlsPartitionReader]]). */
  override def capabilities(): java.util.Set[TableCatalogCapability] =
    java.util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(root)((d, n) => new Path(d, n))
  private def tableDir(ident: Identifier): Path =
    new Path(nsDir(ident.namespace), ident.name)

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory)
      .filter(s => fs.exists(new Path(s.getPath, FlsTableMeta.LogDirName)))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    FlsTableMeta.read(fs, dir) match {
      case Some((_, meta)) => tableFor(dir, meta, pinned = None)
      case None =>
        // `SELECT * FROM cat.ns.t.history` parses as ident(ns :+ t,
        // "history") — serve the metadata table when ns :+ t IS a table
        metadataFor(ident).getOrElse(throw new NoSuchTableException(ident))
    }
  }

  private def tableFor(dir: Path, meta: FlsTableMeta.Meta,
      pinned: Option[Long], branch: Option[String] = None): Table = {
    val opts = new java.util.HashMap[String, String]()
    // table properties become default reader/writer options
    // (row_group_size etc. declared once at CREATE apply to every
    // INSERT); path/partition_by are derived, not user-settable
    meta.properties.foreach { case (k, v) => opts.put(k, v) }
    opts.put("path", dir.toString)
    if (meta.partitionBy.nonEmpty)
      opts.put("partition_by", meta.partitionBy.mkString(","))
    pinned.foreach(v => opts.put("manifest_version", v.toString))
    branch.foreach(b => opts.put("branch", b))
    new FlsTable(meta.schema, new CaseInsensitiveStringMap(opts))
  }

  /** Metadata tables: `t.history` (one row per retained version),
    * `t.files` (one row per live file — the DV-era operational view),
    * and `t.changes` (the change-data-feed over the full retained
    * range — rows inserted/deleted per commit, [[FlsCdf]]; filter on
    * `_commit_version` for a narrower window). */
  private def metadataFor(ident: Identifier): Option[Table] =
    if ((ident.name != "history" && ident.name != "files" &&
        ident.name != "changes") || ident.namespace.isEmpty) None
    else {
      val parent = Identifier.of(ident.namespace.dropRight(1),
        ident.namespace.last)
      val dir = tableDir(parent)
      FlsTableMeta.read(fs, dir) match {
        case None => None
        case Some((_, meta)) =>
          if (ident.name == "history")
            Some(new FlsHistoryTable(s"$catalogName.${parent}", dir, conf))
          else if (ident.name == "files")
            Some(new FlsFilesTable(s"$catalogName.${parent}", dir, conf))
          else {
            val opts = new java.util.HashMap[String, String]()
            meta.properties.foreach { case (k, v) => opts.put(k, v) }
            opts.put("path", dir.toString)
            opts.put(FlsCdf.FromOption, FlsCdf.Earliest)
            Some(new FlsCdfTable(s"$catalogName.${parent}.changes",
              StructType(meta.schema.fields ++ FlsCdf.cdfSchemaFields),
              new CaseInsensitiveStringMap(opts), session))
          }
      }
    }

  /** The declared metadata AS OF manifest version `v`: each manifest
    * commit stamps the [[FlsTableMeta]] version current at commit time
    * (`#schema` header), and snapshot reads bind to THAT schema — the
    * Iceberg snapshot/schema-id contract. `VERSION AS OF` a version
    * before a RENAME serves the old name; before an ADD COLUMN, the
    * column is absent; before a DROP, the dropped column comes back
    * with its values (old files still store it and the snapshot schema
    * still declares it). Falls back to the CURRENT schema for versions
    * committed before the stamp existed and for stamped metadata
    * versions GC'd past the retention window — the documented legacy
    * stance (historical data through today's schema). */
  private def metaAsOf(dir: Path, v: Long,
      current: FlsTableMeta.Meta): FlsTableMeta.Meta =
    FlsManifest.versionMeta(fs, dir, v).flatMap(_.schemaVersion) match {
      case Some(mv) =>
        try FlsTableMeta.readVersion(fs, dir, mv)
        catch { case _: java.io.FileNotFoundException => current }
      case None => current
    }

  /** `SELECT ... FROM t VERSION AS OF <v>` — a pinned read of manifest
    * version `v`, immutable under concurrent commits. Both data AND
    * schema travel: rows are served through the schema stamped at `v`
    * ([[metaAsOf]] — Iceberg's snapshot-schema reads), with the
    * documented fall-back to the current schema for pre-stamp commits.
    * Retention bounds travel: only versions still in the
    * manifest log resolve (see `t.history`); older ones were GC'd. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    val meta = FlsTableMeta.read(fs, dir)
      .getOrElse(throw new NoSuchTableException(ident))._2
    val v =
      try java.lang.Long.parseLong(version)
      catch {
        case _: NumberFormatException =>
          // named refs: a TAG resolves to its pinned main version; a
          // BRANCH reads the branch lineage's current head
          FlsManifest.tags(fs, dir).get(version) match {
            case Some(tv) =>
              return tableFor(dir, metaAsOf(dir, tv, meta), pinned = Some(tv))
            case None =>
              if (scala.util.Try(FlsManifest.validateRefName(version)).isSuccess &&
                  FlsManifest.readVersioned(fs, dir, version).isDefined)
                return tableFor(dir, meta, pinned = None,
                  branch = Some(version))
              throw new IllegalArgumentException(
                s"fls: VERSION AS OF takes a numeric manifest version, a " +
                  s"tag, or a branch; '$version' is none of those for " +
                  s"$ident — list ${ident}.history for valid versions")
          }
      }
    val have = FlsManifest.versionsWithTimes(fs, dir)
    require(have.exists(_._1 == v),
      if (have.isEmpty)
        s"fls: $ident has no manifest log — only commit_mode=manifest " +
          "tables keep version history"
      else
        s"fls: version $v of $ident is not retained (have: " +
          s"${have.map(_._1).mkString(", ")}) — older versions are GC'd " +
          "past the retention window")
    tableFor(dir, metaAsOf(dir, v, meta), pinned = Some(v))
  }

  /** `SELECT ... FROM t TIMESTAMP AS OF <ts>` — resolves to the newest
    * version committed at or before `ts` (Spark hands micros; manifest
    * commit times are the manifest files' own mtimes, millis). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    val meta = FlsTableMeta.read(fs, dir)
      .getOrElse(throw new NoSuchTableException(ident))._2
    val have = FlsManifest.versionsWithTimes(fs, dir)
    require(have.nonEmpty,
      s"fls: $ident has no manifest log — only commit_mode=manifest " +
        "tables keep version history")
    val atOrBefore = have.filter(_._2 * 1000L <= timestampMicros)
    require(atOrBefore.nonEmpty,
      s"fls: TIMESTAMP AS OF ${java.time.Instant.ofEpochMilli(timestampMicros / 1000L)} " +
        s"predates the oldest retained version of $ident " +
        s"(${java.time.Instant.ofEpochMilli(have.head._2)}) — earlier " +
        "history was GC'd past the retention window")
    val v = atOrBefore.maxBy(_._1)._1
    tableFor(dir, metaAsOf(dir, v, meta), pinned = Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    val dir = tableDir(ident)
    if (fs.exists(new Path(dir, FlsTableMeta.LogDirName)))
      throw new TableAlreadyExistsException(ident)
    val partitionBy = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 &&
        t.references()(0).fieldNames.length == 1 =>
        t.references()(0).fieldNames()(0)
      case other => throw new IllegalArgumentException(
        s"fls: unsupported partition transform '$other' — only plain column " +
          "(identity) partitioning is supported")
    }
    partitionBy.foreach(k => require(schema.fieldNames.contains(k),
      s"fls: partition column '$k' is not in the table schema"))
    // a typo'd retention budget is refused at CREATE, not at first GC
    Option(properties.get(FlsManifest.RetentionProperty))
      .foreach(FlsManifest.validateRetention)
    // validate every data column is WRITABLE now — a CREATE that cannot
    // ever be written should fail here, not at the first INSERT. The
    // writer's own rule (physicalColumns): scalars, arrays/maps of
    // scalars, and structs of scalars (flattened to dotted columns);
    // deeper nesting rejected.
    Format.physicalColumns(
      schema.fields.filterNot(f => partitionBy.contains(f.name)).toSeq)
    val keep = properties.asScala.filterNot { case (k, _) =>
      k == TableCatalog.PROP_LOCATION || k == TableCatalog.PROP_PROVIDER ||
        k == TableCatalog.PROP_OWNER || k == TableCatalog.PROP_EXTERNAL ||
        k == TableCatalog.PROP_TABLE_TYPE || k == TableCatalog.PROP_IS_MANAGED_LOCATION
    }.toMap
    require(!properties.containsKey(TableCatalog.PROP_LOCATION),
      s"fls catalog: LOCATION is not supported — tables live under the " +
        s"warehouse root (${root}); read external directories with " +
        "spark.read.format(\"fls\").load(dir) instead")
    fs.mkdirs(dir)
    FlsTableMeta.commit(fs, dir, java.util.UUID.randomUUID().toString, conf) {
      case Some(_) => throw new TableAlreadyExistsException(ident)
      case None => FlsTableMeta.Meta(schema, partitionBy, keep)
    }
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (FlsTableMeta.read(fs, dir).isEmpty) throw new NoSuchTableException(ident)
    FlsTableMeta.commit(fs, dir, java.util.UUID.randomUUID().toString, conf) {
      case None => throw new NoSuchTableException(ident)
      case Some(cur) => changes.foldLeft(cur)(applyChange(ident, _, _))
    }
    loadTable(ident)
  }

  /** Dropped-name tombstones live in table properties under one key —
    * a comma-joined sorted set (names are validated identifier-ish). */
  private val DroppedKey = "fls.dropped"
  private def dropped(m: FlsTableMeta.Meta): Set[String] =
    m.properties.get(DroppedKey).map(_.split(",").filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  private def applyChange(ident: Identifier, m: FlsTableMeta.Meta,
      change: TableChange): FlsTableMeta.Meta = change match {

    case add: TableChange.AddColumn =>
      require(add.fieldNames.length == 1,
        "fls: ADD COLUMN supports top-level columns only")
      val name = add.fieldNames()(0)
      require(!m.schema.fieldNames.contains(name),
        s"fls: column '$name' already exists in ${ident}")
      require(!dropped(m).exists(_.equalsIgnoreCase(name)),
        s"fls: column name '$name' was previously dropped from ${ident} — " +
          "old files still store it and a name-bound scan would resurrect " +
          "their values; pick a new name or compact the table first")
      require(add.isNullable || add.defaultValue() != null,
        s"fls: added column '$name' must be nullable or carry a DEFAULT — " +
          "rows written before the ALTER have no value for it")
      require(add.position() == null,
        "fls: ADD COLUMN ... FIRST/AFTER is not supported — columns append")
      ColumnType.fromSpark(add.dataType) // must be representable
      val mb = new MetadataBuilder()
      Option(add.comment()).foreach(c => mb.putString("comment", c))
      Option(add.defaultValue()).foreach { dv =>
        // the analyzed constant (already cast to the column type by
        // Spark) is FROZEN as the backfill value: rows predating the
        // column serve it at decode forever, even if the CURRENT
        // default later changes (standard exists-vs-current contract)
        require(FlsDefaults.fillable(add.dataType),
          s"fls: DEFAULT on '$name' needs a scalar type the scan can " +
            s"serve constantly, got ${add.dataType.simpleString}")
        val lit = org.apache.spark.sql.catalyst.expressions.Literal(
          dv.getValue.value, dv.getValue.dataType)
        mb.putString(graft.fls.connector.FlsDefaults.ExistsKey, lit.sql)
        mb.putString(graft.fls.connector.FlsDefaults.CurrentKey,
          Option(dv.getSql).getOrElse(lit.sql))
      }
      val field = StructField(name, add.dataType,
        nullable = add.isNullable, metadata = mb.build())
      // appended AFTER data columns but BEFORE partition columns, so the
      // schema keeps Spark's data-then-partition convention
      val (dataF, partF) = m.schema.fields.partition(f => !m.partitionBy.contains(f.name))
      m.copy(schema = StructType((dataF :+ field) ++ partF))

    case upd: TableChange.UpdateColumnType =>
      require(upd.fieldNames.length == 1,
        "fls: ALTER COLUMN TYPE supports top-level columns only")
      val name = upd.fieldNames()(0)
      val idx = m.schema.fieldNames.indexOf(name)
      require(idx >= 0, s"fls: no column '$name' in ${ident}")
      require(!m.partitionBy.contains(name),
        s"fls: cannot change the type of partition column '$name'")
      val oldT = ColumnType.fromSpark(m.schema.fields(idx).dataType)
      val newT = ColumnType.fromSpark(upd.newDataType())
      // legal iff the new type is reachable by promotion from the old —
      // exactly the lattice multi-file reads already widen along, so old
      // files decode into the new declared type with zero rewrites
      val promoted = scala.util.Try(Format.promote(oldT, newT)).toOption
      require(promoted.contains(newT),
        s"fls: cannot change '$name' from ${m.schema.fields(idx).dataType.simpleString} " +
          s"to ${upd.newDataType().simpleString} — only widenings on the promotion " +
          "lattice (e.g. INT→BIGINT, FLOAT→DOUBLE, decimal scale growth) are " +
          "metadata-only; anything else would require rewriting every file")
      val fields = m.schema.fields.clone()
      fields(idx) = fields(idx).copy(dataType = upd.newDataType())
      m.copy(schema = StructType(fields))

    case upd: TableChange.UpdateColumnNullability =>
      val name = upd.fieldNames()(0)
      val idx = m.schema.fieldNames.indexOf(name)
      require(idx >= 0, s"fls: no column '$name' in ${ident}")
      require(upd.nullable(),
        s"fls: cannot mark '$name' NOT NULL retroactively — existing files " +
          "are not re-validated")
      val fields = m.schema.fields.clone()
      fields(idx) = fields(idx).copy(nullable = true)
      m.copy(schema = StructType(fields))

    case ren: TableChange.RenameColumn =>
      require(ren.fieldNames.length == 1,
        "fls: RENAME COLUMN supports top-level columns only")
      val from = ren.fieldNames()(0)
      val to = ren.newName()
      val idx = m.schema.fieldNames.indexOf(from)
      require(idx >= 0, s"fls: no column '$from' in ${ident}")
      require(!m.schema.fieldNames.contains(to),
        s"fls: column '$to' already exists in ${ident}")
      require(!dropped(m).exists(_.equalsIgnoreCase(to)),
        s"fls: column name '$to' was previously dropped from ${ident} — " +
          "old files still store it; pick a new name or compact first")
      val fields = m.schema.fields.clone()
      val old = fields(idx)
      // carry the FULL name history so files written under ANY earlier
      // name still bind (a→b→c: files storing 'a' or 'b' serve 'c')
      val prev = Format.previousNames(old) :+ from
      fields(idx) = old.copy(name = to,
        metadata = new MetadataBuilder().withMetadata(old.metadata)
          .putStringArray(Format.PreviousNamesKey, prev.toArray).build())
      m.copy(schema = StructType(fields),
        partitionBy = m.partitionBy.map(k => if (k == from) to else k))

    case del: TableChange.DeleteColumn =>
      require(del.fieldNames.length == 1,
        "fls: DROP COLUMN supports top-level columns only")
      val name = del.fieldNames()(0)
      val idx = m.schema.fieldNames.indexOf(name)
      if (idx < 0) {
        if (del.ifExists()) m
        else throw new IllegalArgumentException(s"fls: no column '$name' in ${ident}")
      } else {
        require(!m.partitionBy.contains(name),
          s"fls: cannot drop partition column '$name'")
        require(m.schema.fields.length > 1,
          s"fls: cannot drop the only column of ${ident}")
        // tombstone every name this column ever bound (current + renames):
        // old files may store any of them
        val gone = (Format.previousNames(m.schema.fields(idx)) :+ name).toSet
        val tomb = (dropped(m) ++ gone).toSeq.sorted.mkString(",")
        m.copy(schema = StructType(m.schema.fields.patch(idx, Nil, 1)),
          properties = m.properties + (DroppedKey -> tomb))
      }

    case upd: TableChange.UpdateColumnDefaultValue =>
      // SET/DROP DEFAULT changes only the CURRENT default (what future
      // INSERTs fill in) — the frozen EXISTS default keeps serving rows
      // that predate the column, the standard exists-vs-current split
      require(upd.fieldNames.length == 1,
        "fls: ALTER COLUMN SET DEFAULT supports top-level columns only")
      val name = upd.fieldNames()(0)
      val idx = m.schema.fieldNames.indexOf(name)
      require(idx >= 0, s"fls: no column '$name' in ${ident}")
      val fields = m.schema.fields.clone()
      val old = fields(idx)
      val newDefault = Option(upd.newCurrentDefault()).map(_.getSql)
        .filter(s => s != null && s.nonEmpty)
      val mb = new MetadataBuilder().withMetadata(old.metadata)
      newDefault match {
        case Some(sql) => mb.putString(FlsDefaults.CurrentKey, sql)
        case None => mb.remove(FlsDefaults.CurrentKey)
      }
      fields(idx) = old.copy(metadata = mb.build())
      m.copy(schema = StructType(fields))

    case set: TableChange.SetProperty =>
      if (set.property() == FlsManifest.RetentionProperty)
        FlsManifest.validateRetention(set.value()) // refuse junk at ALTER
      m.copy(properties = m.properties + (set.property() -> set.value()))
    case rm: TableChange.RemoveProperty =>
      m.copy(properties = m.properties - rm.property())
    case other => throw new UnsupportedOperationException(
      s"fls: unsupported table change $other")
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (FlsTableMeta.read(fs, dir).isEmpty) false
    else fs.delete(dir, true)
  }

  /** `RENAME TO` targets may arrive with the catalog name still leading
    * the namespace (Spark passes the user's multipart name through) —
    * strip it so `RENAME TO flscat.db.t2` and `RENAME TO db.t2` mean
    * the same table. A namespace literally named like the catalog is
    * ambiguous and unsupported. */
  private def normalize(i: Identifier): Identifier =
    if (i.namespace.nonEmpty && i.namespace()(0).equalsIgnoreCase(catalogName))
      Identifier.of(i.namespace.drop(1), i.name)
    else i

  override def renameTable(from: Identifier, to0: Identifier): Unit = {
    val to = normalize(to0)
    val src = tableDir(from)
    if (FlsTableMeta.read(fs, src).isEmpty) throw new NoSuchTableException(from)
    val dst = tableDir(to)
    if (fs.exists(dst)) throw new TableAlreadyExistsException(to)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"fls: rename $src -> $dst failed")
  }

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    fs.listStatus(root).filter(_.isDirectory)
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(s => Array(s.getPath.getName))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory)
      .filterNot(s => fs.exists(new Path(s.getPath, FlsTableMeta.LogDirName)))
      .map(s => namespace :+ s.getPath.getName)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!fs.exists(nsDir(namespace))) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    val dir = nsDir(namespace)
    if (fs.exists(dir)) throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(dir)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("fls: namespace properties are not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) false
    else {
      if (!cascade && fs.listStatus(dir).nonEmpty)
        throw new IllegalStateException(
          s"fls: namespace ${namespace.mkString(".")} is not empty")
      fs.delete(dir, true)
    }
  }
}
