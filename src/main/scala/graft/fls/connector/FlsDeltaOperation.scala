package graft.fls.connector

import java.util.concurrent.atomic.AtomicReference

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.fls.{FlsDeleteVectors, FlsFileStats, FlsManifest, Format}

/** DELTA (merge-on-read) row-level operations — the sibling of the
  * group-based rewrite in [[FlsRowLevelOperation]]: instead of reading
  * affected files WHOLE and rewriting them, Spark hands this operation
  * only the CHANGED rows, keyed by the `(_fls_file, _fls_pos)` row
  * identity the scan serves as metadata columns. Deletes become
  * delete-vector positions; updates become a delete position plus an
  * appended row; inserts append. A one-row UPDATE on a 100 TB table
  * costs one DV sidecar and one tiny data file — no file rewrite at
  * all (Iceberg's position-delta write, `SupportsDelta`).
  *
  * The commit is ONE manifest CAS: attach merged DVs to the targeted
  * entries, append the new files. Conflict rules match the rest of the
  * format: a target replaced or re-vectored since the operation's scan
  * aborts with "rerun" (the deltas were computed against stale rows);
  * the write is manifest-only (the DV pointer lives in manifest
  * metadata). Mode knobs: `delete_mode` / `update_mode` / `merge_mode`
  * = 'merge-on-read' ([[FlsRowLevelOperationBuilder]]). */
class FlsDeltaOperation(
    cmd: Command,
    tableSchema: StructType,
    tableOptions: CaseInsensitiveStringMap,
    /** Captured at construction — see [[FlsTable]]'s session note. */
    session: org.apache.spark.sql.SparkSession =
      org.apache.spark.sql.SparkSession.active)
  extends RowLevelOperation with SupportsDelta {

  /** Scan-time DV pointer per planned file (abs → abs) — the commit
    * verifies targets are still at these vectors. */
  private val scanDvs = new AtomicReference[Map[String, String]](Map.empty)

  override def command(): Command = cmd
  override def description(): String = s"fls row-level $cmd (merge-on-read)"

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(FlsVirtual.MetaFile),
    Expressions.column(FlsVirtual.MetaPos))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged =
      if (options.isEmpty) tableOptions
      else {
        val m = new java.util.HashMap[String, String](tableOptions)
        m.putAll(options)
        new CaseInsensitiveStringMap(m)
      }
    new FlsScanBuilder(tableSchema, merged, session) {
      override def build(): Scan = super.build() match {
        case f: FlsScan =>
          f.onPlannedDv = Some(dvs => scanDvs.set(dvs))
          f
        case other => other
      }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder = {
    // the replacement rows carry partition columns; route them back
    // into the hive layout (same contract as the group-based path)
    val declared = Option(tableOptions.get("partition_by"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new FlsDeltaWrite(info, tableOptions, declared,
          () => scanDvs.get(), session)
    }
  }
}

class FlsDeltaWrite(info: LogicalWriteInfo,
    tableOptions: CaseInsensitiveStringMap, partitionBy: Seq[String],
    scanDvs: () => Map[String, String],
    session: org.apache.spark.sql.SparkSession) extends DeltaWrite {
  override def toBatch: DeltaBatchWrite =
    new FlsDeltaBatchWrite(info, tableOptions, partitionBy, scanDvs, session)
}

class FlsDeltaBatchWrite(info: LogicalWriteInfo,
    tableOptions: CaseInsensitiveStringMap, partitionBy: Seq[String],
    scanDvs: () => Map[String, String],
    session: org.apache.spark.sql.SparkSession) extends DeltaBatchWrite {

  private val dir = FlsDataSource.parsePaths(tableOptions).headOption
    .getOrElse(throw new IllegalArgumentException("fls delta write: no path"))
  private val writeId = java.util.UUID.randomUUID().toString

  override def createBatchWriterFactory(
      pinfo: PhysicalWriteInfo): DeltaWriterFactory = {
    val rowIdSchema = info.rowIdSchema().orElseThrow(() =>
      new IllegalStateException("fls delta write: Spark supplied no row ID " +
        "schema — the operation declared (_fls_file, _fls_pos)"))
    val fileIdx = rowIdSchema.fieldIndex(FlsVirtual.MetaFile)
    val posIdx = rowIdSchema.fieldIndex(FlsVirtual.MetaPos)
    val inner = FlsWriterFactory(dir, info.schema(),
      tableOptions.getInt("row_group_size", Format.DefaultRowGroupSize),
      tableOptions.getInt("row_groups_per_file", 0),
      new SerializableConfiguration(session.sessionState.newHadoopConf()),
      writeId,
      inlineFooter = tableOptions.getBoolean("inline_footer", true),
      transpose = tableOptions.getBoolean("transpose", false),
      partitionBy = partitionBy,
      directWrite = true) // manifest-mode final names, no renames
    FlsDeltaWriterFactory(inner, fileIdx, posIdx)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = session.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val qdir = fs.makeQualified(root).toString.stripSuffix("/") + "/"
    def relOf(abs: String): String = {
      require(abs.startsWith(qdir),
        s"fls delta write: targeted file $abs is outside the table root $qdir")
      abs.stripPrefix(qdir)
    }

    val delByAbs = mutable.HashMap[String, mutable.ArrayBuffer[Long]]()
    val insertEntries = mutable.ArrayBuffer[FlsManifest.Entry]()
    messages.foreach {
      case FlsDeltaCommitMessage(ins, dels) =>
        dels.foreach { case (f, ps) =>
          delByAbs.getOrElseUpdate(f, mutable.ArrayBuffer[Long]()) ++= ps
        }
        ins.files.zip(ins.lengths).zipWithIndex.foreach { case ((rel, len), i) =>
          if (rel.endsWith(".fls"))
            insertEntries += FlsManifest.Entry(rel, len, 0L,
              if (i < ins.stats.length) ins.stats(i) else null)
        }
      case other => throw new IllegalStateException(
        s"fls delta write: unexpected commit message $other")
    }
    val totalDeletes = delByAbs.valuesIterator.map(_.length.toLong).sum
    val cap = tableOptions.getLong("merge_on_read_max_rows", 4L * 1000 * 1000)
    require(totalDeletes <= cap,
      s"fls delta write: $totalDeletes deleted positions " +
        s"(> merge_on_read_max_rows=$cap) — an operation this wide should " +
        "run in copy-on-write mode; raise the option and schedule " +
        "compaction to override")
    require(FlsManifest.readVersioned(fs, root).isDefined,
      "fls: merge-on-read row-level operations need a " +
        "commit_mode=manifest table (the delete-vector pointer lives in " +
        "the manifest) — or use copy-on-write mode")

    // merged DV per target, attempt-unique, written BEFORE the CAS
    val atScan = scanDvs()
    val written = mutable.ArrayBuffer[String]()
    val dvBaseByRel: Map[String, String] = delByAbs.map { case (abs, fresh) =>
      val rel = relOf(abs)
      val old = atScan.get(abs)
        .map(a => FlsDeleteVectors.readAbsolute(a, conf))
        .getOrElse(Array.empty[Long])
      val dvRel = FlsDeleteVectors.write(fs, root, rel, writeId,
        old ++ fresh.toArray)
      written += dvRel
      rel -> new Path(dvRel).getName
    }.toMap
    val scanDvBase: Map[String, Option[String]] = delByAbs.keysIterator.map {
      abs => relOf(abs) -> atScan.get(abs).map(a => new Path(a).getName)
    }.toMap

    try {
      FlsManifest.commit(fs, root, writeId, conf) { (_, cur) =>
        val entries = cur.getOrElse(Seq.empty)
        val byRel = entries.map(e => e.rel -> e).toMap
        dvBaseByRel.keysIterator.foreach { rel =>
          val e = byRel.getOrElse(rel,
            throw new java.util.ConcurrentModificationException(
              s"fls delta write: target $rel was replaced or removed " +
                "concurrently — rerun the operation"))
          if (FlsFileStats.dvOf(e.stats) != scanDvBase(rel))
            throw new java.util.ConcurrentModificationException(
              s"fls delta write: a concurrent DELETE re-vectored $rel " +
                "after the operation's scan — rerun the operation")
        }
        entries.map { e =>
          dvBaseByRel.get(e.rel) match {
            case Some(b) => e.copy(stats = FlsFileStats.withDv(e.stats, b))
            case None => e
          }
        } ++ insertEntries
      }
    } catch {
      case e: Throwable =>
        written.foreach(r =>
          try fs.delete(new Path(root, r), false)
          catch { case _: Throwable => () })
        throw e
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // nothing published (DVs are written inside commit and rolled back
    // there): remove the staged insert files
    val conf = session.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    messages.foreach {
      case FlsDeltaCommitMessage(ins, _) => ins.files.foreach { rel =>
        try fs.delete(new Path(root, rel), false) catch { case _: Throwable => () }
        try fs.delete(new Path(root, rel + ".footer"), false)
        catch { case _: Throwable => () }
      }
      case _ => ()
    }
  }
}

case class FlsDeltaWriterFactory(inner: FlsWriterFactory,
    fileIdx: Int, posIdx: Int) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    // LAZY inner writer: a pure DELETE delta has an empty write schema
    // (nothing will ever be inserted) that the data writer rightly
    // refuses — instantiate it on the first actual insert
    new FlsDeltaWriter(() => inner.createWriter(partitionId, taskId),
      fileIdx, posIdx)
}

/** Task side: inserts stream through a normal fls data writer
  * (attempt-unique final names); deletes accumulate as (file →
  * positions) — tiny by the merge-on-read contract (driver cap). */
class FlsDeltaWriter(mkInner: () => DataWriter[InternalRow],
    fileIdx: Int, posIdx: Int) extends DeltaWriter[InternalRow] {

  private val dels = mutable.HashMap[String, mutable.ArrayBuffer[Long]]()
  private var inner: DataWriter[InternalRow] = null

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    dels.getOrElseUpdate(id.getUTF8String(fileIdx).toString,
      mutable.ArrayBuffer[Long]()) += id.getLong(posIdx)

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    delete(meta, id)
    insert(row)
  }

  override def insert(row: InternalRow): Unit = {
    if (inner == null) inner = mkInner()
    inner.write(row)
  }

  override def commit(): WriterCommitMessage = {
    val ins =
      if (inner == null) FlsCommitMessage(Array.empty, Array.empty)
      else inner.commit() match {
        case m: FlsCommitMessage => m
        case other => throw new IllegalStateException(
          s"fls delta writer: unexpected inner commit message $other")
      }
    FlsDeltaCommitMessage(ins, dels.map { case (f, ps) => f -> ps.toArray }.toMap)
  }

  override def abort(): Unit = if (inner != null) inner.abort()
  override def close(): Unit = if (inner != null) inner.close()
}

case class FlsDeltaCommitMessage(inserts: FlsCommitMessage,
    deletes: Map[String, Array[Long]]) extends WriterCommitMessage
