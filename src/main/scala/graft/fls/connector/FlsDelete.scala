package graft.fls.connector

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.sources.{AlwaysFalse, AlwaysTrue, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.fls.{FlsFile, FlsFileWriter, FlsManifest, Format}

/** Metadata-only DELETE for fls tables (see [[FlsTable.canDeleteWhere]]).
  *
  * A file is dropped iff its (constant) partition values make the
  * predicate conjunction TRUE for every row; kept iff FALSE/NULL for
  * every row; any file the values cannot decide makes the whole delete
  * illegal — this is the Iceberg-style metadata-delete contract, and it
  * keeps DELETE O(metadata) at any table size.
  *
  * Listing mode writes the replacement state in a crash-safe order
  * (schema-only file first when the delete empties the table, then the
  * removals) but is, like listing-mode compaction, an operation for
  * sealed tables: a reader that planned before the removals can hit
  * deleted files mid-scan. Manifest mode has neither caveat: the CAS
  * republish re-classifies the current entry set inside the merge (a
  * concurrent append whose new file the predicate cannot decide aborts
  * the delete loudly), readers keep planning from whatever manifest
  * version they pinned, and the dropped files remain on disk for
  * `FlsMaintenance.vacuum`. */
object FlsDelete {

  private def tablePath(options: CaseInsensitiveStringMap): String =
    FlsDataSource.parsePaths(options).headOption.getOrElse(
      throw new IllegalArgumentException("fls delete: no path"))

  private def hconf(): Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  /** Some(file → delete?) when the conjunction is decided for EVERY
    * file; None when any file cannot decide. */
  private def classify(schema: StructType, path: String,
      filters: Array[Filter], files: Seq[Path],
      conf: Configuration): Option[Map[String, Boolean]] = {
    val real = filters.filterNot(_.isInstanceOf[AlwaysTrue])
    if (real.exists(_.isInstanceOf[AlwaysFalse]))
      return Some(files.map(_.toString -> false).toMap)
    if (real.isEmpty) return Some(files.map(_.toString -> true).toMap)
    if (files.isEmpty) return Some(Map.empty)
    val disc = FlsPartitioning.discover(Seq(path), files, conf)
    if (disc.keys.isEmpty) return None
    val types = disc.partTypes(schema)
    val out = files.map { f =>
      disc.byFile.get(f.toString) match {
        case Some(raw) =>
          val per = real.map(fl => FlsPartitioning.evaluates(fl, types, disc.keys, raw))
          // conjunction: delete iff every conjunct is definitely TRUE
          // for every row; one definitely-FALSE conjunct keeps the file
          // outright (NULL verdicts keep rows too — SQL semantics) even
          // if a sibling conjunct is undecidable
          f.toString -> {
            if (per.exists(_.contains(false))) false
            else if (per.forall(_.contains(true))) true
            else return None
          }
        case None => return None
      }
    }
    Some(out.toMap)
  }

  def canDelete(schema: StructType, options: CaseInsensitiveStringMap,
      filters: Array[Filter]): Boolean = {
    val conf = hconf()
    val path = tablePath(options)
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = FlsManifest.readVersioned(fs, root) match {
      case Some((_, entries)) => entries.map(e => new Path(root, e.rel))
      case None => FlsFile.listDataFiles(root, conf)
    }
    classify(schema, path, filters, files, conf).isDefined
  }

  def delete(schema: StructType, options: CaseInsensitiveStringMap,
      filters: Array[Filter]): Unit = {
    val conf = hconf()
    val path = tablePath(options)
    val root = new Path(path)
    val fs = root.getFileSystem(conf)

    // partition columns live in paths; the data-file schema is the rest
    def dataFields(disc: FlsPartitioning.Discovery) =
      schema.fields.filterNot(f => disc.keys.contains(f.name)).toSeq

    /** Write a schema-only (zero-row-group) file so an emptied table
      * still reads with its data schema — same contract as an empty
      * write (FlsBatchWrite.commit). */
    def writeSchemaOnly(fields: Seq[org.apache.spark.sql.types.StructField]): Path = {
      val p = new Path(root, f"part-${0}%05d-${UUID.randomUUID()}-${0}%04d.fls")
      val w = new FlsFileWriter(p, conf, Format.physicalColumns(fields), inlineFooter = true)
      w.close()
      p
    }

    FlsManifest.readVersioned(fs, root) match {
      case Some(_) =>
        FlsManifest.commit(fs, root, UUID.randomUUID().toString, conf) { (_, cur) =>
          val entries = cur.getOrElse(Seq.empty)
          val files = entries.map(e => new Path(root, e.rel))
          val cls = classify(schema, path, filters, files, conf).getOrElse(
            throw new IllegalStateException(
              "fls delete: a concurrently-added file is not decided by the " +
                "predicate — aborting with nothing removed"))
          val disc = FlsPartitioning.discover(Seq(path), files, conf)
          val kept = entries.filterNot(e => cls(new Path(root, e.rel).toString))
          if (kept.nonEmpty) kept
          else {
            val p = writeSchemaOnly(dataFields(disc))
            val st = fs.getFileStatus(p)
            Seq(FlsManifest.Entry(p.getName, st.getLen, st.getModificationTime))
          }
          // dropped files stay on disk for vacuum (pinned readers)
        }

      case None =>
        val files = FlsFile.listDataFiles(root, conf)
        val cls = classify(schema, path, filters, files, conf).getOrElse(
          throw new IllegalStateException(
            "fls delete: the predicate is not decided by every file's " +
              "partition values — metadata delete would be wrong"))
        val disc = FlsPartitioning.discover(Seq(path), files, conf)
        val doomed = files.filter(f => cls(f.toString))
        // replacement state first: an emptied table must never be
        // observable as "no fls files"
        if (doomed.size == files.size) writeSchemaOnly(dataFields(disc))
        doomed.foreach { f =>
          fs.delete(f, false)
          val sidecar = FlsFile.footerPath(f)
          try { if (fs.exists(sidecar)) fs.delete(sidecar, false) }
          catch { case _: Throwable => () }
        }
        // sweep now-empty partition directories bottom-up (best effort)
        doomed.map(_.getParent).distinct.foreach { d =>
          var p = d
          var hops = 0
          while (p != null && p != root && hops < 16 &&
              (try fs.listStatus(p).isEmpty catch { case _: Throwable => false })) {
            try { if (!fs.delete(p, false)) hops = 16 }
            catch { case _: Throwable => hops = 16 }
            p = p.getParent
            hops += 1
          }
        }
    }
  }
}
