package graft.fls.connector

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.fls.{FlsFile, FlsFileWriter, FlsFooters, FlsManifest, Format}

/** Whole-file verdict of a predicate conjunction (shared by DELETE,
  * INSERT OVERWRITE, and the row-level operations): Drop = every row
  * matches, Keep = none does, Straddle = mixed/unknown. */
private[connector] sealed trait FileVerdict
private[connector] object FileVerdict {
  case object Drop extends FileVerdict
  case object Keep extends FileVerdict
  case object Straddle extends FileVerdict
}

/** DELETE for fls tables (see [[FlsTable.canDeleteWhere]]) — metadata
  * decisions first, surgical copy-on-write second.
  *
  * Every live file is classified against the predicate conjunction:
  *   - `Drop`: every row matches — partition values decide it, or the
  *     file's zone maps prove it (negated-predicate pruning: all rows
  *     match `f` iff no row can match `¬f`). The file is removed whole;
  *     zero rows read. On a `cluster_by` table a retention predicate
  *     decides every file except the one straddling the cutoff.
  *   - `Keep`: no row matches (partition values, or plain zone-map
  *     pruning). Untouched.
  *   - `Straddle`: the file straddles the predicate. Only these files —
  *     typically one per clustered axis — are read and rewritten
  *     without the matching rows. O(straddling files), not O(table).
  *
  * Straddler rewrites run here for FLAT tables (no hive partition
  * columns: reading a bare file list loses path-encoded values);
  * partitioned tables route undecidable predicates to the row-level
  * operation path instead ([[FlsRowLevelOperation]] — canDeleteWhere
  * returns false and Spark plans a group-based rewrite). Listing mode
  * appends replacements before removing originals (a reader planning
  * in that window can see a transient duplicate — the sealed-table
  * caveat shared with listing-mode compaction). Manifest mode stages
  * replacements invisibly and publishes ONE CAS version: concurrent
  * appends are re-classified inside the merge, an undecidable newcomer
  * aborts with nothing changed, and dropped/rewritten files stay on
  * disk for `vacuum` (pinned snapshot readers survive). */
object FlsDelete {
  import FileVerdict.{Drop, Keep, Straddle}
  private type D = FileVerdict

  private def tablePath(options: CaseInsensitiveStringMap): String =
    FlsDataSource.parsePaths(options).headOption.getOrElse(
      throw new IllegalArgumentException("fls delete: no path"))

  private def hconf(session: org.apache.spark.sql.SparkSession): Configuration =
    session.sessionState.newHadoopConf()

  /** Filter negation over the shapes zone maps understand. Sound on
    * this format because stored columns hold no NULLs (two-valued
    * logic per row). */
  private def neg(f: Filter): Option[Filter] = f match {
    case EqualTo(c, v) => Some(Or(LessThan(c, v), GreaterThan(c, v)))
    case EqualNullSafe(c, v) => neg(EqualTo(c, v))
    case GreaterThan(c, v) => Some(LessThanOrEqual(c, v))
    case GreaterThanOrEqual(c, v) => Some(LessThan(c, v))
    case LessThan(c, v) => Some(GreaterThanOrEqual(c, v))
    case LessThanOrEqual(c, v) => Some(GreaterThan(c, v))
    case In(c, vs) =>
      vs.foldLeft(Option(AlwaysTrue().asInstanceOf[Filter])) { (acc, v) =>
        acc.map(a => And(a, Or(LessThan(c, v), GreaterThan(c, v))))
      }
    case IsNull(c) => Some(IsNotNull(c))
    case IsNotNull(c) => Some(IsNull(c))
    case And(l, r) => for { a <- neg(l); b <- neg(r) } yield Or(a, b)
    case Or(l, r) => for { a <- neg(l); b <- neg(r) } yield And(a, b)
    case Not(x) => Some(x)
    case _ => None
  }

  /** Whole-file zone-map verdict for ONE conjunct: Some(true) = every
    * row matches, Some(false) = none does, None = straddles/unknown. */
  private def zoneVerdict(t: Format.TableDesc, f: Filter): Option[Boolean] = {
    if (t.rowGroups.isEmpty) return Some(false) // zero rows: nothing matches
    val cols = t.columns
    val idx = cols.zipWithIndex.map { case (c, i) => c.name -> i }.toMap
    if (t.rowGroups.forall(rg => !FlsZoneMap.mayMatch(rg, idx, cols, Array(f), 0L)))
      return Some(false)
    neg(f) match {
      case Some(nf) if t.rowGroups.forall(rg =>
        !FlsZoneMap.mayMatch(rg, idx, cols, Array(nf), 0L)) => Some(true)
      case _ => None
    }
  }

  /** Classify every file against the conjunction, loading footers via
    * the session cache. Shared with INSERT OVERWRITE. */
  private[connector] def verdicts(schema: StructType, path: String,
      manifestVersion: Option[Long], filters: Array[Filter], files: Seq[Path],
      conf: Configuration): Map[String, FileVerdict] = {
    val footers = FlsFooters.list(Seq(path), conf, manifestVersion)
      .map(e => e.file.toString -> Format.applyRenames(e.table, schema)).toMap
    classify(schema, path, filters, files, footers, conf)
  }

  /** Classify every file. `footers` must cover all of `files`. */
  private def classify(schema: StructType, path: String, filters: Array[Filter],
      files: Seq[Path], footers: Map[String, Format.TableDesc],
      conf: Configuration): Map[String, D] = {
    val real = filters.filterNot(_.isInstanceOf[AlwaysTrue])
    if (real.exists(_.isInstanceOf[AlwaysFalse]))
      return files.map(_.toString -> (Keep: D)).toMap
    if (real.isEmpty) return files.map(_.toString -> (Drop: D)).toMap
    if (files.isEmpty) return Map.empty
    val disc = FlsPartitioning.discover(Seq(path), files, conf)
    val types = disc.partTypes(schema)
    files.map { f =>
      val key = f.toString
      val verdicts = real.map { fl =>
        disc.byFile.get(key)
          .flatMap(raw => FlsPartitioning.evaluates(fl, types, disc.keys, raw))
          .orElse(footers.get(key).flatMap(t => zoneVerdict(t, fl)))
      }
      key -> {
        if (verdicts.exists(_.contains(false))) Keep: D
        else if (verdicts.forall(_.contains(true))) Drop: D
        else Straddle: D
      }
    }.toMap
  }

  /** v1 Filter → Column, for the copy-on-write residual. */
  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(c, v) => Some(col(c) === lit(v))
    case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
    case GreaterThan(c, v) => Some(col(c) > lit(v))
    case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case LessThan(c, v) => Some(col(c) < lit(v))
    case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
    case In(c, vs) => Some(col(c).isin(vs.toIndexedSeq: _*))
    case IsNull(c) => Some(col(c).isNull)
    case IsNotNull(c) => Some(col(c).isNotNull)
    case StringStartsWith(c, v) => Some(col(c).startsWith(v))
    case StringEndsWith(c, v) => Some(col(c).endsWith(v))
    case StringContains(c, v) => Some(col(c).contains(v))
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case And(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a && b
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case Not(x) => toColumn(x).map(!_)
    case _ => None
  }

  private case class Plan(cls: Map[String, D], partitioned: Boolean,
      survivors: Column)

  private def plan(schema: StructType, options: CaseInsensitiveStringMap,
      filters: Array[Filter], files: Seq[Path],
      conf: Configuration): Option[Plan] = {
    val path = tablePath(options)
    val cls = verdicts(schema, path, FlsDataSource.manifestVersion(options),
      filters, files, conf)
    val partitioned =
      FlsPartitioning.discover(Seq(path), files, conf).keys.nonEmpty
    val needRewrite = cls.valuesIterator.contains(Straddle)
    if (needRewrite && partitioned) return None // path values would be lost
    val survivors: Column =
      if (!needRewrite) lit(true)
      else {
        val real = filters.filterNot(_.isInstanceOf[AlwaysTrue])
        val pred = real.flatMap(toColumn).reduceOption(_ && _)
        real.foreach { f =>
          if (toColumn(f).isEmpty) return None // cannot express the residual
        }
        not(coalesce(pred.getOrElse(lit(true)), lit(false)))
      }
    Some(Plan(cls, partitioned, survivors))
  }

  def canDelete(schema: StructType, options: CaseInsensitiveStringMap,
      filters: Array[Filter],
      session: org.apache.spark.sql.SparkSession =
        org.apache.spark.sql.SparkSession.active): Boolean = {
    val conf = hconf(session)
    val root = new Path(tablePath(options))
    val fs = root.getFileSystem(conf)
    val files = FlsManifest.readVersioned(fs, root) match {
      case Some((_, entries)) => entries.map(e => new Path(root, e.rel))
      case None => FlsFile.listDataFiles(root, conf)
    }
    plan(schema, options, filters, files, conf).isDefined
  }

  def delete(schema: StructType, options: CaseInsensitiveStringMap,
      filters: Array[Filter],
      session: org.apache.spark.sql.SparkSession =
        org.apache.spark.sql.SparkSession.active): Unit = {
    val conf = hconf(session)
    val path = tablePath(options)
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val spark = session

    def dataFields(files: Seq[Path]) = {
      val disc = FlsPartitioning.discover(Seq(path), files, conf)
      schema.fields.filterNot(f => disc.keys.contains(f.name)).toSeq
    }

    /** Schema-only file so an emptied table still reads (same contract
      * as an empty write). */
    def writeSchemaOnly(files: Seq[Path]): Path = {
      val p = new Path(root, f"part-${0}%05d-${UUID.randomUUID()}-${0}%04d.fls")
      val w = new FlsFileWriter(p, conf, Format.physicalColumns(dataFields(files)),
        inlineFooter = true)
      w.close()
      p
    }

    /** Rewrite `targets` without the matching rows into `outDir`
      * (listing-mode fls dir), preserving writer-visible schema. */
    def rewriteTo(targets: Seq[Path], survivors: Column, outDir: Path): Unit = {
      spark.read.format("fls").load(targets.map(_.toString): _*)
        .filter(survivors)
        .write.format("fls").mode("overwrite")
        .option("write_distribution", "none")
        .save(outDir.toString)
    }

    FlsManifest.readVersioned(fs, root) match {
      case Some((frozenV, frozenEntries)) =>
        val frozenFiles = frozenEntries.map(e => new Path(root, e.rel))
        val p0 = plan(schema, options, filters, frozenFiles, conf).getOrElse(
          throw new IllegalStateException(
            "fls delete: predicate not decidable per file (and the table is " +
              "partitioned, so a row-level rewrite would lose path values)"))
        // stage replacement files invisibly, then publish ONE version
        val rewriteTargets = frozenFiles.filter(f => p0.cls(f.toString) == Straddle)
        val staged = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
        val stageDir = new Path(root, s"_delete_${UUID.randomUUID()}")
        if (rewriteTargets.nonEmpty) {
          rewriteTo(rewriteTargets, p0.survivors, stageDir)
          FlsFile.listDataStatuses(stageDir, conf).foreach { st =>
            val dst = new Path(root, st.getPath.getName)
            if (!fs.rename(st.getPath, dst))
              throw new java.io.IOException(s"fls delete: rename ${st.getPath} -> $dst failed")
            val s2 = fs.getFileStatus(dst)
            staged += ((dst.getName, s2.getLen, s2.getModificationTime))
          }
          try fs.delete(stageDir, true) catch { case _: Throwable => () }
        }
        try {
          FlsManifest.commit(fs, root, UUID.randomUUID().toString, conf) { (_, cur) =>
            val entries = cur.getOrElse(Seq.empty)
            val files = entries.map(e => new Path(root, e.rel))
            // re-classify the CURRENT set: a concurrent append since the
            // freeze must also be decided, or nothing changes
            val pNow = plan(schema, options, filters, files, conf).getOrElse(
              throw new IllegalStateException(
                "fls delete: a concurrently-added file is not decided by the " +
                  "predicate — aborting with nothing removed"))
            val newcomersNeedRewrite = files.exists(f =>
              pNow.cls(f.toString) == Straddle &&
                !rewriteTargets.exists(_.toString == f.toString))
            if (newcomersNeedRewrite)
              throw new IllegalStateException(
                "fls delete: a concurrently-added file straddles the predicate " +
                  "— rerun the delete")
            val kept = entries.filter { e =>
              pNow.cls(new Path(root, e.rel).toString) == Keep
            }
            val merged = kept ++ staged.map { case (rel, len, mtime) =>
              FlsManifest.Entry(rel, len, mtime)
            }
            if (merged.nonEmpty) merged
            else {
              val p = writeSchemaOnly(files)
              val st = fs.getFileStatus(p)
              Seq(FlsManifest.Entry(p.getName, st.getLen, st.getModificationTime))
            }
            // dropped/rewritten inputs stay on disk for vacuum
          }
        } catch {
          case e: Throwable =>
            // unpublished replacements are junk; vacuum or best-effort now
            staged.foreach { case (rel, _, _) =>
              try fs.delete(new Path(root, rel), false) catch { case _: Throwable => () }
            }
            throw e
        }

      case None =>
        val files = FlsFile.listDataFiles(root, conf)
        val p0 = plan(schema, options, filters, files, conf).getOrElse(
          throw new IllegalStateException(
            "fls delete: predicate not decidable per file (and the table is " +
              "partitioned, so a row-level rewrite would lose path values)"))
        val doomed = files.filter(f => p0.cls(f.toString) == Drop)
        val rewriteTargets = files.filter(f => p0.cls(f.toString) == Straddle)
        // replacements land (as a normal append) BEFORE originals go
        if (rewriteTargets.nonEmpty) {
          val stageDir = new Path(root, s"_delete_${UUID.randomUUID()}")
          rewriteTo(rewriteTargets, p0.survivors, stageDir)
          FlsFile.listDataStatuses(stageDir, conf).foreach { st =>
            val dst = new Path(root, st.getPath.getName)
            if (!fs.rename(st.getPath, dst))
              throw new java.io.IOException(s"fls delete: rename ${st.getPath} -> $dst failed")
          }
          try fs.delete(stageDir, true) catch { case _: Throwable => () }
        }
        val removals = doomed ++ rewriteTargets
        if (removals.size == files.size &&
            FlsFile.listDataFiles(root, conf).size == removals.size)
          writeSchemaOnly(files)
        removals.foreach { f =>
          fs.delete(f, false)
          val sidecar = FlsFile.footerPath(f)
          try { if (fs.exists(sidecar)) fs.delete(sidecar, false) }
          catch { case _: Throwable => () }
        }
        // sweep now-empty partition directories bottom-up (best effort)
        removals.map(_.getParent).distinct.foreach { d =>
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
