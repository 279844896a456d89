package graft.fls.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

import graft.fls.{FlsDeleteVectors, FlsFileStats, FlsManifest}

/** Change-data-feed over a manifest table: every row INSERTED or
  * DELETED by the commits in `(fromVersion, toVersion]`, tagged with
  * `_change_type` ('insert' | 'delete') and `_commit_version` — the
  * Delta `table_changes` / Iceberg `changelog` shape, derived entirely
  * from the manifest log (the reference is single-snapshot,
  * /root/reference/src/writer/fls_writer.cpp:332-347; the multi-version
  * layer is this repo's own).
  *
  * Semantics are PER-COMMIT: each version v in the range is diffed
  * against v-1 at FILE level, so a row deleted and re-inserted inside
  * the range appears twice (once per commit) — the standard CDF
  * contract. Commits stamped `dataChange=false` (compaction, the
  * legacy-upgrade identity commit) are SKIPPED: their file churn is not
  * row churn. Pre-tag versions (no `#op` line) are treated as data
  * changes conservatively.
  *
  * Each commit contributes up to four branches, all ordinary fls scans
  * pruned at LISTING time (`file_subset`) — no footer is opened for an
  * untouched file, and nothing row-sized ever passes through the
  * driver:
  *   - files ADDED at v → their rows live at v ('insert');
  *   - files REMOVED at v → their rows live at v-1 ('delete') —
  *     copy-on-write DELETE/UPDATE/OVERWRITE emit churn for rewritten
  *     survivors too, exactly like Delta without DVs;
  *   - files whose DELETE VECTOR grew at v → the newly-deleted
  *     positions ('delete'), selected by joining the v-1 scan against
  *     a position set diffed EXECUTOR-SIDE (one task per file reads
  *     the two sidecars — the driver never holds positions);
  *   - files whose delete vector SHRANK at v (rollback restoring rows)
  *     → the restored positions at v ('insert').
  *
  * The whole range must sit inside the manifest retention window
  * (8 versions) — older diffs refuse loudly, same stance as pinned and
  * incremental reads. Removed files remain readable within that window
  * because vacuum only deletes UNVOUCHED files and rollback/pinned
  * reads keep retained versions' files alive. */
object FlsCdf {
  val ChangeType = "_change_type"
  val CommitVersion = "_commit_version"

  def changes(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Option[Long] = None): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val (headV, _) = FlsManifest.readVersioned(fs, root).getOrElse(
      throw new IllegalArgumentException(
        s"fls cdf: $dir has no manifest log — the change-data-feed needs " +
          "a commit_mode=manifest table"))
    val to = toVersion.getOrElse(headV)
    require(fromVersion >= 0, s"fls cdf: from_version must be >= 0, got $fromVersion")
    require(fromVersion <= to,
      s"fls cdf: from_version=$fromVersion is newer than the target version $to")
    require(to <= headV,
      s"fls cdf: to_version=$to is beyond the newest version $headV")

    def entriesAt(v: Long): Seq[FlsManifest.Entry] =
      try FlsManifest.readVersion(fs, root, v)
      catch {
        case _: java.io.FileNotFoundException =>
          if (v == 0L) Nil // table created directly in manifest mode
          else throw new IllegalArgumentException(
            s"fls cdf: version $v of $dir is not retained — the " +
              "change-data-feed can only span the retention window; " +
              "restart the consumer from a full snapshot")
      }

    val qdir = fs.makeQualified(root).toString.stripSuffix("/") + "/"
    val branches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val hconfSer = new SerializableConfiguration(conf)
    import spark.implicits._

    def scanSubset(v: Long, rels: Seq[String]): DataFrame = {
      rels.foreach(r => require(!r.contains(','),
        s"fls cdf: file name '$r' contains a comma — unsupported by " +
          "file_subset"))
      spark.read.format("fls")
        .option("manifest_version", v.toString)
        .option("file_subset", rels.sorted.mkString(","))
        .load(dir)
    }
    def tag(df: DataFrame, ct: String, v: Long): DataFrame =
      df.withColumn(ChangeType, lit(ct)).withColumn(CommitVersion, lit(v))

    /** (absolute file, old DV rel or null, new DV rel or null) →
      * positions present in exactly one vector, diffed where the DVs
      * live. `restored=false` rows are new deletions (in new only). */
    def positionsDiff(files: Seq[(String, String, String)], restored: Boolean) = {
      val rootStr = root.toString
      spark.createDataset(files).flatMap { case (abs, oldRel, newRel) =>
        val h = hconfSer.value
        val r = new Path(rootStr)
        val f = r.getFileSystem(h)
        def posOf(rel: String): Array[Long] =
          if (rel == null) Array.empty[Long] else FlsDeleteVectors.read(f, r, rel)
        val (base, minus) =
          if (restored) (posOf(oldRel), posOf(newRel))
          else (posOf(newRel), posOf(oldRel))
        val drop = minus.toSet
        base.iterator.filterNot(drop).map(p => (abs, p))
      }.toDF("__cdf_file", "__cdf_pos")
    }
    /** Rows of `rels` at version `v` whose position is in the diffed
      * set — the join key is the scan's own row identity, so this stays
      * a distributed hash join however many positions changed. */
    def positionBranch(v: Long, scanV: Long, rels: Seq[(String, String, String)],
        ct: String): DataFrame = {
      val df = scanSubset(scanV, rels.map(_._1.stripPrefix(qdir)))
        .withColumn("__cdf_f", col(FlsVirtual.MetaFile))
        .withColumn("__cdf_p", col(FlsVirtual.MetaPos))
      val pos = positionsDiff(rels, restored = ct == "insert")
      tag(df.join(pos,
          df("__cdf_f") === pos("__cdf_file") && df("__cdf_p") === pos("__cdf_pos"))
        .drop("__cdf_f", "__cdf_p", "__cdf_file", "__cdf_pos"), ct, v)
    }

    var prev = entriesAt(fromVersion)
    ((fromVersion + 1) to to).foreach { v =>
      val cur = entriesAt(v)
      val skip = FlsManifest.versionMeta(fs, root, v).exists(!_.dataChange)
      if (!skip) {
        val prevByRel = prev.map(e => e.rel -> e).toMap
        val curByRel = cur.map(e => e.rel -> e).toMap
        val added = cur.filterNot(e => prevByRel.contains(e.rel))
        val removed = prev.filterNot(e => curByRel.contains(e.rel))
        // a DV-pointer change on a surviving file is the merge-on-read
        // rewrite-in-place; classify its direction from the sidecars'
        // position COUNTS (in their lengths — no content read): our
        // writers only ever merge vectors (monotonic growth) or revert
        // pointers wholesale (rollback, a subset), so one side is
        // always empty — but the executor-side diff below is exact
        // either way, the counts only choose which scans to build.
        val deleteSide = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
        val insertSide = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
        prev.foreach { pe =>
          curByRel.get(pe.rel).foreach { ce =>
            require(pe.length == ce.length,
              s"fls cdf: ${pe.rel} changed length in commit $v without " +
                "changing name — in-place data rewrites are outside the " +
                "format's contract")
            val oldDv = FlsFileStats.dvOf(pe.stats)
            val newDv = FlsFileStats.dvOf(ce.stats)
            if (oldDv != newDv) {
              def dvRel(base: Option[String]): String =
                base.map(b => FlsDeleteVectors.relFor(pe.rel, b)).orNull
              def count(rel: String): Long =
                if (rel == null) 0L
                else FlsDeleteVectors.countFromLength(
                  fs.getFileStatus(new Path(root, rel)).getLen)
              val (o, n) = (dvRel(oldDv), dvRel(newDv))
              val (co, cn) = (count(o), count(n))
              val abs = qdir + pe.rel
              if (cn >= co) deleteSide += ((abs, o, n))
              if (co >= cn) insertSide += ((abs, o, n))
            }
          }
        }
        if (added.nonEmpty)
          branches += tag(scanSubset(v, added.map(_.rel)), "insert", v)
        if (removed.nonEmpty)
          branches += tag(scanSubset(v - 1, removed.map(_.rel)), "delete", v)
        if (deleteSide.nonEmpty)
          branches += positionBranch(v, v - 1, deleteSide.toSeq, "delete")
        if (insertSide.nonEmpty)
          branches += positionBranch(v, v, insertSide.toSeq, "insert")
      }
      prev = cur
    }

    if (branches.isEmpty)
      tag(spark.read.format("fls")
          .option("manifest_version", to.toString).load(dir).limit(0),
        "insert", to).limit(0)
    else
      branches.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }
}
