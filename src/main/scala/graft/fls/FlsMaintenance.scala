package graft.fls

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Table maintenance for fls directories. The one that matters at
  * 100 TB is small-file compaction: streaming ingestion and frequent
  * small appends leave a table as thousands of near-empty files, and
  * planning cost, footer-cache pressure, and per-file scheduling
  * overhead all scale with file COUNT, not byte size. `compact`
  * rewrites a table (or one partition subdirectory) into
  * `targetRowsPerFile`-sized files through the normal write path, so
  * the staged-rename / manifest commit protocol keeps readers
  * consistent throughout — a reader planned before the compaction
  * commit reads the old files (deleted only at job commit, after every
  * rewrite task finished), one planned after reads the new.
  *
  * The reference's writer has file rotation but no rewrite/maintenance
  * surface at all (/root/reference/src/writer/fls_writer.cpp:189-211);
  * this is Spark-cluster machinery for the formats the reference
  * leaves single-process.
  *
  * Scale notes: a whole-table compact of a 100 TB table is one job
  * that reads and rewrites everything — correct, but usually the wrong
  * granularity. The intended pattern is incremental: call
  * `compact(spark, s"$dir/dt=2026-08-01")` on the partitions the
  * ingest just sealed (a partition subdirectory of a listing-mode
  * table is itself a valid flat fls table, and rewriting it in place
  * preserves the hive layout). Manifest-mode tables must compact whole
  * (the manifest is table-scoped; rewriting a subtree under it would
  * desync the published file list — detected and refused). */
object FlsMaintenance {

  final case class CompactStats(filesBefore: Int, filesAfter: Int, rows: Long)

  /** Rewrite the fls table at `dir` into ~`targetRowsPerFile`-row files.
    * Preserves hive partition layout (partition columns re-routed
    * through `partition_by`) and commit mode (a manifest table
    * republishes its manifest atomically). `extraOptions` pass through
    * to the writer (`row_group_size`, `transpose`, ...).
    *
    * `sortBy` clusters the rewrite: the table range-partitions on the
    * given columns and sorts within each output task, so every file
    * (and row group) covers a narrow, near-disjoint value range — zone
    * maps then prune range/equality filters on those columns to a
    * handful of row groups instead of all of them. This is the linear
    * form of OPTIMIZE…ZORDER: at 100 TB, clustering the sealed
    * partitions on the hot filter key is what turns full-partition
    * scans into single-row-group reads. */
  def compact(spark: SparkSession, dir: String,
      targetRowsPerFile: Long = Format.DefaultRowGroupSize.toLong * 16,
      extraOptions: Map[String, String] = Map.empty,
      sortBy: Seq[String] = Nil): CompactStats = {
    require(targetRowsPerFile > 0, "fls compact: targetRowsPerFile must be positive")
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    // Compaction is read-then-overwrite: rows appended AFTER the input
    // file list freezes would be deleted by the overwrite's job commit.
    // Refuse when a writer is in flight (live staging tree) — and the
    // operational contract is the same as every rewrite-based OPTIMIZE:
    // run it on SEALED tables/partitions, not ones still being ingested
    // (a writer that starts mid-compaction is not detectable here).
    val staging = new Path(root, connector.FlsCommit.TempDirName)
    val inFlight =
      try fs.listStatus(staging).exists(_.isDirectory)
      catch { case _: java.io.FileNotFoundException => false }
    require(!inFlight,
      s"fls compact: a write job is in flight under $dir (staging tree present) — " +
        "compact sealed tables/partitions only, or wait for the writer to finish")
    val before = FlsFile.listDataStatuses(root, conf)
    require(before.nonEmpty, s"fls compact: no data files under $dir")
    val manifestMode = FlsManifest.read(fs, root).isDefined
    if (!manifestMode) {
      // compacting a partition SUBDIR of a manifest table in place would
      // leave the parent manifest pointing at deleted files — refuse
      var p = root.getParent
      var hops = 0
      while (p != null && hops < 64) {
        if (FlsManifest.read(fs, p).isDefined)
          throw new IllegalArgumentException(
            s"fls compact: $dir sits under the manifest table at $p — compact " +
              "the manifest table whole (its manifest is table-scoped)")
        p = p.getParent
        hops += 1
      }
    }
    val discovery = connector.FlsPartitioning.discover(
      Seq(dir), before.map(_.getPath), conf)
    val df = spark.read.format("fls").load(dir)
    val rows = df.count() // footer-served via the metadata-aggregate scan
    val nOut = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val keys = discovery.keys
    // partitioned: cluster rows by partition key so each task holds few
    // open buckets (then cluster within by sortBy); flat: range-cluster
    // on sortBy, or round-robin into exactly nOut writer tasks
    val repart =
      if (keys.nonEmpty) {
        val base = df.repartition(nOut, keys.map(col): _*)
        if (sortBy.nonEmpty) base.sortWithinPartitions((keys ++ sortBy).map(col): _*)
        else base
      } else if (sortBy.nonEmpty)
        df.repartitionByRange(nOut, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
      else df.repartition(nOut)
    var w = repart.write.format("fls").mode("overwrite")
    if (keys.nonEmpty) w = w.option("partition_by", keys.mkString(","))
    if (manifestMode) w = w.option("commit_mode", "manifest")
    // rotate files at ~targetRowsPerFile INSIDE each writer task too:
    // a partitioned rewrite routes a whole partition value to one task
    // (and flat rewrites can skew), so without rotation a hot partition
    // would collapse into one unbounded file — the opposite of the
    // contract
    val rowGroupSize = extraOptions.get("row_group_size")
      .map(_.toLong).getOrElse(Format.DefaultRowGroupSize.toLong)
    w = w.option("row_groups_per_file",
      math.max(1L, targetRowsPerFile / rowGroupSize).toString)
    extraOptions.foreach { case (k, v) => w = w.option(k, v) }
    w.save(dir)
    CompactStats(before.length, FlsFile.listDataStatuses(root, conf).length, rows)
  }
}
