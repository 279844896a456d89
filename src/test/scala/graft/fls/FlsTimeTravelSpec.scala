package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Time travel over the manifest log: `VERSION AS OF` / `TIMESTAMP AS
  * OF` through [[graft.fls.connector.FlsCatalog]], the `.history`
  * metadata table, pinned-snapshot immutability, and the retention
  * contract (vacuum honors EVERY retained version; GC'd versions fail
  * loudly). The reference engine is single-version by construction
  * (one writer, one footer — /root/reference/src/writer/fls_writer.cpp);
  * versioned reads are host-side table-format surface. */
class FlsTimeTravelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-tt-spec").toString
  private val cat = "fls_tt_spec"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-tt-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(s"spark.sql.catalog.$cat", "graft.fls.connector.FlsCatalog")
      .config(s"spark.sql.catalog.$cat.path", s"$tmp/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** CREATE + three commits (INSERT, INSERT, copy-on-write DELETE) with
    * strictly ordered commit mtimes. */
  private def buildTable(name: String): String = {
    val tbl = s"$cat.db.$name"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(0, 100)")
    Thread.sleep(30)
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(100, 200)")
    Thread.sleep(30)
    spark.sql(s"DELETE FROM $tbl WHERE id % 2 = 0") // not file-decidable
    tbl
  }

  test("VERSION AS OF reads each retained commit, incl. pre-rewrite files") {
    val tbl = buildTable("versions")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 100)
    // v3's DELETE physically rewrote v1/v2's files; v1 must still read
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 1")
      .collect()(0).getLong(0) == 100)
    assert(spark.sql(s"SELECT sum(id) FROM $tbl VERSION AS OF 1")
      .collect()(0).getLong(0) == 99L * 100 / 2)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 2")
      .collect()(0).getLong(0) == 200)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 3")
      .collect()(0).getLong(0) == 100)
    // unknown / non-numeric versions fail loudly, naming the remedy
    val e1 = intercept[Exception](
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 99").collect())
    assert(e1.getMessage.contains("not retained"))
    val e2 = intercept[Exception](
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 'abc'").collect())
    assert(e2.getMessage.contains("numeric"))
  }

  test("history lists retained commits newest-first; TIMESTAMP AS OF resolves by it") {
    val tbl = buildTable("asof")
    val hist = spark.sql(
      s"SELECT version, unix_micros(committed_at) AS us, n_files, " +
        s"total_bytes, n_rows FROM $tbl.history").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L), "newest first")
    val us = hist.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(us(1) < us(2) && us(2) < us(3), "commit times strictly ordered")
    assert(hist.forall(_.getLong(2) > 0), "every version has files")
    assert(hist.forall(_.getLong(3) > 0), "every version has bytes")
    // writers carry manifest stats, so history can report exact rows
    val rows = hist.map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(rows == Map(1L -> 100L, 2L -> 200L, 3L -> 100L))

    def countAsOf(micros: Long): Long =
      spark.sql(s"SELECT count(*) FROM $tbl TIMESTAMP AS OF " +
        s"timestamp_micros($micros)").collect()(0).getLong(0)
    assert(countAsOf(us(1)) == 100, "at v1's own instant -> v1")
    assert(countAsOf((us(1) + us(2)) / 2) == 100, "between v1 and v2 -> v1")
    assert(countAsOf(us(2)) == 200)
    assert(countAsOf(us(3) + 60L * 1000000) == 100, "future -> newest")
    val e = intercept[Exception](countAsOf(us(1) - 60L * 1000000))
    assert(e.getMessage.contains("predates"))
  }

  test("pinned snapshots are read-only") {
    val tbl = buildTable("readonly")
    val dir = s"$tmp/warehouse/db/readonly"
    val e = intercept[Exception] {
      spark.range(5).selectExpr("id", "CAST(id AS DOUBLE) AS v")
        .write.format("fls").option("manifest_version", "1")
        .mode("append").save(dir)
    }
    assert(e.getMessage.contains("read-only"))
    // and the failed attempt changed nothing
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 1")
      .collect()(0).getLong(0) == 100)
  }

  test("manifest-mode truncate retains replaced files for pinned readers") {
    val tbl = buildTable("truncated")
    val dir = s"$tmp/warehouse/db/truncated"
    spark.range(7).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .write.format("fls").option("commit_mode", "manifest")
      .mode("overwrite").save(dir)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 7)
    // versions 1-3 still resolve across the truncating overwrite (v4)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 2")
      .collect()(0).getLong(0) == 200)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 4")
      .collect()(0).getLong(0) == 7)
  }

  test("vacuum vouches every retained version; files die with their last version") {
    val tbl = buildTable("vacuumed")
    val dir = s"$tmp/warehouse/db/vacuumed"

    // an aggressive vacuum (0h horizon) must NOT break retained history
    FlsMaintenance.vacuum(spark, dir, olderThanHours = 0)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 1")
      .collect()(0).getLong(0) == 100)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 3")
      .collect()(0).getLong(0) == 100)

    // push v1 (and its replaced files) past the retention window:
    // KeepVersions = 8, so eight more commits GC versions 1-2
    (0 until 8).foreach { i =>
      spark.sql(s"INSERT INTO $tbl VALUES (${1000 + i}, 0.0)")
    }
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1").collect())
    assert(e.getMessage.contains("not retained"))
    // now vacuum CAN reclaim the files only GC'd versions named.
    // Count PHYSICAL .fls files (listDataFiles on a manifest table
    // reports the manifest view, which vacuum never changes)
    def onDisk(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".fls")) 1 else 0
      walk(new java.io.File(dir))
    }
    val before = onDisk()
    val stats = FlsMaintenance.vacuum(spark, dir, olderThanHours = 0)
    assert(stats.deleted > 0, "unreferenced pre-rewrite files reclaimed")
    assert(onDisk() < before)
    // every retained version still reads whole
    val hist = spark.sql(s"SELECT version FROM $tbl.history").collect()
      .map(_.getLong(0))
    hist.foreach { v =>
      spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF $v").collect()
    }
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 108)
  }

  test("incremental read plans exactly the files a commit range added") {
    val tbl = buildTable("incr")
    // (1, 2]: INSERT #2's rows only
    val r12 = spark.read.option("changes_from_version", "1")
      .option("changes_to_version", "2").table(tbl)
    assert(r12.count() == 100)
    assert(r12.agg(org.apache.spark.sql.functions.min("id"))
      .collect()(0).getLong(0) == 100)
    // (0, 1]: since creation
    assert(spark.read.option("changes_from_version", "0")
      .option("changes_to_version", "1").table(tbl).count() == 100)
    // empty range reads zero rows, not an error
    assert(spark.read.option("changes_from_version", "2")
      .option("changes_to_version", "2").table(tbl).count() == 0)
    // default to-version = newest... but (2, 3] crosses v3's rewrite:
    // the added files re-serve surviving v1/v2 rows — must refuse
    val e = intercept[Exception](
      spark.read.option("changes_from_version", "2").table(tbl).count())
    assert(e.getMessage.contains("not append-only"))
    // a pinned snapshot and a commit range are different questions
    val e2 = intercept[Exception](
      spark.read.option("changes_from_version", "1")
        .option("manifest_version", "2").table(tbl).count())
    assert(e2.getMessage.contains("mutually exclusive"))
  }

  test("incremental read composes with pushdown on the path surface") {
    val tbl = buildTable("incrpath")
    val dir = s"$tmp/warehouse/db/incrpath"
    val df = spark.read.format("fls")
      .option("changes_from_version", "1")
      .option("changes_to_version", "2")
      .load(dir)
      .filter(org.apache.spark.sql.functions.col("id") >= 150)
      .select("id")
    assert(df.count() == 50)
    assert(tbl.nonEmpty)
  }

  test("incremental read on a PARTITIONED table composes with partition pruning") {
    val tbl = s"$cat.db.incr_part"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, dt STRING) " +
      "PARTITIONED BY (dt) TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(0, 100)")
    spark.sql(s"INSERT INTO $tbl SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(100, 300)")
    val dir = s"$tmp/warehouse/db/incr_part"
    val delta = spark.read.format("fls")
      .option("changes_from_version", "1").load(dir)
    assert(delta.count() == 200, "only commit 2's rows")
    // partition filter on the delta: half the added files prune away
    assert(delta.filter(org.apache.spark.sql.functions.col("dt") === "a")
      .count() == 100)
    assert(delta.agg(org.apache.spark.sql.functions.min("id"))
      .collect()(0).getLong(0) == 100)
  }

  test("time travel binds to the SNAPSHOT schema stamped at each commit") {
    // the Iceberg snapshot/schema-id contract: each manifest commit
    // stamps the table-meta version in force (#schema header), and
    // VERSION AS OF serves data through THAT schema — pre-ALTER
    // versions show the old names, old types, and no later columns
    val tbl = s"$cat.db.evolved_tt"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, amt INT) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS INT) FROM range(0, 10)")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN tag STRING")
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN amt TYPE BIGINT")
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN amt TO amount")
    spark.sql(s"INSERT INTO $tbl SELECT id, id * 10, concat('t', id) " +
      "FROM range(10, 15)")
    val v1 = spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1")
    // v1 predates every ALTER: original name, original narrow type,
    // no tag column
    assert(v1.schema.fieldNames.toSeq == Seq("id", "amt"))
    assert(v1.schema("amt").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val rows = v1.orderBy("id").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(1)).toSeq == (0 until 10))
    // v2 commits AFTER the three ALTERs: current names/types travel
    val v2 = spark.sql(s"SELECT * FROM $tbl VERSION AS OF 2")
    assert(v2.schema.fieldNames.toSeq == Seq("id", "amount", "tag"))
    assert(v2.schema("amount").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(v2.count() == 15)
    // the head keeps serving the current schema as always
    assert(spark.table(tbl).schema.fieldNames.toSeq ==
      Seq("id", "amount", "tag"))
    // .history exposes which schema epoch each commit stamped:
    // v1 under meta v1 (CREATE), v2 under meta v4 (after three ALTERs)
    val sv = spark.sql(
      s"SELECT version, schema_version FROM $tbl.history")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sv == Map(1L -> 1L, 2L -> 4L), sv.toString)
  }

  test("snapshot schema resurrects a column dropped AFTER the snapshot") {
    val tbl = s"$cat.db.dropped_tt"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, secret STRING) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl SELECT id, concat('s', id) FROM range(0, 5)")
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN secret")
    spark.sql(s"INSERT INTO $tbl SELECT id FROM range(5, 8)")
    // head: the column is gone
    assert(spark.table(tbl).schema.fieldNames.toSeq == Seq("id"))
    // v1: the snapshot schema still declares it, old files still store
    // it — values come back, not NULLs
    val v1 = spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1").orderBy("id")
    assert(v1.schema.fieldNames.toSeq == Seq("id", "secret"))
    assert(v1.collect().map(_.getString(1)).toSeq ==
      (0 until 5).map(i => s"s$i"))
  }

  test("pre-stamp manifests fall back to the current schema (legacy stance)") {
    val tbl = s"$cat.db.prestamp_tt"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, amt INT) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS INT) FROM range(0, 10)")
    // simulate a manifest committed before the #schema stamp existed:
    // strip the header line from v1 in place
    val p = new java.io.File(
      s"$tmp/warehouse/db/prestamp_tt/_fls_manifest_log")
      .listFiles().minBy(_.getName)
    val kept = scala.io.Source.fromFile(p).getLines()
      .filterNot(_.startsWith("#schema")).mkString("\n") + "\n"
    val w = new java.io.FileWriter(p); w.write(kept); w.close()
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN tag STRING")
    val v1 = spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1")
    assert(v1.schema.fieldNames.toSeq == Seq("id", "amt", "tag"),
      "unstamped version serves the current schema")
    assert(v1.count() == 10)
  }

  test(".files lists live files with DV, partition, and version provenance") {
    val tbl = s"$cat.db.filesmeta"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('commit_mode'='manifest','delete_mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS DOUBLE) FROM range(0, 100)")
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS DOUBLE) FROM range(100, 200)")
    spark.sql(s"DELETE FROM $tbl WHERE id = 5") // v3: a DV, no rewrite
    val files = spark.sql(s"SELECT file, bytes, n_rows, has_dv, dv_file, " +
      s"version_added FROM $tbl.files").collect()
    assert(files.nonEmpty)
    assert(files.forall(_.getLong(1) > 0), "bytes from the manifest")
    // stats describe the physical superset: the DV'd row still counts
    assert(files.map(_.getLong(2)).sum == 200, "n_rows from manifest stats")
    val dvd = files.filter(_.getBoolean(3))
    assert(dvd.length == 1, s"exactly one file carries the DV, got ${dvd.length}")
    assert(dvd(0).getString(4) != null && dvd(0).getString(4).endsWith(".dv"))
    assert(files.filterNot(_.getBoolean(3)).forall(_.isNullAt(4)))
    // provenance: both commits' files attribute to their version; the
    // DV'd file keeps its original rel, so it stays version 1
    assert(files.map(_.getLong(5)).toSet == Set(1L, 2L))
    assert(dvd(0).getLong(5) == 1L)
    // flat table: no partition component
    val parts0 = spark.sql(s"SELECT partition FROM $tbl.files").collect()
    assert(parts0.forall(_.isNullAt(0)), "flat tables have null partition")

    // partitioned table: partition = the hive subdir; GROUP BY is the
    // partition-size report
    val ptbl = s"$cat.db.filesmeta_part"
    spark.sql(s"CREATE TABLE $ptbl (id BIGINT, p STRING) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $ptbl SELECT id, CASE WHEN id < 50 THEN 'a' " +
      "ELSE 'b' END FROM range(0, 100)")
    val parts = spark.sql(s"SELECT partition, sum(bytes), sum(n_rows) " +
      s"FROM $ptbl.files GROUP BY partition ORDER BY partition").collect()
    assert(parts.map(_.getString(0)).toSeq == Seq("p=a", "p=b"), "hive dirs")
    assert(parts.forall(r => r.getLong(1) > 0 && r.getLong(2) == 50L))

    // partition-filter pushdown: a predicate on `partition` caps the
    // driver materialization to the matching entries (the one LocalScan
    // that grows with table size stays filter-sized)
    val total = spark.sql(s"SELECT count(*) FROM $ptbl.files")
      .collect()(0).getLong(0)
    graft.fls.connector.FlsFilesTable.lastMaterialized.set(-1L)
    val aOnly = spark.sql(
      s"SELECT file FROM $ptbl.files WHERE partition = 'p=a'").collect()
    assert(aOnly.nonEmpty && aOnly.forall(_.getString(0).startsWith("p=a/")))
    val materialized = graft.fls.connector.FlsFilesTable.lastMaterialized.get()
    assert(materialized == aOnly.length && materialized < total,
      s"materialized=$materialized result=${aOnly.length} total=$total")
    // and the residual still evaluates exactly (no over-pruning): an
    // undecidable predicate keeps everything but answers right
    assert(spark.sql(s"SELECT count(*) FROM $ptbl.files " +
      "WHERE length(file) > 0").collect()(0).getLong(0) == total)
  }

  test("retention_versions overrides the per-table version budget") {
    // DEEP retention: v1 survives 10 extra commits (default 8 would GC)
    val deep = s"$cat.db.deep_ret"
    spark.sql(s"CREATE TABLE $deep (id BIGINT) TBLPROPERTIES " +
      "('commit_mode'='manifest','retention_versions'='20')")
    spark.sql(s"INSERT INTO $deep SELECT id FROM range(0, 10)")
    (0 until 10).foreach(i => spark.sql(s"INSERT INTO $deep VALUES (${100 + i})"))
    assert(spark.sql(s"SELECT count(*) FROM $deep VERSION AS OF 1")
      .collect()(0).getLong(0) == 10)

    // SHALLOW retention: only the newest 2 versions stay readable
    val shallow = s"$cat.db.shallow_ret"
    spark.sql(s"CREATE TABLE $shallow (id BIGINT) TBLPROPERTIES " +
      "('commit_mode'='manifest','retention_versions'='2')")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO $shallow VALUES ($i)"))
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $shallow VERSION AS OF 1").collect())
    assert(e.getMessage.contains("not retained"))
    assert(spark.sql(s"SELECT count(*) FROM $shallow VERSION AS OF 2")
      .collect()(0).getLong(0) == 2)

    // junk budgets refuse at DDL, never silently default at GC
    val e2 = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.db.bad_ret (id BIGINT) TBLPROPERTIES " +
        "('commit_mode'='manifest','retention_versions'='lots')"))
    assert(e2.getMessage.contains("retention_versions"))
    val e3 = intercept[Exception](spark.sql(
      s"ALTER TABLE $shallow SET TBLPROPERTIES ('retention_versions'='0')"))
    assert(e3.getMessage.contains("retention_versions"))

    // raising retention via ALTER protects FUTURE commits' history
    spark.sql(s"ALTER TABLE $shallow SET TBLPROPERTIES " +
      "('retention_versions'='10')")
    spark.sql(s"INSERT INTO $shallow VALUES (4)")
    assert(spark.sql(s"SELECT count(*) FROM $shallow VERSION AS OF 2")
      .collect()(0).getLong(0) == 2, "v2 survives under the raised budget")
  }

  test("tight retention_versions lets vacuum reclaim replaced files sooner") {
    val tbl = s"$cat.db.tight_vacuum"
    val dir = s"$tmp/warehouse/db/tight_vacuum"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT) TBLPROPERTIES " +
      "('commit_mode'='manifest','retention_versions'='2')")
    spark.sql(s"INSERT INTO $tbl SELECT id FROM range(0, 100)") // v1
    spark.sql(s"INSERT OVERWRITE $tbl SELECT id FROM range(0, 5)") // v2
    // under the default 8-version budget v1 would stay vouched for six
    // more commits; with a 2-version budget ONE more commit retires it
    spark.sql(s"INSERT INTO $tbl VALUES (999)") // v3 — GCs v1
    val stats = FlsMaintenance.vacuum(spark, dir, olderThanHours = 0)
    assert(stats.deleted > 0,
      "v1's replaced files fall to vacuum as soon as the tight budget " +
        "retires the version")
    // every still-retained version reads whole
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 6)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 2")
      .collect()(0).getLong(0) == 5)
  }

  test("history on a non-table name still errors as NoSuchTable") {
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.db.no_such_table.history").collect())
    assert(e.getMessage.toLowerCase.contains("table"))
  }
}
