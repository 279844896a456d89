package graft.fls

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read DELETE (delete vectors): straddling files take an
  * O(deleted rows) sidecar instead of a copy-on-write rewrite —
  * the GDPR point-delete shape. Locks every read path (plain scan,
  * pushdown, aggregates, TopN/limit, nested shapes, row numbers),
  * the metadata-shortcut refusals, DV merging, time travel/vacuum/
  * incremental-read composition, compaction purge, and the
  * no-resurrection guarantees through UPDATE and copy-on-write. */
class FlsMorDeleteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-mor-spec").toString
  private val cat = "fls_mor_spec"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-mor-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(s"spark.sql.catalog.$cat", "graft.fls.connector.FlsCatalog")
      .config(s"spark.sql.catalog.$cat.path", s"$tmp/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 400 rows (id 0..399, v = id*10) in a merge-on-read manifest
    * table, written as several id-contiguous files. */
  private def morTable(name: String): (String, String) = {
    val tbl = s"$cat.db.$name"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest','delete_mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id * 10 AS DOUBLE) " +
      "FROM range(0, 400)")
    (tbl, s"$tmp/warehouse/db/$name")
  }

  private def manifestEntries(dir: String): Seq[FlsManifest.Entry] =
    FlsManifest.read(new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf()), new Path(dir)).get

  private def dvCount(dir: String): Int =
    manifestEntries(dir).count(e => FlsFileStats.dvOf(e.stats).isDefined)

  test("scattered IN-delete writes DVs, replaces no data file") {
    val (tbl, dir) = morTable("basic")
    val relsBefore = manifestEntries(dir).map(_.rel).toSet
    spark.sql(s"DELETE FROM $tbl WHERE id IN (5, 199, 395)")
    assert(manifestEntries(dir).map(_.rel).toSet == relsBefore,
      "merge-on-read must not rewrite or remove data files")
    assert(dvCount(dir) > 0, "at least one entry carries a DV pointer")
    // every read path serves the post-delete truth
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 397)
    assert(spark.sql(s"SELECT sum(id) FROM $tbl").collect()(0).getLong(0) ==
      (0L until 400L).sum - 5 - 199 - 395)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE id IN (5, 199, 395)")
      .collect()(0).getLong(0) == 0)
    // pushdown filter over a DV'd file
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE id BETWEEN 0 AND 9")
      .collect()(0).getLong(0) == 9)
    // TopN where the deleted row WAS the max: footer bound pruning
    // would serve 395
    assert(spark.sql(s"SELECT id FROM $tbl ORDER BY id DESC LIMIT 1")
      .collect()(0).getLong(0) == 399)
    assert(spark.sql(s"SELECT min(id) FROM $tbl WHERE id > 4")
      .collect()(0).getLong(0) == 6)
  }

  test("row numbers keep ORIGINAL positions across deleted gaps") {
    val (tbl, dir) = morTable("rownum")
    spark.sql(s"DELETE FROM $tbl WHERE id IN (1, 2)")
    val rows = spark.read.format("fls").option("file_row_number", "true")
      .load(dir).selectExpr("id", "file_row_number")
      .orderBy("id").limit(3).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 3L, 4L))
    // positions are file-absolute and keep the deleted gaps
    val pos = rows.map(_.getLong(1))
    assert(pos(1) - pos(0) == 3 && pos(2) - pos(1) == 1,
      s"expected gap at deleted positions, got ${pos.toSeq}")
    assert(tbl.nonEmpty)
  }

  test("second delete merges into one DV; empty-match straddle attaches none") {
    val (tbl, dir) = morTable("merge")
    spark.sql(s"DELETE FROM $tbl WHERE id IN (10, 20)")
    spark.sql(s"DELETE FROM $tbl WHERE id IN (30, 20)") // 20 already dead
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 397)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE id IN (10, 20, 30)")
      .collect()(0).getLong(0) == 0)
    // each DV'd entry points at exactly ONE current sidecar
    manifestEntries(dir).flatMap(e => FlsFileStats.dvOf(e.stats)).foreach { b =>
      assert(b.endsWith(FlsDeleteVectors.Suffix))
    }
  }

  test("decided files still drop whole (metadata path) in MOR mode") {
    val (tbl, dir) = morTable("decided")
    val before = manifestEntries(dir).size
    // id < 100 decides the first file(s) whole and straddles at most one
    spark.sql(s"DELETE FROM $tbl WHERE id < 100")
    assert(spark.sql(s"SELECT count(*), min(id) FROM $tbl").collect()(0)
      .toSeq == Seq(300L, 100L))
    assert(manifestEntries(dir).size <= before, "decided files left the manifest")
  }

  test("nested shapes (struct/array/map) gather correctly under a DV") {
    val tbl = s"$cat.db.nested"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, s STRUCT<a: BIGINT, b: STRING>, " +
      "arr ARRAY<BIGINT>, m MAP<STRING, BIGINT>) TBLPROPERTIES " +
      "('commit_mode'='manifest','delete_mode'='merge-on-read')")
    spark.sql(s"""INSERT INTO $tbl
      SELECT id, named_struct('a', id * 2, 'b', concat('x', id)),
             array(id, id + 1, id + 2), map('k', id)
      FROM range(0, 100)""")
    spark.sql(s"DELETE FROM $tbl WHERE id IN (0, 50, 99)")
    val r = spark.sql(s"""SELECT count(*), sum(s.a), sum(arr[1]),
        sum(element_at(m, 'k')), min(s.b) FROM $tbl""").collect()(0)
    val ids = (0L until 100L).filterNot(Set(0L, 50L, 99L))
    assert(r.getLong(0) == 97)
    assert(r.getLong(1) == ids.map(_ * 2).sum)
    assert(r.getLong(2) == ids.map(_ + 1).sum)
    assert(r.getLong(3) == ids.sum)
    assert(r.getString(4) == "x1")
    // array sizes survive the gather (offsets rebased correctly)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE size(arr) != 3")
      .collect()(0).getLong(0) == 0)
  }

  test("time travel, vacuum, and incremental reads compose with DVs") {
    val (tbl, dir) = morTable("travel")                      // v1
    spark.sql(s"DELETE FROM $tbl WHERE id IN (7, 8)")        // v2 (DV)
    spark.sql(s"INSERT INTO $tbl VALUES (1000, 0.0)")        // v3
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 1")
      .collect()(0).getLong(0) == 400, "pre-DV snapshot sees deleted rows")
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 2")
      .collect()(0).getLong(0) == 398)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 399)
    // vacuum(0): v2's DV is retained — must survive
    FlsMaintenance.vacuum(spark, dir, olderThanHours = 0)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 2")
      .collect()(0).getLong(0) == 398)
    // incremental: (2, 3] is append-only; (1, 2] crossed the DV commit
    assert(spark.read.option("changes_from_version", "2")
      .option("changes_to_version", "3").table(tbl).count() == 1)
    val e = intercept[Exception](spark.read.option("changes_from_version", "1")
      .option("changes_to_version", "2").table(tbl).count())
    assert(e.getMessage.contains("not append-only"))
  }

  test("compaction absorbs DVs; aged-out sidecars are vacuumed") {
    val (tbl, dir) = morTable("absorb")
    spark.sql(s"DELETE FROM $tbl WHERE id IN (3, 4)")
    assert(dvCount(dir) > 0)
    FlsMaintenance.compact(spark, dir, targetRowsPerFile = 100000)
    assert(dvCount(dir) == 0, "compacted entries carry no DV pointers")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 398)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE id IN (3, 4)")
      .collect()(0).getLong(0) == 0)
    // age the DV'd versions out, then vacuum reclaims the sidecar
    (0 until 8).foreach(i => spark.sql(s"INSERT INTO $tbl VALUES (${2000 + i}, 0.0)"))
    FlsMaintenance.vacuum(spark, dir, olderThanHours = 0)
    def dvOnDisk(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(FlsDeleteVectors.Suffix)) 1 else 0
      walk(new java.io.File(dir))
    }
    assert(dvOnDisk() == 0, "no retained version names the DV any more")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 406)
  }

  test("UPDATE after a MOR delete does not resurrect deleted rows") {
    val (tbl, _) = morTable("upd")
    spark.sql(s"DELETE FROM $tbl WHERE id IN (11, 12)")
    spark.sql(s"UPDATE $tbl SET v = -1 WHERE id = 13") // rewrites the DV'd file
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 398)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE id IN (11, 12)")
      .collect()(0).getLong(0) == 0)
    assert(spark.sql(s"SELECT v FROM $tbl WHERE id = 13").collect()(0)
      .getDouble(0) == -1.0)
  }

  test("a later copy-on-write delete does not resurrect DV'd rows") {
    val tbl = s"$cat.db.cow_after"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest','delete_mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS DOUBLE) FROM range(0, 400)")
    spark.sql(s"DELETE FROM $tbl WHERE id IN (17, 18)")
    // flip the table to copy-on-write and delete a straddling band:
    // the rewrite must anti-join the DV'd positions out first
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('delete_mode'='copy-on-write')")
    spark.sql(s"DELETE FROM $tbl WHERE id BETWEEN 15 AND 16")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 396)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE id IN (15, 16, 17, 18)")
      .collect()(0).getLong(0) == 0)
  }

  test("wide MOR delete (past the old 4M driver cap) writes DVs task-side") {
    // the r12 design collect()ed every matched position to the driver
    // behind a 4M cap; sidecars are now written task-side (repartition
    // by file), so a wider-than-cap delete just works — the driver only
    // hauls one row per touched file
    val tbl = s"$cat.db.wide"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT) TBLPROPERTIES " +
      "('commit_mode'='manifest','delete_mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $tbl SELECT id FROM range(0, 5000000)")
    spark.sql(s"DELETE FROM $tbl WHERE id % 10 != 0") // 4.5M positions
    assert(spark.sql(s"SELECT count(*), sum(id) FROM $tbl").collect()(0).toSeq
      == Seq(500000L, (0L until 5000000L by 10).sum),
      "exactly the surviving decile remains")
    // every straddled file carries a DV; nothing was rewritten
    val dvd = spark.sql(s"SELECT count(*) FROM $tbl.files WHERE has_dv")
      .collect()(0).getLong(0)
    assert(dvd > 0, "wide delete must land as delete vectors")
  }

  test("guard rails: mode validation, bulk cap, listing-mode refusal") {
    val e1 = intercept[Exception] {
      val t = s"$cat.db.badmode"
      spark.sql(s"CREATE TABLE $t (id BIGINT) TBLPROPERTIES " +
        "('commit_mode'='manifest','delete_mode'='sideways')")
      spark.sql(s"INSERT INTO $t VALUES (1)")
      spark.sql(s"DELETE FROM $t WHERE id IN (1)")
    }
    assert(e1.getMessage.contains("delete_mode"))
    // bulk delete beyond the position cap names the remedy
    val t2 = s"$cat.db.bulk"
    spark.sql(s"CREATE TABLE $t2 (id BIGINT) TBLPROPERTIES " +
      "('commit_mode'='manifest','delete_mode'='merge-on-read'," +
      "'merge_on_read_max_rows'='10')")
    spark.sql(s"INSERT INTO $t2 SELECT id FROM range(0, 100)")
    val e2 = intercept[Exception](
      spark.sql(s"DELETE FROM $t2 WHERE id >= 1 AND id <= 50"))
    assert(e2.getMessage.contains("merge_on_read_max_rows"))
    assert(spark.sql(s"SELECT count(*) FROM $t2").collect()(0).getLong(0) == 100,
      "failed bulk MOR delete changed nothing")
  }
}
