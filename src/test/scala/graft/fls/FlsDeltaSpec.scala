package graft.fls

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Delta (merge-on-read) row-level operations: UPDATE / MERGE /
  * unpushable DELETE as delete vectors + appended rows — no file
  * rewrites. The `(_fls_file, _fls_pos)` metadata-column row identity,
  * per-command mode knobs, partition routing, and composition with
  * time travel and compaction. */
class FlsDeltaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-delta-spec").toString
  private val cat = "fls_delta_spec"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-delta-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(s"spark.sql.catalog.$cat", "graft.fls.connector.FlsCatalog")
      .config(s"spark.sql.catalog.$cat.path", s"$tmp/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def mk(name: String, props: String): (String, String) = {
    val tbl = s"$cat.db.$name"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      s"('commit_mode'='manifest'$props)")
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS DOUBLE) FROM range(0, 300)")
    (tbl, s"$tmp/warehouse/db/$name")
  }

  private def dataRels(dir: String): Set[String] =
    FlsManifest.read(new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf()), new Path(dir)).get.map(_.rel).toSet

  test("metadata columns _fls_file/_fls_pos are queryable") {
    val (tbl, _) = mk("meta", "")
    val r = spark.sql(s"SELECT _fls_file, _fls_pos, id FROM $tbl " +
      "ORDER BY id LIMIT 2").collect()
    assert(r(0).getString(0).endsWith(".fls"))
    assert(r(0).getLong(2) == 0L)
    // positions are file-absolute: the first row of its file is 0
    assert(r(0).getLong(1) == 0L)
    assert(spark.sql(s"SELECT count(DISTINCT _fls_file) FROM $tbl")
      .collect()(0).getLong(0) >= 1)
  }

  test("merge-on-read UPDATE appends a row + a DV, replaces no file") {
    val (tbl, dir) = mk("upd", ",'update_mode'='merge-on-read'")
    val before = dataRels(dir)
    spark.sql(s"UPDATE $tbl SET v = -7 WHERE id = 42")
    val after = dataRels(dir)
    assert(before.subsetOf(after), "no data file was replaced or removed")
    assert((after -- before).nonEmpty, "the updated row appended a new file")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 300)
    assert(spark.sql(s"SELECT v FROM $tbl WHERE id = 42").collect()(0)
      .getDouble(0) == -7.0)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE v = CAST(42 AS DOUBLE)")
      .collect()(0).getLong(0) == 0, "the old row version is gone")
    // a second update of the SAME row works against the merged DV
    spark.sql(s"UPDATE $tbl SET v = -8 WHERE id = 42")
    assert(spark.sql(s"SELECT v FROM $tbl WHERE id = 42").collect()(0)
      .getDouble(0) == -8.0)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 300)
  }

  test("merge-on-read DELETE handles unpushable predicates without rewrites") {
    val (tbl, dir) = mk("del", ",'delete_mode'='merge-on-read'")
    val before = dataRels(dir)
    spark.sql(s"DELETE FROM $tbl WHERE id % 10 = 3") // not a pushable Filter
    assert(dataRels(dir) == before, "delta delete must not touch data files")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 270)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE id % 10 = 3")
      .collect()(0).getLong(0) == 0)
  }

  test("merge-on-read MERGE: matched updates + unmatched inserts") {
    val (tbl, dir) = mk("mrg", ",'merge_mode'='merge-on-read'")
    val before = dataRels(dir)
    spark.range(295, 305).selectExpr("id", "CAST(-1 AS DOUBLE) AS v")
      .createOrReplaceTempView("delta_src")
    spark.sql(s"""MERGE INTO $tbl t USING delta_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
    assert(before.subsetOf(dataRels(dir)))
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 305)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE v = -1")
      .collect()(0).getLong(0) == 10, "5 matched updates + 5 inserts")
    assert(spark.sql(s"SELECT sum(id) FROM $tbl").collect()(0).getLong(0) ==
      (0L until 305L).sum)
  }

  test("partitioned table: delta UPDATE routes new rows into the layout") {
    val tbl = s"$cat.db.part_upd"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('commit_mode'='manifest'," +
      "'update_mode'='merge-on-read')")
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS DOUBLE), " +
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(0, 100)")
    spark.sql(s"UPDATE $tbl SET v = 0 WHERE id = 8") // stays in p='a'
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE p = 'a'")
      .collect()(0).getLong(0) == 50)
    assert(spark.sql(s"SELECT v FROM $tbl WHERE id = 8").collect()(0)
      .getDouble(0) == 0.0)
    val dir = s"$tmp/warehouse/db/part_upd"
    val newRel = dataRels(dir).find(_.contains("p=a")).get
    assert(newRel.startsWith("p=a/"), "appended row landed in its partition dir")
  }

  test("delta ops compose: time travel sees pre-update rows; compaction absorbs") {
    val (tbl, dir) = mk("compose", ",'update_mode'='merge-on-read'")
    spark.sql(s"UPDATE $tbl SET v = 999 WHERE id IN (1, 2)") // v2
    assert(spark.sql(s"SELECT sum(v) FROM $tbl VERSION AS OF 1 " +
      "WHERE id IN (1, 2)").collect()(0).getDouble(0) == 3.0)
    assert(spark.sql(s"SELECT sum(v) FROM $tbl WHERE id IN (1, 2)")
      .collect()(0).getDouble(0) == 1998.0)
    FlsMaintenance.compact(spark, dir, targetRowsPerFile = 100000)
    assert(spark.sql(s"SELECT count(*), sum(v) FROM $tbl").collect()(0)
      .toSeq == Seq(300L, (0L until 300L).filterNot(Set(1L, 2L)).sum
        .toDouble + 1998.0))
  }

  test("default modes stay copy-on-write") {
    val (tbl, dir) = mk("cow", "")
    val before = dataRels(dir)
    spark.sql(s"UPDATE $tbl SET v = -1 WHERE id = 5")
    assert((before -- dataRels(dir)).nonEmpty,
      "copy-on-write UPDATE replaces the affected file")
    assert(spark.sql(s"SELECT v FROM $tbl WHERE id = 5").collect()(0)
      .getDouble(0) == -1.0)
  }
}
