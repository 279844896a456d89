package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Column DEFAULTs through the FlsCatalog ([[graft.fls.connector
  * .FlsDefaults]]): `ADD COLUMN d T DEFAULT x` is one metadata commit —
  * pre-ALTER files serve the frozen exists-default at decode, new
  * INSERTs materialize the current default at write analysis, and
  * `SET DEFAULT` changes only future INSERTs (the exists side stays
  * frozen — the standard exists-vs-current contract). */
class FlsDefaultsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-default-spec").toString
  private val cat = "fls_default_spec"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-default-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(s"spark.sql.catalog.$cat", "graft.fls.connector.FlsCatalog")
      .config(s"spark.sql.catalog.$cat.path", s"$tmp/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("ADD COLUMN DEFAULT backfills pre-ALTER rows at decode") {
    val tbl = s"$cat.db.defs"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS DOUBLE) FROM range(0, 50)")
    // three typed defaults in one metadata-only ALTER each
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN tag STRING DEFAULT 'legacy'")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN score BIGINT DEFAULT 42")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN ok BOOLEAN DEFAULT true")
    // pre-ALTER rows: every default serves, no NULLs
    val pre = spark.sql(s"SELECT DISTINCT tag, score, ok FROM $tbl").collect()
    assert(pre.length == 1 && pre(0).toSeq == Seq("legacy", 42L, true), pre.toSeq)
    // post-ALTER INSERT with explicit values keeps them
    spark.sql(s"INSERT INTO $tbl VALUES (100, 1.0, 'fresh', 7, false)")
    // post-ALTER INSERT omitting the columns materializes the CURRENT
    // default at write (Spark-side, via SUPPORT_COLUMN_DEFAULT_VALUE)
    spark.sql(s"INSERT INTO $tbl (id, v) VALUES (101, 2.0)")
    val rows = spark.sql(
      s"SELECT tag, score, ok, count(*) AS n FROM $tbl GROUP BY 1, 2, 3 ORDER BY tag")
      .collect().map(_.toSeq)
    assert(rows.toSeq == Seq(
      Seq("fresh", 7L, false, 1L),
      Seq("legacy", 42L, true, 51L)), rows.toSeq)
    // filters on the defaulted column work on pre-ALTER rows (residual
    // filters re-evaluate on served values; pruning keeps absent files)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE tag = 'legacy'")
      .collect()(0).getLong(0) == 51L)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE score = 42")
      .collect()(0).getLong(0) == 51L)
  }

  test("SET DEFAULT changes future INSERTs only — exists side is frozen") {
    val tbl = s"$cat.db.defs_set"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl VALUES (1)")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN lvl BIGINT DEFAULT 10")
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN lvl SET DEFAULT 20")
    spark.sql(s"INSERT INTO $tbl (id) VALUES (2)")
    val got = spark.sql(s"SELECT id, lvl FROM $tbl ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // row 1 predates the column → frozen exists-default 10;
    // row 2 inserted after SET DEFAULT → current default 20
    assert(got == Seq((1L, 10L), (2L, 20L)), got)
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN lvl DROP DEFAULT")
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $tbl (id) VALUES (3)"))
    assert(e.getMessage.toLowerCase.contains("default") ||
      e.getMessage.toLowerCase.contains("lvl"), e.getMessage)
    // exists side still frozen after DROP DEFAULT
    assert(spark.sql(s"SELECT lvl FROM $tbl WHERE id = 1")
      .collect()(0).getLong(0) == 10L)
  }

  test("defaults compose with time travel and DML") {
    val tbl = s"$cat.db.defs_tt"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl SELECT id FROM range(0, 20)") // v1
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN w BIGINT DEFAULT 5")
    spark.sql(s"INSERT INTO $tbl VALUES (100, 9)") // v2
    assert(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1")
      .schema.fieldNames.toSeq == Seq("id"),
      "snapshot schema: v1 predates the ALTER, so the defaulted column " +
        "is absent there (Iceberg snapshot/schema-id contract)")
    // v2 committed AFTER the ALTER: its snapshot schema has the column
    // and v1's rows serve the frozen exists-default through it
    assert(spark.sql(s"SELECT sum(w) FROM $tbl VERSION AS OF 2")
      .collect()(0).getLong(0) == 100L + 9)
    // DML reads the default: DELETE predicated on it touches old rows
    spark.sql(s"DELETE FROM $tbl WHERE w = 5 AND id < 10")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 11L)
    assert(spark.sql(s"SELECT sum(w) FROM $tbl").collect()(0).getLong(0)
      == 10L * 5 + 9)
  }

  test("DML on a plain (no-default) added column sees its NULLs") {
    // locks the r13 fix: the DELETE rewrite used to bind raw target
    // files under their own (pre-ALTER) schemas, so any predicate on a
    // later-added column failed to resolve
    val tbl = s"$cat.db.defs_plain"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl VALUES (1)")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN tag STRING")
    spark.sql(s"INSERT INTO $tbl VALUES (2, 'x')")
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE tag IS NULL")
      .collect()(0).getLong(0) == 1L)
    spark.sql(s"DELETE FROM $tbl WHERE tag IS NULL")
    val left = spark.sql(s"SELECT id, tag FROM $tbl").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(left == Seq((2L, "x")), left)
  }

  test("non-scalar defaults and nullable-less adds are rejected at DDL") {
    val tbl = s"$cat.db.defs_bad"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT)")
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $tbl ADD COLUMN arr ARRAY<BIGINT> DEFAULT array(1)"))
    assert(e.getMessage.contains("scalar") ||
      e.getMessage.toLowerCase.contains("default"), e.getMessage)
    // plain nullable ADD COLUMN (no default) still reads as NULL
    spark.sql(s"INSERT INTO $tbl VALUES (1)")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMN plain STRING")
    assert(spark.sql(s"SELECT plain FROM $tbl").collect()(0).isNullAt(0))
  }
}
