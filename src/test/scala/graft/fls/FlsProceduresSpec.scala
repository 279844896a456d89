package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SQL maintenance procedures (`CALL cat.system.compact/vacuum`) —
  * the pure-SQL end of [[FlsMaintenance]]. */
class FlsProceduresSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-proc-spec").toString
  private val cat = "fls_proc_spec"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-proc-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(s"spark.sql.catalog.$cat", "graft.fls.connector.FlsCatalog")
      .config(s"spark.sql.catalog.$cat.path", s"$tmp/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("CALL system.compact merges small files and reports stats") {
    val tbl = s"$cat.db.many_small"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    (0 until 5).foreach { i =>
      spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS DOUBLE) " +
        s"FROM range(${i * 100}, ${i * 100 + 100})")
    }
    val r = spark.sql(
      s"CALL $cat.system.compact(`table` => 'db.many_small', " +
        "target_rows_per_file => 100000)").collect()
    assert(r.length == 1)
    assert(r(0).getInt(0) > r(0).getInt(1), "files_before > files_after")
    assert(r(0).getLong(2) == 500L, "all rows rewritten")
    assert(spark.sql(s"SELECT count(*), sum(id) FROM $tbl").collect()(0)
      .toSeq == Seq(500L, (0L until 500L).sum))
  }

  test("CALL system.compact with zorder_by clusters both dimensions") {
    val tbl = s"$cat.db.zordered"
    spark.sql(s"CREATE TABLE $tbl (a BIGINT, b BIGINT) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl SELECT id % 97, id DIV 97 FROM range(0, 9700)")
    val r = spark.sql(
      s"CALL $cat.system.compact(`table` => 'db.zordered', " +
        "zorder_by => 'a,b', target_rows_per_file => 10000)").collect()
    assert(r(0).getLong(2) == 9700L)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE a = 5").collect()(0)
      .getLong(0) == 100L)
  }

  test("CALL system.vacuum reclaims past retention, honors history") {
    val tbl = s"$cat.db.vac"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl SELECT id FROM range(0, 100)")
    spark.sql(s"INSERT OVERWRITE $tbl SELECT id FROM range(0, 10)")
    // v1's file is still retained -> zero-horizon vacuum keeps it
    val keep = spark.sql(
      s"CALL $cat.system.vacuum(`table` => 'db.vac', older_than_hours => 0)")
      .collect()
    assert(keep(0).getInt(0) == 0, "retained versions keep their files")
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 1")
      .collect()(0).getLong(0) == 100)
    // age v1 out (KeepVersions = 8), then vacuum reclaims
    (0 until 8).foreach(i => spark.sql(s"INSERT INTO $tbl VALUES (${100 + i})"))
    val rec = spark.sql(
      s"CALL $cat.system.vacuum(`table` => 'db.vac', older_than_hours => 0)")
      .collect()
    assert(rec(0).getInt(0) > 0, "aged-out overwrite victim reclaimed")
    assert(rec(0).getLong(1) > 0L)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 18)
  }

  test("CALL system.rollback restores a retained version as a new head") {
    val tbl = s"$cat.db.rb"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl SELECT id FROM range(0, 100)") // v1: good
    spark.sql(s"INSERT OVERWRITE $tbl SELECT id FROM range(0, 5)") // v2: bad
    val r = spark.sql(
      s"CALL $cat.system.rollback(`table` => 'db.rb', version => 1)").collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 2L, "previous_version is the bad head")
    assert(r(0).getLong(1) == 1L, "restored_version is the target")
    assert(r(0).getLong(2) == 3L, "rollback publishes a NEW version")
    // head serves v1's content again, bit for bit
    val now = spark.sql(s"SELECT count(*), sum(id) FROM $tbl").collect()(0)
    val asOf = spark.sql(
      s"SELECT count(*), sum(id) FROM $tbl VERSION AS OF 1").collect()(0)
    assert(now.toSeq == asOf.toSeq && now.toSeq == Seq(100L, 4950L))
    // history preserved: the bad v2 stays readable for forensics
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 2")
      .collect()(0).getLong(0) == 5L)
    // vacuum semantics unchanged: everything retained keeps its files
    val v = spark.sql(
      s"CALL $cat.system.vacuum(`table` => 'db.rb', older_than_hours => 0)")
      .collect()
    assert(v(0).getInt(0) == 0, "rollback must not strand vouched files")
    // rolling back to the current head is a no-op, not a new version
    val same = spark.sql(
      s"CALL $cat.system.rollback(`table` => 'db.rb', version => 3)").collect()
    assert(same(0).getLong(2) == 3L, "head rollback publishes nothing")
  }

  test("rollback refuses future and unretained versions") {
    val tbl = s"$cat.db.rb2"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT) " +
      "TBLPROPERTIES ('commit_mode'='manifest')")
    (0 until 10).foreach(i => spark.sql(s"INSERT INTO $tbl VALUES ($i)"))
    val eFuture = intercept[Exception](spark.sql(
      s"CALL $cat.system.rollback(`table` => 'db.rb2', version => 99)").collect())
    assert(eFuture.getMessage.contains("newer than"), eFuture.getMessage)
    // v1 aged past KeepVersions=8 — its manifest is GC'd
    val eGone = intercept[Exception](spark.sql(
      s"CALL $cat.system.rollback(`table` => 'db.rb2', version => 1)").collect())
    assert(eGone.getMessage.contains("not retained"), eGone.getMessage)
  }

  test("SHOW PROCEDURES and DESCRIBE PROCEDURE surface the catalog") {
    val res = spark.sql(s"SHOW PROCEDURES IN $cat.system")
    val nameCol = res.schema.fieldNames
      .find(_.toLowerCase.contains("procedure")).getOrElse(res.schema.fieldNames.last)
    val shown = res.select(nameCol).collect().map(_.getString(0)).toSet
    assert(shown == Set("compact", "vacuum", "rollback",
      "evolve_partition_spec", "create_branch", "drop_branch",
      "create_tag", "drop_tag", "fast_forward", "absorb_deletes"),
      s"got $shown")
    val desc = spark.sql(s"DESCRIBE PROCEDURE $cat.system.vacuum").collect()
      .map(_.toString).mkString("\n")
    assert(desc.contains("vacuum"))
  }

  test("unknown procedure and missing table fail loudly") {
    val e1 = intercept[Exception](
      spark.sql(s"CALL $cat.system.frobnicate()").collect())
    assert(e1.getMessage.contains("compact, vacuum, rollback") ||
      e1.getMessage.toLowerCase.contains("frobnicate"))
    val e2 = intercept[Exception](
      spark.sql(s"CALL $cat.system.vacuum(`table` => 'db.nope')").collect())
    assert(e2.getMessage.toLowerCase.contains("table"))
  }
}
