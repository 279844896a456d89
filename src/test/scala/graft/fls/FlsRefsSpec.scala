package graft.fls

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Branch/tag refs on the manifest log
  * ([[FlsManifest.createBranch]] etc.): write-audit-publish. Locks
  * invisibility of branch commits on main, fast-forward publish + its
  * divergence refusal, tag pinning past the GC window, vacuum vouching
  * across refs, and drop semantics. */
class FlsRefsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-refs-spec").toString
  private val cat = "fls_refs_spec"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-refs-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(s"spark.sql.catalog.$cat", "graft.fls.connector.FlsCatalog")
      .config(s"spark.sql.catalog.$cat.path", s"$tmp/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("branch commits are invisible on main until fast_forward publishes them") {
    val tbl = s"$cat.db.wap"
    val dir = s"$tmp/warehouse/db/wap"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0), (2, 2.0)") // main v1
    spark.sql(s"CALL $cat.system.create_branch(`table` => 'db.wap', " +
      "name => 'audit')")
    // write TO THE BRANCH: lands on disk, vouched only by the branch
    spark.range(10, 13).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .write.format("fls").mode("append")
      .option("commit_mode", "manifest").option("branch", "audit").save(dir)
    // main is untouched...
    assert(ids(spark.table(tbl)) == Set(1L, 2L))
    // ...the branch sees base + its own commit, three ways
    assert(ids(spark.read.format("fls").option("branch", "audit").load(dir)) ==
      Set(1L, 2L, 10L, 11L, 12L))
    assert(ids(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 'audit'")) ==
      Set(1L, 2L, 10L, 11L, 12L))
    // vacuum at a ZERO horizon keeps the branch's unpublished files
    FlsMaintenance.vacuum(spark, dir, olderThanHours = 0)
    assert(ids(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 'audit'")) ==
      Set(1L, 2L, 10L, 11L, 12L))
    // audit passed → publish: ONE metadata commit, main now serves it
    spark.sql(s"CALL $cat.system.fast_forward(`table` => 'db.wap', " +
      "name => 'audit')")
    assert(ids(spark.table(tbl)) == Set(1L, 2L, 10L, 11L, 12L))
    assert(spark.sql(s"SELECT operation FROM $tbl.history ORDER BY version DESC")
      .collect()(0).getString(0) == "fast_forward")
  }

  test("fast_forward refuses when main advanced past the fork point") {
    val tbl = s"$cat.db.wap_race"
    val dir = s"$tmp/warehouse/db/wap_race"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)")
    spark.sql(s"CALL $cat.system.create_branch(`table` => 'db.wap_race', " +
      "name => 'b1')")
    spark.range(5, 6).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .write.format("fls").mode("append")
      .option("commit_mode", "manifest").option("branch", "b1").save(dir)
    spark.sql(s"INSERT INTO $tbl VALUES (2, 2.0)") // main advances
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.fast_forward(`table` => 'db.wap_race', name => 'b1')"))
    assert(e.getMessage.contains("advanced"), e.getMessage)
    // main kept its own commit; the branch is untouched
    assert(ids(spark.table(tbl)) == Set(1L, 2L))
    assert(ids(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 'b1'")) ==
      Set(1L, 5L))
  }

  test("drop_branch releases the lineage; vacuum reclaims its unpublished files") {
    val tbl = s"$cat.db.wap_drop"
    val dir = s"$tmp/warehouse/db/wap_drop"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)")
    spark.sql(s"CALL $cat.system.create_branch(`table` => 'db.wap_drop', " +
      "name => 'scrap')")
    spark.range(7, 9).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .write.format("fls").mode("append")
      .option("commit_mode", "manifest").option("branch", "scrap").save(dir)
    spark.sql(s"CALL $cat.system.drop_branch(`table` => 'db.wap_drop', " +
      "name => 'scrap')")
    val stats = FlsMaintenance.vacuum(spark, dir, olderThanHours = 0)
    assert(stats.deleted > 0) // the branch-only data files fell
    assert(ids(spark.table(tbl)) == Set(1L)) // main intact
    val e = intercept[Exception](spark.read.format("fls")
      .option("branch", "scrap").load(dir).collect())
    assert(e.getMessage.contains("does not exist"))
  }

  test("tags pin a version past the retention window; drop_tag releases it") {
    val tbl = s"$cat.db.tagged"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest', 'retention_versions'='2')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)") // v1
    spark.sql(s"CALL $cat.system.create_tag(`table` => 'db.tagged', " +
      "name => 'baseline')") // pins v1
    // churn far past retention_versions=2
    (2 to 8).foreach(i => spark.sql(s"INSERT INTO $tbl VALUES ($i, 1.0)"))
    // numeric v1 is GC-exempt (tagged) and the tag still resolves
    assert(ids(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 'baseline'")) ==
      Set(1L))
    assert(ids(spark.sql(s"SELECT * FROM $tbl VERSION AS OF 1")) == Set(1L))
    // v2 (untagged) aged out normally
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM $tbl VERSION AS OF 2").collect())
    assert(e.getMessage.contains("not retained"), e.getMessage)
    // immutability + release
    val e2 = intercept[Exception](spark.sql(
      s"CALL $cat.system.create_tag(`table` => 'db.tagged', " +
        "name => 'baseline', version => 7)"))
    assert(e2.getMessage.contains("already exists"))
    // and a tag of an unretained (untagged) version refuses loudly
    val e2b = intercept[Exception](spark.sql(
      s"CALL $cat.system.create_tag(`table` => 'db.tagged', " +
        "name => 'too_late', version => 3)"))
    assert(e2b.getMessage.contains("not retained"))
    spark.sql(s"CALL $cat.system.drop_tag(`table` => 'db.tagged', " +
      "name => 'baseline')")
    spark.sql(s"INSERT INTO $tbl VALUES (99, 1.0)") // next GC sweeps v1
    val e3 = intercept[Exception](spark.sql(
      s"SELECT * FROM $tbl VERSION AS OF 'baseline'").collect())
    assert(e3.getMessage.contains("none of those"), e3.getMessage)
  }

  test("ref hygiene: bad names, duplicate branch, branch without manifest") {
    val conf = spark.sessionState.newHadoopConf()
    val e0 = intercept[Exception](FlsManifest.validateRefName("main"))
    assert(e0.getMessage.contains("ref name"))
    intercept[Exception](FlsManifest.validateRefName("a/b"))
    intercept[Exception](FlsManifest.validateRefName(""))
    // all digits would be shadowed by numeric VERSION AS OF resolution
    val eNum = intercept[Exception](FlsManifest.validateRefName("42"))
    assert(eNum.getMessage.contains("all digits"))
    val tbl = s"$cat.db.hygiene"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)")
    spark.sql(s"CALL $cat.system.create_branch(`table` => 'db.hygiene', " +
      "name => 'dup')")
    val e1 = intercept[Exception](spark.sql(
      s"CALL $cat.system.create_branch(`table` => 'db.hygiene', name => 'dup')"))
    assert(e1.getMessage.contains("already exists"))
    // a write naming a nonexistent branch refuses (no silent main write)
    val e2 = intercept[Exception] {
      spark.range(1).selectExpr("id", "CAST(id AS DOUBLE) AS v")
        .write.format("fls").mode("append")
        .option("commit_mode", "manifest").option("branch", "ghost")
        .save(s"$tmp/warehouse/db/hygiene")
    }
    assert(e2.getMessage.contains("does not exist"), e2.getMessage)
    // CDF and streaming reads serve the MAIN lineage — a branch option
    // combined with either refuses instead of silently serving main
    val dir = s"$tmp/warehouse/db/hygiene"
    val e3 = intercept[Exception](spark.read.format("fls")
      .option("branch", "dup").option("read_change_feed", "true")
      .load(dir).collect())
    assert(e3.getMessage.contains("main lineage"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.readStream.format("fls").option("branch", "dup")
        .schema(spark.read.format("fls").load(dir).schema).load(dir)
        .writeStream.format("memory").queryName("refs_hygiene_stream")
        .option("checkpointLocation", s"$tmp/hygiene_ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(e4.getMessage.contains("main lineage"), e4.getMessage)
  }
}
