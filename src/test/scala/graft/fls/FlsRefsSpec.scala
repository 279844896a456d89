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

  test("fork point survives branch-log GC: fast_forward stays correct " +
      "past retention_versions branch commits") {
    val tbl = s"$cat.db.wap_gc"
    val dir = s"$tmp/warehouse/db/wap_gc"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest', 'retention_versions'='2')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)") // main v1 = fork point
    spark.sql(s"CALL $cat.system.create_branch(`table` => 'db.wap_gc', " +
      "name => 'long')")
    // three branch commits: branch log GC keeps only the last 2, so
    // min(retained branch versions) drifts to v3 — past the true fork
    (10L to 12L).foreach { i =>
      spark.range(i, i + 1).selectExpr("id", "CAST(id AS DOUBLE) AS v")
        .write.format("fls").mode("append")
        .option("commit_mode", "manifest").option("branch", "long").save(dir)
    }
    assert(FlsManifest.forkVersion(
      new Path(dir).getFileSystem(spark.sessionState.newHadoopConf()),
      new Path(dir), "long") == 1L)
    // main has NOT advanced → the publish is legitimate and must land
    // (pre-marker code compared against the drifted min and refused)
    spark.sql(s"CALL $cat.system.fast_forward(`table` => 'db.wap_gc', " +
      "name => 'long')")
    assert(ids(spark.table(tbl)) == Set(1L, 10L, 11L, 12L))
  }

  test("fork point survives branch-log GC: the drifted-min false pass " +
      "(main at exactly the branch's min) is refused, not published") {
    val tbl = s"$cat.db.wap_lost"
    val dir = s"$tmp/warehouse/db/wap_lost"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest', 'retention_versions'='2')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)") // main v1 = fork
    spark.sql(s"CALL $cat.system.create_branch(`table` => 'db.wap_lost', " +
      "name => 'b')")
    (20L to 22L).foreach { i => // branch → v4; its retained min is v3
      spark.range(i, i + 1).selectExpr("id", "CAST(id AS DOUBLE) AS v")
        .write.format("fls").mode("append")
        .option("commit_mode", "manifest").option("branch", "b").save(dir)
    }
    // main advances to v3 — equal to the branch log's drifted min, the
    // exact coincidence that made the pre-marker guard falsely pass and
    // silently drop main's commits
    spark.sql(s"INSERT INTO $tbl VALUES (2, 2.0)")
    spark.sql(s"INSERT INTO $tbl VALUES (3, 3.0)")
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.fast_forward(`table` => 'db.wap_lost', name => 'b')"))
    assert(e.getMessage.contains("advanced"), e.getMessage)
    assert(ids(spark.table(tbl)) == Set(1L, 2L, 3L)) // nothing dropped
  }

  test("a malformed tag file is skipped with a warning, not a bricked table") {
    val tbl = s"$cat.db.tag_junk"
    val dir = s"$tmp/warehouse/db/tag_junk"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)")
    spark.sql(s"CALL $cat.system.create_tag(`table` => 'db.tag_junk', " +
      "name => 'good')")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val junk = new Path(FlsManifest.tagsDir(new Path(dir)), "editor-backup")
    val out = fs.create(junk, true)
    try out.write("not a version".getBytes("UTF-8")) finally out.close()
    // every commit runs tags() for GC protection — must keep working
    spark.sql(s"INSERT INTO $tbl VALUES (2, 2.0)")
    assert(ids(spark.table(tbl)) == Set(1L, 2L))
    val tags = FlsManifest.tags(fs, new Path(dir))
    assert(tags.keySet == Set("good")) // junk skipped, real tag served
  }

  test("CDF 'earliest' skips the GC hole a pinned tag punches in the " +
      "retained-version set") {
    val tbl = s"$cat.db.tag_hole"
    val dir = s"$tmp/warehouse/db/tag_hole"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest', 'retention_versions'='2')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)") // v1
    spark.sql(s"CALL $cat.system.create_tag(`table` => 'db.tag_hole', " +
      "name => 'pin')") // v1 GC-exempt forever
    (2 to 8).foreach(i => spark.sql(s"INSERT INTO $tbl VALUES ($i, 1.0)"))
    // retained now: {1 (tagged), 7, 8} — v2..v6 are a GC hole. A full-
    // range feed must start at the contiguous suffix (from=7 → serve
    // v8), not at min=1 (planning v2 would throw 'not retained').
    val rows = spark.read.format("fls").option("read_change_feed", "true")
      .load(dir).collect()
    assert(rows.nonEmpty)
    val versions = rows.map(_.getAs[Long]("_commit_version")).toSet
    assert(versions == Set(8L), versions.toString)
  }

  test("merge-on-read DML on a branch refuses loudly (no silent main commit)") {
    val tbl = s"$cat.db.wap_mor"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest', 'delete_mode'='merge-on-read', " +
      "'branch'='audit2')")
    // the branch property routes APPENDS to the branch once it exists
    val e0 = intercept[Exception](
      spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)"))
    assert(e0.getMessage.contains("does not exist"), e0.getMessage)
    // bootstrap: main needs a first commit before branching, so commit
    // via a branch-less path write, then branch, then write to the branch
    val dir = s"$tmp/warehouse/db/wap_mor"
    spark.range(1, 3).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .write.format("fls").mode("append")
      .option("commit_mode", "manifest").save(dir)
    spark.sql(s"CALL $cat.system.create_branch(`table` => 'db.wap_mor', " +
      "name => 'audit2')")
    spark.sql(s"INSERT INTO $tbl VALUES (10, 10.0)") // lands on the branch
    // row-level op on the branch-optioned table: must refuse BEFORE
    // scanning — a silent main commit would break audit isolation
    val e = intercept[Exception](spark.sql(s"DELETE FROM $tbl WHERE id = 1"))
    assert(e.getMessage.contains("branch"), e.getMessage)
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
