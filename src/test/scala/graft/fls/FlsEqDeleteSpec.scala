package graft.fls

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Equality deletes ([[FlsEqDeletes]] / [[FlsEqResidual]]): the
  * predicate commits in O(1) data reads (zero Spark jobs — asserted),
  * readers apply it as an exact decode-time residual in every scan
  * mode, appends after the predicate are out of scope (birth-version
  * rule), rewrites absorb it, rollback restores it, and the
  * feed/incremental/metadata shortcuts that cannot stay exact refuse
  * loudly. */
class FlsEqDeleteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-eqdel-spec").toString
  private val cat = "fls_eqd_spec"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-eqdel-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(s"spark.sql.catalog.$cat", "graft.fls.connector.FlsCatalog")
      .config(s"spark.sql.catalog.$cat.path", s"$tmp/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def mkTable(name: String, extraProps: String = ""): (String, String) = {
    val tbl = s"$cat.db.$name"
    val dir = s"$tmp/warehouse/db/$name"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, seg STRING, v DOUBLE) " +
      s"TBLPROPERTIES ('commit_mode'='manifest', 'delete_mode'='equality'$extraProps)")
    // unclustered: every file spans the id/seg domain
    spark.range(0, 100).selectExpr("id",
      "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END AS seg",
      "CAST(id AS DOUBLE) / 4 AS v")
      .repartition(5).writeTo(tbl).append()
    (tbl, dir)
  }

  private def ids(tbl: String): Set[Long] =
    spark.table(tbl).select("id").collect().map(_.getLong(0)).toSet

  test("point delete by key commits with ZERO Spark jobs and is exact " +
      "across files, scan modes, and aggregates") {
    val (tbl, dir) = mkTable("zero_jobs")
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sql(s"DELETE FROM $tbl WHERE seg = 'b'") // 33 rows, 5 files
      Thread.sleep(300) // listener bus drains asynchronously
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs == 0, s"equality delete ran $jobs Spark job(s) — not O(1)")
    // the predicate is IN the manifest, not in rewritten files
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val (headV, _) = FlsManifest.readVersioned(fs, new Path(dir)).get
    assert(FlsManifest.versionEq(fs, new Path(dir), headV).nonEmpty)
    // exactness through the ordinary scan...
    assert(ids(tbl) == (0L until 100L).filter(_ % 3 != 1).toSet)
    // ...through a filtered scan on ANOTHER column...
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE v < 5")
      .collect()(0).getLong(0) == (0L until 100L)
        .count(i => i % 3 != 1 && i / 4.0 < 5))
    // ...and the footer count(*) shortcut must NOT serve stale counts
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 67)
  }

  test("IN-list delete on a long key; appends after the predicate are " +
      "OUT of scope (birth-version rule)") {
    val (tbl, _) = mkTable("bv_scope")
    spark.sql(s"DELETE FROM $tbl WHERE id IN (2, 4, 6, 98)")
    assert(!ids(tbl).exists(Set(2L, 4L, 6L, 98L)))
    // reinsert two of the deleted keys: fresh birth version → visible
    spark.sql(s"INSERT INTO $tbl VALUES (2, 'a', 0.5), (6, 'c', 1.5)")
    assert(ids(tbl).contains(2L) && ids(tbl).contains(6L))
    assert(!ids(tbl).contains(4L) && !ids(tbl).contains(98L))
    // a second predicate stacks and applies to both generations
    spark.sql(s"DELETE FROM $tbl WHERE id = 6")
    assert(!ids(tbl).contains(6L) && ids(tbl).contains(2L))
  }

  test("unsupported shapes fall back to the rewrite ladder and stay exact") {
    val (tbl, _) = mkTable("fallback")
    spark.sql(s"DELETE FROM $tbl WHERE seg = 'a'") // equality path
    // arithmetic predicate: not predicate-expressible (no simple
    // column-vs-literal conjunct shape) → row-level fallback
    spark.sql(s"DELETE FROM $tbl WHERE id % 10 = 1")
    assert(ids(tbl) == (0L until 100L).filter(i => i % 3 != 0 && i % 10 != 1).toSet)
  }

  test("compaction absorbs the predicate: rows stay deleted, the " +
      "manifest line is dropped, metadata aggregates re-arm") {
    val (tbl, dir) = mkTable("absorb")
    spark.sql(s"DELETE FROM $tbl WHERE seg = 'c'")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def activeEq: Seq[String] =
      FlsManifest.versionEq(fs, p, FlsManifest.readVersioned(fs, p).get._1)
    assert(activeEq.nonEmpty)
    FlsMaintenance.compact(spark, dir, targetRowsPerFile = 1000000)
    assert(activeEq.isEmpty, "compaction did not absorb the predicate")
    assert(ids(tbl) == (0L until 100L).filter(_ % 3 != 2).toSet)
    // a post-absorption insert of a deleted key is unaffected history
    spark.sql(s"INSERT INTO $tbl VALUES (2, 'c', 0.5)")
    assert(ids(tbl).contains(2L))
  }

  test("UPDATE after an equality delete does not resurrect its rows " +
      "(copy-on-write rewrite reads through the residual)") {
    val (tbl, _) = mkTable("cow_update", extraProps = ", 'update_mode'='copy-on-write'")
    spark.sql(s"DELETE FROM $tbl WHERE seg = 'b'")
    spark.sql(s"UPDATE $tbl SET v = v + 100 WHERE id < 50")
    assert(ids(tbl) == (0L until 100L).filter(_ % 3 != 1).toSet)
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE v >= 100")
      .collect()(0).getLong(0) == (0L until 50L).count(_ % 3 != 1))
  }

  test("merge-on-read DELETE and an equality delete compose (DV + residual)") {
    val (tbl, _) = mkTable("dv_mix", extraProps = "")
    // flip to MOR for a positional delete, then back via a new predicate
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('delete_mode'='merge-on-read')")
    spark.sql(s"DELETE FROM $tbl WHERE id >= 40 AND id < 45") // DV positions
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('delete_mode'='equality')")
    spark.sql(s"DELETE FROM $tbl WHERE seg = 'a'") // residual on same files
    assert(ids(tbl) ==
      (0L until 100L).filter(i => i % 3 != 0 && !(i >= 40 && i < 45)).toSet)
  }

  test("time travel and rollback restore eq-deleted rows exactly") {
    val (tbl, dir) = mkTable("travel") // v1
    spark.sql(s"DELETE FROM $tbl WHERE seg = 'a'") // v2 (eqdelete)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 1")
      .collect()(0).getLong(0) == 100)
    assert(spark.table(tbl).count() == 66)
    FlsMaintenance.rollback(spark, dir, toVersion = 1) // v3 restores
    assert(spark.table(tbl).count() == 100)
    // and rolling FORWARD again to v2's state via VERSION AS OF still
    // applies v2's predicate (snapshot-consistent residuals)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 2")
      .collect()(0).getLong(0) == 66)
  }

  test("CDF and incremental reads refuse ranges containing an equality " +
      "delete; ranges after it serve normally") {
    val (tbl, dir) = mkTable("cdf_refuse") // v1
    spark.sql(s"DELETE FROM $tbl WHERE id = 7") // v2 eqdelete
    spark.sql(s"INSERT INTO $tbl VALUES (200, 'a', 2.0)") // v3
    val e = intercept[Exception](spark.read.format("fls")
      .option("cdf_from_version", "1").load(dir).collect())
    assert(e.getMessage.contains("equality-delete"), e.getMessage)
    // range strictly after the eqdelete commit works
    val rows = spark.read.format("fls").option("cdf_from_version", "2")
      .load(dir).collect()
    assert(rows.map(_.getAs[Long]("id")).toSet == Set(200L))
    // incremental reads: same refusal stance
    val e2 = intercept[Exception](spark.read.format("fls")
      .option("changes_from_version", "1").load(dir).collect())
    assert(e2.getMessage.contains("equality delete"), e2.getMessage)
    assert(spark.read.format("fls").option("changes_from_version", "2")
      .load(dir).count() == 1)
  }

  test("value-producing metadata shortcuts refuse residual files: " +
      "ORDER BY ... LIMIT stays exact when the extreme is deleted") {
    val (tbl, _) = mkTable("topn_gate")
    spark.sql(s"DELETE FROM $tbl WHERE id = 99") // the max
    val top = spark.sql(s"SELECT id FROM $tbl ORDER BY id DESC LIMIT 3")
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(98L, 97L, 96L))
    val mx = spark.sql(s"SELECT max(id) AS m, min(id) AS n, count(*) AS c FROM $tbl")
      .collect()(0)
    assert(mx.getLong(0) == 98L && mx.getLong(1) == 0L && mx.getLong(2) == 99L)
  }

  test("a streaming read freezes residuals at discovery (initial " +
      "snapshot never serves eq-deleted rows)") {
    val (tbl, dir) = mkTable("stream_eq")
    spark.sql(s"DELETE FROM $tbl WHERE seg = 'c'")
    val q = spark.readStream.format("fls")
      .schema(spark.read.format("fls").load(dir).schema)
      .load(dir)
      .writeStream.format("memory").queryName("eqd_stream")
      .option("checkpointLocation", s"$tmp/eqd_stream_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("eqd_stream").select("id").collect()
      .map(_.getLong(0)).toSet
    assert(got == (0L until 100L).filter(_ % 3 != 2).toSet)
  }

  test("rollback keeps restored entries' birth versions: a restored " +
      "file stays subject to the restored predicates") {
    val (tbl, dir) = mkTable("bv_rollback") // v1: 5 files, bv=1
    spark.sql(s"DELETE FROM $tbl WHERE seg = 'a'") // v2: eqdelete
    // v3: a CoW range delete REWRITES straddling files — their
    // replacements carry bv=3, the originals drop out of the head
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('delete_mode'='copy-on-write')")
    spark.sql(s"DELETE FROM $tbl WHERE id >= 90")
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('delete_mode'='equality')")
    assert(ids(tbl) == (0L until 90L).filter(_ % 3 != 0).toSet)
    // rollback to v2 republishes the ORIGINAL files (absent from the
    // v3 head) — they must keep bv=1, so v2's predicate still covers
    // them; a restamp would resurrect every seg='a' row they hold
    FlsMaintenance.rollback(spark, dir, toVersion = 2)
    assert(ids(tbl) == (0L until 100L).filter(_ % 3 != 0).toSet)
  }

  test("fast_forward restamps branch-only entries at the published " +
      "main version: a later equality delete covers published rows") {
    val tbl = s"$cat.db.eq_ff"
    val dir = s"$tmp/warehouse/db/eq_ff"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, seg STRING, v DOUBLE) " +
      "TBLPROPERTIES ('commit_mode'='manifest', 'delete_mode'='equality')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 'a', 1.0)") // main v1 = fork
    spark.sql(s"CALL $cat.system.create_branch(`table` => 'db.eq_ff', " +
      "name => 'load')")
    // three branch commits: branch-lineage bv runs 2, 3, 4 — numbers
    // main has NOT reached when the publish mints v2
    (10L to 12L).foreach { i =>
      spark.range(i, i + 1).selectExpr("id", "'b' AS seg",
        "CAST(id AS DOUBLE) AS v")
        .write.format("fls").mode("append")
        .option("commit_mode", "manifest").option("branch", "load").save(dir)
    }
    spark.sql(s"CALL $cat.system.fast_forward(`table` => 'db.eq_ff', " +
      "name => 'load')") // main v2
    assert(ids(tbl) == Set(1L, 10L, 11L, 12L))
    // equality delete at main v3: without the publish-time restamp,
    // the last branch commit's rows (bv=4 > 3) would escape
    spark.sql(s"DELETE FROM $tbl WHERE seg = 'b'")
    assert(ids(tbl) == Set(1L), ids(tbl).toString)
  }

  test("branch-optioned equality delete refuses (write-audit-publish " +
      "isolation), like every other branch DML") {
    val (tbl, dir) = mkTable("eq_branch")
    spark.sql(s"CALL $cat.system.create_branch(`table` => 'db.eq_branch', " +
      "name => 'wip')")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('branch'='wip')")
      try spark.sql(s"DELETE FROM $tbl WHERE seg = 'a'")
      finally spark.sql(s"ALTER TABLE $tbl UNSET TBLPROPERTIES ('branch')")
    }
    assert(e.getMessage.toLowerCase.contains("branch"), e.getMessage)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(FlsManifest.versionEq(fs, new Path(dir),
      FlsManifest.readVersioned(fs, new Path(dir)).get._1).isEmpty)
  }

  test("composite-key delete commits ONE multi-leg line with ZERO jobs; " +
      "the residual is the AND of its legs") {
    val (tbl, dir) = mkTable("multicol")
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // id 4 is seg 'b': one leg matches, the other doesn't — survives
      spark.sql(s"DELETE FROM $tbl WHERE seg = 'a' AND id IN (0, 3, 4, 6)")
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs == 0, s"composite equality delete ran $jobs job(s)")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val (headV, _) = FlsManifest.readVersioned(fs, new Path(dir)).get
    val eq = FlsManifest.versionEq(fs, new Path(dir), headV)
    assert(eq.length == 1 && FlsEqDeletes.parse(eq.head).legs.length == 2,
      eq.mkString("; "))
    assert(ids(tbl) == (0L until 100L).toSet -- Set(0L, 3L, 6L),
      "AND semantics: only rows matching EVERY leg die")
    assert(ids(tbl).contains(4L), "a one-leg match must survive")
  }

  test("composite-key reinserts are exempt (birth-version rule); a " +
      "3-leg long+string+double conjunction stacks on top") {
    val (tbl, _) = mkTable("multicol_bv")
    spark.sql(s"DELETE FROM $tbl WHERE seg = 'a' AND id IN (0, 3, 9)")
    assert(!ids(tbl).exists(Set(0L, 3L, 9L)))
    spark.sql(s"INSERT INTO $tbl VALUES (3, 'a', 0.75), (9, 'a', 2.25)")
    assert(ids(tbl).contains(3L) && ids(tbl).contains(9L) &&
      !ids(tbl).contains(0L))
    // v = id/4: matches id=9 in BOTH generations; id=5 only via gen1
    spark.sql(s"DELETE FROM $tbl WHERE seg IN ('a', 'c') AND " +
      "id IN (5, 8, 9) AND v IN (1.25, 2.25)")
    assert(!ids(tbl).contains(9L) && !ids(tbl).contains(5L))
    assert(ids(tbl).contains(8L), "v=2.0 fails the double leg")
    assert(ids(tbl).contains(3L), "the other reinsert survives")
  }

  test("absorb_deletes rewrites ONLY the subject files (1 of N), drops " +
      "the predicates, and leaves non-subject entries byte-identical") {
    val tbl = s"$cat.db.absorb_t"
    val dir = s"$tmp/warehouse/db/absorb_t"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, seg STRING, v DOUBLE) " +
      "TBLPROPERTIES ('commit_mode'='manifest', 'delete_mode'='equality')")
    spark.range(0, 100).selectExpr("id",
      "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END AS seg",
      "CAST(id AS DOUBLE) / 4 AS v")
      .repartition(1).writeTo(tbl).append() // one subject-to-be file
    spark.sql(s"DELETE FROM $tbl WHERE seg = 'b'") // predicate v2
    spark.range(100, 200).selectExpr("id", "'d' AS seg",
      "CAST(id AS DOUBLE) / 4 AS v")
      .repartition(4).writeTo(tbl).append() // 4 files, bv=3 > 2: exempt
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val before = FlsManifest.read(fs, root).get
    val exempt = before.filter(e => FlsFileStats.birthOf(e.stats) > 2L)
    val subject = before.filterNot(e => FlsFileStats.birthOf(e.stats) > 2L)
    assert(subject.size == 1 && exempt.size == 4, before.map(_.rel).toString)
    val r = spark.sql(s"CALL $cat.system.absorb_deletes(" +
      "`table` => 'db.absorb_t')").collect()(0)
    assert(r.getInt(0) == 1, "one predicate absorbed")
    assert(r.getInt(1) == 1, s"exactly the 1 subject file rewritten, got ${r.getInt(1)}")
    val after = FlsManifest.read(fs, root).get
    exempt.foreach(e => assert(after.contains(e),
      s"non-subject entry ${e.rel} must survive byte-identical"))
    assert(!after.exists(_.rel == subject.head.rel), "subject replaced")
    val (headV, _) = FlsManifest.readVersioned(fs, root).get
    assert(FlsManifest.versionEq(fs, root, headV).isEmpty,
      "predicates dropped from the log")
    // rows exact, and the count(*) metadata shortcut re-armed
    assert(ids(tbl) == ((0L until 100L).filterNot(_ % 3 == 1).toSet ++
      (100L until 200L)))
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0)
      == 167L)
  }

  test("duplicate-column conjunctions fall back to the ladder and stay " +
      "exact") {
    val (tbl, dir) = mkTable("multicol_dup")
    spark.sql(s"DELETE FROM $tbl WHERE id IN (30, 31) AND id IN (31, 32)")
    assert(!ids(tbl).contains(31L))
    assert(ids(tbl).contains(30L) && ids(tbl).contains(32L))
  }

  // ---- range predicates (r16): the retention shape ----

  test("retention-shape range delete (id < cutoff) commits with ZERO " +
      "jobs; reinserts into the range are exempt; predicates stack") {
    val (tbl, dir) = mkTable("range_retention")
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sql(s"DELETE FROM $tbl WHERE id < 40")
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs == 0, s"range delete ran $jobs Spark job(s) — not O(1)")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val (headV, _) = FlsManifest.readVersioned(fs, new Path(dir)).get
    val eq = FlsManifest.versionEq(fs, new Path(dir), headV)
    assert(eq.length == 1, eq.mkString("; "))
    assert(FlsEqDeletes.parse(eq.head).legs.head
      .isInstanceOf[FlsEqDeletes.RangeLeg], eq.head)
    assert(ids(tbl) == (40L until 100L).toSet)
    // reinsert into the deleted range: newer birth version → visible
    spark.sql(s"INSERT INTO $tbl VALUES (7, 'a', 1.75), (12, 'a', 3.0)")
    assert(ids(tbl).contains(7L) && ids(tbl).contains(12L))
    // a second range predicate stacks and spans both generations
    spark.sql(s"DELETE FROM $tbl WHERE id >= 98")
    assert(ids(tbl) == ((40L until 98L).toSet + 7L + 12L))
    // and the footer count(*) shortcut must not serve stale counts
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0)
      == 60L)
  }

  test("two range conjuncts on one column intersect into ONE leg with " +
      "exact boundary semantics (closed long normalization)") {
    val (tbl, dir) = mkTable("range_interval")
    // 10 < id <= 20 → closed longs [11, 20]
    spark.sql(s"DELETE FROM $tbl WHERE id > 10 AND id <= 20")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val (headV, _) = FlsManifest.readVersioned(fs, new Path(dir)).get
    val eq = FlsManifest.versionEq(fs, new Path(dir), headV)
    val p = FlsEqDeletes.parse(eq.head)
    assert(p.legs.length == 1, s"conjuncts on one column must merge: ${eq.head}")
    val r = p.legs.head.asInstanceOf[FlsEqDeletes.RangeLeg]
    assert(r.lo.get.l == 11L && r.hi.get.l == 20L && r.lo.get.inc &&
      r.hi.get.inc, eq.head)
    assert(ids(tbl) == (0L until 100L).filterNot(i => i > 10 && i <= 20).toSet)
  }

  test("double range respects open/closed bounds, -0.0 = 0.0, and " +
      "dictionary-coded columns") {
    val (tbl, _) = mkTable("range_double")
    // v = id/4.0: delete 2.5 <= v < 5.0 → ids 10..19
    spark.sql(s"DELETE FROM $tbl WHERE v >= 2.5 AND v < 5.0")
    assert(ids(tbl) == (0L until 100L).filterNot(i => i >= 10 && i < 20).toSet)
    // id 20 (v = 5.0 exactly) survives the open upper bound
    assert(ids(tbl).contains(20L))
    // -0.0 bound: `v > -0.0` must not delete the stored 0.0 row? No —
    // SQL: 0.0 > -0.0 is FALSE (they are equal); ids 1.. all have v>0
    spark.sql(s"DELETE FROM $tbl WHERE v > -0.0 AND v < 0.5")
    assert(!ids(tbl).contains(1L), "v=0.25 > -0.0 must die")
    assert(ids(tbl).contains(0L), "v=0.0 equals -0.0 — strict > spares it")
  }

  test("NaN sorts above every bound: a lower-bound-only range deletes " +
      "stored NaN; an upper-bounded one spares it") {
    val tbl = s"$cat.db.range_nan"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('commit_mode'='manifest', 'delete_mode'='equality')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0), (2, CAST('NaN' AS " +
      "DOUBLE)), (3, 100.0)")
    // upper-bounded: NaN > 50 fails nothing... NaN fails v < 50; only 1.0 dies
    spark.sql(s"DELETE FROM $tbl WHERE v < 50.0")
    assert(ids(tbl) == Set(2L, 3L), "NaN and 100.0 must survive v < 50")
    // lower-bound-only: NaN sorts above 99 in Spark/DuckDB total order
    spark.sql(s"DELETE FROM $tbl WHERE v > 99.0")
    assert(ids(tbl) == Set.empty[Long], "NaN and 100.0 must die under v > 99")
  }

  test("string range deletes by unsigned UTF-8 byte order") {
    val (tbl, _) = mkTable("range_string")
    // seg in {a, b, c}: delete 'a' <= seg < 'c' → a and b
    spark.sql(s"DELETE FROM $tbl WHERE seg >= 'a' AND seg < 'c'")
    assert(ids(tbl) == (0L until 100L).filter(_ % 3 == 2).toSet)
  }

  test("a provably EMPTY range intersection commits nothing and " +
      "deletes nothing") {
    val (tbl, dir) = mkTable("range_empty")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val v0 = FlsManifest.readVersioned(fs, new Path(dir)).get._1
    spark.sql(s"DELETE FROM $tbl WHERE id > 50 AND id < 51") // empty (discrete)
    spark.sql(s"DELETE FROM $tbl WHERE v > 5.0 AND v < 5.0") // empty (continuous)
    assert(ids(tbl) == (0L until 100L).toSet, "nothing may die")
    val (headV, _) = FlsManifest.readVersioned(fs, new Path(dir)).get
    assert(FlsManifest.versionEq(fs, new Path(dir), headV).isEmpty,
      "no dead predicate line may commit")
    assert(headV == v0, s"a provable no-op must not advance the table " +
      s"(v0=$v0, head=$headV)")
  }

  test("DECIMAL retention + point deletes commit with ZERO Spark jobs " +
      "(r17): literals normalize to the table scale as unscaled longs, " +
      "non-representable bounds closed-normalize exactly, reinserts " +
      "stay visible") {
    val tbl = s"$cat.db.money"
    val dir = s"$tmp/warehouse/db/money"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, price DECIMAL(12,2)) " +
      "TBLPROPERTIES ('commit_mode'='manifest', 'delete_mode'='equality')")
    spark.range(0, 100).selectExpr("id",
      "CAST(CAST(id AS DECIMAL(12,2)) / 4 AS DECIMAL(12,2)) AS price")
      .repartition(5).writeTo(tbl).append()
    def prices(): Set[java.math.BigDecimal] = spark.table(tbl)
      .select("price").collect().map(_.getDecimal(0)).toSet
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // retention cutoff NOT representable at scale 2: price > 9.999
      // must normalize to unscaled >= 1000 (i.e. >= 10.00)
      spark.sql(s"DELETE FROM $tbl WHERE price > 9.999 AND price < 20.005")
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs == 0, s"decimal range delete ran $jobs Spark job(s) — not O(1)")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val (headV, _) = FlsManifest.readVersioned(fs, new Path(dir)).get
    val eq = FlsManifest.versionEq(fs, new Path(dir), headV)
    assert(eq.length == 1 && eq.head.contains("\"sc\":2"), eq.mkString("; "))
    val r = FlsEqDeletes.parse(eq.head).legs.head
      .asInstanceOf[FlsEqDeletes.RangeLeg]
    assert(r.scale == 2 && r.lo.get.l == 1000L && r.hi.get.l == 2000L,
      eq.head)
    // ids with 10.00 <= id/4 <= 20.00 die: ids 40..80
    assert(ids(tbl) == (0L until 100L).filterNot(i => i >= 40 && i <= 80).toSet)
    // decimal POINT delete: one more predicate line, still zero reads
    spark.sql(s"DELETE FROM $tbl WHERE price = 5.25") // id 21
    assert(ids(tbl) == (0L until 100L)
      .filterNot(i => (i >= 40 && i <= 80) || i == 21).toSet)
    // reinsert into the deleted range: newer birth version → visible
    spark.sql(s"INSERT INTO $tbl VALUES (777, CAST(15.00 AS DECIMAL(12,2)))")
    assert(ids(tbl).contains(777L))
    assert(prices().contains(new java.math.BigDecimal("15.00")))
    // footer count(*) shortcut must not serve stale counts
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0)
      == 100 - 41 - 1 + 1)
    // and absorb still works over decimal predicates
    graft.fls.FlsMaintenance.absorbDeletes(spark, dir)
    assert(FlsManifest.versionEq(fs, new Path(dir),
      FlsManifest.readVersioned(fs, new Path(dir)).get._1).isEmpty)
    assert(ids(tbl) == ((0L until 100L)
      .filterNot(i => (i >= 40 && i <= 80) || i == 21) :+ 777L).toSet)
  }

  test("WIDE decimal (p>18) deletes commit with ZERO Spark jobs (r18): " +
      "literals normalize to unscaled BigIntegers at the table scale — " +
      "including values past the long range — compared numerically " +
      "against the stored two's-complement bytes; reinserts stay " +
      "visible and absorb recovers") {
    val tbl = s"$cat.db.money_wide"
    val dir = s"$tmp/warehouse/db/money_wide"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, amt DECIMAL(24,4)) " +
      "TBLPROPERTIES ('commit_mode'='manifest', 'delete_mode'='equality')")
    // every unscaled value ≈ 3e20 — beyond Long.MaxValue by design:
    // a silent long truncation anywhere would misdelete immediately
    spark.range(0, 40).selectExpr("id",
      "CAST(CAST(id AS DECIMAL(24,4)) * 1.5 " +
        "+ CAST('30000000000000000' AS DECIMAL(24,4)) AS DECIMAL(24,4)) AS amt")
      .repartition(2).writeTo(tbl).append()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // cutoff NOT representable at scale 4 (scale 5 literal): must
      // closed-normalize exactly in the BigInteger domain
      spark.sql(s"DELETE FROM $tbl WHERE " +
        "amt >= CAST('30000000000000030.00005' AS DECIMAL(25,5))")
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs == 0, s"wide decimal delete ran $jobs Spark job(s) — not O(1)")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val (headV, _) = FlsManifest.readVersioned(fs, new Path(dir)).get
    val eq = FlsManifest.versionEq(fs, new Path(dir), headV)
    assert(eq.length == 1 && eq.head.contains("\"k\":\"B\"") &&
      eq.head.contains("\"sc\":4"), eq.mkString("; "))
    val r = FlsEqDeletes.parse(eq.head).legs.head
      .asInstanceOf[FlsEqDeletes.RangeLeg]
    // >= 3e16+30.00005 → unscaled >= ceil = 300000000000000300001
    assert(r.scale == 4 && r.lo.get.s == "300000000000000300001" &&
      r.hi.isEmpty, eq.head)
    // amt = 3e16 + 1.5·id ; the cutoff kills 1.5·id > 30.0000 → id > 20
    assert(ids(tbl) == (0L to 20L).toSet)
    // point delete on an exactly-representable wide literal: id 10
    spark.sql(s"DELETE FROM $tbl WHERE " +
      "amt = CAST('30000000000000015' AS DECIMAL(24,4))")
    assert(ids(tbl) == ((0L to 20L).toSet - 10L))
    // reinsert into the purged range: newer birth version → visible
    spark.sql(s"INSERT INTO $tbl VALUES (777, " +
      "CAST('30000000000000045' AS DECIMAL(24,4)))")
    assert(ids(tbl).contains(777L))
    // footer count(*) shortcut must not serve stale counts
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0)
      == 21 - 1 + 1)
    // absorb rewrites the survivors and drops the predicate lines
    graft.fls.FlsMaintenance.absorbDeletes(spark, dir)
    assert(FlsManifest.versionEq(fs, new Path(dir),
      FlsManifest.readVersioned(fs, new Path(dir)).get._1).isEmpty)
    assert(ids(tbl) == ((0L to 20L).toSet - 10L) + 777L)
    // a non-representable EQUALITY literal still falls back (it can
    // never match a stored value) and deletes nothing
    val tbl2 = s"$cat.db.money_exact"
    spark.sql(s"CREATE TABLE $tbl2 (id BIGINT, price DECIMAL(24,4)) " +
      "TBLPROPERTIES ('commit_mode'='manifest', 'delete_mode'='equality')")
    spark.range(0, 10).selectExpr("id",
      "CAST(id AS DECIMAL(24,4)) AS price").writeTo(tbl2).append()
    spark.sql(s"DELETE FROM $tbl2 WHERE price = CAST(5.00005 AS DECIMAL(25,5))")
    assert(spark.table(tbl2).count() == 10)
  }

  test("seeded randomized wide-decimal deletes stay exact: random " +
      "range/point literals at random scales (representable or not, " +
      "some beyond the long range) always match a driver-side exact " +
      "BigDecimal model") {
    val tbl = s"$cat.db.money_fuzz"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, amt DECIMAL(24,4)) " +
      "TBLPROPERTIES ('commit_mode'='manifest', 'delete_mode'='equality')")
    // negatives, positives, and a beyond-long stripe (every 3rd row
    // carries a 2e16 offset → unscaled ≈ 2e20 > Long.MaxValue)
    spark.range(0, 1000).selectExpr("id",
      "CAST(CAST(id - 500 AS DECIMAL(24,4)) * 7.3 + " +
        "CASE WHEN id % 3 = 0 THEN CAST('20000000000000000' AS DECIMAL(24,4)) " +
        "ELSE CAST(0 AS DECIMAL(24,4)) END AS DECIMAL(24,4)) AS amt")
      .repartition(4).writeTo(tbl).append()
    var model: Map[Long, java.math.BigDecimal] = spark.table(tbl)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    def liveIds(): Set[Long] =
      spark.table(tbl).select("id").collect().map(_.getLong(0)).toSet
    val rnd = new scala.util.Random(20260816L)
    val ops = Seq((">", 1, false), (">=", 1, true), ("<", -1, false),
      ("<=", -1, true))
    (0 until 8).foreach { round =>
      // literal anchored near the data: a surviving value ± a random
      // fraction at a random scale (3..6 — 5 and 6 are not
      // representable at the table's scale 4)
      val anchor = model.values.toSeq
        .sortBy(_.toString)(Ordering.String)
        .apply(rnd.nextInt(model.size))
      val scale = 3 + rnd.nextInt(4)
      val fuzz = new java.math.BigDecimal(
        java.math.BigInteger.valueOf(rnd.nextInt(200001) - 100000L), scale)
      val lit = anchor.add(fuzz)
      val (opStr, dir, inc) = ops(rnd.nextInt(4))
      spark.sql(s"DELETE FROM $tbl WHERE amt $opStr " +
        s"CAST('${lit.toPlainString}' AS DECIMAL(27,$scale))")
      model = model.filterNot { case (_, v) =>
        val c = v.compareTo(lit)
        if (dir > 0) { if (inc) c >= 0 else c > 0 }
        else { if (inc) c <= 0 else c < 0 }
      }
      assert(liveIds() == model.keySet,
        s"round $round: $opStr ${lit.toPlainString} diverged " +
          s"(live=${liveIds().size}, model=${model.size})")
      // keep the table populated for later rounds
      if (model.size < 50) {
        // re-seed fresh ids ABOVE the current max (append-only semantics)
        val base = 10000L * (round + 1)
        spark.sql(s"INSERT INTO $tbl SELECT id + $base, " +
          "CAST(CAST(id - 500 AS DECIMAL(24,4)) * 7.3 AS DECIMAL(24,4)) " +
          "FROM range(0, 1000)")
        model = spark.table(tbl).collect()
          .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
      }
    }
    // point deletes: one representable (an existing value — kills every
    // row carrying it), one shifted to scale 5 (can never match)
    val target = model.values.head
    spark.sql(s"DELETE FROM $tbl WHERE amt = " +
      s"CAST('${target.toPlainString}' AS DECIMAL(24,4))")
    model = model.filterNot(_._2.compareTo(target) == 0)
    assert(liveIds() == model.keySet, "representable point delete diverged")
    val miss = target.add(new java.math.BigDecimal("0.00001"))
    spark.sql(s"DELETE FROM $tbl WHERE amt = " +
      s"CAST('${miss.toPlainString}' AS DECIMAL(26,5))")
    assert(liveIds() == model.keySet,
      "a non-representable equality must delete nothing")
  }

  test("foreign exclusive long bounds closed-normalize at the parse " +
      "boundary (the writer never emits them; a hand-edited line must " +
      "not silently apply as inclusive)") {
    // `lo:5, lx:true` means `> 5` — must parse as the closed `>= 6`
    val p = FlsEqDeletes.parse("""{"v":3,"c":"id","k":"l","lo":5,"lx":true,"hi":9,"hx":true}""")
    val r = p.legs.head.asInstanceOf[FlsEqDeletes.RangeLeg]
    assert(r.lo.get.l == 6L && r.lo.get.inc, p.json)
    assert(r.hi.get.l == 8L && r.hi.get.inc, p.json)
    // degenerate exclusive edges (empty by construction) refuse loudly
    intercept[RuntimeException] {
      FlsEqDeletes.parse(
        s"""{"v":1,"c":"id","k":"l","lo":${Long.MaxValue},"lx":true}""")
    }
    intercept[RuntimeException] {
      FlsEqDeletes.parse(
        s"""{"v":1,"c":"id","k":"l","hi":${Long.MinValue},"hx":true}""")
    }
    // double/string bounds keep their exclusivity flags untouched
    val d = FlsEqDeletes.parse("""{"v":1,"c":"v","k":"d","lo":1.5,"lx":true}""")
      .legs.head.asInstanceOf[FlsEqDeletes.RangeLeg]
    assert(d.lo.get.d == 1.5 && !d.lo.get.inc)
  }

  test("mixed composite: equality leg AND range leg in ONE line; the " +
      "residual is their AND") {
    val (tbl, dir) = mkTable("range_mixed")
    spark.sql(s"DELETE FROM $tbl WHERE seg = 'a' AND id >= 50")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val (headV, _) = FlsManifest.readVersioned(fs, new Path(dir)).get
    val eq = FlsManifest.versionEq(fs, new Path(dir), headV)
    assert(eq.length == 1 && FlsEqDeletes.parse(eq.head).legs.length == 2,
      eq.mkString("; "))
    assert(ids(tbl) ==
      (0L until 100L).filterNot(i => i % 3 == 0 && i >= 50).toSet)
  }

  test("a predicate on a RENAMED column stays exact: the residual " +
      "resolves through the name history; stats prunes stay " +
      "conservative on old-name files") {
    val (tbl, dir) = mkTable("renamed")
    // files store 'seg'; the predicate commits against the NEW name
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN seg TO segment")
    spark.sql(s"DELETE FROM $tbl WHERE segment = 'b'")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val (headV, _) = FlsManifest.readVersioned(fs, new Path(dir)).get
    assert(FlsManifest.versionEq(fs, new Path(dir), headV).nonEmpty,
      "the rename must not push the delete off the predicate leg")
    // pre-rename files must still apply the residual (rename-reconciled
    // file columns), and a range predicate composes the same way
    assert(ids(tbl) == (0L until 100L).filter(_ % 3 != 1).toSet)
    spark.sql(s"DELETE FROM $tbl WHERE segment >= 'c'")
    assert(ids(tbl) == (0L until 100L).filter(_ % 3 == 0).toSet)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0)
      == 34L)
  }

  // ---- zone-map residual pruning (r16): predicates tax only the
  // files/groups their value range can touch ----

  private def mkClustered(name: String): (String, String) = {
    val tbl = s"$cat.db.$name"
    val dir = s"$tmp/warehouse/db/$name"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest', 'delete_mode'='equality', " +
      "'cluster_by'='id')")
    // 5 disjoint-range files via 5 sequential single-file appends
    (0 until 5).foreach { i =>
      spark.range(i * 400L, (i + 1) * 400L).selectExpr("id",
        "CAST(id AS DOUBLE) / 4 AS v")
        .repartition(1).writeTo(tbl).append()
    }
    (tbl, dir)
  }

  test("a predicate no file's stats can match attaches NO residual: " +
      "count(*) stays metadata-only (zero data bytes) with the line " +
      "active; a may-match predicate forces the scan") {
    val (tbl, dir) = mkClustered("prune_none")
    spark.sql(s"DELETE FROM $tbl WHERE id >= 10000") // matches nothing
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    def headEq: Seq[String] = {
      val (headV, _) = FlsManifest.readVersioned(fs, new Path(dir)).get
      FlsManifest.versionEq(fs, new Path(dir), headV)
    }
    assert(headEq.nonEmpty,
      "the predicate line must be active (committed blind, zero reads)")
    def bytesFor(expect: Long): Long = {
      @volatile var bytes = 0L
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            bytes += t.taskMetrics.inputMetrics.bytesRead
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0)
          .getLong(0) == expect)
        Thread.sleep(400)
      } finally spark.sparkContext.removeSparkListener(listener)
      bytes
    }
    assert(bytesFor(2000L) == 0L, "count(*) read data — the zone-map " +
      "prune must re-arm the metadata shortcut on proven-unaffected files")
    // contrast: a predicate that MAY match re-attaches the residual and
    // the same count must scan (proves the probe detects the difference)
    spark.sql(s"DELETE FROM $tbl WHERE id >= 1995")
    assert(headEq.size == 2)
    assert(bytesFor(1995L) > 0L,
      "a may-match predicate must force the count off the metadata path")
  }

  test("absorb_deletes with zone pruning rewrites ONLY stats-affected " +
      "files; proven-unaffected subject files are left untouched and " +
      "the predicates drop explicitly") {
    val (tbl, dir) = mkClustered("prune_absorb")
    // only the top file (ids 1600..1999) intersects
    spark.sql(s"DELETE FROM $tbl WHERE id >= 1900")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val before = FlsManifest.read(fs, root).get
    val untouched = before.filter(e =>
      FlsFileStats.toDesc(e.stats).exists(d =>
        d.rowGroups(0).segments(d.columns.indexWhere(_.name == "id"))
          .maxLong < 1900L)).map(_.rel).toSet
    assert(untouched.size == 4, s"fixture: want 4 clean files, " +
      s"got ${untouched.size} of ${before.size}")
    val r = spark.sql(s"CALL $cat.system.absorb_deletes(" +
      "`table` => 'db.prune_absorb')").collect()(0)
    assert(r.getInt(0) == 1, "one predicate absorbed")
    assert(r.getInt(1) == 1,
      s"exactly the 1 intersecting file rewritten, got ${r.getInt(1)}")
    val after = FlsManifest.read(fs, root).get
    assert(untouched.subsetOf(after.map(_.rel).toSet),
      "stats-proven-unaffected files must survive by name (no rewrite)")
    val (headV, _) = FlsManifest.readVersioned(fs, root).get
    assert(FlsManifest.versionEq(fs, root, headV).isEmpty,
      "the proven drop must remove the predicate despite untouched " +
        "old-birth-version entries")
    assert(spark.table(tbl).count() == 1900L)
    assert(spark.sql(s"SELECT max(id) FROM $tbl").collect()(0).getLong(0)
      == 1899L)
  }

  test("bloom sidecars prove point-key ABSENCE where zone maps can't " +
      "(unclustered files): absorb rewrites only the key-bearing files") {
    val tbl = s"$cat.db.prune_bloom"
    val dir = s"$tmp/warehouse/db/prune_bloom"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest', 'delete_mode'='equality', " +
      "'bloom_columns'='id')")
    // 5 files, ids striped mod 5: every file SPANS the whole domain
    // (zone maps prove nothing) but each id lives in exactly one file
    (0 until 5).foreach { i =>
      spark.range(0, 2000).filter(s"id % 5 = $i")
        .selectExpr("id", "CAST(id AS DOUBLE) / 4 AS v")
        .repartition(1).writeTo(tbl).append()
    }
    // ids 7 (file of stripe 2) and 13 (stripe 3): two bearing files
    spark.sql(s"DELETE FROM $tbl WHERE id IN (7, 13)")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val before = FlsManifest.read(fs, root).get.map(_.rel).toSet
    assert(before.size == 5)
    val r = spark.sql(s"CALL $cat.system.absorb_deletes(" +
      "`table` => 'db.prune_bloom')").collect()(0)
    assert(r.getInt(0) == 1, "one predicate absorbed")
    assert(r.getInt(1) == 2,
      s"bloom proof must confine the rewrite to the 2 key-bearing " +
        s"files, rewrote ${r.getInt(1)}")
    val after = FlsManifest.read(fs, root).get.map(_.rel).toSet
    assert((before -- after).size == 2, "exactly 2 inputs replaced")
    assert(ids(tbl) == (0L until 2000L).toSet -- Set(7L, 13L))
  }

  test("absorb of a nothing-matches predicate is PURE metadata: zero " +
      "Spark jobs, predicate dropped, rows intact") {
    val (tbl, dir) = mkClustered("prune_absorb_meta")
    spark.sql(s"DELETE FROM $tbl WHERE id >= 10000")
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = spark.sql(s"CALL $cat.system.absorb_deletes(" +
        "`table` => 'db.prune_absorb_meta')").collect()(0)
      assert(r.getInt(0) == 1 && r.getInt(1) == 0,
        s"want 1 predicate absorbed / 0 files rewritten, got $r")
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs == 0, s"metadata-only absorb ran $jobs Spark job(s)")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val (headV, _) = FlsManifest.readVersioned(fs, root).get
    assert(FlsManifest.versionEq(fs, root, headV).isEmpty)
    assert(spark.table(tbl).count() == 2000L)
  }

  test("absorb_deletes absorbs a range predicate: rows stay deleted, " +
      "the line drops, shortcuts re-arm") {
    val (tbl, dir) = mkTable("range_absorb")
    spark.sql(s"DELETE FROM $tbl WHERE id >= 90")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def activeEq: Seq[String] =
      FlsManifest.versionEq(fs, p, FlsManifest.readVersioned(fs, p).get._1)
    assert(activeEq.nonEmpty)
    val r = spark.sql(s"CALL $cat.system.absorb_deletes(" +
      "`table` => 'db.range_absorb')").collect()(0)
    assert(r.getInt(0) == 1, "one predicate absorbed")
    assert(activeEq.isEmpty, "absorb did not drop the range predicate")
    assert(ids(tbl) == (0L until 90L).toSet)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0)
      == 90L)
  }
}
