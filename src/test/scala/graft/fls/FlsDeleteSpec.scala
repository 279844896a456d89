package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only DELETE / TRUNCATE (FlsDelete via SupportsDelete):
  * partition-decided predicates drop whole files without reading data;
  * undecidable predicates fail loudly instead of silently rewriting. */
class FlsDeleteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-delete").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-delete-spec")
      .config("spark.sql.shuffle.partitions", "4")
      // keep cluster_by writes at the configured parallelism: the
      // multi-file drop/keep/rewrite assertions need >1 file
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def mkPartitioned(dir: String, extra: (String, String)*): Unit = {
    val sp = spark; import sp.implicits._
    val df = (1 to 300).map { i =>
      val dt = f"2026-08-${10 + (i % 3)}%02d"
      (i.toLong, s"doc-$i", java.sql.Date.valueOf(dt))
    }.toDF("id", "body", "dt")
    val w = extra.foldLeft(
      df.write.format("fls").mode("overwrite").option("partition_by", "dt")) {
      case (x, (k, v)) => x.option(k, v)
    }
    w.save(dir)
  }

  test("DELETE FROM with a partition predicate drops whole directories, SQL end-to-end") {
    val dir = s"$tmp/sql_del"
    mkPartitioned(dir)
    spark.sql("DROP TABLE IF EXISTS fls_del_t")
    spark.sql(s"CREATE TABLE fls_del_t (id BIGINT, body STRING, dt DATE) " +
      s"USING fls LOCATION '$dir'")
    val before = spark.table("fls_del_t").count()
    assert(before == 300)
    spark.sql("DELETE FROM fls_del_t WHERE dt < DATE'2026-08-11'")
    // rows of dt=2026-08-10 gone, others intact
    assert(spark.table("fls_del_t").count() ==
      before - 100)
    assert(spark.table("fls_del_t").filter(col("dt") === "2026-08-10").count() == 0)
    // the partition directory itself is gone (metadata delete, swept)
    assert(!new java.io.File(dir, "dt=2026-08-10").exists())
    // footers/sidecars of the remaining partitions untouched, data exact
    assert(spark.table("fls_del_t").agg(sum("id")).collect()(0).getLong(0) ==
      (1 to 300).filter(i => i % 3 != 0).map(_.toLong).sum)
    spark.sql("DROP TABLE fls_del_t")
  }

  test("a predicate partition values cannot decide falls to copy-on-write, not rejection") {
    val dir = s"$tmp/undecided"
    mkPartitioned(dir)
    spark.sql("DROP TABLE IF EXISTS fls_del_u")
    spark.sql(s"CREATE TABLE fls_del_u (id BIGINT, body STRING, dt DATE) " +
      s"USING fls LOCATION '$dir'")
    // canDeleteWhere is false here (a data column on a partitioned
    // table) — since r11 the row-level path (FlsRowLevelOperation)
    // takes over and rewrites the affected groups instead of rejecting
    spark.sql("DELETE FROM fls_del_u WHERE id < 100")
    assert(spark.table("fls_del_u").count() == 201)
    assert(spark.table("fls_del_u").agg(min("id")).collect()(0).getLong(0) == 100L)
    // mixed conjunction: the decided-false conjunct keeps every file —
    // still the zero-read metadata path, nothing touched
    spark.sql("DELETE FROM fls_del_u WHERE dt = DATE'1999-01-01' AND id < 1000")
    assert(spark.table("fls_del_u").count() == 201)
    spark.sql("DROP TABLE fls_del_u")
  }

  test("TRUNCATE TABLE empties but keeps the table readable with its data schema") {
    val dir = s"$tmp/trunc"
    mkPartitioned(dir)
    spark.sql("DROP TABLE IF EXISTS fls_del_tr")
    spark.sql(s"CREATE TABLE fls_del_tr (id BIGINT, body STRING, dt DATE) " +
      s"USING fls LOCATION '$dir'")
    spark.sql("TRUNCATE TABLE fls_del_tr")
    assert(spark.table("fls_del_tr").count() == 0)
    // a fresh path-based read still binds the data schema
    val back = spark.read.format("fls").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "body"))
    assert(back.count() == 0)
    spark.sql("DROP TABLE fls_del_tr")
  }

  test("manifest table: delete republishes via CAS; files stay for vacuum") {
    val dir = s"$tmp/manifest_del"
    mkPartitioned(dir, "commit_mode" -> "manifest")
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val (v0, entries0) = FlsManifest.readVersioned(fs, root).get
    spark.sql("DROP TABLE IF EXISTS fls_del_m")
    spark.sql(s"CREATE TABLE fls_del_m (id BIGINT, body STRING, dt DATE) " +
      s"USING fls LOCATION '$dir'")
    spark.sql("DELETE FROM fls_del_m WHERE dt = DATE'2026-08-10'")
    val (v1, entries1) = FlsManifest.readVersioned(fs, root).get
    assert(v1 == v0 + 1, "delete must publish exactly one new manifest version")
    assert(entries1.size < entries0.size)
    assert(spark.table("fls_del_m").count() == 200)
    // dropped files still on disk (pinned readers + vacuum contract)
    val dropped = entries0.map(_.rel).toSet -- entries1.map(_.rel).toSet
    assert(dropped.nonEmpty && dropped.forall(r =>
      fs.exists(new org.apache.hadoop.fs.Path(root, r))))
    // pinned snapshot still reads the pre-delete table
    assert(spark.read.format("fls").option("manifest_version", v0.toString)
      .load(dir).count() == 300)
    spark.sql("DROP TABLE fls_del_m")
  }

  test("clustered table: retention delete drops zone-map-decided files, rewrites ONLY the straddler") {
    val sp = spark; import sp.implicits._
    val dir = s"$tmp/clustered_del"
    // 8 files with disjoint v-ranges via the writer's own cluster_by
    spark.range(0, 8000).selectExpr("id AS v", "hash(id) AS payload")
      .repartition(8)
      .write.format("fls").mode("overwrite")
      .option("cluster_by", "v").save(dir)
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    def files() = FlsFile.listDataFiles(root, conf).map(_.getName).toSet
    val before = files()
    assert(before.size >= 4, s"want multiple clustered files, got $before")
    spark.sql("DROP TABLE IF EXISTS fls_del_c")
    spark.sql(s"CREATE TABLE fls_del_c (v BIGINT, payload INT) USING fls LOCATION '$dir'")
    // cutoff in the middle of one file's range: files wholly below DROP
    // (no read), files wholly above KEEP, exactly one file rewrites
    spark.sql("DELETE FROM fls_del_c WHERE v < 3100")
    assert(spark.table("fls_del_c").count() == 8000 - 3100)
    assert(spark.table("fls_del_c").agg(min("v")).collect()(0).getLong(0) == 3100L)
    val after = files()
    val survivors = before.intersect(after)
    // whole files above the cutoff survived IN PLACE (not rewritten)
    assert(survivors.nonEmpty, "keep-classified files must not be touched")
    assert((after -- before).size <= 2,
      s"only the straddling file should be rewritten, new files: ${after -- before}")
    // payload integrity through the rewrite
    assert(spark.table("fls_del_c").filter(col("payload") =!= hash(col("v"))).count() == 0)
    spark.sql("DROP TABLE fls_del_c")
  }

  test("delete on an unpartitioned unclustered table falls back to full copy-on-write") {
    val sp = spark; import sp.implicits._
    val dir = s"$tmp/flat"
    (1L to 50L).toDF("v").coalesce(1).write.format("fls").mode("overwrite").save(dir)
    spark.sql("DROP TABLE IF EXISTS fls_del_f")
    spark.sql(s"CREATE TABLE fls_del_f (v BIGINT) USING fls LOCATION '$dir'")
    spark.sql("DELETE FROM fls_del_f WHERE v > 10") // straddles the only file
    assert(spark.table("fls_del_f").count() == 10)
    assert(spark.table("fls_del_f").agg(max("v")).collect()(0).getLong(0) == 10L)
    spark.sql("DELETE FROM fls_del_f") // no predicate = whole table
    assert(spark.table("fls_del_f").count() == 0)
    spark.sql("DROP TABLE fls_del_f")
  }

  test("manifest clustered table: straddler rewrite publishes ONE CAS version") {
    val sp = spark; import sp.implicits._
    val dir = s"$tmp/manifest_cow"
    spark.range(0, 4000).selectExpr("id AS v")
      .repartition(4)
      .write.format("fls").mode("overwrite")
      .option("cluster_by", "v").option("commit_mode", "manifest").save(dir)
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val (v0, entries0) = FlsManifest.readVersioned(fs, root).get
    spark.sql("DROP TABLE IF EXISTS fls_del_mc")
    spark.sql(s"CREATE TABLE fls_del_mc (v BIGINT) USING fls LOCATION '$dir'")
    spark.sql("DELETE FROM fls_del_mc WHERE v < 1500")
    val (v1, entries1) = FlsManifest.readVersioned(fs, root).get
    assert(v1 == v0 + 1, "rewrite + removals must be ONE published version")
    assert(spark.table("fls_del_mc").count() == 2500)
    assert(spark.table("fls_del_mc").agg(min("v")).collect()(0).getLong(0) == 1500L)
    // replaced inputs remain on disk for vacuum / pinned readers
    assert(entries0.map(_.rel).forall(r =>
      fs.exists(new org.apache.hadoop.fs.Path(root, r))))
    assert(spark.read.format("fls").option("manifest_version", v0.toString)
      .load(dir).count() == 4000)
    spark.sql("DROP TABLE fls_del_mc")
  }
}
