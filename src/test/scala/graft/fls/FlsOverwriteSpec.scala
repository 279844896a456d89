package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** INSERT OVERWRITE: by-filter (static partition spec) and dynamic
  * partition overwrite — whole-file replacement decided by partition
  * values or zone maps, never a silent table truncate. */
class FlsOverwriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-overwrite").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-overwrite-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def mkTable(name: String, dir: String): Unit = {
    val sp = spark; import sp.implicits._
    (1 to 300).map { i =>
      (i.toLong, s"old-$i", (i % 3).toString)
    }.toDF("id", "body", "k")
      .write.format("fls").mode("overwrite").option("partition_by", "k").save(dir)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name (id BIGINT, body STRING, k STRING) " +
      s"USING fls PARTITIONED BY (k) LOCATION '$dir'")
  }

  test("static INSERT OVERWRITE PARTITION replaces exactly that partition") {
    val dir = s"$tmp/static"
    mkTable("fls_ow_s", dir)
    spark.sql("INSERT OVERWRITE fls_ow_s PARTITION (k='1') " +
      "SELECT id, concat('new-', id) FROM range(1, 11)")
    val t = spark.table("fls_ow_s")
    // partition k=1 now holds exactly the 10 new rows
    assert(t.filter(col("k") === "1").count() == 10)
    assert(t.filter(col("k") === "1" && col("body").startsWith("new-")).count() == 10)
    // the other partitions are untouched
    assert(t.filter(col("k") === "0").count() == 100)
    assert(t.filter(col("k") === "2").count() == 100)
    assert(t.filter(col("body").startsWith("old-")).count() == 200)
    spark.sql("DROP TABLE fls_ow_s")
  }

  test("dynamic partition overwrite replaces only the partitions the data touches") {
    val dir = s"$tmp/dynamic"
    mkTable("fls_ow_d", dir)
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE fls_ow_d " +
        "SELECT id, concat('new-', id), '2' FROM range(1, 6)")
      val t = spark.table("fls_ow_d")
      assert(t.filter(col("k") === "2").count() == 5)
      assert(t.filter(col("k") === "0").count() == 100)
      assert(t.filter(col("k") === "1").count() == 100)
      // dynamic overwrite with ZERO rows is a no-op, not a truncate
      spark.sql("INSERT OVERWRITE fls_ow_d " +
        "SELECT id, body, k FROM fls_ow_d WHERE 1 = 0")
      assert(spark.table("fls_ow_d").count() == 205)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.sql("DROP TABLE fls_ow_d")
  }

  test("plain INSERT OVERWRITE (no spec, static mode) truncates — the SQL contract") {
    val dir = s"$tmp/full"
    mkTable("fls_ow_f", dir)
    spark.sql("INSERT OVERWRITE fls_ow_f SELECT id, 'x', '9' FROM range(1, 4)")
    assert(spark.table("fls_ow_f").count() == 3)
    spark.sql("DROP TABLE fls_ow_f")
  }

  test("manifest table: static partition overwrite publishes one CAS version") {
    val dir = s"$tmp/manifest"
    val sp = spark; import sp.implicits._
    (1 to 300).map(i => (i.toLong, s"old-$i", (i % 3).toString))
      .toDF("id", "body", "k")
      .write.format("fls").mode("overwrite")
      .option("partition_by", "k").option("commit_mode", "manifest").save(dir)
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val (v0, entries0) = FlsManifest.readVersioned(fs, root).get
    spark.sql("DROP TABLE IF EXISTS fls_ow_m")
    spark.sql(s"CREATE TABLE fls_ow_m (id BIGINT, body STRING, k STRING) " +
      s"USING fls PARTITIONED BY (k) OPTIONS (commit_mode 'manifest') " +
      s"LOCATION '$dir'")
    spark.sql("INSERT OVERWRITE fls_ow_m PARTITION (k='0') " +
      "SELECT id, concat('new-', id) FROM range(1, 8)")
    val (v1, entries1) = FlsManifest.readVersioned(fs, root).get
    assert(v1 == v0 + 1)
    val t = spark.table("fls_ow_m")
    assert(t.filter(col("k") === "0").count() == 7)
    assert(t.count() == 207)
    // replaced files remain on disk; the pinned snapshot still reads them
    assert(entries0.map(_.rel).forall(r =>
      fs.exists(new org.apache.hadoop.fs.Path(root, r))))
    assert(spark.read.format("fls").option("manifest_version", v0.toString)
      .load(dir).count() == 300)
    spark.sql("DROP TABLE fls_ow_m")
  }

  test("zone-map-decided filter overwrite works on a clustered flat table") {
    val dir = s"$tmp/clustered"
    spark.range(0, 4000).selectExpr("id AS v", "'old' AS tag")
      .write.format("fls").mode("overwrite").option("cluster_by", "v")
      .option("row_group_size", "1024").save(dir)
    spark.sql("DROP TABLE IF EXISTS fls_ow_c")
    spark.sql(s"CREATE TABLE fls_ow_c (v BIGINT, tag STRING) USING fls LOCATION '$dir'")
    // per-file v-ranges are disjoint; find one file's exact span so the
    // filter decides every file
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val spans = FlsFile.listDataFiles(root, conf).map { p =>
      val r = new FlsFileReader(p, conf)
      try {
        val ci = r.table.columns.indexWhere(_.name == "v")
        (r.table.rowGroups.map(_.segments(ci).minLong).min,
          r.table.rowGroups.map(_.segments(ci).maxLong).max)
      } finally r.close()
    }.sortBy(_._1)
    assert(spans.size > 1)
    val (lo, hi) = spans.head
    // replace exactly the first file's span: its zone maps say every
    // row matches, every other file's say none does — no partition
    // columns involved at all
    spark.range(lo, hi + 1).selectExpr("id AS v", "'new' AS tag")
      .writeTo("fls_ow_c").overwrite(col("v") >= lo && col("v") <= hi)
    val t = spark.table("fls_ow_c")
    assert(t.count() == 4000)
    assert(t.filter(col("tag") === "new").count() == hi - lo + 1)
    assert(t.filter(col("tag") === "old" && col("v").between(lo, hi)).count() == 0)
    spark.sql("DROP TABLE fls_ow_c")
  }

  test("a straddling filter overwrite aborts with the table untouched") {
    val dir = s"$tmp/straddle"
    mkTable("fls_ow_x", dir)
    // k decides files whole; id straddles every k=1 file — the mixed
    // conjunction must abort, not replace partial rows
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "z", "1")).toDF("id", "body", "k")
    val e2 = intercept[Exception] {
      df.writeTo("fls_ow_x").overwrite(col("k") === "1" && col("id") < 50L)
    }
    assert(e2.getMessage != null)
    assert(spark.table("fls_ow_x").count() == 300, "failed overwrite must not change the table")
    assert(spark.table("fls_ow_x").filter(col("body") === "z").count() == 0)
    spark.sql("DROP TABLE fls_ow_x")
  }
}
