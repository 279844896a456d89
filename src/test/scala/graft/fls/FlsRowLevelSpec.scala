package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Row-level operations (FlsRowLevelOperation): UPDATE, MERGE INTO and
  * the copy-on-write DELETE leg — group-based replacement where the
  * scan reads affected FILES whole and the commit swaps exactly them. */
class FlsRowLevelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-rowlevel").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-rowlevel-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def mkPartitioned(name: String, dir: String,
      extra: (String, String)*): Unit = {
    val sp = spark; import sp.implicits._
    (1 to 300).map(i => (i.toLong, s"old-$i", (i % 3).toString))
      .toDF("id", "body", "k")
      .write.format("fls").mode("overwrite").option("partition_by", "k")
      .options(extra.toMap).save(dir)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val opts = if (extra.isEmpty) ""
      else "OPTIONS (" + extra.map { case (k, v) => s"$k '$v'" }.mkString(", ") + ") "
    spark.sql(s"CREATE TABLE $name (id BIGINT, body STRING, k STRING) " +
      s"USING fls PARTITIONED BY (k) $opts LOCATION '$dir'")
  }

  private def fileNames(dir: String): Set[String] = {
    val conf = spark.sessionState.newHadoopConf()
    FlsFile.listDataFiles(new org.apache.hadoop.fs.Path(dir), conf)
      .map(_.toString).toSet
  }

  test("UPDATE with a data-column predicate rewrites rows exactly, SQL end-to-end") {
    val dir = s"$tmp/update"
    mkPartitioned("fls_rl_u", dir)
    spark.sql("UPDATE fls_rl_u SET body = concat('new-', id) WHERE id % 10 = 0")
    val t = spark.table("fls_rl_u")
    assert(t.count() == 300)
    assert(t.filter(col("body").startsWith("new-")).count() == 30)
    assert(t.filter(col("body").startsWith("old-")).count() == 270)
    // untouched rows are bit-identical
    assert(t.filter(col("id") === 7L).select("body").collect()(0).getString(0) == "old-7")
    assert(t.filter(col("id") === 10L).select("body").collect()(0).getString(0) == "new-10")
    // partition layout survived the rewrite
    assert(t.filter(col("k") =!= pmod(col("id"), lit(3)).cast("string")).count() == 0)
    spark.sql("DROP TABLE fls_rl_u")
  }

  test("UPDATE narrowed to one partition leaves the other partitions' files in place") {
    val dir = s"$tmp/update_narrow"
    mkPartitioned("fls_rl_n", dir)
    val before = fileNames(dir)
    spark.sql("UPDATE fls_rl_n SET body = 'patched' WHERE k = '1' AND id < 50")
    val after = fileNames(dir)
    val t = spark.table("fls_rl_n")
    assert(t.filter(col("body") === "patched").count() ==
      (1 until 50).count(_ % 3 == 1))
    // files of k=0 / k=2 were not rewritten (group filtering pruned them)
    val untouched = before.filter(f => f.contains("k=0") || f.contains("k=2"))
    assert(untouched.subsetOf(after), "unaffected partitions must keep their files")
    spark.sql("DROP TABLE fls_rl_n")
  }

  test("copy-on-write DELETE: data-column predicate on a partitioned table") {
    val dir = s"$tmp/cow_delete"
    mkPartitioned("fls_rl_d", dir)
    // FlsDelete.canDeleteWhere is false here (no file decides id%7) —
    // the row-level path takes over instead of rejecting
    spark.sql("DELETE FROM fls_rl_d WHERE id % 7 = 0")
    val t = spark.table("fls_rl_d")
    assert(t.count() == 300 - (1 to 300).count(_ % 7 == 0))
    assert(t.filter(pmod(col("id"), lit(7)) === 0).count() == 0)
    // survivors intact
    assert(t.filter(col("id") === 1L).count() == 1)
    spark.sql("DROP TABLE fls_rl_d")
  }

  test("MERGE INTO: matched update + not-matched insert") {
    val dir = s"$tmp/merge"
    mkPartitioned("fls_rl_m", dir)
    val sp = spark; import sp.implicits._
    Seq((5L, "merged-5", "2"), (301L, "merged-301", "1"))
      .toDF("id", "body", "k").createOrReplaceTempView("rl_source")
    spark.sql("""
      MERGE INTO fls_rl_m t USING rl_source s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.body = s.body
      WHEN NOT MATCHED THEN INSERT (id, body, k) VALUES (s.id, s.body, s.k)""")
    val t = spark.table("fls_rl_m")
    assert(t.count() == 301)
    assert(t.filter(col("id") === 5L).select("body").collect()(0).getString(0) == "merged-5")
    // the matched row keeps its ORIGINAL partition (only body updated)
    assert(t.filter(col("id") === 5L).select("k").collect()(0).getString(0) == "2")
    assert(t.filter(col("id") === 301L).select("k").collect()(0).getString(0) == "1")
    assert(t.filter(col("body").startsWith("old-")).count() == 299)
    spark.sql("DROP TABLE fls_rl_m")
  }

  test("manifest table: UPDATE publishes ONE CAS version; old files stay for vacuum") {
    val dir = s"$tmp/manifest_u"
    mkPartitioned("fls_rl_mf", dir, "commit_mode" -> "manifest")
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val (v0, entries0) = FlsManifest.readVersioned(fs, root).get
    spark.sql("UPDATE fls_rl_mf SET body = 'bumped' WHERE id % 10 = 0")
    val (v1, _) = FlsManifest.readVersioned(fs, root).get
    assert(v1 == v0 + 1, "update must publish exactly one new version")
    assert(spark.table("fls_rl_mf").filter(col("body") === "bumped").count() == 30)
    // pinned snapshot still reads the pre-update table
    assert(spark.read.format("fls").option("manifest_version", v0.toString)
      .load(dir).filter(col("body") === "bumped").count() == 0)
    assert(entries0.map(_.rel).forall(r =>
      fs.exists(new org.apache.hadoop.fs.Path(root, r))))
    spark.sql("DROP TABLE fls_rl_mf")
  }

  test("decidable DELETE still takes the zero-read metadata path") {
    val dir = s"$tmp/meta_still"
    mkPartitioned("fls_rl_meta", dir)
    val before = fileNames(dir)
    spark.sql("DELETE FROM fls_rl_meta WHERE k = '0'")
    val after = fileNames(dir)
    assert(spark.table("fls_rl_meta").count() == 200)
    // metadata delete REMOVES files; it never rewrites the survivors
    assert(after.subsetOf(before), s"metadata delete must not write new files: ${after -- before}")
    spark.sql("DROP TABLE fls_rl_meta")
  }
}
