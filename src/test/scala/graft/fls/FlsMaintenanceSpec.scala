package graft.fls

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Small-file compaction: rewrite a table (or one partition subdir)
  * into target-sized files through the normal commit protocol, with
  * layout and commit mode preserved. */
class FlsMaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-maintenance-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def flsCount(dir: String): Int = {
    val p = new Path(dir)
    FlsFile.listDataStatuses(p, spark.sessionState.newHadoopConf()).length
  }

  private def readLongs(dir: String): Seq[Long] =
    spark.read.format("fls").load(dir).select("v").collect().map(_.getLong(0)).toSeq.sorted

  test("flat table: many small files compact into few, data identical") {
    val dir = Files.createTempDirectory("fls-compact-flat").toString
    val sp = spark; import sp.implicits._
    (0 until 10).foreach { i =>
      (i * 100L + 1 to i * 100L + 100).toDF("v").coalesce(1)
        .write.format("fls").mode("append").save(dir)
    }
    assert(flsCount(dir) == 10)
    val stats = FlsMaintenance.compact(spark, dir, targetRowsPerFile = 1000)
    assert(stats.filesBefore == 10 && stats.rows == 1000)
    assert(stats.filesAfter == 1, s"expected 1 compacted file, got ${stats.filesAfter}")
    assert(readLongs(dir) == (1L to 1000L))
  }

  test("partitioned table compacts per partition and keeps the hive layout") {
    val dir = Files.createTempDirectory("fls-compact-part").toString
    val sp = spark; import sp.implicits._
    (0 until 6).foreach { i =>
      Seq((i * 10L + 1, "a"), (i * 10L + 2, "b")).toDF("v", "p")
        .repartition(col("p"))
        .write.format("fls").mode("append").option("partition_by", "p").save(dir)
    }
    val before = flsCount(dir)
    assert(before >= 12, s"setup should leave many small files, got $before")
    val stats = FlsMaintenance.compact(spark, dir, targetRowsPerFile = 1000)
    assert(stats.filesAfter < before)
    assert(new java.io.File(dir, "p=a").isDirectory && new java.io.File(dir, "p=b").isDirectory,
      "compaction must preserve the k=v layout")
    val got = spark.read.format("fls").load(dir)
      .select("v", "p").collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val want = (0 until 6).flatMap(i =>
      Seq((i * 10L + 1, "a"), (i * 10L + 2, "b"))).sortBy(_._1)
    assert(got == want)
    // partition pruning still works on the compacted table
    val pruned = spark.read.format("fls").load(dir).filter(col("p") === "a").count()
    assert(pruned == 6)
  }

  test("one partition subdirectory compacts in place; the rest untouched") {
    val dir = Files.createTempDirectory("fls-compact-sub").toString
    val sp = spark; import sp.implicits._
    (0 until 5).foreach { i =>
      Seq((i + 1L, "hot"), (i + 100L, "cold")).toDF("v", "p")
        .repartition(col("p"))
        .write.format("fls").mode("append").option("partition_by", "p").save(dir)
    }
    val coldBefore = flsCount(s"$dir/p=cold")
    val stats = FlsMaintenance.compact(spark, s"$dir/p=hot", targetRowsPerFile = 1000)
    assert(stats.filesBefore == 5 && stats.filesAfter == 1)
    assert(flsCount(s"$dir/p=cold") == coldBefore, "untargeted partition was touched")
    val got = spark.read.format("fls").load(dir)
      .select("v", "p").collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got == ((1L to 5L).map((_, "hot")) ++ (100L to 104L).map((_, "cold"))).sorted)
  }

  test("manifest table compacts atomically and stays in manifest mode") {
    val dir = Files.createTempDirectory("fls-compact-man").toString
    val sp = spark; import sp.implicits._
    (0 until 8).foreach { i =>
      (i * 10L + 1 to i * 10L + 10).toDF("v").coalesce(1)
        .write.format("fls").mode("append").option("commit_mode", "manifest").save(dir)
    }
    assert(flsCount(dir) == 8)
    val stats = FlsMaintenance.compact(spark, dir, targetRowsPerFile = 1000)
    assert(stats.filesAfter == 1)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val entries = FlsManifest.read(fs, p)
    assert(entries.isDefined && entries.get.length == 1,
      "compaction of a manifest table must republish a manifest")
    assert(readLongs(dir) == (1L to 80L))
  }

  test("compaction defers input deletion: pinned readers survive, vacuum reclaims") {
    val dir = Files.createTempDirectory("fls-compact-defer").toString
    val sp = spark; import sp.implicits._
    (0 until 4).foreach { i =>
      (i * 10L + 1 to i * 10L + 10).toDF("v").coalesce(1)
        .write.format("fls").mode("append").option("commit_mode", "manifest").save(dir)
    }
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val (preV, preEntries) = FlsManifest.readVersioned(fs, p).get
    FlsMaintenance.compact(spark, dir, targetRowsPerFile = 1000)
    // inputs stay on disk (un-vouched) so a reader pinned to the
    // pre-compaction version still plans and reads its exact files
    preEntries.foreach(e => assert(fs.exists(new Path(p, e.rel)),
      s"compaction must not eagerly delete input ${e.rel}"))
    val pinned = spark.read.format("fls")
      .option("manifest_version", preV.toString).load(dir)
      .select("v").collect().map(_.getLong(0)).toSeq.sorted
    assert(pinned == (1L to 40L))
    assert(readLongs(dir) == (1L to 40L)) // current version identical
    // vacuum honors RETENTION, not just the head (r12 time-travel
    // contract): version preV still names the inputs, so even a
    // zero-horizon vacuum must keep them readable
    FlsMaintenance.vacuum(spark, dir, olderThanHours = 0)
    preEntries.foreach(e => assert(fs.exists(new Path(p, e.rel)),
      s"vacuum must not reclaim ${e.rel} while v$preV is retained"))
    assert(spark.read.format("fls")
      .option("manifest_version", preV.toString).load(dir).count() == 40)
    // age the pre-compaction versions past the retention window
    // (KeepVersions = 8), after which vacuum CAN reclaim the inputs
    (0 until 8).foreach { i =>
      Seq(1000L + i).toDF("v").coalesce(1)
        .write.format("fls").mode("append").option("commit_mode", "manifest").save(dir)
    }
    val vs = FlsMaintenance.vacuum(spark, dir, olderThanHours = 0)
    assert(vs.deleted >= preEntries.length,
      s"vacuum should reclaim the ${preEntries.length} replaced inputs, deleted ${vs.deleted}")
    preEntries.foreach(e => assert(!fs.exists(new Path(p, e.rel))))
    assert(readLongs(dir) == (1L to 40L) ++ (1000L to 1007L)) // intact
  }

  test("eagerDeleteInputs=true restores immediate cleanup") {
    val dir = Files.createTempDirectory("fls-compact-eager").toString
    val sp = spark; import sp.implicits._
    (0 until 3).foreach { i =>
      (i * 10L + 1 to i * 10L + 10).toDF("v").coalesce(1)
        .write.format("fls").mode("append").option("commit_mode", "manifest").save(dir)
    }
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val (_, preEntries) = FlsManifest.readVersioned(fs, p).get
    FlsMaintenance.compact(spark, dir, targetRowsPerFile = 1000,
      eagerDeleteInputs = true)
    preEntries.foreach(e => assert(!fs.exists(new Path(p, e.rel)),
      s"eager mode must delete input ${e.rel}"))
    assert(readLongs(dir) == (1L to 30L))
  }

  test("sortBy clustering makes zone maps prune range filters after compaction") {
    val dir = Files.createTempDirectory("fls-compact-sort").toString
    val sp = spark; import sp.implicits._
    // 8 appends, each spanning the WHOLE value domain (v ≡ k mod 8) —
    // the worst case for zone maps: every file may contain any range
    (0 until 8).foreach { k =>
      (0 until 500).map(i => i * 8L + k).toDF("v").coalesce(1)
        .write.format("fls").mode("append").save(dir)
    }
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.fls.connector.{FlsDataSource, FlsScanBuilder}
    def planned(filter: org.apache.spark.sql.sources.Filter): Int = {
      val opts = new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
      val schema = new FlsDataSource().inferSchema(opts)
      val builder = new FlsScanBuilder(schema, opts)
      builder.pushFilters(Array(filter))
      // pin 1 row group per split so the count measures pruning
      spark.conf.set("spark.sql.files.openCostInBytes", "134217728")
      try builder.build().toBatch.planInputPartitions().length
      finally spark.conf.unset("spark.sql.files.openCostInBytes")
    }
    val f = org.apache.spark.sql.sources.LessThan("v", 500L)
    assert(planned(f) == 8, "before clustering, every file spans the full domain")
    val stats = FlsMaintenance.compact(spark, dir,
      targetRowsPerFile = 500, sortBy = Seq("v"))
    assert(stats.filesAfter >= 4, s"range repartition should spread files, got $stats")
    assert(planned(f) <= 2,
      s"clustered zone maps must prune the range filter, still planning ${planned(f)}")
    assert(readLongs(dir) == (0L until 4000L))
  }

  test("zorderBy compaction prunes range filters on BOTH clustered dimensions") {
    val dir = Files.createTempDirectory("fls-compact-zorder").toString
    val sp = spark; import sp.implicits._
    // every append spans both value domains — zone maps start useless
    (0 until 8).foreach { k =>
      (0 until 2000).map { i =>
        val id = i * 8 + k
        (((id * 2654435761L) % 1000 + 1000) % 1000,
          ((id * 40503L + 7) % 1000 + 1000) % 1000, id.toLong)
      }.toDF("a", "b", "id").coalesce(1)
        .write.format("fls").mode("append").save(dir)
    }
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.fls.connector.{FlsDataSource, FlsScanBuilder}
    def planned(filter: org.apache.spark.sql.sources.Filter): Int = {
      val opts = new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
      val schema = new FlsDataSource().inferSchema(opts)
      val builder = new FlsScanBuilder(schema, opts)
      builder.pushFilters(Array(filter))
      spark.conf.set("spark.sql.files.openCostInBytes", "134217728")
      try builder.build().toBatch.planInputPartitions().length
      finally spark.conf.unset("spark.sql.files.openCostInBytes")
    }
    import org.apache.spark.sql.sources.{And, GreaterThanOrEqual, LessThan}
    val fa = And(GreaterThanOrEqual("a", 0L), LessThan("a", 50L))
    val fb = And(GreaterThanOrEqual("b", 0L), LessThan("b", 50L))
    val before = spark.read.format("fls").load(dir)
      .orderBy("id").collect().map(_.getLong(2)).toSeq
    assert(planned(fa) == 8 && planned(fb) == 8,
      "before clustering, every file spans both domains")
    FlsMaintenance.compact(spark, dir,
      targetRowsPerFile = 1024, zorderBy = Seq("a", "b"))
    val total = planned(GreaterThanOrEqual("id", 0L))
    // a 5% band on EITHER dimension must skip most row groups — the
    // property a single-column sortBy cannot deliver
    assert(planned(fa) * 2 < total, s"dim a: ${planned(fa)} of $total")
    assert(planned(fb) * 2 < total, s"dim b: ${planned(fb)} of $total")
    // rows survive the rewrite exactly
    assert(spark.read.format("fls").load(dir)
      .orderBy("id").collect().map(_.getLong(2)).toSeq == before)
    // sortBy and zorderBy cannot combine
    intercept[IllegalArgumentException] {
      FlsMaintenance.compact(spark, dir, sortBy = Seq("a"), zorderBy = Seq("a", "b"))
    }
  }

  test("compaction refuses while a write job is in flight") {
    val dir = Files.createTempDirectory("fls-compact-inflight").toString
    val sp = spark; import sp.implicits._
    (1L to 100L).toDF("v").coalesce(1).write.format("fls").mode("append").save(dir)
    // simulate an in-flight writer: a live staging tree
    val staging = new java.io.File(dir, "_temporary/some-live-job")
    assert(staging.mkdirs())
    val e = intercept[IllegalArgumentException] {
      FlsMaintenance.compact(spark, dir)
    }
    assert(e.getMessage.contains("in flight"))
    // once the writer finishes (staging gone), compaction proceeds
    assert(staging.delete() && staging.getParentFile.delete())
    assert(FlsMaintenance.compact(spark, dir).rows == 100L)
  }

  test("appends landing DURING manifest compaction survive the swap") {
    val dir = Files.createTempDirectory("fls-compact-race").toString
    val sp = spark; import sp.implicits._
    (0 until 8).foreach { i =>
      (i * 100L + 1 to i * 100L + 100).toDF("v").coalesce(1)
        .write.format("fls").mode("append").option("commit_mode", "manifest").save(dir)
    }
    // compact on one thread while appends keep landing on another: the
    // invariant must hold under ANY interleaving — every appended row
    // survives, whether it beat the freeze (rewritten) or landed
    // mid-rewrite (kept by the CAS swap merge)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val compactT = new Thread(() =>
      try FlsMaintenance.compact(spark, dir, targetRowsPerFile = 10000)
      catch { case t: Throwable => errs.add(t) })
    val appendT = new Thread(() =>
      try (0 until 4).foreach { i =>
        (9000L + i * 10 + 1 to 9000L + i * 10 + 10).toDF("v").coalesce(1)
          .write.format("fls").mode("append").option("commit_mode", "manifest").save(dir)
      } catch { case t: Throwable => errs.add(t) })
    compactT.start(); appendT.start()
    compactT.join(); appendT.join()
    assert(errs.isEmpty, s"neither job may fail: ${errs.toArray.toSeq}")
    assert(readLongs(dir) == ((1L to 800L) ++ (9001L to 9040L)),
      "rows appended during compaction were lost")
  }

  test("two concurrent compacts: no data loss; a stale swap aborts loudly") {
    val dir = Files.createTempDirectory("fls-compact-dup").toString
    val sp = spark; import sp.implicits._
    (0 until 6).foreach { i =>
      (i * 10L + 1 to i * 10L + 10).toDF("v").coalesce(1)
        .write.format("fls").mode("append").option("commit_mode", "manifest").save(dir)
    }
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ts = (0 until 2).map { _ =>
      new Thread(() =>
        try { FlsMaintenance.compact(spark, dir, targetRowsPerFile = 1000); outcomes.add("ok") }
        catch {
          case _: java.util.ConcurrentModificationException => outcomes.add("conflict")
          case t: Throwable => outcomes.add(s"unexpected: $t")
        })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val os = outcomes.toArray.map(_.toString).toSeq.sorted
    assert(os.count(_ == "ok") >= 1, s"at least one compact must win: $os")
    assert(os.forall(o => o == "ok" || o == "conflict"),
      s"the loser must abort with the documented conflict, got: $os")
    assert(readLongs(dir) == (1L to 60L), "concurrent compacts must never lose rows")
  }

  test("vacuum removes old unvouched junk from manifest tables, keeps recent and vouched") {
    val dir = Files.createTempDirectory("fls-vacuum").toString
    val sp = spark; import sp.implicits._
    (1L to 100L).toDF("v").coalesce(1)
      .write.format("fls").mode("overwrite").option("commit_mode", "manifest").save(dir)
    // crashed-job leftovers: an OLD complete-but-uncommitted file and an
    // OLD partial file — invisible to readers, but disk-resident
    java.nio.file.Files.write(
      new java.io.File(dir, "part-00000-crashed-a-77.fls").toPath,
      Array.fill[Byte](200)(0x41))
    java.nio.file.Files.write(
      new java.io.File(dir, "part-00001-crashed-a-77.fls").toPath,
      Array.fill[Byte](100)(0x42))
    Seq("part-00000-crashed-a-77.fls", "part-00001-crashed-a-77.fls").foreach { n =>
      new java.io.File(dir, n).setLastModified(System.currentTimeMillis() - 48L * 3600 * 1000)
    }
    // a RECENT unvouched file: a live writer's not-yet-published output
    java.nio.file.Files.write(
      new java.io.File(dir, "part-00000-live-b-1.fls").toPath,
      Array.fill[Byte](50)(0x43))
    val v = FlsMaintenance.vacuum(spark, dir, olderThanHours = 24)
    assert(v.deleted == 2 && v.bytes == 300, s"got $v")
    assert(!new java.io.File(dir, "part-00000-crashed-a-77.fls").exists())
    assert(new java.io.File(dir, "part-00000-live-b-1.fls").exists(),
      "recent unvouched files belong to in-flight writers — never vacuum them")
    assert(readLongs(dir) == (1L to 100L), "vacuum must not change query results")
  }

  test("vacuum refuses listing-mode tables") {
    val dir = Files.createTempDirectory("fls-vacuum-listing").toString
    val sp = spark; import sp.implicits._
    (1L to 10L).toDF("v").write.format("fls").mode("overwrite").save(dir)
    val e = intercept[IllegalArgumentException] {
      FlsMaintenance.vacuum(spark, dir)
    }
    assert(e.getMessage.contains("listing-mode"))
  }

  test("compacting a subdir of a manifest table is refused") {
    val dir = Files.createTempDirectory("fls-compact-man-sub").toString
    val sp = spark; import sp.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("v", "p").repartition(col("p"))
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").option("partition_by", "p").save(dir)
    val e = intercept[IllegalArgumentException] {
      FlsMaintenance.compact(spark, s"$dir/p=a")
    }
    assert(e.getMessage.contains("manifest"))
  }
}
