package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `readStream.format("fls")`: tail an fls table as a micro-batch
  * stream — discovery is durably logged per batch under the checkpoint,
  * so restarts replay deterministically and process each file exactly
  * once. */
class FlsStreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-stream-spec").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-streaming-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Run to completion with AvailableNow, collecting every emitted row
    * (foreachBatch — the memory sink cannot recover from a checkpoint). */
  private def runAvailableNow(dir: String, ckpt: String,
      schema: org.apache.spark.sql.types.StructType,
      opts: Map[String, String] = Map.empty): Seq[org.apache.spark.sql.Row] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val q = spark.readStream.format("fls").schema(schema).options(opts).load(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(got.add)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    got.iterator().asScala.toSeq
  }

  test("streaming read processes each file exactly once across restarts") {
    val sp = spark; import sp.implicits._
    val dir = s"$tmp/tail"
    val ckpt = s"$tmp/tail_ckpt"
    (1L to 100L).toDF("v").repartition(2).write.format("fls").mode("append").save(dir)
    val schema = spark.read.format("fls").load(dir).schema

    val r1 = runAvailableNow(dir, ckpt, schema)
    assert(r1.map(_.getLong(0)).sorted == (1L to 100L))

    // land more files; a restarted query on the SAME checkpoint must
    // emit ONLY the new files' rows
    (101L to 150L).toDF("v").repartition(2).write.format("fls").mode("append").save(dir)
    val r2 = runAvailableNow(dir, ckpt, schema)
    assert(r2.map(_.getLong(0)).sorted == (101L to 150L))

    // nothing new: a third run emits nothing
    val r3 = runAvailableNow(dir, ckpt, schema)
    assert(r3.isEmpty)
  }

  test("streaming read of a partitioned table surfaces partition columns") {
    val sp = spark; import sp.implicits._
    val dir = s"$tmp/part"
    val ckpt = s"$tmp/part_ckpt"
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "p")
      .repartition(col("p"))
      .write.format("fls").mode("append").option("partition_by", "p").save(dir)
    val schema = spark.read.format("fls").load(dir).schema
    val got = runAvailableNow(dir, ckpt, schema)
      .map(r => (r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("p"))))
      .sortBy(_._1)
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "a")))
  }

  test("files of an in-flight rename-mode job are deferred, not logged") {
    val sp = spark; import sp.implicits._
    val dir = s"$tmp/inflight"
    val ckpt = s"$tmp/inflight_ckpt"
    (1L to 20L).toDF("v").coalesce(1).write.format("fls").mode("append").save(dir)
    // simulate a job mid-commit: one of its files is already renamed to
    // its final name, but its staging tree still exists (the job could
    // yet abort and delete that file)
    val writeId = "dead00d-0000-0000-0000-00000000beef"
    val src = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".fls")).head
    val pending = new java.io.File(dir, s"part-00009-$writeId-7-0000.fls")
    java.nio.file.Files.copy(src.toPath, pending.toPath)
    val staging = new java.io.File(dir, s"_temporary/$writeId")
    staging.mkdirs()
    val schema = spark.read.format("fls").load(dir).schema
    val r1 = runAvailableNow(dir, ckpt, schema)
    assert(r1.map(_.getLong(0)).sorted == (1L to 20L),
      "in-flight job's file must be deferred while its staging tree exists")
    // job commits: staging tree removed — the file becomes streamable
    staging.delete()
    new java.io.File(dir, "_temporary").delete()
    val r2 = runAvailableNow(dir, ckpt, schema)
    assert(r2.map(_.getLong(0)).sorted == (1L to 20L),
      "the file must flow once its job's staging tree is gone")
  }

  test("max_files_per_trigger bounds each micro-batch; AvailableNow still drains all") {
    val sp = spark; import sp.implicits._
    val dir = s"$tmp/ratelimit"
    val ckpt = s"$tmp/ratelimit_ckpt"
    (1L to 600L).toDF("v").repartition(6).write.format("fls").mode("append").save(dir)
    val schema = spark.read.format("fls").load(dir).schema
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("fls").schema(schema)
      .option("max_files_per_trigger", "2").load(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) batches.incrementAndGet()
        batch.collect().foreach(r => got.add(r.getLong(0)))
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(got.iterator().asScala.toSeq.sorted == (1L to 600L),
      "every file must drain despite the cap")
    assert(batches.get() == 3, s"6 files at 2/trigger should take 3 batches, got ${batches.get()}")
  }

  test("streaming read of a manifest table sees only published files") {
    val sp = spark; import sp.implicits._
    val dir = s"$tmp/man"
    val ckpt = s"$tmp/man_ckpt"
    (1L to 50L).toDF("v").write.format("fls").mode("append")
      .option("commit_mode", "manifest").save(dir)
    // junk outside the manifest must be invisible to the stream too
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "junk.fls"),
      "not an fls file".getBytes)
    val schema = spark.read.format("fls").load(dir).schema
    val got = runAvailableNow(dir, ckpt, schema)
    assert(got.map(_.getLong(0)).sorted == (1L to 50L))
  }

  private def logFiles(ckpt: String): Seq[String] = {
    val d = new java.io.File(s"$ckpt/sources/0/fls-batches")
    Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      .map(_.getName).filterNot(_.startsWith(".")).sorted
  }

  test("batch log compacts at the committed watermark; restarts resume from the compact") {
    val sp = spark; import sp.implicits._
    val dir = s"$tmp/compact"
    val ckpt = s"$tmp/compact_ckpt"
    (1L to 90L).toDF("v").repartition(3).write.format("fls").mode("append").save(dir)
    val schema = spark.read.format("fls").load(dir).schema
    val opts = Map("max_files_per_trigger" -> "1", "log_compact_interval" -> "1")
    val r1 = runAvailableNow(dir, ckpt, schema, opts)
    assert(r1.map(_.getLong(0)).sorted == (1L to 90L))
    // 3 batches ran; Spark commits batch n at the start of batch n+1,
    // so batches 0 and 1 compacted (interval 1) and only the LAST
    // batch's log can remain uncompacted — the log never grows with
    // batch count, which is the point
    def checkBounded(): Unit = {
      val names = logFiles(ckpt)
      val (compacts, numerics) = names.partition(_.endsWith(".compact"))
      assert(compacts.size == 1, s"exactly one compact must survive, got $names")
      val cid = compacts.head.stripSuffix(".compact").toLong
      assert(numerics.forall(_.toLong > cid),
        s"logs at or below the compact watermark must be deleted, got $names")
      assert(numerics.size <= 1,
        s"only the last (uncommitted-to-source) batch log may remain, got $names")
    }
    checkBounded()

    // a restart on the compacted checkpoint must NOT re-ingest anything…
    val r2 = runAvailableNow(dir, ckpt, schema, opts)
    assert(r2.isEmpty, "compacted checkpoint re-ingested already-processed files")
    // …and must still pick up genuinely new files
    (91L to 120L).toDF("v").coalesce(1).write.format("fls").mode("append").save(dir)
    val r3 = runAvailableNow(dir, ckpt, schema, opts)
    assert(r3.map(_.getLong(0)).sorted == (91L to 120L))
    checkBounded()
  }

  test("a file already delete-vectored at discovery streams only live rows") {
    // the stream freezes each file's DV pointer AT DISCOVERY: a table
    // whose files carry DVs before the stream first lists them must not
    // resurrect deleted rows
    spark.conf.set("spark.sql.catalog.flsdvs", "graft.fls.connector.FlsCatalog")
    spark.conf.set("spark.sql.catalog.flsdvs.path", s"$tmp/dv_wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS flsdvs.db")
    spark.sql("CREATE TABLE flsdvs.db.t (id BIGINT) TBLPROPERTIES " +
      "('commit_mode'='manifest','delete_mode'='merge-on-read')")
    spark.sql("INSERT INTO flsdvs.db.t SELECT id FROM range(0, 100)")
    spark.sql("DELETE FROM flsdvs.db.t WHERE id IN (5, 50)") // DVs, no rewrite
    val dir = s"$tmp/dv_wh/db/t"
    val schema = spark.read.format("fls").load(dir).schema
    val got = runAvailableNow(dir, s"$tmp/dv_ckpt", schema)
    assert(got.map(_.getLong(0)).sorted ==
      (0L until 100L).filterNot(Set(5L, 50L)),
      "discovery-frozen DV must be applied at decode")
  }

  test("a DV attached after a file streamed never retracts — append-only contract") {
    // SPEC-LOCK of the streaming-vs-DML stance (mirrors incremental
    // reads' rewrite refusal): an append-only stream has no retraction
    // channel, so a merge-on-read DELETE against an ALREADY-STREAMED
    // file changes nothing downstream — the rows were emitted, and the
    // file is not re-ingested. Pipelines that must propagate deletes
    // re-snapshot or consume the DML boundary explicitly.
    spark.conf.set("spark.sql.catalog.flsdva", "graft.fls.connector.FlsCatalog")
    spark.conf.set("spark.sql.catalog.flsdva.path", s"$tmp/dva_wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS flsdva.db")
    spark.sql("CREATE TABLE flsdva.db.t (id BIGINT) TBLPROPERTIES " +
      "('commit_mode'='manifest','delete_mode'='merge-on-read')")
    spark.sql("INSERT INTO flsdva.db.t SELECT id FROM range(0, 100)")
    val dir = s"$tmp/dva_wh/db/t"
    val ckpt = s"$tmp/dva_ckpt"
    val schema = spark.read.format("fls").load(dir).schema
    val r1 = runAvailableNow(dir, ckpt, schema)
    assert(r1.map(_.getLong(0)).sorted == (0L until 100L))
    // DV lands on an already-streamed file: no retraction, no re-emit
    spark.sql("DELETE FROM flsdva.db.t WHERE id = 7")
    val r2 = runAvailableNow(dir, ckpt, schema)
    assert(r2.isEmpty,
      "append-only: a post-stream DV neither retracts nor re-emits")
    // batch and stream now legitimately disagree on the deleted row
    assert(spark.sql("SELECT count(*) FROM flsdva.db.t")
      .collect()(0).getLong(0) == 99L)
    // new commits still flow — and their files' DV state freezes at
    // THEIR discovery (id=105 deleted before the stream saw the file)
    spark.sql("INSERT INTO flsdva.db.t SELECT id FROM range(100, 120)")
    spark.sql("DELETE FROM flsdva.db.t WHERE id = 105")
    val r3 = runAvailableNow(dir, ckpt, schema)
    assert(r3.map(_.getLong(0)).sorted ==
      (100L until 120L).filterNot(_ == 105L),
      "newly discovered files apply their discovery-time DV")
  }

  test("seen entries of deleted files age out at compaction; live files never do") {
    val sp = spark; import sp.implicits._
    val dir = s"$tmp/expire"
    val ckpt = s"$tmp/expire_ckpt"
    (1L to 40L).toDF("v").repartition(2).write.format("fls").mode("append").save(dir)
    val schema = spark.read.format("fls").load(dir).schema
    // expire 0: only "still listed in the table" keeps an entry alive
    val opts = Map("log_compact_interval" -> "1", "log_expire_ms" -> "0")
    assert(runAvailableNow(dir, ckpt, schema, opts).size == 40)
    val Array(victim, survivor) =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".fls")).take(2)
    assert(victim.delete())
    (41L to 60L).toDF("v").coalesce(1).write.format("fls").mode("append").save(dir)
    // the run's first new batch triggers the deferred commit of batch 0,
    // which compacts: the deleted file's entry must age out (expire 0,
    // not listed), the surviving live file's must stay (listed)
    val r2 = runAvailableNow(dir, ckpt, schema, opts)
    assert(r2.map(_.getLong(0)).sorted == (41L to 60L),
      "surviving live file was re-ingested or new file missed")
    val compactEntries = {
      val f = new java.io.File(s"$ckpt/sources/0/fls-batches")
        .listFiles().filter(_.getName.endsWith(".compact")).head
      new String(java.nio.file.Files.readAllBytes(f.toPath))
        .split('\n').filter(_.nonEmpty).toSeq.map(_.split('\t')(1))
    }
    assert(!compactEntries.exists(_.endsWith(victim.getName)),
      "deleted file's seen entry survived compaction with expire=0")
    assert(compactEntries.exists(_.endsWith(survivor.getName)),
      "live file's seen entry must survive compaction")
    // and the survivor really is not re-ingested on a further run
    assert(runAvailableNow(dir, ckpt, schema, opts).isEmpty)
  }
}
