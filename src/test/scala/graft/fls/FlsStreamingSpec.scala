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
      schema: org.apache.spark.sql.types.StructType): Seq[org.apache.spark.sql.Row] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val q = spark.readStream.format("fls").schema(schema).load(dir)
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
}
