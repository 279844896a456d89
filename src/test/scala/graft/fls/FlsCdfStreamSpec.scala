package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming change-data-feed
  * ([[graft.fls.connector.FlsCdfMicroBatchStream]]): the manifest
  * version is the offset, the manifest log is the WAL, micro-batches
  * replay deterministically from immutable versions. Locks the start
  * cursors (earliest / pinned / default-tail), exactly-once resume
  * across runs, retraction delivery (the channel the append-only file
  * stream refuses), version capping, and the loud fall-behind refusal.
  */
class FlsCdfStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-cdf-stream-spec").toString
  private val cat = "fls_cdfs_spec"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-cdf-stream-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(s"spark.sql.catalog.$cat", "graft.fls.connector.FlsCatalog")
      .config(s"spark.sql.catalog.$cat.path", s"$tmp/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def mkTable(name: String): (String, String) = {
    val tbl = s"$cat.db.$name"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, v DOUBLE) TBLPROPERTIES " +
      "('commit_mode'='manifest','delete_mode'='merge-on-read')")
    (tbl, s"$tmp/warehouse/db/$name")
  }

  /** Run one AvailableNow pass of `src` into a parquet sink (the
    * memory sink refuses checkpoint recovery); the same checkpoint +
    * path resume across calls, so the returned rows are CUMULATIVE
    * across runs. */
  private def drain(src: DataFrame, checkpoint: String,
      outDir: String): Array[(String, Long, Long)] = {
    val q = src.writeStream
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    try spark.read.parquet(outDir)
      .select("_change_type", "_commit_version", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    catch { // zero batches ever committed: the sink dir never appeared
      case e: org.apache.spark.sql.AnalysisException
        if e.getMessage.contains("PATH_NOT_FOUND") ||
          e.getMessage.toLowerCase.contains("path does not exist") =>
        Array.empty
    }
  }

  test("earliest drains the retained feed; resume emits only NEW commits") {
    val (tbl, dir) = mkTable("resume")
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS DOUBLE) FROM range(0, 10)")
    spark.sql(s"DELETE FROM $tbl WHERE id = 3") // v2: a DV — a RETRACTION
    val ckpt = s"$tmp/ckpt_resume"
    val out = s"$tmp/out_resume"
    def src = spark.readStream.format("fls")
      .option("cdf_from_version", "earliest").load(dir)
    val run1 = drain(src, ckpt, out)
    assert(run1.count(_._1 == "insert") == 10)
    assert(run1.filter(_._1 == "delete").toSet == Set(("delete", 2L, 3L)),
      "the DV delete arrives as a retraction row — the channel the " +
        "append-only file stream cannot provide")
    assert(run1.forall(r => r._2 == 1L || r._2 == 2L))

    // new commits while the stream is down; resume from the checkpoint
    spark.sql(s"INSERT INTO $tbl VALUES (100, 1.0)") // v3
    spark.sql(s"DELETE FROM $tbl WHERE id = 5")      // v4
    val run2 = drain(src, ckpt, out) // sink is cumulative across runs
    assert(run2.toSet -- run1.toSet ==
      Set(("insert", 3L, 100L), ("delete", 4L, 5L)))
    assert(run2.length == run1.length + 2,
      "exactly-once: already-committed versions never re-emit")
  }

  test("default start (read_change_feed, no version) tails from the head") {
    val (tbl, dir) = mkTable("tail")
    spark.sql(s"INSERT INTO $tbl SELECT id, CAST(id AS DOUBLE) FROM range(0, 5)")
    val ckpt = s"$tmp/ckpt_tail"
    val out = s"$tmp/out_tail"
    def src = spark.readStream.format("fls")
      .option("read_change_feed", "true").load(dir)
    // v1 predates the stream: the first drain sees NOTHING
    val run1 = drain(src, ckpt, out)
    assert(run1.isEmpty, "tail mode subscribes to FUTURE changes only")
    spark.sql(s"INSERT INTO $tbl VALUES (50, 5.0)") // v2
    val run2 = drain(src, ckpt, out)
    assert(run2.toSet == Set(("insert", 2L, 50L)))
  }

  test("max_versions_per_trigger bounds each micro-batch; AvailableNow still drains") {
    val (tbl, dir) = mkTable("capped")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)")
    spark.sql(s"INSERT INTO $tbl VALUES (2, 2.0)")
    spark.sql(s"INSERT INTO $tbl VALUES (3, 3.0)")
    val q = spark.readStream.format("fls")
      .option("cdf_from_version", "earliest")
      .option("max_versions_per_trigger", "1")
      .load(dir)
      .writeStream.format("memory").queryName("cdf_capped")
      .option("checkpointLocation", s"$tmp/ckpt_capped")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("cdf_capped")
      .select("_commit_version", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 1L), (2L, 2L), (3L, 3L)), "drained to the head")
    // one version per batch: at least three non-empty batches ran
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3, s"expected >=3 capped batches, saw $batches")
  }

  test("SQL surface: readStream.table(t.changes) streams the feed") {
    val (tbl, dir) = mkTable("sqlstream")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0), (2, 2.0)")
    spark.sql(s"DELETE FROM $tbl WHERE id = 2")
    val run = drain(spark.readStream.table(s"$tbl.changes"),
      s"$tmp/ckpt_sqlstream", s"$tmp/out_sqlstream")
    assert(run.toSet == Set(("insert", 1L, 1L), ("insert", 1L, 2L),
      ("delete", 2L, 2L)))
    assert(dir.nonEmpty)
  }

  test("cdf_from_timestamp seeds the stream cursor") {
    val (tbl, dir) = mkTable("ts_stream")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)") // v1
    Thread.sleep(30)
    spark.sql(s"INSERT INTO $tbl VALUES (2, 2.0)") // v2
    val t2 = spark.sql(
      s"SELECT unix_millis(committed_at) FROM $tbl.history WHERE version = 2")
      .collect()(0).getLong(0)
    val run = drain(
      spark.readStream.format("fls")
        .option("cdf_from_timestamp", t2.toString).load(dir),
      s"$tmp/ckpt_ts_stream", s"$tmp/out_ts_stream")
    assert(run.toSet == Set(("insert", 2L, 2L)),
      "the stream starts at the first commit at/after the instant")
  }

  test("falling behind retention refuses loudly with the snapshot remedy") {
    val (tbl, dir) = mkTable("behind")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0)")
    val ckpt = s"$tmp/ckpt_behind"
    val out = s"$tmp/out_behind"
    def src = spark.readStream.format("fls")
      .option("cdf_from_version", "earliest").load(dir)
    drain(src, ckpt, out) // checkpoint now at v1
    // push v1 far past the retention window (KeepVersions = 8)
    (0 until 10).foreach(i => spark.sql(s"INSERT INTO $tbl VALUES (${10 + i}, 0.0)"))
    val e = intercept[Exception] { drain(src, ckpt, out) }
    val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.toString
    assert(msg.contains("not retained") || msg.contains("retention"),
      s"unexpected failure: $msg")
  }
}
