package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.util.StreamStateMetrics

/** State-footprint observability for stateful streaming queries
  * ([[StreamStateMetrics]], r17): the symmetric-hash state of the
  * q92-class stream-stream range join is measured per micro-batch
  * (rows/bytes from StreamingQueryProgress), not inferred from GC. */
class StreamStateMetricsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("state-metrics-spec").toString
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("state-metrics-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a stateful query's per-batch state rows/bytes are captured and " +
      "summarized; a stateless run records zero state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val stateful = in.toDF().withColumnRenamed("value", "v")
      .dropDuplicates("v") // keyed state: one row per distinct v
    in.addData(1L to 200L: _*)
    in.addData(150L to 300L: _*) // second batch: 150 dup, 100 new
    StreamStateMetrics.observe(spark) {
      val q = stateful.writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/ckpt1")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val s = StreamStateMetrics.lastSummary.get
    assert(s.batches >= 1, s"no batches observed: $s")
    assert(s.peakRows == 300L,
      s"dedup state must hold one row per distinct key, got $s")
    assert(s.peakBytes > 0L, s"state bytes must be reported: $s")
    assert(StreamStateMetrics.lastSamples.forall(_.operator.nonEmpty))
  }

  test("q92's stream-stream range join reports its symmetric-hash " +
      "state footprint (the 128x GC band is measured, not inferred)") {
    StreamStateMetrics.lastSummary = None
    val out = graft.queries.Streaming.q92StreamStreamRangeJoin(spark, sf)
    assert(out.count() > 0, "q92 must produce attributed signups")
    val s = StreamStateMetrics.lastSummary
    assert(s.isDefined, "q92 must record a state summary")
    assert(s.get.peakRows > 0,
      s"the symmetric-hash join must report buffered state rows: ${s.get}")
    assert(s.get.peakBytes > 0, s.get.toString)
  }
}
