package graft

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.IncrementalIvf

/** Incremental IVF index maintenance ([[IncrementalIvf]]): a refresh
  * after an append reads ONLY the appended corpus files (scan-bytes
  * asserted) and assigns only their vectors against the persisted
  * centroids; the patched index is BIT-IDENTICAL to a from-scratch
  * rebuild at the same geometry (both flat and two-level); an
  * up-to-date refresh is a zero-job no-op; outgrowing the drift
  * threshold reclusters; non-append ranges refuse and rebuild()
  * recovers. */
class IvfIncrementalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("ivf-inc-spec").toString
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("ivf-inc-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emb() = spark.read.parquet(s"$sf/embeddings.parquet")

  // 450-vector build + 30-vector append: ⌈√450⌉ = ⌈√480⌉ = 22, so the
  // patched index and a from-scratch rebuild share the exact geometry
  // and must be bit-identical
  private def seed(dir: String): Unit =
    emb().filter(col("vec_id") < 450).repartition(5)
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").save(dir)

  private def append(dir: String): Unit =
    emb().filter(col("vec_id") >= 450 && col("vec_id") < 480).repartition(2)
      .write.format("fls").mode("append")
      .option("commit_mode", "manifest").save(dir)

  private def triples(idx: String): Set[(Long, Long, Double, Int)] =
    spark.read.format("fls").load(idx)
      .select("vec_id", "cent_id", "ccos", "ar").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  private class Metrics extends SparkListener {
    @volatile var jobs = 0
    @volatile var bytesRead = 0L
    override def onJobStart(s: SparkListenerJobStart): Unit = jobs += 1
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        bytesRead += t.taskMetrics.inputMetrics.bytesRead
  }

  private def measured[A](body: => A): (A, Metrics) = {
    val m = new Metrics
    spark.sparkContext.addSparkListener(m)
    try {
      val r = body
      Thread.sleep(400)
      (r, m)
    } finally spark.sparkContext.removeSparkListener(m)
  }

  test("flat index: refresh after an append is O(new data), the patch " +
      "equals a from-scratch rebuild, no-op refresh runs zero jobs") {
    val corpus = s"$tmp/corpus_flat"
    val idx = s"$tmp/idx_flat"
    seed(corpus)
    val s1 = IncrementalIvf.refresh(spark, corpus, idx)
    assert(s1.rebuilt && s1.toVersion == 1L && s1.vecsAssigned == 450L)
    val fullBytes = new java.io.File(corpus).listFiles()
      .filter(_.getName.endsWith(".fls")).map(_.length()).sum
    append(corpus)
    val (s2, m2) = measured(IncrementalIvf.refresh(spark, corpus, idx))
    assert(!s2.rebuilt && s2.fromVersion == 1L && s2.toVersion == 2L &&
      s2.vecsAssigned == 30L)
    assert(m2.bytesRead < (fullBytes * 0.6).toLong,
      s"refresh read ${m2.bytesRead} B of a $fullBytes B corpus — not incremental")
    // the patch is bit-identical to rebuilding at the same geometry
    val idx2 = s"$tmp/idx_flat_scratch"
    IncrementalIvf.rebuild(spark, corpus, idx2)
    assert(triples(idx) == triples(idx2))
    // ...and serves the same ANN answer
    assert(IncrementalIvf.ann(spark, corpus, idx).collect().toSeq ==
      IncrementalIvf.ann(spark, corpus, idx2).collect().toSeq)
    // already current: zero jobs
    val (s3, m3) = measured(IncrementalIvf.refresh(spark, corpus, idx))
    assert(s3.vecsAssigned == 0L && !s3.rebuilt)
    assert(m3.jobs == 0, s"no-op refresh launched ${m3.jobs} job(s)")
  }

  test("two-level index patches the same way: routed map-side against " +
      "the persisted L1/L2 centroids, bit-identical to scratch") {
    val corpus = s"$tmp/corpus_2l"
    val idx = s"$tmp/idx_2l"
    seed(corpus)
    val s1 = IncrementalIvf.refresh(spark, corpus, idx, maxCentroids = 4)
    assert(s1.rebuilt)
    val meta = scala.io.Source.fromFile(s"$idx/_ivf_inc_done").mkString
    assert(meta.contains("mode=2l"), meta)
    append(corpus)
    val s2 = IncrementalIvf.refresh(spark, corpus, idx, maxCentroids = 4)
    assert(!s2.rebuilt && s2.vecsAssigned == 30L)
    val idx2 = s"$tmp/idx_2l_scratch"
    IncrementalIvf.rebuild(spark, corpus, idx2, maxCentroids = 4)
    assert(triples(idx) == triples(idx2))
    assert(IncrementalIvf.ann(spark, corpus, idx).collect().toSeq ==
      IncrementalIvf.ann(spark, corpus, idx2).collect().toSeq)
  }

  test("outgrowing the drift threshold reclusters (full rebuild at the " +
      "new geometry)") {
    val corpus = s"$tmp/corpus_drift"
    val idx = s"$tmp/idx_drift"
    seed(corpus)
    IncrementalIvf.refresh(spark, corpus, idx)
    append(corpus)
    sys.props("graft.ivf.drift") = "1.05" // 480/450 = 1.067 > threshold
    try {
      val st = IncrementalIvf.refresh(spark, corpus, idx)
      assert(st.rebuilt, "a drifted corpus must recluster")
      assert(st.vecsAssigned == 480L)
    } finally sys.props.remove("graft.ivf.drift")
  }

  test("a non-append-only corpus range refuses loudly; rebuild recovers") {
    val corpus = s"$tmp/corpus_ow"
    val idx = s"$tmp/idx_ow"
    seed(corpus)
    IncrementalIvf.refresh(spark, corpus, idx)
    // an overwrite rewrites history: stale assignments would keep
    // serving vectors that no longer exist
    emb().filter(col("vec_id") < 100).repartition(2)
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").save(corpus)
    val e = intercept[Exception](IncrementalIvf.refresh(spark, corpus, idx))
    assert(e.getMessage.contains("not append-only"), e.getMessage)
    val st = IncrementalIvf.rebuild(spark, corpus, idx)
    assert(st.rebuilt && st.vecsAssigned == 100L)
    assert(spark.read.format("fls").load(idx)
      .select("vec_id").distinct().count() == 100L)
  }
}
