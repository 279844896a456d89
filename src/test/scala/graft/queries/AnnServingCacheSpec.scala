package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The ANN serving caches (routing centroids + codebook broadcasts,
  * per index path) must stay BOUNDED when a long-lived session serves
  * many distinct index paths (r19 — VERDICT #6: the last unbounded
  * driver-memory path). An LRU capped at
  * `graft.ann.servingCachePaths` evicts the least-recently-served
  * path — releasing its broadcast — and a re-served path just pays one
  * rebuild collect, with identical results. */
class AnnServingCacheSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"
  private lazy val tmp = Files.createTempDirectory("ann-lru-spec").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("ann-serving-cache-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    Similarity.unpersistAll()
    if (spark != null) spark.stop()
  }

  test("PathLru evicts least-recently-used past the cap, releases the " +
      "evicted value, and rebuilds it on re-access") {
    sys.props("graft.ann.servingCachePaths") = "2"
    try {
      var evicted = List.empty[String]
      val lru = new Similarity.PathLru[String](v => evicted ::= v)
      var builds = 0
      def get(k: String) = lru.getOrBuild(k) { builds += 1; s"v-$k" }
      assert(get("a") == "v-a" && get("b") == "v-b" && builds == 2)
      assert(get("a") == "v-a" && builds == 2, "hit must not rebuild")
      // touch order is now b, a → inserting c evicts b (the LRU)
      assert(get("c") == "v-c" && builds == 3)
      assert(evicted == List("v-b") && lru.size == 2)
      assert(get("a") == "v-a" && builds == 3, "a must have survived")
      assert(get("b") == "v-b" && builds == 4, "b rebuilds after eviction")
      assert(evicted.contains("v-c"), "inserting b back evicts c")
      lru.remove("a")
      assert(evicted.contains("v-a") && lru.size == 1)
      lru.clear()
      assert(lru.size == 0 && evicted.size == 4,
        "clear must release every resident value")
    } finally sys.props.remove("graft.ann.servingCachePaths")
  }

  test("serving stays correct under cap-1 index churn: the evicted " +
      "path re-serves identically after one rebuild") {
    sys.props("graft.ann.servingCachePaths") = "1"
    try {
      def rows(dir: String) =
        Similarity.q127OutOfCorpusAnn(spark, dir).collect()
          .map(_.toString).toSeq
      val first = rows(sf)
      assert(Similarity.servingCacheSizes == ((1, 1)))
      // a SECOND corpus directory (same bytes, distinct path) gets its
      // own index — serving it must evict the first path's artifacts
      Files.createLink(
        java.nio.file.Paths.get(s"$tmp/embeddings.parquet"),
        java.nio.file.Paths.get(s"$sf/embeddings.parquet"))
      val second = rows(tmp)
      assert(second == first,
        "identical corpus bytes must serve identical neighbors")
      assert(Similarity.servingCacheSizes == ((1, 1)),
        "the cap must hold under churn — no accretion across paths")
      // the evicted first path re-serves correctly (one rebuild collect)
      assert(rows(sf) == first)
      assert(Similarity.servingCacheSizes == ((1, 1)))
    } finally sys.props.remove("graft.ann.servingCachePaths")
  }
}
