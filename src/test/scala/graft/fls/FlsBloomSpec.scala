package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Per-file Bloom sidecars ([[Bloom]], `bloom_columns`): point lookups
  * on high-cardinality UNCLUSTERED keys skip whole files — footer
  * unopened — where zone maps cannot decide. Locks the filter's FPP
  * math, the sidecar round-trip, the footer-read savings, exactness
  * (never a false skip), vacuum vouching, and the loud refusals. */
class FlsBloomSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-bloom-spec").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-bloom-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("filter math: no false negatives; FPP near the target") {
    val b = new Bloom.Builder(0.01)
    (0 until 50000).foreach(i => b.add(Hll.hashLong(i.toLong)))
    val f = b.seal()
    // every written value answers "might" — a false negative would be
    // a WRONG QUERY RESULT, not a missed optimization
    (0 until 50000).foreach(i =>
      assert(f.mightContain(Hll.hashLong(i.toLong)), s"false negative at $i"))
    // absent values answer "absent" at ~the configured FPP
    val fp = (50000 until 150000).count(i => f.mightContain(Hll.hashLong(i.toLong)))
    assert(fp < 100000 * 0.03, s"fpp too high: $fp / 100000")
  }

  test("point lookups skip files without opening their footers; results stay exact") {
    val sp = spark
    import sp.implicits._
    val dir = s"$tmp/lookup"
    // high-cardinality UNCLUSTERED id: every file's [min, max] spans
    // the whole domain, so zone maps can never decide a point lookup
    val n = 200000
    (0 until n).map(i => ((i.toLong * 2654435761L) % 1000000007L, i.toLong))
      .toDF("id", "v")
      .repartition(8) // 8 files, each full-range
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest")
      .option("bloom_columns", "id")
      .save(dir)
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val entries = FlsManifest.read(fs, root).get
    assert(entries.forall(e => FlsFileStats.bfOf(e.stats).isDefined),
      "every file carries its sidecar pointer")
    // a needle that exists: found, exactly once
    val needle = (12345L * 2654435761L) % 1000000007L
    val hit = spark.read.format("fls").load(dir)
      .where($"id" === needle).collect()
    assert(hit.length == 1 && hit(0).getLong(1) == 12345L)
    // a needle that does NOT exist: zero rows AND ~zero footers opened
    // (fresh reader, cold footer cache via unique needle per plan)
    sys.props("graft.fls.footerCache") = "false"
    try {
      val before = FlsFooters.footerReadCount
      val miss = spark.read.format("fls").load(dir)
        .where($"id" === 424242L).collect() // not a multiplied id shape
      val opened = FlsFooters.footerReadCount - before
      assert(miss.isEmpty)
      // all 8 files SHOULD bloom-prune (1% fpp ⇒ expect 0, allow 1)
      assert(opened <= 1, s"opened $opened footers of ${entries.length}")
      // and WITHOUT the needle every footer opens (control)
      val before2 = FlsFooters.footerReadCount
      assert(spark.read.format("fls").load(dir).count() == n)
      assert(FlsFooters.footerReadCount - before2 >= entries.length)
    } finally sys.props.remove("graft.fls.footerCache"): Unit
    // vacuum at a zero horizon vouches the sidecars (still pruning after)
    FlsMaintenance.vacuum(spark, dir, olderThanHours = 0)
    Bloom.clearCache()
    assert(spark.read.format("fls").load(dir)
      .where($"id" === needle).count() == 1)
    // IN-lists prune only when EVERY member is absent
    assert(spark.read.format("fls").load(dir)
      .where($"id".isin(needle, 424242L)).count() == 1)
  }

  test("refusals and conservatism: listing mode, nested types, range filters") {
    val sp = spark
    import sp.implicits._
    val e1 = intercept[Exception] {
      Seq((1L, 2L)).toDF("id", "v").write.format("fls").mode("overwrite")
        .option("bloom_columns", "id").save(s"$tmp/refuse_listing")
    }
    assert(e1.getMessage.contains("commit_mode=manifest"), e1.getMessage)
    // range filters never consult the bloom (conservative keep)
    val dir = s"$tmp/ranges"
    (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").option("bloom_columns", "id")
      .save(dir)
    assert(spark.read.format("fls").load(dir)
      .where($"id" >= 990L).count() == 10)
    // string keys hash canonically too
    val sdir = s"$tmp/strings"
    (0 until 1000).map(i => (s"doc-$i", i.toLong)).toDF("k", "v")
      .write.format("fls").mode("overwrite")
      .option("commit_mode", "manifest").option("bloom_columns", "k")
      .save(sdir)
    assert(spark.read.format("fls").load(sdir)
      .where($"k" === "doc-500").count() == 1)
    assert(spark.read.format("fls").load(sdir)
      .where($"k" === "doc-9999").count() == 0)
  }
}
