package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.fls.connector.FlsRowFilter

/** Adaptive conjunct ordering (the analog of the reference's
  * AdaptiveFilter, /root/reference/src/reader/filter_executor.cpp:38-55):
  * the permutation must follow the rank (selectivity − 1) / costPerRow
  * ascending, keep pushed order on ties, and — end to end — a
  * multi-conjunct scan over enough row groups to trigger reordering
  * must return exactly what Catalyst computes, under every conjunct
  * order the adapter may choose. */
class FlsAdaptiveOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-adaptive").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-adaptive-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("reorder sorts by drop-per-nanosecond, most effective first") {
    val o = new FlsRowFilter.AdaptiveOrder(3)
    // pred 0: keeps 90%, cheap       → rank (0.9-1)/1   = -0.1
    // pred 1: keeps 1%, same cost    → rank (0.01-1)/1  ≈ -0.99  (best)
    // pred 2: keeps 1%, 100× cost    → rank (0.01-1)/100 ≈ -0.0099
    o.record(0, 1000, 1000, 900)
    o.record(1, 1000, 1000, 10)
    o.record(2, 100000, 1000, 10)
    o.reorder()
    assert(o.perm.toSeq == Seq(1, 0, 2),
      s"selective-and-cheap must run first, got ${o.perm.toSeq}")
  }

  test("unmeasured and pass-through conjuncts keep pushed order (stable ties)") {
    val o = new FlsRowFilter.AdaptiveOrder(4)
    // pred 1 measured useful; 0 and 3 unmeasured (rank 0); pred 2
    // measured but filters nothing (rank 0 too)
    o.record(1, 1000, 1000, 100)
    o.record(2, 1000, 1000, 1000)
    o.reorder()
    assert(o.perm.toSeq == Seq(1, 0, 2, 3), s"got ${o.perm.toSeq}")
  }

  test("rank ties re-sort to pushed order even after an earlier flip") {
    val o = new FlsRowFilter.AdaptiveOrder(2)
    o.record(1, 1000, 1000, 0)
    o.reorder()
    assert(o.perm.toSeq == Seq(1, 0))
    o.record(0, 1000, 1000, 0) // stats now identical → rank tie
    o.reorder()
    assert(o.perm.toSeq == Seq(0, 1),
      "ties must return to pushed order, not freeze the earlier flip")
  }

  test("groupDone reorders only at the cadence boundary") {
    val o = new FlsRowFilter.AdaptiveOrder(2, everyGroups = 4)
    o.record(1, 1000, 1000, 0)
    (1 to 3).foreach(_ => o.groupDone())
    assert(o.perm.toSeq == Seq(0, 1), "must not reorder before the cadence")
    o.groupDone()
    assert(o.perm.toSeq == Seq(1, 0), "must reorder at the cadence boundary")
  }

  test("multi-conjunct scan over 32 row groups stays exact after reordering") {
    val n = 32 * 1024
    // conjunct order as pushed: a barely-selective cheap long filter
    // first, a highly-selective one second — the adapter should flip
    // them after 8 groups; either order must yield identical rows
    val df = spark.range(0, n, 1, 1).selectExpr(
      "id",
      "id % 100 AS a",       // a < 99  keeps 99%
      "id % 1000 AS b",      // b = 7   keeps 0.1%
      "CAST(id AS DOUBLE) / 8 AS d")
    val dir = s"$tmp/scan"
    df.write.format("fls").mode("overwrite").option("row_group_size", 1024).save(dir)
    for (keep <- Seq("0.0", "0.9")) {
      val back = spark.read.format("fls").option("filter_keep_ratio", keep).load(dir)
        .filter("a < 99 AND b = 7 AND d < 3000.0")
      val exp = df.filter("a < 99 AND b = 7 AND d < 3000.0")
        .collect().map(_.getLong(0)).sorted
      val got = back.collect().map(_.getLong(0)).sorted
      assert(got.toSeq == exp.toSeq, s"keep=$keep diverged")
      assert(exp.nonEmpty)
    }
  }
}
