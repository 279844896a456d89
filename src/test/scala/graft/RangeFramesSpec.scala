package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RangeFrames

/** RANGE value-offset frames via prefix differences vs Spark's own
  * (stock, single-partition) RANGE window — the rule never rewrites
  * value frames, so the built-in window IS the independent oracle — plus
  * the plan property: the composition's internal windows distribute. */
class RangeFramesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Seeded keys WITH ties (peer-identity gate) and nullable values. */
  private def data(seed: Long, n: Int): DataFrame = {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val k = rnd.between(-300L, 300L) // dense => ties guaranteed
      val v = if (rnd.nextInt(5) == 0) None else Some(rnd.between(-1000L, 1000L))
      (i.toLong, k, v)
    }.toDF("id", "k", "v")
  }

  private def check(df: DataFrame, lo: Long, hi: Long): Unit = {
    val got = RangeFrames.sumCountOverRange(df, "k", "v", lo, hi, "cnt", "s")
      .select("id", "cnt", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet
    val (loB, hiB) =
      (if (lo >= 0) s"$lo PRECEDING" else s"${-lo} FOLLOWING",
        if (hi >= 0) s"$hi FOLLOWING" else s"${-hi} PRECEDING")
    df.createOrReplaceTempView("rf_in")
    val want = spark.sql(
      s"""SELECT id, count(*) OVER w AS cnt, sum(v) OVER w AS s FROM rf_in
          WINDOW w AS (ORDER BY k RANGE BETWEEN $loB AND $hiB)""")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet
    assert(got == want, s"mismatch at frame [$lo, $hi]")
  }

  test("bands match the built-in RANGE window: symmetric, shifted, empty, point") {
    for (seed <- Seq(1L, 2L)) {
      val df = data(seed, 400)
      check(df, 50L, 30L)   // ordinary band
      check(df, 700L, 700L) // covers everything
      check(df, 10L, -2L)   // shifted below: 10 PRECEDING AND 2 PRECEDING
      check(df, -2L, 10L)   // shifted above: 2 FOLLOWING AND 10 FOLLOWING
      check(df, 0L, 0L)     // peers only
      check(df, 2000L, -1500L) // frame far below every key: all empty
    }
  }

  test("all-null value bands yield sum NULL, count still positive") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, 0L, None), (2L, 1L, None), (3L, 100L, Some(7L)))
      .toDF("id", "k", "v")
    val got = RangeFrames.sumCountOverRange(df, "k", "v", 5L, 5L, "cnt", "s")
      .select("id", "cnt", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet
    assert(got == Set((1L, 2L, null), (2L, 2L, null), (3L, 1L, 7L)))
  }

  test("the composition's internal windows distribute — no stock Window node") {
    val df = data(3L, 200)
    val p = RangeFrames.sumCountOverRange(df, "k", "v", 50L, 30L, "cnt", "s")
      .queryExecution.executedPlan.toString
    assert(p.contains("GlobalRunningSum"), s"prefix sums not distributed:\n$p")
    assert(p.contains("GlobalFirstValue"), s"as-of scans not distributed:\n$p")
    assert(!p.contains("Window "), s"a stock single-partition Window survived:\n$p")
  }
}
