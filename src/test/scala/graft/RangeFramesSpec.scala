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

  private def checkMinMax(df: DataFrame, lo: Long, hi: Long): Unit = {
    val got = RangeFrames.minMaxOverRange(df, "k", "v", lo, hi, "mn", "mx")
      .select("id", "mn", "mx").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet
    val (loB, hiB) =
      (if (lo >= 0) s"$lo PRECEDING" else s"${-lo} FOLLOWING",
        if (hi >= 0) s"$hi FOLLOWING" else s"${-hi} PRECEDING")
    df.createOrReplaceTempView("rf_in")
    val want = spark.sql(
      s"""SELECT id, min(v) OVER w AS mn, max(v) OVER w AS mx FROM rf_in
          WINDOW w AS (ORDER BY k RANGE BETWEEN $loB AND $hiB)""")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet
    assert(got == want, s"min/max mismatch at frame [$lo, $hi]")
  }

  test("min/max bands match the built-in RANGE window across frame shapes") {
    for (seed <- Seq(4L, 5L)) {
      val df = data(seed, 400)
      checkMinMax(df, 50L, 30L)    // ordinary band
      checkMinMax(df, 700L, 700L)  // covers everything
      checkMinMax(df, 10L, -2L)    // shifted below
      checkMinMax(df, -2L, 10L)    // shifted above
      checkMinMax(df, 0L, 0L)      // peers only
      checkMinMax(df, 2000L, -1500L) // every frame empty: NULL/NULL
      checkMinMax(df, 1L, 0L)      // W=2: minimal two-block windows
    }
  }

  test("min/max: sparse keys, all-null-value bands, block-aligned edges") {
    val sp = spark
    import sp.implicits._
    // keys far apart (empty bands in between), nulls, exact multiples
    // of the block width W = 11 (lo=7, hi=3) sitting on block edges
    val df = Seq((1L, 0L, Some(5L)), (2L, 11L, None), (3L, 22L, Some(-9L)),
      (4L, 1000L, Some(1L)), (5L, -44L, Some(3L)), (6L, 14L, Some(2L)))
      .toDF("id", "k", "v")
    checkMinMax(df, 7L, 3L)
    checkMinMax(df, 0L, 11L)
    checkMinMax(df, 11L, 0L)
  }

  test("min/max works on string values (any orderable type)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(6L)
    val df = (0 until 200).map { i =>
      val k = rnd.between(-50L, 50L)
      val v = if (rnd.nextInt(4) == 0) None else Some("s" + rnd.nextInt(100))
      (i.toLong, k, v)
    }.toDF("id", "k", "v")
    val got = RangeFrames.minMaxOverRange(df, "k", "v", 5L, 5L, "mn", "mx")
      .select("id", "mn", "mx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    df.createOrReplaceTempView("rf_in")
    val want = spark.sql(
      """SELECT id, min(v) OVER w AS mn, max(v) OVER w AS mx FROM rf_in
         WINDOW w AS (ORDER BY k RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == want)
  }

  test("min/max plan: only hash-partitioned windows, no partition-less Window") {
    val df = data(7L, 200)
    val plan = RangeFrames.minMaxOverRange(df, "k", "v", 50L, 30L, "mn", "mx")
      .queryExecution.executedPlan.toString
    // every Window node in the composition is PARTITION BY block —
    // distributed natively by Spark; none is global (single-partition)
    assert(!plan.contains("SinglePartition"),
      s"a single-partition exchange survived:\n$plan")
  }

  test("the composition's internal windows distribute — no stock Window node") {
    val df = data(3L, 200)
    val p = RangeFrames.sumCountOverRange(df, "k", "v", 50L, 30L, "cnt", "s")
      .queryExecution.executedPlan.toString
    assert(p.contains("GlobalRunningSum"), s"prefix sums not distributed:\n$p")
    assert(p.contains("GlobalFirstValue"), s"as-of scans not distributed:\n$p")
    assert(!p.contains("Window "), s"a stock single-partition Window survived:\n$p")
  }

  test("bandAggregateAgainst (r19): probe-vs-carrier bands match the " +
      "brute-force pair join, including closed bounds, duplicate keys, " +
      "nulls, and empty bands") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(41L)
    val probes = (0 until 120).map { i =>
      (i.toLong, rnd.between(-200L, 200L))
    }.toDF("pid", "p")
    val carriers = (0 until 300).map { i =>
      val v = if (rnd.nextInt(6) == 0) None else Some(rnd.between(-50L, 50L))
      (rnd.between(-220L, 220L), v)
    }.toDF("c", "v")
    for ((lo, hi) <- Seq((30L, 20L), (0L, 0L), (25L, -10L))) {
      val got = RangeFrames.bandAggregateAgainst(
          probes, "p", carriers, "c", "v", lo, hi, "cnt", "s")
        .select("pid", "cnt", "s").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSet
      val want = probes.join(carriers,
          col("c") >= col("p") - lo && col("c") <= col("p") + hi, "left")
        .groupBy("pid")
        .agg(count(col("c")).as("cnt"), sum(col("v")).as("s"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSet
      assert(got == want, s"band [$lo,$hi] mismatch")
    }
  }

  test("bandAggregateAgainst plan: no pair-producing join — prefix sums " +
      "distribute and the only join is the 1:1 band join back") {
    val sp = spark
    import sp.implicits._
    val probes = (0L until 100L).map(i => (i, i * 3)).toDF("pid", "p")
    val carriers = (0L until 300L).map(i => (i % 250, i)).toDF("c", "v")
    val out = RangeFrames.bandAggregateAgainst(
      probes, "p", carriers, "c", "v", 10L, 10L, "cnt", "s")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("GlobalRunningSum"), s"prefix sums not distributed:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"a pair-materializing join appeared:\n$p")
  }
}
