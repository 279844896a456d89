package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RangeJoin

/** Bucketed range join vs the naive cross-filter semantics it must
  * reproduce, plus the plan property that justifies its existence (an
  * equi-join on the bucket id, never a nested-loop/cartesian). */
class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Seeded random points/intervals, negative axis included (floor
    * division regression: `DIV` truncates toward zero). */
  private def data(seed: Long, n: Int): (DataFrame, DataFrame) = {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(seed)
    val pts = (0 until n).map(i => (i.toLong, rnd.between(-500L, 500L)))
      .toDF("pid", "p")
    val ivs = (0 until n).map { i =>
      val lo = rnd.between(-500L, 500L)
      // mix spans: point-sized, bucket-sized, multi-bucket, degenerate
      val span = rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => rnd.between(1L, 50L)
        case 2 => rnd.between(50L, 400L)
        case _ => -1L // lo > hi: matches nothing
      }
      (i.toLong + 10000L, lo, lo + span)
    }.toDF("iid", "lo", "hi")
    (pts, ivs)
  }

  private def naive(pts: DataFrame, ivs: DataFrame): Set[(Long, Long)] =
    pts.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pointInInterval matches cross-filter semantics, no dups, negatives included") {
    for (seed <- Seq(1L, 2L, 3L); w <- Seq(7L, 64L, 1000L)) {
      val (pts, ivs) = data(seed, 300)
      val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"duplicate pairs at seed=$seed w=$w")
      assert(got.toSet == naive(pts, ivs), s"mismatch at seed=$seed w=$w")
    }
  }

  test("bounds are inclusive on both ends, exact at bucket edges") {
    val sp = spark
    import sp.implicits._
    val pts = Seq((1L, -64L), (2L, -1L), (3L, 0L), (4L, 63L), (5L, 64L))
      .toDF("pid", "p")
    val ivs = Seq((10L, -64L, 0L), (11L, 0L, 63L), (12L, 64L, 64L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L), (4L, 11L), (5L, 12L)))
  }

  test("null points and null bounds never match and never throw") {
    val sp = spark
    import sp.implicits._
    val pts = Seq((1L, Some(5L)), (2L, None)).toDF("pid", "p")
    val ivs = Seq((10L, Some(0L), Some(9L)), (11L, None, Some(9L)),
      (12L, Some(0L), None)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 4L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("equi-keys AND with the range predicate") {
    val sp = spark
    import sp.implicits._
    val pts = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("pid", "lk", "p")
    val ivs = Seq((10L, "a", 0L, 9L), (11L, "b", 6L, 9L)).toDF("iid", "rk", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 4L,
        keys = Seq("lk" -> "rk"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("bandJoin matches |l - r| <= tol and drops helper columns") {
    val sp = spark
    import sp.implicits._
    val l = Seq((1L, 100L), (2L, 107L), (3L, 93L), (4L, 200L)).toDF("lid", "lv")
    val r = Seq((10L, 100L), (11L, 210L)).toDF("rid", "rv")
    val out = RangeJoin.bandJoin(l, "lv", r, "rv", tol = 7L, bucketWidth = 8L)
    assert(out.columns.toSet == Set("lid", "lv", "rid", "rv"))
    val got = out.select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L)))
  }

  test("plan is an equi-join on the bucket id — no BNLJ, no cartesian") {
    val (pts, ivs) = data(4L, 100)
    val p = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 64L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  /** Seeded random interval pairs for the overlap join — spans from
    * point-sized to multi-bucket, plus degenerate (lo > hi) rows,
    * which CAN still satisfy the raw predicate pair. */
  private def ivData(seed: Long, n: Int): (DataFrame, DataFrame) = {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(seed)
    def ivs(base: Long, loC: String, hiC: String, idC: String): DataFrame =
      (0 until n).map { i =>
        val lo = rnd.between(-500L, 500L)
        val span = rnd.nextInt(4) match {
          case 0 => 0L
          case 1 => rnd.between(1L, 50L)
          case 2 => rnd.between(50L, 300L)
          case _ => -rnd.between(1L, 200L) // degenerate: lo > hi
        }
        (base + i, lo, lo + span)
      }.toDF(idC, loC, hiC)
    (ivs(0L, "llo", "lhi", "lid"), ivs(10000L, "rlo", "rhi", "rid"))
  }

  private def naiveOverlap(l: DataFrame, r: DataFrame): Set[(Long, Long)] =
    l.crossJoin(r)
      .filter(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet

  test("intervalOverlap matches cross-filter semantics incl. degenerate rows, no dups") {
    for (seed <- Seq(11L, 12L); w <- Seq(9L, 64L, 1000L)) {
      val (l, r) = ivData(seed, 250)
      val got = RangeJoin.intervalOverlap(l, "llo", "lhi", r, "rlo", "rhi", w)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(got.length == got.toSet.size, s"duplicate pairs at seed=$seed w=$w")
      assert(got.toSet == naiveOverlap(l, r), s"mismatch at seed=$seed w=$w")
    }
  }

  test("intervalOverlap: touching endpoints overlap; disjoint by one do not; nulls never match") {
    val sp = spark
    import sp.implicits._
    val l = Seq((1L, Some(0L), Some(10L)), (2L, Some(20L), Some(30L)),
      (3L, None, Some(5L))).toDF("lid", "llo", "lhi")
    val r = Seq((10L, Some(10L), Some(19L)), (11L, Some(31L), Some(40L)),
      (12L, Some(0L), None)).toDF("rid", "rlo", "rhi")
    val got = RangeJoin.intervalOverlap(l, "llo", "lhi", r, "rlo", "rhi", 16L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("intervalOverlap honors extra equi-keys and plans an equi-join") {
    val sp = spark
    import sp.implicits._
    val l = Seq((1L, "a", 0L, 10L), (2L, "b", 0L, 10L)).toDF("lid", "lk", "llo", "lhi")
    val r = Seq((10L, "a", 5L, 15L), (11L, "b", 50L, 60L)).toDF("rid", "rk", "rlo", "rhi")
    val out = RangeJoin.intervalOverlap(l, "llo", "lhi", r, "rlo", "rhi", 8L,
      keys = Seq("lk" -> "rk"))
    val got = out.select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
    val (bl, br) = ivData(13L, 120)
    val p = RangeJoin.intervalOverlap(bl, "llo", "lhi", br, "rlo", "rhi", 64L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("rejects overlapping column names, bad widths") {
    val sp = spark
    import sp.implicits._
    val a = Seq((1L, 2L)).toDF("x", "p")
    val b = Seq((1L, 2L, 3L)).toDF("x", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(a, "p", b, "lo", "hi", 4L)
    }
    val b2 = Seq((1L, 2L, 3L)).toDF("y", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(a, "p", b2, "lo", "hi", 0L)
    }
  }
}
