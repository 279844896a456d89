package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The auto range-join rewrite: fires on inequality-only inner joins
  * (bucketed equi-join, exact results), stays out of the way of
  * everything else. Oracle inside each case is the same join computed
  * with the rule disabled (stock nested-loop semantics). */
class RangeJoinRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def withRule[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.rangeJoin.enabled", on.toString)
    try f finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
  }

  private def data(seed: Long, n: Int): (DataFrame, DataFrame) = {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(seed)
    val pts = (0 until n).map(i => (i.toLong, rnd.between(-500L, 500L)))
      .toDF("pid", "p")
    val ivs = (0 until n / 2).map { i =>
      val lo = rnd.between(-500L, 500L)
      (i + 10000L, lo, lo + rnd.between(-5L, 120L)) // some invalid (lo > hi)
    }.toDF("iid", "lo", "hi")
    (pts, ivs)
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("fires on a range-only join: equi-join plan, exact pairs, no dups") {
    val (pts, ivs) = data(1L, 400)
    val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("__graft_rj"), s"rule did not fire:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "bucketing duplicated pairs")
    val want = withRule(on = false)(pairs(
      pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))))
    assert(got.toSet == want)
  }

  test("strict bounds and swapped operand order fire and stay exact") {
    val (pts, ivs) = data(2L, 300)
    val joined = pts.join(ivs, col("lo") < col("p") && col("hi") > col("p"))
    assert(joined.queryExecution.executedPlan.toString.contains("__graft_rj"))
    val want = withRule(on = false)(pairs(
      pts.join(ivs, col("lo") < col("p") && col("hi") > col("p"))))
    assert(pairs(joined) == want)
  }

  test("does not fire when an equi-conjunct exists (hash join already possible)") {
    val sp = spark
    import sp.implicits._
    val l = Seq((1L, 5L, "k")).toDF("pid", "p", "lk")
    val r = Seq((9L, 0L, 9L, "k")).toDF("iid", "lo", "hi", "rk")
    val joined = l.join(r, col("lk") === col("rk") &&
      col("p") >= col("lo") && col("p") <= col("hi"))
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("__graft_rj"), s"rule fired over an equi-join:\n$p")
    assert(joined.count() == 1)
  }

  test("does not fire on non-integral axes") {
    val sp = spark
    import sp.implicits._
    val l = Seq((1L, 5.0)).toDF("pid", "p")
    val r = Seq((9L, 0.0, 9.0)).toDF("iid", "lo", "hi")
    val dbl = l.join(r, col("p") >= col("lo") && col("p") <= col("hi"))
    assert(!dbl.queryExecution.executedPlan.toString.contains("__graft_rj"))
  }

  test("outer/semi/anti fire ONLY with the preserved side as the point side") {
    val (pts, ivs) = data(3L, 200)
    val cond = col("p") >= col("lo") && col("p") <= col("hi")
    // point side preserved: fires, and unmatched rows null-extend exactly
    for (jt <- Seq("left", "left_semi", "left_anti")) {
      val joined = pts.join(ivs, cond, jt)
      assert(joined.queryExecution.executedPlan.toString.contains("__graft_rj"),
        s"$jt with point on the preserved side should fire")
      val got = joined.collect().map(_.toString).toSet
      val want = withRule(on = false)(
        pts.join(ivs, cond, jt).collect().map(_.toString).toSet)
      assert(got == want, s"$jt mismatch")
    }
    val ro = ivs.join(pts, cond, "right") // point side (right) preserved
    assert(ro.queryExecution.executedPlan.toString.contains("__graft_rj"))
    assert(ro.collect().map(_.toString).toSet ==
      withRule(on = false)(ivs.join(pts, cond, "right").collect().map(_.toString).toSet))
    // interval side preserved: replication would duplicate unmatched
    // intervals — must NOT fire
    for ((df, jt) <- Seq((ivs.join(pts, cond, "left"), "left-intervals"),
      (pts.join(ivs, cond, "right"), "right-intervals"),
      (pts.join(ivs, cond, "full"), "full"))) {
      assert(!df.queryExecution.executedPlan.toString.contains("__graft_rj"),
        s"$jt must not fire")
    }
  }

  test("kill-switch conf restores stock planning") {
    val (pts, ivs) = data(4L, 50)
    withRule(on = false) {
      val p = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
        .queryExecution.executedPlan.toString
      assert(!p.contains("__graft_rj"))
    }
  }

  test("pinned bucket width is honored and stays exact") {
    val (pts, ivs) = data(5L, 200)
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "7")
    try {
      val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("__graft_rj") && !p.contains("__graft_rj_maxlen"),
        s"width subquery planned despite the pinned width:\n$p")
      val want = withRule(on = false)(pairs(
        pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))))
      assert(pairs(joined) == want)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("timestamp and date axes (LTZ, NTZ, DATE) fire and stay exact") {
    val (ptsL, ivsL) = data(6L, 300)
    for (cast <- Seq("timestamp_micros(%s)", "CAST(timestamp_micros(%s) AS TIMESTAMP_NTZ)",
      "date_add(DATE'1970-01-01', CAST(%s AS INT))")) {
      val pts = ptsL.selectExpr("pid", s"${cast.format("p")} AS p")
      val ivs = ivsL.selectExpr("iid", s"${cast.format("lo")} AS lo",
        s"${cast.format("hi")} AS hi")
      val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("__graft_rj"), s"rule did not fire on $cast:\n$p")
      val want = withRule(on = false)(pairs(
        pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))))
      assert(pairs(joined) == want, s"mismatch on $cast")
    }
  }

  /** Interval pairs for the overlap shape, degenerate (s > e) rows
    * included — those can still satisfy the raw predicate pair and the
    * rewrite must keep them exact. */
  private def ivPairs(seed: Long, n: Int): (DataFrame, DataFrame) = {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(seed)
    def mk(base: Long, sC: String, eC: String, idC: String) =
      (0 until n).map { i =>
        val s = rnd.between(-500L, 500L)
        (base + i, s, s + rnd.between(-80L, 120L))
      }.toDF(idC, sC, eC)
    (mk(0L, "ls", "le", "lid"), mk(10000L, "rs", "re", "rid"))
  }

  private def ovPairs(df: DataFrame): Set[(Long, Long)] =
    df.select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("overlap shape fires: equi-join plan, exact pairs incl. degenerate, no dups") {
    val (l, r) = ivPairs(21L, 300)
    val cond = col("ls") <= col("re") && col("rs") <= col("le")
    val joined = l.join(r, cond)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("__graft_rj_lb"), s"overlap rewrite did not fire:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val got = joined.select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length == got.toSet.size, "overlap bucketing duplicated pairs")
    val want = withRule(on = false)(ovPairs(l.join(r, cond)))
    assert(got.toSet == want)
  }

  test("overlap via strict bounds and swapped operands fires and stays exact") {
    val (l, r) = ivPairs(22L, 250)
    val cond = col("re") > col("ls") && col("le") >= col("rs")
    val joined = l.join(r, cond)
    assert(joined.queryExecution.executedPlan.toString.contains("__graft_rj_lb"))
    assert(ovPairs(joined) == withRule(on = false)(ovPairs(l.join(r, cond))))
  }

  test("overlap never fires for outer/semi/anti joins (both sides replicate)") {
    val (l, r) = ivPairs(23L, 100)
    val cond = col("ls") <= col("re") && col("rs") <= col("le")
    for (jt <- Seq("left", "right", "full", "left_semi", "left_anti")) {
      val p = l.join(r, cond, jt).queryExecution.executedPlan.toString
      assert(!p.contains("__graft_rj_lb"), s"overlap fired for $jt:\n$p")
    }
  }

  test("overlap on timestamp axes with nulls stays exact") {
    val sp = spark
    import sp.implicits._
    val (lL, rL) = ivPairs(24L, 200)
    val l = lL.selectExpr("lid", "timestamp_micros(ls) AS ls", "timestamp_micros(le) AS le")
      .unionByName(Seq((9999L, None: Option[Long], Some(0L))).toDF("lid", "x", "y")
        .selectExpr("lid", "timestamp_micros(x) AS ls", "timestamp_micros(y) AS le"))
    val r = rL.selectExpr("rid", "timestamp_micros(rs) AS rs", "timestamp_micros(re) AS re")
    val cond = col("ls") <= col("re") && col("rs") <= col("le")
    val joined = l.join(r, cond)
    assert(joined.queryExecution.executedPlan.toString.contains("__graft_rj_lb"))
    assert(ovPairs(joined) == withRule(on = false)(ovPairs(l.join(r, cond))))
  }

  test("stream-stream interval join: impossible stock, runs bucketed with pinned width") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

    def mkJoin() = {
      val pts = MemoryStream[(Long, Long)]
      val ivs = MemoryStream[(Long, Long)]
      val l = pts.toDF().select(col("_1").as("pid"),
        timestamp_micros(col("_2")).as("p_ts")).withWatermark("p_ts", "1 hour")
      val r = ivs.toDF().select(col("_1").as("iid"),
        timestamp_micros(col("_2")).as("s_ts")).withWatermark("s_ts", "1 hour")
      val joined = l.join(r, col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 100 SECONDS"))
      (pts, ivs, joined)
    }
    // offset from the epoch: a row whose event time sits exactly ON
    // the initial watermark (0) is dropped as late — an artifact of
    // the test data, not the rewrite (real event times are never 1970)
    val base = 86_400_000_000L
    val ptData = (0 until 60).map(i => (i.toLong, base + i.toLong * 37_000_000L))
    val ivData = (0 until 40).map(i => (1000L + i, base + i.toLong * 53_000_000L))

    // stock: no equality predicate — the streaming planner refuses
    val err = intercept[Exception] {
      withRule(on = false) {
        val (pts, ivs, joined) = mkJoin()
        val q = joined.writeStream.format("memory").queryName("rjs_stock")
          .outputMode("append").start()
        pts.addData(ptData: _*); ivs.addData(ivData: _*)
        try q.processAllAvailable() finally q.stop()
      }
    }
    assert(err.toString.contains("equality") || err.toString.contains("not supported"),
      s"expected the stock equality-predicate refusal, got: $err")

    // bucketed: pinned width manufactures the state key; exact result
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "100000001")
    try {
      val (pts, ivs, joined) = mkJoin()
      val q = joined.writeStream.format("memory").queryName("rjs_bkt")
        .outputMode("append").start()
      pts.addData(ptData: _*); ivs.addData(ivData: _*)
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("rjs_bkt").select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, "streaming bucketing duplicated pairs")
      val want = ptData.flatMap { case (pid, p) =>
        ivData.collect { case (iid, s)
          if p >= s && p <= s + 100_000_000L => (pid, iid) }
      }.toSet
      assert(got.toSet == want)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("null points/bounds, one outlier interval, empty interval side") {
    val sp = spark
    import sp.implicits._
    val pts = Seq((1L, Some(5L)), (2L, None), (3L, Some(450L)))
      .toDF("pid", "p")
    val ivs = Seq((10L, Some(0L), Some(9L)), (11L, None, Some(9L)),
      (12L, Some(-1000L), Some(1000L))) // outlier widens every bucket
      .toDF("iid", "lo", "hi")
    val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
    assert(joined.queryExecution.executedPlan.toString.contains("__graft_rj"))
    assert(pairs(joined) == Set((1L, 10L), (1L, 12L), (3L, 12L)))
    val empty = ivs.filter(col("iid") < 0L)
    val none = pts.join(empty, col("p") >= col("lo") && col("p") <= col("hi"))
    assert(none.count() == 0) // width subquery over 0 rows must not crash
  }
}
