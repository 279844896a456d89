package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The RANGE value-offset frame rewrite: plain SQL lowers to the
  * prefix-difference composition (distributed by the sibling window
  * rule); oracle inside each case is the same SQL with the rule OFF —
  * stock Spark's own single-partition RANGE window. */
class RangeFrameRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7L)
    (0 until 500).map { i =>
      val k = if (rnd.nextInt(20) == 0) None else Some(rnd.between(-200L, 200L))
      val v = if (rnd.nextInt(5) == 0) None else Some(rnd.between(-1000L, 1000L))
      (i.toLong, k, v)
    }.toDF("id", "k", "v").createOrReplaceTempView("rfr_t")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def withRule[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.rangeFrames.enabled", on.toString)
    try f finally spark.conf.set("spark.graft.rangeFrames.enabled", "true")
  }

  private def rows(sql: String): Set[String] =
    spark.sql(sql).collect().map(_.toString).toSet

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.toString

  private def checkExact(sql: String): Unit = {
    val got = rows(sql)
    val want = withRule(on = false)(rows(sql))
    assert(got == want, s"mismatch for:\n$sql")
  }

  test("fires: distributed composition, zero stock Window nodes, exact values") {
    val sql = """SELECT id, k,
        count(*) OVER w AS c, count(v) OVER w AS cv,
        sum(v) OVER w AS s, avg(v) OVER w AS a
      FROM rfr_t WINDOW w AS (ORDER BY k RANGE BETWEEN 50 PRECEDING AND 30 FOLLOWING)"""
    val p = planOf(sql)
    assert(p.contains("__grf_"), s"rule did not fire:\n$p")
    assert(p.contains("GlobalRunningSum") && p.contains("GlobalFirstValue"),
      s"composition windows not distributed:\n$p")
    assert(!p.contains("Window "), s"a stock Window survived:\n$p")
    checkExact(sql)
  }

  test("every frame shape: current-row bound, unbounded sides, fully shifted") {
    for (frame <- Seq(
      "2 PRECEDING AND CURRENT ROW",
      "CURRENT ROW AND 40 FOLLOWING",
      "UNBOUNDED PRECEDING AND 25 FOLLOWING",
      "30 PRECEDING AND UNBOUNDED FOLLOWING",
      "100 PRECEDING AND 60 PRECEDING",
      "10 FOLLOWING AND 90 FOLLOWING")) {
      val sql = s"""SELECT id, count(*) OVER w AS c, sum(v) OVER w AS s
        FROM rfr_t WINDOW w AS (ORDER BY k RANGE BETWEEN $frame)"""
      assert(planOf(sql).contains("__grf_"), s"did not fire for: $frame")
      checkExact(sql)
    }
  }

  test("count over a non-numeric input coexists with sums (no sum channel for it)") {
    val sql = """SELECT id,
        count(CASE WHEN v > 0 THEN 'pos' END) OVER w AS cs,
        sum(v) OVER w AS s
      FROM rfr_t WINDOW w AS (ORDER BY k RANGE BETWEEN 20 PRECEDING AND 20 FOLLOWING)"""
    assert(planOf(sql).contains("__grf_"))
    checkExact(sql)
  }

  test("null order keys keep the null-peer-group frame semantics") {
    // ~5% null keys in rfr_t; their band must be the null group itself
    val sql = """SELECT id, k, count(*) OVER w AS c, sum(v) OVER w AS s
      FROM rfr_t WINDOW w AS (ORDER BY k RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)"""
    assert(planOf(sql).contains("__grf_"))
    checkExact(sql)
  }

  test("multiple frames in one node share the prefix scan and stay exact") {
    val sql = """SELECT id,
        sum(v) OVER (ORDER BY k RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) s,
        count(*) OVER (ORDER BY k RANGE BETWEEN 9 PRECEDING AND 1 FOLLOWING) c2,
        sum(v) OVER (ORDER BY k RANGE BETWEEN 40 PRECEDING AND 30 PRECEDING) s3,
        avg(v) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND 10 FOLLOWING) a4,
        sum(v) OVER (ORDER BY k) run
      FROM rfr_t"""
    val p = planOf(sql)
    assert(p.contains("__grf_"), s"did not fire:\n$p")
    assert(!p.contains("Window "), s"a stock Window survived:\n$p")
    checkExact(sql)
  }

  test("DESC frames fire via the mirrored band, nulls at the LAST end exact") {
    for (frame <- Seq(
      "8 PRECEDING AND 3 FOLLOWING",
      "UNBOUNDED PRECEDING AND 25 FOLLOWING",
      "30 PRECEDING AND UNBOUNDED FOLLOWING",
      "40 PRECEDING AND 10 PRECEDING")) {
      val sql = s"""SELECT id, count(*) OVER w AS c, sum(v) OVER w AS s
        FROM rfr_t WINDOW w AS (ORDER BY k DESC RANGE BETWEEN $frame)"""
      assert(planOf(sql).contains("__grf_"), s"did not fire for DESC $frame")
      checkExact(sql)
    }
    // non-default null placement flips the null group to the wrong
    // end for the mapping — must not fire
    val odd = planOf("""SELECT sum(v) OVER (ORDER BY k DESC NULLS FIRST
      RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) s FROM rfr_t""")
    assert(!odd.contains("__grf_"), odd)
  }

  test("min/max value frames fire via the aligned-block pipeline, mixed with sums") {
    val sql = """SELECT id, k,
        min(v) OVER w AS mn, max(v) OVER w AS mx,
        sum(v) OVER w AS s, count(*) OVER w AS c
      FROM rfr_t WINDOW w AS (ORDER BY k RANGE BETWEEN 40 PRECEDING AND 25 FOLLOWING)"""
    val p = planOf(sql)
    assert(p.contains("__grf_emn"), s"min/max extrema table not planned:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"a single-partition exchange survived:\n$p")
    checkExact(sql)
  }

  test("min/max frame shapes: shifted, peers-only, always-empty, two frames") {
    for (frame <- Seq(
      "5 PRECEDING AND CURRENT ROW",
      "CURRENT ROW AND CURRENT ROW",
      "120 PRECEDING AND 70 PRECEDING",
      "15 FOLLOWING AND 80 FOLLOWING",
      // the analyzer rejects lower > upper, so an ALWAYS-empty frame is
      // unexpressible from SQL (the rule's W<1 null path is defensive);
      // sparse far-shifted bands still produce many EMPTY frames
      "450 PRECEDING AND 390 PRECEDING")) {
      val sql = s"""SELECT id, min(v) OVER w AS mn, max(v) OVER w AS mx
        FROM rfr_t WINDOW w AS (ORDER BY k RANGE BETWEEN $frame)"""
      assert(planOf(sql).contains("__grf_"), s"did not fire for $frame")
      checkExact(sql)
    }
    // two DIFFERENT min/max frames in one node: one block pipeline each
    val two = """SELECT id, min(v) OVER a AS mna, max(v) OVER b AS mxb
      FROM rfr_t
      WINDOW a AS (ORDER BY k RANGE BETWEEN 30 PRECEDING AND 10 FOLLOWING),
             b AS (ORDER BY k RANGE BETWEEN 9 PRECEDING AND 45 FOLLOWING)"""
    assert(planOf(two).contains("__grf_emn"))
    checkExact(two)
  }

  test("min/max with null order keys and DESC direction stays exact") {
    checkExact("""SELECT id, min(v) OVER w AS mn, max(v) OVER w AS mx
      FROM rfr_t WINDOW w AS (ORDER BY k RANGE BETWEEN 35 PRECEDING AND 20 FOLLOWING)""")
    checkExact("""SELECT id, min(v) OVER w AS mn, max(v) OVER w AS mx,
        count(*) OVER w AS c
      FROM rfr_t WINDOW w AS (ORDER BY k DESC RANGE BETWEEN 35 PRECEDING AND 20 FOLLOWING)""")
  }

  test("min/max over a string value column (any orderable type)") {
    val sql = """SELECT id, min(concat('s', CAST(v AS STRING))) OVER w AS mn,
        max(concat('s', CAST(v AS STRING))) OVER w AS mx
      FROM rfr_t WINDOW w AS (ORDER BY k RANGE BETWEEN 25 PRECEDING AND 25 FOLLOWING)"""
    assert(planOf(sql).contains("__grf_emn"), "string min/max did not fire")
    checkExact(sql)
  }

  private def ensureTsView(): Unit = {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(31L)
    (0 until 400).map { i =>
      val us = if (rnd.nextInt(20) == 0) None
        else Some(86_400_000_000L + rnd.between(0L, 7_200_000_000L)) // 2h span
      val v = if (rnd.nextInt(5) == 0) None else Some(rnd.between(-100L, 100L))
      (i.toLong, us, v)
    }.toDF("id", "us", "v")
      .selectExpr("id", "timestamp_micros(us) AS ts",
        "CAST(timestamp_micros(us) AS TIMESTAMP_NTZ) AS tsn", "v")
      .createOrReplaceTempView("rfr_ts")
  }

  test("timestamp order keys with day-time INTERVAL offsets fire and stay exact") {
    ensureTsView()
    for (key <- Seq("ts", "tsn")) {
      val sql = s"""SELECT id,
          count(*) OVER w AS c, sum(v) OVER w AS s,
          min(v) OVER w AS mn, max(v) OVER w AS mx,
          count(*) OVER lw AS lc
        FROM rfr_ts
        WINDOW w AS (ORDER BY $key RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                       AND INTERVAL 3 MINUTES FOLLOWING),
               lw AS (ORDER BY $key RANGE BETWEEN INTERVAL 40 MINUTES PRECEDING
                       AND INTERVAL 25 MINUTES PRECEDING)"""
      val p = planOf(sql)
      assert(p.contains("__grf_"), s"time-axis frame did not fire for $key:\n$p")
      val got = rows(sql)
      val want = withRule(on = false)(rows(sql))
      assert(got == want, s"time-axis mismatch for $key")
    }
  }

  test("LTZ keys with whole-day interval offsets need a fixed-offset zone") {
    ensureTsView()
    val dayFrame = """SELECT id, count(*) OVER (ORDER BY ts RANGE BETWEEN
        INTERVAL 2 DAYS PRECEDING AND CURRENT ROW) AS c FROM rfr_ts"""
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      // DST zone + day component: stock's plusDays is zone-bent — stay out
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      assert(!planOf(dayFrame).contains("__grf_"),
        "day-crossing LTZ frame must not fire in a DST zone")
      // fixed-offset zone: exact micros — fire
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      assert(planOf(dayFrame).contains("__grf_"),
        "day-crossing LTZ frame should fire under UTC")
      // NTZ keys are naive: fire regardless of the session zone
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val ntz = dayFrame.replace("ORDER BY ts", "ORDER BY tsn")
      assert(planOf(ntz).contains("__grf_"),
        "day-crossing NTZ frame should fire in any zone")
      val got = rows(ntz)
      val want = withRule(on = false)(rows(ntz))
      assert(got == want)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("DATE order keys: integral-day and whole-day-interval frames fire; sub-day stays stock") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(41L)
    (0 until 300).map { i =>
      val d = if (rnd.nextInt(20) == 0) None else Some(rnd.between(0, 400))
      val v = if (rnd.nextInt(5) == 0) None else Some(rnd.between(-100L, 100L))
      (i.toLong, d, v)
    }.toDF("id", "days", "v")
      .selectExpr("id", "date_add(DATE'2020-01-01', days) AS d", "v")
      .createOrReplaceTempView("rfr_d")
    for (frame <- Seq(
      "INTERVAL 14 DAYS PRECEDING AND INTERVAL 3 DAYS FOLLOWING",
      "30 PRECEDING AND 7 PRECEDING", // integral offsets on a date = days
      "INTERVAL 21 DAYS PRECEDING AND CURRENT ROW")) {
      val sql = s"""SELECT id, count(*) OVER w AS c, sum(v) OVER w AS s,
          min(v) OVER w AS mn, max(v) OVER w AS mx
        FROM rfr_d WINDOW w AS (ORDER BY d RANGE BETWEEN $frame)"""
      assert(planOf(sql).contains("__grf_"), s"date frame did not fire: $frame")
      val got = rows(sql)
      val want = withRule(on = false)(rows(sql))
      assert(got == want, s"date-axis mismatch for $frame")
    }
    // sub-day intervals over a DATE key are rejected by the ANALYZER
    // itself (RANGE_FRAME_INVALID_TYPE) — the rule's whole-day guard
    // is defensive for mixed-unit DAY TO HOUR literals that still
    // type as day-time intervals
    val err = intercept[Exception] {
      spark.sql("""SELECT id, count(*) OVER (ORDER BY d RANGE BETWEEN
          INTERVAL 36 HOURS PRECEDING AND CURRENT ROW) AS c FROM rfr_d""").collect()
    }
    assert(err.toString.contains("RANGE_FRAME_INVALID_TYPE"), err.toString)
  }

  test("min/max with an UNBOUNDED frame side keeps the whole node with stock") {
    val sql = """SELECT id, min(v) OVER w AS mn
      FROM rfr_t WINDOW w AS (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND 5 FOLLOWING)"""
    assert(!planOf(sql).contains("__grf_"),
      "min/max with an unbounded bound must not fire")
  }

  test("does not fire: non-integral key, double sum, pure running, PARTITION BY") {
    for (sql <- Seq(
      "SELECT sum(v) OVER (ORDER BY CAST(k AS DOUBLE) RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) s FROM rfr_t",
      "SELECT sum(CAST(v AS DOUBLE)) OVER (ORDER BY k RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) s FROM rfr_t",
      "SELECT sum(v) OVER (PARTITION BY id % 2 ORDER BY k RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) s FROM rfr_t")) {
      assert(!planOf(sql).contains("__grf_"), s"fired unexpectedly for:\n$sql")
    }
    // a PURELY running node belongs to the sibling's peer-aware path
    val run = planOf("SELECT sum(v) OVER (ORDER BY k) s FROM rfr_t")
    assert(!run.contains("__grf_") && run.contains("GlobalRunningSum"), run)
  }

  test("seeded frame fuzz: random frames x aggregates x nullable data, exact vs stock") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(97L)
    for (round <- 0 until 4) {
      val n = 250 + rnd.nextInt(200)
      (0 until n).map { i =>
        val k = if (rnd.nextInt(15) == 0) None else Some(rnd.between(-80L, 80L))
        val v = if (rnd.nextInt(4) == 0) None else Some(rnd.between(-500L, 500L))
        (i.toLong, k, v)
      }.toDF("id", "k", "v").createOrReplaceTempView(s"rfr_fuzz")
      // 2-3 random frames; random bound mix (finite offsets always
      // lower <= upper, or an UNBOUNDED side for non-minmax exprs)
      def finiteFrame(): String = {
        val a = rnd.between(-60L, 60L)
        val b = rnd.between(-60L, 60L)
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        def side(o: Long, upper: Boolean): String =
          if (o == 0) "CURRENT ROW"
          else if (o < 0) s"${-o} PRECEDING" else s"$o FOLLOWING"
        s"RANGE BETWEEN ${side(lo, upper = false)} AND ${side(hi, upper = true)}"
      }
      val dir = if (rnd.nextBoolean()) "" else " DESC"
      val frames = (0 until 2 + rnd.nextInt(2)).map(i => s"w$i AS (ORDER BY k$dir ${finiteFrame()})")
      val aggs = frames.indices.flatMap { i =>
        val picks = rnd.shuffle(Seq(
          s"count(*) OVER w$i AS c$i", s"count(v) OVER w$i AS cv$i",
          s"sum(v) OVER w$i AS s$i", s"avg(v) OVER w$i AS a$i",
          s"min(v) OVER w$i AS mn$i", s"max(v) OVER w$i AS mx$i"))
        picks.take(1 + rnd.nextInt(3))
      }
      val sql = s"""SELECT id, ${aggs.mkString(", ")} FROM rfr_fuzz
        WINDOW ${frames.mkString(", ")}"""
      assert(planOf(sql).contains("__grf_"), s"fuzz round $round did not fire:\n$sql")
      val got = rows(sql)
      val want = withRule(on = false)(rows(sql))
      assert(got == want, s"fuzz round $round mismatch for:\n$sql")
    }
  }

  test("kill-switch conf restores stock planning") {
    withRule(on = false) {
      val p = planOf(
        "SELECT sum(v) OVER (ORDER BY k RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) s FROM rfr_t")
      assert(!p.contains("__grf_"))
    }
  }
}
