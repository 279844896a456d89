package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` must wire the SQL
  * functions and the whole-operator strategies into a fresh session —
  * the config-only path a cluster operator uses, no Scala calls. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "3")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("native expressions are SQL-callable") {
    val dot = spark.sql(
      "SELECT graft_array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
    val n = spark.sql(
      "SELECT graft_sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS n")
      .collect().head.getInt(0)
    assert(n == 2)
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("plain SQL partition-less row_number rewrites to the distributed plan") {
    val df = spark.range(0, 1000, 1, 4).selectExpr("id AS k", "(id * 7) % 1000 AS v")
    df.createOrReplaceTempView("rw_t")
    val q = spark.sql("SELECT k, row_number() OVER (ORDER BY v) AS rn FROM rw_t")
    val p = planOf(q)
    assert(p.contains("GlobalRowNumber"), s"rewrite did not fire:\n$p")
    assert(!p.contains("Window "), s"single-partition Window survived:\n$p")
    // value-exact: numbering must equal the order rank of v (v is unique)
    val rows = q.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val expected = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._2).zipWithIndex.map { case ((k, _), i) => k -> (i + 1) }.toMap
    assert(rows == expected)
  }

  test("the global-window kill switch restores stock planning") {
    spark.range(0, 500, 1, 4).selectExpr("id AS k", "(id * 3) % 97 AS v")
      .createOrReplaceTempView("ks_t")
    val sql = "SELECT k, row_number() OVER (ORDER BY v, k) AS rn FROM ks_t"
    spark.conf.set("spark.graft.globalWindows.enabled", "false")
    try {
      val off = planOf(spark.sql(sql))
      assert(!off.contains("GlobalRowNumber") && off.contains("Window"),
        s"kill switch ignored:\n$off")
    } finally spark.conf.unset("spark.graft.globalWindows.enabled")
    assert(planOf(spark.sql(sql)).contains("GlobalRowNumber"))
  }

  test("plain SQL running long sum rewrites with exact SQL null semantics") {
    val s = spark
    import s.implicits._
    val df = Seq[(Long, Option[Long])](
      (1L, None), (2L, None), (3L, Some(5L)), (4L, None), (5L, Some(2L)))
      .toDF("k", "v").repartition(3)
    df.createOrReplaceTempView("rs_t")
    val q = spark.sql(
      """SELECT k, sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
        |AND CURRENT ROW) AS cum FROM rs_t""".stripMargin)
    val p = planOf(q)
    assert(p.contains("GlobalRunningSum"), s"rewrite did not fire:\n$p")
    assert(!p.contains("Window "), s"single-partition Window survived:\n$p")
    // SQL semantics: NULL until the first non-null value, then skip nulls
    val got = q.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> None, 2L -> None, 3L -> Some(5L),
      4L -> Some(5L), 5L -> Some(7L)), got)
  }

  test("row_number and running sum in one window spec share one exchange") {
    val df = spark.range(0, 500, 1, 4).selectExpr("id AS k", "id % 9 AS v")
    df.createOrReplaceTempView("rw2_t")
    val q = spark.sql(
      """SELECT k, row_number() OVER (ORDER BY k) AS rn,
        |sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND
        |CURRENT ROW) AS cum FROM rw2_t""".stripMargin)
    val p = planOf(q)
    assert(p.contains("GlobalRowNumber") && p.contains("GlobalRunningSum"), p)
    val nExchanges = "Exchange".r.findAllIn(p).length
    assert(nExchanges == 1, s"expected the stacked operators to share one" +
      s" range shuffle, saw $nExchanges:\n$p")
    val last = q.orderBy(org.apache.spark.sql.functions.col("k").desc)
      .limit(1).collect().head
    assert(last.getInt(1) == 500 && last.getLong(2) ==
      (0L until 500L).map(_ % 9).sum)
  }

  test("running count(*) rewrites as a row number; count(nullable) does not") {
    val s = spark
    import s.implicits._
    val df = Seq[(Long, Option[Long])]((1L, None), (2L, Some(9L)), (3L, None))
      .toDF("k", "v")
    df.createOrReplaceTempView("rc_t")
    val starCount = spark.sql(
      """SELECT k, count(*) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
        |PRECEDING AND CURRENT ROW) AS c FROM rc_t""".stripMargin)
    val p = planOf(starCount)
    assert(p.contains("GlobalRowNumber"), s"count(*) rewrite did not fire:\n$p")
    assert(starCount.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 1L), (2L, 2L), (3L, 3L)))
    // count(v) skips nulls — NOT a row number; must stay a Window
    val colCount = spark.sql(
      """SELECT k, count(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
        |PRECEDING AND CURRENT ROW) AS c FROM rc_t""".stripMargin)
    assert(!planOf(colCount).contains("GlobalRowNumber"))
    assert(colCount.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 0L), (2L, 1L), (3L, 1L)))
  }

  test("the rank family rewrites tie-exactly to the distributed plan") {
    val df = spark.range(0, 3000, 1, 8).selectExpr("id AS k", "id % 7 AS v")
    df.createOrReplaceTempView("rk_t")
    val q = spark.sql(
      """SELECT k, v, rank() OVER (ORDER BY v) AS rnk,
        |dense_rank() OVER (ORDER BY v) AS drnk,
        |percent_rank() OVER (ORDER BY v) AS prnk,
        |cume_dist() OVER (ORDER BY v) AS cume,
        |ntile(8) OVER (ORDER BY k) AS bucket FROM rk_t""".stripMargin)
    val p = planOf(q)
    assert(p.contains("GlobalRank"), s"rank rewrite did not fire:\n$p")
    assert(!p.contains("Window "), s"single-partition Window survived:\n$p")
    // ties make the rank family deterministic: v has 7 equal-sized
    // runs of 429/428 rows (3000 = 7*428 + 4). expected rank of value
    // v = 1 + #rows with smaller value; dense_rank = v + 1;
    // percent_rank = (rank-1)/2999; cume_dist = (rank-1+count(v))/3000.
    // ntile is over the UNIQUE key k (tie-free ⇒ deterministic):
    // 3000 rows into 8 buckets = 375 each ⇒ bucket = k/375 + 1.
    val counts = (0L until 3000L).map(_ % 7).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val rankOf = (0L until 7L).map { v =>
      v -> (1L + (0L until v).map(counts).sum)
    }.toMap
    q.collect().foreach { r =>
      val k = r.getLong(0)
      val v = r.getLong(1)
      assert(r.getInt(2).toLong == rankOf(v), s"rank mismatch at v=$v")
      assert(r.getInt(3).toLong == v + 1, s"dense_rank mismatch at v=$v")
      assert(r.getDouble(4) == (rankOf(v) - 1).toDouble / 2999,
        s"percent_rank mismatch at v=$v")
      assert(r.getDouble(5) == (rankOf(v) - 1 + counts(v)).toDouble / 3000,
        s"cume_dist mismatch at v=$v")
      assert(r.getInt(6).toLong == k / 375 + 1, s"ntile mismatch at k=$k")
    }
  }

  test("ntile uneven buckets follow SQL NTILE's closed form") {
    // 1003 rows into 7 buckets: 1003 = 7*143 + 2 ⇒ the first 2 buckets
    // get 144 rows. Check the rewritten plan row-for-row against SQL
    // NTILE's closed form on a UNIQUE ordering key (the DuckDB oracle
    // on q74 holds the cross-engine side).
    val df = spark.range(0, 1003, 1, 8).selectExpr("id AS k")
    df.createOrReplaceTempView("nt_t")
    val q = spark.sql("SELECT k, ntile(7) OVER (ORDER BY k) b FROM nt_t")
    assert(planOf(q).contains("GlobalRank"))
    val got = q.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // closed form of SQL NTILE on a unique key: first (n%b) buckets
    // have ⌈n/b⌉ rows
    (0L until 1003L).foreach { k =>
      val expected =
        if (k < 2 * 144) k / 144 + 1
        else 2 + (k - 2 * 144) / 143 + 1
      assert(got(k).toLong == expected, s"ntile mismatch at k=$k")
    }
  }

  test("running min/max rewrite with the running-sum structure") {
    // a non-monotonic value stream: the running extremum actually
    // moves (id*37 mod 101 cycles), and int results cast back to int
    val df = spark.range(0, 2000, 1, 8)
      .selectExpr("id AS k", "CAST(id * 37 % 101 AS INT) AS v")
    df.createOrReplaceTempView("mm_t")
    val q = spark.sql(
      """SELECT k, v,
        |min(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND
        |CURRENT ROW) AS rmin,
        |max(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND
        |CURRENT ROW) AS rmax FROM mm_t""".stripMargin)
    val p = planOf(q)
    assert(p.contains("GlobalRunningSum"), s"min/max rewrite did not fire:\n$p")
    assert(!p.contains("Window "), s"single-partition Window survived:\n$p")
    // result type must be the child's (INT), not the operator's long
    assert(q.schema("rmin").dataType == org.apache.spark.sql.types.IntegerType)
    var expMin = Int.MaxValue
    var expMax = Int.MinValue
    q.orderBy("k").collect().foreach { r =>
      val v = r.getInt(1)
      expMin = math.min(expMin, v); expMax = math.max(expMax, v)
      assert(r.getInt(2) == expMin, s"running min mismatch at k=${r.getLong(0)}")
      assert(r.getInt(3) == expMax, s"running max mismatch at k=${r.getLong(0)}")
    }
    // non-integral min keeps Catalyst's Window (double comparison
    // semantics stay Spark's)
    val dmin = spark.sql(
      """SELECT k, min(CAST(v AS DOUBLE)) OVER (ORDER BY k ROWS BETWEEN
        |UNBOUNDED PRECEDING AND CURRENT ROW) m FROM mm_t""".stripMargin)
    assert(!planOf(dmin).contains("GlobalRunningSum"), planOf(dmin))
  }

  test("sliding ROWS windows rewrite to the hand-off operator") {
    val df = spark.range(0, 3000, 1, 8)
      .selectExpr("id AS k",
        "CASE WHEN id % 11 = 0 THEN NULL ELSE CAST(id * 37 % 101 AS INT) END AS v")
    df.createOrReplaceTempView("sw_t")
    val q = spark.sql(
      """SELECT k, v,
        |sum(v)   OVER w AS wsum,
        |min(v)   OVER w AS wmin,
        |max(v)   OVER w AS wmax,
        |count(*) OVER w AS wn
        |FROM sw_t
        |WINDOW w AS (ORDER BY k ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
        |""".stripMargin)
    val p = planOf(q)
    assert(p.contains("GlobalSliding"), s"sliding rewrite did not fire:\n$p")
    assert(!p.contains("Window "), s"single-partition Window survived:\n$p")
    // brute-force oracle over the value function (nulls every 11th row)
    def vOf(id: Long): Option[Int] =
      if (id % 11 == 0) None else Some((id * 37 % 101).toInt)
    q.collect().foreach { r =>
      val k = r.getLong(0)
      val frame = (math.max(0L, k - 7) to k).flatMap(vOf)
      if (frame.isEmpty) {
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
      } else {
        assert(r.getLong(2) == frame.map(_.toLong).sum, s"wsum at k=$k")
        assert(r.getInt(3) == frame.min, s"wmin at k=$k")
        assert(r.getInt(4) == frame.max, s"wmax at k=$k")
      }
      assert(r.getLong(5) == math.min(k + 1, 8L), s"wn at k=$k")
    }
    // out-of-cap frame stays with Catalyst
    val big = spark.sql(
      """SELECT k, sum(v) OVER (ORDER BY k ROWS BETWEEN 5000 PRECEDING AND
        |CURRENT ROW) s FROM sw_t""".stripMargin)
    assert(!planOf(big).contains("GlobalSliding"), planOf(big))
  }

  test("bounded ROWS frames with FOLLOWING rewrite via the suffix hand-off") {
    val df = spark.range(0, 3000, 1, 8)
      .selectExpr("id AS k",
        "CASE WHEN id % 11 = 0 THEN NULL ELSE CAST(id * 37 % 101 AS INT) END AS v")
    df.createOrReplaceTempView("swf_t")
    val n = 3000L
    def vOf(id: Long): Option[Int] =
      if (id % 11 == 0) None else Some((id * 37 % 101).toInt)
    // centered moving window, a leading count, and a fully-shifted
    // (possibly EMPTY) preceding frame
    val q = spark.sql(
      """SELECT k,
        |sum(v)   OVER c AS csum,
        |avg(v)   OVER c AS cavg,
        |count(*) OVER (ORDER BY k ROWS BETWEEN 2 FOLLOWING AND 5 FOLLOWING) AS fn,
        |max(v)   OVER (ORDER BY k ROWS BETWEEN 6 PRECEDING AND 2 PRECEDING) AS pmax
        |FROM swf_t
        |WINDOW c AS (ORDER BY k ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |""".stripMargin)
    val p = planOf(q)
    assert(p.contains("GlobalSliding"), s"following-frame rewrite did not fire:\n$p")
    assert(!p.contains("Window "), s"single-partition Window survived:\n$p")
    q.collect().foreach { r =>
      val k = r.getLong(0)
      val c = (math.max(0L, k - 3) to math.min(n - 1, k + 3)).flatMap(vOf)
      if (c.isEmpty) assert(r.isNullAt(1) && r.isNullAt(2))
      else {
        assert(r.getLong(1) == c.map(_.toLong).sum, s"csum at k=$k")
        assert(math.abs(r.getDouble(2) - c.map(_.toLong).sum.toDouble / c.length)
          < 1e-12, s"cavg at k=$k")
      }
      // SQL empty-frame count is 0 at the relation's tail
      assert(r.getLong(3) ==
        math.max(0L, math.min(n - 1, k + 5) - (k + 2) + 1), s"fn at k=$k")
      val pm = (math.max(0L, k - 6) to (k - 2)).flatMap(vOf)
      if (pm.isEmpty) assert(r.isNullAt(4), s"pmax at k=$k")
      else assert(r.getInt(4) == pm.max, s"pmax at k=$k")
    }
    // single-row frame is the row itself — no operator needed
    val selfQ = spark.sql(
      """SELECT k, sum(v) OVER (ORDER BY k ROWS BETWEEN CURRENT ROW AND
        |CURRENT ROW) s FROM swf_t""".stripMargin)
    val sp = planOf(selfQ)
    assert(!sp.contains("Window ") && !sp.contains("GlobalSliding"), sp)
    // out-of-cap FOLLOWING stays with Catalyst
    val bigF = spark.sql(
      """SELECT k, sum(v) OVER (ORDER BY k ROWS BETWEEN CURRENT ROW AND
        |5000 FOLLOWING) s FROM swf_t""".stripMargin)
    assert(!planOf(bigF).contains("GlobalSliding"), planOf(bigF))
  }

  test("lag/lead rewrite with exact boundary hand-off") {
    val df = spark.range(0, 2000, 1, 8)
      .selectExpr("id AS k", "CAST(id * 37 % 101 AS INT) AS v")
    df.createOrReplaceTempView("off_t")
    val q = spark.sql(
      """SELECT k, v,
        |lag(v, 3) OVER (ORDER BY k) AS prev3,
        |lead(v, 2) OVER (ORDER BY k) AS next2,
        |lag(v, 1, -1) OVER (ORDER BY k) AS prev_or FROM off_t""".stripMargin)
    val p = planOf(q)
    assert(p.contains("GlobalOffset"), s"offset rewrite did not fire:\n$p")
    assert(!p.contains("Window "), s"single-partition Window survived:\n$p")
    def vOf(id: Long): Int = (id * 37 % 101).toInt
    q.collect().foreach { r =>
      val k = r.getLong(0)
      if (k >= 3) assert(r.getInt(2) == vOf(k - 3), s"lag3 mismatch at k=$k")
      else assert(r.isNullAt(2), s"lag3 should be null at k=$k")
      if (k <= 1997) assert(r.getInt(3) == vOf(k + 2), s"lead2 mismatch at k=$k")
      else assert(r.isNullAt(3), s"lead2 should be null at k=$k")
      val expPrev = if (k >= 1) vOf(k - 1) else -1
      assert(r.getInt(4) == expPrev, s"lag-with-default mismatch at k=$k")
    }
  }

  test("lag/lead surplus forwarding across partitions shorter than k") {
    // 100 rows spread over 64 range partitions (~1-2 rows each) with
    // k=5: a partition's hand-off must forward values from SEVERAL
    // predecessors, not just the adjacent one.
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      val df = spark.range(0, 100, 1, 16).selectExpr("id AS k", "id * 7 AS v")
      df.createOrReplaceTempView("sf_t")
      val q = spark.sql(
        """SELECT k, lag(v, 5) OVER (ORDER BY k) AS l5,
          |lead(v, 5) OVER (ORDER BY k) AS n5 FROM sf_t""".stripMargin)
      assert(planOf(q).contains("GlobalOffset"))
      q.collect().foreach { r =>
        val k = r.getLong(0)
        if (k >= 5) assert(r.getLong(1) == (k - 5) * 7, s"lag5 mismatch at k=$k")
        else assert(r.isNullAt(1))
        if (k <= 94) assert(r.getLong(2) == (k + 5) * 7, s"lead5 mismatch at k=$k")
        else assert(r.isNullAt(2))
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("lag over a string column keeps payload bytes intact") {
    // non-primitive values ride the hand-off as copied single-field
    // rows; a reused projection buffer would corrupt them
    val df = spark.range(0, 500, 1, 8)
      .selectExpr("id AS k", "concat('s-', CAST(id AS STRING)) AS s")
    df.createOrReplaceTempView("str_t")
    val q = spark.sql("SELECT k, lag(s, 4) OVER (ORDER BY k) ls FROM str_t")
    assert(planOf(q).contains("GlobalOffset"))
    q.collect().foreach { r =>
      val k = r.getLong(0)
      if (k >= 4) assert(r.getString(1) == s"s-${k - 4}", s"mismatch at k=$k")
      else assert(r.isNullAt(1))
    }
  }

  test("cume_dist tie-run buffering survives the spill path") {
    // cume_dist buffers one tie-run at a time in an
    // ExternalAppendOnlyUnsafeRowArray; force the spill branch by
    // dropping the row threshold below the run length (4000 rows per
    // tie-run at threshold 16).
    val prior = spark.conf.get("spark.sql.windowExec.buffer.spill.threshold")
    try {
      spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "16")
      val df = spark.range(0, 12000, 1, 8).selectExpr("id AS k", "id % 3 AS v")
      df.createOrReplaceTempView("cd_t")
      val q = spark.sql("SELECT k, v, cume_dist() OVER (ORDER BY v) c FROM cd_t")
      assert(planOf(q).contains("GlobalRank"))
      // 3 runs of 4000 ⇒ cume_dist(v) = (v+1)*4000/12000
      q.collect().foreach { r =>
        val v = r.getLong(1)
        assert(r.getDouble(2) == (v + 1) * 4000.0 / 12000.0,
          s"cume_dist mismatch at v=$v")
      }
    } finally spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", prior)
  }

  test("the rewrite fires under both ANSI settings (checked vs wrapping sum)") {
    // Spark 4 defaults to ANSI on; legacy sessions turn it off. The
    // rewrite must fire either way — only the running sum's overflow
    // contract differs (checked abort vs wrap), invisible on sane data.
    val df = spark.range(0, 100, 1, 4).selectExpr("id AS k", "id % 3 AS v")
    df.createOrReplaceTempView("ansi_t")
    val sql = """SELECT k, sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
                |PRECEDING AND CURRENT ROW) AS cum FROM ansi_t""".stripMargin
    val prior = spark.conf.get("spark.sql.ansi.enabled")
    try {
      for (ansi <- Seq("true", "false")) {
        spark.conf.set("spark.sql.ansi.enabled", ansi)
        val q = spark.sql(sql)
        assert(planOf(q).contains("GlobalRunningSum"),
          s"rewrite did not fire with ansi=$ansi")
        assert(q.orderBy(org.apache.spark.sql.functions.col("k").desc)
          .limit(1).collect().head.getLong(1) == (0L until 100L).map(_ % 3).sum)
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", prior)
  }

  test("the window rewrite leaves non-qualifying shapes to Catalyst") {
    val df = spark.range(0, 100, 1, 4)
      .selectExpr("id AS k", "id % 5 AS g", "id % 7 AS v")
    df.createOrReplaceTempView("nf_t")
    // PARTITION BY: already distributed by the partition keys
    val partitioned = spark.sql(
      "SELECT k, row_number() OVER (PARTITION BY g ORDER BY k) rn FROM nf_t")
    assert(!planOf(partitioned).contains("GlobalRowNumber"))
    // lag() beyond the hand-off cap: driver state would be
    // numPartitions × k values — Catalyst's Window is the honest plan
    val lagged = spark.sql("SELECT k, lag(v, 5000) OVER (ORDER BY k) r FROM nf_t")
    assert(!planOf(lagged).contains("GlobalOffset"), planOf(lagged))
    // ignoreNulls needs unbounded lookback — not modeled
    val lagIgnore = spark.sql(
      "SELECT k, lag(v) IGNORE NULLS OVER (ORDER BY k) r FROM nf_t")
    assert(!planOf(lagIgnore).contains("GlobalOffset"), planOf(lagIgnore))
    // RANGE frames with a VALUE offset belong to RewriteRangeFrames
    // (r11), which lowers them to the prefix-difference composition —
    // THIS rule still refuses them directly: with the sibling disabled
    // the node must stay a stock Window
    val rangeOffsetSql =
      """SELECT k, sum(v) OVER (ORDER BY g RANGE BETWEEN 2 PRECEDING
        |AND CURRENT ROW) s FROM nf_t""".stripMargin
    assert(planOf(spark.sql(rangeOffsetSql)).contains("__grf_"))
    spark.conf.set("spark.graft.rangeFrames.enabled", "false")
    try {
      val rangeOffset = spark.sql(rangeOffsetSql)
      assert(!planOf(rangeOffset).contains("GlobalRunningSum"), planOf(rangeOffset))
    } finally spark.conf.set("spark.graft.rangeFrames.enabled", "true")
    // non-long sum: double summation keeps Spark's semantics
    val dblSum = spark.sql(
      """SELECT k, sum(CAST(v AS DOUBLE)) OVER (ORDER BY k ROWS BETWEEN
        |UNBOUNDED PRECEDING AND CURRENT ROW) s FROM nf_t""".stripMargin)
    assert(!planOf(dblSum).contains("GlobalRunningSum"))
    // rank-limiting filter above: InferWindowGroupLimit's per-partition
    // top-k beats a full range shuffle for small k — leave it
    val topk = spark.sql(
      """SELECT * FROM (SELECT k, row_number() OVER (ORDER BY v) rn
        |FROM nf_t) WHERE rn <= 5""".stripMargin)
    val topkPlan = planOf(topk)
    assert(!topkPlan.contains("GlobalRowNumber"), topkPlan)
    // Catalyst picks LimitPushDownThroughWindow (TakeOrderedAndProject
    // below the window) or InferWindowGroupLimit — either is the
    // per-partition top-k shape the guard preserves
    assert(topkPlan.contains("WindowGroupLimit") ||
      topkPlan.contains("TakeOrderedAndProject"), topkPlan)
  }

  test("running avg and the edge values rewrite to distributed plans, value-exact") {
    val s = spark
    import s.implicits._
    val df = Seq[(Long, Option[Long])](
      (1L, None), (2L, Some(4L)), (3L, None), (4L, Some(10L)), (5L, Some(1L)))
      .toDF("k", "v").repartition(3)
    df.createOrReplaceTempView("fv_t")
    val q = spark.sql(
      """SELECT k,
        |  avg(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS ravg,
        |  first_value(v) OVER (ORDER BY k) AS fv,
        |  first_value(v, true) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW) AS fvn,
        |  last_value(v, true) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW) AS lvn,
        |  last_value(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS lv_id,
        |  last_value(v, true) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND UNBOUNDED FOLLOWING) AS lv_full,
        |  avg(v) OVER (ORDER BY k ROWS BETWEEN 1 PRECEDING AND
        |    CURRENT ROW) AS savg
        |FROM fv_t""".stripMargin)
    val p = planOf(q)
    assert(p.contains("GlobalFirstValue"), s"edge rewrite did not fire:\n$p")
    assert(p.contains("GlobalRunningSum"), s"avg rewrite did not fire:\n$p")
    assert(p.contains("GlobalSliding"), s"sliding avg did not fire:\n$p")
    assert(!p.contains("Window "), s"single-partition Window survived:\n$p")
    def l(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    def d(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    val got = q.collect().map { r =>
      r.getLong(0) -> ((d(r, 1), l(r, 2), l(r, 3), l(r, 4), l(r, 5), l(r, 6)),
        d(r, 7))
    }.toMap
    // avg skips nulls (sum of non-null / count of non-null, NULL before
    // the first non-null); fv = the FIRST ROW's value, which is NULL
    // here; lv_id = the current row's own value; lv_full = the global
    // last NON-NULL value; savg = 2-row sliding avg over non-nulls
    assert(got == Map(
      1L -> ((None, None, None, None, None, Some(1L)), None),
      2L -> ((Some(4.0), None, Some(4L), Some(4L), Some(4L), Some(1L)), Some(4.0)),
      3L -> ((Some(4.0), None, Some(4L), Some(4L), None, Some(1L)), Some(4.0)),
      4L -> ((Some(7.0), None, Some(4L), Some(10L), Some(10L), Some(1L)), Some(10.0)),
      5L -> ((Some(5.0), None, Some(4L), Some(1L), Some(1L), Some(1L)), Some(5.5))), got)
  }

  test("default-frame (RANGE) running aggregates rewrite peer-aware") {
    val s = spark
    import s.implicits._
    // g=0 run is ALL-NULL (gates null-until-first-non-null at run
    // granularity); g=1 mixes nulls; g=2's non-null arrives in the
    // run's SECOND row — peer semantics must surface it to the first
    val df = Seq[(Long, Long, Option[Long])](
      (1L, 0L, None), (2L, 0L, None), (3L, 1L, Some(5L)), (4L, 1L, None),
      (5L, 1L, Some(2L)), (6L, 2L, None), (7L, 2L, Some(4L)))
      .toDF("k", "g", "v").repartition(3)
    df.createOrReplaceTempView("pr_t")
    // bare ORDER BY — the analyzer assigns RANGE UNBOUNDED..CURRENT.
    // The edge values run over w = a FUNCTION of the order key (g=0 →
    // NULL, else g*10): peer "last row" among equal keys is
    // sort-arbitrary exactly like stock Spark, so determinism needs a
    // key-dependent input — the realistic usage.
    val q = spark.sql(
      """SELECT k, sum(v) OVER (ORDER BY g) s, count(*) OVER (ORDER BY g) c,
        |min(v) OVER (ORDER BY g) mn, avg(v) OVER (ORDER BY g) av,
        |last_value(CASE WHEN g = 0 THEN NULL ELSE g * 10 END)
        |  OVER (ORDER BY g) lvw,
        |first_value(CASE WHEN g = 0 THEN NULL ELSE g * 10 END, true)
        |  OVER (ORDER BY g) fvnw,
        |last_value(CASE WHEN g = 0 THEN NULL ELSE g * 10 END, true)
        |  OVER (ORDER BY g) lvnw
        |FROM pr_t ORDER BY k""".stripMargin)
    val p = planOf(q)
    assert(p.contains("GlobalRunningSum"), s"peer-aware rewrite did not fire:\n$p")
    assert(p.contains("GlobalFirstValue"), s"peer edge values did not fire:\n$p")
    assert(!p.contains("Window "), s"single-partition Window survived:\n$p")
    def l(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    val got = q.collect().map { r =>
      r.getLong(0) -> ((l(r, 1), r.getLong(2), l(r, 3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        l(r, 5), l(r, 6), l(r, 7)))
    }.toMap
    assert(got == Map(
      1L -> ((None, 2L, None, None, None, None, None)),
      2L -> ((None, 2L, None, None, None, None, None)),
      3L -> ((Some(7L), 5L, Some(2L), Some(3.5), Some(10L), Some(10L), Some(10L))),
      4L -> ((Some(7L), 5L, Some(2L), Some(3.5), Some(10L), Some(10L), Some(10L))),
      5L -> ((Some(7L), 5L, Some(2L), Some(3.5), Some(10L), Some(10L), Some(10L))),
      6L -> ((Some(11L), 7L, Some(2L), Some(11.0 / 3), Some(20L), Some(10L), Some(20L))),
      7L -> ((Some(11L), 7L, Some(2L), Some(11.0 / 3), Some(20L), Some(10L), Some(20L)))), got)
  }

  test("edge values over strings; non-qualifying avg/nth/last shapes stay with Catalyst") {
    val s = spark
    import s.implicits._
    val df = Seq[(Long, Option[String], Double)](
      (1L, None, 0.5), (2L, Some("b"), 1.5), (3L, None, 2.5), (4L, Some("d"), 3.5))
      .toDF("k", "sv", "dv").repartition(3)
    df.createOrReplaceTempView("fv_s")
    // the edge operator is type-generic: strings ride the hand-off
    val sq = spark.sql(
      """SELECT k, first_value(sv, true) OVER (ORDER BY k ROWS BETWEEN
        |UNBOUNDED PRECEDING AND CURRENT ROW) AS f FROM fv_s""".stripMargin)
    assert(planOf(sq).contains("GlobalFirstValue"), planOf(sq))
    val gotS = sq.collect().map(r =>
      r.getLong(0) -> Option(r.getString(1))).toMap
    assert(gotS == Map(1L -> None, 2L -> Some("b"), 3L -> Some("b"),
      4L -> Some("b")), gotS)
    // avg over DOUBLE: double accumulation keeps Spark's semantics
    val davg = spark.sql(
      """SELECT k, avg(dv) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
        |PRECEDING AND CURRENT ROW) a FROM fv_s""".stripMargin)
    assert(!planOf(davg).contains("GlobalRunningSum"), planOf(davg))
    // last_value under the default RANGE frame fires peer-aware: over
    // the UNIQUE key k each tie-run is one row, so the value is the
    // row's own (the tied case is value-checked in the peer test)
    val lvRange = spark.sql(
      "SELECT k, last_value(sv) OVER (ORDER BY k) lv FROM fv_s ORDER BY k")
    assert(planOf(lvRange).contains("GlobalFirstValue"), planOf(lvRange))
    val lvGot = lvRange.collect().map(r => Option(r.getString(1))).toSeq
    assert(lvGot == Seq(None, Some("b"), None, Some("d")), lvGot)
    // nth_value beyond 1 rewrites too (global scalar + running-count
    // composition); beyond the offset cap it stays with Catalyst
    val nth2 = spark.sql(
      """SELECT k, nth_value(sv, 2) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
        |PRECEDING AND CURRENT ROW) n2 FROM fv_s""".stripMargin)
    assert(planOf(nth2).contains("GlobalFirstValue"), planOf(nth2))
    val nthCap = spark.sql(
      """SELECT k, nth_value(sv, 2000) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
        |PRECEDING AND CURRENT ROW) n2 FROM fv_s""".stripMargin)
    assert(!planOf(nthCap).contains("GlobalFirstValue"), planOf(nthCap))
  }

  test("nth_value(n>1) is the global n-th scalar gated by a running count") {
    val s = spark
    import s.implicits._
    val df = Seq[(Long, Option[String])](
      (1L, None), (2L, Some("b")), (3L, None), (4L, Some("d")))
      .toDF("k", "sv").repartition(3)
    df.createOrReplaceTempView("nth_t")
    def vals(q: String): Seq[Option[String]] = {
      val d = spark.sql(q + " ORDER BY k")
      assert(planOf(d).contains("GlobalFirstValue"), planOf(d))
      d.collect().map(r => Option(r.getString(1))).toSeq
    }
    // RESPECT NULLS over ROWS: the 2nd row's value appears once the
    // frame holds 2 rows
    assert(vals("""SELECT k, nth_value(sv, 2) OVER (ORDER BY k ROWS BETWEEN
        |UNBOUNDED PRECEDING AND CURRENT ROW) v FROM nth_t""".stripMargin) ==
      Seq(None, Some("b"), Some("b"), Some("b")))
    // a NULL-valued n-th row stays NULL even once visible
    assert(vals("""SELECT k, nth_value(sv, 3) OVER (ORDER BY k ROWS BETWEEN
        |UNBOUNDED PRECEDING AND CURRENT ROW) v FROM nth_t""".stripMargin) ==
      Seq(None, None, None, None))
    // IGNORE NULLS: counts only non-null frame rows
    assert(vals("""SELECT k, nth_value(sv, 2) IGNORE NULLS OVER (ORDER BY k
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) v
        |FROM nth_t""".stripMargin) ==
      Seq(None, None, None, Some("d")))
    // full frame: the scalar everywhere
    assert(vals("""SELECT k, nth_value(sv, 2) IGNORE NULLS OVER (ORDER BY k
        |ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) v
        |FROM nth_t""".stripMargin) ==
      Seq(Some("d"), Some("d"), Some("d"), Some("d")))
    // RANGE (default frame) with ties: peers reveal the scalar at run
    // granularity — key-dependent input keeps ties deterministic
    val tied = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L)).toDF("k", "g")
      .selectExpr("k", "g", "g * 10 AS v").repartition(3)
    tied.createOrReplaceTempView("nth_tied")
    val rq = spark.sql(
      "SELECT k, nth_value(v, 3) OVER (ORDER BY g) nv FROM nth_tied ORDER BY k")
    assert(planOf(rq).contains("GlobalFirstValue"), planOf(rq))
    assert(rq.collect().map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq ==
      Seq(-1L, -1L, 20L, 20L))
  }

  test("whole-operator strategies plan without experimental self-registration") {
    // the injected strategies must already be present: a session built
    // ONLY from config plans the custom nodes
    val df = spark.range(0, 1000, 1, 4).selectExpr("id AS k", "id % 5 AS v")
    val ranked = graft.functions.DistributedRank
      .withRowNumber(df, Seq(col("k")), "rn")
    assert(ranked.queryExecution.executedPlan.toString.contains("GlobalRowNumber"))
    assert(ranked.count() == 1000L)
    val summed = graft.functions.DistributedPrefixSum
      .withRunningSum(df, Seq(col("k")), "v", "cum")
    assert(summed.queryExecution.executedPlan.toString.contains("GlobalRunningSum"))
    val total = summed.orderBy(col("k").desc).limit(1)
      .collect().head.getAs[Long]("cum")
    assert(total == df.agg(sum("v")).collect().head.getLong(0))
  }
}
