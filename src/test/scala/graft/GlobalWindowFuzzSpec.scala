package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz over the WHOLE RewriteGlobalWindows family at once,
  * against an INDEPENDENTLY-DERIVED oracle: a sequential Scala
  * evaluation of every window function over the totally-ordered input.
  * (A stock-Spark reference via `PARTITION BY <literal>` does not work:
  * Catalyst eliminates foldable window partition keys, turning the
  * "reference" partition-less and re-firing the rewrite on it.)
  *
  * Per-shape specs lock each operator; this net catches cross-family
  * interactions — e.g. the OptimizeWindowFunctions first_value →
  * nth_value rewrite that silently blocked a whole Window node in r10 —
  * plus nulls, order-key ties, and range partitions shorter than the
  * hand-off windows. Order-sensitive functions run over the TOTAL
  * order (g, k); the rank family additionally runs over g alone (real
  * ties — its values are tie-invariant). Values stay far inside 2^53,
  * so the avg divisions are exact in both evaluations. */
class GlobalWindowFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("global-window-fuzz-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "7")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val windowCols = Seq(
    "CAST(row_number() OVER (ORDER BY g, k) AS BIGINT) AS rn",
    "CAST(rank() OVER (ORDER BY g) AS BIGINT) AS rk",
    "CAST(dense_rank() OVER (ORDER BY g) AS BIGINT) AS drk",
    "percent_rank() OVER (ORDER BY g) AS prk",
    "cume_dist() OVER (ORDER BY g) AS cd",
    "CAST(ntile(5) OVER (ORDER BY g, k) AS BIGINT) AS nt",
    "lag(v, 2) OVER (ORDER BY g, k) AS lg",
    "lead(v, 1, 99) OVER (ORDER BY g, k) AS ld",
    "sum(v) OVER (ORDER BY g, k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rsum",
    "min(v) OVER (ORDER BY g, k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rmin",
    "max(v) OVER (ORDER BY g, k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rmax",
    "avg(v) OVER (ORDER BY g, k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ravg",
    "count(*) OVER (ORDER BY g, k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rcnt",
    "sum(v) OVER (ORDER BY g, k ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS ssum",
    "min(v) OVER (ORDER BY g, k ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS smin",
    "max(v) OVER (ORDER BY g, k ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS smax",
    "avg(v) OVER (ORDER BY g, k ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS savg",
    "count(*) OVER (ORDER BY g, k ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS scnt",
    "first_value(v) OVER (ORDER BY g, k) AS fv",
    "first_value(v, true) OVER (ORDER BY g, k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fvn",
    "last_value(v, true) OVER (ORDER BY g, k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lvn",
    "last_value(v) OVER (ORDER BY g, k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv_id",
    "last_value(v, true) OVER (ORDER BY g, k ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv_full",
    // bare ORDER BY over g (which has ties): the analyzer assigns the
    // default RANGE frame — the peer-aware operator path
    "sum(v) OVER (ORDER BY g) AS gsum",
    "count(*) OVER (ORDER BY g) AS gcnt",
    "min(v) OVER (ORDER BY g) AS gmin",
    "max(v) OVER (ORDER BY g) AS gmax",
    "avg(v) OVER (ORDER BY g) AS gavg",
    // peer edge values over w (a function of g: NULL on even g, else
    // g*10+1) — key-dependence keeps the tie-arbitrary "last row of
    // the run" deterministic, mirroring how the shape is usable at all
    "last_value(w) OVER (ORDER BY g) AS glv",
    "first_value(w, true) OVER (ORDER BY g) AS gfvn",
    "last_value(w, true) OVER (ORDER BY g) AS glvn",
    // bounded ROWS frames with FOLLOWING / fully-shifted bounds
    "sum(v) OVER (ORDER BY g, k ROWS BETWEEN 2 PRECEDING AND 3 FOLLOWING) AS csum",
    "avg(v) OVER (ORDER BY g, k ROWS BETWEEN 2 PRECEDING AND 3 FOLLOWING) AS cavg",
    "count(*) OVER (ORDER BY g, k ROWS BETWEEN 2 FOLLOWING AND 4 FOLLOWING) AS fcnt",
    "max(v) OVER (ORDER BY g, k ROWS BETWEEN 5 PRECEDING AND 2 PRECEDING) AS pmax",
    // nth_value(n>1): global n-th scalar gated by a running count
    "nth_value(v, 3) OVER (ORDER BY g, k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n3",
    "nth_value(v, 4) IGNORE NULLS OVER (ORDER BY g, k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n4i",
    // RANGE: revealed at run granularity; w is g-dependent, so the
    // tie-arbitrary "2nd row" has a deterministic value
    "nth_value(w, 2) OVER (ORDER BY g) AS gn2")

  /** Sequential oracle: one pass over the (g, k)-sorted input. */
  private def oracle(rows: Vector[(Long, Long, Option[Long])])
      : Map[Long, Vector[Any]] = {
    val sorted = rows.sortBy { case (k, g, _) => (g, k) }
    val n = sorted.length
    val gs = sorted.map(_._2)
    // rank family over g alone (same total sort: g ties keep (g,k) order,
    // and the values only depend on g)
    val rank = gs.indices.map(i => gs.indexOf(gs(i)).toLong + 1)
    val dense = gs.indices.map(i => gs.take(i + 1).distinct.length.toLong)
    val cume = gs.indices.map(i => gs.count(_ <= gs(i)).toDouble / n)
    // SQL NTILE over n rows, b buckets: first (n % b) buckets get
    // (n/b + 1) rows
    def ntile(i: Int, b: Int): Long = {
      val big = n % b; val base = n / b
      if (i < big * (base + 1)) i / (base + 1) + 1L
      else big + (i - big * (base + 1)) / base + 1L
    }
    val vs = sorted.map(_._3)
    sorted.zipWithIndex.map { case ((k, g, v), i) =>
      val run = vs.take(i + 1).flatten
      val slide = vs.slice(math.max(0, i - 3), i + 1).flatten
      val nonNullUpTo = vs.take(i + 1).flatten
      Vector[Any](
        (i + 1).toLong, // rn
        rank(i), dense(i),
        if (n == 1) 0.0 else (rank(i) - 1).toDouble / (n - 1), // prk
        cume(i),
        ntile(i, 5),
        if (i >= 2) vs(i - 2).orNull else null, // lg
        // ld: the default fires only past the partition END — a NULL
        // value inside the partition stays NULL
        if (i + 1 < n) vs(i + 1).orNull else 99L,
        if (run.isEmpty) null else run.sum, // rsum
        if (run.isEmpty) null else run.min,
        if (run.isEmpty) null else run.max,
        if (run.isEmpty) null else run.sum.toDouble / run.length, // ravg
        (i + 1).toLong, // rcnt
        if (slide.isEmpty) null else slide.sum,
        if (slide.isEmpty) null else slide.min,
        if (slide.isEmpty) null else slide.max,
        if (slide.isEmpty) null else slide.sum.toDouble / slide.length,
        math.min(i + 1, 4).toLong, // scnt
        vs.head.orNull, // fv: FIRST ROW's value
        nonNullUpTo.headOption.orNull, // fvn
        nonNullUpTo.lastOption.orNull, // lvn
        v.orNull, // lv_id
        vs.flatten.lastOption.orNull, // lv_full
        // RANGE (peer) aggregates: over all rows with key <= current g
        {
          val pv = sorted.filter(_._2 <= g).flatMap(_._3)
          if (pv.isEmpty) null else pv.sum
        }, // gsum
        sorted.count(_._2 <= g).toLong, // gcnt
        {
          val pv = sorted.filter(_._2 <= g).flatMap(_._3)
          if (pv.isEmpty) null else pv.min
        }, // gmin
        {
          val pv = sorted.filter(_._2 <= g).flatMap(_._3)
          if (pv.isEmpty) null else pv.max
        }, // gmax
        {
          val pv = sorted.filter(_._2 <= g).flatMap(_._3)
          if (pv.isEmpty) null else pv.sum.toDouble / pv.length
        }, // gavg
        if (g % 2 == 0) null else g * 10 + 1, // glv: w of the current run
        // gfvn / glvn: first / last non-null w over keys <= g — i.e.
        // the smallest / largest ODD g present in the prefix
        sorted.map(_._2).filter(x => x <= g && x % 2 == 1).headOption
          .map(_ * 10 + 1).orNull,
        sorted.map(_._2).filter(x => x <= g && x % 2 == 1).lastOption
          .map(_ * 10 + 1).orNull,
        // csum/cavg over [i-2, i+3] clipped; fcnt over [i+2, i+4];
        // pmax over [i-5, i-2] (possibly EMPTY frames)
        { val w = vs.slice(math.max(0, i - 2), math.min(n, i + 4)).flatten
          if (w.isEmpty) null else w.sum },
        { val w = vs.slice(math.max(0, i - 2), math.min(n, i + 4)).flatten
          if (w.isEmpty) null else w.sum.toDouble / w.length },
        math.max(0, math.min(n - 1, i + 4) - (i + 2) + 1).toLong,
        { val w = vs.slice(math.max(0, i - 5), math.max(0, i - 1)).flatten
          if (w.isEmpty) null else w.max },
        // n3: the 3rd ROW's value, visible once the frame holds 3 rows
        if (i + 1 >= 3) vs(2).orNull else null,
        // n4i: the 4th NON-NULL value, visible once 4 are in frame
        { val nn = vs.take(i + 1).flatten
          if (nn.length >= 4) nn(3) else null },
        // gn2: the 2nd total-order row's w, visible once the peer
        // prefix holds 2 rows
        if (sorted.count(_._2 <= g) >= 2) {
          val g2 = sorted(1)._2
          if (g2 % 2 == 0) null else g2 * 10 + 1
        } else null
      ) -> k
    }.map { case (vals, k) => k -> vals }.toMap
  }

  private def check(seed: Int, n: Int): Unit = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    val ks = rnd.shuffle((0L until n.toLong).toVector)
    val rows = ks.map { k =>
      val g = rnd.nextInt(5).toLong
      val v = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(101).toLong)
      (k, g, v)
    }
    rows.toDF("k", "g", "v").repartition(6)
      .selectExpr("k", "g", "v",
        "CASE WHEN g % 2 = 0 THEN NULL ELSE g * 10 + 1 END AS w")
      .createOrReplaceTempView(s"fz_$seed")
    val q = spark.sql(
      s"SELECT k, ${windowCols.mkString(",\n")} FROM fz_$seed ORDER BY k")
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Window "),
      s"seed=$seed: some family fell back to a single-partition Window:\n$p")
    val expected = oracle(rows)
    val got = q.collect()
    assert(got.length == n)
    got.foreach { r =>
      val k = r.getLong(0)
      val actual = (1 until r.length).map(r.get).toVector
      assert(actual == expected(k),
        s"seed=$seed k=$k:\nrewritten: $actual\noracle:    ${expected(k)}")
    }
  }

  test("rewritten window family equals a sequential oracle (3 seeds)") {
    check(seed = 1, n = 257)
    check(seed = 2, n = 64)
    // fewer rows than shuffle partitions: empty/short range partitions
    // exercise the hand-off surplus-forwarding paths
    check(seed = 3, n = 5)
  }
}
