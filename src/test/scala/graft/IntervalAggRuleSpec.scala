package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftplans.RewriteIntervalAggJoins
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[RewriteIntervalAggJoins]]: count/sum aggregates directly over a
  * fixed-offset interval join plan as the pair-free sweep line. Ground
  * truth is the SAME query with the rule disabled (the sibling
  * bucketed-join rule then executes the pair plan). */
class IntervalAggRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def probes(seed: Long, n: Int): DataFrame = {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val p = if (rnd.nextInt(12) == 0) None else Some(rnd.between(-150L, 150L))
      (i.toLong, p, rnd.between(0, 3)) // grp: several probe rows per group
    }.toDF("pid", "p", "grp")
  }

  private def carriers(seed: Long, n: Int): DataFrame = {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val c = if (rnd.nextInt(12) == 0) None else Some(rnd.between(-170L, 170L))
      val v = if (rnd.nextInt(5) == 0) None else Some(rnd.between(-100L, 100L))
      (c, v)
    }.toDF("c", "v")
  }

  private def offOn[T](q: => DataFrame): (Set[String], Set[String], String) = {
    spark.conf.set(RewriteIntervalAggJoins.EnabledConf, "false")
    val want = try q.collect().map(_.toString).toSet
    finally spark.conf.set(RewriteIntervalAggJoins.EnabledConf, "true")
    val df = q
    (want, df.collect().map(_.toString).toSet,
      df.queryExecution.executedPlan.toString)
  }

  test("fires on join+agg band shapes and matches the pair plan: " +
      "inclusive, strict, reversed operands, shifted and empty bands") {
    val s = probes(11L, 160)
    val e = carriers(12L, 400)
    val shapes: Seq[(DataFrame, DataFrame) => org.apache.spark.sql.Column] = Seq(
      (s, e) => e("c") >= s("p") - 30L && e("c") <= s("p") + 20L,
      (s, e) => s("p") - 30L < e("c") && e("c") < s("p") + 20L,
      (s, e) => e("c") + 5L >= s("p") && s("p") + 20L >= e("c"),
      (s, e) => e("c") >= s("p") + 10L && e("c") <= s("p") + 40L, // shifted
      (s, e) => e("c") >= s("p") + 10L && e("c") <= s("p") - 10L) // empty
    for ((mk, i) <- shapes.zipWithIndex) {
      def q = s.join(e, mk(s, e))
        .groupBy("grp")
        .agg(count(lit(1)).as("pairs"), count(col("v")).as("nn"),
          sum(col("v")).as("sv"))
        .orderBy("grp")
      val (want, got, plan) = offOn(q)
      assert(got == want, s"shape $i mismatch")
      assert(plan.contains("GlobalRunningSum"),
        s"shape $i did not lower to the sweep line:\n$plan")
    }
  }

  test("grouping on the RIGHT side swaps the roles and still fires") {
    val s = probes(21L, 120)
    val e = carriers(22L, 300)
    def q = e.join(s, e("c") >= s("p") - 15L && e("c") <= s("p") + 15L)
      .groupBy("pid").agg(count(lit(1)).as("pairs"), sum(col("v")).as("sv"))
      .orderBy("pid")
    val (want, got, plan) = offOn(q)
    assert(got == want)
    assert(plan.contains("GlobalRunningSum"), s"did not fire:\n$plan")
  }

  test("per-probe-row multiplicity: duplicate probe keys in one group " +
      "count their bands once each") {
    val sp = spark
    import sp.implicits._
    val s = Seq((1L, 10L, 0), (2L, 10L, 0), (3L, 40L, 1)).toDF("pid", "p", "grp")
    val e = Seq((8L, Some(5L)), (12L, None), (41L, Some(7L))).toDF("c", "v")
    def q = s.join(e, e("c") >= s("p") - 3L && e("c") <= s("p") + 3L)
      .groupBy("grp").agg(count(lit(1)).as("pairs"), count(col("v")).as("nn"),
        sum(col("v")).as("sv")).orderBy("grp")
    val (want, got, plan) = offOn(q)
    assert(got == want && plan.contains("GlobalRunningSum"))
    // grp 0: two probe rows at p=10, band {8(v=5), 12(v=null)} each =>
    // 4 pairs, nn=2, sv=10; grp 1: {41(v=7)} => 1 pair
    assert(got == Set("[0,4,2,10]", "[1,1,1,7]"))
  }

  test("all-null-value bands keep SQL sum semantics (sum NULL, count>0)") {
    val sp = spark
    import sp.implicits._
    val s = Seq((1L, 10L, 0)).toDF("pid", "p", "grp")
    val e = Seq((9L, None: Option[Long]), (11L, None)).toDF("c", "v")
    def q = s.join(e, e("c") >= s("p") - 3L && e("c") <= s("p") + 3L)
      .groupBy("grp").agg(count(lit(1)).as("pairs"), sum(col("v")).as("sv"))
    val (want, got, plan) = offOn(q)
    assert(got == want && got == Set("[0,2,null]"))
    assert(plan.contains("GlobalRunningSum"))
  }

  test("empty carrier side yields no groups, like the inner join") {
    val sp = spark
    import sp.implicits._
    val s = Seq((1L, 10L, 0)).toDF("pid", "p", "grp")
    val e = Seq.empty[(Long, Option[Long])].toDF("c", "v")
    def q = s.join(e, e("c") >= s("p") - 3L && e("c") <= s("p") + 3L)
      .groupBy("grp").agg(count(lit(1)).as("pairs"))
    val (want, got, _) = offOn(q)
    // (the optimizer folds the empty relation to an empty
    //  LocalTableScan before any join/aggregate survives — the
    //  assertion here is the inner-join SEMANTICS, not the plan)
    assert(got == want && got.isEmpty)
  }

  test("timestamp axes: ts ± INTERVAL band conditions fire and match " +
      "the pair plan (LTZ and NTZ)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(61L)
    val sBase = (0 until 120).map { i =>
      (i.toLong, rnd.between(0L, 4000L), i % 3)
    }.toDF("pid", "sec", "grp")
    val eBase = (0 until 300).map { _ =>
      (rnd.between(0L, 4200L), rnd.between(-40L, 40L))
    }.toDF("sec", "v")
    for (cast <- Seq("timestamp", "timestamp_ntz")) {
      val s = sBase.withColumn("ts",
        col("sec").cast("timestamp").cast(cast)).drop("sec")
      val e = eBase.withColumn("ts",
        col("sec").cast("timestamp").cast(cast)).drop("sec")
      def q = s.join(e,
          s("ts") <= e("ts") + expr("INTERVAL '3' MINUTE") &&
            e("ts") <= s("ts") + expr("INTERVAL '5' MINUTE"))
        .groupBy("grp")
        .agg(count(lit(1)).as("pairs"), sum(e("v")).as("sv"))
        .orderBy("grp")
      val (want, got, plan) = offOn(q)
      assert(got == want, s"$cast mismatch")
      assert(plan.contains("GlobalRunningSum"),
        s"$cast band did not lower to the sweep line:\n$plan")
    }
  }

  test("grouping-only aggregate (DISTINCT probe groups with a match) " +
      "fires too — the shape ColumnPruning leaves of a count() over " +
      "the rule's own output") {
    val s = probes(51L, 140)
    val e = carriers(52L, 350)
    def q = s.join(e, e("c") >= s("p") - 20L && e("c") <= s("p") + 20L)
      .select("grp").distinct().orderBy("grp")
    val (want, got, plan) = offOn(q)
    assert(got == want)
    assert(plan.contains("GlobalRunningSum"), s"distinct did not fire:\n$plan")
    // the count() round trip: re-optimizes from the LOGICAL plan with
    // the aggregate columns pruned — pre-fix this fell back to the
    // pair join (r19: the q130 sweep measured 8.5 s where collect()
    // of the same frame took 0.8 s)
    def qa = s.join(e, e("c") >= s("p") - 20L && e("c") <= s("p") + 20L)
      .groupBy("pid").agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    spark.conf.set(RewriteIntervalAggJoins.EnabledConf, "false")
    val wantN = try qa.count()
    finally spark.conf.set(RewriteIntervalAggJoins.EnabledConf, "true")
    assert(qa.count() == wantN)
  }

  test("the q130 gate fires the rule over the real events table") {
    val df = graft.queries.Joins.q130AutoIntervalAgg(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GlobalRunningSum"),
      s"q130 should plan as the sweep line:\n${p.take(4000)}")
    assert(df.count() > 0)
  }

  test("the q88 gate (decimal money sum) now fires the sweep, and the " +
      "q131 gate (max/min) keeps the bucketed overlap join") {
    val q88 = graft.queries.Joins.q88AutoIntervalOverlap(
      spark, "/root/testdata/sf0.001")
    val p88 = q88.queryExecution.executedPlan.toString
    assert(p88.contains("GlobalRunningSum"),
      s"q88's decimal sum should ride the limb sweep:\n${p88.take(4000)}")
    assert(q88.count() > 0)
    val q131 = graft.queries.Joins.q131IntervalOverlapJoin(
      spark, "/root/testdata/sf0.001")
    val p131 = q131.queryExecution.executedPlan.toString
    assert(!p131.contains("GlobalRunningSum"),
      s"q131's max/min must not sweep:\n${p131.take(4000)}")
    assert(p131.contains("__graft_rj_lb"),
      s"q131 should plan as the bucketed overlap join:\n${p131.take(4000)}")
    assert(q131.count() > 0)
  }

  test("deliberate non-firing: extra conjunct, distinct agg, avg, " +
      "double sum, grouping spanning both sides") {
    val s = probes(31L, 60)
    val e = carriers(32L, 100)
    def band = e("c") >= s("p") - 10L && e("c") <= s("p") + 10L
    val plans = Seq(
      s.join(e, band && s("pid") =!= e("v")) // extra conjunct
        .groupBy("grp").agg(count(lit(1))),
      s.join(e, band).groupBy("grp").agg(countDistinct(col("v"))),
      s.join(e, band).groupBy("grp").agg(avg(col("v"))),
      s.join(e, band).groupBy("grp")
        .agg(sum(col("v").cast("double"))), // not a ring, not a decimal
      s.join(e, band).groupBy(s("grp"), e("v")).agg(count(lit(1))))
    plans.zipWithIndex.foreach { case (df, i) =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("GlobalRunningSum"),
        s"guard $i should have kept the join plan:\n$p")
      df.collect() // and the stock/bucketed plan still runs
    }
  }

  test("decimal sums fire (limb channel) and match the pair plan bit " +
      "for bit: long-backed scales and a wide declaration") {
    val s = probes(41L, 160)
    val e0 = carriers(42L, 400)
    Seq("decimal(20,2)", "decimal(9,3)", "decimal(25,6)").foreach { t =>
      val e = e0.withColumn("dv", (col("v") / 8).cast(t))
      def q = s.join(e, e("c") >= s("p") - 15L && e("c") <= s("p") + 15L)
        .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("dv")).as("sv"),
          count(col("dv")).as("nn"))
      val (want, got, plan) = offOn(q)
      assert(got == want, s"$t mismatch: got $got want $want")
      assert(plan.contains("GlobalRunningSum"), s"$t did not fire:\n$plan")
    }
  }

  test("mixed long + decimal channels ride one sweep together") {
    val s = probes(43L, 120)
    val e = carriers(44L, 300)
      .withColumn("dv", (col("v") / 4).cast("decimal(22,4)"))
    def q = s.join(e, e("c") >= s("p") - 12L && e("c") <= s("p") + 12L)
      .groupBy("grp").agg(sum(col("v")).as("sl"), sum(col("dv")).as("sd"),
        count(lit(1)).as("n"))
    val (want, got, plan) = offOn(q)
    assert(got == want)
    assert(plan.contains("GlobalRunningSum"), s"did not fire:\n$plan")
  }

  test("a >18-digit decimal value aborts loudly instead of riding " +
      "the limbs with dropped bits") {
    val sp = spark
    import sp.implicits._
    val s = Seq((1L, 5L, 0)).toDF("pid", "p", "grp")
    val e = Seq(("1.5"), ("3000000000000.5")) // 3e12 needs > 18 digits at scale 6
      .toDF("raw").select(lit(5L).as("c"),
        col("raw").cast("decimal(25,6)").as("dv"))
    def q = s.join(e, e("c") >= s("p") - 2L && e("c") <= s("p") + 2L)
      .groupBy("grp").agg(sum(col("dv")).as("sv"))
    assert(q.queryExecution.executedPlan.toString.contains("GlobalRunningSum"))
    val ex = intercept[Exception] { q.collect() }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(ex).contains("18 digits"), msgs(ex))
  }

  test("a per-key unscaled sum past 2^60 aborts loudly") {
    val sp = spark
    import sp.implicits._
    val s = Seq((1L, 5L, 0)).toDF("pid", "p", "grp")
    val e = Seq("800000000000.5", "800000000000.5") // 2 x 8e17 unscaled at one key
      .toDF("raw").select(lit(5L).as("c"),
        col("raw").cast("decimal(25,6)").as("dv"))
    def q = s.join(e, e("c") >= s("p") - 2L && e("c") <= s("p") + 2L)
      .groupBy("grp").agg(sum(col("dv")).as("sv"))
    assert(q.queryExecution.executedPlan.toString.contains("GlobalRunningSum"))
    val ex = intercept[Exception] { q.collect() }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(ex).contains("2^60"), msgs(ex))
  }

  test("negative decimal values keep the limb split exact (signed l2)") {
    val sp = spark
    import sp.implicits._
    val s = probes(45L, 80)
    val e = carriers(46L, 200)
      .withColumn("dv", (col("v") - 50L).cast("decimal(18,6)"))
    def q = s.join(e, e("c") >= s("p") - 9L && e("c") <= s("p") + 9L)
      .groupBy("grp").agg(sum(col("dv")).as("sv"), count(col("dv")).as("nn"))
    val (want, got, plan) = offOn(q)
    assert(got == want)
    assert(plan.contains("GlobalRunningSum"), s"did not fire:\n$plan")
  }
}
