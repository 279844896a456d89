package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins: two fls tables hive-partitioned on the
  * same key, joined on that key with `spark.sql.sources.v2.bucketing
  * .enabled`, must plan WITHOUT a shuffle on either side (the scan
  * reports KeyGroupedPartitioning and every split carries its partition
  * key) — and must return exactly the rows the shuffled plan returns. */
class FlsSpjSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-spj").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-spj-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private lazy val dirs: (String, String) = {
    val docs = spark.range(0, 4000, 1, 4).selectExpr(
      "id AS doc_id",
      "CASE id % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'es' " +
        "WHEN 3 THEN 'fr' ELSE 'zh' END AS lang",
      "id * 37 % 997 AS score")
    val a = s"$tmp/docs"; val b = s"$tmp/stats"
    docs.write.format("fls").option("partition_by", "lang")
      .mode("overwrite").save(a)
    docs.groupBy("lang").agg(count(lit(1)).as("n"), sum("score").as("s"))
      .write.format("fls").option("partition_by", "lang")
      .mode("overwrite").save(b)
    (a, b)
  }

  private def joined() = {
    val (a, b) = dirs
    spark.read.format("fls").load(a)
      .join(spark.read.format("fls").load(b), Seq("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("rows"), max("n").as("n"), max("s").as("s"))
  }

  test("co-partitioned fls join plans with zero shuffles when SPJ is on") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val df = joined()
      val plan = df.queryExecution.executedPlan.toString
      val joinRegion = plan.split("HashAggregate").head // ignore the final agg's own exchange
      // the JOIN itself must be exchange-free: no shuffle between the
      // two scans and the SortMergeJoin/ShuffledHashJoin
      val joinPlan = df.queryExecution.executedPlan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joinPlan.nonEmpty, s"no join in plan:\n$plan")
      val shufflesUnderJoin = joinPlan.get.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shufflesUnderJoin.isEmpty,
        s"SPJ active but the join still shuffles:\n$plan\n(region: $joinRegion)")
      assert(df.collect().length == 5)
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  test("same join shuffles without SPJ and returns identical rows") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    val off = joined().orderBy("lang").collect().toSeq
    val shuffled = joined().queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffled.nonEmpty, "negative control: bucketing off must shuffle")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val on = joined().orderBy("lang").collect().toSeq
      assert(on == off, s"SPJ changed the answer:\nSPJ=$on\nshuffled=$off")
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  test("partition pruning and SPJ compose: filtered key subset still exact") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val (a, b) = dirs
      val df = spark.read.format("fls").load(a).filter(col("lang").isin("de", "zh"))
        .join(spark.read.format("fls").load(b), Seq("lang"))
        .groupBy("lang").agg(count(lit(1)).as("rows"))
        .orderBy("lang")
      val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == Seq(("de", 800L), ("zh", 800L)), s"got $got")
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }
}
