package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DistributedPrefixSum

/** The two-pass range-partitioned running sum must equal the plain
  * global window cumsum on a genuinely multi-partition frame — the sum
  * crossing every partition boundary is exactly what the per-partition
  * offset pass must get right. */
class DistributedPrefixSumSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("distributed-prefix-sum-spec")
      .config("spark.sql.shuffle.partitions", "7") // odd: uneven ranges
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("unique keys: identical to the global window cumsum, multi-partition") {
    val df = spark.range(0, 10000, 1, 8)
      .selectExpr("pmod(id * 2654435761, 100003) AS k",
        "pmod(id * 31, 997) AS v")
      .filter("true")
    val summed = DistributedPrefixSum.withRunningSum(df, Seq(col("k")), "v", "cum")
    assert(summed.rdd.getNumPartitions > 1,
      "the whole point is NOT funneling through one partition")
    val window = df.withColumn("cum", sum("v").over(
      Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)))
    assert(summed.orderBy("k").collect().toSeq ==
      window.orderBy("k").collect().toSeq)
  }

  test("stays inside Tungsten: whole-operator node, one range exchange") {
    val df = spark.range(0, 2000, 1, 4)
      .selectExpr("id AS k", "id % 13 AS v")
    val summed = DistributedPrefixSum.withRunningSum(df, Seq(col("k")), "v", "cum")
    val plan = summed.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("Scan ExistingRDD"),
      s"running sum must not leave Tungsten via an RDD round-trip:\n$plan")
    assert(plan.contains("GlobalRunningSum"),
      s"expected the whole-operator physical node:\n$plan")
    val exchanges = "rangepartitioning".r.findAllIn(plan.toLowerCase).size
    assert(exchanges == 1, s"expected exactly one range exchange, got $exchanges:\n$plan")
  }

  test("total equals the plain aggregate; empty input yields empty output") {
    val df = spark.range(0, 5000, 1, 8).selectExpr("id AS k", "id % 7 AS v")
    val summed = DistributedPrefixSum.withRunningSum(df, Seq(col("k")), "v", "cum")
    val lastCum = summed.orderBy(col("k").desc).limit(1)
      .collect().head.getAs[Long]("cum")
    val total = df.agg(sum("v")).collect().head.getLong(0)
    assert(lastCum == total)
    val empty = DistributedPrefixSum.withRunningSum(
      df.filter("v > 100"), Seq(col("k")), "v", "cum")
    assert(empty.count() == 0L)
  }

  test("non-long value columns are rejected loudly") {
    val df = spark.range(0, 10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val e = intercept[IllegalArgumentException] {
      DistributedPrefixSum.withRunningSum(df, Seq(col("k")), "v", "cum").collect()
    }
    assert(e.getMessage.contains("LONG"), e.getMessage)
  }
}
