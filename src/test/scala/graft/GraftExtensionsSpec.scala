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
