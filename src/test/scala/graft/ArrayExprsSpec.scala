package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftexprs.GraftFunctions
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Native Expression kernels vs their builtin-composed equivalents. */
class ArrayExprsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("ArrayDotProduct matches zip_with+aggregate (codegen and interpreted)") {
    val df = spark.range(0, 500).toDF("id")
      .withColumn("a", expr("transform(sequence(0, 63), i -> CAST(id * i AS DOUBLE) / 7)"))
      .withColumn("b", expr("transform(sequence(0, 63), i -> CAST(id + i AS DOUBLE) / 3)"))
    val got = df.withColumn("dot", GraftFunctions.arrayDot(col("a"), col("b")))
      .withColumn("want",
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"))
    assert(got.filter(col("dot") =!= col("want")).count() == 0)
  }

  test("ArrayDotProduct is NULL on length mismatch, like the HOF it replaces") {
    val df = spark.range(0, 10).toDF("id")
      .withColumn("a", expr("transform(sequence(0, 7), i -> CAST(id + i AS DOUBLE))"))
      .withColumn("b", expr(
        "CASE WHEN id % 3 = 0 THEN transform(sequence(0, 5), i -> CAST(i AS DOUBLE)) " +
          "ELSE transform(sequence(0, 7), i -> CAST(i AS DOUBLE)) END"))
      .withColumn("dot", GraftFunctions.arrayDot(col("a"), col("b")))
    assert(df.filter(col("dot").isNull).count() == 4)   // ids 0,3,6,9
    assert(df.filter(col("dot").isNotNull).count() == 6)
  }

  test("SortedIntersectCount matches array_intersect size on sorted inputs") {
    val df = spark.range(0, 300).toDF("id")
      .withColumn("a", expr(
        "array_sort(array_distinct(transform(sequence(0, 20), i -> concat('t', CAST((id * 7 + i * 3) % 40 AS STRING)))))"))
      .withColumn("b", expr(
        "array_sort(array_distinct(transform(sequence(0, 15), i -> concat('t', CAST((id * 5 + i * 2) % 40 AS STRING)))))"))
    val got = df
      .withColumn("n", GraftFunctions.sortedIntersectCount(col("a"), col("b")))
      .withColumn("want", expr("size(array_intersect(a, b))"))
    assert(got.filter(col("n") =!= col("want")).count() == 0)
  }
}
