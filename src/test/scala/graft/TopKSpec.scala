package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKByScore

/** The k-bounded top-k aggregator vs the window-sort it replaces. */
class TopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("reduce/merge keep exactly the k best, ordered (score desc, id asc)") {
    val agg = new TopKByScore[(Long, Long, Double)](3, t => (t._2, t._3))
    val fed = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.1),
      (1L, 13L, 0.9), (1L, 14L, 0.7), (1L, 15L, 0.9))
      .foldLeft(agg.zero)(agg.reduce)
    assert(fed == Vector((11L, 0.9), (13L, 0.9), (15L, 0.9)))
    val other = Seq((1L, 2L, 0.95), (1L, 3L, 0.9)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(fed, other) == Vector((2L, 0.95), (3L, 0.9), (11L, 0.9)))
    assert(agg.merge(other, fed) == Vector((2L, 0.95), (3L, 0.9), (11L, 0.9)))
    assert(agg.merge(agg.zero, fed) == fed)
  }

  test("NaN scores rank first, matching Spark's window sort and the SQL oracle") {
    val agg = new TopKByScore[(Long, Long, Double)](3, t => (t._2, t._3))
    val fed = Seq((1L, 10L, 0.9), (1L, 11L, Double.NaN), (1L, 12L, 0.5),
      (1L, 13L, Double.PositiveInfinity), (1L, 14L, Double.NaN))
      .foldLeft(agg.zero)(agg.reduce)
    assert(fed.map(_._1) == Vector(11L, 14L, 13L)) // NaNs, then +inf
    assert(agg.merge(agg.zero, fed) == fed)
    // -0.0 orders below 0.0, like Spark's sort
    val z = Seq((1L, 20L, 0.0), (1L, 21L, -0.0)).foldLeft(agg.zero)(agg.reduce)
    assert(z.map(_._1) == Vector(20L, 21L))
  }

  test("matches row_number window top-k across many groups and partitions") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0 until 5000).map { i =>
      (rng.nextInt(40).toLong, i.toLong, math.rint(rng.nextDouble() * 100) / 100)
    }
    val df = rows.toDF("g", "id", "score").repartition(8)
    val viaAgg = df.as[(Long, Long, Double)]
      .groupByKey(_._1).agg(new TopKByScore[(Long, Long, Double)](5, t => (t._2, t._3)).toColumn.name("top"))
      .toDF("g", "top")
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("col._1").as("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).select(col("g"), col("rank").cast("int"), col("id"))
    assert(viaAgg.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaAgg).count() == 0)
  }
}
