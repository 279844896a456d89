package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DistributedRank

/** The two-pass range-partitioned row number must equal the plain
  * global window on a genuinely multi-partition frame — including ties,
  * where both forms assign SOME valid order (compared as sets of
  * (key, rank) consistency properties, and exactly on unique keys). */
class DistributedRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("distributed-rank-spec")
      .config("spark.sql.shuffle.partitions", "7") // odd: uneven ranges
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("unique keys: identical to the global window, multi-partition plan") {
    val df = spark.range(0, 10000, 1, 8)
      .selectExpr("pmod(id * 2654435761, 100003) AS k", "id AS payload")
      .filter("true")
    val ranked = DistributedRank.withRowNumber(df, Seq(col("k")), "rn")
    assert(ranked.rdd.getNumPartitions > 1,
      "the whole point is NOT funneling through one partition")
    val window = df.withColumn("rn",
      row_number().over(Window.orderBy(col("k"))).cast("long"))
    assert(ranked.orderBy("rn").collect().toSeq ==
      window.orderBy("rn").collect().toSeq)
  }

  test("ties: a permutation of a valid numbering (dense, 1-based, ordered)") {
    val df = spark.range(0, 5000, 1, 8).selectExpr("id % 50 AS k", "id AS payload")
    val ranked = DistributedRank.withRowNumber(df, Seq(col("k")), "rn").cache()
    val rows = ranked.select("k", "rn").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).sorted.toSeq == (1L to 5000L), "ranks must be a dense 1..n")
    // order respects the key: any rank assigned to key a < key b pair is ordered
    val byRank = rows.sortBy(_._2).map(_._1)
    assert(byRank.toSeq == byRank.sorted.toSeq, "rank order must follow key order")
    ranked.unpersist()
  }

  test("stays inside Tungsten: no RDD round-trip, range exchange sampled once") {
    val df = spark.range(0, 2000, 1, 4).selectExpr("id % 97 AS k", "id AS payload")
    val ranked = DistributedRank.withRowNumber(df, Seq(col("k")), "rn")
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("Scan ExistingRDD"),
      s"numbering must not leave Tungsten via an RDD round-trip:\n$plan")
    assert(plan.contains("GlobalRowNumber"),
      s"expected the whole-operator physical node:\n$plan")
    // Both passes must observe ONE sampled range partitioning: exactly
    // one range exchange may exist, and nothing above it may reshuffle
    // (a second exchange would mean independently sampled bounds — the
    // corruption the custom operator exists to prevent).
    val exchanges = "rangepartitioning".r.findAllIn(plan.toLowerCase).size
    assert(exchanges == 1, s"expected exactly one range exchange, got $exchanges:\n$plan")
  }

  test("wide rows: a fat text payload rides the range shuffle unchanged") {
    // documents-shaped frame: rank by a narrow key while a ~2 KB string
    // column rides along — the two-pass shape must stay correct (and
    // the payload must arrive intact) when the shuffled rows are wide.
    // (Rank-then-join-back would only pay if THIS shape regressed.)
    val df = spark.range(0, 2000, 1, 8)
      .selectExpr(
        "pmod(id * 2654435761, 99991) AS k",
        "repeat(concat('doc-', CAST(id AS STRING), '-'), 400) AS text")
    val ranked = DistributedRank.withRowNumber(df, Seq(col("k")), "rn")
    val got = ranked.select("k", "text", "rn").collect()
    assert(got.length == 2000)
    // 'doc-<id>-' is ≥6 chars × 400 repeats ⇒ every payload ≥2400 chars
    assert(got.forall(r => r.getString(1).length >= 2400), "payload truncated?")
    val expected = df.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).zipWithIndex
      .map { case ((k, t), i) => (k, t, i + 1L) }.toSeq
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._3).toSeq == expected)
  }

  test("multi-column order and custom partition count") {
    val df = spark.range(0, 3000, 1, 6)
      .selectExpr("id % 10 AS a", "pmod(id * 7, 3001) AS b")
    val ranked = DistributedRank.withRowNumber(
      df, Seq(col("a"), col("b").desc), "rn", numPartitions = 5)
    val window = df.withColumn("rn",
      row_number().over(Window.orderBy(col("a"), col("b").desc)).cast("long"))
    assert(ranked.orderBy("rn").collect().toSeq ==
      window.orderBy("rn").collect().toSeq)
  }
}
