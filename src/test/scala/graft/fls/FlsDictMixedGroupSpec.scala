package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Regression: with `string_dictionary=true`, a packed split reuses one
  * OnHeapColumnVector across row groups, and WritableColumnVector.reset()
  * does NOT clear an installed dictionary. A dict-encoded group followed
  * by a plain/FSST-encoded group for the same column must not serve the
  * previous group's dictionary (stale values). The writer picks encodings
  * per row group by cost, so a file whose first group is low-cardinality
  * (dict wins) and whose second is unique strings (FSST/plain wins)
  * exercises exactly the dict→plain transition inside one split. */
class FlsDictMixedGroupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-dictmix").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("fls-dict-mixed-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def mixedFrame(n: Int) = {
    // rows [0,n): 5 distinct values → dictionary encoding wins;
    // rows [n,2n): unique long strings → FSST/plain wins
    spark.range(0, 2L * n, 1, 1).selectExpr(
      "id",
      s"""CASE WHEN id < $n THEN concat('common-', id % 5)
          ELSE concat('unique-string-', id, '-', id * 2654435761 % 1000003)
          END AS s""")
  }

  test("dict group then plain group in one packed split reads exact values") {
    // pack everything into one split so one reader serves both groups
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    val n = 1024 // = one row group per phase with row_group_size=1024
    val dir = s"$tmp/mixed"
    val df = mixedFrame(n)
    df.write.format("fls").mode("overwrite")
      .option("row_group_size", n).save(dir)

    // both row groups must land in ONE split so the reader reuses vectors
    val back = spark.read.format("fls")
      .option("string_dictionary", "true").load(dir)
    assert(back.rdd.getNumPartitions == 1,
      "precondition: the two row groups must pack into a single split")

    val exp = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 2 * n)
    val bad = exp.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(bad.isEmpty,
      s"stale-dictionary corruption on ${bad.size} rows, first: ${bad.take(3)}")
  }

  test("plain group then dict group (reverse order) also exact") {
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    val n = 1024
    val dir = s"$tmp/mixed-rev"
    val df = spark.range(0, 2L * n, 1, 1).selectExpr(
      "id",
      s"""CASE WHEN id >= $n THEN concat('common-', id % 5)
          ELSE concat('unique-string-', id, '-', id * 2654435761 % 1000003)
          END AS s""")
    df.write.format("fls").mode("overwrite")
      .option("row_group_size", n).save(dir)
    val back = spark.read.format("fls")
      .option("string_dictionary", "true").load(dir)
    val exp = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bad = exp.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(bad.isEmpty, s"mismatch on ${bad.size} rows, first: ${bad.take(3)}")
  }

  test("alternating dict/plain groups across a 4-group split are exact") {
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    val n = 1024
    val dir = s"$tmp/mixed-alt"
    val df = spark.range(0, 4L * n, 1, 1).selectExpr(
      "id",
      s"""CASE WHEN (id DIV $n) % 2 = 0 THEN concat('common-', id % 3)
          ELSE concat('unique-string-', id, '-', id * 2654435761 % 1000003)
          END AS s""")
    df.write.format("fls").mode("overwrite")
      .option("row_group_size", n).save(dir)
    val back = spark.read.format("fls")
      .option("string_dictionary", "true").load(dir)
    val exp = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bad = exp.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(bad.isEmpty, s"mismatch on ${bad.size} rows, first: ${bad.take(3)}")
  }

  test("size-adaptive auto mode (threshold crossed) equals both forced modes") {
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    val n = 1024
    val dir = s"$tmp/auto"
    val df = mixedFrame(n)
    df.write.format("fls").mode("overwrite")
      .option("row_group_size", n).save(dir)
    val exp = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // auto with a lowered threshold => the 2n-row split serves the
    // dictionary path; auto with a huge threshold => eager; both exact
    for (thr <- Seq("128", s"${10 * n}")) {
      val got = spark.read.format("fls")
        .option("string_dictionary_auto_rows", thr).load(dir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val bad = exp.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
      assert(bad.isEmpty, s"auto(thr=$thr) mismatch: ${bad.take(3)}")
    }
  }
}
