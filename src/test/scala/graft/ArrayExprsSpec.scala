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

  test("PackCodes round-trips code arrays to M bytes and refuses " +
      "out-of-range codes loudly") {
    val df = spark.range(0, 300).toDF("id")
      .withColumn("cs", expr(
        "transform(sequence(0, 7), i -> CAST((id * 31 + i * 7) % 256 AS INT))"))
      .withColumn("packed", GraftFunctions.packCodes(col("cs")))
    val rows = df.select("cs", "packed").collect()
    assert(rows.forall { r =>
      val cs = r.getSeq[Int](0)
      val b = r.getAs[Array[Byte]](1)
      b.length == 8 && cs.indices.forall(i => (b(i) & 0xFF) == cs(i))
    })
    val bad = spark.range(0, 1).toDF("id")
      .withColumn("cs", expr("array(CAST(256 AS INT))"))
      .withColumn("packed", GraftFunctions.packCodes(col("cs")))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage != null)
  }

  test("AdcFromCodes is BIT-IDENTICAL to reconstructing rv from the " +
      "codebook and taking the full sequential dot (the q124 oracle's " +
      "arithmetic); the anchored variant matches zip_with add-back") {
    val m = 8; val dsub = 8; val k = 16
    // deterministic codebook: entry (mm, code) component i
    val cb = Array.tabulate(m)(mm => Array.tabulate(k)(code =>
      Array.tabulate(dsub)(i =>
        math.sin(mm * 131 + code * 17 + i * 3 + 0.25) / 2)))
    val bc = spark.sparkContext.broadcast(cb)
    val df = spark.range(0, 400).toDF("id")
      .withColumn("uq", expr(
        "transform(sequence(0, 63), i -> sin(id * 7 + i) / 8)"))
      .withColumn("cs", expr(
        s"transform(sequence(0, 7), i -> CAST((id * 13 + i * 5) % $k AS INT))"))
      .withColumn("codes", GraftFunctions.packCodes(col("cs")))
      .withColumn("anchor", expr(
        "transform(sequence(0, 63), i -> cos(id * 3 + i) / 16)"))
    // CODEGEN_ONLY: a Janino failure in the generated kernel must FAIL
    // here, never silently fall back to the interpreted path
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val rows =
      try df.select(col("uq"), col("cs"), col("anchor"),
        GraftFunctions.adcScore(col("uq"), col("codes"), bc).as("adc"),
        GraftFunctions.adcScoreAnchored(col("uq"), col("codes"),
          col("anchor"), bc).as("adcA")).collect()
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(rows.length == 400)
    rows.foreach { r =>
      val uq = r.getSeq[Double](0).toArray
      val cs = r.getSeq[Int](1)
      val anc = r.getSeq[Double](2).toArray
      val rv = cs.zipWithIndex.flatMap { case (c, mm) => cb(mm)(c) }.toArray
      var want = 0.0
      var i = 0
      while (i < 64) { want += uq(i) * rv(i); i += 1 }
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(want),
        s"adc diverged from the reconstruction dot: ${r.getDouble(3)} vs $want")
      var wantA = 0.0
      i = 0
      while (i < 64) { wantA += uq(i) * (rv(i) + anc(i)); i += 1 }
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(wantA),
        "anchored adc diverged from the add-back dot")
    }
  }
}
