package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** MAP<scalar, scalar> materialization: offsets + flattened key stream
  * + value stream, each through the normal scalar codec cascade (the
  * same physical layout as LIST with two element streams). Completes
  * the declared nested type surface — LIST, STRUCT, and MAP are all
  * materialized now. */
class FlsMapSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-map-spec").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-map-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Order-insensitive value-exact comparison (set ops can't take maps). */
  private def entries(df: DataFrame, mapCols: String*): DataFrame =
    df.select(df.columns.map { c =>
      if (mapCols.contains(c)) sort_array(map_entries(col(c))).as(c) else col(c)
    }.toIndexedSeq: _*)

  private def assertSame(a: DataFrame, b: DataFrame, mapCols: String*): Unit = {
    val ca = entries(a, mapCols: _*)
    val cb = entries(b, mapCols: _*)
    assert(ca.exceptAll(cb).count() == 0 && cb.exceptAll(ca).count() == 0, "datasets differ")
  }

  test("map<string,bigint> round-trips across row groups, empties included") {
    val df = spark.range(0, 10000).toDF("id")
      .selectExpr("id",
        """CASE WHEN id % 5 = 0 THEN map()
           ELSE map(concat('k', id % 3), id * 2, 'fixed', id % 17) END AS m""")
    val dir = s"$tmp/rt"
    df.coalesce(1).write.format("fls")
      .option("row_group_size", 2048).mode("overwrite").save(dir)
    val back = spark.read.format("fls").load(dir)
    assert(back.schema("m").dataType ==
      MapType(StringType, LongType, valueContainsNull = false))
    assertSame(df, back, "m")
  }

  test("map value/key type families round-trip (doubles, floats-as-raw-bits, timestamps)") {
    for ((name, expr) <- Seq(
      "m_dbl" -> "map(id, CAST(id AS DOUBLE) / 7)",
      "m_float" -> "map(CAST(id AS FLOAT), CAST(id % 9 AS FLOAT))",
      "m_ts" -> "map(concat('t', id % 4), timestamp_micros(id * 1000000))",
      "m_str_str" -> "map(concat('k', id), concat('v', id % 11))")) {
      val df = spark.range(1, 2049).toDF("id").selectExpr("id", s"$expr AS m")
      val dir = s"$tmp/$name"
      df.write.format("fls").mode("overwrite").save(dir)
      assertSame(df, spark.read.format("fls").load(dir), "m")
    }
  }

  test("NULL map value is rejected; map access and element_at work") {
    val bad = spark.range(0, 10).toDF("id")
      .selectExpr("id", "map('k', IF(id = 5, NULL, id)) AS m")
    val e = intercept[Exception] {
      bad.write.format("fls").mode("overwrite").save(s"$tmp/null_v")
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("NULL value in map"))

    val dir = s"$tmp/access"
    spark.range(0, 1000).toDF("id")
      .selectExpr("id", "map('a', id, 'b', id * 3) AS m")
      .write.format("fls").mode("overwrite").save(dir)
    val got = spark.read.format("fls").load(dir)
      .select(col("id"), element_at(col("m"), "b").as("b"))
      .agg(sum("b")).collect()(0).getLong(0)
    assert(got == (0L until 1000L).map(_ * 3).sum)
  }

  test("entry-count stats power the virtual <col>_size column for maps") {
    val dir = s"$tmp/size"
    spark.range(0, 4096).toDF("id")
      .selectExpr("id",
        "CASE WHEN id < 2048 THEN map('a', id) ELSE map('a', id, 'b', id) END AS m")
      .orderBy("id").coalesce(1)
      .write.format("fls").option("row_group_size", 1024).mode("overwrite").save(dir)
    val back = spark.read.format("fls").option("array_size", "m").load(dir)
    assert(back.filter(col("m_size") === 2L).count() == 2048)
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.fls.connector.{FlsDataSource, FlsScanBuilder}
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("path", dir, "array_size", "m"))
    val schema = new FlsDataSource().inferSchema(opts)
    val b = new FlsScanBuilder(schema, opts)
    b.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("m_size", 2L)))
    spark.conf.set("spark.sql.files.openCostInBytes", "134217728")
    try assert(b.build().toBatch.planInputPartitions().length == 2,
      "entry-count stats must prune half the row groups")
    finally spark.conf.unset("spark.sql.files.openCostInBytes")
  }

  test("maps compose with partitioned manifest writes and SQL DDL") {
    val dir = s"$tmp/part"
    spark.range(0, 300).toDF("id")
      .selectExpr("id", "map('v', id) AS m", "CAST(id % 3 AS STRING) AS p")
      .repartition(col("p"))
      .write.format("fls").mode("overwrite")
      .option("partition_by", "p").option("commit_mode", "manifest").save(dir)
    val back = spark.read.format("fls").load(dir)
    assert(back.filter(col("p") === "1")
      .select(element_at(col("m"), "v").as("v"))
      .agg(sum("v")).collect()(0).getLong(0) == (0 until 300).filter(_ % 3 == 1).sum)

    val dir2 = s"$tmp/sql"
    spark.sql("DROP TABLE IF EXISTS fls_map_t")
    spark.sql(
      s"""CREATE TABLE fls_map_t (id BIGINT, m MAP<STRING, BIGINT>)
         USING fls LOCATION '$dir2'""")
    spark.sql("INSERT INTO fls_map_t SELECT id, map('x', id * 5) FROM range(0, 50)")
    assert(spark.sql("SELECT sum(m['x']) FROM fls_map_t").collect()(0).getLong(0) ==
      (0L until 50L).map(_ * 5).sum)
    spark.sql("DROP TABLE fls_map_t")
  }
}
