package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The no-NULLs error contract at every nesting level: a null value
  * anywhere (top-level scalar, top-level struct/map/array value, struct
  * field, array element, map value) must surface as the standard
  * UnsupportedOperationException naming the column — never a bare
  * NullPointerException from builder internals. */
class FlsNullNestedSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-nullnested").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("fls-null-nested-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def expectNoNulls(expr: String, colName: String): Unit = {
    val dir = s"$tmp/${colName.replace('.', '_')}-${expr.hashCode.toHexString}"
    val df = spark.range(0, 10, 1, 1).selectExpr("id", s"$expr AS $colName")
    val e = intercept[Exception] {
      df.write.format("fls").mode("overwrite").save(dir)
    }
    // Spark wraps task failures; walk causes for our contract message
    var t: Throwable = e
    var found = false
    while (t != null && !found) {
      found = t.isInstanceOf[UnsupportedOperationException] &&
        t.getMessage != null && t.getMessage.contains("stores no NULLs") &&
        t.getMessage.contains(colName.split('.').head)
      t = t.getCause
    }
    assert(found,
      s"expected the standard no-NULLs error naming '$colName', got: $e")
  }

  test("null top-level struct value") {
    expectNoNulls("IF(id = 5, CAST(NULL AS STRUCT<a: BIGINT>), named_struct('a', id))", "s")
  }

  test("null top-level array value") {
    expectNoNulls("IF(id = 5, CAST(NULL AS ARRAY<BIGINT>), array(id))", "arr")
  }

  test("null top-level map value") {
    expectNoNulls("IF(id = 5, CAST(NULL AS MAP<STRING, BIGINT>), map('k', id))", "m")
  }

  test("null struct field") {
    expectNoNulls(
      "named_struct('a', IF(id = 5, CAST(NULL AS BIGINT), id))", "s")
  }

  test("null array element") {
    expectNoNulls("array(IF(id = 5, CAST(NULL AS BIGINT), id))", "arr")
  }

  test("null map value") {
    expectNoNulls("map('k', IF(id = 5, CAST(NULL AS BIGINT), id))", "m")
  }

  test("null top-level scalar") {
    expectNoNulls("IF(id = 5, CAST(NULL AS BIGINT), id)", "v")
  }
}
