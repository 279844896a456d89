package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Seeded end-to-end fuzz: random schemas × random writer options ×
  * random partitioning, written through the real format("fls") surface
  * and read back — the cross-feature interactions (transpose × file
  * rotation × sidecar footers × MCC duplicate columns × row-group
  * boundaries) that single-feature specs cannot cover. */
class FlsFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-fuzz").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-fuzz-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // column generators: (label, SQL expression over id)
  private val colGens: Seq[(String, String)] = Seq(
    "long_seq" -> "id",
    "long_neg" -> "-id * 3 - 1",
    "int_mod" -> "CAST(id % 97 AS INT)",
    "short_c" -> "CAST(id % 11 AS SMALLINT)",
    "bool_c" -> "id % 2 = 0",
    "double_dec" -> "CAST(id AS DOUBLE) / 4",
    "double_real" -> "sin(CAST(id AS DOUBLE)) * 1e9",
    "float_c" -> "CAST(id AS FLOAT) / 8",
    "dec_small" -> "CAST(id AS DECIMAL(10,2)) / 3",
    "dec_big" -> "CAST(id AS DECIMAL(30,6)) * 1234567",
    "str_low" -> "concat('v', id % 7)",
    "str_high" -> "concat('uniq-', id, '-', id * 2654435761 % 1000003)",
    "str_dom" -> "CASE WHEN id % 50 = 0 THEN concat('rare', id) ELSE 'dominant-value' END",
    "str_runs" -> "concat('run', id DIV 100)",
    "bin_c" -> "CAST(concat('b', id % 13) AS BINARY)",
    "date_c" -> "date_add(DATE'2020-01-01', CAST(id % 1000 AS INT))",
    "ts_c" -> "timestamp_micros(id * 1000000)",
    "arr_c" -> "array(CAST(id AS FLOAT), CAST(id % 5 AS FLOAT))",
    "arr_var" -> "array_repeat(id * 7, CAST(id % 4 AS INT))",
    "struct_c" ->
      "named_struct('a', id % 31, 'b', concat('s', id % 9), 'c', CAST(id AS DOUBLE) / 7)",
    "map_c" -> "map(concat('k', id % 3), id * 2, 'fixed', id % 17)")

  // fls reads back non-null struct fields / array elements; the source
  // frame's are nullable-typed — normalize nullability inside nested
  // types only (top-level dataTypes must still match exactly)
  private def norm(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
    dt match {
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        org.apache.spark.sql.types.ArrayType(norm(et), containsNull = false)
      case org.apache.spark.sql.types.MapType(kt, vt, _) =>
        org.apache.spark.sql.types.MapType(norm(kt), norm(vt), valueContainsNull = false)
      case org.apache.spark.sql.types.StructType(fs) =>
        org.apache.spark.sql.types.StructType(
          fs.map(f => f.copy(dataType = norm(f.dataType), nullable = false)))
      case other => other
    }

  /** Spark set operations cannot compare MapType columns — swap maps
    * for their sorted entry arrays (order-insensitive, value-exact). */
  private def comparable(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.MapType =>
          sort_array(map_entries(col(f.name))).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)

  private def assertSame(a: DataFrame, b: DataFrame, ctx: String): Unit = {
    assert(a.schema.map(f => (f.name, norm(f.dataType))) ==
      b.schema.map(f => (f.name, norm(f.dataType))),
      s"$ctx schema: ${a.schema.simpleString} vs ${b.schema.simpleString}")
    val ca = comparable(a)
    val cb = comparable(b)
    val d1 = ca.exceptAll(cb).count()
    val d2 = cb.exceptAll(ca).count()
    assert(d1 == 0 && d2 == 0, s"$ctx diff: $d1 only-left, $d2 only-right")
  }

  test("seeded fuzz: 12 random (schema, options, partitioning) round-trips") {
    val rng = new scala.util.Random(2026)
    (0 until 12).foreach { trial =>
      val nCols = 2 + rng.nextInt(5)
      val picks = rng.shuffle(colGens).take(nCols)
      val dupOf = if (rng.nextBoolean()) Some(picks(rng.nextInt(picks.length))) else None
      val exprs = Seq("id") ++
        picks.map { case (n, e) => s"$e AS $n" } ++
        dupOf.map { case (n, e) => s"$e AS ${n}_dup" }.toSeq
      val rows = 500 + rng.nextInt(9500)
      val df = spark.range(0, rows).selectExpr(exprs: _*)

      val rgSize = Format.VecSize * (1 + rng.nextInt(4))
      val w = df.repartition(1 + rng.nextInt(4))
        .write.format("fls").mode("overwrite")
        .option("row_group_size", rgSize.toString)
      if (rng.nextBoolean()) w.option("row_groups_per_file", (1 + rng.nextInt(3)).toString)
      if (rng.nextBoolean()) w.option("inline_footer", "false")
      if (rng.nextBoolean()) w.option("transpose", "true")
      val dir = s"$tmp/trial$trial"
      w.save(dir)

      val ctx = s"trial $trial (rows=$rows cols=${exprs.length} rg=$rgSize)"
      val back = spark.read.format("fls").load(dir)
      assertSame(back, df, ctx)
      // a couple of pushdown paths over the same data
      assert(back.count() == rows, ctx)
      val backAgg = back.agg(min("id"), max("id")).collect()(0)
      assert(backAgg.getLong(0) == 0 && backAgg.getLong(1) == rows - 1, ctx)
      assert(back.filter(col("id") === (rows / 2).toLong).count() == 1, ctx)
      // string_dictionary read option must agree with the default path
      val viaDict = spark.read.format("fls")
        .option("string_dictionary", "true").load(dir)
      assertSame(viaDict, df, s"$ctx string_dictionary")
    }
  }
}
