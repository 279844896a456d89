package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Executor-side selection-vector filtering (FlsRowFilter): every
  * pushed-filter shape over every physical domain must return EXACTLY
  * what Spark computes over the same data read from parquet-less
  * memory — including dict-encoded strings, timestamps, decimals,
  * NaN/-0.0 doubles, virtual row numbers, and multi-row-group packed
  * splits where compaction changes batch geometry mid-split. */
class FlsRowFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-rowfilter").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-rowfilter-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.minPartitionNum", "1") // pack into one split
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 8 row groups of 1024 rows, mixed types; written once. */
  private lazy val dir: String = {
    val d = s"$tmp/t"
    src.write.format("fls").mode("overwrite")
      .option("row_group_size", 1024).save(d)
    d
  }

  private lazy val src: DataFrame =
    spark.range(0, 8192, 1, 1).selectExpr(
      "id",
      "CAST(id % 97 AS INT) AS i32",
      "CAST(id AS DOUBLE) / 4 AS d",
      "CASE WHEN id % 1000 = 7 THEN CAST('NaN' AS DOUBLE) " +
        "WHEN id % 1000 = 8 THEN -0.0 ELSE sin(CAST(id AS DOUBLE)) END AS dx",
      "concat('s', lpad(CAST(id % 50 AS STRING), 3, '0')) AS s_low", // dict-able
      "concat('u', id) AS s_high",
      "CAST(id AS DECIMAL(12,2)) / 3 AS dec",
      "timestamp_micros(id * 1000000) AS ts",
      "date_add(DATE'2020-01-01', CAST(id % 900 AS INT)) AS dt")

  /** Boxed-Double == is primitive == in Scala, so NaN != NaN and NaN
    * rows can never set-match — compare doubles by bit pattern
    * (canonical NaN equal, -0.0 still distinct from 0.0). */
  private def norm(row: org.apache.spark.sql.Row): Seq[Any] =
    row.toSeq.map {
      case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
      case f: java.lang.Float => java.lang.Float.floatToIntBits(f)
      case v => v
    }

  /** Most checks force compaction on (filter_keep_ratio=0.9) — the
    * default is 0 (evaluate-and-skip-empty only), covered separately. */
  private def check(cond: String, opts0: Map[String, String] = Map.empty): Unit = {
    val opts = Map("filter_keep_ratio" -> "0.9") ++ opts0
    var r = spark.read.format("fls")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    val got = r.load(dir).filter(cond).collect().map(norm).toSet
    val exp = src.filter(cond).collect().map(norm).toSet
    assert(got == exp,
      s"filter [$cond] opts=$opts: got ${got.size} rows, expected ${exp.size}; " +
        s"missing=${(exp -- got).take(2)} extra=${(got -- exp).take(2)}")
    assert(exp.nonEmpty || src.filter(cond).isEmpty, s"degenerate test [$cond]")
    // default path (no compaction, empty-group skip only) must agree too
    var r2 = spark.read.format("fls")
    opts0.foreach { case (k, v) => r2 = r2.option(k, v) }
    assert(r2.load(dir).filter(cond).collect().map(norm).toSet == exp,
      s"filter [$cond] default-path mismatch")
  }

  test("long comparisons and In compact exactly") {
    check("id < 100")
    check("id >= 8100")
    check("id = 4000")
    check("i32 IN (3, 5, 96)")
    check("id > 2000 AND id <= 2100 AND i32 < 50")
  }

  test("double comparisons honor Spark NaN/-0.0 ordering") {
    check("d <= 10.0")
    check("dx > 0.99")
    check("dx = 0.0")  // must match the -0.0 rows like Spark does
    check("dx >= cast('NaN' as double)") // NaN sorts largest; only NaN rows
  }

  test("string compare, In, prefix — plain and dict-encoded groups") {
    check("s_low = 's007'")
    check("s_low < 's010'")
    check("s_low IN ('s001', 's049')")
    check("s_high = 'u4567'")
    check("s_low LIKE 's00%'")
    check("s_low = 's007'", Map("string_dictionary" -> "true"))
    check("s_low IN ('s001', 's049')", Map("string_dictionary" -> "true"))
    check("s_low LIKE 's04%'", Map("string_dictionary" -> "true"))
  }

  test("timestamp, date, and decimal literals convert exactly") {
    check("ts < TIMESTAMP'1970-01-01 00:20:00'")
    check("dt = DATE'2020-03-01'")
    check("dec < 10.00")
    check("dec = 33.33")
  }

  test("selective filter over a packed multi-group split stays exact") {
    // ~1.2% selectivity: most groups compact, some empty out entirely
    check("id % 1 = 0 AND id > 8090") // tail groups only
    check("s_high IN ('u1', 'u5000', 'u8191')")
  }

  test("Or of same-column leaves unions exactly — every physical domain") {
    check("id < 100 OR id > 8000")           // long range union
    check("i32 = 3 OR i32 = 96")
    check("id = 4000 OR id = 4000")          // degenerate duplicate branch
    check("d <= 1.0 OR d >= 2000.0")
    check("dx = 0.0 OR dx >= cast('NaN' as double)") // -0.0 rows ∪ NaN rows
    check("s_low = 's007' OR s_low = 's040'")
    check("s_low LIKE 's00%' OR s_low LIKE 's04%'")
    check("s_high = 'u1' OR s_high = 'u8191'") // packed-split tails
    check("ts < TIMESTAMP'1970-01-01 00:02:00' OR ts > TIMESTAMP'1970-01-01 02:15:00'")
    check("dec = 33.33 OR dec < 1.00")
    check("s_low = 's007' OR s_low = 's040'", Map("string_dictionary" -> "true"))
    check("s_low LIKE 's00%' OR s_low IN ('s048', 's049')",
      Map("string_dictionary" -> "true"))
  }

  test("Or with nested And / nested Or / IsNull branches stays exact") {
    check("(id > 100 AND id < 200) OR id = 4000")   // And branch under Or
    check("id < 10 OR id = 500 OR id > 8100")       // flattened 3-way Or
    check("id IS NULL OR id = 4000")                // Never-branch ∪ point
    check("(i32 > 10 AND i32 < 20) OR (i32 > 80 AND i32 < 90)")
  }

  test("cross-column or always-true Or branches fall back to residual, exactly") {
    check("id < 100 OR d < 10.0")            // cross-column: not scan-filtered
    check("i32 = 5 OR s_low = 'zzz'")        // cross-column, one empty side
    check("id IS NOT NULL OR id = 4000")     // always-true branch → vacuous
    check("id < 100 OR (id > 8000 AND i32 < 5)") // cross-column And under Or
  }

  test("seeded random And/Or/Not trees agree with Catalyst on both scan paths") {
    // Grammar fuzz over every typed column: depth-≤3 boolean trees of
    // the pushable leaf shapes (plus NOT, which must stay residual).
    // Catalyst over the in-memory frame is ground truth; empty results
    // are allowed here (the fixed matrix covers the non-degenerate
    // shapes). One seed = reproducible forever.
    val rnd = new scala.util.Random(0x0F5)
    def leaf(): String = {
      val ops = Seq("=", "<", "<=", ">", ">=")
      rnd.nextInt(9) match {
        case 0 => s"id ${ops(rnd.nextInt(5))} ${rnd.nextInt(9000)}"
        case 1 => s"i32 ${ops(rnd.nextInt(5))} ${rnd.nextInt(110) - 5}"
        case 2 => f"d ${ops(rnd.nextInt(5))} ${rnd.nextDouble() * 2200 - 50}%.4f"
        case 3 => f"dx ${ops(rnd.nextInt(5))} ${rnd.nextDouble() * 2 - 1}%.4f"
        case 4 => s"s_low ${ops(rnd.nextInt(5))} 's${"%03d".format(rnd.nextInt(55))}'"
        case 5 => s"s_high = 'u${rnd.nextInt(9000)}'"
        case 6 => s"i32 IN (${Seq.fill(3)(rnd.nextInt(100)).mkString(", ")})"
        case 7 => s"s_low LIKE 's0${rnd.nextInt(10)}%'"
        case 8 => s"dec ${ops(rnd.nextInt(5))} ${rnd.nextInt(900)}.${rnd.nextInt(100)}"
      }
    }
    def tree(depth: Int): String =
      if (depth == 0 || rnd.nextInt(3) == 0) leaf()
      else rnd.nextInt(5) match {
        case 0 => s"(${tree(depth - 1)} AND ${tree(depth - 1)})"
        case 1 => s"(${tree(depth - 1)} OR ${tree(depth - 1)})"
        case 2 => s"(NOT ${tree(depth - 1)})"
        case _ => s"(${tree(depth - 1)} OR ${tree(depth - 1)})"
      }
    val exp0 = src.cache()
    for (_ <- 0 until 40) {
      val cond = tree(3)
      val exp = exp0.filter(cond).collect().map(norm).toSet
      for (keep <- Seq("0.9", "0.0")) {
        val got = spark.read.format("fls").option("filter_keep_ratio", keep)
          .load(dir).filter(cond).collect().map(norm).toSet
        assert(got == exp, s"random filter [$cond] keep=$keep: " +
          s"got ${got.size}, expected ${exp.size}; " +
          s"missing=${(exp -- got).take(2)} extra=${(got -- exp).take(2)}")
      }
    }
    exp0.unpersist()
  }

  test("Or predicates narrow at the SCAN (metric), not only in the residual") {
    val df = spark.read.format("fls").option("filter_keep_ratio", "0.9")
      .load(dir).filter("i32 = 3 OR i32 = 96")
    df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.metrics("flsRowsFiltered").value > 0,
      "Or filter did not withhold rows scan-side")
  }

  test("virtual file_row_number survives compaction with original positions") {
    val got = spark.read.format("fls").option("file_row_number", "true")
      .option("filter_keep_ratio", "0.9")
      .load(dir)
      .filter("i32 = 13") // pushed; compacts groups
      .select("id", "file_row_number")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // single-partition write: file_row_number == id
    val exp = (0L until 8192L).filter(_ % 97 == 13).map(i => (i, i)).toSet
    assert(got == exp, s"row numbers drifted: missing=${(exp -- got).take(3)}")
  }

  test("filter_keep_ratio=0 disables compaction; results unchanged") {
    val got = spark.read.format("fls").option("filter_keep_ratio", "0.0")
      .load(dir).filter("id < 50").collect().map(_.getLong(0)).toSet
    assert(got == (0L until 50L).toSet)
  }

  test("flsRowsFiltered metric reports scan-side drops, honestly per mode") {
    def metricFor(keep: String, cond: String): Long = {
      val df = spark.read.format("fls").option("filter_keep_ratio", keep)
        .load(dir).filter(cond)
      df.collect()
      val scan = df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.get
      scan.metrics("flsRowsFiltered").value
    }
    // i32 = id % 97: pushable, present in every row group (zone maps
    // [0,96] cannot prune), ~1% selective → compaction withholds rows
    assert(metricFor("0.9", "i32 = 5") > 0)
    // compaction off: a non-empty selection serves the group IN FULL
    // (the residual filter drops), so no rows may be claimed — i32=5
    // hits >0 rows of every 1024-row group
    assert(metricFor("0.0", "i32 = 5") == 0L)
  }
}
