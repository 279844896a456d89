package graft.fls

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Write→read round-trip through the real `format("fls")` surface —
  * the ScalaTest analog of the reference's per-type sqllogictest
  * (/root/reference/test/all_types_single_threaded.test:36-352): 1,024
  * rows of (id, col) per type, written and read back, diff must be
  * empty; repeated with multi-partition input (≙ the threads=1 vs
  * threads=2 twin files). */
class FlsRoundTripSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val tmp = Files.createTempDirectory("fls-spec").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fls-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def roundTrip(df: DataFrame, dir: String, parts: Int = 1): DataFrame = {
    df.repartition(parts).write.format("fls").mode("overwrite").save(dir)
    spark.read.format("fls").load(dir)
  }

  // fls guarantees no null elements and must read back
  // ArrayType(_, containsNull = false); the SOURCE frame may be
  // nullable-typed, so normalize only the source side (`a`) down to
  // containsNull=false and assert the fls-read side (`b`) verbatim —
  // a regression where fls reads back containsNull=true now fails here
  private def norm(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => ArrayType(norm(et), containsNull = false)
    case MapType(kt, vt, _) => MapType(norm(kt), norm(vt), valueContainsNull = false)
    case StructType(fields) =>
      StructType(fields.map(f => f.copy(dataType = norm(f.dataType), nullable = false)))
    case other => other
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    b.schema.fields.foreach {
      case StructField(n, ArrayType(_, cn), _, _) =>
        assert(!cn, s"fls-read column '$n' must report containsNull=false")
      case _ =>
    }
    assert(a.schema.map(f => (f.name, norm(f.dataType))) ==
      b.schema.map(f => (f.name, f.dataType)),
      s"schema: ${a.schema} vs ${b.schema}")
    val diff1 = a.exceptAll(b).count()
    val diff2 = b.exceptAll(a).count()
    assert(diff1 == 0 && diff2 == 0, s"diff: $diff1 rows only-left, $diff2 only-right")
  }

  private def typed(expr: String): DataFrame =
    spark.range(1, 1025).toDF("id").selectExpr("id", s"$expr AS col")

  // one case per reference round-trip fixture (FIXTURES.md §1, from
  // /root/reference/test/all_types_single_threaded.test:36-160), using
  // the reference's own generators; date/ts included even though the
  // reference's are broken (SURVEY.md §7.4 — we do better). ubigint →
  // DECIMAL(20,0), hugeint/uhugeint → DECIMAL(38,0) per SURVEY §1.3.
  private val cases: Seq[(String, String)] = Seq(
    "boolean" -> "id % 2 = 0",
    "tinyint" -> "CAST((id % 256) - 128 AS TINYINT)",
    "smallint" -> "CAST((id % 65536) - 32768 AS SMALLINT)",
    "int" -> "CAST(id AS INT)",
    "bigint" -> "id * 10",
    "ubigint" -> "CAST(id AS DECIMAL(20,0)) * 10",
    "hugeint" -> "CAST(id AS DECIMAL(38,0)) * -469231731687303715884105728",
    "uhugeint" -> "CAST(id AS DECIMAL(38,0)) * 469231731687303715884105728",
    "float" -> "CAST(id / 100.0 AS FLOAT)",
    "double" -> "CAST(id / 1000.0 AS DOUBLE)",
    "decimal_10_2" -> "CAST(CAST(id AS DECIMAL(10,2)) / 10.0 AS DECIMAL(10,2))",
    "varchar" -> "concat('Value ', CAST(id AS STRING))",
    "blob" -> "CAST(md5(CAST(CAST(id AS STRING) AS BINARY)) AS BINARY)",
    "date" -> "date_add(DATE '1992-03-22', CAST(id AS INT))",
    "timestamp" -> "timestampadd(SECOND, CAST(id AS INT), TIMESTAMP '2025-01-01 00:00:00')",
    "low_card_str" -> "concat('cat_', CAST(id % 5 AS STRING))",
    "constant_str" -> "'same'",
    "constant_int" -> "CAST(7 AS BIGINT)")

  for ((name, expr) <- cases; parts <- Seq(1, 3)) {
    test(s"round-trip $name (parts=$parts)") {
      val df = typed(expr)
      val back = roundTrip(df, s"$tmp/rt_${name}_$parts", parts)
      assertSame(df, back)
    }
  }

  // LIST columns (beyond the reference, which declares but never
  // materializes the token): varied lengths, empties, every scalar
  // element family, float specials
  private val arrayCases: Seq[(String, String)] = Seq(
    "arr_float" ->
      "transform(sequence(0, CAST(id % 7 AS INT)), j -> CAST(sin(id * 13 + j) AS FLOAT))",
    "arr_float_special" ->
      ("array(CAST(id AS FLOAT), CAST('NaN' AS FLOAT), CAST(-0.0 AS FLOAT), " +
        "CAST('Infinity' AS FLOAT), CAST('-Infinity' AS FLOAT))"),
    "arr_double" -> "transform(sequence(0, CAST(id % 5 AS INT)), j -> sin(id * 7 + j))",
    "arr_bigint" -> "sequence(id, id + id % 4)",
    "arr_int" -> "transform(sequence(0, CAST(id % 3 AS INT)), j -> CAST(id + j AS INT))",
    "arr_string" ->
      "transform(sequence(0, CAST(id % 3 AS INT)), j -> concat('v', id, '_', j))",
    "arr_const_len" -> "array(CAST(id AS FLOAT), CAST(id + 1 AS FLOAT), CAST(-id AS FLOAT))",
    "arr_empty_mixed" -> "CASE WHEN id % 3 = 0 THEN array() ELSE array(id, id * 2) END")

  for ((name, expr) <- arrayCases; parts <- Seq(1, 3)) {
    test(s"round-trip $name (parts=$parts)") {
      val df = typed(expr)
      val back = roundTrip(df, s"$tmp/rt_${name}_$parts", parts)
      assertSame(df, back)
    }
  }

  test("array column spans row groups with a short tail") {
    val df = spark.range(0, 10000).toDF("id")
      .selectExpr("id", "transform(sequence(0, CAST(id % 6 AS INT)), j -> CAST(id * 3 + j AS FLOAT)) AS v")
    val dir = s"$tmp/rg_arr"
    df.coalesce(1).write.format("fls")
      .option("row_group_size", 2048).mode("overwrite").save(dir)
    val back = spark.read.format("fls").load(dir)
    assertSame(df, back)
    assert(back.rdd.getNumPartitions == 5)
  }

  test("NULL array element is rejected (format stores no NULLs)") {
    val df = spark.range(0, 10).toDF("id")
      .selectExpr("id", "array(id, CASE WHEN id = 5 THEN NULL ELSE id END) AS v")
    val e = intercept[Exception] {
      df.write.format("fls").mode("overwrite").save(s"$tmp/arr_nulls")
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("NULL element"))
  }

  test("MCC EQUAL fires across duplicated array columns") {
    val dir = s"$tmp/arr_mcc"
    val df = spark.range(0, 2048).toDF("id")
      .selectExpr("id", "array(CAST(id AS FLOAT), CAST(id + 1 AS FLOAT)) AS a",
        "array(CAST(id AS FLOAT), CAST(id + 1 AS FLOAT)) AS b")
    df.coalesce(1).write.format("fls").mode("overwrite").save(dir)
    val back = spark.read.format("fls").load(dir)
    assertSame(df, back)
    // the duplicate column must have stored an EQUAL reference
    val conf = spark.sessionState.newHadoopConf()
    val file = graft.fls.FlsFile.listDataFiles(new org.apache.hadoop.fs.Path(dir), conf).head
    val r = new FlsFileReader(file, conf)
    try {
      val bIdx = r.table.columns.indexWhere(_.name == "b")
      assert(r.table.rowGroups.head.segments(bIdx).encoding == Format.Enc.EQUAL)
    } finally r.close()
  }

  test("array<float> file reads under a user-supplied array<double> schema") {
    val df = spark.range(0, 3000).toDF("id")
      .selectExpr("id", "array(CAST(id AS FLOAT), CAST(id AS FLOAT) / 3.0F) AS v")
    val dir = s"$tmp/arr_widen"
    df.coalesce(1).write.format("fls")
      .option("row_group_size", 1024).mode("overwrite").save(dir)
    val widened = spark.read.format("fls")
      .schema(StructType(Seq(
        StructField("id", LongType),
        StructField("v", ArrayType(DoubleType, containsNull = false)))))
      .load(dir)
    // element-wise float→double widening must match Spark's own cast
    assertSame(df.selectExpr("id", "CAST(v AS ARRAY<DOUBLE>) AS v"), widened)
  }

  test("real embeddings table round-trips through fls (array<float>)") {
    val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = s"$tmp/emb_fls"
    em.write.format("fls").mode("overwrite").save(dir)
    assertSame(em, spark.read.format("fls").load(dir))
  }

  test("multi-row-group file + short tail row group") {
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("v", col("id") * 3 + 1)
    val dir = s"$tmp/rg"
    df.coalesce(1).write.format("fls")
      .option("row_group_size", 2048).mode("overwrite").save(dir)
    val back = spark.read.format("fls").load(dir)
    assertSame(df, back)
    // 10000 rows / 2048 → 5 row groups → 5 input partitions
    assert(back.rdd.getNumPartitions == 5)
  }

  test("row_groups_per_file rotation") {
    val df = spark.range(0, 8192).toDF("id")
    val dir = s"$tmp/rot"
    df.coalesce(1).write.format("fls")
      .option("row_group_size", 1024).option("row_groups_per_file", 2)
      .mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".fls"))
    assert(files.length == 4, s"expected 4 files, got ${files.length}")
    assertSame(df, spark.read.format("fls").load(dir))
  }

  test("zone-map pruning skips row groups (partition count shrinks)") {
    val df = spark.range(0, 16384).toDF("id") // sorted → tight per-rowgroup ranges
    val dir = s"$tmp/prune"
    df.coalesce(1).write.format("fls")
      .option("row_group_size", 1024).mode("overwrite").save(dir)
    // pin split packing to one row group per task (openCost ≥ split
    // target), so partition counts measure PRUNING, not packing
    spark.conf.set("spark.sql.files.openCostInBytes", "134217728")
    try {
      val back = spark.read.format("fls").load(dir)
      assert(back.rdd.getNumPartitions == 16)
      val filtered = back.filter(col("id") >= 15000)
      // only row groups [14336,15360) and [15360,16384) can match
      assert(filtered.rdd.getNumPartitions == 2)
      assert(filtered.count() == 1384)
      val eq = back.filter(col("id") === 5)
      assert(eq.rdd.getNumPartitions == 1)
      assert(eq.count() == 1)
    } finally spark.conf.unset("spark.sql.files.openCostInBytes")
  }

  test("split packing coalesces row groups toward core-count tasks") {
    val dir = s"$tmp/prune" // 16 × 1024-row row groups from the test above
    spark.range(0, 16384).toDF("id").coalesce(1).write.format("fls")
      .option("row_group_size", 1024).mode("overwrite").save(dir)
    val back = spark.read.format("fls").load(dir)
    val n = back.rdd.getNumPartitions
    // parquet-style: target = total/parallelism (4 here), clamped to
    // [openCost, maxPartitionBytes] — fewer tasks than row groups, at
    // least parallelism-many, and no rows lost
    assert(n < 16 && n >= 1, s"expected packed splits, got $n")
    assert(back.count() == 16384)
    assert(back.agg(sum("id")).collect()(0).getLong(0) == 16383L * 16384 / 2)
  }

  test("projection pushdown prunes columns at the scan") {
    val df = spark.range(0, 4096).toDF("id")
      .withColumn("a", col("id") * 2)
      .withColumn("b", concat(lit("s"), col("id")))
    val dir = s"$tmp/proj"
    df.write.format("fls").mode("overwrite").save(dir)
    val back = spark.read.format("fls").load(dir).select("b")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[b]"), s"projection not pushed:\n$plan")
    assert(back.count() == 4096)
  }

  test("NULL input is rejected (format stores no NULLs)") {
    val df = spark.range(0, 10).toDF("id")
      .withColumn("s", when(col("id") === 5, lit(null)).otherwise(lit("x")))
    val e = intercept[Exception] {
      df.write.format("fls").mode("overwrite").save(s"$tmp/nulls")
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("NULL"))
  }

  test("read schema is non-nullable") {
    val dir = s"$tmp/nn"
    spark.range(0, 10).toDF("id").write.format("fls").mode("overwrite").save(dir)
    val back = spark.read.format("fls").load(dir)
    assert(back.schema.fields.forall(!_.nullable))
  }

  test("virtual columns file_row_number / file_index") {
    val dir = s"$tmp/virt"
    spark.range(0, 5000).toDF("id").coalesce(1)
      .write.format("fls").option("row_group_size", 1024).mode("overwrite").save(dir)
    val back = spark.read.format("fls")
      .option("file_row_number", "true").option("file_index", "true").load(dir)
    assert(back.columns.toSeq == Seq("id", "file_row_number", "file_index"))
    val rows = back.select("id", "file_row_number", "file_index")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.forall { case (id, rn, fi) => id == rn && fi == 0 })
  }

  test("append mode adds files") {
    val dir = s"$tmp/append"
    spark.range(0, 100).toDF("id").write.format("fls").mode("overwrite").save(dir)
    spark.range(100, 200).toDF("id").write.format("fls").mode("append").save(dir)
    assert(spark.read.format("fls").load(dir).count() == 200)
  }

  test("sql over fls view: TPC-H-Q1-shaped aggregate matches parquet source") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dir = s"$tmp/lineitem_fls"
    li.write.format("fls").mode("overwrite").save(dir)
    val fls = spark.read.format("fls").load(dir)
    def q1(df: DataFrame): DataFrame =
      df.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(DecimalType(12, 6))).as("sq"),
          count(lit(1)).as("n"))
    assertSame(q1(li), q1(fls))
  }

  test("union_by_name merges schemas, promotes types, nulls missing columns") {
    val d1 = s"$tmp/union_a"
    val d2 = s"$tmp/union_b"
    spark.range(0, 100).toDF("id")
      .selectExpr("CAST(id AS INT) AS id", "CAST(id * 2 AS INT) AS a")
      .write.format("fls").mode("overwrite").save(d1)
    spark.range(100, 200).toDF("id")
      .selectExpr("id", "concat('x', id) AS b") // id is BIGINT here
      .write.format("fls").mode("overwrite").save(d2)
    val back = spark.read.format("fls")
      .option("union_by_name", "true").load(d1, d2)
    val sch = back.schema.fields.map(f => (f.name, f.dataType.simpleString, f.nullable)).toSeq
    assert(sch == Seq(("id", "bigint", false), ("a", "int", true), ("b", "string", true)))
    assert(back.count() == 200)
    assert(back.filter(col("a").isNull).count() == 100)
    assert(back.filter(col("b").isNull).count() == 100)
    assert(back.filter(col("id") === 150).select("b").collect()(0).getString(0) == "x150")
  }

  test("union_by_name rejects incompatible column types") {
    val d1 = s"$tmp/bad_a"
    val d2 = s"$tmp/bad_b"
    spark.range(0, 5).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .write.format("fls").mode("overwrite").save(d1)
    spark.range(0, 5).selectExpr("id", "concat('s', id) AS v")
      .write.format("fls").mode("overwrite").save(d2)
    val e = intercept[Exception] {
      spark.read.format("fls").option("union_by_name", "true").load(d1, d2).count()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("incompatible"))
  }

  test("union_by_name promotes decimal scales and rescales values") {
    val d1 = s"$tmp/dec_a"
    val d2 = s"$tmp/dec_b"
    spark.range(0, 50).selectExpr("id", "CAST(CAST(id AS DECIMAL(10,2)) / 4 AS DECIMAL(10,2)) AS v")
      .write.format("fls").mode("overwrite").save(d1)
    spark.range(50, 100).selectExpr("id", "CAST(CAST(id AS DECIMAL(12,4)) / 8 AS DECIMAL(12,4)) AS v")
      .write.format("fls").mode("overwrite").save(d2)
    val back = spark.read.format("fls").option("union_by_name", "true").load(d1, d2)
    val vType = back.schema("v").dataType.simpleString
    assert(vType == "decimal(12,4)", vType)
    // values from file 1 (scale 2) must rescale: 10/4 = 2.50 -> 2.5000
    val r10 = back.filter(col("id") === 10).select("v").collect()(0).getDecimal(0)
    assert(r10.toPlainString == "2.5000", r10.toPlainString)
    val r60 = back.filter(col("id") === 60).select("v").collect()(0).getDecimal(0)
    assert(r60.toPlainString == "7.5000", r60.toPlainString)
    assert(back.count() == 100)
  }

  test("explicit_cardinality overrides reported row count") {
    val dir = s"$tmp/card"
    spark.range(0, 1000).toDF("id").write.format("fls").mode("overwrite").save(dir)
    val back = spark.read.format("fls")
      .option("explicit_cardinality", "5").load(dir)
    val stats = back.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(5)), stats)
    assert(back.count() == 1000) // stats hint only, data unchanged
  }

  test("reference compare_roundtrip macro shape: view + row_number full-outer IS DISTINCT FROM") {
    // ≙ /root/reference/test/all_types_single_threaded.test:8-34 —
    // CREATE VIEW over the scan, ROW_NUMBER-aligned FULL OUTER JOIN,
    // diff rows where any column IS DISTINCT FROM its counterpart.
    val dir = s"$tmp/macro"
    val src = typed("concat('Value ', CAST(id AS STRING))")
    src.write.format("fls").mode("overwrite").save(dir)
    src.createOrReplaceTempView("macro_src")
    spark.read.format("fls").load(dir).createOrReplaceTempView("macro_fls")
    val diff = spark.sql(
      """WITH w1 AS (SELECT id, col, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM macro_src),
            w2 AS (SELECT id, col, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM macro_fls)
        SELECT * FROM w1 FULL OUTER JOIN w2 USING (rn)
        WHERE w1.id IS DISTINCT FROM w2.id OR w1.col IS DISTINCT FROM w2.col""")
    assert(diff.count() == 0)
  }

  test("aggregate pushdown: COUNT/MIN/MAX answered from metadata") {
    val dir = s"$tmp/aggpush"
    spark.range(0, 20000).toDF("id")
      .withColumn("ts", expr("timestamp_micros(id * 1000000)"))
      .withColumn("d", expr("CAST(CAST(id AS DECIMAL(10,2)) / 4 AS DECIMAL(10,2))"))
      .withColumn("s", concat(lit("x"), col("id")))
      .coalesce(2)
      .write.format("fls").option("row_group_size", 4096).mode("overwrite").save(dir)
    val fls = spark.read.format("fls").load(dir)

    val agg = fls.agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"),
      min("ts").as("mnts"), max("d").as("mxd"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("metadata-aggregate"), s"not pushed:\n$plan")
    val r = agg.collect()(0)
    assert(r.getLong(0) == 20000)
    assert(r.getLong(1) == 0 && r.getLong(2) == 19999)
    assert(r.getTimestamp(3).toInstant.getEpochSecond == 0)
    assert(r.getDecimal(4).toPlainString == "4999.75")

    // string min/max pushes when byte stats are exact (short values);
    // the value must still be right either way
    val agg2 = fls.agg(min("s"))
    assert(agg2.queryExecution.executedPlan.toString.contains("metadata-aggregate"))
    assert(agg2.collect()(0).getString(0) == "x0")
    val agg3 = fls.filter(col("id") > 10).agg(count(lit(1)))
    assert(!agg3.queryExecution.executedPlan.toString.contains("metadata-aggregate"))
    assert(agg3.collect()(0).getLong(0) == 19989)
    // grouped aggregates must not push either
    val agg4 = fls.groupBy(expr("id % 2")).agg(max("id"))
    assert(!agg4.queryExecution.executedPlan.toString.contains("metadata-aggregate"))
    assert(agg4.count() == 2)
  }

  test("runtime filtering contract: injected In-filter prunes row groups") {
    val dir = s"$tmp/runtime"
    spark.range(0, 8192).toDF("id").coalesce(1)
      .write.format("fls").option("row_group_size", 1024).mode("overwrite").save(dir)
    val df = spark.read.format("fls").load(dir)
    // drive the DSv2 contract directly: Spark calls filter() on the
    // scan with join-derived filters before planInputPartitions
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val scanExec = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    val scan = scanExec.scan.asInstanceOf[graft.fls.connector.FlsScan]
    assert(scan.filterAttributes().map(_.fieldNames()(0)).contains("id"))
    spark.conf.set("spark.sql.files.openCostInBytes", "134217728") // 1 rg per split
    try {
      assert(scan.planInputPartitions().length == 8)
      scan.filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("id", Array(5L, 2000L))))
      assert(scan.planInputPartitions().length == 2)
    } finally spark.conf.unset("spark.sql.files.openCostInBytes")
  }

  test("runtime filtering coexists with column pruning (join on pruned scan)") {
    val dir = s"$tmp/runtime_join"
    spark.range(0, 1000).toDF("k")
      .withColumn("v", col("k") * 2)
      .withColumn("unused", concat(lit("u"), col("k")))
      .write.format("fls").mode("overwrite").save(dir)
    val fls = spark.read.format("fls").load(dir)
    val dim = spark.range(0, 10).toDF("k")
    // prunes `unused`; filterAttributes must track the pruned schema
    val joined = fls.select("k", "v").join(dim, Seq("k"))
    assert(joined.count() == 10)
  }

  test("limit pushdown plans only enough row groups") {
    val dir = s"$tmp/limit"
    spark.range(0, 16384).toDF("id").coalesce(1)
      .write.format("fls").option("row_group_size", 1024).mode("overwrite").save(dir)
    val back = spark.read.format("fls").load(dir)
    val limited = back.limit(1500)
    assert(limited.count() == 1500)
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("limit=1500"), s"limit not pushed:\n$plan")
    // filtered limit must NOT truncate row groups (rows could be anywhere)
    val f = back.filter(col("id") >= 16000).limit(5)
    assert(f.count() == 5)
  }

  test("real events table round-trips through fls (nanos, json strings, doubles)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val dir = s"$tmp/events_fls"
    ev.write.format("fls").mode("overwrite").save(dir)
    assertSame(ev, spark.read.format("fls").load(dir))
  }

  test("topN pushdown prunes row groups soundly (asc and desc)") {
    val dir = s"$tmp/topn"
    spark.range(0, 16384).toDF("id").coalesce(1)
      .write.format("fls").option("row_group_size", 1024).mode("overwrite").save(dir)
    val back = spark.read.format("fls").load(dir)
    val top = back.orderBy(col("id").desc).limit(10)
    assert(top.queryExecution.executedPlan.toString.contains("topN=(id,DESC,10)"))
    assert(top.collect().map(_.getLong(0)).toSeq == (16374L to 16383L).reverse)
    assert(top.rdd.getNumPartitions == 1) // only the last row group survives
    val bottom = back.orderBy(col("id").asc).limit(2000)
    assert(bottom.collect().map(_.getLong(0)).toSeq == (0L until 2000L))
    // inspect the scan directly (rdd partition counts can be AQE-coalesced)
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val scan = bottom.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[graft.fls.connector.FlsScan]
    }.get
    assert(scan.planInputPartitions().length == 2)
  }
}
