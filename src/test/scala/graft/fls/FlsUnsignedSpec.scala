package graft.fls

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.fls.Format._
import graft.fls.connector.{FlsInputPartition, FlsPartitionReader}

/** Unsigned-token read fallback (reference UINT8–64,
  * translation_utils.cpp:19-24): externally written unsigned columns
  * widen to the smallest lossless Spark type — u8→SHORT, u16→INT,
  * u32→BIGINT, u64→DECIMAL(20,0) with raw bits reinterpreted unsigned.
  * Our writer never emits these tags; the synthetic file drives the
  * reader directly. */
class FlsUnsignedSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private var spark: org.apache.spark.sql.SparkSession = _

  override def beforeAll(): Unit = {
    spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("fls-unsigned-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.minPartitionNum", "1") // one packed split
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def seg(enc: Int, off: Long, len: Long) =
    SegmentDesc(enc, off, len, hasStats = false, 0L, 0L, 0.0, 0.0)

  test("u8/u16/u32 widen losslessly; u64 reinterprets raw bits unsigned") {
    val tmp = Files.createTempDirectory("fls-unsigned").toString
    val n = 5
    val u8 = Array(0L, 1L, 127L, 128L, 255L)
    val u16 = Array(0L, 1L, 32767L, 32768L, 65535L)
    val u32 = Array(0L, 1L, 2147483647L, 2147483648L, 4294967295L)
    // raw 64-bit patterns: -1L is 2^64-1 unsigned; Long.MinValue is 2^63
    val u64 = Array(0L, 1L, Long.MaxValue, Long.MinValue, -1L)
    val segsBytes = Seq(u8, u16, u32, u64).map { vs =>
      val w = new ByteWriter(); Codecs.encodeFFOR(vs, w); w.toArray
    }
    val file = new java.io.File(tmp, "u.fls")
    val fos = new java.io.FileOutputStream(file)
    try segsBytes.foreach(fos.write) finally fos.close()
    val offsets = segsBytes.scanLeft(0L)(_ + _.length)
    val cols = Array(
      ColumnDesc("a", ColumnType(TypeTag.UINT8)),
      ColumnDesc("b", ColumnType(TypeTag.UINT16)),
      ColumnDesc("c", ColumnType(TypeTag.UINT32)),
      ColumnDesc("d", ColumnType(TypeTag.UINT64)))
    val rg = RowGroupDesc(n, segsBytes.zipWithIndex.map { case (b, i) =>
      seg(Enc.FFOR, offsets(i), b.length)
    }.toArray)
    // the schema the connector would infer: ColumnType.toSpark
    assert(ColumnType(TypeTag.UINT8).toSpark == ShortType)
    assert(ColumnType(TypeTag.UINT16).toSpark == IntegerType)
    assert(ColumnType(TypeTag.UINT32).toSpark == LongType)
    assert(ColumnType(TypeTag.UINT64).toSpark == DecimalType(20, 0))
    val schema = StructType(Seq(
      StructField("a", ShortType, nullable = false),
      StructField("b", IntegerType, nullable = false),
      StructField("c", LongType, nullable = false),
      StructField("d", DecimalType(20, 0), nullable = false)))
    val part = FlsInputPartition.single(file.getAbsolutePath, rg, cols, 0L, 0)
    val reader = new FlsPartitionReader(part, schema, new Configuration())
    val rows = scala.collection.mutable.ArrayBuffer[(Short, Int, Long, java.math.BigDecimal)]()
    while (reader.next()) {
      val b = reader.get()
      (0 until b.numRows()).foreach { i =>
        rows += ((b.column(0).getShort(i), b.column(1).getInt(i),
          b.column(2).getLong(i),
          b.column(3).getDecimal(i, 20, 0).toJavaBigDecimal))
      }
    }
    reader.close()
    assert(rows.map(_._1).toSeq == u8.map(_.toShort).toSeq)
    assert(rows.map(_._2).toSeq == u16.map(_.toInt).toSeq)
    assert(rows.map(_._3).toSeq == u32.toSeq)
    val two64 = java.math.BigInteger.ONE.shiftLeft(64)
    val expU64 = u64.map { v =>
      new java.math.BigDecimal(
        if (v >= 0) java.math.BigInteger.valueOf(v)
        else java.math.BigInteger.valueOf(v).add(two64))
    }
    assert(rows.map(_._4).toSeq == expU64.toSeq,
      s"u64 unsigned reinterpretation wrong: ${rows.map(_._4)}")
  }

  // ------------- exact unsigned-domain FILTERING (round-7 verdict #5) ----

  private val Two63 = BigInt(2).pow(63)

  /** Four 1024-row groups through the CONNECTOR: low values, high
    * values (raw bits negative), low again (so high-group pruning is
    * provable by metric), and a group STRADDLING 2^63 (zone maps must
    * keep it; the row filter must still split it exactly). */
  private lazy val u64Dir: String = {
    val d = Files.createTempDirectory("fls-u64-filter").toString
    val cols = Array(
      ColumnDesc("u", ColumnType(TypeTag.UINT64)),
      ColumnDesc("g", ColumnType(TypeTag.INT64)))
    val w = new FlsFileWriter(
      new org.apache.hadoop.fs.Path(s"$d/u.fls"), new Configuration(), cols)
    def group(vals: Seq[BigInt], g: Long): Unit =
      w.writeRowGroup(Array(
        LongData(vals.map(_.longValue).toArray), // BigInt.longValue = raw bits
        LongData(Array.fill(vals.length)(g))))
    group((0 until 1024).map(BigInt(_)), 0L)
    group((0 until 1024).map(Two63 + _), 1L)
    group((0 until 1024).map(i => BigInt(1000000 + i)), 2L)
    group((0 until 1024).map(i =>
      if (i % 2 == 0) BigInt(500000 + i) else Two63 + 500000 + i), 3L)
    w.close()
    d
  }

  private def u64Values: Seq[(BigInt, Long)] =
    (0 until 1024).map(i => (BigInt(i), 0L)) ++
      (0 until 1024).map(i => (Two63 + i, 1L)) ++
      (0 until 1024).map(i => (BigInt(1000000 + i), 2L)) ++
      (0 until 1024).map(i =>
        (if (i % 2 == 0) BigInt(500000 + i) else Two63 + 500000 + i, 3L))

  /** Read with the condition; compare against a local evaluation over
    * the known values, on BOTH the compaction and default scan paths;
    * returns the row groups actually read (zone-map pruning proof). */
  private def checkU(cond: String, local: ((BigInt, Long)) => Boolean): Long = {
    val exp = u64Values.filter(local)
      .map { case (v, g) => (new java.math.BigDecimal(v.bigInteger), g) }.toSet
    var groupsRead = -1L
    for (keep <- Seq("0.9", "0.0")) {
      val df = spark.read.format("fls").option("filter_keep_ratio", keep)
        .load(u64Dir).filter(cond)
      val got = df.collect()
        .map(r => (r.getDecimal(0).setScale(0), r.getLong(1))).toSet
      assert(got == exp, s"[$cond] keep=$keep: got ${got.size} rows, " +
        s"expected ${exp.size}; missing=${(exp -- got).take(3)} " +
        s"extra=${(got -- exp).take(3)}")
      if (keep == "0.9") {
        val scan = df.queryExecution.executedPlan.collectFirst {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        }.get
        groupsRead = scan.metrics("rowGroupsRead").value
      }
    }
    assert(exp.nonEmpty, s"degenerate test [$cond]")
    groupsRead
  }

  test("u64 pushed filters straddling Long.MaxValue are exact and prune") {
    // whole high half: groups 0 and 2 prune by zone map; the straddler
    // cannot (conservative) — 2 of 4 groups read
    assert(checkU(s"u >= ${Two63}", t => t._1 >= Two63) == 2L)
    // point lookup past Long.MaxValue: the high group survives, plus
    // the straddler (its unsigned bounds are unknowable from signed
    // stats — always kept); groups 0 and 2 prune
    assert(checkU(s"u = ${Two63 + 17}", t => t._1 == Two63 + 17) == 2L)
    // low range: high group prunes; g0 + straddler read
    assert(checkU("u < 1024", t => t._1 < 1024) <= 2L)
    // In-set mixing both halves
    checkU(s"u IN (5, ${Two63 + 5}, ${Two63 + 500001})",
      t => t._1 == 5 || t._1 == Two63 + 5 || t._1 == Two63 + 500001)
    // range confined to the low half, crossing two low groups
    checkU(s"u > 1000000 AND u < ${Two63}",
      t => t._1 > 1000000 && t._1 < Two63)
    // unsigned max value present nowhere: clean empty result
    val none = spark.read.format("fls").load(u64Dir)
      .filter("u = 18446744073709551615").collect()
    assert(none.isEmpty)
  }

  test("u64 literals outside [0, 2^64) or fractional drop to the residual, exactly") {
    // 2^64 + 3 overflows the domain: no pushdown crash, correct (empty) result
    assert(spark.read.format("fls").load(u64Dir)
      .filter("u = CAST('18446744073709551619' AS DECIMAL(21,0))").count() == 0L)
    // fractional literal: only exact non-matches
    assert(spark.read.format("fls").load(u64Dir)
      .filter("u = CAST(5.5 AS DECIMAL(21,1))").count() == 0L)
  }

  test("u8/u16/u32 pushed filters compare exactly across the signed boundary") {
    val d = Files.createTempDirectory("fls-u32-filter").toString
    val cols = Array(
      ColumnDesc("a", ColumnType(TypeTag.UINT8)),
      ColumnDesc("b", ColumnType(TypeTag.UINT16)),
      ColumnDesc("c", ColumnType(TypeTag.UINT32)))
    val w = new FlsFileWriter(
      new org.apache.hadoop.fs.Path(s"$d/u.fls"), new Configuration(), cols)
    val n = 256
    val a8 = (0 until n).map(_.toLong)                    // 0..255
    val b16 = (0 until n).map(i => 65535L - i)            // high u16
    val c32 = (0 until n).map(i => 4294967295L - i)       // high u32
    w.writeRowGroup(Array(LongData(a8.toArray), LongData(b16.toArray),
      LongData(c32.toArray)))
    w.close()
    val df = spark.read.format("fls").option("filter_keep_ratio", "0.9").load(d)
    assert(df.filter("a > 200").count() == 55) // 201..255 (past Byte range)
    assert(df.filter("b >= 65530").count() == 6)
    assert(df.filter("c > 4294967290").count() == 5) // past Int range
    assert(df.filter(s"c = 4294967295").count() == 1)
  }
}
