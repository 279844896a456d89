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
class FlsUnsignedSpec extends AnyFunSuite {

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
}
