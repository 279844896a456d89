package graft.fls

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.fls.Format._
import graft.fls.connector.{FlsInputPartition, FlsPartitionReader}

/** MCC external dictionary (EXP_DICT) read fallback: our writer never
  * emits it, but a file carrying it (reference EXP_DICT_* with a
  * dependency column) must materialize correctly — the reader widens to
  * the dependency column's segment and gathers through the codes. The
  * file here is synthetic: segments laid out by hand, descriptors built
  * directly, the reader driven through its public InputPartition
  * surface. */
class FlsExpDictSpec extends AnyFunSuite {

  private def seg(enc: Int, off: Long, len: Long) =
    SegmentDesc(enc, off, len, hasStats = false, 0L, 0L, 0.0, 0.0)

  private def readAll(reader: FlsPartitionReader,
      get: org.apache.spark.sql.vectorized.ColumnarBatch => Seq[Seq[Any]]): Seq[Seq[Any]] = {
    val out = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    while (reader.next()) out ++= get(reader.get())
    reader.close()
    out.toSeq
  }

  test("EXP_DICT string column gathers through the dependency column") {
    val tmp = Files.createTempDirectory("fls-expdict").toString
    val n = 10
    // dependency column: 3 distinct country names, plain-encoded
    val dictVals = Seq("sweden", "norway", "denmark")
    val dictBytes = dictVals.flatMap(_.getBytes("UTF-8")).toArray
    val dictOffsets = dictVals.scanLeft(0)(_ + _.length).toArray
    val w0 = new ByteWriter()
    Codecs.encodePlainBytes(BytesData(dictOffsets, dictBytes), w0)
    val seg0 = w0.toArray
    // EXP_DICT column: codes into the dependency column
    val codes = Array.tabulate(n)(i => (i % 3).toLong)
    val w1 = new ByteWriter()
    Codecs.encodeExpDict(0, codes, w1)
    val seg1 = w1.toArray
    // a third, ordinary column to prove normal decode coexists
    val ids = Array.tabulate(n)(_.toLong)
    val w2 = new ByteWriter()
    Codecs.encodeFFOR(ids, w2)
    val seg2 = w2.toArray

    val file = new java.io.File(tmp, "synthetic.fls")
    val fos = new java.io.FileOutputStream(file)
    try { fos.write(seg0); fos.write(seg1); fos.write(seg2) } finally fos.close()

    val cols = Array(
      ColumnDesc("country_src", ColumnType(TypeTag.STRING)),
      ColumnDesc("country", ColumnType(TypeTag.STRING)),
      ColumnDesc("id", ColumnType(TypeTag.INT64)))
    val rg = RowGroupDesc(n, Array(
      seg(Enc.PLAIN, 0, seg0.length),
      seg(Enc.EXP_DICT, seg0.length, seg1.length),
      seg(Enc.FFOR, seg0.length + seg1.length, seg2.length)))
    val part = FlsInputPartition.single(file.getAbsolutePath, rg, cols, 0L, 0)
    val schema = StructType(Seq(
      StructField("country", StringType, nullable = false),
      StructField("id", LongType, nullable = false)))
    val reader = new FlsPartitionReader(part, schema, new Configuration())
    val rows = readAll(reader, b => (0 until b.numRows()).map(i =>
      Seq(b.column(0).getUTF8String(i).toString, b.column(1).getLong(i))))
    val exp = (0 until n).map(i => Seq(dictVals(i % 3), i.toLong))
    assert(rows == exp, s"EXP_DICT gather wrong: $rows")
  }

  test("EXP_DICT works when the dependency column is ALSO projected") {
    val tmp = Files.createTempDirectory("fls-expdict2").toString
    val n = 6
    val vals = Seq("aa", "bbb", "c")
    val bytes = vals.flatMap(_.getBytes("UTF-8")).toArray
    val offsets = vals.scanLeft(0)(_ + _.length).toArray
    val w0 = new ByteWriter()
    Codecs.encodePlainBytes(BytesData(offsets, bytes), w0)
    val seg0 = w0.toArray
    val codes = Array.tabulate(n)(i => ((i * 2) % 3).toLong)
    val w1 = new ByteWriter()
    Codecs.encodeExpDict(0, codes, w1)
    val seg1 = w1.toArray
    val file = new java.io.File(tmp, "s.fls")
    val fos = new java.io.FileOutputStream(file)
    try { fos.write(seg0); fos.write(seg1) } finally fos.close()
    val cols = Array(
      ColumnDesc("src", ColumnType(TypeTag.STRING)),
      ColumnDesc("derived", ColumnType(TypeTag.STRING)))
    val rg = RowGroupDesc(n, Array(
      seg(Enc.PLAIN, 0, seg0.length),
      seg(Enc.EXP_DICT, seg0.length, seg1.length)))
    val part = FlsInputPartition.single(file.getAbsolutePath, rg, cols, 0L, 0)
    // NOTE: src has 3 rows, derived has 6 — projecting both from one
    // row group is not meaningful data-wise, but the reader must still
    // serve the EXP_DICT gather; project only `derived` here.
    val schema = StructType(Seq(StructField("derived", StringType, nullable = false)))
    val reader = new FlsPartitionReader(part, schema, new Configuration())
    val rows = readAll(reader, b => (0 until b.numRows()).map(i =>
      Seq(b.column(0).getUTF8String(i).toString)))
    assert(rows == (0 until n).map(i => Seq(vals((i * 2) % 3))))
  }

  test("EXP_DICT over a numeric dependency column") {
    val tmp = Files.createTempDirectory("fls-expdict3").toString
    val n = 8
    val srcVals = Array(100L, 200L, 300L, 400L)
    val w0 = new ByteWriter()
    Codecs.encodeFFOR(srcVals, w0)
    val seg0 = w0.toArray
    val codes = Array.tabulate(n)(i => (i % 4).toLong)
    val w1 = new ByteWriter()
    Codecs.encodeExpDict(0, codes, w1)
    val seg1 = w1.toArray
    val file = new java.io.File(tmp, "s.fls")
    val fos = new java.io.FileOutputStream(file)
    try { fos.write(seg0); fos.write(seg1) } finally fos.close()
    val cols = Array(
      ColumnDesc("src", ColumnType(TypeTag.INT64)),
      ColumnDesc("derived", ColumnType(TypeTag.INT64)))
    val rg = RowGroupDesc(n, Array(
      seg(Enc.FFOR, 0, seg0.length),
      seg(Enc.EXP_DICT, seg0.length, seg1.length)))
    val part = FlsInputPartition.single(file.getAbsolutePath, rg, cols, 0L, 0)
    val schema = StructType(Seq(StructField("derived", LongType, nullable = false)))
    val reader = new FlsPartitionReader(part, schema, new Configuration())
    val rows = readAll(reader, b => (0 until b.numRows()).map(i =>
      Seq(b.column(0).getLong(i))))
    assert(rows == (0 until n).map(i => Seq(srcVals(i % 4))))
  }
}
