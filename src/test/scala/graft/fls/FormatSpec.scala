package graft.fls

import org.scalatest.funsuite.AnyFunSuite

import graft.fls.Format._

class FormatSpec extends AnyFunSuite {

  test("footer round-trips descriptors bit-for-bit") {
    val rng = new scala.util.Random(23)
    val cols = Array(
      ColumnDesc("a", ColumnType(TypeTag.INT64)),
      ColumnDesc("名前", ColumnType(TypeTag.STRING)),
      ColumnDesc("d", ColumnType(TypeTag.DECIMAL, 12, 4)))
    val rgs = Array.fill(5) {
      RowGroupDesc(rng.nextInt(65536) + 1, Array.fill(3) {
        SegmentDesc(rng.nextInt(12), rng.nextLong().abs, rng.nextInt(1 << 20).toLong,
          rng.nextBoolean(), rng.nextLong(), rng.nextLong(),
          rng.nextDouble() * 1e10 - 5e9, rng.nextDouble() * 1e10)
      })
    }
    val t = TableDesc(cols, rgs)
    val w = new ByteWriter()
    Format.writeFooter(w, t)
    val back = Format.readFooter(new ByteReader(w.toArray))
    assert(back.columns.toSeq == t.columns.toSeq)
    assert(back.rowGroups.length == t.rowGroups.length)
    back.rowGroups.zip(t.rowGroups).foreach { case (x, y) =>
      assert(x.nTuples == y.nTuples)
      assert(x.segments.toSeq == y.segments.toSeq)
    }
  }

  test("promote: symmetric, idempotent, widening") {
    import TypeTag._
    val ints = Seq(ColumnType(INT8), ColumnType(INT16), ColumnType(INT32), ColumnType(INT64))
    for (a <- ints; b <- ints) {
      assert(Format.promote(a, b) == Format.promote(b, a))
      assert(Format.promote(a, a) == a)
      val p = Format.promote(a, b)
      assert(p == a || p == b)
    }
    assert(Format.promote(ColumnType(FLOAT), ColumnType(DOUBLE)) == ColumnType(DOUBLE))
    // decimal widening covers both integer and fraction digits
    val d1 = ColumnType(DECIMAL, 10, 2)
    val d2 = ColumnType(DECIMAL, 12, 4)
    assert(Format.promote(d1, d2) == ColumnType(DECIMAL, 12, 4))
    val d3 = ColumnType(DECIMAL, 18, 0)
    assert(Format.promote(d3, d2) == ColumnType(BIG_DECIMAL, 22, 4))
    intercept[IllegalArgumentException](Format.promote(ColumnType(INT64), ColumnType(STRING)))
    intercept[IllegalArgumentException](Format.promote(ColumnType(INT64), ColumnType(DOUBLE)))
  }

  test("nested type tokens round-trip in footers and materialize") {
    import TypeTag._
    // the tags serialize like any other (a catalog can carry them)...
    val cols = Array(
      ColumnDesc("l", ColumnType(LIST)),
      ColumnDesc("s", ColumnType(STRUCT)),
      ColumnDesc("m", ColumnType(MAP)))
    val t = TableDesc(cols, Array.empty)
    val w = new ByteWriter()
    Format.writeFooter(w, t)
    val back = Format.readFooter(new ByteReader(w.toArray))
    assert(back.columns.toSeq == cols.toSeq)
    // LIST, STRUCT, and MAP are ALL materialized now
    assert(ColumnType(LIST, FLOAT).toSpark ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    assert(ColumnType(MAP, STRING, INT64).toSpark ==
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.LongType, valueContainsNull = false))
    // a STRUCT ColumnType resolves only in footer context (its fields
    // are the following columns)
    val eS = intercept[UnsupportedOperationException](ColumnType(STRUCT).toSpark)
    assert(eS.getMessage.contains("footer context"), eS.getMessage)
    assert(isNestedTag(LIST) && isNestedTag(STRUCT) && isNestedTag(MAP) &&
      !isNestedTag(STRING))
  }

  test("writer accepts arrays/maps of scalars and flattens structs; rejects deep nesting") {
    import org.apache.spark.sql.types._
    assert(ColumnType.fromSpark(ArrayType(LongType)) ==
      ColumnType(TypeTag.LIST, TypeTag.INT64, 0))
    assert(ColumnType.fromSpark(MapType(StringType, LongType)) ==
      ColumnType(TypeTag.MAP, TypeTag.STRING, TypeTag.INT64))
    // top-level struct flattens into a parent marker + dotted children
    val cols = Format.physicalColumns(Seq(
      StructField("id", LongType),
      StructField("m", new StructType().add("x", LongType).add("s", StringType))))
    assert(cols.map(_.name).toSeq == Seq("id", "m", "m.x", "m.s"))
    assert(cols(1).colType == ColumnType(TypeTag.STRUCT, 2, 0))
    // ...but a struct outside a flattenable position still fails loudly
    val e1 = intercept[UnsupportedOperationException](
      ColumnType.fromSpark(new StructType().add("x", LongType)))
    assert(e1.getMessage.contains("TOP-LEVEL"), e1.getMessage)
    val e2 = intercept[UnsupportedOperationException](
      ColumnType.fromSpark(MapType(StringType, ArrayType(LongType))))
    assert(e2.getMessage.contains("maps of scalars"), e2.getMessage)
    val e3 = intercept[UnsupportedOperationException](
      ColumnType.fromSpark(ArrayType(ArrayType(LongType))))
    assert(e3.getMessage.contains("arrays of scalars"), e3.getMessage)
  }

  test("writer abort removes the partial file") {
    val dir = java.nio.file.Files.createTempDirectory("fls-abort")
    val p = new org.apache.hadoop.fs.Path(dir.toString, "x.fls")
    val conf = new org.apache.hadoop.conf.Configuration()
    val w = new FlsFileWriter(p, conf, Array(ColumnDesc("a", ColumnType(TypeTag.INT64))))
    w.writeRowGroup(Array(LongData(Array(1L, 2L, 3L))))
    w.abort()
    assert(!new java.io.File(p.toString).exists())
  }
}
