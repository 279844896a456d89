package graft.fls

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._

/** On-disk spec of the `.fls`-analog columnar format.
  *
  * Brand-new binary layout (NOT the reference's FlatBuffers layout — we
  * only read what we write, mirroring the reference's self-describing
  * footer idea, /root/reference/src/reader/fls_reader.cpp:106-143):
  *
  * {{{
  * file   := MAGIC(4) version(u8) rowGroup* footer footerLen(i64) MAGIC(4)
  * footer := schema rowGroupDescriptor*
  * }}}
  *
  * A file holds one table; a table is a list of row groups; each row
  * group holds per-column encoded segments (SURVEY.md §1.1). Vector size
  * is 1024 (the FFOR/ALP block unit, ≙ fastlanes::CFG::VEC_SZ); default
  * row-group size is 64 * 1024 = 65,536 tuples, matching the reference
  * writer default (/root/reference/src/include/writer/fls_writer.hpp:14).
  *
  * NULLs are not supported by the format (reference parity:
  * /root/reference/src/reader/fls_reader.cpp:200-210); the writer
  * rejects null input and the reader declares nullable=false.
  */
object Format {
  val Magic: Array[Byte] = "FLS1".getBytes(StandardCharsets.US_ASCII)
  val Version: Byte = 1
  val VecSize: Int = 1024
  val DefaultVecsPerRowGroup: Int = 64
  val DefaultRowGroupSize: Int = VecSize * DefaultVecsPerRowGroup
  /** Scan emits 2 vectors per batch like the reference
    * (/root/reference/src/reader/fls_reader.cpp:430). 4096 (Spark's
    * parquet granularity) was tried at 64× and measured no better —
    * the dict-scan gap is not per-batch overhead. */
  val BatchSize: Int = VecSize * 2

  /** Logical type tags persisted in the footer.
    *
    * LIST is MATERIALIZED (beyond the reference, which only declares the
    * token, /root/reference/src/reader/translation_utils.cpp:33-40): a
    * LIST column stores per-row lengths plus the flattened element
    * stream, each through the normal scalar codecs — the layout an
    * embedding column (`ARRAY<FLOAT>`) needs to live in the format. The
    * element's scalar tag rides in the ColumnType's `precision` field
    * (the footer already persists it), so the footer byte layout is
    * unchanged. STRUCT/MAP remain declared placeholders like the
    * reference; writing or reading one fails with an explicit "declared
    * but not materialized" error instead of an unknown-tag crash. */
  object TypeTag {
    val BOOLEAN = 0; val INT8 = 1; val INT16 = 2; val INT32 = 3
    val INT64 = 4; val FLOAT = 5; val DOUBLE = 6; val STRING = 7
    val BINARY = 8; val DATE = 9; val TIMESTAMP = 10; val DECIMAL = 11
    val TIMESTAMP_NTZ = 12; val BIG_DECIMAL = 13
    val LIST = 14; val STRUCT = 15; val MAP = 16
    /** Unsigned tokens — READ-SIDE ONLY (≙ reference UINT8–64, which it
      * widens wholesale to UBIGINT, translation_utils.cpp:19-24). Spark
      * has no unsigned types, so each widens to the smallest LOSSLESS
      * signed/decimal type: u8→SHORT, u16→INT, u32→BIGINT,
      * u64→DECIMAL(20,0) (the SURVEY §1 mapping). Our writer never
      * emits them (fromSpark has no unsigned source). */
    val UINT8 = 17; val UINT16 = 18; val UINT32 = 19; val UINT64 = 20
    /** All three nested tokens are now materialized; kept for the
      * nested-in-nested rejection checks. */
    def isNestedTag(tag: Int): Boolean = tag == LIST || tag == STRUCT || tag == MAP
    def name(tag: Int): String = tag match {
      case LIST => "LIST"; case STRUCT => "STRUCT"; case MAP => "MAP"
      case other => other.toString
    }
  }

  /** Encoding tokens. Each column segment in each row group carries one;
    * the chain semantics (dict codes / ALP ints are themselves
    * FFOR-packed) live inside the codec (SURVEY.md §2.A'). */
  object Enc {
    val PLAIN = 0        // K1: verbatim values
    val CONSTANT = 1     // K2: whole-row-group single value
    val FFOR = 2         // K3: per-1024-block frame-of-reference + bit-pack
    val DICT = 3         // K7/K8: dictionary + FFOR-packed codes
    val RLE = 4          // K13/K14: run values + FFOR-packed run lengths
                         //   (runs span the whole row group = cross_rle)
    val ALP = 5          // K5: doubles as scaled ints + slpatch-style
                         //   patched exceptions (K4)
    val FSST = 6         // K9: FSST-compressed strings
    val FSST_DICT = 7    // K10: dictionary whose values are FSST-compressed
    val FREQ = 8         // K15: frequent value + exception (pos, value) lists
    val ALP_RD = 9       // K6: ALP-RD "real doubles": front-bits dict +
                         //   raw right bits
    val FSST12 = 10      // K11: FSST with 12-bit codes
    val FSST12_DICT = 11 // K12: dictionary with FSST12-compressed values
    val EQUAL = 12       // MCC EXP_EQUAL: payload is the source column
                         //   index; this column's row-group values equal
                         //   that column's (≙ reference cross-column
                         //   encoding, fls_reader.cpp:43-82 — the reader
                         //   widens its reads to cover the dependency)
    val TRANSPOSED = 13  // K16: FastLanes interleaved ("transposed")
                         //   1024-value layout around an inner numeric
                         //   encoding; payload = inner tag byte + inner
                         //   payload. Opt-in via writer option
                         //   `transpose` — default off, matching the
                         //   reference's FLS_NO_TRANSPOSE=ON build
                         //   (/root/reference/CMakeLists.txt:3-7)
    val ARRAY = 14       // LIST columns: per-row lengths + flattened
                         //   element values, EACH a nested scalar
                         //   segment (tag byte + payload) chosen by the
                         //   normal encoder — so constant-length
                         //   embeddings pay one CONSTANT lengths
                         //   sub-segment and the element stream gets
                         //   FFOR/ALP/dict like any scalar column
    val MAP = 15         // MAP columns: per-row entry counts + the
                         //   flattened key stream + value stream, each
                         //   a nested scalar segment like ARRAY
    val EXP_DICT = 16    // MCC external dictionary (≙ reference
                         //   EXP_DICT_* operator tokens with a
                         //   dependency column, fls_reader.cpp:43-82,
                         //   583-590): payload = source column index +
                         //   FFOR codes; row i = source.values(codes(i)).
                         //   READ-SIDE ONLY — our writer never emits it
                         //   (it always materializes the cheaper EQUAL
                         //   or an in-segment DICT), but externally
                         //   written files carrying it must not
                         //   misread; the reader widens its reads to
                         //   the dependency column like EQUAL.
  }

  /** Physical representation a logical type decodes through. */
  object Phys {
    val LONG = 0   // bool/int8..64/date/ts/decimal(<=18)
    val DOUBLE = 1 // float/double
    val BYTES = 2  // string/binary/decimal(>18)
    val ARRAY = 3  // list: offsets + one nested physical stream
    val STRUCT = 4 // struct parent marker: zero bytes of its own
    val MAP = 5    // map: offsets + key stream + value stream
  }

  def physOf(tag: Int): Int = tag match {
    case TypeTag.FLOAT | TypeTag.DOUBLE => Phys.DOUBLE
    case TypeTag.STRING | TypeTag.BINARY | TypeTag.BIG_DECIMAL => Phys.BYTES
    case TypeTag.LIST => Phys.ARRAY
    case TypeTag.STRUCT => Phys.STRUCT
    case TypeTag.MAP => Phys.MAP
    case _ => Phys.LONG
  }

  /** Array ELEMENT physical stream. Differs from [[physOf]] on one tag:
    * FLOAT elements store their raw 32-bit patterns as longs instead of
    * widening to doubles — embeddings are high-entropy reals where ALP
    * rarely applies, and FFOR over u32 bit patterns caps the cost at
    * 4 bytes/element (the scalar double path would pay 8 on PLAIN
    * fallback) while CONSTANT/DICT/RLE still fire on low-entropy data. */
  def elemPhysOf(tag: Int): Int =
    if (tag == TypeTag.FLOAT) Phys.LONG else physOf(tag)

  /** For LIST, `precision` carries the ELEMENT's scalar tag (elements
    * with their own precision/scale — decimals — are not supported, so
    * the field is free); `scale` stays 0.
    *
    * For STRUCT, `precision` carries the CHILD COUNT: the struct's
    * fields are the next `precision` columns of the footer, named
    * `<parent>.<field>` — ordinary columns with their own segments, so
    * encodings, stats, zone maps, and MCC apply to them unchanged.
    *
    * For MAP, `precision` carries the KEY scalar tag and `scale` the
    * VALUE scalar tag (decimal keys/values unsupported, so both fields
    * are free). The footer byte layout is unchanged for all three. */
  final case class ColumnType(tag: Int, precision: Int = 0, scale: Int = 0) {
    /** Element type of a LIST column. */
    def elem: ColumnType = {
      require(tag == TypeTag.LIST, s"fls: elem of non-LIST tag $tag")
      ColumnType(precision)
    }
    /** Key / value types of a MAP column. */
    def mapKey: ColumnType = {
      require(tag == TypeTag.MAP, s"fls: mapKey of non-MAP tag $tag")
      ColumnType(precision)
    }
    def mapValue: ColumnType = {
      require(tag == TypeTag.MAP, s"fls: mapValue of non-MAP tag $tag")
      ColumnType(scale)
    }
    def toSpark: DataType = tag match {
      case TypeTag.MAP =>
        // the format stores no NULLs, map values included
        MapType(mapKey.toSpark, mapValue.toSpark, valueContainsNull = false)
      case TypeTag.STRUCT =>
        throw new UnsupportedOperationException(
          "fls: a STRUCT ColumnType resolves only in footer context " +
            "(its fields are the following columns) — use TableDesc.sparkSchema")
      case TypeTag.LIST =>
        // the format stores no NULLs, elements included
        ArrayType(elem.toSpark, containsNull = false)
      case TypeTag.BOOLEAN => BooleanType
      case TypeTag.INT8 => ByteType
      case TypeTag.INT16 => ShortType
      case TypeTag.INT32 => IntegerType
      case TypeTag.INT64 => LongType
      case TypeTag.FLOAT => FloatType
      case TypeTag.DOUBLE => DoubleType
      case TypeTag.STRING => StringType
      case TypeTag.BINARY => BinaryType
      case TypeTag.DATE => DateType
      case TypeTag.TIMESTAMP => TimestampType
      case TypeTag.TIMESTAMP_NTZ => TimestampNTZType
      case TypeTag.DECIMAL | TypeTag.BIG_DECIMAL => DecimalType(precision, scale)
      case TypeTag.UINT8 => ShortType
      case TypeTag.UINT16 => IntegerType
      case TypeTag.UINT32 => LongType
      case TypeTag.UINT64 => DecimalType(20, 0)
    }
  }

  object ColumnType {
    /** Spark → format mapping (SURVEY.md §1.2 / §1.3). Unsupported types
      * (nested, interval…) are rejected like the reference writer
      * (/root/reference/src/writer/fls_view_writer.cpp:92). */
    def fromSpark(dt: DataType): ColumnType = dt match {
      case BooleanType => ColumnType(TypeTag.BOOLEAN)
      case ByteType => ColumnType(TypeTag.INT8)
      case ShortType => ColumnType(TypeTag.INT16)
      case IntegerType => ColumnType(TypeTag.INT32)
      case LongType => ColumnType(TypeTag.INT64)
      case FloatType => ColumnType(TypeTag.FLOAT)
      case DoubleType => ColumnType(TypeTag.DOUBLE)
      case StringType => ColumnType(TypeTag.STRING)
      case BinaryType => ColumnType(TypeTag.BINARY)
      case DateType => ColumnType(TypeTag.DATE)
      case TimestampType => ColumnType(TypeTag.TIMESTAMP)
      case TimestampNTZType => ColumnType(TypeTag.TIMESTAMP_NTZ)
      case d: DecimalType if d.precision <= 18 =>
        ColumnType(TypeTag.DECIMAL, d.precision, d.scale)
      case d: DecimalType =>
        ColumnType(TypeTag.BIG_DECIMAL, d.precision, d.scale)
      case ArrayType(et, _) =>
        // LIST of any scalar element (beyond the reference, which only
        // declares the token). containsNull on the INPUT schema is
        // accepted — the writer rejects actual null elements at runtime,
        // like it rejects null scalars; decimal elements would need
        // their own precision/scale slot and stay unsupported.
        val e = fromSpark(et)
        if (TypeTag.isNestedTag(e.tag))
          throw new UnsupportedOperationException(
            s"fls: nested element type $et — only arrays of scalars are materialized")
        if (e.precision != 0 || e.scale != 0)
          throw new UnsupportedOperationException(
            s"fls: array of decimal ($et) is not supported — cast the elements " +
              "to DOUBLE or store unscaled longs")
        ColumnType(TypeTag.LIST, e.tag, 0)
      case _: StructType =>
        // STRUCT materializes via flattening (physicalColumns), not as
        // a single scalar ColumnType — reaching here means a struct in
        // a position that can't flatten (array element, struct field)
        throw new UnsupportedOperationException(
          s"fls: struct type $dt materializes only as a TOP-LEVEL column " +
            "(Format.physicalColumns) — flatten or serialize nested placements")
      case MapType(kt, vt, _) =>
        // MAP of scalar keys/values (beyond the reference, which only
        // declares the token): offsets + key stream + value stream.
        // valueContainsNull on the INPUT schema is accepted — actual
        // null values are rejected at runtime like null scalars.
        val k = fromSpark(kt)
        val v = fromSpark(vt)
        if (TypeTag.isNestedTag(k.tag) || TypeTag.isNestedTag(v.tag))
          throw new UnsupportedOperationException(
            s"fls: nested map key/value type in $dt — only maps of scalars " +
              "are materialized")
        if (k.precision != 0 || k.scale != 0 || v.precision != 0 || v.scale != 0)
          throw new UnsupportedOperationException(
            s"fls: map of decimal ($dt) is not supported — cast to DOUBLE " +
              "or store unscaled longs")
        ColumnType(TypeTag.MAP, k.tag, v.tag)
      case other =>
        throw new UnsupportedOperationException(
          s"fls: unsupported column type $other")
    }
  }

  /** Pairwise type promotion across row groups / files (≙ reference
    * SchemaBuilder::PromoteType, /root/reference/src/reader/
    * schema_builder.cpp:132-172): widest signed integer, FLOAT∪DOUBLE →
    * DOUBLE, decimals widen to cover both; incompatible pairs throw
    * (schema_builder.cpp:230-236). */
  def promote(a: ColumnType, b: ColumnType): ColumnType = {
    import TypeTag._
    if (a == b) return a
    val intRank = Map(INT8 -> 0, INT16 -> 1, INT32 -> 2, INT64 -> 3)
    (a.tag, b.tag) match {
      case (x, y) if intRank.contains(x) && intRank.contains(y) =>
        if (intRank(x) >= intRank(y)) a else b
      case (FLOAT, DOUBLE) | (DOUBLE, FLOAT) => ColumnType(DOUBLE)
      case (x, y) if (x == DECIMAL || x == BIG_DECIMAL) && (y == DECIMAL || y == BIG_DECIMAL) =>
        val s = math.max(a.scale, b.scale)
        val p = math.min(38, math.max(a.precision - a.scale, b.precision - b.scale) + s)
        ColumnType(if (p <= 18) DECIMAL else BIG_DECIMAL, p, s)
      case _ =>
        throw new IllegalArgumentException(
          s"fls: incompatible types for schema merge: $a vs $b")
    }
  }

  /** Per-column, per-row-group segment descriptor: where the bytes live
    * and how they decode, plus min/max zone-map stats for LONG/DOUBLE
    * physical columns, and — beyond the reference, which is stats-less
    * on strings (/root/reference/src/reader/row_group_statistics.cpp:
    * 60-152) — bounded min/max byte PREFIXES for BYTES columns:
    * `minBytes` lower-bounds and `maxBytes` upper-bounds every value
    * under unsigned-lexicographic order (truncated maxima increment
    * their last byte, parquet-style, to stay an upper bound). LLM
    * corpora filter on string keys constantly; these make those filters
    * prune row groups. `hasStats` stays a NUMERIC-only flag — the CBO /
    * metadata-aggregate / TopN paths that read minLong/minDouble key off
    * it and must never see a string segment as "has stats". */
  final case class SegmentDesc(
      encoding: Int,
      offset: Long,
      length: Long,
      hasStats: Boolean,
      minLong: Long, maxLong: Long,
      minDouble: Double, maxDouble: Double,
      minBytes: Array[Byte] = null, maxBytes: Array[Byte] = null,
      byteStatsExact: Boolean = false,
      /** LIST segments only: minLong/maxLong carry the row group's
        * min/max ELEMENT COUNT (the values themselves have no order).
        * Powers virtual `<col>_size` zone-map pruning. */
      elemCountStats: Boolean = false) {
    def hasByteStats: Boolean = minBytes != null && maxBytes != null
  }

  final case class RowGroupDesc(nTuples: Int, segments: Array[SegmentDesc])

  final case class ColumnDesc(name: String, colType: ColumnType)

  /** Recursive by-name schema union for multi-file binds
    * (`union_by_name`): columns union in first-seen order, scalar types
    * promote along [[promote]]'s lattice, STRUCT columns union their
    * fields recursively (a field absent from some file's struct reads
    * as NULL there — the reader's per-file child binding serves it), a
    * column absent from some file entirely is nullable. Struct-vs-scalar
    * for one name is incompatible and throws, like any other
    * unpromotable pair. Extends the reference's flat union bind
    * (/root/reference/src/reader/fls_multi_file_info.cpp:75-81), which
    * has no struct support to extend. */
  def unionByName(schemas: Seq[StructType]): StructType = {
    val order = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.ArrayBuffer[DataType]]()
    schemas.foreach(_.fields.foreach { f =>
      order.getOrElseUpdate(f.name,
        scala.collection.mutable.ArrayBuffer[DataType]()) += f.dataType
    })
    StructType(order.map { case (name, types) =>
      val structs = types.collect { case s: StructType => s }
      val merged: DataType =
        if (structs.nonEmpty) {
          require(structs.length == types.length,
            s"fls: column '$name' is a STRUCT in some files and " +
              s"${types.find(!_.isInstanceOf[StructType]).get.simpleString} in others")
          unionByName(structs.toSeq)
        } else types.map(ColumnType.fromSpark).reduce(promote).toSpark
      StructField(name, merged, nullable = types.length != schemas.length)
    }.toArray)
  }

  /** StructField metadata key carrying a RENAMED column's full name
    * history (oldest first) — written by `ALTER TABLE RENAME COLUMN`
    * ([[graft.fls.connector.FlsCatalog]]), consumed by [[applyRenames]]
    * so files written under any earlier name still bind. */
  val PreviousNamesKey = "fls.previous_names"

  /** The name history a field accumulated through renames ([]= never
    * renamed). */
  def previousNames(f: StructField): Seq[String] =
    if (f.metadata.contains(PreviousNamesKey))
      f.metadata.getStringArray(PreviousNamesKey).toSeq
    else Nil

  /** Schema-evolution rename reconciliation, applied ONCE per footer at
    * planning: a file that stores a column under an EARLIER name (the
    * table renamed it since the file was written) has its descriptor
    * renamed to the current name — every downstream consumer (zone maps,
    * decode binding, stats, row filters) then sees the file as if it had
    * been written under the current schema. Struct children follow their
    * parent's rename (`old.child` → `new.child`). No-op (same array)
    * when the schema carries no rename history or the file already uses
    * current names. */
  def applyRenames(desc: TableDesc, schema: StructType): TableDesc = {
    val renamed = schema.fields.filter(f => previousNames(f).nonEmpty)
    if (renamed.isEmpty) return desc
    val fileNames = desc.columns.map(_.name).toSet
    // map old-name → current-name, only for fields the file does NOT
    // already store under the current name (a rebuilt/compacted file
    // uses current names; nothing to do)
    val mapping = scala.collection.mutable.HashMap[String, String]()
    renamed.foreach { f =>
      if (!fileNames.contains(f.name))
        previousNames(f).reverseIterator.find(fileNames.contains)
          .foreach(oldName => mapping(oldName) = f.name)
    }
    if (mapping.isEmpty) return desc
    val cols = desc.columns.map { c =>
      mapping.get(c.name) match {
        case Some(cur) => c.copy(name = cur)
        case None =>
          val dot = c.name.indexOf('.')
          if (dot > 0) mapping.get(c.name.substring(0, dot)) match {
            case Some(cur) => c.copy(name = cur + c.name.substring(dot))
            case None => c
          } else c
      }
    }
    desc.copy(columns = cols)
  }

  /** The single ColumnType `name` carries across ALL tables, or None
    * when absent somewhere or stored at differing types/scales — the
    * shared soundness predicate for every shortcut that compares
    * PHYSICAL footer stats across files (MIN/MAX pushdown, TopN
    * pruning, CBO column stats): unscaled values at mixed scales are
    * incomparable. */
  def uniformColType(tables: Seq[TableDesc], name: String): Option[ColumnType] = {
    val types = tables.map(_.columns.find(_.name == name).map(_.colType))
    if (tables.nonEmpty && types.forall(_.isDefined) && types.distinct.length == 1) types.head
    else None
  }

  final case class TableDesc(
      columns: Array[ColumnDesc],
      rowGroups: Array[RowGroupDesc]) {
    def numRows: Long = rowGroups.map(_.nTuples.toLong).sum
    /** Logical schema: a STRUCT parent column (precision = k) absorbs
      * the next k dotted child columns back into one StructField. */
    def sparkSchema: StructType = {
      val fields = scala.collection.mutable.ArrayBuffer[StructField]()
      var i = 0
      while (i < columns.length) {
        val c = columns(i)
        if (c.colType.tag == TypeTag.STRUCT) {
          val k = c.colType.precision
          require(i + k < columns.length,
            s"fls: corrupt footer — struct '${c.name}' declares $k fields past the column list")
          val children = (1 to k).map { j =>
            val ch = columns(i + j)
            require(ch.name.startsWith(c.name + "."),
              s"fls: corrupt footer — '${ch.name}' is not a field of struct '${c.name}'")
            StructField(ch.name.substring(c.name.length + 1),
              ch.colType.toSpark, nullable = false)
          }
          fields += StructField(c.name, StructType(children), nullable = false)
          i += k + 1
        } else {
          fields += StructField(c.name, c.colType.toSpark, nullable = false)
          i += 1
        }
      }
      StructType(fields.toArray)
    }
  }

  /** Physical (footer) descriptors for a logical row schema: a
    * `STRUCT<scalar, ...>` field flattens into a parent marker column
    * (tag STRUCT, precision = #fields, zero-byte segments) followed by
    * `<parent>.<field>` child columns. Children are restricted to the
    * non-decimal scalar set (like array elements); nesting deeper than
    * one struct level is not materialized. */
  def physicalColumns(fields: Seq[StructField]): Array[ColumnDesc] = {
    val out = scala.collection.mutable.ArrayBuffer[ColumnDesc]()
    fields.foreach { f =>
      f.dataType match {
        case st: StructType =>
          require(st.fields.nonEmpty, s"fls: empty struct '${f.name}'")
          require(!f.name.contains('.'),
            s"fls: struct column name '${f.name}' must not contain '.'")
          val children = st.fields.map { ch =>
            val ct = ch.dataType match {
              case _: StructType | _: ArrayType | _: MapType =>
                throw new UnsupportedOperationException(
                  s"fls: struct field '${f.name}.${ch.name}' of type " +
                    s"${ch.dataType.simpleString} — only one level of struct " +
                    "over scalars is materialized")
              case _: DecimalType =>
                throw new UnsupportedOperationException(
                  s"fls: struct field '${f.name}.${ch.name}' is a decimal — " +
                    "cast to DOUBLE or store unscaled longs")
              case other => ColumnType.fromSpark(other)
            }
            ColumnDesc(s"${f.name}.${ch.name}", ct)
          }
          out += ColumnDesc(f.name, ColumnType(TypeTag.STRUCT, st.fields.length, 0))
          out ++= children
        case other =>
          out += ColumnDesc(f.name, ColumnType.fromSpark(other))
      }
    }
    out.toArray
  }

  // ---- footer serialization (little-endian, via ByteIO) ----

  def writeFooter(out: ByteWriter, t: TableDesc): Unit = {
    out.writeInt(t.columns.length)
    t.columns.foreach { c =>
      out.writeString(c.name)
      out.writeInt(c.colType.tag)
      out.writeInt(c.colType.precision)
      out.writeInt(c.colType.scale)
    }
    out.writeInt(t.rowGroups.length)
    t.rowGroups.foreach { rg =>
      out.writeInt(rg.nTuples)
      require(rg.segments.length == t.columns.length)
      rg.segments.foreach { s =>
        out.writeByte(s.encoding)
        out.writeLong(s.offset)
        out.writeLong(s.length)
        // flags: bit0 = numeric stats valid, bit1 = byte-prefix stats
        // follow, bit2 = byte stats are EXACT (untruncated min/max —
        // usable as aggregate answers, not just pruning bounds), bit3 =
        // minLong/maxLong are LIST element-count bounds
        out.writeByte((if (s.hasStats) 1 else 0) | (if (s.hasByteStats) 2 else 0) |
          (if (s.byteStatsExact) 4 else 0) | (if (s.elemCountStats) 8 else 0))
        out.writeLong(s.minLong); out.writeLong(s.maxLong)
        out.writeDouble(s.minDouble); out.writeDouble(s.maxDouble)
        if (s.hasByteStats) {
          out.writeInt(s.minBytes.length); out.writeBytes(s.minBytes)
          out.writeInt(s.maxBytes.length); out.writeBytes(s.maxBytes)
        }
      }
    }
  }

  def readFooter(in: ByteReader): TableDesc = {
    val nCols = in.readInt()
    val cols = Array.fill(nCols) {
      val name = in.readString()
      val tag = in.readInt(); val p = in.readInt(); val s = in.readInt()
      ColumnDesc(name, ColumnType(tag, p, s))
    }
    val nRg = in.readInt()
    val rgs = Array.fill(nRg) {
      val n = in.readInt()
      val segs = Array.fill(nCols) {
        val enc = in.readByte().toInt
        val off = in.readLong(); val len = in.readLong()
        val flags = in.readByte().toInt
        val mnL = in.readLong(); val mxL = in.readLong()
        val mnD = in.readDouble(); val mxD = in.readDouble()
        val (mnB, mxB) =
          if ((flags & 2) != 0)
            (in.readBytes(in.readInt()), in.readBytes(in.readInt()))
          else (null, null)
        SegmentDesc(enc, off, len, (flags & 1) != 0, mnL, mxL, mnD, mxD, mnB, mxB,
          (flags & 4) != 0, (flags & 8) != 0)
      }
      RowGroupDesc(n, segs)
    }
    TableDesc(cols, rgs)
  }
}
