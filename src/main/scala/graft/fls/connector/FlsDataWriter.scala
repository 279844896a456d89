package graft.fls.connector

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, WriterCommitMessage}
import org.apache.spark.sql.types._

import graft.fls._
import graft.fls.Format._

/** Per-task writer: buffers rows into columnar builders, flushes a row
  * group at exactly `rowGroupSize` rows, rotates files after
  * `rowGroupsPerFile` row groups (≙ reference Sink + RotateFiles,
  * /root/reference/src/writer/fls_writer.cpp:46-102,189-211). Task
  * leftovers flush as a final short row group — Spark has no cross-task
  * Combine; SURVEY.md §2.A16 documents this divergence. NULL input is
  * rejected (format stores no NULLs, SURVEY.md §1.1).
  *
  * With `partitionBy` non-empty the writer is hive-partitioned: each row
  * routes to a bucket keyed by its partition values, buckets write under
  * `k1=v1/k2=v2/` subdirectories, and the partition columns are NOT
  * stored in the data files (the path is their storage, exactly like
  * Spark's parquet writer). Each open bucket holds one row group of
  * builder memory, so callers writing high-cardinality partitions should
  * `df.repartition(partCols)` first; the `max_open_partitions` guard
  * fails loudly instead of OOMing.
  *
  * Commit protocol (the Spark-cluster analog of the reference writer's
  * finalize/abort pair, /root/reference/src/writer/fls_writer.cpp:332-347):
  * every file is created under `dir/_temporary/<writeId>/<taskUid>/<rel>`
  * — a path unique to this task ATTEMPT, so a speculative duplicate never
  * writes the same bytes stream. On task commit (authorized once per
  * partition by Spark's OutputCommitCoordinator) the temp files are
  * renamed to their deterministic final names; `abort` deletes every
  * temp file this attempt produced, not just the open one. Commit
  * messages carry dir-RELATIVE paths so the job commit's exact-set
  * reconciliation works through partition subdirectories. */
class FlsDataWriter(
    dir: String,
    schema: StructType,
    rowGroupSize: Int,
    rowGroupsPerFile: Int,
    conf: Configuration,
    baseName: String,
    taskUid: String,
    inlineFooter: Boolean = true,
    transpose: Boolean = false,
    partitionBy: Seq[String] = Nil,
    maxOpenPartitions: Int = 1000,
    directWrite: Boolean = false,
    /** Columns to NDV-sketch per file (`ndv_columns` writer option):
      * each closed file's manifest stats carry an [[Hll]] register
      * array for these, merged at plan time into CBO distinct counts.
      * Opt-in — hashing every value costs write CPU, so it belongs on
      * join/group keys, not every column. */
    ndvColumns: Seq[String] = Nil,
    /** Columns to Bloom-sketch per file (`bloom_columns` writer
      * option, manifest tables): each closed file gets a [[Bloom]]
      * sidecar so point lookups (`id = ?`) skip whole files — footer
      * unopened — where zone maps cannot decide (high-cardinality
      * unclustered keys). */
    bloomColumns: Seq[String] = Nil,
    bloomFpp: Double = 0.01)
  extends DataWriter[InternalRow] {

  private val partIdx: Array[Int] = partitionBy.map(schema.fieldIndex).toArray
  private val dataIdx: Array[Int] =
    schema.fields.indices.filterNot(partIdx.contains).toArray
  require(dataIdx.nonEmpty, "fls: cannot partition by every column")
  private val dataFields: Array[StructField] = dataIdx.map(schema.fields)

  /** Physical footer columns: STRUCT fields flatten into a parent
    * marker plus dotted children (see [[Format.physicalColumns]]). */
  private val colDescs: Array[ColumnDesc] = Format.physicalColumns(dataFields.toSeq)
  /** Top-level field ordinal each PHYSICAL builder reads (a struct's
    * marker and children all read the parent ordinal). */
  private val physOrds: Array[Int] = dataFields.zipWithIndex.flatMap { case (f, li) =>
    f.dataType match {
      case st: StructType => Seq.fill(1 + st.fields.length)(dataIdx(li))
      case _ => Seq(dataIdx(li))
    }
  }.toArray

  private sealed trait Builder {
    def add(row: InternalRow, ord: Int): Unit
    def result(): ColData
    def clear(): Unit
  }

  private final class LongBuilder(get: (InternalRow, Int) => Long) extends Builder {
    private var arr = new Array[Long](rowGroupSize)
    private var n = 0
    def add(row: InternalRow, ord: Int): Unit = { arr(n) = get(row, ord); n += 1 }
    def result(): ColData = LongData(java.util.Arrays.copyOf(arr, n))
    def clear(): Unit = n = 0
  }

  private final class DoubleBuilder(get: (InternalRow, Int) => Double) extends Builder {
    private var arr = new Array[Double](rowGroupSize)
    private var n = 0
    def add(row: InternalRow, ord: Int): Unit = { arr(n) = get(row, ord); n += 1 }
    def result(): ColData = DoubleData(java.util.Arrays.copyOf(arr, n))
    def clear(): Unit = n = 0
  }

  private final class BytesBuilder(get: (InternalRow, Int) => Array[Byte]) extends Builder {
    private var offsets = new Array[Int](rowGroupSize + 1)
    private var bytes = new Array[Byte](rowGroupSize * 8)
    private var n = 0
    def add(row: InternalRow, ord: Int): Unit = {
      val b = get(row, ord)
      val end = offsets(n) + b.length
      if (end > bytes.length) {
        var cap = bytes.length
        while (cap < end) cap <<= 1
        bytes = java.util.Arrays.copyOf(bytes, cap)
      }
      System.arraycopy(b, 0, bytes, offsets(n), b.length)
      offsets(n + 1) = end
      n += 1
    }
    def result(): ColData =
      BytesData(java.util.Arrays.copyOf(offsets, n + 1),
        java.util.Arrays.copyOf(bytes, offsets(n)))
    def clear(): Unit = n = 0
  }

  /** LIST columns: per-row offsets + a growable flattened element store.
    * Float elements keep their raw 32-bit patterns as longs (see
    * [[graft.fls.Format.elemPhysOf]]); null ELEMENTS are rejected like
    * null scalars (the format stores no NULLs at any nesting level). */
  private final class ArrayColBuilder(name: String, et: DataType) extends Builder {
    private var offsets = new Array[Int](rowGroupSize + 1)
    private var n = 0

    private sealed trait ElemStore {
      def append(a: org.apache.spark.sql.catalyst.util.ArrayData, j: Int): Unit
      def result(total: Int): ColData
    }
    private final class LongStore(get: (org.apache.spark.sql.catalyst.util.ArrayData, Int) => Long)
      extends ElemStore {
      var arr = new Array[Long](math.max(16, rowGroupSize))
      def append(a: org.apache.spark.sql.catalyst.util.ArrayData, j: Int): Unit = {
        if (offsets(n) + j >= arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
        arr(offsets(n) + j) = get(a, j)
      }
      def result(total: Int): ColData = LongData(java.util.Arrays.copyOf(arr, total))
    }
    private final class DoubleStore extends ElemStore {
      var arr = new Array[Double](math.max(16, rowGroupSize))
      def append(a: org.apache.spark.sql.catalyst.util.ArrayData, j: Int): Unit = {
        if (offsets(n) + j >= arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
        arr(offsets(n) + j) = a.getDouble(j)
      }
      def result(total: Int): ColData = DoubleData(java.util.Arrays.copyOf(arr, total))
    }
    private final class BytesStore(get: (org.apache.spark.sql.catalyst.util.ArrayData, Int) => Array[Byte])
      extends ElemStore {
      var eOffsets = new Array[Int](math.max(16, rowGroupSize) + 1)
      var bytes = new Array[Byte](rowGroupSize * 8)
      def append(a: org.apache.spark.sql.catalyst.util.ArrayData, j: Int): Unit = {
        val e = offsets(n) + j
        if (e + 1 >= eOffsets.length) eOffsets = java.util.Arrays.copyOf(eOffsets, eOffsets.length * 2)
        val b = get(a, j)
        val end = eOffsets(e) + b.length
        if (end > bytes.length) {
          var cap = bytes.length
          while (cap < end) cap <<= 1
          bytes = java.util.Arrays.copyOf(bytes, cap)
        }
        System.arraycopy(b, 0, bytes, eOffsets(e), b.length)
        eOffsets(e + 1) = end
      }
      def result(total: Int): ColData =
        BytesData(java.util.Arrays.copyOf(eOffsets, total + 1),
          java.util.Arrays.copyOf(bytes, eOffsets(total)))
    }

    private val store: ElemStore = et match {
      case FloatType => new LongStore((a, j) =>
        java.lang.Float.floatToRawIntBits(a.getFloat(j)).toLong & 0xFFFFFFFFL)
      case DoubleType => new DoubleStore
      case BooleanType => new LongStore((a, j) => if (a.getBoolean(j)) 1L else 0L)
      case ByteType => new LongStore((a, j) => a.getByte(j).toLong)
      case ShortType => new LongStore((a, j) => a.getShort(j).toLong)
      case IntegerType | DateType => new LongStore((a, j) => a.getInt(j).toLong)
      case LongType | TimestampType | TimestampNTZType => new LongStore((a, j) => a.getLong(j))
      case StringType => new BytesStore((a, j) => a.getUTF8String(j).getBytes)
      case BinaryType => new BytesStore((a, j) => a.getBinary(j))
      case other =>
        throw new UnsupportedOperationException(s"fls write: unsupported array element $other")
    }

    def add(row: InternalRow, ord: Int): Unit = {
      val a = row.getArray(ord)
      val len = a.numElements()
      // Flattened offsets are Int: a row group whose total element count
      // crosses 2^31 must fail with a clear message, not wrap negative.
      if (len > Int.MaxValue - offsets(n))
        throw new UnsupportedOperationException(
          s"fls: row group exceeds ${Int.MaxValue} flattened elements in array " +
            s"column '$name' — lower row_group_size")
      var j = 0
      while (j < len) {
        if (a.isNullAt(j))
          throw new UnsupportedOperationException(
            s"fls: NULL element in array column '$name' — the format stores no NULLs " +
              "(reference parity); filter or fill null elements before writing")
        store.append(a, j)
        j += 1
      }
      offsets(n + 1) = offsets(n) + len
      n += 1
    }
    def result(): ColData =
      ArrayColData(java.util.Arrays.copyOf(offsets, n + 1), store.result(offsets(n)))
    def clear(): Unit = n = 0
  }

  /** MAP columns: per-row entry counts + growable flattened key/value
    * stores (same physical streams as array elements — float keys or
    * values ride as raw 32-bit patterns). NULL map VALUES are rejected
    * like null scalars; Spark map keys cannot be null by contract. */
  private final class MapColBuilder(name: String, kt: DataType, vt: DataType) extends Builder {
    import org.apache.spark.sql.catalyst.util.ArrayData
    private var offsets = new Array[Int](rowGroupSize + 1)
    private var n = 0

    private sealed trait Store {
      def append(a: ArrayData, j: Int): Unit
      def result(): ColData
      def reset(): Unit
    }
    private final class LongS(get: (ArrayData, Int) => Long) extends Store {
      private var arr = new Array[Long](math.max(16, rowGroupSize))
      private var m = 0
      def append(a: ArrayData, j: Int): Unit = {
        if (m >= arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
        arr(m) = get(a, j); m += 1
      }
      def result(): ColData = LongData(java.util.Arrays.copyOf(arr, m))
      def reset(): Unit = m = 0
    }
    private final class DoubleS extends Store {
      private var arr = new Array[Double](math.max(16, rowGroupSize))
      private var m = 0
      def append(a: ArrayData, j: Int): Unit = {
        if (m >= arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
        arr(m) = a.getDouble(j); m += 1
      }
      def result(): ColData = DoubleData(java.util.Arrays.copyOf(arr, m))
      def reset(): Unit = m = 0
    }
    private final class BytesS(get: (ArrayData, Int) => Array[Byte]) extends Store {
      private var eOffsets = new Array[Int](math.max(16, rowGroupSize) + 1)
      private var bytes = new Array[Byte](rowGroupSize * 8)
      private var m = 0
      def append(a: ArrayData, j: Int): Unit = {
        if (m + 1 >= eOffsets.length)
          eOffsets = java.util.Arrays.copyOf(eOffsets, eOffsets.length * 2)
        val b = get(a, j)
        val end = eOffsets(m) + b.length
        if (end > bytes.length) {
          var cap = bytes.length
          while (cap < end) cap <<= 1
          bytes = java.util.Arrays.copyOf(bytes, cap)
        }
        System.arraycopy(b, 0, bytes, eOffsets(m), b.length)
        eOffsets(m + 1) = end
        m += 1
      }
      def result(): ColData =
        BytesData(java.util.Arrays.copyOf(eOffsets, m + 1),
          java.util.Arrays.copyOf(bytes, eOffsets(m)))
      def reset(): Unit = m = 0
    }

    private def mkStore(dt: DataType): Store = dt match {
      case FloatType => new LongS((a, j) =>
        java.lang.Float.floatToRawIntBits(a.getFloat(j)).toLong & 0xFFFFFFFFL)
      case DoubleType => new DoubleS
      case BooleanType => new LongS((a, j) => if (a.getBoolean(j)) 1L else 0L)
      case ByteType => new LongS((a, j) => a.getByte(j).toLong)
      case ShortType => new LongS((a, j) => a.getShort(j).toLong)
      case IntegerType | DateType => new LongS((a, j) => a.getInt(j).toLong)
      case LongType | TimestampType | TimestampNTZType => new LongS((a, j) => a.getLong(j))
      case StringType => new BytesS((a, j) => a.getUTF8String(j).getBytes)
      case BinaryType => new BytesS((a, j) => a.getBinary(j))
      case other =>
        throw new UnsupportedOperationException(s"fls write: unsupported map key/value $other")
    }

    private val kStore = mkStore(kt)
    private val vStore = mkStore(vt)

    def add(row: InternalRow, ord: Int): Unit = {
      val m = row.getMap(ord)
      val len = m.numElements()
      if (len > Int.MaxValue - offsets(n))
        throw new UnsupportedOperationException(
          s"fls: row group exceeds ${Int.MaxValue} flattened entries in map " +
            s"column '$name' — lower row_group_size")
      val ka = m.keyArray()
      val va = m.valueArray()
      var j = 0
      while (j < len) {
        if (va.isNullAt(j))
          throw new UnsupportedOperationException(
            s"fls: NULL value in map column '$name' — the format stores no NULLs " +
              "(reference parity); filter or fill null values before writing")
        kStore.append(ka, j)
        vStore.append(va, j)
        j += 1
      }
      offsets(n + 1) = offsets(n) + len
      n += 1
    }
    def result(): ColData =
      MapColData(java.util.Arrays.copyOf(offsets, n + 1), kStore.result(), vStore.result())
    def clear(): Unit = { n = 0; kStore.reset(); vStore.reset() }
  }

  /** STRUCT parent: counts rows, encodes to a zero-byte segment. */
  private final class MarkerBuilder extends Builder {
    private var n = 0
    def add(row: InternalRow, ord: Int): Unit = n += 1
    def result(): ColData = StructMarker(n)
    def clear(): Unit = n = 0
  }

  /** Builder for struct field j (of k): navigates into the struct value
    * at the PARENT ordinal and rejects null fields like null scalars. */
  private def childBuilder(parent: String, k: Int, j: Int, ch: StructField): Builder = {
    def nn[T](f: (InternalRow, Int) => T): (InternalRow, Int) => T = (r, i) => {
      val s = r.getStruct(i, k)
      if (s.isNullAt(j))
        throw new UnsupportedOperationException(
          s"fls: NULL in struct field '$parent.${ch.name}' — the format stores no " +
            "NULLs (reference parity); coalesce() nulls away before writing")
      f(s, j)
    }
    ch.dataType match {
      case BooleanType => new LongBuilder(nn((r, i) => if (r.getBoolean(i)) 1L else 0L))
      case ByteType => new LongBuilder(nn((r, i) => r.getByte(i).toLong))
      case ShortType => new LongBuilder(nn((r, i) => r.getShort(i).toLong))
      case IntegerType | DateType => new LongBuilder(nn((r, i) => r.getInt(i).toLong))
      case LongType | TimestampType | TimestampNTZType =>
        new LongBuilder(nn((r, i) => r.getLong(i)))
      case FloatType => new DoubleBuilder(nn((r, i) => r.getFloat(i).toDouble))
      case DoubleType => new DoubleBuilder(nn((r, i) => r.getDouble(i)))
      case StringType => new BytesBuilder(nn((r, i) => r.getUTF8String(i).getBytes))
      case BinaryType => new BytesBuilder(nn((r, i) => r.getBinary(i)))
      case other =>
        throw new UnsupportedOperationException(
          s"fls write: unsupported struct field type $other")
    }
  }

  /** One builder per PHYSICAL column, aligned with [[colDescs]]. */
  private def mkPhysBuilders(): Array[Builder] =
    dataFields.flatMap { f =>
      f.dataType match {
        case st: StructType =>
          new MarkerBuilder +: st.fields.zipWithIndex.map { case (ch, j) =>
            childBuilder(f.name, st.fields.length, j, ch)
          }.toSeq
        case _ => Seq(mkBuilder(f))
      }
    }

  private def mkBuilder(f: StructField): Builder = f.dataType match {
    case BooleanType => new LongBuilder((r, i) => if (r.getBoolean(i)) 1L else 0L)
    case ByteType => new LongBuilder((r, i) => r.getByte(i).toLong)
    case ShortType => new LongBuilder((r, i) => r.getShort(i).toLong)
    case IntegerType | DateType => new LongBuilder((r, i) => r.getInt(i).toLong)
    case LongType | TimestampType | TimestampNTZType => new LongBuilder((r, i) => r.getLong(i))
    case FloatType => new DoubleBuilder((r, i) => r.getFloat(i).toDouble)
    case DoubleType => new DoubleBuilder((r, i) => r.getDouble(i))
    case StringType => new BytesBuilder((r, i) => r.getUTF8String(i).getBytes)
    case BinaryType => new BytesBuilder((r, i) => r.getBinary(i))
    case d: DecimalType if d.precision <= 18 =>
      new LongBuilder((r, i) => r.getDecimal(i, d.precision, d.scale).toUnscaledLong)
    case d: DecimalType =>
      new BytesBuilder((r, i) =>
        r.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
          .unscaledValue().toByteArray)
    case ArrayType(et, _) => new ArrayColBuilder(f.name, et)
    case MapType(kt, vt, _) => new MapColBuilder(f.name, kt, vt)
    case other =>
      throw new UnsupportedOperationException(s"fls write: unsupported type $other")
  }

  /** (schema ordinal, value-hash accessor) per sketched column —
    * resolved and type-checked once at construction, refused loudly for
    * nested types (no canonical value hash). Shared by the NDV and
    * Bloom sketches (one definition of "same SQL value"). */
  private def mkHashAccessors(names: Seq[String],
      option: String): Array[(Int, (InternalRow, Int) => Long)] =
    names.toArray.map { name =>
      val ord =
        try schema.fieldIndex(name)
        catch {
          case _: IllegalArgumentException => throw new IllegalArgumentException(
            s"fls: $option names '$name', which is not a column of the " +
              s"write schema [${schema.fieldNames.mkString(", ")}]")
        }
      require(!partitionBy.contains(name),
        s"fls: $option names partition column '$name' — partition values " +
          "are exact from the directory layout; sketch data columns only")
      val hash: (InternalRow, Int) => Long = schema.fields(ord).dataType match {
        case BooleanType => (r, i) => Hll.hashLong(if (r.getBoolean(i)) 1L else 0L)
        case ByteType => (r, i) => Hll.hashLong(r.getByte(i).toLong)
        case ShortType => (r, i) => Hll.hashLong(r.getShort(i).toLong)
        case IntegerType | DateType => (r, i) => Hll.hashLong(r.getInt(i).toLong)
        case LongType | TimestampType | TimestampNTZType =>
          (r, i) => Hll.hashLong(r.getLong(i))
        case FloatType => (r, i) => Hll.hashDouble(r.getFloat(i).toDouble)
        case DoubleType => (r, i) => Hll.hashDouble(r.getDouble(i))
        case StringType => (r, i) => Hll.hashBytes(r.getUTF8String(i).getBytes)
        case BinaryType => (r, i) => Hll.hashBytes(r.getBinary(i))
        case d: DecimalType if d.precision <= 18 =>
          (r, i) => Hll.hashLong(r.getDecimal(i, d.precision, d.scale).toUnscaledLong)
        case d: DecimalType =>
          (r, i) => Hll.hashBytes(r.getDecimal(i, d.precision, d.scale)
            .toJavaBigDecimal.unscaledValue().toByteArray)
        case other => throw new UnsupportedOperationException(
          s"fls: $option cannot sketch '$name' of type $other — " +
            "sketches are for scalar join/group/lookup keys")
      }
      (ord, hash)
    }

  private val ndvAccessors = mkHashAccessors(ndvColumns, "ndv_columns")
  private val bloomAccessors = mkHashAccessors(bloomColumns, "bloom_columns")
  require(bloomAccessors.isEmpty || directWrite,
    "fls: bloom_columns needs commit_mode=manifest — the sidecar pointer " +
      "lives in manifest stats (listing-mode tables have nowhere to " +
      "record it)")

  private val tempDir = new Path(new Path(dir, FlsCommit.TempDirName), taskUid)
  /** (path written, dir-relative final path). In staged (rename) mode
    * the written path lives under `_temporary/`; in direct (manifest)
    * mode it IS the final path — the attempt-unique name makes staging
    * unnecessary and the manifest makes uncommitted files invisible. */
  private val written = scala.collection.mutable.ArrayBuffer[(Path, String)]()
  /** Closed data-file lengths by rel path (for the manifest). */
  private val lengths = scala.collection.mutable.HashMap[String, Long]()
  /** Closed data-file stats JSON by rel path (for the manifest; may be
    * null for files with nothing prunable). */
  private val fileStats = scala.collection.mutable.HashMap[String, String]()

  /** All writer state for one partition-value combination ("" = flat). */
  private final class Bucket(relDir: String) {
    val builders: Array[Builder] = mkPhysBuilders()
    var rowsInGroup = 0
    private var fileSeq = 0
    private var writer: FlsFileWriter = _
    private var currentRel: String = _
    /** Per-FILE NDV sketches, parallel to [[ndvAccessors]] — reset at
      * every file rotation so each manifest entry's sketch covers
      * exactly its file. */
    private val sketches: Array[Hll] = Array.fill(ndvAccessors.length)(new Hll)
    /** Per-FILE Bloom builders, parallel to [[bloomAccessors]]. */
    private val blooms: Array[Bloom.Builder] =
      Array.fill(bloomAccessors.length)(new Bloom.Builder(bloomFpp))

    def add(row: InternalRow): Unit = {
      var c = 0
      while (c < builders.length) {
        builders(c).add(row, physOrds(c))
        c += 1
      }
      var s = 0
      while (s < ndvAccessors.length) {
        val (ord, hash) = ndvAccessors(s)
        sketches(s).addHash(hash(row, ord))
        s += 1
      }
      var b = 0
      while (b < bloomAccessors.length) {
        val (ord, hash) = bloomAccessors(b)
        blooms(b).add(hash(row, ord))
        b += 1
      }
      rowsInGroup += 1
      if (rowsInGroup == rowGroupSize) flushRowGroup()
    }

    private def ensureWriter(): Unit =
      if (writer == null) {
        val finalRel =
          (if (relDir.isEmpty) "" else relDir + "/") + f"$baseName-$fileSeq%04d.fls"
        val p =
          if (directWrite) new Path(dir, finalRel) else new Path(tempDir, finalRel)
        written += ((p, finalRel))
        if (!inlineFooter) // sidecar footer travels alongside its data file
          written += ((graft.fls.FlsFile.footerPath(p), finalRel + ".footer"))
        fileSeq += 1
        currentRel = finalRel
        writer = new FlsFileWriter(p, conf, colDescs, inlineFooter, transpose)
      }

    private def closeWriter(): Unit =
      if (writer != null) {
        writer.close()
        lengths(currentRel) = writer.fileLength
        val ndv = ndvAccessors.indices.collect {
          case s if !sketches(s).isEmpty =>
            schema.fields(ndvAccessors(s)._1).name ->
              java.util.Arrays.copyOf(sketches(s).regs, sketches(s).regs.length)
        }.toMap
        var stats = writer.fileStats(ndv)
        if (bloomAccessors.nonEmpty && blooms.exists(_.size > 0)) {
          // the sidecar travels like the data file: written at the
          // final (attempt-unique) name, vouched only once the
          // manifest entry's "bf" pointer publishes
          val cols = bloomAccessors.indices.map { b =>
            schema.fields(bloomAccessors(b)._1).name -> blooms(b).seal()
          }
          val bfRel = Bloom.write(new Path(dir).getFileSystem(conf),
            new Path(dir), currentRel, "bf", cols)
          written += ((new Path(dir, bfRel), bfRel))
          stats = FlsFileStats.withBf(stats, new Path(bfRel).getName)
        }
        fileStats(currentRel) = stats
        sketches.foreach(_.clear())
        blooms.foreach(_.clear())
        writer = null
      }

    def flushRowGroup(): Unit =
      if (rowsInGroup > 0) {
        ensureWriter()
        writer.writeRowGroup(builders.map(_.result()))
        builders.foreach(_.clear())
        rowsInGroup = 0
        maybeHeartbeat()
        if (rowGroupsPerFile > 0 && writer.numRowGroups >= rowGroupsPerFile)
          closeWriter()
      }

    def finish(): Unit = {
      flushRowGroup()
      closeWriter()
    }

    def abortOpen(): Unit =
      if (writer != null) { writer.abort(); writer = null }
  }

  /** Orphan-sweep liveness: a long-running task (> staging TTL) must not
    * have its staging tree GC'd out from under it by another job's
    * commit, so the writer touches a `.heartbeat` file in its attempt
    * dir (throttled) as rows ARRIVE — checked every [[HbCheckRows]] rows
    * and on every row-group flush, so a trickle-input task that never
    * fills a row group still heartbeats (a task receiving ZERO rows for
    * longer than the TTL remains exposed; size staging_ttl_hours for
    * that). `sweepOrphans` only deletes trees whose NEWEST subtree
    * mtime is past the TTL. Direct (manifest) mode writes no staged
    * files, so it needs no heartbeat. */
  private val hbIntervalMs =
    conf.getLong("graft.fls.heartbeat.interval.ms", 5 * 60 * 1000L)
  private val HbCheckRows = 4096
  private var lastHb = 0L
  private var rowsSinceHbCheck = 0
  private def maybeHeartbeat(): Unit =
    if (!directWrite) {
      val now = System.currentTimeMillis()
      if (now - lastHb >= hbIntervalMs) {
        lastHb = now
        try {
          val fs = tempDir.getFileSystem(conf)
          fs.create(new Path(tempDir, ".heartbeat"), true).close()
        } catch { case _: Throwable => () }
      }
    }

  private val buckets = scala.collection.mutable.LinkedHashMap[String, Bucket]()

  private def bucketFor(row: InternalRow): Bucket = {
    val relDir =
      if (partIdx.isEmpty) ""
      else {
        val sb = new StringBuilder
        var i = 0
        while (i < partIdx.length) {
          if (row.isNullAt(partIdx(i)))
            throw new UnsupportedOperationException(
              s"fls: NULL in partition column '${partitionBy(i)}' — the format " +
                "stores no NULLs (reference parity); coalesce() nulls away before writing")
          if (i > 0) sb.append('/')
          sb.append(FlsPartitioning.escape(partitionBy(i))).append('=')
            .append(FlsPartitioning.escape(
              FlsPartitioning.pathString(schema.fields(partIdx(i)).dataType, row, partIdx(i))))
          i += 1
        }
        sb.toString
      }
    buckets.getOrElseUpdate(relDir, {
      if (buckets.size >= maxOpenPartitions)
        throw new IllegalStateException(
          s"fls: task opened more than $maxOpenPartitions partitions — " +
            "repartition the dataframe by the partition columns before writing, " +
            "or raise the max_open_partitions writer option")
      new Bucket(relDir)
    })
  }

  override def write(row: InternalRow): Unit = {
    var c = 0
    while (c < dataIdx.length) {
      if (row.isNullAt(dataIdx(c)))
        throw new UnsupportedOperationException(
          s"fls: NULL in column '${dataFields(c).name}' — the format stores no NULLs " +
            "(reference parity); coalesce() nulls away before writing")
      c += 1
    }
    rowsSinceHbCheck += 1
    if (rowsSinceHbCheck >= HbCheckRows) { // amortized clock check, off the hot path
      rowsSinceHbCheck = 0
      maybeHeartbeat()
    }
    bucketFor(row).add(row)
  }

  /** Rename temp files to final names. Spark's commit coordinator
    * guarantees exactly one attempt per partition reaches here, so the
    * deterministic final names cannot be raced; a leftover final from a
    * crashed-mid-commit prior attempt of the SAME partition is replaced. */
  override def commit(): WriterCommitMessage = {
    buckets.valuesIterator.foreach(_.finish())
    val finals =
      if (directWrite) written.map(_._2) // already at final names
      else {
        val fs = tempDir.getFileSystem(conf)
        val out = written.map { case (tmp, finalRel) =>
          val dst = new Path(dir, finalRel)
          if (fs.exists(dst)) fs.delete(dst, false)
          else fs.mkdirs(dst.getParent) // first file of a new partition dir
          if (!fs.rename(tmp, dst))
            throw new java.io.IOException(s"fls commit: rename $tmp -> $dst failed")
          finalRel
        }
        try fs.delete(tempDir, true) catch { case _: Throwable => () }
        out
      }
    FlsCommitMessage(finals.toArray, finals.map(lengths.getOrElse(_, -1L)).toArray,
      finals.map(fileStats.getOrElse(_, null)).toArray)
  }

  /** Delete EVERY file this attempt wrote (rotated ones included), then
    * the attempt's temp dir — a failed attempt leaves nothing behind. */
  override def abort(): Unit = {
    buckets.valuesIterator.foreach(_.abortOpen())
    val fs = tempDir.getFileSystem(conf)
    written.foreach { case (tmp, _) =>
      try fs.delete(tmp, false) catch { case _: Throwable => () }
    }
    try fs.delete(tempDir, true) catch { case _: Throwable => () }
  }

  override def close(): Unit = ()
}

object FlsCommit {
  val TempDirName = "_temporary"

  /** Remove ONE job's staging subtree (`_temporary/<writeId>`), then the
    * shared `_temporary` root only if now empty — concurrent jobs'
    * staged files are never touched. */
  def removeStaging(fs: org.apache.hadoop.fs.FileSystem, dir: Path, writeId: String): Unit = {
    fs.delete(new Path(new Path(dir, TempDirName), writeId), true)
    try fs.delete(new Path(dir, TempDirName), false) catch { case _: Throwable => () }
  }

  /** GC staging subtrees orphaned by drivers that crashed before
    * commit/abort: any `_temporary/<otherWriteId>` with no write
    * activity for `ttlMs` is assumed dead and removed. "No activity"
    * means the NEWEST mtime anywhere in the subtree is past the TTL —
    * writers touch a throttled `.heartbeat` file as they flush
    * (`FlsDataWriter.maybeHeartbeat`), so a legitimately long-running
    * job (> TTL wall-clock) keeps its tree fresh and is never swept,
    * unlike a pure top-level-mtime check. Swept trees are logged
    * loudly. Called from job commit, so the sweep rides an existing
    * driver-side RPC window rather than adding one to the read path. */
  def sweepOrphans(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      ownWriteId: String, ttlMs: Long): Unit = {
    val root = new Path(dir, TempDirName)
    try {
      if (!fs.exists(root)) return
      val cutoff = System.currentTimeMillis() - ttlMs
      fs.listStatus(root).foreach { s =>
        if (s.getPath.getName != ownWriteId && s.getModificationTime < cutoff &&
            newestMtime(fs, s.getPath) < cutoff) {
          try {
            fs.delete(s.getPath, true)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"fls: swept orphaned staging tree ${s.getPath} — no write " +
                s"activity (incl. heartbeats) for over $ttlMs ms; if that job " +
                "was alive, raise the staging_ttl_hours writer option")
          } catch { case _: Throwable => () }
        }
      }
    } catch { case _: Throwable => () }
  }

  /** Newest modification time anywhere under `p`; Long.MaxValue when the
    * subtree cannot be inspected (never sweep what we cannot see). */
  private def newestMtime(fs: org.apache.hadoop.fs.FileSystem, p: Path): Long = {
    var mx = 0L
    try {
      fs.listStatus(p).foreach { s =>
        mx = math.max(mx, s.getModificationTime)
        if (s.isDirectory) mx = math.max(mx, newestMtime(fs, s.getPath))
      }
    } catch { case _: Throwable => mx = Long.MaxValue }
    mx
  }
}

/** `files` are dir-RELATIVE final paths (partition subdirs included);
  * `lengths` align with `files` (data-file byte sizes for the manifest;
  * -1 for sidecar footer entries). */
/** `stats(i)` is the per-file stats JSON for `files(i)` (null when the
  * writer had nothing prunable; always null at sidecar-footer slots). */
case class FlsCommitMessage(files: Array[String], lengths: Array[Long],
    stats: Array[String] = Array.empty)
  extends WriterCommitMessage
