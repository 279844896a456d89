package graft.fls.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.fls._
import graft.fls.Format._

/** Metadata-only aggregate scan: COUNT(*)/MIN/MAX computed on the
  * driver from footer row counts and zone-map stats (≙ serving the
  * reference's statistics to the engine, SURVEY §2.A7 — taken one step
  * further: the whole aggregate is answered without touching data).
  * Emits exactly one row from one partition; complete pushdown, so
  * Catalyst performs no further aggregation. */
class FlsAggScan(
    tableSchema: StructType,
    specs: Seq[FlsAggSpec],
    options: CaseInsensitiveStringMap,
    validatedFooters: Seq[FlsFooters.Entry])
  extends Scan with Batch {

  /** The footer set the ScanBuilder VALIDATED at pushdown time (uniform
    * ColumnType + stats present) — not re-listed here, so files changing
    * under a concurrent write between pushdown and execution cannot feed
    * incomparable unscaled stats into the aggregate. */
  private val tables: Seq[TableDesc] = validatedFooters.map(_.table)

  override def readSchema(): StructType =
    StructType(specs.map {
      case FlsAggSpec(FlsAggSpec.Count, _) => StructField("count(*)", LongType, nullable = false)
      case FlsAggSpec(FlsAggSpec.MinCol, c) =>
        StructField(s"min($c)", tableSchema(c).dataType, nullable = false)
      case FlsAggSpec(FlsAggSpec.MaxCol, c) =>
        StructField(s"max($c)", tableSchema(c).dataType, nullable = false)
      case FlsAggSpec(k, c) =>
        throw new IllegalStateException(s"fls: unknown aggregate kind $k on $c")
    }.toArray)

  override def toBatch: Batch = this

  override def description(): String =
    s"fls metadata-aggregate scan: ${specs.map(s => (s.kind, s.col)).mkString(",")}"

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // compute on the driver; ship the finished values (longs for the
    // numeric physical types, bytes for exact string stats)
    val longs = new Array[Long](specs.length)
    val bytes = new Array[Array[Byte]](specs.length)
    specs.zipWithIndex.foreach {
      case (FlsAggSpec(FlsAggSpec.Count, _), i) =>
        longs(i) = tables.map(_.numRows).sum
      case (FlsAggSpec(kind, c), i) =>
        val segs = tables.flatMap { t =>
          val idx = t.columns.indexWhere(_.name == c)
          require(idx >= 0, s"fls agg: column $c missing")
          t.rowGroups.map(_.segments(idx))
        }
        val isStr = tableSchema(c).dataType == StringType
        if (isStr) {
          require(segs.nonEmpty && segs.forall(s => s.hasByteStats && s.byteStatsExact),
            s"fls agg: exact string stats unavailable for $c")
          bytes(i) =
            if (kind == FlsAggSpec.MinCol) segs.map(_.minBytes).reduce((a, b) => if (cmpBytes(a, b) <= 0) a else b)
            else segs.map(_.maxBytes).reduce((a, b) => if (cmpBytes(a, b) >= 0) a else b)
        } else {
          require(segs.nonEmpty && segs.forall(_.hasStats),
            s"fls agg: stats unavailable for $c")
          longs(i) =
            if (kind == FlsAggSpec.MinCol) segs.map(_.minLong).min else segs.map(_.maxLong).max
        }
    }
    Array(FlsAggPartition(longs, bytes))
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    private val schema = readSchema()
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val part = partition.asInstanceOf[FlsAggPartition]
      val vals = part.values
      new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = !emitted && { emitted = true; true }
        override def get(): InternalRow = {
          val out = new Array[Any](vals.length)
          var i = 0
          while (i < vals.length) {
            out(i) = schema.fields(i).dataType match {
              case LongType | TimestampType | TimestampNTZType => vals(i)
              case IntegerType | DateType => vals(i).toInt
              case ShortType => vals(i).toShort
              case ByteType => vals(i).toByte
              case BooleanType => vals(i) != 0L
              case StringType =>
                org.apache.spark.unsafe.types.UTF8String.fromBytes(part.byteValues(i))
              case d: DecimalType => Decimal.createUnsafe(vals(i), d.precision, d.scale)
              case other => throw new IllegalStateException(s"fls agg: bad type $other")
            }
            i += 1
          }
          new GenericInternalRow(out)
        }
        override def close(): Unit = ()
      }
    }
    override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
      throw new UnsupportedOperationException("agg scan is row-based")
    override def supportColumnarReads(p: InputPartition): Boolean = false
  }
}

case class FlsAggPartition(values: Array[Long],
    byteValues: Array[Array[Byte]]) extends InputPartition
