package graft.fls.connector

import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
import org.apache.spark.sql.execution.vectorized.WritableColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Column-DEFAULT plumbing for the fls scan: an `ALTER TABLE ... ADD
  * COLUMN d T DEFAULT x` stores the analyzed constant in the field's
  * metadata ([[FlsCatalog]]); files written BEFORE the ALTER lack the
  * column, and the reader serves this frozen "exists default" as a
  * constant vector instead of NULLs — so a backfilled default on a
  * 100 TB table is one O(1) metadata commit, never a rewrite. New
  * INSERTs never reach this path: Spark materializes the CURRENT
  * default at write analysis (the catalog declares
  * `SUPPORT_COLUMN_DEFAULT_VALUE`), so post-ALTER files physically
  * carry the column. Uses Spark's own metadata keys + resolution
  * (`ResolveDefaultColumns`), the same contract file sources follow. */
object FlsDefaults {

  val CurrentKey: String = ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY
  val ExistsKey: String = ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY

  /** Types [[fill]] can serve constantly — validated at ALTER time so a
    * DEFAULT that cannot be decoded is rejected at DDL, not at scan. */
  def fillable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType | DateType |
         TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** The frozen exists-default as a Catalyst-internal constant, or None
    * when the field has none (plain nullable ADD COLUMN → NULLs). */
  def existenceDefault(field: StructField): Option[Any] =
    if (!field.metadata.contains(ExistsKey)) None
    else Option(ResolveDefaultColumns.getExistenceDefaultValue(field))

  /** Fill `len` slots of `vec` with the internal-format constant. */
  def fill(vec: WritableColumnVector, dt: DataType, v: Any, len: Int): Unit = {
    var i = 0
    dt match {
      case BooleanType =>
        val x = v.asInstanceOf[Boolean]
        while (i < len) { vec.putBoolean(i, x); i += 1 }
      case ByteType =>
        val x = v.asInstanceOf[Byte]
        while (i < len) { vec.putByte(i, x); i += 1 }
      case ShortType =>
        val x = v.asInstanceOf[Short]
        while (i < len) { vec.putShort(i, x); i += 1 }
      case IntegerType | DateType =>
        val x = v.asInstanceOf[Int]
        while (i < len) { vec.putInt(i, x); i += 1 }
      case LongType | TimestampType | TimestampNTZType =>
        val x = v.asInstanceOf[Long]
        while (i < len) { vec.putLong(i, x); i += 1 }
      case FloatType =>
        val x = v.asInstanceOf[Float]
        while (i < len) { vec.putFloat(i, x); i += 1 }
      case DoubleType =>
        val x = v.asInstanceOf[Double]
        while (i < len) { vec.putDouble(i, x); i += 1 }
      case StringType =>
        val b = v.asInstanceOf[UTF8String].getBytes
        while (i < len) { vec.putByteArray(i, b, 0, b.length); i += 1 }
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        while (i < len) { vec.putByteArray(i, b, 0, b.length); i += 1 }
      case d: DecimalType =>
        val x = v.asInstanceOf[Decimal]
        while (i < len) { vec.putDecimal(i, x, d.precision); i += 1 }
      case other => throw new IllegalStateException(
        s"fls: unservable DEFAULT type $other (guarded at ALTER)")
    }
  }
}
