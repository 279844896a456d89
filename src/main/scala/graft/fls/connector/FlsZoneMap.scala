package graft.fls.connector

import org.apache.spark.sql.sources._

import graft.fls.Format._

/** Driver-side zone-map row-group skipping: decide from footer min/max
  * whether a row group can possibly satisfy the pushed filters — the
  * planner-time equivalent of the reference's RowGroupFilter
  * (/root/reference/src/reader/row_group_filter.cpp:96-199; SURVEY.md
  * §2.A6). Conservative: any conversion doubt keeps the row group. */
object FlsZoneMap {

  /** Long magnitudes at/past 2^52 round when stored as double. */
  @inline def inexact(v: Double): Boolean = math.abs(v) >= 4.503599627370496E15

  /** Filters we can use for skipping (reported as PushedFilters). */
  def usable(f: Filter): Boolean = f match {
    case EqualTo(_, _) | GreaterThan(_, _) | GreaterThanOrEqual(_, _) |
         LessThan(_, _) | LessThanOrEqual(_, _) | In(_, _) |
         IsNull(_) | IsNotNull(_) => true
    case And(l, r) => usable(l) && usable(r)
    case Or(l, r) => usable(l) && usable(r)
    case _ => false
  }

  def mayMatch(
      rg: RowGroupDesc,
      nameToIdx: Map[String, Int],
      columns: Array[ColumnDesc],
      filters: Array[Filter],
      rowStart: Long): Boolean =
    filters.forall(f => mayMatchOne(rg, nameToIdx, columns, f, rowStart))

  private def mayMatchOne(
      rg: RowGroupDesc,
      nameToIdx: Map[String, Int],
      columns: Array[ColumnDesc],
      f: Filter,
      rowStart: Long): Boolean = f match {
    case And(l, r) =>
      mayMatchOne(rg, nameToIdx, columns, l, rowStart) && mayMatchOne(rg, nameToIdx, columns, r, rowStart)
    case Or(l, r) =>
      mayMatchOne(rg, nameToIdx, columns, l, rowStart) || mayMatchOne(rg, nameToIdx, columns, r, rowStart)
    // The format stores no NULLs (/root/reference/src/reader/fls_reader.cpp:200-210):
    case IsNull(col) if nameToIdx.contains(col) || col == FlsVirtual.RowNumber => false
    case IsNotNull(_) => true
    case EqualTo(col, v) => cmp(rg, nameToIdx, columns, col, v, rowStart) { (mn, mx, x) => x >= mn && x <= mx }
    // Strict compares: double rounding is monotonic, so >=/<=/= can
    // never mis-prune; > / < could collapse at longs past 2^52 where
    // doubles lose exactness — only there, widen by 1 ulp instead of
    // risking a wrong skip. Below 2^52 the compare is exact and the
    // boundary row group prunes.
    case GreaterThan(col, v) => cmp(rg, nameToIdx, columns, col, v, rowStart) { (_, mx, x) =>
      (if (FlsZoneMap.inexact(mx)) Math.nextUp(mx) else mx) > x }
    case GreaterThanOrEqual(col, v) => cmp(rg, nameToIdx, columns, col, v, rowStart) { (_, mx, x) => mx >= x }
    case LessThan(col, v) => cmp(rg, nameToIdx, columns, col, v, rowStart) { (mn, _, x) =>
      (if (FlsZoneMap.inexact(mn)) Math.nextDown(mn) else mn) < x }
    case LessThanOrEqual(col, v) => cmp(rg, nameToIdx, columns, col, v, rowStart) { (mn, _, x) => mn <= x }
    case In(col, vs) =>
      vs.isEmpty || vs.exists(v => cmp(rg, nameToIdx, columns, col, v, rowStart) { (mn, mx, x) => x >= mn && x <= mx })
    case _ => true
  }

  /** Run `test(min, max, value)` in double space (exact for longs up to
    * 2^53 — beyond that the compare is approximate but still
    * conservative only if we widen; to stay safe we only prune when the
    * strict inequality holds with a 1-ulp margin for huge longs). */
  private def cmp(
      rg: RowGroupDesc,
      nameToIdx: Map[String, Int],
      columns: Array[ColumnDesc],
      col: String,
      value: Any,
      rowStart: Long)(test: (Double, Double, Double) => Boolean): Boolean = {
    // Virtual row-number filters skip by row range, the reference's
    // rowid special path (/root/reference/src/reader/row_group_filter.cpp:136-153).
    if (col == FlsVirtual.RowNumber && !nameToIdx.contains(col)) {
      return value match {
        case n: Number =>
          test(rowStart.toDouble, (rowStart + rg.nTuples - 1).toDouble, n.longValue().toDouble)
        case _ => true
      }
    }
    nameToIdx.get(col) match {
      case None => true
      case Some(idx) =>
        val seg = rg.segments(idx)
        if (!seg.hasStats) true
        else {
          val ct = columns(idx).colType
          toComparable(value, ct) match {
            case None => true
            case Some(x) =>
              val (mn, mx) = physOf(ct.tag) match {
                case Phys.LONG => (seg.minLong.toDouble, seg.maxLong.toDouble)
                case Phys.DOUBLE => (seg.minDouble, seg.maxDouble)
                case _ => return true
              }
              test(mn, mx, x)
          }
        }
    }
  }

  /** Convert a pushed literal to the column's physical comparison space. */
  private def toComparable(value: Any, ct: ColumnType): Option[Double] = {
    import TypeTag._
    try {
      (ct.tag, value) match {
        case (_, null) => None
        case (BOOLEAN, b: java.lang.Boolean) => Some(if (b) 1.0 else 0.0)
        case (DATE, d: java.sql.Date) =>
          Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toDouble)
        case (DATE, d: java.time.LocalDate) => Some(d.toEpochDay.toDouble)
        case (TIMESTAMP | TIMESTAMP_NTZ, t: java.sql.Timestamp) =>
          Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t).toDouble)
        case (TIMESTAMP | TIMESTAMP_NTZ, t: java.time.Instant) =>
          Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(t).toDouble)
        case (TIMESTAMP | TIMESTAMP_NTZ, t: java.time.LocalDateTime) =>
          Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(t).toDouble)
        case (DECIMAL, d: java.math.BigDecimal) =>
          Some(d.setScale(ct.scale).unscaledValue().doubleValue())
        case (DECIMAL, d: BigDecimal) =>
          Some(d.setScale(ct.scale).underlying().unscaledValue().doubleValue())
        case (FLOAT | DOUBLE, n: Number) => Some(n.doubleValue())
        case (INT8 | INT16 | INT32 | INT64, n: Number) => Some(n.longValue().toDouble)
        case _ => None
      }
    } catch { case _: ArithmeticException => None }
  }
}
