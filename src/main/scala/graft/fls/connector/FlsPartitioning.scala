package graft.fls.connector

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Hive-style partitioned directory support for the fls connector:
  * `base/dt=2026-08-12/country=NL/part-*.fls`.
  *
  * The reference sidesteps partitioned layouts entirely — it rides
  * DuckDB's multi-file glob expansion
  * (/root/reference/src/reader/fls_multi_file_info.cpp:57-82) and never
  * surfaces path segments as columns. At 100 TB every real table is
  * partitioned, so this connector treats `k=v` path segments exactly
  * like Spark's built-in parquet source does: discovered as typed
  * partition columns, served as constant vectors, and — the point —
  * pruned at planning time so a filtered scan never opens (or even
  * footer-reads) non-matching partition directories' files.
  *
  * Discovery is pure path parsing: the footer listing already walked the
  * tree, so no extra filesystem RPC happens here.
  */
object FlsPartitioning {

  /** Hive's escapePathName character set (subset sufficient for
    * round-tripping what our writer emits + standard hive layouts). */
  private val NeedsEscape: Set[Char] =
    Set('"', '#', '%', '\'', '*', '/', ':', '=', '?', '\\',
      '{', '}', '[', ']', '^', (127).toChar) ++ (0 until 32).map(_.toChar)

  val DefaultPartitionName = "__HIVE_DEFAULT_PARTITION__"

  def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach { c =>
      if (NeedsEscape.contains(c)) sb.append(f"%%${c.toInt}%02X")
      else sb.append(c)
    }
    sb.toString
  }

  def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = s.substring(i + 1, i + 3)
        try { sb.append(Integer.parseInt(hex, 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Ordered `(key, rawValue)` pairs parsed from the `k=v` directory
    * segments of `file` strictly below one of `bases` (walk up parents
    * until a base matches; non-`k=v` segments between are rejected as
    * not-a-partition-layout → Nil). `rawValue` is unescaped; the hive
    * default-partition token maps to null. */
  def valuesFor(bases: Seq[Path], file: Path): Seq[(String, String)] = {
    var segs = List.empty[(String, String)]
    var p = file.getParent
    var hops = 0
    while (p != null && hops < 64) {
      if (bases.contains(p)) return segs
      val name = p.getName
      val eq = name.indexOf('=')
      if (eq <= 0) return Nil // non-k=v intermediate dir: not a hive layout
      val raw = unescape(name.substring(eq + 1))
      segs = (unescape(name.substring(0, eq)),
        if (raw == DefaultPartitionName) null else raw) :: segs
      p = p.getParent
      hops += 1
    }
    Nil
  }

  /** Discovered partition layout: key order + per-file raw values.
    * Empty `keys` = not partitioned. */
  final case class Discovery(
      keys: Seq[String],
      inferredTypes: Map[String, DataType],
      nullableKeys: Set[String],
      byFile: Map[String, Array[String]])

  /** Parse every file's partition values. All files must agree on the
    * key sequence; any disagreement (or any unpartitioned file) turns
    * discovery off rather than failing the read — matching Spark's
    * parquet source leniency for flat dirs while staying strict enough
    * that pruning is only enabled when it is sound for every file. */
  def discover(basePaths: Seq[String], files: Seq[Path], conf: Configuration): Discovery = {
    if (files.isEmpty) return Discovery(Nil, Map.empty, Set.empty, Map.empty)
    val bases = basePaths.map { p =>
      val hp = new Path(p)
      hp.getFileSystem(conf).makeQualified(hp)
    }
    val parsed = files.map(f => f -> valuesFor(bases, f))
    val keySeqs = parsed.map(_._2.map(_._1)).distinct
    if (keySeqs.length != 1 || keySeqs.head.isEmpty)
      return Discovery(Nil, Map.empty, Set.empty, Map.empty)
    val keys = keySeqs.head
    val byFile = parsed.map { case (f, kvs) => f.toString -> kvs.map(_._2).toArray }.toMap
    val types = keys.zipWithIndex.map { case (k, i) =>
      k -> inferType(byFile.valuesIterator.map(_(i)).filter(_ != null).toSeq)
    }.toMap
    val nullable = keys.zipWithIndex.collect {
      case (k, i) if byFile.valuesIterator.exists(_(i) == null) => k
    }.toSet
    Discovery(keys, types, nullable, byFile)
  }

  private val DateRe = """\d{4}-\d{2}-\d{2}""".r
  private val IntRe = """-?\d{1,19}""".r

  /** Conservative type inference (int → long → date → boolean →
    * string); doubles deliberately stay strings — "1.10" vs "1.1"
    * would not round-trip. */
  def inferType(values: Seq[String]): DataType = {
    if (values.isEmpty) return StringType
    if (values.forall(v => IntRe.pattern.matcher(v).matches() &&
        scala.util.Try(v.toLong).isSuccess)) {
      if (values.forall(v => { val l = v.toLong; l >= Int.MinValue && l <= Int.MaxValue }))
        IntegerType else LongType
    } else if (values.forall(v => DateRe.pattern.matcher(v).matches() &&
        scala.util.Try(java.time.LocalDate.parse(v)).isSuccess)) {
      DateType
    } else if (values.forall(v => v == "true" || v == "false")) {
      BooleanType
    } else StringType
  }

  /** Raw path string → typed value for `dt` (null raw → null). Types
    * beyond int/long/date/string read back as strings-cast-on-demand —
    * the writer only ever emits these four. */
  def castRaw(raw: String, dt: DataType): Any = {
    if (raw == null) return null
    dt match {
      case IntegerType => raw.trim.toInt
      case LongType => raw.trim.toLong
      case ShortType => raw.trim.toShort
      case ByteType => raw.trim.toByte
      case DateType => java.time.LocalDate.parse(raw.trim).toEpochDay.toInt
      case BooleanType => raw.trim.toBoolean
      case StringType => raw
      case other =>
        throw new UnsupportedOperationException(s"fls: partition column type $other")
    }
  }

  /** Hive path form of a partition value read from an InternalRow. */
  def pathString(dt: DataType, row: org.apache.spark.sql.catalyst.InternalRow, ord: Int): String =
    dt match {
      case IntegerType => row.getInt(ord).toString
      case LongType => row.getLong(ord).toString
      case ShortType => row.getShort(ord).toString
      case ByteType => row.getByte(ord).toString
      case DateType => java.time.LocalDate.ofEpochDay(row.getInt(ord).toLong).toString
      case StringType => row.getUTF8String(ord).toString
      case BooleanType => row.getBoolean(ord).toString
      case other =>
        throw new UnsupportedOperationException(
          s"fls: cannot partition by column of type $other")
    }

  // ------------------------------------------------------------- pruning

  /** Internal comparison value: numeric/date collapse to Long, strings
    * stay String (ordering comparisons are only trusted for longs —
    * UTF8 binary order vs java.lang.String order diverge off-BMP). */
  private def litToLong(v: Any): Option[Long] = v match {
    case n: java.lang.Integer => Some(n.longValue())
    case n: java.lang.Long => Some(n.longValue())
    case n: java.lang.Short => Some(n.longValue())
    case n: java.lang.Byte => Some(n.longValue())
    case d: java.sql.Date =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _ => None
  }

  private def litToString(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
    case _ => None
  }

  /** Evaluate one pushed Filter against a single file's partition
    * values. Some(false) = provably no row matches (file prunes);
    * None = can't tell (filter mentions data columns / unsupported
    * shape) — always safe. */
  def evalFilter(
      f: Filter,
      types: Map[String, DataType],
      values: Map[String, Any]): Option[Boolean] = {

    def part(col: String): Boolean = types.contains(col)

    def cmp(col: String, lit: Any)(longTest: (Long, Long) => Boolean): Option[Boolean] = {
      val v = values(col)
      if (v == null) return Some(false) // SQL comparison with NULL is never true
      (v, litToLong(lit)) match {
        case (pv: java.lang.Long, Some(l)) => Some(longTest(pv, l))
        case (pv: java.lang.Integer, Some(l)) => Some(longTest(pv.longValue(), l))
        case _ => None
      }
    }

    def eq(col: String, lit: Any): Option[Boolean] = {
      val v = values(col)
      if (v == null) return Some(false)
      (v, lit) match {
        case (pv: String, _) => litToString(lit).map(_ == pv)
        case (pv: java.lang.Boolean, l: java.lang.Boolean) => Some(pv == l)
        case _ => cmp(col, lit)(_ == _)
      }
    }

    f match {
      case And(l, r) =>
        (evalFilter(l, types, values), evalFilter(r, types, values)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case Or(l, r) =>
        (evalFilter(l, types, values), evalFilter(r, types, values)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case Not(x) => evalFilter(x, types, values).map(!_)
      case EqualTo(c, v) if part(c) => eq(c, v)
      case EqualNullSafe(c, v) if part(c) =>
        if (values(c) == null) Some(v == null)
        else if (v == null) Some(false)
        else eq(c, v)
      case In(c, vs) if part(c) =>
        if (vs.isEmpty) Some(false)
        else {
          val per = vs.toSeq.map(v => eq(c, v))
          if (per.exists(_ == Some(true))) Some(true)
          else if (per.forall(_ == Some(false))) Some(false)
          else None
        }
      case GreaterThan(c, v) if part(c) => cmp(c, v)(_ > _)
      case GreaterThanOrEqual(c, v) if part(c) => cmp(c, v)(_ >= _)
      case LessThan(c, v) if part(c) => cmp(c, v)(_ < _)
      case LessThanOrEqual(c, v) if part(c) => cmp(c, v)(_ <= _)
      case IsNull(c) if part(c) => Some(values(c) == null)
      case IsNotNull(c) if part(c) => Some(values(c) != null)
      case StringStartsWith(c, p) if part(c) =>
        values(c) match {
          case s: String => Some(s.startsWith(p))
          case null => Some(false)
          case _ => None
        }
      case _ => None
    }
  }

  /** Evaluate `f` on one file's partition values: Some(true) = every
    * row of the file satisfies it (partition values are file-constant),
    * Some(false) = none does, None = cannot tell. */
  def evaluates(
      f: Filter,
      types: Map[String, DataType],
      keys: Seq[String],
      raw: Array[String]): Option[Boolean] = {
    if (keys.isEmpty) return None
    val values: Map[String, Any] =
      try keys.zipWithIndex.map { case (k, i) =>
        k -> castRaw(raw(i), types.getOrElse(k, StringType))
      }.toMap
      catch { case _: Exception => return None }
    evalFilter(f, types, values)
  }

  /** True iff the file gives a DEFINITE answer for `f` — the predicate
    * that lets the scan builder consume a partition filter entirely
    * (no residual row-level re-check needed). */
  def decides(
      f: Filter,
      types: Map[String, DataType],
      keys: Seq[String],
      raw: Array[String]): Boolean =
    evaluates(f, types, keys, raw).isDefined

  /** File survives unless some filter is provably false on its
    * partition values. */
  def mayMatch(
      filters: Array[Filter],
      types: Map[String, DataType],
      keys: Seq[String],
      raw: Array[String]): Boolean = {
    if (keys.isEmpty) return true
    // a raw value that doesn't parse at the (possibly user-supplied)
    // column type makes the file unprunable, never a planning failure —
    // "can't tell" is always safe
    val values: Map[String, Any] =
      try keys.zipWithIndex.map { case (k, i) =>
        k -> castRaw(raw(i), types.getOrElse(k, StringType))
      }.toMap
      catch { case _: Exception => return true }
    filters.forall(f => evalFilter(f, types, values) != Some(false))
  }
}
