package graft.fls.connector

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.fls._
import graft.fls.Format._

/** Executor-side selection-vector filtering: evaluate the pushed
  * conjuncts over the DECODED row-group arrays and compact the group to
  * the surviving rows before any batch is materialized — the Spark
  * re-expression of the reference's scan-side FilterExecutor
  * (/root/reference/src/reader/filter_executor.cpp:19-60), which
  * filters each vector before handing rows to the engine.
  *
  * Division of labor: zone maps prune whole row groups on the driver;
  * this prunes ROWS inside surviving groups on the executor; Catalyst's
  * residual FilterExec re-checks whatever remains (the scan stays
  * conservative — an unsupported conjunct is simply not applied here).
  * Column-at-a-time: each conjunct runs one tight loop over the current
  * selection, so a 1% filter touches the other columns' bytes only for
  * the 1%.
  *
  * Exactness contract: every comparison happens in the column's own
  * physical domain (long / double with Spark's NaN-safe ordering /
  * unsigned bytes — the same orders Catalyst uses), and any literal
  * that cannot be converted EXACTLY drops the conjunct rather than risk
  * a wrong row-level drop. */
object FlsRowFilter {

  private val EQ = 0; private val GT = 1; private val GE = 2
  private val LT = 3; private val LE = 4

  /** One compiled conjunct bound to a read-schema column ordinal.
    * `filter` narrows the selection in place and returns the new count;
    * a data shape it cannot evaluate keeps all current rows. */
  sealed abstract class Pred(val colIdx: Int) {
    def filter(data: ColData, sel: Array[Int], m: Int): Int
    /** First-conjunct fast path: scan rows [0, n) directly and write
      * kept indices into `sel`, skipping the identity-array init and
      * its indirection (measured: the init alone costs as much as one
      * column fill at 64×). Returns -1 when the data shape cannot be
      * evaluated (caller treats the conjunct as pass-through). */
    def filterAll(data: ColData, n: Int, sel: Array[Int]): Int = {
      var i = 0
      while (i < n) { sel(i) = i; i += 1 }
      filter(data, sel, n)
    }
  }

  /** Comparison / IN / prefix over the long physical domain.
    * `flip = Long.MinValue` turns every compare UNSIGNED via the
    * order-isomorphism `u64compare(a, b) == compare(a^MIN, b^MIN)` —
    * the UINT64 raw-bits domain — at one XOR per row on the signed
    * path (flip = 0, measured in the noise of the compare loop). */
  private final class LongPred(ci: Int, op: Int, v0: Long, flip: Long = 0L)
      extends Pred(ci) {
    private val v = v0 ^ flip
    @inline private def keep(x0: Long): Boolean = {
      val x = x0 ^ flip
      op match {
        case EQ => x == v
        case GT => x > v
        case GE => x >= v
        case LT => x < v
        case LE => x <= v
      }
    }
    def filter(data: ColData, sel: Array[Int], m: Int): Int =
      data match {
        case LongData(vs) =>
          var k = 0; var i = 0
          while (i < m) {
            if (keep(vs(sel(i)))) { sel(k) = sel(i); k += 1 }
            i += 1
          }
          k
        case DictLongs(dict, codes) =>
          val keepD = dictTable(dict)
          var k = 0; var i = 0
          while (i < m) {
            if (keepD(codes(sel(i)).toInt)) { sel(k) = sel(i); k += 1 }
            i += 1
          }
          k
        case _ => m
      }
    override def filterAll(data: ColData, n: Int, sel: Array[Int]): Int =
      data match {
        case LongData(vs) =>
          var k = 0; var i = 0
          while (i < n) {
            if (keep(vs(i))) { sel(k) = i; k += 1 }
            i += 1
          }
          k
        case DictLongs(dict, codes) =>
          val keepD = dictTable(dict)
          var k = 0; var i = 0
          while (i < n) {
            if (keepD(codes(i).toInt)) { sel(k) = i; k += 1 }
            i += 1
          }
          k
        case _ => -1
      }
    /** Evaluate once per DICT ENTRY; the row loop is a table lookup. */
    private def dictTable(dict: Array[Long]): Array[Boolean] = {
      val t = new Array[Boolean](dict.length)
      var j = 0
      while (j < dict.length) { t(j) = keep(dict(j)); j += 1 }
      t
    }
  }

  /** `raw` holds domain values (raw bits for UINT64); the search array
    * is built in the FLIPPED space so signed binarySearch realizes the
    * unsigned order (see [[LongPred]]). */
  private final class LongInPred(ci: Int, raw: Array[Long], flip: Long = 0L)
      extends Pred(ci) {
    private val sorted: Array[Long] = {
      val a = raw.map(_ ^ flip)
      java.util.Arrays.sort(a)
      a
    }
    def filter(data: ColData, sel: Array[Int], m: Int): Int =
      data match {
        case LongData(vs) =>
          var k = 0; var i = 0
          while (i < m) {
            if (java.util.Arrays.binarySearch(sorted, vs(sel(i)) ^ flip) >= 0) {
              sel(k) = sel(i); k += 1
            }
            i += 1
          }
          k
        case DictLongs(dict, codes) =>
          val keep = new Array[Boolean](dict.length)
          var j = 0
          while (j < dict.length) {
            keep(j) = java.util.Arrays.binarySearch(sorted, dict(j) ^ flip) >= 0; j += 1
          }
          var k = 0; var i = 0
          while (i < m) {
            if (keep(codes(sel(i)).toInt)) { sel(k) = sel(i); k += 1 }
            i += 1
          }
          k
        case _ => m
      }
  }

  /** Spark's NaN-safe double ordering (nanSafeCompareDoubles): == first
    * so -0.0 equals 0.0, NaN equals NaN and sorts above everything. */
  @inline private def cmpD(x: Double, v: Double): Int =
    if (x == v) 0
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(v)) 0 else 1 }
    else if (java.lang.Double.isNaN(v)) -1
    else if (x < v) -1 else 1

  private final class DoublePred(ci: Int, op: Int, v: Double) extends Pred(ci) {
    @inline private def keep(x: Double): Boolean = {
      val c = cmpD(x, v)
      op match {
        case EQ => c == 0
        case GT => c > 0
        case GE => c >= 0
        case LT => c < 0
        case LE => c <= 0
      }
    }
    def filter(data: ColData, sel: Array[Int], m: Int): Int =
      data match {
        case DoubleData(vs) =>
          var k = 0; var i = 0
          while (i < m) {
            if (keep(vs(sel(i)))) { sel(k) = sel(i); k += 1 }
            i += 1
          }
          k
        case DictDoubles(dict, codes) =>
          val keepD = dictTable(dict)
          var k = 0; var i = 0
          while (i < m) {
            if (keepD(codes(sel(i)).toInt)) { sel(k) = sel(i); k += 1 }
            i += 1
          }
          k
        case _ => m
      }
    override def filterAll(data: ColData, n: Int, sel: Array[Int]): Int =
      data match {
        case DoubleData(vs) =>
          var k = 0; var i = 0
          while (i < n) {
            if (keep(vs(i))) { sel(k) = i; k += 1 }
            i += 1
          }
          k
        case DictDoubles(dict, codes) =>
          val keepD = dictTable(dict)
          var k = 0; var i = 0
          while (i < n) {
            if (keepD(codes(i).toInt)) { sel(k) = i; k += 1 }
            i += 1
          }
          k
        case _ => -1
      }
    /** Evaluate once per DICT ENTRY; the row loop is a table lookup. */
    private def dictTable(dict: Array[Double]): Array[Boolean] = {
      val t = new Array[Boolean](dict.length)
      var j = 0
      while (j < dict.length) { t(j) = keep(dict(j)); j += 1 }
      t
    }
  }

  private final class DoubleInPred(ci: Int, vals: Array[Double]) extends Pred(ci) {
    @inline private def hit(x: Double): Boolean = {
      var j = 0
      while (j < vals.length) { if (cmpD(x, vals(j)) == 0) return true; j += 1 }
      false
    }
    def filter(data: ColData, sel: Array[Int], m: Int): Int =
      data match {
        case DoubleData(vs) =>
          var k = 0; var i = 0
          while (i < m) {
            if (hit(vs(sel(i)))) { sel(k) = sel(i); k += 1 }
            i += 1
          }
          k
        case DictDoubles(dict, codes) =>
          val keep = new Array[Boolean](dict.length)
          var j = 0
          while (j < dict.length) { keep(j) = hit(dict(j)); j += 1 }
          var k = 0; var i = 0
          while (i < m) {
            if (keep(codes(sel(i)).toInt)) { sel(k) = sel(i); k += 1 }
            i += 1
          }
          k
        case _ => m
      }
  }

  /** String/binary compare, IN, and prefix over unsigned bytes (the
    * UTF8String order). For a dictionary-decoded group the predicate
    * evaluates once per DICT ENTRY, then the row loop is a table
    * lookup. */
  private final class BytesPred(ci: Int, op: Int, v: Array[Byte],
      inSet: Array[Array[Byte]] = null, prefix: Boolean = false) extends Pred(ci) {

    @inline private def keepBytes(b: Array[Byte], s: Int, e: Int): Boolean = {
      if (prefix) {
        val n = v.length
        e - s >= n && java.util.Arrays.equals(b, s, s + n, v, 0, n)
      } else if (inSet != null) {
        var j = 0
        while (j < inSet.length) {
          val w = inSet(j)
          if (java.util.Arrays.equals(b, s, e, w, 0, w.length)) return true
          j += 1
        }
        false
      } else {
        val c = java.util.Arrays.compareUnsigned(b, s, e, v, 0, v.length)
        op match {
          case EQ => c == 0
          case GT => c > 0
          case GE => c >= 0
          case LT => c < 0
          case LE => c <= 0
        }
      }
    }

    def filter(data: ColData, sel: Array[Int], m: Int): Int =
      data match {
        case BytesData(offsets, bytes) =>
          var k = 0; var i = 0
          while (i < m) {
            val r = sel(i)
            if (keepBytes(bytes, offsets(r), offsets(r + 1))) { sel(k) = sel(i); k += 1 }
            i += 1
          }
          k
        case DictBytes(values, codes) =>
          val keep = new Array[Boolean](values.length)
          var j = 0
          while (j < values.length) {
            keep(j) = keepBytes(values(j), 0, values(j).length); j += 1
          }
          var k = 0; var i = 0
          while (i < m) {
            if (keep(codes(sel(i)).toInt)) { sel(k) = sel(i); k += 1 }
            i += 1
          }
          k
        case _ => m
      }
    override def filterAll(data: ColData, n: Int, sel: Array[Int]): Int =
      data match {
        case BytesData(offsets, bytes) =>
          var k = 0; var i = 0
          while (i < n) {
            if (keepBytes(bytes, offsets(i), offsets(i + 1))) { sel(k) = i; k += 1 }
            i += 1
          }
          k
        case DictBytes(values, codes) =>
          val keep = new Array[Boolean](values.length)
          var j = 0
          while (j < values.length) {
            keep(j) = keepBytes(values(j), 0, values(j).length); j += 1
          }
          var k = 0; var i = 0
          while (i < n) {
            if (keep(codes(i).toInt)) { sel(k) = i; k += 1 }
            i += 1
          }
          k
        case _ => -1
      }
  }

  /** IsNull on a stored column: the format has no NULLs → empty. */
  private final class NeverPred(ci: Int) extends Pred(ci) {
    def filter(data: ColData, sel: Array[Int], m: Int): Int = 0
  }

  /** Union of same-column predicates (`a = 1 OR a = 5`): keep a row iff
    * ANY branch keeps it. Each branch runs its own optimized loop
    * (including the per-dict-entry tables) over a scratch COPY of the
    * current selection; the kept subsets — ascending, since every
    * branch preserves selection order — merge by sorted union. A branch
    * that keeps all current rows (which includes the cannot-evaluate
    * pass-through) short-circuits to pass-through: the scan may only
    * drop a row it can prove fails EVERY branch. */
  private final class OrPred(val parts: Array[Pred]) extends Pred(parts(0).colIdx) {
    private var buf: Array[Int] = null // branch scratch
    private var acc: Array[Int] = null // union so far
    private var nxt: Array[Int] = null // merge target
    def filter(data: ColData, sel: Array[Int], m: Int): Int = {
      if (buf == null || buf.length < m) {
        buf = new Array[Int](m); acc = new Array[Int](m); nxt = new Array[Int](m)
      }
      var accN = 0
      var j = 0
      while (j < parts.length) {
        System.arraycopy(sel, 0, buf, 0, m)
        val k = parts(j).filter(data, buf, m)
        if (k >= m) return m // branch kept everything → the union is `sel`
        var a = 0; var b = 0; var o = 0
        while (a < accN && b < k) {
          val va = acc(a); val vb = buf(b)
          if (va < vb) { nxt(o) = va; a += 1 }
          else if (va > vb) { nxt(o) = vb; b += 1 }
          else { nxt(o) = va; a += 1; b += 1 }
          o += 1
        }
        while (a < accN) { nxt(o) = acc(a); a += 1; o += 1 }
        while (b < k) { nxt(o) = buf(b); b += 1; o += 1 }
        val t = acc; acc = nxt; nxt = t; accN = o
        if (accN == m) return m
        j += 1
      }
      System.arraycopy(acc, 0, sel, 0, accN)
      accN
    }
  }

  /** Conjunction of same-column predicates — an `And` BRANCH inside an
    * `Or` (top-level Ands split into independent conjuncts in
    * [[compile]]). Parts apply sequentially; each only narrows, so any
    * order is exact. A part missing at compile time (unsupported leaf)
    * is simply not applied — approximation FROM ABOVE, which under the
    * enclosing Or can only keep extra rows, never drop one. */
  private final class AndPred(parts: Array[Pred]) extends Pred(parts(0).colIdx) {
    def filter(data: ColData, sel: Array[Int], m: Int): Int = {
      var k = m; var j = 0
      while (j < parts.length && k > 0) { k = parts(j).filter(data, sel, k); j += 1 }
      k
    }
  }

  /** Adaptive conjunct ordering (≙ reference AdaptiveFilter wiring,
    * /root/reference/src/reader/filter_executor.cpp:38-55 and
    * fls_reader.cpp:357-380, which permutes conjuncts by runtime
    * feedback). Spark-first re-expression: instead of DuckDB's
    * random-adjacent-swap hill climb, keep running per-conjunct cost
    * (nanos, including the column decode it triggers) and selectivity
    * (rows out / rows in), and every [[everyGroups]] row groups re-sort
    * the permutation by Hellerstein's predicate-ordering rank
    * `(selectivity − 1) / costPerRow` ascending — biggest drop per
    * nanosecond first. Deterministic given the observations, O(k²) on
    * a handful of conjuncts, and exact under ANY permutation because
    * conjuncts commute over the selection vector (each only narrows). */
  final class AdaptiveOrder(n: Int, everyGroups: Int = 8) {
    /** Application order: `perm(0)` runs first. Starts in pushed order. */
    val perm: Array[Int] = Array.tabulate(n)(identity)
    private val nanos = new Array[Long](n)
    private val rowsIn = new Array[Long](n)
    private val rowsOut = new Array[Long](n)
    private var groups = 0

    def record(pred: Int, dNanos: Long, in: Long, out: Long): Unit = {
      nanos(pred) += dNanos; rowsIn(pred) += in; rowsOut(pred) += out
    }

    /** Call once per filtered row group; reorders every `everyGroups`. */
    def groupDone(): Unit = { groups += 1; if (groups % everyGroups == 0) reorder() }

    def rank(pred: Int): Double =
      if (rowsIn(pred) <= 0) 0.0 // unmeasured (earlier conjunct emptied the group) = neutral
      else {
        val sel = rowsOut(pred).toDouble / rowsIn(pred).toDouble
        val costPerRow = math.max(nanos(pred).toDouble / rowsIn(pred).toDouble, 1e-3)
        (sel - 1.0) / costPerRow
      }

    /** Insertion sort by (rank, pushed index) ascending: ties
      * (unmeasured or pass-through conjuncts, rank 0) land in PUSHED
      * order — explicitly, not via sort stability, which would only
      * preserve the previous permutation after the first reorder.
      * After sorting, the accumulators are HALVED (exponential decay,
      * window ≈ 2·everyGroups row groups): without decay a long chunk
      * over clustered data freezes on whatever selectivity the first
      * row groups showed, and the claimed adaptivity degrades to a
      * one-shot decision. Halving keeps the counters integral and the
      * rank ratio unchanged at the instant of decay. */
    def reorder(): Unit = {
      var a = 1
      while (a < perm.length) {
        val v = perm(a); val rv = rank(v); var b = a - 1
        while (b >= 0 &&
            { val rb = rank(perm(b)); rb > rv || (rb == rv && perm(b) > v) }) {
          perm(b + 1) = perm(b); b -= 1
        }
        perm(b + 1) = v
        a += 1
      }
      var i = 0
      while (i < n) {
        nanos(i) >>= 1; rowsIn(i) >>= 1; rowsOut(i) >>= 1
        i += 1
      }
    }
  }

  /** Compile the pushed conjuncts against this chunk's column types.
    * Unsupported shapes/conversions are silently dropped (Catalyst's
    * residual filter still enforces them). */
  def compile(filters: Array[Filter], schema: StructType,
      fileTypes: Array[Option[ColumnType]],
      sizeVirtuals: Map[String, String]): Array[Pred] = {
    val out = scala.collection.mutable.ArrayBuffer[Pred]()
    def walk(f: Filter): Unit = f match {
      case And(l, r) => walk(l); walk(r)
      case leaf => compileLeaf(leaf, schema, fileTypes, sizeVirtuals).foreach(out += _)
    }
    filters.foreach(walk)
    out.toArray
  }

  private def colOf(schema: StructType, name: String): Int =
    schema.fieldNames.indexOf(name)

  /** Exact literal → long-domain conversion for the column's stored
    * type; None = cannot convert exactly, drop the conjunct. */
  private def toLongExact(value: Any, ct: ColumnType): Option[Long] = {
    import TypeTag._
    try {
      (ct.tag, value) match {
        case (_, null) => None
        case (BOOLEAN, b: java.lang.Boolean) => Some(if (b) 1L else 0L)
        case (DATE, d: java.sql.Date) =>
          Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong)
        case (DATE, d: java.time.LocalDate) => Some(d.toEpochDay)
        case (TIMESTAMP | TIMESTAMP_NTZ, t: java.sql.Timestamp) =>
          Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
        case (TIMESTAMP | TIMESTAMP_NTZ, t: java.time.Instant) =>
          Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(t))
        case (TIMESTAMP | TIMESTAMP_NTZ, t: java.time.LocalDateTime) =>
          Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(t))
        case (DECIMAL, d: java.math.BigDecimal) =>
          Some(d.setScale(ct.scale).unscaledValue().longValueExact())
        case (DECIMAL, d: BigDecimal) =>
          Some(d.setScale(ct.scale).underlying().unscaledValue().longValueExact())
        // u8/u16/u32 widen to non-negative longs, where signed order IS
        // unsigned order — the plain long path is already exact
        case (INT8 | INT16 | INT32 | INT64 | UINT8 | UINT16 | UINT32,
            n: java.lang.Byte) => Some(n.longValue())
        case (INT8 | INT16 | INT32 | INT64 | UINT8 | UINT16 | UINT32,
            n: java.lang.Short) => Some(n.longValue())
        case (INT8 | INT16 | INT32 | INT64 | UINT8 | UINT16 | UINT32,
            n: java.lang.Integer) => Some(n.longValue())
        case (INT8 | INT16 | INT32 | INT64 | UINT8 | UINT16 | UINT32,
            n: java.lang.Long) => Some(n.longValue())
        case _ => None
      }
    } catch { case _: ArithmeticException => None } // inexact scale/overflow
  }

  /** Exact literal → UINT64 raw-bits conversion: the column surfaces as
    * DECIMAL(20,0), so literals arrive as BigDecimal; an integral value
    * in [0, 2^64) maps to its low 64 bits (the stored pattern — values
    * past Long.MaxValue land on negative longs, compared with the
    * unsigned flip). Out-of-domain literals drop the conjunct. */
  private val Two64 = java.math.BigInteger.ONE.shiftLeft(64)
  private def toU64RawExact(value: Any): Option[Long] = {
    val bi: java.math.BigInteger = value match {
      case d: java.math.BigDecimal =>
        try d.toBigIntegerExact catch { case _: ArithmeticException => return None }
      case d: BigDecimal =>
        try d.underlying().toBigIntegerExact
        catch { case _: ArithmeticException => return None }
      case n: java.lang.Long => java.math.BigInteger.valueOf(n)
      case n: java.lang.Integer => java.math.BigInteger.valueOf(n.longValue())
      case _ => return None
    }
    if (bi.signum() < 0 || bi.compareTo(Two64) >= 0) None
    else Some(bi.longValue()) // truncation to low 64 bits = raw pattern
  }

  private def toDoubleExact(value: Any, ct: ColumnType): Option[Double] = {
    import TypeTag._
    (ct.tag, value) match {
      case (_, null) => None
      // float literals widen to double exactly; comparisons agree
      case (FLOAT | DOUBLE, n: java.lang.Float) => Some(n.doubleValue())
      case (FLOAT | DOUBLE, n: java.lang.Double) => Some(n.doubleValue())
      case _ => None
    }
  }

  private def toBytes(value: Any): Option[Array[Byte]] = value match {
    case s: String => Some(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case s: org.apache.spark.unsafe.types.UTF8String => Some(s.getBytes)
    case b: Array[Byte] => Some(b)
    case _ => None
  }

  private def compileLeaf(f: Filter, schema: StructType,
      fileTypes: Array[Option[ColumnType]],
      sizeVirtuals: Map[String, String]): Option[Pred] = {

    def typed(name: String): Option[(Int, ColumnType)] = {
      val ci = colOf(schema, name)
      if (ci < 0) None
      else fileTypes(ci) match {
        case Some(ct) => Some((ci, ct))
        // virtual `<col>_size` decodes to a LongData slot: long domain
        case None if sizeVirtuals.contains(name) =>
          Some((ci, ColumnType(TypeTag.INT64)))
        case None => None // partition/virtual/absent: planner's job
      }
    }

    def cmpPred(name: String, v: Any, op: Int): Option[Pred] =
      typed(name).flatMap { case (ci, ct) =>
        physOf(ct.tag) match {
          case Phys.LONG if ct.tag == TypeTag.UINT64 =>
            toU64RawExact(v).map(new LongPred(ci, op, _, flip = Long.MinValue))
          case Phys.LONG => toLongExact(v, ct).map(new LongPred(ci, op, _))
          case Phys.DOUBLE => toDoubleExact(v, ct).map(new DoublePred(ci, op, _))
          case Phys.BYTES => toBytes(v).map(new BytesPred(ci, op, _))
          case _ => None
        }
      }

    f match {
      case EqualTo(c, v) => cmpPred(c, v, EQ)
      case EqualNullSafe(c, null) =>
        typed(c).map { case (ci, _) => new NeverPred(ci) }
      case EqualNullSafe(c, v) => cmpPred(c, v, EQ)
      case GreaterThan(c, v) => cmpPred(c, v, GT)
      case GreaterThanOrEqual(c, v) => cmpPred(c, v, GE)
      case LessThan(c, v) => cmpPred(c, v, LT)
      case LessThanOrEqual(c, v) => cmpPred(c, v, LE)
      case IsNull(c) => typed(c).map { case (ci, _) => new NeverPred(ci) }
      case IsNotNull(_) => None // no NULLs: always true, nothing to do
      case In(c, vs) =>
        typed(c).flatMap { case (ci, ct) =>
          if (vs.contains(null)) None // null in set: leave to Catalyst
          else physOf(ct.tag) match {
            case Phys.LONG if ct.tag == TypeTag.UINT64 =>
              val conv = vs.map(toU64RawExact)
              if (conv.exists(_.isEmpty)) None
              else Some(new LongInPred(ci, conv.map(_.get).distinct,
                flip = Long.MinValue))
            case Phys.LONG =>
              val conv = vs.map(toLongExact(_, ct))
              if (conv.exists(_.isEmpty)) None
              else Some(new LongInPred(ci, conv.map(_.get).distinct))
            case Phys.DOUBLE =>
              val conv = vs.map(toDoubleExact(_, ct))
              if (conv.exists(_.isEmpty)) None
              else Some(new DoubleInPred(ci, conv.map(_.get)))
            case Phys.BYTES =>
              val conv = vs.map(toBytes)
              if (conv.exists(_.isEmpty)) None
              else Some(new BytesPred(ci, EQ, null, inSet = conv.map(_.get)))
            case _ => None
          }
        }
      case StringStartsWith(c, p) if p != null =>
        typed(c).flatMap { case (ci, ct) =>
          if (physOf(ct.tag) == Phys.BYTES)
            Some(new BytesPred(ci, EQ,
              p.getBytes(java.nio.charset.StandardCharsets.UTF_8), prefix = true))
          else None
        }
      case o @ Or(_, _) => compileNode(o, schema, fileTypes, sizeVirtuals)
      case _ => None // Not/unsupported: residual FilterExec handles it
    }
  }

  /** Compile an And/Or TREE into one same-column predicate. The filter
    * loop hands a predicate exactly one column's decoded data, so every
    * reachable leaf must bind the same ordinal; a cross-column Or (or
    * any branch that compiles to nothing — unsupported shape, or
    * IsNotNull which is always TRUE on this NULL-free format and makes
    * the disjunction vacuous) returns None and the whole tree stays
    * with Catalyst's residual FilterExec. Or-branch semantics flip the
    * conservative direction: a dropped AND-part keeps extra rows
    * (safe), but a dropped OR-branch could drop rows that satisfy it —
    * so Or requires EVERY branch compiled. */
  private def compileNode(f: Filter, schema: StructType,
      fileTypes: Array[Option[ColumnType]],
      sizeVirtuals: Map[String, String]): Option[Pred] = f match {
    case Or(l, r) =>
      (compileNode(l, schema, fileTypes, sizeVirtuals),
        compileNode(r, schema, fileTypes, sizeVirtuals)) match {
        case (Some(lp), Some(rp)) if lp.colIdx == rp.colIdx =>
          def fl(p: Pred): Seq[Pred] = p match {
            case o: OrPred => o.parts.toSeq
            case x => Seq(x)
          }
          Some(new OrPred((fl(lp) ++ fl(rp)).toArray))
        case _ => None
      }
    case And(l, r) =>
      val ps = Seq(l, r).flatMap(compileNode(_, schema, fileTypes, sizeVirtuals))
      ps match {
        case Seq() => None
        case Seq(one) => Some(one)
        case many if many.forall(_.colIdx == many.head.colIdx) =>
          Some(new AndPred(many.toArray))
        case _ => None // cross-column And under an Or: one column's data isn't enough
      }
    case leaf => compileLeaf(leaf, schema, fileTypes, sizeVirtuals)
  }

  // ------------------------------------------------------- compaction

  /** Element-level gather for offset-shaped data (arrays/maps): kept
    * rows' element RANGES become a dense element selection plus the
    * rebased offsets. */
  private def gatherOffsets(offsets: Array[Int], sel: Array[Int],
      m: Int): (Array[Int], Array[Int]) = {
    val outOff = new Array[Int](m + 1)
    var total = 0
    var i = 0
    while (i < m) {
      val r = sel(i)
      total += offsets(r + 1) - offsets(r)
      outOff(i + 1) = total
      i += 1
    }
    val elemSel = new Array[Int](total)
    var k = 0
    i = 0
    while (i < m) {
      val r = sel(i)
      var j = offsets(r)
      while (j < offsets(r + 1)) { elemSel(k) = j; k += 1; j += 1 }
      i += 1
    }
    (outOff, elemSel)
  }

  /** Gather `data` down to the selected rows — every shape, nested
    * included (delete-vector compaction has no residual re-check, so
    * a shape this cannot gather would be a correctness hole, not a
    * missed optimization). */
  def compact(data: ColData, sel: Array[Int], m: Int): ColData = data match {
    case LongData(vs) =>
      val out = new Array[Long](m)
      var i = 0
      while (i < m) { out(i) = vs(sel(i)); i += 1 }
      LongData(out)
    case DoubleData(vs) =>
      val out = new Array[Double](m)
      var i = 0
      while (i < m) { out(i) = vs(sel(i)); i += 1 }
      DoubleData(out)
    case BytesData(offsets, bytes) =>
      val outOff = new Array[Int](m + 1)
      var total = 0
      var i = 0
      while (i < m) {
        val r = sel(i)
        total += offsets(r + 1) - offsets(r)
        outOff(i + 1) = total
        i += 1
      }
      val outBytes = new Array[Byte](total)
      i = 0
      while (i < m) {
        val r = sel(i)
        System.arraycopy(bytes, offsets(r), outBytes, outOff(i),
          offsets(r + 1) - offsets(r))
        i += 1
      }
      BytesData(outOff, outBytes)
    case DictBytes(values, codes) =>
      val out = new Array[Long](m)
      var i = 0
      while (i < m) { out(i) = codes(sel(i)); i += 1 }
      DictBytes(values, out)
    case DictLongs(dict, codes) =>
      val out = new Array[Long](m)
      var i = 0
      while (i < m) { out(i) = codes(sel(i)); i += 1 }
      DictLongs(dict, out)
    case DictDoubles(dict, codes) =>
      val out = new Array[Long](m)
      var i = 0
      while (i < m) { out(i) = codes(sel(i)); i += 1 }
      DictDoubles(dict, out)
    case ArrayColData(offsets, values) =>
      val (outOff, elemSel) = gatherOffsets(offsets, sel, m)
      ArrayColData(outOff, compact(values, elemSel, elemSel.length))
    case MapColData(offsets, keys, values) =>
      val (outOff, elemSel) = gatherOffsets(offsets, sel, m)
      MapColData(outOff, compact(keys, elemSel, elemSel.length),
        compact(values, elemSel, elemSel.length))
    case StructData(children, _) =>
      StructData(children.map(c =>
        if (c == null) null else compact(c, sel, m)), m)
    case StructMarker(_) => StructMarker(m)
    case other => other
  }
}
