package graft.fls

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** EQUALITY deletes — Iceberg-v2-style predicate deletes re-expressed
  * as manifest metadata. A `DELETE FROM t WHERE key = X` on an
  * unclustered key is the worst shape for both existing delete legs:
  * copy-on-write rewrites (or at best DV-scans) every straddling file,
  * and merge-on-read still READS every candidate file at commit time
  * to find positions. An equality delete instead commits the PREDICATE
  * itself — one `#eqdel` header line in the next manifest version,
  * O(1) data reads — and every reader applies it as an unconditional
  * residual at decode ([[FlsEqResidual]]), exactly like delete-vector
  * positions. Rewrites absorb it: files written after the delete carry
  * a birth version (`bv` in the entry stats) newer than the
  * predicate's commit version, so compaction / UPDATE / MERGE output
  * is no longer subject, and the predicate is dropped from the log
  * once no retained entry predates it.
  *
  * APPLICABILITY is by birth version, the Iceberg sequence-number
  * rule: predicate committed at version V applies to a file iff the
  * file's `bv <= V` (legacy entries without a stamp read as bv=0 —
  * conservatively subject until rewritten). This is what makes the
  * commit O(1): nothing per-file is written, applicability is derived.
  *
  * SCOPE: a conjunction of `=` / `IN` conjuncts over non-null
  * literals, each on a DISTINCT integral / boolean / date / timestamp
  * / string / float / double column — one column (the r15 shape) or a
  * composite key (`user_id = X AND tenant_id = Y`, the Iceberg
  * equality_ids shape; the residual is the AND of per-column masks).
  * Anything else falls back to the copy-on-write or merge-on-read leg
  * (decimals: per-file scales make cross-file literal comparison
  * ambiguous; NaN: Spark's NaN-equality semantics diverge from the
  * storage comparison). Value-producing metadata shortcuts (footer
  * aggregates, TopN/limit bound pruning) refuse files carrying a
  * residual, the same discipline as delete vectors; "can any row
  * match?" pruning (zone maps, Bloom, partition values) stays on —
  * stats over a superset of live rows are conservative.
  *
  * The reference format is scan-only with no DML at all
  * (/root/reference/src/read_fls.cpp:32-46); the delete ladder
  * (CoW → DVs → equality predicates) is this repo's own. */
object FlsEqDeletes {

  /** Kind tags: the literal domain values are serialized in.
    * `l` = long semantic domain (integers, boolean 0/1, date epochDay,
    * timestamp micros), `d` = double, `s` = UTF-8 string. */
  val KindLong = "l"
  val KindDouble = "d"
  val KindString = "s"

  /** One conjunct of a committed predicate: `col IN vals` (a single
    * `=` is a one-element IN). Values live in the storage-semantic
    * domain of `kind`, sorted for the decode-time binary search. */
  final case class Leg(col: String, kind: String, longs: Array[Long],
      doubles: Array[Double], strings: Array[String]) {
    private[fls] def valsJson: JArray = kind match {
      case KindLong => JArray(longs.toList.map(JLong(_)))
      case KindDouble => JArray(doubles.toList.map(JDouble(_)))
      case KindString => JArray(strings.toList.map(JString(_)))
    }
  }

  /** One committed predicate: delete rows matching EVERY leg — the
    * Iceberg equality_ids shape (a composite GDPR key `user_id = X
    * AND tenant_id = Y` commits as ONE line; each leg may carry an IN
    * set, so the tuple set is the legs' cross product, exactly the
    * rows the DELETE's WHERE matched). `v` = the manifest version the
    * delete committed at (0 = not yet stamped — [[stamp]] fills it
    * inside the commit attempt). */
  final case class EqDelete(v: Long, legs: Seq[Leg]) {
    require(legs.nonEmpty, "fls eqdel: a predicate needs at least one leg")
    def json: String = {
      // single-leg predicates keep the original flat form so every
      // #eqdel line written before multi-column support parses the
      // same bytes it always did
      val body: List[(String, JValue)] =
        if (legs.length == 1) {
          val l = legs.head
          List("v" -> JLong(v), "c" -> JString(l.col),
            "k" -> JString(l.kind), "x" -> l.valsJson)
        } else {
          List("v" -> JLong(v), "a" -> JArray(legs.toList.map(l =>
            JObject(List("c" -> JString(l.col), "k" -> JString(l.kind),
              "x" -> l.valsJson)))))
        }
      JsonMethods.compact(JsonMethods.render(JObject(body)))
    }
  }

  private def parseLeg(o: JValue, json: String): Leg = {
    val col = o \ "c" match { case JString(s) => s
      case _ => sys.error(s"fls eqdel: missing column in '$json'") }
    val kind = o \ "k" match { case JString(s) => s
      case _ => sys.error(s"fls eqdel: missing kind in '$json'") }
    val xs = o \ "x" match { case JArray(a) => a
      case _ => sys.error(s"fls eqdel: missing values in '$json'") }
    kind match {
      case KindLong => Leg(col, kind,
        xs.map { case JInt(n) => n.toLong; case JLong(n) => n
          case other => sys.error(s"fls eqdel: bad long $other") }.toArray,
        Array.empty, Array.empty)
      case KindDouble => Leg(col, kind, Array.empty,
        xs.map { case JDouble(d) => d; case JInt(n) => n.toDouble
          case JLong(n) => n.toDouble
          case other => sys.error(s"fls eqdel: bad double $other") }.toArray,
        Array.empty)
      case KindString => Leg(col, kind, Array.empty, Array.empty,
        xs.map { case JString(s) => s
          case other => sys.error(s"fls eqdel: bad string $other") }.toArray)
      case other => sys.error(s"fls eqdel: unknown kind '$other' in '$json'")
    }
  }

  def parse(json: String): EqDelete = {
    val o = JsonMethods.parse(json)
    val v = o \ "v" match { case JInt(n) => n.toLong; case JLong(n) => n
      case other => sys.error(s"fls eqdel: bad version in '$json': $other") }
    o \ "a" match {
      case JArray(ls) =>
        require(ls.nonEmpty, s"fls eqdel: empty conjunction in '$json'")
        EqDelete(v, ls.map(parseLeg(_, json)))
      case _ => EqDelete(v, Seq(parseLeg(o, json)))
    }
  }

  /** The predicate's commit version without a full parse. */
  def versionOf(json: String): Long = parse(json).v

  /** Fill the commit version (called inside each commit ATTEMPT — a
    * lost CAS race restamps with the retried version). */
  def stamp(json: String, v: Long): String = parse(json).copy(v = v).json

  /** Does the predicate of `predJson` apply to an entry with stats
    * `statsJson`? Birth-version rule; legacy entries (no `bv`) are
    * subject to everything. */
  def applies(predV: Long, statsJson: String): Boolean =
    FlsFileStats.birthOf(statsJson) <= predV

  /** Driver-side shape check + literal conversion: the DELETE filter
    * conjunction as ONE supported equality predicate — each conjunct
    * an `=` / `IN` over a distinct supported scalar column (the
    * composite-key GDPR shape) — or None (caller falls back to the
    * copy-on-write / merge-on-read leg). Values are converted to the
    * storage-semantic domain HERE, with the same rules as the
    * scan-side literal conversion, so executors compare raw decoded
    * values with zero per-row conversion. */
  def fromFilters(filters: Array[Filter], schema: StructType): Option[EqDelete] = {
    val real = filters.filterNot(_.isInstanceOf[AlwaysTrue])
    if (real.isEmpty) return None
    val legs = real.map(legFromFilter(_, schema))
    if (legs.exists(_.isEmpty)) return None
    val ls = legs.map(_.get).toSeq
    // two conjuncts on one column (c = 1 AND c = 2) could intersect,
    // but the shape is degenerate — ladder fallback keeps it exact
    if (ls.map(_.col).distinct.length != ls.length) return None
    Some(EqDelete(0L, ls))
  }

  private def legFromFilter(f: Filter, schema: StructType): Option[Leg] = {
    val (col, raw) = f match {
      case EqualTo(c, v) if v != null => (c, Seq(v))
      case EqualNullSafe(c, v) if v != null => (c, Seq(v))
      case In(c, vs) if vs.nonEmpty && !vs.contains(null) => (c, vs.toSeq)
      case _ => return None
    }
    val field = schema.fields.find(_.name == col).getOrElse(return None)
    field.dataType match {
      case ByteType | ShortType | IntegerType | LongType | BooleanType |
           DateType | TimestampType | TimestampNTZType =>
        val conv = raw.map(toSemanticLong)
        if (conv.exists(_.isEmpty)) None
        else Some(Leg(col, KindLong,
          conv.map(_.get).distinct.sorted.toArray, Array.empty, Array.empty))
      case DoubleType | FloatType =>
        val conv = raw.map(toSemanticDouble)
        // refuse NaN: Spark's NaN = NaN is TRUE while the storage
        // comparison is IEEE — diverging semantics, use the CoW leg
        if (conv.exists(c => c.isEmpty || c.get.isNaN)) None
        else Some(Leg(col, KindDouble, Array.empty,
          conv.map(c => if (c.get == 0.0) 0.0 else c.get) // -0.0 == 0.0
            .distinct.sorted.toArray, Array.empty))
      case StringType =>
        val conv = raw.map { case s: String => Some(s)
          case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
          case _ => None }
        if (conv.exists(_.isEmpty)) None
        else Some(Leg(col, KindString, Array.empty, Array.empty,
          conv.map(_.get).distinct.sorted.toArray))
      case _ => None // decimal/binary/nested: CoW or MOR leg
    }
  }

  private def toSemanticLong(v: Any): Option[Long] = v match {
    case n: java.lang.Byte => Some(n.longValue())
    case n: java.lang.Short => Some(n.longValue())
    case n: java.lang.Integer => Some(n.longValue())
    case n: java.lang.Long => Some(n.longValue())
    case b: java.lang.Boolean => Some(if (b) 1L else 0L)
    case d: java.sql.Date =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case t: java.sql.Timestamp =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
    case t: java.time.Instant =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(t))
    case t: java.time.LocalDateTime =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(t))
    case _ => None
  }

  private def toSemanticDouble(v: Any): Option[Double] = v match {
    case d: java.lang.Double => Some(d.doubleValue())
    case f: java.lang.Float => Some(f.doubleValue())
    case _ => None
  }
}
