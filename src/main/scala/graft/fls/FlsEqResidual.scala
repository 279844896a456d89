package graft.fls

import java.nio.charset.StandardCharsets

import graft.fls.Format._

/** Decode-time application of equality deletes ([[FlsEqDeletes]]):
  * like delete-vector positions, the residual has NO Catalyst
  * FilterExec re-checking it, so it must be exact and unconditional —
  * applied in every scan mode including the row-level group scans that
  * switch ordinary scan-side filters off. The evaluator compiles each
  * chunk's predicate list against THAT FILE's column types (types can
  * drift across files under union_by_name) and narrows the row-group
  * selection vector; a file that lacks the column entirely stores only
  * NULLs for it, which never equal a literal — no-op, skip.
  *
  * Exactness stance: any shape this cannot evaluate (physical-domain
  * drift between the predicate's literal domain and the file's stored
  * domain, a nested column) THROWS rather than serving resurrected
  * rows — the same degrade-loudly discipline as the DV decode path. */
object FlsEqResidual {

  /** One compiled conjunct of one predicate for one chunk: `colIdx`
    * into the chunk's fileColumns (-1 = column absent in this file —
    * all-NULL storage never equals a literal, so the WHOLE predicate
    * is a no-op for the file). */
  final case class LegExcl(colIdx: Int, leg: FlsEqDeletes.Leg,
      ct: ColumnType)

  /** One compiled exclusion (a conjunction of legs — the composite-key
    * shape commits as one predicate, applied as the AND of per-column
    * masks). */
  final case class Excl(legs: Array[LegExcl]) {
    /** False when any leg's column is absent in this file — the
      * conjunction can never hold, skip the predicate whole. */
    def applicable: Boolean = legs.forall(_.colIdx >= 0)
  }

  def compile(eq: Seq[String], cols: Array[ColumnDesc]): Array[Excl] =
    eq.map { json =>
      val p = FlsEqDeletes.parse(json)
      val legs = p.legs.map { l =>
        val idx = cols.indexWhere(_.name == l.col)
        val ct = if (idx < 0) null else cols(idx).colType
        if (idx >= 0) {
          // DECIMAL legs (scale >= 0) compare unscaled longs and
          // require the file's stored scale to equal the leg's — the
          // delete planner refuses mixed-scale tables up front, so a
          // mismatch here is post-commit drift: THROW, never guess
          val ok = FlsEqDeletes.domainOk(l, ct)
          if (!ok) throw new IllegalStateException(
            s"fls: equality delete on '${l.col}' cannot apply to a file " +
              s"storing it as ${ct.tag}" +
              (if (l.scale >= 0) s" (scale ${ct.scale} vs the predicate's " +
                s"${l.scale})" else "") +
              " — the column's physical domain drifted since the delete " +
              "committed; compact the table to absorb the predicate, " +
              "then retry")
        }
        LegExcl(idx, l, ct)
      }.toArray
      Excl(legs)
    }.toArray

  /** Zone-map skip for one ROW GROUP (r16): true when the group's
    * footer stats prove the predicate matches nothing here — the mask
    * (and the decode of its leg columns) is skipped wholesale, so a
    * retention predicate on a clustered table taxes only the row
    * groups it actually touches. Exactness: [[FlsEqDeletes.legMayMatch]]
    * returns false only on proof (NaN-poisoned segments carry no stats
    * and are kept; drifted domains are kept so the compile-time THROW
    * contract still fires). */
  def groupNoMatch(e: Excl, rg: RowGroupDesc): Boolean =
    e.legs.exists(l => l.colIdx >= 0 &&
      !FlsEqDeletes.legMayMatch(l.leg, l.ct, rg.segments(l.colIdx)))

  /** Per-row "is deleted" test for one predicate over one decoded row
    * group: the AND of its legs' masks (each leg's column decoded once
    * via the caller's memoized `decodeAt`). Call only when
    * [[Excl.applicable]]. */
  def deletedMask(e: Excl, decodeAt: Int => ColData): Int => Boolean = {
    val masks = e.legs.map(l => legMask(l, decodeAt(l.colIdx)))
    if (masks.length == 1) masks(0)
    else { i =>
      var k = 0
      var all = true
      while (all && k < masks.length) { all = masks(k)(i); k += 1 }
      all
    }
  }

  /** One leg's per-row match test: point-in-value for a match function
    * compiled from the leg's shape (IN: binary search over the sorted
    * literals; RANGE: two bound compares). Dictionary shapes precompute
    * one flag per code (O(dict) once, O(1)/row). */
  private def legMask(e: LegExcl, data: ColData): Int => Boolean = {
    val p = e.leg
    val (inLongs, inDoubles, inBytes) = matchFns(p)
    data match {
      case LongData(vs) if p.kind == FlsEqDeletes.KindLong =>
        i => inLongs(vs(i))
      case DictLongs(dict, codes) if p.kind == FlsEqDeletes.KindLong =>
        val flags = dict.map(inLongs)
        i => flags(codes(i).toInt)
      case DoubleData(vs) if p.kind == FlsEqDeletes.KindDouble =>
        i => inDoubles(vs(i))
      case DictDoubles(dict, codes) if p.kind == FlsEqDeletes.KindDouble =>
        val flags = dict.map(inDoubles)
        i => flags(codes(i).toInt)
      case BytesData(offsets, bytes) if p.kind == FlsEqDeletes.KindString =>
        i => inBytes(bytes, offsets(i), offsets(i + 1))
      case DictBytes(values, codes) if p.kind == FlsEqDeletes.KindString =>
        val flags = values.map(v => inBytes(v, 0, v.length))
        i => flags(codes(i).toInt)
      // wide-DECIMAL legs (r18): the stored bytes are the unscaled
      // BigInteger's two's-complement array at the leg's verified scale
      // — compare numerically, never lexicographically. Zero-length
      // spans (NULL slots) never match: NULL fails every comparison.
      case BytesData(offsets, bytes) if p.kind == FlsEqDeletes.KindBig =>
        val f = bigMatchFn(p)
        i => {
          val from = offsets(i); val until = offsets(i + 1)
          until > from && f(new java.math.BigInteger(
            java.util.Arrays.copyOfRange(bytes, from, until)))
        }
      case DictBytes(values, codes) if p.kind == FlsEqDeletes.KindBig =>
        val f = bigMatchFn(p)
        val flags = values.map(v =>
          v.length > 0 && f(new java.math.BigInteger(v)))
        i => flags(codes(i).toInt)
      case other => throw new IllegalStateException(
        s"fls: equality delete on '${p.col}' met an unevaluable decoded " +
          s"shape ${other.getClass.getSimpleName} (kind=${p.kind}) — " +
          "compact the table to absorb the predicate, then retry")
    }
  }

  /** Wide-DECIMAL match function: IN = hash-set membership over the
    * sorted unscaled BigIntegers; RANGE = two numeric compares against
    * closed bounds (construction normalizes them — mirrors the long
    * domain's invariant). */
  private def bigMatchFn(p: FlsEqDeletes.Leg)
      : java.math.BigInteger => Boolean = p match {
    case in: FlsEqDeletes.InLeg =>
      val set = in.bigs.toSet
      v => set.contains(v)
    case r: FlsEqDeletes.RangeLeg =>
      val lo = r.lo.map(b => new java.math.BigInteger(b.s)).orNull
      val hi = r.hi.map(b => new java.math.BigInteger(b.s)).orNull
      v => (lo == null || v.compareTo(lo) >= 0) &&
        (hi == null || v.compareTo(hi) <= 0)
  }

  /** The leg's semantic-domain match functions (only the leg's own
    * kind is ever invoked). */
  private def matchFns(p: FlsEqDeletes.Leg):
      (Long => Boolean, Double => Boolean,
       (Array[Byte], Int, Int) => Boolean) = p match {
    case in: FlsEqDeletes.InLeg =>
      val strBytes: Array[Array[Byte]] =
        if (in.kind == FlsEqDeletes.KindString)
          in.strings.map(_.getBytes(StandardCharsets.UTF_8))
        else null
      (v => java.util.Arrays.binarySearch(in.longs, v) >= 0,
       v => {
         val n = if (v == 0.0) 0.0 else v // -0.0 == 0.0 (SQL equality)
         !n.isNaN && java.util.Arrays.binarySearch(in.doubles, n) >= 0
       },
       (bytes, from, until) => {
         val len = until - from
         var i = 0
         var hit = false
         while (!hit && i < strBytes.length) {
           val t = strBytes(i)
           if (t.length == len) {
             var j = 0
             while (j < len && bytes(from + j) == t(j)) j += 1
             hit = j == len
           }
           i += 1
         }
         hit
       })
    case r: FlsEqDeletes.RangeLeg =>
      // long bounds are closed-normalized at construction
      val loL = r.lo.map(_.l).getOrElse(Long.MinValue)
      val hiL = r.hi.map(_.l).getOrElse(Long.MaxValue)
      val hasLoD = r.lo.nonEmpty
      val hasHiD = r.hi.nonEmpty
      val loD = r.lo.map(_.d).getOrElse(0.0)
      val hiD = r.hi.map(_.d).getOrElse(0.0)
      val loInc = r.lo.forall(_.inc)
      val hiInc = r.hi.forall(_.inc)
      val loB = r.lo.map(_.s).filter(_ != null)
        .map(_.getBytes(StandardCharsets.UTF_8)).orNull
      val hiB = r.hi.map(_.s).filter(_ != null)
        .map(_.getBytes(StandardCharsets.UTF_8)).orNull
      def cmpBytes(bytes: Array[Byte], from: Int, until: Int,
          t: Array[Byte]): Int = {
        var i = 0
        val n = math.min(until - from, t.length)
        while (i < n) {
          val c = (bytes(from + i) & 0xff) - (t(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        (until - from) - t.length
      }
      (v => v >= loL && v <= hiL,
       v =>
         // NaN sorts ABOVE every value in both Spark's nan-safe compare
         // and the oracle's total order: it clears any lower bound and
         // fails any upper bound
         if (java.lang.Double.isNaN(v)) !hasHiD
         else (!hasLoD || (if (loInc) v >= loD else v > loD)) &&
           (!hasHiD || (if (hiInc) v <= hiD else v < hiD)),
       (bytes, from, until) => {
         val cLo = if (loB == null) 1
           else cmpBytes(bytes, from, until, loB)
         val cHi = if (hiB == null) -1
           else cmpBytes(bytes, from, until, hiB)
         (if (loInc) cLo >= 0 else cLo > 0) &&
           (if (hiInc) cHi <= 0 else cHi < 0)
       })
  }
}
