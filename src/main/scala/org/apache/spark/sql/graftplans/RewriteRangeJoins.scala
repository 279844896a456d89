// Lives under org.apache.spark.sql for the same reason as the sibling
// rules: it builds Catalyst nodes (ScalarSubquery, Generate) whose
// constructors are sql-private. See GlobalRowNumber.scala.
package org.apache.spark.sql.graftplans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Max
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: inner joins whose condition is ONLY a range — `l.p
  * >= r.lo AND l.p <= r.hi`, the point-in-interval / band-join shape —
  * have no equi-key, so stock Spark plans BroadcastNestedLoopJoin and,
  * past the broadcast threshold, CartesianProduct: O(|L|·|R|)
  * comparisons however selective the band is. The reference's host
  * engine ships IEJoin for exactly this shape; a user switching to this
  * library would otherwise hit the nested-loop cliff. This rule
  * manufactures the equi-key (the [[graft.functions.RangeJoin]]
  * bucketing, lifted to engine behavior): quantize the point axis into
  * fixed-width buckets, replicate each interval to the buckets it
  * overlaps (`explode(sequence(...))`), equi-join on the bucket id, and
  * keep the ORIGINAL predicate as the residual filter — each
  * qualifying pair meets in exactly one bucket (the point's), so the
  * rewrite is output-exact, null-exact (null points/bounds bucket to
  * null and explode to nothing — they could never satisfy the
  * comparison anyway), and needs no dedup.
  *
  * The bucket width is the load-bearing choice, and there are no
  * per-column stats to read at this depth, so it is measured FROM the
  * data at execution time: an uncorrelated scalar subquery computes
  * `max(hi - lo) + 1` over the interval side, which guarantees every
  * interval overlaps AT MOST TWO buckets — replication factor ≤ 2 —
  * at the cost of one cheap pre-pass (aggregate-only, column-pruned to
  * the two bound columns). An outlier-long interval widens every
  * bucket (more residual filtering, never wrong results); workloads
  * that know better can pin `spark.graft.rangeJoin.bucketWidth`.
  * `spark.graft.rangeJoin.enabled=false` turns the rule off.
  *
  * Firing conditions (each spec-locked in RangeJoinRuleSpec):
  *  - inner join, batch children, with a condition;
  *  - NO cross-side equality conjunct (with one, Spark already plans a
  *    hash/sort-merge join and the range is a fine residual);
  *  - a conjunct pair bounding ONE side's integral expression below by
  *    one bound of the other side and above by another (>=/>/<=/<, any
  *    operand order, BETWEEN included since it parses to exactly this);
  *  - all three expressions deterministic and integral (byte/short/
  *    int/long — value bucketing needs exact integer arithmetic).
  *
  * At 100 TB: the rewritten plan is an ordinary shuffle equi-join —
  * AQE broadcast demotion, skew-split, and partition coalescing all
  * apply; the subquery is one scan of the (usually far smaller)
  * interval side. The nested loop it replaces is quadratic in rows
  * per... everything.
  *
  * STREAMING: stock Spark cannot run a stream-stream join WITHOUT an
  * equality predicate at all (StreamingJoinStrategy refuses — there is
  * no key for the symmetric hash state). The manufactured bucket id IS
  * such a key, so with `spark.graft.rangeJoin.bucketWidth` pinned
  * (measuring subqueries cannot scan a stream, and the state key must
  * be stable across micro-batches and restarts) the rule makes
  * stream-stream interval joins EXECUTABLE: bucket equality feeds the
  * symmetric-hash join, the residual time-range condition + watermarks
  * drive state eviction exactly as in a keyed interval join. */
object RewriteRangeJoins extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledConf = "spark.graft.rangeJoin.enabled"
  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledConf, "true").toBoolean) plan
    else plan.transformUp {
      case j @ Join(_, _, jt, Some(_), _) if supportedType(jt) =>
        tryRewrite(j).getOrElse(j)
    }

  /** Join types the bucketing can preserve exactly. Non-inner types
    * additionally require the PRESERVED side to be the point side
    * (checked in tryRewrite): the interval side is replicated per
    * bucket, so a preserved-but-unmatched interval row would come out
    * once per bucket. FullOuter preserves both sides — never safe. */
  private def supportedType(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti => true
    case _ => false
  }

  private def sideOk(jt: JoinType, pointLeft: Boolean): Boolean = jt match {
    case Inner => true
    case LeftOuter | LeftSemi | LeftAnti => pointLeft
    case RightOuter => !pointLeft
    case _ => false
  }

  /** One side's integral point bounded by the other side's expression.
    * `pointLeft` records which join side the point lives on. */
  private case class Bound(point: Expression, bound: Expression,
      lower: Boolean, pointLeft: Boolean)

  /** Axis types the bucketing handles exactly: integrals bucket on
    * their value; timestamps (both LTZ and NTZ — internally long
    * micros) on their micros. All that bucketing needs is an EXACT
    * monotone map to LONG shared by point and bounds — the residual
    * filter keeps the original comparison semantics. */
  private def bucketable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  private def tryRewrite(j: Join): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conjuncts = splitConjunctivePredicates(cond)
    val lOut = j.left.outputSet
    val rOut = j.right.outputSet

    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty || !e.deterministic) None
      else if (e.references.subsetOf(lOut)) Some(true)
      else if (e.references.subsetOf(rOut)) Some(false)
      else None

    def crossEqui(a: Expression, b: Expression): Boolean =
      (sideOf(a), sideOf(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
    // an equality between the sides means Spark already has its
    // equi-key — never second-guess a hash-joinable plan
    if (conjuncts.exists {
      case EqualTo(a, b) => crossEqui(a, b)
      case EqualNullSafe(a, b) => crossEqui(a, b)
      case _ => false
    }) return None

    // each inequality reads two ways: a >= b bounds point a below by
    // b, AND bounds point b above by a
    def bounds(c: Expression): Seq[Bound] = {
      def mk(p: Expression, b: Expression, lower: Boolean): Seq[Bound] =
        (sideOf(p), sideOf(b)) match {
          case (Some(pl), Some(bl)) if pl != bl &&
              bucketable(p.dataType) && bucketable(b.dataType) &&
              p.dataType.isInstanceOf[DatetimeType] ==
                b.dataType.isInstanceOf[DatetimeType] =>
            Seq(Bound(p, b, lower, pl))
          case _ => Nil
        }
      c match {
        case GreaterThanOrEqual(a, b) => mk(a, b, lower = true) ++ mk(b, a, lower = false)
        case GreaterThan(a, b) => mk(a, b, lower = true) ++ mk(b, a, lower = false)
        case LessThanOrEqual(a, b) => mk(a, b, lower = false) ++ mk(b, a, lower = true)
        case LessThan(a, b) => mk(a, b, lower = false) ++ mk(b, a, lower = true)
        case _ => Nil
      }
    }
    val all = conjuncts.flatMap(bounds)
    // the side filter sits inside the search: a symmetric band (|a−b|
    // ≤ tol) reads with the point on either side, and an outer join
    // may only accept the orientation whose point side is preserved
    val pair = (for {
      lo <- all.iterator if lo.lower && sideOk(j.joinType, lo.pointLeft)
      hi <- all.iterator if !hi.lower && hi.pointLeft == lo.pointLeft &&
        hi.point.canonicalized == lo.point.canonicalized
    } yield (lo, hi)).nextOption()

    pair match {
      case Some((loB, hiB)) => buildPointRewrite(j, loB, hiB, cond)
      // no point expression is bounded on both sides — try the
      // two-interval OVERLAP shape (both sides replicated; inner-only,
      // since a preserved side that explodes would duplicate
      // preserved-but-unmatched rows)
      case None if j.joinType == Inner => buildOverlapRewrite(j, all, cond)
      case None => None
    }
  }

  private[graftplans] def asLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    case TimestampType => UnixMicros(e)
    // NTZ stores naive micros in the same long layout; reinterpret
    // through UTC specifically — a DST zone would make the
    // naive→instant map non-monotone around transitions and could
    // mis-bucket pairs into false negatives; UTC is the exact
    // identity on the stored micros
    case TimestampNTZType => UnixMicros(Cast(e, TimestampType, Some("UTC")))
    // dates are days-since-epoch ints; datediff from day 0 is the
    // exact identity on the stored value (a direct date→long cast
    // is not a thing in ANSI)
    case DateType => Cast(DateDiff(e, Literal(0, DateType)), LongType)
    case _ => Cast(e, LongType)
  }

  private def floorDiv(x: Expression, w: Expression): Expression =
    IntegralDivide(Subtract(x, Pmod(x, w)), w, EvalMode.LEGACY)

  /** Pinned conf width, else `max(spanExpr)+1` measured over `plans`
    * by one uncorrelated scalar subquery each — replication ≤ 2 per
    * side. Greatest guards empty/all-degenerate sides (max over 0 rows
    * is null; all-invalid spans go negative) from collapsing the width
    * to nonsense. STREAMING joins require the PINNED width: a scalar
    * subquery cannot measure a stream, and the bucket id keys the
    * symmetric-hash join state — it must be identical across
    * micro-batches and restarts (keep the conf stable for the life of
    * a checkpoint). */
  private def measuredWidth(streaming: Boolean,
      spans: Seq[(Expression, LogicalPlan)]): Option[Expression] =
    conf.getConfString(WidthConf, "") match {
      case w if w.nonEmpty && w.toLong > 0 => Some(Literal(w.toLong))
      case _ if streaming => None
      case _ =>
        Some(Greatest(Literal(1L) +: spans.map { case (span, plan) =>
          val len = Alias(new Max(Add(span, Literal(1L)))
            .toAggregateExpression(), "__graft_rj_maxlen")()
          ScalarSubquery(Aggregate(Nil, Seq(len), plan)): Expression
        }))
    }

  private def buildPointRewrite(j: Join, loB: Bound, hiB: Bound,
      cond: Expression): Option[LogicalPlan] = {
    val pointLeft = loB.pointLeft
    val (pointPlan, boundPlan) = if (pointLeft) (j.left, j.right) else (j.right, j.left)
    val loL = asLong(loB.bound)
    val hiL = asLong(hiB.bound)
    val pL = asLong(loB.point)

    // bucket width: measured as max(hi-lo)+1 over the interval side
    measuredWidth(j.left.isStreaming || j.right.isStreaming,
      Seq((Subtract(hiL, loL), boundPlan))).map { width =>
      val pointBkt = Alias(floorDiv(pL, width), "__graft_rj_pb")()
      val pointProj = Project(pointPlan.output :+ pointBkt, pointPlan)
      val pbAttr = pointProj.output.last

      // interval side: one row per overlapped bucket. Invalid
      // intervals (lo > hi) must explode to NOTHING — Sequence would
      // otherwise count DOWN from lo's bucket and manufacture an
      // unbounded bucket list.
      val bbAttr = AttributeReference("__graft_rj_bb", LongType, nullable = false)()
      val seq = If(LessThanOrEqual(loL, hiL),
        // Sequence is TimeZoneAwareExpression — unresolved without a
        // zone even on longs; pin the session zone
        new Sequence(floorDiv(loL, width), floorDiv(hiL, width))
          .withTimeZone(conf.sessionLocalTimeZone),
        Literal.create(null, ArrayType(LongType, containsNull = false)))
      val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(bbAttr),
        child = boundPlan)

      val (newLeft, newRight, lb, rb) =
        if (pointLeft) (pointProj, gen, pbAttr, bbAttr)
        else (gen, pointProj, bbAttr, pbAttr)
      val bucketed = Join(newLeft, newRight, j.joinType,
        Some(And(EqualTo(lb, rb), cond)), j.hint)
      Project(j.output, bucketed)
    }
  }

  /** Two-interval OVERLAP: a pair of conjuncts `l.s <= r.e` and
    * `r.s <= l.e` — each side contributes an interval, no point is
    * bounded twice, so [[buildPointRewrite]] cannot fire and stock
    * Spark nested-loops. Both sides are replicated over the buckets
    * their NORMALIZED span `[least(s,e), greatest(s,e)]` covers, and
    * the residual keeps each qualifying pair only in the bucket of
    * `greatest(l.s, r.s)` — the intersection start. Exactness
    * (including degenerate `s > e` rows, which can still satisfy the
    * raw predicates): if `greatest = r.s >= l.s` then the predicate
    * forces `r.s <= l.e`, so `r.s` lies inside `[l.s, l.e]` ⊆ the
    * left normalized span, and it is trivially inside the right span;
    * symmetrically for `greatest = l.s`. Both Bounds come from
    * DIFFERENT conjuncts by construction (one conjunct yields one
    * upper-bound reading per side, never two). Inner-only: callers
    * guarantee it (a replicated preserved side would duplicate
    * preserved-but-unmatched rows). */
  private def buildOverlapRewrite(j: Join, all: Seq[Bound],
      cond: Expression): Option[LogicalPlan] = {
    for {
      u1 <- all.find(b => !b.lower && b.pointLeft) // l.s <= r.e
      u2 <- all.find(b => !b.lower && !b.pointLeft) // r.s <= l.e
      lsL = asLong(u1.point); reL = asLong(u1.bound)
      rsL = asLong(u2.point); leL = asLong(u2.bound)
      width <- measuredWidth(j.left.isStreaming || j.right.isStreaming,
        Seq((Abs(Subtract(leL, lsL)), j.left),
          (Abs(Subtract(reL, rsL)), j.right)))
    } yield {
      def gen(plan: LogicalPlan, a: Expression, b: Expression,
          name: String): (Generate, AttributeReference) = {
        val attr = AttributeReference(name, LongType, nullable = false)()
        // null bounds cannot satisfy the predicates; Sequence with a
        // null endpoint is null and Explode(null) emits nothing, but
        // Least/Greatest SKIP nulls — guard explicitly so a half-null
        // row explodes away instead of surviving on one endpoint
        val seq = If(Or(IsNull(a), IsNull(b)),
          Literal.create(null, ArrayType(LongType, containsNull = false)),
          new Sequence(floorDiv(Least(Seq(a, b)), width),
            floorDiv(Greatest(Seq(a, b)), width))
            .withTimeZone(conf.sessionLocalTimeZone))
        (Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(attr), child = plan), attr)
      }
      val (lGen, lb) = gen(j.left, lsL, leL, "__graft_rj_lb")
      val (rGen, rb) = gen(j.right, rsL, reL, "__graft_rj_rb")

      val ownership = EqualTo(floorDiv(Greatest(Seq(lsL, rsL)), width), lb)
      val bucketed = Join(lGen, rGen, j.joinType,
        Some(And(EqualTo(lb, rb), And(cond, ownership))), j.hint)
      Project(j.output, bucketed)
    }
  }
}
