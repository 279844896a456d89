// Same package placement rationale as the sibling rules.
package org.apache.spark.sql.graftplans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: `Aggregate` DIRECTLY over a fixed-offset interval
  * join — `GROUP BY <probe cols> : count/sum(<carrier cols>)` over
  * `JOIN ON c BETWEEN p - lo AND p + hi` — computed as a SWEEP LINE,
  * never materializing the qualifying pairs.
  *
  * [[RewriteRangeJoins]] makes such joins EXECUTABLE at scale (bucketed
  * equi-join instead of a nested loop), but when the join feeds
  * nothing except a count/sum aggregate the pairs themselves are
  * throwaway: under a k×-denser time axis the pair stream grows ~k²
  * while the final aggregate stays input-sized. The r19 128× sweep's
  * JFR pinned the q87-shape marathon entirely inside the hash
  * aggregate CONSUMING the pair stream. This rule removes the pairs
  * from the plan: band count/sum are prefix differences
  * `F(≤ p+hi) − F(< p−lo)` over the carrier keys
  * (the [[graft.functions.RangeFrames]] construction, lifted to engine
  * behavior like the sibling rules):
  *
  *  1. per-distinct-carrier-key aggregates (count, and per summed
  *     column non-null-count + sum);
  *  2. global running prefix sums over the keys — partition-less ROWS
  *     windows [[RewriteGlobalWindows]] re-plans as
  *     [[GlobalRunningSum]] in the same fixed-point batch;
  *  3. two probe rows per DISTINCT probe key resolved by the as-of
  *     union trick (`last_value IGNORE NULLS` running — distributed as
  *     [[GlobalFirstValue]]); up-probes sit AFTER the prefix row of an
  *     equal key (inclusive upper bound), down-probes BEFORE it
  *     (exclusive lower bound);
  *  4. a 1:1 equi-join of the probe rows back onto the probe side,
  *     rows with an empty band dropped (inner-join semantics: they
  *     produced no pairs), and the ORIGINAL aggregate re-expressed
  *     over the band columns — `count(*)` = Σ band-count, `count(v)` =
  *     Σ band-non-null, `sum(v)` = Σ band-sum (null-skipping, so a
  *     group whose bands are all-null sums to NULL exactly as the
  *     pair plan would).
  *
  * The output is bit-identical to the join+aggregate for every band
  * shape including empty and inverted bands, duplicate keys on either
  * side, and NULL keys (a NULL carrier key enters every prefix equally
  * and cancels from every difference; a NULL probe key fails the
  * join-back equality — both match the never-true NULL comparison in
  * the original join condition).
  *
  * Firing conditions (spec-locked in IntervalAggRuleSpec):
  *  - `Aggregate` whose child is an INNER join (or a pruning
  *    attribute-only Project over one), batch, non-empty grouping;
  *  - the join condition is EXACTLY two conjuncts forming a band
  *    `c ∈ [p + loOff, p + hiOff]` between one deterministic
  *    expression per side (>=/>/<=/<, any operand order; strict
  *    bounds fold into the offsets — the axis is integral). Axes:
  *    any integral pair, or the SAME timestamp type (LTZ or NTZ) on
  *    both sides with foldable DayTimeInterval offsets
  *    (`ts ± INTERVAL '5' MINUTE` — day-time intervals are fixed
  *    micros by definition, so the long-micros axis is exact and
  *    zone-independent; year-month intervals never match);
  *  - every grouping expression references only the probe (band
  *    anchor) side; every aggregate is a non-distinct, unfiltered
  *    `count(*)`, `count(col)` or `sum(col)` (LongType result over an
  *    integral child, non-TRY) whose column references only the
  *    carrier side.
  *
  * Sums ride the same checked-arithmetic running sums as
  * [[RewriteRangeFrames]] (a table-wide prefix can overflow Long where
  * per-band sums would not — abort loudly, never wrap). DECIMAL sums
  * are deliberately NOT taken: a table-wide decimal prefix can exceed
  * DecimalType(38) where every band stays inside, and non-ANSI Spark
  * NULLs decimal overflow silently — the explicit
  * [[graft.functions.RangeFrames.bandAggregateAgainst]] operator is
  * the opt-in for those.
  *
  * `spark.graft.intervalAggJoin.enabled=false` turns the rule off. */
object RewriteIntervalAggJoins extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledConf = "spark.graft.intervalAggJoin.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledConf, "true").toBoolean) plan
    else plan.transformUp {
      case a: Aggregate => tryRewrite(a).getOrElse(a)
    }

  private def integral(dt: DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType

  private def datetime(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  /** `e` as (key, long offset in axis units): bare keys, `key ± lit`
    * on an integral axis, and `key ± INTERVAL` (TimestampAddInterval
    * with a foldable DayTimeInterval — exact signed micros, the same
    * axis UnixMicros maps the key onto; day-time intervals are fixed
    * micros by definition, so no session-zone/DST hazard) on a
    * timestamp axis. Year-month intervals are variable-length and
    * never matched. */
  private def keyOff(e: Expression): Option[(Expression, Long)] = {
    def litOf(x: Expression): Option[Long] = x match {
      case l: Literal if integral(l.dataType) && l.value != null =>
        Some(l.value.asInstanceOf[Number].longValue)
      case _ => None
    }
    def microsOf(x: Expression): Option[Long] = x match {
      case l: Literal if l.dataType.isInstanceOf[DayTimeIntervalType] &&
          l.value != null =>
        Some(l.value.asInstanceOf[Long])
      case UnaryMinus(l: Literal, _)
          if l.dataType.isInstanceOf[DayTimeIntervalType] && l.value != null =>
        Some(-l.value.asInstanceOf[Long])
      case _ => None
    }
    e match {
      case _ if integral(e.dataType) =>
        e match {
          case Add(a, b, _) =>
            litOf(b).map(n => (a, n)).orElse(litOf(a).map(n => (b, n)))
          case Subtract(a, b, _) => litOf(b).map(n => (a, -n))
          case _ => Some((e, 0L))
        }
      case _ if datetime(e.dataType) =>
        e match {
          case ta: TimestampAddInterval =>
            microsOf(ta.interval).map(m => (ta.start, m))
          case _ => Some((e, 0L))
        }
      case _ => None
    }
  }

  private case class Band(pKey: Expression, cKey: Expression,
      loOff: Long, hiOff: Long)

  /** The two conjuncts as a `c ∈ [p + loOff, p + hiOff]` band, given
    * which join side carries the probe (grouping) columns. */
  private def bandOf(conjuncts: Seq[Expression], probeOut: AttributeSet,
      carrierOut: AttributeSet): Option[Band] = {
    if (conjuncts.length != 2) return None

    def sideKey(e: Expression): Option[(Expression, Long, Boolean)] =
      keyOff(e).flatMap { case (k, off) =>
        if (!k.deterministic || k.references.isEmpty) None
        else if (k.references.subsetOf(probeOut)) Some((k, off, true))
        else if (k.references.subsetOf(carrierOut)) Some((k, off, false))
        else None
      }

    // normalize to X <= Y (strictness folded into the offset — exact
    // on an integral axis); returns (loOff) or (hiOff) contribution
    def asBound(c: Expression): Option[(Expression, Expression, Long, Boolean)] = {
      val (x, y, strict) = c match {
        case LessThanOrEqual(a, b) => (a, b, false)
        case LessThan(a, b) => (a, b, true)
        case GreaterThanOrEqual(a, b) => (b, a, false)
        case GreaterThan(a, b) => (b, a, true)
        case _ => return None
      }
      for {
        (kx, ox, xProbe) <- sideKey(x)
        (ky, oy, yProbe) <- sideKey(y)
        if xProbe != yProbe
      } yield {
        if (!xProbe) {
          // c + ox <= p + oy  =>  c <= p + (oy - ox)  [upper]
          (ky, kx, oy - ox - (if (strict) 1L else 0L), false)
        } else {
          // p + ox <= c + oy  =>  c >= p + (ox - oy)  [lower]
          (kx, ky, ox - oy + (if (strict) 1L else 0L), true)
        }
      }
    }

    val bounds = conjuncts.flatMap(asBound(_))
    if (bounds.length != 2) return None
    val lower = bounds.find(_._4)
    val upper = bounds.find(!_._4)
    for {
      (pLo, cLo, loOff, _) <- lower
      (pHi, cHi, hiOff, _) <- upper
      if pLo.canonicalized == pHi.canonicalized
      if cLo.canonicalized == cHi.canonicalized
      // one shared axis: any integral pair (exact through Cast-to-long),
      // or the SAME datetime type on both sides (LTZ and NTZ are both
      // long micros underneath, but mixing them compares through
      // zone-dependent casts — the analyzer's cast then lands inside
      // the key expression and matches as an opaque key instead)
      if (integral(pLo.dataType) && integral(cLo.dataType)) ||
        (datetime(pLo.dataType) && pLo.dataType == cLo.dataType)
    } yield Band(pLo, cLo, loOff, hiOff)
  }

  /** The aggregate channel a rewritable AggregateExpression needs:
    * None = pair count; Some(col) = per-column count/sum. */
  private def channelOf(ae: AggregateExpression,
      carrierOut: AttributeSet): Option[Option[Expression]] = {
    if (ae.mode != Complete || ae.isDistinct || ae.filter.nonEmpty) return None
    def carrierCol(e: Expression): Boolean =
      e.deterministic && e.references.nonEmpty &&
        e.references.subsetOf(carrierOut)
    ae.aggregateFunction match {
      case c: Count if c.children.forall(e => e.foldable && !e.nullable) =>
        Some(None)
      case c: Count if c.children.length == 1 && carrierCol(c.children.head) =>
        Some(Some(c.children.head))
      case s: Sum if s.dataType == LongType && integral(s.child.dataType) &&
          s.evalContext.evalMode != EvalMode.TRY && carrierCol(s.child) =>
        Some(Some(s.child))
      case _ => None
    }
  }

  private val rowsRunning =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)

  private def runSum(over: Expression, order: Seq[SortOrder],
      name: String): Alias =
    Alias(WindowExpression(
      Sum(over).toAggregateExpression(),
      WindowSpecDefinition(Nil, order, rowsRunning)), name)()

  private def lastVal(over: Expression, order: Seq[SortOrder],
      name: String): Alias =
    Alias(WindowExpression(
      Last(over, ignoreNulls = true).toAggregateExpression(),
      WindowSpecDefinition(Nil, order, rowsRunning)), name)()

  private def tryRewrite(a: Aggregate): Option[LogicalPlan] = {
    // unwrap one attribute-only pruning Project over the join
    val join = a.child match {
      case j: Join => j
      case Project(pl, j: Join) if pl.forall(_.isInstanceOf[AttributeReference]) => j
      case _ => return None
    }
    if (join.joinType != Inner || join.condition.isEmpty ||
      join.left.isStreaming || join.right.isStreaming ||
      a.groupingExpressions.isEmpty) return None

    // probe side = the side the grouping references
    val gRefs = AttributeSet(a.groupingExpressions.flatMap(_.references))
    if (gRefs.isEmpty || a.groupingExpressions.exists(!_.deterministic))
      return None
    val (probePlan, carrierPlan) =
      if (gRefs.subsetOf(join.left.outputSet)) (join.left, join.right)
      else if (gRefs.subsetOf(join.right.outputSet)) (join.right, join.left)
      else return None

    val band = bandOf(splitConjunctivePredicates(join.condition.get),
      probePlan.outputSet, carrierPlan.outputSet).getOrElse(return None)

    // every aggregate rewritable; collect the distinct value channels
    val aggExprs = a.aggregateExpressions
    val aes = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
    val channels = aes.map(ae => channelOf(ae, carrierPlan.outputSet))
    // aes EMPTY is a first-class shape, not a bail-out: a grouping-only
    // Aggregate over the band join is `DISTINCT <probe groups with at
    // least one match>` — and it is exactly what ColumnPruning leaves
    // of this rule's OWN output when a parent needs no aggregate
    // columns (`df.count()` re-optimizes from the logical plan!).
    // Without this case the pruned shape fell back to the pair join,
    // re-materializing everything the rewrite exists to avoid.
    if (channels.exists(_.isEmpty)) return None
    // (outputs other than the aggregates need no extra validation:
    //  the analyzer already requires them to be functions of the
    //  grouping expressions, which gRefs pinned to the probe side)

    val valueChildren: Seq[Expression] = channels.flatten.flatten
      .foldLeft(Seq.empty[Expression]) { (acc, e) =>
        if (acc.exists(_.canonicalized == e.canonicalized)) acc else acc :+ e
      }
    def chIdx(e: Expression): Int =
      valueChildren.indexWhere(_.canonicalized == e.canonicalized)

    def longify(e: Expression): Expression =
      if (e.dataType == LongType) e else Cast(e, LongType)
    // keys ride the shared long axis (identity for longs, UnixMicros
    // for timestamps — see RewriteRangeJoins.asLong for the NTZ/UTC
    // reinterpretation rationale)
    val pL = RewriteRangeJoins.asLong(band.pKey)
    val cL = RewriteRangeJoins.asLong(band.cKey)

    // 1. per-carrier-key aggregates
    val kA = Alias(cL, "__ia_k")()
    val cntA = Alias(Count(Seq(Literal(1))).toAggregateExpression(), "__ia_cnt")()
    val chA: Seq[(Alias, Alias)] = valueChildren.zipWithIndex.map { case (v, i) =>
      (Alias(Count(Seq(v)).toAggregateExpression(), s"__ia_nn$i")(),
        Alias(Sum(longify(v)).toAggregateExpression(), s"__ia_s$i")())
    }
    val perKey = Aggregate(Seq(cL),
      kA +: cntA +: chA.flatMap(p => Seq(p._1, p._2)), carrierPlan)
    val kAttr = kA.toAttribute

    // 2. running prefixes over the distinct keys
    val kOrder = Seq(SortOrder(kAttr, Ascending))
    val ccA = runSum(cntA.toAttribute, kOrder, "__ia_cc")
    val prefA: Seq[(Alias, Alias)] = chA.zipWithIndex.map { case ((nn, s), i) =>
      (runSum(nn.toAttribute, kOrder, s"__ia_cn$i"),
        runSum(s.toAttribute, kOrder, s"__ia_cs$i"))
    }
    val prefix = Window(ccA +: prefA.flatMap(p => Seq(p._1, p._2)),
      Nil, kOrder, perKey)

    // 3. distinct probe keys
    val pA = Alias(pL, "__ia_p")()
    val perProbe = Aggregate(Seq(pL), Seq(pA), probePlan)
    val pAttr = pA.toAttribute

    // union rows: (pos, side, probe, cc, [cn_i, cs_i]*)
    def nullL = Literal(null, LongType)
    val base = Project(
      Seq(Alias(kAttr, "__ia_pos")(), Alias(Literal(0), "__ia_side")(),
        Alias(nullL, "__ia_probe")(), Alias(ccA.toAttribute, "__ia_vcc")()) ++
        prefA.zipWithIndex.flatMap { case ((cn, cs), i) =>
          Seq(Alias(cn.toAttribute, s"__ia_vcn$i")(),
            Alias(cs.toAttribute, s"__ia_vcs$i")())
        }, prefix)
    def probeRows(side: Int, off: Long) = Project(
      Seq(Alias(Add(pAttr, Literal(off)), "__ia_pos")(),
        Alias(Literal(side), "__ia_side")(),
        Alias(pAttr, "__ia_probe")(), Alias(nullL, "__ia_vcc")()) ++
        valueChildren.indices.flatMap(i =>
          Seq(Alias(nullL, s"__ia_vcn$i")(), Alias(nullL, s"__ia_vcs$i")())),
      perProbe)
    val u = Union(Seq(base, probeRows(1, band.hiOff),
      probeRows(-1, band.loOff)))
    val Seq(posU, sideU, probeU, ccU, restU @ _*) = u.output

    // as-of scan: each probe picks up the prefix at its position
    val scanOrder = Seq(SortOrder(posU, Ascending), SortOrder(sideU, Ascending))
    val gotCc = lastVal(ccU, scanOrder, "__ia_gcc")
    val gotCh: Seq[(Alias, Alias)] = valueChildren.indices.map { i =>
      (lastVal(restU(2 * i), scanOrder, s"__ia_gcn$i"),
        lastVal(restU(2 * i + 1), scanOrder, s"__ia_gcs$i"))
    }
    val scan = Window(gotCc +: gotCh.flatMap(p => Seq(p._1, p._2)),
      Nil, scanOrder, u)
    val probesOnly = Filter(Not(EqualTo(sideU, Literal(0))), scan)

    // 4. fold the two probes per key into band aggregates
    def sideMax(s: Int, got: Attribute): Expression =
      Coalesce(Seq(
        Max(CaseWhen(Seq((EqualTo(sideU, Literal(s)), got)), None))
          .toAggregateExpression(),
        Literal(0L)))
    val bkA = Alias(probeU, "__ia_bk")()
    val bCntA = Alias(
      Subtract(sideMax(1, gotCc.toAttribute), sideMax(-1, gotCc.toAttribute)),
      "__ia_bcnt")()
    val bChA: Seq[(Alias, Alias)] = gotCh.zipWithIndex.map { case ((cn, cs), i) =>
      val nnDiff = Subtract(sideMax(1, cn.toAttribute), sideMax(-1, cn.toAttribute))
      val sDiff = Subtract(sideMax(1, cs.toAttribute), sideMax(-1, cs.toAttribute))
      (Alias(nnDiff, s"__ia_bnn$i")(),
        Alias(If(EqualTo(nnDiff, Literal(0L)), nullL, sDiff), s"__ia_bs$i")())
    }
    val bands = Aggregate(Seq(probeU),
      bkA +: bCntA +: bChA.flatMap(p => Seq(p._1, p._2)), probesOnly)

    // 5. 1:1 band join back, empty bands dropped (inner semantics)
    val back = Join(probePlan, bands, Inner,
      Some(EqualTo(pL, bkA.toAttribute)), JoinHint.NONE)
    val nonEmpty = Filter(GreaterThan(bCntA.toAttribute, Literal(0L)), back)

    // 6. the original aggregate, re-expressed over the band columns
    val rewritten = aggExprs.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression =>
          channelOf(ae, carrierPlan.outputSet).get match {
            case None =>
              Coalesce(Seq(Sum(bCntA.toAttribute).toAggregateExpression(),
                Literal(0L)))
            case Some(v) => ae.aggregateFunction match {
              case _: Count =>
                Coalesce(Seq(
                  Sum(bChA(chIdx(v))._1.toAttribute).toAggregateExpression(),
                  Literal(0L)))
              case _: Sum =>
                Sum(bChA(chIdx(v))._2.toAttribute).toAggregateExpression()
              case _ => ae // unreachable: channelOf gated
            }
          }
      }.asInstanceOf[NamedExpression]
    }
    Some(Aggregate(a.groupingExpressions, rewritten, nonEmpty))
  }
}
