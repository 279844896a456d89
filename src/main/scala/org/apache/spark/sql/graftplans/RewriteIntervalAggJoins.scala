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
  * Long sums ride the sibling rules' running sums unguarded because
  * Long wrap is RING arithmetic: prefixes and the original per-group
  * sums wrap mod 2^64 identically, so prefix DIFFERENCES equal the
  * original sums bit for bit even past overflow.
  *
  * DECIMAL sums (r20, VERDICT r19 "What's missing" #2) cannot ride a
  * decimal prefix directly: (a) the distributed global-window operator
  * is long-only, so a decimal prefix would fall back to stock's
  * single-partition sort; (b) decimal overflow NULLs (not a ring), and
  * the ignore-nulls as-of scan would silently substitute an earlier
  * prefix — and a table-wide prefix overflows DecimalType(38) where
  * every band stays inside. Instead the decimal channel rides the
  * UNSCALED value split into THREE 20-BIT LIMBS, each a plain long
  * running sum: limb prefixes stay exact (no wrap) up to 2^43 distinct
  * carrier keys — far past the point the probe scan itself would be
  * the bottleneck — while the RECONSTRUCTED band value
  * `(d2·2^40 + d1·2^20 + d0)·10^-s`, assembled in exact decimal
  * arithmetic, has no table-total capacity limit at all (the table
  * total never materializes; only per-band values do, and those are
  * bounded by the original Sum's own result type). Representation
  * boundaries are guarded LOUDLY (`raise_error`, never a wrong
  * number): values of a wider-than-18-digit column must fit 18 digits
  * (checked per row), and each per-key sum must fit 2^60 unscaled
  * (checked per key; at scale 6 that is ~1.15e12 of value per single
  * carrier-key instant). Overflow of the ORIGINAL Sum's result type
  * still yields NULL exactly as the pair plan would (the final
  * down-cast NULLs on the same threshold).
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
      case s: Sum if s.child.dataType.isInstanceOf[DecimalType] &&
          s.dataType.isInstanceOf[DecimalType] &&
          s.evalContext.evalMode != EvalMode.TRY && carrierCol(s.child) =>
        Some(Some(s.child))
      case _ => None
    }
  }

  // ---- decimal channel: unscaled limbs over the long prefix machinery

  private val LimbBits = 20
  private val LimbMask = (1L << LimbBits) - 1
  /** Per-key unscaled sums must fit 2^60 so the limb split stays in
    * three limbs of ≤ 2^20 magnitude each (l2 keeps the sign). */
  private val PerKeyCap = BigDecimal(2).pow(60)

  private def raiseAs(dt: DataType, msg: String): Expression =
    Cast(RaiseError(Literal(msg)), dt)

  /** Sum result type of the ORIGINAL decimal aggregate. */
  private def decSumType(vt: DecimalType): DecimalType =
    DecimalType(math.min(38, vt.precision + 10), vt.scale)

  /** The per-row work value: long-backed (p <= 18) as declared, wider
    * declarations narrowed with a LOUD per-row range check (a value
    * needing more than 18 digits cannot ride the unscaled-long limbs;
    * silently dropping precision is never an option). */
  private def narrowDec(v: Expression): Expression = v.dataType match {
    case DecimalType.Fixed(p, s) if p <= 18 => v
    case DecimalType.Fixed(p, s) =>
      val limit = Literal(
        Decimal(BigDecimal(10).pow(18 - s), p, s), DecimalType(p, s))
      CaseWhen(
        Seq((GreaterThanOrEqual(Abs(v), limit),
          raiseAs(DecimalType(18, s),
            "RewriteIntervalAggJoins: a summed decimal value needs more " +
              "than 18 digits of unscaled precision; the sweep-line " +
              "rewrite cannot carry it — disable " +
              s"$EnabledConf or narrow the column"))),
        Some(Cast(v, DecimalType(18, s))))
    case _ => v // unreachable: callers gate on DecimalType
  }

  /** Guarded long view of a per-key decimal(38,0) unscaled sum: NULL
    * with a positive non-null count is decimal-sum overflow (cannot
    * happen under the 2^60 cap, but never trust silence), and past
    * 2^60 the limb split would lose the top bits — both abort. */
  private def guardedPerKeyLong(su: Attribute, nn: Attribute,
      name: String): Alias = {
    val cap = Literal(Decimal(PerKeyCap, 38, 0), DecimalType(38, 0))
    Alias(CaseWhen(
      Seq(
        (And(IsNull(su), GreaterThan(nn, Literal(0L))),
          raiseAs(LongType,
            "RewriteIntervalAggJoins: a per-key unscaled sum overflowed " +
              "DECIMAL(38,0) — the band sums would be silently wrong")),
        (GreaterThanOrEqual(Abs(su), cap),
          raiseAs(LongType,
            "RewriteIntervalAggJoins: a per-key unscaled sum exceeds " +
              "2^60 and cannot ride the limb split — disable " +
              s"$EnabledConf for this query"))),
      Some(Cast(su, LongType))), name)()
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

    val decOf: Expression => Option[DecimalType] = v => v.dataType match {
      case dt: DecimalType => Some(dt)
      case _ => None
    }
    // sub-sum columns the long prefix machinery rides per channel:
    // 1 for integral channels, 3 unscaled limbs for decimal channels
    def nSubs(v: Expression): Int = if (decOf(v).isDefined) 3 else 1

    // 1. per-carrier-key aggregates
    val kA = Alias(cL, "__ia_k")()
    val cntA = Alias(Count(Seq(Literal(1))).toAggregateExpression(), "__ia_cnt")()
    val chA: Seq[(Alias, Alias)] = valueChildren.zipWithIndex.map { case (v, i) =>
      val sumExpr = decOf(v) match {
        case Some(_) => Sum(Cast(UnscaledValue(narrowDec(v)),
          DecimalType(38, 0))).toAggregateExpression()
        case None => Sum(longify(v)).toAggregateExpression()
      }
      (Alias(Count(Seq(v)).toAggregateExpression(), s"__ia_nn$i")(),
        Alias(sumExpr, s"__ia_s$i")())
    }
    val perKeyAgg = Aggregate(Seq(cL),
      kA +: cntA +: chA.flatMap(p => Seq(p._1, p._2)), carrierPlan)
    val kAttr = kA.toAttribute
    val anyDec = valueChildren.exists(decOf(_).isDefined)

    // 1b. decimal channels: guarded long view of the per-key unscaled
    // sum, then the three-limb split (two stacked Projects so the limb
    // expressions reference a named long; CollapseProject merges them)
    val (perKey, chSubs: Seq[Seq[Attribute]]) =
      if (!anyDec) {
        (perKeyAgg: LogicalPlan, chA.map(p => Seq(p._2.toAttribute)))
      } else {
        val slAls: Seq[Either[Attribute, Alias]] =
          valueChildren.zipWithIndex.map { case (v, i) =>
            if (decOf(v).isEmpty) scala.util.Left(chA(i)._2.toAttribute)
            else scala.util.Right(guardedPerKeyLong(chA(i)._2.toAttribute,
              chA(i)._1.toAttribute, s"__ia_sl$i"))
          }
        val p1 = Project(
          Seq(kAttr, cntA.toAttribute) ++ chA.zipWithIndex.flatMap {
            case ((nn, _), i) =>
              Seq(nn.toAttribute, slAls(i).fold(identity, identity))
          }, perKeyAgg)
        val limbAls: Seq[Either[Attribute, Seq[Alias]]] =
          valueChildren.zipWithIndex.map { case (v, i) =>
            slAls(i) match {
              case scala.util.Left(s) => scala.util.Left(s)
              case scala.util.Right(sl) =>
                val s = sl.toAttribute
                scala.util.Right(Seq(
                  Alias(BitwiseAnd(s, Literal(LimbMask)), s"__ia_l0_$i")(),
                  Alias(BitwiseAnd(ShiftRight(s, Literal(LimbBits)),
                    Literal(LimbMask)), s"__ia_l1_$i")(),
                  Alias(ShiftRight(s, Literal(2 * LimbBits)), s"__ia_l2_$i")()))
            }
          }
        val p2 = Project(
          Seq(kAttr, cntA.toAttribute) ++ chA.zipWithIndex.flatMap {
            case ((nn, _), i) =>
              nn.toAttribute +: limbAls(i).fold(Seq(_), _.map(a => a: NamedExpression))
          }, p1)
        (p2: LogicalPlan,
          limbAls.map(_.fold(Seq(_), _.map(_.toAttribute))))
      }

    // 2. running prefixes over the distinct keys
    val kOrder = Seq(SortOrder(kAttr, Ascending))
    val ccA = runSum(cntA.toAttribute, kOrder, "__ia_cc")
    val prefA: Seq[(Alias, Seq[Alias])] = chA.zipWithIndex.map { case ((nn, _), i) =>
      (runSum(nn.toAttribute, kOrder, s"__ia_cn$i"),
        chSubs(i).zipWithIndex.map { case (s, j) =>
          runSum(s, kOrder, s"__ia_cs${i}_$j")
        })
    }
    val prefix = Window(ccA +: prefA.flatMap(p => p._1 +: p._2),
      Nil, kOrder, perKey)

    // 3. distinct probe keys
    val pA = Alias(pL, "__ia_p")()
    val perProbe = Aggregate(Seq(pL), Seq(pA), probePlan)
    val pAttr = pA.toAttribute

    // union rows: (pos, side, probe, cc, [cn_i, cs_i_0.. cs_i_k]*)
    def nullL = Literal(null, LongType)
    val base = Project(
      Seq(Alias(kAttr, "__ia_pos")(), Alias(Literal(0), "__ia_side")(),
        Alias(nullL, "__ia_probe")(), Alias(ccA.toAttribute, "__ia_vcc")()) ++
        prefA.zipWithIndex.flatMap { case ((cn, css), i) =>
          Alias(cn.toAttribute, s"__ia_vcn$i")() +:
            css.zipWithIndex.map { case (cs, j) =>
              Alias(cs.toAttribute, s"__ia_vcs${i}_$j")()
            }
        }, prefix)
    def probeRows(side: Int, off: Long) = Project(
      Seq(Alias(Add(pAttr, Literal(off)), "__ia_pos")(),
        Alias(Literal(side), "__ia_side")(),
        Alias(pAttr, "__ia_probe")(), Alias(nullL, "__ia_vcc")()) ++
        valueChildren.indices.flatMap(i =>
          Alias(nullL, s"__ia_vcn$i")() +:
            (0 until nSubs(valueChildren(i))).map(j =>
              Alias(nullL, s"__ia_vcs${i}_$j")())),
      perProbe)
    val u = Union(Seq(base, probeRows(1, band.hiOff),
      probeRows(-1, band.loOff)))
    val Seq(posU, sideU, probeU, ccU, restU @ _*) = u.output
    // restU layout mirrors base: per channel, cn then its sub columns
    val subOffsets: Seq[Int] = valueChildren.indices
      .scanLeft(0)((acc, i) => acc + 1 + nSubs(valueChildren(i)))

    // as-of scan: each probe picks up the prefix at its position
    val scanOrder = Seq(SortOrder(posU, Ascending), SortOrder(sideU, Ascending))
    val gotCc = lastVal(ccU, scanOrder, "__ia_gcc")
    val gotCh: Seq[(Alias, Seq[Alias])] = valueChildren.indices.map { i =>
      val o = subOffsets(i)
      (lastVal(restU(o), scanOrder, s"__ia_gcn$i"),
        (0 until nSubs(valueChildren(i))).map(j =>
          lastVal(restU(o + 1 + j), scanOrder, s"__ia_gcs${i}_$j")))
    }
    val scan = Window(gotCc +: gotCh.flatMap(p => p._1 +: p._2),
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
    val bChA: Seq[(Alias, Alias)] = gotCh.zipWithIndex.map { case ((cn, css), i) =>
      val nnDiff = Subtract(sideMax(1, cn.toAttribute), sideMax(-1, cn.toAttribute))
      val sDiffs = css.map(cs =>
        Subtract(sideMax(1, cs.toAttribute), sideMax(-1, cs.toAttribute)))
      val bandVal = decOf(valueChildren(i)) match {
        case None =>
          If(EqualTo(nnDiff, Literal(0L)), nullL, sDiffs.head)
        case Some(vt) =>
          val st = decSumType(vt)
          If(EqualTo(nnDiff, Literal(0L)), Literal(null, st),
            reconstructDec(sDiffs, vt))
      }
      (Alias(nnDiff, s"__ia_bnn$i")(), Alias(bandVal, s"__ia_bs$i")())
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
                val inner =
                  Sum(bChA(chIdx(v))._2.toAttribute).toAggregateExpression()
                // decimal: Sum over band sums widens to (p+20); the
                // down-cast NULLs on exactly the threshold where the
                // original Sum's (p+10) result would have overflowed
                if (inner.dataType == ae.dataType) inner
                else Cast(inner, ae.dataType)
              case _ => ae // unreachable: channelOf gated
            }
          }
      }.asInstanceOf[NamedExpression]
    }
    Some(Aggregate(a.groupingExpressions, rewritten, nonEmpty))
  }

  /** Exact decimal reassembly of a band's unscaled limb differences:
    * `(d2·2^40 + d1·2^20 + d0) · 10^-scale`, every step in decimal
    * arithmetic whose operands stay far inside 38 digits (limb diffs
    * are |d| < 2^63, so the weighted sum is < 2^104 ≈ 2e31) — no
    * rounding anywhere; the final value is then presented at the
    * ORIGINAL Sum's result type. */
  private def reconstructDec(sDiffs: Seq[Expression],
      vt: DecimalType): Expression = {
    val d38 = sDiffs.map(Cast(_, DecimalType(38, 0)))
    val w20 = Literal(Decimal(BigDecimal(2).pow(LimbBits), 7, 0),
      DecimalType(7, 0))
    val w40 = Literal(Decimal(BigDecimal(2).pow(2 * LimbBits), 13, 0),
      DecimalType(13, 0))
    val unscaled = Add(Add(d38(0), Multiply(d38(1), w20)),
      Multiply(d38(2), w40))
    val scaled =
      if (vt.scale == 0) unscaled
      else Multiply(unscaled, Literal(
        Decimal(BigDecimal(1) / BigDecimal(10).pow(vt.scale),
          vt.scale + 1, vt.scale), DecimalType(vt.scale + 1, vt.scale)))
    Cast(scaled, decSumType(vt))
  }
}
