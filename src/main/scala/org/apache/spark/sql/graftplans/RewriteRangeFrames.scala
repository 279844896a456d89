// Same package placement rationale as the sibling rules.
package org.apache.spark.sql.graftplans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: partition-less RANGE VALUE-OFFSET frames —
  * `sum(v)/count/avg(v) OVER (ORDER BY k RANGE BETWEEN lo PRECEDING
  * AND hi FOLLOWING)` — were the last window family left to stock
  * Spark's single-partition sort ([[RewriteGlobalWindows]]'s
  * row-at-a-time operators cannot scan by value distance). This rule
  * lowers them into the [[graft.functions.RangeFrames]] composition at
  * the plan level, built ENTIRELY from shapes the sibling rule already
  * distributes, so plain SQL gets the scale plan transparently:
  *
  *  1. RANGE frames are peer-identical → the answer is a function of
  *     the DISTINCT key: aggregate per key (`cnt`, and per aggregated
  *     value `non-null count` + `sum`), then equi-join back.
  *  2. band aggregates are PREFIX DIFFERENCES `F(≤ k+hi) − F(< k+lo)`
  *     → running sums over the distinct-key table: partition-less ROWS
  *     windows the sibling rule re-plans as [[GlobalRunningSum]] in the
  *     same fixed-point batch.
  *  3. the two prefix probes per key resolve by the as-of union trick
  *     (probe rows interleaved at `k+hi` / `k+lo`, `last_value IGNORE
  *     NULLS` running — again partition-less, distributed as
  *     [[GlobalFirstValue]]).
  *
  * NULL order keys keep exact SQL semantics: SQL gives the null peer
  * group a frame of exactly its own peers, so the null key's band IS
  * its per-key aggregate row — routed around the prefix pipeline and
  * unioned back, with a null-safe equi-join restoring multiplicity.
  * Empty frames (shifted bounds / no keys in band) give count 0 and
  * sum NULL via the separate non-null-count channel, exactly as stock.
  *
  * Firing conditions (spec-locked): no PARTITION BY; a single
  * integral, timestamp, or DATE order key (LTZ/NTZ map to the
  * long-micros axis via UnixMicros; day-time INTERVAL offsets are
  * exact signed micros on that axis — LTZ keys with a whole-day
  * interval component additionally need a fixed-offset session zone,
  * since stock evaluates plusDays in the session zone and DST would
  * bend the offset; DATE keys are a days axis — integral offsets are
  * days, intervals accepted when whole-day) with the
  * DEFAULT null placement (ASC NULLS
  * FIRST or DESC NULLS LAST — a DESC frame is the mirrored ASC band
  * `(−u, −l)`, identical as a SET, and these aggregates are
  * order-insensitive); every window expression in the node an aggregate of
  * `sum` (LongType result over an integral child), `count(*)`,
  * `count(v)`, or `avg` (integral child) over RANGE frames whose
  * bounds are foldable value offsets, CURRENT ROW, or UNBOUNDED;
  * batch child. MULTIPLE different frames in one node are fine — each
  * frame gets its own probe pair over the ONE shared prefix scan — and
  * a running `RANGE UNBOUNDED..CURRENT` expression mixed in is just
  * the `(unbounded, 0]` band (a node that is PURELY running stays with
  * the sibling's cheaper peer-aware path — no join-back). Divergences,
  * documented: prefix sums can
  * overflow Long where stock's per-band sums would not (the sibling
  * rule's checked-arithmetic stance: abort loudly, never wrap
  * silently), and `avg` is the exact long sum ÷ count, equal to
  * stock's double accumulation while prefix sums stay within 2^53.
  *
  * `spark.graft.rangeFrames.enabled=false` turns the rule off. */
object RewriteRangeFrames extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.rangeFrames.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledConf, "true").toBoolean) plan
    else plan.transformUp {
      case w: Window if fires(w) => build(w)
    }

  private def integral(dt: DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType

  private val MicrosPerDay = 86400000000L

  /** A RANGE boundary as Some(signed offset IN KEY-AXIS UNITS) or None
    * for UNBOUNDED. Day-time INTERVAL offsets over timestamp keys are
    * exact signed micros — the same long axis `UnixMicros` maps the
    * key onto. Over DATE keys (a days axis) an interval is accepted
    * only when it is a WHOLE number of days (a sub-day bound compares
    * at timestamp precision — not a fixed day offset); integral
    * offsets over date keys are already days. Year-month intervals are
    * variable-length and never accepted. */
  private def bound(e: Expression, keyDt: DataType): Option[Option[Long]] = e match {
    case CurrentRow => Some(Some(0L))
    case UnboundedPreceding | UnboundedFollowing => Some(None)
    case _: SpecialFrameBoundary => None
    case _ if e.foldable =>
      val isInterval = e.dataType.isInstanceOf[DayTimeIntervalType]
      if (!integral(e.dataType) && !isInterval) None
      else e.eval() match {
        case n: java.lang.Number =>
          val v = n.longValue
          if (keyDt == DateType && isInterval) {
            if (v % MicrosPerDay == 0) Some(Some(v / MicrosPerDay)) else None
          } else Some(Some(v))
        case _ => None
      }
    case _ => None
  }

  private def frameOf(we: WindowExpression,
      keyDt: DataType): Option[(Option[Long], Option[Long])] =
    we.windowSpec.frameSpecification match {
      case SpecifiedWindowFrame(RangeFrame, lo, hi) =>
        for { l <- bound(lo, keyDt); h <- bound(hi, keyDt) } yield (l, h)
      case _ => None
    }

  /** The aggregate's value child, or None for count(*). */
  private def aggInput(ae: AggregateExpression): Option[Option[Expression]] = {
    if (ae.mode != Complete || ae.isDistinct || ae.filter.nonEmpty) return None
    ae.aggregateFunction match {
      case s: Sum if s.dataType == LongType && integral(s.child.dataType) &&
        s.evalContext.evalMode != EvalMode.TRY && s.child.deterministic =>
        Some(Some(s.child))
      case av: Average if integral(av.child.dataType) &&
        av.dataType == DoubleType && av.evalMode != EvalMode.TRY &&
        av.child.deterministic =>
        Some(Some(av.child))
      case c: Count if c.children.forall(e => e.foldable && !e.nullable) =>
        Some(None)
      case c: Count if c.children.length == 1 && c.children.head.deterministic =>
        Some(Some(c.children.head))
      case m: Min if m.child.deterministic => Some(Some(m.child))
      case m: Max if m.child.deterministic => Some(Some(m.child))
      case _ => None
    }
  }

  private def isMinMax(ae: AggregateExpression): Boolean =
    ae.aggregateFunction match {
      case _: Min | _: Max => true
      case _ => false
    }

  private def fires(w: Window): Boolean = {
    if (w.partitionSpec.nonEmpty || w.orderSpec.length != 1 ||
      w.child.isStreaming || w.windowExpressions.isEmpty) return false
    val so = w.orderSpec.head
    // Default null placements only (ASC NULLS FIRST / DESC NULLS
    // LAST): the null-group augmentation assumes the null peer group
    // sits at the UNBOUNDED-side end the frame mapping expects
    val dirOk = (so.direction == Ascending && so.nullOrdering == NullsFirst) ||
      (so.direction == Descending && so.nullOrdering == NullsLast)
    // integral keys take integral offsets; timestamp keys (LTZ + NTZ —
    // both long micros underneath) take day-time INTERVAL offsets;
    // DATE keys are a days axis (integral offsets = days, intervals
    // accepted when whole-day — see bound()). Year-month offsets are
    // variable-length and rejected by bound() everywhere.
    val keyOk = integral(so.child.dataType) ||
      so.child.dataType == TimestampType ||
      so.child.dataType == TimestampNTZType || so.child.dataType == DateType
    if (!dirOk || !so.child.deterministic || !keyOk)
      return false
    val frames = w.windowExpressions.map {
      case Alias(we: WindowExpression, _) =>
        we.windowFunction match {
          case ae: AggregateExpression if aggInput(ae).isDefined =>
            frameOf(we, so.child.dataType) match {
              // min/max are not prefix-invertible: they lower through
              // the aligned-block pipeline, which needs both bounds
              // FINITE (an unbounded side has no block width; pure
              // running min/max belongs to the sibling's peer-aware
              // path anyway) — such a node stays with stock
              case Some((l, h)) if isMinMax(ae) && (l.isEmpty || h.isEmpty) => None
              case f => f
            }
          case _ => None
        }
      case _ => None
    }
    // LTZ timestamp keys: stock evaluates `key + interval` with
    // plusDays IN THE SESSION ZONE, so a whole-day interval component
    // crossing a DST transition is not a fixed micros offset — fire
    // only when offsets stay sub-day or the zone has a fixed offset
    // (NTZ keys are naive: plusDays is always exactly 24h there)
    if (so.child.dataType == TimestampType) {
      val dayCrossing = frames.flatten
        .flatMap { case (l, h) => Seq(l, h).flatten }
        .exists(o => math.abs(o) >= 86400000000L)
      lazy val fixedZone = java.time.ZoneId.of(conf.sessionLocalTimeZone)
        .normalized().getRules.isFixedOffset
      if (dayCrossing && !fixedZone) return false
    }
    // every expression a value-frame aggregate, and at least one frame
    // the SIBLING rule cannot take: a pure UNBOUNDED..CURRENT (or
    // ..UNBOUNDED) node belongs to its cheaper peer-aware path — but
    // mixed in with a genuine value offset, this rule takes the whole
    // node (the running frame is just the (unbounded, 0] band)
    def genuine(f: (Option[Long], Option[Long])): Boolean = f match {
      case (None, Some(0L)) | (None, None) => false
      case _ => true
    }
    frames.forall(_.isDefined) && frames.flatten.exists(genuine)
  }

  private def build(w: Window): LogicalPlan = {
    val child = w.child
    val so = w.orderSpec.head
    val kExpr = so.child
    def longify(e: Expression): Expression =
      if (e.dataType == LongType) e else Cast(e, LongType)
    // the key maps to the long axis the offsets live on: identity for
    // integrals, UnixMicros for timestamps (NTZ through UTC — the
    // exact identity on the stored micros; see RewriteRangeJoins)
    val kL = RewriteRangeJoins.asLong(kExpr)

    // the distinct value children the aggregates need, deduplicated,
    // plus each expression's (lo, hi) frame and the distinct frames
    // DESC frames are the mirrored ASC band: under DESC, signed bounds
    // (l, u) select keys in [k−u, k+l], i.e. the ASC band (−u, −l) —
    // the SET is identical and these aggregates are order-insensitive,
    // so the whole ASC pipeline applies after crossing the bounds
    // (UNBOUNDED sides cross over too, which is exactly what the
    // null-placement check above lines up: DESC NULLS LAST puts the
    // null group at the UNBOUNDED FOLLOWING end, mapping to the ASC
    // leading-nulls augmentation)
    val desc = so.direction == Descending
    def orient(f: (Option[Long], Option[Long])): (Option[Long], Option[Long]) =
      if (desc) (f._2.map(-_), f._1.map(-_)) else f
    val weAggs = w.windowExpressions.map {
      case a @ Alias(we: WindowExpression, _) =>
        (a, we.windowFunction.asInstanceOf[AggregateExpression],
          orient(frameOf(we, so.child.dataType).get))
    }
    val frames: Seq[(Option[Long], Option[Long])] =
      weAggs.map(_._3).distinct
    def frameIdx(f: (Option[Long], Option[Long])): Int = frames.indexOf(f)
    def dedup(es: Seq[Expression]): Seq[Expression] =
      es.foldLeft(Seq.empty[Expression]) { (acc, e) =>
        if (acc.exists(_.canonicalized == e.canonicalized)) acc else acc :+ e
      }
    val inputs: Seq[Expression] =
      dedup(weAggs.flatMap { case (_, ae, _) => aggInput(ae).get })
    // sum channels exist ONLY for Sum/Average inputs (integral by the
    // firing checks) — a count-only input can be ANY type and must
    // never be summed (a string would cast-crash under ANSI)
    val sumInputs: Seq[Expression] = dedup(weAggs.collect {
      case (_, ae, _) => ae.aggregateFunction match {
        case s: Sum => Some(s.child)
        case av: Average => Some(av.child)
        case _ => None
      }
    }.flatten)
    def inputIdx(e: Expression): Int =
      inputs.indexWhere(_.canonicalized == e.canonicalized)
    def sumIdx(e: Expression): Int =
      sumInputs.indexWhere(_.canonicalized == e.canonicalized)
    // min/max channels: NOT prefix-invertible — they lower through the
    // per-frame aligned-block pipeline below, fed by per-key extrema
    val mmAggs = weAggs.filter { case (_, ae, _) => isMinMax(ae) }
    val mmInputs: Seq[Expression] = dedup(mmAggs.map { case (_, ae, _) =>
      aggInput(ae).get.get })
    def mmIdx(e: Expression): Int =
      mmInputs.indexWhere(_.canonicalized == e.canonicalized)

    // 1. per-distinct-key aggregates
    val keyAl = Alias(kL, "__grf_k")()
    val cntAl = Alias(Count(Literal(1)).toAggregateExpression(), "__grf_cnt")()
    val nnAls = inputs.zipWithIndex.map { case (e, i) =>
      Alias(Count(e).toAggregateExpression(), s"__grf_nn$i")()
    }
    val sAls = sumInputs.zipWithIndex.map { case (e, i) =>
      Alias(Sum(longify(e)).toAggregateExpression(), s"__grf_s$i")()
    }
    val mnAls = mmInputs.zipWithIndex.map { case (e, i) =>
      Alias(Min(e).toAggregateExpression(), s"__grf_mn$i")()
    }
    val mxAls = mmInputs.zipWithIndex.map { case (e, i) =>
      Alias(Max(e).toAggregateExpression(), s"__grf_mx$i")()
    }
    val perKey = Aggregate(Seq(kL),
      keyAl +: cntAl +: (nnAls ++ sAls ++ mnAls ++ mxAls), child)
    val kA = keyAl.toAttribute
    val cntA = cntAl.toAttribute
    val nnAs = nnAls.map(_.toAttribute)
    val sAs = sAls.map(_.toAttribute)
    val mnAs = mnAls.map(_.toAttribute)
    val mxAs = mxAls.map(_.toAttribute)
    val chans: Seq[Attribute] = cntA +: (nnAs ++ sAs)

    val keyNullable = kL.nullable
    val nonNull = if (keyNullable) Filter(IsNotNull(kA), perKey) else perKey

    // 2. running prefix sums over the distinct keys — partition-less
    // ROWS windows; the sibling rule re-plans them as GlobalRunningSum
    val prefOrder = Seq(SortOrder(kA, Ascending))
    val runFrame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val prefAls = chans.map { c =>
      Alias(WindowExpression(Sum(c).toAggregateExpression(),
        WindowSpecDefinition(Nil, prefOrder, runFrame)), s"__grf_c${c.name}")()
    }
    val prefWin = Window(prefAls, Nil, prefOrder, nonNull)
    val prefAs = prefAls.map(_.toAttribute)

    // 3. as-of union: base rows carry the prefixes at their key; per
    // FRAME fi, probe rows sit at k+hi (side 2fi+1: inclusive ≤) and
    // k+lo (side −(2fi+1): exclusive <). An UNBOUNDED side simply has
    // no probe to subtract (lower) or probes past every key (upper).
    val nullLong = Literal.create(null, LongType)
    def baseProj: LogicalPlan = Project(
      Alias(kA, "__grf_pos")() +: Alias(Literal(0), "__grf_side")() +:
        Alias(nullLong, "__grf_probe")() +:
        prefAs.zipWithIndex.map { case (p, i) => Alias(p, s"__grf_v$i")() },
      prefWin)
    def probeProj(side: Int, off: Option[Long]): LogicalPlan = {
      val pos = off match {
        case Some(o) if o == 0L => kA
        case Some(o) => Add(kA, Literal(o))
        case None => Literal(Long.MaxValue) // upper UNBOUNDED: after every key
      }
      Project(
        Alias(pos, "__grf_pos")() +: Alias(Literal(side), "__grf_side")() +:
          Alias(kA, "__grf_probe")() +:
          chans.indices.map(i => Alias(nullLong, s"__grf_v$i")()),
        nonNull)
    }
    val branches = baseProj +: frames.zipWithIndex.flatMap {
      case ((lo, hi), fi) =>
        probeProj(2 * fi + 1, hi) +:
          (if (lo.isDefined) Seq(probeProj(-(2 * fi + 1), lo)) else Nil)
    }
    val union = Union(branches)
    val posA = union.output(0)
    val sideA = union.output(1)
    val probeA = union.output(2)
    val valAs = union.output.drop(3)

    // 4. as-of scan — last_value IGNORE NULLS running, distributed as
    // GlobalFirstValue by the sibling rule
    val scanOrder = Seq(SortOrder(posA, Ascending), SortOrder(sideA, Ascending))
    val gotAls = valAs.zipWithIndex.map { case (v, i) =>
      Alias(WindowExpression(
        Last(v, ignoreNulls = true).toAggregateExpression(),
        WindowSpecDefinition(Nil, scanOrder, runFrame)), s"__grf_g$i")()
    }
    val scan = Window(gotAls, Nil, scanOrder, union)
    val gotAs = gotAls.map(_.toAttribute)
    val probes = Filter(Not(EqualTo(sideA, Literal(0))), scan)

    // 5. fold each key's probes into RAW band aggregates (the SQL
    // empty-frame NULL for sums is applied at the end, after the null-
    // group augmentation below). Channel layout: per frame fi, a block
    // of chans.length columns [cnt, nn_0.., s_0..]; gotAs is one shared
    // block (the prefixes don't depend on the frame).
    def sideVal(s: Int, a: Attribute): Expression =
      Max(CaseWhen(Seq((EqualTo(sideA, Literal(s)), a)), None))
        .toAggregateExpression()
    def diff(fi: Int, a: Attribute): Expression = {
      val up = Coalesce(Seq(sideVal(2 * fi + 1, a), Literal(0L)))
      if (frames(fi)._1.isDefined)
        Subtract(up, Coalesce(Seq(sideVal(-(2 * fi + 1), a), Literal(0L))))
      else up
    }
    val nIn = inputs.length
    val nS = sumInputs.length
    val nChan = chans.length
    def chanNames: Seq[String] = frames.indices.flatMap { fi =>
      s"__grf_f${fi}_bcnt" +: ((0 until nIn).map(i => s"__grf_f${fi}_bnn$i") ++
        (0 until nS).map(i => s"__grf_f${fi}_bs$i"))
    }
    val bandAls = Alias(probeA, "__grf_bk")() +:
      chanNames.zipWithIndex.map { case (n, i) =>
        Alias(diff(i / nChan, gotAs(i % nChan)), n)()
      }
    val bands0 = Aggregate(Seq(probeA), bandAls, probes)

    // NULL order keys under Ascending NULLS FIRST (the only ordering
    // that fires): a null row's frame is its own peer group, EXCEPT
    // that UNBOUNDED FOLLOWING extends it over every non-null row; and
    // an UNBOUNDED PRECEDING frame of a NON-null row reaches back over
    // the leading null group. Both augmentations are one-row global
    // aggregates attached by a LeftOuter-true join (never duplicating,
    // never dropping), applied only to the frames whose bound is
    // actually UNBOUNDED.
    def addIf(cond: Int => Boolean, base: Seq[Attribute],
        extra: Seq[Attribute]): Seq[NamedExpression] =
      chanNames.zipWithIndex.map { case (n, i) =>
        if (cond(i / nChan))
          Alias(Add(Coalesce(Seq(base(i), Literal(0L))),
            Coalesce(Seq(extra(i % nChan), Literal(0L)))), n)()
        else Alias(base(i), n)()
      }
    val bandsAll: LogicalPlan = if (!keyNullable) bands0 else {
      val nullRows = Filter(IsNull(kA), perKey)
      // non-null bands: + the null peer group for UNBOUNDED-lower frames
      val bands1 = if (frames.forall(_._1.isDefined)) bands0 else {
        val ng = Project(chans.zipWithIndex.map { case (c, i) =>
          Alias(c, s"__grf_ng$i")() }, nullRows)
        val j = Join(bands0, ng, LeftOuter, Some(Literal(true)), JoinHint.NONE)
        Project(Alias(bands0.output.head, "__grf_bk")() +:
          addIf(fi => frames(fi)._1.isEmpty, bands0.output.tail,
            j.output.takeRight(nChan)), j)
      }
      // the null row's band: its own group per frame, + every non-null
      // row for UNBOUNDED-upper frames
      val ownGroup: Seq[Attribute] = frames.indices.flatMap(_ => chans)
      val nullBand = if (frames.forall(_._2.isDefined)) {
        Project(Alias(kA, "__grf_bk")() +:
          chanNames.zipWithIndex.map { case (n, i) =>
            Alias(ownGroup(i), n)() }, nullRows)
      } else {
        val tot = Aggregate(Nil, chans.zipWithIndex.map { case (c, i) =>
          Alias(Sum(c).toAggregateExpression(), s"__grf_t$i")() }, nonNull)
        val j = Join(nullRows, tot, LeftOuter, Some(Literal(true)), JoinHint.NONE)
        Project(Alias(kA, "__grf_bk")() +:
          addIf(fi => frames(fi)._2.isEmpty, ownGroup,
            j.output.takeRight(nChan)), j)
      }
      Union(Seq(bands1, nullBand))
    }
    val bkA = bandsAll.output(0)
    def bCntA(fi: Int): Attribute = bandsAll.output(1 + fi * nChan)
    def bNnA(fi: Int, i: Int): Attribute = bandsAll.output(1 + fi * nChan + 1 + i)
    def bSA(fi: Int, i: Int): Attribute =
      bandsAll.output(1 + fi * nChan + 1 + nIn + i)

    // 6b. per-frame aligned-block extrema tables for min/max. Every
    // band of frame (lo, hi) — keys in [k+lo, k+hi] — has the same
    // VALUE width W = hi−lo+1, so blocks of width W aligned at
    // multiples of W make every band a suffix of block(k+lo) plus a
    // prefix of block(k+hi) (at most two blocks): per-block running
    // prefix/suffix extrema (PARTITION BY block — native hash-
    // distributed windows) answer both halves through per-block as-of
    // scans (DESC scan finds the suffix value of the smallest in-block
    // key ≥ k+lo — every such key is in-band; ASC scan the prefix
    // value of the largest key ≤ k+hi, emitted only when the blocks
    // differ). Min/least skip nulls, so an empty band is NULL — the
    // SQL empty-frame semantics.
    def fd(x: Expression, wid: Long): Expression = {
      val wl = Literal(wid)
      IntegralDivide(Subtract(x, Pmod(x, wl)), wl, EvalMode.LEGACY)
    }
    def extrema(fi: Int): LogicalPlan = {
      val lo = frames(fi)._1.get
      val hi = frames(fi)._2.get
      val wWidth = hi - lo + 1
      val blkAl = Alias(fd(kA, wWidth), "__grf_blk")()
      val blkProj = Project(Seq(kA) ++ mnAs ++ mxAs :+ blkAl, nonNull)
      val blkA = blkProj.output.last
      val blkOrder = Seq(SortOrder(kA, Ascending))
      val sufFrame = SpecifiedWindowFrame(RowFrame, CurrentRow, UnboundedFollowing)
      def wexpr(f: SpecifiedWindowFrame, agg: AggregateExpression, n: String) =
        Alias(WindowExpression(agg,
          WindowSpecDefinition(Seq(blkA), blkOrder, f)), n)()
      val psAls = mmInputs.indices.flatMap { i =>
        Seq(wexpr(runFrame, Min(mnAs(i)).toAggregateExpression(), s"__grf_pmn$i"),
          wexpr(runFrame, Max(mxAs(i)).toAggregateExpression(), s"__grf_pmx$i"),
          wexpr(sufFrame, Min(mnAs(i)).toAggregateExpression(), s"__grf_smn$i"),
          wexpr(sufFrame, Max(mxAs(i)).toAggregateExpression(), s"__grf_smx$i"))
      }
      val psWin = Window(psAls, Seq(blkA), blkOrder, blkProj)
      val psA = psAls.map(_.toAttribute)

      def branch(plan: LogicalPlan, b: Expression, pos: Expression, side: Int,
          probe: Expression, vals: Seq[Expression]): LogicalPlan =
        Project(Alias(b, "__grf_eb")() +: Alias(pos, "__grf_epos")() +:
          Alias(Literal(side), "__grf_eside")() +:
          Alias(probe, "__grf_eprobe")() +:
          vals.zipWithIndex.map { case (v, i) => Alias(v, s"__grf_ev$i")() },
          plan)
      val nullVals: Seq[Expression] = mmInputs.indices.flatMap(i =>
        Seq(Literal.create(null, mnAs(i).dataType),
          Literal.create(null, mxAs(i).dataType)))
      def scan(u: Union, descPos: Boolean): LogicalPlan = {
        val eb = u.output(0); val epos = u.output(1); val eside = u.output(2)
        val eprobe = u.output(3); val evs = u.output.drop(4)
        val ord = Seq(SortOrder(epos, if (descPos) Descending else Ascending),
          SortOrder(eside, Ascending))
        val gAls = evs.zipWithIndex.map { case (v, i) =>
          Alias(WindowExpression(
            Last(v, ignoreNulls = true).toAggregateExpression(),
            WindowSpecDefinition(Seq(eb), ord, runFrame)), s"__grf_eg$i")()
        }
        val sw = Window(gAls, Seq(eb), ord, u)
        Project(eprobe +: gAls.map(_.toAttribute),
          Filter(Not(EqualTo(eside, Literal(0))), sw))
      }
      val sufHalf = scan(Union(Seq(
        branch(psWin, blkA, kA, 0, nullLong,
          mmInputs.indices.flatMap(i => Seq(psA(4 * i + 2), psA(4 * i + 3)))),
        branch(nonNull, fd(Add(kA, Literal(lo)), wWidth),
          Add(kA, Literal(lo)), 1, kA, nullVals))), descPos = true)
      val twoBlocks = Not(EqualTo(fd(Add(kA, Literal(hi)), wWidth),
        fd(Add(kA, Literal(lo)), wWidth)))
      val prefHalf = scan(Union(Seq(
        branch(psWin, blkA, kA, 0, nullLong,
          mmInputs.indices.flatMap(i => Seq(psA(4 * i), psA(4 * i + 1)))),
        branch(Filter(twoBlocks, nonNull), fd(Add(kA, Literal(hi)), wWidth),
          Add(kA, Literal(hi)), 1, kA, nullVals))), descPos = false)
      val both = Union(Seq(sufHalf, prefHalf))
      val pA = both.output.head
      val gAs = both.output.tail
      val eAls = Alias(pA, "__grf_ek")() +: mmInputs.indices.flatMap { i =>
        Seq(Alias(Min(gAs(2 * i)).toAggregateExpression(),
          s"__grf_emn${fi}_$i")(),
          Alias(Max(gAs(2 * i + 1)).toAggregateExpression(),
            s"__grf_emx${fi}_$i")()): Seq[NamedExpression]
      }
      val agg = Aggregate(Seq(pA), eAls, both)
      // the null peer group's bounded frame is exactly its own peers
      if (!keyNullable) agg else {
        val nullRow = Project(Alias(kA, "__grf_ek")() +:
          mmInputs.indices.flatMap { i =>
            Seq(Alias(mnAs(i), s"__grf_emn${fi}_$i")(),
              Alias(mxAs(i), s"__grf_emx${fi}_$i")()): Seq[NamedExpression]
          }, Filter(IsNull(kA), perKey))
        Union(Seq(agg, nullRow))
      }
    }
    // frames that carry a min/max and are non-empty (W >= 1; an
    // always-empty frame restores a NULL literal, no table needed)
    val mmFrameIdx: Seq[Int] = mmAggs.map(t => frameIdx(t._3)).distinct
      .filter(fi => frames(fi)._2.get - frames(fi)._1.get >= 0)
    val mmTables: Map[Int, LogicalPlan] =
      mmFrameIdx.map(fi => fi -> extrema(fi)).toMap
    def eMnA(fi: Int, i: Int): Attribute = mmTables(fi).output(1 + 2 * i)
    def eMxA(fi: Int, i: Int): Attribute = mmTables(fi).output(1 + 2 * i + 1)

    // 7. join back on the key (null-safe iff nullable) and restore the
    // Window's exact output attributes
    val joinCond =
      if (keyNullable) EqualNullSafe(kL, bkA) else EqualTo(kL, bkA)
    val joined = Join(child, bandsAll, Inner, Some(joinCond), JoinHint.NONE)
    val withMm = mmFrameIdx.foldLeft(joined: LogicalPlan) { (acc, fi) =>
      val e = mmTables(fi)
      val c = if (keyNullable) EqualNullSafe(kL, e.output.head)
        else EqualTo(kL, e.output.head)
      Join(acc, e, Inner, Some(c), JoinHint.NONE)
    }
    val restored = weAggs.map { case (a, ae, f) =>
      val fi = frameIdx(f)
      val value: Expression = ae.aggregateFunction match {
        case _: Count => aggInput(ae).get match {
          case None => bCntA(fi)
          case Some(e) => bNnA(fi, inputIdx(e))
        }
        case s: Sum =>
          If(EqualTo(bNnA(fi, inputIdx(s.child)), Literal(0L)), nullLong,
            bSA(fi, sumIdx(s.child)))
        case av: Average =>
          val nn = bNnA(fi, inputIdx(av.child))
          If(EqualTo(nn, Literal(0L)),
            Literal.create(null, DoubleType),
            Divide(Cast(bSA(fi, sumIdx(av.child)), DoubleType),
              Cast(nn, DoubleType)))
        case m: Min =>
          if (mmTables.contains(fi)) eMnA(fi, mmIdx(m.child))
          else Literal.create(null, m.dataType)
        case m: Max =>
          if (mmTables.contains(fi)) eMxA(fi, mmIdx(m.child))
          else Literal.create(null, m.dataType)
      }
      Alias(value, a.name)(exprId = a.exprId, qualifier = a.qualifier,
        explicitMetadata = Some(a.metadata))
    }
    Project(child.output ++ restored, withMm)
  }
}
