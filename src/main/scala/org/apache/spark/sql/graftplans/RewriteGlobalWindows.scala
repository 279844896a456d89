// Lives under org.apache.spark.sql to sit next to the logical nodes it
// produces (GlobalRowNumber / GlobalRunningSum) — see GlobalRowNumber.scala
// for why the package placement.
package org.apache.spark.sql.graftplans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, First, Last, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Optimizer rule: plain SQL `row_number() OVER (ORDER BY …)`, the
  * whole rank family (`rank`, `dense_rank`, `percent_rank`,
  * `cume_dist`, `ntile`), `count(*) OVER (ORDER BY … ROWS
  * UNBOUNDED PRECEDING)` (≡ the row number), running
  * `sum(x)`/`min(x)`/`max(x)`/`avg(x)` ROWS windows over integral
  * columns, and the edge values `first_value`/`last_value` (constant,
  * identity, or running IGNORE NULLS shapes — see [[GlobalFirstValue]])
  * — no PARTITION BY — plan as
  * a SINGLE-partition Window in stock Spark: every row
  * funnels through one task's sort (the 100 TB anti-shape; the 128×
  * sweep measured the distributed rank 14× faster). [[GlobalRowNumber]]
  * and [[GlobalRunningSum]] already compute both shapes over a range
  * shuffle, but only for callers of the `graft.functions` entry points.
  * This rule makes it engine behavior: any partition-less
  * row_number/running-long-sum Window node is rewritten into the
  * distributed plans, with a Project on top restoring the original
  * output attributes (same exprIds/names/types — row_number stays
  * IntegerType via a cast of the operator's long rank).
  *
  * RANGE vs ROWS: the UNBOUNDED PRECEDING..CURRENT ROW aggregates fire
  * under BOTH frame kinds — RANGE (the default of a bare ORDER BY, the
  * most common user spelling) runs the peer-aware operator path, which
  * gives every order-key tie-run the combine through the run's end
  * (exact under the range shuffle because equal keys land in one
  * partition). The rank family's RANGE frame is frame-independent and
  * rewrites via [[GlobalRank]].
  *
  * Deliberate non-firing cases (each spec-locked):
  *  - PARTITION BY present — already distributed by the partition keys.
  *  - RANGE frames with value offsets (`RANGE 5 PRECEDING`).
  *  - lag/lead WITH ignoreNulls (unbounded lookback), a non-foldable
  *    or non-positive offset, or an offset beyond the hand-off cap —
  *    in-cap lag/lead DO rewrite, via [[GlobalOffset]]'s boundary
  *    hand-off.
  *  - sums whose result type is not LONG, and min/max over
  *    non-integral columns (decimal/double need Spark's
  *    overflow/summation/comparison semantics, not primitive long
  *    arithmetic).
  *  - a rank-limiting Filter or a Limit directly above: Catalyst's
  *    InferWindowGroupLimit / LimitPushDownThroughWindow turn those
  *    into per-partition top-k, which beats a full range shuffle for
  *    small k — leave the Window for them.
  *  - streaming children (the two-pass runJob shape is batch-only).
  *
  * ANSI mode (Spark 4's default) is honored, not excluded: the rank
  * cast picks up the session's cast semantics, and the running-sum
  * operator is planned with `checked` long arithmetic so overflow
  * aborts instead of wrapping.
  *
  * SQL null semantics for the running sum (null until the first
  * non-null value) are preserved: the rewrite marks the output
  * attribute nullable, which [[GlobalRunningSumExec]] implements
  * exactly; the `graft.functions.DistributedPrefixSum` API keeps its
  * documented nulls-sum-as-0 contract via a non-nullable output. */
object RewriteGlobalWindows extends Rule[LogicalPlan] {

  /** Kill switch, parity with the sibling rules (stock single-partition
    * windows return; the library entry points are unaffected). */
  val EnabledConf = "spark.graft.globalWindows.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledConf, "true").toBoolean) plan
    else rewrite(plan)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    // Rank-limiting filter above: leave the Window for
    // InferWindowGroupLimit (per-partition top-k), recurse below it.
    case f @ Filter(cond, w: Window) if rewritable(w) && limitsRank(cond, w) =>
      f.copy(child = w.copy(child = rewrite(w.child)))
    // Limit above: leave for LimitPushDownThroughWindow.
    case ll @ LocalLimit(_, w: Window) if rewritable(w) =>
      ll.copy(child = w.copy(child = rewrite(w.child)))
    case w: Window if rewritable(w) =>
      buildRewrite(w.windowExpressions, w.orderSpec, rewrite(w.child))
    case other => other.mapChildren(rewrite)
  }

  private def rewritable(w: Window): Boolean =
    w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
      !w.child.isStreaming &&
      w.orderSpec.forall(_.deterministic) &&
      w.windowExpressions.nonEmpty &&
      w.windowExpressions.forall {
        case Alias(we: WindowExpression, _) => rewritableExpr(we)
        case _ => false
      }

  private def rewritableExpr(we: WindowExpression): Boolean = we.windowSpec match {
    case WindowSpecDefinition(Nil, _,
        SpecifiedWindowFrame(frame, UnboundedPreceding, CurrentRow)) =>
      we.windowFunction match {
        case _: RowNumber => frame == RowFrame
        // the rank family: frame-independent values (the analyzer
        // assigns them their fixed frame). Exact under the range
        // shuffle because RangePartitioning sends equal keys to one
        // partition — tie-runs never straddle; percent_rank/cume_dist/
        // ntile additionally need the global N, which the two-pass
        // operator knows after pass 1.
        case _: Rank | _: DenseRank | _: PercentRank | _: CumeDist => true
        case nt: NTile => nt.buckets.foldable
        // Catalyst's OptimizeWindowFunctions turns first_value under a
        // ROWS UNBOUNDED PRECEDING frame into nth_value(x, 1) before
        // this rule runs — treat offset-1 nth_value as first_value.
        // Offsets 2..cap fire too: the n-th (non-null) value of the
        // relation is one global scalar, revealed per row once the
        // frame holds n (non-null) rows — a running-count composition.
        case nv: NthValue => nthOffset(nv).isDefined && nv.input.deterministic
        case ae: AggregateExpression =>
          // Running aggregates fire under BOTH frame kinds of an
          // UNBOUNDED PRECEDING..CURRENT ROW window: ROWS runs the
          // row-at-a-time operators; RANGE (the default of a bare
          // ORDER BY — the most common user spelling) aggregates
          // order-key peers together, which the peer-aware operator
          // models exactly (equal keys land in one range partition, so
          // tie-runs never straddle; see GlobalRunningSumExec). The
          // edge values fire under RANGE too, via GlobalFirstValue's
          // peer-aware modes: last_value RESPECT NULLS runs in
          // run-last-row mode (the run's last row, tie-arbitrary
          // exactly like stock), and the IGNORE NULLS variants advance
          // their recurrence per tie-run.
          ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty &&
            (ae.aggregateFunction match {
              // edge values fire under both frames: ROWS runs the
              // row-recurrence; RANGE runs peer-aware (per tie-run)
              case f: First => f.child.deterministic
              case l: Last => l.child.deterministic
              case s: Sum =>
                s.dataType == LongType && integral(s.child.dataType) &&
                s.evalContext.evalMode != EvalMode.TRY // try_sum nulls on overflow; the long operator can't
              // running MIN/MAX share the running-sum structure with a
              // different combine; integral domains run exactly in the
              // operator's long arithmetic (result cast back)
              case m: Min => integral(m.child.dataType)
              case m: Max => integral(m.child.dataType)
              // count(*) / count(lit): under ROWS the running count IS
              // the row number; under RANGE it is a peer-aware sum of
              // ones (count(expr) with a nullable child skips nulls —
              // not the same thing)
              case c: Count => c.children.forall(e => e.foldable && !e.nullable)
              // running avg over integral columns: exact long running
              // sum ÷ running non-null count, both from the existing
              // two-pass operators (see buildRewrite for the exactness
              // and overflow argument)
              case av: Average =>
                integral(av.child.dataType) && av.dataType == DoubleType &&
                av.evalMode != EvalMode.TRY
              case _ => false
            })
        case _ => false
      }
    // full UNBOUNDED..UNBOUNDED frames (ROWS or RANGE — identical over
    // the whole partition): only the edge values reduce to one global
    // scalar; everything else stays with Catalyst
    case WindowSpecDefinition(Nil, _,
        SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing)) =>
      we.windowFunction match {
        case nv: NthValue => nthOffset(nv).isDefined && nv.input.deterministic
        case ae: AggregateExpression =>
          ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty &&
            (ae.aggregateFunction match {
              case f: First => f.child.deterministic
              case l: Last => l.child.deterministic
              case _ => false
            })
        case _ => false
      }
    // bounded sliding ROWS frames (a .. b, any pair of in-cap row
    // offsets): trailing (j PRECEDING..CURRENT ROW), centered
    // (j PRECEDING..j FOLLOWING — the moving average), leading
    // (CURRENT ROW..j FOLLOWING), even fully-shifted windows. The
    // preceding side needs |a| values before each partition start and
    // the following side b values after its end — both boundary
    // hand-offs. Aggregate checks mirror the running-frame ones.
    case WindowSpecDefinition(Nil, _, f @ SpecifiedWindowFrame(RowFrame, _, _))
        if rowBounds(f).isDefined =>
      we.windowFunction match {
        // lag/lead carry their own (±k, ±k) ROWS frame, so they land
        // in this bounded-frame case — same checks as the frameless
        // spelling below
        case l: Lag =>
          !l.ignoreNulls && okOffset(l.inputOffset) && l.default.foldable &&
            l.input.deterministic
        case l: Lead =>
          !l.ignoreNulls && okOffset(l.offset) && l.default.foldable &&
            l.input.deterministic
        case ae: AggregateExpression =>
          ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty &&
            (ae.aggregateFunction match {
              case s: Sum => s.dataType == LongType &&
                integral(s.child.dataType) && s.evalContext.evalMode != EvalMode.TRY
              case m: Min => integral(m.child.dataType)
              case m: Max => integral(m.child.dataType)
              // sliding count(*) ≡ least(row_number, j+1)
              case c: Count => c.children.forall(e => e.foldable && !e.nullable)
              // sliding avg: sliding exact sum ÷ sliding non-null count
              case av: Average => integral(av.child.dataType) &&
                av.dataType == DoubleType && av.evalMode != EvalMode.TRY
              case _ => false
            })
        case _ => false
      }
    // lag/lead carry their own (offset, offset) ROWS frame — match on
    // the function. The boundary hand-off operator needs a known,
    // bounded, positive offset and a foldable default; ignoreNulls
    // needs unbounded lookback and stays with Catalyst.
    case WindowSpecDefinition(Nil, _, _) =>
      we.windowFunction match {
        case l: Lag =>
          !l.ignoreNulls && okOffset(l.inputOffset) && l.default.foldable &&
            l.input.deterministic
        case l: Lead =>
          !l.ignoreNulls && okOffset(l.offset) && l.default.foldable &&
            l.input.deterministic
        case _ => false
      }
    case _ => false
  }

  /** Driver hand-off state is numPartitions × k values — cap k so it
    * stays trivially small; beyond the cap Catalyst's Window is the
    * honest plan. */
  private val MaxOffset = 1024

  private def okOffset(e: Expression): Boolean = e.foldable && {
    e.eval() match {
      case i: Integer => i >= 1 && i <= MaxOffset
      case _ => false
    }
  }

  /** nth_value's offset as an in-cap positive Int, if foldable. */
  private def nthOffset(nv: NthValue): Option[Int] =
    if (!nv.offset.foldable) None
    else nv.offset.eval() match {
      case i: Integer if i >= 1 && i <= MaxOffset => Some(i.intValue)
      case l: java.lang.Long if l >= 1L && l <= MaxOffset => Some(l.intValue)
      case _ => None
    }

  private def slideOf(we: WindowExpression): Option[(Int, Int)] =
    we.windowSpec.frameSpecification match {
      case f: SpecifiedWindowFrame => rowBounds(f)
      case _ => None
    }

  private def isFullFrame(we: WindowExpression): Boolean =
    we.windowSpec.frameSpecification match {
      case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
      case _ => false
    }

  /** RANGE UNBOUNDED PRECEDING .. CURRENT ROW — the default frame of a
    * bare ORDER BY aggregate window: peers of the current order key are
    * IN the frame, so the operators run peer-aware. */
  private def isRangeRunning(we: WindowExpression): Boolean =
    we.windowSpec.frameSpecification match {
      case SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow) => true
      case _ => false
    }

  /** The edge-value shapes, normalized to (input, fromEnd, skipNulls):
    * first_value/last_value as aggregates, plus the nth_value(x, 1)
    * that OptimizeWindowFunctions rewrites first_value into. */
  private def edgeOf(fn: Expression): Option[(Expression, Boolean, Boolean)] =
    fn match {
      case ae: AggregateExpression => ae.aggregateFunction match {
        case f: First => Some((f.child, false, f.ignoreNulls))
        case l: Last => Some((l.child, true, l.ignoreNulls))
        case _ => None
      }
      case nv: NthValue if nv.offset.foldable && nv.offset.eval() == 1 =>
        Some((nv.input, false, nv.ignoreNulls))
      case _ => None
    }

  /** A bounded ROWS frame boundary as a signed row offset: CURRENT ROW
    * is 0, `j PRECEDING` −j, `j FOLLOWING` +j (never a
    * SpecialFrameBoundary, which is Unevaluable). */
  private def rowBound(e: Expression): Option[Int] = e match {
    case CurrentRow => Some(0)
    case _: SpecialFrameBoundary => None
    case _ if e.foldable => e.eval() match {
      case i: Integer if i >= -MaxOffset && i <= MaxOffset => Some(i.intValue)
      case l: java.lang.Long if l >= -MaxOffset && l <= MaxOffset =>
        Some(l.intValue)
      case _ => None
    }
    case _ => None
  }

  /** Both bounds of a fully-bounded in-cap ROWS frame, as signed row
    * offsets (lo ≤ hi). */
  private def rowBounds(f: SpecifiedWindowFrame): Option[(Int, Int)] = f match {
    case SpecifiedWindowFrame(RowFrame, l, u) =>
      for { a <- rowBound(l); b <- rowBound(u) if a <= b } yield (a, b)
    case _ => None
  }

  private def integral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType

  /** Mirror of InferWindowGroupLimit's supported shapes: a conjunct
    * comparing a produced rank-like attribute against something
    * foldable. */
  private def limitsRank(cond: Expression, w: Window): Boolean = {
    val ranked = AttributeSet(w.windowExpressions.collect {
      case a @ Alias(WindowExpression(f, _), _)
          if f.isInstanceOf[RowNumber] || f.isInstanceOf[Rank] ||
            f.isInstanceOf[DenseRank] => a.toAttribute
    })
    ranked.nonEmpty && cond.exists {
      case LessThan(e: Attribute, l) => l.foldable && ranked.contains(e)
      case LessThanOrEqual(e: Attribute, l) => l.foldable && ranked.contains(e)
      case EqualTo(e: Attribute, l) => l.foldable && ranked.contains(e)
      case EqualTo(l, e: Attribute) => l.foldable && ranked.contains(e)
      case GreaterThan(l, e: Attribute) => l.foldable && ranked.contains(e)
      case GreaterThanOrEqual(l, e: Attribute) => l.foldable && ranked.contains(e)
      case _ => false
    }
  }

  /** Stack one distributed operator per window expression over the
    * child (they share the one range shuffle: each operator preserves
    * its child's partitioning and ordering), then restore the Window's
    * exact output with a Project. */
  private def buildRewrite(exprs: Seq[NamedExpression], order: Seq[SortOrder],
      child: LogicalPlan): LogicalPlan = {
    var cur: LogicalPlan = child
    val restored: Seq[NamedExpression] = exprs.map {
      case a @ Alias(we: WindowExpression, name) =>
        we.windowFunction match {
          case _: RowNumber =>
            val rank =
              AttributeReference(name + "__graft_rn", LongType, nullable = false)()
            cur = GlobalRowNumber(rank, order, cur)
            // row_number() is IntegerType; the operator numbers in long
            Alias(Cast(rank, IntegerType), name)(exprId = a.exprId,
              qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
          case rf @ (_: Rank | _: DenseRank | _: PercentRank | _: CumeDist |
              _: NTile) =>
            val (mode, dt) = rf match {
              case _: DenseRank => (RankMode.Dense, LongType)
              case _: PercentRank => (RankMode.Percent, DoubleType)
              case _: CumeDist => (RankMode.Cume, DoubleType)
              case nt: NTile =>
                (RankMode.Tile(nt.buckets.eval().asInstanceOf[Number].intValue),
                  LongType)
              case _ => (RankMode.MinRank, LongType)
            }
            val rank =
              AttributeReference(name + "__graft_rk", dt, nullable = false)()
            cur = GlobalRank(rank, order, mode, cur)
            // rank()/dense_rank()/ntile() are IntegerType like
            // row_number(); percent_rank/cume_dist are already DOUBLE
            val restoredExpr: Expression =
              if (dt == LongType) Cast(rank, IntegerType) else rank
            Alias(restoredExpr, name)(exprId = a.exprId,
              qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
          case off @ (_: Lag | _: Lead) =>
            val (inp, kExpr, dflt, isLead) = off match {
              case l: Lag => (l.input, l.inputOffset, l.default, false)
              case l: Lead => (l.input, l.offset, l.default, true)
            }
            val k = kExpr.eval().asInstanceOf[Integer].intValue
            val out = AttributeReference(name + "__graft_off",
              off.asInstanceOf[Expression].dataType,
              nullable = we.nullable)()
            cur = GlobalOffset(out, order, inp, k, dflt, isLead, cur)
            Alias(out, name)(exprId = a.exprId, qualifier = a.qualifier,
              explicitMetadata = Some(a.metadata))
          case ae: AggregateExpression if slideOf(we).isDefined =>
            val (frLo, frHi) = slideOf(we).get
            ae.aggregateFunction match {
              case _ if frLo == 0 && frHi == 0 =>
                // single-row frame: the aggregate of the row itself
                val self: Expression = ae.aggregateFunction match {
                  case _: Count => Literal(1L)
                  case av: Average => Cast(av.child, DoubleType)
                  case s: Sum => Cast(s.child, LongType)
                  case m: Min => m.child
                  case m: Max => m.child
                }
                Alias(self, name)(exprId = a.exprId, qualifier = a.qualifier,
                  explicitMetadata = Some(a.metadata))
              case _: Count if frLo < 0 && frHi == 0 =>
                // trailing count(*) ≡ least(row_number, j+1): the frame
                // holds j+1 rows once the numbering clears the start
                val rank = AttributeReference(name + "__graft_rn", LongType,
                  nullable = false)()
                cur = GlobalRowNumber(rank, order, cur)
                Alias(Least(Seq(rank, Literal((-frLo + 1).toLong))), name)(
                  exprId = a.exprId, qualifier = a.qualifier,
                  explicitMetadata = Some(a.metadata))
              case _: Count =>
                // general bounded count(*): slide an all-ones indicator
                // with SQL's empty-frame count, 0 (frames reaching past
                // the partition end clip against the hand-off)
                val out = AttributeReference(name + "__graft_scn", LongType,
                  nullable = false)()
                cur = GlobalSliding(out, order, Literal(1L), frLo, frHi,
                  RunningLongOp.Add, cur, checked = false, emptyAsZero = true)
                Alias(out, name)(exprId = a.exprId, qualifier = a.qualifier,
                  explicitMetadata = Some(a.metadata))
              case av: Average =>
                // sliding avg = sliding exact long sum ÷ sliding count
                // of non-null values, two hand-off operators over the
                // one shuffle. The count rides a null-propagating
                // indicator (null x → null), so an all-null frame gives
                // NULL cnt AND NULL sum → NULL avg; otherwise cnt ≥ 1.
                // Sum always overflow-checked — same argument as the
                // running avg (stock's per-frame double recompute
                // cannot overflow); exactness equal to stock while
                // frame sums stay within 2^53.
                val x = av.child
                val vExpr = if (x.dataType == LongType) x else Cast(x, LongType)
                val iExpr = If(IsNull(x), Literal.create(null, LongType),
                  Literal(1L))
                val sumOut = AttributeReference(name + "__graft_ssum", LongType,
                  nullable = true)()
                val cntOut = AttributeReference(name + "__graft_scnt", LongType,
                  nullable = true)()
                cur = GlobalSliding(cntOut, order, iExpr, frLo, frHi,
                  RunningLongOp.Add,
                  GlobalSliding(sumOut, order, vExpr, frLo, frHi,
                    RunningLongOp.Add, cur, checked = true),
                  checked = false)
                Alias(Divide(Cast(sumOut, DoubleType), Cast(cntOut, DoubleType),
                  EvalMode.LEGACY), name)(exprId = a.exprId,
                  qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
              case fn =>
                val (aggChild, op) = fn match {
                  case s: Sum => (s.child, RunningLongOp.Add)
                  case m: Min => (m.child, RunningLongOp.Min)
                  case m: Max => (m.child, RunningLongOp.Max)
                }
                val valueExpr =
                  if (aggChild.dataType == LongType) aggChild
                  else Cast(aggChild, LongType)
                val out = AttributeReference(name + "__graft_sw", LongType,
                  nullable = true)()
                cur = GlobalSliding(out, order, valueExpr, frLo, frHi, op, cur,
                  checked = conf.ansiEnabled && op == RunningLongOp.Add)
                val restoredSw: Expression =
                  if (ae.dataType == LongType) out else Cast(out, ae.dataType)
                Alias(restoredSw, name)(exprId = a.exprId,
                  qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
            }
          case nv: NthValue if nthOffset(nv).exists(_ > 1) =>
            // nth_value(x, n): the n-th (non-null) value of the whole
            // ordered relation is ONE global scalar (pass 1 of
            // GlobalFirstValue collects n candidates per partition); a
            // running frame only reveals it once the frame holds n
            // (non-null) rows — IF(count >= n, scalar, NULL) over the
            // existing running-count operators. Full frames attach the
            // scalar directly.
            val nOff = nthOffset(nv).get
            val scalar = AttributeReference(name + "__graft_nth",
              nv.dataType, nullable = true)()
            cur = GlobalFirstValue(scalar, order, nv.input, fromEnd = false,
              skipNulls = nv.ignoreNulls, running = false, cur, n = nOff)
            if (isFullFrame(we)) {
              Alias(scalar, name)(exprId = a.exprId, qualifier = a.qualifier,
                explicitMetadata = Some(a.metadata))
            } else if (!nv.ignoreNulls && !isRangeRunning(we)) {
              // ROWS RESPECT NULLS: the frame holds n rows once the
              // row number reaches n
              val rn = AttributeReference(name + "__graft_rn", LongType,
                nullable = false)()
              cur = GlobalRowNumber(rn, order, cur)
              Alias(If(GreaterThanOrEqual(rn, Literal(nOff.toLong)), scalar,
                Literal.create(null, nv.dataType)), name)(exprId = a.exprId,
                qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
            } else {
              // IGNORE NULLS and/or RANGE: running (non-null) count,
              // peer-aware under RANGE (the frame reaches the current
              // run's end)
              val ind = Alias(
                if (nv.ignoreNulls) If(IsNull(nv.input), Literal(0L), Literal(1L))
                else Literal(1L), name + "__graft_ni")()
              val base = Project(cur.output :+ ind, cur)
              val cnt = AttributeReference(name + "__graft_nc", LongType,
                nullable = false)()
              cur = GlobalRunningSum(ind.toAttribute, cnt, order, base,
                checked = false, RunningLongOp.Add,
                peerAware = isRangeRunning(we))
              Alias(If(GreaterThanOrEqual(cnt, Literal(nOff.toLong)), scalar,
                Literal.create(null, nv.dataType)), name)(exprId = a.exprId,
                qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
            }
          case fn if edgeOf(fn).isDefined =>
            val (inp, fromEnd, skip) = edgeOf(fn).get
            if (fromEnd && !skip && !isFullFrame(we) && !isRangeRunning(we)) {
              // last_value RESPECT NULLS over ROWS …CURRENT ROW is the
              // current row's own value — no operator at all
              Alias(inp, name)(exprId = a.exprId, qualifier = a.qualifier,
                explicitMetadata = Some(a.metadata))
            } else {
              // running recurrence for IGNORE NULLS under a …CURRENT
              // ROW frame (peer-aware when RANGE), plus the peer-aware
              // run-last-row mode for RANGE last_value RESPECT NULLS;
              // every other firing shape reduces to ONE global scalar
              // (first/last [non-null] value of the whole ordered
              // relation) attached as a constant
              val runs = !isFullFrame(we) &&
                (skip || (fromEnd && isRangeRunning(we)))
              val out = AttributeReference(name + "__graft_fv", fn.dataType,
                nullable = true)()
              cur = GlobalFirstValue(out, order, inp, fromEnd, skip, runs, cur,
                peerAware = runs && isRangeRunning(we))
              Alias(out, name)(exprId = a.exprId, qualifier = a.qualifier,
                explicitMetadata = Some(a.metadata))
            }
          case ae: AggregateExpression
              if ae.aggregateFunction.isInstanceOf[Average] =>
            // avg = (exact long running sum of x) / (running count of
            // non-null x) — both from the existing two-pass operators
            // over the ONE shared range shuffle. Equal to the
            // double-accumulated result of stock Spark AND the oracle
            // while prefix sums stay within 2^53 (double accumulation
            // of in-range integers never rounds); beyond that the
            // exact-sum quotient is the MORE accurate value. The sum is
            // always overflow-CHECKED: stock avg cannot overflow (double
            // accumulator), so past Long range the rewrite aborts loudly
            // rather than silently wrapping.
            val x = ae.aggregateFunction.asInstanceOf[Average].child
            val vAl = Alias(
              if (x.dataType == LongType) x else Cast(x, LongType),
              name + "__graft_av")()
            val cAl = Alias(If(IsNull(x), Literal(0L), Literal(1L)),
              name + "__graft_ai")()
            val base = Project(cur.output ++ Seq(vAl, cAl), cur)
            val sumOut = AttributeReference(name + "__graft_asum", LongType,
              nullable = true)() // SQL nulls: sum NULL until first non-null
            val cntOut = AttributeReference(name + "__graft_acnt", LongType,
              nullable = false)() // indicator is never null; plain count
            cur = GlobalRunningSum(cAl.toAttribute, cntOut, order,
              GlobalRunningSum(vAl.toAttribute, sumOut, order, base,
                checked = true, RunningLongOp.Add,
                peerAware = isRangeRunning(we)),
              checked = false, RunningLongOp.Add,
              peerAware = isRangeRunning(we))
            // cnt ≥ 1 whenever sum is non-null, so LEGACY divide only
            // sees 0 with a NULL numerator → NULL, the SQL avg of an
            // all-null prefix
            Alias(Divide(Cast(sumOut, DoubleType), Cast(cntOut, DoubleType),
              EvalMode.LEGACY), name)(exprId = a.exprId,
              qualifier = a.qualifier, explicitMetadata = Some(a.metadata))
          case ae: AggregateExpression
              if ae.aggregateFunction.isInstanceOf[Count] && !isRangeRunning(we) =>
            // ROWS running count(*) ≡ the 1-based row number, already LONG
            val rank =
              AttributeReference(name + "__graft_rn", LongType, nullable = false)()
            cur = GlobalRowNumber(rank, order, cur)
            Alias(rank, name)(exprId = a.exprId, qualifier = a.qualifier,
              explicitMetadata = Some(a.metadata))
          case ae: AggregateExpression =>
            val (aggChild, op) = ae.aggregateFunction match {
              case s: Sum => (s.child, RunningLongOp.Add)
              case m: Min => (m.child, RunningLongOp.Min)
              case m: Max => (m.child, RunningLongOp.Max)
              // RANGE count(*) (reaches here only peer-aware): the
              // count of rows with key <= current ≡ peer-aware sum of 1s
              case _: Count => (Literal(1L), RunningLongOp.Add)
            }
            val (valueAttr, base) = aggChild match {
              case ar: AttributeReference
                  if ar.dataType == LongType && cur.outputSet.contains(ar) =>
                (ar: Attribute, cur)
              case e =>
                val v = Alias(
                  if (e.dataType == LongType) e else Cast(e, LongType),
                  name + "__graft_val")()
                (v.toAttribute, Project(cur.output :+ v, cur))
            }
            // nullable output attr selects the exact SQL semantics path
            // (null until the first non-null value) in the exec;
            // count(*) is never NULL, so it keeps the non-nullable
            // nulls-as-0 contract (its value expr is never null anyway)
            val isCount = ae.aggregateFunction.isInstanceOf[Count]
            val out = AttributeReference(name + "__graft_sum", LongType,
              nullable = !isCount)()
            cur = GlobalRunningSum(valueAttr, out, order, base,
              checked = conf.ansiEnabled && op == RunningLongOp.Add && !isCount,
              op, peerAware = isRangeRunning(we))
            // SUM(integral) is LONG; MIN/MAX return the child type —
            // cast the operator's long back (values are actual column
            // values, so the narrowing is lossless)
            val restoredAgg: Expression =
              if (ae.dataType == LongType) out else Cast(out, ae.dataType)
            Alias(restoredAgg, name)(exprId = a.exprId, qualifier = a.qualifier,
              explicitMetadata = Some(a.metadata))
        }
    }
    Project(child.output ++ restored, cur)
  }
}
