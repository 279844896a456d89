// Lives under org.apache.spark.sql to reach private[sql]/private[spark]
// helpers — see GlobalRowNumber.scala.
package org.apache.spark.sql.graftplans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{ExternalAppendOnlyUnsafeRowArray, SparkPlan, SparkStrategy, UnaryExecNode}

/** Scale-shaped `first_value` / `last_value` under a total order —
  * partition-less edge-value windows that stock Spark plans as a
  * single-partition sort.
  *
  * Two shapes, selected by `running`:
  *
  *  - CONSTANT (`running = false`): the value is one global scalar —
  *    the first/last row's value (`skipNulls = false`) or the
  *    first/last NON-NULL value (`skipNulls = true`) of the whole
  *    ordered relation. This covers `first_value(x) OVER (ORDER BY …)`
  *    with any UNBOUNDED PRECEDING frame (the frame's upper bound never
  *    moves the frame's FIRST row) and both edge functions over the
  *    full UNBOUNDED..UNBOUNDED frame. Pass 1 extracts one candidate
  *    value per sorted range partition (a single-field UnsafeRow, never
  *    a payload row); the driver picks the globally first/last defined
  *    candidate; pass 2 attaches it as a constant.
  *
  *  - RUNNING (`running = true`, implies `skipNulls`): SQL semantics of
  *    `first_value/last_value(x IGNORE NULLS) OVER (ORDER BY … ROWS
  *    UNBOUNDED PRECEDING)` — rows before the first non-null see NULL.
  *    Pass 1 collects each partition's first (or last) non-null value;
  *    the driver prefix-folds them into a per-partition incoming carry
  *    (the edge value of everything BEFORE the partition); pass 2 runs
  *    the trivial in-partition recurrence seeded from the carry
  *    (first: set-once; last: overwrite-on-non-null).
  *
  * N-TH VALUE (`n > 1`, constant mode only): `nth_value(x, n)`'s
  * scalar — the n-th row's value (or n-th NON-NULL value under IGNORE
  * NULLS) of the whole ordered relation. Pass 1 collects each
  * partition's FIRST n candidates (it stops scanning once it has n);
  * the driver concatenates them in partition order and picks the n-th
  * (None — a NULL output — when the relation is shorter). Running n-th
  * frames are composed in the REWRITE: this constant plus a running
  * (non-null) count and `IF(count >= n, scalar, NULL)`. The rewrite
  * caps n like the offset cap, so driver state stays ≤ nParts × n
  * single-field values.
  *
  * PEER-AWARE running (`peerAware = true`, requires `running`): RANGE
  * UNBOUNDED..CURRENT frames include the current row's order-key
  * peers, so the recurrence advances per TIE-RUN, not per row — one
  * run buffers spill-safe at a time (GlobalRank's cume_dist
  * machinery) and every row in it sees the state as of the run's END.
  * This also admits `last_value` RESPECT NULLS (`skipNulls = false`):
  * its value is the run's last row — each run overwrites the state,
  * so no carry is consumed. Like stock Spark, the "last" row among
  * equal keys is partition-sort-arbitrary; callers needing
  * determinism use inputs functionally dependent on the order key.
  *
  * Same two-pass discipline as [[GlobalRowNumber]]: both passes must
  * observe ONE materialized range shuffle, hence one physical operator.
  * Driver state is one single-field row per partition. Values ride
  * UnsafeRows, so any data type the hand-off pattern supports in
  * [[GlobalOffset]] works here too. */
case class GlobalFirstValue(outAttr: AttributeReference, order: Seq[SortOrder],
    input: Expression, fromEnd: Boolean, skipNulls: Boolean, running: Boolean,
    child: LogicalPlan, peerAware: Boolean = false,
    n: Int = 1) extends UnaryNode {
  require(!running || skipNulls || (peerAware && fromEnd),
    "running edge-value needs IGNORE NULLS (RESPECT NULLS is a constant or the row itself), " +
      "except the peer-aware run-last-row mode")
  require(!peerAware || running, "peerAware only modifies the running recurrence")
  require(n >= 1, s"nth-value offset must be >= 1, got $n")
  require(n == 1 || (!fromEnd && !running),
    "n > 1 is the constant nth_value scalar: first-edge, non-running only")
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalFirstValue =
    copy(child = newChild)
}

object GlobalFirstValueStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalFirstValue =>
      GlobalFirstValueExec(g.outAttr, g.order, g.input, g.fromEnd, g.skipNulls,
        g.running, planLater(g.child), g.peerAware, g.n) :: Nil
    case _ => Nil
  }
}

case class GlobalFirstValueExec(outAttr: AttributeReference, order: Seq[SortOrder],
    input: Expression, fromEnd: Boolean, skipNulls: Boolean, running: Boolean,
    child: SparkPlan, peerAware: Boolean = false,
    n: Int = 1) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    val childAttrs = child.output
    val inputExpr = input
    val fromEnd0 = fromEnd
    val skip = skipNulls
    val dt = outAttr.dataType
    // The peer-aware run-last-row mode (running && !skipNulls) needs no
    // cross-partition state at all: every tie-run overwrites the state
    // and a run never straddles partitions, so pass 1 and the carry
    // would be dead weight — skip the job entirely.
    val needPass1 = !running || skipNulls
    val nth = n
    // Pass 1: up to n candidate single-field values per sorted
    // partition — the first n (non-null) values, or the last (non-null)
    // value for the last-edge (n is 1 there). first-edge stops scanning
    // once it has its n candidates; last-edge scans the partition (same
    // cost class as a running sum's pass 1).
    val candidates: Array[Array[UnsafeRow]] = if (!needPass1) Array.empty
      else rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
        val valProj = UnsafeProjection.create(Seq(inputExpr), childAttrs)
        if (fromEnd0) {
          var found: UnsafeRow = null
          while (it.hasNext) {
            val v = valProj(it.next())
            if (!skip || !v.isNullAt(0)) found = v.copy()
          }
          if (found == null) Array.empty[UnsafeRow] else Array(found)
        } else {
          val buf = new scala.collection.mutable.ArrayBuffer[UnsafeRow](
            math.min(nth, 16))
          while (buf.length < nth && it.hasNext) {
            val v = valProj(it.next())
            if (!skip || !v.isNullAt(0)) buf += v.copy()
          }
          buf.toArray
        }
      })
    val nParts = candidates.length
    // Driver fold: constant mode picks the globally n-th / last defined
    // candidate; running mode prefix-folds candidates into each
    // partition's incoming carry (the edge value of everything before).
    val globalConst: Option[UnsafeRow] =
      if (fromEnd0) candidates.reverseIterator.collectFirst {
        case a if a.nonEmpty => a.last
      }
      else {
        val it = candidates.iterator.flatten.drop(nth - 1)
        if (it.hasNext) Some(it.next()) else None
      }
    val carry: Array[Option[UnsafeRow]] = new Array(nParts)
    if (running) {
      var acc: Option[UnsafeRow] = None
      for (p <- 0 until nParts) {
        carry(p) = acc
        acc = if (fromEnd0) candidates(p).lastOption.orElse(acc)
          else acc.orElse(candidates(p).headOption)
      }
    }
    val isRunning = running
    val peer = peerAware
    val orderExprs = order.map(_.child)
    val ko = order.zipWithIndex.map { case (s, i) =>
      s.copy(child = BoundReference(i, s.child.dataType, s.child.nullable))
    }
    val inMemThreshold = conf.windowExecBufferInMemoryThreshold
    val spillThreshold = conf.windowExecBufferSpillThreshold
    val spillSizeThreshold = conf.windowExecBufferSpillSizeThreshold
    rdd.mapPartitionsWithIndexInternal { (pid, it) =>
      val valProj = UnsafeProjection.create(Seq(inputExpr), childAttrs)
      val proj = UnsafeProjection.create(
        (childAttrs :+ outAttr).zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        })
      val joined = new JoinedRow
      val valueRow = new GenericInternalRow(1)
      def set(v: Option[UnsafeRow]): Unit = v match {
        case Some(r) if !r.isNullAt(0) => valueRow.update(0, r.get(0, dt))
        case _ => valueRow.setNullAt(0)
      }
      if (!isRunning) {
        set(globalConst)
        it.map(row => proj(joined(row, valueRow)))
      } else if (!peer) {
        var cur: Option[UnsafeRow] = carry(pid)
        set(cur)
        it.map { row =>
          // frame includes the current row: a non-null here is visible
          // to this row's own output
          if (fromEnd0 || cur.isEmpty) {
            val v = valProj(row)
            if (!v.isNullAt(0)) { cur = Some(v.copy()); set(cur) }
          }
          proj(joined(row, valueRow))
        }
      } else {
        // peer-aware: the state advances per tie-run; every row of a
        // run sees the state as of the run's END (RANGE frames include
        // the current row's peers). skipNulls modes carry across runs;
        // the run-last-row mode (fromEnd && !skipNulls) overwrites the
        // state with every row, landing on the run's last row.
        val keyProj = UnsafeProjection.create(orderExprs, childAttrs)
        val cmp = new LazilyGeneratedOrdering(ko)
        val toUnsafe = UnsafeProjection.create(childAttrs, childAttrs)
        new Iterator[InternalRow] {
          private val buf = new ExternalAppendOnlyUnsafeRowArray(
            inMemThreshold, spillSizeThreshold, spillThreshold,
            spillSizeThreshold)
          private var pending: UnsafeRow = null
          private var pendingKey: UnsafeRow = null
          private var cur: Option[UnsafeRow] =
            if (skip) carry(pid) else None
          private var outIter: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean =
            outIter.hasNext || pending != null || it.hasNext
          override def next(): InternalRow = {
            if (!outIter.hasNext) fillRun()
            outIter.next()
          }
          private def addToRun(row: UnsafeRow): Unit = {
            buf.add(row)
            val v = valProj(row)
            if (!skip) cur = Some(v.copy()) // run-last-row mode
            else if (!v.isNullAt(0) && (fromEnd0 || cur.isEmpty))
              cur = Some(v.copy())
          }
          private def fillRun(): Unit = {
            buf.clear()
            var runKey: UnsafeRow = null
            if (pending != null) {
              runKey = pendingKey
              addToRun(pending)
              pending = null
              pendingKey = null
            } else {
              val row = toUnsafe(it.next())
              runKey = keyProj(row).copy().asInstanceOf[UnsafeRow]
              addToRun(row)
            }
            var closed = false
            while (!closed && it.hasNext) {
              val row = toUnsafe(it.next())
              val key = keyProj(row)
              if (cmp.compare(runKey, key) == 0) addToRun(row)
              else {
                pending = row.copy()
                pendingKey = key.copy().asInstanceOf[UnsafeRow]
                closed = true
              }
            }
            set(cur)
            outIter = buf.generateIterator().map(r => proj(joined(r, valueRow)))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalFirstValueExec =
    copy(child = newChild)
}
