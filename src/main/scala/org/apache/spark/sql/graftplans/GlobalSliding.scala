// Lives under org.apache.spark.sql to reach private[sql]/private[spark]
// helpers — see GlobalRowNumber.scala.
package org.apache.spark.sql.graftplans

import scala.collection.mutable.ArrayDeque

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Scale-shaped global SLIDING aggregate under a total order:
  * `sum/min/max/count/avg(x) OVER (ORDER BY … ROWS BETWEEN a AND b)`
  * with BOUNDED row offsets and no PARTITION BY — the rolling-stat /
  * centered-moving-average shape stock Spark funnels through a single
  * partition's sort. The frame at row i covers rows i+lo … i+hi
  * (lo ≤ hi; lo/hi are signed row offsets — `3 PRECEDING` is −3,
  * `CURRENT ROW` 0, `2 FOLLOWING` +2 — so `ROWS BETWEEN 3 PRECEDING
  * AND 3 FOLLOWING` is (−3, +3) and a trailing window (−j, 0)).
  *
  * A partition needs only the |lo| values BEFORE its first row and the
  * hi values AFTER its last row: the same boundary hand-off
  * [[GlobalOffset]] uses on both sides (pass 1 collects each sorted
  * partition's last |lo| AND first hi projected values in one scan —
  * (long, isNull) pairs, never payload rows; the driver folds them
  * into per-partition incoming windows, short partitions forwarding
  * their neighbours' surplus). Pass 2 streams the value sequence
  * (pre-hand-off ++ partition ++ post-hand-off) through a window
  * structure and emits each payload row once its frame's upper bound
  * has been consumed — at most hi payload rows buffered (the rewrite
  * caps the offsets, so both the buffer and the driver state stay
  * trivially small):
  *  - sum/count: a ring of (absIdx, value, isNull), added on entry
  *    and subtracted when the emit frontier passes — O(1) per row;
  *  - min/max: a monotonic deque of (absIdx, value) — amortized O(1);
  * SQL null semantics fall out of the non-null count / deque
  * emptiness: an all-null or EMPTY frame (possible once both bounds
  * can sit off the partition edge, e.g. `5 PRECEDING AND 2 PRECEDING`
  * at row 1) yields NULL — except count(*), whose `emptyAsZero` gives
  * the SQL count of an empty frame, 0. */
case class GlobalSliding(outAttr: AttributeReference, order: Seq[SortOrder],
    value: org.apache.spark.sql.catalyst.expressions.Expression,
    lo: Int, hi: Int, op: RunningLongOp, child: LogicalPlan,
    checked: Boolean = false, emptyAsZero: Boolean = false)
  extends UnaryNode {
  require(lo <= hi, s"GlobalSliding frame needs lo <= hi, got ($lo, $hi)")
  require(lo < 0 || hi > 0, s"GlobalSliding frame ($lo, $hi) is the row itself")
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalSliding =
    copy(child = newChild)
}

object GlobalSlidingStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalSliding =>
      GlobalSlidingExec(g.outAttr, g.order, g.value, g.lo, g.hi, g.op,
        planLater(g.child), g.checked, g.emptyAsZero) :: Nil
    case _ => Nil
  }
}

case class GlobalSlidingExec(outAttr: AttributeReference, order: Seq[SortOrder],
    value: org.apache.spark.sql.catalyst.expressions.Expression,
    lo: Int, hi: Int, op: RunningLongOp, child: SparkPlan,
    checked: Boolean = false, emptyAsZero: Boolean = false)
  extends UnaryExecNode {

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
    val valueExpr = value
    val pre = math.max(0, -lo) // values needed before the partition
    val fol = math.max(0, hi) // values needed after the partition
    val lo0 = lo
    val hi0 = hi
    val theOp = op
    val zeroEmpty = emptyAsZero
    // Pass 1: each partition's last `pre` and first `fol` (value,
    // isNull) pairs, in one scan.
    val boundary: Array[(Array[(Long, Boolean)], Array[(Long, Boolean)])] =
      rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
        val valProj = UnsafeProjection.create(Seq(valueExpr), childAttrs)
        val last = new ArrayDeque[(Long, Boolean)](pre + 1)
        val first = new scala.collection.mutable.ArrayBuffer[(Long, Boolean)](
          math.min(fol, 16))
        while (it.hasNext) {
          val v = valProj(it.next())
          val e = if (v.isNullAt(0)) (0L, true) else (v.getLong(0), false)
          if (first.length < fol) first += e
          if (pre > 0) {
            last.append(e)
            if (last.length > pre) last.removeHead()
          }
        }
        (last.toArray, first.toArray)
      })
    val nParts = boundary.length
    // Driver folds: prefix carry of the last `pre` values before each
    // partition; suffix carry of the first `fol` values after it.
    val preHand: Array[Array[(Long, Boolean)]] = new Array(nParts)
    var acc = Array.empty[(Long, Boolean)]
    for (p <- 0 until nParts) {
      preHand(p) = acc
      acc = (acc ++ boundary(p)._1).takeRight(pre)
    }
    val folHand: Array[Array[(Long, Boolean)]] = new Array(nParts)
    var accF = Array.empty[(Long, Boolean)]
    for (p <- nParts - 1 to 0 by -1) {
      folHand(p) = accF
      accF = (boundary(p)._2 ++ accF).take(fol)
    }
    rdd.mapPartitionsWithIndexInternal { (pid, it) =>
      val valProj = UnsafeProjection.create(Seq(valueExpr), childAttrs)
      val proj = UnsafeProjection.create(
        (childAttrs :+ outAttr).zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        })
      val toUnsafe = UnsafeProjection.create(childAttrs, childAttrs)
      val joined = new JoinedRow
      val outRow = new GenericInternalRow(1)
      // Value stream: preHand ++ partition values ++ folHand; absolute
      // index `pushed` counts consumed values. Payload row t sits at
      // value index preHand.length + t; it emits once value
      // idx(t) + hi has been consumed (or the stream is exhausted —
      // the frame clips at the global edges exactly because short
      // hand-offs ARE the edges).
      val preArr = preHand(pid)
      val folArr = folHand(pid)
      var pushed = -1L // absolute index of the last consumed value
      // sum/count ring: (absIdx, value, isNull); evicted once the emit
      // frontier passes absIdx < emitIdx + lo. min/max: monotonic
      // deque of (absIdx, value) — dominated entries popped on entry,
      // head expired by the same frontier.
      val doAdd: (Long, Long) => Long =
        if (checked) Math.addExact else (a: Long, b: Long) => a + b
      val doSub: (Long, Long) => Long =
        if (checked) Math.subtractExact else (a: Long, b: Long) => a - b
      val isAdd = theOp == RunningLongOp.Add
      val better: (Long, Long) => Boolean =
        if (theOp == RunningLongOp.Min) (a, b) => a <= b else (a, b) => a >= b
      val ring = new ArrayDeque[(Long, Long, Boolean)]
      val deque = new ArrayDeque[(Long, Long)]
      // consumed-but-not-yet-in-frame values: with a NEGATIVE upper
      // bound (`… AND 2 PRECEDING`) the current row's own value is
      // consumed before its admission index is reached — admission is
      // deferred to each emit's frame-upper frontier
      val staged = new ArrayDeque[(Long, Long, Boolean)]
      var sum = 0L
      var nonNull = 0L
      def pushVal(e: (Long, Boolean)): Unit = {
        pushed += 1
        staged.append((pushed, e._1, e._2))
      }
      def admitThrough(frameHi: Long): Unit =
        while (staged.nonEmpty && staged.head._1 <= frameHi) {
          val e = staged.removeHead()
          if (isAdd) {
            ring.append(e)
            if (!e._3) { sum = doAdd(sum, e._2); nonNull += 1 }
          } else if (!e._3) {
            while (deque.nonEmpty && better(e._2, deque.last._2))
              deque.removeLast()
            deque.append((e._1, e._2))
          }
        }
      // payload rows waiting for their frame's upper bound; ≤ hi+1
      // entries (offsets are capped by the rewrite)
      val pendingRows = new ArrayDeque[UnsafeRow]
      var emitIdx = preArr.length - 1L // value index of the last emitted row
      def emitHead(): InternalRow = {
        emitIdx += 1
        val frameLo = emitIdx + lo0
        admitThrough(emitIdx + hi0)
        if (isAdd) {
          while (ring.nonEmpty && ring.head._1 < frameLo) {
            val old = ring.removeHead()
            if (!old._3) { sum = doSub(sum, old._2); nonNull -= 1 }
          }
          if (nonNull > 0) outRow.setLong(0, sum)
          else if (zeroEmpty) outRow.setLong(0, 0L)
          else outRow.setNullAt(0)
        } else {
          while (deque.nonEmpty && deque.head._1 < frameLo) deque.removeHead()
          if (deque.nonEmpty) outRow.setLong(0, deque.head._2)
          else outRow.setNullAt(0)
        }
        proj(joined(pendingRows.removeHead(), outRow))
      }
      preArr.foreach(pushVal)
      var folIdx = 0
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext || pendingRows.nonEmpty
        override def next(): InternalRow = {
          // consume values until the head pending row's upper bound is
          // in, or the stream (partition + following hand-off) ends
          var ready = pendingRows.nonEmpty && emitIdx + 1 + hi0 <= pushed
          while (!ready) {
            if (it.hasNext) {
              val row = toUnsafe(it.next()).copy().asInstanceOf[UnsafeRow]
              val v = valProj(row)
              pendingRows.append(row)
              pushVal(if (v.isNullAt(0)) (0L, true) else (v.getLong(0), false))
            } else if (folIdx < folArr.length) {
              pushVal(folArr(folIdx))
              folIdx += 1
            } else {
              ready = true // exhausted: clip at the global edge
            }
            if (pendingRows.nonEmpty && emitIdx + 1 + hi0 <= pushed) ready = true
          }
          emitHead()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalSlidingExec =
    copy(child = newChild)
}
