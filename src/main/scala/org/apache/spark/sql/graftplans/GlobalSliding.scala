// Lives under org.apache.spark.sql to reach private[sql]/private[spark]
// helpers — see GlobalRowNumber.scala.
package org.apache.spark.sql.graftplans

import scala.collection.mutable.ArrayDeque

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Scale-shaped global SLIDING aggregate under a total order:
  * `sum/min/max(x) OVER (ORDER BY … ROWS BETWEEN j PRECEDING AND
  * CURRENT ROW)` with no PARTITION BY — the rolling-stat shape stock
  * Spark funnels through a single partition's sort.
  *
  * The frame at row i covers rows i−j … i, so a partition only ever
  * needs the j values that precede its first row: the same boundary
  * hand-off [[GlobalOffset]] uses (pass 1 collects each sorted
  * partition's last j values — (long, isNull) pairs, never payload
  * rows; the driver folds them into per-partition incoming windows,
  * short partitions forwarding their predecessor's surplus). Pass 2
  * seeds a window deque from the hand-off and slides it:
  *  - sum: running non-null total and count, added on entry and
  *    subtracted on exit — O(1) per row;
  *  - min/max: a monotonic deque of (rowIndex, value) — amortized
  *    O(1) per row, O(j) worst-case space;
  * SQL null semantics fall out of the non-null count / deque
  * emptiness: a frame of all-null values yields NULL (every frame
  * contains at least the current row, so there is no "empty frame"
  * case). The rewrite caps j like the offset cap, keeping driver
  * hand-off state trivially small. */
case class GlobalSliding(outAttr: AttributeReference, order: Seq[SortOrder],
    value: org.apache.spark.sql.catalyst.expressions.Expression, preceding: Int,
    op: RunningLongOp, child: LogicalPlan,
    checked: Boolean = false) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalSliding =
    copy(child = newChild)
}

object GlobalSlidingStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalSliding =>
      GlobalSlidingExec(g.outAttr, g.order, g.value, g.preceding, g.op,
        planLater(g.child), g.checked) :: Nil
    case _ => Nil
  }
}

case class GlobalSlidingExec(outAttr: AttributeReference, order: Seq[SortOrder],
    value: org.apache.spark.sql.catalyst.expressions.Expression, preceding: Int,
    op: RunningLongOp, child: SparkPlan,
    checked: Boolean = false) extends UnaryExecNode {
  require(preceding >= 1, s"GlobalSliding needs j >= 1 PRECEDING, got $preceding")

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
    val j = preceding
    val theOp = op
    // Pass 1: each partition's last j (value, isNull) pairs.
    val boundary: Array[Array[(Long, Boolean)]] =
      rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
        val valProj = UnsafeProjection.create(Seq(valueExpr), childAttrs)
        val q = new ArrayDeque[(Long, Boolean)](j + 1)
        while (it.hasNext) {
          val v = valProj(it.next())
          q.append(if (v.isNullAt(0)) (0L, true) else (v.getLong(0), false))
          if (q.length > j) q.removeHead()
        }
        q.toArray
      })
    val nParts = boundary.length
    val handOff: Array[Array[(Long, Boolean)]] = new Array(nParts)
    var acc = Array.empty[(Long, Boolean)]
    for (p <- 0 until nParts) {
      handOff(p) = acc
      acc = (acc ++ boundary(p)).takeRight(j)
    }
    rdd.mapPartitionsWithIndexInternal { (pid, it) =>
      val valProj = UnsafeProjection.create(Seq(valueExpr), childAttrs)
      val proj = UnsafeProjection.create(
        (childAttrs :+ outAttr).zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        })
      val joined = new JoinedRow
      val outRow = new GenericInternalRow(1)
      theOp match {
        case RunningLongOp.Add =>
          // window ring of (value, isNull); O(1) evict-then-add with a
          // non-null count for SQL nulls. `checked` (ANSI) uses exact
          // arithmetic on the accumulator: the accumulator always
          // equals a CONTIGUOUS window's sum (evict-before-add keeps
          // it ≤ j+1 elements), so a trip means some window suffix
          // overflows — the same errs-toward-error asymmetry the
          // running sum documents; never a wrong value.
          val doAdd: (Long, Long) => Long =
            if (checked) Math.addExact else (a: Long, b: Long) => a + b
          val doSub: (Long, Long) => Long =
            if (checked) Math.subtractExact else (a: Long, b: Long) => a - b
          val ring = new ArrayDeque[(Long, Boolean)](j + 2)
          var sum = 0L
          var nonNull = 0
          def push(e: (Long, Boolean)): Unit = {
            if (ring.length == j + 1) {
              val old = ring.removeHead()
              if (!old._2) { sum = doSub(sum, old._1); nonNull -= 1 }
            }
            ring.append(e)
            if (!e._2) { sum = doAdd(sum, e._1); nonNull += 1 }
          }
          handOff(pid).foreach(push)
          it.map { row =>
            val v = valProj(row)
            push(if (v.isNullAt(0)) (0L, true) else (v.getLong(0), false))
            if (nonNull > 0) outRow.setLong(0, sum) else outRow.setNullAt(0)
            proj(joined(row, outRow))
          }
        case _ =>
          // monotonic deque of (rowIdx, value): entries dominated by a
          // newer better value are popped on entry; the head expires
          // once it leaves the frame. Nulls never enter the deque.
          val better: (Long, Long) => Boolean =
            if (theOp == RunningLongOp.Min) (a, b) => a <= b else (a, b) => a >= b
          val deque = new ArrayDeque[(Long, Long)](j + 2)
          var idx = 0L // global-ish row index within (hand-off ++ partition)
          def push(v: Long, isNull: Boolean): Unit = {
            if (!isNull) {
              while (deque.nonEmpty && better(v, deque.last._2)) deque.removeLast()
              deque.append((idx, v))
            }
            idx += 1
            // expire entries older than the frame start (idx-1 is the
            // just-pushed row; frame covers (idx-1)-j .. idx-1)
            while (deque.nonEmpty && deque.head._1 < idx - 1 - j) deque.removeHead()
          }
          handOff(pid).foreach { case (v, isNull) => push(v, isNull) }
          it.map { row =>
            val v = valProj(row)
            push(if (v.isNullAt(0)) 0L else v.getLong(0), v.isNullAt(0))
            if (deque.nonEmpty) outRow.setLong(0, deque.head._2)
            else outRow.setNullAt(0)
            proj(joined(row, outRow))
          }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalSlidingExec =
    copy(child = newChild)
}
