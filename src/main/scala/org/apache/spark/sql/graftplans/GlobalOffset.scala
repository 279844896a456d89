// Lives under org.apache.spark.sql to reach private[sql]/private[spark]
// helpers — see GlobalRowNumber.scala.
package org.apache.spark.sql.graftplans

import scala.collection.mutable.ArrayDeque

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Scale-shaped global `lag(x, k)` / `lead(x, k)` under a total order.
  *
  * Offset functions are the one window family whose value genuinely
  * crosses partition boundaries: row i needs row i∓k, which after a
  * range shuffle can sit in the adjacent partition. The fix is not a
  * single-partition sort (stock Spark's plan) but a BOUNDARY HAND-OFF:
  * pass 1 collects each sorted partition's last k (lag) or first k
  * (lead) projected input VALUES — k single-field UnsafeRows per
  * partition, never payload rows — and the driver folds them into the
  * incoming hand-off for each partition (a partition with fewer than k
  * rows forwards its predecessor's surplus, so chains of tiny
  * partitions stay exact). Pass 2 is a ring buffer: lag keeps the last
  * k values seen (seeded from the hand-off); lead buffers at most k+1
  * payload rows, emitting row i when row i+k arrives and draining the
  * tail against the hand-off from the right.
  *
  * Driver state is numPartitions × k single-field rows; the rewrite
  * caps k (offsets beyond the cap fall back to Catalyst's Window), so
  * the hand-off stays trivially small next to the shuffle itself.
  * `ignoreNulls` variants need unbounded lookback and are left to
  * Catalyst. The emitted value for out-of-range rows is the function's
  * (foldable) default, evaluated once on the driver. */
case class GlobalOffset(outAttr: AttributeReference, order: Seq[SortOrder],
    input: Expression, offset: Int, default: Expression, isLead: Boolean,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalOffset =
    copy(child = newChild)
}

object GlobalOffsetStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalOffset =>
      GlobalOffsetExec(g.outAttr, g.order, g.input, g.offset, g.default,
        g.isLead, planLater(g.child)) :: Nil
    case _ => Nil
  }
}

case class GlobalOffsetExec(outAttr: AttributeReference, order: Seq[SortOrder],
    input: Expression, offset: Int, default: Expression, isLead: Boolean,
    child: SparkPlan) extends UnaryExecNode {
  require(offset > 0, s"GlobalOffset needs a positive offset, got $offset")

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
    val k = offset
    val lead = isLead
    val dt = outAttr.dataType
    // the default is foldable by the rewrite's guard; evaluate once
    val defaultValue: Any = default.eval(InternalRow.empty)
    // Pass 1: each partition's boundary values — the LAST k projected
    // input values for lag, the FIRST k for lead. Single-field rows.
    val boundary: Array[Array[UnsafeRow]] =
      rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
        val valProj = UnsafeProjection.create(Seq(inputExpr), childAttrs)
        if (lead) {
          it.take(k).map(r => valProj(r).copy()).toArray
        } else {
          val q = new ArrayDeque[UnsafeRow](k + 1)
          while (it.hasNext) {
            q.append(valProj(it.next()).copy())
            if (q.length > k) q.removeHead()
          }
          q.toArray
        }
      })
    // Fold the hand-offs on the driver. For lag, partition p's incoming
    // values are the last k of everything before it; for lead, the
    // first k of everything after it. Short partitions forward their
    // predecessor's/successor's surplus.
    val nParts = boundary.length
    val handOff: Array[Array[UnsafeRow]] = new Array(nParts)
    if (!lead) {
      var acc = Array.empty[UnsafeRow]
      for (p <- 0 until nParts) {
        handOff(p) = acc
        acc = (acc ++ boundary(p)).takeRight(k)
      }
    } else {
      var acc = Array.empty[UnsafeRow]
      for (p <- nParts - 1 to 0 by -1) {
        handOff(p) = acc
        acc = (boundary(p) ++ acc).take(k)
      }
    }
    rdd.mapPartitionsWithIndexInternal { (pid, it) =>
      val valProj = UnsafeProjection.create(Seq(inputExpr), childAttrs)
      val proj = UnsafeProjection.create(
        (childAttrs :+ outAttr).zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        })
      val joined = new JoinedRow
      val valueRow = new GenericInternalRow(1)
      def setFrom(v: UnsafeRow): Unit =
        if (v.isNullAt(0)) valueRow.setNullAt(0)
        else valueRow.update(0, v.get(0, dt))
      if (!lead) {
        // ring of the last k values seen before the current row,
        // seeded from the hand-off (may hold < k near the global start)
        val ring = new ArrayDeque[UnsafeRow](k + 1)
        handOff(pid).foreach(ring.append)
        it.map { row =>
          if (ring.length == k) setFrom(ring.removeHead())
          else valueRow.update(0, defaultValue)
          ring.append(valProj(row).copy())
          if (ring.length > k) ring.removeHead()
          proj(joined(row, valueRow))
        }
      } else {
        // buffer at most k payload rows: row i emits when row i+k
        // arrives; the tail drains against the hand-off from the right
        val pending = new ArrayDeque[UnsafeRow](k + 1)
        val toUnsafe = UnsafeProjection.create(childAttrs, childAttrs)
        new Iterator[InternalRow] {
          override def hasNext: Boolean = it.hasNext || pending.nonEmpty
          override def next(): InternalRow = {
            while (it.hasNext && pending.length <= k) {
              pending.append(toUnsafe(it.next()).copy().asInstanceOf[UnsafeRow])
            }
            val row = pending.removeHead()
            if (pending.length == k) {
              // the k-th follower is the last row just buffered
              setFrom(valProj(pending.last))
            } else {
              // source exhausted: the emitted row is (pending.length+1)
              // from the end, so its k-th follower is hand-off row
              // k - pending.length - 1 (0-based) from the right
              val idx = k - pending.length - 1
              val ho = handOff(pid)
              if (idx < ho.length) setFrom(ho(idx))
              else valueRow.update(0, defaultValue)
            }
            proj(joined(row, valueRow))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalOffsetExec =
    copy(child = newChild)
}
