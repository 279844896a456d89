// Lives under org.apache.spark.sql to reach private[sql]/private[spark]
// helpers — see GlobalRowNumber.scala.
package org.apache.spark.sql.graftplans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BoundReference, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Scale-shaped global `rank()` / `dense_rank()` under a total order —
  * the tie-aware siblings of [[GlobalRowNumber]].
  *
  * Why the two-pass decomposition stays EXACT for rank functions:
  * Catalyst's RangePartitioning assigns every row with the same order
  * key to the same partition (getPartition is a pure function of the
  * key), so a tie-run can never straddle a partition boundary. That
  * makes both ranks locally computable given two prefix offsets:
  * rank(row) = (rows in earlier partitions) + (1-based position of the
  * row's tie-run start within its partition); dense_rank(row) =
  * (tie-runs in earlier partitions) + (1-based index of the row's
  * tie-run within its partition). Pass 1 counts rows and tie-runs per
  * sorted partition over the materialized shuffle; pass 2 re-walks it
  * with the same codegen'd peer comparator and emits the offset-added
  * rank. Peers are defined exactly as Spark's Window defines them —
  * the SortOrder comparator reports 0 — via a LazilyGeneratedOrdering
  * over the projected order keys (narrow key rows are copied at run
  * boundaries, never the full payload). */
case class GlobalRank(rankAttr: AttributeReference, order: Seq[SortOrder],
    dense: Boolean, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRank =
    copy(child = newChild)
}

object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalRank =>
      GlobalRankExec(g.rankAttr, g.order, g.dense, planLater(g.child)) :: Nil
    case _ => Nil
  }
}

case class GlobalRankExec(rankAttr: AttributeReference, order: Seq[SortOrder],
    dense: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** Projected-key SortOrder: the peer comparator runs over the
    * narrow key projection, not the full row. */
  private def keyOrder: Seq[SortOrder] = order.zipWithIndex.map { case (s, i) =>
    s.copy(child = BoundReference(i, s.child.dataType, s.child.nullable))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    val childAttrs = child.output
    val orderExprs = order.map(_.child)
    val ko = keyOrder
    // Pass 1: rows and tie-runs per sorted partition.
    val parts = rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
      val keyProj = UnsafeProjection.create(orderExprs, childAttrs)
      val cmp = new LazilyGeneratedOrdering(ko)
      var rows = 0L
      var runs = 0L
      var prevKey: InternalRow = null
      while (it.hasNext) {
        val key = keyProj(it.next())
        rows += 1
        if (prevKey == null || cmp.compare(prevKey, key) != 0) {
          runs += 1
          prevKey = key.copy()
        }
      }
      (rows, runs)
    })
    // offsets(p) = 1-based global row position / tie-run index of
    // partition p's first row (runs never straddle partitions)
    val rowOffsets = parts.map(_._1).scanLeft(1L)(_ + _)
    val denseOffsets = parts.map(_._2).scanLeft(1L)(_ + _)
    val isDense = dense
    rdd.mapPartitionsWithIndexInternal { (pid, it) =>
      val keyProj = UnsafeProjection.create(orderExprs, childAttrs)
      val cmp = new LazilyGeneratedOrdering(ko)
      val proj = UnsafeProjection.create(
        (childAttrs :+ rankAttr).zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        })
      val joined = new JoinedRow
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      var localPos = 0L      // 1-based row position within the partition
      var runStart = 0L      // localPos of the current tie-run's first row
      var localRuns = 0L     // tie-runs seen so far in the partition
      var prevKey: InternalRow = null
      it.map { row =>
        val key = keyProj(row)
        localPos += 1
        if (prevKey == null || cmp.compare(prevKey, key) != 0) {
          runStart = localPos
          localRuns += 1
          prevKey = key.copy()
        }
        val r =
          if (isDense) denseOffsets(pid) + localRuns - 1
          else rowOffsets(pid) + runStart - 1
        rankRow.setLong(0, r)
        proj(joined(row, rankRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRankExec =
    copy(child = newChild)
}
