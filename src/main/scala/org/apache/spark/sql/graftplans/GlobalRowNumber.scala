// Lives under org.apache.spark.sql to reach private[sql]/private[spark]
// helpers (classic.Dataset.ofRows, RDD.mapPartitionsWithIndexInternal) —
// the standard pattern for out-of-tree libraries shipping whole-operator
// plans, same as ../graftexprs.
package org.apache.spark.sql.graftplans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BoundReference, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator plan for scale-shaped global row numbering.
  *
  * Why a custom SparkPlan (preference order (c) from the build plan):
  * the two-pass shape — count each sorted range partition, prefix-sum
  * the counts, number rows with the partition's offset — needs BOTH
  * passes to observe the SAME range-partition assignment. Expressed as
  * two DataFrame branches over one `repartitionByRange`, column pruning
  * narrows the offsets branch's exchange (count(1) never needs the
  * payload), the two exchanges stop canonicalizing equal, exchange
  * reuse cannot fire, and each branch SAMPLES ITS OWN RANGE BOUNDS —
  * boundary rows land in different partitions per branch and the
  * numbering silently corrupts (observed: 10000 rows ranked to a max of
  * 9861). Here both passes run over the one materialized shuffle: the
  * count job triggers the map stage, the numbering job reuses its
  * shuffle files (Spark skips completed map stages), so the bounds are
  * sampled exactly once by construction — the same guarantee
  * `RDD.zipWithIndex` gives, but on UnsafeRow with a codegen'd
  * projection instead of a GenericRow round-trip. */
case class GlobalRowNumber(rankAttr: AttributeReference, order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRowNumber =
    copy(child = newChild)
}

object GlobalRowNumberStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalRowNumber =>
      GlobalRowNumberExec(g.rankAttr, g.order, planLater(g.child)) :: Nil
    case _ => Nil
  }
}

case class GlobalRowNumberExec(rankAttr: AttributeReference, order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  /** Range partitioning on the order keys: satisfied for free by the
    * `repartitionByRange` the DataFrame wrapper declares; EnsureRequirements
    * adds it (at `spark.sql.shuffle.partitions`) if a caller plans the
    * bare node. */
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    // Pass 1: per-partition counts over the materialized shuffle. This
    // runs sort+count per partition; pass 2 skips the completed map
    // stage and re-sorts only (the cost zipWithIndex pays too).
    val counts = rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
      var c = 0L
      while (it.hasNext) { it.next(); c += 1 }
      c
    })
    // offsets(p) = 1-based global index of partition p's first row
    val offsets = counts.scanLeft(1L)(_ + _)
    val childAttrs = child.output
    rdd.mapPartitionsWithIndexInternal { (pid, it) =>
      val proj = UnsafeProjection.create(
        (childAttrs :+ rankAttr).zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        })
      val joined = new JoinedRow
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      var idx = offsets(pid)
      it.map { row =>
        rankRow.setLong(0, idx)
        idx += 1
        proj(joined(row, rankRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRowNumberExec =
    copy(child = newChild)
}

object GlobalRowNumber {

  /** Build the numbering DataFrame: range-partition + sort within on
    * `orderBy`, then append `outputCol` = 1-based global row number.
    * Registers the planning strategy once per session. */
  def withRowNumber(df: DataFrame, orderBy: Seq[Column], outputCol: String,
      numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    // check-then-append under a lock: two threads racing here on one
    // session would otherwise lose or duplicate the registration
    GraftStrategyRegistration.ensure(spark, GlobalRowNumberStrategy)
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, orderBy: _*).sortWithinPartitions(orderBy: _*)
    // The analyzer already resolved the order when it analyzed the
    // sortWithinPartitions node — take it from there rather than
    // re-resolving Column internals by hand.
    val childPlan = sorted.queryExecution.analyzed
    val resolvedOrder = childPlan match {
      case org.apache.spark.sql.catalyst.plans.logical.Sort(ord, false, _, _) => ord
      case other => throw new IllegalStateException(
        s"expected a local Sort at the top of the numbering child, got:\n$other")
    }
    val rankAttr = AttributeReference(outputCol, LongType, nullable = false)()
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession],
      GlobalRowNumber(rankAttr, resolvedOrder, childPlan))
  }
}
