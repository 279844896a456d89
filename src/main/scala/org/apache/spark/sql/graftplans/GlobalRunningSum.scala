// Lives under org.apache.spark.sql to reach private[sql]/private[spark]
// helpers (classic.Dataset.ofRows, RDD.mapPartitionsWithIndexInternal) —
// see GlobalRowNumber.scala.
package org.apache.spark.sql.graftplans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BoundReference, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.{ExternalAppendOnlyUnsafeRowArray, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Which associative combine the running operator applies. SQL's
  * running MIN/MAX over a ROWS UNBOUNDED PRECEDING frame share the sum
  * operator's whole two-pass structure — only the combine and its
  * identity differ (min: Long.MaxValue, max: Long.MinValue; both are
  * true identities, so empty partitions combine neutrally). */
sealed trait RunningLongOp
object RunningLongOp {
  case object Add extends RunningLongOp
  case object Min extends RunningLongOp
  case object Max extends RunningLongOp
}

/** Scale-shaped global running (prefix) sum — or min/max — of a long
  * column under a total order — the cumulative aggregate a window
  * `SUM(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)` computes by
  * funneling everything through ONE partition's sort. Identical
  * two-pass discipline as [[GlobalRowNumber]], and the same reason it
  * must be a single physical operator: both passes have to observe the
  * one materialized range shuffle, or the two branches sample their own
  * range bounds and the running sum silently corrupts at partition
  * boundaries. Pass 1 combines the value per sorted range partition;
  * the driver prefix-combines those into per-partition starting
  * offsets; pass 2 emits offset-combined-with-running-within-partition
  * with a codegen'd projection (no GenericRow round-trip). */
case class GlobalRunningSum(valueAttr: Attribute, outAttr: AttributeReference,
    order: Seq[SortOrder], child: LogicalPlan,
    checked: Boolean = false,
    op: RunningLongOp = RunningLongOp.Add,
    peerAware: Boolean = false) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRunningSum =
    copy(child = newChild)
}

object GlobalRunningSumStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalRunningSum =>
      GlobalRunningSumExec(g.valueAttr, g.outAttr, g.order, planLater(g.child),
        g.checked, g.op, g.peerAware) :: Nil
    case _ => Nil
  }
}

case class GlobalRunningSumExec(valueAttr: Attribute, outAttr: AttributeReference,
    order: Seq[SortOrder], child: SparkPlan,
    checked: Boolean = false,
    op: RunningLongOp = RunningLongOp.Add,
    peerAware: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val vi = child.output.indexWhere(_.exprId == valueAttr.exprId)
    require(vi >= 0, s"value attribute $valueAttr not in child output")
    // Two null contracts, selected by the output attribute:
    //  - non-nullable out (the DistributedPrefixSum API): NULL values
    //    sum as 0 and every row gets a sum — the documented contract
    //    q68 builds on;
    //  - nullable out (the window rewrite): exact SQL semantics — the
    //    running sum is NULL until the first non-null value, because
    //    SUM over an all-null frame is NULL.
    val sqlNulls = outAttr.nullable
    // The nulls-as-0 non-nullable contract only makes sense for Add
    // (0 is "no contribution"); Min/Max have no such neutral VALUE, so
    // they require the SQL-null contract.
    require(op == RunningLongOp.Add || sqlNulls,
      s"running $op requires the SQL-null (nullable output) contract")
    // `checked` = ANSI long arithmetic: overflow must abort, never
    // wrap. The two-pass decomposition adds partition-LOCAL partial
    // sums, so a sign-alternating stream at Long extremes can trip the
    // check where a strictly sequential evaluation would not — that
    // pathological edge errs toward an error (ANSI's own direction),
    // never toward a wrong value. Unchecked (the legacy API contract)
    // wrapping addition is associative, so the decomposition is exact.
    // Min/Max can't overflow; their identities are true identities, so
    // empty partitions combine neutrally.
    val doAdd: (Long, Long) => Long = op match {
      case RunningLongOp.Add =>
        if (checked) Math.addExact else (a: Long, b: Long) => a + b
      case RunningLongOp.Min => math.min
      case RunningLongOp.Max => math.max
    }
    val identity: Long = op match {
      case RunningLongOp.Add => 0L
      case RunningLongOp.Min => Long.MaxValue
      case RunningLongOp.Max => Long.MinValue
    }
    val rdd = child.execute()
    // Pass 1 over the materialized shuffle: per-partition value sums,
    // plus whether the partition saw any non-null value.
    val parts = rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
      var s = identity
      var saw = false
      while (it.hasNext) {
        val row = it.next()
        if (!row.isNullAt(vi)) { s = doAdd(s, row.getLong(vi)); saw = true }
      }
      (s, saw)
    })
    // offsets(p) = sum of all values in partitions before p;
    // sawBefore(p) = any non-null value in partitions before p
    val offsets = parts.map(_._1).scanLeft(identity)(doAdd)
    val sawBefore = parts.map(_._2).scanLeft(false)(_ || _)
    val childAttrs = child.output
    if (!peerAware) {
      rdd.mapPartitionsWithIndexInternal { (pid, it) =>
        val proj = UnsafeProjection.create(
          (childAttrs :+ outAttr).zipWithIndex.map { case (a, i) =>
            BoundReference(i, a.dataType, a.nullable)
          })
        val joined = new JoinedRow
        val sumRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        var running = offsets(pid)
        var seen = !sqlNulls || sawBefore(pid)
        it.map { row =>
          if (!row.isNullAt(vi)) { running = doAdd(running, row.getLong(vi)); seen = true }
          if (seen) sumRow.setLong(0, running) // INCLUSIVE prefix sum
          else sumRow.setNullAt(0)
          proj(joined(row, sumRow))
        }
      }
    } else {
      // PEER-AWARE (RANGE UNBOUNDED PRECEDING .. CURRENT ROW): every
      // row's frame includes ALL its order-key peers, so a whole
      // tie-run shares one value — the running combine through the
      // run's END. Exact under the range shuffle for the same reason
      // the rank family is: equal keys land in one partition, so runs
      // never straddle and pass 1 is unchanged (run totals ARE
      // partition totals). Pass 2 buffers one tie-run at a time
      // (spill-safe, same machinery as GlobalRank's cume_dist — an
      // all-equal-keys input means one run IS the whole dataset) and
      // emits it after the run closes.
      val orderExprs = order.map(_.child)
      val ko = order.zipWithIndex.map { case (s, i) =>
        s.copy(child = BoundReference(i, s.child.dataType, s.child.nullable))
      }
      val inMemThreshold = conf.windowExecBufferInMemoryThreshold
      val spillThreshold = conf.windowExecBufferSpillThreshold
      val spillSizeThreshold = conf.windowExecBufferSpillSizeThreshold
      rdd.mapPartitionsWithIndexInternal { (pid, it0) =>
        val keyProj = UnsafeProjection.create(orderExprs, childAttrs)
        val cmp = new LazilyGeneratedOrdering(ko)
        val toUnsafe = UnsafeProjection.create(childAttrs, childAttrs)
        val proj = UnsafeProjection.create(
          (childAttrs :+ outAttr).zipWithIndex.map { case (a, i) =>
            BoundReference(i, a.dataType, a.nullable)
          })
        val joined = new JoinedRow
        val sumRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        new Iterator[InternalRow] {
          private val buf = new ExternalAppendOnlyUnsafeRowArray(
            inMemThreshold, spillSizeThreshold, spillThreshold,
            spillSizeThreshold)
          private var pending: UnsafeRow = null
          private var pendingKey: UnsafeRow = null
          private var running = offsets(pid)
          private var seen = !sqlNulls || sawBefore(pid)
          private var outIter: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean =
            outIter.hasNext || pending != null || it0.hasNext
          override def next(): InternalRow = {
            if (!outIter.hasNext) fillRun()
            outIter.next()
          }
          private def addToRun(row: UnsafeRow): Unit = {
            buf.add(row)
            if (!row.isNullAt(vi)) {
              running = doAdd(running, row.getLong(vi)); seen = true
            }
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
              val row = toUnsafe(it0.next())
              runKey = keyProj(row).copy().asInstanceOf[UnsafeRow]
              addToRun(row)
            }
            var closed = false
            while (!closed && it0.hasNext) {
              val row = toUnsafe(it0.next())
              val key = keyProj(row)
              if (cmp.compare(runKey, key) == 0) addToRun(row)
              else {
                pending = row.copy()
                pendingKey = key.copy().asInstanceOf[UnsafeRow]
                closed = true
              }
            }
            // the run is complete: every row in it sees the combine
            // through the run's end (inclusive peer semantics)
            if (seen) sumRow.setLong(0, running) else sumRow.setNullAt(0)
            outIter = buf.generateIterator().map(r => proj(joined(r, sumRow)))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRunningSumExec =
    copy(child = newChild)
}

object GlobalRunningSum {

  /** Append `outputCol` = inclusive global running sum of `valueCol`
    * (a non-null LONG column of `df`) under `orderBy`. */
  def withRunningSum(df: DataFrame, orderBy: Seq[Column], valueCol: String,
      outputCol: String, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    // check-then-append under a lock: two threads racing here on one
    // session would otherwise lose or duplicate the registration
    GraftStrategyRegistration.ensure(spark, GlobalRunningSumStrategy)
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, orderBy: _*).sortWithinPartitions(orderBy: _*)
    val childPlan = sorted.queryExecution.analyzed
    val resolvedOrder = childPlan match {
      case org.apache.spark.sql.catalyst.plans.logical.Sort(ord, false, _, _) => ord
      case other => throw new IllegalStateException(
        s"expected a local Sort at the top of the running-sum child, got:\n$other")
    }
    val valueAttr = childPlan.output.find(_.name == valueCol).getOrElse(
      throw new IllegalArgumentException(
        s"running-sum value column $valueCol not in ${childPlan.output.map(_.name)}"))
    require(valueAttr.dataType == LongType,
      s"running-sum value column $valueCol must be LONG, " +
        s"got ${valueAttr.dataType} (NULLs sum as 0, like SQL SUM)")
    val outAttr = AttributeReference(outputCol, LongType, nullable = false)()
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession],
      GlobalRunningSum(valueAttr, outAttr, resolvedOrder, childPlan))
  }
}
