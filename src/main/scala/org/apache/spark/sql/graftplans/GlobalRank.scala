// Lives under org.apache.spark.sql to reach private[sql]/private[spark]
// helpers — see GlobalRowNumber.scala.
package org.apache.spark.sql.graftplans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{ExternalAppendOnlyUnsafeRowArray, SparkPlan, SparkStrategy, UnaryExecNode}

/** Which member of the rank family [[GlobalRank]] computes. All five
  * are functions of quantities the two-pass decomposition knows
  * exactly: the global position of a row's tie-run start/end, the
  * global tie-run index, and the global row count N (the sum of the
  * pass-1 per-partition counts). */
sealed trait RankMode
object RankMode {
  /** rank(): 1 + rows strictly before the tie-run. */
  case object MinRank extends RankMode
  /** dense_rank(): 1-based global tie-run index. */
  case object Dense extends RankMode
  /** percent_rank(): (rank − 1) / (N − 1); 0.0 when N == 1. */
  case object Percent extends RankMode
  /** cume_dist(): (global position of the tie-run's LAST row) / N. */
  case object Cume extends RankMode
  /** ntile(b): bucket of the global row number (first N%b buckets get
    * ⌈N/b⌉ rows, the rest ⌊N/b⌋ — SQL NTILE semantics). */
  final case class Tile(buckets: Int) extends RankMode
}

/** Scale-shaped global rank family under a total order — the tie-aware
  * siblings of [[GlobalRowNumber]]: `rank()`, `dense_rank()`,
  * `percent_rank()`, `cume_dist()`, `ntile(b)`.
  *
  * Why the two-pass decomposition stays EXACT for rank functions:
  * Catalyst's RangePartitioning assigns every row with the same order
  * key to the same partition (getPartition is a pure function of the
  * key), so a tie-run can never straddle a partition boundary. That
  * makes every family member locally computable given the pass-1
  * scalars (per-partition row and tie-run counts — which also yield
  * the global N that percent_rank/cume_dist/ntile divide by):
  * rank(row) = (rows in earlier partitions) + (1-based position of the
  * row's tie-run start within its partition); dense_rank(row) =
  * (tie-runs in earlier partitions) + (1-based index of the row's
  * tie-run within its partition); percent_rank = (rank − 1)/(N − 1);
  * cume_dist = (global position of the tie-run END)/N; ntile(b) =
  * bucket of the global row number. Pass 2 re-walks the materialized
  * shuffle with the same codegen'd peer comparator and emits the
  * offset-added value. Peers are defined exactly as Spark's Window
  * defines them — the SortOrder comparator reports 0 — via a
  * LazilyGeneratedOrdering over the projected order keys (narrow key
  * rows are copied at run boundaries, never the full payload).
  *
  * cume_dist needs the tie-run's END, which is only known once the run
  * closes — so its pass 2 buffers ONE tie-run at a time in a
  * spill-safe ExternalAppendOnlyUnsafeRowArray (the same structure
  * Spark's WindowExec uses — but WindowExec buffers the whole
  * partition, which for a global window is the whole dataset; a single
  * run of order-key peers is the minimal possible buffer). */
case class GlobalRank(rankAttr: AttributeReference, order: Seq[SortOrder],
    mode: RankMode, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRank =
    copy(child = newChild)
}

object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalRank =>
      GlobalRankExec(g.rankAttr, g.order, g.mode, planLater(g.child)) :: Nil
    case _ => Nil
  }
}

case class GlobalRankExec(rankAttr: AttributeReference, order: Seq[SortOrder],
    mode: RankMode, child: SparkPlan) extends UnaryExecNode {

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
    val n = rowOffsets.last - 1 // global row count, known after pass 1
    val m = mode
    val inMemThreshold = conf.windowExecBufferInMemoryThreshold
    val spillThreshold = conf.windowExecBufferSpillThreshold
    val spillSizeThreshold = conf.windowExecBufferSpillSizeThreshold
    rdd.mapPartitionsWithIndexInternal { (pid, it) =>
      val keyProj = UnsafeProjection.create(orderExprs, childAttrs)
      val cmp = new LazilyGeneratedOrdering(ko)
      val proj = UnsafeProjection.create(
        (childAttrs :+ rankAttr).zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        })
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      m match {
        case RankMode.Tile(buckets) =>
          // pure function of the global row number and N — no peer
          // comparator needed. First (N % b) buckets get ⌈N/b⌉ rows.
          val b = buckets.toLong
          val size = n / b
          val padded = n % b
          val threshold = (size + 1) * padded
          var localPos = 0L
          it.map { row =>
            localPos += 1
            val rn = rowOffsets(pid) + localPos - 1
            val bucket =
              if (rn <= threshold) (rn - 1) / (size + 1) + 1
              else padded + (rn - threshold - 1) / math.max(size, 1L) + 1
            rankRow.setLong(0, bucket)
            proj(joined(row, rankRow))
          }
        case RankMode.Cume =>
          // the run END is known only once the run closes: buffer one
          // tie-run at a time (spill-safe), then emit it with
          // (global run-end position) / N.
          val toUnsafe = UnsafeProjection.create(childAttrs, childAttrs)
          new Iterator[InternalRow] {
            // same ctor shape WindowEvaluatorFactory uses: the spill
            // size threshold serves as both byte caps
            private val buf = new ExternalAppendOnlyUnsafeRowArray(
              inMemThreshold, spillSizeThreshold, spillThreshold,
              spillSizeThreshold)
            private var pending: UnsafeRow = null
            private var pendingKey: UnsafeRow = null
            private var emitted = 0L // rows in fully-closed runs so far
            private var outIter: Iterator[InternalRow] = Iterator.empty
            override def hasNext: Boolean =
              outIter.hasNext || pending != null || it.hasNext
            override def next(): InternalRow = {
              if (!outIter.hasNext) fillRun()
              outIter.next()
            }
            private def fillRun(): Unit = {
              buf.clear()
              var runKey: UnsafeRow = null
              if (pending != null) {
                buf.add(pending)
                runKey = pendingKey
                pending = null
                pendingKey = null
              } else {
                val row = toUnsafe(it.next())
                runKey = keyProj(row).copy().asInstanceOf[UnsafeRow]
                buf.add(row)
              }
              var closed = false
              while (!closed && it.hasNext) {
                val row = toUnsafe(it.next())
                val key = keyProj(row)
                if (cmp.compare(runKey, key) == 0) buf.add(row)
                else {
                  pending = row.copy()
                  pendingKey = key.copy().asInstanceOf[UnsafeRow]
                  closed = true
                }
              }
              emitted += buf.length
              val runEndGlobal = rowOffsets(pid) + emitted - 1
              rankRow.setDouble(0, runEndGlobal.toDouble / n)
              outIter = buf.generateIterator().map(r => proj(joined(r, rankRow)))
            }
          }
        case _ =>
          // rank / dense_rank / percent_rank: a single forward walk.
          var localPos = 0L  // 1-based row position within the partition
          var runStart = 0L  // localPos of the current tie-run's first row
          var localRuns = 0L // tie-runs seen so far in the partition
          var prevKey: InternalRow = null
          it.map { row =>
            val key = keyProj(row)
            localPos += 1
            if (prevKey == null || cmp.compare(prevKey, key) != 0) {
              runStart = localPos
              localRuns += 1
              prevKey = key.copy()
            }
            m match {
              case RankMode.Dense =>
                rankRow.setLong(0, denseOffsets(pid) + localRuns - 1)
              case RankMode.Percent =>
                val rank = rowOffsets(pid) + runStart - 1
                rankRow.setDouble(0,
                  if (n > 1) (rank - 1).toDouble / (n - 1) else 0.0d)
              case _ =>
                rankRow.setLong(0, rowOffsets(pid) + runStart - 1)
            }
            proj(joined(row, rankRow))
          }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRankExec =
    copy(child = newChild)
}
