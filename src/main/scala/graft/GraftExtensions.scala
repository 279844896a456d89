package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graftexprs.{ArrayDotProduct, SortedIntersectCount}
import org.apache.spark.sql.graftplans.{GlobalFirstValueStrategy, GlobalOffsetStrategy, GlobalRankStrategy, GlobalRowNumberStrategy, GlobalRunningSumStrategy, GlobalSlidingStrategy, RewriteGlobalWindows, RewriteIntervalAggJoins, RewriteRangeFrames, RewriteRangeJoins}

/** Library-grade session wiring:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * registers, once per session, everything the library otherwise
  * attaches lazily at first use:
  *
  *  - the whole-operator planning strategies (GlobalRowNumber /
  *    GlobalRunningSum — [[graft.functions.DistributedRank]] and
  *    [[graft.functions.DistributedPrefixSum]] still self-register via
  *    `spark.experimental` for extension-less sessions, so both paths
  *    work);
  *  - the [[org.apache.spark.sql.graftplans.RewriteGlobalWindows]]
  *    optimizer rule, which turns plain SQL partition-less
  *    `row_number()` / running `sum()` windows into those distributed
  *    plans — extension sessions get the scale shape without calling
  *    the Scala entry points;
  *  - the native codegen expressions as SQL functions —
  *    `graft_array_dot(a, b)` and `graft_sorted_intersect_count(a, b)`
  *    — callable from `spark.sql` without touching the Scala API.
  *
  * (The fls source needs no registration: DataSource V2 resolves
  * `format("fls")` through the service loader.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => GlobalRowNumberStrategy)
    ext.injectPlannerStrategy(_ => GlobalRunningSumStrategy)
    ext.injectPlannerStrategy(_ => GlobalRankStrategy)
    ext.injectPlannerStrategy(_ => GlobalOffsetStrategy)
    ext.injectPlannerStrategy(_ => GlobalSlidingStrategy)
    ext.injectPlannerStrategy(_ => GlobalFirstValueStrategy)
    // engine-level rewrite: plain SQL partition-less row_number /
    // running-long-sum windows get the distributed two-pass plans
    // instead of a single-partition Window (see RewriteGlobalWindows
    // for the deliberate non-firing cases)
    ext.injectOptimizerRule(_ => RewriteGlobalWindows)
    // count/sum aggregates DIRECTLY over a fixed-offset interval join
    // lower to the pair-free sweep-line pipeline — injected BEFORE the
    // join rule so the aggregate shape is matched while the overlap
    // join is still recognizable (once it fires there is no band join
    // left for the sibling to bucket)
    ext.injectOptimizerRule(_ => RewriteIntervalAggJoins)
    // inequality-only inner joins (point-in-interval / band) get a
    // bucketed equi-join instead of BroadcastNestedLoop/Cartesian —
    // see RewriteRangeJoins for the width subquery and firing rules
    ext.injectOptimizerRule(_ => RewriteRangeJoins)
    // partition-less RANGE value-offset frames lower to the prefix-
    // difference composition, whose internal windows the window rule
    // distributes in the same fixed-point batch
    ext.injectOptimizerRule(_ => RewriteRangeFrames)
    ext.injectFunction((
      new FunctionIdentifier("graft_array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_array_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "graft_array_dot(a, b) takes two arrays")
        ArrayDotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2,
          "graft_sorted_intersect_count(a, b) takes two sorted string arrays")
        SortedIntersectCount(args(0), args(1))
      }))
  }
}
