package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftplans.GlobalRunningSum

/** Scale-shaped global prefix sum. A plain
  * `SUM(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)` funnels the
  * whole dataset through ONE partition's sort — fine at bench scale,
  * serial at 100 TB. This computes the identical inclusive cumulative
  * sum in the canonical distributed two-pass shape (range partition +
  * per-partition sums + driver prefix of the partition sums), the
  * running-aggregate sibling of [[DistributedRank]] — see
  * [[org.apache.spark.sql.graftplans.GlobalRunningSum]] for the
  * single-shuffle correctness argument.
  *
  * The canonical pipeline use: sequence packing — cumulative token
  * counts under a stable document order assign every document to its
  * training-sequence bin without any single-node pass. */
object DistributedPrefixSum {

  /** Append `outputCol` = inclusive running sum of `valueCol` (non-null
    * LONG) under `orderBy`. `numPartitions` defaults to the session's
    * shuffle parallelism. */
  def withRunningSum(df: DataFrame, orderBy: Seq[Column], valueCol: String,
      outputCol: String, numPartitions: Int = 0): DataFrame =
    GlobalRunningSum.withRunningSum(df, orderBy, valueCol, outputCol, numPartitions)
}
