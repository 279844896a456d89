package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftplans.GlobalRowNumber

/** Scale-shaped global row numbering. A plain
  * `row_number() OVER (ORDER BY …)` (q04's oracle semantics) funnels
  * the whole dataset through ONE partition's sort — fine at bench
  * scale, serial at 100 TB. This operator computes the identical
  * numbering in the canonical distributed two-pass shape:
  *
  *  1. `repartitionByRange` on the order keys (sampled range bounds —
  *     one pass) + `sortWithinPartitions`: globally sorted across
  *     partitions, each partition sorted within, no global funnel.
  *  2. A per-partition count job over the SAME materialized shuffle,
  *     prefix-summed into offsets on the driver; each partition then
  *     numbers its rows locally with its offset added — no second
  *     shuffle, no driver data movement, no GenericRow boxing (the
  *     numbering pass appends the rank with a codegen'd
  *     UnsafeProjection inside [[GlobalRowNumber]]'s physical plan).
  *
  * Both passes observing ONE sampled range partitioning is the
  * correctness linchpin — see [[org.apache.spark.sql.graftplans.GlobalRowNumber]]
  * for why two DataFrame branches cannot guarantee it.
  *
  * Ties on the order keys get an arbitrary-but-valid order, exactly
  * like the window form. Opt-in next to the plain window: the window
  * stays the right call when a LIMIT/TopN bounds the result or the
  * input is already tiny; this is the shape for full-corpus ranking
  * (dedup winner ordering, corpus-wide sampling indices). */
object DistributedRank {

  /** Append `outputCol` = 1-based global row number under `orderBy`.
    * `numPartitions` defaults to the session's shuffle parallelism. */
  def withRowNumber(df: DataFrame, orderBy: Seq[Column], outputCol: String,
      numPartitions: Int = 0): DataFrame =
    GlobalRowNumber.withRowNumber(df, orderBy, outputCol, numPartitions)
}
