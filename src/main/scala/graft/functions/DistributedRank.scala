package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-shaped global row numbering. A plain
  * `row_number() OVER (ORDER BY …)` (q04's oracle semantics) funnels
  * the whole dataset through ONE partition's sort — fine at bench
  * scale, serial at 100 TB. This operator computes the identical
  * numbering in the canonical distributed two-pass shape:
  *
  *  1. `repartitionByRange` on the order keys (sampled range bounds —
  *     one pass) + `sortWithinPartitions`: globally sorted across
  *     partitions, each partition sorted within, no global funnel.
  *  2. `zipWithIndex`: one small count job over partition sizes to
  *     compute offsets, then each partition numbers its rows locally
  *     with its offset added — no shuffle, no driver data movement.
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
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(outputCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }
}
