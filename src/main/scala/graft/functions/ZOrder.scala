package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftexprs.ZValue

/** Z-order (Morton-curve) clustering — the multi-column physical-layout
  * tool. A table sorted by one column serves zone-map skipping for
  * filters on THAT column only; at 100 TB a corpus is filtered along
  * several axes (date AND customer, lang AND length). Interleaving the
  * quantile-bucket bits of k columns and range-partitioning + sorting by
  * the interleaved value keeps every row group narrow in ALL k
  * dimensions at once, so the fls scan's zone maps
  * ([[graft.fls.connector.FlsZoneMap]]) skip row groups for a selective
  * filter on any clustered column.
  *
  * Shape at scale: one sampled quantile pass (`approxQuantile`, all
  * columns in a single job) + one range shuffle + per-task sort — the
  * same cost as a global sort, paid once at layout time. Compose with
  * the fls writer as `ZOrder.cluster(df, cols).write.format("fls")` (no
  * layout options — the write must NOT re-shuffle what this laid out;
  * alternatively `cluster_by` gives single-column range clustering
  * directly in the writer, see [[graft.fls.connector.FlsWriteLayout]]).
  */
object ZOrder {

  /** The interleaved Z-value column itself (for callers composing their
    * own layout). `cutsPerCol` must be strictly increasing per column. */
  def zvalue(cols: Seq[Column], cutsPerCol: Seq[Array[Double]]): Column =
    ZValue.column(cols, cutsPerCol)

  /** Re-layout `df` in Z-order over `cols`. Numeric/date/timestamp
    * dimensions quantile-bucket on their value order (range AND point
    * filters skip); string/binary dimensions bucket on `xxhash64` —
    * hashing has no range order, but all rows of one categorical value
    * land in one curve region, so EQUALITY filters skip through the
    * byte-prefix string zone maps (the lang-of-a-corpus case).
    * `buckets` is the per-dimension quantile resolution;
    * `dims * ceil(log2(buckets))` must fit 63 bits (1024 buckets
    * supports up to 5 columns). `numPartitions` defaults to the session
    * shuffle parallelism — at cluster scale pass
    * `tableBytes / targetFileBytes`. */
  def cluster(df: DataFrame, cols: Seq[String], buckets: Int = 1024,
      numPartitions: Int = 0): DataFrame = {
    require(cols.size >= 2, "zorder: need at least 2 columns (use cluster_by/sort_by for 1)")
    require(buckets >= 2, s"zorder: buckets must be >= 2, got $buckets")
    import org.apache.spark.sql.types.{StringType, BinaryType}
    val schema = df.schema
    val dims: Seq[Column] = cols.map { c =>
      schema(c).dataType match {
        case StringType | BinaryType => org.apache.spark.sql.functions.xxhash64(col(c))
        case _ => col(c)
      }
    }
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val castNames = cols.map(c => s"__zq_$c")
    val casted = df.select(dims.zip(castNames).map { case (d, n) =>
      d.cast("double").as(n)
    }: _*)
    // one sampled pass computes every column's cuts; duplicate cuts
    // (low-cardinality columns) collapse so the bit width stays honest
    val cuts = casted.stat.approxQuantile(castNames.toArray, probs, 0.001)
      .map(a => a.filter(d => !d.isNaN).distinct.sorted)
    val z = zvalue(dims, cuts.toSeq)
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("__zval", z)
      .repartitionByRange(n, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
  }
}
