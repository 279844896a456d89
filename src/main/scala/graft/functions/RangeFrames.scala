package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed RANGE value-offset frames — `agg(v) OVER (ORDER BY k
  * RANGE BETWEEN lo PRECEDING AND hi FOLLOWING)`, the one window shape
  * [[org.apache.spark.sql.graftplans.RewriteGlobalWindows]] deliberately
  * leaves to stock Spark (its row-at-a-time operators cannot scan by
  * VALUE distance), and stock Spark funnels through a single
  * partition's sort when there is no PARTITION BY.
  *
  * The scalable re-expression rests on two facts:
  *
  *  1. RANGE frames are PEER-IDENTICAL: every row with the same order
  *     key has the same frame, so the answer is a function of the key
  *     value alone — compute per DISTINCT key, then equi-join back.
  *  2. sum/count over a value band `[k-lo, k+hi]` are PREFIX
  *     DIFFERENCES: `F(<= k+hi) - F(< k-lo)` where F is the running
  *     prefix over distinct keys.
  *
  * So the pipeline is: per-key aggregate → global running prefix sums
  * (a partition-less ROWS window — distributed by RewriteGlobalWindows
  * into `GlobalRunningSum`) → two prefix probes per key resolved by the
  * as-of union trick (probe rows at `k+hi` / `k-lo` interleaved with
  * the prefix rows, `last_value IGNORE NULLS` running window — again
  * partition-less, distributed as `GlobalFirstValue`) → equi-join back
  * to the input rows. Every stage is a shuffle-parallel plan; driver
  * state stays at the operators' per-partition scalars. Min/max are NOT
  * prefix-invertible and stay out of scope here.
  *
  * Ordering inside the probe scan is total and deterministic: up-probes
  * sit at side +1 (AFTER the prefix row of an equal key — inclusive
  * upper bound), down-probes at side -1 (BEFORE it — exclusive lower
  * bound), and within a side probe positions are distinct because the
  * offsets are constant.
  *
  * Semantics match SQL exactly, including the edges: an EMPTY frame
  * (shifted bounds, or no keys in the band) yields count 0 / sum NULL,
  * and a frame whose values are all NULL yields sum NULL via the
  * non-null-count channel. Order keys must be NON-NULL (SQL gives the
  * null peer group its own all-nulls frame; filter or bucket nulls
  * before calling). `lo`/`hi` are signed magnitudes: the frame is
  * `[k - lo, k + hi]` — `lo = 10, hi = -2` is the fully-shifted
  * `10 PRECEDING AND 2 PRECEDING`.
  */
object RangeFrames {

  /** Appends `outCnt` = `count(*) OVER (ORDER BY keyCol RANGE BETWEEN
    * lo PRECEDING AND hi FOLLOWING)` and `outSum` = `sum(valCol) OVER
    * (same frame)` to `df`. `keyCol` must be integral (LONG-compatible)
    * and non-null; see class doc for the plan shape. */
  def sumCountOverRange(df: DataFrame, keyCol: String, valCol: String,
      lo: Long, hi: Long, outCnt: String, outSum: String): DataFrame = {
    require(!df.columns.exists(_.startsWith("__rf_")), "__rf_ columns are reserved")
    val run = "OVER (ORDER BY __rf_pos, __rf_side ROWS BETWEEN UNBOUNDED" +
      " PRECEDING AND CURRENT ROW)"

    // per-distinct-key aggregates: rows, non-null values, value sum
    val perKey = df.groupBy(col(keyCol).as("__rf_k")).agg(
      count(lit(1)).as("__rf_cnt"),
      count(col(valCol)).as("__rf_nn"),
      sum(col(valCol)).as("__rf_s"))

    // global prefix sums over keys — partition-less ROWS windows,
    // distributed (stacked over ONE range shuffle) by the rewrite
    val prefix = perKey.selectExpr("__rf_k",
      "CAST(sum(__rf_cnt) OVER (ORDER BY __rf_k ROWS BETWEEN UNBOUNDED" +
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS __rf_cc",
      "CAST(sum(__rf_nn) OVER (ORDER BY __rf_k ROWS BETWEEN UNBOUNDED" +
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS __rf_cn",
      "sum(__rf_s) OVER (ORDER BY __rf_k ROWS BETWEEN UNBOUNDED" +
        " PRECEDING AND CURRENT ROW) AS __rf_cs")
    val sType = prefix.schema("__rf_cs").dataType.sql

    val base = prefix.selectExpr("__rf_k AS __rf_pos", "0 AS __rf_side",
      "CAST(NULL AS BIGINT) AS __rf_probe", "__rf_cc", "__rf_cn", "__rf_cs")
    def probe(side: Int, off: Long) = perKey.selectExpr(
      s"__rf_k + ${off}L AS __rf_pos", s"$side AS __rf_side",
      "__rf_k AS __rf_probe", "CAST(NULL AS BIGINT) AS __rf_cc",
      "CAST(NULL AS BIGINT) AS __rf_cn", s"CAST(NULL AS $sType) AS __rf_cs")

    // as-of scan: each probe picks up the prefix at its position —
    // last_value IGNORE NULLS running, partition-less, distributed
    val scanned = base
      .unionByName(probe(1, hi)).unionByName(probe(-1, -lo))
      .selectExpr("__rf_probe", "__rf_side",
        s"last_value(__rf_cc, true) $run AS __rf_got_cc",
        s"last_value(__rf_cn, true) $run AS __rf_got_cn",
        s"last_value(__rf_cs, true) $run AS __rf_got_cs")
      .filter(col("__rf_side") =!= 0)

    // fold each key's two probes into the band aggregates
    def side(s: Int, c: String) = max(when(col("__rf_side") === s, col(c)))
    val bands = scanned.groupBy(col("__rf_probe").as("__rf_k")).agg(
      (coalesce(side(1, "__rf_got_cc"), lit(0L)) -
        coalesce(side(-1, "__rf_got_cc"), lit(0L))).as("__rf_band_cnt"),
      when(coalesce(side(1, "__rf_got_cn"), lit(0L)) -
          coalesce(side(-1, "__rf_got_cn"), lit(0L)) === 0L, lit(null))
        .otherwise(coalesce(side(1, "__rf_got_cs"), lit(0L)) -
          coalesce(side(-1, "__rf_got_cs"), lit(0L))).as("__rf_band_sum"))

    df.join(bands, col(keyCol) === col("__rf_k"))
      .withColumn(outCnt, col("__rf_band_cnt"))
      .withColumn(outSum, col("__rf_band_sum"))
      .drop("__rf_k", "__rf_band_cnt", "__rf_band_sum")
  }
}
