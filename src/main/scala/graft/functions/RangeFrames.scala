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

  /** Overflow guard on the table-wide prefix sums (`__rf_cs`): a
    * DECIMAL(38,s) running sum that overflows is NULLed by Spark's
    * non-ANSI sum, and the downstream `last_value(__rf_cs, true)`
    * (ignore-nulls) would then silently pick an EARLIER non-null
    * prefix — a wrong band sum instead of a loud failure. A prefix row
    * can be legitimately NULL only while its running NON-NULL COUNT
    * (`__rf_cn`) is zero, so any (NULL sum, positive count) prefix is
    * overflow by construction → raise. Evaluated inline on each prefix
    * row during the probe scan: no extra pass, codegen-friendly, and
    * long-sum channels (which wrap rather than NULL) never trip it. */
  private def guardedPrefix(sType: String): String =
    "CASE WHEN __rf_cs IS NULL AND __rf_cn > 0 THEN " +
      s"CAST(raise_error('RangeFrames: table-wide prefix sum overflowed " +
      s"its decimal precision; band sums would be silently wrong — " +
      s"widen the value type or pre-scale the column') AS $sType) " +
      "ELSE __rf_cs END AS __rf_cs"

  /** Same class one level down: a PER-KEY decimal sum that overflows is
    * NULLed, and the table-wide prefix sum would then silently SKIP that
    * key's contribution (sum ignores nulls) — the prefix stays non-null
    * and [[guardedPrefix]] never sees it. NULL per-key sum with a
    * positive per-key non-null count is overflow by construction. */
  private def guardPerKeySum(perKey: DataFrame): DataFrame = {
    val st = perKey.schema("__rf_s").dataType.sql
    perKey.withColumn("__rf_s", expr(
      "CASE WHEN __rf_s IS NULL AND __rf_nn > 0 THEN " +
        s"CAST(raise_error('RangeFrames: a per-key sum overflowed its " +
        s"decimal precision; its contribution would be silently dropped " +
        s"from the prefix sums') AS $st) ELSE __rf_s END"))
  }

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
    val prefix = guardPerKeySum(perKey).selectExpr("__rf_k",
      "CAST(sum(__rf_cnt) OVER (ORDER BY __rf_k ROWS BETWEEN UNBOUNDED" +
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS __rf_cc",
      "CAST(sum(__rf_nn) OVER (ORDER BY __rf_k ROWS BETWEEN UNBOUNDED" +
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS __rf_cn",
      "sum(__rf_s) OVER (ORDER BY __rf_k ROWS BETWEEN UNBOUNDED" +
        " PRECEDING AND CURRENT ROW) AS __rf_cs")
    val sType = prefix.schema("__rf_cs").dataType.sql

    val base = prefix.selectExpr("__rf_k AS __rf_pos", "0 AS __rf_side",
      "CAST(NULL AS BIGINT) AS __rf_probe", "__rf_cc", "__rf_cn",
      guardedPrefix(sType))
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

  /** Count/sum of `carriers.valCol` over the CLOSED value band
    * `[p - lo, p + hi]` around each `probes.probeKey` value p — the
    * interval-overlap JOIN + AGGREGATE shape computed as a sweep line,
    * WITHOUT materializing the pair stream.
    *
    * Fixed-width interval overlap reduces to exactly this: intervals
    * `[s, s+ds]` vs `[e, e+de]` overlap iff `e ∈ [s - de, s + ds]`, so
    * "count/sum the errors overlapping each signup window" is a band
    * aggregate of error START points around each signup start. A
    * bucketed overlap JOIN (q87/q88) must materialize every qualifying
    * pair before the aggregate — and REPLICATED scale fixtures grow
    * pairs ~density², which the r19 sweep's JFR pinned as the entire
    * q87 marathon. This plan's cost is O(n log n) in the inputs
    * (per-key aggregate → global prefix sums → two probes per distinct
    * probe key → equi-join back): pair count never appears.
    *
    * Same prefix-difference construction as [[sumCountOverRange]]
    * (closed band via probe sides; empty band = count 0 / sum NULL);
    * decimal `valCol` sums stay EXACT, so prefix differences are
    * bit-identical to a direct per-pair sum. Keys must be integral
    * (LONG-compatible) and non-null. */
  def bandAggregateAgainst(probes: DataFrame, probeKey: String,
      carriers: DataFrame, carrierKey: String, valCol: String,
      lo: Long, hi: Long, outCnt: String, outSum: String): DataFrame = {
    require(!probes.columns.exists(_.startsWith("__rf_")),
      "__rf_ columns are reserved")
    val run = "OVER (ORDER BY __rf_pos, __rf_side ROWS BETWEEN UNBOUNDED" +
      " PRECEDING AND CURRENT ROW)"

    val perKey = carriers.groupBy(col(carrierKey).as("__rf_k")).agg(
      count(lit(1)).as("__rf_cnt"),
      count(col(valCol)).as("__rf_nn"),
      sum(col(valCol)).as("__rf_s"))
    val perProbe = probes.select(col(probeKey).as("__rf_p")).distinct()

    val prefix = guardPerKeySum(perKey).selectExpr("__rf_k",
      "CAST(sum(__rf_cnt) OVER (ORDER BY __rf_k ROWS BETWEEN UNBOUNDED" +
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS __rf_cc",
      "CAST(sum(__rf_nn) OVER (ORDER BY __rf_k ROWS BETWEEN UNBOUNDED" +
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS __rf_cn",
      "sum(__rf_s) OVER (ORDER BY __rf_k ROWS BETWEEN UNBOUNDED" +
        " PRECEDING AND CURRENT ROW) AS __rf_cs")
    val sType = prefix.schema("__rf_cs").dataType.sql

    val base = prefix.selectExpr("__rf_k AS __rf_pos", "0 AS __rf_side",
      "CAST(NULL AS BIGINT) AS __rf_probe", "__rf_cc", "__rf_cn",
      guardedPrefix(sType))
    def probe(side: Int, off: Long) = perProbe.selectExpr(
      s"__rf_p + ${off}L AS __rf_pos", s"$side AS __rf_side",
      "__rf_p AS __rf_probe", "CAST(NULL AS BIGINT) AS __rf_cc",
      "CAST(NULL AS BIGINT) AS __rf_cn", s"CAST(NULL AS $sType) AS __rf_cs")

    val scanned = base
      .unionByName(probe(1, hi)).unionByName(probe(-1, -lo))
      .selectExpr("__rf_probe", "__rf_side",
        s"last_value(__rf_cc, true) $run AS __rf_got_cc",
        s"last_value(__rf_cn, true) $run AS __rf_got_cn",
        s"last_value(__rf_cs, true) $run AS __rf_got_cs")
      .filter(col("__rf_side") =!= 0)

    def side(s: Int, c: String) = max(when(col("__rf_side") === s, col(c)))
    val bands = scanned.groupBy(col("__rf_probe").as("__rf_k")).agg(
      (coalesce(side(1, "__rf_got_cc"), lit(0L)) -
        coalesce(side(-1, "__rf_got_cc"), lit(0L))).as("__rf_band_cnt"),
      when(coalesce(side(1, "__rf_got_cn"), lit(0L)) -
          coalesce(side(-1, "__rf_got_cn"), lit(0L)) === 0L, lit(null))
        .otherwise(coalesce(side(1, "__rf_got_cs"), lit(0L)) -
          coalesce(side(-1, "__rf_got_cs"), lit(0L))).as("__rf_band_sum"))

    probes.join(bands, col(probeKey) === col("__rf_k"))
      .withColumn(outCnt, col("__rf_band_cnt"))
      .withColumn(outSum, col("__rf_band_sum"))
      .drop("__rf_k", "__rf_band_cnt", "__rf_band_sum")
  }

  /** Appends `outMin`/`outMax` = `min(v)/max(v) OVER (ORDER BY keyCol
    * RANGE BETWEEN lo PRECEDING AND hi FOLLOWING)` to `df`. Min/max are
    * NOT prefix-invertible, so [[sumCountOverRange]]'s prefix-difference
    * trick does not apply; this uses the aligned-block sliding-extrema
    * decomposition instead, built entirely from NATIVE partitioned
    * windows (hash-distributed by Spark itself, no custom operators):
    *
    * Every band `[k-lo, k+hi]` has the same VALUE width `W = lo+hi+1`,
    * so partition the value axis into blocks of width W aligned at
    * multiples of W. A band then spans at most TWO blocks — a suffix
    * of `block(k-lo)` and a prefix of `block(k+hi)` — and per-block
    * running prefix/suffix extrema (two `PARTITION BY block` window
    * frames over the per-distinct-key table) answer both halves:
    *
    *  - suffix half: the suffix-min of the SMALLEST key `>= k-lo` in
    *    its block (every such key is inside the band: if the band
    *    spans two blocks the block's tail ends before `k+hi`; if one
    *    block, the band IS the block);
    *  - prefix half: the prefix-min of the LARGEST key `<= k+hi` in
    *    its block — emitted only when the two blocks differ;
    *  - band extremum = least/greatest of the halves (null-skipping,
    *    so an empty band yields NULL — the SQL empty-frame semantics —
    *    and all-null values propagate NULL through the per-key min).
    *
    * The two lookups are per-block as-of scans (union the probe rows
    * into the block, `last_value IGNORE NULLS` over a DESC scan for
    * the suffix half, ASC for the prefix half) — again native
    * partitioned windows. Total cost: one hash-agg over the input +
    * a handful of shuffles of the per-distinct-key table; no stage
    * sees more than one block per partition-task unless a single
    * W-wide slice of the value axis holds a large share of all
    * distinct keys — and in that regime every band covers most of the
    * domain, so the OUTPUT itself is near-global. `keyCol` must be
    * integral and non-null (null-key rows drop from the output — same
    * contract as [[sumCountOverRange]]); `valCol` may be any orderable
    * type. `lo`/`hi` are signed magnitudes exactly as in
    * [[sumCountOverRange]]; a frame with `lo + hi < 0` is empty for
    * every row and short-circuits to NULL columns. */
  def minMaxOverRange(df: DataFrame, keyCol: String, valCol: String,
      lo: Long, hi: Long, outMin: String, outMax: String): DataFrame = {
    require(!df.columns.exists(_.startsWith("__rmm_")), "__rmm_ columns are reserved")
    val vt = df.schema(valCol).dataType
    if (lo + hi < 0) {
      return df.withColumn(outMin, lit(null).cast(vt))
        .withColumn(outMax, lit(null).cast(vt))
    }
    val w = lo + hi + 1
    def fd(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graftexprs.GraftFunctions.floorDiv(c, w)

    val perKey = df
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("bigint").as("__rmm_k"))
      .agg(min(col(valCol)).as("__rmm_mn"), max(col(valCol)).as("__rmm_mx"))
      .withColumn("__rmm_blk", fd(col("__rmm_k")))

    // per-block prefix/suffix extrema — one shuffle+sort, two frames
    val blkWin = "OVER (PARTITION BY __rmm_blk ORDER BY __rmm_k ROWS BETWEEN"
    val withPS = perKey.selectExpr("__rmm_k", "__rmm_blk",
      s"min(__rmm_mn) $blkWin UNBOUNDED PRECEDING AND CURRENT ROW) AS __rmm_pmn",
      s"max(__rmm_mx) $blkWin UNBOUNDED PRECEDING AND CURRENT ROW) AS __rmm_pmx",
      s"min(__rmm_mn) $blkWin CURRENT ROW AND UNBOUNDED FOLLOWING) AS __rmm_smn",
      s"max(__rmm_mx) $blkWin CURRENT ROW AND UNBOUNDED FOLLOWING) AS __rmm_smx")

    def base(v1: String, v2: String) = withPS.selectExpr(
      "__rmm_blk AS __rmm_b", "__rmm_k AS __rmm_pos", "0 AS __rmm_side",
      "CAST(NULL AS BIGINT) AS __rmm_probe",
      s"$v1 AS __rmm_v1", s"$v2 AS __rmm_v2")
    def probe(off: Long, filterTwoBlocks: Boolean) = {
      val p0 = perKey.select(col("__rmm_k"),
        (col("__rmm_k") + lit(off)).as("__rmm_pos"))
      val p1 = if (filterTwoBlocks)
        p0.filter(fd(col("__rmm_k") + hi) =!= fd(col("__rmm_k") - lo)) else p0
      p1.select(fd(col("__rmm_pos")).as("__rmm_b"), col("__rmm_pos"),
        lit(1).as("__rmm_side"), col("__rmm_k").as("__rmm_probe"),
        lit(null).cast(vt).as("__rmm_v1"), lit(null).cast(vt).as("__rmm_v2"))
    }
    def asof(rows: DataFrame, desc: Boolean): DataFrame = {
      val dir = if (desc) "DESC" else "ASC"
      rows.selectExpr("__rmm_probe",
        s"last_value(__rmm_v1, true) OVER (PARTITION BY __rmm_b ORDER BY" +
          s" __rmm_pos $dir, __rmm_side ROWS BETWEEN UNBOUNDED PRECEDING" +
          s" AND CURRENT ROW) AS __rmm_g1",
        s"last_value(__rmm_v2, true) OVER (PARTITION BY __rmm_b ORDER BY" +
          s" __rmm_pos $dir, __rmm_side ROWS BETWEEN UNBOUNDED PRECEDING" +
          s" AND CURRENT ROW) AS __rmm_g2")
        .filter(col("__rmm_probe").isNotNull)
    }

    // suffix half at k-lo (DESC scan: the last non-null seen at the
    // probe is the suffix extremum of the smallest in-block key >= k-lo;
    // base rows sort before an equal-position probe, so an exact-match
    // key is visible — inclusive lower bound)
    val sufHalf = asof(
      base("__rmm_smn", "__rmm_smx").unionByName(
        probe(-lo, filterTwoBlocks = false)),
      desc = true)
    // prefix half at k+hi (ASC scan; only when the band spans 2 blocks)
    val prefHalf = asof(
      base("__rmm_pmn", "__rmm_pmx").unionByName(
        probe(hi, filterTwoBlocks = true)),
      desc = false)

    val bands = sufHalf.unionByName(prefHalf)
      .groupBy(col("__rmm_probe").as("__rmm_k2"))
      .agg(min("__rmm_g1").as("__rmm_band_mn"), max("__rmm_g2").as("__rmm_band_mx"))

    df.join(bands, col(keyCol).cast("bigint") === col("__rmm_k2"))
      .withColumn(outMin, col("__rmm_band_mn"))
      .withColumn(outMax, col("__rmm_band_mx"))
      .drop("__rmm_k2", "__rmm_band_mn", "__rmm_band_mx")
  }
}
