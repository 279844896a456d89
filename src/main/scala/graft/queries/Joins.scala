package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.RangeJoin
import graft.util.Tables._

/** Range/interval joins — beyond-reference join shapes a pipeline needs
  * that Spark has no first-class operator for (the reference's host
  * engine ships IEJoin for them; SURVEY.md §2.B policy). The scalable
  * Spark re-expression lives in [[graft.functions.RangeJoin]]; these
  * queries oracle-gate it against DuckDB's native inequality join. */
object Joins {

  private val TenMinUs = 600L * 1000 * 1000

  /** q82: unkeyed point-in-interval join — purchases attributed to ANY
    * signup whose 10-minute window contains them (no user key on
    * purpose: with no equi-column this is exactly the shape stock
    * Spark plans as a BroadcastNestedLoopJoin / CartesianProduct,
    * O(|signups|·|purchases|)). [[RangeJoin.pointInInterval]] buckets
    * the time axis at the interval width, so the plan is an ordinary
    * equi-join on the bucket id with replication factor ~2 — linear in
    * the data, AQE-broadcastable, skew-splittable. Aggregated per
    * signup so the output is small and hash-stable. */
  def q82RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val raw = events(spark, dir)
    val ev = raw.select(col("event_id"), tsMicros(raw).as("ts_us"),
      col("event_type"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts_us").as("p_ts"),
        col("value").as("p_value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts_us").as("s_lo"),
        (col("ts_us") + TenMinUs).as("s_hi"))
    RangeJoin.pointInInterval(
      purchases, "p_ts", signups, "s_lo", "s_hi", bucketWidth = TenMinUs)
      .groupBy("signup_id")
      .agg(count(lit(1)).as("n_purch"), dbl(sum(d6w(col("p_value")))).as("sum_value"))
      .orderBy("signup_id")
  }

  val q82Sql: String = {
    import graft.util.Tables.{sql => S}
    s"""SELECT s.event_id AS signup_id, count(*) AS n_purch,
         ${S.sumD6w("p.value", "sum_value")}
       FROM events s JOIN events p
         ON epoch_us(p.ts) >= epoch_us(s.ts)
        AND epoch_us(p.ts) <= epoch_us(s.ts) + $TenMinUs
       WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
       GROUP BY 1 ORDER BY 1"""
  }

  /** q85: the SAME semantics as q82 spelled the way a SQL user would —
    * a plain inequality join, no operator call. With GraftExtensions
    * the [[org.apache.spark.sql.graftplans.RewriteRangeJoins]] rule
    * manufactures the bucketed equi-join (width measured by its
    * max-interval subquery); stock Spark would run a nested loop over
    * every (signup, purchase) pair. Same oracle as q82 — the rewrite
    * must be output-exact, not just shape-correct. */
  def q85AutoRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val raw = events(spark, dir)
    val ev = raw.select(col("event_id"), tsMicros(raw).as("ts_us"),
      col("event_type"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts_us").as("p_ts"),
        col("value").as("p_value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts_us").as("s_ts"))
    purchases.join(signups,
        col("p_ts") >= col("s_ts") && col("p_ts") <= col("s_ts") + TenMinUs)
      .groupBy("signup_id")
      .agg(count(lit(1)).as("n_purch"), dbl(sum(d6w(col("p_value")))).as("sum_value"))
      .orderBy("signup_id")
  }

  private val FiveMinUs = 300L * 1000 * 1000

  /** q87: interval-OVERLAP join — signup windows (10 min) against error
    * windows (5 min), no user key: which signups had ANY error window
    * intersecting theirs, and how severe. Both join inputs are
    * INTERVALS, so even the point-bucketing of q82 doesn't apply and
    * stock Spark is back to the nested loop.
    * [[RangeJoin.intervalOverlap]] replicates both sides over
    * fixed-width buckets and keeps each qualifying pair only in the
    * bucket of `greatest(lo, lo)` — the intersection start — so the
    * plan is an ordinary equi-join, exact with no dedup. */
  def q87IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val raw = events(spark, dir)
    val ev = raw.select(col("event_id"), tsMicros(raw).as("ts_us"),
      col("event_type"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts_us").as("s_lo"),
        (col("ts_us") + TenMinUs).as("s_hi"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts_us").as("e_lo"),
        (col("ts_us") + FiveMinUs).as("e_hi"), col("value").as("e_value"))
    RangeJoin.intervalOverlap(
        signups, "s_lo", "s_hi", errors, "e_lo", "e_hi", bucketWidth = TenMinUs)
      .groupBy("signup_id")
      .agg(count(lit(1)).as("n_err"), dbl(sum(d6w(col("e_value")))).as("sum_sev"))
      .orderBy("signup_id")
  }

  val q87Sql: String = {
    import graft.util.Tables.{sql => S}
    s"""SELECT s.event_id AS signup_id, count(*) AS n_err,
         ${S.sumD6w("e.value", "sum_sev")}
       FROM events s JOIN events e
         ON epoch_us(s.ts) <= epoch_us(e.ts) + $FiveMinUs
        AND epoch_us(e.ts) <= epoch_us(s.ts) + $TenMinUs
       WHERE s.event_type = 'signup' AND e.event_type = 'error'
       GROUP BY 1 ORDER BY 1"""
  }

  /** q88: the SAME semantics as q87 spelled as a plain SQL inequality
    * join — two cross-side upper bounds, one on each side's interval
    * start. No point expression is bounded both below and above, so the
    * q85 point-in-interval rewrite can NOT fire. Since r20 the DECIMAL
    * sum channel of
    * [[org.apache.spark.sql.graftplans.RewriteIntervalAggJoins]] takes
    * this whole shape to the pair-free sweep line (unscaled limbs over
    * the long prefix machinery) — the q87/q88 money-sum class the r19
    * verdict flagged as still growing ~density² at scale. The bucketed
    * overlap JOIN rewrite this gate used to exercise is now gated by
    * [[q131IntervalOverlapJoin]], whose max() aggregate the sweep
    * cannot take. Same oracle as q87. */
  def q88AutoIntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val raw = events(spark, dir)
    val ev = raw.select(col("event_id"), tsMicros(raw).as("ts_us"),
      col("event_type"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts_us").as("s_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts_us").as("e_ts"),
        col("value").as("e_value"))
    signups.join(errors,
        col("s_ts") <= col("e_ts") + FiveMinUs &&
          col("e_ts") <= col("s_ts") + TenMinUs)
      .groupBy("signup_id")
      .agg(count(lit(1)).as("n_err"), dbl(sum(d6w(col("e_value")))).as("sum_sev"))
      .orderBy("signup_id")
  }

  /** q129 (r19): q87's EXACT semantics — count/sum of overlapping
    * errors per signup window — computed as a SWEEP LINE instead of a
    * join. Fixed-width intervals overlap iff the error START falls in
    * `[s_lo - 5min, s_lo + 10min]`, so the answer is a band aggregate
    * of error starts around each signup start
    * ([[RangeFrames.bandAggregateAgainst]]: per-key aggregate → global
    * prefix sums → two probes per signup → equi-join back). The
    * overlap JOIN (q87/q88) must materialize every qualifying pair
    * before its aggregate — the r19 sweep's JFR pinned its entire 128×
    * marathon inside the pair-consuming hash aggregate, because
    * replicated fixtures grow pairs ~density². This plan never forms
    * pairs: cost is O(n log n) in the events, scale-flat per unit.
    * Decimal prefix differences are exact, so the oracle is q87's
    * verbatim. Signups with an empty band are dropped (count 0) to
    * match the join's inner semantics. */
  def q129IntervalAggSweepline(spark: SparkSession, dir: String): DataFrame = {
    val raw = events(spark, dir)
    val ev = raw.select(col("event_id"), tsMicros(raw).as("ts_us"),
      col("event_type"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts_us").as("s_lo"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("ts_us").as("e_ts"), d6w(col("value")).as("e_val"))
    graft.functions.RangeFrames.bandAggregateAgainst(
        signups, "s_lo", errors, "e_ts", "e_val",
        lo = FiveMinUs, hi = TenMinUs, outCnt = "n_err", outSum = "band_sum")
      .filter(col("n_err") > 0)
      .select(col("signup_id"), col("n_err"),
        dbl(col("band_sum")).as("sum_sev"))
      .orderBy("signup_id")
  }

  /** q130 (r19): the q88 join+aggregate written as PLAIN Spark — no
    * operator call — with count/sum-only aggregates, so
    * [[org.apache.spark.sql.graftplans.RewriteIntervalAggJoins]] lowers
    * the whole shape to the q129 sweep line automatically (the rule
    * fires before the join rule can bucket the overlap). Sums a BIGINT
    * column (error event ids) so the rule's sum channel is gated too;
    * exact integer arithmetic end to end. */
  def q130AutoIntervalAgg(spark: SparkSession, dir: String): DataFrame = {
    val raw = events(spark, dir)
    val ev = raw.select(col("event_id"), tsMicros(raw).as("ts_us"),
      col("event_type"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts_us").as("s_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts_us").as("e_ts"))
    signups.join(errors,
        col("s_ts") <= col("e_ts") + FiveMinUs &&
          col("e_ts") <= col("s_ts") + TenMinUs)
      .groupBy("signup_id")
      .agg(count(lit(1)).as("n_err"), sum(col("error_id")).as("sum_id"))
      .orderBy("signup_id")
  }

  val q130Sql: String =
    s"""SELECT s.event_id AS signup_id, count(*) AS n_err,
         CAST(sum(e.event_id) AS BIGINT) AS sum_id
       FROM events s JOIN events e
         ON epoch_us(s.ts) <= epoch_us(e.ts) + $FiveMinUs
        AND epoch_us(e.ts) <= epoch_us(s.ts) + $TenMinUs
       WHERE s.event_type = 'signup' AND e.event_type = 'error'
       GROUP BY 1 ORDER BY 1"""

  /** q131 (r20): the q88 join shape with a MAX aggregate — max is not
    * prefix-invertible, so [[RewriteIntervalAggJoins]] deliberately
    * does not fire and the two-sided overlap extension of
    * [[org.apache.spark.sql.graftplans.RewriteRangeJoins]] carries the
    * shape as the bucketed equi-join (the coverage q88 held before the
    * sweep took it). max/min over the pair stream are exact copies of
    * input values — no arithmetic — so the oracle hash is safe at any
    * scale. */
  def q131IntervalOverlapJoin(spark: SparkSession, dir: String): DataFrame = {
    val raw = events(spark, dir)
    val ev = raw.select(col("event_id"), tsMicros(raw).as("ts_us"),
      col("event_type"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("ts_us").as("s_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("ts_us").as("e_ts"), col("value").as("e_value"))
    signups.join(errors,
        col("s_ts") <= col("e_ts") + FiveMinUs &&
          col("e_ts") <= col("s_ts") + TenMinUs)
      .groupBy("signup_id")
      .agg(count(lit(1)).as("n_err"), max(col("e_value")).as("max_sev"),
        min(col("e_value")).as("min_sev"))
      .orderBy("signup_id")
  }

  val q131Sql: String =
    s"""SELECT s.event_id AS signup_id, count(*) AS n_err,
         max(e.value) AS max_sev, min(e.value) AS min_sev
       FROM events s JOIN events e
         ON epoch_us(s.ts) <= epoch_us(e.ts) + $FiveMinUs
        AND epoch_us(e.ts) <= epoch_us(s.ts) + $TenMinUs
       WHERE s.event_type = 'signup' AND e.event_type = 'error'
       GROUP BY 1 ORDER BY 1"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_range_join" -> (q82RangeJoin _),
    "q85_auto_range_join" -> (q85AutoRangeJoin _),
    "q87_interval_overlap" -> (q87IntervalOverlap _),
    "q88_auto_interval_overlap" -> (q88AutoIntervalOverlap _),
    "q129_interval_agg_sweepline" -> (q129IntervalAggSweepline _),
    "q130_auto_interval_agg" -> (q130AutoIntervalAgg _),
    "q131_interval_overlap_join" -> (q131IntervalOverlapJoin _))

  val oracles: Map[String, String] = Map(
    "q82_range_join" -> q82Sql,
    "q85_auto_range_join" -> q82Sql,
    "q87_interval_overlap" -> q87Sql,
    "q88_auto_interval_overlap" -> q87Sql,
    "q129_interval_agg_sweepline" -> q87Sql,
    "q130_auto_interval_agg" -> q130Sql,
    "q131_interval_overlap_join" -> q131Sql)
}
