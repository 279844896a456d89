package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.RangeFrames
import graft.util.Tables._

/** Additional host-engine surface: multi-level aggregation and set
  * operations — Catalyst built-ins (SURVEY.md §2.B policy: declare, do
  * not re-implement). */
object Relational2 {

  private val TwoDaysUs = 2L * 24 * 3600 * 1000 * 1000

  /** q19: ROLLUP over orders — (status, priority), (status), (): three
    * aggregation levels in one pass (partial aggregation + single
    * shuffle; Spark expands grouping sets map-side). */
  def q19Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dbl(sum(d6w(col("o_totalprice")))).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  val q19Sql: String = {
    import graft.util.Tables.{sql => S}
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         coalesce(o_orderpriority, 'ALL') AS priority,
         count(*) AS n, ${S.sumD6w("o_totalprice", "total")}
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       ORDER BY status, priority"""
  }

  /** q34: set operations — customers with orders INTERSECT customers
    * with high-value orders, EXCEPT customers from nation 0, UNION a
    * fixed probe set. Spark plans these as aggregates/joins. */
  def q34SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val withOrders = o.select(col("o_custkey").as("custkey")).distinct()
    val highValue = o.filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey").as("custkey")).distinct()
    val nation0 = c.filter(col("c_nationkey") === 0)
      .select(col("c_custkey").as("custkey"))
    val probes = spark.range(1, 6).toDF("custkey")
    withOrders.intersect(highValue)
      .except(nation0)
      .union(probes)
      .distinct()
      .orderBy("custkey")
  }

  val q34Sql: String =
    """SELECT DISTINCT custkey FROM (
        (SELECT DISTINCT o_custkey AS custkey FROM orders
         INTERSECT
         SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000.0
         EXCEPT
         SELECT c_custkey FROM customer WHERE c_nationkey = 0)
        UNION
        SELECT range AS custkey FROM range(1, 6))
      ORDER BY custkey"""

  /** q73: plain SQL partition-less windows — global row_number, a
    * running ROWS-frame count(*), running ROWS-frame sum/min/max, and
    * the tie-aware rank()/dense_rank() (over n_chars, which HAS ties)
    * with NO PARTITION BY, written exactly the way a user of the SQL
    * surface would. In stock Spark this is the
    * single-partition Window anti-shape (every row through one task's
    * sort); with `spark.sql.extensions=graft.GraftExtensions` the
    * [[org.apache.spark.sql.graftplans.RewriteGlobalWindows]] rule
    * plans both expressions as the distributed two-pass operators over
    * ONE range shuffle — this query gates that the rewrite is
    * value-exact against the oracle, not just shape-asserted
    * (GraftExtensionsSpec holds the plan-shape side). doc_id is unique,
    * so the numbering is deterministic. */
  def q73GlobalWindows(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .selectExpr(
        "doc_id",
        "n_chars",
        "CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn",
        "count(*) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING" +
          " AND CURRENT ROW) AS seen",
        "sum(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING" +
          " AND CURRENT ROW) AS cum_chars",
        // running extremes: same two-pass operator, min/max combine
        "CAST(min(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED" +
          " PRECEDING AND CURRENT ROW) AS BIGINT) AS run_min",
        "CAST(max(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED" +
          " PRECEDING AND CURRENT ROW) AS BIGINT) AS run_max",
        // n_chars ties ⇒ rank/dense_rank are the tie-aware gates
        "CAST(rank() OVER (ORDER BY n_chars) AS BIGINT) AS len_rank",
        "CAST(dense_rank() OVER (ORDER BY n_chars) AS BIGINT) AS len_dense")
      .orderBy("doc_id")

  val q73Sql: String =
    """SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY doc_id)::BIGINT AS rn,
             count(*) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)::BIGINT AS seen,
             sum(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)::BIGINT AS cum_chars,
             min(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)::BIGINT AS run_min,
             max(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)::BIGINT AS run_max,
             rank() OVER (ORDER BY n_chars)::BIGINT AS len_rank,
             dense_rank() OVER (ORDER BY n_chars)::BIGINT AS len_dense
      FROM documents ORDER BY doc_id"""

  /** q74: the rest of the rank family — percent_rank()/cume_dist()
    * over n_chars (which HAS ties — the tie-aware division gates) and
    * ntile(16) over the unique doc_id (unique ⇒ bucket assignment is
    * deterministic), all partition-less plain SQL. With
    * GraftExtensions these plan as [[org.apache.spark.sql.graftplans.GlobalRank]]
    * two-pass operators (the global N divisor comes from pass 1);
    * percent_rank/cume_dist are exact-integer-ratio double divisions,
    * bitwise identical across engines. */
  def q74RankFamily(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .selectExpr(
        "doc_id",
        "n_chars",
        "percent_rank() OVER (ORDER BY n_chars) AS len_pct",
        "cume_dist() OVER (ORDER BY n_chars) AS len_cume",
        "CAST(ntile(16) OVER (ORDER BY doc_id) AS BIGINT) AS id_bucket")
      .orderBy("doc_id")

  val q74Sql: String =
    """SELECT doc_id, n_chars,
             percent_rank() OVER (ORDER BY n_chars) AS len_pct,
             cume_dist() OVER (ORDER BY n_chars) AS len_cume,
             ntile(16) OVER (ORDER BY doc_id)::BIGINT AS id_bucket
      FROM documents ORDER BY doc_id"""

  /** q75: partition-less lag/lead — the one window family whose value
    * genuinely crosses partition boundaries. With GraftExtensions
    * these plan as [[org.apache.spark.sql.graftplans.GlobalOffset]]:
    * a range shuffle plus a boundary hand-off of k single-field values
    * per partition (never payload rows), instead of stock Spark's
    * single-partition sort. Covers a bare lag, a k>1 lead, and a
    * non-null default. */
  def q75OffsetWindows(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .selectExpr(
        "doc_id",
        "CAST(lag(n_chars, 3) OVER (ORDER BY doc_id) AS BIGINT) AS prev3",
        "CAST(lead(n_chars, 2) OVER (ORDER BY doc_id) AS BIGINT) AS next2",
        "CAST(lag(n_chars, 1, -1) OVER (ORDER BY doc_id) AS BIGINT) AS prev_or")
      .orderBy("doc_id")

  val q75Sql: String =
    """SELECT doc_id,
             lag(n_chars, 3) OVER (ORDER BY doc_id)::BIGINT AS prev3,
             lead(n_chars, 2) OVER (ORDER BY doc_id)::BIGINT AS next2,
             lag(n_chars, 1, -1) OVER (ORDER BY doc_id)::BIGINT AS prev_or
      FROM documents ORDER BY doc_id"""

  /** q76: partition-less SLIDING windows — rolling sum/min/max/count
    * over the last 10 rows of a global order, the rolling-stat shape.
    * With GraftExtensions these plan as
    * [[org.apache.spark.sql.graftplans.GlobalSliding]] (sum/min/max:
    * boundary hand-off of the j values before each partition, O(1)
    * ring / monotonic deque) and `least(row_number, j+1)` for the
    * count — stock Spark funnels all of them through one partition's
    * sort. */
  def q76SlidingWindows(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .selectExpr(
        "doc_id",
        "CAST(sum(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 9 PRECEDING" +
          " AND CURRENT ROW) AS BIGINT) AS roll_sum",
        "CAST(min(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 9 PRECEDING" +
          " AND CURRENT ROW) AS BIGINT) AS roll_min",
        "CAST(max(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 9 PRECEDING" +
          " AND CURRENT ROW) AS BIGINT) AS roll_max",
        "count(*) OVER (ORDER BY doc_id ROWS BETWEEN 9 PRECEDING" +
          " AND CURRENT ROW) AS roll_n")
      .orderBy("doc_id")

  val q76Sql: String =
    """SELECT doc_id,
             sum(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 9 PRECEDING
               AND CURRENT ROW)::BIGINT AS roll_sum,
             min(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 9 PRECEDING
               AND CURRENT ROW)::BIGINT AS roll_min,
             max(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 9 PRECEDING
               AND CURRENT ROW)::BIGINT AS roll_max,
             count(*) OVER (ORDER BY doc_id ROWS BETWEEN 9 PRECEDING
               AND CURRENT ROW)::BIGINT AS roll_n
      FROM documents ORDER BY doc_id"""

  /** q77: running avg + the edge-value windows, partition-less plain
    * SQL. With GraftExtensions the avg plans as an exact long running
    * sum ÷ running non-null count (two stacked
    * [[org.apache.spark.sql.graftplans.GlobalRunningSum]] operators over
    * ONE range shuffle) and first_value/last_value plan as
    * [[org.apache.spark.sql.graftplans.GlobalFirstValue]] — the
    * global-scalar constant shapes and the running IGNORE NULLS
    * recurrence, the latter exercised over a STRING column (the edge
    * operator is type-generic, unlike the long-domain running
    * aggregates). nullif(lang,'en') injects real NULLs so the IGNORE
    * NULLS semantics are actually gated. roll_avg is the SLIDING avg
    * twin: two [[org.apache.spark.sql.graftplans.GlobalSliding]]
    * hand-off operators (sum + non-null count). */
  def q77AvgEdgeWindows(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .selectExpr(
        "doc_id",
        "avg(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING" +
          " AND CURRENT ROW) AS run_avg",
        "first_value(n_chars) OVER (ORDER BY doc_id) AS first_chars",
        "last_value(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED" +
          " PRECEDING AND UNBOUNDED FOLLOWING) AS last_chars",
        "first_value(nullif(lang,'en'), true) OVER (ORDER BY doc_id ROWS" +
          " BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nonen",
        "last_value(nullif(lang,'en'), true) OVER (ORDER BY doc_id ROWS" +
          " BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_nonen",
        "avg(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 9 PRECEDING" +
          " AND CURRENT ROW) AS roll_avg")
      .orderBy("doc_id")

  val q77Sql: String =
    """SELECT doc_id,
             avg(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS run_avg,
             first_value(n_chars) OVER (ORDER BY doc_id) AS first_chars,
             last_value(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
               PRECEDING AND UNBOUNDED FOLLOWING) AS last_chars,
             first_value(nullif(lang,'en') IGNORE NULLS) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nonen,
             last_value(nullif(lang,'en') IGNORE NULLS) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_nonen,
             avg(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 9 PRECEDING
               AND CURRENT ROW) AS roll_avg
      FROM documents ORDER BY doc_id"""

  /** q78: the WIDE-ROW rank case (r8 stretch): a global row_number over
    * documents that carries the full `text` payload through the range
    * shuffle — md5(text) in the output pins the payload into the window
    * child so column pruning cannot narrow it. This is the shape that
    * stresses the two-pass operator's shuffle width (fat rows, not
    * many rows); the 128× sweep reads its per-unit ratio against the
    * narrow-row q73. The %97 filter keeps oracle output bounded without
    * matching the rank-limiting guard (a modulo is not a top-k). */
  def q78WideRank(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .selectExpr("doc_id", "text",
        "CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)" +
          " AS len_rank")
      .filter(col("len_rank") % 97 === 0)
      .selectExpr("doc_id", "len_rank", "md5(text) AS text_md5")
      .orderBy("doc_id")

  val q78Sql: String =
    """WITH ranked AS (
        SELECT doc_id, text,
               row_number() OVER (ORDER BY n_chars, doc_id) AS len_rank
        FROM documents)
      SELECT doc_id, len_rank, md5(text) AS text_md5
      FROM ranked WHERE len_rank % 97 = 0 ORDER BY doc_id"""

  /** q79: DEFAULT-frame running aggregates — `sum(x) OVER (ORDER BY k)`
    * with no frame clause, the most common user spelling. The analyzer
    * assigns RANGE UNBOUNDED PRECEDING..CURRENT ROW: order-key PEERS
    * aggregate together. With GraftExtensions this plans peer-aware
    * [[org.apache.spark.sql.graftplans.GlobalRunningSum]] operators
    * (exact under the range shuffle: equal keys land in one partition,
    * tie-runs never straddle; one run buffers spill-safe at a time).
    * ORDER BY lang gives ~6 giant tie-runs over the corpus — the
    * adversarial shape for run buffering, and the tie-semantics gate
    * (every doc in a lang shares one value; a ROWS evaluation would
    * differ on all of them). */
  def q79PeerWindows(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .selectExpr("doc_id",
        "sum(n_chars) OVER (ORDER BY lang) AS cum_chars",
        "count(*) OVER (ORDER BY lang) AS cum_n",
        "min(n_chars) OVER (ORDER BY lang) AS cum_min",
        "max(n_chars) OVER (ORDER BY lang) AS cum_max",
        "avg(n_chars) OVER (ORDER BY lang) AS cum_avg",
        // peer edge values over a KEY-DEPENDENT input (the only shape
        // where RANGE last_value is deterministic, here as in stock)
        "last_value(nullif(lang, 'en')) OVER (ORDER BY lang) AS run_last",
        "first_value(nullif(lang, 'en'), true) OVER (ORDER BY lang)" +
          " AS first_nonen")
      .orderBy("doc_id")

  val q79Sql: String =
    """SELECT doc_id,
             sum(n_chars) OVER (ORDER BY lang)::BIGINT AS cum_chars,
             count(*) OVER (ORDER BY lang)::BIGINT AS cum_n,
             min(n_chars) OVER (ORDER BY lang) AS cum_min,
             max(n_chars) OVER (ORDER BY lang) AS cum_max,
             avg(n_chars) OVER (ORDER BY lang) AS cum_avg,
             last_value(nullif(lang, 'en')) OVER (ORDER BY lang) AS run_last,
             first_value(nullif(lang, 'en') IGNORE NULLS) OVER (ORDER BY lang)
               AS first_nonen
      FROM documents ORDER BY doc_id"""

  /** q80: nth_value beyond offset 1, partition-less plain SQL. With
    * GraftExtensions the n-th (non-null) value of the ordered relation
    * is ONE global scalar ([[org.apache.spark.sql.graftplans.GlobalFirstValue]]
    * pass 1 collects n candidates per partition) revealed per row by a
    * running (non-null) count — stock Spark funnels all of these
    * through a single partition's sort. Covers ROWS RESPECT NULLS, a
    * deep offset (500), IGNORE NULLS over a string with real NULLs,
    * the full UNBOUNDED..UNBOUNDED frame, and the default RANGE frame
    * at tie-run granularity (input key-dependent, so the tie-arbitrary
    * n-th row has a deterministic value — same usability condition as
    * stock). */
  def q80NthValue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .selectExpr(
        "doc_id",
        "nth_value(n_chars, 5) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED" +
          " PRECEDING AND CURRENT ROW) AS fifth_chars",
        "nth_value(n_chars, 500) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED" +
          " PRECEDING AND CURRENT ROW) AS deep_chars",
        "nth_value(nullif(lang,'en'), 3, true) OVER (ORDER BY doc_id ROWS" +
          " BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_nonen",
        "nth_value(n_chars, 7) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED" +
          " PRECEDING AND UNBOUNDED FOLLOWING) AS seventh_all",
        "nth_value(concat(lang, '!'), 2) OVER (ORDER BY lang) AS second_lang")
      .orderBy("doc_id")

  val q80Sql: String =
    """SELECT doc_id,
             nth_value(n_chars, 5) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS fifth_chars,
             nth_value(n_chars, 500) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS deep_chars,
             nth_value(nullif(lang,'en'), 3 IGNORE NULLS) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_nonen,
             nth_value(n_chars, 7) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
               PRECEDING AND UNBOUNDED FOLLOWING) AS seventh_all,
             nth_value(lang || '!', 2) OVER (ORDER BY lang) AS second_lang
      FROM documents ORDER BY doc_id"""

  /** q81: bounded ROWS frames with FOLLOWING bounds — the centered
    * moving average (the classic smoothing window), a leading
    * lookahead sum, a fully-shifted preceding frame (which can be
    * EMPTY near the start: SQL NULL), and a leading count (empty at
    * the tail: SQL 0). With GraftExtensions all four plan as
    * [[org.apache.spark.sql.graftplans.GlobalSliding]] with a
    * suffix hand-off of the following-side boundary values — stock
    * Spark funnels every one through a single partition's sort. */
  def q81BoundedFrames(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .selectExpr(
        "doc_id",
        "avg(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 5 PRECEDING" +
          " AND 5 FOLLOWING) AS smooth_chars",
        "CAST(sum(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN CURRENT ROW" +
          " AND 9 FOLLOWING) AS BIGINT) AS next10_sum",
        "CAST(max(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 10 PRECEDING" +
          " AND 2 PRECEDING) AS BIGINT) AS past_max",
        "count(*) OVER (ORDER BY doc_id ROWS BETWEEN 3 FOLLOWING" +
          " AND 7 FOLLOWING) AS ahead_n")
      .orderBy("doc_id")

  val q81Sql: String =
    """SELECT doc_id,
             avg(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 5 PRECEDING
               AND 5 FOLLOWING) AS smooth_chars,
             sum(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN CURRENT ROW
               AND 9 FOLLOWING)::BIGINT AS next10_sum,
             max(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN 10 PRECEDING
               AND 2 PRECEDING)::BIGINT AS past_max,
             count(*) OVER (ORDER BY doc_id ROWS BETWEEN 3 FOLLOWING
               AND 7 FOLLOWING)::BIGINT AS ahead_n
      FROM documents ORDER BY doc_id"""

  /** q83: interval-concurrency sweep line — how many orders are
    * "active" (within 2 days of placement) at each boundary instant.
    * The classic overlap-counting rewrite a pipeline needs for
    * sessions/capacity analysis: each interval explodes into a +1
    * delta at its start and a -1 at its end, deltas aggregate per
    * instant, and a GLOBAL running sum over instants is the
    * concurrency curve. The running sum is a partition-less ORDER BY
    * window — the single-partition anti-shape in stock Spark — which
    * GraftExtensions re-plans as the distributed two-pass
    * [[org.apache.spark.sql.graftplans.GlobalRunningSum]]: the
    * sweep-line itself is distributed, not just its preprocessing. */
  def q83IntervalConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val lo = tsMicros(o, "o_orderdate") // NTZ-or-LTZ adaptive, like events.ts
    val starts = o.select(lo.as("ts_us"), lit(1L).as("delta"))
    val ends = o.select((lo + TwoDaysUs).as("ts_us"), lit(-1L).as("delta"))
    starts.unionByName(ends)
      .groupBy("ts_us").agg(sum("delta").as("d"))
      .selectExpr("ts_us", "d",
        "sum(d) OVER (ORDER BY ts_us ROWS BETWEEN UNBOUNDED PRECEDING" +
          " AND CURRENT ROW) AS concurrent")
      .orderBy("ts_us")
  }

  val q83Sql: String =
    s"""WITH deltas AS (
        SELECT epoch_us(o_orderdate) AS ts_us, 1::BIGINT AS delta FROM orders
        UNION ALL
        SELECT epoch_us(o_orderdate) + $TwoDaysUs, -1::BIGINT FROM orders
      ), agg AS (
        SELECT ts_us, CAST(sum(delta) AS BIGINT) AS d FROM deltas GROUP BY ts_us
      )
      SELECT ts_us, d,
             CAST(sum(d) OVER (ORDER BY ts_us ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS concurrent
      FROM agg ORDER BY ts_us"""

  /** q84: RANGE value-offset frames — `count(*)/sum(x) OVER (ORDER BY k
    * RANGE BETWEEN 100 PRECEDING AND 50 FOLLOWING)` plus a fully-shifted
    * band whose frame is often EMPTY (count 0 / sum NULL — the edge
    * semantics). This is the one window family the optimizer rule
    * leaves to stock Spark's single-partition sort; here it runs
    * through [[graft.functions.RangeFrames]] — per-distinct-key
    * aggregation, distributed prefix sums, and as-of probe scans, all
    * partition-less windows the rule DOES distribute — so the value
    * frame itself scales. n_chars has ties, gating peer-identity. */
  def q84RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(col("doc_id"), col("n_chars"))
    val banded = RangeFrames.sumCountOverRange(
      d, "n_chars", "n_chars", 100L, 50L, "band_cnt", "band_sum")
    RangeFrames.sumCountOverRange(
        banded, "n_chars", "n_chars", 200L, -150L, "low_cnt", "low_sum")
      .selectExpr("doc_id", "n_chars", "band_cnt",
        "CAST(band_sum AS BIGINT) AS band_sum", "low_cnt",
        "CAST(low_sum AS BIGINT) AS low_sum")
      .orderBy("doc_id")
  }

  val q84Sql: String =
    """SELECT doc_id, n_chars,
             count(*) OVER w::BIGINT AS band_cnt,
             (sum(n_chars) OVER w)::BIGINT AS band_sum,
             count(*) OVER lw::BIGINT AS low_cnt,
             (sum(n_chars) OVER lw)::BIGINT AS low_sum
      FROM documents
      WINDOW w AS (ORDER BY n_chars RANGE BETWEEN 100 PRECEDING AND 50 FOLLOWING),
             lw AS (ORDER BY n_chars RANGE BETWEEN 200 PRECEDING AND 150 PRECEDING)
      ORDER BY doc_id"""

  /** q86: the q84 capability spelled as PLAIN SQL — a value-offset
    * RANGE window over count(*)/count/sum/avg, no operator call. With
    * GraftExtensions the
    * [[org.apache.spark.sql.graftplans.RewriteRangeFrames]] rule
    * lowers the node to the prefix-difference composition whose
    * internal windows the sibling rule distributes; stock Spark would
    * funnel every row through one partition's sort. nullif makes lang
    * NULL for 'en' docs, exercising the non-null-count channel. */
  def q86SqlRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents").createOrReplaceTempView("graft_q86_docs")
    // THREE frames in one window node (same ORDER BY): the analyzer
    // groups them together, and the rewrite gives each frame its own
    // probe pair over one shared prefix scan — incl. a fully-shifted
    // often-EMPTY band and a running cumulative mixed in
    spark.sql(
      """SELECT doc_id, n_chars,
           count(*) OVER w AS band_n,
           count(nullif(lang, 'en')) OVER w AS band_nonen,
           sum(n_chars) OVER w AS band_chars,
           avg(n_chars) OVER w AS band_avg,
           sum(n_chars) OVER lw AS low_chars,
           count(*) OVER lw AS low_n,
           sum(n_chars) OVER (ORDER BY n_chars) AS cum_chars
         FROM graft_q86_docs
         WINDOW w AS (ORDER BY n_chars RANGE BETWEEN 80 PRECEDING AND 40 FOLLOWING),
                lw AS (ORDER BY n_chars RANGE BETWEEN 220 PRECEDING AND 170 PRECEDING)
         ORDER BY doc_id""")
  }

  val q86Sql: String =
    """SELECT doc_id, n_chars,
             count(*) OVER w::BIGINT AS band_n,
             count(nullif(lang, 'en')) OVER w::BIGINT AS band_nonen,
             (sum(n_chars) OVER w)::BIGINT AS band_chars,
             avg(n_chars) OVER w AS band_avg,
             (sum(n_chars) OVER lw)::BIGINT AS low_chars,
             count(*) OVER lw::BIGINT AS low_n,
             (sum(n_chars) OVER (ORDER BY n_chars))::BIGINT AS cum_chars
      FROM documents
      WINDOW w AS (ORDER BY n_chars RANGE BETWEEN 80 PRECEDING AND 40 FOLLOWING),
             lw AS (ORDER BY n_chars RANGE BETWEEN 220 PRECEDING AND 170 PRECEDING)
      ORDER BY doc_id"""

  /** q89: min/max over RANGE value-offset frames — the NON-invertible
    * aggregates, where q84's prefix-difference trick cannot apply.
    * [[graft.functions.RangeFrames.minMaxOverRange]] uses the
    * aligned-block sliding-extrema decomposition instead: per-block
    * prefix/suffix extrema (native `PARTITION BY block` windows) answer
    * every band as a two-block least/greatest. Two bands: an ordinary
    * one and a fully-shifted one whose frame is often EMPTY (min/max
    * NULL — the SQL edge semantics). n_chars has ties, gating
    * peer-identity. */
  def q89MinMaxRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(col("doc_id"), col("n_chars"))
    val banded = RangeFrames.minMaxOverRange(
      d, "n_chars", "doc_id", 90L, 60L, "band_min_id", "band_max_id")
    RangeFrames.minMaxOverRange(
        banded, "n_chars", "doc_id", 260L, -200L, "low_min_id", "low_max_id")
      .select(col("doc_id"), col("n_chars"), col("band_min_id"),
        col("band_max_id"), col("low_min_id"), col("low_max_id"))
      .orderBy("doc_id")
  }

  val q89Sql: String =
    """SELECT doc_id, n_chars,
             min(doc_id) OVER w AS band_min_id,
             max(doc_id) OVER w AS band_max_id,
             min(doc_id) OVER lw AS low_min_id,
             max(doc_id) OVER lw AS low_max_id
      FROM documents
      WINDOW w AS (ORDER BY n_chars RANGE BETWEEN 90 PRECEDING AND 60 FOLLOWING),
             lw AS (ORDER BY n_chars RANGE BETWEEN 260 PRECEDING AND 200 PRECEDING)
      ORDER BY doc_id"""

  private val SessionGapUs = 120L * 1000 * 1000

  /** q90: batch sessionization (gaps-and-islands) over the GLOBAL event
    * stream — no partition key, so every window in the classic
    * lag→flag→running-sum composition is partition-less, exactly the
    * single-partition anti-shape stock Spark plans; with
    * GraftExtensions the lag distributes as
    * [[org.apache.spark.sql.graftplans.GlobalOffset]] and the running
    * session counter as [[org.apache.spark.sql.graftplans.GlobalRunningSum]],
    * stacked over one range shuffle each. The session aggregate after
    * is an ordinary hash agg. */
  def q90BatchSessionize(spark: SparkSession, dir: String): DataFrame = {
    val raw = events(spark, dir)
    val ev = raw.select(tsMicros(raw).as("ts_us"), col("event_id"), col("value"))
    ev.selectExpr("ts_us", "event_id", "value",
        s"CASE WHEN ts_us - lag(ts_us) OVER (ORDER BY ts_us, event_id)" +
          s" > ${SessionGapUs}L THEN 1L ELSE 0L END AS new_sess")
      .selectExpr("ts_us", "event_id", "value",
        "sum(new_sess) OVER (ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED" +
          " PRECEDING AND CURRENT ROW) AS session_id")
      .groupBy("session_id")
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts_us")) - min(col("ts_us"))).as("span_us"),
        dbl(sum(d6w(col("value")))).as("sum_value"))
      .orderBy("session_id")
  }

  val q90Sql: String = {
    import graft.util.Tables.{sql => S}
    s"""WITH flagged AS (
        SELECT epoch_us(ts) AS ts_us, event_id, value,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (ORDER BY epoch_us(ts), event_id) > $SessionGapUs
                 THEN 1 ELSE 0 END AS new_sess
        FROM events
      ), sessioned AS (
        SELECT ts_us, event_id, value,
               CAST(sum(new_sess) OVER (ORDER BY ts_us, event_id ROWS BETWEEN
                 UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
      )
      SELECT session_id, count(*) AS n_events,
             max(ts_us) - min(ts_us) AS span_us,
             ${S.sumD6w("value", "sum_value")}
      FROM sessioned GROUP BY 1 ORDER BY 1"""
  }

  /** q91: the q89 capability spelled as PLAIN SQL — min/max over a
    * value-offset RANGE window, MIXED with sum/count in the same node.
    * With GraftExtensions the
    * [[org.apache.spark.sql.graftplans.RewriteRangeFrames]] min/max
    * extension lowers the extrema through the aligned-block pipeline
    * (per-block prefix/suffix extrema + per-block as-of scans, all
    * native hash-partitioned windows) while the sum/count channels ride
    * the prefix-difference path — one shared per-key aggregate, no
    * single-partition sort anywhere. The second window is min/max-only
    * over a far-shifted band with many EMPTY frames (NULL semantics). */
  def q91SqlMinMaxFrame(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents").createOrReplaceTempView("graft_q91_docs")
    spark.sql(
      """SELECT doc_id, n_chars,
           min(doc_id) OVER w AS band_min_id,
           max(doc_id) OVER w AS band_max_id,
           count(*) OVER w AS band_n,
           sum(n_chars) OVER w AS band_chars,
           min(lang) OVER lw AS low_min_lang,
           max(lang) OVER lw AS low_max_lang
         FROM graft_q91_docs
         WINDOW w AS (ORDER BY n_chars RANGE BETWEEN 90 PRECEDING AND 60 FOLLOWING),
                lw AS (ORDER BY n_chars RANGE BETWEEN 260 PRECEDING AND 200 PRECEDING)
         ORDER BY doc_id""")
  }

  val q91Sql: String =
    """SELECT doc_id, n_chars,
             min(doc_id) OVER w AS band_min_id,
             max(doc_id) OVER w AS band_max_id,
             count(*) OVER w::BIGINT AS band_n,
             (sum(n_chars) OVER w)::BIGINT AS band_chars,
             min(lang) OVER lw AS low_min_lang,
             max(lang) OVER lw AS low_max_lang
      FROM documents
      WINDOW w AS (ORDER BY n_chars RANGE BETWEEN 90 PRECEDING AND 60 FOLLOWING),
             lw AS (ORDER BY n_chars RANGE BETWEEN 260 PRECEDING AND 200 PRECEDING)
      ORDER BY doc_id"""

  /** q93: TIME-axis RANGE frames in plain SQL — `... OVER (ORDER BY ts
    * RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)`,
    * the most common real-world value-frame spelling (per-row trailing
    * windows over event time). Day-time intervals are exact signed
    * micros, so [[org.apache.spark.sql.graftplans.RewriteRangeFrames]]
    * runs the whole prefix/extrema composition on the long-micros
    * axis; stock Spark would sort every event into one partition. The
    * DuckDB oracle computes the same bands on TIMESTAMP_NS — testdata
    * nanos are whole micros, so the bands agree exactly. */
  def q93TimeRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    ev.select(col("event_id"), col("user_id"),
        timestamp_micros(tsMicros(ev)).as("ts_ev"))
      .createOrReplaceTempView("graft_q93_events")
    spark.sql(
      """SELECT event_id,
           count(*) OVER w AS n_10m,
           sum(user_id) OVER w AS uid_sum_10m,
           min(event_id) OVER w AS min_id_10m,
           max(event_id) OVER w AS max_id_10m,
           count(*) OVER lw AS n_band
         FROM graft_q93_events
         WINDOW w AS (ORDER BY ts_ev RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                        AND CURRENT ROW),
                lw AS (ORDER BY ts_ev RANGE BETWEEN INTERVAL 40 MINUTES PRECEDING
                        AND INTERVAL 25 MINUTES PRECEDING)
         ORDER BY event_id""")
  }

  val q93Sql: String =
    """SELECT event_id,
             count(*) OVER w::BIGINT AS n_10m,
             (sum(user_id) OVER w)::BIGINT AS uid_sum_10m,
             min(event_id) OVER w AS min_id_10m,
             max(event_id) OVER w AS max_id_10m,
             count(*) OVER lw::BIGINT AS n_band
      FROM events
      WINDOW w AS (ORDER BY ts RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                     AND CURRENT ROW),
             lw AS (ORDER BY ts RANGE BETWEEN INTERVAL 40 MINUTES PRECEDING
                     AND INTERVAL 25 MINUTES PRECEDING)
      ORDER BY event_id"""

  /** q94: DATE-axis RANGE frames in plain SQL — trailing-week order
    * stats per order plus a shifted lookback band, `ORDER BY a DATE`
    * with both spellings (whole-day INTERVAL offsets and bare
    * integral offsets, which on a date key mean days). DATE keys map
    * to the days axis in [[org.apache.spark.sql.graftplans.RewriteRangeFrames]];
    * min/max ride the per-frame block pipeline, count/sum the prefix
    * path. Oracle: DuckDB with interval spellings for both frames
    * (it rejects bare integers on date keys; whole-day intervals are
    * the identical band). */
  def q94DateRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").selectExpr("o_orderkey", "o_custkey",
        "CAST(o_orderdate AS DATE) AS od")
      .createOrReplaceTempView("graft_q94_orders")
    spark.sql(
      """SELECT o_orderkey,
           count(*) OVER w AS n_7d,
           sum(o_custkey) OVER w AS cust_7d,
           min(o_orderkey) OVER lw AS min_k,
           max(o_orderkey) OVER lw AS max_k
         FROM graft_q94_orders
         WINDOW w AS (ORDER BY od RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                        AND CURRENT ROW),
                lw AS (ORDER BY od RANGE BETWEEN 30 PRECEDING AND 14 PRECEDING)
         ORDER BY o_orderkey""")
  }

  val q94Sql: String =
    """WITH o AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
                  FROM orders)
      SELECT o_orderkey,
             count(*) OVER w::BIGINT AS n_7d,
             (sum(o_custkey) OVER w)::BIGINT AS cust_7d,
             min(o_orderkey) OVER lw AS min_k,
             max(o_orderkey) OVER lw AS max_k
      FROM o
      WINDOW w AS (ORDER BY od RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                     AND CURRENT ROW),
             lw AS (ORDER BY od RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
                     AND INTERVAL 14 DAYS PRECEDING)
      ORDER BY o_orderkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_rollup" -> (q19Rollup _),
    "q34_set_ops" -> (q34SetOps _),
    "q73_global_windows" -> (q73GlobalWindows _),
    "q74_rank_family" -> (q74RankFamily _),
    "q75_offset_windows" -> (q75OffsetWindows _),
    "q76_sliding_windows" -> (q76SlidingWindows _),
    "q77_avg_edge_windows" -> (q77AvgEdgeWindows _),
    "q78_wide_rank" -> (q78WideRank _),
    "q79_peer_windows" -> (q79PeerWindows _),
    "q80_nth_value" -> (q80NthValue _),
    "q81_bounded_frames" -> (q81BoundedFrames _),
    "q83_interval_concurrency" -> (q83IntervalConcurrency _),
    "q84_range_frame" -> (q84RangeFrame _),
    "q86_sql_range_frame" -> (q86SqlRangeFrame _),
    "q89_minmax_range_frame" -> (q89MinMaxRangeFrame _),
    "q90_batch_sessionize" -> (q90BatchSessionize _),
    "q91_sql_minmax_frame" -> (q91SqlMinMaxFrame _),
    "q93_time_range_frame" -> (q93TimeRangeFrame _),
    "q94_date_range_frame" -> (q94DateRangeFrame _),
  )

  val oracles: Map[String, String] = Map(
    "q19_rollup" -> q19Sql,
    "q34_set_ops" -> q34Sql,
    "q73_global_windows" -> q73Sql,
    "q74_rank_family" -> q74Sql,
    "q75_offset_windows" -> q75Sql,
    "q76_sliding_windows" -> q76Sql,
    "q77_avg_edge_windows" -> q77Sql,
    "q78_wide_rank" -> q78Sql,
    "q79_peer_windows" -> q79Sql,
    "q80_nth_value" -> q80Sql,
    "q81_bounded_frames" -> q81Sql,
    "q83_interval_concurrency" -> q83Sql,
    "q84_range_frame" -> q84Sql,
    "q86_sql_range_frame" -> q86Sql,
    "q89_minmax_range_frame" -> q89Sql,
    "q90_batch_sessionize" -> q90Sql,
    "q91_sql_minmax_frame" -> q91Sql,
    "q93_time_range_frame" -> q93Sql,
    "q94_date_range_frame" -> q94Sql,
  )
}
