package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Tables._

/** The host-engine relational surface the reference exercises via DuckDB
  * (SURVEY.md §2.B): hash aggregate, expression eval, filter+cast,
  * multi-key sort, count distinct, window row_number, full outer join,
  * coalesce, semi/anti joins, string funcs, time bucketing.
  *
  * All operators here are Catalyst built-ins (the reference likewise
  * delegates them to DuckDB — /root/reference/test/sql/simple.test:40,
  * test/all_types_single_threaded.test:8-34); our job is declaring plans
  * that push down and broadcast correctly at 100 TB.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 (reference's canonical benchmark query,
    * /root/reference/test/sql/simple.test:40). */
  def q01TpchQ1(spark: SparkSession, dir: String): DataFrame =
    q01From(t(spark, dir, "lineitem"))

  /** Q1 body over any lineitem-shaped source (parquet or fls). */
  def q01From(li: DataFrame): DataFrame = {
    li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dbl(sum(d6(col("l_quantity")))).as("sum_qty"),
        dbl(sum(d6(col("l_extendedprice")))).as("sum_base_price"),
        dbl(sum(d6(col("l_extendedprice")) * oneMinus(col("l_discount")))).as("sum_disc_price"),
        dbl(sum(d6(col("l_extendedprice")) * oneMinus(col("l_discount")) * onePlus(col("l_tax")))).as("sum_charge"),
        (dbl(sum(d6(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        (dbl(sum(d6(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (dbl(sum(d6(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String = {
    import graft.util.Tables.{sql => S}
    s"""SELECT l_returnflag, l_linestatus,
       ${S.sumD6("l_quantity", "sum_qty")},
       ${S.sumD6("l_extendedprice", "sum_base_price")},
       CAST(CAST(sum(${S.revenueTerm}) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(sum(${S.revenueTerm} * ${S.onePlus("l_tax")}) AS VARCHAR) AS DOUBLE) AS sum_charge,
       CAST(CAST(sum(${S.d6("l_quantity")}) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
       CAST(CAST(sum(${S.d6("l_extendedprice")}) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
       CAST(CAST(sum(${S.d6("l_discount")}) AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
     FROM lineitem
     WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
     GROUP BY l_returnflag, l_linestatus
     ORDER BY l_returnflag, l_linestatus"""
  }

  /** Filter with timestamp cast + projection — exercises parquet
    * predicate pushdown + column pruning (scan must show PushedFilters). */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame =
    q02From(t(spark, dir, "lineitem"))

  def q02From(li: DataFrame): DataFrame =
    li.filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
              col("l_shipdate") <  lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              col("l_discount") < lit(0.05) && col("l_quantity") > lit(30.0))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        AND l_discount < 0.05 AND l_quantity > 30.0
      ORDER BY l_orderkey, l_linenumber"""

  /** 3-way join + aggregate. customer/orders shuffle-join on keys;
    * at scale the lineitem->orders join is the big shuffle, the
    * customer dim rolls up after. */
  def q03JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        dbl(sum(d6(col("l_extendedprice")) * oneMinus(col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("c_mktsegment")
  }

  val q03Sql: String = {
    import graft.util.Tables.{sql => S}
    s"""SELECT c_mktsegment,
       CAST(CAST(sum(${S.revenueTerm}) AS VARCHAR) AS DOUBLE) AS revenue,
       count(*) AS n_items
     FROM lineitem
     JOIN orders ON l_orderkey = o_orderkey
     JOIN customer ON o_custkey = c_custkey
     GROUP BY c_mktsegment ORDER BY c_mktsegment"""
  }

  /** Window ROW_NUMBER (the reference round-trip macro's alignment
    * device, /root/reference/test/all_types_single_threaded.test:12,19):
    * first-shipped line per order. */
  def q04WindowRowNumber(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_shipdate"), col("l_linenumber"))
    t(spark, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey")
  }

  val q04Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        SELECT l_orderkey, l_linenumber, l_quantity,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber) AS rn
        FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey"""

  /** count(DISTINCT ...) (declared surface, /root/reference/test/sql/simple.test:43). */
  def q05CountDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_suppkey")).as("n_supps"),
           count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val q05Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Multi-key ORDER BY + LIMIT (top-k by price; unique tiebreak keeps
    * it deterministic). Spark plans this as TakeOrderedAndProject —
    * no global sort shuffle at scale. */
  def q06TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  val q06Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""

  /** FULL OUTER JOIN + COALESCE (the reference's round-trip compare
    * macro shape, /root/reference/test/all_types_single_threaded.test:25,31). */
  def q07FullOuterCoalesce(spark: SparkSession, dir: String): DataFrame = {
    val lc = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
    val o = t(spark, dir, "orders")
    o.join(lc, o("o_orderkey") === lc("l_orderkey"), "full_outer")
      .select(
        coalesce(o("o_orderkey"), lc("l_orderkey")).as("orderkey"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"))
      .orderBy("orderkey")
  }

  val q07Sql: String =
    """WITH lc AS (SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey)
      SELECT COALESCE(o_orderkey, l_orderkey) AS orderkey,
             COALESCE(n_lines, 0) AS n_lines
      FROM orders FULL OUTER JOIN lc ON o_orderkey = l_orderkey
      ORDER BY orderkey"""

  /** String functions: md5 / concat / upper / substring / length
    * (/root/reference/test/all_types_single_threaded.test:37-160). */
  def q08StringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        md5(col("p_name").cast(BinaryType)).as("name_md5"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast(LongType).as("name_len"))
      .orderBy("p_partkey")

  val q08Sql: String =
    """SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name, 1, 8) AS name8,
        md5(p_name) AS name_md5, p_brand || '#' || p_type AS brand_type,
        CAST(length(p_name) AS BIGINT) AS name_len
      FROM part ORDER BY p_partkey"""

  /** Conditional aggregation (CASE WHEN inside sum). */
  def q09CaseAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  val q09Sql: String =
    """SELECT o_orderpriority,
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        count(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Anti join (NOT EXISTS): dormant customers — no orders in 1998+. */
  def q10AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
      ORDER BY c_custkey"""

  /** Semi join + broadcast dim join + aggregate: customers-with-orders
    * per nation. nation is tiny => broadcast (no shuffle for the dim). */
  def q11SemiJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val n = t(spark, dir, "nation")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy("n_name")
  }

  val q11Sql: String =
    """SELECT n_name, count(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY n_name ORDER BY n_name"""

  /** Time bucketing over the events table (date_trunc + agg). events.ts
    * is parquet TIMESTAMP(NANOS), whose loaded dtype is runtime-dependent
    * (nanos long vs TIMESTAMP_NTZ) — `tsMicros` dispatches on the actual
    * schema (hour truncation is unaffected either way). */
  def q12EventsHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    ev.withColumn("ts_us", timestamp_micros(tsMicros(ev)))
      .groupBy(date_trunc("hour", col("ts_us")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           dbl(sum(d6w(col("value")))).as("sum_value"))
      .orderBy("hour_ts", "event_type")
  }

  val q12Sql: String = {
    import graft.util.Tables.{sql => S}
    s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts, event_type,
        count(*) AS n_events, ${S.sumD6w("value", "sum_value")}
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** GROUP BY + HAVING. */
  def q13Having(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(dbl(sum(d6(col("l_quantity")))).as("total_qty"), count(lit(1)).as("n"))
      .filter(col("n") > 5)
      .select("l_suppkey", "total_qty")
      .orderBy("l_suppkey")

  val q13Sql: String = {
    import graft.util.Tables.{sql => S}
    s"""SELECT l_suppkey, ${S.sumD6("l_quantity", "total_qty")}
      FROM lineitem GROUP BY l_suppkey HAVING count(*) > 5
      ORDER BY l_suppkey"""
  }

  /** generate_series analog (/root/reference/test/all_types_single_threaded.test:41). */
  def q14Series(spark: SparkSession, dir: String): DataFrame =
    spark.range(1, 1025).toDF("id")
      .select(col("id"), (col("id") % 2 === 0).as("is_even"),
              (col("id") * 10).as("id10"))
      .orderBy("id")

  val q14Sql: String =
    """SELECT range AS id, range % 2 = 0 AS is_even, range * 10 AS id10
      FROM range(1, 1025) ORDER BY id"""

  val queries: Map[String, Q] = Map(
    "q01_tpch_q1"         -> (q01TpchQ1 _),
    "q02_filter_project"  -> (q02FilterProject _),
    "q03_join_agg"        -> (q03JoinAgg _),
    "q04_window_rownum"   -> (q04WindowRowNumber _),
    "q05_count_distinct"  -> (q05CountDistinct _),
    "q06_topk"            -> (q06TopK _),
    "q07_full_outer"      -> (q07FullOuterCoalesce _),
    "q08_string_funcs"    -> (q08StringFuncs _),
    "q09_case_agg"        -> (q09CaseAgg _),
    "q10_anti_join"       -> (q10AntiJoin _),
    "q11_semi_join_agg"   -> (q11SemiJoinAgg _),
    "q12_events_hourly"   -> (q12EventsHourly _),
    "q13_having"          -> (q13Having _),
    "q14_series"          -> (q14Series _),
  )

  val oracles: Map[String, String] = Map(
    "q01_tpch_q1"         -> q01Sql,
    "q02_filter_project"  -> q02Sql,
    "q03_join_agg"        -> q03Sql,
    "q04_window_rownum"   -> q04Sql,
    "q05_count_distinct"  -> q05Sql,
    "q06_topk"            -> q06Sql,
    "q07_full_outer"      -> q07Sql,
    "q08_string_funcs"    -> q08Sql,
    "q09_case_agg"        -> q09Sql,
    "q10_anti_join"       -> q10Sql,
    "q11_semi_join_agg"   -> q11Sql,
    "q12_events_hourly"   -> q12Sql,
    "q13_having"          -> q13Sql,
    "q14_series"          -> q14Sql,
  )
}
