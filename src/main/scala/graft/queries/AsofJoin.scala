package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** AS-OF join — the time-series primitive Spark lacks as a built-in
  * (SURVEY.md §2.B notes the reference never exercises it either; this
  * is a beyond-reference operator a training-data/eventstream pipeline
  * needs constantly: "attach the latest prior state to each event").
  *
  * Implementation is the SCALABLE shape, not a range join: tag both
  * streams, union them, and run a running `last(_, ignoreNulls)` window
  * per key ordered by (time, side). That is ONE hash shuffle on the key
  * plus an in-partition sort — the same cost class as a sort-merge
  * join, with no candidate-pair blowup however skewed the time axis is
  * (a naive `t2.ts <= t1.ts` range join is quadratic per key). At
  * 100 TB: shuffle by user key, sort within partitions — exactly the
  * plan AQE would pick for the equivalent sort-merge join.
  *
  * Strict "before" semantics: at equal timestamps the LEFT row orders
  * FIRST (side 0 < 1), so a same-instant right-stream row is excluded
  * from its window — matching the oracle's `c.ts < e.ts`. */
object AsofJoin {

  /** q50: each `purchase` event joined AS-OF to the user's most recent
    * strictly-prior `click`; output the microsecond gap (NULL when no
    * prior click). The gap — not the matched click's id — is the
    * output, so equal-timestamp click ties cannot make the result
    * nondeterministic in either engine. */
  def q50AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val raw = events(spark, dir)
    val ev = raw
      .select(col("user_id"), col("event_id"), tsMicros(raw).as("ts_us"),
        col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        lit(null).cast("long").as("click_ts"), lit(0).as("side"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), lit(null).cast("long").as("event_id"), col("ts_us"),
        col("ts_us").as("click_ts"), lit(1).as("side"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("last_click", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        (col("ts_us") - col("last_click")).as("gap_us"))
      .orderBy("purchase_id")
  }

  val q50Sql: String =
    """SELECT e.event_id AS purchase_id, e.user_id,
        epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
      FROM events e ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON e.user_id = c.user_id AND c.ts < e.ts
      WHERE e.event_type = 'purchase'
      ORDER BY purchase_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_asof_join" -> (q50AsofJoin _))

  val oracles: Map[String, String] = Map(
    "q50_asof_join" -> q50Sql)
}
