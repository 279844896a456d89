package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Streaming.{Ev, EvV, EvW, OpenSession, UserAgg, UserAggState, sessionizeFn, userAggFn}

/** Streaming-session STATE HYGIENE: q37's `sessionizeFn` under
  * EventTimeTimeout must EVICT a user's open-session state once the
  * watermark passes `end + gap` — emitting the closed session exactly
  * once — so state is bounded by live users, never by stream length.
  * Locks the r11→r12 fix: the NoTimeout version held state forever on a
  * true unbounded stream. */
class StreamSessionTimeoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val gapUs = 30L * 60 * 1000 * 1000 // 30 min

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("stream-session-timeout-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Minutes → micros, offset a day past the epoch: an event AT the
    * initial watermark (epoch 0) would be dropped as late. */
  private def us(minutes: Long): Long = (1440 + minutes) * 60L * 1000 * 1000

  test("watermark passing a session emits it once and evicts its state") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val gap = gapUs // local copy: the closure must not capture the suite
    val fn = sessionizeFn(gap) _
    val sessions = input.toDS()
      .withColumn("ts_wm", timestamp_micros(col("ts_us")))
      .as[EvW]
      .withWatermark("ts_wm", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[EvW],
         state: org.apache.spark.sql.streaming.GroupState[OpenSession]) =>
          fn(uid, it.map(e => Ev(e.user_id, e.event_id, e.ts_us)), state)
      }
    val q = sessions.writeStream.format("memory").queryName("sess_timeout")
      .outputMode("append").start()
    try {
      def stateRows: Long =
        q.lastProgress.stateOperators.apply(0).numRowsTotal

      // batch 1: two users, one open session each — both HELD (nothing
      // can close yet: watermark is behind both sessions)
      input.addData(Ev(1, 1, us(0)), Ev(1, 2, us(5)), Ev(2, 1, us(3)))
      q.processAllAvailable()
      assert(spark.table("sess_timeout").count() == 0,
        "open sessions must not emit early")
      assert(stateRows == 2, s"both users hold state, got $stateRows")

      // batch 2: user 1 speaks again far in the future. The watermark
      // (from batch 1: max=5min) hasn't passed either session yet, so
      // this batch only merges data; the NEXT batch sees the advanced
      // watermark (65min) and times out user 2's session (3min + 30min
      // gap < 65min) AND user 1's first session.
      input.addData(Ev(1, 3, us(65)))
      q.processAllAvailable()
      // an empty nudge batch lets the post-batch-2 watermark fire timers
      input.addData(Ev(1, 4, us(66)))
      q.processAllAvailable()

      val emitted = spark.table("sess_timeout")
        .select("user_id", "session_idx", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(emitted.contains((2L, 1L, 1L)),
        s"user 2's session must emit on timeout, got $emitted")
      assert(emitted.contains((1L, 1L, 2L)),
        s"user 1's first session must emit on timeout, got $emitted")
      // EVICTION: user 2 holds nothing anymore; user 1 holds exactly the
      // one open session — state dropped from 2 users to 1
      assert(stateRows == 1,
        s"state must drop to the single live session, got $stateRows")

      // the open tail never double-emits a closed session
      assert(spark.table("sess_timeout")
        .filter("user_id = 2").count() == 1)
    } finally q.stop()
  }

  test("q35 inactivity TTL finalizes totals once and evicts user state") {
    val s0 = spark
    import s0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val horizon = gapUs // 30-min inactivity TTL for the test
    val fn = userAggFn(horizon) _
    val totals = input.toDS()
      // value = event_id micros: deterministic, distinct per event
      .select(col("user_id"), (col("event_id") * 1000000L).as("vmic"),
        col("ts_us"), timestamp_micros(col("ts_us")).as("ts_wm"))
      .as[EvV]
      .withWatermark("ts_wm", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[EvV],
         state: org.apache.spark.sql.streaming.GroupState[UserAggState]) =>
          fn(uid, it, state)
      }
    val q = totals.writeStream.format("memory").queryName("agg_timeout")
      .outputMode("append").start()
    try {
      def stateRows: Long =
        q.lastProgress.stateOperators.apply(0).numRowsTotal

      // batch 1: two users accumulate — nothing emits, both hold state
      input.addData(Ev(1, 1, us(0)), Ev(1, 2, us(5)), Ev(2, 7, us(3)))
      q.processAllAvailable()
      assert(spark.table("agg_timeout").count() == 0,
        "totals must not emit before the TTL")
      assert(stateRows == 2, s"both users hold state, got $stateRows")

      // batch 2 advances user 1 and the watermark far past user 2's
      // TTL (3min + 30min < 65min); the nudge batch fires the timer
      input.addData(Ev(1, 3, us(65)))
      q.processAllAvailable()
      input.addData(Ev(1, 4, us(66)))
      q.processAllAvailable()

      val emitted = spark.table("agg_timeout")
        .select("user_id", "n_events", "sum_value_micros").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(emitted.contains((2L, 1L, 7000000L)),
        s"user 2's totals must finalize on timeout, got $emitted")
      // EVICTION: user 2 is gone; only user 1's live accumulator remains
      assert(stateRows == 1,
        s"state must drop to the single active user, got $stateRows")
      assert(spark.table("agg_timeout").filter("user_id = 2").count() == 1,
        "finalized totals emit exactly once")
      // user 1 never finalized: their TTL keeps re-arming while active
      assert(spark.table("agg_timeout").filter("user_id = 1").count() == 0)
    } finally q.stop()
  }
}
