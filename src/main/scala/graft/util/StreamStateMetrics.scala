package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch STATE observability for stateful streaming queries
  * (r17 stretch — the q92 verdict item): the 128× GC band of the
  * stream-stream range join was previously INFERRED from GC drain;
  * the state footprint is now measured. Spark's stateful operators
  * (the symmetric-hash join the range-join rewrite manufactures,
  * dropDuplicates, windowed aggs, *GroupsWithState) already report
  * per-operator state rows/bytes into each micro-batch's
  * `StreamingQueryProgress.stateOperators` — this utility captures
  * them through a [[StreamingQueryListener]] scoped to one body of
  * work, so a harness (or q92 itself) can print a per-batch ledger
  * and a peak summary instead of guessing from heap churn.
  *
  * The listener is passive (progress events are produced regardless);
  * observing adds no per-row cost to the query. */
final class StreamStateMetrics extends StreamingQueryListener {
  import StreamStateMetrics.Sample

  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[Sample]()

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    p.stateOperators.zipWithIndex.foreach { case (op, i) =>
      buf.add(Sample(p.batchId, s"${op.operatorName}#$i",
        op.numRowsTotal, op.memoryUsedBytes,
        op.numRowsUpdated, op.numRowsRemoved))
    }
  }

  def samples: Seq[Sample] = {
    val out = scala.collection.mutable.ArrayBuffer[Sample]()
    buf.forEach(s => out += s)
    out.toSeq
  }
}

object StreamStateMetrics {

  /** One (micro-batch, state operator) observation. */
  final case class Sample(batchId: Long, operator: String, rows: Long,
      bytes: Long, updated: Long, removed: Long)

  /** Peak-footprint summary over a run's samples. */
  final case class Summary(batches: Long, peakRows: Long, peakBytes: Long,
      totalUpdated: Long, totalRemoved: Long) {
    def line: String =
      s"state: batches=$batches peakRows=$peakRows " +
        f"peakMB=${peakBytes / 1048576.0}%.1f updated=$totalUpdated " +
        s"removed=$totalRemoved"
  }

  def summarize(ss: Seq[Sample]): Summary = {
    // peak = the largest SIMULTANEOUS footprint: sum operators within
    // a batch, then max over batches
    val byBatch = ss.groupBy(_.batchId).values
    Summary(
      batches = byBatch.size.toLong,
      peakRows = byBatch.map(_.map(_.rows).sum).maxOption.getOrElse(0L),
      peakBytes = byBatch.map(_.map(_.bytes).sum).maxOption.getOrElse(0L),
      totalUpdated = ss.map(_.updated).sum,
      totalRemoved = ss.map(_.removed).sum)
  }

  /** The summary of the most recent [[observe]] run in this JVM —
    * harness/spec observability without plumbing a return channel
    * through DataFrame-shaped query entry points. */
  @volatile var lastSummary: Option[Summary] = None
  @volatile var lastSamples: Seq[Sample] = Nil

  /** Run `body` with a scoped state-metrics listener attached; record
    * the captured samples + summary in [[lastSummary]]/[[lastSamples]]
    * and return the body's result. NOTE: `body` must await query
    * termination (every caller here does) — by then every progress
    * event is already POSTED to the listener bus, so one deterministic
    * bus drain delivers them in milliseconds. (r18: the r17 shape
    * polled sample counts in fixed 150 ms sleeps — min ~150 ms, worst
    * 3 s — INSIDE the caller's timed path; q92 paid observability in
    * its bench number.) */
  def observe[T](spark: SparkSession)(body: => T): T = {
    val l = new StreamStateMetrics
    spark.streams.addListener(l)
    try {
      val r = body
      org.apache.spark.graftutil.ListenerBusDrain.drain(
        spark.sparkContext, 10000)
      lastSamples = l.samples
      lastSummary = Some(summarize(lastSamples))
      r
    } finally spark.streams.removeListener(l)
  }
}
