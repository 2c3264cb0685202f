package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-batch operability surface for the streaming pipelines: one row
  * per completed micro-batch with input rows, input/process rates,
  * trigger duration, state size, and WATERMARK LAG (the batch's
  * wall-clock timestamp minus its event-time watermark) — the freshness
  * number an on-call actually watches over an ingest or monitor query.
  * The DocStreams/EventStreams monitors grade batch≡stream equivalence;
  * this is the missing "is it keeping up" table next to them.
  *
  * Built as a [[StreamingQueryListener]] rather than a poll of
  * `query.recentProgress`, so history is not capped by that buffer's
  * retention and one monitor observes every query on the session.
  * Progress events are metadata-scale (one row per batch), so the
  * buffer and the local [[table]] stay trivially small next to the
  * data they describe; a production deployment points the same rows at
  * a store table (one `load` per flush) for a durable ops log.
  */
final class StreamStatusMonitor(spark: SparkSession)
    extends StreamingQueryListener {
  import StreamStatusMonitor.BatchStatus

  private val buf = new ConcurrentLinkedQueue[BatchStatus]()

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val tsMs = java.time.Instant.parse(p.timestamp).toEpochMilli
    // An un-advanced watermark reports the epoch; surface it as NULL —
    // "no watermark yet" must not read as 56 years of lag.
    val wm = Option(p.eventTime.get("watermark"))
      .map(java.time.Instant.parse(_).toEpochMilli)
      .filter(_ > 0L)
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    def finite(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d
    buf.add(BatchStatus(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId,
      tsMs,
      p.numInputRows,
      finite(p.inputRowsPerSecond),
      finite(p.processedRowsPerSecond),
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
      stateRows,
      wm,
      wm.map(w => tsMs - w)))
  }

  def attach(): this.type = { spark.streams.addListener(this); this }
  def detach(): Unit = spark.streams.removeListener(this)

  /** The status table: one row per completed micro-batch of every query
    * observed while attached, in arrival order.
    */
  def table(): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    buf.iterator().asScala.toSeq.toDF()
  }
}

object StreamStatusMonitor {
  /** One completed micro-batch. `watermark_lag_ms` is wall-clock batch
    * time minus the event-time watermark — NULL until the first
    * watermark commits (epoch-zero watermarks are not lag).
    */
  final case class BatchStatus(
      query: String,
      batch_id: Long,
      batch_ts_ms: Long,
      num_input_rows: Long,
      input_rps: Double,
      process_rps: Double,
      batch_ms: Long,
      state_rows: Long,
      watermark_ms: Option[Long],
      watermark_lag_ms: Option[Long])
}
