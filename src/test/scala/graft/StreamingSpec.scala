package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams

/** Structured Streaming parity: the streaming window forms must agree with
  * their batch equivalents on the same fixture data (processed as one
  * micro-batch from the file source).
  */
class StreamingSpec extends SparkSpec {

  private def batchEvents = Tables.events(spark, sf())

  /** The file streaming source requires a directory; stage the single
    * fixture file into one.
    */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${sf()}/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming tumbling window == batch tumbling window") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.tumblingCounts(stream, "1 hour", "10 minutes"), "t_tumble")
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("wstart_us"), col("event_type"), col("n"))
    assert(streamed.orderBy("wstart_us", "event_type").collect().toSeq ==
      batch.orderBy("wstart_us", "event_type").collect().toSeq)
  }

  test("streaming session window == batch session window") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.sessionCounts(stream, "10 minutes", "10 minutes"), "t_sess")
    val batch = batchEvents
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"), col("n_events"))
    assert(streamed.orderBy("user_id", "session_start_us").collect().toSeq ==
      batch.orderBy("user_id", "session_start_us").collect().toSeq)
  }

  test("streaming dedup drops duplicate event_ids") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    val deduped = EventStreams.runToMemory(spark,
      EventStreams.dedupedEvents(stream, "1 hour").select("event_id"),
      "t_dedup", OutputMode.Append())
    assert(deduped.count() == batchEvents.select("event_id").distinct().count())
  }

  test("mapGroupsWithState running totals match batch groupBy") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.userRunningTotals(stream).toDF(), "t_state", OutputMode.Update())
    val batch = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
    val s = streamed.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val b = batch.orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    assert(s.toSeq == b.toSeq)
  }
}
