package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** Structured Streaming layer over the `events` table shape (SURVEY.md
  * §2.3 "Streaming"). The reference has no streaming at all; these are the
  * Spark-native stream forms of the batch window queries in
  * [[graft.queries.EventQueries]] — batch/stream equivalence is asserted
  * in `StreamingSpec`.
  *
  * Scale notes: all aggregations are keyed by (window, …) or user_id, so
  * state is partitioned across executors by the shuffle; watermarks bound
  * state size (late rows beyond the watermark are dropped, old windows
  * are evicted). File-source streaming reads incrementally —
  * `maxFilesPerTrigger` shapes micro-batches at scale.
  */
object EventStreams {

  /** The events schema with `ts` still in its on-disk form — `tsType`
    * is whatever the parquet files encode (LongType for legacy
    * TIMESTAMP(NANOS) under nanos-as-long; TimestampNTZType for naive
    * micros; see Tables.events for the encoding history).
    */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open the events parquet directory as a stream (one file = one batch
    * at fixture scale), normalizing `ts` to the same TimestampType
    * epoch-as-UTC contract as Tables.events. File sources need the schema
    * up front, so a one-off batch read (metadata only — no job runs)
    * probes the on-disk encoding first.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // SESSION-GLOBAL side effect, unavoidable: nanosAsLong is a session
    // conf, not a per-reader option, and it must stay set while the
    // stream executes. Every later parquet read in this session will
    // also load nanos-typed columns as LongType. Harmless for non-nanos
    // files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Empty landing dir (stream started before the first crawl batch
    // lands — the documented ingest pattern): nothing to probe, assume
    // the current fixture generation's naive-micros encoding. The probe
    // only exists to keep OLD nanos fixtures readable. ONLY the
    // empty/unreadable-schema condition is mapped to that default — a
    // genuinely bad path or a corrupt footer must surface HERE, not
    // later at stream start as a misleading schema mismatch.
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(_.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
          TimestampNTZType
      }
    val raw = spark.readStream
      .schema(rawSchema(tsType))
      .parquet(dir)
    tsType match {
      case LongType =>
        // Nanos-as-long; `div`, not `/` (2^53 exactness, see Tables).
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // Naive-domain epoch math — no session-timezone dependence
        // (Wire.scala rationale).
        raw.withColumn("ts", timestamp_micros(timestamp_diff("MICROSECOND",
          lit(java.time.LocalDateTime.of(1970, 1, 1, 0, 0)), col("ts"))))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other")
    }
  }

  /** Tumbling-window counts with a watermark bounding state. */
  def tumblingCounts(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_micros(col("window.start")).as("wstart_us"),
        col("event_type"), col("n"))

  /** Sliding-window aggregate. */
  def slidingCounts(events: DataFrame, windowLen: String, slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("wstart_us"), col("n"))

  /** Session windows (gap-based) per user. */
  def sessionCounts(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"))

  /** Streaming exact dedup on event_id with watermark-bounded state.
    * `dropDuplicatesWithinWatermark` is what makes the bound REAL:
    * plain `dropDuplicates("event_id")` never evicts (Spark only builds
    * the state-cleanup predicate when the watermarked event-time column
    * is among the dedup keys), so every id ever seen would sit in the
    * state store forever on a long-running stream.
    */
  def dedupedEvents(events: DataFrame, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase matched to the clicks of
    * the same user within the preceding `window`. Watermarks on both
    * sides bound the join state (Spark evicts click state older than
    * purchase watermark − window).
    */
  def purchaseClickJoin(events: DataFrame, window: String, watermark: String): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
        col("c_ts") < col("p_ts"))
  }

  final case class UserStat(user_id: Long, n_events: Long, total_value: Double)

  /** Custom stateful operator: running per-user totals via
    * mapGroupsWithState (the escape hatch when built-in windows can't
    * express the state machine).
    *
    * State note: lifetime totals NEED one state entry per user forever —
    * state is bounded by |users|, not by time (unlike the windowed aggs
    * above, whose state the watermark evicts). For unbounded-cardinality
    * keys, add a GroupStateTimeout and an eviction policy; a running
    * total over all history fundamentally cannot evict.
    */
  def userRunningTotals(events: DataFrame): Dataset[UserStat] = {
    implicit val longEnc = Encoders.scalaLong
    implicit val rowEnc = Encoders.product[(Long, Double)]
    implicit val statEnc = Encoders.product[UserStat]
    events
      .select(col("user_id").as("_1"), col("value").as("_2"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(user, 0L, 0d))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { r => n += 1; tot += r._2 }
          val next = UserStat(user, n, tot)
          state.update(next)
          next
      }
  }

  /** Production-shaped file sink: append to parquet with a checkpoint so
    * a restarted query resumes exactly-once (processed source files are
    * tracked in the checkpoint's file-source log).
    */
  def runToParquet(df: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Stream → versioned [[graft.store.Store]] ingest with exactly-once
    * table contents: each micro-batch lands as its own store version
    * keyed by the batch id (`b<id>`), and a replayed batch (restart
    * between sink write and checkpoint commit) first drops its own
    * version subtree, so the rewrite is idempotent — at-least-once
    * delivery × idempotent per-batch write = exactly-once state.
    * An accumulate read (`store.get(name)`) is then exactly the stream
    * so far; `useLast` is the newest batch.
    */
  def writeToStore(
      df: DataFrame,
      store: graft.store.Store,
      name: String,
      columnsKeys: Map[String, String],
      checkpointDir: String): Unit = {
    val q = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        // Persist across the two actions (isEmpty probe + store write):
        // without it each action re-reads the micro-batch's source.
        val b = batch.persist()
        try {
          // Empty triggers write nothing (a 0-row load would also not
          // advance the pointer — see Store.load — but skipping avoids
          // the metadata churn entirely).
          if (!b.isEmpty) {
            store.dropVersion(name, s"b$id")
            store.load(b.toDF(), name, columnsKeys, externalKey = s"b$id")
          }
        } finally b.unpersist()
        (): Unit
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Stream → store CDC MERGE sink: each micro-batch UPSERTS into the
    * merge-managed table ([[graft.store.Store.merge]]) instead of
    * appending — streaming ingestion of a mutable keyed table (user
    * profiles, document metadata, label corrections). Per batch: rows
    * collapse to newest-per-key by `seqCol` (a batch may carry several
    * updates to one key; merge requires key-unique deltas), the batch's
    * own version is dropped first (replay-idempotent, same exactly-once
    * argument as [[writeToStore]]), and batch ids become ZERO-PADDED
    * labels so merge resolution's label order is ingest order past batch
    * 9. The first batch of a fresh table loads as the base version.
    * `store.getMerged(name)` is then always "the table as of the stream
    * so far"; tombstones via `deleteCol` delete keys mid-stream.
    */
  def mergeToStore(
      df: DataFrame,
      store: graft.store.Store,
      name: String,
      keyCols: Seq[String],
      seqCol: String,
      checkpointDir: String,
      columnsKeys: Map[String, String] = Map.empty,
      deleteCol: Option[String] = None): Unit = {
    val q = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val b = batch.persist()
        try {
          if (!b.isEmpty) {
            val label = f"b$id%09d"
            val cols = b.columns
            val latest = b.toDF()
              .groupBy(keyCols.map(col): _*)
              .agg(max_by(struct(cols.map(col): _*), col(seqCol)).as("__r"))
              .select(col("__r.*"))
            store.dropVersion(name, label)
            // Fresh-table test by VERSION DIRS, not the `_last` pointer:
            // a replayed batch 0 (crash between sink write and checkpoint
            // commit) has just dropped its own version, but the pointer
            // file it published survives dropVersion — keying off
            // lastVersion would send the replay down the merge path and
            // rebuild the table as a base-less delta chain. hasVersions
            // is one directory listing per trigger (history would walk
            // every file of every version, O(table files) per batch).
            val isFresh = !store.hasVersions(name)
            if (isFresh) {
              // Base load writes no merge marker, so a tombstone in the
              // FIRST batch of a fresh table would land as a live row
              // (and stay live if no later batch ever merges). A delete
              // of a never-seen key is a no-op: drop those rows up front.
              val base = deleteCol.map(d =>
                latest.where(!coalesce(col(d).cast("boolean"), lit(false)))).getOrElse(latest)
              store.load(base, name, columnsKeys, externalKey = label)
            } else
              store.merge(latest, name, keyCols, externalKey = label, deleteCol = deleteCol)
          }
        } finally b.unpersist()
        (): Unit
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Write a streaming frame to an in-memory table and drain all pending
    * micro-batches (test/demo sink; production would target kafka/delta/
    * parquet with checkpointing).
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    df.sparkSession.table(name)
  }
}
