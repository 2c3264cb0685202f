package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.TextOps

/** Structured Streaming forms of the DOCUMENT-pipeline operators — the
  * corpus-ingest half of the streaming story (EventStreams covers the
  * event/time-series half). A crawler drops parquet batches into a
  * directory; these queries keep the corpus deduplicated and the
  * per-source ingest totals current as files arrive. Batch/stream
  * equivalence is asserted in StreamingSpec.
  */
object DocStreams {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Open a documents parquet directory as a stream (one file = one
    * micro-batch at fixture scale).
    */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Streaming exact CONTENT dedup: later arrivals of an identical text
    * are dropped across micro-batches — the ingest form of the batch
    * exact dedup (qn01). Keyed on the 128-bit content hash, so state is
    * one hash per DISTINCT document, not per row; which copy survives
    * is arrival order (batch qn01 keeps min id — equivalence tests
    * compare surviving CONTENT, not ids). No watermark by design:
    * exact dedup has no time bound. At 100 TB bound the state with
    * `withWatermark` + a dedup-window TTL, or checkpoint the corpus
    * into the store and run the INCREMENTAL batch dedup (qn24) per
    * ingest — the streaming form is for the freshness path, not the
    * full-history one.
    */
  def dedupedDocs(docs: DataFrame): DataFrame =
    docs
      .withColumn("__h", md5(col("text").cast("binary")))
      .dropDuplicates("__h")
      .drop("__h")

  /** Running per-source ingest totals (docs, tokens, chars) — the
    * corpus-growth monitor a crawl pipeline keeps on screen. Keyed
    * aggregate: state is sources-sized; complete-mode output.
    */
  def sourceIngestTotals(docs: DataFrame): DataFrame =
    docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
      sum(col("n_chars")).as("sum_chars"))

  /** Streaming quality gate: per micro-batch, keep only docs passing
    * the qn18 rule set — the filter a pipeline runs BEFORE paying
    * storage for a crawl batch. Stateless (pure per-row predicate), so
    * it composes with [[dedupedDocs]] upstream or downstream.
    */
  def qualityFiltered(docs: DataFrame): DataFrame =
    docs.where(TextOps.qualityRules(col("text")).keep)
}
