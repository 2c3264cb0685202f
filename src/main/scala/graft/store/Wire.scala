package graft.store

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Row-oriented JSON wire-format shims, API-compat with the reference's
  * transport: upload serializes `df.to_json(orient='records')`
  * (client.py:114) and download rebuilds a frame from JSON
  * (client.py:176). Internal storage is Parquet (see [[Store]]) — these
  * exist only so callers exchanging row-JSON with reference-era clients can
  * round-trip through this engine.
  *
  * Note the reference's wire format is lossy (timestamps → epoch millis,
  * SURVEY.md §1.1); `fromJsonRecords` therefore re-infers schema exactly
  * like `pd.DataFrame(response.json())` does.
  */
object Wire {

  /** One JSON object per row, Spark-distributed (`df.toJSON`).
    * Timestamp columns are pre-converted to EPOCH MILLIS to match the
    * reference wire (`to_json(orient='records')` emits numeric epochs;
    * Spark's own toJSON would emit ISO-8601 strings, which a
    * reference-era consumer parsing numbers mis-types).
    */
  def toJsonRecords(df: DataFrame): Dataset[String] = {
    import org.apache.spark.sql.functions.{col, lit, timestamp_diff, unix_millis}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val wireCols = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType => unix_millis(col(f.name)).as(f.name)
        case TimestampNTZType =>
          // Naive timestamps epoch-encode AS IF UTC (pandas to_json treats
          // naive datetimes as UTC); a cast(TimestampType) would interpret
          // them in spark.sql.session.timeZone and shift the wire value on
          // any non-UTC session. timestamp_diff against an NTZ epoch
          // literal stays entirely in the naive domain — no zone math.
          timestamp_diff("MILLISECOND",
            lit(java.time.LocalDateTime.of(1970, 1, 1, 0, 0)),
            col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(wireCols.toSeq: _*).toJSON
  }

  /** Rebuild a DataFrame from row-JSON with schema inference. */
  def fromJsonRecords(spark: SparkSession, json: Dataset[String]): DataFrame =
    spark.read.json(json)
}
