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

  /** One JSON object per row, Spark-distributed (`df.toJSON`). */
  def toJsonRecords(df: DataFrame): Dataset[String] = df.toJSON

  /** Rebuild a DataFrame from row-JSON with schema inference. */
  def fromJsonRecords(spark: SparkSession, json: Dataset[String]): DataFrame =
    spark.read.json(json)
}
