package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark DataFrame program plus (when SQL-expressible)
  * an equivalent ANSI SQL oracle the driver runs in DuckDB over the same
  * parquet tables.
  *
  * Contract notes (driver compares sorted-by-name columns, then hashes
  * values):
  *   - every computed column is aliased identically on both sides;
  *   - results carry a total ORDER BY on a unique key so row order is
  *     deterministic in both engines;
  *   - floating-point aggregates are rounded on both sides (double
  *     summation order differs between engines at the ulp level);
  *   - oracle SQL casts DuckDB's wider defaults (HUGEINT sums, BIGINT
  *     `year`/`length`/`row_number`) down to Spark's result types.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
