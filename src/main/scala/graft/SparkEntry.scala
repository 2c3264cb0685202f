package graft

import java.nio.file.Files

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EventQueries, NorthStar, QueryDef, Relational, StoreQueries}
import graft.store.Store

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    StoreQueries.defs ++ Relational.defs ++ EventQueries.defs ++ NorthStar.defs

  /** Flagship (SURVEY.md §7.2 slice 0): load lineitem into the versioned
    * store with a Date partition key, read it back via the `use_last`
    * pointer, and run the TPC-H Q1 aggregate over it. Driver smoke-checks
    * rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val store = new Store(spark, TempDirs.create("graft_entry_"))
    // Date-key on ship MONTH: per-day keys would mean ~1800 partition
    // dirs for 6000 rows (a 7-year date range at sf0.001) — a tiny-file
    // smoke test measuring filesystem overhead, not the engine. Per-day
    // layout is covered by qs04 + StoreSpec at realistic densities.
    store.load(
      Tables.read(spark, dir, "lineitem")
        .withColumn("l_ship_month", trunc(col("l_shipdate").cast("date"), "month")),
      "tpch/lineitem",
      Map("l_ship_month" -> Store.KeyDate))
    store.get("tpch/lineitem", useLast = true)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_base_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(registry.map(q => q.name -> q.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ListMap(registry.flatMap(q => q.oracle.map(q.name -> _.trim)): _*)
}
