package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.store.Store

/** Single entry point for library users — the reference's
  * `DataFrameClient` analog (client.py:40-64), Spark-first: construct one
  * `Graft` per store root, use the returned [[graft.store.Store]] for
  * load/get/list, the `ops`/`operators`/`streaming` packages for
  * computation, and [[registerSql]] to make the custom expressions
  * callable from `spark.sql`.
  *
  * {{{
  * val g = Graft(spark, "/data/warehouse")
  * g.store.load(df, "proj/orders", Map("o_orderdate" -> Store.KeyDate))
  * val back = g.store.get("proj/orders", useLast = true)
  * val dups = graft.ops.Dedup.dedupByJaccard(docs, "doc_id", "text")
  * }}}
  */
final case class Graft(
    spark: SparkSession,
    root: String,
    idBucketWidth: Long = 1000L,
    maxRecordsPerFile: Long = 0L) {

  /** The versioned, partitioned DataFrame store rooted at `root`. */
  val store: Store = new Store(spark, root, idBucketWidth, maxRecordsPerFile)

  /** Register vec_dot / simhash64 / word_shingles / minhash_signature as
    * SQL functions in this session.
    */
  def registerSql(): Graft = {
    org.apache.spark.sql.graft.GraftFunctionRegistry.register(spark)
    this
  }

  /** Install the ID-range and Date partition-pruning rewrites for this
    * session (idempotent). Both rules are exprId-guarded no-ops on plans
    * without store partition columns, so leaving them installed is safe
    * session-wide.
    */
  def installPruningRule(): Graft = {
    val wanted = Seq(
      org.apache.spark.sql.graft.IdRangePruningRule,
      org.apache.spark.sql.graft.DatePartitionPruningRule)
    val rules = spark.experimental.extraOptimizations
    val missing = wanted.filterNot(rules.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = rules ++ missing
    this
  }

  /** Read a fixture/any parquet table (convenience). */
  def table(path: String): DataFrame = spark.read.parquet(path)
}
