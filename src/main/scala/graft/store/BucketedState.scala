package graft.store

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Versioned HASH-BUCKETED parquet state — the storage layout that lets a
  * recurring join against a large, slowly-growing state table skip the
  * state-side shuffle entirely (storage-partitioned join).
  *
  * Why it exists: an incremental pipeline (near-dup dedup state, qn110's
  * corpus ingest) joins every delta against the FULL accumulated state.
  * Stored as plain parquet, each ingest re-Exchanges (and re-sorts) the
  * state by the join key — measured 1.93× wall per 2× state at fixed
  * delta (SCALEBENCH_r14_delta.log), the removable half of the ingest
  * cost. Stored as a bucketed table, the scan itself reports
  * `HashPartitioning(bucketCol, numBuckets)`, so the planner shuffles
  * ONLY the delta side: the state is read in place, every ingest, no
  * matter how large it grows. This is Spark's native bucketed-table
  * machinery (CLUSTERED BY ... INTO n BUCKETS), not a private format —
  * any Spark reader that registers the location reads it.
  *
  * Layout: `<root>/v_<version>/` holds one bucketed parquet table per
  * ingest (bucket files named `part-*_<bucketId>.parquet`), plus a
  * `_bucketspec` sidecar recording `<numBuckets>\n<bucketCol>` so a
  * fresh session (or a different reader) can re-register the table
  * without being told the spec. Versions are replace-on-rewrite: a
  * replayed streaming batch overwrites its own version subtree, the
  * same idempotence contract as [[Store.load]]'s `b<batchId>` versions.
  * A [[Store]] root can host these dirs directly — `Store.list` only
  * recognizes MetaFile-bearing dirs as tables, so state dirs stay
  * invisible to the catalog surface.
  *
  * Readers get ONE DataFrame per version (never a pre-unioned frame):
  * `Union` erases output partitioning, so the caller joins each slice
  * separately and unions the (small) join RESULTS — see
  * [[graft.ops.Dedup.dedupIncrementalSliced]]. Slice count = ingests
  * since the last compaction; [[compact]] folds them back to one.
  *
  * Catalog note: bucketing metadata lives in the session catalog, so
  * every slice is registered under a deterministic path-hashed name
  * (`graft_bstate_<md5(path)>`) on first read and re-registered from
  * the sidecar after a restart. The bucket SORT is also declared, but
  * stock Spark ignores stored bucket ordering at read (the legacy
  * `bucketedTableScan.outputOrdering` conf gates it), so plans keep a
  * local per-partition sort — no exchange — unless a deployment opts
  * into that conf.
  */
object BucketedState {

  private val SpecFile = "_bucketspec"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Deterministic catalog name for the table at `path` (session-global
    * namespace; the hash keys the full path so distinct roots/versions
    * never collide).
    */
  private[graft] def tableName(path: String): String =
    "graft_bstate_" + md5hex(path).take(16)

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionPath(root: String, version: String): Path =
    new Path(root, s"v_$version")

  /** Write one version of the state, hash-bucketed and bucket-sorted by
    * `bucketCol`. The repartition puts exactly one bucket per task so
    * each bucket lands in ONE file (the shape sorted-bucket readers
    * want). Overwrite semantics: rewriting an existing version replaces
    * it — replay-idempotent.
    */
  def write(
      df: DataFrame,
      root: String,
      version: String,
      bucketCol: String,
      numBuckets: Int): Unit = {
    require(numBuckets >= 1, "numBuckets must be >= 1")
    val spark = df.sparkSession
    val path = versionPath(root, version)
    val name = tableName(path.toString)
    // Replay idempotence ACROSS a session restart: same-session rewrites
    // find the catalog entry and take the insert-overwrite path, but a
    // fresh session replaying a crashed write (data files landed, the
    // sidecar — written last — did not) has no catalog entry, and
    // saveAsTable would then go through CTAS, which refuses a non-empty
    // location (Spark 4 default). Clear the debris first: without a
    // sidecar the dir is not a readable version ([[versions]] skips it),
    // so deleting it loses nothing the replay isn't about to rewrite.
    if (!spark.catalog.tableExists(name)) {
      val f0 = fs(spark, path)
      if (f0.exists(path)) f0.delete(path, true)
    }
    df.repartition(numBuckets, col(bucketCol))
      .write.format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path.toString)
      .mode(SaveMode.Overwrite)
      .saveAsTable(name)
    val f = fs(spark, path)
    val out = f.create(new Path(path, SpecFile), true)
    try out.write(s"$numBuckets\n$bucketCol".getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Versions present under `root`, sorted. */
  def versions(spark: SparkSession, root: String): Seq[String] = {
    val rootP = new Path(root)
    val f = fs(spark, rootP)
    if (!f.exists(rootP)) Seq.empty
    else f.listStatus(rootP).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v_"))
      // A crashed write can leave a dir without its sidecar (written
      // last): not a readable version yet, the replay will rewrite it.
      .filter(st => f.exists(new Path(st.getPath, SpecFile)))
      .map(_.getPath.getName.stripPrefix("v_"))
      .sorted
  }

  def exists(spark: SparkSession, root: String): Boolean =
    versions(spark, root).nonEmpty

  private def readSpec(spark: SparkSession, path: Path): (Int, String) = {
    val f = fs(spark, path)
    val specP = new Path(path, SpecFile)
    val buf = new Array[Byte](f.getFileStatus(specP).getLen.toInt)
    val in = f.open(specP)
    try in.readFully(buf) finally in.close()
    val lines = new String(buf, StandardCharsets.UTF_8).split("\n", 2)
    (lines(0).trim.toInt, lines(1).trim)
  }

  /** One version as a catalog-registered BUCKETED DataFrame: scanning it
    * reports `HashPartitioning(bucketCol, numBuckets)`, so an equi-join
    * on the bucket column shuffles only the other side. Re-registers
    * from the sidecar when the session catalog doesn't know the table
    * (fresh session after a restart).
    */
  def slice(spark: SparkSession, root: String, version: String): DataFrame = {
    val path = versionPath(root, version)
    val name = tableName(path.toString)
    if (!spark.catalog.tableExists(name)) {
      val (buckets, bucketCol) = readSpec(spark, path)
      val schema = spark.read.parquet(path.toString).schema
      spark.sql(
        s"""CREATE TABLE $name (${schema.toDDL})
           |USING PARQUET
           |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
           |INTO $buckets BUCKETS
           |LOCATION '${path.toString}'""".stripMargin)
    }
    spark.table(name)
  }

  /** Every version as its own bucketed slice (see the class doc for why
    * they are not pre-unioned).
    */
  def slices(spark: SparkSession, root: String): Seq[DataFrame] =
    versions(spark, root).map(v => slice(spark, root, v))

  /** Fold all versions into one (`version` names the result) — the
    * compaction that bounds slice count between ingests. Reads every
    * slice, rewrites one bucketed table, then drops the old subtrees.
    * Runs at state-scan cost; schedule it like any compaction (nightly,
    * or at a slice-count watermark), not per ingest.
    */
  def compact(
      spark: SparkSession,
      root: String,
      version: String,
      bucketCol: String,
      numBuckets: Int): Unit = {
    val old = versions(spark, root)
    require(old.nonEmpty, s"no versions to compact under $root")
    require(!old.contains(version),
      s"compaction version '$version' already exists under $root")
    val all = slices(spark, root).reduce(_ unionByName _)
    write(all, root, version, bucketCol, numBuckets)
    val rootP = new Path(root)
    val f = fs(spark, rootP)
    old.foreach { v =>
      val p = versionPath(root, v)
      spark.sql(s"DROP TABLE IF EXISTS ${tableName(p.toString)}")
      f.delete(p, true)
    }
  }
}
