package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.store.Store

/** End-to-end queries through the versioned [[graft.store.Store]] (the
  * faithful layer, SURVEY.md §2.1/2.2). Each loads fixture data into a
  * fresh temp-dir store, reads it back through the store's version
  * semantics, and aggregates — so the DuckDB oracle (plain SQL over the
  * original parquet) only matches if the store round-trip is lossless and
  * the version selection (accumulate / use_last / keep_last) is right.
  */
object StoreQueries {

  private def freshStore(s: SparkSession): Store =
    new Store(s, graft.TempDirs.create("graft_store_"))

  /** The shared money contract: exact DECIMAL sum cast to double (ties
    * in double summation order differ between engines) + row count.
    */
  private def totalN: Seq[org.apache.spark.sql.Column] = Seq(
    sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"),
    count(lit(1)).as("n"))

  /** Write with an ID-range partition key, read back `use_last`, aggregate
    * per range bucket. Round-trip fidelity + ID bucketing (README.md:200-207).
    */
  private def roundtripIdKey(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    val orders = Tables.read(s, dir, "orders")
    store.load(orders, "tpch/orders", Map("o_custkey" -> Store.KeyId), externalKey = "v1")
    store.get("tpch/orders", useLast = true)
      .groupBy((floor(col("o_custkey") / 1000) * 1000).cast("long").as("cust_bucket"))
      .agg(totalN.head, totalN.tail: _*)
      .orderBy("cust_bucket")
  }

  /** Two versions loaded, no selector on read → union of all versions
    * (accumulate semantics, README.md:86). Split/merge must reconstruct the
    * full table exactly.
    */
  private def versionAccumulate(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    val orders = Tables.read(s, dir, "orders")
    // coalesce: a null o_orderdate fails BOTH `cut` and `!cut` (NULL is
    // not true), silently vanishing from the split while the oracle
    // keeps it — partition exhaustively instead.
    val cut = year(col("o_orderdate")) < 1998
    store.load(orders.where(coalesce(cut, lit(true))), "tpch/orders", externalKey = "old")
    store.load(orders.where(coalesce(!cut, lit(false))), "tpch/orders", externalKey = "new")
    store.get("tpch/orders")
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(totalN.head, totalN.tail: _*)
      .orderBy("order_year")
  }

  /** `keep_last=true` load supersedes prior versions (client.py:72,
    * README.md:114-124): only the second load's rows survive.
    */
  private def keepLastOverwrite(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    val orders = Tables.read(s, dir, "orders")
    store.load(orders, "tpch/orders", externalKey = "v1")
    store.load(orders.where(col("o_orderstatus") === "F"), "tpch/orders",
      externalKey = "v2", keepLast = true)
    store.get("tpch/orders")
      .groupBy("o_orderpriority")
      .agg(totalN.head, totalN.tail: _*)
      .orderBy("o_orderpriority")
  }

  /** Version retention sweep ([[Store.vacuum]]): three versioned loads,
    * vacuum to the newest two, accumulate-read — exactly the dropped
    * version's rows must vanish, and the oracle states the surviving
    * slice from the load predicates. Labels are chosen to sort in load
    * order (v1 < v2 < v3) so the recency tiebreak is exercised safely
    * even when all three loads land within one mtime tick.
    */
  private def vacuumRetention(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    val orders = Tables.read(s, dir, "orders")
    val y = year(col("o_orderdate"))
    store.load(orders.where(coalesce(y < 1996, lit(true))), "tpch/orders",
      externalKey = "v1")
    store.load(orders.where(coalesce(y === 1996, lit(false))), "tpch/orders",
      externalKey = "v2")
    store.load(orders.where(coalesce(y >= 1997, lit(false))), "tpch/orders",
      externalKey = "v3")
    store.vacuum("tpch/orders", keepVersions = 2)
    store.get("tpch/orders")
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(totalN.head, totalN.tail: _*)
      .orderBy("order_year")
  }

  /** Table cloning ([[Store.clone]]): snapshot-branch a table, then
    * write a new version into the ORIGINAL — the clone must still read
    * exactly the pre-clone data (accumulate semantics frozen at clone
    * time), which the oracle states from the load predicate.
    */
  private def cloneIsolation(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    val orders = Tables.read(s, dir, "orders")
    val y = year(col("o_orderdate"))
    store.load(orders.where(coalesce(y < 1997, lit(true))), "tpch/orders",
      externalKey = "v1")
    store.clone("tpch/orders", "tpch/orders_branch")
    store.load(orders.where(coalesce(y >= 1997, lit(false))), "tpch/orders",
      externalKey = "v2")
    store.get("tpch/orders_branch")
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(totalN.head, totalN.tail: _*)
      .orderBy("order_year")
  }

  /** Date-key partitioning (README.md:191-198): month-grain derived read
    * through partition-pruned directories; prune filter on `__p_*` column.
    */
  private def datePartitionPrune(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    val orders = Tables.read(s, dir, "orders")
      .where(year(col("o_orderdate")) === 1997)
    store.load(orders, "tpch/orders_97", Map("o_orderdate" -> Store.KeyDate),
      externalKey = "v1")
    store.getPartitioned("tpch/orders_97", useLast = true)
      .where(col(Store.partColName("o_orderdate")).cast("string") >= "1997-06-01")
      .groupBy(month(col("o_orderdate")).as("o_month"))
      .agg(totalN.head, totalN.tail: _*)
      .orderBy("o_month")
  }

  /** Three disjoint accumulate loads into ONE version, then [[Store.compact]]
    * rewrites the version subtree (one file per partition dir). The oracle
    * over plain `orders` only matches if compaction is lossless AND the
    * three appends reassemble the full table.
    */
  private def compactRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    val orders = Tables.read(s, dir, "orders")
    (0 until 3).foreach { i =>
      store.load(orders.where(pmod(col("o_orderkey"), lit(3)) === i),
        "tpch/orders_c", Map("o_custkey" -> Store.KeyId), externalKey = "v1")
    }
    store.compact("tpch/orders_c")
    store.get("tpch/orders_c", externalKey = Some("v1"))
      .groupBy((floor(col("o_custkey") / 1000) * 1000).cast("long").as("cust_bucket"))
      .agg(totalN.head, totalN.tail: _*)
      .orderBy("cust_bucket")
  }

  /** Date-key partitioning pruned by the OPTIMIZER RULE from a NATURAL
    * data-column predicate: unlike qs04 (whose filter names the derived
    * `__p_*` column explicitly), the user here writes the predicate they
    * would write against any table — `where(col("o_date") >= DATE
    * '1997-06-01')` — and [[org.apache.spark.sql.graft.DatePartitionPruningRule]]
    * (installed session-wide via [[graft.Graft.installPruningRule]], the
    * same rules `GraftExtensions` deploys) derives the partition
    * conjunct. ScaleSpec asserts this exact query shape scans fewer
    * files than the version holds; the oracle grades the values.
    */
  private def naturalDatePrune(s: SparkSession, dir: String): DataFrame = {
    val g = graft.Graft(s, graft.TempDirs.create("graft_store_"))
      .installPruningRule()
    val orders = Tables.read(s, dir, "orders")
      .where(year(col("o_orderdate")) === 1997)
      .withColumn("o_date", col("o_orderdate").cast("date"))
    g.store.load(orders, "tpch/orders_97n", Map("o_date" -> Store.KeyDate),
      externalKey = "v1")
    g.store.getPartitioned("tpch/orders_97n", useLast = true)
      .where(col("o_date") >= lit("1997-06-01").cast("date"))
      .groupBy(month(col("o_date")).as("o_month"))
      .agg(totalN.head, totalN.tail: _*)
      .orderBy("o_month")
  }

  /** CDC merge chain: base load, an upsert delta (updates + inserts),
    * then a delta with tombstone deletes; [[Store.getMerged]] resolves
    * newest-wins-per-key at read time. The oracle replays the same three
    * batches in SQL (anti-join + union), so it only matches if merge
    * resolution picks exactly the right version of every key and drops
    * exactly the tombstoned keys. Values pass through unrounded — both
    * engines carry the identical doubles.
    */
  private def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    val orders = Tables.read(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val key = col("o_orderkey")
    store.load(orders.where(pmod(key, lit(4)) =!= 3), "tpch/orders_cdc",
      Map("o_orderkey" -> Store.KeyId), externalKey = "v1")
    // Delta 1: keys % 5 == 0 get +1000 (an update where the key exists
    // in base, an insert where base skipped it via % 4 == 3).
    store.merge(
      orders.where(pmod(key, lit(5)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000d),
      "tpch/orders_cdc", Seq("o_orderkey"), externalKey = "v2")
    // Delta 2: keys % 7 == 0 are tombstoned; keys % 11 == 0 get 2x.
    store.merge(
      orders.where(pmod(key, lit(7)) === 0 || pmod(key, lit(11)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2d)
        .withColumn("is_del", pmod(key, lit(7)) === 0),
      "tpch/orders_cdc", Seq("o_orderkey"), externalKey = "v3",
      deleteCol = Some("is_del"))
    store.getMerged("tpch/orders_cdc")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Copy-on-write fold ([[Store.materializeMerged]]) graded
    * end-to-end: base + one upsert/tombstone delta, fold the chain into
    * one plain version, then read THE FOLDED VERSION via `use_last` —
    * it must equal the merge-on-read final state, which the oracle
    * restates from the delta predicates. This is the compaction half of
    * the CDC story (qs07 grades the read half).
    */
  /** Partition-layout migration ([[Store.rekey]]): a Date-keyed table
    * with two versions AND a rolled-back `_last` pointer republishes
    * under a Date×ID layout. Graded three ways at once: the accumulate
    * read over the migrated table reconstructs the full corpus exactly
    * (per-bucket money contract), `use_last` still serves v1 (the
    * migration carries the POINTER, not just data — a rolled-back
    * source must not silently "un-rollback"), and the pinned v2 read
    * proves version labels survive. The new ID key makes the
    * per-customer bucket aggregate prunable — the point of the
    * migration at 100 TB.
    */
  private def rekeyMigration(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    // Year granularity for the fixture: a month-grained Date key at
    // sf0.1 crosses ~84 date dirs x ~15 ID buckets per version — a
    // tiny-files benchmark, not a migration one (measured 9.2 s vs
    // ~4 s; the layout MECHANICS are identical at year grain).
    val orders = Tables.read(s, dir, "orders")
      .withColumn("o_year", trunc(col("o_orderdate").cast("date"), "year"))
    val cut = year(col("o_orderdate")) < 1997
    store.load(orders.where(coalesce(cut, lit(true))), "tpch/orders_bydate",
      Map("o_year" -> Store.KeyDate), externalKey = "v1")
    store.load(orders.where(coalesce(!cut, lit(false))), "tpch/orders_bydate",
      Map("o_year" -> Store.KeyDate), externalKey = "v2")
    store.rollback("tpch/orders_bydate", "v1")
    store.rekey("tpch/orders_bydate", "tpch/orders_bykey",
      Map("o_year" -> Store.KeyDate, "o_custkey" -> Store.KeyId))
    val lastN = store.get("tpch/orders_bykey", useLast = true)
      .agg(count(lit(1)).as("n_last"))
    val v2N = store.get("tpch/orders_bykey", Some("v2"))
      .agg(count(lit(1)).as("n_v2"))
    store.get("tpch/orders_bykey")
      .groupBy((floor(col("o_custkey") / 1000) * 1000).cast("long").as("cust_bucket"))
      .agg(totalN.head, totalN.tail: _*)
      .crossJoin(lastN).crossJoin(v2N)
      .orderBy("cust_bucket")
  }

  private def materializeFold(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    val orders = Tables.read(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val key = col("o_orderkey")
    store.load(orders, "tpch/orders_cow", externalKey = "v1")
    store.merge(
      orders.where(pmod(key, lit(5)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000d)
        .withColumn("is_del", pmod(key, lit(7)) === 0),
      "tpch/orders_cow", Seq("o_orderkey"), externalKey = "v2",
      deleteCol = Some("is_del"))
    store.materializeMerged("tpch/orders_cow")
    store.get("tpch/orders_cow", useLast = true)
      .groupBy("o_orderstatus")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** Data-skipping lifecycle end-to-end: three appends write per-file
    * min/max sidecars, OPTIMIZE-style compact Z-ORDERs the version by
    * (o_custkey, o_totalprice), and the read scans only files whose
    * recorded o_custkey range intersects the predicate
    * ([[Store.getStatsPruned]]) — file skipping on a NON-partition
    * column, the complement to qs04/qs06's directory pruning.
    * StoreStatsSpec asserts the skipping rate on this exact shape; the
    * oracle (plain SQL with the same BETWEEN) grades that skipping
    * never drops or duplicates a row.
    */
  private def statsZorderPrune(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    val orders = Tables.read(s, dir, "orders")
    (0 until 3).foreach { i =>
      store.load(orders.where(pmod(col("o_orderkey"), lit(3)) === i),
        "tpch/orders_z", externalKey = "v1",
        statsCols = Seq("o_custkey", "o_totalprice"))
    }
    store.compact("tpch/orders_z", targetFileBytes = 256L * 1024,
      zorderBy = Seq("o_custkey", "o_totalprice"))
    store.getStatsPruned("tpch/orders_z", "o_custkey", 100L, 500L,
      externalKey = Some("v1"))
      .groupBy((floor(col("o_custkey") / 100) * 100).cast("long").as("cust_bucket"))
      .agg(totalN.head, totalN.tail: _*)
      .orderBy("cust_bucket")
  }

  /** Version-diff audit: v1 = ¾ of orders, v2 = an overlapping ¾ with a
    * price bump on every 5th key; [[Store.versionDiff]] keyed by
    * o_orderkey must recover added / removed / changed exactly (the
    * oracle states the closed form). The unchanged rows keep their
    * o_totalprice BIT-identical (when/otherwise, no `+ 0.0`), so any
    * false 'changed' row is a real diff bug, not FP noise.
    */
  private def versionDiffAudit(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    val orders = Tables.read(s, dir, "orders")
    store.load(orders.where(col("o_orderkey") % 4 =!= 0),
      "tpch/orders", externalKey = "v1")
    store.load(
      orders.where(col("o_orderkey") % 4 =!= 3)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice"))),
      "tpch/orders", externalKey = "v2")
    store.versionDiff("tpch/orders", "v1", "v2", Seq("o_orderkey"))
      .orderBy("o_orderkey", "change")
  }

  /** Schema evolution across accumulate versions: v1 ships 3 columns,
    * v2 the same 3 plus `o_orderpriority`. An un-keyed `get` must read
    * both through the sidecar-unioned schema — v1 rows surface the new
    * column as NULL (bucketed to a sentinel here so the group-by is
    * total), v2 rows keep their real priority, and no row is dropped or
    * mistyped. The oracle reconstructs the same split from `o_orderkey`
    * parity, so it only matches if BOTH halves round-trip and the
    * late-added column never bleeds into pre-evolution rows.
    */
  private def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    val orders = Tables.read(s, dir, "orders")
    val pre = col("o_orderkey") % 2 === 0
    store.load(
      orders.where(pre).select("o_orderkey", "o_orderstatus", "o_totalprice"),
      "tpch/orders_ev", externalKey = "v1")
    store.load(
      orders.where(!pre)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
      "tpch/orders_ev", externalKey = "v2")
    store.get("tpch/orders_ev")
      .groupBy(coalesce(col("o_orderpriority"), lit("<pre-schema>")).as("priority"))
      .agg(totalN.head, totalN.tail: _*)
      .orderBy("priority")
  }

  /** ORC interchange round-trip: load orders into a versioned table,
    * export the `use_last` selection as chunked ORC, re-import from ORC
    * file metadata alone (no schema inference), and aggregate the
    * REIMPORT — the oracle (plain SQL over the original parquet)
    * matches only if store versioning, the ORC writer, and the
    * metadata-driven reader are jointly lossless. Complements the
    * gzip-CSV compat path (qs05 exercises the store tree; StoreSpec
    * exercises CSV): CSV is the reference's wire format, ORC is the
    * type-preserving warehouse interchange.
    */
  private def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val store = freshStore(s)
    store.load(Tables.read(s, dir, "orders"), "tpch/orders_orc",
      Map("o_custkey" -> Store.KeyId))
    val out = graft.TempDirs.create("graft_orc_")
    store.exportOrc("tpch/orders_orc", out, useLast = true)
    store.importOrc(out)
      .groupBy(col("o_orderpriority"))
      .agg(totalN.head, totalN.tail: _*)
      .orderBy("o_orderpriority")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("qs01_store_roundtrip_idkey", roundtripIdKey _, Some("""
      SELECT CAST(floor(o_custkey / 1000) * 1000 AS BIGINT) AS cust_bucket,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM orders
      GROUP BY 1
      ORDER BY cust_bucket""")),
    QueryDef("qs02_store_version_accumulate", versionAccumulate _, Some("""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM orders
      GROUP BY 1
      ORDER BY order_year""")),
    QueryDef("qs03_store_keep_last", keepLastOverwrite _, Some("""
      SELECT o_orderpriority,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM orders
      WHERE o_orderstatus = 'F'
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")),
    QueryDef("qs04_store_date_prune", datePartitionPrune _, Some("""
      SELECT CAST(month(o_orderdate) AS INTEGER) AS o_month,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM orders
      WHERE year(o_orderdate) = 1997
        AND CAST(o_orderdate AS DATE) >= DATE '1997-06-01'
      GROUP BY 1
      ORDER BY o_month""")),
    QueryDef("qs05_store_compact", compactRoundtrip _, Some("""
      SELECT CAST(floor(o_custkey / 1000) * 1000 AS BIGINT) AS cust_bucket,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM orders
      GROUP BY 1
      ORDER BY cust_bucket""")),
    QueryDef("qs06_store_natural_date_prune", naturalDatePrune _, Some("""
      SELECT CAST(month(o_orderdate) AS INTEGER) AS o_month,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM orders
      WHERE year(o_orderdate) = 1997
        AND CAST(o_orderdate AS DATE) >= DATE '1997-06-01'
      GROUP BY 1
      ORDER BY o_month""")),
    QueryDef("qs07_store_merge_cdc", mergeUpsert _, Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 4 <> 3),
      m1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice + 1000 AS o_totalprice
        FROM orders WHERE o_orderkey % 5 = 0),
      m2 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
               (o_orderkey % 7 = 0) AS is_del
        FROM orders WHERE o_orderkey % 7 = 0 OR o_orderkey % 11 = 0),
      r1 AS (
        SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM m1)
        UNION ALL SELECT * FROM m1),
      r2 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM r1
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM m2)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM m2 WHERE NOT is_del)
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM r2 ORDER BY o_orderkey""")),
    QueryDef("qs08_store_zorder_skip", statsZorderPrune _, Some("""
      SELECT CAST(floor(o_custkey / 100) * 100 AS BIGINT) AS cust_bucket,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM orders
      WHERE o_custkey BETWEEN 100 AND 500
      GROUP BY 1
      ORDER BY cust_bucket""")),
    QueryDef("qs09_store_version_diff", versionDiffAudit _, Some("""
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 4 = 0 THEN 'added'
                  WHEN o_orderkey % 4 = 3 THEN 'removed'
                  ELSE 'changed' END AS change
      FROM orders
      WHERE o_orderkey % 4 = 0 OR o_orderkey % 4 = 3
         OR (o_orderkey % 4 IN (1, 2) AND o_orderkey % 5 = 0)
      ORDER BY o_orderkey, change""")),
    QueryDef("qs10_store_schema_evolution", schemaEvolution _, Some("""
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<pre-schema>'
                  ELSE o_orderpriority END AS priority,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM orders
      GROUP BY 1
      ORDER BY priority""")),
    QueryDef("qs11_store_orc_roundtrip", orcRoundtrip _, Some("""
      SELECT o_orderpriority,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")),
    QueryDef("qs12_store_vacuum", vacuumRetention _, Some("""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM orders
      WHERE year(o_orderdate) >= 1996
      GROUP BY 1
      ORDER BY order_year""")),
    QueryDef("qs13_store_clone", cloneIsolation _, Some("""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM orders
      WHERE year(o_orderdate) < 1997 OR o_orderdate IS NULL
      GROUP BY 1
      ORDER BY order_year""")),
    QueryDef("qs14_store_materialize", materializeFold _, Some("""
      WITH fin AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000
                    ELSE o_totalprice END AS p
        FROM orders
        WHERE NOT (o_orderkey % 5 = 0 AND o_orderkey % 7 = 0))
      SELECT o_orderstatus,
             CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM fin
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")),
    QueryDef("qs15_store_rekey", rekeyMigration _, Some("""
      SELECT CAST(floor(o_custkey / 1000) * 1000 AS BIGINT) AS cust_bucket,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n,
             (SELECT count(*) FROM orders
              WHERE year(o_orderdate) < 1997 OR o_orderdate IS NULL) AS n_last,
             (SELECT count(*) FROM orders
              WHERE year(o_orderdate) >= 1997) AS n_v2
      FROM orders
      GROUP BY 1
      ORDER BY cust_bucket"""))
  )
}
