package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.store.BucketedState
import graft.streaming.DocStreams

/** Deployment-scenario probe (r18, VERDICT r17 #4): the out-of-band
  * state fold RACING a LIVE ingest stream, measured end to end at real
  * state size. The loud-failure contract is spec'd at fixture scale
  * (BucketedStateSpec / StreamingSpec); this instrument prices it:
  *
  *  1. state is pre-built at ~4/5 of `nDocs` (two bucketed slices per
  *     surface, labels `p0`/`p1` — outside the stream's `b<id>`
  *     namespace so replay never rewrites them);
  *  2. a real file-source stream ingests the remaining docs as two
  *     micro-batches through [[DocStreams.nearDupDedupedTo]];
  *  3. the moment the checkpoint WALs batch 1 (`offsets/1` lands),
  *     [[DocStreams.compactDedupState]] fires from the probe thread
  *     with ONLY the checkpoint — exclusions derived, no manual set;
  *  4. batch 1's next state write hits the lease and the query dies
  *     LOUDLY (recorded), the fold completes (its wall recorded);
  *  5. the stream restarts against the folded state, replays batch 1
  *     (its wall from the progress events = the replay cost the
  *     verdict asked to price), and finishes;
  *  6. the survivor set and every state surface are compared with a
  *     control run of the same batches that never folded.
  *
  * Prints one JSON line. If the fold wins the race outright (all three
  * surfaces folded before batch 1 reached a write), `failed_batch` is
  * null and the replay figures degrade to the no-collision case —
  * reported honestly rather than forced.
  *
  * Usage: `SPARK_DRIVER_MEM=48g sbt 'runMain graft.tools.FoldRaceProbe [nDocs]'`
  */
object FoldRaceProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.aggregate.map.twolevel.enabled", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.hadoop.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = ScaleData.documents(spark, n).cache()
    docs.count()
    val stateN = n * 4 / 5
    val batchN = (n - stateN) / 2

    // Stage the two stream micro-batches as files (one file = one batch).
    val srcDir = java.nio.file.Paths.get(graft.TempDirs.create("graft_fr_src_"))
    Seq(0, 1).foreach { i =>
      val lo = stateN + i * batchN
      val hi = if (i == 1) n else lo + batchN
      val tmp = java.nio.file.Paths.get(graft.TempDirs.create(s"graft_fr_b${i}_"))
      docs.where(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dest = srcDir.resolve(s"batch$i.parquet")
      java.nio.file.Files.move(part, dest)
      dest.toFile.setLastModified(1700000000000L + i.toLong * 60000L)
    }

    /** Pre-build the three-surface state (labels outside `b<id>`). */
    def buildState(store: graft.store.Store): Unit = {
      val half = stateN / 2
      Seq(("p0", col("doc_id") < half),
        ("p1", col("doc_id") >= half && col("doc_id") < stateN))
        .foreach { case (label, pred) =>
          val sig = Dedup.materialize(
            Dedup.shingleSignatures(docs.where(pred), "doc_id", "text", n = 3))
          BucketedState.write(sig, store.statePath("streaming/neardup-sigs"),
            label, "s", numBuckets = 32)
          BucketedState.write(Dedup.shingleDocFreqs(sig),
            store.statePath("streaming/neardup-freqs"), label, "s",
            numBuckets = 32)
          BucketedState.write(Dedup.shingleSignatureCounts(sig),
            store.statePath("streaming/neardup-sigs-counts"), label, "id",
            numBuckets = 32)
        }
    }

    def sorted(xs: Set[Long]): Seq[Long] = xs.toSeq.sorted
    def survivors(outDir: String): Set[Long] =
      spark.read.parquet(outDir).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    def stateDocs(store: graft.store.Store): Long =
      BucketedState.family(spark,
        store.statePath("streaming/neardup-sigs-counts")).count()

    val t0 = System.nanoTime()
    def now(): Double = (System.nanoTime() - t0) / 1e9

    // ---- the raced run -------------------------------------------------
    val store = new graft.store.Store(spark, graft.TempDirs.create("graft_fr_st_"))
    buildState(store)
    val outDir = graft.TempDirs.create("graft_fr_out_") + "/kept"
    val ckpt = graft.TempDirs.create("graft_fr_ckpt_")
    def start() = DocStreams.nearDupDedupedTo(
      spark.readStream.schema(DocStreams.docSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString),
      store, outDir, maxSlices = 0)
      .option("checkpointLocation", ckpt).start()

    val streamStart = now()
    val q1 = start()
    // Fire the fold the moment batch 1 is write-ahead-logged.
    val off1 = java.nio.file.Paths.get(ckpt, "offsets", "1")
    while (!java.nio.file.Files.exists(off1) && q1.isActive) Thread.sleep(100)
    // The wait also exits if q1 DIED before batch 1 was ever WALed
    // (e.g. a batch-0 failure) — that is a broken harness, not a lease
    // collision; attributing it to batch 1 would record a false
    // collision in the artifact. Fail loudly instead.
    if (!java.nio.file.Files.exists(off1)) {
      System.err.println("[fold_race] query died before batch 1 was " +
        s"write-ahead-logged: ${Option(q1.exception.orNull).map(_.getMessage)} " +
        "— no collision to measure; aborting")
      spark.stop()
      sys.exit(2)
    }
    val foldT0 = now()
    DocStreams.compactDedupState(spark, store, "m0", checkpoint = Some(ckpt))
    val foldSec = now() - foldT0
    // Wait for the racing query's verdict, modeled as an explicit
    // outcome (the r18 artifact's failed_batch:-1 sentinel conflated
    // "no collision" with "committed then died" and could never match
    // a batchId in the replay lookup): "batch1" = died with batch 1
    // uncommitted (the expected lease collision, replay measurable);
    // "committed-then-died" = the stream slipped its writes in before
    // the fold reached that surface, committed batch 1, then died;
    // "none" = no collision at all.
    val collision: String =
      try { q1.processAllAvailable(); q1.stop(); "none" }
      catch { case _: Throwable =>
        val failAt = now() - streamStart
        System.err.println(f"[fold_race] query died at $failAt%.1f s " +
          s"after stream start: ${Option(q1.exception.orNull).map(_.getMessage)}")
        val committed = java.nio.file.Paths.get(ckpt, "commits", "1")
        if (java.nio.file.Files.exists(committed)) "committed-then-died"
        else "batch1"
      }
    // Replay duration is only meaningful for a genuine uncommitted
    // failed batch.
    val failedBatch: Option[Long] =
      if (collision == "batch1") Some(1L) else None
    val sigRoot = store.statePath("streaming/neardup-sigs")
    val foldedVersions = BucketedState.versions(spark, sigRoot)
    // Restart → replay the failed batch against the folded state.
    val replayT0 = now()
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val replaySec = now() - replayT0
    val replayBatchSec = q2.recentProgress
      .filter(p => failedBatch.contains(p.batchId))
      .map(_.durationMs.get("triggerExecution").toDouble / 1000).headOption

    // ---- the control run (same batches, never folded) ------------------
    val store2 = new graft.store.Store(spark, graft.TempDirs.create("graft_fr_ct_"))
    buildState(store2)
    val ctrlT0 = now()
    val ctrl = Seq(0, 1).flatMap { i =>
      val lo = stateN + i * batchN
      val hi = if (i == 1) n else lo + batchN
      DocStreams.dedupBatchAgainstStore(
        docs.where(col("doc_id") >= lo && col("doc_id") < hi), i.toLong,
        store2, maxSlices = 0)
        .select("doc_id").collect().map(_.getLong(0))
    }.toSet
    val ctrlSec = now() - ctrlT0

    val got = survivors(outDir)
    val survivorsEqual = got == ctrl
    val stateEqual = stateDocs(store) == stateDocs(store2)
    if (!survivorsEqual)
      System.err.println("[fold_race] DIVERGED: raced-only=" +
        sorted(got -- ctrl).take(20) + " control-only=" +
        sorted(ctrl -- got).take(20))
    val calib = {
      val c0 = System.nanoTime()
      docs.groupBy("lang").count().collect()
      (System.nanoTime() - c0) / 1e9
    }
    println(
      s"""{"probe":"fold_race","n_docs":$n,"state_docs":$stateN,""" +
        s""""batch_docs":$batchN,"fold_sec":$foldSec,""" +
        s""""collision":"$collision",""" +
        s""""failed_batch":${failedBatch.getOrElse("null")},""" +
        s""""replay_total_sec":$replaySec,""" +
        s""""replay_batch_sec":${replayBatchSec.getOrElse("null")},""" +
        s""""control_ingest_sec":$ctrlSec,""" +
        s""""live_versions":"${foldedVersions.mkString(",")}",""" +
        s""""survivors_equal":$survivorsEqual,"state_equal":$stateEqual,""" +
        s""""n_survivors":${got.size},"calibration_sec":$calib}""")
    spark.stop()
    if (!survivorsEqual || !stateEqual) sys.exit(1)
  }
}
