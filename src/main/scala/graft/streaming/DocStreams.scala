package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

import graft.ops.{Dedup, TextOps}
import graft.store.{BucketedState, Store}

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

  /** Running per-source dataset-card slice — the streaming form of the
    * batch dataset card (qn77) for the columns that are pure running
    * aggregates: doc/token counts, language mix, and the qn18 quality
    * pass rate (same [[TextOps.qualityRules]] expressions, so stream ≡
    * batch bit-for-bit — StreamingSpec). The card's STATEFUL columns
    * stay batch-side on purpose: the exact-dup rate needs corpus dedup
    * state (that's [[dedupedDocs]] / [[dedupBatchAgainstStore]]), and
    * an exact median isn't incrementally mergeable (the streaming form
    * would be an `approx_percentile` sketch — a different contract).
    * State is sources-sized; complete-mode output.
    */
  def datasetCardTotals(docs: DataFrame): DataFrame =
    docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
      sum(when(TextOps.qualityRules(col("text")).keep, 1L).otherwise(0L))
        .as("n_quality_pass"))

  /** Running learned-quality AUC state — the streaming form of the
    * qn105 batch audit, closing the loop the artifact lifecycle opened:
    * a pipeline trains offline, pins a model version
    * ([[TextOps.loadQualityModel]]), scores the live ingest
    * (StreamingSpec's stored-model scoring), and THIS monitor keeps the
    * class-balanced separation audit current as batches land — a
    * drifting upstream encoder (or a corpus whose character moved away
    * from the training sample) degrades AUC in the status table while
    * the batch that caused it is still arriving, instead of at the next
    * offline audit.
    *
    * Emits [[TextOps.scoreLabelBins]] state — per-score-bucket
    * positive/negative counts against the [[TextOps.qualityRules]] weak
    * labels, the same expressions as the batch audit, so
    * [[TextOps.binaryAucFromBins]] over any complete-mode snapshot
    * equals the batch [[TextOps.binaryAuc]] on the same rows EXACTLY
    * (StreamingSpec, including a poisoned batch). State is ≤ `bins`
    * rows; the AUC finisher's window runs over that bounded table,
    * never the stream.
    */
  def qualityAucBins(
      docs: DataFrame,
      model: TextOps.QualityModel,
      bins: Int = 4096): DataFrame =
    TextOps.scoreLabelBins(
      docs.select(
        TextOps.qualityModelScore(col("text"), model).as("p"),
        when(TextOps.qualityRules(col("text")).keep, 1d).otherwise(0d).as("y")),
      "p", "y", bins)

  /** Live domain-mix monitor: per-predicted-domain doc counts from a
    * STORED [[TextOps.DomainModel]] — the qn112 classifier as a
    * complete-mode stream status table (state is domains-sized: one
    * row per label). The mixture a crawl delivers drifts (a source
    * goes dark, a spam wave lands); watching the PREDICTED mix live
    * means the rebalance targets ([[graft.ops.Mixture
    * .rebalanceToTarget]]) get re-planned while the batch causing the
    * drift is still landing. Same serving expression as batch
    * (stream ≡ batch pinned in StreamingSpec), groupBy-count is a
    * legal streaming aggregate.
    */
  def domainMixTotals(
      docs: DataFrame,
      model: TextOps.DomainModel): DataFrame =
    docs.select(TextOps.domainLabel(
        TextOps.domainPredict(col("text"), model).getField("pred"), model)
      .as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"))

  /** Streaming margin-based bitext mining (qn113's
    * [[graft.ops.Similarity.marginBitextPairs]] as a live monitor): each
    * micro-batch of freshly-encoded SOURCE-language embeddings mines
    * translation pairs against a PINNED target-language corpus read from
    * the store (the qn76/qn81 stored-artifact seam: the target table is
    * versioned, so the miner pins exactly one reference no matter what
    * retrains land mid-stream) and appends `(src_id, tgt_id, sim,
    * margin, batch_id)` to `outDir` — both the candidate feed for a
    * human/aligner queue and, aggregated, the per-batch mined-pair-rate
    * monitor (an encoder regression shows up as the rate falling while
    * the batch is still landing).
    *
    * Semantics note (the contract StreamingSpec pins): margins are
    * BATCH-LOCAL — the backward k-NN denominator ranks each candidate
    * target against THIS batch's sources, exactly
    * `marginBitextPairs(batch, target)` per micro-batch, so a replayed
    * batch sequence reproduces the stream bit for bit. That is the
    * deployment-honest reading: a live miner cannot consult future
    * batches, and re-mining history per batch would be O(stream²). For
    * corpus-global margins run the batch op over the accumulated source
    * corpus (qn113) — the nightly re-mine next to this live monitor.
    * Routing inherits the batch op's size dial: fixture-scale batches
    * take the exact leg; corpus-scale ones route through IVF on the
    * pinned target.
    */
  def bitextMinedTo(
      srcEmbs: DataFrame,
      store: Store,
      tgtTable: String,
      outDir: String,
      checkpoint: String,
      k: Int = 4,
      threshold: Double = 1.0,
      maxExactRows: Long = graft.ops.Similarity.DefaultExactCosineRows,
      nProbe: Int = 8,
      externalKey: Option[String] = None): DataStreamWriter[Row] = {
    // Pin the reference ONCE, at stream construction — the contract the
    // scaladoc promises. A per-batch `_last` (or accumulate) read would
    // silently swap/duplicate the target mid-stream when a retrain
    // publishes a new version, breaking replay determinism.
    val pinned = Some(externalKey.getOrElse(store.lastVersion(tgtTable)
      .getOrElse(throw new IllegalArgumentException(
        s"'$tgtTable' has no _last pointer to pin; pass externalKey"))))
    srcEmbs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Similarity.marginBitextPairs(
          batch.toDF(), store.get(tgtTable, pinned), "vec_id", "embedding",
          k = k, threshold = threshold, maxExactRows = maxExactRows,
          nProbe = nProbe)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
        ()
      }
  }

  /** Live multi-benchmark contamination monitor: each micro-batch of
    * crawled docs screens against the PINNED benchmark-shingle
    * artifacts ([[graft.ops.Dedup.saveReferenceShingles]] — the
    * qn109/qn121 seam) in ONE pass
    * ([[TextOps.contaminationOverlapMultiStored]]) and appends
    * `(doc id, benchmark, n_overlap, batch_id)` to `outDir` — the
    * per-suite leak feed for quarantine, and, aggregated by
    * (batch_id, benchmark), the live leak-rate monitor (a crawl
    * suddenly ingesting an eval set shows as one suite's rate spiking
    * while the batch is still landing). Per-doc screening is
    * batch-independent, so a replayed batch sequence reproduces the
    * stream exactly (StreamingSpec pins stream ≡ batch op per half);
    * K more suites cost broadcast bytes per batch, never extra batch
    * scans.
    */
  def contaminationMonitorTo(
      docs: DataFrame,
      store: Store,
      benchTables: Seq[(String, String)],
      outDir: String,
      checkpoint: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3): DataStreamWriter[Row] = {
    // Pin every suite ONCE at stream construction (the bitextMinedTo
    // stance): a suite update mid-stream must not change — or, under an
    // accumulate read, DUPLICATE — the reference shingles between
    // batches; replayed batches must reproduce the stream.
    val pinnedRefs = benchTables.map { case (nm, t) =>
      (nm, t, Some(store.lastVersion(t).getOrElse(
        throw new IllegalArgumentException(
          s"'$t' has no _last pointer to pin"))))
    }
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val refs = pinnedRefs.map { case (nm, t, key) => nm -> store.get(t, key) }
        TextOps.contaminationOverlapMultiStored(batch.toDF(), refs,
          idCol, textCol, n)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
        ()
      }
  }

  /** Embedding batches as they land from an encoder job. */
  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
    StructField("label", org.apache.spark.sql.types.IntegerType)))

  /** Open an embeddings parquet directory as a stream. */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(embSchema).parquet(dir)

  /** Running per-label embedding-health totals — the streaming form of
    * the batch audit (qn75): an encoder regression (NaNs, zero vectors,
    * a dimension change after a model swap) surfaces while the batch
    * that caused it is still landing, not at the next index build.
    * Same expressions as [[graft.ops.Similarity.embeddingHealth]]
    * (batch ≡ stream asserted in StreamingSpec); state is labels-sized;
    * complete-mode output.
    */
  def embeddingHealthTotals(embs: DataFrame): DataFrame =
    graft.ops.Similarity.embeddingHealth(embs, "embedding", "label")

  /** Streaming embedding ingest → persisted ANN index maintenance: the
    * FIRST micro-batch fits the index ([[graft.ops.VectorIndex.buildIvf]]),
    * every later batch appends with no refit ([[graft.ops.VectorIndex.appendIvf]]
    * — O(batch) assignment against the stored centroids). One store
    * version per `batchId` (`b<n>`), so a replayed micro-batch replaces
    * its OWN version — the same replay-idempotency contract as
    * [[dedupBatchAgainstStore]] — and accumulate-mode
    * [[graft.ops.VectorIndex.searchIvf]] serves the union the moment a
    * batch commits. StreamingSpec pins streamed-build+append ≡
    * whole-corpus brute force.
    */
  def indexAppendSink(
      embs: DataFrame,
      store: Store,
      name: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    embs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val centroidsTable = s"$name/centroids"
        val hasIndex = store.list(Some(centroidsTable))
          .exists(_.name == centroidsTable)
        if (!hasIndex)
          graft.ops.VectorIndex.buildIvf(store, batch, "vec_id", "embedding",
            name, externalKey = s"b$batchId")
        else
          graft.ops.VectorIndex.appendIvf(store, batch, "vec_id", "embedding",
            name, externalKey = s"b$batchId")
        ()
      }

  /** One band-bucket row of the near-dup alert stream: a doc's MinHash
    * signature keyed by one of its LSH band hashes.
    */
  final case class BandRow(docId: Long, sig: Seq[Long], bandIdx: Int, bandHash: Long)

  /** Per-bucket state: the (docId, signature) pairs enlisted so far. */
  final case class BucketState(entries: Seq[(Long, Seq[Long])])

  /** One piece of near-dup evidence: `doc_id` collided with the earlier
    * `prior_id` in some band and their signature agreement estimates
    * Jaccard ≥ the threshold. A doc colliding in several bands emits up
    * to one alert per band (per-EVIDENCE semantics — consumers distinct
    * by `doc_id`); `est_jaccard` is identical across them by
    * construction (same two signatures).
    */
  final case class DupAlert(doc_id: Long, prior_id: Long, est_jaccard: Double)

  /** Streaming NEAR-dup detection — [[dedupedDocs]]'s fuzzy sibling,
    * the ingest form of the batch MinHash detector (qn03): each doc's
    * banded MinHash signature (identical machinery to
    * [[Dedup.minhashCandidatePairs]] — same shingles, same signature
    * expression, same band hashing, so estimates agree bit-for-bit
    * with the batch op) is checked against per-band-bucket state via
    * `flatMapGroupsWithState`, and a collision whose signature
    * agreement clears `simThreshold` emits a [[DupAlert]].
    *
    * State design for 100 TB ingest: keyed by (band_idx, band_hash) —
    * the SAME partitioning the batch candidate join shuffles on — each
    * bucket holding its enlisted (id, 32-long sig) pairs: ~264 bytes
    * per doc per band, NOT the text or shingle set (a 10⁹-doc corpus is
    * ~2 TB of state across 8 bands — executor-store scale; the exact
    * alternative of shingle-set state is 25-50× that). `maxBucket`
    * caps a pathological bucket (boilerplate-headed corpora) exactly
    * as the batch hot-shingle cap does: docs beyond the cap still probe
    * (alerts keep firing) but do not enlist. Within a micro-batch a
    * bucket's rows process in doc-id order, so intra-batch collisions
    * resolve deterministically (smaller id enlists first). No timeout
    * by design — near-dup state, like [[dedupedDocs]]'s, has no time
    * bound; bound it with a TTL timeout or run the store-backed
    * [[dedupBatchAgainstStore]] path when history must be complete.
    */
  def nearDupAlerts(
      docs: DataFrame,
      n: Int = 3,
      simThreshold: Double = 0.7,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      maxBucket: Int = 1000): Dataset[DupAlert] = {
    val numHashes = bands * rowsPerBand
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs
      .select(col("doc_id"), TextOps.shingles(col("text"), n).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), Dedup.minhashSignature(col("sh"), numHashes).as("sig"))
      .select(col("doc_id").as("docId"), col("sig"),
        posexplode(array((0 until bands).map(b =>
          hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)))
      .select(col("docId"), col("sig"), col("pos").as("bandIdx"),
        col("col").cast("long").as("bandHash"))
      .as[BandRow]
    banded
      .groupByKey(r => (r.bandIdx, r.bandHash))
      .flatMapGroupsWithState[BucketState, DupAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          val enlisted =
            scala.collection.mutable.ArrayBuffer.from(
              state.getOption.map(_.entries).getOrElse(Seq.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[DupAlert]
          rows.toSeq.sortBy(_.docId).foreach { r =>
            val matches = enlisted.iterator.map { case (pid, psig) =>
              var agree = 0
              var i = 0
              while (i < numHashes) {
                if (r.sig(i) == psig(i)) agree += 1
                i += 1
              }
              (pid, agree.toDouble / numHashes)
            }.filter(_._2 >= simThreshold).toSeq
            if (matches.nonEmpty) {
              // One alert per band: the strongest prior (est desc, then
              // min id) — evidence, not an exhaustive pair list.
              val (pid, est) = matches.maxBy { case (pid, est) => (est, -pid) }
              out += DupAlert(r.docId, pid, est)
            }
            if (enlisted.size < maxBucket) enlisted += ((r.docId, r.sig))
          }
          state.update(BucketState(enlisted.toSeq))
          out.iterator
      }
  }

  /** One micro-batch of store-backed streaming near-dup DEDUP: dedup
    * `batch` against the signature corpus persisted in `store` exactly
    * as the batch incremental op (qn24's [[Dedup.dedupIncremental]] —
    * exact n-gram Jaccard, connected components, corpus-wide hot-cap),
    * then append this batch's signatures and shingle frequencies (ALL
    * seen docs, kept and dropped — the op's stated contract) as a new
    * store version. Returns the batch's survivors.
    *
    * This is the history-complete half of the streaming dedup story,
    * deliberately `foreachBatch` + store rather than executor state:
    * exact Jaccard needs the full shingle sets, and a corpus of shingle
    * sets belongs in fault-tolerant columnar storage read back as an
    * O(batch × overlap) equality join — not in per-executor state maps
    * (50-100× the MinHash state, lost with an executor, rebuilt only by
    * replaying every micro-batch). [[nearDupAlerts]] is the
    * low-latency/bounded-state half; this path is what the nightly
    * compaction and the replayed-ingest equivalence (StreamingSpec)
    * grade.
    *
    * State layout: the signature corpus lives as BUCKETED-by-shingle
    * parquet ([[graft.store.BucketedState]] under the store root, one
    * version per batch), so each ingest's state joins are
    * storage-partitioned — the state scans IN PLACE with its stored
    * `HashPartitioning(s)` and only the batch side shuffles
    * ([[Dedup.dedupIncrementalSliced]]); without it the ingest
    * re-shuffle-sorted the full state every batch (the measured 1.93×
    * wall per 2× state, SCALEBENCH_r14_delta.log — the removable half).
    * `sigBuckets` sizes the layout: state_rows/buckets should fit an
    * executor's scan partition (thousands at 100 TB; the default suits
    * the 32-thread test bed). Versions are replace-on-rewrite, so a
    * restarted stream resumes against exactly the state its last
    * committed batch left; [[graft.store.BucketedState.compact]] bounds
    * slice count between ingests (the nightly compaction). The shingle
    * FREQUENCY state is the second bucketed surface (r16), and the
    * per-doc COUNT companion the third (r17): counts feed the Jaccard
    * denominators so the ingest never re-aggregates the state's
    * signature rows per doc (the last state-sized shuffle, gone — r15),
    * and living as bucketed-by-`id` slices they inherit the SAME
    * crash-atomic watermark fold as the other two surfaces. The r16
    * layout folded counts through `Store.load(keepLast = true)`, which
    * deletes every prior version BEFORE publishing the fold — a crash
    * in that window silently lost counts while the signature slices
    * survived, and later batches' Jaccard joins dropped pairs for the
    * gapped docs with no symptom. [[graft.store.BucketedState.compact]]
    * publishes-then-retires (staged data → retirement manifest → ONE
    * sidecar commit → janitorial delete), so the counts fold now
    * converges from any crash point exactly like the signatures.
    */
  def dedupBatchAgainstStore(
      batch: DataFrame,
      batchId: Long,
      store: Store,
      sigTable: String = "streaming/neardup-sigs",
      freqTable: String = "streaming/neardup-freqs",
      n: Int = 3,
      threshold: Double = 0.8,
      sigBuckets: Int = 32,
      maxSlices: Int = 16): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val sig = Dedup.materialize(
      Dedup.shingleSignatures(batch, "doc_id", "text", n))
    val freqs = Dedup.materialize(Dedup.shingleDocFreqs(sig))
    val countsTable = sigTable + "-counts"
    val sigRoot = store.statePath(sigTable)
    val freqRoot = store.statePath(freqTable)
    val countsRoot = store.statePath(countsTable)
    // Slice-count watermark: a long-running stream accumulates one
    // bucketed slice per batch on BOTH state surfaces; once `maxSlices`
    // are live, fold history into one slice HERE — before any state
    // read, so the batch's lazy state joins never reference dirs a
    // later compaction would retire. Replay discipline: the fold label
    // is the batch id (a replayed batch that already compacted skips —
    // its label is live), and the batch's OWN slice from a
    // half-committed prior attempt is excluded from the fold (it is
    // about to be rewritten; folding it too would put its rows in two
    // live slices). The frequency fold SUMS (the same shingle lives in
    // many slices); the signature fold is plain union (slices partition
    // the corpus by doc). `maxSlices <= 0` disables.
    if (maxSlices > 0) {
      val own = s"b$batchId"
      val foldLabel = s"c$batchId"
      def watermark(root: String, bucketCol: String,
          fold: Seq[DataFrame] => DataFrame): Unit = {
        val live = BucketedState.versions(spark, root)
        if (live.size >= maxSlices && !live.contains(foldLabel) &&
            live.exists(v => v != own))
          BucketedState.compact(spark, root, foldLabel, bucketCol,
            sigBuckets, exclude = Set(own), fold = fold)
      }
      watermark(sigRoot, "s", _.reduce(_ unionByName _))
      watermark(freqRoot, "s", Dedup.foldShingleFreqSlices)
      // The counts fold is plain union: each doc arrives in exactly one
      // batch, so its count lives in exactly one slice.
      watermark(countsRoot, "id", _.reduce(_ unionByName _))
    }
    // REPLAY discipline on the read side (r18 review finding): a
    // replayed half-committed batch's OWN slices are about to be
    // rewritten and its contribution is re-supplied fresh
    // (`batchShingleFreqs`, the batch side of every join), so they must
    // be EXCLUDED from the state reads. Reading the stale own-slice
    // freqs AND adding the batch freqs again double-counts the batch
    // against the shingle hot cap — a shingle with prior df p and batch
    // df d such that p + d <= cap < p + 2d flips hot on the replay
    // only, its signatures get anti-joined away, and the replayed
    // survivor set silently diverges from the never-crashed run. (The
    // own SIG slice was previously tolerated as "self-edges are
    // ignored", which holds for the pair legs but not for the freq
    // denominators; all three surfaces now read state-minus-own.)
    val ownLabel = s"b$batchId"
    val prevSigVersions =
      BucketedState.versions(spark, sigRoot).filterNot(_ == ownLabel)
    val prevSlices =
      prevSigVersions.map(v => BucketedState.slice(spark, sigRoot, v))
    // The r15 layout migration guard: pre-bucketed deployments stored
    // the signature state as an ordinary row-versioned STORE table
    // under `sigTable`. Resuming such a checkpoint here would silently
    // dedup every batch against EMPTY history (the accumulated state
    // dropped on the floor) — fail loudly instead and name the
    // migration (read the legacy table once, BucketedState.write it as
    // a b0 slice + shingleSignatureCounts, then drop the legacy table).
    // Like the freq/counts guards below, an own-slice-only layout must
    // NOT trip this: a replayed half-committed batch whose own slice is
    // the only bucketed sig state (first batch ever, crashed after the
    // state write) is a legitimate resume, not an unmigrated legacy
    // deployment — `prevSlices` excludes the own label, so the escape
    // is the BucketedState.exists check on the root.
    if (prevSlices.isEmpty && !BucketedState.exists(spark, sigRoot) &&
        store.list(Some(sigTable)).exists(_.name == sigTable))
      throw new IllegalStateException(
        s"legacy row-versioned signature state found at '$sigTable' but no " +
          "bucketed slices: migrate it (BucketedState.write + " +
          "shingleSignatureCounts) before resuming the stream")
    // Frequency state — the SECOND bucketed-state consumer: one
    // bucketed-by-`s` slice per batch, read back through
    // [[BucketedState.family]] (one partitioned-bucketed scan spanning
    // every slice) so the accumulated-vocabulary aggregate is a single
    // exchange-free HashAggregate whose output feeds the hot-set
    // full-outer join with its `HashPartitioning(s)` intact — the old
    // row-versioned table paid one vocab-wide Exchange every batch.
    // Same legacy-layout guard as the signatures.
    val hasFreqState =
      BucketedState.versions(spark, freqRoot).exists(_ != ownLabel)
    if (!hasFreqState && !BucketedState.exists(spark, freqRoot) &&
        store.list(Some(freqTable)).exists(_.name == freqTable))
      throw new IllegalStateException(
        s"legacy row-versioned shingle-frequency state found at '$freqTable' " +
          "but no bucketed slices: migrate it (aggregate the versions, " +
          "BucketedState.write one slice) before resuming the stream")
    val prevFreqs =
      if (hasFreqState)
        BucketedState.family(spark, freqRoot, exclude = Set(ownLabel))
          .groupBy("s").agg(sum("df").as("df"))
      else Seq.empty[(String, Long)].toDF("s", "df")
    // Per-doc counts — the THIRD bucketed surface: each doc arrives in
    // exactly one batch, so the slice union IS the counts table (no
    // aggregation), and [[BucketedState.family]] reads every live slice
    // as ONE bucketed-by-`id` scan. Same legacy-layout guard as the
    // other two (the r16 layout stored counts as a row-versioned store
    // table; resuming against it silently — by ignoring it — would
    // re-derive denominators from a state aggregate the layout exists
    // to avoid, and folding it stays exposed to the keepLast crash
    // window the bucketed fold closes).
    val hasCounts =
      BucketedState.versions(spark, countsRoot).exists(_ != ownLabel)
    if (!hasCounts && !BucketedState.exists(spark, countsRoot) &&
        store.list(Some(countsTable)).exists(_.name == countsTable))
      throw new IllegalStateException(
        s"legacy row-versioned per-doc counts state found at '$countsTable' " +
          "but no bucketed slices: migrate it (accumulate-read the table, " +
          "BucketedState.write one slice bucketed by id) before resuming " +
          "the stream")
    val prevCounts =
      if (hasCounts)
        Some(BucketedState.family(spark, countsRoot, exclude = Set(ownLabel)))
      else None
    val kept = Dedup.dedupIncrementalSliced(batch, prevSlices, "doc_id",
      "text", n, threshold,
      prevShingleFreqs = Some(prevFreqs),
      batchShingleFreqs = Some(freqs),
      prevSigCounts = prevCounts,
      // The family aggregate carries HashPartitioning(s): take the
      // zipper-join hot set (state stays in place). The empty-history
      // literal takes the generic plan.
      prevFreqsPartitioned = hasFreqState)
    // Mirror Store.load's 0-row guard: an all-filtered (or all-short)
    // batch has no signatures and publishes no state version — an empty
    // bucketed table couldn't re-register after a restart (no parquet
    // footer to infer a schema from).
    if (!sig.isEmpty) {
      // Three INDEPENDENT roots, three independent jobs (guide §2.6):
      // submit them concurrently so the freq/counts writes back-fill
      // the cores the sig write's straggler tail frees. `sig` is fully
      // materialized by the isEmpty action above, so the concurrent
      // scans share its cached blocks instead of racing to compute it.
      // Crash semantics are unchanged: the read path excludes the own
      // label on every surface and a replay rewrites all three, so no
      // invariant depends on surface write ORDER.
      graft.Concurrency.inParallel(Seq(
        () => BucketedState.write(sig, sigRoot, s"b$batchId", "s", sigBuckets),
        () => BucketedState.write(freqs, freqRoot, s"b$batchId", "s", sigBuckets),
        () => BucketedState.write(Dedup.shingleSignatureCounts(sig), countsRoot,
          s"b$batchId", "id", sigBuckets)))(_.apply())
    }
    kept
  }

  /** Out-of-band maintenance compaction of the streaming dedup state —
    * folds all three bucketed surfaces ([[dedupBatchAgainstStore]]'s
    * signatures, shingle frequencies, per-doc counts) to one slice each
    * under `label`, so the fold's state-scan cost lands in a scheduled
    * maintenance window instead of stalling a micro-batch at the
    * slice-count watermark. Deployment recipe: size `maxSlices`
    * generously (the watermark becomes a backstop, not the schedule)
    * and run this nightly / at low traffic.
    *
    * Against a LIVE stream, pass the stream's `checkpoint` location:
    * each fold runs under the root's compaction lease, so a batch
    * racing this job fails its state WRITE with the lease error and the
    * restarted query replays it cleanly (every per-batch write is
    * replay-idempotent) — but the lease can NOT know about a batch that
    * already WROTE some slices and will REWRITE them on replay (a
    * half-committed batch at job start, or the one the lease just
    * failed). Folding such a slice would put its rows in BOTH the fold
    * and the rewritten slice. With `checkpoint` supplied the job
    * derives that exclusion itself from the stream's own commit log
    * ([[uncommittedBatchLabels]]: every batch id the offset WAL shows
    * started but the commit log does not show finished — exactly the
    * replay-rewritable set, since Structured Streaming writes
    * `offsets/<id>` durably before the batch body runs and
    * `commits/<id>` after). Without it, either run with the stream
    * STOPPED or pass `exclude` covering any possibly-in-flight batch's
    * slice label by hand — the r17 API left that inference to the
    * operator, which was its one silent-corruption path. Re-running
    * with the same `label` after a crash converges
    * ([[graft.store.BucketedState.compact]]'s replay contract);
    * re-running after NEW batches landed refuses loudly and names the
    * recovery (pick a new label).
    *
    * A surface already at one live slice (or with nothing outside the
    * exclusions) is skipped — the job is cheap when there is nothing to
    * fold.
    */
  def compactDedupState(
      spark: SparkSession,
      store: Store,
      label: String,
      sigTable: String = "streaming/neardup-sigs",
      freqTable: String = "streaming/neardup-freqs",
      exclude: Set[String] = Set.empty,
      checkpoint: Option[String] = None): Unit = {
    val excl = exclude ++
      checkpoint.map(uncommittedBatchLabels(spark, _)).getOrElse(Set.empty)
    // The bucket spec comes from the slices themselves, never from a
    // caller parameter: a maintenance job run with a different modulus
    // than the stream would rewrite the state at the wrong spec and
    // stall the next batch's family read.
    def fold1(root: String, fold: Seq[DataFrame] => DataFrame): Unit = {
      val foldable = BucketedState.versions(spark, root).filterNot(excl)
      if (foldable.size > 1) {
        val (buckets, bucketCol) =
          BucketedState.bucketSpec(spark, root, foldable.head)
        BucketedState.compact(spark, root, label, bucketCol, buckets,
          exclude = excl, fold = fold)
      }
    }
    // Three independent roots (each fold runs under its OWN root's
    // compaction lease) — overlap the three fold jobs (guide §2.6); the
    // maintenance window pays ~max(fold walls) instead of their sum.
    graft.Concurrency.inParallel(Seq[() => Unit](
      () => fold1(store.statePath(sigTable), _.reduce(_ unionByName _)),
      () => fold1(store.statePath(freqTable), Dedup.foldShingleFreqSlices),
      () => fold1(store.statePath(sigTable + "-counts"),
        _.reduce(_ unionByName _))))(_.apply())
  }

  /** Slice labels (`b<batchId>`) of every batch the checkpoint shows
    * STARTED but not COMMITTED — the set an out-of-band fold must leave
    * alone because a restarted stream will rewrite their slices
    * ([[compactDedupState]]). Mechanics: Structured Streaming's
    * MicroBatchExecution write-ahead-logs `offsets/<batchId>` BEFORE
    * the batch body (so any state slice a batch wrote has its offsets
    * entry) and `commits/<batchId>` only after the body succeeds, so
    * `offsets \ commits` is exactly the replay-rewritable set — at most
    * one id on a healthy stream. `max(commits)+1` is added for the
    * instant after a commit lands and before the next batch's WAL entry
    * (that batch has written nothing yet, but it may START while the
    * fold runs: its label must already be excluded, not discovered
    * mid-fold — though even then the lease would fail its write
    * loudly). Both logs may be absent on a fresh checkpoint (empty
    * set). Log-file names are plain batch ids; non-numeric entries
    * (temp files, `.compact` metadata of OTHER logs — offsets/commits
    * themselves never compact) are ignored.
    */
  private[graft] def uncommittedBatchLabels(
      spark: SparkSession, checkpoint: String): Set[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(checkpoint)
    // A mistyped checkpoint path must fail LOUDLY: it would otherwise
    // return an empty exclusion set and the fold would proceed exactly
    // as unprotected as the r17 manual-exclude default — the silent
    // hazard this derivation exists to close. A checkpoint that EXISTS
    // but has no offsets log yet (stream never started a batch) is
    // legitimately empty: no batch can have written state.
    if (!root.getFileSystem(conf).exists(root))
      throw new IllegalArgumentException(
        s"checkpoint location '$checkpoint' does not exist — cannot derive " +
          "the in-flight-batch exclusion from it (mistyped path?); point at " +
          "the stream's checkpointLocation, or omit `checkpoint` and run " +
          "with the stream stopped")
    def ids(sub: String): Set[Long] = {
      val p = new org.apache.hadoop.fs.Path(checkpoint, sub)
      val f = p.getFileSystem(conf)
      if (!f.exists(p)) Set.empty
      else f.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).toSet
    }
    val commits = ids("commits")
    val started = ids("offsets") -- commits
    (started ++ commits.maxOption.map(_ + 1)).map(id => s"b$id")
  }

  /** One micro-batch of the FULL streaming corpus build — qn110's
    * delta-ingest pipeline as the `foreachBatch` body a continuously
    * crawling deployment runs: quality rules → incremental near-dup
    * dedup against the accumulated signature state
    * ([[dedupBatchAgainstStore]]) → decontamination against the PINNED
    * reference-shingle artifact ([[Dedup.saveReferenceShingles]] /
    * [[TextOps.contaminationOverlapStored]] — the benchmark never
    * re-shingles) → one corpus APPEND version + one sources-sized card
    * version per batch. The published corpus and card are selector-less
    * accumulate reads; an all-filtered batch publishes no version and
    * stays lossless (the qn110 sf0.1 edge).
    *
    * Replay safety is inherited: every write is a `b<batchId>` version
    * ([[Store.load]] replaces a re-written subtree), and a
    * half-committed batch re-reading its own signatures only adds
    * self-edges and duplicate pairs, which keep-min components ignore.
    * Per-ingest cost: the quality/decontam/card stages are
    * batch-sized; the prior corpus re-enters only as the signature
    * equality join (linear in state — the exact-Jaccard design's
    * stated tradeoff) and the broadcast reference shingles. The
    * signature state is stored bucketed/sorted by shingle
    * ([[dedupBatchAgainstStore]]'s [[graft.store.BucketedState]]
    * layout), so that join is storage-partitioned: the state scans in
    * place and only the batch side shuffles — the per-ingest state
    * shuffle-sort that measured 1.93× wall per 2× state
    * (SCALEBENCH_r14_delta.log) is gone from the plan.
    */
  def corpusIngestBatch(
      batch: DataFrame,
      batchId: Long,
      store: Store,
      refName: String = "streaming/decontam-ref",
      corpusTable: String = "streaming/corpus",
      cardTable: String = "streaming/corpus-card",
      sigTable: String = "streaming/corpus-sigs",
      freqTable: String = "streaming/corpus-freqs",
      n: Int = 3,
      threshold: Double = 0.8,
      sigBuckets: Int = 32,
      maxSlices: Int = 16): DataFrame = {
    val q = batch.where(TextOps.qualityRules(col("text")).keep)
    val kept = dedupBatchAgainstStore(q, batchId, store,
      sigTable = sigTable, freqTable = freqTable, n = n,
      threshold = threshold, sigBuckets = sigBuckets,
      maxSlices = maxSlices)
    val contaminated = TextOps.contaminationOverlapStored(kept,
      store.get(s"$refName/signatures"), "doc_id", "text", n)
    val dc = Dedup.materialize(
      kept.join(contaminated.select("doc_id"), Seq("doc_id"), "left_anti"))
    store.load(dc, corpusTable, externalKey = s"b$batchId")
    store.load(
      dc.groupBy("source").agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens")),
      cardTable, externalKey = s"b$batchId")
    dc
  }

  /** The [[corpusIngestBatch]] loop as a ready-to-start stream: the
    * corpus lives in the store (no side parquet sink needed) — start
    * with a `checkpointLocation` and the build stays current as crawl
    * files land.
    */
  def corpusIngestTo(
      docs: DataFrame,
      store: Store,
      refName: String = "streaming/decontam-ref",
      n: Int = 3,
      threshold: Double = 0.8,
      maxSlices: Int = 16): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      corpusIngestBatch(batch, batchId, store, refName = refName,
        n = n, threshold = threshold, maxSlices = maxSlices)
      ()
    }

  /** The [[dedupBatchAgainstStore]] loop as a ready-to-start stream:
    * survivors of each micro-batch append as parquet under `outDir`.
    * Caller sets `checkpointLocation` and starts — exactly-once
    * composition comes from the checkpoint replaying uncommitted
    * batches and `b<batchId>` store versions being idempotent per
    * batch id ([[Store.load]] replaces a re-written version subtree).
    */
  def nearDupDedupedTo(
      docs: DataFrame,
      store: Store,
      outDir: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxSlices: Int = 16): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      dedupBatchAgainstStore(batch, batchId, store, n = n,
        threshold = threshold, maxSlices = maxSlices)
        .write.mode("append").parquet(outDir)
    }
}
