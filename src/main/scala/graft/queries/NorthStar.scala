package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables
import graft.ops.{Dedup, Mixture, Multimodal, Similarity, TextOps, VectorIndex}

/** North-star LLM-pipeline operators (BASELINE.json): dedup at every
  * fuzziness level, embedding similarity search, text analysis, and
  * multimodal column plumbing, over the `documents` / `embeddings`
  * fixtures. Oracle SQL provided wherever DuckDB can express the same
  * computation; hash-dependent ops (MinHash, SimHash, LSH, IVF) are
  * rows-only checked.
  */
object NorthStar {

  private def docs(s: SparkSession, dir: String) = Tables.read(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) = Tables.read(s, dir, "embeddings")

  /** Exact dedup: first doc per identical text + copy count. */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), md5(col("text").cast("binary")).as("text_hash"))
      .orderBy("keep_id")

  /** All-pairs 3-gram Jaccard near-dup pairs (≥ 0.8), with the default
    * hot-shingle cap (mirrored in the oracle; a no-op at fixture doc
    * frequencies, load-bearing on an open-domain corpus).
    */
  private def qNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", n = 3, threshold = 0.8)
      .orderBy("doc_a", "doc_b")

  /** MinHash+LSH graded as a DETERMINISTIC CONTRACT (the q31/q49
    * playbook): the exact Jaccard pair set at the same threshold is
    * recomputed with the engine's own exact operator (SQL-expressible —
    * the DuckDB oracle rebuilds it, qn02-style), and the MinHash
    * candidate set is graded against it as booleans the oracle states
    * as literals: recall >= 0.9 (integer-exact 10·found >= 9·truth) and
    * max |estimated − exact| Jaccard <= 0.25 over recovered pairs
    * (32 hashes → σ ≈ 0.08 at j=0.7; seeds fixed, so the value is
    * deterministic, and RecallSpec pins this config to recall = 1.0).
    */
  private def qMinhash(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cand = Dedup.minhashCandidatePairs(d, "doc_id", "text",
      n = 3, simThreshold = 0.7)
    val truth = Dedup.ngramJaccardPairs(d, "doc_id", "text",
      n = 3, threshold = 0.7)
    truth
      .join(cand.select(col("doc_a"), col("doc_b"), col("est_jaccard")),
        Seq("doc_a", "doc_b"), "left")
      .agg(
        count(lit(1)).as("n_true_pairs"),
        (sum(when(col("est_jaccard").isNotNull, 1L).otherwise(0L)) * 10L >=
          count(lit(1)) * 9L).as("recall_ok"),
        coalesce(max(abs(col("est_jaccard") - col("jaccard"))) <= 0.25,
          lit(false)).as("est_err_ok"))
  }

  /** SimHash graded as a DETERMINISTIC CONTRACT. Two guarantees, both
    * stateable by the oracle as literals:
    *   - identical-text pairs (SQL: self-join on text equality) MUST
    *     come out of the banded pipeline with hamming 0 — identical
    *     text → identical fingerprint → every band collides;
    *   - the banded candidate pipeline is EXACT for hamming <= 3
    *     (pigeonhole over 4×16-bit bands), verified in-query against a
    *     brute-force fingerprint cross-pair scan (25M cheap bit_count
    *     evals at sf0.1 — the check is quadratic but over 8-byte
    *     fingerprints, not documents) and emitted as one constant
    *     boolean column.
    */
  private def qSimhash(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cand = Dedup.simhashNearDupPairs(d, "doc_id", "text", maxHamming = 3)
    val fp = d.select(col("doc_id").as("id"), Dedup.simhash64(col("text")).as("fp"))
    val truth = fp.as("a").join(fp.as("b"), col("a.id") < col("b.id"))
      .where(bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= 3)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
    val bandExact = truth.join(cand.select("doc_a", "doc_b"),
        Seq("doc_a", "doc_b"), "left_anti")
      .agg(count(lit(1)).as("n_miss"))
      .crossJoin(cand.select("doc_a", "doc_b")
        .join(truth, Seq("doc_a", "doc_b"), "left_anti")
        .agg(count(lit(1)).as("n_extra")))
      .select((col("n_miss") === 0 && col("n_extra") === 0).as("band_exact_ok"))
    val dup = d.as("x").join(d.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    dup.join(cand, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        col("hamming").isNotNull.as("found"),
        coalesce(col("hamming") === 0, lit(false)).as("hamming_zero"))
      .crossJoin(broadcast(bandExact))
      .orderBy("doc_a", "doc_b")
  }

  /** Text quality statistics per (lang, source). */
  private def qTextStats(s: SparkSession, dir: String): DataFrame = {
    val c = col("text")
    docs(s, dir)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("n_chars"), 4).as("avg_chars"),
        round(avg(TextOps.tokenCount(c)), 4).as("avg_tokens"),
        round(avg(TextOps.bpeTokenCount(c)), 4).as("avg_bpe_tokens"),
        round(avg(TextOps.typeTokenRatio(c)), 4).as("avg_ttr"),
        round(avg(TextOps.qualityScore(c)), 4).as("avg_quality"))
      .orderBy("lang", "source")
  }

  /** Heuristic language-ID vs the labeled `lang` column. */
  private def qLangId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("predicted", TextOps.langId(col("text")))
      .groupBy("predicted")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("predicted") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
      .orderBy("predicted")

  /** Polynomial rolling-hash fingerprint per document. */
  private def qFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Brute-force exact cosine top-10 for query vector 0. */
  private def qCosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.topKPerQuery(e, e.where(col("vec_id") === 0), "vec_id", "embedding", k = 10)
      .orderBy("query_id", "rank")
  }

  /** Brute-force exact cosine top-5 for 8 query vectors (one scan). */
  private def qCosineTopKMulti(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.topKPerQuery(e, e.where(col("vec_id") < 8), "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank")
  }

  /** Embedding near-dup pairs: all pairs with cosine ≥ 0.4. */
  private def qEmbeddingNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(emb(s, dir), "vec_id", "embedding", threshold = 0.4)
      .orderBy("id_a", "id_b")

  /** SRP-LSH graded as a DETERMINISTIC CONTRACT: the exact cosine pair
    * set at the same threshold is recomputed with the engine's exact
    * block-grid operator (SQL-expressible — the oracle rebuilds it with
    * `list_cosine_similarity`, qn10-style), and the SRP candidates are
    * graded as literal-stateable booleans: recall >= 0.9 (RecallSpec
    * pins this config at 0.95; planes are seed-fixed → deterministic),
    * re-ranked sims identical to exact sims (the re-rank IS the exact
    * dot product), and precision 1.0 (candidates are exact-filtered at
    * the threshold, so no non-true pair can survive).
    */
  private def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cand = Similarity.srpNeighbors(e, "vec_id", "embedding",
      dim = 64, cosThreshold = 0.35, numPlanes = 30, bands = 10)
    val truth = Similarity.nearDupPairs(e, "vec_id", "embedding", threshold = 0.35)
    truth
      .join(cand.select(col("id_a"), col("id_b"), col("sim").as("cand_sim")),
        Seq("id_a", "id_b"), "left")
      .agg(
        count(lit(1)).as("n_true_pairs"),
        // coalesce: sum over ZERO rows is SQL NULL, and NULL >= 0 is
        // NULL — an empty truth set must grade recall as the literal
        // true the oracle states, not null.
        (coalesce(sum(when(col("cand_sim").isNotNull, 1L).otherwise(0L)), lit(0L)) * 10L >=
          count(lit(1)) * 9L).as("recall_ok"),
        // Vacuously true when no true pair matched a candidate (zero
        // sims to compare; recall_ok catches the misses) — the oracle
        // states literal true, so an empty-truth fixture must not fail
        // the exactness gate spuriously.
        (count(col("cand_sim")) === 0 ||
          max(abs(col("cand_sim") - col("sim"))) === 0.0).as("rerank_exact_ok"))
      .crossJoin(
        cand.join(truth.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
          .agg((count(lit(1)) === 0).as("precision_ok")))
  }

  /** SemDeDup graded as a DETERMINISTIC CONTRACT (qn11's playbook): the
    * exact cosine pair set at the same threshold is the truth (qn10's
    * operator — the oracle restates it with `list_cosine_similarity`),
    * and the cluster-scoped pairs are graded as literal-stateable
    * booleans: recall >= 0.9 (RecallSpec pins this config; k-means seed
    * fixed → deterministic), sims identical to exact (the within-cluster
    * score IS the exact dot product), precision 1.0 (pairs are
    * exact-filtered at the threshold). The fixture is the deliberately
    * worst-case near-uniform corpus (qn12's nemesis): its 0.4-cosine
    * pairs are boundary-straddlers by construction, so the graded
    * config leans on soft assignment (3 probed cells) for recall
    * 1.0/0.97 at sf0.01/sf0.1 — the multi-probe lever, same stance as
    * qn12's corpus-adaptive nProbe. `nlist` is NOT pinned: the graded
    * config exercises the corpus-adaptive default
    * ([[Similarity.semDedupNlistFor]] over footer counts — 8 cells at
    * both fixture SFs, growing with the corpus), so the measured scale
    * lever is the code path the grade actually covers.
    * `sim_exact_ok` passes vacuously when NO true pair matched a
    * candidate (zero matched rows ⇒ zero sims to compare — recall_ok is
    * the gate that catches misses); the oracle states literal true.
    */
  private def qSemDedup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cand = Similarity.semDedupPairs(e, "vec_id", "embedding",
      threshold = 0.4, assignProbes = 3)
    val truth = Similarity.nearDupPairs(e, "vec_id", "embedding", threshold = 0.4)
    truth
      .join(cand.select(col("id_a"), col("id_b"), col("sim").as("cand_sim")),
        Seq("id_a", "id_b"), "left")
      .agg(
        count(lit(1)).as("n_true_pairs"),
        (coalesce(sum(when(col("cand_sim").isNotNull, 1L).otherwise(0L)), lit(0L)) * 10L >=
          count(lit(1)) * 9L).as("recall_ok"),
        (count(col("cand_sim")) === 0 ||
          max(abs(col("cand_sim") - col("sim"))) === 0.0).as("sim_exact_ok"))
      .crossJoin(
        cand.join(truth.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
          .agg((count(lit(1)) === 0).as("precision_ok")))
  }

  /** The HIERARCHICAL coarse quantizer ([[Similarity.probeAssignHier]])
    * graded end-to-end (qn26's playbook): `nlist = 150` forces the
    * centroid count past `HierAssignCentroids`, so BOTH the corpus hard
    * assignment and the 3-probe soft side run the two-level
    * group→member path — the 100 TB plan shape that adaptive nlist
    * reaches on real corpora (SCALEBENCH_r10: the flat assignment was
    * the superlinear term). Truth is the exact pair set recomputed
    * in-query; booleans are literal-stateable: recall ≥ 0.6 (the
    * fixture is the worst-case near-uniform corpus SPLIT INTO ~3-row
    * cells — deliberately brutal for cluster pruning; RecallSpec
    * measures the sf0.01 config at 0.8475, deterministic under the
    * fixed seeds, and the boolean holds at both SFs), sim_exact_ok
    * (within-cell scores are exact dot products), precision 1.0
    * (exact-filtered at the threshold).
    */
  private def qSemDedupHier(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cand = Similarity.semDedupPairs(e, "vec_id", "embedding",
      threshold = 0.4, nlist = 150, assignProbes = 3)
    val truth = Similarity.nearDupPairs(e, "vec_id", "embedding", threshold = 0.4)
    truth
      .join(cand.select(col("id_a"), col("id_b"), col("sim").as("cand_sim")),
        Seq("id_a", "id_b"), "left")
      .agg(
        count(lit(1)).as("n_true_pairs"),
        (coalesce(sum(when(col("cand_sim").isNotNull, 1L).otherwise(0L)), lit(0L)) * 10L >=
          count(lit(1)) * 6L).as("recall_ok"),
        (count(col("cand_sim")) === 0 ||
          max(abs(col("cand_sim") - col("sim"))) === 0.0).as("sim_exact_ok"))
      .crossJoin(
        cand.join(truth.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
          .agg((count(lit(1)) === 0).as("precision_ok")))
  }

  /** IVF ANN graded as a DETERMINISTIC CONTRACT: exact brute-force top-5
    * per query (qn09's operator; SQL-expressible) is the truth set, and
    * the IVF probe results are graded per query as literal-stateable
    * values: k_exact (always 5 — the corpus dwarfs k), returned_ok (IVF
    * yields exactly k rows per query), and a global recall >= 0.9
    * boolean (RecallSpec pins this config at 0.925 on the deliberately
    * worst-case near-uniform fixture; k-means seed fixed →
    * deterministic).
    */
  private def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.where(col("vec_id") < 8)
    // Corpus size from parquet footers (driver-side metadata read) — the
    // fit-sample fraction must not cost a count() job over the corpus.
    // nProbe 7 (of 8): the near-uniform fixture is IVF's worst case and
    // recall tracks the probed fraction as density grows (RecallAudit at
    // sf0.1: 6/8 → 0.875, 7/8 → 0.925); real clustered corpora run far
    // smaller fractions.
    val ivf = Similarity.ivfTopK(e, queries, "vec_id", "embedding",
      k = 5, nlist = 8, nProbe = 7,
      corpusRows = Some(Tables.parquetRowCount(s, s"$dir/embeddings.parquet")))
    val exact = Similarity.topKPerQuery(e, queries, "vec_id", "embedding", k = 5)
    val perQuery = exact
      .join(ivf.select(col("query_id"), col("vec_id"), lit(1L).as("hit")),
        Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    val returned = ivf.groupBy("query_id")
      .agg((count(lit(1)) === 5).as("returned_ok"))
    val global = perQuery
      .agg((sum("n_hit") * 10L >= sum("k_exact") * 9L).as("recall_ok"))
    perQuery
      .join(returned, Seq("query_id"), "left")
      .crossJoin(broadcast(global))
      .select(col("query_id"), col("k_exact"),
        coalesce(col("returned_ok"), lit(false)).as("returned_ok"),
        col("recall_ok"))
      .orderBy("query_id")
  }

  /** Product-quantization ANN graded as a deterministic contract, same
    * playbook as qn12: exact brute-force top-5 is the truth set;
    * k_exact/returned_ok are exact-stateable and recall >= 0.9 is a
    * bound RecallSpec pins at 0.95. PQ codes (16 bytes per 64-dim
    * vector, 16× smaller) drive the candidate shortlist; the exact
    * re-rank touches only shortlist·|queries| vectors. The near-uniform
    * fixture is PQ's worst case (see the qn12 note) — coarser configs
    * (m=8: 0.80) miss the gate; m=16 keeps 4 dims per subspace.
    */
  private def qAnnPq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.where(col("vec_id") < 8)
    val nRows = Tables.parquetRowCount(s, s"$dir/embeddings.parquet")
    // Corpus-adaptive shortlist: a FIXED shortlist decays as the corpus
    // grows (RecallAudit: 50 of 2000 at sf0.1 → recall 0.70); a constant
    // 10% fraction holds 0.95 on the uniform worst-case fixture at every
    // SF. On clustered real corpora the fraction shrinks with nlist-style
    // partitioning — here it is the honest uniform-data configuration.
    val pq = Similarity.pqTopK(e, queries, "vec_id", "embedding",
      dim = 64, k = 5, m = 16, ksub = 16,
      shortlist = math.max(50L, nRows / 10).toInt,
      corpusRows = Some(nRows))
    val exact = Similarity.topKPerQuery(e, queries, "vec_id", "embedding", k = 5)
    val perQuery = exact
      .join(pq.select(col("query_id"), col("vec_id"), lit(1L).as("hit")),
        Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    val returned = pq.groupBy("query_id")
      .agg((count(lit(1)) === 5).as("returned_ok"))
    val global = perQuery
      .agg((sum("n_hit") * 10L >= sum("k_exact") * 9L).as("recall_ok"))
    perQuery
      .join(returned, Seq("query_id"), "left")
      .crossJoin(broadcast(global))
      .select(col("query_id"), col("k_exact"),
        coalesce(col("returned_ok"), lit(false)).as("returned_ok"),
        col("recall_ok"))
      .orderBy("query_id")
  }

  /** IVF+PQ composed ANN graded as a deterministic contract (the qn12/
    * qn29 playbook): cell pruning bounds WHICH vectors are scored,
    * 16-byte codes bound WHAT each costs — the composition the
    * billion-vector path actually deploys, here in its honest
    * uniform-fixture configuration: nProbe 7/8 cells + adaptive n/8
    * shortlist — the COMPOSED loss stacks IVF's missed-cell misses on
    * PQ's shortlist misses, so each half needs more headroom than it
    * does alone (measured: nProbe 6 + n/10 = 0.85; 7 + n/8 = 0.95 /
    * 0.925 / 1.0 at sf0.01 / sf0.1 / 20k vectors). Truth = exact
    * brute-force top-5; recall >= 0.9 gated (RecallSpec pins the
    * measured value), returned_ok exact-stateable.
    */
  private def qAnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.where(col("vec_id") < 8)
    val nRows = Tables.parquetRowCount(s, s"$dir/embeddings.parquet")
    val ann = Similarity.ivfPqTopK(e, queries, "vec_id", "embedding",
      dim = 64, k = 5, nlist = 8, nProbe = 7, m = 16, ksub = 16,
      shortlist = math.max(50L, nRows / 8).toInt,
      corpusRows = Some(nRows))
    val exact = Similarity.topKPerQuery(e, queries, "vec_id", "embedding", k = 5)
    val perQuery = exact
      .join(ann.select(col("query_id"), col("vec_id"), lit(1L).as("hit")),
        Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    val returned = ann.groupBy("query_id")
      .agg((count(lit(1)) === 5).as("returned_ok"))
    val global = perQuery
      .agg((sum("n_hit") * 10L >= sum("k_exact") * 9L).as("recall_ok"))
    perQuery
      .join(returned, Seq("query_id"), "left")
      .crossJoin(broadcast(global))
      .select(col("query_id"), col("k_exact"),
        coalesce(col("returned_ok"), lit(false)).as("returned_ok"),
        col("recall_ok"))
      .orderBy("query_id")
  }

  /** Near-dup dedup applied end-to-end: detect pairs (capped-shingle
    * Jaccard), cluster via connected components (large-star/small-star,
    * O(log n) rounds), keep the smallest doc per cluster. Oracle =
    * recursive-CTE transitive closure.
    */
  private def qDedupApply(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupByJaccard(docs(s, dir), "doc_id", "text", n = 3, threshold = 0.8)
      .select("doc_id")
      .orderBy("doc_id")

  /** Embedding near-dup dedup applied end-to-end: exact cosine pairs at
    * 0.4 (qn10's detector) → connected components → keep the smallest
    * vec_id per cluster. Oracle = recursive-CTE transitive closure over
    * DuckDB-computed exact cosine pairs (the embedding analog of qn15).
    *
    * `maxExactRows` is PINNED to the exact detector here: the oracle
    * states exact-cosine semantics, so the corpus-size routing default
    * (→ cell-pruned SemDeDup above 20k rows, with its accepted recall
    * loss) must not silently flip this query's semantics at a larger SF
    * and fail the grade. The routed default is what production callers
    * get; ScaleBench's qn26_dedup_routed row measures IT at 200k vecs.
    */
  private def qDedupCosine(s: SparkSession, dir: String): DataFrame =
    Similarity.dedupByCosine(emb(s, dir), "vec_id", "embedding", threshold = 0.4,
      maxExactRows = Long.MaxValue)
      .select("vec_id")
      .orderBy("vec_id")

  /** Incremental dedup replay — the daily-ingest shape: the corpus's
    * FIRST half (by doc_id; ingest ids grow monotonically) is deduped
    * one-shot and its full shingle-signature table is persisted through
    * the versioned store; the second half then arrives as a new batch
    * and is deduped INCREMENTALLY against the read-back signatures
    * ([[Dedup.dedupIncremental]]: cross join + batch self-join only —
    * the history is never re-paired with itself). The survivors of
    * (one-shot first half) ∪ (incremental second half) must equal the
    * one-shot dedup of the WHOLE corpus, which is exactly what the
    * oracle states (qn15's recursive-CTE SQL): the equivalence holds
    * because no fixture doc bridges two previously-distinct clusters.
    * The split point comes from parquet footer metadata — no count job.
    */
  private def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cut = Tables.parquetRowCount(s, s"$dir/documents.parquet") / 2
    val old = d.where(col("doc_id") < cut)
    val fresh = d.where(col("doc_id") >= cut)
    // Hot-shingle capping ENABLED on both legs (r7; mirrored by the
    // oracle's corpus-wide cap CTE). The incremental leg's cap is
    // corpus-wide via the PERSISTED per-shingle doc frequencies
    // ([[Dedup.shingleDocFreqs]], stored next to the signatures and read
    // back) — prev∪new frequency from O(distinct shingles) state, never
    // an O(corpus) re-aggregation — so the new batch's survivors equal
    // the one-shot corpus outcome at any SF (new-doc survival depends
    // only on edges touching new docs). The day-0 leg ALSO caps
    // corpus-wide — day-0 + day-1 frequencies summed, the same hot set
    // the oracle's corpus-wide cap CTE states — so replay ≡ one-shot is
    // STRUCTURAL, not a fixture property (a shingle crossing the cap
    // only corpus-wide no longer splits the two cap sets). The replay
    // has both halves in hand by construction; a true day-0 run would
    // cap over day-0 alone and reconcile on the next ingest.
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_dedup_"))
    // sig0 feeds both state loads — materialize the explode once and
    // run the two independent-table loads concurrently (guide §2.6).
    val sig0 = Dedup.materialize(
      Dedup.shingleSignatures(old, "doc_id", "text", n = 3))
    sig0.count()
    graft.Concurrency.inParallel(Seq[() => Unit](
      () => { store.load(sig0, "dedup/signatures", externalKey = "day0"); () },
      () => { store.load(Dedup.shingleDocFreqs(sig0), "dedup/freqs",
        externalKey = "day0"); () }))(_.apply())
    // The fresh half's shingle-frequency table feeds TWO cap legs — the
    // day-0 corpus-wide cap (summed with the persisted day-0 freqs) and
    // dedupIncremental's internal prev∪batch hot set — so it is
    // aggregated ONCE and materialized (lazy localCheckpoint; the table
    // is distinct-shingle-sized, O(batch) to build), then shared via
    // `batchShingleFreqs`, whose contract (batch-only counts, exactly
    // this aggregation) is documented on the op. Before r9 the two legs
    // re-ran the explode+aggregate independently — the r8-declared
    // 6.2 → 7.1 s regression this sharing recovers.
    val freshFreqs = Dedup.materialize(
      Dedup.shingleDocFreqs(Dedup.shingleSignatures(fresh, "doc_id", "text", n = 3)))
    val prevFreqs = store.get("dedup/freqs", useLast = true)
      .select(col("s"), col("df"))
    val corpusFreqs = prevFreqs
      .unionByName(freshFreqs)
      .groupBy("s").agg(sum("df").as("df"))
    // The two legs are independent detector+components pipelines whose
    // construction runs EAGER driver actions (signature materialization
    // + the components collect) — build them concurrently (guide §2.6).
    // freshFreqs feeds both legs: force its materialization first so
    // the concurrent scans share cache instead of racing to compute it.
    freshFreqs.count()
    val Seq(keptOld, keptNew) = graft.Concurrency.inParallel(
      Seq[() => DataFrame](
        () => Dedup.dedupByJaccard(old, "doc_id", "text", n = 3,
          threshold = 0.8, shingleFreqs = Some(corpusFreqs)),
        () => Dedup.dedupIncremental(fresh,
          store.get("dedup/signatures", useLast = true),
          "doc_id", "text", n = 3, threshold = 0.8,
          prevShingleFreqs = Some(prevFreqs),
          batchShingleFreqs = Some(freshFreqs))))(_.apply())
    keptOld.select("doc_id").union(keptNew.select("doc_id")).orderBy("doc_id")
  }

  /** qn24's day-0/day-1 replay with the state on the round-16 layout
    * end to end — signatures as TWO bucketed slices, shingle
    * frequencies as TWO bucketed slices read through [[graft.store
    * .BucketedState.family]]'s exchange-free aggregate feeding the
    * zipper hot set (`prevFreqsPartitioned`), per-doc raw counts as TWO
    * bucketed-by-id slices read through the same family scan (the r17
    * third surface) — i.e. exactly what
    * [[graft.streaming.DocStreams.dedupBatchAgainstStore]] runs per
    * micro-batch, graded in batch form. The oracle is qn24's one-shot
    * recursive-CTE SQL verbatim: the layout and every state-side plan
    * change, the survivor set must not (and the freq slices OVERLAP by
    * construction, so the family aggregate's summing semantics are on
    * the graded path, not just the suite).
    */
  private def qDedupIncrementalBucketed(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cut = Tables.parquetRowCount(s, s"$dir/documents.parquet") / 2
    val half = cut / 2
    val old = d.where(col("doc_id") < cut)
    val fresh = d.where(col("doc_id") >= cut)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_dedupb_"))
    val sig0 = Dedup.materialize(
      Dedup.shingleSignatures(old, "doc_id", "text", n = 3))
    val sigRoot = store.statePath("dedup/sigs")
    val freqRoot = store.statePath("dedup/freqs")
    // Counts as the THIRD bucketed surface (r17): one bucketed-by-id
    // slice per ingest, read back through the same family scan — the
    // layout [[graft.streaming.DocStreams.dedupBatchAgainstStore]]
    // persists per micro-batch (docs partition across slices, so the
    // family read IS the union, no fold needed).
    val countsRoot = store.statePath("dedup/sigcounts")
    // Materialize sig0 BEFORE the fan-out (one pass; the six concurrent
    // writes then share its cached blocks), and submit the six
    // independent writes — six (root, label) pairs, no shared files —
    // concurrently (guide §2.6) instead of paying six serial job walls.
    sig0.count()
    graft.Concurrency.inParallel(Seq[() => Unit](
      () => graft.store.BucketedState.write(
        sig0.where(col("id") < half), sigRoot, "b0", "s", numBuckets = 32),
      () => graft.store.BucketedState.write(
        sig0.where(col("id") >= half), sigRoot, "b1", "s", numBuckets = 32),
      () => graft.store.BucketedState.write(
        Dedup.shingleDocFreqs(sig0.where(col("id") < half)),
        freqRoot, "b0", "s", numBuckets = 32),
      () => graft.store.BucketedState.write(
        Dedup.shingleDocFreqs(sig0.where(col("id") >= half)),
        freqRoot, "b1", "s", numBuckets = 32),
      () => graft.store.BucketedState.write(
        Dedup.shingleSignatureCounts(sig0.where(col("id") < half)),
        countsRoot, "b0", "id", numBuckets = 32),
      () => graft.store.BucketedState.write(
        Dedup.shingleSignatureCounts(sig0.where(col("id") >= half)),
        countsRoot, "b1", "id", numBuckets = 32)))(_.apply())
    val prevFreqs = graft.store.BucketedState.family(s, freqRoot)
      .groupBy("s").agg(sum("df").as("df"))
    val batchFreqs = Dedup.materialize(
      Dedup.shingleDocFreqs(Dedup.shingleSignatures(fresh, "doc_id", "text", n = 3)))
    val corpusFreqs = prevFreqs.unionByName(batchFreqs)
      .groupBy("s").agg(sum("df").as("df"))
    // Independent legs, eager construction actions — build concurrently
    // (guide §2.6); batchFreqs feeds both, so force it first.
    batchFreqs.count()
    val Seq(keptOld, keptNew) = graft.Concurrency.inParallel(
      Seq[() => DataFrame](
        () => Dedup.dedupByJaccard(old, "doc_id", "text", n = 3,
          threshold = 0.8, shingleFreqs = Some(corpusFreqs)),
        () => Dedup.dedupIncrementalSliced(fresh,
          graft.store.BucketedState.slices(s, sigRoot), "doc_id", "text",
          n = 3, threshold = 0.8,
          prevShingleFreqs = Some(prevFreqs),
          batchShingleFreqs = Some(batchFreqs),
          prevSigCounts = Some(graft.store.BucketedState.family(s, countsRoot)),
          prevFreqsPartitioned = true)))(_.apply())
    keptOld.select("doc_id").union(keptNew.select("doc_id")).orderBy("doc_id")
  }

  /** qn129's day-0/day-1 replay with the r17 state-FOLD lifecycle in the
    * middle: day 0 lands as FOUR slices on every bucketed surface
    * (signatures, overlapping shingle-frequency slices, per-doc counts)
    * and [[graft.streaming.DocStreams.compactDedupState]] — the
    * out-of-band maintenance job, running each fold under the
    * compaction lease through the staged-data → retirement-manifest →
    * one-sidecar-publish protocol — folds all three to one slice before
    * day 1 ingests. Graded against qn24's one-shot oracle verbatim: the
    * fold is a layout operation, so if the frequency fold double-counts
    * or drops a shingle (4 OVERLAPPING slices sum into 1 — the summing
    * semantics are on the graded path), or the counts fold gaps a doc,
    * the hot set / Jaccard denominators shift and the survivor set
    * diverges.
    */
  private def qDedupStateFolded(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cut = Tables.parquetRowCount(s, s"$dir/documents.parquet") / 2
    val old = d.where(col("doc_id") < cut)
    val fresh = d.where(col("doc_id") >= cut)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_dedupf_"))
    val sig0 = Dedup.materialize(
      Dedup.shingleSignatures(old, "doc_id", "text", n = 3))
    val sigRoot = store.statePath("dedup/sigs")
    val freqRoot = store.statePath("dedup/freqs")
    val countsRoot = store.statePath("dedup/sigs-counts")
    // 12 independent (root, label) writes — materialize sig0 once, then
    // fan the writes out on driver threads (guide §2.6: overlap
    // independent jobs) instead of 12 serial job walls.
    sig0.count()
    graft.Concurrency.inParallel((0 until 4).flatMap { i =>
      def part = sig0.where(pmod(col("id"), lit(4)) === i)
      Seq[() => Unit](
        () => graft.store.BucketedState.write(part, sigRoot, s"b$i", "s",
          numBuckets = 32),
        () => graft.store.BucketedState.write(Dedup.shingleDocFreqs(part),
          freqRoot, s"b$i", "s", numBuckets = 32),
        () => graft.store.BucketedState.write(Dedup.shingleSignatureCounts(part),
          countsRoot, s"b$i", "id", numBuckets = 32))
    })(_.apply())
    graft.streaming.DocStreams.compactDedupState(s, store, "m0",
      sigTable = "dedup/sigs", freqTable = "dedup/freqs")
    val prevFreqs = graft.store.BucketedState.family(s, freqRoot)
      .groupBy("s").agg(sum("df").as("df"))
    val batchFreqs = Dedup.materialize(
      Dedup.shingleDocFreqs(Dedup.shingleSignatures(fresh, "doc_id", "text", n = 3)))
    val corpusFreqs = prevFreqs.unionByName(batchFreqs)
      .groupBy("s").agg(sum("df").as("df"))
    // Independent legs, eager construction actions — build concurrently
    // (guide §2.6); batchFreqs feeds both, so force it first.
    batchFreqs.count()
    val Seq(keptOld, keptNew) = graft.Concurrency.inParallel(
      Seq[() => DataFrame](
        () => Dedup.dedupByJaccard(old, "doc_id", "text", n = 3,
          threshold = 0.8, shingleFreqs = Some(corpusFreqs)),
        () => Dedup.dedupIncrementalSliced(fresh,
          graft.store.BucketedState.slices(s, sigRoot), "doc_id", "text",
          n = 3, threshold = 0.8,
          prevShingleFreqs = Some(prevFreqs),
          batchShingleFreqs = Some(batchFreqs),
          prevSigCounts = Some(graft.store.BucketedState.family(s, countsRoot)),
          prevFreqsPartitioned = true)))(_.apply())
    keptOld.select("doc_id").union(keptNew.select("doc_id")).orderBy("doc_id")
  }

  /** qn130's fold lifecycle fired MID-OUTAGE of a crashed stream, the
    * exclusion derived from the stream's own checkpoint (r18): batch
    * 3's slices landed on every surface but its commit never did — the
    * offsets/commits logs (fabricated exactly as Structured Streaming
    * lays them out, plain batch-id file names; the LIVE-stream
    * integration incl. the injected crash and real restart is pinned in
    * StreamingSpec) show offsets {0..3} vs commits {0..2}, so
    * [[graft.streaming.DocStreams.compactDedupState]] must fold b0–b2
    * and leave b3 alone with NO manual exclude. The "restarted stream"
    * then replays batch 3 (rewriting its slices — the
    * replay-idempotence contract) before day 1 ingests against
    * {m0, b3}. Graded against qn24's one-shot oracle verbatim: folding
    * the uncommitted slice would put batch 3's rows in BOTH m0 and the
    * rewritten b3 — doubled signatures and summed-twice frequencies
    * shift the hot set and the Jaccard denominators, and the survivor
    * set diverges. The in-query `require` makes the other failure mode
    * (over-exclusion folding nothing) loud too.
    */
  private def qDedupFoldCrashedStream(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cut = Tables.parquetRowCount(s, s"$dir/documents.parquet") / 2
    val old = d.where(col("doc_id") < cut)
    val fresh = d.where(col("doc_id") >= cut)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_dedupc_"))
    val sig0 = Dedup.materialize(
      Dedup.shingleSignatures(old, "doc_id", "text", n = 3))
    val sigRoot = store.statePath("dedup/sigs")
    val freqRoot = store.statePath("dedup/freqs")
    val countsRoot = store.statePath("dedup/sigs-counts")
    // Per-batch surface writes as independent thunks: 12 (root, label)
    // pairs for the initial ingest, 3 for the replay — fanned out on
    // driver threads (guide §2.6) after sig0 materializes once.
    def batchWrites(i: Int): Seq[() => Unit] = {
      def part = sig0.where(pmod(col("id"), lit(4)) === i)
      Seq(
        () => graft.store.BucketedState.write(part, sigRoot, s"b$i", "s",
          numBuckets = 32),
        () => graft.store.BucketedState.write(Dedup.shingleDocFreqs(part),
          freqRoot, s"b$i", "s", numBuckets = 32),
        () => graft.store.BucketedState.write(Dedup.shingleSignatureCounts(part),
          countsRoot, s"b$i", "id", numBuckets = 32))
    }
    def writeBatch(i: Int): Unit =
      graft.Concurrency.inParallel(batchWrites(i))(_.apply())
    sig0.count()
    graft.Concurrency.inParallel((0 until 4).flatMap(batchWrites))(_.apply())
    // The crashed stream's checkpoint: batch 3 write-ahead-logged
    // (offsets/3) but never committed (no commits/3).
    val ckpt = java.nio.file.Paths.get(
      graft.TempDirs.create("graft_dedupc_ckpt_"))
    java.nio.file.Files.createDirectories(ckpt.resolve("offsets"))
    java.nio.file.Files.createDirectories(ckpt.resolve("commits"))
    (0 to 3).foreach(i =>
      java.nio.file.Files.write(ckpt.resolve(s"offsets/$i"), "v1".getBytes))
    (0 to 2).foreach(i =>
      java.nio.file.Files.write(ckpt.resolve(s"commits/$i"), "v1".getBytes))
    graft.streaming.DocStreams.compactDedupState(s, store, "m0",
      sigTable = "dedup/sigs", freqTable = "dedup/freqs",
      checkpoint = Some(ckpt.toString))
    val live = graft.store.BucketedState.versions(s, sigRoot).toSet
    require(live == Set("b3", "m0"),
      s"checkpoint-derived exclusion mis-sized the fold: live=$live")
    // The restarted stream replays batch 3: slices rewritten in place.
    writeBatch(3)
    val prevFreqs = graft.store.BucketedState.family(s, freqRoot)
      .groupBy("s").agg(sum("df").as("df"))
    val batchFreqs = Dedup.materialize(
      Dedup.shingleDocFreqs(Dedup.shingleSignatures(fresh, "doc_id", "text", n = 3)))
    val corpusFreqs = prevFreqs.unionByName(batchFreqs)
      .groupBy("s").agg(sum("df").as("df"))
    // Independent legs, eager construction actions — build concurrently
    // (guide §2.6); batchFreqs feeds both, so force it first.
    batchFreqs.count()
    val Seq(keptOld, keptNew) = graft.Concurrency.inParallel(
      Seq[() => DataFrame](
        () => Dedup.dedupByJaccard(old, "doc_id", "text", n = 3,
          threshold = 0.8, shingleFreqs = Some(corpusFreqs)),
        () => Dedup.dedupIncrementalSliced(fresh,
          graft.store.BucketedState.slices(s, sigRoot), "doc_id", "text",
          n = 3, threshold = 0.8,
          prevShingleFreqs = Some(prevFreqs),
          batchShingleFreqs = Some(batchFreqs),
          prevSigCounts = Some(graft.store.BucketedState.family(s, countsRoot)),
          prevFreqsPartitioned = true)))(_.apply())
    keptOld.select("doc_id").union(keptNew.select("doc_id")).orderBy("doc_id")
  }

  /** Edit-distance + character-transform text functions. */
  private def qTextDistance(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        levenshtein(substring(col("text"), 1, 40),
          lit("the quick brown fox jumps over")).as("lev"),
        translate(substring(col("text"), 1, 20), "aeiou", "AEIOU").as("tr"),
        regexp_replace(substring(col("text"), 1, 30), "[aeiou]", "").as("novowel"))
      .orderBy("doc_id")

  /** End-to-end training-data pipeline: quality-score filter → language
    * filter → fingerprint dedup → per-source stats. Composes TextOps +
    * Dedup in one declarative plan (one scan, one window shuffle, one
    * aggregate — the shape a 100 TB curation job takes).
    */
  private def qPipeline(s: SparkSession, dir: String): DataFrame = {
    val c = col("text")
    val filtered = docs(s, dir)
      .withColumn("quality", TextOps.qualityScore(c))
      .withColumn("predicted", TextOps.langId(c))
      .withColumn("fp", TextOps.fingerprint(c))
      .where(col("quality") >= 0.6 && col("predicted") === "en")
    Dedup.exactKeepFirst(filtered, Seq("fp"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), round(avg("quality"), 4).as("avg_quality"))
      .orderBy("source")
  }

  /** C4/Gopher-style corpus quality filter with per-rule drop accounting:
    * keep counts plus WHY-dropped counts per (lang, source) — the audit a
    * 100 TB cut runs before committing. Pure per-row codegen'd rules, one
    * aggregate, no shuffle beyond the groupBy.
    */
  private def qQualityFilter(s: SparkSession, dir: String): DataFrame = {
    val r = TextOps.qualityRules(col("text"))
    docs(s, dir)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(r.keep, 1).otherwise(0)).as("n_kept"),
        sum(when(!r.lengthOk, 1).otherwise(0)).as("n_fail_len"),
        sum(when(!r.wordShapeOk, 1).otherwise(0)).as("n_fail_shape"),
        sum(when(!r.repetitionOk, 1).otherwise(0)).as("n_fail_rep"),
        sum(when(!r.stopwordOk, 1).otherwise(0)).as("n_fail_stop"))
      .orderBy("lang", "source")
  }

  /** PII redaction (email / phone / IPv4 → sentinels) with per-pattern
    * audit counts. The fixture corpus is synthetic and PII-free, so PII
    * is INJECTED deterministically (docs with doc_id % 7 == 0 get a
    * doc_id-derived email + phone + IP appended) by the query itself,
    * identically mirrored in the oracle — the regexes are genuinely
    * exercised and the md5 of each redacted text must match DuckDB's.
    */
  private def qRedactPii(s: SparkSession, dir: String): DataFrame = {
    val injected = when(pmod(col("doc_id"), lit(7)) === 0,
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" at 10.0."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".17")))
      .otherwise(col("text"))
    val cnts = TextOps.piiCounts(injected).map { case (name, c) => c.as(s"n_$name") }
    // Bind the redacted text ONCE and branch md5/length off the bound
    // column — Catalyst CSE usually rescues a doubled expression tree,
    // but a 6-regex chain is too expensive to leave to "usually".
    val redacted = TextOps.redactPii(injected)
    docs(s, dir)
      .where(pmod(col("doc_id"), lit(7)) === 0)
      .withColumn("__redacted", redacted)
      .select(Seq(col("doc_id"),
        md5(col("__redacted").cast("binary")).as("redacted_md5"),
        length(col("__redacted")).as("redacted_len")) ++ cnts: _*)
      .orderBy("doc_id")
  }

  /** Sequence packing: assign docs to ~2048-token training bins by
    * cumulative token count per source (deterministic doc_id order).
    * One window + one aggregate; at scale each source packs
    * independently (partitioned window), the standard pre-tokenization
    * batching step.
    */
  private def qPackSequences(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs(s, dir)
      .select(col("source"), col("doc_id"), TextOps.tokenCount(col("text")).as("toks"))
      .withColumn("bin",
        floor(coalesce(sum(col("toks")).over(w), lit(0L)) / lit(2048)).cast("long"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("sum_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "bin")
  }

  /** Multimodal: binary payload → per-partition feature extraction
    * (text/plain stand-in payloads take the declared byte-stats
    * fallback; real decode is graded by qn21 for images and qn14 for
    * video).
    */
  private def qMultimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.attachBinary(docs(s, dir), "doc_id", "text", "text/plain"))
      .toDF()
      .orderBy("doc_id")

  /** REAL video decode + frame sampling: deterministic synthetic
    * ANIMATED GIFs (frame count and dimensions pure functions of doc_id)
    * are written executor-side through the JDK GIF sequence writer, then
    * decoded back through the `javax.imageio` multi-frame path of
    * [[Multimodal.extractFeatures]] (`ImageReader.getNumImages(true)`),
    * and exploded by [[Multimodal.sampleFrames]]. The decoded
    * width/height/frame-count and the exploded row count must all
    * reproduce the generator's formulas, which the oracle states as
    * literals — this grades a full multi-frame render → GIF-encode →
    * decode → explode round-trip, the video analog of qn21.
    */
  private def qMultimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = docs(s, dir).where(col("doc_id") < 64)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val w = (8 + id % 16).toInt
        val h = (8 + (id * 3) % 16).toInt
        val f = (1 + id % 5).toInt
        Multimodal.MediaRecord(id, Multimodal.syntheticGif(w, h, f, id), "video/gif")
      }
    val feats = Multimodal.extractFeatures(media.toDF())
    val exploded = Multimodal.sampleFrames(feats)
      .groupBy("doc_id").agg(count(lit(1)).as("n_frames_exploded"))
    feats.toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"))
      .join(exploded, "doc_id")
      .orderBy("doc_id")
  }

  /** REAL per-frame video decode (the qn14 round-trip, one level deeper):
    * deterministic synthetic ANIMATED GIFs with a lossless indexed-gray
    * palette are rendered and encoded executor-side (every pixel a pure
    * small-integer function of (doc_id, frame, x, y)), then EVERY frame
    * is decoded back via `ImageReader.read(i)` and its actual pixels
    * reduced to a position-weighted checksum
    * ([[Multimodal.decodeVideoFrames]]). The oracle recomputes each
    * frame's checksum in SQL from the generator formula alone
    * (generate_series over frames × rows × cols) — so the graded rows
    * only match if the render → GIF-encode → per-frame-decode →
    * per-pixel-read pipeline is exact.
    */
  private def qVideoFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = docs(s, dir).where(col("doc_id") < 48)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val w = (6 + id % 10).toInt
        val h = (6 + (id * 3) % 10).toInt
        val f = (1 + id % 4).toInt
        Multimodal.MediaRecord(id, Multimodal.syntheticGifIndexed(w, h, f, id), "video/gif")
      }
    Multimodal.extractFrameFeatures(media.toDF()).toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** REAL image decode: deterministic synthetic PNGs are rendered and
    * encoded executor-side (dimensions a pure function of doc_id), then
    * decoded back through the `javax.imageio` path of
    * [[Multimodal.extractFeatures]] — the decoded width/height must
    * reproduce the generator's formulas, which the oracle states as
    * literals. This grades a full render → PNG-encode → decode
    * round-trip; only video remains on the declared stub (qn14).
    */
  private def qImageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = docs(s, dir).where(col("doc_id") < 48)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val w = (8 + id % 16).toInt
        val h = (8 + (id * 3) % 16).toInt
        Multimodal.MediaRecord(id, Multimodal.syntheticPng(w, h, id), "image/png")
      }
    Multimodal.extractFeatures(media.toDF()).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"))
      .orderBy("doc_id")
  }

  /** REAL audio decode — the audio leg of the multimodal family:
    * deterministic synthetic WAVs are rendered and encoded executor-side
    * (every 16-bit PCM sample a pure small-integer function of
    * (doc_id, i)), then decoded back through `javax.sound.sampled` and
    * reduced to a position-weighted checksum
    * ([[Multimodal.decodeAudio]]). The oracle recomputes every checksum
    * in SQL from the generator formula (generate_series over samples) —
    * the rows only match if the render → WAV-encode → decode →
    * per-sample-read pipeline is bit-exact.
    */
  private def qAudioDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = docs(s, dir).where(col("doc_id") < 48)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val n = (4000 + (id % 5) * 2000).toInt
        Multimodal.MediaRecord(id, Multimodal.syntheticWav(n, 8000, id), "audio/wav")
      }
    Multimodal.extractAudioFeatures(media.toDF()).toDF()
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: docs with doc_id % 50 == 3 play the
    * "benchmark"; every other doc sharing >= 1 word-3-gram with it is
    * flagged with its distinct-overlap count. Broadcast semi-match —
    * the corpus side never shuffles for the match.
    */
  private def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val isBench = pmod(col("doc_id"), lit(50)) === 3
    TextOps.contaminationOverlap(d.where(!isBench), d.where(isBench), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Bloom-sketch decontamination graded as a deterministic contract:
    * the same benchmark split as qn22, but the corpus probes a
    * fixed-size Bloom sketch of the benchmark shingles instead of
    * joining a broadcast shingle table — the shape that survives when
    * the benchmark suite is GBs (the sketch stays a few MB). Two
    * stateable guarantees: NO false negatives (every qn22-contaminated
    * doc is flagged — Bloom filters cannot miss an inserted key), and a
    * bounded false-positive overhang (fpp 1e-6 × ~250k corpus probes
    * ⇒ expected extras ≈ 0; the sketch is deterministic, so the literal
    * bound 5 is stable at any fixture SF).
    */
  private def qDecontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val isBench = pmod(col("doc_id"), lit(50)) === 3
    val corpus = d.where(!isBench)
    val bench = d.where(isBench)
    val flagged = TextOps.contaminationBloom(corpus, bench, "doc_id", "text",
      n = 3, expectedItems = 1L << 16, fpp = 1e-6).select(col("doc_id"))
    val truth = TextOps.contaminationOverlap(corpus, bench, "doc_id", "text")
      .select(col("doc_id"))
    val gates = truth.join(flagged, Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
      .crossJoin(flagged.join(truth, Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_extra")))
      .select((col("n_missed") === 0).as("no_false_negatives"),
        (col("n_extra") <= 5).as("fp_bound_ok"))
    truth
      .join(flagged.select(col("doc_id"), lit(true).as("flagged")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("flagged"), lit(false)).as("flagged"))
      .crossJoin(broadcast(gates))
      .orderBy("doc_id")
  }

  /** Corpus-level boilerplate removal (CCNet-style paragraph dedup;
    * paragraph = 8-token window on this newline-free fixture): drop
    * segments shared by >= 2 distinct docs, rebuild each doc from the
    * survivors, and grade per-doc segment counts + the md5 of the
    * rebuilt text. One frequency aggregate + one equality join + one
    * rebuild aggregate — never all-pairs.
    */
  private def qRemoveBoilerplate(s: SparkSession, dir: String): DataFrame =
    TextOps.removeBoilerplate(docs(s, dir), "doc_id", "text", segLen = 8, minDocs = 2)
      .select(col("doc_id"), col("n_segments"), col("n_removed"), col("n_kept_words"),
        md5(col("cleaned_text").cast("binary")).as("cleaned_hash"))
      .orderBy("doc_id")

  /** CCNet-style LM fluency scoring: the odd-id half of the corpus is
    * scored under a bigram stupid-backoff LM trained on the even-id
    * half — unseen bigrams exercise the 0.4·unigram backoff and unseen
    * unigrams the OOV floor, so every code path grades. Closed-form
    * sums → exact-match oracle (4-dp rounding absorbs cross-engine
    * double-sum drift, the qn42 stance).
    */
  private def qLmFluency(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    TextOps.lmFluencyScores(d.where(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text",
        lm = Some(d.where(pmod(col("doc_id"), lit(2)) === 0)))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("score"), 4).as("score"))
      .orderBy("doc_id")
  }

  /** Multi-benchmark decontamination: two disjoint benchmark slices
    * (doc_id % 50 == 3 → bench_a, == 7 → bench_b) screened in ONE
    * corpus pass with per-benchmark attribution — K more benchmarks
    * cost broadcast bytes, not corpus scans. Exact-match oracle
    * (string-keyed shingle joins on both sides, qn22's construction
    * with a benchmark tag).
    */
  private def qDecontamMulti(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val isA = pmod(col("doc_id"), lit(50)) === 3
    val isB = pmod(col("doc_id"), lit(50)) === 7
    TextOps.contaminationOverlapMulti(d.where(!isA && !isB),
        Seq("bench_a" -> d.where(isA), "bench_b" -> d.where(isB)),
        "doc_id", "text")
      .orderBy("doc_id", "benchmark")
  }

  /** qn116 against PINNED store artifacts: each benchmark's shingle
    * table persists once ([[Dedup.saveReferenceShingles]], the qn109
    * seam), and the one-pass multi-suite screen reads the pinned
    * versions — no benchmark text, no re-shingling in the plan. Oracle
    * is qn116's SQL verbatim: oracle-green IS the stored ≡ fresh proof
    * for the whole battery.
    */
  private def qDecontamMultiStored(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val isA = pmod(col("doc_id"), lit(50)) === 3
    val isB = pmod(col("doc_id"), lit(50)) === 7
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_mref_"))
    Dedup.saveReferenceShingles(store, "bench/a", d.where(isA),
      "doc_id", "text", externalKey = "v1")
    Dedup.saveReferenceShingles(store, "bench/b", d.where(isB),
      "doc_id", "text", externalKey = "v1")
    TextOps.contaminationOverlapMultiStored(d.where(!isA && !isB),
        Seq(
          "bench_a" -> store.get("bench/a/signatures", Some("v1"), useLast = false),
          "bench_b" -> store.get("bench/b/signatures", Some("v1"), useLast = false)),
        "doc_id", "text")
      .orderBy("doc_id", "benchmark")
  }

  /** CCNet perplexity terciles: the odd-id half scored under the
    * even-id-trained bigram LM (qn45's split, so every backoff path
    * grades), then cut head/middle/tail PER LANGUAGE by equal-count
    * ntile — the published CCNet bucketing. Scores 4dp-rounded before
    * the cut, ties by doc_id → the bucket assignment is
    * engine-deterministic and the oracle restates it exactly.
    */
  private def qPerplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    TextOps.perplexityBuckets(d.where(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", "lang",
        lm = Some(d.where(pmod(col("doc_id"), lit(2)) === 0)))
      .orderBy("doc_id")
  }

  /** The GK-threshold perplexity cut — qn117's 100 TB deployment path —
    * graded as a contract ([[TextOps.perplexityThresholdAudit]]): the
    * sketch edges' rank bounds, bucket monotonicity, and tie-adjusted
    * bucket balance verified against exactly-counted ranks per
    * language, with zero windows or sorts anywhere in the plan
    * (suite-asserted). Same LM split as qn117 so every backoff path
    * feeds the cut being audited.
    */
  private def qPerplexityThresholds(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    TextOps.perplexityThresholdAudit(
        d.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", "lang",
        lm = Some(d.where(pmod(col("doc_id"), lit(2)) === 0)))
      .orderBy("lang")
  }

  /** Binary-signature INDEX lifecycle: build the packed-signature
    * artifact on 90% of the corpus, append the remaining 10% as a
    * second version (O(batch) — signatures are deterministic per
    * vector, so appends are exact, no centroid drift), and serve qn118's
    * search from the accumulated artifact. The oracle is qn118's SQL
    * verbatim over the FULL corpus, so oracle-green pins
    * stored+append ≡ fresh end-to-end (pack → parquet round-trip →
    * Hamming heap → rerank).
    */
  private def qHammingIndex(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_bq_"))
    VectorIndex.buildHamming(store,
      e.where(pmod(col("vec_id"), lit(10)) =!= 0), "vec_id", "embedding",
      "ann/bq", externalKey = "v1")
    VectorIndex.appendHamming(store,
      e.where(pmod(col("vec_id"), lit(10)) === 0), "vec_id", "embedding",
      "ann/bq", externalKey = "v2")
    VectorIndex.searchHamming(store, "ann/bq", e,
        e.where(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, oversample = 4, useLast = false)
      .orderBy("query_id", "rank")
  }

  /** Flat-index CHURN graded end-to-end (the qn102 pattern applied to
    * the binary-signature tier): build the packed artifact on the full
    * corpus, tombstone the `%10` ids (gen 1), re-embed the `%7` ids
    * with REVERSED vectors (gen 2 — an id in both sets comes back live
    * in its new form; the tombstone spares rows at its own
    * generation), and serve qn118's search from the artifact plus the
    * deletes sidecar. The oracle restates qn118's hamming pipeline
    * over the LIVE corpus (exclusions + reversals in SQL), so
    * oracle-green pins the whole liveness join: stale rows dead
    * everywhere, re-embedded rows served in their new form, candidate
    * cut and ranks exact.
    */
  private def qIndexChurnFlat(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_bqchurn_"))
    VectorIndex.buildHamming(store, e, "vec_id", "embedding", "ann/bqc",
      externalKey = "v1")
    VectorIndex.deleteHamming(store,
      e.where(pmod(col("vec_id"), lit(10)) === 0).select("vec_id"),
      "vec_id", "ann/bqc", gen = 1L, externalKey = "d1")
    val reembedded = e.where(pmod(col("vec_id"), lit(7)) === 0)
      .withColumn("embedding", reverse(col("embedding")))
    VectorIndex.reembedHamming(store, reembedded, "vec_id", "embedding",
      "ann/bqc", gen = 2L, externalKey = "v2")
    val live = e.where(pmod(col("vec_id"), lit(10)) =!= 0 &&
        pmod(col("vec_id"), lit(7)) =!= 0)
      .unionByName(reembedded)
    VectorIndex.searchHamming(store, "ann/bqc", live,
        live.where(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, oversample = 4, useLast = false)
      .orderBy("query_id", "rank")
  }

  /** qn120's lifecycle served through the candidate-id-PRUNED rerank —
    * the storage-bound deployment plan (the rerank's float fetch
    * carries a plan-time IN filter instead of re-scanning every float
    * byte; SCALEBENCH_r16_storage.log measures why). Result-identical
    * to the default plan by contract, so the graded claim is the
    * shared qn120 oracle verbatim: pruning changed the PLAN only.
    */
  private def qHammingIndexPruned(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_bqp_"))
    VectorIndex.buildHamming(store,
      e.where(pmod(col("vec_id"), lit(10)) =!= 0), "vec_id", "embedding",
      "ann/bq", externalKey = "v1")
    VectorIndex.appendHamming(store,
      e.where(pmod(col("vec_id"), lit(10)) === 0), "vec_id", "embedding",
      "ann/bq", externalKey = "v2")
    VectorIndex.searchHamming(store, "ann/bq", e,
        e.where(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, oversample = 4, useLast = false, pruneRerank = true)
      .orderBy("query_id", "rank")
  }

  /** Scalar-quantized (SQ8) ANN graded end-to-end as an exact contract
    * (the qn118 stance): every step — L2 normalize, per-vector
    * max-abs/127 scale, round-half-away int8 codes, integer dot,
    * 6dp-rounded approximate score, candidate cut with id tie-breaks,
    * exact-cosine rerank — is deterministic IEEE/integer arithmetic
    * the oracle restates operation for operation. Green means the
    * quantizer itself (not just the search) agrees across engines,
    * code for code.
    */
  private def qAnnInt8(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.int8TopK(e, e.where(col("vec_id") < 8), "vec_id",
        "embedding", k = 5, oversample = 4)
      .orderBy("query_id", "rank")
  }

  /** Quantization-fidelity audit over both lossy tiers, per label:
    * mean/min reconstruction cosine of SQ8 (≈0.99998 on this fixture —
    * near-lossless, why its search recall reads 1.0) and of 1-bit
    * sign quantization (≈0.80 ≈ √(2/π), the known Gaussian-vector
    * angular fidelity — why the 1-bit tier needs oversampling+rerank).
    * Every step is deterministic arithmetic the oracle restates
    * (guarded ratios, 6dp per-vector rounding, DECIMAL group sums), so
    * the audit itself is exact-graded, not spot-checked.
    */
  private def qQuantErrorAudit(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizationErrorAudit(emb(s, dir), "vec_id", "embedding",
        "label")
      .orderBy("label")

  /** SQ8 INDEX lifecycle — qn120's build/append/serve contract applied
    * to the 8-bit tier: build on 90%, O(batch)-append the rest, serve
    * qn122's search from the accumulated artifact; oracle is qn122's
    * SQL verbatim, so stored+append ≡ fresh is the green itself.
    */
  private def qInt8Index(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_sq8_"))
    VectorIndex.buildInt8(store,
      e.where(pmod(col("vec_id"), lit(10)) =!= 0), "vec_id", "embedding",
      "ann/sq8", externalKey = "v1")
    VectorIndex.appendInt8(store,
      e.where(pmod(col("vec_id"), lit(10)) === 0), "vec_id", "embedding",
      "ann/sq8", externalKey = "v2")
    VectorIndex.searchInt8(store, "ann/sq8", e,
        e.where(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, oversample = 4, useLast = false)
      .orderBy("query_id", "rank")
  }

  /** n-gram LM ARTIFACT lifecycle — the qn106–qn109 store seam applied
    * to the last fit-per-query model in the text family: fit
    * [[TextOps.lmCounts]] on the even-id half once → persist as a
    * versioned store artifact → supersede with a deliberately
    * degenerate one-row LM (the `_last` pointer must serve it) → roll
    * back via pinned `externalKey` and score the odd half from the
    * rolled-back tables. The oracle is qn45's EXACT fresh-LM SQL, so
    * oracle-green IS the stored ≡ fresh proof (count tables round-trip
    * parquet losslessly; every join is key-exact);
    * `last_superseded_ok` pins the version semantics as a literal the
    * oracle restates.
    */
  private def qLmStore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_lm_"))
    val (uni, bi) = TextOps.lmCounts(
      d.where(pmod(col("doc_id"), lit(2)) === 0), "text")
    TextOps.saveLanguageModel(s, store, "lm/bigram", uni, bi,
      externalKey = "v1")
    TextOps.saveLanguageModel(s, store, "lm/bigram",
      Seq(("the", 1L)).toDF("term", "n"),
      Seq(("the", "the", 1L)).toDF("w1", "w2", "n"), externalKey = "v2")
    val (lastUni, _) = TextOps.loadLanguageModel(store, "lm/bigram")
    val lastOk = lastUni.count() == 1L
    val (u1, b1) = TextOps.loadLanguageModel(store, "lm/bigram", Some("v1"))
    TextOps.lmFluencyScoresFrom(
        d.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", u1, b1)
      .select(col("doc_id"), col("n_bigrams"),
        round(col("score"), 4).as("score"))
      .withColumn("last_superseded_ok", lit(lastOk))
      .orderBy("doc_id")
  }

  /** Binary-quantized ANN: sign-bit Hamming candidates (k·4
    * oversample), exact-cosine rerank — graded END-TO-END as an exact
    * contract because every step is deterministic: the signature is
    * the dimension signs (no hashing), the candidate cut breaks ties
    * (hamming, vec_id) ascending, and the rerank is qn08's 6dp-rounded
    * cosine. The oracle restates the pipeline with hamming as a
    * sign-mismatch count — packing-free, so it also pins that the
    * packed-word bit_count(xor) equals the definition.
    */
  private def qAnnHamming(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.hammingTopK(e, e.where(col("vec_id") < 8), "vec_id",
        "embedding", k = 5, oversample = 4)
      .orderBy("query_id", "rank")
  }

  /** Temperature-scaled mixing over the (skewed) `lang` grouping:
    * p ∝ c^0.7 sized to a 200-doc budget, hash-thresholded selection.
    * Per-group totals + rates are closed-form → exact-match oracle.
    */
  private def qTemperatureMix(s: SparkSession, dir: String): DataFrame =
    Mixture.temperatureSample(docs(s, dir), "doc_id", "lang",
        alpha = 0.7, budgetDocs = 200L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        round(first(col("mix_rate")), 6).as("rate"))
      .orderBy("lang")

  /** Span-level decontamination applied: benchmark = every 50th doc
    * (qn37's split), corpus = the rest; tokens covered by any
    * benchmark-overlapping 3-gram are dropped and the doc is rebuilt.
    * Exact-match oracle (string-keyed matching on both sides).
    */
  private def qDecontaminateSpans(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val isBench = pmod(col("doc_id"), lit(50)) === 3
    TextOps.removeContaminatedSpans(d.where(!isBench), d.where(isBench),
        "doc_id", "text", n = 3)
      .select(col("doc_id"), col("n_tokens"), col("n_removed_tokens"),
        md5(col("cleaned_text").cast("binary")).as("cleaned_hash"))
      .orderBy("doc_id")
  }

  /** DSIR importance scoring: per-doc log-likelihood ratio of an
    * add-1-smoothed unigram LM fit on the `lang = 'en'` target slice
    * vs one fit on the whole corpus — the data-selection score that
    * precedes importance resampling. Deterministic closed-form sums →
    * exact-match oracle (rounded to 4 dp; the ~60-term double sum
    * agrees across engines to ~1e-13).
    */
  private def qDsirScore(s: SparkSession, dir: String): DataFrame =
    TextOps.dsirScores(docs(s, dir), "doc_id", "text", col("lang") === "en")
      .select(col("doc_id"), col("n_tokens"), round(col("score"), 4).as("score"))
      .orderBy("doc_id")

  /** ExactSubstr overlap (Lee et al. dedup family): per doc, how many
    * of its stride-1 20-token windows occur verbatim in another doc.
    * Fully SQL-restateable → exact-match oracle over all docs.
    */
  private def qExactSubstring(s: SparkSession, dir: String): DataFrame =
    TextOps.exactSubstringOverlap(docs(s, dir), "doc_id", "text", k = 20)
      .withColumn("flagged", col("n_shared_windows") > 0)
      .orderBy("doc_id")

  /** Corpus vocabulary stats: top-30 tokens by document frequency
    * (distinct doc per token). One explode + one hash agg + global
    * top-k — the vocab-building pass of a tokenizer pipeline.
    */
  private def qVocab(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("tok"))
      .limit(30)

  /** Mixture sampling: fill each source's token budget in deterministic
    * pseudo-shuffle order ([[Mixture.priority]]). Budgets are formulaic
    * (200 + 50·K for source `srcK`) so the oracle states them without
    * enumerating sources. Runs the two-phase bucket plan — the full
    * corpus crosses one aggregate shuffle, only the per-source boundary
    * bucket is row-sorted.
    */
  private def qMixtureSample(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .withColumn("toks", TextOps.tokenCount(col("text")).cast("long"))
    val budgets = d.select(col("source")).distinct()
      .withColumn("budget",
        lit(200L) + lit(50L) * substring(col("source"), 4, 8).cast("long"))
    Mixture.sampleByTokenBudget(d, "doc_id", "toks", "source", budgets)
      .select(col("doc_id"), col("source"), col("toks").cast("int").as("toks"))
      .orderBy("doc_id")
  }

  /** Weighted sampling without replacement: a 50-doc subsample drawn
    * proportional to token count via Efraimidis–Spirakis exponential
    * keys over the deterministic [[Mixture.priority]] uniform — fully
    * stateable in SQL, so the oracle recomputes the exact same draw.
    */
  private def qWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("toks", TextOps.tokenCount(col("text")))
    Mixture.weightedSample(d, "doc_id", "toks", k = 50)
      .select(col("doc_id"), col("toks"), round(col("es_key"), 6).as("es_key"))
      .orderBy("doc_id")
  }

  /** Document chunking: 64-token windows every 48 tokens (16-token
    * overlap), the curation→tokenization bridge. Chunk text is reduced
    * to md5 so the gate compares content without multi-KB cells.
    */
  private def qChunkSequences(s: SparkSession, dir: String): DataFrame =
    TextOps.chunkSequences(docs(s, dir), "doc_id", "text", window = 64, stride = 48)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_len"),
        md5(col("chunk_text")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")

  /** Intra-document repetition: the fraction of a doc's word-3-gram
    * occurrences that belong to a 3-gram repeated WITHIN the same doc —
    * the within-document half of the dedup literature's repetition
    * signals (boilerplate, template spam), complementing the
    * cross-document ops (qn02–qn04). [[TextOps.chunkSequences]] with
    * window=3, stride=1 IS the non-distinct shingle stream; two hash
    * aggregates, no joins.
    */
  private def qIntraDocRepetition(s: SparkSession, dir: String): DataFrame =
    TextOps.chunkSequences(docs(s, dir), "doc_id", "text", window = 3, stride = 1)
      .where(col("chunk_len") === 3)
      .groupBy("doc_id", "chunk_text")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_shingles"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("n_repeated"))
      .withColumn("rep_frac", round(col("n_repeated") / col("n_shingles"), 4))
      .orderBy("doc_id")

  /** Token-balanced output sharding: 8 training shards of ≈ equal token
    * mass, assignment by integer-exact running totals in deterministic
    * priority order — both engines state the same longs, so per-shard
    * doc and token counts hash-match exactly.
    */
  private def qTokenShards(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .withColumn("toks", TextOps.tokenCount(col("text")).cast("long"))
    Mixture.tokenShards(d, "doc_id", "toks", numShards = 8)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("shard_tokens"))
      .orderBy("shard_id")
  }

  /** Incremental distinct counting with MERGEABLE sketches: per-source
    * distinct-token cardinality from two per-ingest HLL sketches (even /
    * odd doc ids) unioned — never rescanning the first ingest — graded
    * against a full-corpus sketch and the exact SQL count. DataSketches
    * HLL is order-insensitive and exact below its coupon limit; the
    * contract states exact counts plus 2%-error booleans (the qn12
    * playbook), which hold at any SF for lgK=12. This is the pattern
    * that makes per-version distinct stats O(delta) in the store: one
    * tiny sketch per ingest, union at read.
    */
  private def qIncrementalDistinct(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(col("source"), col("doc_id"),
      explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
    def sk(half: Column) = toks.where(half)
      .groupBy("source").agg(hll_sketch_agg(col("tok")).as("sk"))
    val inc = sk(pmod(col("doc_id"), lit(2)) === 0)
      .unionByName(sk(pmod(col("doc_id"), lit(2)) === 1))
      .groupBy("source").agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_inc"))
    val full = toks.groupBy("source")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("tok"))).as("est_full"))
    val exact = toks.groupBy("source")
      .agg(countDistinct(col("tok")).as("n_exact"))
    exact.join(inc, "source").join(full, "source")
      .select(col("source"), col("n_exact"),
        (abs(col("est_inc") - col("n_exact")) * 50 <= col("n_exact")).as("inc_ok"),
        (abs(col("est_full") - col("n_exact")) * 50 <= col("n_exact")).as("full_ok"))
      .orderBy("source")
  }

  /** Contrastive hard-negative mining: for 8 anchors, the 3 most
    * similar corpus vectors INSIDE the [0.15, 0.35) band — confusable
    * but non-duplicate, the negatives an embedding-model trainer pairs
    * with each anchor. Exact (band-filtered bounded-heap top-k), so the
    * oracle states the full rows.
    */
  private def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.hardNegatives(e, e.where(col("vec_id") < 8), "vec_id", "embedding",
      k = 3, loSim = 0.15, hiSim = 0.35)
      .orderBy("query_id", "rank")
  }

  /** Unicode normalization + casefold: NFC-compose then lowercase — the
    * cleaning pass that makes crawl duplicates differing only in
    * normalization form hash-equal. The fixture text is ASCII (where NFC
    * is the identity), so the query appends a DECOMPOSED suffix (base
    * letters + combining marks, stated by codepoint on both sides):
    * an implementation that fails to compose shows in n_norm and in the
    * hash; casefold shows via the uppercase base letters.
    */
  private def qNormalizeText(s: SparkSession, dir: String): DataFrame = {
    // " nfc:E" + U+0301, "O" + U+0308, "A" + U+030A -> NFC "ÉÖÅ" -> lower "éöå"
    val suffix = " nfc:ÉÖÅ"
    val normed = lower(graft.functions.VectorExpressions
      .nfcNormalize(concat(col("text"), lit(suffix))))
    docs(s, dir).select(
      col("doc_id"),
      length(concat(col("text"), lit(suffix))).as("n_raw"),
      length(normed).as("n_norm"),
      md5(normed).as("norm_hash"))
      .orderBy("doc_id")
  }

  /** Near-dup dedup keeping the HIGHEST-QUALITY member per duplicate
    * cluster (n_chars as the quality proxy; ties → smallest id) — the
    * representative-selection policy a production pipeline deploys when
    * duplicates differ in quality (keep the longest copy, drop its
    * truncated mirrors). Same detector as qn15 (capped-shingle exact
    * Jaccard at 0.8), so the two graded queries isolate exactly the
    * keep policy; oracle = qn15's recursive transitive closure plus a
    * per-component rank.
    */
  private def qDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.applyComponentsKeepBest(d,
      Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8),
      "doc_a", "doc_b", "doc_id", "n_chars")
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** Deterministic cross-engine hash split (80/10/10), graded as per
    * (source, split) aggregates: the bucket is the first 4 hex chars of
    * md5("graft:" ++ doc_id) compared lexicographically against hex
    * thresholds — bit-identical in Spark and DuckDB, so the held-out
    * sets are stable across engines, partitionings, and incremental
    * ingests (the property that makes a hash split the right tool; a
    * rand()-based split survives none of those).
    */
  private def qHashSplit(s: SparkSession, dir: String): DataFrame =
    Mixture.hashSplit(docs(s, dir), "doc_id", "graft",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source", "split")

  /** Leakage-safe split: qn47's 80/10/10 hash split re-keyed on the
    * normalized-text dup-group anchor (min doc_id per md5-of-normalized
    * text), so exact/near-identical docs can never straddle train and
    * test. n_groups counts distinct dup groups per cell; the leakage
    * invariant itself (each group in exactly ONE split) is
    * property-tested in MixtureSpec — here the oracle grades the full
    * assignment arithmetic.
    */
  private def qLeakageSafeSplit(s: SparkSession, dir: String): DataFrame =
    Mixture.leakageSafeSplit(
        docs(s, dir).withColumn("__g",
          md5(TextOps.normalizeForMatch(col("text")).cast("binary"))),
        "doc_id", "__g", "graft",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("__g")).as("n_groups"))
      .orderBy("source", "split")

  /** Per-source quality quantile: percent_rank of n_chars WITHIN each
    * source — the cross-source score normalization a mixture sampler
    * composes with qn39/qn44 (absolute quality scales are
    * source-specific; quantiles are comparable). Tie rows share a rank
    * (SQL-standard), so no tiebreak column is needed for cross-engine
    * determinism.
    */
  private def qSourceQuantile(s: SparkSession, dir: String): DataFrame =
    Mixture.sourceQuantileRank(docs(s, dir), "source", "n_chars")
      .select(col("doc_id"), col("source"), round(col("q_rank"), 6).as("q_rank"))
      .orderBy("doc_id")

  /** Cross-corpus NEAR-dup decontamination: docs in the corpus's second
    * half that are ≥0.8-Jaccard near-dups of any first-half doc — the
    * paraphrase/truncation leak the exact-overlap family (qn22/qn37/
    * qn41) cannot see. Shingle equality join across the corpora (never
    * a cross product), hot-capped over both sides combined; 13 of the
    * fixture's 25 near-dup pairs cross the half boundary.
    */
  private def qCrossCorpusNearDup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cut = Tables.parquetRowCount(s, s"$dir/documents.parquet") / 2
    Dedup.crossCorpusNearDupPairs(
      d.where(col("doc_id") >= cut), d.where(col("doc_id") < cut),
      "doc_id", "text", n = 3, threshold = 0.8)
      .orderBy("target_id", "ref_id")
  }

  /** Duplicate-cluster size distribution over the qn15 pair set — the
    * corpus-quality headline ("how much is duplicated, how big do the
    * clusters get"). Tiny output (distinct sizes); oracle = recursive
    * closure + two aggregations.
    */
  private def qDupClusterStats(s: SparkSession, dir: String): DataFrame =
    Dedup.dupClusterSizeHistogram(
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", n = 3, threshold = 0.8),
      "doc_a", "doc_b")

  /** Span-level corpus self-dedup (ExactSubstr, Lee et al. 2022):
    * tokens inside any 20-token window whose 20-gram already occurs in
    * a SMALLER-id doc are removed and the doc rebuilt — the earliest
    * copy keeps its text intact, later copies lose exactly the
    * duplicated spans. qn41 FLAGS the overlap; this applies the
    * removal. Exact-match oracle (qn43's rebuild pattern + a min-doc
    * gram table).
    */
  private def qDedupSpans(s: SparkSession, dir: String): DataFrame =
    TextOps.removeDuplicatedSpans(docs(s, dir), "doc_id", "text", k = 20)
      .select(col("doc_id"), col("n_tokens"), col("n_removed_tokens"),
        md5(col("cleaned_text").cast("binary")).as("cleaned_hash"))
      .orderBy("doc_id")

  /** SEMANTIC decontamination detector: second-half vectors whose
    * embedding has cosine ≥ 0.4 against any first-half vector — the
    * paraphrase leak neither the exact-overlap family (qn22/qn37/qn41/
    * qn43, verbatim n-grams) nor shingle Jaccard (qn49) can see. Exact
    * bipartite block-grid ([[Similarity.crossCorpusCosinePairs]]); at
    * scale [[Similarity.semanticDecontaminate]] routes to the
    * cell-pruned path (OpsSpec pins the router + recall).
    */
  private def qSemanticDecontam(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cut = Tables.parquetRowCount(s, s"$dir/embeddings.parquet") / 2
    Similarity.crossCorpusCosinePairs(
      e.where(col("vec_id") >= cut), e.where(col("vec_id") < cut),
      "vec_id", "embedding", threshold = 0.4)
      .orderBy("target_id", "ref_id")
  }

  /** Per-source quota cap (the C4/RefinedWeb domain cap): keep the best
    * 8 docs per source by (n_chars desc, doc_id asc). Selection runs
    * through the bounded-heap aggregate, not a sort-the-source window —
    * see [[Mixture.capPerSource]]. The fixture has (source, n_chars)
    * ties, so the id tiebreak is genuinely exercised.
    */
  private def qSourceCap(s: SparkSession, dir: String): DataFrame =
    Mixture.capPerSource(docs(s, dir), "source", "n_chars", "doc_id",
        maxPerSource = 8)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  /** Inter-source duplication matrix over the qn15 detector's pair set:
    * which sources mirror each other (and how much each self-dups) —
    * the provenance audit that decides dedup ORDER at 100 TB.
    */
  private def qSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.sourceOverlapMatrix(
      Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8),
      d, "doc_a", "doc_b", "doc_id", "source")
      .orderBy("source_a", "source_b")
  }

  /** Per-label embedding cohesion: centroid + cosine band per label —
    * the embedding-space label-noise audit ([[Similarity.labelCohesion]]).
    */
  private def qLabelCohesion(s: SparkSession, dir: String): DataFrame =
    Similarity.labelCohesion(emb(s, dir), "vec_id", "embedding", "label")
      .orderBy("label")

  /** Embedding-space drift matrix between SOURCES: documents supply the
    * provenance, embeddings the vectors (joined doc_id = vec_id). The
    * between-group complement of qn55's within-group cohesion.
    */
  private def qSourceDrift(s: SparkSession, dir: String): DataFrame =
    Similarity.centroidDriftMatrix(
      docs(s, dir).select(col("doc_id"), col("source"))
        .join(emb(s, dir), col("doc_id") === col("vec_id")),
      "embedding", "source")
      .withColumnRenamed("group_a", "source_a")
      .withColumnRenamed("group_b", "source_b")
      .orderBy("source_a", "source_b")

  /** Normalized-exact decontamination: the benchmark side is a
    * deterministically PERTURBED copy (padding + uppercase + added
    * punctuation) of every 50th doc — raw-hash matching finds nothing,
    * so the normalization layer is load-bearing in the grade. Expected
    * flagged set = exactly the perturbed docs' originals (the fixture
    * has no normalized cross-doc collisions).
    */
  private def qDecontaminateNormalized(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val bench = d.where(col("doc_id") % 50 === 3)
      .select(concat(lit("  "), upper(col("text")), lit(" !!! ")).as("btext"))
    TextOps.decontaminateNormalized(d, "doc_id", "text", bench, "btext")
      .select(col("doc_id"), col("norm_hash"))
      .orderBy("doc_id")
  }

  /** Per-doc unigram entropy (nats) — repetition-shape quality signal. */
  private def qTokenEntropy(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .where(length(trim(col("text"))) > 0)
      .select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        size(array_distinct(TextOps.tokens(col("text")))).cast("long")
          .as("n_distinct"),
        round(TextOps.tokenEntropy(col("text")), 4).as("entropy"))
      .orderBy("doc_id")

  /** Top-3 TF-IDF terms per doc — keyword extraction / cluster labels. */
  private def qTfidfKeywords(s: SparkSession, dir: String): DataFrame =
    TextOps.tfidfKeywords(docs(s, dir), "doc_id", "text", k = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id", "rank")

  /** N-gram novelty of the second half against the first (the qn49
    * halves): how much of each new doc exists ANYWHERE in the reference
    * corpus — the crawl-worth-adding audit. The fixture's planted
    * near-dups score near zero; genuinely fresh docs score near one.
    */
  private def qNgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cut = Tables.parquetRowCount(s, s"$dir/documents.parquet") / 2
    TextOps.ngramNovelty(
      d.where(col("doc_id") >= cut), d.where(col("doc_id") < cut),
      "doc_id", "text", n = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** Bottom-2 cosine-to-centroid members per label — the mislabel
    * shortlist behind qn55's cohesion band.
    */
  private def qLabelOutliers(s: SparkSession, dir: String): DataFrame =
    Similarity.labelOutliers(emb(s, dir), "vec_id", "embedding", "label", k = 2)
      .withColumnRenamed("id", "vec_id")
      .orderBy("label", "rank")

  /** Top-20 corpus tokens with cumulative token-mass coverage (Zipf-head
    * audit / tokenizer-vocab sizing).
    */
  private def qVocabCoverage(s: SparkSession, dir: String): DataFrame =
    TextOps.vocabCoverage(docs(s, dir), "text", k = 20)
      .orderBy("rank")

  /** Nearest same-label neighbor per vector (contrastive positives; the
    * complement of qn34's hard negatives).
    *
    * `maxExactRows` is PINNED to the exact detector (the qn26 stance):
    * the oracle states exact same-label-1-NN semantics, so the
    * corpus-size routing default (→ cell-pruned probing above 20k rows,
    * with its accepted recall loss) must not silently flip this query's
    * semantics at a larger SF. The routed default is what production
    * callers get; ScaleBench's qn63_routed row measures IT.
    */
  private def qPositivePairs(s: SparkSession, dir: String): DataFrame =
    Similarity.positivePairs(emb(s, dir), "vec_id", "embedding", "label",
      maxExactRows = Long.MaxValue)
      .orderBy("label", "anchor_id")

  /** BM25 top-10 for a fixed 3-term query — keyword retrieval over the
    * corpus. Ranking on the ROUNDED score (see bm25Search) keeps the
    * top-k cut engine-deterministic.
    */
  private def qBm25(s: SparkSession, dir: String): DataFrame =
    TextOps.bm25Search(docs(s, dir), "doc_id", "text",
      query = Seq("vector", "customer", "merge"), k = 10)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("score").desc, col("doc_id"))

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 keyword
    * shortlist (qn64's query, widened to top-20) and the dense cosine
    * shortlist for query vector 0 (qn08's, widened to top-20) — the
    * standard sparse+dense RAG-retrieval combiner. doc_id and vec_id
    * are aligned in the fixture, so the two lists rank the same corpus.
    * Both branch ranks come from rounded scores with id tiebreaks, so
    * the fused cut is engine-deterministic end to end.
    */
  private def qHybridRrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sparse = TextOps.bm25Search(docs(s, dir), "doc_id", "text",
      query = Seq("vector", "customer", "merge"), k = 20)
      // 20-row shortlist: the unpartitioned window is shortlist-sized.
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("id").asc)))
      .select("id", "rank")
    val e = emb(s, dir)
    val dense = Similarity.topKPerQuery(e, e.where(col("vec_id") === 0),
      "vec_id", "embedding", k = 20)
      .select(col("vec_id").as("id"), col("rank"))
    TextOps.rrfFuse(Seq(sparse, dense), k = 10)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  /** Top-15 adjacent-bigram collocations by PMI (min count 5) —
    * multi-word-expression mining over the corpus.
    */
  private def qPmi(s: SparkSession, dir: String): DataFrame =
    // No re-sort: the op already returns rows in selection order
    // (rounded pmi desc, bigram string asc) — re-ordering by
    // (term_a, term_b) could diverge from that tiebreak on exotic
    // tokens, and the grade sorts rows itself anyway.
    TextOps.pmiCollocations(docs(s, dir), "text", k = 15, minCount = 5L)

  /** Blocking-key near-dup pairs (first-3-token key + exact Jaccard) —
    * the record-linkage blocking family next to the shingle/LSH
    * detectors; 25 of the fixture's near-dup pairs share their prefix.
    */
  private def qBlockingDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.blockingNearDupPairs(docs(s, dir), "doc_id", "text")
      .orderBy("doc_a", "doc_b")

  /** Containment (|A∩B|/min) near-dup pairs at 0.9 — the asymmetric
    * truncation/subset detector next to qn02's symmetric Jaccard.
    */
  private def qContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentNearDupPairs(docs(s, dir), "doc_id", "text")
      .orderBy("doc_a", "doc_b")

  /** Exact top-10 tokens audited against the Count-Min Sketch bound —
    * the graded half is the exact list; `within_bounds` grades the
    * sketch's `exact ≤ est ≤ exact + ⌈eps·N⌉` contract as literal true
    * (the qn11/qn31 contract-oracle pattern for hash-dependent ops).
    */
  private def qHeavyHitters(s: SparkSession, dir: String): DataFrame =
    TextOps.heavyHittersCms(docs(s, dir), "text", k = 10)
      .orderBy(col("n").desc, col("term"))

  /** 1-NN label agreement on an every-5th-vector eval sample — the
    * embedding-space label-consistency audit behind qn55/qn61.
    *
    * `maxExactRows` is PINNED to the exact detector (the qn26 stance):
    * the oracle states exact leave-one-out 1-NN semantics, so the
    * corpus-size routing default (→ IVF probing above 20k rows, with
    * its accepted recall loss) must not silently flip this query's
    * semantics at a larger SF. The routed default is what production
    * callers get; ScaleBench's qn69_routed row measures IT.
    */
  private def qKnnAgreement(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.knnLabelAgreement(e.where(col("vec_id") % 5 === 0), e,
      "vec_id", "embedding", "label",
      maxExactRows = Long.MaxValue)
      .orderBy("label")
  }

  /** The ROUTED [[Similarity.positivePairs]] leg graded end-to-end —
    * closing the r9 verdict's gap (qn63 pins exact semantics; the
    * production cell-pruned routing above 20k rows was suite/ScaleBench-
    * verified only). `maxExactRows = 0` forces the routed path — corpus-
    * adaptive nlist, fixed-seed k-means fit, soft 3-probe assignment on
    * both sides, (cell, label) candidate join, bounded-heap top-1 — and
    * the exact leg is recomputed in-query as truth (the qn12 playbook).
    * Graded as literal-stateable values: n_anchors (every vector whose
    * label has a second member — SQL-stateable), coverage_ok (routed
    * emits ≥ 95% of anchors), id_recall_ok (routed argmax id matches
    * exact on ≥ 80% of anchors; the near-uniform fixture measures 1.0 at
    * sf0.01 and sf0.1 — 3 probes of 8 corpus-adaptive cells is a 37.5%
    * probed fraction, far above ScaleData's adversarial regime), and
    * cos_sound_ok (a routed pair's cosine never exceeds the exact
    * optimum — structural: routed scores a candidate subset, and
    * rounding is monotonic, so the bound survives the 4dp round).
    */
  private def qPositivePairsRouted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val routed = Similarity.positivePairs(e, "vec_id", "embedding", "label",
      maxExactRows = 0L)
    val exact = Similarity.positivePairs(e, "vec_id", "embedding", "label",
      maxExactRows = Long.MaxValue)
    exact.select(col("label"), col("anchor_id"),
        col("pos_id").as("exact_pos"), col("cos").as("exact_cos"))
      .join(routed.select(col("label"), col("anchor_id"),
        col("pos_id").as("routed_pos"), col("cos").as("routed_cos")),
        Seq("label", "anchor_id"), "left")
      .agg(
        count(lit(1)).as("n_anchors"),
        (count(col("routed_pos")) * 100L >= count(lit(1)) * 95L)
          .as("coverage_ok"),
        (sum(when(col("routed_pos") === col("exact_pos"), 1L).otherwise(0L))
          * 100L >= count(lit(1)) * 80L).as("id_recall_ok"),
        (coalesce(max(col("routed_cos") - col("exact_cos")), lit(0.0)) <= 0.0)
          .as("cos_sound_ok"))
  }

  /** The ROUTED [[Similarity.knnLabelAgreement]] leg graded end-to-end
    * (qn69's production path above 20k rows — `maxExactRows = 0` forces
    * the IVF probe plan: fixed-seed coarse quantizer, hard-assigned
    * candidates, 16-probe codegen anchor assignment). The exact leg is
    * recomputed in-query as truth. Per label: the anchor count (SQL-
    * stateable — every anchor has an exact 1-NN since the corpus dwarfs
    * one row), n_ok (routed audits the SAME anchor population — no
    * silent anchor loss from empty probed cells; 16 of ~√n cells leaves
    * hundreds of candidates per anchor), and agreement_close_ok (routed
    * per-label agreement within 0.1 of exact — the RecallSpec band,
    * which holds on adversarial ScaleData at these defaults; the
    * near-uniform fixture measures ≤ 0.02 drift at both SFs).
    */
  private def qKnnAgreementRouted(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val anchors = e.where(col("vec_id") % 5 === 0)
    val exact = Similarity.knnLabelAgreement(anchors, e,
      "vec_id", "embedding", "label", maxExactRows = Long.MaxValue)
    val routed = Similarity.knnLabelAgreement(anchors, e,
      "vec_id", "embedding", "label", maxExactRows = 0L)
    exact.select(col("label"), col("n"), col("agreement").as("exact_agreement"))
      .join(routed.select(col("label"), col("n").as("n_routed"),
        col("agreement").as("routed_agreement")), Seq("label"), "left")
      .select(col("label"), col("n"),
        coalesce(col("n_routed") === col("n"), lit(false)).as("n_ok"),
        coalesce(abs(col("routed_agreement") - col("exact_agreement")) <= 0.1,
          lit(false)).as("agreement_close_ok"))
      .orderBy("label")
  }

  /** Cross-modality referential integrity: every doc should have an
    * embedding row and vice versa — the join-coverage audit a
    * multimodal pipeline runs after every ingest (an orphaned side
    * means a failed embedding job or a dropped shard). Four 1-row
    * aggregates (two counts + two anti-join counts) cross-joined; at
    * scale each anti-join is one key-only shuffle.
    */
  private def qModalityCoverage(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"))
    val e = emb(s, dir).select(col("vec_id"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val nVecs = e.agg(count(lit(1)).as("n_vecs"))
    val docsNoVec = d.join(e, col("doc_id") === col("vec_id"), "left_anti")
      .agg(count(lit(1)).as("docs_without_vec"))
    val vecsOrphan = e.join(d, col("vec_id") === col("doc_id"), "left_anti")
      .agg(count(lit(1)).as("vecs_orphaned"))
    nDocs.crossJoin(nVecs).crossJoin(docsNoVec).crossJoin(vecsOrphan)
  }

  /** Source-distribution shift between the corpus halves: per source,
    * each half's share and the total-variation contribution
    * |p − q| / 2 — the "did the crawl mix change" audit next to qn56's
    * embedding-space drift. Counts aggregate map-side; the output is
    * sources-sized.
    */
  private def qSourceShift(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cut = Tables.parquetRowCount(s, s"$dir/documents.parquet") / 2
    val counts = d.groupBy("source").agg(
      sum(when(col("doc_id") < cut, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("doc_id") >= cut, 1L).otherwise(0L)).as("n_b"))
    val totals = counts.agg(
      sum(col("n_a")).cast("double").as("tot_a"),
      sum(col("n_b")).cast("double").as("tot_b"))
    counts.crossJoin(broadcast(totals))
      .select(col("source"), col("n_a"), col("n_b"),
        round(col("n_a") / col("tot_a"), 4).as("p"),
        round(col("n_b") / col("tot_b"), 4).as("q"),
        round(abs(col("n_a") / col("tot_a") - col("n_b") / col("tot_b")) / 2.0, 4)
          .as("tvd_contrib"))
      .orderBy("source")
  }

  /** Topic-cluster balance audit: assign every embedding to its nearest
    * of 8 DETERMINISTIC centroids (the vectors with vec_id 0–7 — pinned
    * so the DuckDB oracle can replay the assignment; the production
    * clustering path is [[Similarity]]'s seeded KMeans, whose centroids
    * no SQL oracle can re-derive) and report per-cluster size, mean
    * cosine-to-centroid, and majority-label purity. Plan shape: the 8
    * normalized centroids broadcast onto one corpus scan (codegen dot
    * per pair), per-vector argmax folds map-side in the `max(struct)`
    * partial aggregate (all 8 candidate rows of a vector are produced in
    * the same input partition, so the shuffle carries one row per
    * vector), then two label/cluster-sized aggregates. Sims are rounded
    * to 6dp before BOTH the argmax and the DECIMAL mean so every
    * comparison is engine-deterministic. Scale: one pass over the
    * corpus, shuffles bounded by |corpus| then |clusters×labels|.
    */
  private def qClusterBalance(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val assigned = Similarity.assignToCentroids(
      e,
      e.where(col("vec_id") < 8)
        .select(col("vec_id").as("cluster_id"), col("embedding")),
      "vec_id", "embedding", "cluster_id", "embedding",
      carry = Seq("label"))
    val perLabel = assigned
      .groupBy("cluster_id", "label")
      .agg(count(lit(1)).as("cnt"),
        sum(col("sim").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .as("ssim"))
    perLabel
      .groupBy("cluster_id")
      .agg(
        sum(col("cnt")).as("n"),
        round(sum(col("ssim")).cast("double") / sum(col("cnt")), 4).as("avg_sim"),
        max(struct(col("cnt"), (-col("label")).as("nl"))).as("top"))
      .select(col("cluster_id"), col("n"), col("avg_sim"),
        (-col("top.nl")).as("top_label"),
        round(col("top.cnt") / col("n"), 6).as("top_label_share"))
      .orderBy("cluster_id")
  }

  /** Embedding-health audit (the QA gate a pipeline runs BEFORE building
    * any ANN index): per label — count, zero-norm vectors, NaN-bearing
    * vectors, dimensionality drift (min/max length), and L2-norm
    * spread. Pure per-row expressions (codegen fold for the norm) into
    * one label-sized aggregate; norms round to 6dp and accumulate in
    * DECIMAL so the mean is engine-exact. Scale: one scan, one tiny
    * shuffle.
    */
  private def qEmbeddingHealth(s: SparkSession, dir: String): DataFrame =
    Similarity.embeddingHealth(emb(s, dir), "embedding", "label")
      .orderBy("label")

  /** ANN index lifecycle graded as an EXACT contract: build an IVF
    * index over the corpus, persist it into a versioned store
    * ([[VectorIndex.buildIvf]] — centroids + cell-partitioned
    * assignments), then serve top-5 for 8 queries from the PERSISTED
    * artifact with every cell probed. At full probes IVF is exactly
    * brute force, so the oracle is the qn09 exact SQL — it matches
    * only if fit→persist→reload→probe→re-rank is jointly lossless.
    * The default-nProbe recall/pruning story is qn12's; what this row
    * grades is the index's storage lifecycle.
    */
  private def qIndexPersist(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    // idBucketWidth = 1: one partition directory per IVF cell, so a
    // probe's IN filter prunes to exactly the probed cells' files.
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_vecidx_"),
      idBucketWidth = 1L)
    val (nl, _) = VectorIndex.buildIvf(store, e, "vec_id", "embedding", "idx/emb")
    VectorIndex.searchIvf(store, "idx/emb", e.where(col("vec_id") < 8),
      "vec_id", "embedding", k = 5, nProbe = nl)
      .orderBy("query_id", "rank")
  }

  /** ANN index freshness under CHURN ([[VectorIndex.reembedIvf]] /
    * [[VectorIndex.tombstoneIvf]]): build → re-embed every 10th vector
    * (deterministically: its reversed embedding) at generation 1 →
    * tombstone every 17th at generation 2 → search with full probing.
    * The graded contract is exact brute-force top-k over the LIVE set:
    * a re-embedded vector is served only in its new form, a tombstoned
    * one not at all — while the deletes ride a churn-sized broadcast
    * sidecar and the cell-pruned assignments scan stays untouched (a
    * merge-fold before the probe filter would cost the pruning; see
    * tombstoneIvf's doc).
    */
  private def qIndexChurn(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_vecidx_"),
      idBucketWidth = 1L)
    val (nl, _) = VectorIndex.buildIvf(store, e, "vec_id", "embedding", "idx/churn")
    VectorIndex.reembedIvf(store,
      e.where(pmod(col("vec_id"), lit(10)) === 0)
        .withColumn("embedding", reverse(col("embedding"))),
      "vec_id", "embedding", "idx/churn", gen = 1L, externalKey = "v2")
    VectorIndex.tombstoneIvf(store,
      e.where(pmod(col("vec_id"), lit(17)) === 0),
      "vec_id", "idx/churn", gen = 2L, externalKey = "v3")
    VectorIndex.searchIvf(store, "idx/churn", e.where(col("vec_id") < 8),
      "vec_id", "embedding", k = 5, nProbe = nl, useLast = false)
      .orderBy("query_id", "rank")
  }

  /** Dataset card: the one-row-per-source summary a pipeline PUBLISHES
    * with a training corpus — size (docs/tokens/median length), language
    * mix, exact-duplicate rate (share of docs that are a non-anchor copy
    * of their normalized-text group, qn57's canonicalization), and the
    * qn18 quality-rule pass rate. Pure per-row expressions + one
    * group-anchor aggregate + one source-sized aggregate.
    *
    * The per-source median is EXACT but never funnels a group's values
    * through one reducer (the r9 verdict's scale flag on Spark's
    * `percentile`, whose per-value count map collapses onto the final
    * agg buffer): [[exactGroupMedian]] aggregates a compacted
    * (source, toks) count map — map-side combined, sized by DISTINCT
    * token counts, not rows — then rank-selects the two interpolation
    * boundary values with a window over that compact table. Same
    * quantile_cont definition as the oracle; integer values at frac ∈
    * {0, .5} make the interpolation float-exact.
    */
  private def qDatasetCard(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(
      col("doc_id"), col("source"), col("lang"),
      TextOps.tokenCount(col("text")).cast("long").as("toks"),
      md5(TextOps.normalizeForMatch(col("text")).cast("binary")).as("g"),
      TextOps.qualityRules(col("text")).keep.as("q"))
    val anchors = base.groupBy("g").agg(min("doc_id").as("anchor"))
    val med = exactGroupMedian(base, "source", "toks")
    base.join(anchors, "g")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("toks").as("n_tokens"),
        round(sum(when(col("lang") === "en", 1L).otherwise(0L)) / count(lit(1)), 4)
          .as("pct_en"),
        round(sum(when(col("doc_id") =!= col("anchor"), 1L).otherwise(0L))
          / count(lit(1)), 4).as("dup_rate"),
        round(sum(when(col("q"), 1L).otherwise(0L)) / count(lit(1)), 4)
          .as("quality_pass_rate"))
      .join(broadcast(med), "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("p50_tokens"), col("pct_en"), col("dup_rate"),
        col("quality_pass_rate"))
      .orderBy("source")
  }

  /** Exact interpolated per-group median (the quantile_cont definition:
    * v_lo + frac·(v_hi − v_lo) at 0-indexed position (n−1)/2) computed
    * scale-safely — the per-GROUP analog of q58's distributed sort
    * selection. Pass 1 compacts rows into a (group, value) count map via
    * an ordinary map-side-combined aggregate (shuffle volume = distinct
    * values per group, not rows); pass 2 windows over THAT compact table
    * (per-group partition holds only distinct values) to turn cumulative
    * counts into rank intervals, then one group-sized aggregate picks the
    * two boundary ranks and interpolates. No aggregation buffer ever
    * holds a group's raw values. Returns (group, p50_tokens rounded 1dp).
    */
  private def exactGroupMedian(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnts = df.groupBy(groupCol, valCol).agg(count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy(groupCol).orderBy(valCol)
    val wAll = Window.partitionBy(groupCol)
    val cum = cnts
      .withColumn("__hi", sum("__c").over(wOrd))
      .withColumn("__n", sum("__c").over(wAll))
      .withColumn("__lo", col("__hi") - col("__c") + 1)
    val pos = (col("__n") - 1).cast("double") * 0.5
    val rLo = floor(pos) + 1 // 1-indexed boundary ranks
    val rHi = ceil(pos) + 1
    val v = col(valCol).cast("double")
    cum.groupBy(groupCol)
      .agg(
        max(when(col("__lo") <= rLo && rLo <= col("__hi"), v)).as("__vlo"),
        max(when(col("__lo") <= rHi && rHi <= col("__hi"), v)).as("__vhi"),
        max(pos - floor(pos)).as("__frac"))
      .select(col(groupCol),
        round(col("__vlo") + col("__frac") * (col("__vhi") - col("__vlo")), 1)
          .as("p50_tokens"))
  }

  /** CONTENT-level image dedup via perceptual hashing: every id%7==3
    * payload is its predecessor's EXACT raster re-encoded in a different
    * lossless container (PNG anchor, BMP copy —
    * [[Multimodal.syntheticTextureBmp]]; the high-entropy texture raster,
    * because a gradient raster's near-tie cell means collide distinct
    * images — measured 62 groups for 82 anchors before the switch),
    * so byte digests differ on every pair while [[Multimodal.aHash64]]
    * matches by construction. Grouping on the aHash finds exactly the
    * planted pairs (n_encodings = 2 proves each recovered pair really
    * spans two byte-distinct encodings — a byte-hash dedup would return
    * all singletons). The oracle states the planted-pair arithmetic;
    * determinism is structural (payloads are pure functions of doc_id),
    * so the grade is fixture-regeneration-proof. Scale: hash per row +
    * one group-by; near-dup banding extends via the qn04 SimHash
    * machinery over the same 64-bit hashes.
    */
  private def qImagePhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = docs(s, dir).where(col("doc_id") < 96)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val isCopy = id % 7 == 3
        val src = if (isCopy) id - 1 else id
        val w = (8 + src % 16).toInt
        val h = (8 + (src * 3) % 16).toInt
        if (isCopy)
          Multimodal.MediaRecord(id, Multimodal.syntheticTextureBmp(w, h, src), "image/bmp")
        else
          Multimodal.MediaRecord(id, Multimodal.syntheticTexturePng(w, h, src), "image/png")
      }
    Multimodal.perceptualHashes(media.toDF())
      .groupBy("phash")
      .agg(min("doc_id").as("anchor_id"), count(lit(1)).as("n_copies"),
        countDistinct(col("digest")).as("n_encodings"))
      .select("anchor_id", "n_copies", "n_encodings")
      .orderBy("anchor_id")
  }

  /** Image NEAR-dup search: qn78 catches re-encodes (aHash equal);
    * this catches *edited* copies — every id%11==5 payload is its
    * predecessor's texture with two pixels inverted
    * ([[Multimodal.syntheticTexturePerturbedBmp]]), so its aHash sits a
    * few Hamming bits away instead of equal. Detection reuses the
    * qn04 Manku multi-block banding VERBATIM
    * ([[Dedup.simhashCandidatePairs]] is generic over any (id, 64-bit
    * fp) table — one operator serves text SimHash and image aHash), at
    * maxHamming=8. Output is every detected pair with an `is_planted`
    * flag; the oracle states the planted arithmetic with literal
    * `true`s, so a false positive adds a row (rowcount fail) and a miss
    * drops one — both sides of precision/recall are graded. Payloads
    * are pure functions of doc_id (the qn78 stance), so the grade is
    * fixture-regeneration-proof.
    */
  private def qImagePhashNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = docs(s, dir).where(col("doc_id") < 96)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val isCopy = id % 11 == 5
        val src = if (isCopy) id - 1 else id
        val w = (8 + src % 16).toInt
        val h = (8 + (src * 3) % 16).toInt
        if (isCopy)
          Multimodal.MediaRecord(id,
            Multimodal.syntheticTexturePerturbedBmp(w, h, src, flips = 2), "image/bmp")
        else
          Multimodal.MediaRecord(id, Multimodal.syntheticTexturePng(w, h, src), "image/png")
      }
    val fp = Multimodal.perceptualHashes(media.toDF())
      .select(col("doc_id").as("id"), col("phash").as("fp"))
    Dedup.simhashCandidatePairs(fp, maxHamming = 8)
      .where(col("hamming") <= 8)
      .select(col("doc_a"), col("doc_b"),
        (col("doc_b") === col("doc_a") + 1 && col("doc_b") % 11 === 5)
          .as("is_planted"))
      .orderBy("doc_a", "doc_b")
  }

  /** Volume-invariant audio dedup: every id%9==4 payload is its
    * predecessor's noise-WAV samples exactly ×3 — byte-distinct at
    * every sample, but [[Multimodal.audioEnergyHash64]]'s cross-
    * multiplied energy comparisons are gain²-invariant, so the hashes
    * match BY CONSTRUCTION. Grouping on the hash recovers exactly the
    * planted pairs (n_encodings = 2 proves each spans two byte-distinct
    * payloads); payloads are pure functions of doc_id, so the grade is
    * fixture-regeneration-proof. The image analog is qn78; together
    * with qn79's Hamming banding this closes the multimodal dedup
    * family (text shingles / embeddings / image pixels / audio energy).
    */
  private def qAudioFingerprintDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = docs(s, dir).where(col("doc_id") < 96)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val isCopy = id % 9 == 4
        val src = if (isCopy) id - 1 else id
        val n = 1000 + (src % 7).toInt * 300
        val rate = 8000 + (src % 4).toInt * 4000
        Multimodal.MediaRecord(id,
          Multimodal.syntheticNoiseWav(n, rate, src, gain = if (isCopy) 3 else 1),
          "audio/wav")
      }
    Multimodal.audioHashes(media.toDF())
      .groupBy("phash")
      .agg(min("doc_id").as("anchor_id"), count(lit(1)).as("n_copies"),
        countDistinct(col("digest")).as("n_encodings"))
      .select("anchor_id", "n_copies", "n_encodings")
      .orderBy("anchor_id")
  }

  /** Incremental index maintenance graded as an EXACT contract: fit the
    * IVF on the FIRST HALF of the corpus only, append the second half
    * to the persisted index with NO refit ([[VectorIndex.appendIvf]] —
    * O(batch) assignment against the stored centroids, one new store
    * version), then serve full-probe top-5 from the ACCUMULATED
    * versions. The oracle is the same exact brute-force SQL over the
    * WHOLE corpus as qn76 — it matches only if the append path loses
    * nothing and accumulate-mode search reads every version.
    */
  private def qIndexAppend(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_vecidx2_"),
      idBucketWidth = 1L)
    val cut = e.agg(max("vec_id")).head().getLong(0) / 2
    val (nl, _) = VectorIndex.buildIvf(store,
      e.where(col("vec_id") <= cut), "vec_id", "embedding", "idx/emb", externalKey = "b0")
    VectorIndex.appendIvf(store,
      e.where(col("vec_id") > cut), "vec_id", "embedding", "idx/emb", externalKey = "b1")
    VectorIndex.searchIvf(store, "idx/emb", e.where(col("vec_id") < 8),
      "vec_id", "embedding", k = 5, nProbe = nl, useLast = false)
      .orderBy("query_id", "rank")
  }

  /** Video shot-boundary detection over REAL frame decodes
    * ([[Multimodal.sceneCuts]]): each doc renders a multi-scene GIF
    * (2 + id % 3 scenes of 5 frames; [[Multimodal.syntheticSceneGif]]'s
    * construction guarantees boundary mean |Δ| ≥ 93 gray levels vs ~2
    * within a scene), and the detector must recover exactly the planted
    * cut frames (5·k) — which the oracle states from the id formula
    * alone. A delta-threshold detector that mis-handled frame order,
    * channel extraction, or the integer comparison would miss or invent
    * cuts.
    */
  private def qVideoSceneCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = docs(s, dir).where(col("doc_id") < 48)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        Multimodal.MediaRecord(id,
          Multimodal.syntheticSceneGif(32, 24, sceneLen = 5,
            nScenes = (2 + id % 3).toInt, seed = id),
          "video/gif")
      }
    Multimodal.sceneCuts(media.toDF(), threshold = 20)
      .select(col("doc_id"), col("cut_frame").cast("int").as("cut_frame"))
      .orderBy("doc_id", "cut_frame")
  }

  /** Shot-level representative-frame sampling ([[Multimodal.shotFrames]])
    * over the qn84 scene corpus: segmentation must place every frame in
    * its planted 5-frame scene and report each scene's first frame —
    * all stated by the oracle from the id formula. Together qn84/qn85
    * are the video half of the curation story: detect boundaries, then
    * sample one frame per shot.
    */
  private def qVideoShotSampling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = docs(s, dir).where(col("doc_id") < 48)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        Multimodal.MediaRecord(id,
          Multimodal.syntheticSceneGif(32, 24, sceneLen = 5,
            nScenes = (2 + id % 3).toInt, seed = id),
          "video/gif")
      }
    Multimodal.shotFrames(media.toDF(), threshold = 20)
      .select(col("doc_id"), col("shot_id"),
        col("rep_frame").cast("int").as("rep_frame"), col("n_frames"))
      .orderBy("doc_id", "shot_id")
  }

  /** Image resize over real decodes ([[Multimodal.imageThumbnails]]):
    * render grayscale PNGs with id-derived dimensions, decode and
    * nearest-neighbor-resample to 8×8, and grade the thumbnail pixel
    * checksum against the oracle's restatement of the ENTIRE
    * render→encode→decode→resample chain in integer SQL. A resize that
    * mixed up axes, rounded instead of flooring the source index, or
    * read a lossy channel would fail on every row.
    */
  private def qImageThumbnails(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = docs(s, dir).where(col("doc_id") < 64)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + (id * 3) % 9).toInt
        Multimodal.MediaRecord(id, Multimodal.syntheticGrayPng(w, h, id), "image/png")
      }
    Multimodal.imageThumbnails(media.toDF(), outW = 8, outH = 8)
      .orderBy("doc_id")
  }

  /** Audio silence segmentation ([[Multimodal.audioSilenceRuns]]): each
    * doc renders a noise WAV with planted silent windows (a run of
    * 1 + id % 3 windows at 3; even ids add one at 9), and the detector
    * must recover exactly the planted (start, length) runs — including
    * the run-length merge — which the oracle states from the id
    * formula. The audio sibling of qn84's scene cuts: the trim pass a
    * speech pipeline runs before paying encoder cost for silence.
    */
  private def qAudioSilence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = docs(s, dir).where(col("doc_id") < 96)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val runs = Seq((3, (1 + id % 3).toInt)) ++
          (if (id % 2 == 0) Seq((9, 1)) else Nil)
        Multimodal.MediaRecord(id,
          Multimodal.syntheticSpeechWav(256, 12, 8000, id, runs), "audio/wav")
      }
    Multimodal.audioSilenceRuns(media.toDF(), windowLen = 256).toDF()
      .orderBy("doc_id", "start_window")
  }

  /** Cross-modal cluster topic labeling: assign embeddings to the
    * deterministic centroids (qn74), join each cluster's DOCUMENTS via
    * the id correspondence, and label every cluster with its top-3
    * terms by cluster-level TF-IDF (tf = term count in the cluster,
    * idf = ln(8/df) over clusters; stopwords excluded) — the
    * human-readable summary a curation UI shows next to each embedding
    * cluster. The embeddings↔documents join is the op under test: a
    * pipeline that loses the modality alignment (qn70's failure mode)
    * labels clusters with the wrong corpora.
    */
  private def qClusterTopics(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val assigned = Similarity.assignToCentroids(
      e, e.where(col("vec_id") < 8), "vec_id", "embedding", "vec_id", "embedding")
    val terms = assigned
      .join(docs(s, dir), col("vec_id") === col("doc_id"))
      .select(col("cluster_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .where(!col("term").isin(TextOps.enStopwords: _*))
    // tc feeds both the df table and the final join; materialize the
    // clusters×vocab-sized counts so the assign→join→explode subtree
    // runs once.
    val tc = Dedup.materialize(
      terms.groupBy("cluster_id", "term").agg(count(lit(1)).as("n")))
    val dfreq = tc.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("score").desc, col("term").asc)
    tc.join(dfreq, "term")
      .withColumn("score",
        round(col("n").cast("double") * log(lit(8d) / col("df")), 4))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 3)
      .select(col("cluster_id"), col("rank"), col("term"), col("n"), col("score"))
      .orderBy("cluster_id", "rank")
  }

  /** Audio decimation resample ([[Multimodal.audioDecimateChecksum]]):
    * render the STATEABLE sawtooth WAV (sample_i =
    * (id·131 + i·7) mod 4001 − 2000), decode, keep every k-th sample,
    * and grade the kept-sample checksum against the oracle's
    * restatement of the whole render→encode→decode→decimate chain —
    * the audio leg of the resize plumbing (qn88 is the image leg).
    */
  private def qAudioResample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = docs(s, dir).where(col("doc_id") < 96)
      .select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val n = (1000 + (id % 7) * 300).toInt
        Multimodal.MediaRecord(id, Multimodal.syntheticWav(n, 8000, id), "audio/wav")
      }
    implicit val enc =
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong)
    implicit val inEnc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord]
    media.toDF().as[Multimodal.MediaRecord].mapPartitions { rows =>
      rows.map { r =>
        val k = (2 + r.doc_id % 3).toInt
        val (_, nOut, cs) = Multimodal.audioDecimateChecksum(r.content, k)
        (r.doc_id, nOut, cs)
      }
    }.toDF("doc_id", "n_out", "checksum")
      .orderBy("doc_id")
  }

  /** BPE merge-candidate statistics (Sennrich et al. 2016, step 1):
    * corpus-wide counts of adjacent character pairs within words, top
    * 20 — the statistic the tokenizer-training loop recomputes after
    * every merge. The loop's heavy half (corpus-wide pair counting,
    * one generate + one map-side-combinable aggregate +
    * TakeOrderedAndProject) lives in the engine; the merge-table update
    * between iterations is metadata-scale. The (count desc, pair) total
    * order makes the top-20 cut engine-deterministic.
    */
  private def qBpePairCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .where(length(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substr(w, i, 2)").as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(20)

  /** BPE merge LOOP ([[TextOps.bpeTrain]], extending qn94's step-1
    * census): 10 driver-iterated rounds of weighted adjacent-pair count
    * → deterministic argmax (count desc, pair asc) → greedy merge-apply
    * over the persisted word-frequency vocabulary. The oracle UNROLLS
    * the loop round by round: it re-derives pair counts from a
    * paren-wrapped segmentation string (`low` → `(l)(o)(w)`) and
    * applies each round's merge as non-overlapping left-to-right
    * `replace` — bit-equivalent to the greedy array merge (wrapping
    * makes cross-symbol matches impossible since the alphabet is
    * letter/digit runs, and SQL `replace` scans exactly the greedy
    * order).
    */
  private def qBpeMergeLoop(s: SparkSession, dir: String): DataFrame =
    TextOps.bpeTrain(docs(s, dir), "text", numMerges = 10).orderBy("round")

  /** The shared unrolled-BPE CTE chain (words0..words_N + best_1..N) —
    * MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    * words_r references best_r (×3) + words_{r-1}, so an inlined
    * 10-round chain expands to ~4^10 scans of `documents` — measured
    * as an fd-exhaustion blowup. Materialization makes each round one
    * vocab pass, the same shape as the Spark loop's persist. The chain
    * carries the word itself so finals can join segmentation state back
    * to per-source occurrence counts (qn103).
    */
  private def bpeChainSql(numMerges: Int): String = {
    val sb = new StringBuilder
    sb.append("""
      WITH words0 AS MATERIALIZED (
        SELECT w, count(*)::BIGINT AS freq,
               regexp_replace(w, '(.)', '(\1)', 'g') AS state
        FROM (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
          FROM documents WHERE len(trim(text)) > 0) t
        WHERE len(w) >= 2 AND regexp_full_match(w, '[\p{L}\p{N}]+')
        GROUP BY w)""")
    for (r <- 1 to numMerges) {
      val p = r - 1
      sb.append(raw"""
      , best$r AS MATERIALIZED (
        SELECT $r AS round, pair, CAST(n AS BIGINT) AS n FROM (
          SELECT pair, sum(freq) AS n FROM (
            SELECT freq, unnest(list_transform(range(1, len(syms)),
              i -> syms[i] || ' ' || syms[i+1])) AS pair
            FROM (SELECT freq,
                    regexp_extract_all(state, '\(([^()]+)\)', 1) AS syms
                  FROM words$p) s$r) e$r
          GROUP BY pair) c$r
        ORDER BY n DESC, pair ASC LIMIT 1)
      , words$r AS MATERIALIZED (
        SELECT w, freq, replace(state,
          '(' || split_part((SELECT pair FROM best$r), ' ', 1) || ')(' ||
                 split_part((SELECT pair FROM best$r), ' ', 2) || ')',
          '(' || replace((SELECT pair FROM best$r), ' ', '') || ')') AS state
        FROM words$p)""")
    }
    sb.toString
  }

  private def bpeLoopOracle(numMerges: Int): String =
    bpeChainSql(numMerges) + s"""
      SELECT CAST(round AS INT) AS round,
             split_part(pair, ' ', 1) AS lhs,
             split_part(pair, ' ', 2) AS rhs,
             n AS pair_count
      FROM (${(1 to numMerges).map(r => s"SELECT * FROM best$r")
      .mkString(" UNION ALL ")})
      ORDER BY round"""

  private def bpeTokenizeOracle(numMerges: Int, extraCols: String = ""): String =
    bpeChainSql(numMerges) + raw"""
      , wcnt AS (
        SELECT source, w, count(*)::BIGINT AS cnt
        FROM (
          SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
          FROM documents WHERE len(trim(text)) > 0) t
        WHERE len(w) >= 2 AND regexp_full_match(w, '[\p{L}\p{N}]+')
        GROUP BY source, w)
      , seg AS (
        SELECT w,
               len(regexp_extract_all(state, '\(([^()]+)\)', 1))::BIGINT AS n_sub
        FROM words$numMerges)
      SELECT source,
             CAST(sum(cnt) AS BIGINT) AS n_words,
             CAST(sum(cnt * n_sub) AS BIGINT) AS n_subwords$extraCols
      FROM wcnt JOIN seg USING (w)
      GROUP BY source
      ORDER BY source"""

  /** BPE APPLY — the serving half of the tokenizer next to qn100's
    * training half: train 10 merges, then SEGMENT the corpus with them
    * and report per-source word/subword totals. The apply is
    * vocabulary-compacted like the trainer (merges apply to the
    * distinct-word table, one stacked [[...BpeMergePairExpr]] per
    * round, then a join back to per-(source, word) occurrence counts —
    * the corpus is scanned once, and the R-deep expression stack runs
    * over word TYPES, not corpus tokens). The oracle reuses qn100's
    * unrolled chain, carrying each word through to its final
    * segmentation state.
    */
  private def qBpeTokenize(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val merges = TextOps.bpeTrain(d, "text", numMerges = 10)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq // 10 rows — bounded
    TextOps.bpeSegmentStats(d, "text", "source", merges).orderBy("source")
  }

  /** Tokenizer ARTIFACT lifecycle: train → persist the merge table as a
    * versioned store artifact ([[TextOps.saveBpeMerges]], the VectorIndex
    * pattern applied to tokenizers) → SUPERSEDE it with a different
    * artifact (the `_last` pointer now serves the new one) → ROLL BACK by
    * pinned `externalKey` and serve from the rolled-back artifact. The
    * graded per-source totals are computed ENTIRELY from the store-read
    * merges, so the oracle's fresh-10-round restatement passing means
    * tokenize-with-stored ≡ tokenize-with-fresh; the flags pin the
    * lifecycle invariants (pinned read returns the original artifact
    * row-for-row; `use_last` serves the superseding one). The artifact is
    * rounds-sized metadata — persisting and reading it costs nothing at
    * any corpus scale, which is the point: a 100 TB tokenize job pins an
    * externalKey and is immune to concurrent retrains.
    */
  private def qTokenizerStore(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_tok_"))
    val freshDf = TextOps.bpeTrain(d, "text", numMerges = 10)
    val fresh = freshDf.orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq // 10 rows — bounded
    TextOps.saveBpeMerges(store, "tokenizer/merges", freshDf, externalKey = "m10")
    // Supersede with a deliberately different artifact (the first 3
    // merge rounds) — the rollback below must NOT see it. Truncating the
    // already-trained table exercises the same supersede/rollback
    // machinery as a retrain would (what the flags pin is VERSION
    // semantics, not training provenance) without paying a second BPE
    // fit per call; freshDf is a driver-local merges table, so the
    // filter costs nothing.
    TextOps.saveBpeMerges(store, "tokenizer/merges",
      freshDf.where(col("round") <= 3), externalKey = "m3trunc")
    val last = TextOps.loadBpeMerges(store, "tokenizer/merges") // _last → m3half
    val rolled = TextOps.loadBpeMerges(store, "tokenizer/merges", Some("m10"))
    TextOps.bpeSegmentStats(d, "text", "source", rolled)
      .withColumn("rollback_ok", lit(rolled == fresh))
      .withColumn("last_superseded_ok", lit(last.size == 3 && last != rolled))
      .orderBy("source")
  }

  /** Quality-MODEL artifact lifecycle — qn106's store seam applied to
    * the learned scorer: train on the even half → persist as a
    * versioned store artifact → supersede with a deliberately
    * degenerate model (the `_last` pointer must serve it) → roll back
    * via pinned `externalKey` and SCORE the odd half from the
    * rolled-back artifact. `stored_eq_fresh` pins score equality
    * per-source (the store round-trip must be bit-lossless on the
    * weight vector for a sigmoid over it to match exactly);
    * `rollback_ok`/`last_superseded_ok` pin the version semantics.
    * Counts are restatable; the flags are the qn97-pattern contract.
    */
  private def qQualityModelStore(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_qm_"))
    val fresh = TextOps.trainQualityModel(
      d.where(pmod(col("doc_id"), lit(2)) === 0), "text", dim = 512)
    TextOps.saveQualityModel(s, store, "quality/model", fresh, externalKey = "v1")
    TextOps.saveQualityModel(s, store, "quality/model",
      TextOps.QualityModel(new Array[Double](4 + 512), 9d, 512), externalKey = "v2")
    val last = TextOps.loadQualityModel(store, "quality/model")
    val rolled = TextOps.loadQualityModel(store, "quality/model", Some("v1"))
    val rollbackOk = rolled.weights.sameElements(fresh.weights) &&
      rolled.intercept == fresh.intercept && rolled.hashDim == fresh.hashDim
    val lastOk = last.intercept == 9d && last.weights.forall(_ == 0d)
    d.where(pmod(col("doc_id"), lit(2)) === 1)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        min(TextOps.qualityModelScore(col("text"), rolled) <=>
          TextOps.qualityModelScore(col("text"), fresh)).as("stored_eq_fresh"))
      .withColumn("rollback_ok", lit(rollbackOk))
      .withColumn("last_superseded_ok", lit(lastOk))
      .orderBy("source")
  }

  /** PQ-codebook ARTIFACT lifecycle — the qn106/qn107 store seam applied
    * to the last fit-per-query model in the ANN family: fit
    * [[Similarity.trainPqCodebookFor]] once → persist as a versioned
    * store artifact → supersede with a deliberately degenerate codebook
    * (the `_last` pointer must serve it) → roll back via pinned
    * `externalKey` and run the FULL [[Similarity.pqTopK]] search from
    * the rolled-back artifact (no re-fit anywhere in the graded path).
    * The search grades qn29's deterministic recall contract, so
    * oracle-green here means a pinned artifact serves real searches;
    * `encode_eq_fresh` pins encode-with-stored ≡ encode-with-fresh
    * code-for-code over the whole corpus in ONE comparison scan (the
    * store round-trip must be bit-lossless on the codebook for the
    * byte codes to match exactly), and `rollback_ok`/
    * `last_superseded_ok` pin the version semantics. At 100 TB this is
    * the difference between reproducible ANN results across re-runs and
    * codes that drift under concurrent refits.
    */
  private def qPqCodebookStore(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val queries = e.where(col("vec_id") < 8)
    val nRows = Tables.parquetRowCount(s, s"$dir/embeddings.parquet")
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_pqcb_"))
    val fresh = Similarity.trainPqCodebookFor(e, "embedding",
      dim = 64, m = 16, ksub = 16, corpusRows = Some(nRows))
    Similarity.savePqCodebook(s, store, "ann/pq_codebook", fresh,
      externalKey = "v1")
    Similarity.savePqCodebook(s, store, "ann/pq_codebook",
      Similarity.PqCodebook(new Array[Double](16 * 16 * 4), 64, 16, 16),
      externalKey = "v2degen")
    val last = Similarity.loadPqCodebook(store, "ann/pq_codebook")
    val rolled = Similarity.loadPqCodebook(store, "ann/pq_codebook", Some("v1"))
    val rollbackOk = rolled.codebook.sameElements(fresh.codebook) &&
      rolled.dim == fresh.dim && rolled.m == fresh.m && rolled.ksub == fresh.ksub
    val lastOk = last.codebook.forall(_ == 0d) && last.dim == 64
    // Encode equality in ONE corpus scan (two expressions, zero extra
    // jobs): byte-identical codes under stored vs fresh codebooks — the
    // qn107 pattern (score the same rows under both models in one pass)
    // rather than paying a second full search purely to prove a flag.
    val fn = graft.functions.VectorExpressions
    val encodeEq = e.agg(
      coalesce(
        min(fn.pqEncode(col("embedding").cast("array<double>"), rolled.codebook, 64, 16, 16) <=>
          fn.pqEncode(col("embedding").cast("array<double>"), fresh.codebook, 64, 16, 16)),
        lit(false)).as("encode_eq_fresh"))
    // qn29's graded recall contract, served entirely from the ROLLED
    // artifact (same adaptive shortlist — see the qn29 note).
    val pq = Similarity.pqTopK(e, queries, "vec_id", "embedding",
      dim = 64, k = 5, m = 16, ksub = 16,
      shortlist = math.max(50L, nRows / 10).toInt,
      corpusRows = Some(nRows), codebook = Some(rolled))
    val exact = Similarity.topKPerQuery(e, queries, "vec_id", "embedding", k = 5)
    val perQuery = exact
      .join(pq.select(col("query_id"), col("vec_id"), lit(1L).as("hit")),
        Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    val returned = pq.groupBy("query_id")
      .agg((count(lit(1)) === 5).as("returned_ok"))
    val global = perQuery
      .agg((sum("n_hit") * 10L >= sum("k_exact") * 9L).as("recall_ok"))
    perQuery
      .join(returned, Seq("query_id"), "left")
      .crossJoin(broadcast(global))
      .crossJoin(broadcast(encodeEq))
      .select(col("query_id"), col("k_exact"),
        coalesce(col("returned_ok"), lit(false)).as("returned_ok"),
        col("recall_ok"), col("encode_eq_fresh"))
      .withColumn("rollback_ok", lit(rollbackOk))
      .withColumn("last_superseded_ok", lit(lastOk))
      .orderBy("query_id")
  }

  /** Decontamination against a STORED reference artifact — qn49's
    * cross-corpus near-dup detection with the benchmark side persisted
    * once ([[Dedup.saveReferenceShingles]]) instead of re-shingled per
    * run: a benchmark suite is small and static, so its signature and
    * frequency tables are versioned store artifacts like IVF centroids
    * or BPE merges, and every corpus build joins the pinned version
    * (suite updates supersede via `_last`; a certification run pins its
    * `externalKey`). Graded output = qn49's EXACT pair semantics
    * computed entirely through the stored path (the oracle restates the
    * fresh algebra, so oracle-green IS detect-with-stored ≡
    * detect-with-fresh) + the lifecycle flags: pinned rollback returns
    * the original artifact (row counts + df-table equality), `_last`
    * serves the superseding suite revision.
    */
  private def qDecontamStoredRef(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cut = Tables.parquetRowCount(s, s"$dir/documents.parquet") / 2
    val target = d.where(col("doc_id") >= cut)
    val reference = d.where(col("doc_id") < cut)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_refsig_"))
    Dedup.saveReferenceShingles(store, "decontam/bench", reference,
      "doc_id", "text", externalKey = "suite_v1")
    // Supersede with a deliberately smaller suite revision (even-id
    // quarter) — the pinned read below must NOT see it.
    Dedup.saveReferenceShingles(store, "decontam/bench",
      reference.where(pmod(col("doc_id"), lit(2)) === 0),
      "doc_id", "text", externalKey = "suite_v2")
    val freshSigCount = Dedup.shingleSignatures(reference, "doc_id", "text")
      .count()
    val pinnedSigCount = store.get("decontam/bench/signatures", Some("suite_v1"))
      .count()
    val lastSigCount = store.get("decontam/bench/signatures", useLast = true)
      .count()
    val rollbackOk = pinnedSigCount == freshSigCount
    val lastOk = lastSigCount < freshSigCount && lastSigCount > 0
    Dedup.crossCorpusNearDupPairsStored(target, store, "decontam/bench",
      "doc_id", "text", n = 3, threshold = 0.8,
      externalKey = Some("suite_v1"))
      .withColumn("rollback_ok", lit(rollbackOk))
      .withColumn("last_superseded_ok", lit(lastOk))
      .orderBy("target_id", "ref_id")
  }

  /** LEARNED quality scoring — the fastText-shaped classifier next to
    * qn18's C4/Gopher rules: train [[TextOps.trainQualityModel]] (hashed
    * bag-of-words → spark.ml logistic regression, weak supervision from
    * the rules) on the even-doc_id half, score the odd half with the
    * broadcast-weights primitive-loop expression, and grade the audit a
    * pipeline would actually gate on: ROC-AUC (via the distributed
    * bucket-rank statistic) and balanced accuracy against the rule
    * labels. Counts are exactly restatable (the oracle recomputes the
    * rules); the learned-model quality lands as contract booleans with
    * wide margins (the qn97–qn99 pattern — L-BFGS weights aren't
    * SQL-restatable, but a scorer that can't separate its own weak
    * labels at AUC 0.8 is broken regardless of float luck).
    *
    * Threshold stability (r14, the r13 advice): the trained weights DO
    * vary run-to-run at the ulp level (treeAggregate's float-sum order
    * follows partitioning), so the gates must sit far inside the
    * audited band, not at its edge. [[graft.tools.QualityModelAudit]]
    * re-run r14 at both SFs (QAUDIT_r14_*.json): AUC 0.895 (sf0.01) /
    * 0.966 (sf0.1), balanced accuracy 0.827 / 0.908, vs gates of
    * 0.80/0.70 — a ≥ 0.095 AUC and ≥ 0.127 bal-acc margin against
    * perturbations measured in the 4th decimal.
    * Re-run the audit and re-justify the thresholds if the fixture
    * generator or the feature set changes.
    */
  private def qLearnedQuality(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val model = TextOps.trainQualityModel(
      d.where(pmod(col("doc_id"), lit(2)) === 0), "text", dim = 512)
    val scored = d.where(pmod(col("doc_id"), lit(2)) === 1)
      .select(when(TextOps.qualityRules(col("text")).keep, 1d).otherwise(0d).as("y"),
        TextOps.qualityModelScore(col("text"), model).as("p"))
    scored.agg(
      count(lit(1)).as("n_test"),
      sum(col("y").cast("long")).as("n_rule_keep"),
      avg(when(col("y") === 1d, when(col("p") >= 0.5, 1d).otherwise(0d))).as("__tpr"),
      avg(when(col("y") === 0d, when(col("p") < 0.5, 1d).otherwise(0d))).as("__tnr"))
      .crossJoin(TextOps.binaryAuc(scored, "p", "y"))
      .select(col("n_test"), col("n_rule_keep"),
        coalesce(col("auc") >= 0.80, lit(false)).as("auc_ok"),
        coalesce((col("__tpr") + col("__tnr")) / 2 >= 0.70, lit(false))
          .as("balacc_ok"))
  }

  /** Learned DOMAIN classification + mixture rebalancing — the
    * fastText-shaped language-ID / register classifier a curation stack
    * trains once and then uses to LABEL the crawl and REBALANCE the
    * training mixture (the step between qn105's quality gate and
    * qn28's budget sampling). Grades, in one row: (a) holdout top-1
    * accuracy on the fixture's `lang` labels through the multiclass
    * primitive-loop serving expression ([[TextOps.domainPredict]]) —
    * contract boolean, qn105's discipline; (b) the artifact lifecycle
    * (save → zero-weight supersede → pinned-v1 rollback, the
    * qn106/qn107/qn108 seam) with stored ≡ fresh proven by comparing
    * BOTH models' predictions in ONE scan; and (c)
    * [[Mixture.rebalanceToTarget]]'s exact-count contract — the
    * realized per-domain counts of a uniform-target rebalance over the
    * PREDICTED labels must equal ⌊share·N_feasible⌋ exactly, domain by
    * domain.
    *
    * Threshold stability: gates sit inside the measured band
    * ([[graft.tools.DomainModelAudit]], DAUDIT_r14_sf001/sf01.json,
    * same doc_id%4 split as this query: holdout acc 0.360 at sf0.01 /
    * 0.417 at sf0.1 vs 0.20 chance, spark.ml-transform agreement
    * 1.0000 at both SFs), so the 0.28 accuracy gate keeps ≥ 0.08
    * margin at the tightest SF against the ulp-level treeAggregate
    * perturbations (4th decimal) that move trained weights run-to-run.
    * The classifier trains UNWEIGHTED (calibrated to the corpus
    * prior — what a mixture pass consumes); class-balancing measurably
    * cost top-1 accuracy here (0.23 vs 0.48 on the hash-split probe,
    * DAUDIT r14). Re-run the audit and re-justify if the fixture
    * generator or feature set changes.
    */
  private def qDomainMixture(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val test = d.where(pmod(col("doc_id"), lit(4)) === 1)
    val fresh = TextOps.trainDomainModel(
      d.where(pmod(col("doc_id"), lit(4)) =!= 1), "text", "lang", dim = 512)
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_dmodel_"))
    TextOps.saveDomainModel(s, store, "models/domain", fresh, externalKey = "v1")
    // Supersede with a recognizably-broken artifact: `_last` must serve
    // it, the pinned read below must not.
    TextOps.saveDomainModel(s, store, "models/domain",
      fresh.copy(weights = new Array[Double](fresh.weights.length)),
      externalKey = "v2")
    val last = TextOps.loadDomainModel(store, "models/domain")
    val pinned = TextOps.loadDomainModel(store, "models/domain", Some("v1"))
    val rollbackOk = last.weights.forall(_ == 0d) &&
      pinned.weights.sameElements(fresh.weights) &&
      pinned.intercepts.sameElements(fresh.intercepts) &&
      pinned.labels.sameElements(fresh.labels)
    // Holdout accuracy + stored ≡ fresh, one comparison scan (two
    // serving expressions over the same rows — the qn107/qn108 shape).
    val audit = test.select(col("lang"),
        TextOps.domainPredict(col("text"), fresh).as("pf"),
        TextOps.domainPredict(col("text"), pinned).as("ps"))
      .agg(
        count(lit(1)).as("n_test"),
        min(when(col("pf.pred") === col("ps.pred") &&
          col("pf.prob") === col("ps.prob"), 1).otherwise(0)).as("__same"),
        avg(when(TextOps.domainLabel(col("pf.pred"), fresh) === col("lang"),
          1d).otherwise(0d)).as("__acc"))
    // Rebalance the full corpus by PREDICTED domain to a uniform
    // target; the contract is exact realized counts. The labeled frame
    // feeds three count passes — materialize it once.
    val labeled = Dedup.materialize(d.select(col("doc_id"),
      TextOps.domainLabel(
        TextOps.domainPredict(col("text"), pinned).getField("pred"), pinned)
        .as("domain")))
    val predCounts = labeled.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val doms = predCounts.keys.toSeq.sorted
    val share = 1d / doms.size
    val realized = Mixture.rebalanceToTarget(
      labeled, "doc_id", "domain", doms.map(_ -> share).toMap)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // The op's documented DECIMAL floors (Mixture exposes them for
    // exactly this check); double floors diverge at e.g. count/0.2.
    val feasible = doms.map(dm =>
      Mixture.rebalanceFloorDiv(predCounts(dm), share)).min
    val needs = doms.map(dm => dm -> math.min(
      Mixture.rebalanceFloorMul(share, feasible), predCounts(dm))).toMap
    val rebalanceOk =
      doms.forall(dm => realized.getOrElse(dm, 0L) == needs(dm)) &&
        realized.keySet.forall(needs.contains)
    audit.select(
      col("n_test"),
      lit(fresh.numClasses).as("n_lang"),
      coalesce(col("__acc") >= 0.28, lit(false)).as("acc_ok"),
      (col("__same") === 1).as("stored_ok"),
      lit(rollbackOk).as("rollback_ok"),
      lit(rebalanceOk).as("rebalance_ok"))
  }

  /** End-to-end corpus build — the composition a real pipeline runs,
    * as ONE query over the fixtures: quality filter (qn18's rules) →
    * 3-gram Jaccard near-dup dedup (qn15's detector + keep-min apply) →
    * benchmark decontamination (qn22's overlap, benchmark = the
    * doc_id%50==3 split) → per-source token-budget sample (qn28) →
    * 8-way token-balanced shards (qn32). Every stage is an existing
    * graded operator; what THIS query grades is the COMPOSITION: the
    * final shard manifest plus the stage-boundary survivor counts
    * (each stage's output is the next stage's input; the manifest's
    * doc/token totals reconcile with n_sampled exactly, and
    * n_corpus ≥ n_quality ≥ n_dedup ≥ n_decontam ≥ n_sampled by
    * construction — the oracle recomputes all five). Stage frames are
    * re-evaluated by the count aggregates here; a production run
    * materializes each boundary through the store (the qs-series) —
    * this query grades the algebra, not the checkpointing.
    */
  private def qCorpusBuild(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val isBench = pmod(col("doc_id"), lit(50)) === 3
    val corpus = d.select("doc_id", "source", "text").where(!isBench)
    val bench = d.where(isBench)
    // Stage boundaries MATERIALIZED (r19, guide §3.3 "materialising an
    // intermediate truncates the plan"): the manifest plus the five
    // conserved-count aggregates each hung a COPY of the stage subtree
    // off the final plan — the quality-rules regex scan evaluated 5×,
    // the dedup anti-join 4×. A lazy localCheckpoint per boundary
    // computes each stage once and lets every downstream consumer read
    // the cached rows; results are bit-identical (same frames, same
    // algebra — qn104 keeps grading the store-checkpointed shape).
    val q = Dedup.materialize(
      corpus.where(TextOps.qualityRules(col("text")).keep))
    val dd = Dedup.materialize(
      Dedup.dedupByJaccard(q, "doc_id", "text", n = 3, threshold = 0.8))
    val contaminated = TextOps.contaminationOverlap(dd, bench, "doc_id", "text")
    val dc = Dedup.materialize(
      dd.join(contaminated.select("doc_id"), Seq("doc_id"), "left_anti"))
    val t = dc.withColumn("toks", TextOps.tokenCount(col("text")).cast("long"))
    val budgets = t.select(col("source")).distinct()
      .withColumn("budget",
        lit(200L) + lit(50L) * substring(col("source"), 4, 8).cast("long"))
    val samp = Dedup.materialize(
      Mixture.sampleByTokenBudget(t, "doc_id", "toks", "source", budgets))
    val manifest = Mixture.tokenShards(samp, "doc_id", "toks", numShards = 8)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("shard_tokens"))
    manifest
      .crossJoin(corpus.agg(count(lit(1)).as("n_corpus")))
      .crossJoin(q.agg(count(lit(1)).as("n_quality")))
      .crossJoin(dd.agg(count(lit(1)).as("n_dedup")))
      .crossJoin(dc.agg(count(lit(1)).as("n_decontam")))
      .crossJoin(samp.agg(count(lit(1)).as("n_sampled")))
      .orderBy("shard_id")
  }

  /** qn101's pipeline with every stage boundary MATERIALIZED through the
    * versioned store — the production shape qn101's scaladoc promises
    * (qn101 grades the algebra; its count aggregates re-evaluate stage
    * subtrees). Here each stage WRITES one store version
    * (`corpus_build/stage*`) and the next stage READS it back, so:
    * every boundary count is a parquet-scan aggregate (no subtree
    * re-instantiation anywhere in the plan); each intermediate is
    * independently readable, auditable, and rollbackable (ordinary store
    * versions — a failed downstream stage restarts from the last good
    * boundary instead of from the crawl, which at 100 TB is the
    * difference between a retry and a re-run); and the shard manifest
    * the trainer consumes is itself a store table. Same stages, same
    * semantics, same oracle as qn101 — what this query grades is the
    * CHECKPOINTING: the store round-trip must be lossless at every
    * boundary for the final manifest + conserved counts to survive the
    * typed-hash gate.
    */
  private def qCorpusBuildStored(s: SparkSession, dir: String): DataFrame = {
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_cbuild_"))
    val d = docs(s, dir)
    val isBench = pmod(col("doc_id"), lit(50)) === 3
    val bench = d.where(isBench)
    store.load(d.select("doc_id", "source", "text").where(!isBench),
      "corpus_build/stage0_corpus", externalKey = "b0")
    val corpus = store.get("corpus_build/stage0_corpus", useLast = true)
    store.load(corpus.where(TextOps.qualityRules(col("text")).keep),
      "corpus_build/stage1_quality", externalKey = "b0")
    val q = store.get("corpus_build/stage1_quality", useLast = true)
    store.load(Dedup.dedupByJaccard(q, "doc_id", "text", n = 3, threshold = 0.8),
      "corpus_build/stage2_dedup", externalKey = "b0")
    val dd = store.get("corpus_build/stage2_dedup", useLast = true)
    val contaminated = TextOps.contaminationOverlap(dd, bench, "doc_id", "text")
    store.load(dd.join(contaminated.select("doc_id"), Seq("doc_id"), "left_anti"),
      "corpus_build/stage3_decontam", externalKey = "b0")
    val dc = store.get("corpus_build/stage3_decontam", useLast = true)
    val t = dc.withColumn("toks", TextOps.tokenCount(col("text")).cast("long"))
    val budgets = t.select(col("source")).distinct()
      .withColumn("budget",
        lit(200L) + lit(50L) * substring(col("source"), 4, 8).cast("long"))
    store.load(Mixture.sampleByTokenBudget(t, "doc_id", "toks", "source", budgets),
      "corpus_build/stage4_sampled", externalKey = "b0")
    val samp = store.get("corpus_build/stage4_sampled", useLast = true)
    store.load(
      Mixture.tokenShards(samp, "doc_id", "toks", numShards = 8)
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("shard_tokens")),
      "corpus_build/manifest", externalKey = "b0")
    store.get("corpus_build/manifest", useLast = true)
      .crossJoin(corpus.agg(count(lit(1)).as("n_corpus")))
      .crossJoin(q.agg(count(lit(1)).as("n_quality")))
      .crossJoin(dd.agg(count(lit(1)).as("n_dedup")))
      .crossJoin(dc.agg(count(lit(1)).as("n_decontam")))
      .crossJoin(samp.agg(count(lit(1)).as("n_sampled")))
      .orderBy("shard_id")
  }

  /** Incremental corpus build — the DELTA-ingest shape of qn101/qn104.
    * A 100 TB pipeline never rebuilds from the crawl: day-0 builds once,
    * and every later ingest flows ONLY the new batch through
    * quality → incremental dedup against the persisted signature state
    * (qn24's replay discipline — corpus-wide hot-cap folded from stored
    * + batch freqs, history never re-paired with itself) →
    * decontamination → an APPEND store version; the published corpus
    * and its per-source card are accumulate-reads over batch versions.
    * Per-ingest work = delta-sized stages (quality, decontam, card)
    * plus ONE equality join against the state signature table — linear
    * in corpus size with a far smaller constant than a rebuild (which
    * re-pays the corpus self-join's candidate structure); the day-0
    * stage RESULTS are never recomputed. Measured:
    * SCALEBENCH_r14_delta.log (fixed 250k delta vs growing state).
    *
    * Grades the composition's END STATE against the one-shot build the
    * oracle states (qn101's quality → dedup → decontam over the whole
    * corpus): union-of-batch-survivors ≡ one-shot holds for the dedup
    * stage by qn24's argument (ingest ids grow monotonically, so
    * keep-min never revokes a day-0 survivor; no fixture doc bridges
    * two previously-distinct clusters), and the quality/decontam stages
    * are per-doc predicates against static inputs, which commute with
    * batch splitting exactly. Output: the accumulate-read per-source
    * card plus conserved boundary counts (day-0 kept; delta arriving /
    * quality / kept), each restated by the oracle over the one-shot
    * frames split at the same footer-metadata cut.
    */
  private def qCorpusBuildIncremental(s: SparkSession, dir: String): DataFrame =
    corpusBuildIncremental(s, dir, compactState = false)

  /** qn114 — qn110's pipeline with the state-COMPACTION lifecycle in the
    * middle: day 0's signatures land as TWO bucketed versions (a
    * mid-day flush and the rest), [[graft.store.BucketedState.compact]]
    * folds them into one before the ingest, and day 1 runs against the
    * compacted slice. Graded against the SAME one-shot oracle as qn110:
    * compaction must preserve the state exactly — the joins, the
    * Jaccard counts, the hot-cap — or the incremental ≡ one-shot claim
    * breaks. This is the nightly-compaction step every long-running
    * ingest deployment performs, now oracle-graded rather than
    * suite-only.
    */
  private def qCorpusBuildCompacted(s: SparkSession, dir: String): DataFrame =
    corpusBuildIncremental(s, dir, compactState = true)

  private def corpusBuildIncremental(
      s: SparkSession, dir: String, compactState: Boolean): DataFrame = {
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_cbinc_"))
    val d = docs(s, dir)
    val cut = Tables.parquetRowCount(s, s"$dir/documents.parquet") / 2
    val isBench = pmod(col("doc_id"), lit(50)) === 3
    val bench = d.where(isBench)
    val day0 = d.where(!isBench && col("doc_id") < cut)
      .select("doc_id", "source", "text")
    val delta = d.where(!isBench && col("doc_id") >= cut)
      .select("doc_id", "source", "text")
    val q0 = day0.where(TextOps.qualityRules(col("text")).keep)
    val q1 = delta.where(TextOps.qualityRules(col("text")).keep)
    // Day 0: one-shot build of the first batch; the dedup state
    // (signatures + per-shingle freqs) persists for every later ingest.
    // Signatures persist BUCKETED by shingle (the r15 layout — each
    // later ingest's state join storage-partitions, shuffling only the
    // delta side), freqs as ordinary row versions. The batch freq table
    // feeds two cap legs (the qn24 sharing), so it aggregates once.
    // sig0 feeds the signature state write(s) AND both companion-state
    // loads — materialize the explode (which re-runs the quality regex
    // scan) once, then fan the independent state writes out on driver
    // threads (guide §2.6). The compaction fold (compactState leg)
    // still runs strictly after its two flush writes.
    val sig0 = Dedup.materialize(
      Dedup.shingleSignatures(q0, "doc_id", "text", n = 3))
    sig0.count()
    val sigRoot = store.statePath("cb/signatures")
    val sigWrites: Seq[() => Unit] =
      if (!compactState)
        Seq(() => graft.store.BucketedState.write(
          sig0, sigRoot, "b0", "s", numBuckets = 32))
      else {
        // Two intra-day flushes (split by doc id), then the nightly
        // compaction folds them to one slice BEFORE the ingest — the
        // graded claim is that day 1 cannot tell the difference.
        val mid = cut / 2
        Seq(() => {
          graft.Concurrency.inParallel(Seq[() => Unit](
            () => graft.store.BucketedState.write(
              sig0.where(col("id") < mid), sigRoot, "b0a", "s",
              numBuckets = 32),
            () => graft.store.BucketedState.write(
              sig0.where(col("id") >= mid), sigRoot, "b0b", "s",
              numBuckets = 32)))(_.apply())
          graft.store.BucketedState.compact(s, sigRoot, "c0", "s",
            numBuckets = 32)
        })
      }
    graft.Concurrency.inParallel(sigWrites ++ Seq[() => Unit](
      () => { store.load(Dedup.shingleDocFreqs(sig0), "cb/freqs",
        externalKey = "b0"); () },
      () => { store.load(Dedup.shingleSignatureCounts(sig0), "cb/sigcounts",
        externalKey = "b0"); () }))(_.apply())
    val batchFreqs = Dedup.materialize(
      Dedup.shingleDocFreqs(Dedup.shingleSignatures(q1, "doc_id", "text", n = 3)))
    val prevFreqs = store.get("cb/freqs", useLast = true).select(col("s"), col("df"))
    val corpusFreqs = prevFreqs.unionByName(batchFreqs)
      .groupBy("s").agg(sum("df").as("df"))
    def decontam(dd: DataFrame): DataFrame =
      dd.join(TextOps.contaminationOverlap(dd, bench, "doc_id", "text")
        .select("doc_id"), Seq("doc_id"), "left_anti")
    // Each batch's survivor frame feeds three consumers (corpus append,
    // card stats, boundary count), so it materializes once. A batch may
    // come back EMPTY — sf0.1's day-0 half loses every survivor to
    // decontamination — and an all-filtered ingest is legal: a 0-row
    // load publishes no version subtree (Store's dangling-pointer
    // guard), so the published card reads through the selector-less
    // ACCUMULATE path, which unions whatever versions exist instead of
    // pinning one that may not.
    // The two batch pipelines are independent once the day-0 state is
    // written (dc1 reads it back): CONSTRUCT and materialize them
    // concurrently — construction runs eager driver actions (signature
    // materialization + the components collect), so sequential `val`s
    // would serialize the expensive halves (guide §2.6). batchFreqs
    // feeds both legs; force it first so the scans share cache.
    // Day 1 (dc1): ONLY the delta flows — incremental dedup against the
    // read-back bucketed signature slices, per-doc decontam, append
    // version.
    batchFreqs.count()
    val Seq(dc0, dc1) = graft.Concurrency.inParallel(
      Seq[() => DataFrame](
        () => {
          val f = Dedup.materialize(decontam(Dedup.dedupByJaccard(q0,
            "doc_id", "text", n = 3, threshold = 0.8,
            shingleFreqs = Some(corpusFreqs))))
          f.count(); f
        },
        () => {
          val f = Dedup.materialize(decontam(Dedup.dedupIncrementalSliced(q1,
            graft.store.BucketedState.slices(s, sigRoot), "doc_id", "text",
            n = 3, threshold = 0.8,
            prevShingleFreqs = Some(prevFreqs),
            batchShingleFreqs = Some(batchFreqs),
            prevSigCounts = Some(store.get("cb/sigcounts", useLast = true)))))
          f.count(); f
        }))(_.apply())
    // Published card: per-batch stats versions, accumulate-read SUM
    // (the qn95 mergeable pattern applied to the build output).
    def cardStats(b: DataFrame): DataFrame =
      b.groupBy("source").agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"))
    graft.Concurrency.inParallel(Seq[() => Unit](
      () => { store.load(dc0, "cb/corpus", externalKey = "b0"); () },
      () => { store.load(dc1, "cb/corpus", externalKey = "b1"); () },
      () => { store.load(cardStats(dc0), "cb/card", externalKey = "b0"); () },
      () => { store.load(cardStats(dc1), "cb/card", externalKey = "b1"); () }))(
      _.apply())
    store.get("cb/card")
      .groupBy("source")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
      .crossJoin(dc0.agg(count(lit(1)).as("n_day0_kept")))
      .crossJoin(delta.agg(count(lit(1)).as("n_delta")))
      .crossJoin(q1.agg(count(lit(1)).as("n_delta_quality")))
      .crossJoin(dc1.agg(count(lit(1)).as("n_delta_kept")))
      .orderBy("source")
  }

  /** Rejection-funnel census — the per-source × per-stage attribution
    * audit over qn101's exact pipeline ([[graft.ops.TextOps
    * .rejectionFunnel]]): every corpus doc is labeled with the FIRST
    * gate that rejected it (the four quality rules in fixed precedence,
    * then dedup, then decontamination) or `kept`, and the census
    * aggregates docs + tokens per (source, stage). qn101 grades the
    * pipeline's OUTPUT; this grades its ACCOUNTING — the stages
    * partition the input exactly (counts sum back to arrivals), so a
    * curation run can publish WHY each source shrank before anyone
    * trains on the result. Oracle restates the per-doc CASE precedence
    * over the same shingle/component/benchmark CTEs as qn101's.
    */
  private def qFilterFunnel(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val isBench = pmod(col("doc_id"), lit(50)) === 3
    val corpus = d.select("doc_id", "source", "text").where(!isBench)
    val bench = d.where(isBench)
    TextOps.rejectionFunnel(corpus, bench, "doc_id", "text")
      .groupBy("source", "stage")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"))
      .orderBy("source", "stage")
  }

  /** Margin-based bitext mining ([[Similarity.marginBitextPairs]] —
    * Artetxe & Schwenk 2019, the CCMatrix/LASER recipe): even-id
    * vectors play the source language, odd-id vectors the target; for
    * each source its k=4 nearest targets are margin-scored (cosine over
    * the mean of both endpoints' k-NN cosines) and the argmax survives
    * above threshold. The whole computation — 6dp candidate cosines,
    * DECIMAL k-NN sums, one final GUARDED double division (denominator
    * must be strictly positive; undefined margins drop — the r14 ANSI
    * divide-by-zero fix) — restates bit-for-bit in the DuckDB oracle
    * (no contract booleans needed: this is an EXACT-graded
    * learned-embedding op, like qn08). Ids here are disjoint by the
    * even/odd split, but the op itself no longer self-excludes across
    * corpora (independent id spaces — see the scaladoc).
    */
  private def qBitextMargin(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    // Long.MaxValue pins the exact leg (the qn10/qn63 discipline): the
    // corpus-size routing default must not silently flip this query's
    // semantics to the approximate search at a larger SF and fail the
    // exact oracle.
    Similarity.marginBitextPairs(
      e.where(pmod(col("vec_id"), lit(2)) === 0),
      e.where(pmod(col("vec_id"), lit(2)) === 1),
      "vec_id", "embedding", k = 4, threshold = 1.02,
      maxExactRows = Long.MaxValue)
      .orderBy("src_id")
  }

  /** UniMax epoch-capped language sampling ([[Mixture.unimaxSample]] —
    * Chung et al., ICLR 2023): a 700-doc budget waterfills across the
    * corpus languages smallest-first, each capped at 2 epochs of its
    * own data, leftovers redistributing upward; selection is the
    * hash-priority prefix per language. At sf0.01 the cap BINDS for the
    * two smallest languages (their quota = 2·n, epochs exactly 2.0) and
    * the freed budget flows to the rest — the exact greedy recurrence
    * restates as a recursive CTE in the oracle. maxEpochs = 2.0 is
    * binary-exact, so both engines floor identically (the op's
    * documented restatement contract).
    */
  private def qUnimaxSample(s: SparkSession, dir: String): DataFrame =
    Mixture.unimaxSample(
      docs(s, dir).select("doc_id", "lang"), "doc_id", "lang",
      budgetDocs = 700L, maxEpochs = 2.0)
      .orderBy("lang", "doc_id")

  /** Token-budget UniMax ([[Mixture.unimaxSampleTokens]]) — the
    * published recipe's actual unit. budget=12000 tokens at
    * maxEpochs=0.5 makes the epoch cap BIND on the four non-English
    * languages at sf0.01 (caps ≈1.8–2.1k tokens < the 2.4k fair share)
    * and visibly redistributes their slack to English (fair-bound at
    * ~4.3k > budget/5) — the oracle's recursive waterfill grades the
    * redistribution arithmetic, not just the happy path. 0.5 is
    * exactly representable so both engines floor identically.
    */
  private def qUnimaxTokens(s: SparkSession, dir: String): DataFrame =
    Mixture.unimaxSampleTokens(
      docs(s, dir).select("doc_id", "lang", "text")
        .withColumn("toks", TextOps.tokenCount(col("text")).cast("long"))
        .drop("text"),
      "doc_id", "toks", "lang", budgetTokens = 12000L, maxEpochs = 0.5)
      .select(col("doc_id"), col("lang"), col("toks").cast("int").as("toks"),
        col("ux_quota"), col("ux_epochs"))
      .orderBy("lang", "doc_id")

  /** Incremental dataset card through the STORE (the qn33 mergeable-
    * sketch pattern applied to qn77's card): each ingest persists its
    * per-source stateless card stats as one store version (a
    * sources-sized table — O(delta) work), and the published card is
    * the accumulate-read SUM over versions. Graded against the direct
    * whole-corpus aggregate: it matches only if the per-version stats
    * are truly mergeable and the version union loses nothing. This is
    * how a 100 TB pipeline keeps its card current without rescanning
    * history on every ingest.
    */
  private def qIncrementalCard(s: SparkSession, dir: String): DataFrame = {
    val store = new graft.store.Store(s, graft.TempDirs.create("graft_card_"))
    val d = docs(s, dir)
    def stats(half: org.apache.spark.sql.Column) =
      graft.streaming.DocStreams.datasetCardTotals(d.where(half))
    store.load(stats(pmod(col("doc_id"), lit(2)) === 0), "card/stats", externalKey = "b0")
    store.load(stats(pmod(col("doc_id"), lit(2)) === 1), "card/stats", externalKey = "b1")
    store.get("card/stats")
      .groupBy("source")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("n_en").as("n_en"), sum("n_quality_pass").as("n_quality_pass"))
      .orderBy("source")
  }

  /** Curriculum sharding ([[Mixture.curriculumShards]]): token-balanced
    * shards ordered by descending [[TextOps.qualityScore]] — shard 0 is
    * the cleanest ~quarter of the token mass. Runs through the
    * generalized two-phase bucket plan (per-bucket totals → driver
    * prefix sums → window inside the boundary bucket only); the oracle
    * restates the naive single-window formulation, which MixtureSpec
    * proves row-identical.
    */
  private def qCurriculumShards(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .withColumn("toks", TextOps.tokenCount(col("text")).cast("long"))
      .withColumn("q", TextOps.qualityScore(col("text")))
    Mixture.curriculumShards(d, "doc_id", "toks", "q", numShards = 4)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("shard_tokens"),
        round(sum(round(col("q"), 6).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double") / count(lit(1)), 4).as("avg_quality"))
      .orderBy("shard_id")
  }

  /** Per-epoch deterministic reshuffle ([[Mixture.epochPriority]]): the
    * first 10 docs of epochs 0 and 1 in their salted priority orders —
    * different epochs must produce different, reproducible orders, and
    * the oracle restates both permutation heads exactly. The rank-limit
    * plans through `WindowGroupLimit`, so each map task ships 10 rows,
    * not the corpus.
    */
  private def qEpochShuffle(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    Seq(0, 1).map { ep =>
      d.select(lit(ep).as("epoch"), col("doc_id"))
        .withColumn("pos", row_number().over(
          Window.orderBy(Mixture.epochPriority(col("doc_id"), ep), col("doc_id")))
          .cast("int"))
        .where(col("pos") <= 10)
    }.reduce(_ unionByName _).orderBy("epoch", "pos")
  }

  /** Token-distribution drift matrix ([[TextOps.unigramJsdMatrix]]):
    * Jensen–Shannon divergence between every source pair's unigram
    * distributions — the text-space complement of qn56's embedding
    * centroid drift, stated exactly by the oracle via the shared
    * rounded-term DECIMAL-sum discipline.
    */
  private def qSourceJsd(s: SparkSession, dir: String): DataFrame =
    TextOps.unigramJsdMatrix(docs(s, dir), "text", "source")
      .orderBy("source_a", "source_b")

  /** Matryoshka-truncation retrieval audit (Kusupati et al. 2022): how
    * much of full-dimension top-5 retrieval survives when vectors are
    * truncated to their first 4 of 8 dimensions — the measurement a
    * pipeline runs before adopting truncated embeddings as a cheap
    * prefilter tier. Two [[Similarity.topKPerQuery]] passes (broadcast
    * queries + bounded-heap top-k; the corpus scans twice and nothing
    * pair-sized shuffles) compared on queries×k-sized tables. Both
    * rankings and the overlap are exactly stateable, so the oracle
    * replays the whole audit.
    */
  private def qMatryoshkaAudit(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.where(col("vec_id") < 8)
    def prefix(df: DataFrame) =
      df.select(col("vec_id"), slice(col("embedding"), 1, 4).as("embedding"))
    // Each ranking feeds two consumers (overlap + top-1); materialize
    // the queries×k-sized results so the corpus-scanning bounded-heap
    // passes run once each, not once per consumer.
    val full = Dedup.materialize(
      Similarity.topKPerQuery(e, q, "vec_id", "embedding", k = 5))
    val pref = Dedup.materialize(
      Similarity.topKPerQuery(prefix(e), prefix(q), "vec_id", "embedding", k = 5))
    val overlap = full.join(pref.select("query_id", "vec_id"), Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
    full.where(col("rank") === 1)
      .select(col("query_id"), col("vec_id").as("top1_full"), col("sim").as("top1_sim"))
      .join(pref.where(col("rank") === 1)
        .select(col("query_id"), col("vec_id").as("top1_prefix")), Seq("query_id"))
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        col("top1_full"), col("top1_prefix"), col("top1_sim"))
      .orderBy("query_id")
  }

  /** Per-source Zipf rank-frequency slope ([[TextOps.zipfSlope]]): the
    * corpus-health regression, every ln term rounded and summed in
    * exact DECIMAL so both engines state the identical closed form.
    */
  private def qZipfSlope(s: SparkSession, dir: String): DataFrame =
    TextOps.zipfSlope(docs(s, dir), "text", "source")
      .orderBy("source")

  /** Gopher-style top-2-gram character fraction ([[TextOps.topNgramStats]]):
    * how much of each doc a single dominant bigram owns — the phrase-level
    * repetition signal complementing qn31's repeated-3-gram occurrence
    * fraction. The `repetitive` flag is the published 0.20 threshold,
    * compared on uncapped integers so both engines state it exactly.
    */
  private def qTopNgramFraction(s: SparkSession, dir: String): DataFrame =
    TextOps.topNgramStats(docs(s, dir), "doc_id", "text", n = 2)
      .orderBy("doc_id")

  /** Cluster-balanced diverse subsample: assign every embedding to its
    * nearest deterministic centroid (vec_id < 8 — the qn74 replayable
    * clustering), then keep at most 10 vectors per cell in
    * [[Mixture.priority]] order ([[Mixture.clusterBalancedSample]]).
    * The diversity-aware downsampling a curation pipeline runs instead
    * of a uniform draw, so head clusters can't crowd out the tail; the
    * whole draw is a pure function of ids, hence oracle-stateable.
    */
  private def qDiverseSample(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val assigned = Similarity.assignToCentroids(
      e, e.where(col("vec_id") < 8),
      "vec_id", "embedding", "vec_id", "embedding", carry = Seq("label"))
    Mixture.clusterBalancedSample(assigned, "vec_id", "cluster_id", perCell = 10)
      .select(col("cluster_id"), col("pick_rank"), col("vec_id"),
        col("label"), col("sim"))
      .orderBy("cluster_id", "pick_rank")
  }

  /** Shared by qn101 (the pipeline as one algebraic plan) and qn104 (the
    * same pipeline with every stage boundary store-materialized): both
    * must produce the identical manifest + conserved stage counts.
    */
  /** qn24's one-shot corpus dedup (recursive-CTE components over capped
    * exact Jaccard) — shared verbatim by qn24 (row-versioned freq
    * state), qn129 (the r16 bucketed layout end to end), qn130 (the
    * three-surface fold lifecycle) and qn131 (the fold mid-outage of a
    * crashed stream, exclusions checkpoint-derived): the layout and
    * plan change, the survivor set must not.
    */
  private val incrementalDedupOracle: String = """
      WITH RECURSIVE
      toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
               FROM documents WHERE trim(text) <> ''),
      sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
              FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      sh AS (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      qpairs AS (SELECT doc_a, doc_b FROM prs
                 JOIN counts na ON doc_a = na.doc_id
                 JOIN counts nb ON doc_b = nb.doc_id
                 WHERE common / (na.n_sh + nb.n_sh - common) >= 0.8),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM qpairs
                UNION SELECT doc_b, doc_a FROM qpairs),
      reach(u, v) AS (SELECT u, v FROM edges
                      UNION
                      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS node, least(u, min(v)) AS component
               FROM reach GROUP BY u)
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
      ORDER BY doc_id"""

  /** qn118's hamming pipeline over the full corpus — shared verbatim by
    * qn120 (stored+append ≡ fresh) and qn128 (the candidate-id-pruned
    * rerank: pruning is plan-only by contract, so the SAME oracle is
    * the graded claim).
    */
  private val hammingIndexOracle: String = """
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                 FROM embeddings WHERE vec_id < 8),
      p AS (SELECT q.query_id, e.vec_id, qv, e.embedding::DOUBLE[] AS ev
            FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      h AS (SELECT query_id, vec_id, qv, ev,
                   CAST(len(list_filter(range(1, len(qv) + 1),
                          i -> (qv[i] > 0) <> (ev[i] > 0))) AS BIGINT)
                     AS hamming
            FROM p),
      cand AS (SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY hamming, vec_id) AS hr FROM h),
      r AS (SELECT query_id, vec_id, hamming,
                   round(list_cosine_similarity(qv, ev), 6) AS sim
            FROM cand WHERE hr <= 20),
      ranked AS (SELECT query_id, vec_id, hamming, sim,
                        CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
                 FROM r)
      SELECT query_id, vec_id, hamming, sim, rank FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank"""

  private val corpusBuildOracle: String = """
      WITH RECURSIVE corpus AS MATERIALIZED (
        SELECT doc_id, source, text FROM documents WHERE doc_id % 50 <> 3),
      bench AS MATERIALIZED (
        SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS s
        FROM (SELECT string_split_regex(trim(text), '\s+') AS w
              FROM documents WHERE doc_id % 50 = 3 AND trim(text) <> '') bt,
             unnest(range(1, len(w) - 1)) r(i)),
      q AS MATERIALIZED (
        SELECT doc_id, source, text FROM (
          SELECT doc_id, source, text,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END AS toks,
                 CASE WHEN trim(text) = '' THEN 0.0
                      ELSE len(regexp_replace(text, '\s+', '', 'g'))
                        * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS awl,
                 CASE WHEN trim(text) = '' THEN 0.0
                      ELSE len(list_distinct(string_split_regex(trim(text), '\s+')))
                        * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS ttr,
                 CASE WHEN trim(text) = '' THEN 0.0
                      ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
                                 t -> t IN ('the', 'a', 'of', 'and', 'is', 'to')))
                        * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS stopfrac
          FROM corpus) f
        WHERE (toks BETWEEN 25 AND 100000) AND (awl BETWEEN 3.0 AND 10.0)
          AND (ttr >= 0.45) AND (stopfrac >= 0.05)),
      sh0 AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM q WHERE trim(text) <> '') qt,
             unnest(range(1, len(w) - 1)) r(i)),
      sh AS MATERIALIZED (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      nsh AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      qpairs AS (SELECT doc_a, doc_b FROM prs
                 JOIN nsh na ON doc_a = na.doc_id
                 JOIN nsh nb ON doc_b = nb.doc_id
                 WHERE common / (na.n_sh + nb.n_sh - common) >= 0.8),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM qpairs
                UNION SELECT doc_b, doc_a FROM qpairs),
      reach(u, v) AS (SELECT u, v FROM edges
                      UNION
                      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS node, least(u, min(v)) AS component
               FROM reach GROUP BY u),
      dd AS MATERIALIZED (
        SELECT * FROM q WHERE doc_id NOT IN
          (SELECT node FROM comp WHERE node <> component)),
      dc AS MATERIALIZED (
        SELECT * FROM dd WHERE doc_id NOT IN (
          SELECT DISTINCT c.doc_id FROM (
            SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
            FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                  FROM dd WHERE trim(text) <> '') dt,
                 unnest(range(1, len(w) - 1)) r(i)) c
          JOIN bench b ON c.s = b.s)),
      t AS (
        SELECT doc_id, source,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks,
               CAST((doc_id::HUGEINT * 2654435761) % 4294967296 AS BIGINT) AS pr,
               200 + 50 * CAST(substr(source, 4) AS INT) AS budget
        FROM dc),
      cb AS (
        SELECT doc_id, toks, pr,
               coalesce(sum(toks) OVER (PARTITION BY source ORDER BY pr, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior,
               budget
        FROM t),
      samp AS MATERIALIZED (
        SELECT doc_id, toks, pr FROM cb WHERE prior < budget),
      tot AS (SELECT greatest(1, (sum(toks) + 7) // 8) AS target FROM samp),
      csh AS (
        SELECT doc_id, toks,
               coalesce(sum(toks) OVER (ORDER BY pr, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        FROM samp),
      a AS (
        SELECT doc_id, toks, CAST(least(prior // target, 7) AS INT) AS shard_id
        FROM csh, tot),
      manifest AS (
        SELECT shard_id, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS shard_tokens
        FROM a GROUP BY shard_id)
      SELECT m.shard_id, m.n_docs, m.shard_tokens,
             (SELECT count(*) FROM corpus) AS n_corpus,
             (SELECT count(*) FROM q) AS n_quality,
             (SELECT count(*) FROM dd) AS n_dedup,
             (SELECT count(*) FROM dc) AS n_decontam,
             (SELECT count(*) FROM samp) AS n_sampled
      FROM manifest m
      ORDER BY m.shard_id"""

  /** The day0/delta one-shot restatement shared by qn110 and qn114
    * (distinct from qn101/qn104's manifest-shaped corpusBuildOracle):
    * incremental ≡ one-shot is the graded claim, and the compacted
    * variant must be indistinguishable.
    */
  private val incrementalBuildOracle: String = """
      WITH RECURSIVE corpus AS MATERIALIZED (
        SELECT doc_id, source, text FROM documents WHERE doc_id % 50 <> 3),
      bench AS MATERIALIZED (
        SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS s
        FROM (SELECT string_split_regex(trim(text), '\s+') AS w
              FROM documents WHERE doc_id % 50 = 3 AND trim(text) <> '') bt,
             unnest(range(1, len(w) - 1)) r(i)),
      q AS MATERIALIZED (
        SELECT doc_id, source, text FROM (
          SELECT doc_id, source, text,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END AS toks,
                 CASE WHEN trim(text) = '' THEN 0.0
                      ELSE len(regexp_replace(text, '\s+', '', 'g'))
                        * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS awl,
                 CASE WHEN trim(text) = '' THEN 0.0
                      ELSE len(list_distinct(string_split_regex(trim(text), '\s+')))
                        * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS ttr,
                 CASE WHEN trim(text) = '' THEN 0.0
                      ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
                                 t -> t IN ('the', 'a', 'of', 'and', 'is', 'to')))
                        * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS stopfrac
          FROM corpus) f
        WHERE (toks BETWEEN 25 AND 100000) AND (awl BETWEEN 3.0 AND 10.0)
          AND (ttr >= 0.45) AND (stopfrac >= 0.05)),
      sh0 AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM q WHERE trim(text) <> '') qt,
             unnest(range(1, len(w) - 1)) r(i)),
      sh AS MATERIALIZED (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      nsh AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      qpairs AS (SELECT doc_a, doc_b FROM prs
                 JOIN nsh na ON doc_a = na.doc_id
                 JOIN nsh nb ON doc_b = nb.doc_id
                 WHERE common / (na.n_sh + nb.n_sh - common) >= 0.8),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM qpairs
                UNION SELECT doc_b, doc_a FROM qpairs),
      reach(u, v) AS (SELECT u, v FROM edges
                      UNION
                      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS node, least(u, min(v)) AS component
               FROM reach GROUP BY u),
      dd AS MATERIALIZED (
        SELECT * FROM q WHERE doc_id NOT IN
          (SELECT node FROM comp WHERE node <> component)),
      dc AS MATERIALIZED (
        SELECT * FROM dd WHERE doc_id NOT IN (
          SELECT DISTINCT c.doc_id FROM (
            SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
            FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                  FROM dd WHERE trim(text) <> '') dt,
                 unnest(range(1, len(w) - 1)) r(i)) c
          JOIN bench b ON c.s = b.s)),
      cut AS (SELECT count(*) // 2 AS c FROM documents),
      card AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END)
                 AS BIGINT) AS n_tokens
        FROM dc GROUP BY source)
      SELECT source, n_docs, n_tokens,
             (SELECT count(*) FROM dc
              WHERE doc_id < (SELECT c FROM cut)) AS n_day0_kept,
             (SELECT count(*) FROM corpus
              WHERE doc_id >= (SELECT c FROM cut)) AS n_delta,
             (SELECT count(*) FROM q
              WHERE doc_id >= (SELECT c FROM cut)) AS n_delta_quality,
             (SELECT count(*) FROM dc
              WHERE doc_id >= (SELECT c FROM cut)) AS n_delta_kept
      FROM card
      ORDER BY source"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("qn01_dedup_exact", qDedupExact _, Some("""
      SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(text) AS text_hash
      FROM documents
      GROUP BY text
      ORDER BY keep_id""")),
    QueryDef("qn02_dedup_ngram_jaccard", qNgramJaccard _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
              FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      sh AS (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT doc_a, doc_b,
             round(common / (na.n_sh + nb.n_sh - common), 4) AS jaccard
      FROM pairs
      JOIN counts na ON doc_a = na.doc_id
      JOIN counts nb ON doc_b = nb.doc_id
      WHERE common / (na.n_sh + nb.n_sh - common) >= 0.8
      ORDER BY doc_a, doc_b""")),
    QueryDef("qn03_dedup_minhash_lsh", qMinhash _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
              FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      sh AS (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      truth AS (SELECT doc_a, doc_b FROM pairs
                JOIN counts na ON doc_a = na.doc_id
                JOIN counts nb ON doc_b = nb.doc_id
                WHERE common / (na.n_sh + nb.n_sh - common) >= 0.7)
      SELECT count(*) AS n_true_pairs, true AS recall_ok, true AS est_err_ok
      FROM truth""")),
    QueryDef("qn04_dedup_simhash", qSimhash _, Some("""
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             true AS found, true AS hamming_zero, true AS band_exact_ok
      FROM documents a JOIN documents b
        ON a.text = b.text AND a.doc_id < b.doc_id
      ORDER BY doc_a, doc_b""")),
    QueryDef("qn05_text_stats", qTextStats _, Some("""
      WITH f AS (
        SELECT lang, source, n_chars,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS toks,
               len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\p{L}\p{N}\s]+')) AS bpe,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(list_distinct(string_split_regex(trim(text), '\s+')))
                      / len(string_split_regex(trim(text), '\s+')) END AS ttr,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(regexp_replace(text, '\s+', '', 'g'))
                      / len(string_split_regex(trim(text), '\s+')) END AS awl
        FROM documents)
      SELECT lang, source,
             count(*) AS n_docs,
             round(avg(n_chars), 4) AS avg_chars,
             round(avg(toks), 4) AS avg_tokens,
             round(avg(bpe), 4) AS avg_bpe_tokens,
             round(avg(ttr), 4) AS avg_ttr,
             round(avg(least(toks / 50.0, 1.0) * 0.4 + ttr * 0.3
                       + least(awl / 8.0, 1.0) * 0.3), 4) AS avg_quality
      FROM f
      GROUP BY lang, source
      ORDER BY lang, source""")),
    QueryDef("qn06_langid", qLangId _, Some("""
      WITH scored AS (
        SELECT lang,
               len(regexp_extract_all(text, '\b(the|a|of|and|is|to)\b')) AS en,
               len(regexp_extract_all(text, '\b(el|los|las|una|y|que)\b')) AS es,
               len(regexp_extract_all(text, '\b(le|les|et|un|une|est)\b')) AS fr,
               len(regexp_extract_all(text, '\b(der|die|das|und|ein|ist)\b')) AS de,
               len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS zh
        FROM documents),
      pred AS (
        SELECT lang,
               CASE WHEN zh > 0 THEN 'zh'
                    WHEN en + es + fr + de = 0 THEN 'und'
                    WHEN en >= es AND en >= fr AND en >= de THEN 'en'
                    WHEN es >= fr AND es >= de THEN 'es'
                    WHEN fr >= de THEN 'fr'
                    ELSE 'de' END AS predicted
        FROM scored)
      SELECT predicted, count(*) AS n,
             CAST(sum(CASE WHEN predicted = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
      FROM pred
      GROUP BY predicted
      ORDER BY predicted""")),
    QueryDef("qn07_fingerprint", qFingerprint _, Some("""
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ''),
                                x -> CAST(ascii(x) AS BIGINT))),
               (a, b) -> (a * 31 + b) % 1000000007) AS fp
      FROM documents
      ORDER BY doc_id""")),
    QueryDef("qn08_cosine_topk", qCosineTopK _, Some("""
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                 FROM embeddings WHERE vec_id = 0),
      scored AS (SELECT q.query_id, e.vec_id,
                        round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS sim
                 FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      ranked AS (SELECT query_id, vec_id, sim,
                        CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
                 FROM scored)
      SELECT query_id, vec_id, sim, rank FROM ranked
      WHERE rank <= 10
      ORDER BY query_id, rank""")),
    QueryDef("qn09_cosine_topk_multi", qCosineTopKMulti _, Some("""
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                 FROM embeddings WHERE vec_id < 8),
      scored AS (SELECT q.query_id, e.vec_id,
                        round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS sim
                 FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      ranked AS (SELECT query_id, vec_id, sim,
                        CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
                 FROM scored)
      SELECT query_id, vec_id, sim, rank FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank""")),
    QueryDef("qn10_embedding_neardup", qEmbeddingNearDup _, Some("""
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 6) AS sim
      FROM embeddings a, embeddings b
      WHERE a.vec_id < b.vec_id
        AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
      ORDER BY id_a, id_b""")),
    QueryDef("qn11_ann_lsh", qAnnLsh _, Some("""
      WITH truth AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]) >= 0.35)
      SELECT count(*) AS n_true_pairs, true AS recall_ok,
             true AS rerank_exact_ok, true AS precision_ok
      FROM truth""")),
    QueryDef("qn12_ann_ivf", qAnnIvf _, Some("""
      SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS k_exact,
             true AS returned_ok, true AS recall_ok
      FROM embeddings WHERE vec_id < 8
      ORDER BY query_id""")),
    QueryDef("qn13_multimodal_features", qMultimodalFeatures _, Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS digest,
             CAST(64 + octet_length(encode(text)) % 577 AS INTEGER) AS width,
             CAST(64 + (octet_length(encode(text)) * 31) % 411 AS INTEGER) AS height,
             CAST(1 + octet_length(encode(text)) % 7 AS INTEGER) AS n_frames
      FROM documents
      ORDER BY doc_id""")),
    QueryDef("qn14_multimodal_frames", qMultimodalFrames _, Some("""
      SELECT doc_id,
             CAST(8 + doc_id % 16 AS INTEGER) AS width,
             CAST(8 + (doc_id * 3) % 16 AS INTEGER) AS height,
             CAST(1 + doc_id % 5 AS INTEGER) AS n_frames,
             CAST(1 + doc_id % 5 AS BIGINT) AS n_frames_exploded
      FROM documents
      WHERE doc_id < 64
      ORDER BY doc_id""")),
    QueryDef("qn15_dedup_apply", qDedupApply _, Some("""
      WITH RECURSIVE
      toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
               FROM documents WHERE trim(text) <> ''),
      sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
              FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      sh AS (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      qpairs AS (SELECT doc_a, doc_b FROM prs
                 JOIN counts na ON doc_a = na.doc_id
                 JOIN counts nb ON doc_b = nb.doc_id
                 WHERE common / (na.n_sh + nb.n_sh - common) >= 0.8),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM qpairs
                UNION SELECT doc_b, doc_a FROM qpairs),
      reach(u, v) AS (SELECT u, v FROM edges
                      UNION
                      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS node, least(u, min(v)) AS component
               FROM reach GROUP BY u)
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
      ORDER BY doc_id""")),
    QueryDef("qn16_text_distance", qTextDistance _, Some("""
      SELECT doc_id,
             CAST(levenshtein(substring(text, 1, 40),
                              'the quick brown fox jumps over') AS INTEGER) AS lev,
             translate(substring(text, 1, 20), 'aeiou', 'AEIOU') AS tr,
             regexp_replace(substring(text, 1, 30), '[aeiou]', '', 'g') AS novowel
      FROM documents
      ORDER BY doc_id""")),
    QueryDef("qn17_pipeline", qPipeline _, Some("""
      WITH f AS (
        SELECT doc_id, source,
               least(len(string_split_regex(trim(text), '\s+')) / 50.0, 1.0) * 0.4
                 + (len(list_distinct(string_split_regex(trim(text), '\s+')))
                    / len(string_split_regex(trim(text), '\s+'))) * 0.3
                 + least((len(regexp_replace(text, '\s+', '', 'g'))
                    / len(string_split_regex(trim(text), '\s+'))) / 8.0, 1.0) * 0.3
                 AS quality,
               CASE WHEN len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) > 0 THEN 'zh'
                    WHEN len(regexp_extract_all(text, '\b(the|a|of|and|is|to)\b'))
                       + len(regexp_extract_all(text, '\b(el|los|las|una|y|que)\b'))
                       + len(regexp_extract_all(text, '\b(le|les|et|un|une|est)\b'))
                       + len(regexp_extract_all(text, '\b(der|die|das|und|ein|ist)\b')) = 0 THEN 'und'
                    WHEN len(regexp_extract_all(text, '\b(the|a|of|and|is|to)\b')) >= len(regexp_extract_all(text, '\b(el|los|las|una|y|que)\b'))
                     AND len(regexp_extract_all(text, '\b(the|a|of|and|is|to)\b')) >= len(regexp_extract_all(text, '\b(le|les|et|un|une|est)\b'))
                     AND len(regexp_extract_all(text, '\b(the|a|of|and|is|to)\b')) >= len(regexp_extract_all(text, '\b(der|die|das|und|ein|ist)\b')) THEN 'en'
                    WHEN len(regexp_extract_all(text, '\b(el|los|las|una|y|que)\b')) >= len(regexp_extract_all(text, '\b(le|les|et|un|une|est)\b'))
                     AND len(regexp_extract_all(text, '\b(el|los|las|una|y|que)\b')) >= len(regexp_extract_all(text, '\b(der|die|das|und|ein|ist)\b')) THEN 'es'
                    WHEN len(regexp_extract_all(text, '\b(le|les|et|un|une|est)\b')) >= len(regexp_extract_all(text, '\b(der|die|das|und|ein|ist)\b')) THEN 'fr'
                    ELSE 'de' END AS predicted,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(text, ''), x -> CAST(ascii(x) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 1000000007) AS fp
        FROM documents),
      filtered AS (SELECT * FROM f WHERE quality >= 0.6 AND predicted = 'en'),
      deduped AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
                  FROM filtered)
      SELECT source, count(*) AS n_docs, round(avg(quality), 4) AS avg_quality
      FROM deduped WHERE rn = 1
      GROUP BY source
      ORDER BY source""")),
    QueryDef("qn18_quality_filter", qQualityFilter _, Some("""
      WITH f AS (
        SELECT lang, source,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS toks,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(regexp_replace(text, '\s+', '', 'g'))
                      * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS awl,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(list_distinct(string_split_regex(trim(text), '\s+')))
                      * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS ttr,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
                               t -> t IN ('the', 'a', 'of', 'and', 'is', 'to')))
                      * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS stopfrac
        FROM documents),
      r AS (
        SELECT lang, source,
               (toks BETWEEN 25 AND 100000) AS length_ok,
               (awl BETWEEN 3.0 AND 10.0) AS shape_ok,
               (ttr >= 0.45) AS rep_ok,
               (stopfrac >= 0.05) AS stop_ok
        FROM f)
      SELECT lang, source,
             count(*) AS n_docs,
             CAST(sum(CASE WHEN length_ok AND shape_ok AND rep_ok AND stop_ok
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN NOT length_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_len,
             CAST(sum(CASE WHEN NOT shape_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_shape,
             CAST(sum(CASE WHEN NOT rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_rep,
             CAST(sum(CASE WHEN NOT stop_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stop
      FROM r
      GROUP BY lang, source
      ORDER BY lang, source""")),
    QueryDef("qn19_redact_pii", qRedactPii _, Some("""
      WITH inj AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17' AS t
        FROM documents WHERE doc_id % 7 = 0),
      red AS (
        SELECT doc_id, t,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\+?1-[0-9]{3}-(?:[0-9]{3}-)?[0-9]{4}', '<PHONE>', 'g'),
                 '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS rt
        FROM inj)
      SELECT doc_id,
             md5(rt) AS redacted_md5,
             CAST(len(rt) AS INTEGER) AS redacted_len,
             CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
             CAST(len(regexp_extract_all(t, '\+?1-[0-9]{3}-(?:[0-9]{3}-)?[0-9]{4}')) AS INTEGER) AS n_phone,
             CAST(len(regexp_extract_all(t,
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INTEGER) AS n_ipv4
      FROM red
      ORDER BY doc_id""")),
    QueryDef("qn20_pack_sequences", qPackSequences _, Some("""
      WITH t AS (
        SELECT source, doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS toks
        FROM documents),
      b AS (
        SELECT source, doc_id, toks,
               CAST(floor(coalesce(sum(toks) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048) AS BIGINT) AS bin
        FROM t)
      SELECT source, bin,
             count(*) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS sum_tokens,
             min(doc_id) AS first_doc,
             max(doc_id) AS last_doc
      FROM b
      GROUP BY source, bin
      ORDER BY source, bin""")),
    QueryDef("qn21_image_decode", qImageDecode _, Some("""
      SELECT doc_id,
             CAST(8 + doc_id % 16 AS INTEGER) AS width,
             CAST(8 + (doc_id * 3) % 16 AS INTEGER) AS height,
             CAST(1 AS INTEGER) AS n_frames
      FROM documents
      WHERE doc_id < 48
      ORDER BY doc_id""")),
    QueryDef("qn22_decontaminate", qDecontaminate _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents WHERE trim(text) <> ''),
      sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
             FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 3)
      SELECT c.doc_id, count(*) AS n_overlap
      FROM sh c JOIN bench b ON c.s = b.s
      WHERE c.doc_id % 50 <> 3
      GROUP BY c.doc_id
      ORDER BY doc_id""")),
    QueryDef("qn23_vocab", qVocab _, Some("""
      WITH t AS (SELECT doc_id,
                        unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok
                 FROM documents WHERE trim(text) <> '')
      SELECT tok, count(*) AS doc_freq
      FROM t GROUP BY tok
      ORDER BY doc_freq DESC, tok
      LIMIT 30""")),
    QueryDef("qn24_dedup_incremental", qDedupIncremental _,
      Some(incrementalDedupOracle)),
    QueryDef("qn129_dedup_incremental_bucketed", qDedupIncrementalBucketed _,
      Some(incrementalDedupOracle)),
    QueryDef("qn130_dedup_state_folded", qDedupStateFolded _,
      Some(incrementalDedupOracle)),
    QueryDef("qn131_dedup_fold_crashed_stream", qDedupFoldCrashedStream _,
      Some(incrementalDedupOracle)),
    QueryDef("qn25_video_frames", qVideoFrames _, Some("""
      WITH d AS (SELECT doc_id,
                        CAST(6 + doc_id % 10 AS INTEGER) AS w,
                        CAST(6 + (doc_id * 3) % 10 AS INTEGER) AS h,
                        1 + doc_id % 4 AS nf
                 FROM documents WHERE doc_id < 48),
      f AS (SELECT doc_id, w, h, fi FROM d, unnest(range(0, nf)) t(fi)),
      px AS (SELECT doc_id, w, h, fi, y, x,
                    (doc_id * 131 + fi * 31 + y * w + x * 7) % 251 AS v
             FROM f, unnest(range(0, h)) ty(y), unnest(range(0, w)) tx(x))
      SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx, w AS width, h AS height,
             CAST(sum(v * (y * w + x + 1)) AS BIGINT) AS pix_checksum
      FROM px
      GROUP BY doc_id, fi, w, h
      ORDER BY doc_id, frame_idx""")),
    QueryDef("qn26_dedup_embedding_apply", qDedupCosine _, Some("""
      WITH RECURSIVE
      p AS (SELECT a.vec_id AS u, b.vec_id AS v
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.4),
      edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
      reach(u, v) AS (SELECT u, v FROM edges
                      UNION
                      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS node, least(u, min(v)) AS component
               FROM reach GROUP BY u)
      SELECT vec_id FROM embeddings
      WHERE vec_id NOT IN (SELECT node FROM comp WHERE node <> component)
      ORDER BY vec_id""")),
    QueryDef("qn27_audio_decode", qAudioDecode _, Some("""
      WITH d AS (SELECT doc_id, 4000 + (doc_id % 5) * 2000 AS n
                 FROM documents WHERE doc_id < 48),
      s AS (SELECT doc_id, n, i,
                   (doc_id * 131 + i * 7) % 4001 - 2000 AS v
            FROM d, unnest(range(0, n)) t(i))
      SELECT doc_id,
             CAST(8000 AS INTEGER) AS sample_rate,
             CAST(1 AS INTEGER) AS channels,
             CAST(n AS BIGINT) AS n_samples,
             CAST(sum(v * (i + 1)) AS BIGINT) AS pcm_checksum
      FROM s
      GROUP BY doc_id, n
      ORDER BY doc_id""")),
    QueryDef("qn28_mixture_sample", qMixtureSample _, Some("""
      WITH t AS (
        SELECT doc_id, source,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS toks,
               CAST((doc_id::HUGEINT * 2654435761) % 4294967296 AS BIGINT) AS pr,
               200 + 50 * CAST(substr(source, 4) AS INT) AS budget
        FROM documents),
      c AS (
        SELECT doc_id, source, toks, budget,
               coalesce(sum(toks) OVER (PARTITION BY source ORDER BY pr, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        FROM t)
      SELECT doc_id, source, CAST(toks AS INT) AS toks
      FROM c WHERE prior < budget
      ORDER BY doc_id""")),
    QueryDef("qn29_ann_pq", qAnnPq _, Some("""
      SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS k_exact,
             true AS returned_ok, true AS recall_ok
      FROM embeddings WHERE vec_id < 8
      ORDER BY query_id""")),
    QueryDef("qn30_chunk_sequences", qChunkSequences _, Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE trim(text) <> ''),
      starts AS (
        SELECT doc_id, w, CAST(st AS BIGINT) AS st,
               CAST(st / 48 AS INT) AS chunk_idx
        FROM toks, unnest(range(0, len(w), 48)) t(st)),
      chunks AS (
        SELECT doc_id, chunk_idx, list_slice(w, st + 1, st + 64) AS chunk
        FROM starts)
      SELECT doc_id, chunk_idx,
             CAST(len(chunk) AS INT) AS chunk_len,
             md5(array_to_string(chunk, ' ')) AS chunk_hash
      FROM chunks
      ORDER BY doc_id, chunk_idx""")),
    QueryDef("qn31_intradoc_repetition", qIntraDocRepetition _, Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE trim(text) <> ''),
      sh AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
             FROM toks, unnest(range(1, len(w) - 1)) t(i)),
      cnts AS (SELECT doc_id, s, count(*) AS c FROM sh GROUP BY 1, 2)
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_repeated,
             round(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) / sum(c), 4) AS rep_frac
      FROM cnts GROUP BY doc_id ORDER BY doc_id""")),
    QueryDef("qn32_token_shards", qTokenShards _, Some("""
      WITH t AS (
        SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks,
               CAST((doc_id::HUGEINT * 2654435761) % 4294967296 AS BIGINT) AS pr
        FROM documents),
      c AS (
        SELECT doc_id, toks,
               coalesce(sum(toks) OVER (ORDER BY pr, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        FROM t),
      tot AS (SELECT greatest(1, (sum(toks) + 7) // 8) AS target FROM t),
      a AS (
        SELECT doc_id, toks,
               CAST(least(prior // target, 7) AS INT) AS shard_id
        FROM c, tot)
      SELECT shard_id, count(*) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS shard_tokens
      FROM a GROUP BY shard_id ORDER BY shard_id""")),
    QueryDef("qn33_incremental_distinct", qIncrementalDistinct _, Some("""
      WITH t AS (
        SELECT DISTINCT source, tok
        FROM (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
              FROM documents WHERE trim(text) <> ''))
      SELECT source, count(*) AS n_exact,
             true AS inc_ok, true AS full_ok
      FROM t GROUP BY source ORDER BY source""")),
    QueryDef("qn34_hard_negatives", qHardNegatives _, Some("""
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                 FROM embeddings WHERE vec_id < 8),
      scored AS (SELECT q.query_id, e.vec_id,
                        round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS sim
                 FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      band AS (SELECT * FROM scored WHERE sim >= 0.15 AND sim < 0.35),
      ranked AS (SELECT query_id, vec_id, sim,
                        CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
                 FROM band)
      SELECT query_id, vec_id, sim, rank FROM ranked
      WHERE rank <= 3
      ORDER BY query_id, rank""")),
    QueryDef("qn35_normalize_text", qNormalizeText _, Some("""
      WITH t AS (
        SELECT doc_id,
               text || ' nfc:E' || chr(769) || 'O' || chr(776) || 'A' || chr(778) AS raw
        FROM documents),
      n AS (SELECT doc_id, raw, lower(nfc_normalize(raw)) AS normed FROM t)
      SELECT doc_id,
             CAST(length(raw) AS INTEGER) AS n_raw,
             CAST(length(normed) AS INTEGER) AS n_norm,
             md5(normed) AS norm_hash
      FROM n ORDER BY doc_id""")),
    QueryDef("qn36_ann_ivfpq", qAnnIvfPq _, Some("""
      SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS k_exact,
             true AS returned_ok, true AS recall_ok
      FROM embeddings WHERE vec_id < 8
      ORDER BY query_id""")),
    QueryDef("qn37_decontaminate_bloom", qDecontaminateBloom _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents WHERE trim(text) <> ''),
      sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
             FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 3)
      SELECT DISTINCT c.doc_id, true AS flagged,
             true AS no_false_negatives, true AS fp_bound_ok
      FROM sh c JOIN bench b ON c.s = b.s
      WHERE c.doc_id % 50 <> 3
      ORDER BY doc_id""")),
    QueryDef("qn38_remove_boilerplate", qRemoveBoilerplate _, Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE trim(text) <> ''),
      segs AS (
        SELECT doc_id, CAST(st / 8 AS INT) AS seg_idx,
               array_to_string(list_slice(w, st + 1, st + 8), ' ') AS seg
        FROM toks, unnest(range(0, len(w), 8)) t(st)),
      boiler AS (
        SELECT seg FROM segs GROUP BY seg
        HAVING count(DISTINCT doc_id) >= 2),
      marked AS (
        SELECT s.doc_id, s.seg_idx, s.seg, b.seg IS NOT NULL AS is_b
        FROM segs s LEFT JOIN boiler b ON s.seg = b.seg),
      agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
               CAST(sum(CASE WHEN NOT is_b
                             THEN len(string_split(seg, ' ')) ELSE 0 END) AS BIGINT)
                 AS n_kept_words,
               md5(coalesce(string_agg(CASE WHEN NOT is_b THEN seg END, ' '
                                       ORDER BY seg_idx), '')) AS cleaned_hash
        FROM marked
        GROUP BY doc_id)
      SELECT d.doc_id,
             coalesce(a.n_segments, 0) AS n_segments,
             coalesce(a.n_removed, 0) AS n_removed,
             coalesce(a.n_kept_words, 0) AS n_kept_words,
             coalesce(a.cleaned_hash, md5('')) AS cleaned_hash
      FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      ORDER BY d.doc_id""")),
    QueryDef("qn39_weighted_sample", qWeightedSample _, Some("""
      WITH t AS (
        SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS INT) AS toks
        FROM documents),
      keyed AS (
        SELECT doc_id, toks,
               -ln((CAST((doc_id::HUGEINT * 2654435761) % 4294967296 AS DOUBLE) + 1)
                   / 4294967297.0) / CAST(toks AS DOUBLE) AS es_key
        FROM t WHERE toks > 0),
      sel AS (SELECT * FROM keyed ORDER BY es_key, doc_id LIMIT 50)
      SELECT doc_id, toks, round(es_key, 6) AS es_key
      FROM sel ORDER BY doc_id""")),
    QueryDef("qn40_semdedup", qSemDedup _, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_true_pairs,
             true AS recall_ok, true AS sim_exact_ok, true AS precision_ok
      FROM embeddings a, embeddings b
      WHERE a.vec_id < b.vec_id
        AND list_cosine_similarity(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]) >= 0.4""")),
    QueryDef("qn41_exact_substring", qExactSubstring _, Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE trim(text) <> ''),
      sp AS (
        SELECT doc_id, array_to_string(w[i:i+19], ' ') AS s
        FROM toks, unnest(range(1, len(w) - 18)) t(i)),
      shared AS (
        SELECT s FROM sp GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
      hit AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_windows
        FROM sp JOIN shared USING (s) GROUP BY doc_id)
      SELECT t.doc_id,
             CAST(len(t.w) - 19 AS BIGINT) AS n_windows,
             coalesce(h.n_shared_windows, 0) AS n_shared_windows,
             coalesce(h.n_shared_windows, 0) > 0 AS flagged
      FROM toks t LEFT JOIN hit h ON t.doc_id = h.doc_id
      WHERE len(t.w) >= 20
      ORDER BY t.doc_id""")),
    QueryDef("qn42_dsir_score", qDsirScore _, Some("""
      WITH toks AS (
        SELECT doc_id, lang = 'en' AS is_tgt,
               unnest(string_split_regex(trim(text), '\s+')) AS t
        FROM documents WHERE trim(text) <> ''),
      counts AS (
        SELECT t, count(*) AS c_all,
               sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS c_tgt
        FROM toks GROUP BY t),
      tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_all,
                     CAST(sum(c_tgt) AS BIGINT) AS n_tgt,
                     count(*) AS v
              FROM counts),
      lr AS (
        SELECT t, ln((c_tgt + 1.0) / (n_tgt + v))
                  - ln((c_all + 1.0) / (n_all + v)) AS lrv
        FROM counts, tot)
      SELECT toks.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             round(sum(lr.lrv), 4) AS score
      FROM toks JOIN lr ON toks.t = lr.t
      GROUP BY toks.doc_id
      ORDER BY toks.doc_id""")),
    QueryDef("qn43_decontaminate_spans", qDecontaminateSpans _, Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE trim(text) <> ''),
      bench AS (
        SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS s
        FROM toks, unnest(range(1, len(w) - 1)) t(i)
        WHERE doc_id % 50 = 3),
      corp AS (SELECT doc_id, w FROM toks WHERE doc_id % 50 <> 3),
      wins AS (
        SELECT doc_id, i, array_to_string(w[i:i+2], ' ') AS s
        FROM corp, unnest(range(1, len(w) - 1)) t(i)),
      cov AS (
        SELECT DISTINCT wins.doc_id, j AS p
        FROM wins JOIN bench USING (s), unnest(range(wins.i, wins.i + 3)) u(j)),
      tokpos AS (
        SELECT doc_id, p, w[CAST(p AS INT)] AS tok
        FROM corp, unnest(range(1, len(w) + 1)) t(p)),
      agg AS (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN c.p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_removed_tokens,
               md5(coalesce(string_agg(CASE WHEN c.p IS NULL THEN t.tok END, ' '
                                       ORDER BY t.p), '')) AS cleaned_hash
        FROM tokpos t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
        GROUP BY t.doc_id)
      SELECT d.doc_id,
             coalesce(a.n_tokens, 0) AS n_tokens,
             coalesce(a.n_removed_tokens, 0) AS n_removed_tokens,
             coalesce(a.cleaned_hash, md5('')) AS cleaned_hash
      FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      WHERE d.doc_id % 50 <> 3
      ORDER BY d.doc_id""")),
    QueryDef("qn44_temperature_mix", qTemperatureMix _, Some("""
      WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      z AS (SELECT sum(pow(n, 0.7)) AS z FROM c),
      r AS (SELECT lang, round(least(1.0, 200 * pow(n, 0.7) / z / n), 6) AS rate
            FROM c, z),
      sel AS (
        SELECT d.lang, r.rate
        FROM documents d JOIN r USING (lang)
        WHERE CAST((d.doc_id::HUGEINT * 2654435761) % 4294967296 AS DOUBLE)
              < r.rate * 4294967296.0)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
             round(rate, 6) AS rate
      FROM sel GROUP BY lang, rate ORDER BY lang""")),
    QueryDef("qn45_lm_fluency", qLmFluency _, Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE trim(text) <> ''),
      lmt AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
      uni AS (
        SELECT tok AS w2, count(*) AS cu
        FROM (SELECT unnest(w) AS tok FROM lmt) GROUP BY tok),
      n AS (SELECT sum(cu) AS n FROM uni),
      bi AS (
        SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS cb
        FROM lmt, unnest(range(1, len(w))) t(i)
        GROUP BY 1, 2),
      lft AS (SELECT w1, sum(cb) AS cl FROM bi GROUP BY w1),
      big AS (
        SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        FROM toks, unnest(range(1, len(w))) t(i)
        WHERE doc_id % 2 = 1),
      p AS (
        SELECT g.doc_id,
               CASE
                 WHEN b.cb IS NOT NULL THEN b.cb * 1.0 / l.cl
                 WHEN 0.4 * coalesce(u.cu, 0) / n.n > 0
                   THEN 0.4 * coalesce(u.cu, 0) / n.n
                 ELSE 0.4 / (n.n + 1)
               END AS pr
        FROM big g
        LEFT JOIN bi b ON g.w1 = b.w1 AND g.w2 = b.w2
        LEFT JOIN lft l ON g.w1 = l.w1
        LEFT JOIN uni u ON g.w2 = u.w2
        CROSS JOIN n)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             round(sum(log10(pr)) / count(*), 4) AS score
      FROM p
      GROUP BY doc_id
      ORDER BY doc_id""")),
    QueryDef("qn46_dedup_keep_best", qDedupKeepBest _, Some("""
      WITH RECURSIVE
      toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
               FROM documents WHERE trim(text) <> ''),
      sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
              FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      sh AS (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      qpairs AS (SELECT doc_a, doc_b FROM prs
                 JOIN counts na ON doc_a = na.doc_id
                 JOIN counts nb ON doc_b = nb.doc_id
                 WHERE common / (na.n_sh + nb.n_sh - common) >= 0.8),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM qpairs
                UNION SELECT doc_b, doc_a FROM qpairs),
      reach(u, v) AS (SELECT u, v FROM edges
                      UNION
                      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS node, least(u, min(v)) AS component
               FROM reach GROUP BY u),
      ranked AS (SELECT c.node,
                        row_number() OVER (PARTITION BY c.component
                                           ORDER BY d.n_chars DESC, c.node ASC) AS rk
                 FROM comp c JOIN documents d ON d.doc_id = c.node)
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT node FROM ranked WHERE rk > 1)
      ORDER BY doc_id""")),
    QueryDef("qn47_hash_split", qHashSplit _, Some("""
      WITH b AS (
        SELECT source, n_chars,
               substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 4) AS bk
        FROM documents),
      s AS (SELECT source,
                   CASE WHEN bk < 'cccc' THEN 'train'
                        WHEN bk < 'e666' THEN 'val'
                        ELSE 'test' END AS split,
                   n_chars
            FROM b)
      SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM s
      GROUP BY source, split
      ORDER BY source, split""")),
    QueryDef("qn48_source_quantile", qSourceQuantile _, Some("""
      SELECT doc_id, source,
             round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 6)
               AS q_rank
      FROM documents
      ORDER BY doc_id""")),
    QueryDef("qn49_cross_corpus_neardup", qCrossCorpusNearDup _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
               FROM documents WHERE trim(text) <> ''),
      sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
              FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      sh AS (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      cut AS (SELECT count(*) // 2 AS c FROM documents),
      t AS (SELECT * FROM sh WHERE doc_id >= (SELECT c FROM cut)),
      r AS (SELECT * FROM sh WHERE doc_id < (SELECT c FROM cut)),
      tc AS (SELECT doc_id, count(*) AS n_sh FROM t GROUP BY doc_id),
      rc AS (SELECT doc_id, count(*) AS n_sh FROM r GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS target_id, b.doc_id AS ref_id,
                     count(*) AS common
              FROM t a JOIN r b ON a.s = b.s GROUP BY 1, 2)
      SELECT target_id, ref_id,
             round(common * 1.0 / (tc.n_sh + rc.n_sh - common), 4) AS jaccard
      FROM prs
      JOIN tc ON target_id = tc.doc_id
      JOIN rc ON ref_id = rc.doc_id
      WHERE common * 1.0 / (tc.n_sh + rc.n_sh - common) >= 0.8
      ORDER BY target_id, ref_id""")),
    QueryDef("qn50_dup_cluster_stats", qDupClusterStats _, Some("""
      WITH RECURSIVE
      toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
               FROM documents WHERE trim(text) <> ''),
      sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
              FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      sh AS (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      qpairs AS (SELECT doc_a, doc_b FROM prs
                 JOIN counts na ON doc_a = na.doc_id
                 JOIN counts nb ON doc_b = nb.doc_id
                 WHERE common / (na.n_sh + nb.n_sh - common) >= 0.8),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM qpairs
                UNION SELECT doc_b, doc_a FROM qpairs),
      reach(u, v) AS (SELECT u, v FROM edges
                      UNION
                      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comp AS (SELECT u AS node, least(u, min(v)) AS component
               FROM reach GROUP BY u),
      sizes AS (SELECT component, count(*) AS cluster_size
                FROM comp GROUP BY component)
      SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(count(*) * cluster_size AS BIGINT) AS n_docs
      FROM sizes
      GROUP BY cluster_size
      ORDER BY cluster_size""")),
    QueryDef("qn51_dedup_spans", qDedupSpans _, Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE trim(text) <> ''),
      wins AS (
        SELECT doc_id, i, array_to_string(w[i:i+19], ' ') AS g
        FROM toks, unnest(range(1, len(w) - 18)) t(i)),
      firstdoc AS (SELECT g, min(doc_id) AS first_doc FROM wins GROUP BY g),
      cov AS (
        SELECT DISTINCT wins.doc_id, j AS p
        FROM wins JOIN firstdoc USING (g), unnest(range(wins.i, wins.i + 20)) u(j)
        WHERE wins.doc_id > firstdoc.first_doc),
      tokpos AS (
        SELECT doc_id, p, w[CAST(p AS INT)] AS tok
        FROM toks, unnest(range(1, len(w) + 1)) t(p)),
      agg AS (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN c.p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_removed_tokens,
               md5(coalesce(string_agg(CASE WHEN c.p IS NULL THEN t.tok END, ' '
                                       ORDER BY t.p), '')) AS cleaned_hash
        FROM tokpos t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
        GROUP BY t.doc_id)
      SELECT d.doc_id,
             coalesce(a.n_tokens, 0) AS n_tokens,
             coalesce(a.n_removed_tokens, 0) AS n_removed_tokens,
             coalesce(a.cleaned_hash, md5('')) AS cleaned_hash
      FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      ORDER BY d.doc_id""")),
    QueryDef("qn52_semantic_decontam", qSemanticDecontam _, Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c AS (SELECT count(*) // 2 AS cut FROM e)
      SELECT a.vec_id AS target_id, b.vec_id AS ref_id,
             round(list_cosine_similarity(a.v, b.v), 6) AS sim
      FROM e a, e b
      WHERE a.vec_id >= (SELECT cut FROM c)
        AND b.vec_id < (SELECT cut FROM c)
        AND list_cosine_similarity(a.v, b.v) >= 0.4
      ORDER BY target_id, ref_id""")),
    QueryDef("qn53_source_cap", qSourceCap _, Some("""
      SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
               row_number() OVER (
                 PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents)
      WHERE rn <= 8
      ORDER BY doc_id""")),
    QueryDef("qn54_source_overlap", qSourceOverlap _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents),
      sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
              FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      sh AS (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      p AS (SELECT doc_a, doc_b FROM prs
            JOIN counts na ON doc_a = na.doc_id
            JOIN counts nb ON doc_b = nb.doc_id
            WHERE common / (na.n_sh + nb.n_sh - common) >= 0.8)
      SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM p
      JOIN documents da ON p.doc_a = da.doc_id
      JOIN documents db ON p.doc_b = db.doc_id
      GROUP BY 1, 2
      ORDER BY 1, 2""")),
    QueryDef("qn55_label_cohesion", qLabelCohesion _, Some("""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      pos AS (SELECT label, i, v[CAST(i AS INT)] AS x
              FROM e, unnest(range(1, len(v) + 1)) t(i)),
      cent AS (SELECT label, list(cx ORDER BY i) AS c
               FROM (SELECT label, i, avg(x) AS cx FROM pos GROUP BY label, i)
               GROUP BY label),
      cos AS (SELECT e.label, list_cosine_similarity(e.v, cent.c) AS cos
              FROM e JOIN cent USING (label))
      SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
             round(avg(cos), 4) AS avg_cos,
             round(min(cos), 4) AS min_cos,
             round(max(cos), 4) AS max_cos
      FROM cos GROUP BY label ORDER BY label""")),
    QueryDef("qn56_source_drift", qSourceDrift _, Some("""
      WITH e AS (SELECT d.source AS grp, em.embedding::DOUBLE[] AS v
                 FROM documents d JOIN embeddings em ON d.doc_id = em.vec_id),
      cnt AS (SELECT grp, count(*) AS n FROM e GROUP BY grp),
      pos AS (SELECT grp, i, v[CAST(i AS INT)] AS x
              FROM e, unnest(range(1, len(v) + 1)) t(i)),
      cent AS (SELECT grp, list(cx ORDER BY i) AS c
               FROM (SELECT grp, i, avg(x) AS cx FROM pos GROUP BY grp, i)
               GROUP BY grp)
      SELECT a.grp AS source_a, b.grp AS source_b,
             CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
             round(list_cosine_similarity(a.c, b.c), 4) AS centroid_cos
      FROM cent a JOIN cent b ON a.grp < b.grp
      JOIN cnt na ON na.grp = a.grp JOIN cnt nb ON nb.grp = b.grp
      ORDER BY source_a, source_b""")),
    QueryDef("qn57_decontaminate_normalized", qDecontaminateNormalized _, Some("""
      WITH bench AS (
        SELECT '  ' || upper(text) || ' !!! ' AS btext
        FROM documents WHERE doc_id % 50 = 3),
      bh AS (SELECT DISTINCT md5(trim(regexp_replace(regexp_replace(
               lower(btext), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS h
             FROM bench),
      n AS (SELECT doc_id,
              md5(trim(regexp_replace(regexp_replace(
                lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS h
            FROM documents)
      SELECT doc_id, h AS norm_hash FROM n
      WHERE h IN (SELECT h FROM bh)
      ORDER BY doc_id""")),
    QueryDef("qn58_token_entropy", qTokenEntropy _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents WHERE trim(text) <> ''),
      t AS (SELECT doc_id, unnest(w) AS tok FROM toks),
      c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
      agg AS (SELECT doc_id, sum(c) AS n, count(*) AS nd,
                     sum(c * ln(CAST(c AS DOUBLE))) AS sumclnc
              FROM c GROUP BY doc_id)
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             CAST(nd AS BIGINT) AS n_distinct,
             round(ln(CAST(n AS DOUBLE)) - sumclnc / n, 4) AS entropy
      FROM agg ORDER BY doc_id""")),
    QueryDef("qn59_tfidf_keywords", qTfidfKeywords _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents WHERE trim(text) <> ''),
      t AS (SELECT doc_id, unnest(w) AS tok FROM toks),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
      dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      n AS (SELECT count(*) AS n_docs FROM toks),
      s AS (SELECT doc_id, tok,
                   tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.df) AS score
            FROM tf JOIN dfq USING (tok), n),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, tok) AS rnk FROM s)
      SELECT doc_id, CAST(rnk AS INT) AS rank, tok AS term,
             round(score, 4) AS score
      FROM r WHERE rnk <= 3 ORDER BY doc_id, rank""")),
    QueryDef("qn60_ngram_novelty", qNgramNovelty _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents WHERE trim(text) <> ''),
      sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
              FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      cut AS (SELECT count(*) // 2 AS c FROM documents),
      t AS (SELECT * FROM sh0 WHERE doc_id >= (SELECT c FROM cut)),
      r AS (SELECT DISTINCT s FROM sh0 WHERE doc_id < (SELECT c FROM cut)),
      j AS (SELECT t.doc_id, CASE WHEN r.s IS NULL THEN 1 ELSE 0 END AS novel
            FROM t LEFT JOIN r ON t.s = r.s)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(novel) AS BIGINT) AS n_novel,
             round(sum(novel) * 1.0 / count(*), 4) AS novelty
      FROM j GROUP BY doc_id ORDER BY doc_id""")),
    QueryDef("qn61_label_outliers", qLabelOutliers _, Some("""
      WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      pos AS (SELECT label, vec_id, i, v[CAST(i AS INT)] AS x
              FROM e, unnest(range(1, len(v) + 1)) t(i)),
      cent AS (SELECT label, list(cx ORDER BY i) AS c
               FROM (SELECT label, i, avg(x) AS cx FROM pos GROUP BY label, i)
               GROUP BY label),
      cos AS (SELECT e.label, e.vec_id, list_cosine_similarity(e.v, cent.c) AS cos
              FROM e JOIN cent USING (label)),
      r AS (SELECT label, vec_id, cos,
                   row_number() OVER (PARTITION BY label ORDER BY cos, vec_id) AS rank
            FROM cos)
      SELECT label, CAST(rank AS INT) AS rank, vec_id, round(cos, 4) AS cos
      FROM r WHERE rank <= 2 ORDER BY label, rank""")),
    QueryDef("qn62_vocab_coverage", qVocabCoverage _, Some("""
      WITH toks AS (SELECT string_split_regex(trim(text), '\s+') AS w
                    FROM documents WHERE trim(text) <> ''),
      t AS (SELECT unnest(w) AS term FROM toks),
      c AS (SELECT term, count(*) AS n FROM t GROUP BY term),
      tot AS (SELECT sum(n) AS total FROM c),
      r AS (SELECT term, n,
                   row_number() OVER (ORDER BY n DESC, term) AS rank,
                   sum(n) OVER (ORDER BY n DESC, term ROWS UNBOUNDED PRECEDING) AS cum_n
            FROM c)
      SELECT CAST(rank AS INT) AS rank, term, CAST(n AS BIGINT) AS n,
             round(n * 1.0 / total, 4) AS share,
             round(cum_n * 1.0 / total, 4) AS cum_share
      FROM r, tot WHERE rank <= 20 ORDER BY rank""")),
    QueryDef("qn63_positive_pairs", qPositivePairs _, Some("""
      WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      p AS (SELECT a.label, a.vec_id AS anchor_id, b.vec_id AS pos_id,
                   list_cosine_similarity(a.v, b.v) AS cos,
                   row_number() OVER (PARTITION BY a.label, a.vec_id
                     ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id) AS rn
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id)
      SELECT label, anchor_id, pos_id, round(cos, 4) AS cos
      FROM p WHERE rn = 1 ORDER BY label, anchor_id""")),
    QueryDef("qn64_bm25_search", qBm25 _, Some("""
      WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                 FROM documents WHERE trim(text) <> ''),
      dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM d),
      stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
      t AS (SELECT doc_id, unnest(w) AS term FROM d),
      tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM t
             WHERE term IN ('vector', 'customer', 'merge') GROUP BY 1, 2),
      dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
      s AS (SELECT tf.doc_id,
                   ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
                     tf * (1.2 + 1.0) /
                     (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS part
            FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), stats),
      sc AS (SELECT doc_id, round(sum(part), 4) AS score FROM s GROUP BY doc_id)
      SELECT doc_id, score FROM sc
      ORDER BY score DESC, doc_id LIMIT 10""")),
    QueryDef("qn65_pmi_collocations", qPmi _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents WHERE trim(text) <> ''),
      big AS (SELECT array_to_string(w[i:i+1], ' ') AS s
              FROM toks, unnest(range(1, len(w))) r(i)),
      bc AS (SELECT s, count(*) AS n_ab FROM big GROUP BY s),
      t AS (SELECT unnest(w) AS t FROM toks),
      uc AS (SELECT t, count(*) AS n_t FROM t GROUP BY t),
      tot AS (SELECT (SELECT CAST(sum(n_ab) AS DOUBLE) FROM bc) AS big_total,
                     (SELECT CAST(sum(n_t) AS DOUBLE) FROM uc) AS tok_total),
      p AS (SELECT s, string_split(s, ' ')[1] AS term_a,
                   string_split(s, ' ')[2] AS term_b, n_ab FROM bc
            WHERE n_ab >= 5),
      sc AS (SELECT p.s, p.term_a, p.term_b, p.n_ab,
                    round(ln((p.n_ab * 1.0 / big_total) /
                      ((a.n_t * 1.0 / tok_total) * (b.n_t * 1.0 / tok_total))), 4)
                      AS pmi
             FROM p JOIN uc a ON p.term_a = a.t JOIN uc b ON p.term_b = b.t, tot)
      SELECT term_a, term_b, CAST(n_ab AS BIGINT) AS n_ab, pmi
      FROM sc ORDER BY pmi DESC, s LIMIT 15""")),
    QueryDef("qn66_dedup_blocking", qBlockingDedup _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents WHERE trim(text) <> ''),
      k AS (SELECT doc_id, array_to_string(w[1:3], ' ') AS bk FROM toks),
      kept AS (SELECT * FROM k WHERE bk <> '' AND bk NOT IN
               (SELECT bk FROM k GROUP BY bk HAVING count(*) > 1000)),
      cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM kept a JOIN kept b ON a.bk = b.bk AND a.doc_id < b.doc_id),
      sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
              FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh0 GROUP BY doc_id),
      com AS (SELECT c.doc_a, c.doc_b, count(*) AS common
              FROM cand c JOIN sh0 a ON a.doc_id = c.doc_a
              JOIN sh0 b ON b.doc_id = c.doc_b AND a.s = b.s
              GROUP BY 1, 2)
      SELECT doc_a, doc_b,
             round(common * 1.0 / (ca.n_sh + cb.n_sh - common), 4) AS jaccard
      FROM com JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
      WHERE common * 1.0 / (ca.n_sh + cb.n_sh - common) >= 0.8
      ORDER BY doc_a, doc_b""")),
    QueryDef("qn67_heavy_hitters", qHeavyHitters _, Some("""
      WITH toks AS (SELECT string_split_regex(trim(text), '\s+') AS w
                    FROM documents WHERE trim(text) <> ''),
      t AS (SELECT unnest(w) AS term FROM toks),
      c AS (SELECT term, count(*) AS n FROM t GROUP BY term)
      SELECT term, CAST(n AS BIGINT) AS n, true AS within_bounds
      FROM c ORDER BY n DESC, term LIMIT 10""")),
    QueryDef("qn68_dedup_containment", qContainment _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents WHERE trim(text) <> ''),
      sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
              FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      sh AS (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
      SELECT doc_a, doc_b,
             round(common * 1.0 / least(ca.n_sh, cb.n_sh), 4) AS containment
      FROM prs JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
      WHERE common * 1.0 / least(ca.n_sh, cb.n_sh) >= 0.9
      ORDER BY doc_a, doc_b""")),
    QueryDef("qn69_knn_label_audit", qKnnAgreement _, Some("""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      a AS (SELECT * FROM e WHERE vec_id % 5 = 0),
      p AS (SELECT a.vec_id AS aid, a.label AS alabel, b.label AS clabel,
                   row_number() OVER (PARTITION BY a.vec_id
                     ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id) AS rn
            FROM a JOIN e b ON a.vec_id <> b.vec_id)
      SELECT alabel AS label, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN alabel = clabel THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree,
             round(sum(CASE WHEN alabel = clabel THEN 1 ELSE 0 END) * 1.0
               / count(*), 4) AS agreement
      FROM p WHERE rn = 1 GROUP BY alabel ORDER BY label""")),
    QueryDef("qn70_modality_coverage", qModalityCoverage _, Some("""
      SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
             CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_vecs,
             CAST((SELECT count(*) FROM documents d WHERE NOT EXISTS
               (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id))
               AS BIGINT) AS docs_without_vec,
             CAST((SELECT count(*) FROM embeddings e WHERE NOT EXISTS
               (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id))
               AS BIGINT) AS vecs_orphaned""")),
    QueryDef("qn71_source_shift", qSourceShift _, Some("""
      WITH cut AS (SELECT count(*) // 2 AS c FROM documents),
      counts AS (SELECT source,
                   sum(CASE WHEN doc_id < (SELECT c FROM cut) THEN 1 ELSE 0 END) AS n_a,
                   sum(CASE WHEN doc_id >= (SELECT c FROM cut) THEN 1 ELSE 0 END) AS n_b
                 FROM documents GROUP BY source),
      tot AS (SELECT CAST(sum(n_a) AS DOUBLE) AS tot_a,
                     CAST(sum(n_b) AS DOUBLE) AS tot_b FROM counts)
      SELECT source, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             round(n_a / tot_a, 4) AS p, round(n_b / tot_b, 4) AS q,
             round(abs(n_a / tot_a - n_b / tot_b) / 2.0, 4) AS tvd_contrib
      FROM counts, tot ORDER BY source""")),
    QueryDef("qn72_hybrid_rrf", qHybridRrf _, Some("""
      WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                 FROM documents WHERE trim(text) <> ''),
      dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM d),
      stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
      t AS (SELECT doc_id, unnest(w) AS term FROM d),
      tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM t
             WHERE term IN ('vector', 'customer', 'merge') GROUP BY 1, 2),
      dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
      sp AS (SELECT tf.doc_id,
                    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
                      tf * (1.2 + 1.0) /
                      (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) AS part
             FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), stats),
      sc AS (SELECT doc_id, round(sum(part), 4) AS score FROM sp GROUP BY doc_id),
      sr AS (SELECT doc_id AS id,
                    row_number() OVER (ORDER BY score DESC, doc_id) AS r
             FROM sc QUALIFY r <= 20),
      q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
      den AS (SELECT e.vec_id AS id,
                     round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6)
                       AS sim
              FROM embeddings e, q WHERE e.vec_id <> 0),
      dr AS (SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS r
             FROM den QUALIFY r <= 20),
      u AS (SELECT id, r FROM sr UNION ALL SELECT id, r FROM dr),
      f AS (SELECT id, CAST(count(*) AS BIGINT) AS n_lists,
                   round(sum(CAST(1.0 AS DOUBLE) / (60 + r)), 6) AS rrf
            FROM u GROUP BY id)
      SELECT id AS doc_id, n_lists, rrf FROM f
      ORDER BY rrf DESC, doc_id LIMIT 10""")),
    QueryDef("qn73_leakage_safe_split", qLeakageSafeSplit _, Some("""
      WITH n AS (SELECT doc_id, source,
                   md5(trim(regexp_replace(regexp_replace(
                     lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS g
                 FROM documents),
      a AS (SELECT g, min(doc_id) AS anchor FROM n GROUP BY g),
      s AS (SELECT n.doc_id, n.source, n.g,
                   substr(md5('graft:' || CAST(a.anchor AS VARCHAR)), 1, 4) AS bk
            FROM n JOIN a USING (g)),
      l AS (SELECT source, g,
                   CASE WHEN bk < 'cccc' THEN 'train'
                        WHEN bk < 'e666' THEN 'val'
                        ELSE 'test' END AS split
            FROM s)
      SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT g) AS BIGINT) AS n_groups
      FROM l GROUP BY 1, 2
      ORDER BY source, split""")),
    QueryDef("qn74_cluster_balance", qClusterBalance _, Some("""
      WITH c AS (
        SELECT CAST(vec_id AS INT) AS cluster_id, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id < 8),
      scored AS (
        SELECT e.vec_id, e.label, c.cluster_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) AS sim
        FROM embeddings e, c),
      best AS (
        SELECT vec_id, label, cluster_id, sim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cluster_id) AS rk
        FROM scored),
      a AS (SELECT * FROM best WHERE rk = 1),
      pl AS (
        SELECT cluster_id, label, count(*) AS cnt,
               sum(CAST(sim AS DECIMAL(18,6))) AS ssim
        FROM a GROUP BY cluster_id, label),
      cl AS (
        SELECT cluster_id, CAST(sum(cnt) AS BIGINT) AS n,
               round(CAST(sum(ssim) AS DOUBLE) / sum(cnt), 4) AS avg_sim
        FROM pl GROUP BY cluster_id),
      top AS (
        SELECT cluster_id, label, cnt,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY cnt DESC, label) AS rk
        FROM pl)
      SELECT cl.cluster_id, cl.n, cl.avg_sim,
             CAST(t.label AS INT) AS top_label,
             round(t.cnt / cl.n, 6) AS top_label_share
      FROM cl JOIN top t ON cl.cluster_id = t.cluster_id AND t.rk = 1
      ORDER BY cl.cluster_id""")),
    QueryDef("qn81_index_append", qIndexAppend _, Some("""
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                 FROM embeddings WHERE vec_id < 8),
      scored AS (SELECT q.query_id, e.vec_id,
                        round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS sim
                 FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      ranked AS (SELECT query_id, vec_id, sim,
                        CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
                 FROM scored)
      SELECT query_id, vec_id, sim, rank FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank""")),
    QueryDef("qn80_audio_fingerprint_dedup", qAudioFingerprintDedup _, Some("""
      SELECT doc_id AS anchor_id,
             CAST(CASE WHEN doc_id % 9 = 3 THEN 2 ELSE 1 END AS BIGINT) AS n_copies,
             CAST(CASE WHEN doc_id % 9 = 3 THEN 2 ELSE 1 END AS BIGINT) AS n_encodings
      FROM documents
      WHERE doc_id < 96 AND doc_id % 9 <> 4
      ORDER BY anchor_id""")),
    QueryDef("qn79_image_phash_neardup", qImagePhashNearDup _, Some("""
      SELECT doc_id - 1 AS doc_a, doc_id AS doc_b, true AS is_planted
      FROM documents
      WHERE doc_id < 96 AND doc_id % 11 = 5
      ORDER BY doc_a, doc_b""")),
    QueryDef("qn78_image_phash_dedup", qImagePhashDedup _, Some("""
      SELECT doc_id AS anchor_id,
             CAST(CASE WHEN doc_id % 7 = 2 THEN 2 ELSE 1 END AS BIGINT) AS n_copies,
             CAST(CASE WHEN doc_id % 7 = 2 THEN 2 ELSE 1 END AS BIGINT) AS n_encodings
      FROM documents
      WHERE doc_id < 96 AND doc_id % 7 <> 3
      ORDER BY anchor_id""")),
    QueryDef("qn77_dataset_card", qDatasetCard _, Some("""
      WITH f AS (
        SELECT doc_id, source, lang,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks,
               md5(trim(regexp_replace(regexp_replace(
                 lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS g,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(regexp_replace(text, '\s+', '', 'g'))
                      * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS awl,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(list_distinct(string_split_regex(trim(text), '\s+')))
                      * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS ttr,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
                               t -> t IN ('the', 'a', 'of', 'and', 'is', 'to')))
                      * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS stopfrac
        FROM documents),
      r AS (
        SELECT doc_id, source, lang, toks, g,
               ((toks BETWEEN 25 AND 100000) AND (awl BETWEEN 3.0 AND 10.0)
                AND ttr >= 0.45 AND stopfrac >= 0.05) AS q
        FROM f),
      a AS (SELECT g, min(doc_id) AS anchor FROM r GROUP BY g)
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS n_tokens,
             round(quantile_cont(toks, 0.5), 1) AS p50_tokens,
             round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) / count(*), 4) AS pct_en,
             round(sum(CASE WHEN r.doc_id <> a.anchor THEN 1 ELSE 0 END) / count(*), 4) AS dup_rate,
             round(sum(CASE WHEN q THEN 1 ELSE 0 END) / count(*), 4) AS quality_pass_rate
      FROM r JOIN a USING (g)
      GROUP BY source
      ORDER BY source""")),
    QueryDef("qn76_index_persist", qIndexPersist _, Some("""
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                 FROM embeddings WHERE vec_id < 8),
      scored AS (SELECT q.query_id, e.vec_id,
                        round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS sim
                 FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      ranked AS (SELECT query_id, vec_id, sim,
                        CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
                 FROM scored)
      SELECT query_id, vec_id, sim, rank FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank""")),
    QueryDef("qn75_embedding_health", qEmbeddingHealth _, Some("""
      WITH f AS (
        SELECT label, len(embedding) AS dim,
               round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS norm,
               len(list_filter(embedding::DOUBLE[], x -> isnan(x))) > 0 AS has_nan
        FROM embeddings)
      SELECT label, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN norm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
             CAST(sum(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
             CAST(min(dim) AS INT) AS min_dim,
             CAST(max(dim) AS INT) AS max_dim,
             round(CAST(sum(CAST(norm AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_norm,
             round(min(norm), 4) AS min_norm,
             round(max(norm), 4) AS max_norm
      FROM f GROUP BY label
      ORDER BY label""")),
    QueryDef("qn82_topgram_fraction", qTopNgramFraction _, Some("""
      WITH w AS (
        SELECT doc_id,
               string_split_regex(trim(text), '\s+') AS ws,
               CAST(len(regexp_replace(text, '\s+', '', 'g')) AS INT) AS doc_chars
        FROM documents WHERE len(trim(text)) > 0),
      g AS (
        SELECT doc_id, doc_chars, array_to_string(ws[i:i+1], ' ') AS gram
        FROM w, unnest(range(1, len(ws))) r(i)
        WHERE len(ws) >= 2),
      c AS (
        SELECT doc_id, doc_chars, gram, CAST(count(*) AS BIGINT) AS cnt
        FROM g GROUP BY doc_id, doc_chars, gram),
      top AS (
        SELECT doc_id, doc_chars, gram, cnt,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, gram) AS rk
        FROM c)
      SELECT doc_id, gram AS top_gram, cnt AS gram_count,
             CAST(cnt * len(replace(gram, ' ', '')) AS BIGINT) AS covered_chars,
             doc_chars,
             round(least(1.0, CAST(cnt * len(replace(gram, ' ', '')) AS DOUBLE)
                               / doc_chars), 4) AS topgram_frac,
             cnt * len(replace(gram, ' ', '')) * 100 > 20 * doc_chars AS repetitive
      FROM top WHERE rk = 1
      ORDER BY doc_id""")),
    QueryDef("qn83_diverse_sample", qDiverseSample _, Some("""
      WITH c AS (
        SELECT CAST(vec_id AS INT) AS cluster_id, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id < 8),
      scored AS (
        SELECT e.vec_id, e.label, c.cluster_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) AS sim
        FROM embeddings e, c),
      best AS (
        SELECT vec_id, label, cluster_id, sim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cluster_id) AS rk
        FROM scored),
      a AS (SELECT vec_id, label, cluster_id, sim FROM best WHERE rk = 1),
      r AS (
        SELECT cluster_id, vec_id, label, sim,
               CAST(row_number() OVER (PARTITION BY cluster_id
                    ORDER BY (vec_id::HUGEINT * 2654435761) % 4294967296, vec_id)
                 AS INT) AS pick_rank
        FROM a)
      SELECT cluster_id, pick_rank, vec_id, CAST(label AS INT) AS label, sim
      FROM r WHERE pick_rank <= 10
      ORDER BY cluster_id, pick_rank""")),
    QueryDef("qn84_video_scene_cuts", qVideoSceneCuts _, Some("""
      SELECT doc_id, CAST(5 * k AS INT) AS cut_frame
      FROM documents, unnest(range(1, 2 + doc_id % 3)) t(k)
      WHERE doc_id < 48
      ORDER BY doc_id, cut_frame""")),
    QueryDef("qn85_video_shot_sampling", qVideoShotSampling _, Some("""
      SELECT doc_id, CAST(k AS INT) AS shot_id, CAST(5 * k AS INT) AS rep_frame,
             CAST(5 AS BIGINT) AS n_frames
      FROM documents, unnest(range(0, 2 + doc_id % 3)) t(k)
      WHERE doc_id < 48
      ORDER BY doc_id, shot_id""")),
    QueryDef("qn86_zipf_slope", qZipfSlope _, Some("""
      WITH tok AS (
        SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
        FROM documents WHERE len(trim(text)) > 0),
      c AS (SELECT source, t, CAST(count(*) AS BIGINT) AS cnt
            FROM tok GROUP BY source, t),
      r AS (SELECT source, cnt,
              CAST(row_number() OVER (PARTITION BY source
                   ORDER BY cnt DESC, t) AS BIGINT) AS rank
            FROM c),
      s AS (SELECT source,
              count(*) AS n_vocab,
              sum(cnt) AS n_tokens,
              sum(CAST(round(ln(rank), 8) AS DECIMAL(18,8))) AS sx,
              sum(CAST(round(ln(cnt), 8) AS DECIMAL(18,8))) AS sy,
              sum(CAST(round(ln(rank), 8) AS DECIMAL(18,8))
                  * CAST(round(ln(cnt), 8) AS DECIMAL(18,8))) AS sxy,
              sum(CAST(round(ln(rank), 8) AS DECIMAL(18,8))
                  * CAST(round(ln(rank), 8) AS DECIMAL(18,8))) AS sxx,
              CAST(count(*) AS DOUBLE) AS n
            FROM r GROUP BY source)
      SELECT source, CAST(n_vocab AS BIGINT) AS n_vocab,
             CAST(n_tokens AS BIGINT) AS n_tokens,
             round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / nullif(n * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0),
                   6) AS zipf_slope
      FROM s
      ORDER BY source""")),
    QueryDef("qn87_matryoshka_audit", qMatryoshkaAudit _, Some("""
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                 FROM embeddings WHERE vec_id < 8),
      c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      f AS (SELECT q.query_id, c.vec_id,
              round(list_cosine_similarity(q.qv, c.v), 6) AS sim
            FROM c, q WHERE c.vec_id <> q.query_id),
      fr AS (SELECT query_id, vec_id, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rk
             FROM f),
      p AS (SELECT q.query_id, c.vec_id,
              round(list_cosine_similarity(q.qv[1:4], c.v[1:4]), 6) AS sim
            FROM c, q WHERE c.vec_id <> q.query_id),
      pr AS (SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rk
             FROM p),
      ov AS (SELECT fr.query_id, CAST(count(*) AS BIGINT) AS n_overlap
             FROM fr JOIN pr ON fr.query_id = pr.query_id
                            AND fr.vec_id = pr.vec_id
             WHERE fr.rk <= 5 AND pr.rk <= 5
             GROUP BY fr.query_id)
      SELECT fr.query_id, coalesce(ov.n_overlap, 0) AS n_overlap,
             fr.vec_id AS top1_full, pr.vec_id AS top1_prefix,
             fr.sim AS top1_sim
      FROM fr
      JOIN pr ON fr.query_id = pr.query_id AND pr.rk = 1
      LEFT JOIN ov ON fr.query_id = ov.query_id
      WHERE fr.rk = 1
      ORDER BY fr.query_id""")),
    QueryDef("qn88_image_thumbnail", qImageThumbnails _, Some("""
      WITH g AS (
        SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id * 3) % 9 AS h
        FROM documents WHERE doc_id < 64),
      px AS (
        SELECT g.doc_id, g.w, g.h, xx.x, yy.y
        FROM g, unnest(range(0, 8)) xx(x), unnest(range(0, 8)) yy(y))
      SELECT doc_id,
             CAST(sum(((doc_id * 131 + ((y * h) // 8) * w + ((x * w) // 8) * 7) % 251)
                 * (y * 8 + x + 1)) AS BIGINT) AS thumb_checksum
      FROM px
      GROUP BY doc_id
      ORDER BY doc_id""")),
    QueryDef("qn91_source_jsd", qSourceJsd _, Some("""
      WITH tok AS (
        SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
        FROM documents WHERE len(trim(text)) > 0),
      c AS (SELECT source, t, count(*) AS cnt FROM tok GROUP BY source, t),
      tot AS (SELECT source, sum(cnt) AS tot FROM c GROUP BY source),
      dist AS (SELECT c.source, c.t, c.cnt * 1.0 / tot.tot AS p
               FROM c JOIN tot USING (source)),
      pairs AS (SELECT a.source AS sa, b.source AS sb
                FROM tot a, tot b WHERE a.source < b.source),
      sides AS (
        SELECT p2.sa, p2.sb, d.t, d.p AS pa, 0.0 AS pb
        FROM dist d JOIN pairs p2 ON d.source = p2.sa
        UNION ALL
        SELECT p2.sa, p2.sb, d.t, 0.0 AS pa, d.p AS pb
        FROM dist d JOIN pairs p2 ON d.source = p2.sb),
      m AS (SELECT sa, sb, t, sum(pa) AS p, sum(pb) AS q
            FROM sides GROUP BY sa, sb, t),
      terms AS (
        SELECT sa, sb,
               CAST(round(
                 CASE WHEN p > 0 THEN p * ln(2 * p / (p + q)) * 0.5 ELSE 0 END +
                 CASE WHEN q > 0 THEN q * ln(2 * q / (p + q)) * 0.5 ELSE 0 END,
                 8) AS DECIMAL(18,8)) AS c
        FROM m)
      SELECT sa AS source_a, sb AS source_b,
             CAST(count(*) AS BIGINT) AS n_terms,
             round(CAST(sum(c) AS DOUBLE), 6) AS jsd
      FROM terms
      GROUP BY sa, sb
      ORDER BY source_a, source_b""")),
    QueryDef("qn93_audio_resample", qAudioResample _, Some("""
      WITH g AS (
        SELECT doc_id, 1000 + (doc_id % 7) * 300 AS n, 2 + doc_id % 3 AS k
        FROM documents WHERE doc_id < 96),
      j AS (
        SELECT doc_id, n, k, jj.j
        FROM g, unnest(range(0, (n - 1) // k + 1)) jj(j))
      SELECT doc_id,
             CAST((n - 1) // k + 1 AS BIGINT) AS n_out,
             CAST(sum(((doc_id * 131 + (j * k) * 7) % 4001 - 2000) * (j + 1))
               AS BIGINT) AS checksum
      FROM j GROUP BY doc_id, n, k
      ORDER BY doc_id""")),
    QueryDef("qn96_curriculum_shards", qCurriculumShards _, Some("""
      WITH f AS (
        SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE least(len(string_split_regex(trim(text), '\s+')) / 50.0, 1.0) * 0.4
                       + (len(list_distinct(string_split_regex(trim(text), '\s+')))
                          / len(string_split_regex(trim(text), '\s+'))) * 0.3
                       + least((len(regexp_replace(text, '\s+', '', 'g'))
                          / len(string_split_regex(trim(text), '\s+'))) / 8.0, 1.0) * 0.3
               END AS q
        FROM documents),
      k AS (
        SELECT doc_id, toks, q,
               least(greatest(CAST(floor((1.0 - q) * 1048576.0) AS BIGINT), 0), 1048575)
                 AS okey
        FROM f),
      w AS (
        SELECT doc_id, toks, q,
               coalesce(sum(toks) OVER (ORDER BY okey, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        FROM k),
      tot AS (SELECT greatest(1, (sum(toks) + 3) // 4) AS target FROM f),
      s AS (
        SELECT doc_id, toks, q,
               least(prior // target, 3) AS shard_id
        FROM w, tot)
      SELECT CAST(shard_id AS INT) AS shard_id,
             count(*) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS shard_tokens,
             round(CAST(sum(CAST(round(q, 6) AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*), 4) AS avg_quality
      FROM s GROUP BY shard_id
      ORDER BY shard_id""")),
    QueryDef("qn95_incremental_card", qIncrementalCard _, Some("""
      WITH f AS (
        SELECT source, lang,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS toks,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(regexp_replace(text, '\s+', '', 'g'))
                      * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS awl,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(list_distinct(string_split_regex(trim(text), '\s+')))
                      * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS ttr,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
                               t -> t IN ('the', 'a', 'of', 'and', 'is', 'to')))
                      * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS stopfrac
        FROM documents)
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
             CAST(sum(CASE WHEN (toks BETWEEN 25 AND 100000)
                            AND (awl BETWEEN 3.0 AND 10.0)
                            AND ttr >= 0.45 AND stopfrac >= 0.05
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_pass
      FROM f
      GROUP BY source
      ORDER BY source""")),
    QueryDef("qn94_bpe_pair_counts", qBpePairCounts _, Some("""
      WITH w AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE len(trim(text)) > 0),
      p AS (
        SELECT substr(w.w, ii.i, 2) AS pair
        FROM w, unnest(range(1, len(w.w))) ii(i)
        WHERE len(w.w) >= 2)
      SELECT pair, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY pair
      ORDER BY n DESC, pair
      LIMIT 20""")),
    QueryDef("qn92_epoch_shuffle", qEpochShuffle _, Some("""
      WITH e AS (SELECT 0 AS epoch UNION ALL SELECT 1 AS epoch),
      r AS (
        SELECT e.epoch, d.doc_id,
               CAST(row_number() OVER (PARTITION BY e.epoch
                 ORDER BY ((d.doc_id::HUGEINT + e.epoch * 2654435769) * 2654435761)
                          % 4294967296, d.doc_id) AS INT) AS pos
        FROM documents d, e)
      SELECT epoch, pos, doc_id
      FROM r WHERE pos <= 10
      ORDER BY epoch, pos""")),
    QueryDef("qn89_audio_silence", qAudioSilence _, Some("""
      SELECT doc_id, CAST(3 AS INT) AS start_window,
             CAST(1 + doc_id % 3 AS BIGINT) AS n_windows
      FROM documents WHERE doc_id < 96
      UNION ALL
      SELECT doc_id, CAST(9 AS INT) AS start_window, CAST(1 AS BIGINT) AS n_windows
      FROM documents WHERE doc_id < 96 AND doc_id % 2 = 0
      ORDER BY doc_id, start_window""")),
    QueryDef("qn90_cluster_topics", qClusterTopics _, Some("""
      WITH c AS (
        SELECT CAST(vec_id AS INT) AS cluster_id, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id < 8),
      scored AS (
        SELECT e.vec_id, c.cluster_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) AS sim
        FROM embeddings e, c),
      best AS (
        SELECT vec_id, cluster_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, cluster_id) AS rk
        FROM scored),
      a AS (SELECT vec_id, cluster_id FROM best WHERE rk = 1),
      terms AS (
        SELECT a.cluster_id,
               unnest(string_split_regex(trim(d.text), '\s+')) AS term
        FROM a JOIN documents d ON a.vec_id = d.doc_id
        WHERE len(trim(d.text)) > 0),
      tf AS (
        SELECT cluster_id, term, CAST(count(*) AS BIGINT) AS n
        FROM terms
        WHERE term NOT IN ('the', 'a', 'of', 'and', 'is', 'to')
        GROUP BY cluster_id, term),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      sc AS (
        SELECT tf.cluster_id, tf.term, tf.n,
               round(tf.n * ln(8.0 / df.df), 4) AS score
        FROM tf JOIN df USING (term)),
      r AS (
        SELECT cluster_id, term, n, score,
               CAST(row_number() OVER (PARTITION BY cluster_id
                    ORDER BY score DESC, term) AS INT) AS rank
        FROM sc)
      SELECT cluster_id, rank, term, n, score
      FROM r WHERE rank <= 3
      ORDER BY cluster_id, rank""")),
    QueryDef("qn97_positive_pairs_routed", qPositivePairsRouted _, Some("""
      WITH c AS (SELECT label, count(*) AS m FROM embeddings GROUP BY label)
      SELECT CAST(coalesce(sum(CASE WHEN m >= 2 THEN m ELSE 0 END), 0)
               AS BIGINT) AS n_anchors,
             true AS coverage_ok, true AS id_recall_ok,
             true AS cos_sound_ok
      FROM c""")),
    QueryDef("qn98_knn_audit_routed", qKnnAgreementRouted _, Some("""
      SELECT label, CAST(count(*) AS BIGINT) AS n,
             true AS n_ok, true AS agreement_close_ok
      FROM embeddings WHERE vec_id % 5 = 0
      GROUP BY label ORDER BY label""")),
    QueryDef("qn99_semdedup_hier", qSemDedupHier _, Some("""
      WITH truth AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]) >= 0.4)
      SELECT count(*) AS n_true_pairs, true AS recall_ok,
             true AS sim_exact_ok, true AS precision_ok
      FROM truth""")),
    QueryDef("qn100_bpe_merge_loop", qBpeMergeLoop _, Some(bpeLoopOracle(10))),
    QueryDef("qn103_bpe_tokenize", qBpeTokenize _, Some(bpeTokenizeOracle(10))),
    QueryDef("qn102_index_churn", qIndexChurn _, Some("""
      WITH live AS (
        SELECT vec_id,
               CASE WHEN vec_id % 10 = 0
                    THEN list_reverse(embedding::DOUBLE[])
                    ELSE embedding::DOUBLE[] END AS v
        FROM embeddings WHERE vec_id % 17 <> 0),
      q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id < 8),
      scored AS (SELECT q.query_id, l.vec_id,
                        round(list_cosine_similarity(q.qv, l.v), 6) AS sim
                 FROM live l, q WHERE l.vec_id <> q.query_id),
      ranked AS (SELECT query_id, vec_id, sim,
                        CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
                 FROM scored)
      SELECT query_id, vec_id, sim, rank FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank""")),
    QueryDef("qn101_corpus_build", qCorpusBuild _, Some(corpusBuildOracle)),
    QueryDef("qn104_corpus_build_stored", qCorpusBuildStored _, Some(corpusBuildOracle)),
    QueryDef("qn105_learned_quality", qLearnedQuality _, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN (toks BETWEEN 25 AND 100000)
                            AND (awl BETWEEN 3.0 AND 10.0)
                            AND (ttr >= 0.45) AND (stopfrac >= 0.05)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_rule_keep,
             true AS auc_ok, true AS balacc_ok
      FROM (
        SELECT CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS toks,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(regexp_replace(text, '\s+', '', 'g'))
                      * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS awl,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(list_distinct(string_split_regex(trim(text), '\s+')))
                      * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS ttr,
               CASE WHEN trim(text) = '' THEN 0.0
                    ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
                               t -> t IN ('the', 'a', 'of', 'and', 'is', 'to')))
                      * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS stopfrac
        FROM documents WHERE doc_id % 2 = 1) f""")),
    QueryDef("qn106_tokenizer_store", qTokenizerStore _, Some(bpeTokenizeOracle(
      10, ", true AS rollback_ok, true AS last_superseded_ok"))),
    QueryDef("qn107_quality_model_store", qQualityModelStore _, Some("""
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             true AS stored_eq_fresh, true AS rollback_ok,
             true AS last_superseded_ok
      FROM documents WHERE doc_id % 2 = 1
      GROUP BY source ORDER BY source""")),
    QueryDef("qn108_pq_codebook_store", qPqCodebookStore _, Some("""
      SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS k_exact,
             true AS returned_ok, true AS recall_ok,
             true AS encode_eq_fresh, true AS rollback_ok,
             true AS last_superseded_ok
      FROM embeddings WHERE vec_id < 8
      ORDER BY query_id""")),
    QueryDef("qn109_decontam_stored_ref", qDecontamStoredRef _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
               FROM documents WHERE trim(text) <> ''),
      sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
              FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      sh AS (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      cut AS (SELECT count(*) // 2 AS c FROM documents),
      t AS (SELECT * FROM sh WHERE doc_id >= (SELECT c FROM cut)),
      r AS (SELECT * FROM sh WHERE doc_id < (SELECT c FROM cut)),
      tc AS (SELECT doc_id, count(*) AS n_sh FROM t GROUP BY doc_id),
      rc AS (SELECT doc_id, count(*) AS n_sh FROM r GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS target_id, b.doc_id AS ref_id,
                     count(*) AS common
              FROM t a JOIN r b ON a.s = b.s GROUP BY 1, 2)
      SELECT target_id, ref_id,
             round(common * 1.0 / (tc.n_sh + rc.n_sh - common), 4) AS jaccard,
             true AS rollback_ok, true AS last_superseded_ok
      FROM prs
      JOIN tc ON target_id = tc.doc_id
      JOIN rc ON ref_id = rc.doc_id
      WHERE common * 1.0 / (tc.n_sh + rc.n_sh - common) >= 0.8
      ORDER BY target_id, ref_id""")),
    QueryDef("qn110_corpus_build_incremental", qCorpusBuildIncremental _,
      Some(incrementalBuildOracle)),
    QueryDef("qn114_corpus_build_compacted", qCorpusBuildCompacted _,
      Some(incrementalBuildOracle)),
    QueryDef("qn111_filter_funnel", qFilterFunnel _, Some("""
      WITH RECURSIVE corpus AS MATERIALIZED (
        SELECT doc_id, source, text FROM documents WHERE doc_id % 50 <> 3),
      bench AS MATERIALIZED (
        SELECT DISTINCT array_to_string(w[i:i+2], ' ') AS s
        FROM (SELECT string_split_regex(trim(text), '\s+') AS w
              FROM documents WHERE doc_id % 50 = 3 AND trim(text) <> '') bt,
             unnest(range(1, len(w) - 1)) r(i)),
      staged AS MATERIALIZED (
        SELECT doc_id, source, toks,
               CASE WHEN NOT (toks BETWEEN 25 AND 100000) THEN 'quality_length'
                    WHEN NOT (awl BETWEEN 3.0 AND 10.0) THEN 'quality_wordshape'
                    WHEN ttr < 0.45 THEN 'quality_repetition'
                    WHEN stopfrac < 0.05 THEN 'quality_stopword'
                    END AS qstage
        FROM (
          -- coalesce(text, '') : NULL text is empty text (rejectionFunnel's
          -- documented null handling) — without it trim(NULL)='' is NULL,
          -- every CASE arm nulls out and a null-text doc would slip
          -- through to 'kept' instead of quality_length.
          SELECT doc_id, source,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END AS toks,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN 0.0
                      ELSE len(regexp_replace(text, '\s+', '', 'g'))
                        * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS awl,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN 0.0
                      ELSE len(list_distinct(string_split_regex(trim(text), '\s+')))
                        * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS ttr,
                 CASE WHEN trim(coalesce(text, '')) = '' THEN 0.0
                      ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
                                 t -> t IN ('the', 'a', 'of', 'and', 'is', 'to')))
                        * 1.0 / len(string_split_regex(trim(text), '\s+')) END AS stopfrac
          FROM corpus) f),
      q AS MATERIALIZED (
        SELECT c.doc_id, c.text FROM corpus c
        JOIN staged st ON c.doc_id = st.doc_id WHERE st.qstage IS NULL),
      sh0 AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
              FROM q WHERE trim(text) <> '') qt,
             unnest(range(1, len(w) - 1)) r(i)),
      sh AS MATERIALIZED (SELECT * FROM sh0 WHERE s NOT IN
             (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000)),
      nsh AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      qpairs AS (SELECT doc_a, doc_b FROM prs
                 JOIN nsh na ON doc_a = na.doc_id
                 JOIN nsh nb ON doc_b = nb.doc_id
                 WHERE common / (na.n_sh + nb.n_sh - common) >= 0.8),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM qpairs
                UNION SELECT doc_b, doc_a FROM qpairs),
      reach(u, v) AS (SELECT u, v FROM edges
                      UNION
                      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      losers AS MATERIALIZED (
        SELECT u AS doc_id FROM (SELECT u, least(u, min(v)) AS component
                                 FROM reach GROUP BY u) c
        WHERE u <> component),
      cont AS MATERIALIZED (
        SELECT DISTINCT c.doc_id FROM (
          SELECT dt.doc_id, array_to_string(w[i:i+2], ' ') AS s
          FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                FROM q WHERE trim(text) <> ''
                  AND doc_id NOT IN (SELECT doc_id FROM losers)) dt,
               unnest(range(1, len(w) - 1)) r(i)) c
        JOIN bench b ON c.s = b.s),
      final AS (
        SELECT source,
               coalesce(qstage,
                 CASE WHEN doc_id IN (SELECT doc_id FROM losers) THEN 'dedup'
                      WHEN doc_id IN (SELECT doc_id FROM cont) THEN 'decontam'
                      ELSE 'kept' END) AS stage,
               toks
        FROM staged)
      SELECT source, stage, count(*) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS n_tokens
      FROM final GROUP BY 1, 2
      ORDER BY source, stage""")),
    QueryDef("qn112_domain_mixture", qDomainMixture _, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST((SELECT count(DISTINCT lang) FROM documents
                   WHERE doc_id % 4 <> 1) AS INT) AS n_lang,
             true AS acc_ok, true AS stored_ok,
             true AS rollback_ok, true AS rebalance_ok
      FROM documents WHERE doc_id % 4 = 1""")),
    QueryDef("qn115_unimax_sample", qUnimaxSample _, Some("""
      WITH RECURSIVE c AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n
        FROM documents WHERE lang IS NOT NULL GROUP BY lang),
      o AS (SELECT lang, n,
              CAST(row_number() OVER (ORDER BY n, lang) AS BIGINT) AS i,
              CAST(count(*) OVER () AS BIGINT) AS k FROM c),
      alloc(i, quota, r) AS (
        SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(700 AS BIGINT)
        UNION ALL
        SELECT o.i,
               least(CAST(floor(o.n * 2.0) AS BIGINT),
                     a.r // (o.k - o.i + 1)),
               a.r - least(CAST(floor(o.n * 2.0) AS BIGINT),
                           a.r // (o.k - o.i + 1))
        FROM alloc a JOIN o ON o.i = a.i + 1),
      q AS (SELECT o.lang, o.n, al.quota
            FROM o JOIN alloc al ON al.i = o.i),
      sel AS (SELECT doc_id, lang,
                CAST(row_number() OVER (PARTITION BY lang
                  ORDER BY CAST((doc_id::HUGEINT * 2654435761) % 4294967296
                           AS BIGINT), doc_id) AS BIGINT) AS rk
              FROM documents WHERE lang IS NOT NULL)
      SELECT s.doc_id, s.lang, q.quota AS ux_quota,
             round(CAST(q.quota AS DOUBLE) / q.n, 4) AS ux_epochs
      FROM sel s JOIN q ON s.lang = q.lang
      WHERE s.rk <= least(q.quota, q.n)
      ORDER BY s.lang, s.doc_id""")),
    QueryDef("qn126_unimax_tokens", qUnimaxTokens _, Some("""
      WITH RECURSIVE c AS (
        SELECT lang,
               CAST(sum(CASE WHEN trim(text) = '' THEN 0
                             ELSE len(string_split_regex(trim(text), '\s+'))
                        END) AS BIGINT) AS n
        FROM documents WHERE lang IS NOT NULL GROUP BY lang),
      o AS (SELECT lang, n,
              CAST(row_number() OVER (ORDER BY n, lang) AS BIGINT) AS i,
              CAST(count(*) OVER () AS BIGINT) AS k FROM c),
      alloc(i, quota, r) AS (
        SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(12000 AS BIGINT)
        UNION ALL
        SELECT o.i,
               least(CAST(floor(o.n * 0.5) AS BIGINT),
                     a.r // (o.k - o.i + 1)),
               a.r - least(CAST(floor(o.n * 0.5) AS BIGINT),
                           a.r // (o.k - o.i + 1))
        FROM alloc a JOIN o ON o.i = a.i + 1),
      q AS (SELECT o.lang, o.n, al.quota
            FROM o JOIN alloc al ON al.i = o.i),
      t AS (SELECT doc_id, lang,
              CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+')) END AS toks,
              CAST((doc_id::HUGEINT * 2654435761) % 4294967296 AS BIGINT) AS pr
            FROM documents WHERE lang IS NOT NULL),
      sel AS (SELECT doc_id, lang, toks,
                coalesce(sum(toks) OVER (PARTITION BY lang ORDER BY pr, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS prior
              FROM t)
      SELECT s.doc_id, s.lang, CAST(s.toks AS INT) AS toks,
             q.quota AS ux_quota,
             CASE WHEN q.n > 0 THEN round(CAST(q.quota AS DOUBLE) / q.n, 4)
                  ELSE 0.0 END AS ux_epochs
      FROM sel s JOIN q ON s.lang = q.lang
      WHERE s.prior < q.quota
      ORDER BY s.lang, s.doc_id""")),
    QueryDef("qn113_bitext_margin", qBitextMargin _, Some("""
      WITH src AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings WHERE vec_id % 2 = 0),
      tgt AS (SELECT vec_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id % 2 = 1),
      fwd0 AS (SELECT s.vec_id AS query_id, t.vec_id AS vec_id,
                      round(list_cosine_similarity(s.v, t.v), 6) AS sim
               FROM src s, tgt t),
      fwd AS (SELECT query_id, vec_id, sim FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY sim DESC, vec_id) AS rk FROM fwd0) WHERE rk <= 4),
      bwd0 AS (SELECT t.vec_id AS query_id, s.vec_id AS vec_id,
                      round(list_cosine_similarity(t.v, s.v), 6) AS sim
               FROM tgt t, src s),
      bwd AS (SELECT query_id, vec_id, sim FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY sim DESC, vec_id) AS rk FROM bwd0) WHERE rk <= 4),
      sums AS (SELECT query_id, sum(CAST(sim AS DECIMAL(18,6))) AS sum_s,
                      count(*) AS cnt_s
               FROM fwd GROUP BY 1),
      sumt AS (SELECT query_id AS vec_id, sum(CAST(sim AS DECIMAL(18,6))) AS sum_t,
                      count(*) AS cnt_t
               FROM bwd GROUP BY 1),
      m AS (SELECT f.query_id, f.vec_id, f.sim,
                   CASE WHEN (CAST(ss.sum_s AS DOUBLE) / ss.cnt_s +
                              CAST(st.sum_t AS DOUBLE) / st.cnt_t) / 2 > 0
                        THEN round(f.sim /
                               ((CAST(ss.sum_s AS DOUBLE) / ss.cnt_s +
                                 CAST(st.sum_t AS DOUBLE) / st.cnt_t) / 2), 6)
                        END AS margin
            FROM fwd f
            JOIN sums ss ON f.query_id = ss.query_id
            JOIN sumt st ON f.vec_id = st.vec_id),
      best AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY margin DESC NULLS LAST, vec_id) AS brk FROM m)
      SELECT query_id AS src_id, vec_id AS tgt_id, sim, margin
      FROM best WHERE brk = 1 AND margin >= 1.02
      ORDER BY src_id""")),
    QueryDef("qn116_decontam_multi", qDecontamMulti _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents WHERE trim(text) <> ''),
      sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
             FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      bench AS (SELECT 'bench_a' AS benchmark, s
                FROM (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 3)
                UNION ALL
                SELECT 'bench_b' AS benchmark, s
                FROM (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 7))
      SELECT c.doc_id, b.benchmark, count(*) AS n_overlap
      FROM sh c JOIN bench b ON c.s = b.s
      WHERE c.doc_id % 50 NOT IN (3, 7)
      GROUP BY 1, 2
      ORDER BY doc_id, benchmark""")),
    QueryDef("qn121_decontam_multi_stored", qDecontamMultiStored _, Some("""
      WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                    FROM documents WHERE trim(text) <> ''),
      sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS s
             FROM toks, unnest(range(1, len(w) - 1)) r(i)),
      bench AS (SELECT 'bench_a' AS benchmark, s
                FROM (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 3)
                UNION ALL
                SELECT 'bench_b' AS benchmark, s
                FROM (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 7))
      SELECT c.doc_id, b.benchmark, count(*) AS n_overlap
      FROM sh c JOIN bench b ON c.s = b.s
      WHERE c.doc_id % 50 NOT IN (3, 7)
      GROUP BY 1, 2
      ORDER BY doc_id, benchmark""")),
    QueryDef("qn117_perplexity_buckets", qPerplexityBuckets _, Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE trim(text) <> ''),
      lmt AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
      uni AS (
        SELECT tok AS w2, count(*) AS cu
        FROM (SELECT unnest(w) AS tok FROM lmt) GROUP BY tok),
      n AS (SELECT sum(cu) AS n FROM uni),
      bi AS (
        SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS cb
        FROM lmt, unnest(range(1, len(w))) t(i)
        GROUP BY 1, 2),
      lft AS (SELECT w1, sum(cb) AS cl FROM bi GROUP BY w1),
      big AS (
        SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        FROM toks, unnest(range(1, len(w))) t(i)
        WHERE doc_id % 2 = 1),
      p AS (
        SELECT g.doc_id,
               CASE
                 WHEN b.cb IS NOT NULL THEN b.cb * 1.0 / l.cl
                 WHEN 0.4 * coalesce(u.cu, 0) / n.n > 0
                   THEN 0.4 * coalesce(u.cu, 0) / n.n
                 ELSE 0.4 / (n.n + 1)
               END AS pr
        FROM big g
        LEFT JOIN bi b ON g.w1 = b.w1 AND g.w2 = b.w2
        LEFT JOIN lft l ON g.w1 = l.w1
        LEFT JOIN uni u ON g.w2 = u.w2
        CROSS JOIN n),
      sc AS (SELECT doc_id,
                    CAST(count(*) AS BIGINT) AS n_bigrams,
                    round(sum(log10(pr)) / count(*), 4) AS score
             FROM p GROUP BY doc_id),
      b AS (SELECT s.doc_id, d.lang, s.n_bigrams, s.score,
                   ntile(3) OVER (PARTITION BY d.lang
                                  ORDER BY s.score DESC, s.doc_id) AS t
            FROM sc s JOIN documents d ON d.doc_id = s.doc_id)
      SELECT doc_id, lang, n_bigrams, score,
             CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
               AS bucket
      FROM b ORDER BY doc_id""")),
    QueryDef("qn125_perplexity_thresholds", qPerplexityThresholds _, Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE trim(text) <> ''),
      big AS (
        SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        FROM toks, unnest(range(1, len(w))) t(i)
        WHERE doc_id % 2 = 1),
      sc AS (SELECT doc_id FROM big GROUP BY doc_id)
      SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
             true AS edge1_rank_ok, true AS edge2_rank_ok,
             true AS monotone_ok, true AS balance_ok
      FROM sc JOIN documents d ON d.doc_id = sc.doc_id
      GROUP BY d.lang ORDER BY d.lang""")),
    QueryDef("qn118_ann_hamming", qAnnHamming _, Some("""
      WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                 FROM embeddings WHERE vec_id < 8),
      p AS (SELECT q.query_id, e.vec_id, qv, e.embedding::DOUBLE[] AS ev
            FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      h AS (SELECT query_id, vec_id, qv, ev,
                   CAST(len(list_filter(range(1, len(qv) + 1),
                          i -> (qv[i] > 0) <> (ev[i] > 0))) AS BIGINT)
                     AS hamming
            FROM p),
      cand AS (SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY hamming, vec_id) AS hr FROM h),
      r AS (SELECT query_id, vec_id, hamming,
                   round(list_cosine_similarity(qv, ev), 6) AS sim
            FROM cand WHERE hr <= 20),
      ranked AS (SELECT query_id, vec_id, hamming, sim,
                        CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
                 FROM r)
      SELECT query_id, vec_id, hamming, sim, rank FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""")),
    QueryDef("qn120_hamming_index", qHammingIndex _, Some(hammingIndexOracle)),
    QueryDef("qn128_hamming_index_pruned", qHammingIndexPruned _,
      Some(hammingIndexOracle)),
    QueryDef("qn127_index_churn_flat", qIndexChurnFlat _, Some("""
      WITH live AS (
        SELECT vec_id,
               CASE WHEN vec_id % 7 = 0 THEN list_reverse(embedding::DOUBLE[])
                    ELSE embedding::DOUBLE[] END AS v
        FROM embeddings WHERE vec_id % 10 <> 0 OR vec_id % 7 = 0),
      q AS (SELECT vec_id AS query_id, v AS qv FROM live WHERE vec_id < 8),
      p AS (SELECT q.query_id, l.vec_id, qv, l.v AS ev
            FROM live l, q WHERE l.vec_id <> q.query_id),
      h AS (SELECT query_id, vec_id, qv, ev,
                   CAST(len(list_filter(range(1, len(qv) + 1),
                          i -> (qv[i] > 0) <> (ev[i] > 0))) AS BIGINT)
                     AS hamming
            FROM p),
      cand AS (SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY hamming, vec_id) AS hr FROM h),
      r AS (SELECT query_id, vec_id, hamming,
                   round(list_cosine_similarity(qv, ev), 6) AS sim
            FROM cand WHERE hr <= 20),
      ranked AS (SELECT query_id, vec_id, hamming, sim,
                        CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
                 FROM r)
      SELECT query_id, vec_id, hamming, sim, rank FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""")),
    QueryDef("qn122_ann_int8", qAnnInt8 _, Some("""
      WITH allv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      nrm AS (SELECT vec_id,
        CASE WHEN sqrt(list_sum(list_transform(v, x -> x * x))) = 0
             THEN list_transform(v, x -> 0.0)
             ELSE list_transform(v,
                    x -> x / sqrt(list_sum(list_transform(v, y -> y * y))))
        END AS nv FROM allv),
      cz AS (SELECT vec_id,
        list_max(list_transform(nv, x -> abs(x))) / 127 AS s,
        list_transform(nv, x -> CAST(CASE
          WHEN list_max(list_transform(nv, y -> abs(y))) / 127 = 0 THEN 0
          ELSE round(x / (list_max(list_transform(nv, y -> abs(y))) / 127))
          END AS BIGINT)) AS c
        FROM nrm),
      q AS (SELECT vec_id AS query_id, s AS qs, c AS qc FROM cz
            WHERE vec_id < 8),
      p AS (SELECT q.query_id, e.vec_id, qs, qc, e.s AS cs, e.c AS cc
            FROM cz e, q WHERE e.vec_id <> q.query_id),
      d AS (SELECT query_id, vec_id,
              round(qs * cs * CAST(list_sum(list_transform(
                range(1, len(qc) + 1), i -> qc[i] * cc[i])) AS DOUBLE), 6)
                AS qdot
            FROM p),
      cand AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY qdot DESC, vec_id) AS cr FROM d),
      r AS (SELECT c.query_id, c.vec_id, c.qdot,
              round(list_cosine_similarity(qa.v, ca.v), 6) AS sim
            FROM cand c JOIN allv qa ON qa.vec_id = c.query_id
                        JOIN allv ca ON ca.vec_id = c.vec_id
            WHERE c.cr <= 20),
      ranked AS (SELECT query_id, vec_id, qdot, sim,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY sim DESC, vec_id) AS INTEGER) AS rank FROM r)
      SELECT query_id, vec_id, qdot, sim, rank FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""")),
    QueryDef("qn123_int8_index", qInt8Index _, Some("""
      WITH allv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      nrm AS (SELECT vec_id,
        CASE WHEN sqrt(list_sum(list_transform(v, x -> x * x))) = 0
             THEN list_transform(v, x -> 0.0)
             ELSE list_transform(v,
                    x -> x / sqrt(list_sum(list_transform(v, y -> y * y))))
        END AS nv FROM allv),
      cz AS (SELECT vec_id,
        list_max(list_transform(nv, x -> abs(x))) / 127 AS s,
        list_transform(nv, x -> CAST(CASE
          WHEN list_max(list_transform(nv, y -> abs(y))) / 127 = 0 THEN 0
          ELSE round(x / (list_max(list_transform(nv, y -> abs(y))) / 127))
          END AS BIGINT)) AS c
        FROM nrm),
      q AS (SELECT vec_id AS query_id, s AS qs, c AS qc FROM cz
            WHERE vec_id < 8),
      p AS (SELECT q.query_id, e.vec_id, qs, qc, e.s AS cs, e.c AS cc
            FROM cz e, q WHERE e.vec_id <> q.query_id),
      d AS (SELECT query_id, vec_id,
              round(qs * cs * CAST(list_sum(list_transform(
                range(1, len(qc) + 1), i -> qc[i] * cc[i])) AS DOUBLE), 6)
                AS qdot
            FROM p),
      cand AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY qdot DESC, vec_id) AS cr FROM d),
      r AS (SELECT c.query_id, c.vec_id, c.qdot,
              round(list_cosine_similarity(qa.v, ca.v), 6) AS sim
            FROM cand c JOIN allv qa ON qa.vec_id = c.query_id
                        JOIN allv ca ON ca.vec_id = c.vec_id
            WHERE c.cr <= 20),
      ranked AS (SELECT query_id, vec_id, qdot, sim,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY sim DESC, vec_id) AS INTEGER) AS rank FROM r)
      SELECT query_id, vec_id, qdot, sim, rank FROM ranked
      WHERE rank <= 5 ORDER BY query_id, rank""")),
    QueryDef("qn124_quant_error_audit", qQuantErrorAudit _, Some("""
      WITH allv AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                    FROM embeddings),
      nrm AS (SELECT vec_id, label,
        CASE WHEN sqrt(list_sum(list_transform(v, x -> x * x))) = 0
             THEN list_transform(v, x -> 0.0)
             ELSE list_transform(v,
                    x -> x / sqrt(list_sum(list_transform(v, y -> y * y))))
        END AS nv FROM allv),
      cz AS (SELECT vec_id, label, nv,
        list_transform(nv, x -> CAST(CASE
          WHEN list_max(list_transform(nv, y -> abs(y))) / 127 = 0 THEN 0
          ELSE round(x / (list_max(list_transform(nv, y -> abs(y))) / 127))
          END AS BIGINT)) AS c
        FROM nrm),
      per AS (SELECT label,
        list_sum(list_transform(nv, x -> x * x)) AS nv2,
        CAST(list_sum(list_transform(c, x -> x * x)) AS DOUBLE) AS c2,
        list_sum(list_transform(range(1, len(nv) + 1), i -> nv[i] * c[i]))
          AS md,
        list_sum(list_transform(nv, x -> abs(x))) AS l1,
        len(nv) AS d
        FROM cz),
      sc AS (SELECT label,
        round(CASE WHEN nv2 > 0 AND c2 > 0 THEN md / sqrt(nv2 * c2)
              ELSE 0 END, 6) AS cos8,
        round(CASE WHEN nv2 > 0 THEN l1 / sqrt(nv2 * d) ELSE 0 END, 6)
          AS cosb
        FROM per)
      SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        round(CAST(sum(CAST(cos8 AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
          AS sq8_avg_cos,
        min(cos8) AS sq8_min_cos,
        round(CAST(sum(CAST(cosb AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
          AS bin_avg_cos,
        min(cosb) AS bin_min_cos
      FROM sc GROUP BY label ORDER BY label""")),
    QueryDef("qn119_lm_store", qLmStore _, Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE trim(text) <> ''),
      lmt AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
      uni AS (
        SELECT tok AS w2, count(*) AS cu
        FROM (SELECT unnest(w) AS tok FROM lmt) GROUP BY tok),
      n AS (SELECT sum(cu) AS n FROM uni),
      bi AS (
        SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS cb
        FROM lmt, unnest(range(1, len(w))) t(i)
        GROUP BY 1, 2),
      lft AS (SELECT w1, sum(cb) AS cl FROM bi GROUP BY w1),
      big AS (
        SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        FROM toks, unnest(range(1, len(w))) t(i)
        WHERE doc_id % 2 = 1),
      p AS (
        SELECT g.doc_id,
               CASE
                 WHEN b.cb IS NOT NULL THEN b.cb * 1.0 / l.cl
                 WHEN 0.4 * coalesce(u.cu, 0) / n.n > 0
                   THEN 0.4 * coalesce(u.cu, 0) / n.n
                 ELSE 0.4 / (n.n + 1)
               END AS pr
        FROM big g
        LEFT JOIN bi b ON g.w1 = b.w1 AND g.w2 = b.w2
        LEFT JOIN lft l ON g.w1 = l.w1
        LEFT JOIN uni u ON g.w2 = u.w2
        CROSS JOIN n)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             round(sum(log10(pr)) / count(*), 4) AS score,
             TRUE AS last_superseded_ok
      FROM p
      GROUP BY doc_id
      ORDER BY doc_id"""))
  )
}
