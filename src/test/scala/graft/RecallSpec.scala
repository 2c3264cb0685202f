package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Quantified-recall gates for the approximate operators that the DuckDB
  * oracle can only rows-check (qn03 MinHash, qn04 SimHash, qn11 SRP, qn12
  * IVF): candidates are compared against exact ground truth computed with
  * the engine's own exact operators over the sf0.01 fixtures. Inputs and
  * hash seeds are fixed, so each recall value is a deterministic number —
  * the assertions are tight, not flaky.
  */
class RecallSpec extends SparkSpec {

  private def docs = Tables.read(spark, sf("sf0.01"), "documents")
  private def emb = Tables.read(spark, sf("sf0.01"), "embeddings")

  private def pairSet(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(col(a).cast("long").as("a"), col(b).cast("long").as("b"))
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1))))
      .toSet

  private def recallOf(cand: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
    (truth & cand).size.toDouble / truth.size

  test("qn03 MinHash LSH candidate recall >= 0.9 vs exact Jaccard pairs") {
    val truth = pairSet(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.7),
      "doc_a", "doc_b")
    val cand = pairSet(
      Dedup.minhashCandidatePairs(docs, "doc_id", "text", n = 3, simThreshold = 0.7),
      "doc_a", "doc_b")
    val recall = recallOf(cand, truth)
    info(f"minhash recall = $recall%.4f over ${truth.size} true pairs, ${cand.size} candidates")
    assert(truth.nonEmpty && recall >= 0.9)
  }

  test("qn04 SimHash banded pairs are EXACT for hamming <= 3 (pigeonhole)") {
    val fp = docs.select(col("doc_id").as("id"), Dedup.simhash64(col("text")).as("fp"))
    val truth = pairSet(
      fp.as("a").join(fp.as("b"), col("a.id") < col("b.id"))
        .where(bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= 3)
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b")),
      "doc_a", "doc_b")
    val cand = pairSet(
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3),
      "doc_a", "doc_b")
    info(s"simhash exact pair count = ${truth.size}")
    assert(truth.nonEmpty && cand == truth)
  }

  test("qn11 SRP-LSH candidate recall >= 0.9 vs exact cosine pairs") {
    val truth = pairSet(
      Similarity.nearDupPairs(emb, "vec_id", "embedding", threshold = 0.35),
      "id_a", "id_b")
    val cand = pairSet(
      Similarity.srpNeighbors(emb, "vec_id", "embedding", dim = 64,
        cosThreshold = 0.35, numPlanes = 30, bands = 10),
      "id_a", "id_b")
    val recall = recallOf(cand, truth)
    info(f"srp recall = $recall%.4f over ${truth.size} true pairs, ${cand.size} candidates")
    assert(truth.nonEmpty && recall >= 0.9)
  }

  test("qn40 SemDeDup within-cluster pair recall >= 0.9, precision 1.0") {
    val truth = pairSet(
      Similarity.nearDupPairs(emb, "vec_id", "embedding", threshold = 0.4),
      "id_a", "id_b")
    val sem = Similarity.semDedupPairs(emb, "vec_id", "embedding",
      threshold = 0.4, nlist = 8, assignProbes = 3)
    val cand = pairSet(sem, "id_a", "id_b")
    val recall = recallOf(cand, truth)
    info(f"semdedup recall = $recall%.4f over ${truth.size} true pairs, ${cand.size} candidates")
    // Measured 1.0000 at sf0.01 / 0.9652 at sf0.1 (near-uniform
    // worst-case fixture; hard assignment alone gives 0.49/0.36 —
    // the 3-of-8 soft assignment, ranked by the SAME metric as the
    // hard assignment, is the load-bearing recall lever).
    assert(truth.nonEmpty && recall >= 0.9)
    // Precision is structural: within-cluster scores are exact cosine.
    assert((cand -- truth).isEmpty, "semdedup must never emit a non-true pair")
    // Candidate generation must be a cell-equality hash join — never a
    // cartesian/BNLJ — and assignment must stay shuffle-free (literal
    // centroids, per-row transform).
    val plan = sem.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
  }

  test("qn12 IVF top-k recall >= 0.9 vs exact brute-force top-k") {
    val queries = emb.where(col("vec_id") < 8)
    def topkSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = topkSet(
      Similarity.topKPerQuery(emb, queries, "vec_id", "embedding", k = 5))
    // The fixture embeddings are near-uniform on the 64-d sphere (max
    // pairwise cos = 0.51) — the worst case for IVF, where recall tracks
    // the probed fraction (measured at sf0.01: 3/8 cells → 0.625, 6/8 →
    // 0.925; at sf0.1 density pushes 6/8 to 0.875, 7/8 back to 0.925 —
    // RecallAudit). On clustered corpora (the real ANN use case) small
    // nProbe/nlist suffices; this gate pins the honest uniform-data
    // configuration qn12 runs (nProbe 7).
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 5,
      nlist = 8, nProbe = 7)
    val cand = topkSet(ivf)
    val recall = (truth & cand).size.toDouble / truth.size
    info(f"ivf recall = $recall%.4f over ${truth.size} true neighbors")
    assert(truth.size == 40 && recall >= 0.9)
    // The re-rank must run through the bounded-heap aggregate (map-side
    // partial top-k), not a per-query row_number window sort.
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("topk_by_score"), "IVF re-rank not using TopKByScoreAgg")
  }

  test("qn29 PQ top-k recall >= 0.9 vs exact brute-force top-k") {
    val queries = emb.where(col("vec_id") < 8)
    def topkSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = topkSet(
      Similarity.topKPerQuery(emb, queries, "vec_id", "embedding", k = 5))
    // 16-byte codes over 64 dims (4 dims × 4 bits per subspace), then an
    // exact re-rank of the 50-deep ADC shortlist: recall is set by
    // whether the true top-5 survive into the shortlist. Measured on the
    // near-uniform worst-case fixture with the distance-matched encoder:
    // m=8 → 0.80, m=16 → 0.925 at sf0.01 (finer subspaces beat more
    // codes per subspace; RecallAudit at sf0.1 with the adaptive 10%
    // shortlist: 0.975). Deterministic training → a fixed number, gated
    // at the qn29 contract's 0.9.
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      dim = 64, k = 5, m = 16, ksub = 16, shortlist = 50)
    val cand = topkSet(pq)
    val recall = (truth & cand).size.toDouble / truth.size
    info(f"pq recall = $recall%.4f over ${truth.size} true neighbors")
    assert(truth.size == 40 && recall >= 0.9)
    // Re-ranked hits carry EXACT cosine: every returned (query, vec, sim)
    // in the truth intersection must match brute force bit-for-bit.
    val exactSims = Similarity.topKPerQuery(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val mismatched = pq.select("query_id", "vec_id", "sim").collect()
      .flatMap { r =>
        exactSims.get((r.getLong(0), r.getLong(1)))
          .filter(_ != r.getDouble(2)).map(_ => (r.getLong(0), r.getLong(1)))
      }
    assert(mismatched.isEmpty, s"re-rank sims diverge from exact: ${mismatched.take(3).toSeq}")
  }

  test("qn36 IVF+PQ composed top-k recall >= 0.9 vs exact brute-force top-k") {
    val queries = emb.where(col("vec_id") < 8)
    def topkSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = topkSet(
      Similarity.topKPerQuery(emb, queries, "vec_id", "embedding", k = 5))
    // The COMPOSED loss stacks IVF's missed cells on PQ's shortlist
    // misses, so each half runs with more headroom than standalone:
    // nProbe 7/8 + n/8 shortlist (vs 6 + n/10 = 0.85, under the gate).
    // Deterministic training (seeded KMeans + strided Lloyd) → a fixed
    // number: 0.95 at sf0.01, 0.925 at sf0.1, 1.0 at 20k vectors.
    val n = emb.count()
    val ann = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
      dim = 64, k = 5, nlist = 8, nProbe = 7, m = 16, ksub = 16,
      shortlist = math.max(50L, n / 8).toInt, corpusRows = Some(n))
    val cand = topkSet(ann)
    val recall = (truth & cand).size.toDouble / truth.size
    info(f"ivfpq recall = $recall%.4f over ${truth.size} true neighbors")
    assert(truth.size == 40 && recall >= 0.9)
    // Both bounded-heap aggregates (ADC shortlist + exact re-rank) run
    // through TopKByScoreAgg — no window sort anywhere in the plan.
    val plan = ann.queryExecution.executedPlan.toString
    assert(plan.contains("topk_by_score"), "IVF+PQ not using TopKByScoreAgg")
  }

  // The qn63/qn69 routed legs are gated on graft.tools.ScaleData (seeded
  // generator, identical every round) rather than the driver fixture:
  // top-1-of-arbitrary-vectors recall is a property of the corpus
  // geometry, and the fixture regenerates per round — a fixture gate
  // would encode fixture luck. ScaleData's geometry (10 weak clusters +
  // 1% planted twins over isotropic noise) is the adversarial case: most
  // true nearest positives are near-orthogonal non-neighbors.

  test("qn113 bitext: full-probe routed leg == exact; clustered recall >= 0.9") {
    import graft.ops.Similarity
    // (a) nProbe >= nlist makes IVF retrieval exhaustive, so the routed
    // leg must reproduce the exact pair set EXACTLY — this pins the
    // margin tail (sums, division, argmax) as retrieval-independent.
    // Weakly-clustered vectors on purpose: the hard case.
    val hard = graft.tools.ScaleData.embeddings(spark, 4000L).cache()
    // (b) On encoder-shaped CLUSTERED embeddings (the real bitext
    // input), the default 8 probes must track exact at >= 0.9.
    val clustered = graft.tools.ScaleData.embeddings(
      spark, 4000L, clusterWeight = 0.9).cache()
    try {
      def pairs(e: org.apache.spark.sql.DataFrame, maxExact: Long, probes: Int) =
        Similarity.marginBitextPairs(
          e.where(pmod(col("vec_id"), lit(2)) === 0),
          e.where(pmod(col("vec_id"), lit(2)) === 1),
          "vec_id", "embedding", k = 4, threshold = 1.02,
          maxExactRows = maxExact, nProbe = probes)
          .select("src_id", "tgt_id", "margin").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val nlist = Similarity.ivfNlistFor(2000L) // per-side corpus rows
      assert(pairs(hard, 0L, probes = nlist) == pairs(hard, Long.MaxValue, 8),
        "full-probe routed leg must equal the exact leg bit-for-bit")
      val exactC = pairs(clustered, Long.MaxValue, 8).map(p => (p._1, p._2))
      val routedC = pairs(clustered, 0L, 8).map(p => (p._1, p._2))
      val recall = (exactC & routedC).size.toDouble / exactC.size
      assert(recall >= 0.9, s"clustered routed bitext recall $recall (|exact|=${exactC.size})")
    } finally { hard.unpersist(); clustered.unpersist() }
  }

  test("qn63 routed (default probes) nearest-positive agreement vs exact on ScaleData") {
    val e = graft.tools.ScaleData.embeddings(spark, 4000L).cache()
    try {
      def run(maxExact: Long) =
        Similarity.positivePairs(e, "vec_id", "embedding", "label",
          maxExactRows = maxExact)
          .collect()
          .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
          .toMap
      val exact = run(Long.MaxValue)
      val routed = run(1L)
      val coverage = routed.size.toDouble / exact.size
      val idHits = exact.count { case (k, (pid, _)) =>
        routed.get(k).exists(_._1 == pid) }
      val idRecall = idHits.toDouble / exact.size
      // Routed scores a SUBSET of candidates, so per-anchor cos can only
      // drop; the average gap bounds how much positive-pair quality the
      // pruning costs even where the argmax id differs.
      val cosGap = exact.toSeq.flatMap { case (k, (_, c)) =>
        routed.get(k).map { case (_, rc) => c - rc } }
      val avgGap = cosGap.sum / math.max(1, cosGap.size)
      info(f"coverage=$coverage%.4f idRecall=$idRecall%.4f avgCosGap=$avgGap%.4f over ${exact.size} anchors")
      assert(exact.nonEmpty && coverage >= 0.99, f"coverage $coverage%.4f")
      assert(idRecall >= 0.55, f"idRecall $idRecall%.4f")
      assert(avgGap <= 0.05, f"avgCosGap $avgGap%.4f")
    } finally e.unpersist()
  }

  test("qn69 routed (default probes) per-label agreement tracks exact on ScaleData") {
    val e = graft.tools.ScaleData.embeddings(spark, 4000L).cache()
    try {
      val anchors = e.where(pmod(col("vec_id"), lit(5)) === 0)
      def run(maxExact: Long) =
        Similarity.knnLabelAgreement(anchors, e, "vec_id", "embedding", "label",
          maxExactRows = maxExact)
          .collect()
          .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
      val exact = run(Long.MaxValue)
      val routed = run(1L)
      // Every label present with every anchor counted: absent anchors
      // would silently shrink n and bias the metric.
      assert(routed.keySet == exact.keySet)
      exact.foreach { case (l, (n, _)) =>
        assert(routed(l)._1 == n, s"label $l anchor count ${routed(l)._1} != $n") }
      // The METRIC is per-label agreement; near-ties may swap the NN id
      // but the label distribution of near-neighbors is what the eval
      // reads — routed rates must track exact within a tight band.
      val maxDelta = exact.map { case (l, (_, r)) =>
        math.abs(routed(l)._2 - r) }.max
      info(f"maxDelta=$maxDelta%.4f over ${exact.size} labels " +
        s"(exact=${exact.toSeq.sortBy(_._1).map(_._2._2)})")
      assert(maxDelta <= 0.10, f"maxDelta $maxDelta%.4f")
    } finally e.unpersist()
  }

  test("nearestCells kernel == brute-force (dist, cell) ranking, flat + hier, with ties (r10)") {
    // The primitive-loop NearestCellsExpr replaced the HOF
    // transform/array_sort/slice pipeline; this pins it to an
    // independent Scala reference: dist = ||c||^2/2 - x.c with the same
    // accumulation order, ranked by (dist, cell id) ascending under
    // java.lang.Double.compare. Duplicated centroids under different
    // ids force EXACT dist ties; shuffled non-contiguous ids catch any
    // position-vs-id tie-break confusion.
    val rnd = new scala.util.Random(11L)
    val dim = 16
    def vec(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    val base = (0 until 140).map(i => (i * 31 % 997, vec()))
    val cents: Seq[(Int, Array[Double])] = base ++ base.zipWithIndex.collect {
      case ((_, c), i) if i % 7 == 0 => (1000 + i, c.clone) }
    assert(cents.map(_._1).distinct.size == cents.size)
    assert(cents.size > Similarity.HierAssignCentroids)
    val rows = (0 until 200).map(i => (i.toLong, vec().toSeq))
    import spark.implicits._
    val df = rows.toDF("vec_id", "nv")
    def reference(q: Seq[Double], probes: Int): Seq[Int] =
      cents.map { case (id, c) =>
        val half = c.map(x => x * x).sum / 2
        var s = 0d
        var t = 0
        while (t < dim) { s += q(t) * c(t); t += 1 }
        (half - s, id)
      }.sortWith { case ((d1, c1), (d2, c2)) =>
        val cc = java.lang.Double.compare(d1, d2)
        cc < 0 || (cc == 0 && c1 < c2)
      }.take(probes).map(_._2)
    def collectAssignSeq(res: org.apache.spark.sql.DataFrame) =
      res.collect().map(r => (r.getLong(0), r.getInt(r.fieldIndex("cell"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for (probes <- Seq(1, 3, 5)) {
      val exp = rows.map { case (id, q) => (id, reference(q, probes)) }.toMap
      assert(collectAssignSeq(
        Similarity.probeAssignFlat(df, cents, probes)) == exp, s"flat probes=$probes")
      assert(collectAssignSeq(
        Similarity.probeAssignHier(df, cents, probes, groupProbes = cents.size)) == exp,
        s"hier probes=$probes")
    }
  }

  test("hier probeAssign at full group probes is EXACTLY the flat assignment (r10)") {
    // 200 centroids (> HierAssignCentroids) on the unit sphere, 300
    // probe rows: with groupProbes = #groups every member is ranked and
    // the final (dist, cell) sort is identical to flat's — the grouped
    // path may only ever change WHICH candidates are ranked, never how.
    val rnd = new scala.util.Random(7L)
    def unit(d: Int): Array[Double] = {
      val v = Array.fill(d)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val cents = (0 until 200).map(i => (i, unit(16)))
    assert(cents.size > Similarity.HierAssignCentroids)
    import spark.implicits._
    val rows = (0 until 300).map(i => (i.toLong, unit(16).toSeq)).toDF("vec_id", "nv")
    def collectAssign(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(r.fieldIndex("cell"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val flat = collectAssign(Similarity.probeAssignFlat(rows, cents, probes = 3))
    val hierFull = collectAssign(
      Similarity.probeAssignHier(rows, cents, probes = 3, groupProbes = 200))
    assert(hierFull == flat)
    // Default group probes: hard assignment (probes = 1) must agree
    // with the exact argmin on a large fraction of isotropic inputs —
    // the adversarial case for coarse grouping (real embedding corpora
    // cluster; isotropic Gaussian is the floor).
    val gp = Similarity.hierGroupProbes(cents.size)
    val hierDef = collectAssign(
      Similarity.probeAssignHier(rows, cents, probes = 1, groupProbes = gp))
    val flat1 = collectAssign(Similarity.probeAssignFlat(rows, cents, probes = 1))
    val agree = flat1.count { case (k, v) => hierDef.get(k).contains(v) }
    val rate = agree.toDouble / flat1.size
    info(f"hier hard-assign agreement at gp=$gp: $rate%.4f over ${flat1.size} rows")
    assert(rate >= 0.85, f"agreement $rate%.4f") // measured 0.8633, deterministic
  }

  test("qn99 graded config (nlist=150, hier path) fixture recall headroom") {
    // The exact config the graded query pins (150 cells over the
    // 500-row near-uniform fixture — ~3-row cells, deliberately brutal
    // cluster pruning) must keep real margin over the contract's 0.6
    // recall boolean.
    val truth = pairSet(
      Similarity.nearDupPairs(emb, "vec_id", "embedding", threshold = 0.4),
      "id_a", "id_b")
    val cand = pairSet(
      Similarity.semDedupPairs(emb, "vec_id", "embedding", threshold = 0.4,
        nlist = 150, assignProbes = 3),
      "id_a", "id_b")
    val recall = recallOf(cand, truth)
    info(f"qn99 fixture recall = $recall%.4f over ${truth.size} true pairs")
    assert(truth.nonEmpty && recall >= 0.6)
  }

  test("large-nlist hier gate (nlist=1600): log-scaled group probes keep recall (r11)") {
    // r10 advice: the fixed gp=4 cap's recall cost grows with g
    // (probed member fraction ~4/√nlist) and the large-nlist regimes it
    // most affects were unvalidated — semDedupNlistFor reaches 2^20 on
    // big corpora. gp now scales ⌈log₂(g+1)⌉ with the group count; this
    // gate pins a regime 10× past the routing threshold (nlist=1600,
    // g=40 ⇒ gp=6 where the retired cap froze at 4) on a CLUSTERED
    // corpus — the realistic embedding shape — checking both the hard
    // assignment (probes=1 agreement with the exact argmin) and the
    // soft side (the true nearest cell inside the 3-probe set).
    val rnd = new scala.util.Random(23L)
    val dim = 16
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val cents = (0 until 1600).map(i => (i, unit()))
    val gp = Similarity.hierGroupProbes(cents.size)
    assert(gp > 4, s"log-scaled gp must exceed the retired fixed cap, got $gp")
    import spark.implicits._
    val rows = (0 until 2000).map { i =>
      val c = cents(rnd.nextInt(cents.size))._2
      val v = c.map(x => x + rnd.nextGaussian() * 0.1)
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n).toSeq)
    }
    val df = rows.toDF("vec_id", "nv")
    def assignSets(res: org.apache.spark.sql.DataFrame) =
      res.collect().map(r => (r.getLong(0), r.getInt(r.fieldIndex("cell"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth1 = assignSets(Similarity.probeAssignFlat(df, cents, probes = 1))
    val hier1 = assignSets(Similarity.probeAssignHier(df, cents, probes = 1, gp))
    val hard = truth1.count { case (k, v) => hier1(k) == v }.toDouble / truth1.size
    val hier3 = assignSets(Similarity.probeAssignHier(df, cents, probes = 3, gp))
    val soft = truth1.count { case (k, v) =>
      v.subsetOf(hier3(k)) }.toDouble / truth1.size
    info(f"nlist=1600 gp=$gp hard-assign agreement $hard%.4f, 3-probe recall $soft%.4f")
    assert(hard >= 0.9, f"hard-assign agreement $hard%.4f")
    assert(soft >= 0.9, f"3-probe recall of the true cell $soft%.4f")
  }

  test("semDedupPairs above the hier threshold keeps pair recall >= 0.9 (r10)") {
    // Force nlist past HierAssignCentroids on a corpus small enough to
    // compute exact truth: the grouped assignment (both the hard cells
    // and the 3-probe soft side) must not cost SemDeDup its recall
    // gate. ScaleData plants exact twin pairs — the detector's targets.
    val e = graft.tools.ScaleData.embeddings(spark, 6000L).cache()
    try {
      val truth = pairSet(
        Similarity.nearDupPairs(e, "vec_id", "embedding", threshold = 0.9),
        "id_a", "id_b")
      val cand = pairSet(
        Similarity.semDedupPairs(e, "vec_id", "embedding", threshold = 0.9,
          nlist = 150, assignProbes = 3),
        "id_a", "id_b")
      val recall = recallOf(cand, truth)
      info(f"hier semdedup recall = $recall%.4f over ${truth.size} true pairs")
      assert(truth.nonEmpty && recall >= 0.9)
    } finally e.unpersist()
  }

  test("qn118 hamming ANN: corpus-covering oversample == exact top-k; heap plan") {
    // With k·oversample >= |corpus| the Hamming candidate stage keeps
    // everything, so the rerank must reproduce exact brute-force top-k
    // BIT-FOR-BIT (same 6dp rounding, same id tie-breaks) — pins that
    // neither the sign-bit packing nor the candidate heap perturbs the
    // exact path.
    val queries = emb.where(col("vec_id") < 8)
    def rows(df: DataFrame): Set[(Long, Long, Double, Int)] =
      df.select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("sim"), col("rank").cast("int"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val exact = rows(
      Similarity.topKPerQuery(emb, queries, "vec_id", "embedding", k = 5))
    val ham = Similarity.hammingTopK(emb, queries, "vec_id", "embedding",
      k = 5, oversample = 1200)
    assert(rows(ham) == exact)
    // Candidate generation must bound the shuffle with the map-side
    // heap, not sort the scored corpus through a window.
    assert(ham.queryExecution.executedPlan.toString.contains("topk_by_score"),
      "hamming candidate stage not using TopKByScoreAgg")
  }

  test("qn122 int8 ANN: full-coverage == exact; fixture recall at default oversample") {
    val queries = emb.where(col("vec_id") < 8)
    def rows(df: DataFrame): Set[(Long, Long, Double, Int)] =
      df.select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("sim"), col("rank").cast("int"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val exact = rows(
      Similarity.topKPerQuery(emb, queries, "vec_id", "embedding", k = 5))
    // Corpus-covering oversample: rerank sees everything — must equal
    // exact brute force bit-for-bit (the qn118 pin).
    val full = Similarity.int8TopK(emb, queries, "vec_id", "embedding",
      k = 5, oversample = 1200)
    assert(rows(full) == exact)
    assert(full.queryExecution.executedPlan.toString.contains("topk_by_score"),
      "int8 candidate stage not using TopKByScoreAgg")
    // Default 4× oversample: 8-bit codes keep cosine ranks almost
    // intact even on the near-uniform worst-case fixture (quantization
    // error ~1/127 vs neighbor gaps ~1e-2) — measured 1.0 over 32
    // queries in the oracle engine; gate the engine at the same bar
    // where 1-bit Hamming reads 0.46 (the ladder's selling point).
    val sq = Similarity.int8TopK(emb, queries, "vec_id", "embedding",
      k = 5, oversample = 4)
    def ids(s: Set[(Long, Long, Double, Int)]) = s.map(t => (t._1, t._2))
    val recall = (ids(exact) & ids(rows(sq))).size.toDouble / exact.size
    info(f"sq8 recall = $recall%.4f over ${exact.size} true neighbors")
    assert(recall >= 0.95)
  }

  test("qn118 hamming ANN: planted near-twin recall >= 0.95 at default oversample") {
    // Binary quantization's production claim is rescoring GENUINE near
    // neighbors (cos ≈ 1 twins flip almost no sign bits). On ScaleData's
    // planted twins (cos ≈ 0.999) the default 4× oversample must find
    // the anchor as the 1-NN. The near-UNIFORM fixture is the honest
    // worst case and is documented, not gated: recall there tracks the
    // candidate fraction like IVF on the same data (measured at sf0.01,
    // 32 queries, k=5: 20 candidates → 0.46, 80 → 0.83, 160 → 0.96,
    // 320 → 0.99 of a 5000-row corpus).
    val e = graft.tools.ScaleData.embeddings(spark, 2000L).cache()
    try {
      val twins = e.where(pmod(col("vec_id"), lit(97L)) === 1 && col("vec_id") > 0)
      val n = twins.count()
      val hits = Similarity.hammingTopK(e, twins, "vec_id", "embedding",
          k = 1, oversample = 4)
        .where(col("vec_id") === col("query_id") - 1)
        .count()
      val recall = hits.toDouble / n
      info(f"twin 1-NN recall = $recall%.4f over $n twins")
      assert(n > 0 && recall >= 0.95)
    } finally e.unpersist()
  }
}
