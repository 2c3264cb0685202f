package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpora for SCALE audits (ScaleSpec growth
  * gates + [[ScaleBench]]), generated entirely with codegen'd
  * expressions — no driver-side row materialization, so a 10× corpus
  * costs 10× executor work and nothing on the driver.
  *
  * Why not just scale the driver fixtures up: the fixture documents draw
  * from a 31-word vocabulary, so EVERY trigram is shared by ~n/30000 of
  * the corpus and exact n-gram Jaccard is inherently quadratic until the
  * hot-shingle cap engages (~600k docs) — useful for correctness, wrong
  * for asking "is candidate generation near-linear on realistic data".
  * Real corpora are power-law: a small head of stopword shingles (which
  * the cap drops) over a huge near-unique tail. This generator produces
  * that shape at any n:
  *
  *   - words drawn from a 30k vocabulary with `u^skew` rank skew
  *     (default skew 3: top word ≈ 3.2% of draws — "the"-like; skew 5
  *     gives a pathological 13% head whose hot shingles cross the
  *     doc-freq cap at test-sized corpora, which is what the ScaleSpec
  *     cap gate needs), 40–80 words/doc;
  *   - ~1% planted near-dup pairs (doc copies its predecessor's body and
  *     appends one extra word → Jaccard ≈ 0.95) and ~0.5% exact dups —
  *     the signal dedup must find;
  *   - embeddings: isotropic Gaussian vectors (near-orthogonal
  *     non-neighbors, the realistic ANN regime) with ~1% planted
  *     near-dup twins (predecessor + small noise, cosine ≈ 0.99) and a
  *     cluster label for IVF-style ops.
  */
object ScaleData {

  val VocabSize = 30000

  /** Uniform in [0,1) from a 64-bit hash, strictly positive. */
  private def unit(h: Column): Column =
    (pmod(h, lit(1000000L)) + lit(0.5)) / lit(1000000.0)

  /** Synthetic documents(doc_id, text, lang, source, n_chars).
    *
    * `giantFactor > 1` multiplies DOC 0's token length by that factor —
    * the single-giant-document skew probe (one id × many shingles). The
    * giant's near-dup copier (doc 1) and exact copier (doc 2) inherit
    * the length through the anchor chain, so the planted-dup structure
    * survives: the skew audit asserts the detector still finds exactly
    * the same pairs while no reducer hot-spots.
    */
  /** Vocabulary size for a GROWING-vocabulary corpus of `n` docs: real
    * corpora obey Heaps' law (distinct types ≈ K·tokens^β, β ≈ 0.7 for
    * web text) — the fixed 30k default is the OTHER extreme, a closed
    * vocabulary whose shingle doc-frequencies densify linearly with the
    * corpus and drive the pair-candidate volume quadratic until the
    * hot-cap engages. The r18 fixed-delta campaign read 2.2–2.5× wall
    * per 2× state on that closed fixture; this mode exists to separate
    * the fixture's densification from any real state-side
    * superlinearity (r19 item 1). K=8 over tokens ≈ 60·n gives a
    * realistic ~3% type–token ratio at campaign scale (2M docs ≈ 120M
    * tokens → ≈3.6M types; 8M docs → ≈9.6M) growing 2^0.7 ≈ 1.62× per
    * corpus doubling, so per-shingle doc-frequency grows only ~1.23×
    * per doubling instead of the closed fixture's 2×. Floored at the
    * closed default so tiny audits keep their hot-cap behavior.
    */
  def heapsVocab(n: Long): Long =
    math.max(VocabSize.toLong, (8.0 * math.pow(60.0 * n, 0.7)).toLong)

  def documents(spark: SparkSession, n: Long, seed: Long = 42L,
      skew: Double = 3.0, giantFactor: Long = 1L,
      vocabSize: Long = VocabSize.toLong): DataFrame = {
    // Near-dups copy doc_id-1's body; exact dups copy doc_id-2's. The
    // anchor chain is 1 deep by construction (97 and 193 are coprime to
    // each other's offsets; the rare anchor-of-an-anchor collision just
    // produces one more unique doc, which is harmless noise).
    val base = spark.range(n).select(col("id").as("doc_id"))
      .withColumn("near", pmod(col("doc_id"), lit(97L)) === 1 && col("doc_id") > 0)
      .withColumn("exact", pmod(col("doc_id"), lit(193L)) === 2 && col("doc_id") > 1)
      .withColumn("anchor",
        when(col("exact"), col("doc_id") - 2)
          .when(col("near"), col("doc_id") - 1)
          .otherwise(col("doc_id")))
    val len0 = pmod(xxhash64(col("anchor"), lit(seed)), lit(41L)) + 40L
    val len =
      (if (giantFactor > 1L)
        when(col("anchor") === 0L, len0 * giantFactor).otherwise(len0)
      else len0).as("len")
    val words = transform(sequence(lit(1L), col("len")), i =>
      concat(lit("w"), floor(lit(vocabSize.toDouble) *
        pow(unit(xxhash64(col("anchor"), i, lit(seed + 1))), lit(skew))).cast("long")))
    val body = concat_ws(" ", words)
    base.withColumn("len", len)
      .withColumn("text",
        when(col("near"), concat(body, lit(" x"), col("doc_id"))).otherwise(body))
      .withColumn("lang",
        element_at(array(Seq("en", "en", "zh", "es", "fr", "de").map(lit): _*),
          pmod(xxhash64(col("doc_id"), lit(seed + 2)), lit(6L)).cast("int") + 1))
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(20L))))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Gaussian from two independent uniform hashes (Box–Muller). */
  private def gauss(h1: Column, h2: Column): Column =
    sqrt(lit(-2.0) * log(unit(h1))) * cos(lit(2.0 * math.Pi) * unit(h2))

  /** Synthetic embeddings(vec_id, embedding float[dim], label). */
  def embeddings(spark: SparkSession, n: Long, dim: Int = 64,
      clusters: Int = 10, clusterWeight: Double = 0.25,
      seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val centers = array(Array.fill(clusters)(
      array(Array.fill(dim)(lit(rnd.nextGaussian())): _*)): _*)
    val base = spark.range(n).select(col("id").as("vec_id"))
      .withColumn("near", pmod(col("vec_id"), lit(97L)) === 1 && col("vec_id") > 0)
      .withColumn("anchor", when(col("near"), col("vec_id") - 1).otherwise(col("vec_id")))
      .withColumn("label", pmod(xxhash64(col("anchor"), lit(seed)), lit(clusters.toLong)).cast("int"))
    // Isotropic body + a mild cluster pull; planted twins re-noise their
    // anchor's vector at 5% amplitude (cosine ≈ 0.999).
    val noise = transform(sequence(lit(0), lit(dim - 1)), j =>
      gauss(xxhash64(col("anchor"), j, lit(seed + 1)),
        xxhash64(col("anchor"), j, lit(seed + 2))))
    val twin = transform(sequence(lit(0), lit(dim - 1)), j =>
      gauss(xxhash64(col("vec_id"), j, lit(seed + 3)),
        xxhash64(col("vec_id"), j, lit(seed + 4))))
    val v = zip_with(
      zip_with(noise, element_at(centers, col("label") + 1),
        (z, c) => z + lit(clusterWeight) * c),
      twin,
      (b, t) => b + when(col("near"), lit(0.05) * t).otherwise(lit(0.0)))
    base
      .withColumn("embedding",
        graft.functions.VectorExpressions.l2Normalize(v).cast("array<float>"))
      .select("vec_id", "embedding", "label")
  }
}
