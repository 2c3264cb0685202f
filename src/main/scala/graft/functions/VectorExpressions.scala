package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{BpeMergePairExpr, ColumnBridge, DotProductD, HammingDistanceExpr, HashedCharNgramCountsExpr, HashedTokenCountsExpr, HashedTokenLogitExpr, HashedTokenMultiLogitExpr, Int8CodesExpr, Int8DotExpr, Int8MixedDotExpr, Int8ScaleExpr, L2NormalizeExpr, LongMatchCountExpr, MinHashSignatureExpr, NearestCellsExpr, NfcNormalizeExpr, PackSignBitsExpr, PqAdcScoreExpr, PqAdcTableExpr, PqEncodeExpr, SimHash64Expr, SrpSketchExpr, TopKByScoreAgg, WordShinglesExpr}

/** Facade over the custom Catalyst expressions in
  * `org.apache.spark.sql.graft` (they live inside Spark's package tree to
  * access `private[sql]` planner types).
  *
  * The generic higher-order-function formulation (`zip_with` +
  * `aggregate`) allocates an intermediate array per row-pair and walks the
  * lambda interpreter; on an all-pairs similarity join that is the entire
  * runtime. These expressions compile to a tight primitive loop inside
  * whole-stage codegen (`DotProductD`) or a single JVM call
  * (`SimHash64Expr`) — SURVEY.md §7.3's "custom codegen Expression only if
  * bench demands" clause, triggered by BENCH round 1.
  */
object VectorExpressions {

  /** Codegen'd dot product of two `array<double>` columns. */
  def dotD(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductD(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** 64-bit SimHash of an `array<string>` token column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))

  /** MinHash signature (`array<long>` of length numHashes) of an
    * `array<string>` shingle column.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignatureExpr(ColumnBridge.expression(shingles), numHashes))

  /** 32-bit signed-random-projection sketch of an `array<double>` vector. */
  def srpSketch(vec: Column, planes: Array[Double], dim: Int): Column =
    ColumnBridge.column(SrpSketchExpr(ColumnBridge.expression(vec), planes, dim))

  /** Distinct word n-gram shingles of an `array<string>` token column. */
  def wordShingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(tokens), n))

  /** ALL word n-gram occurrences, position order kept (counting
    * contract — PMI/collocations; [[wordShingles]] dedups per row).
    */
  def wordShinglesAll(tokens: Column, n: Int): Column =
    ColumnBridge.column(
      WordShinglesExpr(ColumnBridge.expression(tokens), n, dedup = false))

  /** L2-normalize an `array<double>` (zero-norm input → zero vector). */
  def l2Normalize(vec: Column): Column =
    ColumnBridge.column(L2NormalizeExpr(ColumnBridge.expression(vec)))

  /** Bloom-filter membership probe against a driver-built sketch
    * (`org.apache.spark.util.sketch.BloomFilter` serialized bytes) via
    * Spark's own codegen'd runtime-filter expression
    * (`BloomFilterMightContain` — deserialized once per task, probed
    * inside whole-stage codegen). `value` must be hashed the same way
    * the sketch was fed: insert and probe xxhash64 LONGS (the
    * expression probes `mightContainLong`).
    */
  def bloomMightContain(sketchBytes: Array[Byte], value: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(sketchBytes),
        ColumnBridge.expression(value)))

  /** Exact top-k (score, id) aggregate with map-side partial combine;
    * returns array<struct<sim,vec_id>> best-first.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScoreAgg(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** Product-quantization encode: `array<double>` vector → `m`-byte code. */
  def pqEncode(vec: Column, codebook: Array[Double], dim: Int, m: Int, ksub: Int): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(vec), codebook, dim, m, ksub))

  /** Per-query ADC lookup table (`array<double>` of length m·ksub). */
  def pqAdcTable(vec: Column, codebook: Array[Double], dim: Int, m: Int, ksub: Int): Column =
    ColumnBridge.column(PqAdcTableExpr(ColumnBridge.expression(vec), codebook, dim, m, ksub))

  /** ADC approximate inner product of a PQ code against a query table. */
  def pqAdcScore(codes: Column, table: Column, ksub: Int): Column =
    ColumnBridge.column(PqAdcScoreExpr(
      ColumnBridge.expression(codes), ColumnBridge.expression(table), ksub))

  /** Unicode NFC canonical composition of a string column. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(text)))

  /** Count of equal positions of two `array<long>` columns (MinHash
    * signature agreement) — one primitive loop per candidate pair.
    */
  def longMatchCount(a: Column, b: Column): Column =
    ColumnBridge.column(LongMatchCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Per-vector symmetric int8 scale (max|x|/127). */
  def int8Scale(vec: Column): Column =
    ColumnBridge.column(Int8ScaleExpr(ColumnBridge.expression(vec)))

  /** int8 codes of a vector under its own symmetric scale (BINARY). */
  def int8Codes(vec: Column): Column =
    ColumnBridge.column(Int8CodesExpr(ColumnBridge.expression(vec)))

  /** Codegen'd integer dot of two int8 code arrays. */
  def int8Dot(a: Column, b: Column): Column =
    ColumnBridge.column(Int8DotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Mixed dot of an `array<double>` vector against int8 codes. */
  def int8MixedDot(vec: Column, codes: Column): Column =
    ColumnBridge.column(Int8MixedDotExpr(
      ColumnBridge.expression(vec), ColumnBridge.expression(codes)))

  /** Sign-bit packing of an `array<double>` vector into 32-bit words
    * (binary quantization signature).
    */
  def packSignBits(vec: Column): Column =
    ColumnBridge.column(PackSignBitsExpr(ColumnBridge.expression(vec)))

  /** Codegen'd Hamming distance between two packed sign-bit
    * signatures ([[packSignBits]]).
    */
  def hammingDistance(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDistanceExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** One BPE merge round over an `array<string>` symbol column: greedy
    * left-to-right non-overlapping replacement of adjacent (a, b) with
    * a+b — the apply step of `TextOps.bpeTrain`'s merge loop.
    */
  def bpeMergePair(syms: Column, a: String, b: String): Column =
    ColumnBridge.column(BpeMergePairExpr(ColumnBridge.expression(syms), a, b))

  /** Dense hashing-trick bag-of-words (`array<double>` of length `dim`)
    * of an `array<string>` token column — the TRAIN-time featurizer of
    * `TextOps.trainQualityModel`.
    */
  def hashedTokenCounts(tokens: Column, dim: Int): Column =
    ColumnBridge.column(HashedTokenCountsExpr(ColumnBridge.expression(tokens), dim))

  /** Hashed char-n-gram counts (the subword train lane; same gram/seed
    * contract as the serving kernel — see HashedTokenBucket).
    */
  def hashedCharNgramCounts(tokens: Column, n: Int, dim: Int): Column =
    ColumnBridge.column(HashedCharNgramCountsExpr(
      ColumnBridge.expression(tokens), n, dim))

  /** sigmoid(intercept + aux·w_prefix + Σ w(bucket(token))) — the
    * SERVING kernel of the learned quality scorer; weights ride as a
    * constructor array so the corpus scan stays a primitive loop with
    * no feature materialization. `hashDim` splits the weight vector:
    * the first `weights.length - hashDim` entries belong to the dense
    * aux features, the rest to the hashed buckets.
    */
  def hashedTokenLogit(aux: Column, tokens: Column, weights: Array[Double],
      hashDim: Int, intercept: Double): Column =
    ColumnBridge.column(HashedTokenLogitExpr(
      ColumnBridge.expression(aux), ColumnBridge.expression(tokens),
      weights, hashDim, intercept))

  /** Multiclass serving kernel of the learned domain classifier:
    * `struct<pred int, prob double>` = softmax argmax over K logits
    * computed in one primitive pass (each token hashes once and adds
    * its bucket weight to every class lane). `weights` is the K ×
    * (nAux + hashDim) matrix flattened row-major; `intercepts` is K.
    */
  def hashedTokenMultiLogit(aux: Column, tokens: Column,
      weights: Array[Double], hashDim: Int,
      intercepts: Array[Double],
      charN: Int = 3, charDim: Int = 0): Column =
    ColumnBridge.column(HashedTokenMultiLogitExpr(
      ColumnBridge.expression(aux), ColumnBridge.expression(tokens),
      weights, hashDim, intercepts, charN, charDim))

  /** Top-`probes` nearest cell ids (array<int>, (dist, cell) ascending)
    * of an `array<double>` query against a flat centroid matrix — the
    * primitive-loop assignment kernel behind `Similarity.probeAssign`.
    */
  def nearestCells(nv: Column, cellIds: Array[Int], cents: Array[Double],
      dim: Int, probes: Int): Column =
    ColumnBridge.column(NearestCellsExpr(ColumnBridge.expression(nv),
      cellIds, cents, dim, probes, Array.emptyDoubleArray,
      Array.emptyIntArray, 0))

  /** Two-level variant: group centroids scored first, members of the
    * `groupProbes` nearest groups ranked. `cents`/`cellIds` packed in
    * group order, delimited by `memberStart` offsets.
    */
  def nearestCellsHier(nv: Column, cellIds: Array[Int], cents: Array[Double],
      dim: Int, probes: Int, groupCents: Array[Double],
      memberStart: Array[Int], groupProbes: Int): Column =
    ColumnBridge.column(NearestCellsExpr(ColumnBridge.expression(nv),
      cellIds, cents, dim, probes, groupCents, memberStart, groupProbes))
}
