package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared hashing-trick bucket function for the learned quality scorer:
  * xxhash64(token, seed 42) reduced to [0, dim) by floor-mod. TRAINING
  * ([[HashedTokenCountsExpr]]) and SERVING ([[HashedTokenLogitExpr]])
  * must agree bucket-for-bucket or the learned weights are garbage at
  * score time — both call THIS function, and TextModelSpec pins the
  * equivalence against an in-memory reference.
  */
object HashedTokenBucket {
  def bucket(token: org.apache.spark.unsafe.types.UTF8String, dim: Int): Int = {
    val h = XxHash64Function.hash(token, StringType, 42L)
    (((h % dim) + dim) % dim).toInt
  }

  /** Character-n-gram bucket stream of one token — the fastText subword
    * lane (languages and domains separate on character shapes long
    * before whole-word vocabularies do, and hashed whole words can't
    * see morphology at all). Seed 4242, distinct from the word lane's
    * 42, so a token and its own n-gram never collide systematically.
    * Tokens shorter than `n` contribute themselves as one gram (short
    * function words are exactly the strongest language markers).
    * TRAIN ([[HashedCharNgramCountsExpr]]) and SERVE
    * ([[HashedTokenMultiLogitExpr]]) both iterate THIS function;
    * TextModelSpec pins the equivalence.
    */
  def foreachCharNgramBucket(
      token: org.apache.spark.unsafe.types.UTF8String,
      n: Int,
      dim: Int)(f: Int => Unit): Unit = {
    val len = token.numChars()
    if (len <= n) {
      val h = XxHash64Function.hash(token, StringType, 4242L)
      f((((h % dim) + dim) % dim).toInt)
    } else {
      var i = 0
      while (i + n <= len) {
        val h = XxHash64Function.hash(token.substring(i, i + n), StringType, 4242L)
        f((((h % dim) + dim) % dim).toInt)
        i += 1
      }
    }
  }
}

/** Dense hashed bag-of-words featurizer (the fastText/C4-classifier
  * feature shape): `array<string>` tokens → `array<double>` of length
  * `dim`, where slot i counts token occurrences hashing to bucket i.
  * Feeds `org.apache.spark.ml.functions.array_to_vector` →
  * LogisticRegression at TRAIN time only (training runs over a bounded
  * sample, so a dense dim-length row is fine); the corpus-scale scoring
  * pass never materializes features — see [[HashedTokenLogitExpr]].
  * Null tokens are skipped; one primitive loop per row, no UDF.
  */
case class HashedTokenCountsExpr(child: Expression, dim: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(dim > 0, "dim must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hashed_token_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Double](dim)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        counts(HashedTokenBucket.bucket(arr.getUTF8String(i), dim)) += 1d
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dense hashed CHARACTER-n-gram featurizer — [[HashedTokenCountsExpr]]'s
  * subword sibling (train-time lane of the domain classifier's char
  * features; see [[HashedTokenBucket.foreachCharNgramBucket]] for the
  * gram/seed contract). `array<string>` tokens → `array<double>` of
  * length `dim` counting n-gram bucket occurrences across all tokens.
  */
case class HashedCharNgramCountsExpr(child: Expression, n: Int, dim: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n > 0, "n must be positive")
  require(dim > 0, "dim must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hashed_char_ngram_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Double](dim)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        HashedTokenBucket.foreachCharNgramBucket(
          arr.getUTF8String(i), n, dim)(b => counts(b) += 1d)
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Serving half of the learned quality scorer:
  * sigmoid(intercept + aux·w[0,nAux) + Σ_token w(nAux + bucket(token)))
  * over an `array<double>` dense-feature column and an `array<string>`
  * token column — the exact mirror of the train-time feature layout
  * (dense engineered stats first, hashed bag-of-words after; a linear
  * model needs the dense stats because the quality rules are BANDS in
  * length/shape space that token counts alone cannot express). The
  * trained weight vector rides along as a CONSTRUCTOR array (the
  * `typedLit`/constant-table discipline — per-element literals would
  * blow the codegen budget, and a higher-order-function dot product
  * would run interpreted), so scoring a 100 TB corpus is one
  * shuffle-free scan: a short dot, one hash + indexed add per token,
  * one exp. No feature vector is ever materialized.
  */
case class HashedTokenLogitExpr(
    left: Expression,
    right: Expression,
    weights: Array[Double],
    hashDim: Int,
    intercept: Double)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ExpectsInputTypes with CodegenFallback {

  require(hashDim > 0 && weights.length >= hashDim,
    "weights must cover hashDim hashed buckets (plus any aux prefix)")
  private val nAux = weights.length - hashDim

  /** left = aux dense features, right = tokens. */
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_token_logit"

  override protected def nullSafeEval(aux: Any, toks: Any): Any = {
    val a = aux.asInstanceOf[ArrayData]
    val t = toks.asInstanceOf[ArrayData]
    var z = intercept
    // The aux array must match the model's dense prefix exactly: a
    // shorter array means train/serve FEATURE-LAYOUT DRIFT (the model
    // was fit with aux stats this caller isn't providing), and silently
    // dropping weight terms would score every row wrong. Fail loudly.
    if (a.numElements() != nAux) {
      throw new IllegalArgumentException(
        s"hashed_token_logit: aux feature array has ${a.numElements()} " +
          s"elements but the model was trained with $nAux dense features " +
          "before its hashed buckets — train/serve layout drift")
    }
    var i = 0
    while (i < nAux) { z += a.getDouble(i) * weights(i); i += 1 }
    i = 0
    while (i < t.numElements()) {
      if (!t.isNullAt(i)) {
        z += weights(nAux + HashedTokenBucket.bucket(t.getUTF8String(i), hashDim))
      }
      i += 1
    }
    1d / (1d + math.exp(-z))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Multiclass sibling of [[HashedTokenLogitExpr]] — the serving kernel
  * of the learned DOMAIN classifier (fastText-shaped softmax over
  * hashed bag-of-words + char-n-gram subwords + dense aux stats).
  * `weights` is the K × (nAux + hashDim + charDim) coefficient matrix
  * flattened row-major (dense aux prefix, word-bucket lane, then the
  * char-n-gram lane — `charDim` 0 disables it); `intercepts` has one
  * entry per class. Per row: K logits accumulate in one pass (each
  * token hashes ONCE per lane gram, then adds its bucket weight to
  * every class lane), softmax normalizes, and the result is a
  * `struct<pred int, prob double>` — argmax class index (ties break to
  * the smallest index, so scoring is deterministic) and its softmax
  * probability. Same constructor-array discipline as the binary
  * scorer: classifying a 100 TB corpus into domains is one
  * shuffle-free scan, no feature vector, no UDF, no join.
  */
case class HashedTokenMultiLogitExpr(
    left: Expression,
    right: Expression,
    weights: Array[Double],
    hashDim: Int,
    intercepts: Array[Double],
    charN: Int = 3,
    charDim: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ExpectsInputTypes with CodegenFallback {

  private val k = intercepts.length
  require(k >= 2, "need at least two classes")
  require(charDim >= 0 && (charDim == 0 || charN > 0),
    "charDim must be >= 0, with charN > 0 when the char lane is on")
  require(hashDim > 0 && weights.length % k == 0,
    "weights must be a K x (nAux + hashDim + charDim) row-major matrix")
  private val stride = weights.length / k
  private val nAux = stride - hashDim - charDim
  require(nAux >= 0,
    "per-class weight rows must cover hashDim + charDim buckets")

  /** left = aux dense features, right = tokens. */
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("pred", IntegerType, nullable = false),
    StructField("prob", DoubleType, nullable = false)))
  override def prettyName: String = "hashed_token_multi_logit"

  override protected def nullSafeEval(aux: Any, toks: Any): Any = {
    val a = aux.asInstanceOf[ArrayData]
    val t = toks.asInstanceOf[ArrayData]
    if (a.numElements() != nAux) {
      throw new IllegalArgumentException(
        s"hashed_token_multi_logit: aux feature array has " +
          s"${a.numElements()} elements but the model was trained with " +
          s"$nAux dense features before its hashed buckets — train/serve " +
          "layout drift")
    }
    val z = new Array[Double](k)
    var c = 0
    while (c < k) { z(c) = intercepts(c); c += 1 }
    var i = 0
    while (i < nAux) {
      val v = a.getDouble(i)
      c = 0
      while (c < k) { z(c) += v * weights(c * stride + i); c += 1 }
      i += 1
    }
    i = 0
    while (i < t.numElements()) {
      if (!t.isNullAt(i)) {
        val tok = t.getUTF8String(i)
        val b = nAux + HashedTokenBucket.bucket(tok, hashDim)
        c = 0
        while (c < k) { z(c) += weights(c * stride + b); c += 1 }
        if (charDim > 0) {
          val base = nAux + hashDim
          HashedTokenBucket.foreachCharNgramBucket(tok, charN, charDim) { g =>
            var cc = 0
            while (cc < k) { z(cc) += weights(cc * stride + base + g); cc += 1 }
          }
        }
      }
      i += 1
    }
    var best = 0
    c = 1
    while (c < k) { if (z(c) > z(best)) best = c; c += 1 }
    var denom = 0d
    c = 0
    while (c < k) { denom += math.exp(z(c) - z(best)); c += 1 }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    row.setInt(0, best)
    row.setDouble(1, 1d / denom)
    row
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
