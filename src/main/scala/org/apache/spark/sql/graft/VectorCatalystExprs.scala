package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `dot(a, b)` over `array<double>`: one fused multiply-add loop, no
  * allocation. Null array → null; null elements are read as 0 garbage —
  * callers guarantee dense arrays (embeddings are).
  */
case class DotProductD(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0d
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      code"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """.toString
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over a token array: xxhash64 each token (seed 42, same
  * family as `functions.xxhash64`), ±1 bit votes, sign → fingerprint bit.
  * Single JVM call per row (CodegenFallback), zero allocation beyond the
  * 64-int vote buffer.
  */
case class SimHash64Expr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) >= 0) fp |= 1L << b; b += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature in one call: for each shingle, two base xxhash64
  * values (seeds 42 / 1337) combine as g_i = h1 + i·h2
  * (Kirsch-Mitzenmacher); output = per-i minimum over the shingle set as
  * `array<long>`. One string hash pass + numHashes·|shingles| long
  * multiply-adds per row — no per-hash rehashing, no allocation beyond
  * the signature buffer.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XxHash64Function.hash(s, StringType, 42L)
        val h2 = XxHash64Function.hash(s, StringType, 1337L)
        var k = 0
        var g = h1
        while (k < numHashes) {
          if (g < sig(k)) sig(k) = g
          g += h2
          k += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Signed-random-projection sketch: 32 hyperplane sign bits packed into an
  * int (cosine-LSH). Hyperplane matrix passed as a flat double array
  * (row-major, numPlanes × dim), generated once driver-side with a fixed
  * seed.
  */
case class SrpSketchExpr(child: Expression, planes: Array[Double], dim: Int)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "srp_sketch"

  private val numPlanes: Int = planes.length / dim

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var sketch = 0
    var p = 0
    while (p < numPlanes) {
      var s = 0d
      var i = 0
      val base = p * dim
      while (i < n) { s += v.getDouble(i) * planes(base + i); i += 1 }
      if (s >= 0) sketch |= 1 << p
      p += 1
    }
    sketch
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (canonical composition) — the corpus
  * cleaning step that makes `e` + COMBINING ACUTE byte-identical to the
  * precomposed `é` before any dedup/fingerprint/tokenize pass (the same
  * text crawled from two sources often differs only in normalization
  * form, and every downstream hash would miss the duplicate). One
  * `java.text.Normalizer` call per row; already-normalized strings are
  * detected via the quick-check and returned as-is, allocation-free.
  */
case class NfcNormalizeExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram shingles from a token array, in one call:
  * `["a","b","c","d"], n=3` → `["a b c", "b c d"]`. With `dedup=true`
  * (the Jaccard-family contract) duplicates are dropped in
  * first-occurrence order; with `dedup=false` every occurrence is kept
  * in position order (the counting contract — PMI/collocation ops).
  * Replaces the interpreted transform+slice+concat_ws+array_distinct
  * pipeline that dominated the dedup benchmarks.
  */
case class WordShinglesExpr(child: Expression, n: Int, dedup: Boolean = true)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out: java.util.Collection[org.apache.spark.unsafe.types.UTF8String] =
      if (dedup) new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
      else new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](m - n + 1)
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        window(j) = if (toks.isNullAt(i + j)) {
          org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
        } else toks.getUTF8String(i + j)
        j += 1
      }
      out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, window: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encode: split the vector into `m` contiguous
  * subspaces of `dim/m` dims, emit the index of the nearest (max inner
  * product — inputs are L2-normalized per subspace centroid geometry) of
  * `ksub` codebook centroids per subspace, packed as `m` bytes. The
  * codebook is a driver-trained literal, flat layout
  * `[(subspace*ksub + code)*dsub + t]`. This is the memory-bound
  * billion-vector layout: a 64-dim float vector (256 B) becomes `m` bytes
  * in the candidate-generation pass.
  */
case class PqEncodeExpr(child: Expression, codebook: Array[Double], dim: Int, m: Int, ksub: Int)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(dim % m == 0, s"dim $dim must be divisible by m $m")
  require(ksub <= 256, "ksub must fit one byte")
  private val dsub = dim / m

  // Assignment metric must MATCH training (Euclidean k-means):
  // argmin ||x−c||² = argmax (x·c − ||c||²/2). Plain argmax-dot is a
  // different quantizer — biased toward large-norm centroids (a
  // near-zero subvector would pick a far, large centroid over a
  // coincident near-zero one) — inflating ADC scores and polluting the
  // shortlist. Half-norms precomputed once per (subspace, code).
  private val halfNorms: Array[Double] = Array.tabulate(m * ksub) { jc =>
    var s = 0d
    var t = 0
    while (t < dsub) { val x = codebook(jc * dsub + t); s += x * x; t += 1 }
    s / 2
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var s = 0d
        var t = 0
        while (t < dsub) {
          val i = j * dsub + t
          if (i < n) s += v.getDouble(i) * codebook(base + t)
          t += 1
        }
        val score = s - halfNorms(j * ksub + c)
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    codes
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC (asymmetric distance computation) lookup table: for each
  * (subspace, code) pair, the inner product of the query's subvector with
  * that codebook centroid — `array<double>` of length `m*ksub`. Computed
  * once per QUERY row; scoring a corpus code against it is then `m` array
  * lookups instead of a `dim`-wide dot product ([[PqAdcScoreExpr]]).
  */
case class PqAdcTableExpr(child: Expression, codebook: Array[Double], dim: Int, m: Int, ksub: Int)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(dim % m == 0, s"dim $dim must be divisible by m $m")
  private val dsub = dim / m

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_table"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val table = new Array[Any](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var s = 0d
        var t = 0
        while (t < dsub) {
          val i = j * dsub + t
          if (i < n) s += v.getDouble(i) * codebook(base + t)
          t += 1
        }
        table(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(table)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score: `sum_j table[j*ksub + codes[j]]` — the approximate inner
  * product of a PQ-coded corpus vector with the query behind `table`.
  * The per-pair hot loop of PQ search: m byte reads + m adds, no
  * dim-wide math.
  */
case class PqAdcScoreExpr(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override protected def nullSafeEval(codesAny: Any, tableAny: Any): Any = {
    val codes = codesAny.asInstanceOf[Array[Byte]]
    val table = tableAny.asInstanceOf[ArrayData]
    var s = 0d
    var j = 0
    while (j < codes.length) {
      s += table.getDouble(j * ksub + (codes(j) & 0xff))
      j += 1
    }
    s
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2-normalize an `array<double>` in one call: one pass for the norm,
  * one for the division. Zero-norm input → all-zero vector. Replaces the
  * higher-order `transform(v, x / norm(v))` formulation, which re-evaluates
  * the interpreted norm aggregate once per ELEMENT (O(dim^2) lambda steps
  * per row).
  */
case class L2NormalizeExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "l2_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    // A null element poisons the vector: result is null (matches the
    // higher-order formulation this replaced, where norm became null).
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    var ss = 0d
    i = 0
    while (i < n) { val x = v.getDouble(i); ss += x * x; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Any](n)
    i = 0
    if (norm == 0d) {
      while (i < n) { out(i) = 0d; i += 1 }
    } else {
      while (i < n) { out(i) = v.getDouble(i) / norm; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-bit packing for binary quantization: dimension signs (`> 0`)
  * fold MSB-first into 32-bit words stored as longs (`acc·2 + bit` —
  * bit-identical to the HOF formulation it replaced, pinned in
  * OpsSpec). 32-bit chunks keep the accumulation below 2³² so the
  * equivalent SQL restatement can never trip ANSI overflow; Hamming
  * via `bit_count(xor)` is chunk-size-agnostic. Runs once per row per
  * scan (not in the pair loop), so a tight interpreted primitive loop
  * suffices; null elements read as 0d = sign bit 0 (embeddings are
  * dense).
  */
case class PackSignBitsExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pack_sign_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val words = (n + 31) / 32
    val out = new Array[Any](words)
    var w = 0
    while (w < words) {
      var acc = 0L
      var j = w * 32
      val end = math.min(j + 32, n)
      while (j < end) {
        acc = acc * 2 + (if (!v.isNullAt(j) && v.getDouble(j) > 0d) 1L else 0L)
        j += 1
      }
      out(w) = acc
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance between two packed sign-bit signatures
  * ([[PackSignBitsExpr]]): Σ Long.bitCount(xᵢ ⊕ yᵢ) over the shared
  * prefix. This is the PAIR-HOT kernel of the binary-quantized ANN
  * candidate scan (|corpus|·|queries| evaluations), so it carries
  * `doGenCode` — the zip_with/aggregate HOF formulation it replaced is
  * CodegenFallback and measured SLOWER than the exact float dot scan
  * it exists to beat (interpreted megamorphic eval per pair).
  */
case class HammingDistanceExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // Equal lengths REQUIRED: silently scoring the shared prefix would
    // hand a wrong-dims query plausible-but-wrong neighbors (and the
    // DuckDB oracle errors on mismatched lists, so the engines would
    // also diverge quietly).
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"hamming_distance: signature lengths differ: $n vs ${y.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      code"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          throw new IllegalArgumentException(
            "hamming_distance: signature lengths differ: " + $n +
            " vs " + $b.numElements());
        }
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
        }
        ${ev.value} = $s;
      """.toString
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-vector symmetric int8 scale: `max|xᵢ| / 127` — the scalar
  * quantization ("SQ8") convention: codes = round(x / scale) land in
  * [−127, 127] and `scaleA·scaleB·Σ codeA·codeB` approximates the dot
  * product at 4× under float32. Zero vectors scale to 0 (codes all 0,
  * approx dot 0 — no division anywhere downstream).
  */
case class Int8ScaleExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "int8_scale"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var m = 0d
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val a = math.abs(v.getDouble(i))
        if (a > m) m = a
      }
      i += 1
    }
    m / 127d
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** int8 codes of a vector under its own [[Int8ScaleExpr]] scale, as
  * BINARY (one signed byte per dimension): `round(xᵢ / scale)` with
  * round-half-AWAY-FROM-ZERO — the same tie rule DuckDB's and Spark
  * SQL's `round` use, so an oracle can restate the quantization
  * bit-for-bit (`Math.round`'s half-up would disagree on negative
  * ties). |xᵢ/scale| ≤ 127 + ulp by construction, so codes fit int8
  * without clamping. Zero scale → all-zero codes.
  */
case class Int8CodesExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "int8_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var m = 0d
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val a = math.abs(v.getDouble(i))
        if (a > m) m = a
      }
      i += 1
    }
    val s = m / 127d
    val out = new Array[Byte](n)
    if (s > 0d) {
      i = 0
      while (i < n) {
        val x = if (v.isNullAt(i)) 0d else v.getDouble(i) / s
        val r = if (x >= 0d) math.floor(x + 0.5d) else -math.floor(-x + 0.5d)
        out(i) = r.toByte
        i += 1
      }
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer dot product of two int8 code arrays ([[Int8CodesExpr]]) —
  * the PAIR-HOT kernel of the scalar-quantized candidate scan
  * (|corpus|·|queries| evaluations ⇒ `doGenCode`, the
  * [[HammingDistanceExpr]] stance): Σ aᵢ·bᵢ over the shared prefix,
  * exact in long (≤ dims·127² never overflows).
  */
case class Int8DotExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "int8_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    // Equal lengths REQUIRED — the [[HammingDistanceExpr]] stance: a
    // wrong-dims code array must fail loudly, not score its prefix.
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"int8_dot: code lengths differ: ${x.length} vs ${y.length}")
    val n = x.length
    var s = 0L
    var i = 0
    while (i < n) { s += x(i).toLong * y(i).toLong; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      code"""
        int $n = $a.length;
        if ($n != $b.length) {
          throw new IllegalArgumentException(
            "int8_dot: code lengths differ: " + $n + " vs " + $b.length);
        }
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $s += (long) $a[$i] * (long) $b[$i];
        }
        ${ev.value} = $s;
      """.toString
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Mixed dot product of a double vector against int8 codes
  * ([[Int8CodesExpr]]): Σ vᵢ·codesᵢ — the numerator of the SQ8
  * reconstruction-fidelity cosine (the scale cancels out of the
  * ratio). Corpus-linear (once per row), primitive interpreted loop.
  */
case class Int8MixedDotExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_mixed_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.numElements(), y.length)
    var s = 0d
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) s += x.getDouble(i) * y(i).toDouble
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Top-`probes` nearest cells of a query vector against a centroid table
  * held as primitive arrays INSIDE the expression — the assignment kernel
  * of the ANN family (`Similarity.probeAssign`), replacing the
  * transform/array_sort/slice higher-order pipeline.
  *
  * Why not HOFs: higher-order functions are `CodegenFallback` — the whole
  * ranking ran through interpreted Catalyst `eval` (one virtual
  * `InterpretedOrdering.compare` + two `BoundReference.eval` per SORT
  * COMPARISON). The r10 thread-dump of a slow run showed all 32 executor
  * threads on-CPU inside exactly that chain, and identical code measured
  * 2.5 s vs ~39 s across JVMs as HotSpot's profile-driven inlining of the
  * megamorphic eval tree landed well or badly — a bimodality no JVM flag
  * fixed. A constructor-held `Array[Double]` scanned by a while-loop is
  * deterministic-fast (scalar FMA per element) and ships once per task in
  * the serialized plan, like the `typedLit` it replaces.
  *
  * Semantics are EXACTLY the HOF path's (OpsSpec/RecallSpec pin hier ≡
  * flat ≡ this): dist = ||c||²/2 − x·c with the same left-to-right
  * accumulation order (bit-identical doubles), ranked by (dist, cell id)
  * ascending with `java.lang.Double.compare` tie semantics — the
  * `array_sort` struct order it replaces.
  *
  * Two-level mode (`memberStart` non-empty): `groupCents` are scored
  * first, members of the `groupProbes` nearest groups (by (dist, group
  * position); positions follow ascending original group id) are then
  * ranked. `cents`/`cellIds` hold the centroids PACKED in group order and
  * `memberStart(g)..memberStart(g+1)` delimits group g's members. Flat
  * mode: `memberStart` empty, every centroid scored.
  */
case class NearestCellsExpr(
    child: Expression,
    cellIds: Array[Int],
    cents: Array[Double],
    dim: Int,
    probes: Int,
    groupCents: Array[Double],
    memberStart: Array[Int],
    groupProbes: Int)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  private val nCells = cellIds.length
  require(cents.length == nCells * dim, "cents must be nCells*dim flat")

  // Same accumulation order as the driver-side `c.map(x*x).sum / 2` the
  // replaced typedLit carried — dist values stay bit-identical.
  private val halfNorms: Array[Double] = Array.tabulate(nCells) { i =>
    var s = 0d
    var t = 0
    while (t < dim) { val x = cents(i * dim + t); s += x * x; t += 1 }
    s / 2
  }
  private val nGroups = if (memberStart.isEmpty) 0 else memberStart.length - 1
  private val groupHalfNorms: Array[Double] = Array.tabulate(nGroups) { g =>
    var s = 0d
    var t = 0
    while (t < dim) { val x = groupCents(g * dim + t); s += x * x; t += 1 }
    s / 2
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val q = new Array[Double](n)
    var i = 0
    while (i < n) { q(i) = v.getDouble(i); i += 1 }

    val k = math.min(probes, nCells)
    if (k <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val bd = new Array[Double](k)
    val bc = new Array[Int](k)
    var filled = 0

    // Bounded ascending insertion by (dist, cell id) — k is the probe
    // count (1–3 in every caller), so the shift is a handful of moves.
    def offer(dist: Double, cid: Int): Unit = {
      if (filled == k) {
        val c = java.lang.Double.compare(dist, bd(k - 1))
        if (c > 0 || (c == 0 && cid >= bc(k - 1))) return
      }
      var pos = math.min(filled, k - 1)
      while (pos > 0 && {
        val c = java.lang.Double.compare(dist, bd(pos - 1))
        c < 0 || (c == 0 && cid < bc(pos - 1))
      }) {
        bd(pos) = bd(pos - 1); bc(pos) = bc(pos - 1); pos -= 1
      }
      bd(pos) = dist; bc(pos) = cid
      if (filled < k) filled += 1
    }

    def scoreCell(ci: Int): Unit = {
      val base = ci * dim
      var s = 0d
      var t = 0
      while (t < n) { s += q(t) * cents(base + t); t += 1 }
      offer(halfNorms(ci) - s, cellIds(ci))
    }

    if (nGroups == 0) {
      var c = 0
      while (c < nCells) { scoreCell(c); c += 1 }
    } else {
      val gp = math.min(math.max(1, groupProbes), nGroups)
      val gd = new Array[Double](gp)
      val gi = new Array[Int](gp)
      var gf = 0
      var g = 0
      while (g < nGroups) {
        val base = g * dim
        var s = 0d
        var t = 0
        while (t < n) { s += q(t) * groupCents(base + t); t += 1 }
        val dist = groupHalfNorms(g) - s
        // (dist, position) ascending; positions follow ascending group id.
        var skip = false
        if (gf == gp) {
          val c = java.lang.Double.compare(dist, gd(gp - 1))
          if (c > 0 || (c == 0 && g >= gi(gp - 1))) skip = true
        }
        if (!skip) {
          var pos = math.min(gf, gp - 1)
          while (pos > 0 && {
            val c = java.lang.Double.compare(dist, gd(pos - 1))
            c < 0 || (c == 0 && g < gi(pos - 1))
          }) {
            gd(pos) = gd(pos - 1); gi(pos) = gi(pos - 1); pos -= 1
          }
          gd(pos) = dist; gi(pos) = g
          if (gf < gp) gf += 1
        }
        g += 1
      }
      var j = 0
      while (j < gf) {
        val grp = gi(j)
        var m = memberStart(grp)
        val end = memberStart(grp + 1)
        while (m < end) { scoreCell(m); m += 1 }
        j += 1
      }
    }

    val out = new Array[Any](filled)
    var j = 0
    while (j < filled) { out(j) = bc(j); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of positions where two `array<long>` columns hold equal values
  * (over the shorter length) — the MinHash signature-agreement kernel.
  * Replaces a `zip_with` + `aggregate` HOF pair evaluated interpreted per
  * CANDIDATE PAIR (numHashes lambda steps each, on the band-join output —
  * the volume the LSH banding exists to bound, but still the widest
  * post-join stream in the near-dup family). Integer counting — result is
  * exactly the HOF formulation's on dense equal-length signatures.
  */
case class LongMatchCountExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "long_match_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One BPE training merge applied to a symbol array: greedy
  * left-to-right, non-overlapping replacement of each ADJACENT
  * (`a`, `b`) with the concatenation `a+b` — `["a","a","a"]` under
  * merge (a, a) → `["aa","a"]` — the classic BPE apply step (Sennrich
  * et al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"), bit-compatible with non-overlapping left-to-right string
  * `replace` on a delimiter-wrapped rendering, which is how the DuckDB
  * oracle restates it. The pair is a per-round driver constant (the
  * training loop collects the argmax pair — one row — then stacks one
  * of these per round), so it rides the serialized plan; the vocab
  * table it maps over never shuffles for the apply.
  */
case class BpeMergePairExpr(child: Expression, a: String, b: String)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge_pair"

  @transient private lazy val ua =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
  @transient private lazy val ub =
    org.apache.spark.unsafe.types.UTF8String.fromString(b)
  @transient private lazy val uab =
    org.apache.spark.unsafe.types.UTF8String.fromString(a + b)

  override protected def nullSafeEval(input: Any): Any = {
    val syms = input.asInstanceOf[ArrayData]
    val m = syms.numElements()
    val out = new java.util.ArrayList[Any](m)
    var i = 0
    while (i < m) {
      val cur =
        if (syms.isNullAt(i)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
        else syms.getUTF8String(i)
      if (i + 1 < m && cur == ua && !syms.isNullAt(i + 1) &&
          syms.getUTF8String(i + 1) == ub) {
        out.add(uab)
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
