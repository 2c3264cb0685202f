package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's custom expressions as SQL functions, so
  * `spark.sql("SELECT vec_dot(a, b) …")` works alongside the Column API.
  *
  * Two entry points:
  *   - [[GraftFunctionRegistry.register]] for an existing session;
  *   - [[GraftExtensions]] for cluster deployment via
  *     `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  */
object GraftFunctionRegistry {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in")

  /** Evaluate a builder argument that must be a foldable non-null integer
    * (e.g. the shingle width), failing analysis cleanly — not with a
    * ClassCastException/NPE at plan-build — on `word_shingles(toks, col)`
    * or a NULL literal.
    */
  private def constInt(fn: String, arg: String, e: Expression): Int = {
    if (!e.foldable) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_1332",
        messageParameters = Map("errorMessage" ->
          s"$fn() requires a constant integer for $arg, got non-foldable: ${e.sql}"))
    }
    e.eval() match {
      case n: Number => n.intValue()
      case other =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_1332",
          messageParameters = Map("errorMessage" ->
            s"$fn() requires a non-null constant integer for $arg, got: $other"))
    }
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double>"),
      (e: Seq[Expression]) => DotProductD(e.head, e(1))),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of array<string>"),
      (e: Seq[Expression]) => SimHash64Expr(e.head)),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(tokens, n) - distinct word n-grams"),
      (e: Seq[Expression]) => WordShinglesExpr(e.head,
        constInt("word_shingles", "n", e(1)))),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingles, k) - k-minhash array<long>"),
      (e: Seq[Expression]) => MinHashSignatureExpr(e.head,
        constInt("minhash_signature", "k", e(1)))),
    (FunctionIdentifier("l2_normalize"),
      info("l2_normalize", "l2_normalize(v) - L2-normalized array<double>"),
      (e: Seq[Expression]) => L2NormalizeExpr(e.head)),
    (FunctionIdentifier("topk_by_score"),
      info("topk_by_score",
        "topk_by_score(score, id, k) - exact top-k aggregate with map-side combine; " +
          "returns array<struct<sim,vec_id>> best-first"),
      (e: Seq[Expression]) => TopKByScoreAgg(e.head, e(1),
        constInt("topk_by_score", "k", e(2))).toAggregateExpression()),
    (FunctionIdentifier("srp_sketch"),
      info("srp_sketch",
        "srp_sketch(v, num_planes, dim[, seed]) - signed-random-projection bit sketch " +
          "of an array<double> (same plane family as Similarity.srpNeighbors)"),
      (e: Seq[Expression]) => {
        val numPlanes = constInt("srp_sketch", "num_planes", e(1))
        val dim = constInt("srp_sketch", "dim", e(2))
        val seed = if (e.length > 3) constInt("srp_sketch", "seed", e(3)).toLong else 42L
        val rng = new scala.util.Random(seed)
        SrpSketchExpr(e.head, Array.fill(numPlanes * dim)(rng.nextGaussian()), dim)
      }),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonical composition"),
      (e: Seq[Expression]) => NfcNormalizeExpr(e.head)),
    // Column-composed text ops (built-in expression trees, still fully
    // codegen'd) exposed to SQL through the Column bridge.
    (FunctionIdentifier("redact_pii"),
      info("redact_pii", "redact_pii(text) - email/phone/IPv4 replaced with sentinel tokens"),
      (e: Seq[Expression]) => ColumnBridge.catalystExpression(
        graft.ops.TextOps.redactPii(ColumnBridge.column(e.head)))),
    (FunctionIdentifier("bpe_token_count"),
      info("bpe_token_count", "bpe_token_count(text) - GPT-2-style pre-token count"),
      (e: Seq[Expression]) => ColumnBridge.catalystExpression(
        graft.ops.TextOps.bpeTokenCount(ColumnBridge.column(e.head)))),
    (FunctionIdentifier("lang_id"),
      info("lang_id", "lang_id(text) - stopword/script-heuristic language code"),
      (e: Seq[Expression]) => ColumnBridge.catalystExpression(
        graft.ops.TextOps.langId(ColumnBridge.column(e.head)))),
    (FunctionIdentifier("quality_score"),
      info("quality_score", "quality_score(text) - [0,1] heuristic corpus-quality score"),
      (e: Seq[Expression]) => ColumnBridge.catalystExpression(
        graft.ops.TextOps.qualityScore(ColumnBridge.column(e.head)))))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, inf, builder) =>
      registry.registerFunction(ident, inf, builder)
    }
  }
}

/** `spark.sql.extensions` hook injecting the function set at session build
  * time (survives into every derived session on a cluster).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctionRegistry.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => IdRangePruningRule)
    ext.injectOptimizerRule(_ => DatePartitionPruningRule)
  }
}
