package graft.ops

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for training-data pipelines, at four levels of
  * fuzziness: exact, n-gram Jaccard, MinHash+LSH, and SimHash. Embedding
  * cosine near-dup lives in [[Similarity]].
  *
  * Scale design (100 TB):
  *   - exact dedup is a single hash aggregate on the dedup key;
  *   - n-gram Jaccard joins on individual shingles — the only quadratic
  *     blowup risk is ultra-common shingles, so [[ngramJaccardPairs]] can
  *     drop shingles above a document-frequency cap (stopword shingles
  *     contribute almost nothing to Jaccard but dominate join fanout);
  *   - MinHash LSH reduces candidate generation to equality joins on
  *     banded signatures (spark.ml, shuffle on band hash);
  *   - SimHash packs a document into 64 bits; candidate pairs come from
  *     equality joins on 16-bit bands (pigeonhole: hamming ≤ 3 ⇒ some
  *     band equal), then exact hamming ranks survivors. Everything is
  *     built-in expressions — no UDFs.
  */
object Dedup {

  /** Exact dedup (pandas drop_duplicates): keep all columns, first row
    * per key by `orderCol`.
    */
  def exactKeepFirst(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** All-pairs n-gram Jaccard similarity ≥ threshold. Exact (no hashing):
    * explode distinct shingles, self-join per shingle, count common.
    *
    * @param maxShingleDocFreq drop shingles appearing in more than this
    *        many documents (0 = keep all; exact but skew-prone at scale)
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleDocFreq: Long = 0L): DataFrame = {

    val sh0 = df.select(col(idCol).as("id"),
        explode(TextOps.shingles(col(textCol), n)).as("s"))
    val sh =
      if (maxShingleDocFreq <= 0) sh0
      else {
        val hot = sh0.groupBy("s").count().where(col("count") > maxShingleDocFreq).select("s")
        sh0.join(broadcast(hot), Seq("s"), "left_anti")
      }
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))

    val common = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("common"))

    common
      .join(counts.select(col("id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(counts.select(col("id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash+LSH candidate pairs via spark.ml (HashingTF on shingles →
    * banded MinHash signatures → equality join on bands). Approximate:
    * returns candidates with estimated Jaccard distance ≤ threshold.
    */
  def minhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      distanceThreshold: Double = 0.3,
      numHashTables: Int = 8): DataFrame = {

    val withShingles = df.select(col(idCol).as("id"),
        TextOps.shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feats = tf.transform(withShingles)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("sig")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(feats)
    model.approxSimilarityJoin(feats, feats, distanceThreshold, "jaccard_dist")
      .select(
        col("datasetA.id").as("doc_a"),
        col("datasetB.id").as("doc_b"),
        round(lit(1.0) - col("jaccard_dist"), 4).as("est_jaccard"))
      .where(col("doc_a") < col("doc_b"))
  }

  /** 64-bit SimHash of the token stream: per token, xxhash64 bits vote
    * +1/-1 per position; fingerprint bit b = sign of vote b. Pure
    * higher-order-function fold — per-row, no shuffle.
    */
  def simhash64(textCol: Column): Column = {
    val toks = TextOps.tokens(textCol)
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, bitVector(h), (a, v) => a + v)
      })
    val bits = transform(votes, v => when(v >= 0, 1L).otherwise(0L))
    val powers = array((0 until 64).map(b => lit(1L << b)): _*)
    aggregate(zip_with(bits, powers, (b, p) => b * p), lit(0L), (a, x) => a + x)
  }

  /** ±1 vote vector from the 64 bits of a long. */
  private def bitVector(h: Column): Column =
    array((0 until 64).map(
      b => when(shiftrightunsigned(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)): _*)

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, using
    * 16-bit band equality for candidate generation (exact for
    * maxHamming ≤ 3 by pigeonhole over 4 bands).
    */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {

    val fp = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("fp"))
    val banded = fp.select(col("id"), col("fp"),
      posexplode(array((0 until 4).map(
        i => shiftrightunsigned(col("fp"), i * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")

    banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
