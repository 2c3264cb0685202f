package graft.ops

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.VectorExpressions.dotD

/** Embedding similarity search over `ArrayType(FloatType)` columns.
  *
  * The scalar kernel (dot / norm / cosine) is built from array
  * higher-order functions — native Catalyst expressions, no UDF
  * serialization. Strategies, in scale order:
  *
  *   1. [[topKPerQuery]] — brute force: broadcast the (small) query set,
  *      one pass over the corpus, per-query top-k via window. Exact;
  *      O(|corpus|·|queries|·dim) FLOPs but embarrassingly parallel and
  *      shuffle-free until the final tiny top-k aggregation. The right
  *      baseline when |queries| is small, even at 100 TB of corpus.
  *   2. [[lshNeighbors]] — BucketedRandomProjectionLSH on L2-normalized
  *      vectors (euclidean on the unit sphere is monotone in cosine):
  *      candidate generation by bucket-equality join, then exact re-rank.
  *      Approximate; corpus-scale independent of |queries|.
  *   3. [[ivfTopK]] — inverted-file ANN: k-means coarse quantizer
  *      (spark.ml KMeans), partition the corpus by nearest centroid,
  *      probe the nProbe nearest centroids per query. The classic
  *      billion-vector layout: candidate set shrinks by nlist/nProbe.
  */
object Similarity {

  /** Exact dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0d, 0d).otherwise(dot(a, b) / d)
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** L2-normalize once per row (single native call — see
    * [[org.apache.spark.sql.graft.L2NormalizeExpr]]) so pair scoring is a
    * single codegen'd dot product (`cos(a,b) = dot(â,b̂)`) instead of dot
    * + two norms per pair. Zero vectors normalize to zeros (cosine 0
    * against everything).
    */
  def normalize(v: Column): Column =
    graft.functions.VectorExpressions.l2Normalize(v)

  /** Exact top-k neighbors for each query vector (brute force, broadcast
    * queries). Excludes self-matches on id equality.
    */
  def topKPerQuery(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {

    val c = corpus.select(col(idCol).as("vec_id"),
      normalize(asDouble(col(vecCol))).as("nv"))
    val q = queries.select(col(idCol).as("query_id"),
      normalize(asDouble(col(vecCol))).as("qnv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dotD(col("qnv"), col("nv")), 6).as("sim"))
    // Bounded-heap aggregate with map-side combine: each partition ships
    // <= k candidates per query instead of sorting the whole scored
    // corpus through the shuffle (TopKByScoreAgg).
    scored
      .groupBy("query_id")
      .agg(graft.functions.VectorExpressions
        .topKByScore(col("sim"), col("vec_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(
        col("query_id"),
        col("col.vec_id").as("vec_id"),
        col("col.sim").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup detection).
    * Exact; for corpora too large for the self-join, use [[lshNeighbors]]
    * first as a candidate filter.
    */
  def nearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val e = corpus.select(col(idCol).as("id"),
      normalize(asDouble(col(vecCol))).as("nv"))
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        dotD(col("a.nv"), col("b.nv")).as("sim"))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** Approximate neighbors via random-projection LSH over normalized
    * vectors; euclidean distance on the unit sphere = sqrt(2-2·cos), so
    * the bucket join preserves cosine order. Returns candidate pairs with
    * exact cosine attached (re-ranked).
    */
  def lshNeighbors(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      euclidThreshold: Double = 1.2,
      bucketLength: Double = 0.5,
      numHashTables: Int = 4): DataFrame = {

    val e = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", normalize(col("v")))
      .withColumn("features", array_to_vector(col("nv")))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(e)
    model.approxSimilarityJoin(e, e, euclidThreshold, "euclid")
      .select(
        col("datasetA.id").as("id_a"),
        col("datasetB.id").as("id_b"),
        round(dotD(col("datasetA.nv"), col("datasetB.nv")), 6).as("sim"))
      .where(col("id_a") < col("id_b"))
  }

  /** Native cosine-LSH: signed-random-projection sketches (one codegen'd
    * expression call per row), banded equality join for candidates, exact
    * dot-product re-rank. P(band match) = (1-θ/π)^bitsPerBand per band —
    * tuned for high-similarity search; corpus-size-linear sketch pass +
    * an equality-join shuffle, the ANN shape that scales past the
    * brute-force cross join.
    */
  def srpNeighbors(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      cosThreshold: Double,
      numPlanes: Int = 24,
      bands: Int = 4): DataFrame = {

    require(numPlanes % bands == 0 && numPlanes <= 32, "numPlanes = bands * bits, <= 32")
    val bitsPerBand = numPlanes / bands
    val rng = new scala.util.Random(42L)
    val planes = Array.fill(numPlanes * dim)(rng.nextGaussian())

    val e = corpus.select(col(idCol).as("id"),
        normalize(asDouble(col(vecCol))).as("nv"))
      .withColumn("sketch", graft.functions.VectorExpressions.srpSketch(col("nv"), planes, dim))
    val mask = (1 << bitsPerBand) - 1
    val banded = e.select(col("id"), col("nv"),
      posexplode(array((0 until bands).map(
        b => shiftrightunsigned(col("sketch"), b * bitsPerBand).bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")

    banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.nv").as("nva"), col("b.nv").as("nvb"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), round(dotD(col("nva"), col("nvb")), 6).as("sim"))
      .where(col("sim") >= cosThreshold)
  }

  /** IVF-style ANN: coarse-quantize the corpus into `nlist` k-means cells,
    * probe the `nProbe` nearest cells per query, exact re-rank inside.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nProbe: Int = 4): DataFrame = {

    import org.apache.spark.ml.clustering.KMeans
    val e = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nv", normalize(col("v")))
      .withColumn("features", array_to_vector(col("v")))
    val km = new KMeans().setK(nlist).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(e)
    val assigned = model.transform(e).select(col("vec_id"), col("nv"), col("cell"))

    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val centroidDf = corpus.sparkSession.createDataFrame(centroids.toSeq)
      .toDF("cell", "centroid")

    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qnv", normalize(col("qv")))
    val probes = q.crossJoin(broadcast(centroidDf))
      .withColumn("cdist", -cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist"), col("cell"))))
      .where(col("crank") <= nProbe)
      .select(col("query_id"), col("qnv"), col("cell"))

    val scored = probes.join(assigned, "cell")
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dotD(col("qnv"), col("nv")), 6).as("sim"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))))
      .where(col("rank") <= k)
  }
}
