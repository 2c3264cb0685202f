package graft.ops

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

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

  /** Exact top-k neighbors for each query vector (brute force, broadcast
    * queries). Excludes self-matches on id equality.
    */
  def topKPerQuery(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {

    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
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
    val e = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("sim"))
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
      .withColumn("nv", transform(col("v"), x => x / norm(col("v"))))
      .withColumn("features", array_to_vector(col("nv")))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(e)
    model.approxSimilarityJoin(e, e, euclidThreshold, "euclid")
      .select(
        col("datasetA.id").as("id_a"),
        col("datasetB.id").as("id_b"),
        round(cosine(col("datasetA.v"), col("datasetB.v")), 6).as("sim"))
      .where(col("id_a") < col("id_b"))
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
      .withColumn("features", array_to_vector(col("v")))
    val km = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(e)
    val assigned = model.transform(e).select(col("vec_id"), col("v"), col("cell"))

    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val centroidDf = corpus.sparkSession.createDataFrame(centroids.toSeq)
      .toDF("cell", "centroid")

    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val probes = q.crossJoin(broadcast(centroidDf))
      .withColumn("cdist", -cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist"), col("cell"))))
      .where(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))

    val scored = probes.join(assigned, "cell")
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 6).as("sim"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))))
      .where(col("rank") <= k)
  }
}
