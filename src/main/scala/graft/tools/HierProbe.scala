package graft.tools

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Diagnostic for the r10 hierarchical-quantizer work: at a given
  * corpus size, fit the coarse quantizer exactly as the ops do, then
  * measure — separately — the wall of the flat vs hierarchical soft
  * assignment and the resulting cell-load distribution (max/mean and
  * the Σ n² pair-volume proxy that drives the within-cell join cost).
  * Distinguishes "assignment got slower" from "assignment concentrated
  * demand and blew up the join" without touching the shipped ops.
  *
  * Usage: `sbt 'runMain graft.tools.HierProbe [nVecs] [nlist] [probes]'`
  */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 800000L
    val nlist = if (args.length > 1) args(1).toInt else 320
    val probes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.hadoop.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = ScaleData.embeddings(spark, n)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", Similarity.normalize(col("v")))
      .select("vec_id", "nv").cache()
    e.count()

    val fit = e.sample(withReplacement = false, math.min(1.0, 100000.0 / n), seed = 42L)
      .withColumn("features", array_to_vector(col("nv")))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("features").setPredictionCol("cell").fit(fit)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq

    def timed(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val assigned = f
      val loads = assigned.groupBy("cell").count()
        .agg(max("count").as("mx"), avg("count").as("mean"),
          sum(col("count") * col("count")).as("sumsq"), count(lit(1)).as("cells"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[hierprobe] $tag wall=$wall%.1fs cells=${loads.getLong(3)} " +
        f"maxLoad=${loads.getLong(0)} meanLoad=${loads.getDouble(1)}%.1f " +
        f"sumsq=${loads.getLong(2)} (pair-volume proxy)")
    }

    timed(s"flat  n=$n nlist=$nlist probes=$probes")(
      Similarity.probeAssignFlat(e, centroids, probes))
    timed(s"hier  n=$n nlist=$nlist probes=$probes")(
      Similarity.probeAssignHier(e, centroids, probes,
        Similarity.hierGroupProbes(centroids.size)))

    // The qn69 shape: anchors (n/5 rows) probe 16 cells, candidates keep
    // hard cells, bounded-heap top-1 per anchor — run with flat vs hier
    // anchor probing and print the JOIN the optimizer actually picked
    // (the suspect for the r10 qn69 regression is a strategy flip from
    // changed size estimates, not assignment cost).
    val labeled = ScaleData.embeddings(spark, n)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", Similarity.normalize(col("v")))
      .select("vec_id", "label", "nv").cache()
    labeled.count()
    val hard = model.transform(
        labeled.withColumn("features", array_to_vector(col("nv"))))
      .select(col("vec_id").as("cid"), col("label").as("clabel"),
        col("nv").as("vc"), col("cell"))
    val anchors = labeled.where(pmod(col("vec_id"), lit(5)) === 0)
      .select(col("vec_id").as("aid"), col("label").as("alabel"), col("nv"))
    def knnLeg(tag: String, probed: org.apache.spark.sql.DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val top = probed.join(hard, Seq("cell"))
        .where(col("aid") =!= col("cid"))
        .groupBy("aid", "alabel")
        .agg(graft.functions.VectorExpressions.topKByScore(
          graft.functions.VectorExpressions.dotD(col("nv"), col("vc")),
          col("cid"), 1).as("__t"))
      val cnt = top.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val joins = top.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .take(6).mkString(" | ")
      println(f"[hierprobe] knn-$tag wall=$wall%.1fs anchors=$cnt joins: $joins")
    }
    knnLeg("flat", Similarity.probeAssignFlat(anchors, centroids, 16))
    knnLeg("hier", Similarity.probeAssignHier(anchors, centroids, 16,
      Similarity.hierGroupProbes(centroids.size)))

    // Hard-assignment A/B (the fitCells seam): ML KMeans transform vs
    // hier probeAssign at probes = 1, same JVM, same corpus.
    // agg(sum(cell)) — a bare count() would let Catalyst PRUNE the
    // prediction column and measure nothing. Interleaved ABAB because
    // the host drifts live: only adjacent comparisons are meaningful.
    def timedHard(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val s = f.agg(sum("cell")).head().getLong(0)
      println(f"[hierprobe] hard-$tag wall=${(System.nanoTime() - t0) / 1e9}%.1fs sum=$s")
    }
    (1 to 2).foreach { _ =>
      timedHard("mltransform")(model.transform(
        e.withColumn("features", array_to_vector(col("nv")))).select("vec_id", "cell"))
      timedHard("hier1")(Similarity.probeAssignHier(e, centroids, 1,
        Similarity.hierGroupProbes(centroids.size)).select("vec_id", "cell"))
      timedHard("flat1")(Similarity.probeAssignFlat(e, centroids, 1)
        .select("vec_id", "cell"))
    }
    spark.stop()
  }
}
