package graft.tools

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Stage-by-stage decomposition of the cell-pruned positive-pair shape
  * (qn63's routed path) at two corpus sizes in ONE JVM — the r10
  * sixth-point artifact shows the op growing ~7× per 2× data while
  * every component it measures in isolation is linear; this probe
  * splits the residual into (fit+hard-assign) / (soft assign) /
  * (join ROW VOLUME — vectors pruned, so no scoring cost) /
  * (scored bounded-heap top-1 — the full tail) so the superlinear term
  * has nowhere to hide.
  *
  * Usage: `sbt 'runMain graft.tools.PairStageProbe [n1] [n2]'`
  */
object PairStageProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(400000L, 800000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.hadoop.fs.file.impl", classOf[graft.hadoop.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sizes.foreach { n =>
      val e = ScaleData.embeddings(spark, n)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("nv", Similarity.normalize(col("v")))
        .select("vec_id", "label", "nv").cache()
      e.count()
      // min of 2 reps: the shared host bursts minute-to-minute (the
      // same stage measured 42.6 s and 2.5 s in adjacent runs of
      // identical code) — a single sample attributes co-tenant load to
      // the engine; the min is the defensible estimator under bursts.
      def t[A](f: => A): (Double, A) = {
        System.gc()
        val t0 = System.nanoTime()
        val r = f
        val w1 = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        f
        val w2 = (System.nanoTime() - t1) / 1e9
        (math.min(w1, w2), r)
      }
      val nl = Similarity.semDedupNlistFor(n)
      val (fitSec, (model, centroids)) = t {
        val fit = e.sample(withReplacement = false,
            math.min(1.0, 100000.0 / n), seed = 42L)
          .withColumn("features", array_to_vector(col("nv")))
        val m = new KMeans().setK(nl).setSeed(42L).setMaxIter(5)
          .setFeaturesCol("features").setPredictionCol("cell").fit(fit)
        (m, m.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq)
      }
      val soft = Similarity.probeAssign(e, centroids, 3)
      // Caller-shape A/B: the same assignment measured via bare count()
      // vs a cell aggregate, and with vs without the carried label
      // column — HierProbe and this probe disagreed 7× on walls for
      // the identical probeAssign, so pin which caller detail it is.
      val (abAgg, _) = t(soft.groupBy("cell").count().count())
      val slim = Similarity.probeAssign(e.select("vec_id", "nv"), centroids, 3)
      val (abSlim, _) = t(slim.count())
      println(f"[pairstage] n=$n ab: softagg=${abAgg}%.1fs slimcount=${abSlim}%.1fs")
      val (softSec, softRows) = t(soft.count())
      val sc = soft.cache(); sc.count() // isolate the join stages from recompute
      val a = sc.select(col("cell"), col("label"), col("vec_id").as("aid"), col("nv").as("va"))
      val b = sc.select(col("cell"), col("label"), col("vec_id").as("pid"), col("nv").as("vb"))
      val joined = a.join(b, Seq("cell", "label")).where(col("aid") =!= col("pid"))
      val (volSec, volRows) = t(joined.count()) // vectors PRUNED: pure row volume
      val (topSec, topRows) = t(
        joined.groupBy("label", "aid")
          .agg(graft.functions.VectorExpressions.topKByScore(
            graft.functions.VectorExpressions.dotD(col("va"), col("vb")),
            col("pid"), 1).as("__t"))
          .count())
      println(f"[pairstage] n=$n nlist=$nl fit=${fitSec}%.1fs " +
        f"soft=${softSec}%.1fs(rows=$softRows) joinvol=${volSec}%.1fs(rows=$volRows) " +
        f"scoredtop=${topSec}%.1fs(anchors=$topRows)")
      sc.unpersist(); e.unpersist()
    }
    spark.stop()
  }
}
