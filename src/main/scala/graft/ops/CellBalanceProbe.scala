package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Determinism probe for the coarse quantizer behind the routed-ANN
  * pair shapes: fits the SAME corpus with the SAME seed in a fresh JVM
  * and prints the (cell, label) occupancy statistics that drive the
  * quadratic pair-join volume (Σ (p·n)² over cells, p = soft probes).
  * Motivation (r11): qn63_routed's 2M wall measured 33 s and 781 s on
  * identical committed code across two solo same-protocol runs, while
  * qn69 (same kernels, volume ∝ Σn, not Σn²) stayed stable — the
  * hypothesis is that ML KMeans' treeAggregate reduces float sums in
  * task-completion order, so 5-iteration centroids differ across JVMs
  * and cell balance (hence Σn²) is chaotic run-to-run. Two runs of this
  * probe in separate JVMs either confirm (different Σn²) or kill
  * (identical stats) that theory.
  *
  * Usage: `runMain graft.ops.CellBalanceProbe [nVecs]`
  */
object CellBalanceProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 800000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.hadoop.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.tools.ScaleData.embeddings(spark, n).cache()
    emb.count()
    val nl = Similarity.semDedupNlistFor(n)
    val u = emb.select(
      struct(col("label"), col("vec_id").cast("long").as("id")).as("uid"),
      col("embedding").cast("array<double>").as("v"))
    val (assigned, centroids, _) =
      Similarity.fitCells(u, "uid", "v", nl, 100000L, Some(n))
    val occ = assigned
      .select(col("cell"), col("vec_id.label").as("label"))
      .groupBy("cell", "label").count()
      .select(col("count")).collect().map(_.getLong(0))
    val sumSq = occ.map(c => c * c).sum
    val top = occ.sorted.reverse.take(8).mkString(",")
    println(s"""{"n":$n,"nlist":$nl,"n_groups":${occ.length},""" +
      s""""sum":${occ.sum},"sum_sq":$sumSq,"max":${occ.max},"top8":[$top],""" +
      s""""centroid0_head":${centroids.head._2.take(3).mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
