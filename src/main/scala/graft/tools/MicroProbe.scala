package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-decomposition of the shingle/dedup hot path (r19 optimization
  * tooling): times each pipeline prefix of the ngram-Jaccard detector
  * with the noop sink so the per-stage cost is visible (guide §1.4).
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.hadoop.FastLocalFileSystem].getName)
    if (sys.env.getOrElse("SPARK_GRAFT_STOCK_CONF", "0") != "1")
      graft.Graft.singleJvmScaleConfs.foreach { case (k, v) =>
        builder = builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.warmup(spark, sfDir)
    import graft.ops.{Dedup, TextOps}

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[micro] $name%-40s min=${samples.min}%.3f " +
        samples.map(s => f"$s%.3f").mkString("[", ",", "]"))
    }

    val d = graft.Tables.read(spark, sfDir, "documents")
    time("scan")(d)
    time("tokens")(d.select(TextOps.tokens(col("text")).as("t")))
    time("shingles")(d.select(TextOps.shingles(col("text"), 3).as("sh")))
    time("explode-shingles")(
      d.select(col("doc_id"), explode(TextOps.shingles(col("text"), 3)).as("s")))
    val sig = Dedup.shingleSignatures(d, "doc_id", "text", 3)
    time("sig-groupBy-hot")(
      sig.groupBy("s").count().where(col("count") > 1000).select("s"))
    val hot = sig.groupBy("s").count().where(col("count") > 1000).select("s")
    time("sig-antijoin")(sig.join(hot, Seq("s"), "left_anti"))
    time("sig-antijoin-ckpt") {
      sig.join(hot, Seq("s"), "left_anti").localCheckpoint(eager = false)
    }
    val shm = sig.join(hot, Seq("s"), "left_anti").localCheckpoint(eager = true)
    time("pairs-from-ckpt")(
      shm.as("a").join(shm.as("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
        .agg(count(lit(1)).as("common")))
    spark.stop()
  }
}
