package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextOps}

/** Dev-only phase profiler for the n-gram Jaccard dedup path. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.hadoop.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm

    val sh0 = docs.select(col("doc_id").as("id"),
      explode(TextOps.shingles(col("text"), 3)).as("s"))
    t("shingle explode count") { sh0.count() }
    val hot = sh0.groupBy("s").count()
      .where(col("count") > Dedup.DefaultMaxShingleDocFreq).select("s")
    t("hot list") { hot.count() }
    val sh = sh0.join(broadcast(hot), Seq("s"), "left_anti")
    val shCp = t("checkpoint sh") { sh.localCheckpoint(true) }
    val joined = shCp.as("a").join(shCp.as("b"),
      col("a.s") === col("b.s") && col("a.id") < col("b.id"))
    t("self-join count") { joined.count() }
    val common = joined.groupBy(col("a.id"), col("b.id")).agg(count(lit(1)))
    t("pair groupBy") { common.count() }
    t("full ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text").count()
    }
    t("full dedupByJaccard") {
      Dedup.dedupByJaccard(docs, "doc_id", "text").count()
    }
    // qn15 drift watch: repeated end-to-end runs (set GRAFT_CC_LOG=1 for
    // per-CC-round edge counts + wall).
    (1 to 5).foreach { i =>
      t(s"qn15 shape rep $i") {
        Dedup.dedupByJaccard(docs, "doc_id", "text").select("doc_id").count()
      }
    }
    spark.stop()
  }
}
