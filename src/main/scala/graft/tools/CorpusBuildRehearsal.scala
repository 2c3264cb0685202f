package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Mixture, TextOps}

/** Dress rehearsal of the FULL stored corpus build (qn104's five-stage
  * pipeline — quality → near-dup dedup → decontaminate → sample →
  * shards, every stage boundary a store version) at delta-campaign
  * scale (VERDICT r18 #4). The registry query grades the composition at
  * fixture scale and each stage family is scale-measured SOLO by
  * [[ScaleBench]]; this probe closes the remaining gap — does the
  * composition at 2M docs cost what the solo rows predict, or does a
  * stage interact (cache pressure, store-write amplification, shuffle
  * residue) when run inside the full pipeline?
  *
  * Per stage it records wall seconds, rows out, and the store bytes the
  * stage added; plus the standard per-rep health fields (calibration,
  * t1/t32 DRAM bandwidth, CPU weather) so a rep is acceptable under the
  * campaign's weather gates. Stage semantics mirror
  * `NorthStar.qCorpusBuildStored` exactly (same ops, same thresholds,
  * same store round-trips); the fixture is [[ScaleData.documents]] at
  * `args(0)` docs (default 2,000,000), closed vocabulary unless
  * SPARK_GRAFT_SCALE_VOCAB says otherwise — the solo rows it is
  * compared against ran the closed fixture.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=48g sbt -batch \
  *     "runMain graft.tools.CorpusBuildRehearsal 2000000"
  */
object CorpusBuildRehearsal {

  private def duBytes(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.codegen.aggregate.map.twolevel.enabled",
        (sys.env.getOrElse("SPARK_GRAFT_TWOLEVEL", "0") == "1").toString)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering",
        (sys.env.getOrElse("SPARK_GRAFT_BUCKETSORT", "1") == "1").toString)
      .config("spark.hadoop.fs.file.impl", classOf[graft.hadoop.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vocabMode = sys.env.getOrElse("SPARK_GRAFT_SCALE_VOCAB", "fixed")
    val vocabSize = vocabMode match {
      case "fixed" => ScaleData.VocabSize.toLong
      case "heaps" => ScaleData.heapsVocab(n)
      case v => v.toLong
    }
    // The fixture materializes to parquet OUTSIDE the timings and the
    // pipeline reads it back — the production shape (a crawl lands on
    // storage before any stage runs), and it keeps generator codegen
    // out of stage walls.
    val srcDir = graft.TempDirs.create("graft_cbr_src_")
    ScaleData.documents(spark, n, vocabSize = vocabSize)
      .write.mode("overwrite").parquet(srcDir + "/docs")
    val d = spark.read.parquet(srcDir + "/docs")

    // The synthetic fixture's vocabulary ("w<id>" tokens) contains no
    // English stopwords, so qn104's stock stopword floor would reject
    // 100% of it and zero the pipeline at stage 1. The rehearsal drops
    // that ONE rule (floor 0 = vacuous) and keeps the other three
    // (length / word-shape / repetition) — the stage's COST is a
    // codegen'd per-row scan either way, which is what is being
    // measured; its selectivity on real text is qn104's concern.
    def quality(c: Column) =
      TextOps.qualityRules(c, minStopwordFraction = 0.0).keep

    // Untimed warmup of the op families (JIT/codegen), campaign-style.
    locally {
      val w = ScaleData.documents(spark, 100000L, vocabSize = vocabSize)
      w.where(quality(col("text"))).count()
      Dedup.dedupByJaccard(w, "doc_id", "text", n = 3, threshold = 0.8).count()
    }

    val storeRoot = graft.TempDirs.create("graft_cbr_store_")
    val store = new graft.store.Store(spark, storeRoot)
    val stages =
      scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long, Long)]
    var lastBytes = 0L
    def stage(name: String)(f: => DataFrame): DataFrame = {
      System.gc()
      val w0 = CpuWeatherProbe.snap()
      val t0 = System.nanoTime()
      store.load(f, s"corpus_build/$name", externalKey = "b0")
      val out = store.get(s"corpus_build/$name", useLast = true)
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val total = duBytes(storeRoot)
      val added = total - lastBytes
      lastBytes = total
      stages(name) = (sec, rows, added)
      System.err.println(f"[cbr] $name: $sec%.1f s, $rows rows, " +
        f"${added / 1e6}%.0f MB " +
        CpuWeatherProbe.deltaJson(w0, CpuWeatherProbe.snap()))
      out
    }

    val totalT0 = System.nanoTime()
    val isBench = pmod(col("doc_id"), lit(50)) === 3
    val bench = d.where(isBench)
    val corpus = stage("stage0_corpus")(
      d.select("doc_id", "source", "text").where(!isBench))
    val q = stage("stage1_quality")(
      corpus.where(quality(col("text"))))
    val dd = stage("stage2_dedup")(
      Dedup.dedupByJaccard(q, "doc_id", "text", n = 3, threshold = 0.8))
    val dc = stage("stage3_decontam") {
      val contaminated = TextOps.contaminationOverlap(dd, bench, "doc_id", "text")
      dd.join(contaminated.select("doc_id"), Seq("doc_id"), "left_anti")
    }
    val samp = stage("stage4_sampled") {
      val t = dc.withColumn("toks", TextOps.tokenCount(col("text")).cast("long"))
      // Budgets scaled to corpus size (qn104's literal 200+50·src budgets
      // would sample ~0% of a 2M-doc corpus and zero the shard stage):
      // ~40% of each source's tokens survives, the production shape.
      val budgets = t.groupBy("source")
        .agg((sum("toks") * lit(0.4)).cast("long").as("budget"))
      Mixture.sampleByTokenBudget(
        t, "doc_id", "toks", "source", budgets)
    }
    stage("manifest") {
      val t = samp
      Mixture.tokenShards(t, "doc_id", "toks", numShards = 64)
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("shard_tokens"))
    }
    val totalSec = (System.nanoTime() - totalT0) / 1e9

    val calib = {
      val c0 = System.nanoTime()
      d.groupBy("lang").count().collect()
      (System.nanoTime() - c0) / 1e9
    }
    val (bw1, bwN) = MemBandwidthProbe.probe(threads = cpus.toInt)
    val stagesJson = stages.map { case (k, (sec, rows, bytes)) =>
      f""""$k":{"sec":$sec%.1f,"rows":$rows,"bytes":$bytes}"""
    }.mkString("{", ",", "}")
    println(
      f"""{"probe":"corpus_build_rehearsal","n_docs":$n,""" +
        s""""vocab_mode":"$vocabMode","vocab_size":$vocabSize,""" +
        f""""total_sec":$totalSec%.1f,"stages":$stagesJson,""" +
        f""""store_bytes":$lastBytes,"calibration_sec":$calib%.3f,""" +
        f""""mem_bw_gbps":{"t1":$bw1%.2f,"t$cpus":$bwN%.2f}}""")
    spark.stop()
  }
}
