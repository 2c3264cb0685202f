package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query wall
  * seconds. A failed query is reported in `failures` (and its slot in
  * `queries` is -1) instead of contributing a misleadingly tiny timing;
  * `value` sums successful queries only. `cpus`/`shuffle_partitions` are
  * recorded so cross-round comparisons are apples-to-apples (BASELINE.md
  * pins local[4]; the driver may override via SPARK_GRAFT_CPUS).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val secs = (System.nanoTime() - t0) / 1e9
      (name, if (ok) secs else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failures = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failures":$failures,"cpus":$cpus,"shuffle_partitions":$cpus,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(!_._3)) sys.exit(1)
  }
}
