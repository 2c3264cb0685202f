package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev runner: execute one (or a comma list of) registered graded
  * queries against a fixture dir and print the rows — the quickest way
  * to inspect a contract query's actual booleans/values at a given SF
  * without a full Verify pass.
  *
  * Usage: `sbt 'runMain graft.tools.RunQuery <sfDir> <name>[,<name>...]'`
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunQuery <sfDir> <name>[,<name>...]")
    val (sfDir, names) = (args(0), args(1).split(",").toSeq)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[graft.hadoop.FastLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"===== $name @ $sfDir =====")
      graft.SparkEntry.queries(name)(spark, sfDir).show(50, truncate = false)
    }
    spark.stop()
  }
}
