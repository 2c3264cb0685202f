package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end test of the cluster deployment hook
  * (`spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`).
  *
  * The extensions conf is STATIC: building a session over a SparkContext
  * that already exists silently ignores it (probe-verified on Spark
  * 4.1), so the only honest way to exercise the path a cluster user
  * takes (`spark-submit --conf spark.sql.extensions=...`) is a fresh
  * JVM whose FIRST session carries the conf. This spec forks one with
  * the suite's own classpath and runs [[graft.tools.ExtensionsCheck]],
  * which asserts the SQL functions resolve and the pruning rule fires
  * (10 bucket files → 2 scanned) with zero register() calls.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions wires SQL functions + pruning rule in a fresh JVM") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin, "-Xmx2g", "-cp", sys.props("java.class.path")) ++
      addOpens ++ Seq("graft.tools.ExtensionsCheck")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    assert(code == 0, s"ExtensionsCheck exited $code:\n${out.takeRight(4000)}")
    assert(out.contains("[extcheck] OK"), s"missing OK marker:\n${out.takeRight(2000)}")
  }
}
