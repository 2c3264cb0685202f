ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pandasdbsdkspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The judge's driver invokes `sbt "runMain graft.Bench"` and parses the
// LAST stdout line as JSON. Two sbt default behaviors broke that every
// round (BENCH_r10–r12 all record `parsed: null`): forked-run output is
// routed through sbt's logger, which prefixes every line with
// "[info] ", and sbt appends its own "[success] Total time: …" line
// after the process exits. Pass forked output through verbatim and
// silence the success banner so the final stdout line is exactly the
// one short JSON object Bench prints.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// outputStrategy is consumed through task-scope delegation (run/test
// forkOptions), which sbt's unused-key lint can't see.
Global / excludeLintKeys += outputStrategy
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Hive metastore (bucketed-table tests) keeps its Derby db out of the
  // repo working tree.
  "-Dderby.system.home=/tmp/graft_derby",
  // 24g default on the 128 GiB harness host: local-mode puts every
  // cache/broadcast/shuffle buffer in ONE JVM, and the 8g default was
  // measured costing ~11% across the full bench registry (old-gen GC
  // pressure; 123.1 s at 32g vs 138.3 s at 8g, same code/host). -Xmx is
  // a cap, not an upfront allocation, so co-resident JVMs stay safe.
  // Override via SPARK_DRIVER_MEM. ScaleBench's 1M/2M points need 48g —
  // the 2M ANN candidate streams (~7.5e9 joined rows through 800k
  // bounded-heap states) sit on a GC cliff below that (r11 measured
  // qn63_routed 3.8× slower at 32g than the r10 48g protocol on a
  // same-speed host window; see SCALEBENCH_r11.json).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // HotSpot refuses to JIT methods over 8000 bytecodes — which Spark's
  // whole-stage codegen can produce for wide plans. Standard Spark
  // hygiene; compile time for huge methods is paid once. NOTE: this was
  // first added chasing the r10 probeAssign bimodality (~2.5 s vs ~39 s
  // for the same stage across JVMs) and did NOT fix it — thread-dumps
  // showed the slow mode burning CPU in interpreted Catalyst HOF eval
  // (InterpretedOrdering.compare), whose speed hangs on HotSpot's
  // profile-driven inlining luck. The real fix was moving that kernel
  // to a primitive-loop expression (NearestCellsExpr); the flag stays
  // as cheap insurance for genuinely huge generated methods.
  "-XX:-DontCompileHugeMethods",
  // GCLocker starvation (JDK-8192647 family): the 8M-doc ScaleBench
  // point at 48g died with "Retried waiting for GCLocker too often
  // allocating 3 words" — a spurious OOM from allocation retries racing
  // JNI critical sections (parquet/netty buffers), not real exhaustion;
  // doubling the heap to 96g "fixed" it but measurably slowed the same
  // op ~1.6× (GC geometry). More retries is the targeted fix (a
  // diagnostic option — the unlock must precede it).
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
) ++ (
  // Lift HotSpot's recompilation cutoffs (default 400/200) — after
  // that many deopts HotSpot BLACKLISTS the method to the interpreter
  // PERMANENTLY, which is the "deopt-without-OSR-rescue → whole stage
  // interpreted" slow mode behind the 2M ScaleBench bimodality
  // (NOTES_r13 mitigation option 3, now measured: untreated, ~5 of 8
  // 2M delta-ingest reps ran 88–173 s with a 29 s whole-stage task
  // MEDIAN, CPU-pegged, zero spill; with unlimited cutoffs 3/3 reps
  // read 45–74 s — one BELOW the untreated best — and the same stages'
  // medians dropped to 4–10 s. SCALEBENCH_r15_trapbudget.log). The
  // trade is recompile churn, which the A/B shows is noise here.
  // SPARK_GRAFT_TRAP_BUDGET=0 restores stock cutoffs to reproduce the
  // lottery.
  if (sys.env.getOrElse("SPARK_GRAFT_TRAP_BUDGET", "1") == "1") Seq(
    "-XX:PerMethodRecompilationCutoff=-1",
    "-XX:PerBytecodeRecompilationCutoff=-1")
  else Seq.empty)
