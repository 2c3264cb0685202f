package org.apache.spark

/** Test-only bridge: `SparkContext.checkpointDir` is `private[spark]`
  * with a setter but no public unset, and the test suites share one
  * session — a test that enables a reliable checkpoint dir must be able
  * to restore the shared session to its localCheckpoint default so it
  * doesn't silently change what every later test exercises.
  */
object CheckpointDirTestBridge {
  def clear(sc: SparkContext): Unit = sc.checkpointDir = None
}
