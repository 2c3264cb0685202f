package graft.hadoop

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local-filesystem shim for single-JVM runs: the local scheme minus
  * (a) client-side `.crc` sibling files (checksums switched off in
  * [[FastLocalFileSystem.initialize]]) and (b) the
  * fork-a-`chmod`-subprocess-per-path `setPermission` fallback Hadoop
  * uses when its native library is absent (`NativeCodeLoader` warning at
  * startup). A partitioned write of N directories otherwise costs ~2N
  * process forks — profiled at ~70% of the store write path (see
  * `graft.tools.StoreProfile`): a 365-dir date-partitioned load dropped
  * 5.5s → sub-second with this shim.
  *
  * Extends [[LocalFileSystem]] (wrapping the chmod-free raw fs), NOT
  * [[RawLocalFileSystem]] directly: Hadoop's `FileSystem.getLocal`
  * hard-casts the `file:` scheme instance to `LocalFileSystem`, so a
  * raw-derived impl registered as `fs.file.impl` crashes any getLocal
  * caller (SequenceFile utilities, some committers) with a
  * ClassCastException.
  *
  * Register per session with
  * `spark.hadoop.fs.file.impl=graft.hadoop.FastLocalFileSystem`.
  * Local-mode only by construction: cluster deployments resolve
  * `hdfs://`/`s3a://` schemes, where permissions are metadata RPCs, not
  * forks, and data integrity is the store's job — this class is never
  * on that path.
  */
class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem) {
  override def initialize(uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(uri, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}

/** The chmod-free raw layer under [[FastLocalFileSystem]]. */
class FastRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()

  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    if (f.getName.endsWith(".parquet"))
      FastLocalFileSystem.parquetOpens.incrementAndGet()
    super.open(f, bufferSize)
  }
}

object FastLocalFileSystem {
  /** Count of parquet-file opens through this filesystem — an observable
    * proxy for footer reads, used by StoreSpec to assert that
    * sidecar-schema reads build relations with ZERO data-file I/O
    * (where a mergeSchema sweep opens every footer). One branch per
    * open; negligible in production.
    */
  val parquetOpens = new java.util.concurrent.atomic.AtomicLong
}
