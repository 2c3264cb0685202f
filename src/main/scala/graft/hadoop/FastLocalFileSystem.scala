package graft.hadoop

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.hadoop.fs.permission.FsPermission

/** Local-filesystem shim for single-JVM runs: `RawLocalFileSystem` minus
  * (a) client-side `.crc` sibling files (the `LocalFileSystem` checksum
  * wrapper) and (b) the fork-a-`chmod`-subprocess-per-path
  * `setPermission` fallback Hadoop uses when its native library is
  * absent (`NativeCodeLoader` warning at startup). A partitioned write
  * of N directories otherwise costs ~2N process forks — profiled at
  * ~70% of the store write path (see `graft.tools.StoreProfile`): a
  * 365-dir date-partitioned load dropped 5.5s → sub-second with this
  * shim.
  *
  * Register per session with
  * `spark.hadoop.fs.file.impl=graft.hadoop.FastLocalFileSystem`.
  * Local-mode only by construction: cluster deployments resolve
  * `hdfs://`/`s3a://` schemes, where permissions are metadata RPCs, not
  * forks, and data integrity is the store's job — this class is never
  * on that path.
  */
class FastLocalFileSystem extends RawLocalFileSystem {
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
