package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

/** `file:` filesystem for local mode that skips permission fixup.
  *
  * Hadoop's `RawLocalFileSystem` (and the checksummed `LocalFileSystem`
  * over it) calls `setPermission` after every create/mkdirs; without the
  * native library that is a forked `chmod` subprocess per file — 10-25 ms
  * each, hundreds per dynamic-partition write. Files created here keep
  * the process umask, which is exactly what a single-user local run
  * wants. Registered via `spark.hadoop.fs.file.impl` in
  * [[graft.Sessions]]; cluster deployments talk to hdfs:///object-store
  * schemes and never hit this class. Checksum (.crc) shadow files are
  * also gone — parquet carries its own page checksums.
  */
class FastLocalFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  // RawLocalFileSystem inherits the throwing base implementation
  override def getScheme: String = "file"
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}
