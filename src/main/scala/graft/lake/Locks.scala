package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

/** Exclusive maintenance fence over any Hadoop filesystem (reference ST5,
  * storage/parquet.py:326-476). Plain-parquet appends have no optimistic
  * concurrency control, so every manifest commit happens under this fence.
  *
  * Atomicity comes from `FileSystem.create(path, overwrite = false)`, which
  * is atomic on HDFS and local FS (and conditional-put on modern object
  * stores). Retry backoff is linear, bounded ≈ retries²/2 seconds like the
  * reference's.
  */
object Locks {

  def withLock[T](fs: FileSystem, root: Path, maxRetries: Int = 22)(body: => T): T = {
    val lockPath = new Path(root, ".LOCK")
    var attempt = 0
    var acquired = false
    while (!acquired) {
      try {
        val out = fs.create(lockPath, false)
        out.writeBytes(s"pid=${ProcessHandle.current().pid()} ts=${System.currentTimeMillis()}")
        out.close()
        acquired = true
      } catch {
        case _: java.io.IOException =>
          attempt += 1
          if (attempt > maxRetries)
            throw new IllegalStateException(s"could not acquire $lockPath after $maxRetries retries")
          Thread.sleep(200L * attempt)
      }
    }
    try body
    finally fs.delete(lockPath, false)
  }
}
