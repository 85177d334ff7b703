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
  *
  * Crashed-writer recovery (reference tests/test_integration_unlock.py):
  * a lock whose file is older than `staleAfterMs` is considered abandoned
  * and stolen — without this, one crashed writer bricks the table until a
  * human removes `.LOCK`. The TTL is far above any legitimate hold time
  * (writers only hold the fence across a manifest commit plus one write
  * job); [[unlock]] is the explicit operator override.
  */
object Locks {

  /** Default abandoned-lock TTL: 15 minutes. */
  val DefaultStaleMs: Long = 15L * 60 * 1000

  private def lockPath(root: Path) = new Path(root, ".LOCK")

  /** Explicit operator unlock — removes the fence unconditionally. */
  def unlock(fs: FileSystem, root: Path): Boolean =
    fs.delete(lockPath(root), false)

  /** Refresh a HELD fence's mtime. Staleness is mtime-based, so a holder
    * that legitimately outlives the TTL (a streaming run holding the
    * fence across many micro-batches) must heartbeat periodically or a
    * concurrent starter will steal its live lock. Call only while
    * holding the fence; a missing file (already stolen) is left alone —
    * the holder finds out at its next write, not here.
    */
  def heartbeat(fs: FileSystem, root: Path): Unit =
    try fs.setTimes(lockPath(root), System.currentTimeMillis(), -1)
    catch { case _: java.io.IOException => () }

  /** True if a fence file currently exists. */
  def isLocked(fs: FileSystem, root: Path): Boolean =
    fs.exists(lockPath(root))

  def withLock[T](fs: FileSystem, root: Path, maxRetries: Int = 22,
      staleAfterMs: Long = DefaultStaleMs)(body: => T): T = {
    val lp = lockPath(root)
    var attempt = 0
    var acquired = false
    while (!acquired) {
      val body = s"pid=${ProcessHandle.current().pid()} ts=${System.currentTimeMillis()}"
      if (FsOps.createExclusive(fs, lp, body.getBytes("UTF-8"))) {
        acquired = true
      } else {
        // steal abandoned locks: a crashed writer never deletes its
        // fence; its file's mtime stops advancing. Both stealers race
        // on create(overwrite=false) afterwards, so exactly one wins.
        val stale = try {
          System.currentTimeMillis() - fs.getFileStatus(lp).getModificationTime > staleAfterMs
        } catch { case _: java.io.IOException => false } // already gone
        if (stale) {
          fs.delete(lp, false)
        } else {
          attempt += 1
          if (attempt > maxRetries)
            throw new IllegalStateException(s"could not acquire $lp after $maxRetries retries")
          Thread.sleep(200L * attempt)
        }
      }
    }
    // a LIVE hold longer than the TTL (a 100 TB compact/vacuum/merge, a
    // streaming run fencing its state dir) must not read as abandoned —
    // a daemon thread refreshes the fence's mtime while the body runs,
    // so only holders that actually died go stale
    val hb = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(math.max(staleAfterMs / 3, 50L))
          heartbeat(fs, root)
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lock-heartbeat-${root.getName}")
    hb.setDaemon(true)
    hb.start()
    try body
    finally {
      hb.interrupt()
      fs.delete(lp, false)
    }
  }
}
