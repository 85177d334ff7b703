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
  * a lock whose last heartbeat is older than `staleAfterMs` is considered
  * abandoned and stolen — without this, one crashed writer bricks the
  * table until a human removes `.LOCK`. The TTL is far above any
  * legitimate hold time (writers only hold the fence across a manifest
  * commit plus one write job); [[unlock]] is the explicit operator
  * override.
  *
  * Single-winner invariants (each was a real race in earlier shapes):
  *  - STEAL is an atomic rename of the observed stale lock file to a
  *    unique tombstone — two stealers both deleting-then-creating would
  *    BOTH acquire (the second delete removes the first's fresh lock);
  *    with the rename claim exactly one of them owns the corpse and the
  *    other retries against whatever lock exists next.
  *  - RELEASE deletes the fence only while it still holds this run's
  *    token — a holder that was legitimately stolen from (JVM pause
  *    beyond the TTL) must not delete the thief's live lock on its way
  *    out.
  *  - HEARTBEAT writes a sidecar file (`.LOCK.hb`) as well as touching
  *    the lock's mtime: `setTimes` is a silent no-op on object stores,
  *    and without a second signal a long-running merge there would read
  *    as stale at TTL and lose its fence to a concurrent starter.
  *    Staleness = BOTH files old.
  */
object Locks {

  /** Default abandoned-lock TTL: 15 minutes. */
  val DefaultStaleMs: Long = 15L * 60 * 1000

  private def lockPath(root: Path) = new Path(root, ".LOCK")
  private def hbPath(root: Path) = new Path(root, ".LOCK.hb")

  /** Explicit operator unlock — removes the fence unconditionally. */
  def unlock(fs: FileSystem, root: Path): Boolean = {
    fs.delete(hbPath(root), false)
    fs.delete(lockPath(root), false)
  }

  /** Refresh a HELD fence. Staleness is heartbeat-based, so a holder
    * that legitimately outlives the TTL (a streaming run holding the
    * fence across many micro-batches, a 100 TB compact) must heartbeat
    * periodically or a concurrent starter will steal its live lock.
    * Touches the lock's mtime AND rewrites the sidecar: `setTimes` is a
    * silent no-op on object stores, while the sidecar PUT advances a
    * timestamp everywhere. Call only while holding the fence; a missing
    * file (already stolen) is left alone — the holder finds out at its
    * next write, not here.
    */
  def heartbeat(fs: FileSystem, root: Path): Unit = {
    val now = System.currentTimeMillis()
    try fs.setTimes(lockPath(root), now, -1)
    catch { case _: java.io.IOException => () }
    try FsOps.writeSmall(fs, hbPath(root), s"ts=$now\n".getBytes("UTF-8"))
    catch { case _: java.io.IOException => () }
  }

  /** True if a fence file currently exists. */
  def isLocked(fs: FileSystem, root: Path): Boolean =
    fs.exists(lockPath(root))

  private def mtimeOf(fs: FileSystem, p: Path): Option[Long] =
    try Some(fs.getFileStatus(p).getModificationTime)
    catch { case _: java.io.IOException => None }

  def withLock[T](fs: FileSystem, root: Path, maxRetries: Int = 22,
      staleAfterMs: Long = DefaultStaleMs)(body: => T): T = {
    val lp = lockPath(root)
    val hp = hbPath(root)
    // the token identifies THIS acquisition: release and the
    // stolen-from check compare the fence's content against it
    val token =
      s"pid=${ProcessHandle.current().pid()} token=${java.util.UUID.randomUUID()}"
    var attempt = 0
    var acquired = false
    while (!acquired) {
      if (FsOps.createExclusive(fs, lp, token.getBytes("UTF-8"))) {
        acquired = true
      } else {
        // steal abandoned locks: a crashed writer never deletes its
        // fence and stops heartbeating — BOTH the lock's mtime and the
        // heartbeat sidecar's must be old (setTimes is a no-op on
        // object stores; the sidecar is the signal that works there)
        val now = System.currentTimeMillis()
        val lockBeat = mtimeOf(fs, lp)
        val beat = (lockBeat.toSeq ++ mtimeOf(fs, hp).toSeq).maxOption
        val stale = lockBeat.isDefined && beat.exists(now - _ > staleAfterMs)
        if (stale) {
          // atomic claim of the corpse: exactly one stealer's rename
          // succeeds; the loser loops and contends on whatever fence
          // exists next. (Delete-then-create would let BOTH in: the
          // second delete removes the first stealer's fresh lock.)
          val corpse = new Path(root,
            s".LOCK.stolen-${java.util.UUID.randomUUID().toString.take(8)}")
          if (FsOps.rename(fs, lp, corpse)) fs.delete(corpse, false)
        }
        // stolen or not, this was a failed acquisition round: count it
        // and back off, so an undeletable stale lock (read-only FS,
        // foreign owner) fails loudly instead of spinning forever
        attempt += 1
        if (attempt > maxRetries)
          throw new IllegalStateException(
            s"could not acquire $lp after $maxRetries retries")
        if (!stale) Thread.sleep(200L * attempt)
      }
    }
    heartbeat(fs, root) // fresh sidecar from the first moment of the hold
    // a LIVE hold longer than the TTL must not read as abandoned — a
    // daemon thread refreshes the fence while the body runs, so only
    // holders that actually died go stale
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
      // release ONLY a fence that still carries this run's token: if we
      // were legitimately stolen from (a pause beyond the TTL), the
      // fence now protects the thief's writes and deleting it would let
      // a third writer in. The read-check-delete window is narrow and
      // only reachable after a TTL-length pause — strictly safer than
      // the unconditional delete it replaces.
      val owned =
        try {
          val in = fs.open(lp)
          try {
            val buf = new Array[Byte](256)
            val n = math.max(0, in.read(buf))
            new String(buf, 0, n, "UTF-8").contains(token)
          } finally in.close()
        } catch { case _: java.io.IOException => false }
      if (owned) {
        fs.delete(hp, false)
        fs.delete(lp, false)
      } else
        System.err.println(s"[locks] fence $lp no longer ours at release " +
          "(stolen during a stall?) — leaving it to its current holder")
    }
  }
}
