package graft.lake

import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption, Path => NioPath}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Driver-side metadata IO, scheme-dispatched. On a cluster these calls are
  * HDFS/object-store RPCs and go through the Hadoop `FileSystem` API
  * unchanged. On `file:` the Hadoop local filesystem forks a `chmod`
  * process per create/mkdirs when the native library is absent (~10-25 ms
  * each — a 96-partition commit pays seconds in forks alone), so the local
  * path takes the NIO twin with identical semantics and no subprocess.
  */
object FsOps {

  /** Bounded pool for independent driver-side metadata IO (footer reads,
    * stat batches). Daemon threads so a hung FS call never blocks JVM
    * exit; 16 is plenty — these are IO round trips, not CPU work.
    */
  lazy val driverIoPool: scala.concurrent.ExecutionContextExecutorService =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(16, r => {
        val t = new Thread(r, "graft-driver-io")
        t.setDaemon(true)
        t
      }))

  /** Map `f` over `items` on `pool`, preserving order, with a DEADLINE:
    * one hung filesystem probe (an object store that never answers) must
    * fail with a diagnostic NAMING the stuck item, not hang the driver
    * forever on an unbounded await. The timeout is a shared budget for
    * the whole batch — items are awaited in order against the remaining
    * time, so the first item still pending at the deadline is reported
    * (items completing under it cost nothing extra).
    */
  def awaitAll[A, B](items: Seq[A], timeout: scala.concurrent.duration.Duration,
      label: A => String,
      pool: scala.concurrent.ExecutionContext = driverIoPool)(f: A => B): Seq[B] = {
    import scala.concurrent.{Await, Future}
    implicit val ec: scala.concurrent.ExecutionContext = pool
    val futs = items.map(a => a -> Future(f(a)))
    val deadline =
      if (timeout.isFinite) System.nanoTime() + timeout.toNanos else Long.MaxValue
    futs.map { case (a, fut) =>
      val remaining = deadline - System.nanoTime()
      try Await.result(fut,
        if (deadline == Long.MaxValue) scala.concurrent.duration.Duration.Inf
        else scala.concurrent.duration.Duration.fromNanos(math.max(remaining, 0L)))
      catch {
        case _: java.util.concurrent.TimeoutException =>
          throw new java.util.concurrent.TimeoutException(
            s"driver IO probe timed out after $timeout waiting on `${label(a)}` " +
              "(raise spark.graft.catalog.probeTimeoutSec if the store is just slow)")
      }
    }
  }

  private def nio(fs: FileSystem, p: Path): Option[NioPath] =
    if (fs.getScheme == "file") Some(Paths.get(p.toUri.getPath)) else None

  def mkdirs(fs: FileSystem, p: Path): Unit = nio(fs, p) match {
    case Some(np) => Files.createDirectories(np)
    case None => fs.mkdirs(p)
  }

  /** Write a small control file (parents created), overwriting any
    * previous content. Not atomic — pair with [[renameInto]] for commits.
    */
  def writeSmall(fs: FileSystem, p: Path, bytes: Array[Byte]): Unit =
    nio(fs, p) match {
      case Some(np) =>
        Files.createDirectories(np.getParent)
        Files.write(np, bytes)
      case None =>
        fs.mkdirs(p.getParent)
        val out = fs.create(p, true)
        try out.write(bytes) finally out.close()
    }

  /** Atomically PUBLISH a small file readers poll (index/statistics/
    * catalog JSON, protocol markers): write-aside to a dot-tmp sibling,
    * then replace-rename over `dst` — a reader sees the old or the new
    * complete file, never a torn prefix of a half-flushed write.
    */
  def publishSmall(fs: FileSystem, dst: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(dst.getParent,
      s".${dst.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    writeSmall(fs, tmp, bytes)
    try {
      if (!renameReplace(fs, tmp, dst))
        throw new java.io.IOException(s"could not publish $dst")
    } finally fs.delete(tmp, false) // no-op when the rename consumed it
  }

  /** Atomic create-if-absent (the lock fence primitive): true iff this
    * caller created the file. Atomic on local FS (O_EXCL), HDFS
    * (create w/o overwrite), and conditional-put object stores.
    */
  def createExclusive(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean =
    nio(fs, p) match {
      case Some(np) =>
        try {
          // Hadoop create() makes parents implicitly; match that
          Files.createDirectories(np.getParent)
          Files.write(np, bytes, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      case None =>
        try {
          val out = fs.create(p, false)
          try out.write(bytes) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
    }

  /** Atomic NO-CLOBBER file rename: true iff `src` moved to `dst` AND
    * `dst` did not already exist. This is the commit primitive — manifest
    * versions, delta-log entries, and quarantine names all rely on
    * "rename returns false when the destination exists" to detect races.
    * POSIX rename(2) (and thus NIO ATOMIC_MOVE) silently REPLACES an
    * existing destination, which would make every such guard a silent
    * data-destroying no-op on local FS — so the local branch claims the
    * destination with a hard link first (createLink fails atomically
    * with FileAlreadyExists when dst exists; when two claimants link the
    * same src, exactly one wins the subsequent source unlink), then
    * removes the source. Files only — no caller renames directories.
    * Hadoop FileSystem.rename already refuses an existing destination.
    */
  def rename(fs: FileSystem, src: Path, dst: Path): Boolean = nio(fs, src) match {
    case Some(ns) =>
      val nd = Paths.get(dst.toUri.getPath)
      try {
        Files.createLink(nd, ns)
        try { Files.delete(ns); true }
        catch {
          // another claimant of the SAME src already unlinked it: it
          // won; drop our own leftover link so no stray copy remains
          case _: java.nio.file.NoSuchFileException =>
            try Files.deleteIfExists(nd)
            catch { case _: java.io.IOException => () }
            false
        }
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          // filesystem without hard links (createLink throws this, NOT
          // IOException) — degrade to the check+move approximation
          renameNoClobberFallback(ns, nd)
        case _: java.io.IOException =>
          // "false" means "destination exists" to every commit caller —
          // only answer that when it is actually true. Some link-less
          // filesystems fail createLink with a bare IOException; fall
          // back rather than fail every manifest commit opaquely.
          if (Files.exists(nd)) false else renameNoClobberFallback(ns, nd)
      }
    case None => fs.rename(src, dst)
  }

  /** No-clobber rename for filesystems WITHOUT hard-link support:
    * exists-check + ATOMIC_MOVE. Weaker than the link-claim protocol —
    * a racer can slip between the check and the move (POSIX/NIO atomic
    * move replaces silently) — documented trade: correctness of the
    * common path over a vanishingly thin race on an already-degraded
    * filesystem. A move failure with the destination absent is a real
    * IO error and must surface, not masquerade as a lost race.
    */
  private def renameNoClobberFallback(ns: java.nio.file.Path,
      nd: java.nio.file.Path): Boolean = {
    if (Files.exists(nd)) return false
    try { Files.move(ns, nd, StandardCopyOption.ATOMIC_MOVE); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case e: java.io.IOException =>
        if (Files.exists(nd)) false
        else throw new java.io.IOException(
          s"no-clobber rename fallback failed moving $ns -> $nd " +
            "(filesystem without hard-link support)", e)
    }
  }

  /** Atomic REPLACE rename: moves `src` over `dst`, clobbering any
    * previous content — the control-file update primitive (dataset
    * config, job status): readers see either the old or the new complete
    * file, never a truncated one. Distinct from [[rename]] on purpose:
    * commits must refuse an existing destination, state updates must
    * replace it.
    */
  def renameReplace(fs: FileSystem, src: Path, dst: Path): Boolean = nio(fs, src) match {
    case Some(ns) =>
      try {
        Files.move(ns, Paths.get(dst.toUri.getPath),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        true
      } catch { case _: java.io.IOException => false }
    case None =>
      fs.delete(dst, false)
      fs.rename(src, dst)
  }

  def setMtime(fs: FileSystem, p: Path, ts: Long): Unit = nio(fs, p) match {
    case Some(np) => Files.setLastModifiedTime(np, java.nio.file.attribute.FileTime.fromMillis(ts))
    case None => fs.setTimes(p, ts, -1)
  }
}
