package graft.lake

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}

/** Monotonic snapshot manifest replacing the reference's Delta transaction
  * log (SURVEY.md §7: no Delta jars in this runtime). Each version file
  * `_graft/manifest/v%012d.txt` records the action plus the complete set of
  * live data files (paths relative to the table root). Readers resolve the
  * max version; writers commit under the exclusive fence.
  *
  * This gives us what delta-rs gave the reference: snapshot isolation for
  * readers, a version counter for incremental-diff state, vacuum-able
  * unreferenced files, and time travel by version. The manifest is O(files)
  * per commit — at 100 TB with ~1 GB files that is ~10⁵ lines, fine for a
  * text file; beyond that the format would switch to checkpointed deltas
  * exactly as Delta does.
  */
object Manifest {

  private val DirName = "_graft/manifest"

  private def dir(root: Path) = new Path(root, DirName)

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("v") && n.endsWith(".txt"))
      scala.util.Try(n.substring(1, n.length - 4).toLong).toOption
    else None
  }

  def currentVersion(fs: FileSystem, root: Path): Long = {
    val d = dir(root)
    if (!fs.exists(d)) -1L
    else fs.listStatus(d).flatMap(s => versionOf(s.getPath)).foldLeft(-1L)(math.max)
  }

  private def rawLines(fs: FileSystem, root: Path, version: Long): List[String] = {
    val v = if (version >= 0) version else currentVersion(fs, root)
    if (v < 0) return Nil
    val p = new Path(dir(root), f"v$v%012d.txt")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      .drop(1).filter(_.nonEmpty) // line 0 is the action tag
    finally in.close()
  }

  /** Live file set (relative paths) at `version`, or the current one.
    * Manifest lines are `path[\tmaxChangedMicros]` — the optional zone-map
    * suffix is the file's data-skipping statistic.
    */
  def liveFiles(fs: FileSystem, root: Path, version: Long = -1L): Set[String] =
    liveState(fs, root, version)._1

  /** One-read combined view: (live files, zone maps) at `version` — the
    * ONE manifest-line parser; [[liveFiles]] and [[liveStats]] are views
    * of it so a format change cannot silently diverge the three.
    */
  def liveState(fs: FileSystem, root: Path, version: Long = -1L): (Set[String], Map[String, Long]) = {
    val lines = rawLines(fs, root, version)
    val files = lines.map(_.split('\t')(0)).toSet
    val stats = lines.flatMap { line =>
      line.split('\t') match {
        case Array(p, s) => scala.util.Try(p -> s.toLong).toOption
        case _ => None
      }
    }.toMap
    (files, stats)
  }

  /** Zone maps at `version`: relative path → max changed-timestamp micros
    * (entries only for files whose stats are known).
    */
  def liveStats(fs: FileSystem, root: Path, version: Long = -1L): Map[String, Long] =
    liveState(fs, root, version)._2

  /** Commit a new version with the given complete live-file set and
    * optional per-file zone maps. Caller must hold the table fence.
    * Returns the new version number.
    */
  def commit(fs: FileSystem, root: Path, files: Set[String], action: String,
      stats: Map[String, Long] = Map.empty): Long = {
    val v = currentVersion(fs, root) + 1
    val d = dir(root)
    val tmp = new Path(d, f".v$v%012d.txt.tmp")
    val lines = files.toSeq.sorted.map { f =>
      stats.get(f) match {
        case Some(s) => s"$f\t$s"
        case None => f
      }
    }
    FsOps.writeSmall(fs, tmp, (action +: lines).mkString("\n").getBytes("UTF-8"))
    if (!FsOps.rename(fs, tmp, new Path(d, f"v$v%012d.txt")))
      throw new IllegalStateException(s"manifest commit race at version $v")
    v
  }

  /** Manifest versions physically present in the log, ascending. Retention
    * windows must intersect with this: an earlier, more aggressive vacuum
    * may already have expired versions inside a later call's window, and
    * reading a deleted version file is a FileNotFoundException.
    */
  def presentVersions(fs: FileSystem, root: Path): Seq[Long] = {
    val d = dir(root)
    if (!fs.exists(d)) return Nil
    fs.listStatus(d).flatMap(s => versionOf(s.getPath)).toSeq.sorted
  }

  /** Delete manifest version files older than the retention window (all
    * versions < `keepFrom`). The log-retention twin of data-file vacuum:
    * without it a long-lived table accumulates one manifest per commit
    * forever — unbounded metadata growth and a slowing version listing.
    * Time travel below `keepFrom` is gone afterwards, by design.
    */
  def expire(fs: FileSystem, root: Path, keepFrom: Long): Seq[Long] = {
    val d = dir(root)
    if (!fs.exists(d)) return Nil
    val old = fs.listStatus(d).flatMap(s => versionOf(s.getPath).map(_ -> s.getPath))
      .filter(_._1 < keepFrom).sortBy(_._1)
    old.foreach { case (_, p) => fs.delete(p, false) }
    old.map(_._1).toSeq
  }

  /** All data files physically present under the table root (relative),
    * excluding manifest/lock/hidden files.
    */
  def physicalFiles(fs: FileSystem, root: Path): Set[String] = {
    val out = mutable.Set.empty[String]
    val it = fs.listFiles(root, true)
    val rootUri = root.toUri.getPath.stripSuffix("/")
    while (it.hasNext) {
      val f = it.next().getPath
      val rel = f.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      val name = f.getName
      val hidden = rel.split('/').exists(seg => seg.startsWith("_") || seg.startsWith("."))
      if (!hidden && !name.equals(".LOCK") && name.endsWith(".parquet")) out += rel
    }
    out.toSet
  }
}
