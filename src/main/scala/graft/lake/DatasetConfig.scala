package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

/** Per-dataset configuration (reference DatasetModel / config.yml,
  * model/dataset.py:13-39): name, shard count, export compression, public
  * URL prefix. Persisted as a properties file under the table root with
  * versioned snapshots, and `shards` is immutable after first write — the
  * physical layout depends on it (reference docs/architecture.md:119-129).
  */
case class DatasetConfig(
    name: String,
    shards: Int = 16,
    compression: String = "gzip",
    publicUrlPrefix: Option[String] = None)

object DatasetConfig {

  private def dir(root: Path) = new Path(root, "_graft/config")

  /** Persist the config under the table fence: the load-check-save is a
    * read-modify-write (the shards immutability check and the snapshot
    * version counter both race without it — two concurrent
    * ensureDataset(8) / ensureDataset(16) calls would BOTH pass the
    * check and last-writer-wins). The live `config` file is replaced
    * atomically (write-aside + rename), so a concurrent load() sees
    * either the old or the new complete file, never a torn one whose
    * missing `shards` key silently defaults to 16.
    */
  def save(fs: FileSystem, root: Path, cfg: DatasetConfig): Unit =
    Locks.withLock(fs, root) { saveLocked(fs, root, cfg) }

  /** Read-modify-write under the config lock: lock → load → `f` → save.
    * This is the ONLY race-free way to derive a new config from the
    * current one — callers that load outside the lock and then
    * [[save]] lose concurrent updates (two merge-field writers would
    * both read v0 and the second would silently erase the first's
    * field). The write is SKIPPED when `f` hands back the loaded config
    * unchanged, so a get-or-create against an existing dataset doesn't
    * bump the snapshot counter.
    */
  def update(fs: FileSystem, root: Path)(
      f: Option[DatasetConfig] => DatasetConfig): DatasetConfig =
    Locks.withLock(fs, root) {
      val existing = load(fs, root)
      val next = f(existing)
      if (!existing.contains(next)) saveLocked(fs, root, next)
      next
    }

  /** [[save]]'s body, for callers already holding the config lock —
    * nested `withLock` on the same root would deadlock against itself.
    */
  private def saveLocked(fs: FileSystem, root: Path, cfg: DatasetConfig): Unit = {
    require(cfg.name.matches("[a-z0-9][a-z0-9_-]*"), s"invalid dataset name: ${cfg.name}")
    require(cfg.shards > 0, "shards must be positive")
    load(fs, root).foreach { existing =>
      require(existing.shards == cfg.shards,
        s"shards is immutable after first write: ${existing.shards} != ${cfg.shards}")
    }
    val d = dir(root)
    fs.mkdirs(d)
    val version = fs.listStatus(d).count(_.getPath.getName.startsWith("config-v"))
    val body = Seq(
      s"name=${cfg.name}",
      s"shards=${cfg.shards}",
      s"compression=${cfg.compression}",
      s"publicUrlPrefix=${cfg.publicUrlPrefix.getOrElse("")}").mkString("\n")
    // the versioned snapshot is a fresh name (plain write is fine);
    // the LIVE file is replaced atomically
    val snap = new Path(d, f"config-v$version%06d")
    FsOps.writeSmall(fs, snap, body.getBytes("UTF-8"))
    val tmp = new Path(d, s".config.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    FsOps.writeSmall(fs, tmp, body.getBytes("UTF-8"))
    if (!FsOps.renameReplace(fs, tmp, new Path(d, "config")))
      throw new java.io.IOException(s"could not publish config under $d")
  }

  def load(fs: FileSystem, root: Path): Option[DatasetConfig] = {
    val p = new Path(dir(root), "config")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val props = try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) => Some(k -> v)
            case _ => None
          }
        }.toMap
    } finally in.close()
    Some(DatasetConfig(
      props.getOrElse("name", "dataset"),
      props.getOrElse("shards", "16").toInt,
      props.getOrElse("compression", "gzip"),
      Some(props.getOrElse("publicUrlPrefix", "")).filter(_.nonEmpty)))
  }

  /** Count of persisted config snapshots (reference VersionStore). */
  def versions(fs: FileSystem, root: Path): Int = {
    val d = dir(root)
    if (!fs.exists(d)) 0
    else fs.listStatus(d).count(_.getPath.getName.startsWith("config-v"))
  }
}
