package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

/** Freshness tags: key → mtime files driving incremental skipping
  * (reference ST2, storage/tags.py:44-69, core/conventions/tag.py). A
  * producer `touch`es its tag after writing; a consumer `isLatest(target,
  * deps)` skips work when its own tag is newer than every dependency's.
  * Partition-grain keys (e.g. `statements/dirty/shard=0/bucket=thing`)
  * let the merge driver rewrite only dirty partitions.
  */
class Tags(fs: FileSystem, root: Path) {

  private def pathOf(key: String): Path = {
    // '=' is mangled to '~' for hive-style-path safety; a key containing
    // a literal '~' would collide with a mangled '=' twin (pin "env=prod"
    // silently overwriting pin "env~prod"), so '~' is rejected outright
    require(!key.contains('~'), s"tag keys may not contain '~': $key")
    new Path(new Path(root, "_graft/tags"), key.replace('=', '~'))
  }

  def touch(key: String, ts: Long = System.currentTimeMillis()): Unit = {
    val p = pathOf(key)
    FsOps.writeSmall(fs, p, ts.toString.getBytes("UTF-8"))
    FsOps.setMtime(fs, p, ts)
  }

  /** Store an arbitrary string value under a tag key (the reference's
    * TagStore doubles as a tiny KV store for e.g. diff watermark state).
    */
  def put(key: String, value: String): Unit =
    FsOps.writeSmall(fs, pathOf(key), value.getBytes("UTF-8"))

  def get(key: String): Option[String] = {
    val p = pathOf(key)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  def mtime(key: String): Option[Long] = {
    val p = pathOf(key)
    if (fs.exists(p)) Some(fs.getFileStatus(p).getModificationTime) else None
  }

  def delete(key: String): Unit = fs.delete(pathOf(key), false)

  /** Keys under a directory-shaped prefix (e.g. `pins/`) — one listing.
    * File names are un-mangled back to their key form ('~' → '=', the
    * inverse of [[pathOf]]) so keys() and [[list]] agree: a pin created
    * as "env=prod" must list as "env=prod" from both APIs.
    */
  def keys(prefix: String): Seq[String] = {
    val d = new Path(new Path(root, "_graft/tags"), prefix)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).filter(_.isFile)
      .map(s => prefix + s.getPath.getName.replace('~', '=')).toSeq.sorted
  }

  /** True when `target` exists and is at least as new as every dependency
    * that exists. A missing target is never latest; missing deps don't
    * invalidate (matching the reference's semantics of "nothing newer").
    */
  def isLatest(target: String, deps: Seq[String]): Boolean =
    mtime(target) match {
      case None => false
      case Some(t) => deps.flatMap(mtime).forall(_ <= t)
    }

  def list(prefix: String): Seq[String] = {
    val base = new Path(root, "_graft/tags")
    if (!fs.exists(base)) return Seq.empty
    val it = fs.listFiles(base, true)
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    val baseLen = base.toUri.getPath.length + 1
    while (it.hasNext) {
      val p = it.next().getPath.toUri.getPath
      val key = p.substring(math.min(baseLen, p.length)).replace('~', '=')
      if (key.startsWith(prefix)) buf += key
    }
    buf.toList
  }
}
