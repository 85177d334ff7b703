package graft.lake

import java.net.URLDecoder

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** `_delta_log` → manifest import shim: open a delta-rs / Delta-Lake
  * table IN PLACE as a graft [[StatementStore]], with no Delta jars and
  * no data movement.
  *
  * The reference persists its statement tables with delta-rs
  * (`storage/parquet.py:651-663`) — the transaction log is plain JSON
  * lines (one action object per line: `add` / `remove` / `metaData` /
  * `protocol` / `commitInfo`), optionally compacted into a parquet
  * checkpoint named by `_last_checkpoint` (the public Delta protocol,
  * github.com/delta-io/delta/blob/master/PROTOCOL.md). Replaying
  * add/remove over the commits yields the live file set, which commits
  * as the graft manifest's next version pointing at delta's own data
  * files — a dataset written by the reference then opens through every
  * graft read path (raw/live/time-travel from the import point on).
  *
  * Scale shape: the log replay is driver-side over the (small) action
  * log — the same cost Delta's own snapshot reconstruction pays; the
  * checkpoint, if present, is read as parquet THROUGH Spark, so a
  * million-file checkpoint never materializes on the driver beyond the
  * add-path column. Data files are untouched.
  */
object DeltaImport {

  private val CommitRe = "^(\\d{20})\\.json$".r

  /** Import the delta table at `root` (its `_delta_log` subdirectory)
    * into the graft manifest at the same root. Returns the committed
    * manifest version. Idempotent per delta state: re-importing the
    * same log commits a new manifest version with the same file set.
    */
  def importDeltaLog(spark: SparkSession, rootStr: String): Long = {
    val root = new Path(rootStr)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new Path(root, "_delta_log")
    require(fs.exists(logDir), s"no _delta_log under $rootStr")

    // checkpoint base state (if any): the add-tombstone compaction of
    // all commits ≤ checkpoint version
    val (startAfter, base) = lastCheckpoint(fs, logDir) match {
      case Some(v) =>
        val parts = fs.listStatus(logDir).map(_.getPath)
          .filter { p =>
            val n = p.getName
            n.startsWith(f"$v%020d.checkpoint") && n.endsWith(".parquet")
          }
        require(parts.nonEmpty, s"_last_checkpoint names v$v but no checkpoint parquet")
        val cp = spark.read.parquet(parts.map(_.toString).toSeq: _*)
        val live = cp.select("add.path").na.drop()
          .collect().map(r => decode(r.getString(0))).toSet
        // checkpoints also carry remove tombstones, but those files are
        // already absent from the add set — nothing further to subtract
        (v, live)
      case None => (-1L, Set.empty[String])
    }

    // replay the JSON commits after the checkpoint, in version order
    val commits = fs.listStatus(logDir).map(_.getPath)
      .flatMap(p => p.getName match {
        case CommitRe(v) => Some(v.toLong -> p)
        case _ => None
      })
      .filter(_._1 > startAfter)
      .sortBy(_._1)
    var live = base
    for ((_, p) <- commits) {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(p), "UTF-8"))
      try {
        var line = in.readLine()
        while (line != null) {
          if (line.nonEmpty) {
            val node = mapper.readTree(line)
            val add = node.get("add")
            val remove = node.get("remove")
            if (add != null && !add.isNull) live += decode(add.get("path").asText)
            if (remove != null && !remove.isNull) live -= decode(remove.get("path").asText)
          }
          line = in.readLine()
        }
      } finally in.close()
    }
    Manifest.commit(fs, root, live, "delta-import")
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** `_last_checkpoint`: single JSON object `{"version": N, ...}`. */
  private def lastCheckpoint(fs: org.apache.hadoop.fs.FileSystem,
      logDir: Path): Option[Long] = {
    val p = new Path(logDir, "_last_checkpoint")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try Some(mapper.readTree(in).get("version").asLong)
    finally in.close()
  }

  // Delta protocol: `path` is the URI-encoded path relative to the root
  private def decode(path: String): String = URLDecoder.decode(path, "UTF-8")
}
