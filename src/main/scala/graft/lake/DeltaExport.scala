package graft.lake

import java.net.{URLDecoder, URLEncoder}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Manifest → `_delta_log` export: the inverse of [[DeltaImport]].
  *
  * The reference persists statement tables with delta-rs
  * (`storage/parquet.py:651-663`), so its whole downstream tool chain —
  * delta-rs readers, DuckDB's delta extension, Spark-with-Delta-jars —
  * expects a `_delta_log`. graft's own manifest
  * (`_graft/manifest/v*.txt`, one complete live-file set per version)
  * carries strictly more than Delta needs for a plain reader-v1 table,
  * so every manifest version maps onto exactly one Delta JSON commit:
  * version 0 carries `protocol` (reader 1 / writer 2 — no table
  * features) and `metaData` (Spark StructType schemaString + the Hive
  * partition columns), and each commit carries the `add`/`remove` diff
  * against the previously exported set. A graft-written store then
  * opens IN PLACE through any Delta reader, with no data movement and
  * no Delta jars on our side — the log is plain JSON per the public
  * protocol (github.com/delta-io/delta/blob/master/PROTOCOL.md).
  *
  * Incremental and idempotent: re-export after new graft commits
  * appends only the new versions (the last exported graft version is
  * recorded on each commit's `commitInfo`); re-export with nothing new
  * is a no-op. A `_delta_log` NOT produced by this exporter is refused
  * rather than appended to — interleaving foreign writers without real
  * optimistic-concurrency handling would corrupt their table.
  *
  * Scale shape: everything here is driver-side metadata IO over the
  * (small) manifest and log — O(files) text per commit, the same cost
  * Manifest.commit already pays; file sizes come from batched
  * `getFileStatus` on the bounded [[FsOps.driverIoPool]]. Data files
  * are untouched.
  */
object DeltaExport {

  private val CommitRe = "^(\\d{20})\\.json$".r
  private val mapper = new ObjectMapper()

  /** Export every graft manifest version newer than the last exported
    * one as Delta JSON commits under `root/_delta_log`. Returns the
    * latest Delta version present after the export (-1 if the manifest
    * is empty and nothing was ever exported).
    */
  def exportDeltaLog(spark: SparkSession, rootStr: String): Long = {
    val root = new Path(rootStr)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val graftVersions = Manifest.presentVersions(fs, root)
    require(graftVersions.nonEmpty, s"no graft manifest under $rootStr — nothing to export")
    val logDir = new Path(root, "_delta_log")

    // Replay our own prior export (if any): last delta version, the
    // exported file set, and the graft version it corresponds to. A log
    // with commits missing our commitInfo tag was written by someone
    // else — refuse to interleave. Replay seeds from our checkpoint when
    // one exists, so a delta-rs log-retention cleanup that deleted
    // pre-checkpoint JSON commits (legal once the checkpoint covers
    // them) cannot corrupt the reconstructed exported set.
    val (lastDelta, lastGraft, exported) = replayOwnLog(spark, fs, logDir)

    val todo = graftVersions.filter(_ > lastGraft)
    if (todo.isEmpty) return lastDelta

    var deltaV = lastDelta
    var prev = exported
    for (gv <- todo) {
      val live = Manifest.liveFiles(fs, root, gv)
      deltaV += 1
      val lines = Seq.newBuilder[String]
      if (deltaV == 0L) {
        lines += protocolLine()
        lines += metaDataLine(root)
      }
      lines += commitInfoLine(gv)
      val added = (live -- prev).toSeq.sorted
      val removed = (prev -- live).toSeq.sorted
      val stats = statFiles(fs, root, added)
      added.foreach(f => lines += addLine(f, stats(f)))
      removed.foreach(f => lines += removeLine(f))
      val tmp = new Path(logDir, f".$deltaV%020d.json.tmp")
      FsOps.writeSmall(fs, tmp, (lines.result().mkString("\n") + "\n").getBytes("UTF-8"))
      if (!FsOps.rename(fs, tmp, new Path(logDir, f"$deltaV%020d.json")))
        throw new IllegalStateException(s"delta export commit race at version $deltaV")
      prev = live
      // delta-rs checkpoints every 10 commits; a long-lived store without
      // them forces every reader to replay the whole JSON log on open
      if (deltaV > 0 && deltaV % CheckpointInterval == 0)
        writeCheckpoint(spark, fs, root, logDir, deltaV, gv, live)
    }
    deltaV
  }

  /** Checkpoint cadence — the delta-rs default interval. */
  private[lake] val CheckpointInterval = 10L

  /** Write `{v:020d}.checkpoint.parquet` (the full replay state at `v`:
    * protocol + metaData + one add per live file) and point
    * `_last_checkpoint` at it, per the public protocol. Remove
    * tombstones are deliberately omitted: they exist so concurrent
    * readers of ALREADY-DELETED files can fail gracefully within the
    * retention window, and this exporter is the log's only writer — the
    * checkpoint is the compaction of its own history. Readers (incl.
    * [[DeltaImport]]) start from the checkpoint and replay only the
    * JSON commits above it, so open cost stops growing with table age.
    *
    * The parquet is written THROUGH Spark (single output file renamed
    * into the log), so a million-file live set streams through an
    * executor task instead of materializing rows on the driver beyond
    * the manifest text already held.
    */
  private def writeCheckpoint(spark: SparkSession, fs: FileSystem,
      root: Path, logDir: Path, version: Long, graftVersion: Long,
      live: Set[String]): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val mapT = MapType(StringType, StringType, valueContainsNull = true)
    val cpSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(
          StructField("provider", StringType),
          StructField("options", mapT)))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", mapT),
        StructField("createdTime", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", mapT),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType))))))
    val files = live.toSeq.sorted
    val stats = statFiles(fs, root, files)
    val rows: Seq[Row] =
      Row(Row(1, 2), null, null) +:
      Row(null, Row(
        tableId(root),
        Row("parquet", Map.empty[String, String]),
        graft.model.Statement.schema.json,
        graft.model.Statement.partitionColumns,
        Map.empty[String, String],
        System.currentTimeMillis()), null) +:
      files.map { f =>
        val (size, mtime) = stats(f)
        Row(null, null,
          Row(encodePath(f), partitionValuesOf(f).toMap, size, mtime, true))
      }
    import scala.jdk.CollectionConverters._
    val tmpDir = new Path(logDir, f".$version%020d.checkpoint.tmp")
    spark.createDataFrame(rows.asJava, cpSchema)
      .repartition(1)
      .write.mode("overwrite").parquet(tmpDir.toString)
    val part = fs.listStatus(tmpDir).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no checkpoint part under $tmpDir"))
    val target = new Path(logDir, f"$version%020d.checkpoint.parquet")
    fs.delete(target, false)
    if (!FsOps.rename(fs, part, target))
      throw new IllegalStateException(s"delta checkpoint rename race at v$version")
    fs.delete(tmpDir, true)
    val lc = mapper.createObjectNode()
    lc.put("version", version)
    lc.put("size", rows.size.toLong)
    // ownership stamp (delta-rs readers ignore unknown keys): lets a
    // later re-export resume from the checkpoint even after log-retention
    // cleanup has deleted the JSON commits it covers
    lc.put("graftManifestVersion", graftVersion)
    FsOps.writeSmall(fs, new Path(logDir, "_last_checkpoint"),
      (mapper.writeValueAsString(lc) + "\n").getBytes("UTF-8"))
  }

  /** (last delta version, last exported graft version, exported live set).
    * (-1, -1, empty) when no `_delta_log` exists yet.
    *
    * When `_last_checkpoint` exists, the base state comes from OUR
    * checkpoint (its `graftManifestVersion` stamp proves we wrote it —
    * a checkpoint without the stamp is a foreign writer's, refused) and
    * only JSON commits ABOVE it replay on top. This keeps re-export
    * correct after a delta-rs log-retention cleanup deletes the JSON
    * commits the checkpoint already covers.
    */
  private def replayOwnLog(spark: SparkSession, fs: FileSystem,
      logDir: Path): (Long, Long, Set[String]) = {
    if (!fs.exists(logDir)) return (-1L, -1L, Set.empty)
    val (cpVersion, cpGraft, cpLive) = readOwnCheckpoint(spark, fs, logDir)
    val commits = fs.listStatus(logDir).map(_.getPath)
      .flatMap(p => p.getName match {
        case CommitRe(v) => Some(v.toLong -> p)
        case _ => None
      })
      .filter(_._1 > cpVersion)
      .sortBy(_._1)
    if (commits.isEmpty) return (cpVersion, cpGraft, cpLive)
    var lastGraft = cpGraft
    var live = cpLive
    for ((v, p) <- commits) {
      var tagged = false
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(p), "UTF-8"))
      try {
        var line = in.readLine()
        while (line != null) {
          if (line.nonEmpty) {
            val node = mapper.readTree(line)
            val ci = node.get("commitInfo")
            if (ci != null && !ci.isNull && ci.has("graftManifestVersion")) {
              lastGraft = ci.get("graftManifestVersion").asLong
              tagged = true
            }
            val add = node.get("add")
            if (add != null && !add.isNull)
              live += URLDecoder.decode(add.get("path").asText, "UTF-8")
            val remove = node.get("remove")
            if (remove != null && !remove.isNull)
              live -= URLDecoder.decode(remove.get("path").asText, "UTF-8")
          }
          line = in.readLine()
        }
      } finally in.close()
      require(tagged,
        s"delta export: $logDir holds commit v$v not written by graft " +
          "(no commitInfo.graftManifestVersion) — refusing to append to a foreign _delta_log; " +
          "use `delta import` to adopt it instead")
    }
    (commits.last._1, lastGraft, live)
  }

  /** Base replay state from `_last_checkpoint`, when present and OURS:
    * (checkpoint delta version, its graftManifestVersion stamp, its add
    * set). (-1, -1, empty) when no checkpoint exists. A `_last_checkpoint`
    * without the graft stamp means a foreign writer checkpointed this
    * log — refuse, same policy as untagged commits.
    */
  private def readOwnCheckpoint(spark: SparkSession, fs: FileSystem,
      logDir: Path): (Long, Long, Set[String]) = {
    val lcPath = new Path(logDir, "_last_checkpoint")
    if (!fs.exists(lcPath)) return (-1L, -1L, Set.empty)
    val lcIn = fs.open(lcPath)
    val lcBytes =
      try org.apache.hadoop.io.IOUtils.readFullyToByteArray(lcIn)
      finally lcIn.close()
    val lc = mapper.readTree(new String(lcBytes, "UTF-8"))
    val v = lc.get("version").asLong
    require(lc.has("graftManifestVersion"),
      s"delta export: $logDir holds a checkpoint not written by graft " +
        "(no graftManifestVersion in _last_checkpoint) — refusing to append " +
        "to a foreign _delta_log; use `delta import` to adopt it instead")
    val cp = new Path(logDir, f"$v%020d.checkpoint.parquet")
    require(fs.exists(cp), s"_last_checkpoint names v$v but $cp is missing")
    val df = spark.read.parquet(cp.toString)
    val live = df.select("add.path").na.drop()
      .collect().map(r => URLDecoder.decode(r.getString(0), "UTF-8")).toSet
    (v, lc.get("graftManifestVersion").asLong, live)
  }

  private def protocolLine(): String =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  /** Stable per-table id. Derived from the NORMALIZED `Path.toString`
    * (never the caller's raw string) so the v0 metaData commit and every
    * checkpoint of the same table agree even when the caller's spelling
    * differs (trailing slash, `file:///` vs `file:/`).
    */
  private def tableId(root: Path): String =
    java.util.UUID.nameUUIDFromBytes(
      ("graft:" + root.toString).getBytes("UTF-8")).toString

  private def metaDataLine(root: Path): String = {
    val md = mapper.createObjectNode()
    val m = md.putObject("metaData")
    m.put("id", tableId(root))
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    // Delta's schemaString IS Spark's StructType JSON
    m.put("schemaString", graft.model.Statement.schema.json)
    val pc = m.putArray("partitionColumns")
    graft.model.Statement.partitionColumns.foreach(pc.add)
    m.putObject("configuration")
    m.put("createdTime", System.currentTimeMillis())
    mapper.writeValueAsString(md)
  }

  private def commitInfoLine(graftVersion: Long): String = {
    val n = mapper.createObjectNode()
    val ci = n.putObject("commitInfo")
    ci.put("operation", "graft.export")
    ci.put("graftManifestVersion", graftVersion)
    ci.put("timestamp", System.currentTimeMillis())
    mapper.writeValueAsString(n)
  }

  private def addLine(relPath: String, stat: (Long, Long)): String = {
    val n = mapper.createObjectNode()
    val add = n.putObject("add")
    add.put("path", encodePath(relPath))
    val pv = add.putObject("partitionValues")
    partitionValuesOf(relPath).foreach { case (k, v) =>
      if (v == null) pv.putNull(k) else pv.put(k, v)
    }
    add.put("size", stat._1)
    add.put("modificationTime", stat._2)
    add.put("dataChange", true)
    mapper.writeValueAsString(n)
  }

  private def removeLine(relPath: String): String = {
    val n = mapper.createObjectNode()
    val rm = n.putObject("remove")
    rm.put("path", encodePath(relPath))
    rm.put("deletionTimestamp", System.currentTimeMillis())
    rm.put("dataChange", true)
    mapper.writeValueAsString(n)
  }

  /** Hive segment names (`col=value`) → Delta partitionValues for the
    * statement partition columns, in directory order. Values are
    * Hive-escaped on disk (Spark percent-escapes specials), so decode;
    * the Hive null sentinel maps to a JSON null per the Delta protocol.
    */
  private[lake] def partitionValuesOf(relPath: String): Seq[(String, String)] = {
    val cols = graft.model.Statement.partitionColumns.toSet
    relPath.split('/').dropRight(1).toSeq.flatMap { seg =>
      val i = seg.indexOf('=')
      if (i <= 0) None
      else {
        val k = seg.substring(0, i)
        if (!cols.contains(k)) None
        else {
          val raw = seg.substring(i + 1)
          val v = if (raw == "__HIVE_DEFAULT_PARTITION__") null
          else hiveUnescape(raw)
          Some(k -> v)
        }
      }
    }
  }

  /** Hive path-name unescape: %XX byte escapes only (Spark's
    * escapePathName writes these; unlike form encoding, `+` is a
    * literal plus in a partition value).
    */
  private def hiveUnescape(s: String): String = {
    if (!s.contains('%')) return s
    val bytes = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val escaped =
        if (c == '%' && i + 2 < s.length)
          scala.util.Try(Integer.parseInt(s.substring(i + 1, i + 3), 16)).toOption
        else None
      escaped match {
        case Some(b) => bytes.write(b); i += 3
        case None =>
          val cb = c.toString.getBytes("UTF-8")
          bytes.write(cb, 0, cb.length)
          i += 1
      }
    }
    new String(bytes.toByteArray, "UTF-8")
  }

  /** Delta add/remove paths are percent-encoded relative URIs. Encode
    * per path segment (keeping `/` literal); unreserved chars and `=`
    * pass through, so typical graft paths encode to themselves — the
    * exact inverse of [[DeltaImport]]'s URLDecoder.
    */
  private[lake] def encodePath(relPath: String): String =
    relPath.split('/').map { seg =>
      URLEncoder.encode(seg, "UTF-8")
        .replace("+", "%20") // URLEncoder is form-encoding; URIs want %20
        .replace("%3D", "=") // '=' is legal in a URI path segment
    }.mkString("/")

  /** (size, modificationTime) per relative path, batched on the driver
    * IO pool — one getFileStatus round trip per file, 16-way.
    */
  private def statFiles(fs: FileSystem, root: Path,
      rel: Seq[String]): Map[String, (Long, Long)] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext = FsOps.driverIoPool
    val futs = rel.map { f =>
      Future {
        val st = fs.getFileStatus(new Path(root, f))
        f -> (st.getLen, st.getModificationTime)
      }
    }
    Await.result(Future.sequence(futs), 10.minutes).toMap
  }
}
