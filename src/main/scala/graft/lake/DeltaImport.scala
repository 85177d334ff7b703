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

    // Protocol / table-feature guard state: the LATEST protocol and
    // metaData actions win (Delta replay semantics). Anything beyond
    // plain reader-v1 parquet (deletion vectors, column mapping, …)
    // would import silently wrong — refuse loudly instead.
    var minReader = 1
    var readerFeatures: Seq[String] = Nil
    var columnMapping = "none"

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
        if (cp.columns.contains("protocol")) {
          val prot = cp.select("protocol").na.drop("all")
            .filter(cp.col("protocol.minReaderVersion").isNotNull)
            .collect()
          prot.foreach { r =>
            val p = r.getStruct(0)
            minReader = p.getAs[Number]("minReaderVersion").intValue()
            readerFeatures = readFeatures(p)
          }
        }
        if (cp.columns.contains("metaData")) {
          val md = cp.select("metaData").na.drop("all")
            .filter(cp.col("metaData.id").isNotNull).collect()
          md.foreach(r => columnMapping = readColumnMapping(r.getStruct(0)))
        }
        // Deletion vectors ride on individual add actions: a checkpoint
        // row with add.deletionVector set means soft-deleted rows the
        // plain parquet scan would resurrect.
        if (flatColumns(cp, "add").contains("deletionVector")) {
          val dv = cp.filter(cp.col("add.path").isNotNull
            .and(cp.col("add.deletionVector").isNotNull)).count()
          require(dv == 0L,
            s"delta import: $dv checkpoint add action(s) carry deletion vectors — unsupported")
        }
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
            val protocol = node.get("protocol")
            val metaData = node.get("metaData")
            if (protocol != null && !protocol.isNull) {
              minReader = Option(protocol.get("minReaderVersion")).map(_.asInt(1)).getOrElse(1)
              readerFeatures = Option(protocol.get("readerFeatures")).filter(_.isArray)
                .map(a => (0 until a.size()).map(a.get(_).asText())).getOrElse(Nil)
            }
            if (metaData != null && !metaData.isNull) {
              columnMapping = Option(metaData.get("configuration"))
                .flatMap(c => Option(c.get("delta.columnMapping.mode")))
                .map(_.asText()).getOrElse("none")
            }
            if (add != null && !add.isNull) {
              val dv = add.get("deletionVector")
              require(dv == null || dv.isNull,
                s"delta import: add action for ${add.get("path").asText} carries a deletion vector — unsupported")
              live += decode(add.get("path").asText)
            }
            if (remove != null && !remove.isNull) live -= decode(remove.get("path").asText)
          }
          line = in.readLine()
        }
      } finally in.close()
    }

    require(minReader <= 1,
      s"delta import: table requires minReaderVersion=$minReader" +
        (if (readerFeatures.nonEmpty) s" (readerFeatures: ${readerFeatures.mkString(", ")})" else "") +
        " — only plain reader-v1 parquet tables are supported; deletion vectors /" +
        " column mapping would read back wrong data through graft paths")
    require(columnMapping == "none" || columnMapping.isEmpty,
      s"delta import: delta.columnMapping.mode=$columnMapping — physical column names" +
        " would differ from logical ones; only mode=none is supported")
    assertStatementSchema(spark, root, live)
    Manifest.commit(fs, root, live, "delta-import")
  }

  /** Refuse to commit a manifest over files whose parquet footers do not
    * carry the statement schema: every non-partition statement column must
    * be present with its exact type (partition columns live in the Hive
    * directory names, not the footers). Reads footers through Spark —
    * never the data — so the check is O(files' metadata).
    */
  private def assertStatementSchema(spark: SparkSession, root: Path,
      live: Set[String]): Unit = {
    if (live.isEmpty) return
    val got = spark.read
      .option("basePath", root.toString)
      .parquet(live.toSeq.sorted.map(f => s"$root/$f"): _*)
      .schema
    val dataFields = graft.model.Statement.schema.fields
      .filterNot(f => graft.model.Statement.partitionColumns.contains(f.name))
    val missing = dataFields.filterNot(f =>
      got.fields.exists(g => g.name == f.name && g.dataType == f.dataType))
    require(missing.isEmpty,
      s"delta import: data files do not match the statement schema — missing/mistyped: " +
        missing.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ") +
        s" (found: ${got.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")})")
  }

  private def readFeatures(p: org.apache.spark.sql.Row): Seq[String] =
    if (p.schema.fieldNames.contains("readerFeatures") && !p.isNullAt(p.fieldIndex("readerFeatures")))
      p.getSeq[String](p.fieldIndex("readerFeatures"))
    else Nil

  private def readColumnMapping(md: org.apache.spark.sql.Row): String =
    if (md.schema.fieldNames.contains("configuration") && !md.isNullAt(md.fieldIndex("configuration")))
      Option(md.getMap[String, String](md.fieldIndex("configuration"))
        .getOrElse("delta.columnMapping.mode", "none")).getOrElse("none")
    else "none"

  private def flatColumns(df: org.apache.spark.sql.DataFrame, field: String): Seq[String] =
    df.schema.fields.find(_.name == field).map(_.dataType) match {
      case Some(s: org.apache.spark.sql.types.StructType) => s.fieldNames.toSeq
      case _ => Nil
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
