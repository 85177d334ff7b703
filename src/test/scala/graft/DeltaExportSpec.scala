package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.lake.{DeltaExport, DeltaImport, Manifest, StatementStore}

/** Manifest → `_delta_log` export (the inverse of DeltaImport): a
  * graft-written statement table becomes openable by delta-rs / the
  * reference stack (storage/parquet.py:651-663) in place. Round-trip
  * proof uses our own importer: export the log, drop the graft
  * manifest, re-adopt through DeltaImport, and the live set and rows
  * must be identical.
  */
class DeltaExportSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def hpath(root: String) = new org.apache.hadoop.fs.Path(root)

  private def payload(id: String, name: String) =
    graft.ops.Explode.EntityPayload(id, "Person", Map("name" -> Seq(name)))

  private def appendOne(store: StatementStore, id: String, name: String): Unit = {
    import spark.implicits._
    store.append(graft.ops.Explode.explode(
      Seq(payload(id, name)).toDS(), "test", "default", store.shards,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
  }

  private def commitLines(root: String, v: Long): Seq[String] =
    Files.readAllLines(Paths.get(root, "_delta_log", f"$v%020d.json"))
      .asScala.toSeq.filter(_.nonEmpty)

  private def actions(root: String, v: Long, kind: String) =
    commitLines(root, v).map(mapper.readTree)
      .filter(n => n.has(kind) && !n.get(kind).isNull).map(_.get(kind))

  test("commit 0 carries reader-v1 protocol, statement metaData, sized adds") {
    val root = Files.createTempDirectory("graft-dexp").toString
    val store = new StatementStore(spark, root, shards = 4)
    appendOne(store, "jane", "Jane")
    val live = Manifest.liveFiles(hfs(root), hpath(root), -1L)

    val v = DeltaExport.exportDeltaLog(spark, root)
    // one delta commit per present manifest version, 0-based
    assert(v == Manifest.presentVersions(hfs(root), hpath(root)).size - 1L)
    val prot = actions(root, 0L, "protocol")
    assert(prot.size == 1)
    assert(prot.head.get("minReaderVersion").asInt == 1)
    assert(prot.head.get("minWriterVersion").asInt == 2)

    val md = actions(root, 0L, "metaData")
    assert(md.size == 1)
    val schemaString = md.head.get("schemaString").asText
    assert(org.apache.spark.sql.types.DataType.fromJson(schemaString)
      == graft.model.Statement.schema)
    val parts = md.head.get("partitionColumns").elements().asScala.map(_.asText).toSeq
    assert(parts == graft.model.Statement.partitionColumns)

    // every add across commits: live path, hive partitionValues parsed
    // from the path, real size
    val adds = (0L to v).flatMap(actions(root, _, "add"))
    val addPaths = adds.map(a => java.net.URLDecoder.decode(a.get("path").asText, "UTF-8")).toSet
    assert(addPaths == live, s"adds $addPaths vs live $live")
    adds.foreach { a =>
      val path = java.net.URLDecoder.decode(a.get("path").asText, "UTF-8")
      val pv = a.get("partitionValues")
      for (seg <- path.split('/').dropRight(1)) {
        val Array(k, value) = seg.split("=", 2)
        assert(pv.get(k).asText == value, s"partitionValues[$k] for $path")
      }
      assert(a.get("size").asLong > 0L)
      assert(a.get("dataChange").asBoolean)
    }
  }

  test("round-trip: export, drop manifest, re-import — identical live set and rows") {
    val root = Files.createTempDirectory("graft-dexp-rt").toString
    val store = new StatementStore(spark, root, shards = 4)
    appendOne(store, "jane", "Jane")
    appendOne(store, "acme", "Acme Corp")
    val live = Manifest.liveFiles(hfs(root), hpath(root), -1L)
    val wantRows = store.raw.collect().map(_.toString).sorted.toSeq

    DeltaExport.exportDeltaLog(spark, root)
    // hand the table to "the reference": graft metadata gone, delta log stays
    hfs(root).delete(new org.apache.hadoop.fs.Path(root, "_graft"), true)

    DeltaImport.importDeltaLog(spark, root)
    val adopted = new StatementStore(spark, root, shards = 4)
    assert(Manifest.liveFiles(hfs(root), hpath(root), -1L) == live)
    assert(adopted.raw.collect().map(_.toString).sorted.toSeq == wantRows)
  }

  test("incremental: re-export appends only new manifest versions; no-op when current") {
    val root = Files.createTempDirectory("graft-dexp-inc").toString
    val store = new StatementStore(spark, root, shards = 4)
    appendOne(store, "jane", "Jane")
    val v1 = DeltaExport.exportDeltaLog(spark, root)
    assert(DeltaExport.exportDeltaLog(spark, root) == v1) // idempotent no-op
    val before = commitLines(root, v1)

    appendOne(store, "acme", "Acme")
    val v2 = DeltaExport.exportDeltaLog(spark, root)
    assert(v2 > v1)
    assert(commitLines(root, v1) == before) // earlier commits untouched
    // the new commit adds exactly the manifest diff
    val prevLive = Manifest.liveFiles(hfs(root), hpath(root),
      Manifest.presentVersions(hfs(root), hpath(root)).dropRight(1).last)
    val nowLive = Manifest.liveFiles(hfs(root), hpath(root), -1L)
    val lastAdds = actions(root, v2, "add")
      .map(a => java.net.URLDecoder.decode(a.get("path").asText, "UTF-8")).toSet
    assert(lastAdds == (nowLive -- prevLive))
  }

  test("compaction maps to add+remove in one commit") {
    val root = Files.createTempDirectory("graft-dexp-cpt").toString
    val store = new StatementStore(spark, root, shards = 2)
    // same entity id twice → same (shard,bucket,origin) partition holds
    // two files, so compact(1) must rewrite it
    appendOne(store, "jane", "Jane")
    appendOne(store, "jane", "Jane B")
    DeltaExport.exportDeltaLog(spark, root)
    val before = Manifest.liveFiles(hfs(root), hpath(root), -1L)
    store.compact(maxFilesPerPartition = 1)
    val after = Manifest.liveFiles(hfs(root), hpath(root), -1L)
    assert(before != after, "compaction changed nothing at this size")
    val v = DeltaExport.exportDeltaLog(spark, root)
    val adds = actions(root, v, "add")
      .map(a => java.net.URLDecoder.decode(a.get("path").asText, "UTF-8")).toSet
    val removes = actions(root, v, "remove")
      .map(r => java.net.URLDecoder.decode(r.get("path").asText, "UTF-8")).toSet
    assert(adds == (after -- before))
    assert(removes == (before -- after))
  }

  test("checkpoints every 10 commits; import opens from it; export resumes past it") {
    val root = Files.createTempDirectory("graft-dexp-ckpt").toString
    val store = new StatementStore(spark, root, shards = 2)
    // 12 manifest versions → delta v0..v11 → checkpoint at v10
    (1 to 12).foreach(i => appendOne(store, s"e$i", s"Entity $i"))
    assert(DeltaExport.exportDeltaLog(spark, root) == 11L)

    val fs = hfs(root)
    val logDir = new org.apache.hadoop.fs.Path(root, "_delta_log")
    val lcPath = new org.apache.hadoop.fs.Path(logDir, "_last_checkpoint")
    assert(fs.exists(lcPath), "_last_checkpoint missing")
    val lc = mapper.readTree(new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(lcPath)), "UTF-8"))
    assert(lc.get("version").asLong == 10L)
    val cpFile = new org.apache.hadoop.fs.Path(logDir,
      f"${10L}%020d.checkpoint.parquet")
    assert(fs.exists(cpFile), "checkpoint parquet missing")
    // the checkpoint carries the full replay state at v10: protocol,
    // metaData, and one add per file live at that version
    val cp = spark.read.parquet(cpFile.toString)
    assert(cp.filter(cp.col("protocol.minReaderVersion") === 1).count() == 1L)
    assert(cp.filter(cp.col("metaData.id").isNotNull).count() == 1L)
    val cpAdds = cp.select("add.path").na.drop().count()
    val liveAt10 = Manifest.liveFiles(fs, hpath(root),
      Manifest.presentVersions(fs, hpath(root)).take(11).last)
    assert(cpAdds == liveAt10.size.toLong)

    // a fresh export RESUMES past the checkpoint (no rewrite, no re-checkpoint)
    appendOne(store, "late", "Late Entity")
    assert(DeltaExport.exportDeltaLog(spark, root) == 12L)
    assert(lc == mapper.readTree(new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(lcPath)), "UTF-8")))

    // import must open VIA the checkpoint: hide the pre-checkpoint JSON
    // commits — only the checkpoint plus v11/v12 remain readable
    val wantRows = store.raw.collect().map(_.toString).sorted.toSeq
    val live = Manifest.liveFiles(fs, hpath(root), -1L)
    val hidden = new org.apache.hadoop.fs.Path(root, "_hidden_commits")
    fs.mkdirs(hidden)
    (0L to 10L).foreach { v =>
      assert(fs.rename(new org.apache.hadoop.fs.Path(logDir, f"$v%020d.json"),
        new org.apache.hadoop.fs.Path(hidden, f"$v%020d.json")))
    }
    fs.delete(new org.apache.hadoop.fs.Path(root, "_graft"), true)
    DeltaImport.importDeltaLog(spark, root)
    val adopted = new StatementStore(spark, root, shards = 2)
    assert(Manifest.liveFiles(fs, hpath(root), -1L) == live)
    assert(adopted.raw.collect().map(_.toString).sorted.toSeq == wantRows)
  }

  test("re-export survives log-retention cleanup of pre-checkpoint commits") {
    val root = Files.createTempDirectory("graft-dexp-clean").toString
    val store = new StatementStore(spark, root, shards = 2)
    (1 to 12).foreach(i => appendOne(store, s"e$i", s"Entity $i"))
    assert(DeltaExport.exportDeltaLog(spark, root) == 11L)

    val fs = hfs(root)
    val logDir = new org.apache.hadoop.fs.Path(root, "_delta_log")
    // delta-rs log cleanup: once the v10 checkpoint covers them, the JSON
    // commits v0..v10 may be deleted by table maintenance
    (0L to 10L).foreach(v =>
      assert(fs.delete(new org.apache.hadoop.fs.Path(logDir, f"$v%020d.json"), false)))

    // idempotent no-op still resolves the current head from checkpoint + v11
    assert(DeltaExport.exportDeltaLog(spark, root) == 11L)

    // incremental export resumes with the correct diff: the new commit
    // adds exactly the latest manifest delta, nothing re-added
    appendOne(store, "late", "Late Entity")
    assert(DeltaExport.exportDeltaLog(spark, root) == 12L)
    val versions = Manifest.presentVersions(fs, hpath(root))
    val prevLive = Manifest.liveFiles(fs, hpath(root), versions.dropRight(1).last)
    val nowLive = Manifest.liveFiles(fs, hpath(root), -1L)
    val adds = actions(root, 12L, "add")
      .map(a => java.net.URLDecoder.decode(a.get("path").asText, "UTF-8")).toSet
    assert(adds == (nowLive -- prevLive))
    assert(actions(root, 12L, "remove").isEmpty)

    // and a foreign checkpoint (no graft stamp) is refused, same policy
    // as untagged commits
    val lcPath = new org.apache.hadoop.fs.Path(logDir, "_last_checkpoint")
    val lc = mapper.readTree(new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(lcPath)), "UTF-8"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    lc.remove("graftManifestVersion")
    fs.delete(lcPath, false)
    graft.lake.FsOps.writeSmall(fs, lcPath,
      (mapper.writeValueAsString(lc) + "\n").getBytes("UTF-8"))
    appendOne(store, "more", "More")
    val e = intercept[IllegalArgumentException](DeltaExport.exportDeltaLog(spark, root))
    assert(e.getMessage.contains("foreign"), e.getMessage)
  }

  test("refuses a foreign _delta_log (commits without the graft tag)") {
    val root = Files.createTempDirectory("graft-dexp-foreign").toString
    val store = new StatementStore(spark, root, shards = 2)
    appendOne(store, "jane", "Jane")
    val dir = Paths.get(root, "_delta_log")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(f"${0L}%020d.json"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" + "\n" +
        """{"metaData":{"id":"x","format":{"provider":"parquet"}}}""")
    val e = intercept[IllegalArgumentException](
      DeltaExport.exportDeltaLog(spark, root))
    assert(e.getMessage.contains("foreign"), e.getMessage)
  }

  test("cli: `delta export <ds>` publishes the log") {
    val lakeRoot = Files.createTempDirectory("graft-dexp-cli").toString
    val dsRoot = s"$lakeRoot/pub"
    val store = new StatementStore(spark, dsRoot, shards = 2)
    appendOne(store, "cliexp", "Cli")
    graft.cli.Main.run(spark, lakeRoot, Map.empty, List("delta", "export", "pub"))
    assert(Files.exists(Paths.get(dsRoot, "_delta_log", f"${0L}%020d.json")))
  }
}
