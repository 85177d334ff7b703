package graft.ops

import org.apache.spark.sql.functions._

import graft.lake.{Journal, StatementStore}

/** Operation orchestration (reference §3.3: `optimize` = merge → compact →
  * vacuum; `make` = flush + every export in order, each freshness-gated by
  * tags so re-running `make` on an unchanged store does no IO).
  */
object Make {

  /** Maintenance: drain journal, merge dirty partitions, compact, vacuum.
    * Every step is incremental: a clean store is a metadata-only no-op.
    */
  def optimize(store: StatementStore, journal: Journal,
      graceCutoff: Option[org.apache.spark.sql.Column] = None): Long = {
    journal.drain(store)
    store.merge(graceCutoff)
    store.compact()
    store.vacuum()
    store.tags.touch("statements/last_optimized")
    store.version
  }

  /** Export pipeline with freshness gating: each artifact records the
    * store version it was built from; artifacts current for the version
    * are skipped (reference ST2 / operation/export.py:37-199). The full
    * artifact set mirrors the reference's MakeOperation: statements.csv →
    * entities.ftm.json (+ incremental diff) → documents.csv →
    * statistics.json → index.json (operation/make.py:14-26).
    */
  def make(store: StatementStore, journal: Journal, outDir: String,
      publicUrlPrefixOpt: Option[String] = None,
      datasetNameOpt: Option[String] = None,
      compressionOpt: Option[String] = None,
      force: Boolean = false,
      only: Option[String] = None): Seq[String] = {
    optimize(store, journal)
    // explicit arguments win; otherwise the persisted dataset config
    // supplies name / codec / public prefix (reference DatasetModel)
    val cfg = {
      val root = new org.apache.hadoop.fs.Path(store.rootStr)
      graft.lake.DatasetConfig.load(
        root.getFileSystem(store.spark.sessionState.newHadoopConf()), root)
    }
    val publicUrlPrefix = publicUrlPrefixOpt.orElse(cfg.flatMap(_.publicUrlPrefix))
    val datasetName = datasetNameOpt.orElse(cfg.map(_.name)).getOrElse("dataset")
    val compression = compressionOpt.getOrElse("none")
    val v = store.version
    val done = scala.collection.mutable.ListBuffer.empty[String]
    def gated(name: String)(body: => Unit): Unit = {
      // `only` scopes a kind-dispatched ExportJob to its one artifact
      // (reference operation/export.py runs one artifact kind per job)
      if (only.exists(_ != name)) return
      val tag = s"exports/$name"
      val versionTag = s"exports/$name.version"
      // force rebuilds regardless of freshness (reference operations'
      // `force` flag, operation/base.py:56-92)
      val current = !force && store.tags.mtime(versionTag).contains(v)
      if (!current) {
        body
        store.tags.touch(versionTag, v) // encode version as the mtime
        store.tags.touch(tag)
        done += name
      }
    }
    // single-file artifacts (the byte-reproducible files downstream
    // mirrors checksum — reference operation/export.py); the distributed
    // sort happens in executors, only the final concat is driver-streamed
    val suffix = compression match {
      case "gzip" | "gz" => ".gz"
      case "zstd" | "zst" => ".zst"
      case _ => ""
    }
    // after a successful rewrite at the CURRENT suffix, drop the other
    // suffix variants of the same artifact: when the compression setting
    // changes (gzip → none), the new file lands at the new name while the
    // old-suffix variant would otherwise stay on disk forever — a mirror
    // still fetching the old name would receive stale content with no
    // error. Delete-after-publish keeps the window where NO variant
    // exists at zero (the new artifact is already live when the stale
    // names disappear).
    def dropStaleVariants(base: String): Unit = {
      val hconf = store.spark.sessionState.newHadoopConf()
      Seq("", ".gz", ".zst").filterNot(_ == suffix).foreach { s =>
        val p = new org.apache.hadoop.fs.Path(s"$base$s")
        val fs = p.getFileSystem(hconf)
        if (fs.exists(p)) fs.delete(p, false)
      }
    }
    // the whole export pass runs under job lifecycle tracking (reference
    // operation/make.py wraps exports in an ExportJob run): a crashed
    // make leaves an inspectable failed run with the exception captured,
    // a clean one records how many artifacts were (re)built
    val jobs = new graft.lake.JobRepository(store.spark, store.rootStr, "MakeJob")
    jobs.run() { h =>
    gated("statements.csv") {
      // full reference column set (model/statement.py:90-112) so the
      // artifact round-trips through statementsCsvImport
      Exports.singleFileCsv(
        store.raw.select(graft.model.Statement.columns.map(col): _*),
        s"$outDir/statements.csv$suffix", compression = compression)
      dropStaleVariants(s"$outDir/statements.csv")
    }
    gated("entities.ftm.json") {
      Exports.singleFileJson(
        EntityAssembly.assemble(store.live).toDF(),
        s"$outDir/entities.ftm.json$suffix", "id", compression = compression)
      dropStaleVariants(s"$outDir/entities.ftm.json")
      // incremental diff rides the entities export (reference
      // _export_entities: export + export_diff); stateful — initial run
      // emits the full ADD copy, later runs only the window's ADD/MOD/DEL
      Diff.exportDiff(store, outDir)
    }
    gated("documents.csv") {
      // reference short-circuits document-free datasets with one cheap
      // count before any per-partition work (documents.py:118-123) — but
      // only datasets that NEVER had documents: once the artifact exists,
      // an all-documents-deleted dataset must still rewrite it (now
      // empty) and run the diff so downstream mirrors receive the DELs,
      // instead of serving the stale previous table forever
      val docs = Documents.documentsTable(store.live, publicUrlPrefix)
      val dest = s"$outDir/documents.csv$suffix"
      val hconf = store.spark.sessionState.newHadoopConf()
      val destPath = new org.apache.hadoop.fs.Path(dest)
      val destFs = destPath.getFileSystem(hconf)
      // probe ALL suffix variants, not just the current compression's:
      // if the setting changed since the artifact was written (gzip →
      // none), an emptied dataset must still rewrite and emit DELs
      // instead of serving the stale old-suffix file forever
      val hadDocs = Seq("", ".gz", ".zst").exists(s =>
        destFs.exists(new org.apache.hadoop.fs.Path(s"$outDir/documents.csv$s")))
      if (!docs.isEmpty || hadDocs) {
        Exports.singleFileCsv(docs, dest,
          sortCol = "id", compression = compression)
        dropStaleVariants(s"$outDir/documents.csv")
        Diff.exportDocumentsDiff(store, outDir, publicUrlPrefix)
      }
    }
    gated("statistics.json") {
      // one genuine FILE (index.json advertises it as a resource a
      // mirror can fetch — a Spark part-file directory 404s there).
      // Facet cardinality is bounded by the model's schema/country sets,
      // so the driver-side write is O(facets), not O(data)
      val lines = Stats.facets(store.live).toJSON.collect().sorted
      val p = new org.apache.hadoop.fs.Path(s"$outDir/statistics.json")
      val sfs = p.getFileSystem(store.spark.sessionState.newHadoopConf())
      // atomic publish: mirrors poll this artifact by name
      graft.lake.FsOps.publishSmall(sfs, p,
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    gated("index.json") {
      writeIndex(store, outDir, datasetName, publicUrlPrefix)
    }
    h.save(done = done.size)
    }
    done.toList
  }

  /** index.json: the dataset's catalog entry — config, version, entity
    * count, per-schema facets, and the resource list of published
    * artifacts (reference catalog.py:40-125, operation/export.py:96-131).
    * Driver-side: one small JSON file, not a data artifact.
    */
  private def writeIndex(store: StatementStore, outDir: String,
      datasetName: String, publicUrlPrefix: Option[String]): Unit = {
    val entityCount = store.live.select(countDistinct(col("entity_id")))
      .collect()(0).getLong(0)
    val facets = store.live.groupBy(col("schema"))
      .agg(countDistinct(col("entity_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val hconf = store.spark.sessionState.newHadoopConf()
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val outFs = outPath.getFileSystem(hconf)
    val artifacts = Seq("statements.csv", "entities.ftm.json", "documents.csv")
      .flatMap(a => Seq(a, s"$a.gz", s"$a.zst")).appended("statistics.json")
      .filter(a => outFs.exists(new org.apache.hadoop.fs.Path(outPath, a)))
    // Jackson, not hand-rolled string escaping: a dataset name or URL
    // carrying a control character must still produce parseable JSON
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = mapper.createObjectNode()
    rootNode.put("name", datasetName)
    rootNode.put("version", store.version)
    rootNode.put("entity_count", entityCount)
    val schemataNode = rootNode.putObject("schemata")
    facets.foreach { case (s, n) => schemataNode.put(s, n) }
    val resourcesNode = rootNode.putArray("resources")
    artifacts.foreach { a =>
      val res = resourcesNode.addObject()
      res.put("name", a)
      res.put("path", a)
      publicUrlPrefix.foreach(p => res.put("url", s"${p.stripSuffix("/")}/$a"))
    }
    // atomic publish: index.json is the catalog entry mirrors poll —
    // never expose a torn prefix mid-write
    graft.lake.FsOps.publishSmall(outFs,
      new org.apache.hadoop.fs.Path(outPath, "index.json"),
      mapper.writeValueAsBytes(rootNode))
  }
}
