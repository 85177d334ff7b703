package graft.api

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.{Catalog, DatasetConfig, LakeRepository}
import graft.model.Statement
import graft.query.{FtmQuery, Rql}

/** The reference's HTTP surface (S14) over the Spark lake: the three
  * lakehouse routers of `api/main.py` — entities, journal, operations —
  * re-expressed on the JDK's built-in `com.sun.net.httpserver` (no extra
  * dependency; the blob-storage mount in the reference belongs to its
  * `anystore`/`putfs` packages, not the lakehouse itself, and stays out).
  *
  * Routes (reference api/routes/entities.py, journal.py, operations.py):
  * {{{
  *   GET    /                                        catalog index JSON
  *   POST   /{ds}/_api/entities/flush                journal→store, count
  *   POST   /{ds}/_api/entities/merge                merge, "ok"
  *   POST   /{ds}/_api/entities/query                NDJSON entity docs
  *   POST   /{ds}/_api/entities/statements/query     NDJSON statements
  *   GET    /{ds}/_api/entities/stats                statistics JSON
  *   GET    /{ds}/_api/entities/statements/version   store version text
  *   DELETE /{ds}/_api/entities/{id}                 tombstone count text
  *   POST   /{ds}/_api/journal/bulk                  JSONL rows in, count
  *   GET    /{ds}/_api/journal/iterate               staged rows JSONL
  *   POST   /{ds}/_api/journal/flush                 rows JSONL + clear
  *   GET    /{ds}/_api/journal/count                 staged count text
  *   DELETE /{ds}/_api/journal/clear                 cleared count text
  *   POST   /{ds}/_api/operations?force=             {"name": <job>} JSON
  *   PUT    /{ds}/_api/archive                       blob in, checksum out
  *   GET    /{ds}/_api/archive/{checksum}            blob bytes
  *   HEAD   /{ds}/_api/archive/{checksum}            200/404
  * }}}
  *
  * Query bodies follow the reference's QueryBody contract
  * (api/dependencies.py:78-167): `query` carries the filter tree as RQL;
  * `order_by`/`limit`/`offset` ride as sibling fields; `origin` scopes
  * reads; `flush_first` drains the journal before reading; unknown body
  * keys are rejected (extra="forbid" twin). The RQL DoS caps fire inside
  * [[Rql.parse]] — a million-leaf and() 400s without materializing.
  *
  * Execution shape: query routes stream NDJSON through
  * `toLocalIterator` — one partition in driver memory at a time, never a
  * full collect; the distributed work (filter compile funnel, assembly
  * fold, top-k pagination) is the same plans the embedded surface runs.
  * Errors map like the reference: IllegalArgument → 400, unknown
  * dataset/route → 404, anything else → 500.
  */
class LakeHttpServer(spark: SparkSession, lakeRoot: String, port: Int = 0,
    apiCreds: Option[(String, String)] = LakeHttpServer.envCreds) {

  private val mapper = new ObjectMapper()
  private val catalog = new Catalog(spark, lakeRoot)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  // small fixed pool: handlers run Spark jobs; oversubscribing the driver
  // with hundreds of concurrent actions helps nothing
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
  server.setExecutor(pool)

  def start(): Int = { server.createContext("/", router); server.start(); boundPort }
  // the pool's threads are non-daemon: without the shutdown an embedding
  // CLI/test that stops the server still cannot exit the JVM
  def stop(): Unit = { server.stop(0); pool.shutdown() }
  def boundPort: Int = server.getAddress.getPort

  private def repo(ds: String): LakeRepository = {
    Catalog.validateName(ds)
    if (!catalog.datasetExists(ds))
      throw new NoSuchElementException(s"no such dataset: $ds")
    val p = catalog.datasetPath(ds)
    val shards = DatasetConfig.load(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p)
      .map(_.shards).getOrElse(16)
    new LakeRepository(spark, p.toString, ds, shards)
  }

  /** Per-dataset blob root `<dataset>/archive` (same convention as the
    * CLI archive group).
    */
  private def datasetArchive(ds: String): graft.lake.Archive = {
    Catalog.validateName(ds)
    if (!catalog.datasetExists(ds))
      throw new NoSuchElementException(s"no such dataset: $ds")
    val p = new org.apache.hadoop.fs.Path(catalog.datasetPath(ds), "archive")
    new graft.lake.Archive(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private val router = new HttpHandler {
    def handle(ex: HttpExchange): Unit =
      try route(ex)
      catch {
        case e: IllegalArgumentException => plain(ex, 400, s"bad request: ${e.getMessage}")
        case e: NoSuchElementException => plain(ex, 404, s"not found: ${e.getMessage}")
        case e: Throwable => plain(ex, 500, s"error: ${e.getMessage}")
      } finally ex.close()
  }

  private def route(ex: HttpExchange): Unit = {
    // optional shared-key auth (reference core/api.py:21-23 sends
    // X-Api-Key / X-Api-Secret on every request when configured): when
    // the server holds creds, every route requires the matching pair.
    // Comparison is constant-time — a timing probe must not leak prefix
    // length.
    apiCreds.foreach { case (k, s) =>
      def header(n: String): String =
        Option(ex.getRequestHeaders.getFirst(n)).getOrElse("")
      def eq(a: String, b: String): Boolean = java.security.MessageDigest
        .isEqual(a.getBytes(UTF_8), b.getBytes(UTF_8))
      if (!eq(header("X-Api-Key"), k) || !eq(header("X-Api-Secret"), s)) {
        plain(ex, 401, "missing or invalid api credentials")
        return
      }
    }
    val method = ex.getRequestMethod
    val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
    (method, parts) match {
      case ("GET", Nil) => json(ex, 200, catalogIndex())
      case (_, ds :: "_api" :: rest) => dataset(ex, method, ds, rest)
      case _ => plain(ex, 404, "not found: " + parts.mkString("/"))
    }
  }

  private def dataset(ex: HttpExchange, method: String, ds: String, rest: List[String]): Unit =
    (method, rest) match {
      case ("POST", List("entities", "flush")) =>
        // reference contract: return the COUNT of flushed statements
        // (entities.py:18-22), not the store version the drain yields.
        // The count comes from the drain itself — a pre-drain count()
        // would claim quarantined rows as flushed and miss rows staged
        // between the count and the drain
        val (_, n) = repo(ds).flushCounted()
        plain(ex, 200, n.toString)
      case ("POST", List("entities", "merge")) =>
        val grace = bodyJson(ex).flatMap(j => intField(j, "grace_period_days"))
        repo(ds).store.merge(grace.map(d =>
          current_timestamp() - expr(s"INTERVAL $d DAYS")))
        plain(ex, 200, "ok")
      case ("POST", List("entities", "query")) =>
        val (q, flushFirst) = queryBody(ex)
        val r = repo(ds)
        ndjson(ex, r.query(q, flushFirst).toLocalIterator.asScala.map(entityJson))
      case ("POST", List("entities", "statements", "query")) =>
        val (q, flushFirst) = queryBody(ex)
        val r = repo(ds)
        if (flushFirst) r.flush()
        ndjson(ex,
          r.statements(q).select(Statement.columns.map(col): _*)
            .toLocalIterator.asScala.map(statementJson))
      case ("GET", List("entities", "stats")) =>
        json(ex, 200, statsJson(repo(ds).statistics))
      case ("GET", List("entities", "statements", "version")) =>
        // reference returns `v or 0` — an uncommitted store reads as 0
        plain(ex, 200, math.max(0L, repo(ds).store.version).toString)
      case ("GET", List("config")) =>
        // the write-path contract a wire client must match: clients
        // explode entities locally, so they need the server's key mode
        // (graft.ftm-compat-keys) or their statement ids never collapse
        // with embedded imports
        val r = repo(ds)
        val o = mapper.createObjectNode()
        o.put("dataset", ds)
        o.put("shards", r.store.shards)
        o.put("ftm_compat", graft.functions.Hashing.ftmCompat(spark))
        json(ex, 200, o.toString)
      case ("DELETE", List("entities", id)) =>
        plain(ex, 200, repo(ds).deleteEntity(id).toString)
      case ("POST", List("journal", "bulk")) =>
        plain(ex, 200, journalBulk(ds, ex).toString)
      case ("GET", List("journal", "iterate")) =>
        ndjson(ex, stagedRows(ds))
      case ("POST", List("journal", "flush")) =>
        // reference journal/flush: stream every staged row, then delete
        // them WITHOUT writing to the store (the store-writing path is
        // entities/flush) — the caller owns what it drained. Rows stream
        // straight off the staged parquet (never buffered whole on the
        // driver). Delivery is at-least-once: the clear runs only after
        // the stream COMPLETES, so a mid-stream disconnect aborts before
        // the delete and the retry re-reads everything — rows can be
        // re-delivered but never lost (strictly safer than a
        // yield-as-you-delete loop, which loses undelivered rows). The
        // snapshot PINS the file set: the delete covers exactly the
        // files streamed, so rows staged concurrently (another handler
        // thread serving journal/bulk mid-stream) are never discarded
        // undelivered.
        val r = repo(ds)
        val (files, df) = r.journal.snapshot()
        ndjson(ex, rowsJson(df))
        r.journal.clearFiles(files)
      case ("GET", List("journal", "count")) =>
        plain(ex, 200, repo(ds).journal.count().toString)
      case ("DELETE", List("journal", "clear")) =>
        plain(ex, 200, repo(ds).journal.clear().toString)
      case ("POST", List("operations")) =>
        operations(ex, ds)
      // blob store over HTTP (the reference mounts its blob API on the
      // same app, main.py:66-76): PUT body → checksum; GET/HEAD by
      // checksum. Content-addressed, so PUT is idempotent.
      case ("PUT", List("archive")) =>
        // streamed to a spool file while hashing — a multi-GB blob (or 4
        // concurrent ones, one per handler thread) must not materialize
        // as byte[]s on the driver
        plain(ex, 200, datasetArchive(ds).putStream(ex.getRequestBody))
      case ("GET", List("archive", checksum)) =>
        datasetArchive(ds).get(checksum) match {
          case Some(bytes) => respond(ex, 200, "application/octet-stream", bytes)
          case None => plain(ex, 404, s"no blob for $checksum")
        }
      case ("HEAD", List("archive", checksum)) =>
        ex.sendResponseHeaders(
          if (datasetArchive(ds).exists(checksum)) 200 else 404, -1)
      case _ => plain(ex, 404, s"not found: $ds/_api/${rest.mkString("/")}")
    }

  // ---- entities ----

  /** QueryBody twin: RQL + sibling sort/slice + origin/flush_first;
    * unknown keys rejected (the reference's extra="forbid").
    */
  private def queryBody(ex: HttpExchange): (FtmQuery.Query, Boolean) = {
    val allowed = Set("query", "order_by", "limit", "offset", "origin", "flush_first")
    val j = bodyJson(ex)
    j.foreach { node =>
      val unknown = node.fieldNames.asScala.filterNot(allowed).toSeq
      require(unknown.isEmpty, s"unknown body fields: ${unknown.mkString(",")}")
    }
    val rql = j.flatMap(strField(_, "query"))
    val orderBy = j.flatMap(n => Option(n.get("order_by"))).filterNot(_.isNull)
      .map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Seq.empty)
    val limit = j.flatMap(intField(_, "limit"))
    val offset = j.flatMap(intField(_, "offset")).getOrElse(0)
    val origin = j.flatMap(strField(_, "origin"))
    val flushFirst = j.flatMap(n => Option(n.get("flush_first")))
      .filterNot(_.isNull).exists(_.asBoolean(false))
    val base = rql.map(Rql.parse(_, orderBy, limit, offset))
      .getOrElse(Rql.applySiblings(FtmQuery.Query(), orderBy, limit, offset))
    val q = origin.map(o => base.copy(origin = Some(o))).getOrElse(base)
    (q, flushFirst)
  }

  private def entityJson(e: graft.ops.EntityAssembly.EntityDoc): String = {
    val o = mapper.createObjectNode()
    o.put("id", e.id); o.put("caption", e.caption); o.put("schema", e.schema)
    val props = o.putObject("properties")
    e.properties.toSeq.sortBy(_._1).foreach { case (p, vs) =>
      val a = props.putArray(p); vs.foreach(a.add)
    }
    Seq("referents" -> e.referents, "datasets" -> e.datasets,
      "origins" -> e.origins).foreach { case (k, vs) =>
      val a = o.putArray(k); vs.foreach(a.add)
    }
    o.put("first_seen", iso(e.first_seen)); o.put("last_seen", iso(e.last_seen))
    o.put("last_change", iso(e.last_change))
    mapper.writeValueAsString(o)
  }

  /** Statement dict + `fragment`, like the reference's statements/query
    * (entities.py:73-93: the supersession key must survive the wire).
    */
  private def statementJson(r: Row): String = {
    val o = mapper.createObjectNode()
    Statement.columns.zipWithIndex.foreach { case (c, i) =>
      if (r.isNullAt(i)) o.putNull(c)
      else r.get(i) match {
        case t: Timestamp => o.put(c, iso(t))
        case b: Boolean => o.put(c, b)
        case v => o.put(c, v.toString)
      }
    }
    mapper.writeValueAsString(o)
  }

  private def statsJson(stats: DataFrame): String = {
    val o = mapper.createObjectNode()
    stats.orderBy(col("facet"), col("key")).collect().foreach { r =>
      val facet = r.getAs[String]("facet")
      val node =
        if (o.has(facet)) o.get(facet).asInstanceOf[ObjectNode]
        else o.putObject(facet)
      val e = node.putObject(r.getAs[String]("key"))
      e.put("entities", r.getAs[Long]("entities"))
      e.put("statements", r.getAs[Long]("statements"))
    }
    mapper.writeValueAsString(o)
  }

  // ---- journal ----

  /** Bulk JSONL import — wire semantics in [[JournalWire]] (shared with
    * the CLI's `statements import`).
    */
  private def journalBulk(ds: String, ex: HttpExchange): Long = {
    // stream the body line by line — an arbitrarily large bulk post is
    // parsed lazily and written in JournalWire.ChunkRows batches, never
    // materialized whole in driver memory
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(ex.getRequestBody, UTF_8))
    JournalWire.writeRows(spark, repo(ds), ds,
      Iterator.continually(reader.readLine()).takeWhile(_ != null))
  }

  private def stagedRows(ds: String): Iterator[String] =
    rowsJson(repo(ds).journal.staged())

  private def rowsJson(df: org.apache.spark.sql.DataFrame): Iterator[String] =
    df.select(Statement.columns.map(col): _*)
      .toLocalIterator.asScala.map(statementJson)

  // ---- operations ----

  /** Job registry: "OptimizeJob" → Make.optimize, "MakeJob" → Make.make
    * (reference operations.py routes any exported DatasetJobOperation; our
    * operation surface is exactly these two — crawl rides `make` through
    * the documents pipeline).
    */
  private def operations(ex: HttpExchange, ds: String): Unit = {
    val body = bodyJson(ex).getOrElse(
      throw new IllegalArgumentException("missing operation body"))
    val force = Option(ex.getRequestURI.getQuery).exists(_.contains("force=true"))
    val r = repo(ds)
    val o = mapper.createObjectNode()
    o.put("dataset", ds)
    strField(body, "name").getOrElse(
      throw new IllegalArgumentException("missing `name`")) match {
      case "OptimizeJob" =>
        val v = r.optimize()
        o.put("name", "OptimizeJob"); o.put("version", v)
      case "MakeJob" =>
        val outDir = strField(body, "out_dir").getOrElse(
          catalog.datasetPath(ds).toString + "/_exports")
        val built = r.make(outDir, force = force)
        o.put("name", "MakeJob"); o.put("version", r.store.version)
        val a = o.putArray("built"); built.foreach(a.add)
      case "ExportJob" =>
        // reference operation/export.py dispatches one artifact kind per
        // job: `kind` scopes make() to that single artifact (plus the
        // shared optimize pass), and the response reports what rebuilt
        val kind = strField(body, "kind").getOrElse(
          throw new IllegalArgumentException("ExportJob needs `kind`"))
        val outDir = strField(body, "out_dir").getOrElse(
          catalog.datasetPath(ds).toString + "/_exports")
        // short kinds name the reference's export operations; a full
        // artifact filename is accepted verbatim
        val artifact = kind match {
          case "statements" => "statements.csv"
          case "entities" => "entities.ftm.json"
          case "documents" => "documents.csv"
          case "statistics" => "statistics.json"
          case "index" => "index.json"
          case other => other
        }
        val built = r.make(outDir, force = force, only = Some(artifact))
        o.put("name", "ExportJob"); o.put("kind", kind)
        val a = o.putArray("built"); built.foreach(a.add)
      case "DiffJob" =>
        // reference operation/export.py:51-84: delta diffs ride export
        // operations (make_diff); exposed as its own job so the client
        // repository can drive the stateful diff pass remotely
        val outDir = strField(body, "out_dir").getOrElse(
          catalog.datasetPath(ds).toString + "/_exports")
        val label = r.exportDiff(outDir)
        o.put("name", "DiffJob")
        label match {
          case Some(l) => o.put("label", l)
          case None => o.putNull("label")
        }
      case "CrawlJob" =>
        // reference operation/crawl.py: archive every file under `uri`
        // into the dataset blob store, import file/folder entities
        val uri = strField(body, "uri").getOrElse(
          throw new IllegalArgumentException("CrawlJob needs `uri`"))
        val srcPath = new org.apache.hadoop.fs.Path(uri)
        val include = strField(body, "glob") match {
          case Some(glob) =>
            val m = java.nio.file.FileSystems.getDefault
              .getPathMatcher(s"glob:$glob")
            (rel: String) => m.matches(java.nio.file.Paths.get(rel))
          case None =>
            val prefix = strField(body, "prefix").getOrElse("")
            (rel: String) => rel.startsWith(prefix)
        }
        val crawled = graft.ops.Documents.crawlDistributed(
          spark, srcPath,
          new org.apache.hadoop.fs.Path(catalog.datasetPath(ds), "archive").toString,
          include)
        val session = spark
        import session.implicits._
        r.addEntities(graft.ops.Documents.crawlPayloads(crawled).toDS(),
          origin = strField(body, "origin").getOrElse("crawl"))
        r.flush()
        o.put("name", "CrawlJob"); o.put("done", crawled.size)
      case "DownloadArchiveJob" =>
        // reference operation/download.py: export archive blobs to their
        // nice paths; the documents table derives from the live view
        // (the same projection make() exports as documents.csv)
        val target = strField(body, "target").getOrElse(
          throw new IllegalArgumentException("DownloadArchiveJob needs `target`"))
        val docs = graft.ops.Documents.documentsTable(r.live)
        val archiveRoot =
          new org.apache.hadoop.fs.Path(catalog.datasetPath(ds), "archive")
        val (done, skipped) = graft.ops.Documents.downloadArchive(
          docs, archiveRoot.toString, target)
        o.put("name", "DownloadArchiveJob")
        o.put("done", done); o.put("skipped", skipped)
      case other =>
        throw new IllegalArgumentException(s"Unknown operation: `$other`")
    }
    json(ex, 200, mapper.writeValueAsString(o))
  }

  // ---- plumbing ----

  private def catalogIndex(): String = {
    val o = mapper.createObjectNode()
    val a = o.putArray("datasets")
    catalog.listDatasets().foreach { name =>
      val p = catalog.datasetPath(name)
      val cfg = DatasetConfig.load(
        p.getFileSystem(spark.sessionState.newHadoopConf()), p)
      val e = a.addObject()
      e.put("name", name)
      cfg.foreach { c => e.put("shards", c.shards); e.put("compression", c.compression) }
    }
    mapper.writeValueAsString(o)
  }

  private def bodyJson(ex: HttpExchange): Option[JsonNode] = {
    val bytes = ex.getRequestBody.readAllBytes()
    if (bytes.isEmpty) None
    else {
      val t = new String(bytes, UTF_8).trim
      if (t.isEmpty) None
      else Some(
        try mapper.readTree(t)
        catch { case e: Exception =>
          throw new IllegalArgumentException(s"invalid JSON body: ${e.getMessage}")
        })
    }
  }

  private def strField(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)
  private def intField(n: JsonNode, f: String): Option[Int] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asInt)

  private def iso(t: Timestamp): String = t.toInstant.toString
  private def plain(ex: HttpExchange, code: Int, body: String): Unit =
    respond(ex, code, "text/plain; charset=utf-8", body.getBytes(UTF_8))
  private def json(ex: HttpExchange, code: Int, body: String): Unit =
    respond(ex, code, "application/json", body.getBytes(UTF_8))

  private def respond(ex: HttpExchange, code: Int, ctype: String, body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) { val os = ex.getResponseBody; os.write(body); os.close() }
  }

  /** Chunked NDJSON: the iterator pulls one Spark partition at a time
    * (toLocalIterator upstream), so a million-entity stream never
    * materializes on the driver.
    */
  private def ndjson(ex: HttpExchange, lines: Iterator[String]): Unit = {
    ex.getResponseHeaders.set("Content-Type", "application/x-ndjson")
    ex.sendResponseHeaders(200, 0)
    val os: OutputStream = ex.getResponseBody
    try lines.foreach { l => os.write(l.getBytes(UTF_8)); os.write('\n') }
    finally os.close()
  }
}

object LakeHttpServer {
  /** Shared-key credentials from the environment (reference
    * core/settings.py api_key/api_secret): both set → auth enforced.
    */
  def envCreds: Option[(String, String)] =
    for (k <- sys.env.get("GRAFT_API_KEY"); s <- sys.env.get("GRAFT_API_SECRET"))
      yield (k, s)
}
