package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.functions.Hashing
import graft.model.{FtmModel, Statement}
import graft.ops.EntityAssembly.EntityDoc
import graft.ops.Explode
import graft.ops.Explode.EntityPayload

/** The reference's HTTP-delegated repository (the other half of S14):
  * where [[LakeHttpServer]] is `api/main.py`, this is the
  * `api_delegate` client side — `core/api.py:120-143`,
  * `repository/entities/api.py:17-99`, `storage/journal/api.py` — a
  * repository whose writes, reads, and operations all travel the wire,
  * so a library/CLI user can point at a remote lakehouse URL and run
  * the same lifecycle they run embedded.
  *
  * Pure JVM: no SparkSession on the client side (the Spark jobs run in
  * the SERVER's driver, which is the reference's deployment shape too).
  * Entity payloads are exploded client-side with the same content-key
  * recipes as the embedded path ([[Explode.explodeLocal]] /
  * [[Hashing.statementKeyLocal]]), so statements imported over HTTP
  * collapse with statements imported embedded — the reference gets the
  * same property from running followthemoney's explode in the client
  * process.
  *
  * Query results stream as NDJSON and are surfaced as iterators — one
  * line parsed at a time, the client never buffers a corpus.
  */
class ApiLakeRepository(baseUrl: String, val dataset: String,
    apiCreds: Option[(String, String)] = LakeHttpServer.envCreds) {

  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()
  private val base = baseUrl.stripSuffix("/")

  private def url(endpoint: String): URI =
    URI.create(s"$base/$dataset/_api/$endpoint")

  // every request carries the shared-key headers when configured
  // (reference core/api.py:21-23 default headers)
  private def rb(uri: URI): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(uri)
    apiCreds.foreach { case (k, s) =>
      b.header("X-Api-Key", k).header("X-Api-Secret", s)
    }
    b
  }

  private def send(req: HttpRequest): String = {
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    require(res.statusCode / 100 == 2,
      s"api error ${res.statusCode} on ${req.uri}: ${res.body.take(500)}")
    res.body
  }

  private def get(endpoint: String): String =
    send(rb(url(endpoint)).GET().build())

  private def post(endpoint: String, body: String): String =
    send(rb(url(endpoint))
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build())

  /** Streamed POST: the response body is consumed line by line. */
  private def postLines(endpoint: String, body: String): Iterator[String] = {
    val res = client.send(
      rb(url(endpoint))
        .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
      HttpResponse.BodyHandlers.ofLines())
    require(res.statusCode / 100 == 2, s"api error ${res.statusCode} on $endpoint")
    res.body.iterator.asScala.filter(_.nonEmpty)
  }

  // ---- writes (journal wire, storage/journal/api.py) ----

  /** Client-side explode → JSONL → `journal/bulk`. Same statement ids
    * and BASE_ID checksum rows as the embedded [[Explode.explode]] —
    * including batches carrying several fragments of one entity, which
    * checksum once per (entity, schema) over the union of their
    * statement ids ([[Explode.explodeLocalBatch]]). Posted in
    * [[JournalWire.ChunkRows]]-sized bodies so a large import never
    * materializes as one client-side string.
    */
  /** The server's key mode, fetched once from `GET config`: the client
    * explodes entities locally, so it must use the SAME id recipe as the
    * server's embedded writes (md5 native vs sha1 ftm-compat) — a
    * mismatched recipe ships ids the server stores verbatim, and wire
    * imports then never collapse with embedded imports of the same
    * entity. Older servers without the route fall back to the native
    * recipe (their own default).
    */
  private lazy val serverFtmCompat: Boolean = {
    // only an identifiable missing route (404 — an old server without
    // `GET config`) selects the native-recipe fallback; transport/auth
    // failures RETHROW instead of being cached as false, or a transient
    // connection blip on first use would permanently pick the wrong key
    // recipe against an ftm-compat server (a lazy val that throws is
    // re-attempted on next access, so nothing is cached from a failed
    // probe)
    val res = client.send(rb(url("config")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (res.statusCode == 404) false
    else {
      require(res.statusCode / 100 == 2,
        s"api error ${res.statusCode} probing config: ${res.body.take(500)}")
      mapper.readTree(res.body).path("ftm_compat").asBoolean(false)
    }
  }

  def addEntities(entities: Seq[EntityPayload], origin: String = "default",
      now: Timestamp = new Timestamp(System.currentTimeMillis() / 1000 * 1000)): Long = {
    postChunked(Explode.explodeLocalBatch(entities, dataset, origin, now,
      ftmCompat = serverFtmCompat).iterator.map(statementLine))
    entities.size.toLong
  }

  /** Raw statement rows (the CLI `statements import` wire) →
    * `journal/bulk`, chunk-bounded; returns the server-acknowledged
    * row count summed over chunks.
    */
  def addStatements(jsonlLines: IterableOnce[String]): Long =
    postChunked(jsonlLines.iterator)

  /** Bounded-memory bulk write: the line iterator is drained in
    * [[JournalWire.ChunkRows]]-sized POST bodies (the same bound the
    * server applies when spooling to the journal), so client memory is
    * O(chunk) regardless of import size.
    */
  private def postChunked(lines: Iterator[String]): Long =
    lines.grouped(JournalWire.ChunkRows).map { chunk =>
      post("journal/bulk", chunk.mkString("\n")).trim.toLong
    }.sum

  private def statementLine(s: Statement): String = {
    val o = mapper.createObjectNode()
    o.put("id", s.id); o.put("entity_id", s.entity_id)
    o.put("schema", s.schema); o.put("bucket", s.bucket)
    o.put("origin", s.origin); o.put("prop", s.prop)
    o.put("prop_type", s.prop_type); o.put("value", s.value)
    s.lang.foreach(o.put("lang", _))
    o.put("first_seen", s.first_seen.toInstant.toString)
    o.put("last_seen", s.last_seen.toInstant.toString)
    o.put("fragment", s.fragment)
    s.deleted_at.foreach(t => o.put("deleted_at", t.toInstant.toString))
    mapper.writeValueAsString(o)
  }

  // ---- repository surface (repository/entities/api.py) ----

  /** `entities/flush`: journal → store; returns the flushed count. */
  def flush(): Long = post("entities/flush", "").trim.toLong

  def merge(gracePeriodDays: Option[Int] = None): Unit =
    post("entities/merge",
      gracePeriodDays.map(d => s"""{"grace_period_days":$d}""").getOrElse("{}"))

  def deleteEntity(entityId: String): Long =
    send(rb(url(s"entities/$entityId")).DELETE().build())
      .trim.toLong

  private def queryBody(rql: String, orderBy: Seq[String], limit: Option[Int],
      offset: Int, flushFirst: Boolean): String = {
    val o = mapper.createObjectNode()
    if (rql.nonEmpty) o.put("query", rql)
    if (orderBy.nonEmpty) { val a = o.putArray("order_by"); orderBy.foreach(a.add) }
    limit.foreach(o.put("limit", _))
    if (offset > 0) o.put("offset", offset)
    if (flushFirst) o.put("flush_first", true)
    mapper.writeValueAsString(o)
  }

  /** `entities/query` as raw NDJSON lines (CLI passthrough). */
  def queryRaw(rql: String = "", orderBy: Seq[String] = Seq.empty,
      limit: Option[Int] = None, offset: Int = 0,
      flushFirst: Boolean = false): Iterator[String] =
    postLines("entities/query",
      queryBody(rql, orderBy, limit, offset, flushFirst))

  /** `entities/query`: assembled entity documents for an RQL query,
    * streamed (reference `_api_query`).
    */
  def query(rql: String = "", orderBy: Seq[String] = Seq.empty,
      limit: Option[Int] = None, offset: Int = 0,
      flushFirst: Boolean = false): Iterator[EntityDoc] =
    queryRaw(rql, orderBy, limit, offset, flushFirst).map(parseEntity)

  /** `entities/statements/query` as raw NDJSON lines (CLI passthrough). */
  def statementsRaw(rql: String = "", orderBy: Seq[String] = Seq.empty,
      limit: Option[Int] = None, offset: Int = 0): Iterator[String] =
    postLines("entities/statements/query",
      queryBody(rql, orderBy, limit, offset, flushFirst = false))

  /** `entities/statements/query`: raw statements for an RQL query. */
  def statements(rql: String = "", orderBy: Seq[String] = Seq.empty,
      limit: Option[Int] = None, offset: Int = 0): Iterator[Statement] =
    statementsRaw(rql, orderBy, limit, offset)
      .map(l => JournalWire.parseRow(l, dataset))

  /** Entity count for a query — the client-side fold over the streamed
    * ids (the reference's api repository counts the same way; there is
    * no dedicated count route).
    */
  def count(rql: String = ""): Long = query(rql).size.toLong

  def getEntity(entityId: String): Option[EntityDoc] =
    query(s"""eq(entity_id, "${ApiLakeRepository.rqlEscape(entityId)}")""")
      .nextOption()

  /** `entities/stats` → (facet, key) → (entities, statements). */
  def statistics: Map[(String, String), (Long, Long)] = {
    val root = mapper.readTree(get("entities/stats"))
    root.properties.asScala.flatMap { fe =>
      fe.getValue.properties.asScala.map { ke =>
        (fe.getKey, ke.getKey) ->
          (ke.getValue.get("entities").asLong, ke.getValue.get("statements").asLong)
      }
    }.toMap
  }

  def version: Long = get("entities/statements/version").trim.toLong

  // ---- journal surface ----

  def journalCount: Long = get("journal/count").trim.toLong

  def journalIterate(): Iterator[Statement] = {
    val res = client.send(rb(url("journal/iterate")).GET().build(),
      HttpResponse.BodyHandlers.ofLines())
    require(res.statusCode / 100 == 2, s"api error ${res.statusCode} on journal/iterate")
    res.body.iterator.asScala.filter(_.nonEmpty).map(l => JournalWire.parseRow(l, dataset))
  }

  def journalClear(): Long =
    send(rb(url("journal/clear")).DELETE().build()).trim.toLong

  // ---- operations ----

  def optimize(): Long = {
    val res = mapper.readTree(post("operations", """{"name":"OptimizeJob"}"""))
    res.get("version").asLong
  }

  def make(outDir: Option[String] = None, force: Boolean = false): Seq[String] = {
    val o = mapper.createObjectNode()
    o.put("name", "MakeJob"); outDir.foreach(o.put("out_dir", _))
    val q = if (force) "?force=true" else ""
    val res = mapper.readTree(send(rb(
        URI.create(s"$base/$dataset/_api/operations$q"))
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(o), UTF_8))
      .build()))
    Option(res.get("built")).map(_.elements.asScala.map(_.asText).toSeq)
      .getOrElse(Seq.empty)
  }

  /** Run one stateful diff export server-side (`DiffJob`); returns the
    * delta label, or None when the store is already current.
    */
  def exportDiff(outDir: Option[String] = None): Option[String] = {
    val b = mapper.createObjectNode()
    b.put("name", "DiffJob"); outDir.foreach(b.put("out_dir", _))
    val res = mapper.readTree(post("operations", mapper.writeValueAsString(b)))
    Option(res.get("label")).filterNot(_.isNull).map(_.asText)
  }

  // ---- archive (content-addressed blob wire) ----

  def archivePut(bytes: Array[Byte]): String =
    send(rb(url("archive"))
      .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes)).build()).trim

  def archiveGet(checksum: String): Option[Array[Byte]] = {
    val res = client.send(
      rb(url(s"archive/$checksum")).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    if (res.statusCode == 200) Some(res.body) else None
  }

  def archiveExists(checksum: String): Boolean =
    client.send(rb(url(s"archive/$checksum"))
        .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.discarding()).statusCode == 200

  // ---- entity doc wire parse (inverse of LakeHttpServer.entityJson) ----


  private def parseEntity(line: String): EntityDoc = {
    val n = mapper.readTree(line)
    def strs(f: String): Seq[String] =
      Option(n.get(f)).filterNot(_.isNull)
        .map(_.elements.asScala.map(_.asText).toSeq).getOrElse(Seq.empty)
    def ts(f: String): Timestamp =
      JournalWire.parseTs(n.get(f).asText)
    val props = Option(n.get("properties")).filterNot(_.isNull).map { p =>
      p.properties.asScala.map(e =>
        e.getKey -> e.getValue.elements.asScala.map(_.asText).toSeq).toMap
    }.getOrElse(Map.empty[String, Seq[String]])
    EntityDoc(
      id = n.get("id").asText, caption = n.get("caption").asText,
      schema = n.get("schema").asText, properties = props,
      referents = strs("referents"), datasets = strs("datasets"),
      origins = strs("origins"),
      first_seen = ts("first_seen"), last_seen = ts("last_seen"),
      last_change = ts("last_change"))
  }
}

object ApiLakeRepository {

  /** Escape a value for interpolation into an RQL quoted string:
    * `\x` yields literal `x` in [[graft.query.Rql]]'s lexer, so doubling
    * backslashes and escaping the delimiter is total — no id can break
    * out of the literal or alter the query.
    */
  def rqlEscape(value: String): String =
    value.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Root dataset listing (`GET /`), authenticated with the same
    * shared-key headers as every repository route — the server gates the
    * listing too when GRAFT_API_KEY/SECRET are set.
    */
  def datasets(baseUrl: String,
      apiCreds: Option[(String, String)] = LakeHttpServer.envCreds): Seq[String] = {
    val b = HttpRequest.newBuilder(URI.create(baseUrl.stripSuffix("/") + "/")).GET()
    apiCreds.foreach { case (k, s) =>
      b.header("X-Api-Key", k).header("X-Api-Secret", s)
    }
    val res = HttpClient.newHttpClient()
      .send(b.build(), HttpResponse.BodyHandlers.ofString())
    require(res.statusCode / 100 == 2,
      s"api error ${res.statusCode} on $baseUrl/: ${res.body.take(500)}")
    val mapper = new ObjectMapper()
    mapper.readTree(res.body).get("datasets").elements.asScala
      .map(_.get("name").asText).toSeq
  }
}
