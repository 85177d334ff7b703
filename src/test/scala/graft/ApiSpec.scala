package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.api.LakeHttpServer
import graft.lake.Catalog

/** S14: the HTTP surface end to end over a real lake — bulk-import
  * through the journal route, flush, RQL query with paging, statement
  * streaming, stats, delete, operations — mirroring the reference's API
  * contract (api/routes/entities.py, journal.py, operations.py).
  */
class ApiSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft-api").toString
  private lazy val server = new LakeHttpServer(spark, root)
  private lazy val port = server.start()
  private lazy val client = HttpClient.newHttpClient()

  private def url(path: String) = URI.create(s"http://127.0.0.1:$port$path")
  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(url(path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(url(path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  private def delete(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(url(path)).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())

  test("api lifecycle: bulk import, flush, query, stats, delete, operations") {
    val cat = new Catalog(spark, root)
    cat.ensureDataset("apitest", shards = 4)

    // bulk JSONL into the journal; shard/id/bucket derived server-side
    val rows = Seq(
      """{"entity_id":"jane","schema":"Person","prop":"name","value":"Jane Doe","prop_type":"name","first_seen":"2024-01-01T00:00:00Z","last_seen":"2024-01-01T00:00:00Z"}""",
      """{"entity_id":"jane","schema":"Person","prop":"nationality","value":"us","prop_type":"country","first_seen":"2024-01-01T00:00:00Z","last_seen":"2024-01-01T00:00:00Z"}""",
      """{"entity_id":"john","schema":"Person","prop":"name","value":"John Doe","prop_type":"name","first_seen":"2024-01-01T00:00:00Z","last_seen":"2024-01-01T00:00:00Z"}""",
      """{"entity_id":"acme","schema":"Company","prop":"name","value":"Acme Corp","prop_type":"name","first_seen":"2024-01-01T00:00:00Z","last_seen":"2024-01-01T00:00:00Z"}""")
    val bulk = post("/apitest/_api/journal/bulk", rows.mkString("\n"))
    assert(bulk.statusCode == 200 && bulk.body == "4", bulk.body)
    assert(get("/apitest/_api/journal/count").body == "4")

    // journal iterate streams the staged rows with recomputed shards
    val staged = get("/apitest/_api/journal/iterate").body.trim.split("\n")
    assert(staged.length == 4 && staged.forall(_.contains("\"shard\"")))

    // entities flush drains journal → store; version advances
    assert(post("/apitest/_api/entities/flush", "").body == "4")
    assert(get("/apitest/_api/journal/count").body == "0")
    // first commit is version 0 (clamped `v or 0` like the reference)
    assert(get("/apitest/_api/entities/statements/version").body.toLong >= 0)

    // RQL query: entity-grain prop filter returns assembled docs
    val q = post("/apitest/_api/entities/query",
      """{"query":"eq(name, \"Jane Doe\")"}""")
    assert(q.statusCode == 200, q.body)
    val lines = q.body.trim.split("\n")
    assert(lines.length == 1 && lines(0).contains("\"id\":\"jane\"")
      && lines(0).contains("\"nationality\":[\"us\"]"), q.body)

    // ordered page: schema filter + order_by/limit sibling fields
    val page = post("/apitest/_api/entities/query",
      """{"query":"eq(schema, \"LegalEntity\")","order_by":["name"],"limit":2}""")
    val ids = page.body.trim.split("\n").map(l =>
      l.split("\"id\":\"")(1).takeWhile(_ != '"')).toSeq
    assert(ids == Seq("acme", "jane"), ids)

    // statements query carries fragment on the wire
    val st = post("/apitest/_api/entities/statements/query",
      """{"query":"eq(entity_id, \"jane\")"}""")
    val stLines = st.body.trim.split("\n")
    assert(stLines.length == 2 && stLines.forall(_.contains("\"fragment\"")), st.body)

    // stats facets as JSON
    val stats = get("/apitest/_api/entities/stats").body
    assert(stats.contains("\"thing/Person\"") && stats.contains("\"countries\""), stats)

    // unknown body keys 400 (extra=forbid twin); bad RQL 400; DoS cap 400
    assert(post("/apitest/_api/entities/query", """{"nope":1}""").statusCode == 400)
    assert(post("/apitest/_api/entities/query", """{"query":"eq(name"}""").statusCode == 400)
    val hostile = "and(" + (1 to 50).map(i => s"eq(p$i, \"v\")").mkString(",") + ")"
    assert(post("/apitest/_api/entities/query",
      s"""{"query":"${hostile.replace("\"", "\\\"")}"}""").statusCode == 400)

    // unknown dataset 404; invalid dataset name 400
    assert(get("/nope/_api/journal/count").statusCode == 404)
    assert(get("/NOPE!/_api/journal/count").statusCode == 400)

    // delete tombstones every statement of the entity (through journal)
    assert(delete("/apitest/_api/entities/jane").body == "2")
    assert(post("/apitest/_api/entities/flush", "").body.toLong >= 2)
    val after = post("/apitest/_api/entities/query", "{}").body
    assert(!after.contains("\"id\":\"jane\""), after)

    // operations: optimize then make build artifacts; unknown op 400
    val opt = post("/apitest/_api/operations", """{"name":"OptimizeJob"}""")
    assert(opt.statusCode == 200 && opt.body.contains("\"version\""), opt.body)
    val mk = post("/apitest/_api/operations", """{"name":"MakeJob"}""")
    assert(mk.statusCode == 200 && mk.body.contains("statements.csv"), mk.body)
    assert(post("/apitest/_api/operations", """{"name":"NopeJob"}""").statusCode == 400)

    // catalog index at the root lists the dataset
    assert(get("/").body.contains("\"apitest\""))

    // archive blob routes: PUT is idempotent content-addressing; GET
    // round-trips bytes; HEAD answers existence
    val putReq = HttpRequest.newBuilder(url("/apitest/_api/archive"))
      .PUT(HttpRequest.BodyPublishers.ofString("blob bytes here")).build()
    val sum = client.send(putReq, HttpResponse.BodyHandlers.ofString()).body
    assert(sum.matches("[0-9a-f]{64}"), sum)
    assert(client.send(putReq, HttpResponse.BodyHandlers.ofString()).body == sum)
    assert(get(s"/apitest/_api/archive/$sum").body == "blob bytes here")
    assert(get("/apitest/_api/archive/" + "0" * 64).statusCode == 404)
    val headReq = HttpRequest.newBuilder(url(s"/apitest/_api/archive/$sum"))
      .method("HEAD", HttpRequest.BodyPublishers.noBody()).build()
    assert(client.send(headReq, HttpResponse.BodyHandlers.ofString()).statusCode == 200)

    // journal flush route: stage a row, stream it back, storage cleared
    post("/apitest/_api/journal/bulk",
      """{"entity_id":"tmp","schema":"Person","prop":"name","value":"Tmp"}""")
    val jf = post("/apitest/_api/journal/flush", "")
    assert(jf.body.trim.split("\n").length == 1 && jf.body.contains("\"tmp\""))
    // under full-suite CPU load the cleared count can lag the flush
    // response by a beat — poll with a deadline instead of flaking
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var jcount = get("/apitest/_api/journal/count").body
    while (jcount != "0" && System.nanoTime() < deadline) {
      Thread.sleep(200)
      jcount = get("/apitest/_api/journal/count").body
    }
    assert(jcount == "0", s"journal count never drained to 0: $jcount")

    // CrawlJob: archive a source tree, import file entities via journal
    val crawlSrc = Files.createTempDirectory("graft-api-crawl")
    Files.writeString(crawlSrc.resolve("note.txt"), "crawled body")
    Files.createDirectories(crawlSrc.resolve("sub"))
    Files.writeString(crawlSrc.resolve("sub/page.pdf"), "pdf bytes")
    val cr = post("/apitest/_api/operations",
      s"""{"name":"CrawlJob","uri":"${crawlSrc.toString}"}""")
    assert(cr.statusCode == 200 && cr.body.contains("\"done\":2"), cr.body)
    val crawledQ = post("/apitest/_api/entities/query",
      """{"query":"eq(schema, \"PlainText\")"}""")
    assert(crawledQ.body.contains("note.txt"), crawledQ.body)

    // ExportJob: kind-scoped export runs the make funnel
    val exp = post("/apitest/_api/operations",
      """{"name":"ExportJob","kind":"documents","force":true}""")
    assert(exp.statusCode == 200 && exp.body.contains("\"kind\":\"documents\""), exp.body)

    // DownloadArchiveJob: blobs land at their document paths
    val dlTarget = Files.createTempDirectory("graft-api-dl")
    val dl = post("/apitest/_api/operations",
      s"""{"name":"DownloadArchiveJob","target":"${dlTarget.toString}"}""")
    assert(dl.statusCode == 200 && dl.body.contains("\"done\":"), dl.body)
    assert(Files.readString(dlTarget.resolve("note.txt")) == "crawled body", dl.body)

    server.stop()
  }

  test("shared-key auth: configured creds gate every route; client sends them") {
    val root = Files.createTempDirectory("graft-api-auth").toString
    new Catalog(spark, root).ensureDataset("authds", shards = 2)
    val server = new LakeHttpServer(spark, root,
      apiCreds = Some(("k-123", "s-456")))
    val port = server.start()
    try {
      def req(k: Option[(String, String)]) = {
        val b = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/authds/_api/journal/count")).GET()
        k.foreach { case (key, sec) =>
          b.header("X-Api-Key", key).header("X-Api-Secret", sec)
        }
        client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      }
      assert(req(None).statusCode == 401)
      assert(req(Some(("k-123", "wrong"))).statusCode == 401)
      assert(req(Some(("k-123", "s-456"))).statusCode == 200)
      // the client repository attaches the headers to every call
      val api = new graft.api.ApiLakeRepository(
        s"http://127.0.0.1:$port", "authds", Some(("k-123", "s-456")))
      assert(api.journalCount == 0L)
      val noCreds = new graft.api.ApiLakeRepository(
        s"http://127.0.0.1:$port", "authds", None)
      val denied = intercept[IllegalArgumentException](noCreds.journalCount)
      assert(denied.getMessage.contains("401"), denied.getMessage)
      // the root dataset listing (CLI `ls`) is gated too — and the
      // authenticated helper the CLI routes through gets in
      val lsDenied = intercept[IllegalArgumentException](
        graft.api.ApiLakeRepository.datasets(s"http://127.0.0.1:$port", None))
      assert(lsDenied.getMessage.contains("401"), lsDenied.getMessage)
      assert(graft.api.ApiLakeRepository.datasets(
        s"http://127.0.0.1:$port", Some(("k-123", "s-456"))).contains("authds"))
    } finally server.stop()
  }

  test("wire clients adopt the server's key mode via GET config") {
    val root2 = Files.createTempDirectory("graft-api-compat").toString
    val cat = new Catalog(spark, root2)
    cat.ensureDataset("compatds", shards = 4)
    val srv = new LakeHttpServer(spark, root2, apiCreds = None)
    val p = srv.start()
    def cfgBody(): String = client.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:$p/compatds/_api/config")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body
    try {
      // native mode: config reports it
      assert(cfgBody().contains("\"ftm_compat\":false"), cfgBody())
      spark.conf.set("graft.ftm-compat-keys", "true")
      try {
        assert(cfgBody().contains("\"ftm_compat\":true"))
        // a compat-mode server must receive compat ids from the client
        // explode, or wire imports never collapse with embedded imports
        val api = new graft.api.ApiLakeRepository(s"http://127.0.0.1:$p", "compatds")
        api.addEntities(Seq(graft.ops.Explode.EntityPayload(
          "e-compat", "Person", Map("name" -> Seq("Jane")))))
        val staged = new graft.lake.Journal(spark,
          cat.datasetPath("compatds").toString).staged()
        val ids = staged.filter(org.apache.spark.sql.functions.col("prop") === "name")
          .select("id").collect().map(_.getString(0)).toSet
        val want = graft.functions.Hashing.ftmStatementKeyLocal(
          "compatds", "e-compat", "name", "Jane")
        assert(ids == Set(want), s"wire id $ids != embedded compat id $want")
      } finally spark.conf.unset("graft.ftm-compat-keys")
    } finally srv.stop()
  }
}
