package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.api.{ApiLakeRepository, LakeHttpServer}
import graft.lake.{Catalog, LakeRepository}
import graft.ops.EntityAssembly.EntityDoc
import graft.ops.Explode.EntityPayload
import graft.query.{FtmQuery, Rql}

/** Transport-parametrized repository suite (reference
  * tests/conftest.py:33-102 runs its repository tests local/api/docker):
  * ONE set of lifecycle assertions executed against the embedded
  * [[LakeRepository]] and against [[ApiLakeRepository]] talking to a
  * live [[LakeHttpServer]] — the "point the library at a remote
  * lakehouse URL" workflow. A cross-transport case then asserts the two
  * paths produce content-identical statement ids (the client-side
  * explode parity claim).
  */
class TransportSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** The transport-agnostic slice both repositories implement. */
  trait Repo {
    def add(ps: Seq[EntityPayload], now: Timestamp): Unit
    def addOrigin(ps: Seq[EntityPayload], origin: String, now: Timestamp): Unit
    def journalCount: Long
    def flush(): Long
    def docs(rql: String, orderBy: Seq[String] = Seq.empty,
        limit: Option[Int] = None, offset: Int = 0): Seq[EntityDoc]
    def count(rql: String): Long
    def deleteEntity(id: String): Long
    def stats: Map[(String, String), Long]
    def version: Long
    def exportDiff(outDir: String): Option[String]
  }

  private class LocalRepo(r: LakeRepository) extends Repo {
    private def q(rql: String, orderBy: Seq[String], limit: Option[Int]) =
      if (rql.isEmpty) Rql.applySiblings(FtmQuery.Query(), orderBy, limit, 0)
      else Rql.parse(rql, orderBy, limit, 0)
    def add(ps: Seq[EntityPayload], now: Timestamp): Unit = {
      import r.spark.implicits._
      r.addEntities(ps.toDS(), now = now)
    }
    def addOrigin(ps: Seq[EntityPayload], origin: String, now: Timestamp): Unit = {
      import r.spark.implicits._
      r.addEntities(ps.toDS(), origin = origin, now = now)
    }
    def journalCount: Long = r.journal.count()
    def flush(): Long = r.flush()
    def docs(rql: String, orderBy: Seq[String], limit: Option[Int],
        offset: Int): Seq[EntityDoc] =
      r.query(q(rql, orderBy, limit).copy(offset = offset)).collect().toSeq
    def count(rql: String): Long = r.count(q(rql, Seq.empty, None))
    def deleteEntity(id: String): Long = r.deleteEntity(id)
    def stats: Map[(String, String), Long] =
      r.statistics.collect()
        .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    def version: Long = math.max(0L, r.store.version)
    def exportDiff(outDir: String): Option[String] = r.exportDiff(outDir)
  }

  private class HttpRepo(r: ApiLakeRepository) extends Repo {
    def add(ps: Seq[EntityPayload], now: Timestamp): Unit =
      r.addEntities(ps, now = now)
    def addOrigin(ps: Seq[EntityPayload], origin: String, now: Timestamp): Unit =
      r.addEntities(ps, origin = origin, now = now)
    def journalCount: Long = r.journalCount
    def flush(): Long = r.flush()
    def docs(rql: String, orderBy: Seq[String], limit: Option[Int],
        offset: Int): Seq[EntityDoc] =
      r.query(rql, orderBy, limit, offset).toSeq
    def count(rql: String): Long = r.count(rql)
    def deleteEntity(id: String): Long = r.deleteEntity(id)
    def stats: Map[(String, String), Long] =
      r.statistics.map { case (k, (entities, _)) => k -> entities }
    def version: Long = r.version
    def exportDiff(outDir: String): Option[String] = r.exportDiff(Some(outDir))
  }

  private val payloads = Seq(
    EntityPayload("jane", "Person",
      Map("name" -> Seq("Jane Doe"), "nationality" -> Seq("us"))),
    EntityPayload("john", "Person", Map("name" -> Seq("John Doe"))),
    EntityPayload("acme", "Company", Map("name" -> Seq("Acme Corp"))))

  /** The shared lifecycle — identical assertions per transport. */
  private def lifecycle(repo: Repo): Unit = {
    repo.add(payloads, ts("2024-01-01 00:00:00"))
    assert(repo.journalCount > 0)
    repo.flush()
    assert(repo.journalCount == 0)

    val jane = repo.docs("""eq(name, "Jane Doe")""")
    assert(jane.length == 1)
    assert(jane.head.id == "jane" && jane.head.caption == "Jane Doe")
    assert(jane.head.properties("nationality") == Seq("us"))

    // schema filter with descendant expansion
    assert(repo.count("""eq(schema, "LegalEntity")""") == 3)
    assert(repo.count("""eq(schema, "Company")""") == 1)

    // ordered page
    val page = repo.docs("""eq(schema, "LegalEntity")""",
      orderBy = Seq("name"), limit = Some(2)).map(_.id)
    assert(page == Seq("acme", "jane"), page)

    // stats facets
    assert(repo.stats(("schemata", "thing/Person")) == 2)
    assert(repo.stats(("countries", "us")) == 1)

    // delete: tombstone through the journal, canonical read hides jane
    assert(repo.deleteEntity("jane") > 0)
    repo.flush()
    assert(repo.count("""eq(name, "Jane Doe")""") == 0)
    assert(repo.count("") == 2)
    assert(repo.version >= 0)
  }

  /** The DEEP cases the reference parametrizes over transports
    * (tests/conftest.py:33-102, test_repository_entities.py:38-429):
    * multi-origin assembly, origin-scoped filters, ordered pagination
    * with offsets, and a stateful diff carrying DEL/MOD envelopes —
    * identical assertions per transport.
    */
  private def deepLifecycle(repo: Repo, diffDir: String): Unit = {
    val t1 = ts("2024-01-01 00:00:00")
    repo.addOrigin(Seq(
      EntityPayload("jane", "Person",
        Map("name" -> Seq("Jane Doe"), "nationality" -> Seq("us")))),
      "crawl-a", t1)
    repo.addOrigin(Seq(
      EntityPayload("jane", "Person", Map("name" -> Seq("Jane D."))),
      EntityPayload("john", "Person", Map("name" -> Seq("John Doe"))),
      EntityPayload("maria", "Person", Map("name" -> Seq("Maria Ost"))),
      EntityPayload("acme", "Company", Map("name" -> Seq("Acme Corp")))),
      "crawl-b", t1)
    repo.flush()

    // multi-origin assembly: ONE doc carrying the union of both origins'
    // statements and both origin labels
    val jane = repo.docs("""eq(entity_id, "jane")""")
    assert(jane.length == 1)
    assert(jane.head.properties("name").toSet == Set("Jane Doe", "Jane D."))
    assert(jane.head.properties("nationality") == Seq("us"))
    assert(jane.head.origins.toSet == Set("crawl-a", "crawl-b"))

    // origin-scoped counts (P6 over the wire)
    assert(repo.count("""eq(origin, "crawl-a")""") == 1)
    assert(repo.count("""eq(origin, "crawl-b")""") == 4)

    // ordering: direction from the first order_by entry
    val asc = repo.docs("", orderBy = Seq("name")).map(_.id)
    assert(asc == Seq("acme", "jane", "john", "maria"), asc)
    val desc = repo.docs("", orderBy = Seq("-name")).map(_.id)
    assert(desc == Seq("maria", "john", "jane", "acme"), desc)

    // pagination: offset pages tile the ordered set without overlap
    val p1 = repo.docs("", orderBy = Seq("name"), limit = Some(2), offset = 0).map(_.id)
    val p2 = repo.docs("", orderBy = Seq("name"), limit = Some(2), offset = 2).map(_.id)
    assert(p1 == asc.take(2) && p2 == asc.slice(2, 4), s"$p1 / $p2")

    // stateful diff: initial pass wraps everything in ADD envelopes …
    val label1 = repo.exportDiff(diffDir)
    assert(label1.isDefined)
    val initial = spark.read.json(s"$diffDir/diffs/entities.ftm.json/${label1.get}.delta.json")
    assert(initial.count() == 4)
    assert(initial.select("op").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("ADD"))

    // … then a delete + a re-import yield DEL and MOD envelopes
    repo.deleteEntity("john")
    repo.addOrigin(Seq(EntityPayload("maria", "Person",
      Map("nationality" -> Seq("de")))), "crawl-b",
      new Timestamp(System.currentTimeMillis() / 1000 * 1000))
    repo.flush()
    Thread.sleep(1100) // diff labels are second-grained
    val label2 = repo.exportDiff(diffDir)
    assert(label2.isDefined && label2 != label1)
    val delta = spark.read.json(s"$diffDir/diffs/entities.ftm.json/${label2.get}.delta.json")
    val ops = delta.select(org.apache.spark.sql.functions.col("entity.id"),
        org.apache.spark.sql.functions.col("op")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ops == Map("john" -> "DEL", "maria" -> "MOD"), ops)
  }

  test("deep repository cases over the LOCAL transport") {
    val dir = Files.createTempDirectory("graft-txp-deep-l").toString
    deepLifecycle(new LocalRepo(
      new LakeRepository(spark, dir, dataset = "txp", shards = 4)),
      Files.createTempDirectory("graft-txp-deep-l-out").toString)
  }

  test("deep repository cases over the HTTP transport") {
    val root = Files.createTempDirectory("graft-txp-deep-h").toString
    val server = new LakeHttpServer(spark, root)
    val port = server.start()
    try {
      new Catalog(spark, root).ensureDataset("txp", shards = 4)
      deepLifecycle(new HttpRepo(
        new ApiLakeRepository(s"http://127.0.0.1:$port", "txp")),
        Files.createTempDirectory("graft-txp-deep-h-out").toString)
    } finally server.stop()
  }

  test("repository lifecycle over the LOCAL transport") {
    val dir = Files.createTempDirectory("graft-txp-local").toString
    lifecycle(new LocalRepo(
      new LakeRepository(spark, dir, dataset = "txp", shards = 4)))
  }

  test("repository lifecycle over the HTTP transport") {
    val root = Files.createTempDirectory("graft-txp-http").toString
    val server = new LakeHttpServer(spark, root)
    val port = server.start()
    try {
      new Catalog(spark, root).ensureDataset("txp", shards = 4)
      val api = new ApiLakeRepository(s"http://127.0.0.1:$port", "txp")
      lifecycle(new HttpRepo(api))
      // client-only surface: single-entity lookup via the entity_id RQL
      // field, and the streamed statements parse back into Statement
      assert(api.getEntity("john").exists(_.caption == "John Doe"))
      assert(api.getEntity("nope-no-such").isEmpty)
      val sts = api.statements("""eq(entity_id, "john")""").toSeq
      assert(sts.nonEmpty && sts.forall(_.entity_id == "john"))
    } finally server.stop()
  }

  test("transports write content-identical statements") {
    val localDir = Files.createTempDirectory("graft-txp-par-l").toString
    val local = new LakeRepository(spark, localDir, dataset = "txp", shards = 4)
    val now = ts("2024-01-01 00:00:00")
    import spark.implicits._
    local.addEntities(payloads.toDS(), now = now)
    local.flush()

    val root = Files.createTempDirectory("graft-txp-par-h").toString
    val server = new LakeHttpServer(spark, root)
    val port = server.start()
    try {
      new Catalog(spark, root).ensureDataset("txp", shards = 4)
      val api = new ApiLakeRepository(s"http://127.0.0.1:$port", "txp")
      api.addEntities(payloads, now = now)
      api.flush()

      def idsOf(dir: String) = new LakeRepository(spark, dir, "txp", 4)
        .store.raw.select("id", "shard", "entity_id", "prop", "value")
        .collect().map(_.toSeq).toSet
      val localIds = idsOf(localDir)
      val httpIds = idsOf(new org.apache.hadoop.fs.Path(root, "txp").toString)
      assert(localIds == httpIds,
        s"transport divergence: ${localIds.diff(httpIds)} vs ${httpIds.diff(localIds)}")
    } finally server.stop()
  }

  test("fragmented-entity batches checksum per entity on both transports") {
    // two fragments of ONE entity in a single batch: the embedded path
    // checksums the union of their statement ids
    // (explode.py:120-148 fragment writing); explodeLocalBatch must match.
    val frags = Seq(
      EntityPayload("frag", "Person", Map("name" -> Seq("Frag One"))),
      EntityPayload("frag", "Person", Map("nationality" -> Seq("de"))),
      EntityPayload("solo", "Person", Map("name" -> Seq("Solo"))))
    val now = ts("2024-02-01 00:00:00")

    val localDir = Files.createTempDirectory("graft-txp-frag-l").toString
    val local = new LakeRepository(spark, localDir, dataset = "txp", shards = 4)
    import spark.implicits._
    local.addEntities(frags.toDS(), now = now)
    local.flush()

    val root = Files.createTempDirectory("graft-txp-frag-h").toString
    val server = new LakeHttpServer(spark, root)
    val port = server.start()
    try {
      new Catalog(spark, root).ensureDataset("txp", shards = 4)
      val api = new ApiLakeRepository(s"http://127.0.0.1:$port", "txp")
      api.addEntities(frags, now = now)
      api.flush()

      def rows(dir: String) = new LakeRepository(spark, dir, "txp", 4)
        .store.raw.select("id", "entity_id", "prop", "value")
        .collect().map(_.toSeq).toSet
      val localRows = rows(localDir)
      val httpRows = rows(new org.apache.hadoop.fs.Path(root, "txp").toString)
      assert(localRows == httpRows,
        s"fragment divergence: ${localRows.diff(httpRows)} vs ${httpRows.diff(localRows)}")
      // exactly one BASE_ID checksum row per entity, not per fragment
      val baseRows = httpRows.toSeq.filter(_(2) == graft.model.Statement.BaseId)
      assert(baseRows.map(_(1).toString).sorted == Seq("frag", "solo"), baseRows)
    } finally server.stop()
  }

  test("getEntity escapes RQL metacharacters in the id") {
    assert(ApiLakeRepository.rqlEscape("""a\b"c""") == """a\\b\"c""")
    val root = Files.createTempDirectory("graft-txp-esc").toString
    val server = new LakeHttpServer(spark, root)
    val port = server.start()
    try {
      new Catalog(spark, root).ensureDataset("txp", shards = 4)
      val api = new ApiLakeRepository(s"http://127.0.0.1:$port", "txp")
      val weird = """we"ird\id"""
      api.addEntities(Seq(EntityPayload(weird, "Person",
        Map("name" -> Seq("Weird")))), now = ts("2024-01-01 00:00:00"))
      api.flush()
      assert(api.getEntity(weird).exists(_.caption == "Weird"))
      assert(api.getEntity("""no"such""").isEmpty)
    } finally server.stop()
  }
}
