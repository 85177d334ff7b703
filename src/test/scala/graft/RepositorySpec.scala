package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.lake.LakeRepository
import graft.ops.Explode.EntityPayload
import graft.query.FtmQuery._

/** End-to-end repository lifecycle mirroring the reference's
  * test_repository_entities scenarios: import → flush → filtered/sorted
  * query → delete → canonical read shows the tombstone.
  */
class RepositorySpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("repository lifecycle: add, flush, query, page, delete") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-repo").toString
    val repo = new LakeRepository(spark, dir, dataset = "test", shards = 4)

    val payloads = Seq(
      EntityPayload("jane", "Person", Map("name" -> Seq("Jane Doe"), "nationality" -> Seq("us"))),
      EntityPayload("john", "Person", Map("name" -> Seq("John Doe"))),
      EntityPayload("acme", "Company", Map("name" -> Seq("Acme Corp"))))
    repo.addEntities(payloads.toDS(), now = ts("2024-01-01 00:00:00"))

    // unflushed: the store is empty, the journal holds the batch
    assert(repo.store.raw.count() == 0 && repo.journal.count() > 0)
    repo.flush()
    assert(repo.journal.count() == 0)

    // entity-grain property filter returns the whole entity
    val jane = repo.query(Query(propFilters = Seq(P("name", EqOp, Seq("Jane Doe")))))
      .collect()
    assert(jane.length == 1)
    assert(jane(0).id == "jane" && jane(0).caption == "Jane Doe")
    assert(jane(0).properties("nationality") == Seq("us"))
    // BASE_ID rows drive last_change, not properties
    assert(!jane(0).properties.contains(graft.model.Statement.BaseId))

    // schema filter with descendant expansion
    assert(repo.count(Query(schemata = Some("LegalEntity"))) == 3)
    assert(repo.count(Query(schemata = Some("Company"))) == 1)

    // ordered page: by name descending, first page of 2
    val page = repo.query(Query(
      schemata = Some("LegalEntity"),
      orderByProps = Seq(("name", false)), limit = Some(2)))
      .collect().map(_.id).toSet
    assert(page == Set("acme", "jane")) // Acme Corp < Jane Doe < John Doe

    // statistics facets incl. country values
    val stats = repo.statistics.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(stats(("schemata", "thing/Person")) == 2)
    assert(stats(("countries", "us")) == 1)

    // delete: tombstones flow through the journal; canonical read hides
    // jane even before any merge
    repo.deleteEntity("jane", ts("2024-02-01 00:00:00"))
    repo.flush()
    assert(repo.count(Query(propFilters = Seq(P("name", EqOp, Seq("Jane Doe"))))) == 0)
    assert(repo.count(Query()) == 2)
    // the tombstones exist physically until merge reaps them
    assert(repo.store.raw.filter("deleted_at IS NOT NULL").count() > 0)
  }

  test("getEntity: unflushed journal rows override parquet (J3)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-getent").toString
    val repo = new LakeRepository(spark, dir, dataset = "test", shards = 4)
    repo.addEntities(Seq(
      EntityPayload("jane", "Person", Map("name" -> Seq("Jane Doe")))).toDS(),
      now = ts("2024-01-01 00:00:00"))
    repo.flush()
    assert(repo.getEntity("jane").exists(_.caption == "Jane Doe"))

    // re-import with a changed name, NOT flushed: the journal overrides
    // (same content-hashed prop row id only if value equal — here the new
    // value adds a statement; the newer last_seen wins assembly's caption
    // pick via sorted-min, so assert on the property set)
    repo.addEntities(Seq(
      EntityPayload("jane", "Person", Map("name" -> Seq("Jane A. Doe")))).toDS(),
      now = ts("2024-02-01 00:00:00"))
    assert(repo.journal.count() > 0)
    val merged = repo.getEntity("jane").get
    assert(merged.properties("name").contains("Jane A. Doe"))

    // unflushed delete hides the entity from the lookup
    repo.deleteEntity("jane", ts("2024-03-01 00:00:00"))
    assert(repo.journal.count() > 0)
    assert(repo.getEntity("jane").isEmpty)
    // but the store itself still has the live rows until flush
    assert(repo.count(graft.query.FtmQuery.Query()) == 1)
  }

  test("e2e: crawl -> archive -> import file entities -> make artifacts") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    import graft.lake.Archive
    import graft.ops.Documents

    // a small source tree with a nested folder
    val src = Files.createTempDirectory("graft-e2e-src")
    Files.createDirectories(src.resolve("reports"))
    Files.write(src.resolve("readme.txt"), "hello plain text".getBytes)
    Files.write(src.resolve("reports/q1.pdf"), "%PDF-1.4 q1".getBytes)
    Files.write(src.resolve("reports/q2.csv"), "a,b\n1,2\n".getBytes)

    val arDir = Files.createTempDirectory("graft-e2e-ar").toString
    val fs = new Path(arDir).getFileSystem(spark.sessionState.newHadoopConf())
    val archive = new Archive(fs, new Path(arDir))

    // S16 crawl: archive every file, route mime -> schema
    val crawled = Documents.crawl(fs, new Path(src.toString), archive)
    assert(crawled.map(_.schema).toSet == Set("PlainText", "Pages", "Table"))

    // crawled files -> File entity payloads (+ folder entities), imported
    // through the normal explode path
    val folderIds = crawled.map(_.parentId).filter(_.nonEmpty).distinct
    val folders = folderIds.map(fid => graft.ops.Explode.EntityPayload(
      fid, "Folder", Map("fileName" -> Seq("reports"))))
    val files = crawled.map(f => graft.ops.Explode.EntityPayload(
      f.id, f.schema, Map(
        "fileName" -> Seq(f.fileName),
        "mimeType" -> Seq(f.mimeType),
        "fileSize" -> Seq(f.size.toString),
        "contentHash" -> Seq(f.checksum)) ++
        (if (f.parentId.nonEmpty) Map("parent" -> Seq(f.parentId)) else Map.empty)))

    val dir = Files.createTempDirectory("graft-e2e-repo").toString
    val repo = new LakeRepository(spark, dir, dataset = "docs", shards = 4)
    repo.addEntities((files ++ folders).toDS(), now = ts("2024-01-01 00:00:00"))
    repo.flush()

    // document queries work through the descendant filter
    assert(repo.count(Query(schemata = Some("Document"))) == 4) // 3 files + folder
    assert(repo.count(Query(propFilters = Seq(P("contentHash", NotNullOp)))) == 3)

    // make emits the full artifact set with resolved paths + public urls
    val out = Files.createTempDirectory("graft-e2e-out").toString
    val made = repo.make(out)
    assert(made.toSet == Set("statements.csv", "entities.ftm.json",
      "documents.csv", "statistics.json", "index.json"))
    val docs = spark.read.option("header", "true").csv(s"$out/documents.csv")
      .collect().map(r => r.getAs[String]("file_name") -> r).toMap
    assert(docs.keySet == Set("readme.txt", "q1.pdf", "q2.csv"))
    assert(docs("q1.pdf").getAs[String]("path") == "reports")
    assert(docs("q2.csv").getAs[String]("schema") == "Table")
    val idx = scala.io.Source.fromFile(s"$out/index.json").mkString
    assert(idx.contains("\"name\":\"docs\"") && idx.contains("documents.csv"))
  }
}
