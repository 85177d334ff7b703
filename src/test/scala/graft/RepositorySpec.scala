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
      orderByProp = Some(("name", false)), limit = Some(2)))
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
}
