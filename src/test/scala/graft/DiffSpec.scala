package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.lake.StatementStore
import graft.model.Statement
import graft.ops.Diff

/** Stateful incremental diff export (reference repository/diff.py:66-145
  * and the supersession-without-merge scenario of
  * tests/test_repository_entities.py:263-312).
  */
class DiffSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def stmt(id: String, entity: String, value: String,
      fragment: String, firstSeen: String, lastSeen: String,
      deletedAt: Option[String] = None, prop: String = "name") =
    Statement(
      shard = "0", id = id, entity_id = entity, dataset = "ds",
      bucket = "thing", origin = "o1", source = None, schema = "Person",
      prop = prop, prop_type = "string", value = value,
      original_value = None, lang = None, external = false,
      first_seen = ts(firstSeen), last_seen = ts(lastSeen),
      fragment = fragment, deleted_at = deletedAt.map(ts))

  test("diff export: initial full copy, then ADD/MOD/DEL with watermark state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-diff").toString
    val out = Files.createTempDirectory("graft-diff-out").toString
    val store = new StatementStore(spark, dir, shards = 4)

    // empty store: nothing to diff
    assert(Diff.exportDiff(store, out).isEmpty)

    // epoch 1: jane + john
    store.append(Seq(
      stmt("idJane", "jane", "Jane", "", "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
      stmt("idJohn", "john", "John", "f1", "2024-01-01 00:00:00", "2024-01-01 00:00:00")
    ).toDS().toDF())

    val label1 = Diff.exportDiff(store, out, ts("2024-06-01 00:00:00").getTime)
    assert(label1.contains("20240601T000000Z"))
    val initial = spark.read.json(s"$out/diffs/entities.ftm.json/${label1.get}.delta.json")
    assert(initial.count() == 2)
    assert(initial.select("op").distinct().collect().map(_.getString(0)).toSeq == Seq("ADD"))

    // unchanged store version → no-op
    assert(Diff.exportDiff(store, out, ts("2024-06-02 00:00:00").getTime).isEmpty)

    // epoch 2: delete jane (tombstone, last_seen bumped); supersede john's
    // name WITHOUT merging (fresh fragment emission); bob is brand new
    store.append(Seq(
      stmt("idJane", "jane", "Jane", "", "2024-01-01 00:00:00",
        "2024-07-01 00:00:00", deletedAt = Some("2024-07-01 00:00:00")),
      stmt("idJohn2", "john", "Johnny", "f1", "2024-07-01 00:00:00", "2024-07-01 00:00:00"),
      stmt("idBob", "bob", "Bob", "", "2024-07-01 00:00:00", "2024-07-01 00:00:00")
    ).toDS().toDF())

    val label2 = Diff.exportDiff(store, out, ts("2024-08-01 00:00:00").getTime)
    assert(label2.nonEmpty && label2 != label1)
    val delta = spark.read.json(s"$out/diffs/entities.ftm.json/${label2.get}.delta.json")
    val ops = delta.select(col("entity.id"), col("op")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ops == Map("jane" -> "DEL", "john" -> "MOD", "bob" -> "ADD"))

    // supersession applied at read time: the MOD envelope carries only the
    // new value even though no merge ran
    val johnProps = delta.filter(col("entity.id") === "john")
      .select(col("entity.properties.name")).collect()(0).getSeq[String](0)
    assert(johnProps == Seq("Johnny"))
    // DEL envelopes are id-only
    val janeRow = delta.filter(col("entity.id") === "jane").select("entity.caption")
    assert(janeRow.collect()(0).isNullAt(0))

    // state advanced: running again with no new writes is a no-op
    assert(Diff.exportDiff(store, out, ts("2024-09-01 00:00:00").getTime).isEmpty)
  }

  test("documents diff: full ADD copy, then contentHash-scoped ADD/DEL") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-docdiff").toString
    val out = Files.createTempDirectory("graft-docdiff-out").toString
    val store = new StatementStore(spark, dir, shards = 4)
    val sum1 = "11" * 32
    val sum2 = "22" * 32

    def doc(entity: String, checksum: String, firstSeen: String,
        deletedAt: Option[String] = None) = Seq(
      stmt(s"id-$entity-name", entity, s"$entity.txt", "", firstSeen, firstSeen,
        deletedAt, prop = "fileName"),
      stmt(s"id-$entity-hash-$checksum", entity, checksum, "", firstSeen, firstSeen,
        deletedAt, prop = "contentHash"))
      .map(_.copy(schema = "PlainText", bucket = "document"))

    store.append((doc("d1", sum1, "2024-01-01 00:00:00") ++
      doc("d2", sum1, "2024-01-01 00:00:00")).toDS().toDF())

    val l1 = Diff.exportDocumentsDiff(store, out,
      Some("https://x/files"), ts("2024-06-01 00:00:00").getTime)
    assert(l1.nonEmpty)
    val initial = spark.read.option("header", "true")
      .csv(s"$out/diffs/documents.csv/${l1.get}.diff.csv")
    assert(initial.count() == 2)
    assert(initial.select("op").distinct().collect().map(_.getString(0)).toSeq == Seq("ADD"))

    // no change → no-op
    assert(Diff.exportDocumentsDiff(store, out, None,
      ts("2024-06-02 00:00:00").getTime).isEmpty)

    // d1's content changes (new checksum statement supersedes by recency in
    // the live doc fold); d2 is deleted (tombstones on its statements)
    store.append((
      Seq(stmt(s"id-d1-hash-$sum2", "d1", sum2, "", "2024-07-01 00:00:00",
        "2024-07-01 00:00:00", prop = "contentHash")
        .copy(schema = "PlainText", bucket = "document")) ++
      doc("d2", sum1, "2024-01-01 00:00:00", deletedAt = Some("2024-07-01 00:00:00"))
        .map(s => s.copy(last_seen = ts("2024-07-01 00:00:00")))
      ).toDS().toDF())

    val l2 = Diff.exportDocumentsDiff(store, out, None,
      ts("2024-08-01 00:00:00").getTime)
    assert(l2.nonEmpty)
    val delta = spark.read.option("header", "true")
      .csv(s"$out/diffs/documents.csv/${l2.get}.diff.csv")
    val ops = delta.select("id", "op").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ops == Map("d1" -> "ADD", "d2" -> "DEL"))
  }

  test("diff discovery is version-exact: late-committed rows with old timestamps are not lost") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-diff-late").toString
    val out = Files.createTempDirectory("graft-diff-late-out").toString
    val store = new StatementStore(spark, dir, shards = 4)
    store.append(Seq(stmt("id-e1", "e1", "Alice", "",
      "2024-01-01 00:00:00", "2024-01-01 00:00:00")).toDS().toDF())
    val l1 = Diff.exportDiff(store, out, ts("2024-06-01 00:00:00").getTime)
    assert(l1.nonEmpty)
    // e2 COMMITS after the first diff but carries first_seen BEFORE its
    // label — the journal-drained-later / clock-skew shape. A clock-window
    // discovery passes the version gate, excludes the row, advances the
    // state, and the change is lost from every future diff; the CDF
    // discovery must surface it.
    store.append(Seq(stmt("id-e2", "e2", "Bob", "",
      "2024-03-01 00:00:00", "2024-03-01 00:00:00")).toDS().toDF())
    val l2 = Diff.exportDiff(store, out, ts("2024-08-01 00:00:00").getTime)
    assert(l2.nonEmpty, "late-committed change produced no diff — lost")
    val delta = spark.read.json(s"$out/diffs/entities.ftm.json/${l2.get}.delta.json")
    val ids = delta.select("entity.id").collect().map(_.getString(0)).toSet
    assert(ids == Set("e2"))
  }

  test("documents diff ADD rows resolve folder paths despite the changed-id scope") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-docdiff-path").toString
    val out = Files.createTempDirectory("graft-docdiff-path-out").toString
    val store = new StatementStore(spark, dir, shards = 4)
    val sum1 = "33" * 32
    val sum2 = "44" * 32
    def docIn(entity: String, checksum: String, parent: String) = Seq(
      stmt(s"id-$entity-name", entity, s"$entity.txt", "",
        "2024-01-01 00:00:00", "2024-01-01 00:00:00", prop = "fileName"),
      stmt(s"id-$entity-hash-$checksum", entity, checksum, "",
        "2024-01-01 00:00:00", "2024-01-01 00:00:00", prop = "contentHash"),
      stmt(s"id-$entity-parent", entity, parent, "",
        "2024-01-01 00:00:00", "2024-01-01 00:00:00", prop = "parent"))
      .map(_.copy(schema = "PlainText", bucket = "document"))
    val folder = Seq(
      stmt("id-f1-name", "f1", "reports", "",
        "2024-01-01 00:00:00", "2024-01-01 00:00:00", prop = "fileName"))
      .map(_.copy(schema = "Folder", bucket = "document"))
    store.append((docIn("d1", sum1, "f1") ++ folder).toDS().toDF())
    assert(Diff.exportDocumentsDiff(store, out, None,
      ts("2024-06-01 00:00:00").getTime).nonEmpty)
    // content change → incremental diff; its scoped live view holds only
    // the changed DOCUMENT, so folder paths must come from the explicit
    // folder source or every ADD row ships path=null
    store.append(Seq(stmt(s"id-d1-hash-$sum2", "d1", sum2, "",
      "2024-07-01 00:00:00", "2024-07-01 00:00:00", prop = "contentHash")
      .copy(schema = "PlainText", bucket = "document")).toDS().toDF())
    val l2 = Diff.exportDocumentsDiff(store, out, None,
      ts("2024-08-01 00:00:00").getTime)
    assert(l2.nonEmpty)
    val delta = spark.read.option("header", "true")
      .csv(s"$out/diffs/documents.csv/${l2.get}.diff.csv")
    val row = delta.filter(col("id") === "d1").collect().head
    assert(row.getAs[String]("op") == "ADD")
    assert(row.getAs[String]("path") == "reports",
      s"folder path not resolved in the diff: ${row.mkString("|")}")
  }
}
