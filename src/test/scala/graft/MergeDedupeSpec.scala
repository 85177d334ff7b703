package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.model.Statement
import graft.ops.MergeDedupe

/** Replays the reference's merge scenarios (tests/test_logic_parquet.py):
  * duplicate collapse, fragment supersession with surviving ties,
  * tombstone grace, first_seen folding, idempotency.
  */
class MergeDedupeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mk(
      id: String, entity: String, prop: String, value: String,
      fragment: String, firstSeen: String, lastSeen: String,
      deletedAt: Option[String] = None): Statement =
    Statement(
      shard = "0", id = id, entity_id = entity, dataset = "ds",
      bucket = "thing", origin = "o1", source = None, schema = "Person",
      prop = prop, prop_type = "string", value = value,
      original_value = None, lang = None, external = false,
      first_seen = ts(firstSeen), last_seen = ts(lastSeen),
      fragment = fragment, deleted_at = deletedAt.map(ts))

  private def df(rows: Statement*): DataFrame = {
    import spark.implicits._
    rows.toDS().toDF()
  }

  test("non-fragment duplicates collapse to latest, first_seen folds to min") {
    val out = MergeDedupe.live(df(
      mk("a", "e1", "name", "Alice", "", "2024-01-05 00:00:00", "2024-01-05 00:00:00"),
      mk("a", "e1", "name", "Alice", "", "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
      mk("a", "e1", "name", "Alice", "", "2024-01-02 00:00:00", "2024-01-04 00:00:00")))
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Timestamp]("last_seen") == ts("2024-01-05 00:00:00"))
    assert(r.getAs[Timestamp]("first_seen") == ts("2024-01-01 00:00:00"))
  }

  test("fragment supersession: only rows at group-max last_seen survive; ties all survive") {
    val out = MergeDedupe.live(df(
      // old emission: one value
      mk("x1", "e1", "alias", "Old", "f1", "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
      // new emission: two values at the same pinned last_seen — both live
      mk("x2", "e1", "alias", "NewA", "f1", "2024-01-02 00:00:00", "2024-01-02 00:00:00"),
      mk("x3", "e1", "alias", "NewB", "f1", "2024-01-02 00:00:00", "2024-01-02 00:00:00")))
    val values = out.collect().map(_.getAs[String]("value")).sorted
    assert(values.toSeq == Seq("NewA", "NewB"))
  }

  test("fragments are independent: values in other fragments are not superseded") {
    val out = MergeDedupe.live(df(
      mk("x1", "e1", "alias", "FromF1", "f1", "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
      mk("x2", "e1", "alias", "FromF2", "f2", "2024-01-05 00:00:00", "2024-01-05 00:00:00")))
    assert(out.collect().map(_.getAs[String]("value")).sorted.toSeq ==
      Seq("FromF1", "FromF2"))
  }

  test("tombstone shadows live duplicate; grace keeps it physically, live read drops it") {
    val rows = df(
      mk("a", "e1", "name", "Alice", "", "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
      mk("a", "e1", "name", "Alice", "", "2024-01-01 00:00:00", "2024-01-02 00:00:00",
        deletedAt = Some("2024-01-02 00:00:00")))
    // live read: entity fully gone
    assert(MergeDedupe.live(rows).count() == 0)
    // merge with grace: tombstone survives physically to shadow late dupes
    import org.apache.spark.sql.functions.lit
    val kept = MergeDedupe.withGrace(rows, lit("2024-01-01 00:00:00").cast("timestamp")).collect()
    assert(kept.length == 1 && kept.head.getAs[Timestamp]("deleted_at") != null)
    // merge past grace: tombstone reaped
    assert(MergeDedupe.withGrace(rows, lit("2024-02-01 00:00:00").cast("timestamp")).count() == 0)
  }

  test("idempotency: dedupe(dedupe(x)) == dedupe(x)") {
    val input = df(
      mk("a", "e1", "name", "Alice", "", "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
      mk("a", "e1", "name", "Alice", "", "2024-01-02 00:00:00", "2024-01-04 00:00:00"),
      mk("x1", "e1", "alias", "A", "f1", "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
      mk("x2", "e1", "alias", "B", "f1", "2024-01-02 00:00:00", "2024-01-02 00:00:00"))
    val once = MergeDedupe.canonicalize(input)
    val twice = MergeDedupe.canonicalize(once)
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("deleted entity yields zero rows in changed-canonical view (A3)") {
    import org.apache.spark.sql.functions.lit
    val rows = df(
      mk("a", "e1", "name", "Alice", "", "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
      mk("a", "e1", "name", "Alice", "", "2024-01-01 00:00:00", "2024-01-10 00:00:00",
        deletedAt = Some("2024-01-10 00:00:00")),
      mk("b", "e2", "name", "Bob", "", "2024-01-01 00:00:00", "2024-01-01 00:00:00"))
    val changed = MergeDedupe.changedCanonical(rows, lit("2024-01-05 00:00:00").cast("timestamp"))
    // e1 changed (tombstone after watermark) but is fully deleted → 0 rows;
    // e2 did not change → excluded from the changed scope entirely
    assert(changed.count() == 0)
  }
}
