package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Statement
import graft.ops.{EntityAssembly, MergeDedupe}

/** Hot-entity skew stress for the CORE lake path (round-13 verdict item
  * 1): the reference's data model makes mega-entities routine
  * (bucket=pages holds one statement per page — docs/architecture.md:99,
  * logic/parquet.py:253), so A1's supersession-group statistics and A4's
  * entity fold must not funnel a million-row group through one task.
  *
  * A1 ships the one-pass WINDOW form (the measured winner on realistic
  * shapes — see MergeDedupe's class doc) with the skew-safe aggregation
  * form kept as a proved-equal fallback (tools/SkewStress
  * .canonicalizeAggForm); A4 ships the two-phase per-(entity,prop) fold
  * proved equal to the one-phase row fold. Both equalities are exercised
  * here on randomized colliding inputs; the measured numbers live in the
  * SKEW_STRESS artifact (tools/SkewStress).
  */
class SkewStressSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  private def stmt(entity: String, prop: String, value: String,
      fragment: String, id: String, lastSeen: Long, firstSeen: Long,
      deletedAt: Option[Long] = None, origin: String = "o1",
      lang: Option[String] = None, originalValue: Option[String] = None): Statement =
    Statement(
      shard = (math.abs(entity.hashCode) % 4).toString, id = id,
      entity_id = entity, dataset = "ds", bucket = "thing", origin = origin,
      source = None, schema = "Person", prop = prop, prop_type = "string",
      value = value, original_value = originalValue, lang = lang, external = false,
      first_seen = ts(firstSeen), last_seen = ts(lastSeen),
      fragment = fragment, deleted_at = deletedAt.map(ts))

  /** The skew-safe AGGREGATION form of A1 (the documented fallback for
    * stores that violate the reference's per-entity envelope — see
    * MergeDedupe's class doc for the measured trade) — defined ONCE on
    * the measuring tool so the spec's equality proof and SkewStress's
    * timings can never drift.
    */
  private def canonicalizeAggForm(df: DataFrame): DataFrame =
    graft.tools.SkewStress.canonicalizeAggForm(df)

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("A1 production window form equals the skew-safe aggregation form on randomized colliding input") {
    import spark.implicits._
    val rnd = new scala.util.Random(14)
    // heavy collisions: 5 entities × 3 props × 4 fragments (incl ''),
    // duplicate ids, timestamp ties, tombstones, AND null/non-null
    // lang + original_value collisions deep in the tiebreak chain — the
    // min_by recency-struct encoding must reproduce the window order's
    // null handling (asc_nulls_first strings, desc_nulls_last deletes)
    val rows = (0 until 4000).map { i =>
      val e = s"e${rnd.nextInt(5)}"
      val p = s"p${rnd.nextInt(3)}"
      val f = rnd.nextInt(4) match { case 0 => ""; case n => s"f$n" }
      val ls = rnd.nextInt(5).toLong * 1000
      val fs = rnd.nextInt(5).toLong * 1000
      val v = s"v${rnd.nextInt(6)}"
      // id collides on purpose: same (e,p,f,v) → same content hash
      val id = s"$e-$p-$f-$v"
      val del = if (rnd.nextInt(10) == 0) Some(ls) else None
      val lang = rnd.nextInt(3) match {
        case 0 => None; case n => Some(s"l$n")
      }
      val orig = rnd.nextInt(3) match {
        case 0 => None; case n => Some(s"ov$n")
      }
      stmt(e, p, v, f, id, ls, fs, del, lang = lang, originalValue = orig)
    }
    val df = rows.toDS().toDF()
    val got = MergeDedupe.canonicalize(df)
    val want = canonicalizeAggForm(df)
    // names+types exact; nullability is allowed to relax (the min_by
    // struct round-trip marks fields nullable — parquet reads are
    // always-nullable in Spark, so the lake path never observes it)
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      want.schema.map(f => (f.name, f.dataType)))
    assert(rowSet(got) == rowSet(want))
    assert(got.count() == want.count())
    // idempotence survives the restructure
    assert(rowSet(MergeDedupe.canonicalize(got)) == rowSet(got))
  }

  test("A1 window form matches the aggregation form when last_seen is null") {
    import spark.implicits._
    // The window order is `last_seen.desc` = desc_NULLS_LAST; the agg
    // form's recency struct must map null to Long.MaxValue to match (a
    // bare -unix_micros(null) stays null and struct ordering sorts null
    // fields FIRST, which would shadow and then kill the whole id).
    val rnd = new scala.util.Random(99)
    val base = (0 until 600).map { i =>
      val e = s"e${rnd.nextInt(3)}"
      val p = s"p${rnd.nextInt(2)}"
      val f = rnd.nextInt(3) match { case 0 => ""; case n => s"f$n" }
      val v = s"v${rnd.nextInt(4)}"
      val ls = if (rnd.nextInt(3) == 0) None else Some(rnd.nextInt(3).toLong * 1000)
      stmt(e, p, v, f, s"$e-$p-$f-$v", ls.getOrElse(0L), 0L)
        .copy(last_seen = ls.map(ts).orNull)
    }
    val df = base.toDS().toDF()
    val got = MergeDedupe.canonicalize(df)
    val want = canonicalizeAggForm(df)
    assert(rowSet(got) == rowSet(want))
    assert(got.count() == want.count())
    // the non-null row must be the survivor wherever one exists
    val survivors = got.filter(col("fragment") =!= "").collect()
    assert(survivors.nonEmpty)
  }

  test("A4 two-phase assembly equals the reference-exact row fold on randomized input") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 3000).map { i =>
      EntityAssembly.StmtLite(
        canonical_id = s"c${rnd.nextInt(7)}",
        entity_id = s"e${rnd.nextInt(20)}",
        schema = Seq("Thing", "LegalEntity", "Person")(rnd.nextInt(3)),
        prop = if (rnd.nextInt(8) == 0) Statement.BaseId
          else Seq("name", "nationality", "notes")(rnd.nextInt(3)),
        value = s"v${rnd.nextInt(40)}",
        dataset = s"d${rnd.nextInt(3)}", origin = s"o${rnd.nextInt(3)}",
        first_seen = ts(rnd.nextInt(5).toLong * 1000),
        last_seen = ts(rnd.nextInt(5).toLong * 1000))
    }
    val live = rows.toDS().toDF()
    val got = EntityAssembly.assemble(live).collect().map(d => d.id -> d).toMap
    val want = rows.groupBy(_.canonical_id).map { case (id, g) =>
      id -> EntityAssembly.fold(id, g.iterator)
    }
    assert(got.keySet == want.keySet)
    for ((id, w) <- want) assert(got(id) == w, s"entity $id")
  }

  test("mega-entity correctness: pages-shape and single-hot-group survivors") {
    import spark.implicits._
    val n = 50000
    // pages shape: one entity, one prop, N DISTINCT fragments (one per
    // page) — plus a re-emission of fragment 0 that supersedes it
    val pages = (0 until n).map(i =>
      stmt("mega", "indexText", s"page text $i", s"pg$i", s"mega-pg$i",
        lastSeen = 0, firstSeen = 1000))
    val resent = stmt("mega", "indexText", "page text 0 v2", "pg0",
      "mega-pg0-v2", lastSeen = 5000, firstSeen = 5000)
    // pathological: ONE (entity, prop, fragment) group with N rows —
    // half at the group-max last_seen (multi-valued emission: ALL tied
    // rows survive), half older (superseded: all drop), first_seen
    // folded to the group min even from dropped rows
    val hot = (0 until n).map { i =>
      val atMax = i % 2 == 0
      stmt("hot", "alias", s"a$i", "f0", s"hot-a$i",
        lastSeen = if (atMax) 9000 else 1000,
        firstSeen = if (i == 1) 0 else 2000)
    }
    val merged = MergeDedupe.canonicalize((pages ++ Seq(resent) ++ hot).toDS().toDF())
      .select("entity_id", "prop", "fragment", "value", "first_seen", "last_seen")
      .collect()
    val byEntity = merged.groupBy(_.getString(0))
    // pages: every fragment keeps exactly one row; pg0's re-emission won
    val mega = byEntity("mega")
    assert(mega.length == n)
    val pg0 = mega.filter(_.getString(2) == "pg0")
    assert(pg0.length == 1 && pg0.head.getString(3) == "page text 0 v2")
    // hot group: exactly the tied-at-max half survives, first_seen = group min
    val hotRows = byEntity("hot")
    assert(hotRows.length == n / 2)
    assert(hotRows.forall(_.getTimestamp(5) == ts(9000)))
    assert(hotRows.forall(_.getTimestamp(4) == ts(0)))
    // A4 over the merged pages entity: the document carries every page
    val docs = EntityAssembly.assemble(
      merged.length match { case _ =>
        MergeDedupe.canonicalize((pages ++ Seq(resent)).toDS().toDF())
          .withColumn("canonical_id", col("entity_id"))
      }).collect().map(d => d.id -> d).toMap
    assert(docs("mega").properties("indexText").length == n)
    assert(docs("mega").last_seen == ts(5000))
  }
}
