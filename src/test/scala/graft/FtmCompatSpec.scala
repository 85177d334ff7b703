package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.lake.LakeRepository
import graft.ops.Explode
import graft.ops.Explode.EntityPayload

/** `graft.ftm-compat-keys`: the reference's followthemoney sha1 key
  * derivations on the statement write paths (Statement.make_key via
  * logic/entities/explode.py:129,196; the BASE_ID fold of
  * helpers/statements.py:133-135; entity_shard of
  * core/conventions/path.py:255-264).
  *
  * The digests pinned here are computed from those formulas directly
  * (sha1 over the documented byte strings) — they gate the Scala
  * implementations (Column recipes AND pure-JVM twins) against each
  * other and against formula drift. Byte-parity against a live
  * followthemoney installation is untestable in this sandbox (no
  * package, no egress); the in-repo sources for the fold and shard are
  * exact, make_key follows the library's long-stable public recipe.
  */
class FtmCompatSpec extends SparkSpec {

  // sha1("ds.jane.name.Jane Doe") etc., computed from the reference recipe
  private val K1 = "b07a0ce30090b430716d7f73e21d823aa75d3312" // name
  private val K2 = "b97ed7ca7b626fb757b9769013a53648c0953b3c" // nationality
  private val Checksum = "2a51cf2187e13174e909ff568db9e9e85d61cc8d"
  private val BaseId = "d2c427a325bc8586cb7dc4da60721de294bf4741"
  private val KExt = "a9ff52810ff17bc4956258d2c69916190ef37f1c"
  // sha1("ds.jane.name.Jane Doe.fr") / sha1("ds.jane.name.Jane Doe.fr.ext")
  // — the lang segment precedes the terminal .ext marker
  private val KLang = "40e96fceaf68b4719c616d88172511b328c95640"
  private val KLangExt = "29d6f3dba51cd6b5672226eff9bfa14a639f7cdf"

  private def withCompat[A](body: => A): A = {
    spark.conf.set("graft.ftm-compat-keys", "true")
    try body finally spark.conf.unset("graft.ftm-compat-keys")
  }

  test("pinned digests: Column recipes and local twins agree with the formulas") {
    import spark.implicits._
    val df = Seq(("ds", "jane", "name", "Jane Doe"),
      ("ds", "jane", "nationality", "us")).toDF("ds", "eid", "prop", "value")
    val keys = df.select(Hashing.ftmStatementKey(
      col("ds"), col("eid"), col("prop"), col("value")).as("k"))
      .as[String].collect().toSet
    assert(keys == Set(K1, K2))
    assert(Hashing.ftmStatementKeyLocal("ds", "jane", "name", "Jane Doe") == K1)
    assert(Hashing.ftmStatementKeyLocal("ds", "jane", "nationality", "us") == K2)
    assert(Hashing.ftmStatementKeyLocal("ds", "jane", "name", "Jane Doe",
      external = true) == KExt)
    assert(df.limit(1).select(Hashing.ftmStatementKey(col("ds"), col("eid"),
        col("prop"), col("value"), lit(true), lit(null).cast("string")).as("k"))
      .as[String].collect().head == KExt)

    // lang-bearing forms: .{lang} appended when set, before the .ext marker
    assert(Hashing.ftmStatementKeyLocal("ds", "jane", "name", "Jane Doe",
      lang = Some("fr")) == KLang)
    assert(Hashing.ftmStatementKeyLocal("ds", "jane", "name", "Jane Doe",
      external = true, lang = Some("fr")) == KLangExt)
    // empty/absent lang keys identically to the lang-less form
    assert(Hashing.ftmStatementKeyLocal("ds", "jane", "name", "Jane Doe",
      lang = Some("")) == K1)
    val langCols = df.limit(1).select(
      Hashing.ftmStatementKey(col("ds"), col("eid"), col("prop"),
        col("value"), lit(false), lit("fr")).as("a"),
      Hashing.ftmStatementKey(col("ds"), col("eid"), col("prop"),
        col("value"), lit(true), lit("fr")).as("b"),
      Hashing.ftmStatementKey(col("ds"), col("eid"), col("prop"),
        col("value"), lit(false), lit("")).as("c")).collect()(0)
    assert(langCols.getString(0) == KLang)
    assert(langCols.getString(1) == KLangExt)
    assert(langCols.getString(2) == K1)

    val ch = Seq(("Person", Seq(K1, K2).sorted)).toDF("schema", "ids")
      .select(Hashing.ftmEntityChecksum(col("schema"), col("ids")).as("c"))
      .as[String].collect().head
    assert(ch == Checksum)
    assert(Hashing.ftmEntityChecksumLocal("Person", Seq(K1, K2).sorted) == Checksum)
    assert(Hashing.ftmStatementKeyLocal("ds", "jane", "id", Checksum) == BaseId)

    // entity_shard: sha1("jane")[:8]=8a8deed4 → mod shards, hex-padded
    assert(Hashing.ftmShardOfLocal("jane", 4) == "0")
    assert(Hashing.ftmShardOfLocal("jane", 16) == "4")
    assert(Hashing.ftmShardOfLocal("jane", 256) == "d4")
    assert(Hashing.ftmShardOfLocal("jane", 1) == "0")
    val shards = Seq("jane").toDF("eid").select(
      Hashing.ftmShardOf(col("eid"), 4).as("a"),
      Hashing.ftmShardOf(col("eid"), 16).as("b"),
      Hashing.ftmShardOf(col("eid"), 256).as("c")).collect()(0)
    assert(shards.getString(0) == "0" && shards.getString(1) == "4" &&
      shards.getString(2) == "d4")
  }

  test("external flag strips Python-style whitespace (explode.py:194)") {
    import spark.implicits._
    val df = Seq(("ds", "jane", "name", "Jane Doe"))
      .toDF("ds", "eid", "prop", "value")
    def key(ext: org.apache.spark.sql.Column): String =
      df.select(Hashing.ftmStatementKey(col("ds"), col("eid"), col("prop"),
          col("value"), ext, lit(null).cast("string")).as("k"))
        .as[String].collect().head
    // Python str(x).strip() removes ALL whitespace — tabs, newlines, and
    // unicode spaces like NBSP — not just 0x20 (round-12 trim() missed
    // these, diverging the statement id for padded flag values)
    assert(key(lit("true\n")) == KExt)
    assert(key(lit("\tTRUE ")) == KExt)
    assert(key(lit(" 1 ")) == KExt)
    assert(key(lit("\u00a0true\u00a0")) == KExt) // NBSP is Python-space too
    // extended boolean spellings the reference rejects stay non-external
    assert(key(lit("yes")) == K1)
    assert(key(lit(null).cast("string")) == K1)
  }

  test("flagged import writes followthemoney-keyed rows end to end") {
    withCompat {
      import spark.implicits._
      val dir = Files.createTempDirectory("graft-ftmcompat").toString
      val repo = new LakeRepository(spark, dir, dataset = "ds", shards = 4)
      repo.addEntities(Seq(EntityPayload("jane", "Person",
        Map("name" -> Seq("Jane Doe"), "nationality" -> Seq("us")))).toDS(),
        now = Timestamp.valueOf("2024-01-01 00:00:00"))
      repo.flush()
      val rows = repo.store.raw
        .select("id", "prop", "value", "shard").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      assert(rows.map(_._1).toSet == Set(K1, K2, BaseId), rows.toSeq)
      val base = rows.find(_._2 == graft.model.Statement.BaseId).get
      assert(base._3 == Checksum)
      assert(rows.forall(_._4 == Hashing.ftmShardOfLocal("jane", 4)))
    }
  }

  test("flag off keeps the native recipes; local batch twin honors the flag") {
    val now = Timestamp.valueOf("2024-01-01 00:00:00")
    val native = Explode.explodeLocalBatch(Seq(EntityPayload("jane", "Person",
      Map("name" -> Seq("Jane Doe")))), "ds", "default", now)
    assert(native.map(_.id).forall(_.length == 32)) // md5 recipes
    val compat = Explode.explodeLocalBatch(Seq(EntityPayload("jane", "Person",
      Map("name" -> Seq("Jane Doe"), "nationality" -> Seq("us")))),
      "ds", "default", now, ftmCompat = true)
    assert(compat.map(_.id).toSet == Set(K1, K2, BaseId))
    assert(compat.find(_.prop == graft.model.Statement.BaseId)
      .exists(_.value == Checksum))
  }

  test("flagged CSV statement source re-keys with the compat recipe") {
    withCompat {
      import spark.implicits._
      val dir = Files.createTempDirectory("graft-ftmcompat-csv").toString
      // a statements.csv with foreign ids: the import re-derives keys
      // under the target dataset (reference statement_row_unsafe)
      val now = Timestamp.valueOf("2024-01-01 00:00:00")
      def st(prop: String, value: String, lang: Option[String] = None) =
        graft.model.Statement(
          shard = "z", id = "junk-" + prop, entity_id = "jane", dataset = "ds",
          bucket = "thing", origin = "default", source = None, schema = "Person",
          prop = prop, prop_type = "string", value = value,
          original_value = None, lang = lang, external = false,
          first_seen = now, last_seen = now, fragment = "", deleted_at = None)
      Seq(st("name", "Jane Doe"), st("nationality", "us")).toDS().toDF()
        .select(graft.model.Statement.columns.map(col): _*)
        .coalesce(1).write.option("header", "true")
        .mode("overwrite").csv(s"$dir/in")
      val got = graft.ops.Exports.statementsCsvImport(spark, s"$dir/in", shards = 4)
      val ids = got.select("id").collect().map(_.getString(0)).toSet
      assert(ids == Set(K1, K2), ids)
      assert(got.select("shard").distinct().collect().map(_.getString(0)).toSeq ==
        Seq(Hashing.ftmShardOfLocal("jane", 4)))

      // lang-carrying fixture: a linguistic prop keeps its lang (and the
      // key gains the .fr segment); a non-linguistic prop (nationality →
      // country type) has its lang NULLED before keying, so it collapses
      // onto the lang-less digest — exactly explode.py:192-196
      Seq(st("name", "Jane Doe", lang = Some("fr")),
          st("nationality", "us", lang = Some("fr"))).toDS().toDF()
        .select(graft.model.Statement.columns.map(col): _*)
        .coalesce(1).write.option("header", "true")
        .mode("overwrite").csv(s"$dir/in2")
      val got2 = graft.ops.Exports.statementsCsvImport(spark, s"$dir/in2", shards = 4)
      val byProp = got2.select("prop", "id", "lang").collect()
        .map(r => r.getString(0) -> (r.getString(1), Option(r.getString(2)))).toMap
      assert(byProp("name") == ((KLang, Some("fr"))), byProp)
      assert(byProp("nationality") == ((K2, None)), byProp)
    }
  }
}
