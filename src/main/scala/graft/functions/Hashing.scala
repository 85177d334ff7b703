package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-hash key functions (reference F1/F2/F3 in SURVEY.md §2.8).
  *
  * The reference derives these from sha1-based recipes in the
  * followthemoney library (core/conventions/path.py:245-264,
  * helpers/statements.py:102-144). Our engine defines its own
  * self-consistent recipes on md5/sha256 — chosen because they are the
  * hash functions DuckDB also ships, so every derived key is
  * oracle-checkable. All are pure `functions._` compositions: codegen'd,
  * no UDFs in the hot path.
  */
object Hashing {

  /** ASCII unit separator used to join key parts (reference packs
    * statements with the same separator, helpers/statements.py:17-99).
    */
  val Sep = "\u001f"

  /** F1: deterministic shard of an entity id: first 8 hex chars of
    * md5(entity_id) as an unsigned int, mod `shards`, zero-padded hex.
    * Equal entity ids always land in the same shard, which is the
    * invariant that keeps an entity inside one parquet partition.
    */
  def shardOf(entityId: Column, shards: Int): Column = {
    require(shards > 0, "shards must be positive")
    if (shards == 1) lit("0")
    else {
      val width = java.lang.Integer.toHexString(shards - 1).length
      val n = TokenHash(entityId.cast("string")) % shards
      format_string(s"%0${width}x", n)
    }
  }

  /** F2: content-addressed statement id over the identity-carrying fields.
    * Two observations of the same fact collapse to the same id, which is
    * what makes the merge dedupe idempotent.
    */
  def statementKey(dataset: Column, entityId: Column, prop: Column, value: Column): Column =
    md5(concat_ws(Sep, dataset, entityId, prop, value))

  /** F3: per-entity checksum — sha256 over the schema and the sorted set of
    * statement ids. Order-independent by construction (sort_array), so it is
    * stable under shuffling. Used as the BASE_ID row's value.
    */
  def entityChecksum(schema: Column, sortedIds: Column): Column =
    sha2(concat(schema, lit("|"), concat_ws(",", sortedIds)), 256)

  // ---- followthemoney-compatible recipes (flag: graft.ftm-compat-keys) ----
  // The reference keys statements with followthemoney's sha1 derivations
  // (logic/entities/explode.py:129,196 via Statement.make_key;
  // helpers/statements.py:102-144 for the BASE_ID fold;
  // core/conventions/path.py:245-264 for the shard). With the session
  // conf `graft.ftm-compat-keys=true`, the statement WRITE paths (entity
  // explode, CSV statement source, journal wire) use these recipes
  // instead of the native md5/sha256 ones, so imports into a
  // reference-written lake (e.g. one opened via DeltaImport) collapse
  // with its existing rows and exports id-match reference artifacts.
  //
  // HONESTY CAVEAT: the BASE_ID fold and shard recipe are implemented
  // exactly from the reference source in this repo; Statement.make_key
  // lives in the followthemoney package (not vendored here), so its
  // format is implemented from the library's long-stable public recipe —
  // sha1(utf8("{dataset}.{entity_id}.{prop}.{value}" [+ ".{lang}" when
  // lang is set] [+ ".ext" when external])) — with lang pre-nulled for
  // non-linguistic prop types, as the reference import does before
  // keying (explode.py:192-196). The lang-before-ext segment order
  // follows the published library source; true byte-parity against a
  // live followthemoney install remains untestable offline. FtmCompatSpec pins the resulting digests.

  /** Whether the session asks for followthemoney-compatible keys. */
  def ftmCompat(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.get("graft.ftm-compat-keys", "false").toBoolean

  /** Reference `entity_shard` (core/conventions/path.py:255-264): first 8
    * hex chars of sha1(entity_id) mod `shards`, zero-padded to
    * `max(1, ((shards-1).bit_length+3)/4)` hex digits (banal.hash_data's
    * plain-string case is sha1 over utf-8 bytes).
    */
  def ftmShardOf(entityId: Column, shards: Int): Column = {
    require(shards > 0, "shards must be positive")
    if (shards <= 1) lit("0")
    else {
      val width = math.max(1, (32 - Integer.numberOfLeadingZeros(shards - 1) + 3) / 4)
      val n = conv(substring(sha1(entityId.cast("string")), 1, 8), 16, 10)
        .cast("long") % shards
      format_string(s"%0${width}x", n)
    }
  }

  /** Reference `Statement.make_key`: sha1 over the dot-joined identity
    * fields, with a `.{lang}` segment appended when the statement carries
    * a language and `.ext` appended for external rows — lang before ext,
    * per the library's published recipe (the lang segment was added to
    * the key format ahead of the terminal external marker). Callers must
    * pass `lang` ALREADY nulled for non-linguistic prop types
    * (`FtmModel.nonLinguistic`), mirroring `explode.py:192-194` — the
    * reference nulls before keying, so a lang on a date prop must not
    * perturb the digest.
    */
  def ftmStatementKey(dataset: Column, entityId: Column, prop: Column,
      value: Column, external: Column, lang: Column): Column = {
    val base = concat_ws(".", dataset, entityId, prop, value)
    val withLang = when(lang.isNotNull && lang =!= "",
      concat(base, lit("."), lang)).otherwise(base)
    // reference predicate (explode.py:194): str(x).strip().lower() in
    // ("true","1") — a plain boolean cast would also accept Spark's
    // extended spellings ("t","y","yes") the reference rejects. Python
    // strip() removes ALL whitespace (tabs, newlines, unicode spaces),
    // not just 0x20, so the strip is a (?U)\s regex, not trim(). Known
    // residue: Python's isspace() also covers \x1c-\x1f (file/group/
    // record/unit separators), which Unicode White_Space does not — a
    // flag padded with THOSE bytes would still diverge.
    val isExt = coalesce(
      lower(regexp_replace(external.cast("string"), "(?U)^\\s+|(?U)\\s+$", ""))
        .isin("true", "1"), lit(false))
    sha1(when(isExt, concat(withLang, lit(".ext"))).otherwise(withLang))
  }

  /** Lang-less, statically-flagged form (entity explode: external=false,
    * lang=None by construction — `explode.py:129`). */
  def ftmStatementKey(dataset: Column, entityId: Column, prop: Column,
      value: Column): Column =
    ftmStatementKey(dataset, entityId, prop, value,
      lit(false), lit(null).cast("string"))

  /** Reference BASE_ID checksum (helpers/statements.py:133-135):
    * sha1(schema) folded over the sorted distinct statement ids — a fold
    * of digest updates equals sha1 of the concatenation.
    */
  def ftmEntityChecksum(schema: Column, sortedIds: Column): Column =
    sha1(concat(schema, array_join(sortedIds, "")))

  // ---- pure-JVM twins (HTTP client repository, no SparkSession) ----
  // Byte-identical to the Column recipes above: the API client explodes
  // entity payloads on its own side of the wire (like the reference's
  // followthemoney client-side explode) and the resulting statement ids
  // must collapse with rows written through the embedded path.

  private val md5s = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val sha256s = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("SHA-256"))

  private def hex(d: Array[Byte]): String = {
    val sb = new StringBuilder(d.length * 2)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Scala twin of [[statementKey]]. */
  def statementKeyLocal(dataset: String, entityId: String, prop: String,
      value: String): String = {
    val md = md5s.get(); md.reset()
    hex(md.digest(Seq(dataset, entityId, prop, value)
      .mkString(Sep).getBytes("UTF-8")))
  }

  /** Scala twin of [[entityChecksum]] (ids must already be sorted). */
  def entityChecksumLocal(schema: String, sortedIds: Seq[String]): String = {
    val md = sha256s.get(); md.reset()
    hex(md.digest((schema + "|" + sortedIds.mkString(",")).getBytes("UTF-8")))
  }

  private val sha1s = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("SHA-1"))

  /** Scala twin of [[ftmStatementKey]]. `lang` must already be nulled
    * for non-linguistic prop types (see the Column form's contract). */
  def ftmStatementKeyLocal(dataset: String, entityId: String, prop: String,
      value: String, external: Boolean = false,
      lang: Option[String] = None): String = {
    val md = sha1s.get(); md.reset()
    val key = s"$dataset.$entityId.$prop.$value" +
      lang.filter(_.nonEmpty).map("." + _).getOrElse("") +
      (if (external) ".ext" else "")
    hex(md.digest(key.getBytes("UTF-8")))
  }

  /** Scala twin of [[ftmEntityChecksum]] (ids must already be sorted+distinct). */
  def ftmEntityChecksumLocal(schema: String, sortedIds: Seq[String]): String = {
    val md = sha1s.get(); md.reset()
    hex(md.digest((schema + sortedIds.mkString("")).getBytes("UTF-8")))
  }

  /** Scala twin of [[ftmShardOf]]. */
  def ftmShardOfLocal(entityId: String, shards: Int): String = {
    require(shards > 0, "shards must be positive")
    if (shards <= 1) "0"
    else {
      val md = sha1s.get(); md.reset()
      val h = hex(md.digest(entityId.getBytes("UTF-8")))
      val width = math.max(1, (32 - Integer.numberOfLeadingZeros(shards - 1) + 3) / 4)
      val n = java.lang.Long.parseLong(h.substring(0, 8), 16) % shards
      String.format(s"%0${width}x", java.lang.Long.valueOf(n))
    }
  }

  /** Scala twin of [[shardOf]]. */
  def shardOfLocal(entityId: String, shards: Int): String = {
    require(shards > 0, "shards must be positive")
    if (shards == 1) "0"
    else {
      val width = java.lang.Integer.toHexString(shards - 1).length
      val n = TokenHash.md5Prefix32(
        org.apache.spark.unsafe.types.UTF8String.fromString(entityId)) % shards
      String.format(s"%0${width}x", java.lang.Long.valueOf(n))
    }
  }
}
