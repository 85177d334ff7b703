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
