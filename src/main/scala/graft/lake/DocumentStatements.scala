package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic mapping of the testdata `documents` table into the
  * statement schema: each document becomes a `PlainText` entity carrying a
  * `name`, its `bodyText`, and a `language` statement — the shape the
  * reference produces when ingesting files (reference
  * logic/entities/explode.py:97-148 emits exactly such per-property rows;
  * model routing per logic/documents.py). This gives the statement lake a
  * text-bearing dataset, so retrieval/text operators compose with the FtM
  * live-view surface the same way xref does.
  *
  * A ~1% subset (doc_id % 97 == 0) carries tombstones: retrieval over the
  * live view must drop those documents with no index rebuild — the point
  * of running search through the lake rather than over raw parquet.
  *
  * `SQL` is the character-for-character DuckDB twin; keep in sync.
  */
object DocumentStatements {

  val Shards = 16

  def statements(documents: DataFrame): DataFrame = {
    val entityId = concat(lit("d"), col("doc_id"))
    val dataset = lit("docs_ds")
    val firstSeen = expr(
      "timestampadd(SECOND, doc_id, TIMESTAMP '2024-01-01 00:00:00')")
    val deletedAt = when(pmod(col("doc_id"), lit(97)) === 0,
      date_trunc("hour", firstSeen) + expr("INTERVAL 30 MINUTES"))
      .otherwise(lit(null).cast("timestamp"))
    def stmt(prop: String, propType: String, value: org.apache.spark.sql.Column) =
      documents.select(
        Hashing.shardOf(entityId, Shards).as("shard"),
        Hashing.statementKey(dataset, entityId, lit(prop), value).as("id"),
        entityId.as("entity_id"),
        dataset.as("dataset"),
        lit("document").as("bucket"),
        lit("crawl").as("origin"),
        lit(null).cast("string").as("source"),
        lit("PlainText").as("schema"),
        lit(prop).as("prop"),
        lit(propType).as("prop_type"),
        value.as("value"),
        lit(null).cast("string").as("original_value"),
        (if (prop == "bodyText") col("lang")
         else lit(null)).cast("string").as("lang"),
        lit(false).as("external"),
        firstSeen.as("first_seen"),
        date_trunc("hour", firstSeen).as("last_seen"),
        deletedAt.as("deleted_at"),
        lit("").as("fragment"))
    stmt("name", "name", concat(col("source"), lit("-"), col("doc_id")))
      .unionByName(stmt("bodyText", "text", col("text")))
      .unionByName(stmt("language", "language", col("lang")))
  }

  /** DuckDB CTE body equivalent to [[statements]] over `documents`. */
  val SQL: String =
    """SELECT
      |  printf('%01x', (('0x'||substr(md5('d'||doc_id),1,8))::BIGINT % 16)) AS shard,
      |  md5('docs_ds' || chr(31) || ('d'||doc_id) || chr(31) || prop || chr(31) || value) AS id,
      |  'd'||doc_id AS entity_id,
      |  'docs_ds' AS dataset,
      |  'document' AS bucket,
      |  'crawl' AS origin,
      |  CAST(NULL AS VARCHAR) AS source,
      |  'PlainText' AS "schema",
      |  prop, prop_type, value,
      |  CAST(NULL AS VARCHAR) AS original_value,
      |  CASE WHEN prop = 'bodyText' THEN lang END AS lang,
      |  FALSE AS external,
      |  TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS first_seen,
      |  date_trunc('hour', TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND) AS last_seen,
      |  CASE WHEN doc_id % 97 = 0 THEN
      |    date_trunc('hour', TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND) + INTERVAL 30 MINUTE END AS deleted_at,
      |  '' AS fragment
      |FROM (
      |  SELECT doc_id, lang, 'name' AS prop, 'name' AS prop_type, source || '-' || doc_id AS value FROM documents
      |  UNION ALL
      |  SELECT doc_id, lang, 'bodyText', 'text', text FROM documents
      |  UNION ALL
      |  SELECT doc_id, lang, 'language', 'language', lang FROM documents)""".stripMargin
}
