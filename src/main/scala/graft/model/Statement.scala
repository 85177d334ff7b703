package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The statement row — the reference's single physical abstraction: one
  * `(entity_id, prop, value)` observation with provenance and lifecycle
  * timestamps (reference: ftm_lakehouse/model/statement.py:36-52, column
  * semantics documented in SURVEY.md §1.1).
  *
  * All property values are strings (FtM models everything as typed strings);
  * entities are views assembled by grouping statements on `entity_id`.
  */
case class Statement(
    shard: String,
    id: String,
    entity_id: String,
    dataset: String,
    bucket: String,
    origin: String,
    source: Option[String],
    schema: String,
    prop: String,
    prop_type: String,
    value: String,
    original_value: Option[String],
    lang: Option[String],
    external: Boolean,
    first_seen: Timestamp,
    last_seen: Timestamp,
    fragment: String, // empty-string sentinel, never NULL
    deleted_at: Option[Timestamp])

object Statement {
  /** Physical schema, in canonical column order. */
  val schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("entity_id", StringType, nullable = false),
    StructField("dataset", StringType, nullable = false),
    StructField("bucket", StringType, nullable = false),
    StructField("origin", StringType, nullable = false),
    StructField("source", StringType, nullable = true),
    StructField("schema", StringType, nullable = false),
    StructField("prop", StringType, nullable = false),
    StructField("prop_type", StringType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("original_value", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("external", BooleanType, nullable = false),
    StructField("first_seen", TimestampType, nullable = false),
    StructField("last_seen", TimestampType, nullable = false),
    StructField("fragment", StringType, nullable = false),
    StructField("deleted_at", TimestampType, nullable = true)))

  val columns: Seq[String] = schema.fieldNames.toSeq

  /** Hive partition columns, coarse→fine: an entity lives in exactly one
    * (shard, bucket) so per-partition sorted scans stream entity-contiguous
    * rows (reference: storage/parquet.py:836-861).
    */
  val partitionColumns: Seq[String] = Seq("shard", "bucket", "origin")

  /** Append-time sort order inside files (reference: storage/parquet.py:519-529). */
  val appendSortColumns: Seq[String] =
    Seq("bucket", "origin", "entity_id", "fragment", "prop", "id")

  /** The sentinel prop of the per-entity checksum row (reference BASE_ID). */
  val BaseId = "id"
}
