package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.model.{FtmModel, Statement}

/** S12: explode entity payloads into statement rows (reference
  * logic/entities/explode.py:42-148). The UDTF-shaped inverse of
  * [[EntityAssembly]]: one row per (prop, value) plus the trailing BASE_ID
  * checksum row per entity.
  *
  * Input: a Dataset of [[Explode.EntityPayload]] (what `spark.read.json`
  * of an FtM JSON-lines export deserializes to). Output: the 18-column
  * statement DataFrame, shard-assigned and content-keyed, ready for
  * `StatementStore.append` / `Journal.write`. Runs as a flatMap — fully
  * distributed, no driver involvement.
  */
object Explode {

  case class EntityPayload(
      id: String,
      schema: String,
      properties: Map[String, Seq[String]])

  /** Strip a trailing namespace signature (`id.sig` → `id`), reference F4. */
  def stripNamespace(id: String): String = {
    val dot = id.lastIndexOf('.')
    if (dot <= 0) id else id.substring(0, dot)
  }

  def explode(
      entities: Dataset[EntityPayload],
      dataset: String,
      origin: String,
      shards: Int,
      now: Timestamp): DataFrame = {
    val spark = entities.sparkSession
    import spark.implicits._

    val rows = entities.flatMap { e =>
      val entityId = stripNamespace(e.id)
      val bucket = FtmModel.bucketOf(e.schema)
      val propRows = for {
        (prop, values) <- e.properties.toSeq
        value <- values
      } yield {
        val propType = FtmModel.propTypes(prop)
        val cleanValue =
          if (propType == "entity") stripNamespace(value) else value
        (entityId, e.schema, bucket, prop, propType, cleanValue,
          if (FtmModel.nonLinguistic(propType)) null else "")
      }
      propRows
    }.toDF("entity_id", "schema", "bucket", "prop", "prop_type", "value", "lang0")

    val keyed = rows.select(
      Hashing.shardOf(col("entity_id"), shards).as("shard"),
      Hashing.statementKey(lit(dataset), col("entity_id"), col("prop"), col("value")).as("id"),
      col("entity_id"),
      lit(dataset).as("dataset"),
      col("bucket"),
      lit(origin).as("origin"),
      lit(null).cast("string").as("source"),
      col("schema"),
      col("prop"),
      col("prop_type"),
      col("value"),
      lit(null).cast("string").as("original_value"),
      when(col("lang0") === "", lit(null)).otherwise(col("lang0")).cast("string").as("lang"),
      lit(false).as("external"),
      lit(now).as("first_seen"),
      lit(now).as("last_seen"),
      lit("").as("fragment"),
      lit(null).cast("timestamp").as("deleted_at"))

    // A10: trailing BASE_ID checksum row per entity, derived from the sorted
    // set of statement ids — order-independent, so safe to compute post-shuffle.
    val baseRows = keyed.groupBy(col("entity_id"), col("schema"), col("bucket"), col("shard"))
      .agg(Hashing.entityChecksum(first(col("schema")), sort_array(collect_set(col("id")))).as("value"))
      .select(
        col("shard"),
        Hashing.statementKey(lit(dataset), col("entity_id"), lit(Statement.BaseId), col("value")).as("id"),
        col("entity_id"),
        lit(dataset).as("dataset"),
        col("bucket"),
        lit(origin).as("origin"),
        lit(null).cast("string").as("source"),
        col("schema"),
        lit(Statement.BaseId).as("prop"),
        lit("checksum").as("prop_type"),
        col("value"),
        lit(null).cast("string").as("original_value"),
        lit(null).cast("string").as("lang"),
        lit(false).as("external"),
        lit(now).as("first_seen"),
        lit(now).as("last_seen"),
        lit("").as("fragment"),
        lit(null).cast("timestamp").as("deleted_at"))

    keyed.unionByName(baseRows)
  }
}
