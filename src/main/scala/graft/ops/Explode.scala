package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
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

  /** Pure-JVM twin of [[explode]] for the HTTP client repository: one
    * payload → its prop statements + trailing BASE_ID checksum row, with
    * the SAME content-key recipes, so rows imported over the wire
    * collapse with rows imported embedded. Shard is left blank — the
    * server recomputes it from its recorded shard count (config
    * authority, [[graft.api.JournalWire.writeRows]]). Delegates to
    * [[explodeLocalBatch]], which carries the batch-grain checksum
    * contract.
    */
  def explodeLocal(e: EntityPayload, dataset: String, origin: String,
      now: Timestamp): Seq[Statement] =
    explodeLocalBatch(Seq(e), dataset, origin, now)

  /** Batch-grain pure-JVM twin of [[explode]]: prop statements for every
    * payload, then ONE BASE_ID checksum row per (entity, schema) over the
    * distinct sorted statement ids of the whole batch — exactly the Spark
    * path's `groupBy(entity_id, schema, bucket).collect_set(id)` shape.
    * A batch carrying several fragments of one entity (the reference's
    * fragment-writing pattern, logic/entities/explode.py:120-148) thus
    * yields wire rows content-identical to the embedded transport's.
    */
  def explodeLocalBatch(es: Seq[EntityPayload], dataset: String,
      origin: String, now: Timestamp, ftmCompat: Boolean = false): Seq[Statement] = {
    def keyOf(eid: String, prop: String, value: String): String =
      if (ftmCompat) Hashing.ftmStatementKeyLocal(dataset, eid, prop, value)
      else Hashing.statementKeyLocal(dataset, eid, prop, value)
    val propRows = es.flatMap { e =>
      val entityId = stripNamespace(e.id)
      val bucket = FtmModel.bucketOf(e.schema)
      for {
        (prop, values) <- e.properties.toSeq
        value <- values
      } yield {
        val propType = FtmModel.propTypes(prop)
        val cleanValue = if (propType == "entity") stripNamespace(value) else value
        Statement(
          shard = "",
          id = keyOf(entityId, prop, cleanValue),
          entity_id = entityId, dataset = dataset, bucket = bucket,
          origin = origin, source = None, schema = e.schema, prop = prop,
          prop_type = propType, value = cleanValue, original_value = None,
          lang = None, // entity payload values carry no language (Spark path matches)
          external = false, first_seen = now, last_seen = now,
          fragment = "", deleted_at = None)
      }
    }
    // zero-prop payloads emit no rows at all — same as the Spark path,
    // where they contribute nothing to `keyed` and hence no base row.
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), Vector[Statement]]
    propRows.foreach { s =>
      val k = (s.entity_id, s.schema)
      groups(k) = groups.getOrElse(k, Vector.empty) :+ s
    }
    val baseRows = groups.toSeq.map { case ((entityId, schema), rows) =>
      val checksum =
        if (ftmCompat) Hashing.ftmEntityChecksumLocal(schema, rows.map(_.id).distinct.sorted)
        else Hashing.entityChecksumLocal(schema, rows.map(_.id).distinct.sorted)
      Statement(
        shard = "",
        id = keyOf(entityId, Statement.BaseId, checksum),
        entity_id = entityId, dataset = dataset,
        bucket = FtmModel.bucketOf(schema),
        origin = origin, source = None, schema = schema,
        prop = Statement.BaseId, prop_type = "checksum", value = checksum,
        original_value = None, lang = None, external = false,
        first_seen = now, last_seen = now, fragment = "", deleted_at = None)
    }
    propRows ++ baseRows
  }

  def explode(
      entities: Dataset[EntityPayload],
      dataset: String,
      origin: String,
      shards: Int,
      now: Timestamp): DataFrame = {
    val spark = entities.sparkSession
    import spark.implicits._
    // graft.ftm-compat-keys: reference sha1 recipes on the write path
    val compat = Hashing.ftmCompat(spark)
    def keyOf(ds: Column, eid: Column, prop: Column, value: Column): Column =
      if (compat) Hashing.ftmStatementKey(ds, eid, prop, value)
      else Hashing.statementKey(ds, eid, prop, value)
    def shardOf(eid: Column): Column =
      if (compat) Hashing.ftmShardOf(eid, shards) else Hashing.shardOf(eid, shards)
    def checksumOf(schema: Column, ids: Column): Column =
      if (compat) Hashing.ftmEntityChecksum(schema, ids)
      else Hashing.entityChecksum(schema, ids)

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
        (entityId, e.schema, bucket, prop, propType, cleanValue)
      }
      propRows
    }.toDF("entity_id", "schema", "bucket", "prop", "prop_type", "value")

    val keyed = rows.select(
      shardOf(col("entity_id")).as("shard"),
      keyOf(lit(dataset), col("entity_id"), col("prop"), col("value")).as("id"),
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
      // an entity payload's property values are plain strings — no
      // per-value language exists on this path (the reference's explode
      // emits lang=None for the same reason); language-bearing rows
      // arrive only via the statements CSV/wire sources
      lit(null).cast("string").as("lang"),
      lit(false).as("external"),
      lit(now).as("first_seen"),
      lit(now).as("last_seen"),
      lit("").as("fragment"),
      lit(null).cast("timestamp").as("deleted_at"))

    // A10: trailing BASE_ID checksum row per entity, derived from the sorted
    // set of statement ids — order-independent, so safe to compute post-shuffle.
    val baseRows = keyed.groupBy(col("entity_id"), col("schema"), col("bucket"), col("shard"))
      .agg(checksumOf(first(col("schema")), sort_array(collect_set(col("id")))).as("value"))
      .select(
        col("shard"),
        keyOf(lit(dataset), col("entity_id"), lit(Statement.BaseId), col("value")).as("id"),
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
