package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Hashing

/** Deterministic mapping of the testdata `events` table into the statement
  * schema, so every statement-store operator (merge dedupe, entity
  * assembly, diffs, shard assignment) is exercisable against the DuckDB
  * oracle on driver-provided data.
  *
  * The mapping deliberately produces the interesting shapes:
  *   - content-hash ids collide for repeated (entity, prop, value) facts →
  *     the non-fragment dedupe branch has real work;
  *   - `last_seen` is truncated to the hour → supersession groups contain
  *     genuine ties at the group max (multi-valued props all survive);
  *   - a ~1% pseudo-random subset carries tombstones (`deleted_at`).
  *
  * `SQL` is the character-for-character DuckDB twin of this projection;
  * oracle queries embed it as a CTE. Keep both in sync when editing.
  */
object EventStatements {

  val Shards = 16

  def statements(events0: DataFrame): DataFrame = {
    // the content-hash projection is the expensive part; repartition first
    // so it parallelizes across cores even when the source is one file
    val events = events0.repartition(
      events0.sparkSession.sparkContext.defaultParallelism)
    val entityId = concat(lit("u"), col("user_id"))
    val valueS = col("value").cast(DecimalType(10, 2)).cast("string")
    val prop = col("event_type")
    val dataset = lit("events_ds")
    events.select(
      Hashing.shardOf(entityId, Shards).as("shard"),
      Hashing.statementKey(dataset, entityId, prop, valueS).as("id"),
      entityId.as("entity_id"),
      dataset.as("dataset"),
      when(prop.isin("click", "view"), "thing").otherwise("interval").as("bucket"),
      concat(lit("src"), pmod(col("event_id"), lit(2))).as("origin"),
      lit(null).cast("string").as("source"),
      lit("Event").as("schema"),
      prop.as("prop"),
      lit("number").as("prop_type"),
      valueS.as("value"),
      lit(null).cast("string").as("original_value"),
      lit(null).cast("string").as("lang"),
      lit(false).as("external"),
      col("ts").as("first_seen"),
      date_trunc("hour", col("ts")).as("last_seen"),
      when(pmod(col("event_id"), lit(97)) === 0,
        date_trunc("hour", col("ts")) + expr("INTERVAL 30 MINUTES"))
        .otherwise(lit(null).cast("timestamp")).as("deleted_at"),
      when(pmod(col("event_id"), lit(3)) === 0, lit(""))
        .otherwise(pmod(col("event_id"), lit(4)).cast("string")).as("fragment"))
  }

  /** DuckDB CTE body equivalent to [[statements]] over the `events` view. */
  val SQL: String =
    """SELECT
      |  printf('%01x', (('0x'||substr(md5('u'||user_id),1,8))::BIGINT % 16)) AS shard,
      |  md5('events_ds' || chr(31) || ('u'||user_id) || chr(31) || event_type || chr(31) || CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)) AS id,
      |  'u'||user_id AS entity_id,
      |  'events_ds' AS dataset,
      |  CASE WHEN event_type IN ('click','view') THEN 'thing' ELSE 'interval' END AS bucket,
      |  'src' || (event_id % 2) AS origin,
      |  CAST(NULL AS VARCHAR) AS source,
      |  'Event' AS "schema",
      |  event_type AS prop,
      |  'number' AS prop_type,
      |  CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR) AS value,
      |  CAST(NULL AS VARCHAR) AS original_value,
      |  CAST(NULL AS VARCHAR) AS lang,
      |  FALSE AS external,
      |  ts AS first_seen,
      |  date_trunc('hour', ts) AS last_seen,
      |  CASE WHEN event_id % 97 = 0 THEN date_trunc('hour', ts) + INTERVAL 30 MINUTE END AS deleted_at,
      |  CASE WHEN event_id % 3 = 0 THEN '' ELSE CAST(event_id % 4 AS VARCHAR) END AS fragment
      |FROM events""".stripMargin
}
