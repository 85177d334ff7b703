package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{FtmModel, Statement}

/** A4: entity assembly — fold a statement stream grouped by `entity_id`
  * into one entity document per entity (reference
  * logic/entities/aggregate.py:40-186; SURVEY.md §2.4 A4).
  *
  * Shape: typed `groupByKey(entity_id).mapGroups` — one shuffle on the
  * natural key, then a streaming per-group fold identical in spirit to the
  * reference's sorted single-pass accumulator. Per-entity statement counts
  * are bounded (an entity is a business object, not a fact stream), so a
  * group fits in task memory; the reference's accumulator has the same
  * envelope. Everything runs on executors — no driver participation.
  */
object EntityAssembly {

  /** The assembled entity document (reference EntityPayload). */
  case class EntityDoc(
      id: String,
      caption: String,
      schema: String,
      properties: Map[String, Seq[String]],
      referents: Seq[String],
      datasets: Seq[String],
      origins: Seq[String],
      first_seen: Timestamp,
      last_seen: Timestamp,
      last_change: Timestamp)

  // not `private`: the Catalyst-generated deserializer must access it
  case class StmtLite(
      canonical_id: String, entity_id: String, schema: String, prop: String,
      value: String, dataset: String, origin: String,
      first_seen: Timestamp, last_seen: Timestamp)

  def fold(canonicalId: String, stmts: Iterator[StmtLite],
      captionFor: String => Seq[String] = FtmModel.captionProps): EntityDoc = {
    val all = stmts.toVector
    val schema = FtmModel.mostSpecific(all.map(_.schema).toSet)
    val nonBase0 = all.filterNot(_.prop == Statement.BaseId)
    val nonBase = if (nonBase0.nonEmpty) nonBase0 else all
    val props = nonBase0.groupBy(_.prop).map { case (p, rows) =>
      p -> rows.map(_.value).distinct.sorted.toSeq
    }
    // first populated caption property wins; value pick is the sorted min
    // (reference aggregate.py:134-137: next(iter(sorted(values))))
    val caption = captionFor(schema).iterator
      .flatMap(p => props.get(p).flatMap(_.headOption))
      .nextOption().getOrElse(schema)
    // referents: source entity ids folded into this canonical entity
    // (reference aggregate.py:100-102 — ids differing from the group id)
    val referents = all.map(_.entity_id).distinct.filterNot(_ == canonicalId).sorted
    val baseRows = all.filter(_.prop == Statement.BaseId)
    val firstSeen = nonBase.map(_.first_seen).minBy(_.getTime)
    val lastSeen = nonBase.map(_.last_seen).maxBy(_.getTime)
    val lastChange =
      if (baseRows.nonEmpty) baseRows.map(_.first_seen).maxBy(_.getTime) else lastSeen
    EntityDoc(
      canonicalId, caption, schema, props,
      referents,
      all.map(_.dataset).distinct.sorted,
      all.map(_.origin).distinct.sorted,
      firstSeen, lastSeen, lastChange)
  }

  /** Assemble live statements (post-dedupe) into entity documents, grouped
    * by `canonical_id` when the view carries one (this store synthesizes
    * `canonical_id = entity_id`, so referents are empty unless an upstream
    * resolver rewrote the column — same contract as the reference).
    */
  def assemble(live: DataFrame,
      captionFor: String => Seq[String] = FtmModel.captionProps): Dataset[EntityDoc] = {
    val spark = live.sparkSession
    import spark.implicits._
    val canonical =
      if (live.columns.contains("canonical_id"))
        coalesce(col("canonical_id"), col("entity_id"))
      else col("entity_id")
    live.select(
      canonical.as("canonical_id"),
      col("entity_id"), col("schema"), col("prop"), col("value"),
      col("dataset"), col("origin"), col("first_seen"), col("last_seen"))
      .as[StmtLite]
      .groupByKey(_.canonical_id)
      .mapGroups((id, it) => fold(id, it, captionFor))
  }
}
