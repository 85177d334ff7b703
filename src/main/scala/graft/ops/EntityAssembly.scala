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
      entity_id: String, schema: String, prop: String, value: String,
      dataset: String, origin: String, first_seen: Timestamp, last_seen: Timestamp)

  def fold(entityId: String, stmts: Iterator[StmtLite]): EntityDoc = {
    val all = stmts.toVector
    val schema = FtmModel.mostSpecific(all.map(_.schema).toSet)
    val nonBase0 = all.filterNot(_.prop == Statement.BaseId)
    val nonBase = if (nonBase0.nonEmpty) nonBase0 else all
    val props = nonBase0.groupBy(_.prop).map { case (p, rows) =>
      p -> rows.map(_.value).distinct.sorted.toSeq
    }
    val caption = FtmModel.captionProps(schema).iterator
      .flatMap(p => props.get(p).flatMap(_.headOption))
      .nextOption().getOrElse(schema)
    val baseRows = all.filter(_.prop == Statement.BaseId)
    val firstSeen = nonBase.map(_.first_seen).minBy(_.getTime)
    val lastSeen = nonBase.map(_.last_seen).maxBy(_.getTime)
    val lastChange =
      if (baseRows.nonEmpty) baseRows.map(_.first_seen).maxBy(_.getTime) else lastSeen
    EntityDoc(
      entityId, caption, schema, props,
      Seq.empty,
      all.map(_.dataset).distinct.sorted,
      all.map(_.origin).distinct.sorted,
      firstSeen, lastSeen, lastChange)
  }

  /** Assemble live statements (post-dedupe) into entity documents. */
  def assemble(live: DataFrame): Dataset[EntityDoc] = {
    val spark = live.sparkSession
    import spark.implicits._
    live.select(
      col("entity_id"), col("schema"), col("prop"), col("value"),
      col("dataset"), col("origin"), col("first_seen"), col("last_seen"))
      .as[StmtLite]
      .groupByKey(_.entity_id)
      .mapGroups((id, it) => fold(id, it))
  }
}
