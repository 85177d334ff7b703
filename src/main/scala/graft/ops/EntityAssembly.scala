package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{FtmModel, Statement}

/** A4: entity assembly — fold a statement stream grouped by `entity_id`
  * into one entity document per entity (reference
  * logic/entities/aggregate.py:40-186; SURVEY.md §2.4 A4).
  *
  * Shape: TWO-PHASE fold. Phase 1 is a relational aggregation per
  * `(canonical_id, prop)` — value set, id/dataset/origin/schema sets,
  * first/last-seen extremes — all algebraic or set-union aggregates that
  * hash-aggregate with map-side partials and spill-capable sort
  * fallback. Phase 2 is a typed `groupByKey(canonical_id).mapGroups`
  * over the per-prop rows (#props rows per entity) that runs the
  * reference's document logic: most-specific schema, caption pick,
  * referents, BASE_ID timestamp rules.
  *
  * Why not one `mapGroups` on the raw statements: the reference's data
  * model makes mega-entities routine — `bucket=pages` carries one
  * statement per document page (docs/architecture.md:99,
  * logic/parquet.py:253), so a single entity can hold millions of
  * statement ROWS. A one-phase fold buffers all of them as JVM objects
  * in one task. The two-phase shape shuffles on `(entity, prop)` — a
  * pages mega-entity's heavy prop aggregates independently of its other
  * props — and phase 2's memory is the per-prop VALUE SETS, i.e. the
  * size of the entity document itself. That document-payload bound is
  * the reference's own envelope (its sorted single-pass accumulator,
  * aggregate.py:40-186, holds exactly the assembled payload), so any
  * entity the reference can assemble, this plan can — without the
  * raw-row multiplier. Everything runs on executors — no driver
  * participation.
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

  /** Phase-1 row: one prop of one entity, with its value set and the
    * group's provenance/timestamp aggregates. Not `private` for the same
    * encoder-access reason as [[StmtLite]].
    */
  case class PropAgg(
      canonical_id: String, prop: String,
      values: Seq[String], entity_ids: Seq[String], schemas: Seq[String],
      datasets: Seq[String], origins: Seq[String],
      min_fs: Timestamp, max_fs: Timestamp, max_ls: Timestamp)

  /** Reference-exact single-pass fold over raw statement rows — kept as
    * the semantics SPEC for [[foldProps]] (the spec suite proves the
    * two-phase plan equal to this on randomized inputs) and for callers
    * folding small in-memory groups.
    */
  def fold(canonicalId: String, stmts: Iterator[StmtLite],
      captionFor: String => Seq[String] = FtmModel.captionProps): EntityDoc = {
    val all = stmts.toVector
    val perProp = all.groupBy(_.prop).map { case (p, rows) =>
      PropAgg(canonicalId, p,
        rows.map(_.value).distinct,
        rows.map(_.entity_id).distinct,
        rows.map(_.schema).distinct,
        rows.map(_.dataset).distinct,
        rows.map(_.origin).distinct,
        rows.map(_.first_seen).minBy(_.getTime),
        rows.map(_.first_seen).maxBy(_.getTime),
        rows.map(_.last_seen).maxBy(_.getTime))
    }
    foldProps(canonicalId, perProp.iterator, captionFor)
  }

  /** Phase-2 document logic over one entity's per-prop aggregates
    * (reference aggregate.py:40-186 semantics, re-derived from per-prop
    * partials instead of raw rows — every rule below commutes with the
    * per-prop grouping because it only needs sets and min/max extremes).
    */
  def foldProps(canonicalId: String, perProp: Iterator[PropAgg],
      captionFor: String => Seq[String] = FtmModel.captionProps): EntityDoc = {
    val all = perProp.toVector
    val schema = FtmModel.mostSpecific(all.flatMap(_.schemas).toSet)
    val nonBase0 = all.filterNot(_.prop == Statement.BaseId)
    val nonBase = if (nonBase0.nonEmpty) nonBase0 else all
    val props = nonBase0.map { pa =>
      pa.prop -> pa.values.distinct.sorted.toSeq
    }.toMap
    // first populated caption property wins; value pick is the sorted min
    // (reference aggregate.py:134-137: next(iter(sorted(values))))
    val caption = captionFor(schema).iterator
      .flatMap(p => props.get(p).flatMap(_.headOption))
      .nextOption().getOrElse(schema)
    // referents: source entity ids folded into this canonical entity
    // (reference aggregate.py:100-102 — ids differing from the group id)
    val referents =
      all.flatMap(_.entity_ids).distinct.filterNot(_ == canonicalId).sorted
    val baseRows = all.filter(_.prop == Statement.BaseId)
    val firstSeen = nonBase.map(_.min_fs).minBy(_.getTime)
    val lastSeen = nonBase.map(_.max_ls).maxBy(_.getTime)
    val lastChange =
      if (baseRows.nonEmpty) baseRows.map(_.max_fs).maxBy(_.getTime) else lastSeen
    EntityDoc(
      canonicalId, caption, schema, props,
      referents,
      all.flatMap(_.datasets).distinct.sorted,
      all.flatMap(_.origins).distinct.sorted,
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
    // Phase 1: per-(entity, prop) aggregation. collect_set dedupes
    // map-side, so re-imported duplicates never cross the shuffle twice;
    // value ordering is NOT delegated to sort_array — phase 2 sorts in
    // Scala exactly as the one-phase fold did, so string ordering is
    // byte-for-byte the historical (JVM) one.
    live.select(
      canonical.as("canonical_id"),
      col("entity_id"), col("schema"), col("prop"), col("value"),
      col("dataset"), col("origin"), col("first_seen"), col("last_seen"))
      .groupBy(col("canonical_id"), col("prop"))
      .agg(
        collect_set(col("value")).as("values"),
        collect_set(col("entity_id")).as("entity_ids"),
        collect_set(col("schema")).as("schemas"),
        collect_set(col("dataset")).as("datasets"),
        collect_set(col("origin")).as("origins"),
        min(col("first_seen")).as("min_fs"),
        max(col("first_seen")).as("max_fs"),
        max(col("last_seen")).as("max_ls"))
      .as[PropAgg]
      // Phase 2: #props rows per entity, each carrying its value set —
      // group size is the entity DOCUMENT's size, the reference's own
      // assembly envelope (see class doc)
      .groupByKey(_.canonical_id)
      .mapGroups((id, it) => foldProps(id, it, captionFor))
  }
}
