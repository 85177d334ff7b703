package graft.ops

import java.text.SimpleDateFormat
import java.util.TimeZone

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.lake.StatementStore

/** ST3: incremental diff export as a *stateful operation* (reference
  * repository/diff.py:66-145, repository/entities/main.py:541-599, envelope
  * format core/conventions/path.py:331-354).
  *
  * State is `{TS}:{version}` in the tag store. Each export:
  *  - no prior state → initial diff = full copy of the entity export with
  *    ADD envelopes;
  *  - table version unchanged since the state → no-op (None);
  *  - else: entities with statements changed since the state timestamp are
  *    canonicalized at read time (A3 — supersession and tombstones applied
  *    without requiring a merge), assembled, and written as
  *    `{"op":"ADD"|"MOD","entity":{...}}` lines; changed ids with no
  *    canonical live rows left become `{"op":"DEL","entity":{"id":...}}`.
  *
  * ADD vs MOD: an entity whose earliest `first_seen` predates the window
  * existed in a previous diff, so a change is a MOD; an entity whose every
  * statement is new to the window is an ADD. (Merge folds `first_seen` to
  * the group minimum precisely so re-imports keep their original birth
  * timestamp — the same property makes this classification stable.)
  *
  * Scale shape: classification is two aggregations and a semi-join over the
  * raw scan — the changed-id side is never collected or broadcast (after a
  * bulk re-import it can be the whole corpus); the envelope write is a
  * distributed range-partitioned JSON write sorted by entity id.
  */
object Diff {

  /** Reference TS_FORMAT: compact UTC `yyyyMMdd'T'HHmmss'Z'`. */
  private def fmt = {
    val f = new SimpleDateFormat("yyyyMMdd'T'HHmmss'Z'")
    f.setTimeZone(TimeZone.getTimeZone("UTC"))
    f
  }

  def tsLabel(ms: Long): String = fmt.format(new java.util.Date(ms))
  def parseLabel(label: String): Long = fmt.parse(label).getTime

  private val StateKey = "diffs/entities-current"

  /** Pure classification of changed entities against a watermark:
    * DEL when no canonical live rows remain, MOD when the entity predates
    * the window, ADD when it is entirely new. Returns (entity_id, op).
    *
    * `changedSource` narrows the changed-id DISCOVERY scan (pass the
    * store's zone-map-pruned `rawChangedSince` read — files committed
    * before the watermark are skipped entirely). The entity-scoped
    * semi-join below still runs against full `raw`, deliberately: a
    * changed entity's classification needs its complete history.
    */
  def classify(raw: DataFrame, since: Column,
      changedSource: Option[DataFrame] = None): DataFrame = {
    val changed = changedSource.getOrElse(raw)
      .filter(col("first_seen") >= since || col("deleted_at") >= since)
      .select("entity_id").distinct()
    val scoped = raw.join(changed, Seq("entity_id"), "left_semi")
    val stillLive = MergeDedupe.live(scoped)
      .select("entity_id").distinct().withColumn("__live", lit(1))
    // earliest observation per changed entity, from the pre-dedupe rows so
    // superseded duplicates still witness the entity's true birth
    val born = scoped.groupBy("entity_id").agg(min("first_seen").as("__born"))
    changed
      .join(stillLive, Seq("entity_id"), "left_outer")
      .join(born, Seq("entity_id"))
      .withColumn("op",
        when(col("__live").isNull, "DEL")
          .when(col("__born") < since, "MOD")
          .otherwise("ADD"))
      .select("entity_id", "op")
  }

  private val Iso = "yyyy-MM-dd'T'HH:mm:ss"

  /** Flat envelope columns → `{"op":..., "entity":{...}}` rows. Null entity
    * fields (the DEL case) are dropped by the JSON writer.
    */
  private def envelope(flat: DataFrame): DataFrame =
    flat.select(col("op"), struct(
      col("id"), col("caption"), col("schema"), col("properties"),
      col("referents"), col("datasets"), col("origins").as("origin"),
      col("first_seen"), col("last_seen"), col("last_change")).as("entity"))

  private def entityFlat(ents: DataFrame, op: Column): DataFrame =
    ents.select(
      op.as("op"), col("id"), col("caption"), col("schema"),
      col("properties"), col("referents"), col("datasets"), col("origins"),
      date_format(col("first_seen"), Iso).as("first_seen"),
      date_format(col("last_seen"), Iso).as("last_seen"),
      date_format(col("last_change"), Iso).as("last_change"))

  private def delFlat(ids: DataFrame): DataFrame =
    ids.select(
      lit("DEL").as("op"), col("entity_id").as("id"),
      lit(null).cast("string").as("caption"),
      lit(null).cast("string").as("schema"),
      lit(null).cast("map<string,array<string>>").as("properties"),
      lit(null).cast("array<string>").as("referents"),
      lit(null).cast("array<string>").as("datasets"),
      lit(null).cast("array<string>").as("origins"),
      lit(null).cast("string").as("first_seen"),
      lit(null).cast("string").as("last_seen"),
      lit(null).cast("string").as("last_change"))

  private def writeDelta(df: DataFrame, dir: String): Unit =
    envelope(df)
      .repartitionByRange(col("entity.id"))
      .sortWithinPartitions(col("entity.id"))
      .write.mode("overwrite").json(dir)

  private val DocStateKey = "diffs/documents-current"

  /** Documents diff (reference repository/documents.py:131-173): CSV rows
    * with an `op` column — ADD for documents whose `contentHash` changed
    * in the window and that still resolve to a live document, DEL for
    * changed ids with no document left. Initial run = full documents
    * table as ADD rows. Same `{ts}:{version}` state protocol as the
    * entities diff, under its own key.
    */
  def exportDocumentsDiff(store: StatementStore, outDir: String,
      publicUrlPrefix: Option[String] = None,
      nowMs: Long = System.currentTimeMillis()): Option[String] = {
    val v = store.version
    if (v < 0) return None
    val label = tsLabel(nowMs)
    val dest = s"$outDir/diffs/documents.csv/$label.diff.csv"
    val docSchemas = (graft.model.FtmModel.descendants("Document") - "Folder").toSeq

    store.tags.get(DocStateKey) match {
      case None =>
        val d = Documents.documentsTable(store.live, publicUrlPrefix)
          .withColumn("op", lit("ADD"))
        Exports.singleFileCsv(d, dest, sortCol = "id")
        store.tags.put(DocStateKey, s"$label:$v")
        Some(label)

      case Some(state) =>
        val Array(lastLabel, lastV) = state.split(":", 2)
        if (v <= lastV.toLong) return None
        val sinceTs = new java.sql.Timestamp(parseLabel(lastLabel))
        val since = lit(sinceTs)
        val raw = store.raw
        // changed document ids: contentHash statements touched in the
        // window (reference _get_changed_ids(prop="contentHash")) — the
        // discovery scan is zone-map-pruned to files committed since
        val changed = graft.functions.F.materialize(store.rawChangedSince(sinceTs)
          .filter((col("first_seen") >= since || col("deleted_at") >= since) &&
            col("prop") === "contentHash" && col("schema").isin(docSchemas: _*))
          .select("entity_id").distinct())
        if (changed.isEmpty) {
          store.tags.put(DocStateKey, s"$label:$v")
          return None
        }
        val scopedLive = MergeDedupe.live(
          raw.join(changed, Seq("entity_id"), "left_semi"))
        val present = Documents.documentsTable(scopedLive, publicUrlPrefix)
        val adds = present.withColumn("op", lit("ADD"))
        val dels = changed
          .join(present.select(col("id").as("entity_id")), Seq("entity_id"), "left_anti")
          .select(col("entity_id").as("id"),
            lit(null).cast("string").as("schema"),
            lit(null).cast("string").as("file_name"),
            lit(null).cast("string").as("mime_type"),
            lit(null).cast("string").as("size"),
            lit(null).cast("string").as("content_hash"),
            lit(null).cast("string").as("path"),
            lit(null).cast("string").as("public_url"),
            lit("DEL").as("op"))
        Exports.singleFileCsv(adds.unionByName(dels), dest, sortCol = "id")
        store.tags.put(DocStateKey, s"$label:$v")
        Some(label)
    }
  }

  /** Run one diff export against `outDir`. Returns the diff's timestamp
    * label, or None when there was nothing to do.
    */
  def exportDiff(store: StatementStore, outDir: String,
      nowMs: Long = System.currentTimeMillis()): Option[String] = {
    val v = store.version
    if (v < 0) return None
    val label = tsLabel(nowMs)
    val dir = s"$outDir/diffs/entities.ftm.json/$label.delta.json"

    store.tags.get(StateKey) match {
      case None =>
        // initial diff: full entity export wrapped in ADD envelopes
        val ents = EntityAssembly.assemble(store.live).toDF()
        writeDelta(entityFlat(ents, lit("ADD")), dir)
        store.tags.put(StateKey, s"$label:$v")
        Some(label)

      case Some(state) =>
        val Array(lastLabel, lastV) = state.split(":", 2)
        if (v <= lastV.toLong) return None
        val sinceTs = new java.sql.Timestamp(parseLabel(lastLabel))
        val since = lit(sinceTs)
        val raw = store.raw
        val ops = graft.functions.F.materialize(
          classify(raw, since, Some(store.rawChangedSince(sinceTs))))
        if (ops.isEmpty) {
          store.tags.put(StateKey, s"$label:$v")
          return None
        }
        val liveChanged = MergeDedupe.live(
          raw.join(ops.filter(col("op") =!= "DEL").select("entity_id"),
            Seq("entity_id"), "left_semi"))
        val ents = EntityAssembly.assemble(liveChanged).toDF()
          .join(ops.withColumnRenamed("entity_id", "id"), Seq("id"))
        val flat = entityFlat(ents, col("op"))
          .unionByName(delFlat(ops.filter(col("op") === "DEL")))
        writeDelta(flat, dir)
        store.tags.put(StateKey, s"$label:$v")
        Some(label)
    }
  }
}
