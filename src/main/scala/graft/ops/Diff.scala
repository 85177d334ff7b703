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

  /** Advance a diff's `{label}:{version}` state AND pin the recorded
    * version: the next diff's discovery reads the CDF between the two
    * manifests, and without the pin a routine optimize()'s vacuum
    * (keepVersions = 2, while one make cycle can commit 2+ versions)
    * expires the base manifest — silently degrading every subsequent
    * diff to the lossy clock-window fallback. The re-pin moves the
    * retention window forward with the state; the pin survives vacuum
    * by design (S7).
    */
  private def advanceState(store: StatementStore, key: String,
      pinName: String, label: String, v: Long): Unit = {
    store.tags.put(key, s"$label:$v")
    try store.pin(pinName, v)
    catch { case e: IllegalArgumentException =>
      // version already expired (shouldn't happen for the current
      // version, but a diff of a pinned historical read could race a
      // vacuum) — the next diff falls back to the clock window and logs
      System.err.println(s"[diff] could not pin v$v for $pinName: ${e.getMessage}")
    }
  }

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
    classifyIds(raw, changed, since)
  }

  /** [[classify]] with an EXPLICIT changed-id set — the version-exact
    * discovery path ([[graft.lake.StatementStore.cdfSince]]) supplies ids
    * from the manifests' file delta; `since` is used only to label ADD vs
    * MOD (an entity born before the window existed in a previous diff).
    */
  def classifyIds(raw: DataFrame, changed: DataFrame,
      since: Column): DataFrame = {
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
  private val StatePin = "diff-entities"
  private val DocStatePin = "diff-documents"

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
        // canonical read (A1 at read time), matching the incremental
        // branch: on an unmerged store the windowless live view still
        // carries superseded duplicate rows
        val d = Documents.documentsTable(store.canonical, publicUrlPrefix)
          .withColumn("op", lit("ADD"))
        Exports.singleFileCsv(d, dest, sortCol = "id")
        advanceState(store, DocStateKey, DocStatePin, label, v)
        Some(label)

      case Some(state) =>
        val Array(lastLabel, lastV) = state.split(":", 2)
        if (v <= lastV.toLong) return None
        val sinceTs = new java.sql.Timestamp(parseLabel(lastLabel))
        val since = lit(sinceTs)
        val raw = store.raw
        // changed document ids: contentHash statements whose physical
        // rows changed between the two manifest versions (reference
        // _get_changed_ids(prop="contentHash")) — version-exact CDF
        // discovery for the same reason as the entities diff (a
        // clock-window drops late-committed old-timestamp rows forever);
        // timestamp fallback only when vacuum expired lastV's manifest
        val changed = graft.functions.F.materialize(store.cdfSince(lastV.toLong)
          .getOrElse {
            System.err.println(s"[diff] manifest v$lastV vacuumed; " +
              "falling back to timestamp-window discovery for this diff")
            store.rawChangedSince(sinceTs)
              .filter(col("first_seen") >= since || col("deleted_at") >= since)
          }
          .filter(col("prop") === "contentHash" && col("schema").isin(docSchemas: _*))
          .select("entity_id").distinct())
        if (changed.isEmpty) {
          advanceState(store, DocStateKey, DocStatePin, label, v)
          return None
        }
        val scopedLive = MergeDedupe.live(
          raw.join(changed, Seq("entity_id"), "left_semi"))
        // folder-path resolution must see the FOLDER entities — the
        // changed-id scope contains only contentHash-bearing documents
        // (Folder is excluded from docSchemas), so without an explicit
        // folder source every ADD row's `path` would be null while the
        // full documents.csv export carries real paths
        val folderLive = MergeDedupe.live(raw.filter(col("schema") === "Folder"))
        val present = Documents.documentsTable(scopedLive, publicUrlPrefix,
          folderSource = Some(folderLive))
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
        advanceState(store, DocStateKey, DocStatePin, label, v)
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
        // initial diff: full entity export wrapped in ADD envelopes —
        // from the CANONICAL read, matching the incremental branch (the
        // windowless live view would ship superseded values when the
        // diff runs on an unmerged store; the incrementals would then
        // never correct entities that stop changing)
        val ents = EntityAssembly.assemble(store.canonical).toDF()
        writeDelta(entityFlat(ents, lit("ADD")), dir)
        advanceState(store, StateKey, StatePin, label, v)
        Some(label)

      case Some(state) =>
        val Array(lastLabel, lastV) = state.split(":", 2)
        if (v <= lastV.toLong) return None
        val sinceTs = new java.sql.Timestamp(parseLabel(lastLabel))
        val since = lit(sinceTs)
        val raw = store.raw
        // Discovery is VERSION-exact, not clock-windowed: entity ids from
        // the CDF between the two manifests (symmetric-difference files
        // only). A `first_seen >= since` window would permanently drop
        // rows committed after the last diff but carrying older
        // timestamps — a journal drained later, or client clock skew —
        // because the version gate advances while the row filter excludes
        // them from every future window. CDF discovery catches them (they
        // live in files added since lastV); identical rows in merge
        // rewrites cancel in the set difference, so the worst case is an
        // at-least-once MOD for an entity whose canonical content did not
        // change — never a lost change. `since` still labels ADD vs MOD.
        // Fallback: if vacuum expired lastV's manifest, use the
        // clock-window discovery (the pre-CDF behavior) rather than fail.
        val changedIds = store.cdfSince(lastV.toLong)
          .map(_.select("entity_id").distinct())
        val ops = graft.functions.F.materialize(changedIds match {
          case Some(ids) => classifyIds(raw, ids, since)
          case None =>
            System.err.println(s"[diff] manifest v$lastV vacuumed; " +
              "falling back to timestamp-window discovery for this diff")
            classify(raw, since, Some(store.rawChangedSince(sinceTs)))
        })
        if (ops.isEmpty) {
          advanceState(store, StateKey, StatePin, label, v)
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
        advanceState(store, StateKey, StatePin, label, v)
        Some(label)
    }
  }
}
