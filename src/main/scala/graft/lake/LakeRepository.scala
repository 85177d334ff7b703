package graft.lake

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.FtmModel
import graft.ops.{Diff, EntityAssembly, Explode, Make, MergeDedupe, Stats}
import graft.query.FtmQuery

/** The reference's public repository surface in one facade (reference
  * EntityRepository, repository/entities/main.py): writes go through the
  * journal WAL and flush into the statement store; reads compile the
  * ftmq-style Query against the canonical live view and assemble entity
  * documents; deletes write tombstones whose `last_seen` bump at drain
  * time makes them win the merge tiebreak; maintenance and exports
  * delegate to [[graft.ops.Make]] / [[graft.ops.Diff]].
  *
  * A user of the reference maps their calls 1:1:
  * `writer.add_entity` → [[addEntities]], `flush` → [[flush]],
  * `query` → [[query]]/[[queryIds]], `delete_entity` → [[deleteEntity]],
  * `get_statistics` → [[statistics]], `optimize`/`make`/`export_diff` →
  * the synonymous methods.
  */
class LakeRepository(val spark: SparkSession, val rootStr: String,
    val dataset: String = "dataset", val shards: Int = 16) {

  val store = new StatementStore(spark, rootStr, shards)
  val journal = new Journal(spark, rootStr)

  private def nowTs(): Timestamp =
    // second truncation like the reference's pinned last_seen
    new Timestamp(System.currentTimeMillis() / 1000 * 1000)

  /** Import entity payloads (S12 explode + BASE_ID rows) into the journal;
    * drains automatically past the WAL threshold.
    */
  def addEntities(entities: Dataset[Explode.EntityPayload],
      origin: String = "default", now: Timestamp = nowTs()): Unit = {
    // origin is a partition value — boundary-validated like the
    // reference (util.py safe_name on every origin entry point)
    Catalog.safePathComponent(origin, "origin")
    journal.writeAutoFlush(
      Explode.explode(entities, dataset, origin, shards, now), store)
  }

  /** Drain the journal into the statement store. */
  def flush(): Long = journal.drain(store)

  /** [[flush]] plus the count of journal rows consumed (the figure the
    * HTTP entities/flush contract returns).
    */
  def flushCounted(): (Long, Long) = journal.drainCounted(store)

  /** Tombstone every live statement of an entity — stored AND still
    * staged in the journal (an unflushed re-import must not survive its
    * own delete). The journal drain bumps `last_seen = deleted_at` (F7)
    * so the tombstones shadow their rows through the next merge's grace
    * window.
    */
  def deleteEntity(entityId: String, now: Timestamp = nowTs()): Long = {
    // staged once: the tombstone set feeds both the returned count (the
    // API contract, reference entities_delete) and the journal write
    val tomb = graft.functions.F.materialize(
      store.raw.unionByName(journal.staged())
        .filter(col("entity_id") === entityId && col("deleted_at").isNull)
        .dropDuplicates("id", "fragment", "origin")
        .withColumn("deleted_at", lit(now)))
    val n = tomb.count()
    if (n > 0) journal.write(tomb)
    n
  }

  /** Canonical live view (A1 at read time — correct even before merge). */
  def live: DataFrame =
    MergeDedupe.live(store.raw).withColumn("canonical_id", col("entity_id"))

  /** J3 single-entity lookup: parquet ∪ unflushed journal with the
    * journal overriding per `(id, fragment, origin)` dedupe key
    * (reference repository/entities/main.py:483-527) — a writer sees its
    * own unflushed changes. The journal side gets the F7 tombstone bump
    * exactly as the drain would apply it, so an unflushed delete hides
    * the entity here too.
    */
  def getEntity(entityId: String): Option[EntityAssembly.EntityDoc] = {
    import org.apache.spark.sql.expressions.Window
    val fromStore = store.raw.filter(col("entity_id") === entityId)
      .withColumn("__prio", lit(0))
    val fromJournal = journal.staged().filter(col("entity_id") === entityId)
      .withColumn("last_seen", coalesce(col("deleted_at"), col("last_seen")))
      .withColumn("__prio", lit(1))
    val w = Window.partitionBy(col("id"), col("fragment"), col("origin"))
      .orderBy(col("__prio").desc, col("last_seen").desc)
    val overridden = fromStore.unionByName(fromJournal)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__prio")
    EntityAssembly.assemble(MergeDedupe.live(overridden))
      .collect().headOption
  }

  /** All statements of entities matching the query (reference statement
    * iteration). */
  def statements(q: FtmQuery.Query): DataFrame = FtmQuery.compile(q, live)

  /** Matching entity ids in query order, sliced (reference O4/O5 path). */
  def queryIds(q: FtmQuery.Query): DataFrame = FtmQuery.entityIds(q, live)

  /** Assembled entity documents for a query. Ordering/slicing semantics:
    * when the query sorts or slices, the id page is computed first
    * (distributed top-k), the assembly runs over that page only, and the
    * assembled docs are re-sorted on the page's carried keys — the
    * assembly fold shuffles on entity id, so the page's order would not
    * survive it otherwise. The re-sort is a distributed range sort over
    * an already-page-sized (or filter-scoped) set, never a driver-side
    * zip.
    */
  def query(q: FtmQuery.Query, flushFirst: Boolean = false): Dataset[EntityAssembly.EntityDoc] = {
    if (flushFirst) flush()
    val lv = live
    if (q.orderByProps.nonEmpty || q.limit.isDefined || q.offset > 0) {
      val (page0, sortCols) = FtmQuery.entityIdPage(q, lv)
      // the page feeds BOTH the assembly scope and the order re-join:
      // stage it once instead of recomputing the top-k twice
      val page = graft.functions.F.materialize(page0)
      val scope = lv.join(page.select("entity_id"), Seq("entity_id"), "left_semi")
      val docs = EntityAssembly.assemble(scope).toDF()
      val ordered = docs
        .join(page, docs("id") === page("entity_id"))
        .orderBy(sortCols: _*) // keys + id tiebreak resolve via the page side
        .select(docs.columns.map(docs(_)): _*)
      ordered.as[EntityAssembly.EntityDoc](
        org.apache.spark.sql.Encoders.product[EntityAssembly.EntityDoc])
    } else EntityAssembly.assemble(FtmQuery.compile(q, lv))
  }

  /** Exact entity count for a query (A5). */
  def count(q: FtmQuery.Query): Long =
    statements(q).agg(countDistinct(col("entity_id"))).collect()(0).getLong(0)

  /** Dataset statistics facets (A6). */
  def statistics: DataFrame = Stats.facets(live)

  def optimize(): Long = Make.optimize(store, journal)

  def make(outDir: String, force: Boolean = false,
      only: Option[String] = None): Seq[String] =
    Make.make(store, journal, outDir, datasetNameOpt = Some(dataset),
      force = force, only = only)

  def exportDiff(outDir: String): Option[String] = Diff.exportDiff(store, outDir)

  /** Cross-reference candidate pairs over the live view: entities sharing
    * at least `minShared` normalized values of the given identifying
    * properties ([[graft.ops.Xref]]).
    */
  def xrefCandidates(props: Seq[String],
      normalize: org.apache.spark.sql.Column => org.apache.spark.sql.Column = identity,
      maxBlock: Int = 100, minShared: Int = 2): DataFrame =
    graft.ops.Xref.fromLive(live, props, normalize, maxBlock, minShared)
}
