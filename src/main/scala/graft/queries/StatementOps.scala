package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{F, Hashing}
import graft.lake.EventStatements
import graft.ops.MergeDedupe

/** Statement-store operators (SURVEY.md §2.4-2.8) exercised over the
  * deterministic events→statements mapping, each with a DuckDB oracle that
  * replays the identical semantics in SQL.
  */
object StatementOps {

  // The statement table is staged once per (session, sf-dir) and read
  // back from parquet by every query: in a real deployment statements
  // are physically stored (the table IS the store) — the events→
  // statements projection is this harness's import step, so paying its
  // content-hash cost once per session mirrors production, where reads
  // hit the parquet layout, not the import pipeline.
  private val stagedStmts =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def stmts(spark: SparkSession, dir: String): DataFrame =
    stagedStmts.computeIfAbsent((spark, dir),
      { case (s, d) => F.materialize(EventStatements.statements(Tables.events(s, d))) })

  // The canonical (merged) live view is likewise staged once per (session,
  // sf-dir): `StatementStore.merge` physically rewrites merged rows (the
  // s3 query exercises that path end to end), so production reads hit
  // merged parquet — they never re-run the merge windows per query.
  // Queries that demonstrate the merge operator itself (a1, a3, s3, st4)
  // still compute it from raw statements.
  private val stagedLive =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** The merged live view as a reader sees it: staged merge output. */
  def liveView(spark: SparkSession, dir: String): DataFrame =
    stagedLive.computeIfAbsent((spark, dir),
      { case (s, d) => F.materialize(MergeDedupe.live(stmts(s, d))) })

  private val watermark = "2024-01-30 12:00:00"

  /** Shared oracle prelude: the statement mapping plus the two-branch merge
    * (twin of [[MergeDedupe.canonicalize]]) and the live tombstone filter.
    * `mergeBody` assumes a CTE named `stmts` is already in scope.
    */
  private val mergeBody: String =
    s"""nf AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY shard,bucket,origin,id
       |      ORDER BY last_seen DESC, deleted_at DESC NULLS LAST, value ASC, lang ASC NULLS FIRST, original_value ASC NULLS FIRST) AS rn,
       |    MIN(first_seen) OVER (PARTITION BY shard,bucket,origin,id) AS min_fs
       |  FROM stmts WHERE fragment = ''),
       |fr AS (
       |  SELECT *,
       |    MAX(last_seen) OVER (PARTITION BY shard,bucket,origin,entity_id,prop,fragment) AS max_ls,
       |    MIN(first_seen) OVER (PARTITION BY shard,bucket,origin,entity_id,prop,fragment) AS min_fs,
       |    ROW_NUMBER() OVER (PARTITION BY shard,bucket,origin,entity_id,prop,fragment,id
       |      ORDER BY last_seen DESC, deleted_at DESC NULLS LAST, value ASC, lang ASC NULLS FIRST, original_value ASC NULLS FIRST) AS rn
       |  FROM stmts WHERE fragment <> ''),
       |merged AS (
       |  SELECT shard,bucket,origin,id,entity_id,"schema",prop,prop_type,fragment,value,min_fs AS first_seen,last_seen,deleted_at
       |  FROM nf WHERE rn = 1
       |  UNION ALL
       |  SELECT shard,bucket,origin,id,entity_id,"schema",prop,prop_type,fragment,value,min_fs,last_seen,deleted_at
       |  FROM fr WHERE rn = 1 AND last_seen = max_ls),
       |live AS (SELECT * FROM merged WHERE deleted_at IS NULL)""".stripMargin

  private val mergeCte: String =
    s"WITH stmts AS (${EventStatements.SQL}),\n$mergeBody"

  private val stmtOutCols =
    Seq("entity_id", "prop", "fragment", "id", "origin", "value")

  private def stmtOut(df: DataFrame): DataFrame =
    df.select(
      col("entity_id"), col("prop"), col("fragment"), col("id"),
      col("origin"), col("value"),
      F.epochMs(col("first_seen")).as("first_ms"),
      F.epochMs(col("last_seen")).as("last_ms"))
      .orderBy(stmtOutCols.map(col): _*)

  private val stmtOutSql =
    """SELECT entity_id, prop, fragment, id, origin, value,
      |  epoch_ms(first_seen) AS first_ms, epoch_ms(last_seen) AS last_ms
      |FROM live ORDER BY entity_id, prop, fragment, id, origin""".stripMargin

  // A1: the core two-branch merge dedupe, read as the live view.
  def a1MergeDedupe(spark: SparkSession, dir: String): DataFrame =
    stmtOut(MergeDedupe.live(stmts(spark, dir)))

  // A3: read-time canonicalization scoped to changed entities (J1 semi-join
  // + A1), so incremental diffs see post-merge rows without a rewrite.
  def a3ChangedCanonical(spark: SparkSession, dir: String): DataFrame =
    stmtOut(MergeDedupe.changedCanonical(
      stmts(spark, dir), lit(watermark).cast("timestamp")))

  // A4: entity assembly — one row per entity with deterministic flattened
  // properties (sorted "prop=value" pairs), origin set, and lifecycle range.
  def a4EntityAssembly(spark: SparkSession, dir: String): DataFrame =
    liveView(spark, dir)
      .groupBy(col("entity_id"))
      .agg(
        first(col("schema")).as("schema"),
        min(when(col("prop") === "name", col("value"))).as("__cap"),
        array_join(sort_array(collect_set(concat(col("prop"), lit("="), col("value")))), "|").as("props"),
        countDistinct(col("prop")).as("n_props"),
        array_join(sort_array(collect_set(col("origin"))), "|").as("origins"),
        F.epochMs(min(col("first_seen"))).as("first_ms"),
        F.epochMs(max(col("last_seen"))).as("last_ms"))
      // caption: first populated caption prop (Event declares `name`),
      // else the schema label — reference aggregate.py:134-137
      .withColumn("caption", coalesce(col("__cap"), col("schema")))
      .drop("__cap")
      .orderBy(col("entity_id"))

  // A4 canonical-grain twin: statements regrouped under a synthetic
  // canonical_id (a resolver decision folding ~3 source entities into one)
  // so `referents` and the caption pick have real work — the mechanism the
  // reference exposes when canonical_id != entity_id (aggregate.py:100-102).
  def a4bAssemblyCanonical(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.EntityAssembly
    val live = liveView(spark, dir)
      .withColumn("canonical_id",
        concat(lit("g"), pmod(substring(col("entity_id"), 2, 100).cast("long"), lit(50))))
    EntityAssembly.assemble(live, _ => Seq("click", "view")).toDF()
      .select(
        col("id"), col("caption"), col("schema"),
        array_join(col("referents"), "|").as("referents"),
        array_join(col("origins"), "|").as("origins"),
        F.epochMs(col("first_seen")).as("first_ms"),
        F.epochMs(col("last_seen")).as("last_ms"))
      .orderBy(col("id"))
  }

  // A5: exact entity count for a compiled query.
  def a5CountEntities(spark: SparkSession, dir: String): DataFrame =
    liveView(spark, dir)
      .agg(countDistinct(col("entity_id")).as("entity_count"))

  // A6: dataset statistics — per-bucket schema facets + country facets.
  def a6Stats(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.facets(liveView(spark, dir))
      .orderBy(col("facet"), col("key"))

  // A7: partition enumeration.
  def a7DistinctPartitions(spark: SparkSession, dir: String): DataFrame =
    stmts(spark, dir).select(col("shard"), col("bucket"), col("origin"))
      .distinct().orderBy(col("shard"), col("bucket"), col("origin"))

  // A10/F3: per-entity checksum over the sorted set of statement ids.
  def a10Checksum(spark: SparkSession, dir: String): DataFrame =
    liveView(spark, dir)
      .groupBy(col("entity_id"))
      .agg(Hashing.entityChecksum(
        first(col("schema")), sort_array(collect_set(col("id")))).as("checksum"))
      .orderBy(col("entity_id"))

  // F1: shard assignment parity (the layout-defining hash).
  def f1ShardAssign(spark: SparkSession, dir: String): DataFrame =
    stmts(spark, dir).select(col("entity_id"), col("shard"))
      .distinct().orderBy(col("entity_id"))

  // F6: statement pack/unpack round trip on the journal wire format.
  def f6PackUnpack(spark: SparkSession, dir: String): DataFrame = {
    val sep = Hashing.Sep
    val packed = stmts(spark, dir)
      .withColumn("pack", concat_ws(sep,
        col("id"), col("entity_id"), col("prop"), col("value"), col("fragment"), col("origin")))
    packed.select(
      col("id"), col("entity_id"), col("prop"), col("fragment"), col("origin"),
      md5(col("pack")).as("pack_md5"),
      split(col("pack"), sep).getItem(3).as("unpacked_value"))
      .distinct()
      .orderBy(col("id"), col("entity_id"), col("prop"), col("fragment"), col("origin"))
  }

  // F7: tombstone last_seen bump — a delete must win the A1 tiebreak.
  def f7TombstoneBump(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      F.epochMs(coalesce(
        when(pmod(col("event_id"), lit(97)) === 0, col("ts") + expr("INTERVAL 1 HOUR")),
        col("ts"))).as("effective_ls"))
      .orderBy(col("event_id"))

  // F4: namespace strip over synthesized `id.sig` shapes, covering the
  // edge cases (no dot, leading dot, trailing dot, multi-dot).
  def f4NamespaceStrip(spark: SparkSession, dir: String): DataFrame = {
    val raw = when(pmod(col("event_id"), lit(4)) === 0, concat(lit("u"), col("user_id")))
      .when(pmod(col("event_id"), lit(4)) === 1,
        concat(lit("u"), col("user_id"), lit("."),
          substring(md5(col("event_id").cast("string")), 1, 8)))
      .when(pmod(col("event_id"), lit(4)) === 2, concat(lit(".u"), col("user_id")))
      .otherwise(concat(lit("u"), col("user_id"), lit(".")))
    Tables.events(spark, dir).select(
      col("event_id"), raw.as("raw_id"), F.stripNamespace(raw).as("entity_id"))
      .orderBy(col("event_id"))
  }

  // F10: mimetype → document schema routing at statement volume.
  def f10MimeSchema(spark: SparkSession, dir: String): DataFrame = {
    val mimes = array(Seq("application/pdf", "text/plain", "text/html",
      "text/csv", "image/png", "audio/mpeg", "video/mp4", "message/rfc822",
      "application/octet-stream", "inode/directory").map(lit): _*)
    val mime = element_at(mimes, (pmod(col("event_id"), lit(10)) + 1).cast("int"))
    // two-step projection: the mime expression feeds the 10-branch routing
    // CASE — computed once per row here, instead of being re-inlined into
    // every branch (CollapseProject keeps the split: the producing
    // expression is non-cheap and multiply-referenced)
    Tables.events(spark, dir)
      .select(col("event_id"), mime.as("mime"))
      .select(col("event_id"), col("mime"),
        graft.model.FtmModel.schemaForMimeCol(col("mime")).as("doc_schema"))
      .orderBy(col("event_id"))
  }

  // ST3/F13: incremental diff ops — changed entities classified ADD (still
  // live) vs DEL (no live rows remain), with JSON envelopes. The DEL
  // detection is the set-difference: changed minus still-live.
  def st3DiffOps(spark: SparkSession, dir: String): DataFrame = {
    val s = stmts(spark, dir)
    val changed = s
      .filter(col("first_seen") >= lit(watermark).cast("timestamp") ||
        col("deleted_at") >= lit(watermark).cast("timestamp"))
      .select("entity_id").distinct()
    val stillLive = liveView(spark, dir).select("entity_id").distinct()
      .withColumn("__live", lit(1))
    changed.join(stillLive, Seq("entity_id"), "left_outer")
      .withColumn("op", when(col("__live").isNotNull, "ADD").otherwise("DEL"))
      .select(col("entity_id"), col("op"),
        concat(lit("{\"op\":\""), col("op"), lit("\",\"id\":\""), col("entity_id"), lit("\"}")).as("envelope"))
      .orderBy(col("entity_id"))
  }

  // ST3 stateful half: the ADD/MOD/DEL classification the diff operation
  // writes as envelopes — DEL when canonicalization leaves no live rows,
  // MOD when the entity predates the window, ADD when entirely new.
  def st4DiffClassify(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Diff.classify(stmts(spark, dir), lit(watermark).cast("timestamp"))
      .orderBy(col("entity_id"))

  // S3/S5/A2 end to end through the physical store: partitioned append into
  // a manifest-versioned table, merge rewrite (fragment supersession +
  // tombstone reap), snapshot read-back. The merged table must read back
  // exactly what read-time canonicalization (a1) computes — same oracle.
  def s3StoreRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // build the roundtrip store under the session stage root (tmpfs in
    // local mode — same medium the shuffle uses; a cluster override lands
    // on the shared FS), not java.io.tmpdir
    val tmp = F.stageTempPath(spark, "e2e")
    val store = new graft.lake.StatementStore(spark, tmp, EventStatements.Shards)
    store.append(stmts(spark, dir))
    store.merge()
    stmtOut(store.raw)
  }

  // TT1: time-travel — a version-pinned read must keep returning the
  // OLD snapshot after later appends and merges land (the reader-pinning
  // contract vacuum's keepVersions protects, here exercised through the
  // correctness gate, not just a spec): build v1 from half the
  // statements, advance the store with the other half, read at v1.
  // the two-version store is staged once per (session, sf-dir) — building
  // it is the import step (same precedent as c1's two-dataset lake); the
  // operator under test is the version-pinned READ
  // weak-keyed session cache — see graft.functions.SessionScoped scaladoc
  private val stagedTT = new graft.functions.SessionScoped[(String, Long)]

  private def buildTT(spark: SparkSession, dir: String): (String, Long) = {
    val tmp = F.stageTempPath(spark, "tt")
    val store = new graft.lake.StatementStore(spark, tmp, EventStatements.Shards)
    val st = stmts(spark, dir)
    val half = pmod(substring(col("entity_id"), 2, 100).cast("long"), lit(2))
    store.append(st.filter(half === 0))
    val v = store.merge()
    store.append(st.filter(half === 1))
    store.merge()
    (tmp, v)
  }

  def tt1TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val (root, v1) = stagedTT.getOrCompute(spark, dir)(buildTT(spark, dir))
    stmtOut(new graft.lake.StatementStore(spark, root, EventStatements.Shards).rawAt(v1))
  }

  /** TT2: version DRIFT report — per-(schema, prop) facet counts at an
    * old snapshot vs head, with deltas: the "what changed between v3 and
    * v7" summary an operator reads before trusting a release (the
    * aggregate companion of cdf1's row-level feed). Two snapshot scans +
    * one map-side-combinable facet aggregate each + a full-outer join on
    * the (small) facet key space — never a row-level diff.
    */
  def tt2VersionDrift(spark: SparkSession, dir: String): DataFrame = {
    val (root, v1) = stagedTT.getOrCompute(spark, dir)(buildTT(spark, dir))
    val store = new graft.lake.StatementStore(spark, root, EventStatements.Shards)
    def facets(df: DataFrame) = df.filter(col("deleted_at").isNull)
      .groupBy(col("schema"), col("prop"))
      .agg(count(lit(1)).as("n"), countDistinct(col("entity_id")).as("ne"))
    val f1 = facets(store.rawAt(v1)).select(col("schema"), col("prop"),
      col("n").as("n_from"), col("ne").as("entities_from"))
    val f2 = facets(store.raw).select(col("schema"), col("prop"),
      col("n").as("n_to"), col("ne").as("entities_to"))
    f1.join(f2, Seq("schema", "prop"), "full_outer")
      .select(col("schema"), col("prop"),
        coalesce(col("n_from"), lit(0L)).as("n_from"),
        coalesce(col("n_to"), lit(0L)).as("n_to"),
        (coalesce(col("n_to"), lit(0L)) - coalesce(col("n_from"), lit(0L)))
          .as("n_delta"),
        coalesce(col("entities_from"), lit(0L)).as("entities_from"),
        coalesce(col("entities_to"), lit(0L)).as("entities_to"))
      .orderBy(col("schema"), col("prop"))
  }

  // CDF1: change data feed between the staged two-version store's first
  // snapshot and its head — row-level ADD/DEL computed from the
  // manifests' symmetric-difference files only (StatementStore.cdf).
  // The oracle recomputes both snapshots' merge output in SQL and takes
  // the two-way EXCEPT — equality proves the file-pruned diff is exact.
  def cdf1VersionDiff(spark: SparkSession, dir: String): DataFrame = {
    val (root, v1) = stagedTT.getOrCompute(spark, dir)(buildTT(spark, dir))
    val store = new graft.lake.StatementStore(spark, root, EventStatements.Shards)
    store.cdf(v1, store.version)
      .select(col("op"), col("entity_id"), col("prop"), col("fragment"),
        col("id"), col("origin"), col("value"),
        F.epochMs(col("first_seen")).as("first_ms"),
        F.epochMs(col("last_seen")).as("last_ms"))
      .orderBy(col("op"), col("entity_id"), col("prop"), col("fragment"),
        col("id"), col("origin"), col("value"))
  }

  // Multi-dataset catalog end to end (reference catalog.py): two datasets
  // created under one lake root via ensureDataset, each holding a
  // deterministic half of the statement table; the catalog enumerates
  // them and aggregates per-dataset statistics from each store's
  // snapshot. The catalog surface itself is driver metadata — the only
  // distributed work is the per-dataset count aggregation.
  // the two-dataset lake is staged once per (session, sf-dir), like the
  // statement table: building the stores is the import step, the catalog
  // operations under test are enumeration + per-dataset aggregation
  // weak session key (SessionScoped) for the same no-pinning reason as
  // stagedTT; path values don't reference the session
  private val stagedLake = new graft.functions.SessionScoped[String]

  def c1CatalogStats(spark: SparkSession, dir: String): DataFrame = {
    val lakeRoot = stagedLake.getOrCompute(spark, dir) {
      val s = spark
      val d = dir
      val root = F.stageTempPath(s, "lake")
      val cat = new graft.lake.Catalog(s, root)
      val st = stmts(s, d)
      val half = pmod(substring(col("entity_id"), 2, 100).cast("long"), lit(2))
      cat.ensureDataset("alpha", shards = EventStatements.Shards)
      cat.ensureDataset("beta", shards = EventStatements.Shards)
      cat.store("alpha").append(st.filter(half === 0))
      cat.store("beta").append(st.filter(half === 1))
      cat.writeIndex()
      root
    }
    val cat = new graft.lake.Catalog(spark, lakeRoot)
    // enumerate through the catalog (not the names we just used) so the
    // listing itself is on the verified path
    cat.listDatasets()
      .map(name => cat.store(name).raw.withColumn("dataset", lit(name)))
      .reduce(_.unionByName(_))
      .groupBy(col("dataset"))
      .agg(countDistinct(col("id")).as("n_statements"),
        countDistinct(col("entity_id")).as("n_entities"))
      .orderBy(col("dataset"))
  }

  // O5: entity ordering by a property value — per-entity sort key via
  // aggregation, then global top-k on (key, id).
  def o5OrderByProp(spark: SparkSession, dir: String): DataFrame = {
    // the canonicalized view feeds both the sort-key aggregate and the
    // entity enumeration — the session-staged merge output serves both
    val live = liveView(spark, dir)
    val keys = live.filter(col("prop") === "click")
      .groupBy(col("entity_id")).agg(min(col("value")).as("sort_key"))
    live.select("entity_id").distinct()
      .join(keys, Seq("entity_id"), "left_outer")
      .orderBy(col("sort_key").asc_nulls_last, col("entity_id"))
      .limit(50)
  }

  // O5b: keyset pagination over the property ordering — "the page after
  // cursor (sort_key, entity_id)" as a seek predicate + top-k, never
  // OFFSET (which scans and discards every earlier row; at 100 TB page N
  // costs N pages). The tuple predicate is sargable, and the limit plans
  // as TakeOrderedAndProject — per-partition heaps, no global sort.
  def o6KeysetPage(spark: SparkSession, dir: String): DataFrame = {
    val live = liveView(spark, dir)
    val keys = live.filter(col("prop") === "click")
      .groupBy(col("entity_id")).agg(min(col("value")).as("sort_key"))
    keys.filter(col("sort_key") > lit("20") ||
        (col("sort_key") === lit("20") && col("entity_id") > lit("u0100")))
      .orderBy(col("sort_key"), col("entity_id"))
      .limit(25)
  }

  // P1/P5/J2: the ftmq-style Query AST compiled against the live view —
  // statement-grain origin/prop filters plus an entity-grain property
  // predicate that semi-joins back to ALL statements of matching entities.
  def p1QueryCompile(spark: SparkSession, dir: String): DataFrame = {
    import graft.query.FtmQuery
    import graft.query.FtmQuery._
    // the canonicalized live view feeds the statement-filter chain AND the
    // entity-grain prop-filter subquery — the session-staged merge output
    // serves both without re-running the dedupe windows
    val live = liveView(spark, dir)
    val q = Query(
      origin = Some("src0"),
      statementFilters = Seq(M("prop", InOp, Seq("click", "view", "purchase"))),
      propFilters = Seq(P("click", GteOp, Seq("50"))))
    FtmQuery.compile(q, live)
      .select(col("entity_id"), col("prop"), col("value"), col("origin"), col("fragment"), col("id"))
      .orderBy(col("entity_id"), col("prop"), col("value"), col("fragment"), col("id"))
  }

  // J4: parent-chain path resolution to the root via iterative self-join
  // (region <- nation <- customer plays the folder hierarchy).
  def j4ParentChain(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).select(
      concat(lit("r"), col("r_regionkey")).as("id"),
      col("r_name").as("name"), lit("").as("parent"))
    val n = Tables.nation(spark, dir).select(
      concat(lit("n"), col("n_nationkey")).as("id"),
      col("n_name").as("name"), concat(lit("r"), col("n_regionkey")).as("parent"))
    val c = Tables.customer(spark, dir).select(
      concat(lit("c"), col("c_custkey")).as("id"),
      col("c_name").as("name"), concat(lit("n"), col("c_nationkey")).as("parent"))
    graft.ops.Documents.resolvePaths(r.unionByName(n).unionByName(c))
      .orderBy(col("id"))
  }

  // X1: cross-reference candidate generation — the entity-resolution
  // primitive downstream of every FtM lake (Aleph xref): entities that
  // share identifying property values become match candidates, scored by
  // how many (prop, value) keys they share. Same scale shape as LSH
  // banding: ONE shuffle on the (prop, value) blocking key, in-task pair
  // loop per block, and blocks shared by more than `maxBlock` entities
  // carry no discriminating signal and are dropped — the pair space stays
  // block-bounded, never quadratic in the corpus.
  def x1XrefCandidates(spark: SparkSession, dir: String): DataFrame =
    // normalized identifier: the integer bucket of the numeric value —
    // the stand-in for real xref's name/identifier normalization step
    graft.ops.Xref.fromLive(liveView(spark, dir), Seq("click", "view"),
      v => floor(v.cast("decimal(10,2)")).cast("long"),
      maxBlock = 100, minShared = 5)
      .orderBy(col("id_a"), col("id_b"))

  // Xref candidate scoring: key-set Jaccard over the normalized blocking
  // keys — the overlap ranking real xref applies to candidates before the
  // expensive per-pair comparison stage.
  def x2XrefScores(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Xref.scoredFromLive(liveView(spark, dir), Seq("click", "view"),
      v => floor(v.cast("decimal(10,2)")).cast("long"),
      maxBlock = 100, minShared = 5)
      .orderBy(col("id_a"), col("id_b"))

  // X3: incremental xref — the nightly-delta recompute over dirty blocks
  // only. The oracle is deliberately the OTHER algorithm: a full x2-style
  // recompute filtered to pairs touching a changed entity — passing means
  // the dirty-block shortcut is exactly equivalent on touched pairs.
  def x3XrefIncremental(spark: SparkSession, dir: String): DataFrame = {
    val live = liveView(spark, dir)
    val changed = live
      .filter(col("last_seen") >= lit("2024-01-30 21:00:00").cast("timestamp"))
      .select(col("entity_id")).distinct()
    graft.ops.Xref.incrementalScoredFromLive(live, changed, Seq("click", "view"),
      v => floor(v.cast("decimal(10,2)")).cast("long"),
      maxBlock = 100, minShared = 5)
      .orderBy(col("id_a"), col("id_b"))
  }

  // SRCH2: ranked retrieval composed with the FtM surface — BM25 over the
  // bodyText statements of the DOCUMENT lake's live view (the documents
  // table mapped to PlainText entities, ~1% tombstoned). Tombstoned
  // entities must be absent from the ranking purely by virtue of the live
  // filter — search-over-the-lake, not search-over-raw-parquet.
  // same per-(session, dir) staging pattern (and caveat) as stagedStmts:
  // a DataFrame value strongly references its session, so the weak-keyed
  // SessionScoped cache is NOT usable here
  private val stagedDocLive =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def docLiveView(spark: SparkSession, dir: String): DataFrame =
    stagedDocLive.computeIfAbsent((spark, dir),
      { case (s, d) => F.materialize(MergeDedupe.live(
          graft.lake.DocumentStatements.statements(Tables(s, d, "documents")))) })

  def srch2EntitySearch(spark: SparkSession, dir: String): DataFrame =
    graft.text.Search.fromLive(docLiveView(spark, dir), "bodyText",
      Seq("spark", "vector", "customer"), k = 20)

  // Set difference: entities appearing in the thing bucket but never in the
  // interval bucket (reference's DEL-detection shape, §2.7).
  // Set intersection: values present in BOTH buckets (§2.7's other
  // direction — Spark plans a left-semi over distinct, same as EXCEPT's
  // anti shape).
  def set2Intersect(spark: SparkSession, dir: String): DataFrame = {
    val s = stmts(spark, dir)
    s.filter(col("prop") === "click").select("value")
      .intersect(s.filter(col("prop") === "view").select("value"))
      .orderBy(col("value"))
  }

  def set1Except(spark: SparkSession, dir: String): DataFrame = {
    val s = stmts(spark, dir)
    s.filter(col("prop") === "click").select("value")
      .except(s.filter(col("prop") === "purchase").select("value"))
      .orderBy(col("value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_merge_dedupe" -> (a1MergeDedupe _),
    "s3_store_roundtrip" -> (s3StoreRoundtrip _),
    "tt1_time_travel" -> (tt1TimeTravel _),
    "tt2_version_drift" -> (tt2VersionDrift _),
    "cdf1_version_diff" -> (cdf1VersionDiff _),
    "c1_catalog_stats" -> (c1CatalogStats _),
    "a3_changed_canonical" -> (a3ChangedCanonical _),
    "a4_entity_assembly" -> (a4EntityAssembly _),
    "a4b_assembly_canonical" -> (a4bAssemblyCanonical _),
    "a5_count_entities" -> (a5CountEntities _),
    "a6_stats" -> (a6Stats _),
    "a7_distinct_partitions" -> (a7DistinctPartitions _),
    "a10_checksum" -> (a10Checksum _),
    "f1_shard_assign" -> (f1ShardAssign _),
    "f6_pack_unpack" -> (f6PackUnpack _),
    "f7_tombstone_bump" -> (f7TombstoneBump _),
    "f4_namespace_strip" -> (f4NamespaceStrip _),
    "f10_mime_schema" -> (f10MimeSchema _),
    "st3_diff_ops" -> (st3DiffOps _),
    "st4_diff_classify" -> (st4DiffClassify _),
    "o5_order_by_prop" -> (o5OrderByProp _),
    "o6_keyset_page" -> (o6KeysetPage _),
    "j4_parent_chain" -> (j4ParentChain _),
    "p1_query_compile" -> (p1QueryCompile _),
    "set1_except" -> (set1Except _),
    "set2_intersect" -> (set2Intersect _),
    "srch2_entity_search" -> (srch2EntitySearch _),
    "x1_xref_candidates" -> (x1XrefCandidates _),
    "x2_xref_scores" -> (x2XrefScores _),
    "x3_xref_incremental" -> (x3XrefIncremental _))

  val oracle: Map[String, String] = Map(
    "a1_merge_dedupe" -> s"$mergeCte\n$stmtOutSql",
    "s3_store_roundtrip" -> s"$mergeCte\n$stmtOutSql",
    "tt1_time_travel" ->
      s"""WITH stmts0 AS (${EventStatements.SQL}),
         |stmts AS (SELECT * FROM stmts0
         |  WHERE CAST(substr(entity_id, 2) AS BIGINT) % 2 = 0),
         |$mergeBody
         |$stmtOutSql""".stripMargin,
    "tt2_version_drift" ->
      s"""WITH snap1 AS (
         |  SELECT * FROM (
         |    WITH stmts0 AS (${EventStatements.SQL}),
         |    stmts AS (SELECT * FROM stmts0
         |      WHERE CAST(substr(entity_id, 2) AS BIGINT) % 2 = 0),
         |    $mergeBody
         |    SELECT "schema" AS sch, prop, entity_id FROM live)),
         |snap2 AS (
         |  SELECT * FROM (
         |    WITH stmts AS (${EventStatements.SQL}),
         |    $mergeBody
         |    SELECT "schema" AS sch, prop, entity_id FROM live)),
         |f1 AS (SELECT sch, prop, COUNT(*) AS n_from,
         |    COUNT(DISTINCT entity_id) AS entities_from FROM snap1 GROUP BY 1, 2),
         |f2 AS (SELECT sch, prop, COUNT(*) AS n_to,
         |    COUNT(DISTINCT entity_id) AS entities_to FROM snap2 GROUP BY 1, 2)
         |SELECT COALESCE(f1.sch, f2.sch) AS "schema",
         |  COALESCE(f1.prop, f2.prop) AS prop,
         |  COALESCE(n_from, 0) AS n_from, COALESCE(n_to, 0) AS n_to,
         |  COALESCE(n_to, 0) - COALESCE(n_from, 0) AS n_delta,
         |  COALESCE(entities_from, 0) AS entities_from,
         |  COALESCE(entities_to, 0) AS entities_to
         |FROM f1 FULL OUTER JOIN f2 ON f1.sch = f2.sch AND f1.prop = f2.prop
         |ORDER BY 1, 2""".stripMargin,
    // both snapshots' merge pipelines run in their own nested-WITH scope
    // (names shadow per subquery); the two-way EXCEPT is the row-level
    // CDF the file-pruned Spark computation must reproduce exactly
    "cdf1_version_diff" ->
      s"""WITH snap1 AS (
         |  SELECT * FROM (
         |    WITH stmts0 AS (${EventStatements.SQL}),
         |    stmts AS (SELECT * FROM stmts0
         |      WHERE CAST(substr(entity_id, 2) AS BIGINT) % 2 = 0),
         |    $mergeBody
         |    SELECT entity_id, prop, fragment, id, origin, value,
         |      epoch_ms(first_seen) AS first_ms, epoch_ms(last_seen) AS last_ms
         |    FROM live)),
         |snap2 AS (
         |  SELECT * FROM (
         |    WITH stmts AS (${EventStatements.SQL}),
         |    $mergeBody
         |    SELECT entity_id, prop, fragment, id, origin, value,
         |      epoch_ms(first_seen) AS first_ms, epoch_ms(last_seen) AS last_ms
         |    FROM live))
         |SELECT 'ADD' AS op, * FROM (SELECT * FROM snap2 EXCEPT SELECT * FROM snap1)
         |UNION ALL
         |SELECT 'DEL' AS op, * FROM (SELECT * FROM snap1 EXCEPT SELECT * FROM snap2)
         |ORDER BY op, entity_id, prop, fragment, id, origin, value""".stripMargin,
    "c1_catalog_stats" ->
      s"""WITH stmts AS (${EventStatements.SQL}),
         |tagged AS (
         |  SELECT CASE WHEN CAST(substr(entity_id, 2) AS BIGINT) % 2 = 0
         |    THEN 'alpha' ELSE 'beta' END AS dataset, id, entity_id
         |  FROM stmts)
         |SELECT dataset,
         |  COUNT(DISTINCT id) AS n_statements,
         |  COUNT(DISTINCT entity_id) AS n_entities
         |FROM tagged GROUP BY dataset ORDER BY dataset""".stripMargin,
    "a3_changed_canonical" ->
      s"""WITH stmts0 AS (${EventStatements.SQL}),
         |stmts AS (
         |  SELECT * FROM stmts0 WHERE entity_id IN (
         |    SELECT DISTINCT entity_id FROM stmts0
         |    WHERE first_seen >= TIMESTAMP '$watermark' OR deleted_at >= TIMESTAMP '$watermark')),
         |$mergeBody
         |$stmtOutSql""".stripMargin,
    "a4_entity_assembly" ->
      s"""$mergeCte,
         |pairs AS (SELECT DISTINCT entity_id, "schema", prop || '=' || value AS pv, prop, origin, first_seen, last_seen FROM live),
         |cap AS (SELECT entity_id, MIN(CASE WHEN prop = 'name' THEN value END) AS c FROM live GROUP BY entity_id)
         |SELECT p.entity_id,
         |  min("schema") AS "schema",
         |  COALESCE(MIN(c.c), min("schema")) AS caption,
         |  string_agg(DISTINCT pv, '|' ORDER BY pv) AS props,
         |  COUNT(DISTINCT prop) AS n_props,
         |  string_agg(DISTINCT origin, '|' ORDER BY origin) AS origins,
         |  epoch_ms(MIN(first_seen)) AS first_ms,
         |  epoch_ms(MAX(last_seen)) AS last_ms
         |FROM pairs p LEFT JOIN cap c ON p.entity_id = c.entity_id
         |GROUP BY p.entity_id ORDER BY p.entity_id""".stripMargin,
    "a4b_assembly_canonical" ->
      s"""$mergeCte,
         |grp AS (
         |  SELECT *, 'g' || CAST(CAST(substr(entity_id, 2) AS BIGINT) % 50 AS VARCHAR) AS cid
         |  FROM live),
         |caps AS (
         |  SELECT cid, prop, MIN(value) AS mv FROM grp GROUP BY cid, prop),
         |cap AS (
         |  SELECT cid, COALESCE(
         |    MAX(CASE WHEN prop = 'click' THEN mv END),
         |    MAX(CASE WHEN prop = 'view' THEN mv END), 'Event') AS caption
         |  FROM caps GROUP BY cid),
         |refs AS (
         |  SELECT cid, string_agg(DISTINCT entity_id, '|' ORDER BY entity_id) AS referents
         |  FROM grp GROUP BY cid),
         |spans AS (
         |  SELECT cid, min("schema") AS "schema",
         |    string_agg(DISTINCT origin, '|' ORDER BY origin) AS origins,
         |    epoch_ms(MIN(first_seen)) AS first_ms,
         |    epoch_ms(MAX(last_seen)) AS last_ms
         |  FROM grp GROUP BY cid)
         |SELECT s.cid AS id, c.caption, s."schema", r.referents, s.origins, s.first_ms, s.last_ms
         |FROM spans s JOIN cap c ON s.cid = c.cid JOIN refs r ON s.cid = r.cid
         |ORDER BY s.cid""".stripMargin,
    "a5_count_entities" ->
      s"$mergeCte\nSELECT COUNT(DISTINCT entity_id) AS entity_count FROM live",
    "a6_stats" ->
      s"""$mergeCte
         |SELECT * FROM (
         |  SELECT 'schemata' AS facet, bucket || '/' || "schema" AS key,
         |    COUNT(DISTINCT entity_id) AS entities, COUNT(*) AS statements
         |  FROM live GROUP BY bucket, "schema"
         |  UNION ALL
         |  SELECT 'countries', value, COUNT(DISTINCT entity_id), COUNT(*)
         |  FROM live WHERE prop_type = 'country' GROUP BY value)
         |ORDER BY facet, key""".stripMargin,
    "a7_distinct_partitions" ->
      s"""WITH stmts AS (${EventStatements.SQL})
         |SELECT DISTINCT shard, bucket, origin FROM stmts
         |ORDER BY shard, bucket, origin""".stripMargin,
    "a10_checksum" ->
      s"""$mergeCte,
         |ids AS (SELECT DISTINCT entity_id, "schema", id FROM live)
         |SELECT entity_id,
         |  sha256(min("schema") || '|' || string_agg(id, ',' ORDER BY id)) AS checksum
         |FROM ids GROUP BY entity_id ORDER BY entity_id""".stripMargin,
    "f1_shard_assign" ->
      s"""WITH stmts AS (${EventStatements.SQL})
         |SELECT DISTINCT entity_id, shard FROM stmts ORDER BY entity_id""".stripMargin,
    "f6_pack_unpack" ->
      s"""WITH stmts AS (${EventStatements.SQL}),
         |packed AS (
         |  SELECT *, id || chr(31) || entity_id || chr(31) || prop || chr(31) || value || chr(31) || fragment || chr(31) || origin AS pack
         |  FROM stmts)
         |SELECT DISTINCT id, entity_id, prop, fragment, origin,
         |  md5(pack) AS pack_md5,
         |  string_split(pack, chr(31))[4] AS unpacked_value
         |FROM packed ORDER BY id, entity_id, prop, fragment, origin""".stripMargin,
    "f7_tombstone_bump" ->
      """SELECT event_id,
        |  epoch_ms(COALESCE(CASE WHEN event_id % 97 = 0 THEN ts + INTERVAL 1 HOUR END, ts)) AS effective_ls
        |FROM events ORDER BY event_id""".stripMargin,
    "f4_namespace_strip" ->
      """WITH raw AS (
        |  SELECT event_id,
        |    CASE
        |      WHEN event_id % 4 = 0 THEN 'u' || user_id
        |      WHEN event_id % 4 = 1 THEN 'u' || user_id || '.' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
        |      WHEN event_id % 4 = 2 THEN '.u' || user_id
        |      ELSE 'u' || user_id || '.'
        |    END AS raw_id
        |  FROM events)
        |SELECT event_id, raw_id,
        |  CASE WHEN length(raw_id) - length(string_split(raw_id, '.')[-1]) - 1 > 0
        |    THEN substr(raw_id, 1, length(raw_id) - length(string_split(raw_id, '.')[-1]) - 1)
        |    ELSE raw_id END AS entity_id
        |FROM raw ORDER BY event_id""".stripMargin,
    "f10_mime_schema" ->
      """WITH m AS (
        |  SELECT event_id,
        |    (['application/pdf','text/plain','text/html','text/csv','image/png',
        |      'audio/mpeg','video/mp4','message/rfc822','application/octet-stream',
        |      'inode/directory'])[(event_id % 10) + 1] AS mime
        |  FROM events)
        |SELECT event_id, mime,
        |  CASE
        |    WHEN mime LIKE 'image/%' THEN 'Image'
        |    WHEN mime LIKE 'audio/%' THEN 'Audio'
        |    WHEN mime LIKE 'video/%' THEN 'Video'
        |    WHEN mime = 'application/pdf' THEN 'Pages'
        |    WHEN mime = 'text/html' THEN 'HyperText'
        |    WHEN mime IN ('application/vnd.ms-excel', 'text/csv') THEN 'Table'
        |    WHEN mime LIKE 'text/%' THEN 'PlainText'
        |    WHEN mime = 'message/rfc822' THEN 'Email'
        |    WHEN mime = 'inode/directory' THEN 'Folder'
        |    ELSE 'Document' END AS doc_schema
        |FROM m ORDER BY event_id""".stripMargin,
    "st3_diff_ops" ->
      s"""$mergeCte,
         |changed AS (
         |  SELECT DISTINCT entity_id FROM stmts
         |  WHERE first_seen >= TIMESTAMP '$watermark' OR deleted_at >= TIMESTAMP '$watermark'),
         |still_live AS (SELECT DISTINCT entity_id FROM live)
         |SELECT c.entity_id,
         |  CASE WHEN s.entity_id IS NOT NULL THEN 'ADD' ELSE 'DEL' END AS op,
         |  '{"op":"' || CASE WHEN s.entity_id IS NOT NULL THEN 'ADD' ELSE 'DEL' END || '","id":"' || c.entity_id || '"}' AS envelope
         |FROM changed c LEFT JOIN still_live s ON c.entity_id = s.entity_id
         |ORDER BY c.entity_id""".stripMargin,
    "st4_diff_classify" ->
      s"""$mergeCte,
         |chg AS (
         |  SELECT DISTINCT entity_id FROM stmts
         |  WHERE first_seen >= TIMESTAMP '$watermark' OR deleted_at >= TIMESTAMP '$watermark'),
         |born AS (
         |  SELECT entity_id, MIN(first_seen) AS b FROM stmts
         |  WHERE entity_id IN (SELECT entity_id FROM chg) GROUP BY entity_id),
         |lv AS (SELECT DISTINCT entity_id FROM live)
         |SELECT c.entity_id,
         |  CASE WHEN l.entity_id IS NULL THEN 'DEL'
         |       WHEN b.b < TIMESTAMP '$watermark' THEN 'MOD'
         |       ELSE 'ADD' END AS op
         |FROM chg c
         |LEFT JOIN lv l ON c.entity_id = l.entity_id
         |JOIN born b ON c.entity_id = b.entity_id
         |ORDER BY c.entity_id""".stripMargin,
    "o5_order_by_prop" ->
      s"""$mergeCte,
         |keys AS (SELECT entity_id, MIN(value) AS sort_key FROM live WHERE prop = 'click' GROUP BY entity_id),
         |ents AS (SELECT DISTINCT entity_id FROM live)
         |SELECT e.entity_id, k.sort_key
         |FROM ents e LEFT JOIN keys k ON e.entity_id = k.entity_id
         |ORDER BY k.sort_key ASC NULLS LAST, e.entity_id LIMIT 50""".stripMargin,
    "p1_query_compile" ->
      s"""$mergeCte,
         |matched AS (
         |  SELECT DISTINCT entity_id FROM live
         |  WHERE prop = 'click' AND value >= '50')
         |SELECT entity_id, prop, value, origin, fragment, id
         |FROM live
         |WHERE origin = 'src0' AND prop IN ('click','view','purchase')
         |  AND entity_id IN (SELECT entity_id FROM matched)
         |ORDER BY entity_id, prop, value, fragment, id""".stripMargin,
    "o6_keyset_page" ->
      s"""$mergeCte,
         |keys AS (SELECT entity_id, MIN(value) AS sort_key FROM live WHERE prop = 'click' GROUP BY entity_id)
         |SELECT entity_id, sort_key FROM keys
         |WHERE sort_key > '20' OR (sort_key = '20' AND entity_id > 'u0100')
         |ORDER BY sort_key, entity_id LIMIT 25""".stripMargin,
    "j4_parent_chain" ->
      """WITH nodes AS (
        |  SELECT 'r'||r_regionkey AS id, r_name AS path FROM region
        |  UNION ALL
        |  SELECT 'n'||n_nationkey, r_name||'/'||n_name
        |  FROM nation JOIN region ON n_regionkey = r_regionkey
        |  UNION ALL
        |  SELECT 'c'||c_custkey, r_name||'/'||n_name||'/'||c_name
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |                JOIN region ON n_regionkey = r_regionkey)
        |SELECT id, path FROM nodes ORDER BY id""".stripMargin,
    "set1_except" ->
      s"""WITH stmts AS (${EventStatements.SQL})
         |SELECT value FROM stmts WHERE prop = 'click'
         |EXCEPT
         |SELECT value FROM stmts WHERE prop = 'purchase'
         |ORDER BY value""".stripMargin,
    "set2_intersect" ->
      s"""WITH stmts AS (${EventStatements.SQL})
         |SELECT value FROM stmts WHERE prop = 'click'
         |INTERSECT
         |SELECT value FROM stmts WHERE prop = 'view'
         |ORDER BY value""".stripMargin,
    // the doc-lake mapping has unique content-hash ids, fragment = '' and
    // one row per id, so the two-branch merge is the identity on it — the
    // oracle replays the live view as the tombstone filter alone
    "srch2_entity_search" ->
      s"""WITH dstmts AS (${graft.lake.DocumentStatements.SQL}),
         |corpus AS (
         |  SELECT entity_id, string_agg(DISTINCT value, ' ' ORDER BY value) AS text
         |  FROM dstmts WHERE prop = 'bodyText' AND deleted_at IS NULL
         |  GROUP BY entity_id),
         |d AS (SELECT entity_id, len(ws) AS dl,
         |    len(list_filter(ws, w -> w = 'spark')) AS tf1,
         |    len(list_filter(ws, w -> w = 'vector')) AS tf2,
         |    len(list_filter(ws, w -> w = 'customer')) AS tf3
         |  FROM (SELECT entity_id, string_split(text,' ') AS ws FROM corpus)),
         |st AS (SELECT COUNT(*) AS n, SUM(dl) AS l,
         |    SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         |    SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
         |    SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3 FROM d),
         |s AS (SELECT entity_id, dl, tf1, tf2, tf3,
         |    CAST(l AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl,
         |    (CAST(n - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5) AS idf1,
         |    (CAST(n - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5) AS idf2,
         |    (CAST(n - df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5) AS idf3
         |  FROM d, st)
         |SELECT entity_id, tf1, tf2, tf3,
         |    (idf1 * ((CAST(tf1 AS DOUBLE) * 2.2) / (CAST(tf1 AS DOUBLE) + (1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / avgdl)))))
         |  + (idf2 * ((CAST(tf2 AS DOUBLE) * 2.2) / (CAST(tf2 AS DOUBLE) + (1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / avgdl)))))
         |  + (idf3 * ((CAST(tf3 AS DOUBLE) * 2.2) / (CAST(tf3 AS DOUBLE) + (1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / avgdl))))) AS score
         |FROM s ORDER BY score DESC, entity_id LIMIT 20""".stripMargin,
    "x1_xref_candidates" ->
      s"""$mergeCte,
         |keys AS (
         |  SELECT DISTINCT prop, CAST(floor(CAST(value AS DECIMAL(10,2))) AS BIGINT) AS k, entity_id
         |  FROM live WHERE prop IN ('click','view')),
         |blocks AS (
         |  SELECT prop, k FROM keys
         |  GROUP BY prop, k HAVING COUNT(*) <= 100),
         |pairs AS (
         |  SELECT a.entity_id AS id_a, b.entity_id AS id_b
         |  FROM keys a
         |  JOIN blocks bl ON a.prop = bl.prop AND a.k = bl.k
         |  JOIN keys b ON b.prop = a.prop AND b.k = a.k
         |    AND a.entity_id < b.entity_id)
         |SELECT id_a, id_b, COUNT(*) AS n_shared
         |FROM pairs GROUP BY id_a, id_b HAVING COUNT(*) >= 5
         |ORDER BY id_a, id_b""".stripMargin,
    "x2_xref_scores" ->
      s"""$mergeCte,
         |keys AS (
         |  SELECT DISTINCT prop, CAST(floor(CAST(value AS DECIMAL(10,2))) AS BIGINT) AS k, entity_id
         |  FROM live WHERE prop IN ('click','view')
         |    AND CAST(floor(CAST(value AS DECIMAL(10,2))) AS BIGINT) IS NOT NULL),
         |blocks AS (
         |  SELECT prop, k FROM keys
         |  GROUP BY prop, k HAVING COUNT(*) <= 100),
         |pairs AS (
         |  SELECT a.entity_id AS id_a, b.entity_id AS id_b
         |  FROM keys a
         |  JOIN blocks bl ON a.prop = bl.prop AND a.k = bl.k
         |  JOIN keys b ON b.prop = a.prop AND b.k = a.k
         |    AND a.entity_id < b.entity_id),
         |shared AS (
         |  SELECT id_a, id_b, COUNT(*) AS n_shared
         |  FROM pairs GROUP BY id_a, id_b HAVING COUNT(*) >= 5),
         |counts AS (SELECT entity_id, COUNT(*) AS nk FROM keys GROUP BY entity_id)
         |SELECT s.id_a, s.id_b, s.n_shared,
         |  CAST(s.n_shared AS DOUBLE) / (ca.nk + cb.nk - s.n_shared) AS score
         |FROM shared s
         |JOIN counts ca ON ca.entity_id = s.id_a
         |JOIN counts cb ON cb.entity_id = s.id_b
         |ORDER BY s.id_a, s.id_b""".stripMargin,
    "x3_xref_incremental" ->
      s"""$mergeCte,
         |keys AS (
         |  SELECT DISTINCT prop, CAST(floor(CAST(value AS DECIMAL(10,2))) AS BIGINT) AS k, entity_id
         |  FROM live WHERE prop IN ('click','view')
         |    AND CAST(floor(CAST(value AS DECIMAL(10,2))) AS BIGINT) IS NOT NULL),
         |blocks AS (
         |  SELECT prop, k FROM keys
         |  GROUP BY prop, k HAVING COUNT(*) <= 100),
         |pairs AS (
         |  SELECT a.entity_id AS id_a, b.entity_id AS id_b
         |  FROM keys a
         |  JOIN blocks bl ON a.prop = bl.prop AND a.k = bl.k
         |  JOIN keys b ON b.prop = a.prop AND b.k = a.k
         |    AND a.entity_id < b.entity_id),
         |shared AS (
         |  SELECT id_a, id_b, COUNT(*) AS n_shared
         |  FROM pairs GROUP BY id_a, id_b HAVING COUNT(*) >= 5),
         |counts AS (SELECT entity_id, COUNT(*) AS nk FROM keys GROUP BY entity_id),
         |changed AS (
         |  SELECT DISTINCT entity_id FROM live
         |  WHERE last_seen >= TIMESTAMP '2024-01-30 21:00:00')
         |SELECT s.id_a, s.id_b, s.n_shared,
         |  CAST(s.n_shared AS DOUBLE) / (ca.nk + cb.nk - s.n_shared) AS score
         |FROM shared s
         |JOIN counts ca ON ca.entity_id = s.id_a
         |JOIN counts cb ON cb.entity_id = s.id_b
         |WHERE s.id_a IN (SELECT entity_id FROM changed)
         |   OR s.id_b IN (SELECT entity_id FROM changed)
         |ORDER BY s.id_a, s.id_b""".stripMargin)
}
