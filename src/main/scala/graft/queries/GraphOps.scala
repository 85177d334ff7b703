package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.EntityGraph

/** Entity-graph analytics queries (SURVEY §8): degree profile, bounded-hop
  * expand, integer-exact PageRank — the Aleph-style graph read path over
  * the lake's entity-reference edges, exercised on the customer–supplier
  * bipartite graph of the testdata star schema.
  *
  * Oracle parity: all three are deterministic — degree/expand are plain
  * relational algebra; PageRank does every arithmetic step in scaled
  * BIGINT with truncating division (order-independent), so the DuckDB
  * twin replays identical bits.
  */
object GraphOps {

  // The customer–supplier edge list is staged once per (session, sf-dir)
  // and read back by every graph query — the same precedent as the
  // session-staged statement table (StatementOps) and term tables
  // (TrainingData): in production the entity graph is a maintained
  // artifact (refreshed per merge), not something each analytic re-derives
  // from the fact join. Cache holds the PATH (weak session key — see
  // SessionScoped).
  private val stagedEdges = new graft.functions.SessionScoped[String]

  private def csEdges(spark: SparkSession, dir: String): DataFrame = {
    val path = stagedEdges.getOrCompute(spark, s"$dir#cs") {
      val tmp = graft.functions.F.stageTempPath(spark, "cs-edges")
      EntityGraph.customerSupplierEdges(spark, dir)
        .write.mode("overwrite").parquet(tmp)
      tmp
    }
    spark.read.parquet(path)
  }

  // the co-supplier projection (gr5 triangles, gr7 k-core) is the same
  // maintained-artifact story as csEdges above: the thresholded
  // projection of the bipartite order–supplier graph is refreshed per
  // ingest, not re-derived from the fact self-join by every analytic
  private def coEdges(spark: SparkSession, dir: String): DataFrame = {
    val path = stagedEdges.getOrCompute(spark, s"$dir#co") {
      val tmp = graft.functions.F.stageTempPath(spark, "co-edges")
      EntityGraph.coSupplierEdges(spark, dir)
        .write.mode("overwrite").parquet(tmp)
      tmp
    }
    spark.read.parquet(path)
  }

  /** gr1: per-node degree over the undirected customer–supplier graph. */
  def gr1Degree(spark: SparkSession, dir: String): DataFrame =
    EntityGraph.degrees(csEdges(spark, dir))
      .orderBy(col("node"))

  /** gr2: min-hop BFS expansion, 2 hops from every 100th customer. */
  def gr2Expand(spark: SparkSession, dir: String): DataFrame = {
    val edges = csEdges(spark, dir)
    val seeds = graft.Tables.customer(spark, dir)
      .filter(col("c_custkey") % 100 === 0)
      .select(concat(lit("c"), col("c_custkey")).as("node"))
    EntityGraph.expand(edges, seeds, maxHops = 2)
      .orderBy(col("hop"), col("node"))
  }

  /** gr3: 3-iteration integer-exact PageRank (damping 0.85, scale 1e9). */
  def gr3Pagerank(spark: SparkSession, dir: String): DataFrame =
    EntityGraph.pageRank(csEdges(spark, dir), iters = 3)
      .orderBy(col("node"))

  /** gr4: connected components — min-label propagation (with label
    * shortcutting from round 4, see [[graft.dedupe.Dedupe.dupClusters]])
    * over the undirected graph, reusing the dedupe clusterer (same scale
    * shape: one join + one map-side-combinable min per round, label state
    * re-staged, no driver graph). Oracle parity is a FIXPOINT argument:
    * the Spark loop runs to convergence (non-convergence throws, never
    * silently truncates), and the converged labels are exactly
    * (node → component min id) regardless of round schedule — the same
    * value the oracle's 16 chained propagation rounds compute on this
    * graph (which converges well inside them).
    */
  def gr4Components(spark: SparkSession, dir: String): DataFrame =
    graft.dedupe.Dedupe.dupClusters(
      csEdges(spark, dir)
        .select(col("src").as("id_a"), col("dst").as("id_b")))
      .select(col("doc_id").as("node"), col("cluster_id").as("component"))
      .orderBy(col("node"))

  /** gr5: per-node triangle counts over the thresholded co-supplier
    * projection (suppliers sharing ≥ 8 orders) — degree-ordered
    * node-iterator; the oracle enumerates the same triangle set with
    * id-ordered canonical edges (orientation only changes WHERE each
    * triangle is counted, never the set).
    */
  def gr5Triangles(spark: SparkSession, dir: String): DataFrame =
    EntityGraph.triangleCounts(coEdges(spark, dir))
      .orderBy(col("node"))

  /** gr6: personalized PageRank from the gr2 seed set (every 100th
    * customer), 3 iterations — walk-with-restart prominence around the
    * seeds; far-from-seed nodes carry exact 0.
    */
  def gr6Ppr(spark: SparkSession, dir: String): DataFrame = {
    val seeds = graft.Tables.customer(spark, dir)
      .filter(col("c_custkey") % 100 === 0)
      .select(concat(lit("c"), col("c_custkey")).as("node"))
    EntityGraph.personalizedPageRank(csEdges(spark, dir), seeds, iters = 3)
      .orderBy(col("node"))
  }

  /** The FtM-native edge source for gr8: a real [[graft.lake.StatementStore]]
    * holding entity-REFERENCE statements (`prop_type='entity'`, the
    * interval-schema shape Aleph expands along — reference
    * model/statement.py), built once per (session, sf-dir) from the star
    * schema: each Order entity references its customer (one statement per
    * order) and its suppliers (one per distinct (order, supplier) —
    * lineitem repeats collapse in the merge's content-hash dedupe, which
    * is the point: the lake→graph seam includes the merge). A non-entity
    * decoy prop (`total`, prop_type `number`) rides along so the edge
    * filter has something real to exclude.
    */
  private val stagedEntityStore = new graft.functions.SessionScoped[String]

  private def entityStoreRoot(spark: SparkSession, dir: String): String =
    stagedEntityStore.getOrCompute(spark, s"$dir#gr8") {
      import graft.functions.Hashing
      val tmp = graft.functions.F.stageTempPath(spark, "entity-store")
      val store = new graft.lake.StatementStore(spark, tmp,
        graft.lake.EventStatements.Shards)
      val ts = lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      val dataset = lit("graph_ds")
      def stmt(entityId: org.apache.spark.sql.Column, prop: String,
          propType: String, value: org.apache.spark.sql.Column) = Seq(
        Hashing.shardOf(entityId, graft.lake.EventStatements.Shards).as("shard"),
        Hashing.statementKey(dataset, entityId, lit(prop), value).as("id"),
        entityId.as("entity_id"), dataset.as("dataset"),
        lit("interval").as("bucket"), lit("graph").as("origin"),
        lit(null).cast("string").as("source"), lit("Order").as("schema"),
        lit(prop).as("prop"), lit(propType).as("prop_type"),
        value.as("value"), lit(null).cast("string").as("original_value"),
        lit(null).cast("string").as("lang"), lit(false).as("external"),
        ts.as("first_seen"), ts.as("last_seen"),
        lit(null).cast("timestamp").as("deleted_at"), lit("").as("fragment"))
      val orders = graft.Tables.orders(spark, dir)
      val li = graft.Tables.lineitem(spark, dir)
      val cust = orders.select(stmt(concat(lit("o"), col("o_orderkey")),
        "customer", "entity", concat(lit("c"), col("o_custkey"))): _*)
      val supp = li.select(stmt(concat(lit("o"), col("l_orderkey")),
        "supplier", "entity", concat(lit("s"), col("l_suppkey"))): _*)
      val decoy = orders.select(stmt(concat(lit("o"), col("o_orderkey")),
        "total", "number", col("o_totalprice").cast("string")): _*)
      store.append(cust.unionByName(supp).unionByName(decoy))
      store.merge()
      tmp
    }

  /** gr8: degree profile over edges read FROM THE LAKE ITSELF — live
    * view → `prop_type='entity'` statements → (entity, referenced
    * entity) edges → per-node degree. Exercises the production seam the
    * other graph queries presuppose (their edge artifacts are staged
    * projections): store append + merge + snapshot-isolated live read +
    * the entity-prop filter, end to end. Edge distinctness comes from
    * the merge's content-hash dedupe (one live statement per (entity,
    * prop, value)), so no extra distinct shuffle is spent re-proving it.
    */
  def gr8EntityEdges(spark: SparkSession, dir: String): DataFrame = {
    val store = new graft.lake.StatementStore(spark,
      entityStoreRoot(spark, dir), graft.lake.EventStatements.Shards)
    val edges = store.live
      .filter(col("prop_type") === "entity")
      .select(col("entity_id").as("src"), col("value").as("dst"))
    EntityGraph.degrees(edges).orderBy(col("node"))
  }

  /** gr7: 3-core of the thresholded co-supplier projection — iterative
    * peeling with early exit, capped at 8 rounds (the cap is part of the
    * operator contract and the oracle replays exactly 8; on a graph that
    * converges earlier the early exit and the fixed-round replay agree
    * because converged graphs are peel-invariant — the gr4 argument).
    */
  def gr7KCore(spark: SparkSession, dir: String): DataFrame =
    EntityGraph.kCore(coEdges(spark, dir), k = 3,
        maxRounds = 8)
      .orderBy(col("node"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gr8_entity_edges" -> (gr8EntityEdges _),
    "gr7_kcore" -> (gr7KCore _),
    "gr1_degree" -> (gr1Degree _),
    "gr2_expand" -> (gr2Expand _),
    "gr3_pagerank" -> (gr3Pagerank _),
    "gr4_components" -> (gr4Components _),
    "gr5_triangles" -> (gr5Triangles _),
    "gr6_ppr" -> (gr6Ppr _))

  private val edgesCte =
    """e AS (SELECT DISTINCT 'c'||o_custkey AS src, 's'||l_suppkey AS dst
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |und AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)""".stripMargin

  val oracle: Map[String, String] = Map(
    // gr8 replays the lake's net effect: the merge collapses repeated
    // (order, supplier) lineitem statements to one live edge (DISTINCT),
    // order→customer is unique per order already, the number-typed decoy
    // prop is excluded by the entity filter
    "gr8_entity_edges" ->
      """WITH ee AS (
        |  SELECT 'o'||o_orderkey AS src, 'c'||o_custkey AS dst FROM orders
        |  UNION ALL
        |  SELECT DISTINCT 'o'||l_orderkey, 's'||l_suppkey FROM lineitem),
        |und AS (SELECT src, dst FROM ee UNION ALL SELECT dst AS src, src AS dst FROM ee)
        |SELECT src AS node, COUNT(*) AS degree FROM und
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "gr1_degree" ->
      s"""WITH $edgesCte
         |SELECT src AS node, COUNT(*) AS degree FROM und
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "gr2_expand" ->
      s"""WITH $edgesCte,
         |seeds AS (SELECT DISTINCT 'c'||c_custkey AS node FROM customer
         |  WHERE c_custkey % 100 = 0),
         |h1 AS (SELECT DISTINCT und.dst AS node FROM und JOIN seeds ON und.src = seeds.node
         |  WHERE und.dst NOT IN (SELECT node FROM seeds)),
         |h2 AS (SELECT DISTINCT und.dst AS node FROM und JOIN h1 ON und.src = h1.node
         |  WHERE und.dst NOT IN (SELECT node FROM seeds)
         |    AND und.dst NOT IN (SELECT node FROM h1))
         |SELECT node, 0 AS hop FROM seeds
         |UNION ALL SELECT node, 1 AS hop FROM h1
         |UNION ALL SELECT node, 2 AS hop FROM h2
         |ORDER BY hop, node""".stripMargin,
    "gr3_pagerank" ->
      s"""WITH $edgesCte,
         |deg AS (SELECT src AS node, COUNT(*) AS d FROM und GROUP BY 1),
         |ed AS (SELECT u.src, u.dst, deg.d FROM und u JOIN deg ON deg.node = u.src),
         |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank FROM deg),
         |c1 AS (SELECT ed.dst AS node, CAST(SUM(r0.rank // ed.d) AS BIGINT) AS s
         |  FROM ed JOIN r0 ON ed.src = r0.node GROUP BY 1),
         |r1 AS (SELECT deg.node,
         |  CAST(150000000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM deg LEFT JOIN c1 ON deg.node = c1.node),
         |c2 AS (SELECT ed.dst AS node, CAST(SUM(r1.rank // ed.d) AS BIGINT) AS s
         |  FROM ed JOIN r1 ON ed.src = r1.node GROUP BY 1),
         |r2 AS (SELECT deg.node,
         |  CAST(150000000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM deg LEFT JOIN c2 ON deg.node = c2.node),
         |c3 AS (SELECT ed.dst AS node, CAST(SUM(r2.rank // ed.d) AS BIGINT) AS s
         |  FROM ed JOIN r2 ON ed.src = r2.node GROUP BY 1),
         |r3 AS (SELECT deg.node,
         |  CAST(150000000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM deg LEFT JOIN c3 ON deg.node = c3.node)
         |SELECT node, rank FROM r3 ORDER BY node""".stripMargin,
    "gr6_ppr" -> {
      val rounds = (1 to 3).map { i =>
        s"""c$i AS (SELECT ed.dst AS node, CAST(SUM(r${i - 1}.rank // ed.d) AS BIGINT) AS s
           |  FROM ed JOIN r${i - 1} ON ed.src = r${i - 1}.node GROUP BY 1),
           |r$i AS (SELECT n.node,
           |  CAST(n.base + (85 * COALESCE(c$i.s, 0)) // 100 AS BIGINT) AS rank
           |  FROM n LEFT JOIN c$i ON n.node = c$i.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH $edgesCte,
         |seeds AS (SELECT DISTINCT 'c'||c_custkey AS node FROM customer
         |  WHERE c_custkey % 100 = 0),
         |deg AS (SELECT src AS node, COUNT(*) AS d FROM und GROUP BY 1),
         |ed AS (SELECT u.src, u.dst, deg.d FROM und u JOIN deg ON deg.node = u.src),
         |n AS (SELECT deg.node,
         |  CASE WHEN s.node IS NOT NULL THEN CAST(150000000 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS base
         |  FROM deg LEFT JOIN seeds s ON deg.node = s.node),
         |r0 AS (SELECT node, CASE WHEN base > 0 THEN CAST(1000000000 AS BIGINT)
         |  ELSE CAST(0 AS BIGINT) END AS rank FROM n),
         |$rounds
         |SELECT node, rank FROM r3 ORDER BY node""".stripMargin
    },
    "gr7_kcore" -> {
      // each e$i is referenced twice (u$i and e$(i+1)) — MATERIALIZED, or
      // DuckDB's inlining makes the round chain exponential in scans
      val rounds = (0 until 8).map { i =>
        s"""u$i AS (SELECT s, t FROM e$i UNION ALL SELECT t AS s, s AS t FROM e$i),
           |d$i AS (SELECT s AS node, COUNT(*) AS d FROM u$i GROUP BY 1),
           |k$i AS (SELECT node FROM d$i WHERE d >= 3),
           |e${i + 1} AS MATERIALIZED (SELECT e.s, e.t FROM e$i e
           |  JOIN k$i a ON e.s = a.node JOIN k$i b ON e.t = b.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
         |pc AS (SELECT a.sk AS s, b.sk AS t, COUNT(*) AS n_co
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk GROUP BY 1, 2),
         |e0 AS MATERIALIZED (SELECT s, t FROM pc WHERE n_co >= 8),
         |$rounds,
         |uf AS (SELECT s, t FROM e8 UNION ALL SELECT t AS s, s AS t FROM e8),
         |df AS (SELECT s AS node, COUNT(*) AS d FROM uf GROUP BY 1)
         |SELECT node, d AS core_degree FROM df WHERE d >= 3 ORDER BY node""".stripMargin
    },
    "gr5_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
        |pc AS (SELECT a.sk AS s, b.sk AS t, COUNT(*) AS n_co
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk GROUP BY 1, 2),
        |e AS (SELECT s, t FROM pc WHERE n_co >= 8),
        |tri AS (SELECT ab.s AS a, ab.t AS b, bc.t AS c
        |  FROM e ab JOIN e bc ON ab.t = bc.s
        |  JOIN e ac ON ac.s = ab.s AND ac.t = bc.t),
        |corners AS (SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
        |SELECT node, COUNT(*) AS n_tri FROM corners GROUP BY 1 ORDER BY 1""".stripMargin,
    "gr4_components" -> {
      // 16 chained propagation rounds reach the fixpoint on this graph;
      // the Spark side converges to the same fixpoint (shortcutting only
      // changes HOW FAST, and non-convergence throws instead of
      // returning a partial labeling the oracle couldn't mirror)
      val rounds = (1 to 15).map { i =>
        s"""l$i AS (SELECT s.src AS node, MIN(l.lbl) AS lbl
           |  FROM star s JOIN l${i - 1} l ON l.node = s.dst GROUP BY s.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH $edgesCte,
         |star AS (SELECT src, dst FROM und
         |  UNION ALL SELECT DISTINCT src, src FROM und),
         |l0 AS (SELECT src AS node, MIN(dst) AS lbl FROM star GROUP BY src),
         |$rounds
         |SELECT node, lbl AS component FROM l15 ORDER BY node""".stripMargin
    })
}
