package graft

/** Whole-registry plan lint: every oracle-checked query's physical plan
  * is screened for the two shapes that kill a 100 TB run —
  * CartesianProduct (quadratic row explosion) and unintended
  * BroadcastNestedLoopJoin (per-row scan of a broadcast side that only
  * survives when that side is provably bounded).
  *
  * BNLJ is legitimate exactly where a bounded-by-construction table
  * (centroid list, single-row stats, k-query probe set) broadcasts under
  * a non-equi scoring condition; those queries are whitelisted BY NAME
  * with the bounded side documented, so any new query that picks up a
  * nested-loop join fails this spec until it is either re-planned or
  * consciously justified here.
  */
class PlanLintSpec extends SparkSpec {

  // name -> the bounded broadcast side that justifies the nested loop.
  // The lint is two-sided: a query here WITHOUT a BNLJ in its plan also
  // fails, so the whitelist can never rot ahead of the plans.
  private val allowBnlj: Map[String, String] = Map(
    "cur2_mixture_sample" -> "single-row feasible-total broadcast onto #groups rows",
    "cur3_temp_mixture" -> "single-row token-total broadcast onto #sources rows",
    "cur4_mixture_draw" -> "single-row sqrt-allocation total broadcast onto #sources rows",
    "kw1_tfidf_terms" -> "single-row corpus-count broadcast onto the (doc, term) table",
    "srch1_bm25" -> "single-row corpus-stats broadcast onto the scoring scan",
    "sim1_topk" -> "bounded probe set (k query vectors) broadcast against the corpus scan",
    "sim5_sq8_topk" -> "bounded probe set broadcast against the SQ8 corpus scan",
    "sim3_ivf_topk" -> "nlist-bounded centroid table broadcast (assignment scan)",
    "sim4_kmeans_update" -> "nlist-bounded centroid table broadcast",
    "sim6_ivf_sq8" -> "nlist-bounded centroids + bounded probe set broadcast",
    "d9_semantic_dedup" -> "nlist-bounded centroid table broadcast",
    "sim8_ivf_pq" -> "nlist-bounded centroids + bounded probe set broadcast",
    "sim9_ivf_trained" -> "nlist-bounded trained-centroid table + bounded probe set broadcast",
    "srch2_entity_search" -> "single-row corpus-stats broadcast onto the scoring scan",
    "hyb1_rrf_fusion" -> "single query vector + single-row corpus-stats broadcasts; fusion join is k-row bounded",
    "cur5_dsir_weights" -> "single-row corpus/target token-total broadcast onto the 1024-bucket stats",
    "sim10_recall" -> "nlist-bounded centroids + bounded probe set broadcast (the IVF arm)",
    "cur6_curation_funnel" -> "single-row sqrt-allocation total broadcast onto #sources rows (cur4's shape)",
    "ovl1_source_overlap" -> "#groups-bounded size-table self-join (the zero-overlap pair skeleton, ≤ groups² rows, both sides tiny)",
    "st7_session_timeout" -> "single-row max-event-time (watermark) broadcast onto the per-session rows (the drain-rewrite twin's closability filter)")

  // name -> why the UNPARTITIONED window in this query's plan is bounded.
  // An unpartitioned WindowExec sorts its whole input through ONE
  // partition — the third 100 TB killer after cartesians and unbounded
  // BNLJ — so every site must prove its input is bounded by construction
  // (a top-k head, a day-grain aggregate, a k-row fusion set). Two-sided
  // like the BNLJ list: a whitelisted query whose plan loses its window
  // also fails, so the list can't rot ahead of the plans.
  private val allowGlobalWindow: Map[String, String] = Map(
    "hyb1_rrf_fusion" -> ("rank fusion over the UNION of two top-k lists " +
      "(≤ 2k rows by construction — each arm is already limit(k)'d before " +
      "the window; sanctioned in TrainingData.rrfFusion)"),
    "w3_cumulative_users" -> ("running total over the per-DAY first-seen " +
      "aggregate — input is #distinct days (≤ a few thousand for decades " +
      "of data), not events; sanctioned in Relational.w3CumulativeUsers"))

  test("no CartesianProduct anywhere; BroadcastNestedLoopJoin only where justified; global windows only on bounded inputs") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val bnljSeen = scala.collection.mutable.Set.empty[String]
    val gwSeen = scala.collection.mutable.Set.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val (plan, globalWindows) =
        try {
          val executed = fn(spark, sf001).queryExecution.executedPlan
          (executed.toString, PlanLintSpec.unpartitionedWindows(executed))
        } catch { case e: Throwable => (s"PLANNING FAILED: $e", Nil) }
      if (plan.startsWith("PLANNING FAILED")) failures += s"$name: $plan"
      if (plan.contains("CartesianProduct"))
        failures += s"$name: CartesianProduct in plan"
      if (plan.contains("BroadcastNestedLoopJoin")) {
        bnljSeen += name
        if (!allowBnlj.contains(name))
          failures += s"$name: unjustified BroadcastNestedLoopJoin"
      }
      if (globalWindows.nonEmpty) {
        gwSeen += name
        if (!allowGlobalWindow.contains(name))
          failures += s"$name: unpartitioned WindowExec over ${globalWindows.mkString("; ")}"
      }
    }
    (allowBnlj.keySet -- bnljSeen).foreach(n =>
      failures += s"$n: whitelisted for BNLJ but its plan has none — prune the entry")
    (allowGlobalWindow.keySet -- gwSeen).foreach(n =>
      failures += s"$n: whitelisted for a global window but its plan has none — prune the entry")
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("offset+limit page: the single-partition window is bounded by its own top-k head") {
    // Sanction for the ONE global-window site the registry sweep can't
    // see: FtmQuery.entityIdPage's limit-present offset branch (no
    // registry query pages with offset+limit — wire pages are capped at
    // Rql.MaxWireOffset/MaxWireLimit, so the window input is ≤ 200k rows
    // even for untrusted callers). It can't live in allowGlobalWindow
    // (the two-sided sweep would prune it as unused), so this lint
    // builds the plan directly and asserts the window's input IS the
    // distributed top-(offset+n) head — bounded by construction, the
    // same argument as the whitelisted sites.
    import spark.implicits._
    import graft.model.{FtmModel, Statement}
    import graft.query.FtmQuery
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val stmts = (0 until 50).map { i =>
      Statement(shard = "0", id = s"e$i-name", entity_id = f"e$i%02d",
        dataset = "ds", bucket = FtmModel.bucketOf("Person"), origin = "o1",
        source = None, schema = "Person", prop = "name",
        prop_type = FtmModel.propTypes("name"), value = f"n$i%02d",
        original_value = None, lang = None, external = false,
        first_seen = ts, last_seen = ts, fragment = "", deleted_at = None)
    }.toDS().toDF()
    val q = FtmQuery.Query(schemata = Some("Person"),
      orderByProps = Seq(("name", false)), limit = Some(3), offset = 2)
    val (page, _) = FtmQuery.entityIdPage(q, stmts)
    assert(page.collect().map(_.getString(0)).toSeq ==
      Seq("e02", "e03", "e04")) // the branch actually ran, rows exact
    val nodes = PlanLintSpec.walkPlans(page.queryExecution.executedPlan)
    val windows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(windows.size == 1, s"expected exactly the one bounded window, got ${windows.size}")
    // the window's input subtree must carry the top-k head that bounds it
    val boundedBy = PlanLintSpec.walkPlans(windows.head.child).collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => s"TakeOrdered(${t.limit})"
      case g: org.apache.spark.sql.execution.GlobalLimitExec => s"GlobalLimit(${g.limit})"
      case c: org.apache.spark.sql.execution.CollectLimitExec => s"CollectLimit(${c.limit})"
    }
    assert(boundedBy.nonEmpty,
      s"offset+limit window lost its bounding top-k head:\n${page.queryExecution.executedPlan}")
  }
}

object PlanLintSpec {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.window.WindowExec

  /** Every WindowExec in the tree (descending through AQE wrappers,
    * subquery expressions, and cached-relation scans — a single-
    * partition window must not hide inside a scalar subquery or a
    * persisted subtree) with an EMPTY partition spec, rendered as its
    * window expressions — the shape whose sort runs through a single
    * partition.
    */
  /** Every node in the tree, descending through AQE wrappers,
    * cached-relation scans, and subquery expression plans.
    */
  def walkPlans(plan: SparkPlan): Seq[SparkPlan] = {
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          Seq(m.relation.cachedPlan)
        case _ => p.children
      }
      val subqueries = p.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.execution.ExecSubqueryExpression => s.plan
      })
      p +: (nested ++ subqueries).flatMap(walk)
    }
    walk(plan)
  }

  def unpartitionedWindows(plan: SparkPlan): Seq[String] =
    walkPlans(plan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        w.windowExpression.map(_.sql).mkString(", ")
    }
}
