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
    "tok2_bpe_merges" -> "single-row before/after token counts crossJoined onto the 1-row winning pair (summary report; the merge scan itself hash-joins)")

  test("no CartesianProduct anywhere; BroadcastNestedLoopJoin only where justified") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val bnljSeen = scala.collection.mutable.Set.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan =
        try fn(spark, sf001).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANNING FAILED: $e" }
      if (plan.startsWith("PLANNING FAILED")) failures += s"$name: $plan"
      if (plan.contains("CartesianProduct"))
        failures += s"$name: CartesianProduct in plan"
      if (plan.contains("BroadcastNestedLoopJoin")) {
        bnljSeen += name
        if (!allowBnlj.contains(name))
          failures += s"$name: unjustified BroadcastNestedLoopJoin"
      }
    }
    (allowBnlj.keySet -- bnljSeen).foreach(n =>
      failures += s"$n: whitelisted for BNLJ but its plan has none — prune the entry")
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
