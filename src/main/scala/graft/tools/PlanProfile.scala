package graft.tools

/** Per-query PLANNING-time breakdown: how much of a query's wall-clock is
  * driver-side Catalyst work (analysis → optimization → physical
  * planning) versus execution. Guides the "cut plan size" optimization
  * lane: a query whose planning dominates wants a narrower/shallower
  * plan, not a faster kernel.
  *
  * Methodology: each named query is built + fully executed once (warm-up:
  * session-staged artifacts land, codegen caches fill), then rebuilt
  * fresh — `executedPlan` forces analysis/optimizer/physical planning
  * without running a job — and finally executed. Reported: plan seconds,
  * execute seconds, plan node count (physical).
  *
  * Caveat: plan_s = BUILD + plan. Query construction may itself run eager
  * staging jobs (e.g. resolvePaths stages its parents table at build
  * time), so for staged-pipeline queries the plan column includes that
  * stage IO, not just Catalyst work — read it as "time before the final
  * action starts", and check JobProfile when a staged query reads high.
  *
  * Usage: runMain graft.tools.PlanProfile <sfDir> [query ...]
  *        (no query args = the whole registry)
  */
object PlanProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanProfile <sfDir> [query ...]")
    val dir = args.head
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.Sessions.local("graft-plan-profile")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val rows = names.flatMap { name =>
      graft.SparkEntry.queries.get(name) match {
        case None =>
          System.err.println(s"[planprof] unknown query: $name"); None
        case Some(fn) =>
          try {
            fn(spark, dir).count() // warm-up: staging + codegen
            spark.catalog.clearCache()
            val t0 = System.nanoTime()
            val df = fn(spark, dir)
            val plan = df.queryExecution.executedPlan
            val nNodes = plan.collect { case p => p }.size
            val tPlan = (System.nanoTime() - t0) / 1e9
            val t1 = System.nanoTime()
            df.count()
            val tExec = (System.nanoTime() - t1) / 1e9
            spark.catalog.clearCache()
            Some((name, tPlan, tExec, nNodes))
          } catch {
            case e: Throwable =>
              System.err.println(s"[planprof] $name FAILED: $e"); None
          }
      }
    }
    // share guard: both timings can round to zero on a trivial query —
    // clamp the denominator so the column prints 0.000 instead of NaN
    def share(tp: Double, te: Double): Double = tp / math.max(tp + te, 1e-9)
    println(f"${"query"}%-28s ${"plan_s"}%8s ${"exec_s"}%8s ${"plan/wall"}%9s ${"nodes"}%6s")
    rows.sortBy(-_._2).foreach { case (n, tp, te, nn) =>
      println(f"$n%-28s ${fmt(tp)}%8s ${fmt(te)}%8s ${fmt(share(tp, te))}%9s $nn%6d")
    }
    val totP = rows.map(_._2).sum
    val totE = rows.map(_._3).sum
    println(s"== total plan=${fmt(totP)}s exec=${fmt(totE)}s " +
      s"(plan share ${fmt(share(totP, totE))})")
    spark.stop()
  }
}
