package graft.tools

/** Plan auditor: print the formatted physical plan of registry queries —
  * the review loop for pushdown / exchange / codegen shape before a
  * query ships. The single plan-dump entry point (a near-duplicate
  * `graft.Explain` main was folded in here, round 13).
  *
  * Usage: `sbt "runMain graft.tools.Explain [query ...]"` — no args
  * dumps every registry query. Data dir from SPARK_GRAFT_SF_DIR
  * (default /root/testdata/sf0.01).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Sessions.local("graft-explain")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    for (n <- names; fn <- graft.SparkEntry.queries.get(n)) {
      println(s"\n===== $n =====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
    if (unknown.nonEmpty) {
      // fail LOUDLY on typos: a scripted audit must not read an empty
      // dump as success
      System.err.println(s"[explain] no such queries: ${unknown.mkString(", ")}")
      sys.exit(1)
    }
  }
}
