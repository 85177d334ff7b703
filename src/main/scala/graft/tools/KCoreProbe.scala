package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for kCore staging variants (not part of the query
  * registry; kept under tools for reproducibility of tuning decisions).
  */
object KCoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("kcore-probe")
    val tmp = graft.functions.F.stageTempPath(spark, "co-probe")
    graft.graph.EntityGraph.coSupplierEdges(spark, dir)
      .write.mode("overwrite").parquet(tmp)
    val e = spark.read.parquet(tmp)
    for (se <- args.drop(1).map(_.toInt).toSeq match {
        case Nil => Seq(1, 2, 4); case xs => xs }) {
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = graft.graph.EntityGraph
          .kCore(e, k = 3, maxRounds = 8, stageEvery = se).count()
        println(f"stageEvery=$se rep=$rep rows=$n t=${(System.nanoTime()-t0)/1e9}%.3f")
      }
    }
    spark.stop()
  }
}
