package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job wall-clock breakdown of a query: runs each named query twice
  * (warm-up + measured — session-staged artifacts build on the first
  * run, the way Bench's min-of-reps sees them) and prints one line per
  * Spark job of the measured run: duration, stage count, and the
  * call-site description, so the optimization loop can see which
  * materialize/action inside an operator owns the wall-clock instead of
  * guessing from the code.
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <query> [query ...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <sfDir> <query> [query ...]")
    val dir = args.head
    val names = args.drop(1).toSeq
    val spark = graft.Sessions.local("graft-job-profile")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(js.jobId, (js.time, desc, js.stageIds.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, desc, nStages) =>
          done.add((je.jobId, (je.time - t0) / 1e3, desc, nStages))
        }
      }
    })
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, dir).count() catch { case e: Throwable =>
        System.err.println(s"[profile] $name warm-up FAILED: $e")
      }
      spark.catalog.clearCache()
      done.clear()
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(s"== $name: wall=${fmt(wall)}s rows=$rows jobs=${done.size}")
      val byJob = done.toArray(Array.empty[(Int, Double, String, Int)]).sortBy(_._1)
      val totalJob = byJob.map(_._2).sum
      for ((id, sec, desc, nStages) <- byJob)
        println(f"  job=$id%4d  ${fmt(sec)}%8ss  stages=$nStages%2d  $desc")
      println(s"  (sum of job durations: ${fmt(totalJob)}s; gaps = driver work)")
    }
    spark.stop()
  }
}
