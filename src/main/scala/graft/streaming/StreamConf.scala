package graft.streaming

import org.apache.spark.sql.SparkSession

/** Query-scoped session config for streaming drivers.
  *
  * Streaming state-store partitioning is pinned at the query's first run
  * and should be sized to the KEY cardinality (dozens of windows / users
  * / sketch cells), not the batch shuffle width — every state partition
  * writes delta/commit files per micro-batch, so 32 near-empty state
  * stores quadruple checkpoint file traffic for nothing.
  *
  * That sizing must not leak into the shared session: mutating
  * `spark.sql.shuffle.partitions` around `start()` (the previous shape)
  * races any concurrent query planned on the same session — it silently
  * runs with 8 shuffle partitions — and concurrent set/restore pairs can
  * restore stale values. Instead each streaming query plans on its own
  * `newSession()` clone: same SparkContext, executors, and cached data,
  * but an isolated SQLConf.
  */
object StreamConf {

  /** A sibling session with `spark.sql.shuffle.partitions` pinned for a
    * single streaming query. `newSession()` initializes its SQLConf from
    * the SparkContext defaults, so a session-scoped stage-dir override
    * (`spark.graft.stage.dir`, used for checkpoint placement) is copied
    * across explicitly.
    */
  def streamSession(spark: SparkSession, statePartitions: Int = 8): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    spark.conf.getOption("spark.graft.stage.dir")
      .foreach(ss.conf.set("spark.graft.stage.dir", _))
    ss
  }
}
