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
  def streamSession(spark: SparkSession, statePartitions: Int = 8,
      drain: Boolean = true): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    if (drain) {
      // Drain-oriented state-store settings: these queries run a handful
      // of micro-batches under AvailableNow, so the 100-batch retention
      // default only multiplies checkpoint files, and a background
      // snapshot pass mid-drain doubles state I/O for state that is about
      // to be read exactly once. An always-on deployment passes
      // drain=false and keeps the defaults — they bound recovery replay,
      // which a drain does not need (its recovery story is "rerun the
      // drain").
      ss.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
      ss.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
    }
    // experiment hook: state-store backend override (measured A/B)
    sys.env.get("SPARK_GRAFT_STATE_STORE").foreach {
      case "rocksdb" =>
        ss.conf.set(
          "spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        ss.conf.set(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          "true")
      case _ => ()
    }
    sys.env.get("SPARK_GRAFT_STATE_PARTITIONS")
      .foreach(ss.conf.set("spark.sql.shuffle.partitions", _))
    spark.conf.getOption("spark.graft.stage.dir")
      .foreach(ss.conf.set("spark.graft.stage.dir", _))
    ss
  }

  /** [[streamSession]] with state partitions sized to the SOURCE: 8
    * stores for a few-MB table (the checkpoint-traffic floor), one more
    * per `bytesPerPartition` of input up to the core count. The fixed-8
    * shape is right when state is small, but the drain of a 100×
    * corpus through 8 state partitions leaves 3/4 of the cores idle in
    * the stateful stages — state partitioning is pinned at first run,
    * so it must be chosen for the data the query will actually see.
    */
  def streamSessionFor(spark: SparkSession, dir: String,
      file: String = "events.parquet",
      bytesPerPartition: Long = 4L << 20,
      drain: Boolean = true): SparkSession = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$file")
    val size = try {
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.getContentSummary(p).getLength
    } catch { case _: java.io.IOException => 0L }
    val cores = spark.sparkContext.defaultParallelism
    val parts = math.max(8L, math.min(cores.toLong, size / bytesPerPartition)).toInt
    streamSession(spark, parts, drain)
  }
}
