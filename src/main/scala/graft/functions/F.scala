package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared scalar helpers used across query definitions. */
object F {

  /** Epoch milliseconds of a timestamp column, tolerant of TIMESTAMP_NTZ
    * (Spark 4 infers NTZ from naive parquet timestamps; with the session
    * pinned to UTC the cast is instant-preserving and matches DuckDB's
    * epoch_ms over the same naive values).
    */
  def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** Parse a timestamp STRING as UTC regardless of the JVM default zone
    * — the engine-wide convention (the session is pinned UTC; reference
    * treats every timestamp as UTC). Accepts instant forms (`...Z`),
    * offset forms (`+02:00`), and naive `T`/space forms, which are
    * interpreted as UTC: a default-zone parse (`Timestamp.valueOf`)
    * would make the same text mean different instants on
    * differently-zoned drivers. Junk throws IllegalArgumentException
    * (the wire boundary maps it to a clean 400).
    */
  def parseUtcTimestamp(s: String): java.sql.Timestamp = {
    val t = s.trim
    try java.sql.Timestamp.from(java.time.Instant.parse(t))
    catch { case _: Exception =>
      try java.sql.Timestamp.from(java.time.OffsetDateTime.parse(t).toInstant)
      catch { case _: Exception =>
        val naive = t.replace(" ", "T").stripSuffix("Z")
        try java.sql.Timestamp.from(java.time.LocalDateTime.parse(naive)
          .toInstant(java.time.ZoneOffset.UTC))
        catch { case _: java.time.DateTimeException =>
          throw new IllegalArgumentException(s"invalid timestamp: `$s`")
        }
      }
    }
  }

  /** F4 columnar twin of [[graft.ops.Explode.stripNamespace]]: drop a
    * trailing `.sig` namespace; ids with no dot, a leading dot only, or
    * nothing before the dot pass through unchanged.
    */
  def stripNamespace(id: Column): Column = {
    val suffix = substring_index(id, ".", -1)
    val keep = length(id) - length(suffix) - 1
    when(keep > 0, id.substr(lit(1), keep)).otherwise(id)
  }

  /** Root directory for stage tables. Cluster-safe by construction:
    *
    *  - explicit override via `spark.graft.stage.dir` always wins (set it
    *    to a shared-FS path, e.g. `<table>/_graft/stage`, on a cluster);
    *  - `local[*]` masters default to node-local tmpfs (`/dev/shm`) — the
    *    single-JVM fast path;
    *  - any non-local master defaults to `spark.sql.warehouse.dir`, which
    *    on a real deployment points at the shared filesystem every
    *    executor can read. A node-local path here would shred the staged
    *    table across executors' private disks.
    */
  def stageRoot(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.stage.dir").getOrElse {
      if (spark.sparkContext.isLocal) {
        val shm = new java.io.File("/dev/shm/graft-stage")
        if (shm.isDirectory || shm.mkdirs()) shm.getAbsolutePath
        else System.getProperty("java.io.tmpdir")
      } else spark.conf.get("spark.sql.warehouse.dir") + "/_graft_stage"
    }

  /** Materialize an intermediate as a temp parquet stage table and read it
    * back — the multi-consumer reuse pattern. Chosen over `.persist()`:
    * an explicit stage table has predictable cost (one columnar write +
    * reads), survives executor loss for free, and on this runtime the
    * block-manager cache path is erratically slow. At cluster scale this
    * is the same pattern as a checkpoint/stage table in a pipeline DAG.
    */
  // Exit-time reclamation for stage scratch paths: ONE shutdown hook
  // draining a shared list, registered on first use. A hook per path
  // (the previous shape) retains a Thread per stageTempPath call — a
  // long-lived serve process running many streaming drains accumulates
  // them unboundedly. Each entry carries its own Hadoop conf so the
  // delete resolves the path's filesystem the way the writer did
  // (shared-FS schemes included), even after the session is stopped.
  private val stageTempPaths =
    new java.util.concurrent.ConcurrentLinkedQueue[
      (String, org.apache.hadoop.conf.Configuration)]
  private lazy val stageTempHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var e = stageTempPaths.poll()
      while (e != null) {
        scala.util.Try {
          val p = new org.apache.hadoop.fs.Path(e._1)
          p.getFileSystem(e._2).delete(p, true)
        }
        e = stageTempPaths.poll()
      }
    }))

  /** Allocate a session-scoped scratch path under the stage root and
    * register exit-time reclamation via the path's own filesystem (works
    * for shared-FS schemes, not just file:).
    */
  def stageTempPath(spark: SparkSession, prefix: String): String = {
    val tmp = s"${stageRoot(spark)}/$prefix-${java.util.UUID.randomUUID().toString}"
    stageTempHook
    stageTempPaths.add((tmp, spark.sparkContext.hadoopConfiguration))
    tmp
  }

  /** True when the frame is already a plain (possibly projected/filtered)
    * file scan — re-reading it costs the same as re-reading a stage copy,
    * so staging it again would only add a redundant write. Used by
    * iterative operators whose inputs are usually session-staged tables.
    */
  def isPlainScan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
    def loop(p: LogicalPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case Project(_, child) => loop(child)
      case Filter(_, child) => loop(child)
      case _ => false
    }
    loop(df.queryExecution.analyzed)
  }

  /** [[materialize]] unless the input is already a plain scan. */
  def materializeIfNeeded(df: DataFrame): DataFrame =
    if (isPlainScan(df)) df else materialize(df)

  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val tmp = stageTempPath(spark, "stage")
    df.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp)
  }

  /** Materialize AND compute one aggregate metric in the same job via
    * `observe` — iterative operators (path closure, label propagation)
    * need a convergence measure per round, and a separate count() over
    * the staged output would double the round's job count.
    */
  def materializeObserved(df: DataFrame, metric: Column): (DataFrame, Long) = {
    val spark = df.sparkSession
    val tmp = stageTempPath(spark, "stage")
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, metric.as("m")).write.mode("overwrite").parquet(tmp)
    val m = obs.get("m") match {
      case null => 0L
      case n: Number => n.longValue()
    }
    (spark.read.parquet(tmp), m)
  }

  /** [[materializeObserved]] with two metrics in the one job — for loops
    * that steer on two measures per round (e.g. k-core's convergence
    * count + graph size).
    */
  def materializeObserved2(df: DataFrame, m1: Column,
      m2: Column): (DataFrame, Long, Long) = {
    val spark = df.sparkSession
    val tmp = stageTempPath(spark, "stage")
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, m1.as("m1"), m2.as("m2")).write.mode("overwrite").parquet(tmp)
    def asLong(v: Any): Long = v match {
      case null => 0L
      case n: Number => n.longValue()
    }
    (spark.read.parquet(tmp), asLong(obs.get("m1")), asLong(obs.get("m2")))
  }
}
