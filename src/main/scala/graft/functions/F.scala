package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared scalar helpers used across query definitions. */
object F {

  /** Epoch milliseconds of a timestamp column, tolerant of TIMESTAMP_NTZ
    * (Spark 4 infers NTZ from naive parquet timestamps; with the session
    * pinned to UTC the cast is instant-preserving and matches DuckDB's
    * epoch_ms over the same naive values).
    */
  def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** Materialize an intermediate as a temp parquet stage table and read it
    * back — the multi-consumer reuse pattern. Chosen over `.persist()`:
    * an explicit stage table has predictable cost (one columnar write +
    * reads), survives executor loss for free, and on this runtime the
    * block-manager cache path is erratically slow. At cluster scale this
    * is the same pattern as a checkpoint/stage table in a pipeline DAG.
    */
  def materialize(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val shm = new java.io.File("/dev/shm/graft-stage")
    val base =
      if (shm.isDirectory || shm.mkdirs()) shm.toPath
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val tmp = java.nio.file.Files.createTempDirectory(base, "stage").toString
    // stage tables are session-scoped: reclaim the tmpfs space on exit
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scala.util.Try(org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp)))))
    df.write.mode("overwrite").parquet(tmp)
    df.sparkSession.read.parquet(tmp)
  }
}
