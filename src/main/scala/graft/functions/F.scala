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
}
