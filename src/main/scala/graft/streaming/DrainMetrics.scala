package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Per-batch progress of the last drained streaming query, captured for
  * the profiling tool ([[graft.tools.DrainProfile]]). The drain helpers
  * stash `recentProgress` right after `awaitTermination`; a mutable slot
  * (not a return value) keeps the oracle-facing query signatures
  * DataFrame-only. Bounded: Spark retains at most
  * `spark.sql.streaming.numRecentProgressUpdates` (default 100) entries.
  */
object DrainMetrics {
  @volatile private[graft] var lastProgress: Seq[String] = Nil

  private[graft] def capture(q: StreamingQuery): Unit =
    lastProgress = q.recentProgress.toSeq.map(_.json)
}
