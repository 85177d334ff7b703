package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper

/** Metrics-backed breakdown of the streaming-drain floor (st5/sk3 — the
  * two queries that stay >2x their DuckDB oracle at x100).
  *
  * Runs the named drain queries against a data dir, then decomposes each
  * micro-batch's `StreamingQueryProgress` into where the wall-clock went:
  * state-store update/removal/commit time (st5's symmetric join buffers),
  * `addBatch` (the actual work), and the trigger machinery around it
  * (offset log, planning, commit log). Prints one JSON line per query so
  * the numbers can be quoted verbatim in BENCH_scaled's drain note.
  *
  * Usage: runMain graft.tools.DrainProfile <sfDir> [query ...]
  *   (default queries: st5_interval_join sk3_stream_countmin)
  */
object DrainProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("st5_interval_join", "sk3_stream_countmin")
    val spark = graft.Sessions.local("graft-drain-profile")
    // this tool measures the STATEFUL drain machinery (the floor the
    // drain note quotes) — keep the batch-twin rewrite out of the way
    spark.conf.set(graft.streaming.DrainRewrite.FlagKey, "false")
    val mapper = new ObjectMapper()
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val progress = graft.streaming.DrainMetrics.lastProgress
      var batches = 0
      var inputRows = 0L
      var addBatchMs = 0L; var triggerMs = 0L
      var walCommitMs = 0L; var offsetMs = 0L; var planMs = 0L; var commitMs = 0L
      var stUpdateMs = 0L; var stRemoveMs = 0L; var stCommitMs = 0L
      var stRowsTotal = 0L; var stRowsUpdated = 0L; var stMemory = 0L
      for (pj <- progress) {
        val p = mapper.readTree(pj)
        batches += 1
        inputRows += p.path("numInputRows").asLong(0)
        val d = p.path("durationMs")
        addBatchMs += d.path("addBatch").asLong(0)
        triggerMs += d.path("triggerExecution").asLong(0)
        walCommitMs += d.path("walCommit").asLong(0)
        offsetMs += d.path("latestOffset").asLong(0) + d.path("getOffset").asLong(0)
        planMs += d.path("queryPlanning").asLong(0)
        commitMs += d.path("commitOffsets").asLong(0) + d.path("commitBatch").asLong(0)
        val ops = p.path("stateOperators")
        if (ops.isArray) {
          ops.forEach { op =>
            stUpdateMs += op.path("allUpdatesTimeMs").asLong(0)
            stRemoveMs += op.path("allRemovalsTimeMs").asLong(0)
            stCommitMs += op.path("commitTimeMs").asLong(0)
            stRowsUpdated += op.path("numRowsUpdated").asLong(0)
            stMemory = math.max(stMemory, op.path("memoryUsedBytes").asLong(0))
            stRowsTotal = math.max(stRowsTotal, op.path("numRowsTotal").asLong(0))
          }
        }
      }
      // state times are summed across PARTITION tasks (parallel wall
      // clock), durationMs entries are driver-side serial milliseconds;
      // report both and let the note say which dominates
      println(
        s"""{"query":"$name","dir":"$dir","wall_sec":${fmt(wall)},"rows":$rows,""" +
          s""""batches":$batches,"input_rows":$inputRows,""" +
          s""""driver_ms":{"trigger":$triggerMs,"addBatch":$addBatchMs,""" +
          s""""walCommit":$walCommitMs,"latestOffset":$offsetMs,""" +
          s""""planning":$planMs,"commitLog":$commitMs},""" +
          s""""state_task_ms":{"update":$stUpdateMs,"remove":$stRemoveMs,""" +
          s""""commit":$stCommitMs},""" +
          s""""state":{"rows_total":$stRowsTotal,"rows_updated":$stRowsUpdated,""" +
          s""""memory_bytes":$stMemory}}""")
    }
    spark.stop()
  }
}
