package graft.streaming

import org.apache.spark.sql.SparkSession

/** Drain-mode rewrite for AvailableNow streaming queries whose drained
  * result provably equals a batch plan.
  *
  * The round-12 DrainProfile numbers showed st5's ×100 drain cost IS the
  * state-store insert of the full in-window set (3.97M rows / 1.04 GB,
  * 41.7 task-sec of update inside one addBatch) — a cost the
  * exactly-once machinery mandates for RESUMABLE streams, but pure waste
  * for a one-shot drain: an inner stream-stream join drained from a
  * FRESH checkpoint in a SINGLE AvailableNow batch emits exactly the
  * batch join of its sources (every match forms inside the one batch;
  * the watermark only evicts state afterwards). So when those
  * preconditions hold, run the batch twin instead and record the drain
  * in the checkpoint.
  *
  * Preconditions — all checked, fall back to the stateful plan
  * otherwise:
  *  - rewrite enabled (`spark.graft.stream.drainRewrite`, default on;
  *    read from the PARENT session so callers/tests toggle it without
  *    reaching into the per-query session clone);
  *  - the checkpoint holds no Spark streaming state (`offsets/` empty or
  *    absent) — a checkpoint with prior progress belongs to Spark's own
  *    recovery rules, and a batch twin could double-emit what earlier
  *    batches already produced. What those rules then do depends on the
  *    SINK: a durable sink resumes exactly-once natively, while the
  *    drain queries' append-mode MEMORY sink does not support recovery
  *    at all, so Spark itself refuses the rerun loudly. Either way the
  *    invariant holds: no path over a used checkpoint can silently
  *    re-emit;
  *  - the caller's source is uncapped (no maxFilesPerTrigger /
  *    maxBytesPerTrigger), so AvailableNow drains in ONE data batch.
  *    This is a caller-declared fact (`singleBatch`), because only the
  *    caller knows its source options. It matters for exactness: across
  *    batch boundaries the advanced watermark DROPS late rows (file
  *    order is not time order), so a multi-batch drain can legally emit
  *    fewer matches than the batch join.
  *
  * Bookkeeping: a committed rewrite writes `_graft_drain` under the
  * checkpoint. A checkpoint that carries the marker is SPENT — it holds
  * no Spark state to resume from, and re-running anything over it
  * (rewrite or stateful) would re-emit the drained rows. Any later run
  * against it fails loudly with instructions, the same crash-safety
  * posture as [[ExactlyOnceBatches]]: an interrupted rewrite leaves no
  * marker, so the retry re-runs cleanly; the marker is written only
  * AFTER the twin's result is materialized.
  */
object DrainRewrite {

  /** Parent-session conf key: `true` (default) enables the rewrite. */
  val FlagKey = "spark.graft.stream.drainRewrite"

  private val MarkerName = "_graft_drain"

  sealed trait Decision
  /** Fresh checkpoint, single-batch drain: run the batch twin. */
  case object BatchDrain extends Decision
  /** Rewrite disabled or Spark state present: run the stateful plan. */
  case object Stateful extends Decision

  private def fs(ss: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(ss.sessionState.newHadoopConf())

  /** Decide how to drain `checkpoint`. Throws on a spent (marker-bearing)
    * checkpoint — see class doc. `parent` is the caller's session (flag
    * source); `ss` the per-query clone (filesystem conf).
    */
  def decide(parent: SparkSession, ss: SparkSession, checkpoint: String,
      singleBatch: Boolean): Decision = {
    val root = new org.apache.hadoop.fs.Path(checkpoint)
    val f = fs(ss, root)
    if (f.exists(new org.apache.hadoop.fs.Path(root, MarkerName)))
      throw new IllegalStateException(
        s"checkpoint $checkpoint was drained by a batch rewrite and holds no " +
          "resumable stream state: use a fresh checkpoint (full recompute), or " +
          s"disable $FlagKey from the FIRST run for an incrementally-resumable stream")
    // lenient boolean parse: Spark operators routinely write 1/0/on/off,
    // and a misspelling must name the key instead of crashing opaquely
    // (String.toBoolean) or silently picking a default
    val enabled = parent.conf.get(FlagKey, "true").trim.toLowerCase match {
      case "true" | "1" | "on" | "yes" => true
      case "false" | "0" | "off" | "no" => false
      case other => throw new IllegalArgumentException(
        s"$FlagKey must be a boolean (true/false/1/0/on/off), got '$other'")
    }
    val offsets = new org.apache.hadoop.fs.Path(root, "offsets")
    val hasSparkState =
      try f.exists(offsets) && f.listStatus(offsets).nonEmpty
      catch { case _: java.io.FileNotFoundException => false }
    if (enabled && singleBatch && !hasSparkState) BatchDrain else Stateful
  }

  /** Record a completed batch drain. Call AFTER the twin's result is
    * safely materialized — a crash before this point leaves the
    * checkpoint fresh, so the retry re-runs the whole drain (the same
    * "rerun the drain" recovery story every one-shot drain has).
    */
  def commit(ss: SparkSession, checkpoint: String, fingerprint: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(checkpoint)
    val f = fs(ss, root)
    graft.lake.FsOps.mkdirs(f, root)
    val out = f.create(new org.apache.hadoop.fs.Path(root, MarkerName), true)
    // JSON-escape the caller-supplied fingerprint (paths can legally
    // carry quotes/backslashes) so the marker always parses
    val esc = fingerprint.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    try out.write(
      s"""{"drained_by":"batch-rewrite","source":"$esc"}\n""".getBytes("UTF-8"))
    finally out.close()
  }
}
