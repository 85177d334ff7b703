package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.DecimalType

/** Streaming operators over the events table: watermarked tumbling-window
  * aggregation (Structured Streaming), and sessionization both as a batch
  * gaps-and-islands computation and as a stateful
  * `flatMapGroupsWithState` stream (SURVEY.md §2.9 — the reference is
  * micro-batch incremental; these are the Spark-native streaming forms of
  * its ST1/ST3 machinery).
  *
  * Scale: the windowed aggregate is keyed on (window, event_type) — state
  * size is windows × types, independent of input volume; the watermark
  * bounds state retention. Sessionization state is one small record per
  * active user key, timed out by the processing-time/watermark policy.
  */
object EventStream {

  /** Tumbling 1-hour windows per event type — batch form. */
  def windowAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(unix_millis(col("w.start")).as("window_ms"), col("event_type"),
        col("n"), col("total"))

  /** The same aggregation as a real Structured Streaming query: file
    * source → watermark → windowed agg → memory sink, drained with
    * Trigger.AvailableNow. Returns the finished result as a DataFrame.
    */
  def windowAggStreaming(spark: SparkSession, dir: String): DataFrame = {
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val src = spark.readStream
      .schema(batch.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val events = graft.Tables.normalizeTs(src)
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // streaming state partitioning is pinned at first run and sized to the
    // KEY cardinality (windows × event types — dozens), not the batch
    // shuffle width: every state partition writes delta/commit files per
    // micro-batch, so 32 near-empty state stores would quadruple the
    // checkpoint file traffic for nothing
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q = try {
      agg.writeStream
        .outputMode(OutputMode.Complete())
        .format("memory")
        .queryName(name)
        // checkpoint on the session stage root (tmpfs under a local
        // master): state-store commits are many tiny files and this
        // host's disk has bursty metadata latency; a cluster deployment
        // sets spark.graft.stage.dir to shared storage
        .option("checkpointLocation",
          s"${graft.functions.F.stageRoot(spark)}/ckpt-$name")
        .trigger(Trigger.AvailableNow())
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    q.awaitTermination()
    spark.table(name)
      .select(unix_millis(col("w.start")).as("window_ms"), col("event_type"),
        col("n"), col("total"))
  }

  /** Stream-stream INTERVAL JOIN: clicks joined to the same user's
    * errors from the preceding 2 hours, both sides watermarked so the
    * join state is bounded — Spark buffers each side only for
    * (watermark + interval), never the whole stream. This is the
    * streaming twin of [[graft.ops.TemporalJoins]]: enrichment that at
    * 100 TB/day runs continuously instead of as nightly batch. Drained
    * with Trigger.AvailableNow against the static events table, so the
    * result is deterministic and oracle-checkable against the batch SQL
    * interval join.
    */
  def intervalJoinStreaming(spark: SparkSession, dir: String): DataFrame = {
    val batch = spark.read.parquet(s"$dir/events.parquet")
    def src(): DataFrame = graft.Tables.normalizeTs(
      spark.readStream
        .schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val clicks = src().filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val errors = src().filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("ets"))
      .withWatermark("ets", "1 hour")
    val joined = clicks.join(errors,
      col("user_id") === col("err_user") &&
        col("ets") >= col("cts") - expr("INTERVAL 2 HOURS") &&
        col("ets") <= col("cts"))
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q = try {
      joined.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(name)
        .option("checkpointLocation",
          s"${graft.functions.F.stageRoot(spark)}/ckpt-$name")
        .trigger(Trigger.AvailableNow())
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    q.awaitTermination()
    spark.table(name).select(col("click_id"), col("err_id"),
      unix_millis(col("cts")).as("click_ms"),
      unix_millis(col("ets")).as("err_ms"))
  }

  /** Batch sessionization: gaps-and-islands with a session break when the
    * per-user gap exceeds `gapMinutes`. One shuffle on user_id; the two
    * windows share the same partitioning.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__brk",
        when(col("__prev").isNull ||
          unix_millis(col("ts")) - unix_millis(col("__prev")) > gapSec * 1000, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("__brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        unix_millis(min(col("ts"))).as("start_ms"),
        unix_millis(max(col("ts"))).as("end_ms"))
  }

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long)
  case class SessionState(start: Long, last: Long, n: Long, seq: Long)
  case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
      start_ms: Long, end_ms: Long)

  /** Drained file-source form of [[sessionizeStreaming]]: the stateful
    * flatMapGroupsWithState sessionizer run as a real streaming query
    * over the events table and collected from the memory sink. Emits
    * CLOSED sessions only — each user's final session is still open in
    * state when the stream drains — so the oracle twin is the batch
    * sessionization minus every user's last session. Deterministic:
    * AvailableNow with no file/byte trigger cap processes the table in
    * one micro-batch, and the handler sorts each user's events by
    * (ts, event_id) before folding.
    */
  def sessionizeStreamingFromDir(spark: SparkSession, dir: String,
      gapMinutes: Int): DataFrame = {
    import spark.implicits._
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val src = graft.Tables.normalizeTs(
      spark.readStream
        .schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val out = sessionizeStreaming(
      src.select(col("user_id"), col("ts"), col("event_id")).as[Ev], gapMinutes)
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q = try {
      out.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(name)
        .option("checkpointLocation",
          s"${graft.functions.F.stageRoot(spark)}/ckpt-$name")
        .trigger(Trigger.AvailableNow())
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    q.awaitTermination()
    spark.table(name)
  }

  /** Streaming exact dedupe for continuous ingest: duplicate records
    * (same content key) are dropped with BOUNDED state —
    * `dropDuplicatesWithinWatermark` retains a key only for the watermark
    * delay, so state size is ingest-rate × delay, never corpus size. The
    * batch twin is a plain `dropDuplicates`; at 100 TB/day this is the
    * only dedupe shape whose state survives unbounded streams.
    */
  def dedupeStreaming(events: Dataset[Ev], delay: String = "1 hour"): Dataset[Ev] =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stateful streaming sessionization: one state record per user; closed
    * sessions are emitted when the gap is exceeded within the stream or on
    * state timeout. The batch twin above is the oracle for its semantics.
    */
  def sessionizeStreaming(events: Dataset[Ev], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(-1, -1, 0, 0))
          val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
          for (e <- sorted) {
            val t = e.ts.getTime
            if (st.n == 0) st = SessionState(t, t, 1, st.seq + 1)
            else if (t - st.last > gapMs) {
              out += SessionOut(user, st.seq, st.n, st.start, st.last)
              st = SessionState(t, t, 1, st.seq + 1)
            } else st = st.copy(last = t, n = st.n + 1)
          }
          state.update(st)
          out.iterator
      }
  }
}
