package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** The shared windowed-aggregation body — ONE definition feeding the
    * batch form, the streaming plan, and the drain-rewrite twin, so the
    * three can't drift. Output: (w struct, event_type, n, total).
    */
  private def windowAggOf(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))

  /** Tumbling 1-hour windows per event type — batch form. */
  def windowAggBatch(events: DataFrame): DataFrame =
    windowAggOf(events)
      .select(unix_millis(col("w.start")).as("window_ms"), col("event_type"),
        col("n"), col("total"))

  /** The same aggregation as a real Structured Streaming query: file
    * source → watermark → windowed agg → memory sink, drained with
    * Trigger.AvailableNow. Returns the finished result as a DataFrame.
    *
    * ONE-SHOT drains take the [[DrainRewrite]] fast path (same flag and
    * preconditions as st5/sk3): a COMPLETE-mode aggregation drained from
    * a fresh checkpoint in a single AvailableNow batch emits exactly the
    * aggregation of that one batch — Complete mode outputs the full
    * state every batch, the single batch IS the whole table, and the
    * watermark never gates Complete output (it only evicts state after
    * emission). count is exact and the DECIMAL(18,2) sum is exact (order
    * never changes a decimal sum), so the twin is bit-identical. The
    * stateful plan below runs unchanged for resumable deployments (prior
    * Spark state, rate-capped sources, or the flag off) — a drain there
    * pays the per-batch state-store commit machinery the rewrite exists
    * to skip.
    */
  def windowAggStreaming(spark: SparkSession, dir: String): DataFrame = {
    val project = (df: DataFrame) =>
      df.select(unix_millis(col("w.start")).as("window_ms"), col("event_type"),
        col("n"), col("total"))
    // the checkpoint below is a THROWAWAY UUID no other run can observe,
    // so there is no marker to claim/commit and nothing durable is
    // emitted (the st9 precedent): the flag alone picks the plan, and
    // the twin returns lazily — recompute is pure. The twin plans on the
    // PARENT session (cached table schema, no clone): a batch aggregate
    // needs no state-store sizing. The uncapped file source drains in
    // one batch (the singleBatch precondition).
    if (DrainRewrite.enabled(spark))
      return project(windowAggOf(graft.Tables.events(spark, dir)))
    // state partitioning sized to KEY cardinality (windows × event types
    // — dozens) on a query-scoped session clone, never by mutating the
    // shared session conf (see [[StreamConf.streamSession]])
    val ss = StreamConf.streamSession(spark)
    val batch = ss.read.parquet(s"$dir/events.parquet")
    val ckpt = graft.functions.F.stageTempPath(ss, "ckpt")
    val src = ss.readStream
      .schema(batch.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val events = graft.Tables.normalizeTs(src)
    val agg = windowAggOf(events.withWatermark("ts", "1 hour"))
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      // checkpoint on the session stage root (tmpfs under a local
      // master): state-store commits are many tiny files and this
      // host's disk has bursty metadata latency; a cluster deployment
      // sets spark.graft.stage.dir to shared storage
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    project(ss.table(name))
  }

  /** STREAM-STATIC enrichment join: the event stream joined to the
    * customer→nation dimension (a static broadcastable table) and
    * aggregated per nation — the standard continuous-enrichment shape
    * (fact stream × dimension snapshot). The join itself is STATELESS:
    * each micro-batch hash-joins against the broadcast dimension, so the
    * only streaming state is the constant #nations aggregate — at
    * 100 TB/day the dimension broadcast is what keeps enrichment off the
    * shuffle entirely. Drained with AvailableNow ⇒ equals the batch join
    * and the SQL twin is the oracle.
    */
  def streamStaticEnrich(spark: SparkSession, dir: String): DataFrame = {
    // the enrichment body shared by the streaming plan and the
    // drain-rewrite twin — one definition, no drift
    def enrichAggOf(session: SparkSession, events: DataFrame): DataFrame = {
      val dim = broadcast(
        graft.Tables.customer(session, dir)
          .select(col("c_custkey").as("user_id"), col("c_nationkey"))
          .join(graft.Tables.nation(session, dir),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("user_id"), col("n_name")))
      events.join(dim, Seq("user_id"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
    }
    // ONE-SHOT drains take the [[DrainRewrite]] fast path: the join is
    // STATELESS (per-batch hash join against the broadcast dimension) and
    // the Complete-mode aggregate over a fresh-checkpoint single-batch
    // drain equals the batch aggregate exactly (the one batch is the
    // whole table; count and the decimal sum are order-exact). The
    // checkpoint below is a throwaway UUID (st9 precedent: flag-only
    // gate, no marker, lazy twin on the PARENT session — cached schemas,
    // no clone); the uncapped file source drains in one batch.
    if (DrainRewrite.enabled(spark))
      return enrichAggOf(spark, graft.Tables.events(spark, dir))
    val ss = StreamConf.streamSession(spark)
    val batch = ss.read.parquet(s"$dir/events.parquet")
    val ckpt = graft.functions.F.stageTempPath(ss, "ckpt")
    val src = graft.Tables.normalizeTs(
      ss.readStream
        .schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val agg = enrichAggOf(ss, src)
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name)
  }

  /** Click/error projections shared by the streaming plan and its batch
    * drain twin — one definition, so the two can't drift.
    */
  private def clicksOf(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("cts"))
  private def errorsOf(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("ets"))
  private def intervalJoinCond: Column =
    col("user_id") === col("err_user") &&
      col("ets") >= col("cts") - expr("INTERVAL 2 HOURS") &&
      col("ets") <= col("cts")
  private def intervalJoinProject(joined: DataFrame): DataFrame =
    joined.select(col("click_id"), col("err_id"),
      unix_millis(col("cts")).as("click_ms"),
      unix_millis(col("ets")).as("err_ms"))

  /** Stream-stream INTERVAL JOIN: clicks joined to the same user's
    * errors from the preceding 2 hours, both sides watermarked so the
    * join state is bounded — Spark buffers each side only for
    * (watermark + interval), never the whole stream. This is the
    * streaming twin of [[graft.ops.TemporalJoins]]: enrichment that at
    * 100 TB/day runs continuously instead of as nightly batch. Drained
    * with Trigger.AvailableNow against the static events table, so the
    * result is deterministic and oracle-checkable against the batch SQL
    * interval join.
    *
    * ONE-SHOT drains take the [[DrainRewrite]] fast path (default-on,
    * `spark.graft.stream.drainRewrite`): a fresh-checkpoint single-batch
    * AvailableNow drain of an INNER join equals the batch join exactly
    * (every match forms inside the one batch; the watermark only evicts
    * state afterwards), and the round-12 DrainProfile decomposition
    * showed the stateful drain's cost at ×100 IS the state-store insert
    * of the full in-window set — buffering 1 GB of rows to read them
    * back once. The rewrite runs the same projections/condition over the
    * batch read, materializes, and marks the checkpoint spent; resumable
    * deployments (prior Spark state, rate-capped sources, or the flag
    * off) keep the stateful plan below.
    */
  def intervalJoinStreaming(spark: SparkSession, dir: String,
      checkpoint: Option[String] = None): DataFrame = {
    // join state grows with the data (both sides buffered for
    // watermark+interval), so size the state stores to the source
    val ss = StreamConf.streamSessionFor(spark, dir)
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = checkpoint.getOrElse(
      graft.functions.F.stageTempPath(ss, "ckpt"))
    val batch = ss.read.parquet(s"$dir/events.parquet")
    // the file source below sets no maxFilesPerTrigger/maxBytesPerTrigger,
    // so AvailableNow drains it in ONE data batch — the singleBatch
    // precondition the rewrite's exactness argument needs
    DrainRewrite.decide(spark, ss, ckpt, singleBatch = true) match {
      case DrainRewrite.BatchDrain =>
        return DrainRewrite.runClaimed(ss, ckpt, s"$dir/events.parquet") {
          val ev = graft.Tables.normalizeTs(batch)
          graft.functions.F.materialize(intervalJoinProject(
            clicksOf(ev).join(errorsOf(ev), intervalJoinCond)))
        }
      case DrainRewrite.Stateful => ()
    }
    // An INNER stream-stream join emits each match in the micro-batch
    // where it forms; the trailing no-data batch only advances the
    // watermark to evict state — for a drain that is a full extra
    // commit round over 4 state stores × partitions with no new output.
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    def src(): DataFrame = graft.Tables.normalizeTs(
      ss.readStream
        .schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val clicks = clicksOf(src()).withWatermark("cts", "1 hour")
    val errors = errorsOf(src()).withWatermark("ets", "1 hour")
    val joined = clicks.join(errors, intervalJoinCond)
    // Guard for the noDataMicroBatches=false above: that setting is safe
    // ONLY while no output here is watermark-GATED (an inner join emits
    // matches in the micro-batch where they form; the watermark only
    // evicts state). If this query ever gains an append-mode aggregate,
    // a dropDuplicates, or an outer join arm, its final rows would wait
    // on a no-data batch that never comes — fail loudly at plan time
    // instead of silently dropping them.
    joined.queryExecution.analyzed.foreach {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        throw new IllegalStateException(
          s"watermark-gated aggregate under noDataMicroBatches=false: $a")
      case d: org.apache.spark.sql.catalyst.plans.logical.Deduplicate =>
        throw new IllegalStateException(
          s"watermark-gated dedupe under noDataMicroBatches=false: $d")
      case d: org.apache.spark.sql.catalyst.plans.logical.DeduplicateWithinWatermark =>
        throw new IllegalStateException(
          s"watermark-gated dedupe under noDataMicroBatches=false: $d")
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType != org.apache.spark.sql.catalyst.plans.Inner =>
        throw new IllegalStateException(
          s"non-inner stream join under noDataMicroBatches=false: ${j.joinType}")
      case _ => ()
    }
    val q = joined.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    DrainMetrics.capture(q)
    intervalJoinProject(ss.table(name))
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

  /** Drain-rewrite twin of the st6 single-batch drain: every session
    * except each user's LAST. Exactness: a fresh-checkpoint AvailableNow
    * drain with no source caps feeds the whole table to
    * [[sessionizeStreaming]] as ONE batch, so each user's handler sees
    * all their events, sorts by (ts, event_id) — the same total order as
    * [[sessionizeBatch]]'s window — and emits every gap-closed session
    * while the final one stays in state (NoTimeout: the trailing no-data
    * batch fires no timeouts and emits nothing). Column order/types match
    * the memory sink's [[SessionOut]] encoding (user_id/event_id are
    * int64 in the source; a narrower source would be upcast by `.as[Ev]`,
    * so the twin upcasts identically).
    */
  private[streaming] def closedSessionsBatch(events: DataFrame,
      gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    sessionizeBatch(events.select(col("user_id").cast("long").as("user_id"),
        col("ts"), col("event_id").cast("long").as("event_id")), gapMinutes)
      .withColumn("__mx", max(col("session_seq")).over(byUser))
      .filter(col("session_seq") < col("__mx"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("start_ms"), col("end_ms"))
  }

  /** Drain-rewrite twin of the st7 single-batch drain: the sessions with
    * `end + gap <= max event time`. Exactness: the data batch folds every
    * event with the watermark still at its initial value (nothing
    * closes), and the final AvailableNow batch runs with watermark
    * `max(ts) − 0` (delay 0, ms-floored — `unix_millis` floors the same
    * way the engine's event-time stats do); event-time timeouts fire for
    * every group whose earliest open interval is closable, and each
    * handler emits exactly its intervals with `end + gap <= wm`. The
    * interval-merge fold is order-independent (1-D union under
    * within-gap adjacency), so the folded intervals ARE the batch
    * gaps-and-islands sessions. Output column order/types match the
    * memory sink's [[SessionWin]] encoding.
    */
  private[streaming] def timedOutSessionsBatch(events: DataFrame,
      gapMinutes: Int): DataFrame = {
    val gapMs = gapMinutes * 60L * 1000
    val ev = events.select(col("user_id").cast("long").as("user_id"),
      col("ts"), col("event_id").cast("long").as("event_id"))
    val wm = ev.agg(max(unix_millis(col("ts"))).as("__wm"))
    sessionizeBatch(ev, gapMinutes)
      .crossJoin(broadcast(wm)) // 1-row broadcast, never a real cartesian
      .filter(col("end_ms") + lit(gapMs) <= col("__wm"))
      .select(col("user_id"), col("n_events"), col("start_ms"), col("end_ms"))
  }

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
    // ONE-SHOT drains take the [[DrainRewrite]] fast path: see
    // [[closedSessionsBatch]] for the exactness argument. The stateful
    // drain's cost at scale is the per-user state-store insert of the
    // full user set, read back once — the same pure-drain waste st5's
    // rewrite removes. Resumable deployments (flag off) keep the
    // stateful plan. Throwaway UUID checkpoint (st9 precedent: flag-only
    // gate, no marker, lazy twin on the PARENT session); uncapped file
    // source ⇒ one data batch.
    if (DrainRewrite.enabled(spark))
      return closedSessionsBatch(graft.Tables.events(spark, dir), gapMinutes)
    // per-user session state: user cardinality grows with the corpus
    val ss = StreamConf.streamSessionFor(spark, dir)
    import ss.implicits._
    val batch = ss.read.parquet(s"$dir/events.parquet")
    val ckpt = graft.functions.F.stageTempPath(ss, "ckpt")
    val src = graft.Tables.normalizeTs(
      ss.readStream
        .schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val out = sessionizeStreaming(
      src.select(col("user_id"), col("ts"), col("event_id")).as[Ev], gapMinutes)
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = out.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name)
  }

  /** One open session interval per user: [start, end] with its event
    * count. Intervals in a state list are disjoint and separated by more
    * than the gap.
    */
  case class Interval(start: Long, end: Long, n: Long)
  case class IntervalState(intervals: List[Interval])
  case class SessionWin(user_id: Long, n_events: Long, start_ms: Long, end_ms: Long)

  /** Event-time-timeout sessionization — the CONTINUOUS-stream form of
    * [[sessionizeStreaming]]: a session closes when the watermark passes
    * `end + gap`, so an idle user's final session is emitted without
    * waiting for their next event (the NoTimeout variant's gap).
    *
    * Folds INCREMENTALLY: each event merges into a per-user set of open
    * session intervals one at a time — no `toSeq.sortBy` buffer of the
    * micro-batch, so a bot user with 10⁸ events in one batch costs
    * O(#open intervals) memory, not O(events). Out-of-order events
    * within the watermark are handled exactly: an event either extends
    * an adjacent interval, bridges two intervals into one (sessions that
    * looked separate merge when the gap between them is filled), or
    * opens a new interval. This is the session-window merge algorithm
    * Spark's native `session_window` aggregation applies internally,
    * here with exact event counts carried through merges.
    *
    * State is bounded and self-cleaning: a user's state holds only OPEN
    * intervals (closed ones are emitted and dropped), and the state is
    * REMOVED once no interval remains — idle users cost nothing, unlike
    * a per-user counter design. Output therefore carries no session_seq;
    * sessions are identified by (user_id, start_ms), which the batch
    * twin reproduces.
    *
    * Drained with watermark delay 0 against a static table, the emitted
    * set is exactly the batch sessions with `end + gap <= max event ts`
    * — the final (still-open) session of each user whose last activity
    * is within the gap of the stream's end stays in state.
    */
  def sessionizeStreamingEventTime(events: Dataset[Ev], gapMinutes: Int,
      delay: String = "0 seconds"): Dataset[SessionWin] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000
    // merge one event into the disjoint interval list (kept sorted by
    // start): at most the two adjacent intervals can be within the gap
    def mergeEvent(ivs: List[Interval], t: Long): List[Interval] = {
      val (near, far) = ivs.partition(iv => t >= iv.start - gapMs && t <= iv.end + gapMs)
      val merged =
        if (near.isEmpty) Interval(t, t, 1L)
        else Interval(math.min(near.map(_.start).min, t),
          math.max(near.map(_.end).max, t), near.map(_.n).sum + 1L)
      (merged :: far).sortBy(_.start)
    }
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[IntervalState, SessionWin](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[IntervalState]) =>
          val wm = state.getCurrentWatermarkMs()
          var ivs = state.getOption.map(_.intervals).getOrElse(Nil)
          if (!state.hasTimedOut)
            for (e <- evs) ivs = mergeEvent(ivs, e.ts.getTime)
          // intervals are disjoint with > gap between them, so the
          // closable prefix (by start) is exactly those with end+gap <= wm
          val (closed, open) = ivs.partition(_.end + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(IntervalState(open))
            // arm for the earliest possible close; the -1/+1 bracket keeps
            // the fire point correct whether the engine's comparison
            // against the watermark is strict or not, and satisfies the
            // "timeout must be set beyond the watermark" requirement
            state.setTimeoutTimestamp(
              math.max(open.map(_.end).min + gapMs - 1, wm + 1))
          }
          closed.sortBy(_.start)
            .map(iv => SessionWin(user, iv.n, iv.start, iv.end)).iterator
      }
  }

  /** Drained file-source driver for [[sessionizeStreamingEventTime]] —
    * same harness shape as [[sessionizeStreamingFromDir]]. AvailableNow
    * runs the data batch (watermark still at its initial value), then
    * the engine schedules a final batch because the advanced watermark
    * crossed pending event-time timeouts — closed sessions flush there.
    */
  def sessionizeStreamingEventTimeFromDir(spark: SparkSession, dir: String,
      gapMinutes: Int): DataFrame = {
    // ONE-SHOT drains take the [[DrainRewrite]] fast path: see
    // [[timedOutSessionsBatch]] for the exactness argument. Same scale
    // rationale as st6 above; throwaway UUID checkpoint (st9 precedent:
    // flag-only gate, no marker, lazy twin on the PARENT session);
    // uncapped file source ⇒ one data batch.
    if (DrainRewrite.enabled(spark))
      return timedOutSessionsBatch(graft.Tables.events(spark, dir), gapMinutes)
    val ss = StreamConf.streamSessionFor(spark, dir)
    import ss.implicits._
    val batch = ss.read.parquet(s"$dir/events.parquet")
    val ckpt = graft.functions.F.stageTempPath(ss, "ckpt")
    val src = graft.Tables.normalizeTs(
      ss.readStream
        .schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val out = sessionizeStreamingEventTime(
      src.select(col("user_id"), col("ts"), col("event_id")).as[Ev], gapMinutes)
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = out.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name)
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

  /** Stateful streaming sessionization with per-user session ORDINALS
    * (session_seq): one state record per user; closed sessions are
    * emitted when the gap is exceeded within the stream or on state
    * timeout. The batch twin above is the oracle for its semantics.
    *
    * Per-key memory bound — read before using on a continuous stream:
    * the ordinal semantics require a total event order per user, so each
    * invocation SORTS the user's micro-batch (`evs.toSeq.sortBy`) —
    * memory is O(user's events in ONE micro-batch). That is fine for the
    * drained AvailableNow form (this operator's gate) and for
    * micro-batches bounded by trigger interval × per-user rate, but a
    * bot-grade key in a huge batch pays O(batch) memory. For continuous
    * deployments prefer [[sessionizeStreamingEventTime]] (st7): it folds
    * incrementally in O(#open intervals) and closes idle sessions at the
    * watermark, at the cost of not carrying an ordinal.
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
