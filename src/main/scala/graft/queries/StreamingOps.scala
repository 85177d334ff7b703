package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exports
import graft.streaming.EventStream

/** Streaming/incremental operators (SURVEY.md §2.9) and export round trips
  * (S9-S12), each oracle-checked: the streaming window agg must equal the
  * batch SQL twin; the CSV/JSON round trips must reproduce their source.
  */
object StreamingOps {

  // Tumbling-window aggregation, batch form.
  def st1WindowAgg(spark: SparkSession, dir: String): DataFrame =
    EventStream.windowAggBatch(Tables.events(spark, dir))
      .orderBy(col("window_ms"), col("event_type"))

  // The same aggregation executed as a real Structured Streaming query
  // (file source → watermark → window → memory sink, Trigger.AvailableNow).
  def st0StreamWindow(spark: SparkSession, dir: String): DataFrame =
    EventStream.windowAggStreaming(spark, dir)
      .orderBy(col("window_ms"), col("event_type"))

  // Sessionization (30-minute inactivity gap), batch gaps-and-islands.
  def st2Sessionize(spark: SparkSession, dir: String): DataFrame =
    EventStream.sessionizeBatch(Tables.events(spark, dir), gapMinutes = 30)
      .orderBy(col("user_id"), col("session_seq"))

  // Stream-stream interval join (clicks × same-user errors within the
  // trailing 2 hours), both sides watermarked — bounded join state.
  def st5IntervalJoin(spark: SparkSession, dir: String): DataFrame =
    EventStream.intervalJoinStreaming(spark, dir)
      .orderBy(col("click_id"), col("err_id"))

  // Stateful flatMapGroupsWithState sessionization drained against the
  // static table — closed sessions only; oracle = batch sessions minus
  // each user's final (still-open) session.
  def st6StreamSessionize(spark: SparkSession, dir: String): DataFrame =
    EventStream.sessionizeStreamingFromDir(spark, dir, gapMinutes = 30)
      .orderBy(col("user_id"), col("session_seq"))

  // Event-time-timeout sessionization: idle sessions close when the
  // watermark passes end + gap (no waiting for the user's next event),
  // folded incrementally via interval merge — oracle = batch sessions
  // with end + gap <= the table's max event time.
  def st7SessionTimeout(spark: SparkSession, dir: String): DataFrame =
    EventStream.sessionizeStreamingEventTimeFromDir(spark, dir, gapMinutes = 30)
      .orderBy(col("user_id"), col("start_ms"))

  // S9/S10: sorted CSV export and re-import round trip.
  def s9CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tmp = graft.functions.F.stageTempPath(spark, "csv-rt")
    Exports.csvExport(docs, tmp, sortCol = "doc_id")
    Exports.csvImport(spark, tmp, docs.schema)
      .orderBy(col("doc_id"))
  }

  // S11/S12: JSON-lines export and re-import round trip over assembled
  // entity rows (the a4 flattened form — shares a4's oracle semantics).
  def s11JsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val entities = StatementOps.a4EntityAssembly(spark, dir)
    val tmp = graft.functions.F.stageTempPath(spark, "json-rt")
    Exports.jsonExport(entities, tmp, sortCol = "entity_id")
    Exports.jsonImport(spark, tmp, entities.schema)
      .orderBy(col("entity_id"))
  }

  /** st8: stream-static enrichment (stateless broadcast join per
    * micro-batch + constant #nations aggregate) — see
    * [[graft.streaming.EventStream.streamStaticEnrich]].
    */
  def st8StreamStatic(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.streamStaticEnrich(spark, dir)
      .orderBy(col("n_name"))

  /** st9: streaming NEAR-dup suppression drained AvailableNow over the
    * documents table — the [[graft.streaming.NearDupStream]] LSH gate.
    * Fed as ONE micro-batch (single staged file), so the stream's
    * greedy admit rule (state-wins, then lowest-id-per-bucket in batch)
    * reduces to the batch rule "drop any doc sharing a band bucket with
    * a smaller doc_id" — which is the SQL twin. Multi-batch behavior
    * (state collisions across feeds, crash reconcile) is covered by
    * StreamingMakeSpec; the oracle gates the LSH math + admit semantics.
    */
  // the one-file feed copy is session-staged like the graph edge lists:
  // input preparation, not per-run work (state/out dirs stay per-run —
  // a reused state dir would suppress everything on the second run)
  private val stagedFeed = new graft.functions.SessionScoped[String]

  def st9NeardupStream(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
    val feed = stagedFeed.getOrCompute(spark, s"$dir#neardup-feed") {
      val tmp = graft.functions.F.stageTempPath(spark, "neardup-feed")
      docs.coalesce(1).write.mode("overwrite").parquet(tmp)
      tmp
    }
    val base = graft.functions.F.stageTempPath(spark, "neardup-q")
    // the single-file uncapped feed drains in ONE batch, so the batch
    // read of the same staged file is the legal DrainRewrite twin
    graft.streaming.NearDupStream.run(spark,
      spark.readStream.schema(docs.schema).parquet(feed),
      "doc_id", "text", s"$base/state", s"$base/out",
      batchTwin = Some(spark.read.parquet(feed)))
    spark.read.parquet(s"$base/out")
      .select(col("doc_id")).orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st9_neardup_stream" -> (st9NeardupStream _),
    "st1_window_agg" -> (st1WindowAgg _),
    "st0_stream_window" -> (st0StreamWindow _),
    "st2_sessionize" -> (st2Sessionize _),
    "st5_interval_join" -> (st5IntervalJoin _),
    "st6_stream_sessionize" -> (st6StreamSessionize _),
    "st7_session_timeout" -> (st7SessionTimeout _),
    "st8_stream_static" -> (st8StreamStatic _),
    "s9_csv_roundtrip" -> (s9CsvRoundtrip _),
    "s11_json_roundtrip" -> (s11JsonRoundtrip _))

  private val windowSql =
    """SELECT epoch_ms(date_trunc('hour', ts)) AS window_ms, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2 ORDER BY window_ms, event_type""".stripMargin

  val oracle: Map[String, String] = Map(
    "st9_neardup_stream" ->
      // the single-batch admit rule: a doc is suppressed iff it shares a
      // band bucket with a SMALLER doc_id (TrainingData's shared LSH CTEs
      // — same shingle/minhash/band recipe the stream runs)
      s"""WITH ${TrainingData.sigCte},
         |${TrainingData.bandedCte}
         |SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT id_b FROM cand)
         |ORDER BY doc_id""".stripMargin,
    "st8_stream_static" ->
      """SELECT n.n_name, COUNT(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "st1_window_agg" -> windowSql,
    "st0_stream_window" -> windowSql,
    "st2_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |b AS (
        |  SELECT *, CASE WHEN prev IS NULL OR epoch_ms(ts) - epoch_ms(prev) > 1800000
        |    THEN 1 ELSE 0 END AS brk FROM g),
        |s AS (
        |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM b)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |  epoch_ms(MIN(ts)) AS start_ms, epoch_ms(MAX(ts)) AS end_ms
        |FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,
    "st6_stream_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |b AS (
        |  SELECT *, CASE WHEN prev IS NULL OR epoch_ms(ts) - epoch_ms(prev) > 1800000
        |    THEN 1 ELSE 0 END AS brk FROM g),
        |s AS (
        |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM b),
        |sess AS (
        |  SELECT user_id, session_seq, COUNT(*) AS n_events,
        |    epoch_ms(MIN(ts)) AS start_ms, epoch_ms(MAX(ts)) AS end_ms
        |  FROM s GROUP BY user_id, session_seq),
        |mx AS (SELECT user_id, MAX(session_seq) AS mseq FROM sess GROUP BY user_id)
        |SELECT sess.user_id AS user_id, session_seq, n_events, start_ms, end_ms
        |FROM sess JOIN mx ON sess.user_id = mx.user_id
        |WHERE session_seq < mseq
        |ORDER BY sess.user_id, session_seq""".stripMargin,
    "st7_session_timeout" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |b AS (
        |  SELECT *, CASE WHEN prev IS NULL OR epoch_ms(ts) - epoch_ms(prev) > 1800000
        |    THEN 1 ELSE 0 END AS brk FROM g),
        |s AS (
        |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM b),
        |sess AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    epoch_ms(MIN(ts)) AS start_ms, epoch_ms(MAX(ts)) AS end_ms
        |  FROM s GROUP BY user_id, session_seq),
        |wm AS (SELECT MAX(epoch_ms(ts)) AS w FROM events)
        |SELECT user_id, n_events, start_ms, end_ms
        |FROM sess, wm WHERE end_ms + 1800000 <= w
        |ORDER BY user_id, start_ms""".stripMargin,
    "st5_interval_join" ->
      """SELECT c.event_id AS click_id, e.event_id AS err_id,
        |  epoch_ms(c.ts) AS click_ms, epoch_ms(e.ts) AS err_ms
        |FROM events c JOIN events e
        |  ON c.user_id = e.user_id
        | AND e.ts >= c.ts - INTERVAL 2 HOUR AND e.ts <= c.ts
        |WHERE c.event_type = 'click' AND e.event_type = 'error'
        |ORDER BY click_id, err_id""".stripMargin,
    "s9_csv_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
    "s11_json_roundtrip" -> StatementOps.oracle("a4_entity_assembly"))
}
