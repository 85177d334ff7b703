package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operators from SURVEY.md §2 expressed over the testdata
  * star schema: scans (S1), live-view filter (S2), predicate pushdown
  * filters (P4-P8), semi/anti joins (J1/J5), star join with broadcast dims,
  * window latest-per-key, global top-k (O4).
  *
  * Determinism rules for oracle parity (DuckDB hash-compare):
  *   - money aggregates computed in DECIMAL (exact, order-independent) and
  *     cast to double only at the very end;
  *   - timestamps exported as epoch milliseconds (unix_millis / epoch_ms);
  *   - every result totally ordered by a unique key.
  */
object Relational {

  /** Exact decimal sum of a double column, surfaced as double. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact decimal revenue term: extendedprice * (1 - discount). */
  private def revenueTerm(price: Column, disc: Column): Column =
    price.cast(DecimalType(18, 2)) * (lit(BigDecimal(1).setScale(2)) - disc.cast(DecimalType(18, 2)))

  // Q1-style pricing summary: partial (map-side) aggregation + single shuffle
  // on the two low-cardinality group keys; scales linearly in input size.
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // Star join: fact lineitem joined to orders, then the dimension chain
  // customer -> nation -> region. Only nation/region carry explicit
  // broadcast hints — their cardinality is FIXED by the schema (25/5
  // rows), bounded at any scale factor. customer and orders SCALE with
  // the data (customer is ~SF x 150k rows; a static hint on a scaling
  // side hits the 8 GiB broadcast hard cap and fails outright instead of
  // degrading) — AQE broadcasts the projected 2-column customer at toy
  // scale and shuffles it at real scale, which is exactly the plan split
  // we want.
  def q2StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(spark, dir).select(col("r_regionkey"), col("r_name"))
    li.join(o.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  // S1 raw scan with projection + pushed-down range predicate. The filter
  // and the 4-column ReadSchema both reach the parquet reader.
  def s1Scan(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        graft.functions.F.epochMs(col("l_shipdate")).as("ship_ms"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // S2 live view: tombstone-style filter plus a synthesized canonical_id
  // kept as a plain projection so pushdown is never blocked (SURVEY §4).
  def s2LiveView(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("event_type") =!= "error")
      .select(
        col("event_id"), col("event_id").as("canonical_id"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  // P4/P5: IN-list + range predicates (both pushed to parquet stats).
  def p4FilterIn(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") &&
        col("c_acctbal") > 1000.0)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  // P8 changed-since watermark predicate.
  def p8ChangedSince(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-25 00:00:00").cast("timestamp"))
      .select(col("event_id"), col("user_id"), graft.functions.F.epochMs(col("ts")).as("ts_ms"))
      .orderBy(col("event_id"))

  // J1: semi-join scoping instead of a giant IN literal (SURVEY J1) —
  // no row duplication on the probe side. No broadcast hint: the build
  // side is a filtered fact table (unbounded — a hint would be honored
  // even when the filter matches most of a 100 TB corpus and would OOM);
  // AQE converts to a broadcast semi-join at runtime when it measures
  // the build side small.
  def j1SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    Tables.lineitem(spark, dir)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  // Q3: multi-level rollup (GROUPING SETS): leaf, per-flag, and grand
  // total rows from ONE pass — Catalyst's Expand + partial aggregation
  // keeps it a single shuffle on the expanded grouping keys; at 100 TB
  // this replaces three separate scans of the fact table.
  def q3Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  // Q4: salted two-phase distinct aggregation — the skew-mitigation shape
  // for COUNT(DISTINCT) under hot keys. A plain per-key distinct count
  // sends EVERY (key, value) row of a hot key to one reducer (distinct
  // defeats map-side combine); salting splits each key into 16 sub-keys,
  // dedupes (key, salt, value) in phase one — bounded fan-in per reducer
  // regardless of key heat — and sums per-salt distinct counts in a tiny
  // phase two. Values are salted by their own hash, so equal values land
  // in the same salt bucket and the per-salt counts partition the
  // distinct set exactly (no double counting).
  def q4SaltedDistinct(spark: SparkSession, dir: String): DataFrame = {
    val salt = pmod(xxhash64(col("l_partkey")), lit(16))
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_partkey"), salt.as("__salt"))
      .dropDuplicates("l_suppkey", "__salt", "l_partkey")
      .groupBy(col("l_suppkey"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("__partial")).as("n_parts"))
      .orderBy(col("l_suppkey"))
  }

  // J5: anti-join (journal-truncate / DEL-detection shape).
  def j5AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val bigLines = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 40.0).select(col("l_orderkey"))
    Tables.orders(spark, dir)
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  // Latest-row-per-key window (the single-branch core of merge dedupe A1).
  def w1LatestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        graft.functions.F.epochMs(col("ts")).as("ts_ms"))
      .orderBy(col("user_id"))
  }

  // W2: trailing event-time RANGE window — per event, how many same-user
  // events landed in the preceding hour (rate-limit/abuse counters). The
  // frame is by VALUE (epoch ms), so equal-timestamp ties all see the
  // same count — deterministic without a row tiebreak. One shuffle on
  // user_id; the range frame is Spark's O(n) sliding-frame fast path.
  def w2RollingCounts(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_millis(col("ts")))
      .rangeBetween(-3600000L, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("n_trailing_1h", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"),
        graft.functions.F.epochMs(col("ts")).as("ts_ms"), col("n_trailing_1h"))
      .orderBy(col("event_id"))
  }

  // O4 global top-k: Catalyst plans TakeOrderedAndProject — per-partition
  // heaps + single merge on the driver, no global sort.
  def o4GlobalTopk(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))

  // AJ1: backward as-of join (clicks ← latest at-or-before error per
  // user) via the union+window operator — one shuffle on user_id, never
  // a join explosion. The oracle is DuckDB's NATIVE ASOF LEFT JOIN, so
  // the semantics are pinned against an independent implementation.
  def aj1AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id").as("err_id"),
        col("value").as("err_value"))
    graft.ops.TemporalJoins.asofBackward(
        clicks, errors, "user_id", "ts", Seq("err_id", "err_value"))
      .select(col("event_id"), col("user_id"),
        graft.functions.F.epochMs(col("ts")).as("ts_ms"),
        col("r_err_id").as("err_id"),
        graft.functions.F.epochMs(col("r_ts")).as("err_ms"),
        col("r_err_value").as("err_value"))
      .withColumn("gap_ms", col("ts_ms") - col("err_ms"))
      .orderBy(col("event_id"))
  }

  // AJ2: forward as-of join (clicks → EARLIEST at-or-after error per
  // user) — the mirror of aj1, against DuckDB's native forward ASOF.
  def aj2AsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id").as("err_id"),
        col("value").as("err_value"))
    graft.ops.TemporalJoins.asofForward(
        clicks, errors, "user_id", "ts", Seq("err_id", "err_value"))
      .select(col("event_id"), col("user_id"),
        graft.functions.F.epochMs(col("ts")).as("ts_ms"),
        col("r_err_id").as("err_id"),
        graft.functions.F.epochMs(col("r_ts")).as("err_ms"),
        col("r_err_value").as("err_value"))
      .withColumn("gap_ms", col("err_ms") - col("ts_ms"))
      .orderBy(col("event_id"))
  }

  // RJ1: containment range join (shipments falling inside the 30-day
  // windows of the 20 largest orders) via bin bucketing — an equi-key
  // hash join on the bin instead of the BroadcastNestedLoopJoin a raw
  // BETWEEN forces, so it survives both sides being large.
  def rj1RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val dayMs = 86400000L
    val win = 30L * dayMs
    val topOrders = Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
      .select(col("o_orderkey"),
        graft.functions.F.epochMs(col("o_orderdate")).as("w_start"),
        (graft.functions.F.epochMs(col("o_orderdate")) + win).as("w_end"))
    val ships = Tables.lineitem(spark, dir)
      .select(graft.functions.F.epochMs(col("l_shipdate")).as("ship_ms"),
        col("l_quantity"))
    graft.ops.TemporalJoins.rangeJoinBinned(
        ships, "ship_ms", topOrders, "w_start", "w_end", win)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_ship"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderkey"))
  }

  // Q5: pivot — wide-format reshaping with EXPLICIT pivot values, so the
  // plan is ONE hash aggregation with conditional sums (an implicit pivot
  // first runs a whole extra distinct scan to discover the columns, and
  // its output schema depends on the data — both wrong at 100 TB).
  // Map-side partial aggregation applies as in any groupBy.
  def q5Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_quantity")))
      .withColumnRenamed("F", "f_qty")
      .withColumnRenamed("O", "o_qty")
      .orderBy(col("l_returnflag"))

  // PROF1: per-column table profile — null count, distinct count, min,
  // max for every column in ONE aggregation pass (the multi-distinct
  // expands map-side; the scan still runs once), then a stack unpivot to
  // the (column, stats) grain. The profiling staple every lakehouse
  // debugging session starts with; scales as a single scan regardless of
  // column count.
  def prof1TableProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val df = Tables(spark, dir, "documents")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c"))) :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_value, max_value)",
      "__n AS n_rows")
      .orderBy(col("col_name"))
  }

  // TS1: per-user hourly event series regularized onto the hour grid —
  // gap hours get n_events = 0 and carry the last observed hourly sum
  // forward (LOCF). The resample primitive every metrics pipeline needs.
  /** dq1: declarative data-quality expectations over the lineitem fact
    * — all row rules in ONE pass (conditional sums in a single
    * map-side-combinable aggregate, never a scan per rule) plus a
    * uniqueness law as its own keyed aggregate
    * ([[graft.ops.Expectations]]). The promote-gate report a lakehouse
    * runs before publishing a snapshot.
    */
  def dq1Expectations(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Expectations.RowRule
    graft.ops.Expectations.check(
      Tables.lineitem(spark, dir),
      Seq(
        RowRule("flag_domain", col("l_returnflag").isin("A", "N", "R")),
        RowRule("not_null_orderkey", col("l_orderkey").isNotNull),
        RowRule("qty_range", col("l_quantity") >= 1 && col("l_quantity") <= 50),
        RowRule("tax_nonneg", col("l_tax") >= 0)),
      unique = Seq(Seq("l_orderkey", "l_linenumber")))
  }

  /** scd1: SCD-type-2 dimension derivation from a change log — the
    * versioned-dimension maintenance every lakehouse runs (the statement
    * store's first_seen/last_seen lifecycle, restated on an event-grain
    * attribute): collapse each user's event-type stream into validity
    * intervals [valid_from, valid_to) per distinct run (consecutive
    * repeats of the same value merge into one version; the open current
    * version has NULL valid_to).
    *
    * Gaps-and-islands with two window passes over ONE partitioning
    * (user_id): a change flag via lag, a running change-count as the
    * island id, then min/max per island — no self-join, state bounded by
    * a user's history. Integer-exact (epoch ms).
    */
  def scd1Dimension(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__chg",
        when(lag(col("event_type"), 1).over(byUser).isNull ||
          lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__chg")).over(cum))
      .groupBy(col("user_id"), col("__island"))
      // min, not first: values are constant within an island, but min is
      // deterministic by construction (and matches the oracle) while
      // first() is order-dependent in general
      .agg(min(col("event_type")).as("event_type"),
        graft.functions.F.epochMs(min(col("ts"))).as("valid_from_ms"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_ms",
        lead(col("valid_from_ms"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("__island"))))
      .select(col("user_id"), col("__island").as("version"),
        col("event_type"), col("valid_from_ms"), col("valid_to_ms"),
        col("n_events"))
      .orderBy(col("user_id"), col("version"))
  }

  /** w3: daily new-user and cumulative-user counts — the running
    * count-distinct every growth dashboard needs, restated so it needs
    * NO distinct-state at read time: a user contributes to exactly the
    * day of their FIRST event (one map-side-combinable min per user),
    * and the cumulative series is a running sum over the ≤|days| daily
    * rows. The classic trick that turns an O(users) streaming-state
    * problem into two tiny aggregates.
    */
  def w3CumulativeUsers(spark: SparkSession, dir: String): DataFrame = {
    val firsts = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("__first"))
      .select(to_date(col("__first")).cast("string").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    firsts
      // single-partition window is sanctioned here (PlanLintSpec
      // whitelist): input is the per-DAY aggregate — ≤ a few thousand
      // rows for decades of data — never the raw events
      .withColumn("cum_users", sum(col("new_users")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("day"))
  }

  /** ts2: trailing-window outlier detection over the event stream — the
    * monitoring primitive a pipeline runs on ingest volumes and metric
    * feeds. A point is anomalous when its deviation from the trailing
    * 12-point mean exceeds 3σ of that same window (n ≥ 8 points of
    * history required).
    *
    * Integer-exact: values scale to thousandths (floor — identical on
    * the IEEE product in both engines) and the z-test is cleared of
    * divisions: |x − S/n| > 3σ  ⇔  (n·x − S)² > 9·(n·Σx² − S²), all in
    * BIGINT (operands bounded: |n·x − S| ≤ 12·5·10⁵ so the square
    * ≤ 3.5e13, the variance side ≤ 3.1e14 — far inside 2⁶³).
    *
    * Scale shape: one shuffle on the key; the three frame aggregates
    * share a single window pass with O(frame) state per key — no
    * self-join, no global sort (the trailing ROWS frame is Spark's O(1)
    * sliding-frame path).
    */
  def ts2Anomaly(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-11, 0)
    Tables.events(spark, dir)
      .withColumn("__v", floor(col("value") * 1000).cast("long"))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__v")).over(w))
      .withColumn("__sxx", sum(col("__v") * col("__v")).over(w))
      .filter(col("__n") >= 8 &&
        (col("__n") * col("__v") - col("__s")) * (col("__n") * col("__v") - col("__s")) >
          lit(9L) * (col("__n") * col("__sxx") - col("__s") * col("__s")))
      .select(col("user_id"), graft.functions.F.epochMs(col("ts")).as("ts_ms"),
        col("event_id"), col("__v").as("v_scaled"))
      .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
  }

  def ts1Gapfill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("user_id"),
        graft.functions.F.epochMs(date_trunc("hour", col("ts"))).as("hour_ms"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    graft.ops.TimeSeries.gapFill(hourly, "user_id", "hour_ms",
        stepMs = 3600000L, fillZero = Seq("n_events"),
        carryForward = Seq("sum_value"))
      .orderBy(col("user_id"), col("hour_ms"))
  }

  // FN1: ordered funnel (view → click → purchase per user, each stage's
  // timestamp the MIN at-or-after the previous stage). No per-user event
  // buffering (a bot user with 10^8 events would OOM a collect_list
  // fold): three chained min-aggregations with equi-joins on user_id —
  // every step map-side-partial, every join AQE-broadcastable.
  /** fn2: linear multi-touch attribution — every purchase spreads one
    * unit of credit (1e6 ppm, integer-exact) equally over the user's
    * clicks in the 24 h before it; the earliest touch absorbs the
    * truncating-division remainder so each purchase's credit sums to
    * exactly 1e6. Reported per click: total credit and purchases
    * touched.
    *
    * Scale shape: a per-user equi join with a residual time-range
    * predicate — fan-out is (user's purchases × user's clicks-in-window),
    * bounded by per-user activity, never corpus size (a bot-grade hot
    * user gets the same salting treatment as any skewed key). The two
    * windows share the p_id partitioning; the final aggregate is
    * map-side combinable.
    */
  def fn2Attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        graft.functions.F.epochMs(col("ts")).as("p_ms"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"),
        graft.functions.F.epochMs(col("ts")).as("c_ms"))
    val touches = p.join(c, Seq("user_id"))
      .filter(col("c_ms") <= col("p_ms") &&
        col("c_ms") > col("p_ms") - lit(86400000L))
    val nW = Window.partitionBy(col("p_id"))
    val rankW = Window.partitionBy(col("p_id")).orderBy(col("c_ms"), col("c_id"))
    touches
      .withColumn("__n", count(lit(1)).over(nW))
      .withColumn("__rn", row_number().over(rankW))
      .withColumn("__credit", expr("1000000L div __n") +
        when(col("__rn") === 1,
          expr("1000000L - (1000000L div __n) * __n")).otherwise(lit(0L)))
      .groupBy(col("c_id"), col("user_id"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("__credit")).as("credit_ppm"))
      .orderBy(col("c_id"))
  }

  def fn1Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def stage(evType: String, after: Option[DataFrame], afterCol: String,
        out: String): DataFrame = {
      val base = ev.filter(col("event_type") === evType)
        .select(col("user_id"), col("ts"))
      val scoped = after match {
        case Some(prev) => base.join(prev, Seq("user_id"))
          .filter(col("ts") >= col(afterCol))
        case None => base
      }
      scoped.groupBy(col("user_id"))
        .agg(graft.functions.F.epochMs(min(col("ts"))).as(out))
    }
    val v = stage("view", None, "", "view_ms")
    val c = stage("click", Some(v.withColumn("t",
      expr("timestamp_millis(view_ms)"))), "t", "click_ms")
    val p = stage("purchase", Some(c.withColumn("t",
      expr("timestamp_millis(click_ms)"))), "t", "purchase_ms")
    ev.select(col("user_id")).distinct()
      .join(v, Seq("user_id"), "left_outer")
      .join(c, Seq("user_id"), "left_outer")
      .join(p, Seq("user_id"), "left_outer")
      .withColumn("stage",
        when(col("purchase_ms").isNotNull, 3)
          .when(col("click_ms").isNotNull, 2)
          .when(col("view_ms").isNotNull, 1).otherwise(0))
      .orderBy(col("user_id"))
  }

  // COH1: weekly retention cohorts — users grouped by first-active ISO
  // week, activity counted per week offset. Two map-side-partial
  // aggregations + one equi-join; the classic cohort triangle.
  def coh1Retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val weekly = ev.select(col("user_id"),
      graft.functions.F.epochMs(date_trunc("week", col("ts"))).as("w")).distinct()
    val cohorts = weekly.groupBy(col("user_id")).agg(min(col("w")).as("cohort_ms"))
    weekly.join(cohorts, Seq("user_id"))
      .withColumn("week_n", ((col("w") - col("cohort_ms")) / 604800000L).cast("long"))
      .groupBy(col("cohort_ms"), col("week_n"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_ms"), col("week_n"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn1_funnel" -> (fn1Funnel _),
    "fn2_attribution" -> (fn2Attribution _),
    "coh1_retention" -> (coh1Retention _),
    "ts1_gapfill" -> (ts1Gapfill _),
    "ts2_anomaly" -> (ts2Anomaly _),
    "scd1_dimension" -> (scd1Dimension _),
    "dq1_expectations" -> (dq1Expectations _),
    "w3_cumulative_users" -> (w3CumulativeUsers _),
    "prof1_table_profile" -> (prof1TableProfile _),
    "q5_pivot" -> (q5Pivot _),
    "aj1_asof_join" -> (aj1AsofJoin _),
    "aj2_asof_forward" -> (aj2AsofForward _),
    "rj1_range_join" -> (rj1RangeJoin _),
    "q1_agg" -> (q1Agg _),
    "q2_star_join" -> (q2StarJoin _),
    "s1_scan" -> (s1Scan _),
    "s2_live_view" -> (s2LiveView _),
    "p4_filter_in" -> (p4FilterIn _),
    "p8_changed_since" -> (p8ChangedSince _),
    "j1_semi_join" -> (j1SemiJoin _),
    "j5_anti_join" -> (j5AntiJoin _),
    "q3_rollup" -> (q3Rollup _),
    "q4_salted_distinct" -> (q4SaltedDistinct _),
    "w1_latest_per_key" -> (w1LatestPerKey _),
    "w2_rolling_counts" -> (w2RollingCounts _),
    "o4_global_topk" -> (o4GlobalTopk _))

  val oracle: Map[String, String] = Map(
    "fn2_attribution" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, epoch_ms(ts) AS p_ms
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS c_id, epoch_ms(ts) AS c_ms
        |  FROM events WHERE event_type = 'click'),
        |t AS (SELECT p.p_id, c.c_id, c.user_id, c.c_ms
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.c_ms <= p.p_ms AND c.c_ms > p.p_ms - 86400000),
        |r AS (SELECT *, COUNT(*) OVER (PARTITION BY p_id) AS n,
        |    ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY c_ms, c_id) AS rn
        |  FROM t),
        |cr AS (SELECT c_id, user_id,
        |    (1000000 // n) + CASE WHEN rn = 1
        |      THEN 1000000 - (1000000 // n) * n ELSE 0 END AS credit
        |  FROM r)
        |SELECT c_id, user_id, COUNT(*) AS n_purchases,
        |  CAST(SUM(credit) AS BIGINT) AS credit_ppm
        |FROM cr GROUP BY 1, 2 ORDER BY c_id""".stripMargin,
    "fn1_funnel" ->
      """WITH v AS (
        |  SELECT user_id, epoch_ms(MIN(ts)) AS view_ms
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, epoch_ms(MIN(e.ts)) AS click_ms
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_ms(e.ts) >= v.view_ms
        |  GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, epoch_ms(MIN(e.ts)) AS purchase_ms
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= c.click_ms
        |  GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id, v.view_ms, c.click_ms, p.purchase_ms,
        |  CASE WHEN p.purchase_ms IS NOT NULL THEN 3
        |       WHEN c.click_ms IS NOT NULL THEN 2
        |       WHEN v.view_ms IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM u LEFT JOIN v ON u.user_id = v.user_id
        |       LEFT JOIN c ON u.user_id = c.user_id
        |       LEFT JOIN p ON u.user_id = p.user_id
        |ORDER BY u.user_id""".stripMargin,
    "coh1_retention" ->
      """WITH weekly AS (
        |  SELECT DISTINCT user_id, epoch_ms(date_trunc('week', ts)) AS w
        |  FROM events),
        |cohorts AS (SELECT user_id, MIN(w) AS cohort_ms FROM weekly GROUP BY 1)
        |SELECT c.cohort_ms, CAST((w.w - c.cohort_ms) / 604800000 AS BIGINT) AS week_n,
        |  COUNT(DISTINCT w.user_id) AS n_users
        |FROM weekly w JOIN cohorts c ON w.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dq1_expectations" ->
      """WITH rowr AS (
        |  SELECT COUNT(*) AS n,
        |    COUNT(*) FILTER (WHERE NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE)) AS v_flag,
        |    COUNT(*) FILTER (WHERE NOT COALESCE(l_orderkey IS NOT NULL, FALSE)) AS v_null,
        |    COUNT(*) FILTER (WHERE NOT COALESCE(l_quantity >= 1 AND l_quantity <= 50, FALSE)) AS v_qty,
        |    COUNT(*) FILTER (WHERE NOT COALESCE(l_tax >= 0, FALSE)) AS v_tax
        |  FROM lineitem),
        |uniq AS (
        |  SELECT COUNT(*) AS groups,
        |    CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS dups
        |  FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber))
        |SELECT 'flag_domain' AS expectation, n AS n_checked, v_flag AS n_violations FROM rowr
        |UNION ALL SELECT 'not_null_orderkey', n, v_null FROM rowr
        |UNION ALL SELECT 'qty_range', n, v_qty FROM rowr
        |UNION ALL SELECT 'tax_nonneg', n, v_tax FROM rowr
        |UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', groups, dups FROM uniq
        |ORDER BY expectation""".stripMargin,
    "scd1_dimension" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type FROM events),
        |f AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |i AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island FROM f),
        |g AS (SELECT user_id, island AS version, MIN(event_type) AS event_type,
        |    epoch_ms(MIN(ts)) AS valid_from_ms, COUNT(*) AS n_events
        |  FROM i GROUP BY 1, 2)
        |SELECT user_id, version, event_type, valid_from_ms,
        |  lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_ms,
        |  n_events
        |FROM g ORDER BY user_id, version""".stripMargin,
    "w3_cumulative_users" ->
      """WITH firsts AS (SELECT user_id, MIN(ts) AS f FROM events GROUP BY 1),
        |daily AS (SELECT CAST(CAST(f AS DATE) AS VARCHAR) AS day,
        |    COUNT(*) AS new_users FROM firsts GROUP BY 1)
        |SELECT day, new_users,
        |  CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cum_users
        |FROM daily ORDER BY day""".stripMargin,
    "ts2_anomaly" ->
      """WITH sc AS (SELECT user_id, ts, event_id,
        |    CAST(FLOOR(value*1000) AS BIGINT) AS v FROM events),
        |ws AS (SELECT user_id, ts, event_id, v,
        |    COUNT(*) OVER w AS n, SUM(v) OVER w AS s, SUM(v*v) OVER w AS sxx
        |  FROM sc WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))
        |SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, v AS v_scaled
        |FROM ws WHERE n >= 8 AND (n*v - s)*(n*v - s) > 9*(n*sxx - s*s)
        |ORDER BY user_id, ts_ms, event_id""".stripMargin,
    "ts1_gapfill" ->
      """WITH hourly AS (
        |  SELECT user_id, epoch_ms(date_trunc('hour', ts)) AS hour_ms,
        |    COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
        |  FROM events GROUP BY 1, 2),
        |spans AS (SELECT user_id, MIN(hour_ms) AS mn, MAX(hour_ms) AS mx
        |  FROM hourly GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(mn, mx, 3600000)) AS hour_ms
        |  FROM spans),
        |j AS (SELECT g.user_id, g.hour_ms, h.n, h.s
        |  FROM grid g LEFT JOIN hourly h
        |    ON g.user_id = h.user_id AND g.hour_ms = h.hour_ms)
        |SELECT user_id, hour_ms,
        |  COALESCE(n, 0) AS n_events,
        |  LAST_VALUE(s IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour_ms
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value,
        |  n IS NULL AS filled
        |FROM j ORDER BY user_id, hour_ms""".stripMargin,
    "prof1_table_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val stats = cols.zipWithIndex.map { case (c, i) =>
        s"""CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn$i,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS nd$i,
           |  CAST(MIN($c) AS VARCHAR) AS mn$i, CAST(MAX($c) AS VARCHAR) AS mx$i""".stripMargin
      }.mkString(",\n  ")
      val rows = cols.zipWithIndex.map { case (c, i) =>
        s"SELECT '$c' AS col_name, nn$i AS n_nulls, nd$i AS n_distinct, mn$i AS min_value, mx$i AS max_value, n AS n_rows FROM s"
      }.mkString("\nUNION ALL ")
      s"""WITH s AS (SELECT COUNT(*) AS n,
         |  $stats
         |FROM documents)
         |$rows
         |ORDER BY col_name""".stripMargin
    },
    "q5_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS f_qty,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS o_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "aj1_asof_join" ->
      """SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms,
        |  e.event_id AS err_id, epoch_ms(e.ts) AS err_ms,
        |  e.value AS err_value,
        |  epoch_ms(c.ts) - epoch_ms(e.ts) AS gap_ms
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY c.event_id""".stripMargin,
    "aj2_asof_forward" ->
      """SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms,
        |  e.event_id AS err_id, epoch_ms(e.ts) AS err_ms,
        |  e.value AS err_value,
        |  epoch_ms(e.ts) - epoch_ms(c.ts) AS gap_ms
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND c.ts <= e.ts
        |ORDER BY c.event_id""".stripMargin,
    "rj1_range_join" ->
      """WITH t AS (
        |  SELECT o_orderkey, epoch_ms(o_orderdate) AS w_start,
        |    epoch_ms(o_orderdate) + 2592000000 AS w_end
        |  FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20)
        |SELECT o_orderkey, COUNT(*) AS n_ship,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN t
        |  ON epoch_ms(l_shipdate) BETWEEN w_start AND w_end
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q4_salted_distinct" ->
      """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_star_join" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "s1_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  epoch_ms(l_shipdate) AS ship_ms
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "s2_live_view" ->
      """SELECT event_id, event_id AS canonical_id, user_id, event_type, value
        |FROM events WHERE value IS NOT NULL AND event_type <> 'error'
        |ORDER BY event_id""".stripMargin,
    "p4_filter_in" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') AND c_acctbal > 1000.0
        |ORDER BY c_custkey""".stripMargin,
    "p8_changed_since" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms
        |FROM events WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "j1_semi_join" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "j5_anti_join" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 40.0)
        |ORDER BY o_orderkey""".stripMargin,
    "w1_latest_per_key" ->
      """SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "w2_rolling_counts" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS n_trailing_1h
        |FROM events ORDER BY event_id""".stripMargin,
    "o4_global_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q3_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
}
