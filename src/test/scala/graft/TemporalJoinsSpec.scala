package graft

import org.apache.spark.sql.functions._
import graft.ops.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofBackward: at-or-before match per key, tolerance, no-match nulls, no join node") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),
      (2L, 10L, ts("2024-01-01 00:00:10")), // exactly AT a right row
      (3L, 10L, ts("2024-01-01 00:00:02")), // before any right row
      (4L, 20L, ts("2024-01-01 00:01:00")), // other key
      (5L, 30L, ts("2024-01-01 00:00:30"))) // key with no right rows
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:03"), 1.5),
      (101L, 10L, ts("2024-01-01 00:00:10"), 2.5),
      (102L, 20L, ts("2024-01-01 00:00:59"), 3.5))
      .toDF("rid", "user_id", "ts", "rv")
    val out = TemporalJoins.asofBackward(
        left, right, "user_id", "ts", Seq("rid", "rv"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(4)), Option(r.get(5))))).toMap
    assert(out(1L) == ((Some(100L), Some(1.5)))) // latest at-or-before 00:05
    assert(out(2L) == ((Some(101L), Some(2.5)))) // equal timestamp matches
    assert(out(3L) == ((None, None)))            // nothing before
    assert(out(4L) == ((Some(102L), Some(3.5))))
    assert(out(5L) == ((None, None)))            // key absent on right
    // tolerance: the 00:05 click is 2s after the 00:03 error; 1s cap nulls it
    val tol = TemporalJoins.asofBackward(
        left, right, "user_id", "ts", Seq("rid"), toleranceMs = Some(1000L))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(tol(1L).isEmpty && tol(2L) == Some(101L))
    // implementation is union+window: the physical plan has NO join at all
    val plan = TemporalJoins.asofBackward(left, right, "user_id", "ts", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("asofForward: at-or-after match per key, tolerance, no-match nulls, no join node") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),  // next right is 00:10
      (2L, 10L, ts("2024-01-01 00:00:10")),  // exactly AT a right row
      (3L, 10L, ts("2024-01-01 00:00:11")),  // after every right row
      (4L, 30L, ts("2024-01-01 00:00:30")))  // key with no right rows
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:03"), 1.5),
      (101L, 10L, ts("2024-01-01 00:00:10"), 2.5))
      .toDF("rid", "user_id", "ts", "rv")
    val out = TemporalJoins.asofForward(
        left, right, "user_id", "ts", Seq("rid", "rv"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(4)), Option(r.get(5))))).toMap
    assert(out(1L) == ((Some(101L), Some(2.5)))) // earliest at-or-after 00:05
    assert(out(2L) == ((Some(101L), Some(2.5)))) // equal timestamp matches
    assert(out(3L) == ((None, None)))            // nothing after
    assert(out(4L) == ((None, None)))            // key absent on right
    // tolerance: 00:10 is 5s after the 00:05 click; a 1s cap nulls it
    val tol = TemporalJoins.asofForward(
        left, right, "user_id", "ts", Seq("rid"), toleranceMs = Some(1000L))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(tol(1L).isEmpty && tol(2L) == Some(101L))
    val plan = TemporalJoins.asofForward(left, right, "user_id", "ts", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("gapFill: grid completion, zero-fill, LOCF carry, single-bucket key") {
    import spark.implicits._
    val hourly = Seq(
      (1L, 0L, 2L, 5.0),      // key 1: buckets 0 and 3000 observed, 1000/2000 gaps
      (1L, 3000L, 1L, 7.0),
      (2L, 5000L, 4L, 9.0))   // key 2: single bucket -> no gaps
      .toDF("k", "b", "n", "s")
    val out = graft.ops.TimeSeries.gapFill(hourly, "k", "b", stepMs = 1000L,
        fillZero = Seq("n"), carryForward = Seq("s"))
      .orderBy("k", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 2L, 5.0, false),
      (1L, 1000L, 0L, 5.0, true),   // gap: zero count, carried sum
      (1L, 2000L, 0L, 5.0, true),
      (1L, 3000L, 1L, 7.0, false),
      (2L, 5000L, 4L, 9.0, false)))
  }

  test("asofBackward agrees with the naive join+argmax reference on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val left = (1L to 300L).map(i =>
      (i, (rnd.nextInt(8) + 1).toLong, ts("2024-01-01 00:00:00").getTime + rnd.nextInt(5000).toLong))
      .map { case (i, k, ms) => (i, k, new java.sql.Timestamp(ms)) }
      .toDF("event_id", "k", "ts")
    val right = (1000L to 1120L).map(i =>
      (i, (rnd.nextInt(10) + 1).toLong, ts("2024-01-01 00:00:00").getTime + rnd.nextInt(5000).toLong))
      .map { case (i, k, ms) => (i, k, new java.sql.Timestamp(ms)) }
      .toDF("rid", "k", "ts")
    val fast = TemporalJoins.asofBackward(left, right, "k", "ts", Seq("rid"))
      .select(col("event_id"), col("r_rid"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // reference: explode all at-or-before matches, keep max (ts, rid)
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("l.ts") >= col("r.ts"), "left_outer")
      .groupBy(col("l.event_id"))
      .agg(max_by(col("r.rid"), struct(col("r.ts"), col("r.rid"))).as("rid"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fast.size == 300 && fast == naive)
  }

  test("rangeJoinBinned: exact containment across bin boundaries, hash join not BNLJ") {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 100L), (3L, 250L), (4L, 999L), (5L, 1000L))
      .toDF("pid", "p")
    val intervals = Seq(
      (10L, 0L, 99L),     // within one bin (width 100)
      (11L, 90L, 260L),   // spans three bins
      (12L, 1000L, 1000L) // degenerate single-point interval
    ).toDF("iid", "s", "e")
    val out = TemporalJoins.rangeJoinBinned(points, "p", intervals, "s", "e", 100L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 11L), (3L, 11L), (5L, 12L)))
    // one (interval, point) pair per match — no bin-overlap duplicates
    val dupCheck = TemporalJoins.rangeJoinBinned(points, "p", intervals, "s", "e", 100L)
      .groupBy("pid", "iid").count().filter(col("count") > 1).count()
    assert(dupCheck == 0L)
    val plan = TemporalJoins.rangeJoinBinned(points, "p", intervals, "s", "e", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
