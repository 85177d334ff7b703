package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Event-analytics operators at the Relational layer: ts2's trailing-
  * window outlier test, pinned on a synthetic series where ground truth
  * is known — a flat series must raise nothing, an injected spike must
  * be flagged exactly once, and the spike must not poison its trailing
  * neighbours into false positives (variance inflation is the classic
  * failure of naive z-scoring).
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("ts2 anomaly: flat series silent, single spike flagged once") {
    val dir = Files.createTempDirectory("graft-ts2-").toString
    val base = 1700000000000L
    // user 1: constant value (zero variance — the guard must not div/0
    // or flag); user 2: gentle noise with one 100× spike at position 20
    val rows =
      (0 until 40).map { i =>
        (i.toLong, new Timestamp(base + i * 60000L), 1L, "tick", 10.0, "{}")
      } ++
      (0 until 40).map { i =>
        val v = if (i == 20) 1000.0 else 10.0 + (i % 5) * 0.5
        (100L + i, new Timestamp(base + i * 60000L), 2L, "tick", v, "{}")
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val flagged = graft.queries.Relational.ts2Anomaly(spark, dir)
      .select("user_id", "event_id").as[(Long, Long)].collect()
    // user 1 (zero variance, every point == mean): silent
    assert(!flagged.exists(_._1 == 1L))
    // user 2: exactly the spike — trailing windows CONTAINING the spike
    // have their variance inflated by it, which is what keeps the
    // ordinary neighbours under 3σ
    assert(flagged.filter(_._1 == 2L).map(_._2).toSeq === Seq(120L))
  }

  test("expectations: one-pass row rules, null counts as violation, unique law") {
    import spark.implicits._
    import graft.ops.Expectations
    import graft.ops.Expectations.RowRule
    val df = Seq(
      (1L, Some(5), "a"), (2L, Some(60), "a"), (3L, None, "b"), (3L, Some(7), "b"))
      .toDF("id", "qty", "grp")
    val rep = Expectations.check(df,
      Seq(RowRule("qty_range", col("qty") >= 1 && col("qty") <= 50),
        RowRule("qty_present", col("qty").isNotNull)),
      unique = Seq(Seq("id")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // NULL qty fails the range rule too (a rule that can't evaluate is a
    // violation — the conservative reading a promote gate needs)
    assert(rep("qty_range") === ((4L, 2L)))
    assert(rep("qty_present") === ((4L, 1L)))
    // unique(id): 3 groups checked, the duplicated id contributes its
    // full multiplicity as violations
    assert(rep("unique(id)") === ((3L, 2L)))
    // the row-rule report is ONE aggregate over ONE scan — no per-rule jobs
    val plan = Expectations.check(df,
      Seq(RowRule("a", col("qty") >= 0), RowRule("b", col("id") > 0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan) // rules fused, not unioned scans
  }

  test("fn2 attribution: credit splits integer-exactly, window excludes stale clicks") {
    val dir = Files.createTempDirectory("graft-fn2-").toString
    val base = 1700000000000L
    val H = 3600000L
    // user 1: three clicks inside the 24h window then a purchase —
    // 1e6 ppm split 3 ways, earliest click absorbs the remainder;
    // a 4th click 25h before the purchase is OUT of the window.
    // user 2: click AFTER its purchase — never credited.
    val rows = Seq(
      (1L, new Timestamp(base - 25 * H), 1L, "click", 1.0, "{}"),
      (2L, new Timestamp(base - 3 * H), 1L, "click", 1.0, "{}"),
      (3L, new Timestamp(base - 2 * H), 1L, "click", 1.0, "{}"),
      (4L, new Timestamp(base - 1 * H), 1L, "click", 1.0, "{}"),
      (5L, new Timestamp(base), 1L, "purchase", 9.0, "{}"),
      (6L, new Timestamp(base + H), 2L, "click", 1.0, "{}"),
      (7L, new Timestamp(base), 2L, "purchase", 5.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val credit = graft.queries.Relational.fn2Attribution(spark, dir)
      .select("c_id", "credit_ppm").as[(Long, Long)].collect().toMap
    assert(credit === Map(2L -> 333334L, 3L -> 333333L, 4L -> 333333L))
    assert(credit.values.sum === 1000000L) // conservation per purchase
  }
}
