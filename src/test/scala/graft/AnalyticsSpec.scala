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
}
