package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.lake.{Journal, StatementStore}
import graft.ops.Make
import graft.streaming.EventStream
import graft.streaming.EventStream.{Ev, SessionOut}

class StreamingMakeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stateful streaming sessionization matches the batch twin on closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(1, ts("2024-01-01 00:00:00"), 1),
      Ev(1, ts("2024-01-01 00:10:00"), 2), // same session (gap 10m)
      Ev(1, ts("2024-01-01 01:00:00"), 3), // new session (gap 50m)
      Ev(2, ts("2024-01-01 00:00:00"), 4))
    val stream = MemoryStream[Ev]
    stream.addData(evs)
    val q = EventStream.sessionizeStreaming(stream.toDS(), gapMinutes = 30)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sess_out").as[SessionOut].collect()
    // only user 1's first session is closed (by the 50m in-stream gap)
    assert(closed.toSeq == Seq(SessionOut(1, 1, 2,
      ts("2024-01-01 00:00:00").getTime, ts("2024-01-01 00:10:00").getTime)))

    // batch twin agrees on that session
    val batch = EventStream.sessionizeBatch(evs.toDF(), 30).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(batch((1L, 1L)) == ((2L,
      ts("2024-01-01 00:00:00").getTime, ts("2024-01-01 00:10:00").getTime)))
  }

  test("make: exports are freshness-gated and skip when the store is current") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-make").toString
    val out = Files.createTempDirectory("graft-make-out").toString
    val store = new StatementStore(spark, dir, shards = 4)
    val journal = new Journal(spark, dir)

    val stmts = Seq(
      model.Statement("0", "idA", "e1", "ds", "thing", "o1", None, "Person",
        "name", "string", "Alice", None, None, external = false,
        ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None)).toDS().toDF()
    journal.write(stmts)

    val first = Make.make(store, journal, out)
    assert(first.toSet == Set("statements.csv", "entities.ftm.json", "statistics.json"))
    assert(new java.io.File(s"$out/entities.ftm.json").exists())

    // unchanged store → every export skipped
    assert(Make.make(store, journal, out).isEmpty)

    // new data → exports rebuild
    journal.write(stmts.withColumn("id", org.apache.spark.sql.functions.lit("idB"))
      .withColumn("entity_id", org.apache.spark.sql.functions.lit("e2")))
    assert(Make.make(store, journal, out).nonEmpty)
  }
}
