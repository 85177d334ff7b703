package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.lake.{Journal, StatementStore}

/** Continuous ingestion: a Structured Streaming source drained into the
  * statement store through the journal — the streaming form of the
  * reference's writer loop (ST1: API writers buffer → journal → flush;
  * repository/entities/main.py:96-118).
  *
  * Shape: `readStream → statement projection → foreachBatch { journal
  * write + auto-flush }`. foreachBatch is the idiomatic streaming-to-table
  * sink when the target has its own transactional commit (our manifest):
  * each micro-batch stages one journal write; the journal drains into a
  * locked, manifest-committed append whenever it crosses the threshold,
  * so the store sees few large sorted appends instead of
  * one-commit-per-micro-batch (which would fragment the table and hammer
  * the fence at high trigger rates). Crash safety comes from the
  * journal's yield→write→delete order plus idempotent merge — a replayed
  * micro-batch upserts to the same (id, fragment, origin) keys.
  */
object IngestStream {

  /** Run `stream` (already projected to statement rows) into `store`,
    * draining the journal every `flushRows`. Uses AvailableNow so the
    * call returns when the source is exhausted — swap the trigger for a
    * continuous deployment. Returns the store version after a final
    * drain + merge.
    */
  def run(spark: SparkSession, stream: DataFrame, store: StatementStore,
      flushRows: Long = 1000000L): Long = {
    val journal = new Journal(spark, store.rootStr)
    val name = s"graft_ingest_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = stream.writeStream
      .queryName(name)
      .option("checkpointLocation",
        graft.functions.F.stageTempPath(spark, "ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        journal.writeAutoFlush(batch, store, flushRows)
      }
      .start()
    q.awaitTermination()
    journal.drain(store) // tail rows below the threshold
    store.merge()
  }
}
