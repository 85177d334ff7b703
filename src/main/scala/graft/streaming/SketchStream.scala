package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.sketch.Sketches

/** Streaming count-min sketch maintenance: the heavy-hitter estimator of
  * [[graft.sketch.Sketches]] kept continuously up to date over an event
  * stream — the abuse/hot-key detector shape (which users dominate the
  * last N billion events?) that at 100 TB/day runs as a stream, never as
  * a batch rescan.
  *
  * State is the sketch itself: depth×width counter cells (constant ~4k
  * keys) in a Complete-mode stateful aggregation — state size is
  * INDEPENDENT of stream volume, the defining property that makes a
  * sketch the right streaming aggregate. The per-batch update is
  * map-side combinable (explode d cells per event, partial-sum before
  * the state shuffle).
  *
  * Drained with Trigger.AvailableNow against the static events table, so
  * the result equals the batch build bit-for-bit and the DuckDB oracle
  * replays it (same argument as `EventStream.windowAggStreaming`).
  */
object SketchStream {

  /** Build the CMS over `user_id` occurrences by streaming the events
    * table through a stateful (row, bucket) count. Returns the finished
    * sketch (row, bucket, n).
    */
  def countMinStreaming(spark: SparkSession, dir: String,
      width: Int = 1024): DataFrame = {
    val ss = StreamConf.streamSession(spark)
    val batch = ss.read.parquet(s"$dir/events.parquet")
    val src = graft.Tables.normalizeTs(
      ss.readStream
        .schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    // Per-partition key pre-count BEFORE the d-cell expansion: the naive
    // shape explodes depth cells per EVENT (d×events rows into the
    // partial aggregate); folding each partition's keys into (uid, n)
    // pairs first cuts the explode to d×distinct-keys — the difference
    // between 4 billion and 16k exploded rows per batch at 100 TB/day.
    // The fold map is flushed at a fixed bound so partition memory stays
    // O(bound) even on an all-unique key stream; duplicate (uid, n)
    // pairs from flushes re-sum in the weighted aggregate below.
    val keyed = src
      .select(col("user_id").cast("string").as("uid"))
      .as[String](org.apache.spark.sql.Encoders.STRING)
      .mapPartitions { it =>
        val block = 1 << 18
        it.grouped(block).flatMap { keys =>
          val m = new java.util.HashMap[String, Long]()
          keys.foreach(k => m.merge(k, 1L, (a, b) => a + b))
          m.entrySet().iterator().asScala
            .map(e => (e.getKey, e.getValue)).toVector
        }
      }(org.apache.spark.sql.Encoders.product[(String, Long)])
      .toDF("uid", "__n")
    val agg = keyed
      .select(col("__n"),
        explode(Sketches.cmsCells(col("uid"), width)).as("__rb"))
      .groupBy(col("__rb.row").as("row"), col("__rb.bucket").as("bucket"))
      .agg(sum(col("__n")).as("n"))
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // same rationale as EventStream: state partitions are sized to the
    // key space (d×w cells) on a query-scoped session clone
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .option("checkpointLocation",
        s"${graft.functions.F.stageRoot(ss)}/ckpt-$name")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name)
  }

  /** Streaming HyperLogLog register maintenance: per-event_type distinct
    * user cardinality kept continuously current. The register update is
    * a Complete-mode stateful MAX over (group, register) — constant
    * group×64 state, and because max is duplicate-insensitive the stream
    * needs NO dedup before the aggregate (the property that makes HLL
    * the streaming cardinality sketch where an exact count-distinct
    * would hold unbounded user-id state). Drained with AvailableNow so
    * the registers equal the batch [[Sketches.hllRegisters]] build
    * bit-for-bit and the DuckDB oracle replays them.
    */
  def hllStreaming(spark: SparkSession, dir: String): DataFrame = {
    val ss = StreamConf.streamSession(spark)
    val batch = ss.read.parquet(s"$dir/events.parquet")
    val src = graft.Tables.normalizeTs(
      ss.readStream
        .schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
    val regs = Sketches.hllRegisters(
      src.select(col("event_type"), col("user_id").cast("string").as("uid")),
      "event_type", "uid")
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = regs.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .option("checkpointLocation",
        s"${graft.functions.F.stageRoot(ss)}/ckpt-$name")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(name)
  }
}
