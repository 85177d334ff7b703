package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.dedupe.Dedupe

/** Streaming NEAR-duplicate suppression: the LSH twin of [[DedupStream]]
  * for an always-on crawl feed — a document whose MinHash band buckets
  * collide with anything previously admitted (or with a lower-id
  * batch-mate) is dropped; novel documents pass and their band keys join
  * the state.
  *
  * Candidate-granularity by design: streaming state keeps (band, bucket)
  * keys, not token sets, so there is no jaccard verification pass — a
  * band collision IS the verdict. That is the standard stream-side first
  * line of defense; the batch pipeline (d2b candidates → d4 jaccard)
  * remains the precise second pass. False-positive rate is tuned by
  * (k, rowsPerBand) exactly as in batch LSH.
  *
  * Scale shape: per micro-batch, one groupBy for signatures (map-side
  * partial min per hash), a semi-join of the batch's band rows against
  * the bucketed state table (micro-batch side is small — AQE broadcasts
  * it), and one min-per-bucket aggregation for the in-batch pass. State
  * grows with admitted-corpus × bands — the same linear artifact the
  * batch pipeline materializes. Commit/recovery: [[ExactlyOnceBatches]]
  * (state first, output second, marker last, reconcile on start, lake
  * lock for the run).
  *
  * Documents shorter than the shingle width yield no bands: they are
  * admitted but never recorded — near-dup semantics need at least one
  * shingle to compare.
  */
object NearDupStream {

  def run(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      stateDir: String, outDir: String,
      k: Int = 8, rowsPerBand: Int = 2, shingle: Int = 3): Long = {
    val name = s"graft_neardup_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val emitted = spark.sparkContext.longAccumulator(name)
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(spark.sessionState.newHadoopConf())
    graft.lake.FsOps.mkdirs(fs, statePath)
    graft.lake.Locks.withLock(fs, statePath) {
    ExactlyOnceBatches.reconcile(spark, stateDir, outDir)
    val q = docs.writeStream
      .queryName(name)
      .option("checkpointLocation", s"${graft.functions.F.stageRoot(spark)}/ckpt-$name")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val batchKey = s"$name-$batchId"
        val b = graft.functions.F.materialize(batch)
        val sig = Dedupe.minhashSignatureFromTerms(
          Dedupe.shingleRows(b, idCol, textCol, n = shingle), idCol, k)
        val bands = graft.functions.F.materialize(
          Dedupe.bandRows(sig, idCol, k, rowsPerBand))
        // state collision: any admitted doc already owns one of my buckets
        val dropState = ExactlyOnceBatches.readState(spark, stateDir) match {
          case Some(s) => bands.join(
            s.filter(col("__batch") =!= lit(batchKey))
              .select(col("band"), col("bucket")),
            Seq("band", "bucket"), "left_semi")
            .select(col(idCol)).distinct()
          case None => bands.select(col(idCol)).limit(0)
        }
        // in-batch collision: only the lowest id per shared bucket
        // survives (greedy, deterministic; non-transitive by design —
        // candidate semantics, same as a band-bucket pair list)
        val dropBatch = bands
          .join(bands.groupBy(col("band"), col("bucket"))
              .agg(min(col(idCol)).as("__mn")),
            Seq("band", "bucket"))
          .filter(col(idCol) > col("__mn"))
          .select(col(idCol)).distinct()
        val novel = b.join(
          dropState.unionByName(dropBatch).distinct(), Seq(idCol), "left_anti")
        val staged = graft.functions.F.materialize(
          novel.withColumn("__batch", lit(batchKey)))
        emitted.add(staged.count())
        // state records only ADMITTED docs' bands: the dedup set is what
        // passed, not what was seen
        val novelBands = bands
          .join(staged.select(col(idCol)), Seq(idCol), "left_semi")
          .withColumn("__batch", lit(batchKey))
        ExactlyOnceBatches.writePartition(
          novelBands.select(col("band"), col("bucket"), col("__batch")), stateDir)
        ExactlyOnceBatches.writePartition(staged, outDir)
        ExactlyOnceBatches.commitMarker(spark, stateDir, batchKey)
      }
      .start()
    q.awaitTermination()
    emitted.value
    }
  }
}
