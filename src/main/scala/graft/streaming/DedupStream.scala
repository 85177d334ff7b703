package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.text.TextFunctions

/** Streaming corpus dedupe: a document stream where only novel documents
  * pass through, with fingerprint state maintained across micro-batches —
  * the continuous form of the d1/t4 batch dedupe for an always-on crawl
  * feed.
  *
  * Shape: `readStream → foreachBatch { in-batch dedupe → anti-join vs
  * the fingerprint state table → emit novel docs + append their
  * fingerprints }`. The state is a parquet stage table keyed by the t4
  * normalization fingerprint, NOT stream-stream state: corpus dedupe
  * state is unbounded (it grows with the corpus, there is no watermark
  * that could expire a document's fingerprint), so it belongs in a
  * table the same way the signature artifacts do in batch — at 100 TB
  * the anti-join shuffles only each micro-batch against the bucketed
  * state partitions, and replayed micro-batches are idempotent (their
  * fingerprints already sit in the state table, so they emit nothing).
  */
object DedupStream {

  /** Run the stream to exhaustion (AvailableNow — swap the trigger for a
    * continuous deployment). `docs` needs (idCol, textCol). Novel docs
    * are appended to `outDir`; fingerprints accumulate under `stateDir`.
    * Returns the number of novel documents emitted.
    */
  def run(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      stateDir: String, outDir: String): Long = {
    val name = s"graft_dedup_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val emitted = spark.sparkContext.longAccumulator(name)
    val q = docs.writeStream
      .queryName(name)
      .option("checkpointLocation", s"${graft.functions.F.stageRoot(spark)}/ckpt-$name")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fp = batch
          .withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
          // in-batch exact dedupe: keep the smallest id per fingerprint
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("__fp")).orderBy(col(idCol))))
          .filter(col("__rn") === 1).drop("__rn")
        val seen = scala.util.Try(spark.read.parquet(stateDir)).toOption
        val novel = seen match {
          case Some(s) => fp.join(s, Seq("__fp"), "left_anti")
          case None => fp
        }
        // stage the novel set once; both writes read it back instead of
        // re-running the anti-join per sink
        val staged = graft.functions.F.materialize(novel)
        emitted.add(staged.count())
        staged.drop("__fp").write.mode("append").parquet(outDir)
        staged.select("__fp").write.mode("append").parquet(stateDir)
      }
      .start()
    q.awaitTermination()
    emitted.value
  }
}
