package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.text.TextFunctions

/** Shared exactly-once machinery for the streaming dedupe family
  * ([[DedupStream]], [[NearDupStream]]): state and output are parquet
  * tables partitioned by a run-scoped batch key, written with dynamic
  * partition overwrite (state first, output second), and a zero-byte
  * commit marker under `stateDir/_commits` written LAST gates everything.
  *
  * Recovery rules this encodes:
  *  - A batch is committed iff its marker exists. Reconciliation at run
  *    start drops state AND output partitions of uncommitted batches, so
  *    a crash anywhere mid-batch re-runs it cleanly — no torn output
  *    partition can suppress its docs, no orphaned state can anti-join
  *    them away.
  *  - A WITHIN-run replay (same batch key) rewrites the same partitions
  *    with identical rows (the state read excludes the batch's own
  *    partition) — no duplicate emission.
  *  - The whole run holds the lake lock under stateDir: a second
  *    concurrent run would otherwise reconcile away the in-flight run's
  *    uncommitted partitions and double-emit.
  */
private[streaming] object ExactlyOnceBatches {

  def reconcile(spark: SparkSession, stateDir: String, outDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def batches(dir: String): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("__batch=")).toSet
    }
    val commitsDir = new org.apache.hadoop.fs.Path(stateDir, "_commits")
    val committed: Set[String] =
      if (!fs.exists(commitsDir)) Set.empty
      else fs.listStatus(commitsDir).map(_.getPath.getName).toSet
    val uncommitted = (batches(stateDir) ++ batches(outDir)) -- committed
    uncommitted.foreach { b =>
      System.err.println(s"[dedup-stream] dropping uncommitted batch partition $b (crashed run)")
      fs.delete(new org.apache.hadoop.fs.Path(stateDir, b), true)
      fs.delete(new org.apache.hadoop.fs.Path(outDir, b), true)
    }
  }

  /** Commit marker LAST: reconciliation trusts a batch's partitions only
    * once this exists. Also heartbeats the run's fence — a stream legally
    * holds the stateDir lock across many micro-batches, far past the
    * stale TTL that assumes short manifest-commit holds.
    */
  def commitMarker(spark: SparkSession, stateDir: String, batchKey: String): Unit = {
    val commitsDir = new org.apache.hadoop.fs.Path(stateDir, "_commits")
    val cfs = commitsDir.getFileSystem(spark.sessionState.newHadoopConf())
    graft.lake.FsOps.mkdirs(cfs, commitsDir)
    graft.lake.FsOps.writeSmall(cfs,
      new org.apache.hadoop.fs.Path(commitsDir, s"__batch=$batchKey"),
      Array.emptyByteArray)
    graft.lake.Locks.heartbeat(cfs, new org.apache.hadoop.fs.Path(stateDir))
  }

  /** Read the state table, or None when it holds nothing yet. Only a
    * missing or empty path means "first batch ever" (dir exists but
    * holds no parquet, e.g. after reconciliation dropped the lone
    * partition) — any other read failure must fail the batch, or a
    * transient IO error would silently disable dedupe for the whole
    * micro-batch. The emptiness PROBE runs against the filesystem
    * instead of read-and-catch: a failed `spark.read` inside an active
    * foreachBatch fires every ExecutionListener (ObservationManager
    * logs an ERROR per miss once any Observation has been used in the
    * session) even when the miss is the expected first-batch case.
    * The probe walks exactly the paths `spark.read.parquet` will treat
    * as data: hidden/underscore-prefixed names (`_temporary` leftovers
    * from an interrupted overwrite, `_commits`, `_SUCCESS`, `.`-files)
    * are invisible to the reader, so a probe that counted them would
    * answer "has data" and then hand the reader a dir it sees as empty.
    */
  def readState(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    // Spark's own exclusion rule (InMemoryFileIndex): "."-prefixed and
    // "_"-prefixed names are invisible EXCEPT "_"-names containing "="
    // — partition directories like this table's `__batch=...` dirs
    def visible(p: org.apache.hadoop.fs.Path): Boolean = {
      val n = p.getName
      !n.startsWith(".") && (!n.startsWith("_") || n.contains("="))
    }
    def hasParquet(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { st =>
        visible(st.getPath) &&
          (if (st.isDirectory) hasParquet(st.getPath)
           else st.getPath.getName.endsWith(".parquet"))
      }
    val hasData =
      try fs.exists(path) && hasParquet(path)
      catch { case _: java.io.FileNotFoundException => false }
    if (hasData) Some(spark.read.parquet(stateDir)) else None
  }

  def writePartition(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch").parquet(dir)
}

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
  * state partitions. Commit/recovery semantics: [[ExactlyOnceBatches]].
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
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(spark.sessionState.newHadoopConf())
    graft.lake.FsOps.mkdirs(fs, statePath)
    graft.lake.Locks.withLock(fs, statePath) {
    ExactlyOnceBatches.reconcile(spark, stateDir, outDir)
    val q = docs.writeStream
      .queryName(name)
      .option("checkpointLocation", graft.functions.F.stageTempPath(spark, "ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // run-scoped batch key: a replayed micro-batch (same run, same id)
        // lands on the SAME partition, a fresh run (new name) never
        // collides with an old run's partitions
        val batchKey = s"$name-$batchId"
        // coalesce BEFORE fingerprinting: null text must fingerprint to
        // the empty-doc key, not to a null key — null keys never match
        // the state left_anti, so null-text docs would be re-admitted on
        // every run while the in-batch window (null-safe partitionBy)
        // collapses them, and the two paths would disagree
        val fp = batch
          .withColumn("__fp",
            TextFunctions.fingerprint(coalesce(col(textCol), lit(""))))
          // in-batch exact dedupe: keep the smallest id per fingerprint
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("__fp")).orderBy(col(idCol))))
          .filter(col("__rn") === 1).drop("__rn")
        val novel = ExactlyOnceBatches.readState(spark, stateDir) match {
          // exclude this batch's OWN partition from the state read: a
          // replayed batch then recomputes exactly the novel set it
          // produced the first time, instead of anti-joining against its
          // own half-committed fingerprints and emitting nothing
          case Some(s) => fp.join(
            s.filter(col("__batch") =!= lit(batchKey)), Seq("__fp"), "left_anti")
          case None => fp
        }
        // stage the novel set once; both writes read it back instead of
        // re-running the anti-join per sink. The emit count rides the
        // stage write via observe — no extra count() job per micro-batch.
        val (staged, novelCount) = graft.functions.F.materializeObserved(
          novel.withColumn("__batch", lit(batchKey)), count(lit(1)))
        emitted.add(novelCount)
        ExactlyOnceBatches.writePartition(staged.select("__fp", "__batch"), stateDir)
        ExactlyOnceBatches.writePartition(staged.drop("__fp"), outDir)
        ExactlyOnceBatches.commitMarker(spark, stateDir, batchKey)
      }
      .start()
    q.awaitTermination()
    emitted.value
    }
  }
}
