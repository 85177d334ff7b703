package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Statement

/** Write-ahead journal: a parquet staging area under `_graft/journal` that
  * absorbs many small writer batches and drains into the main table as one
  * partitioned append (reference S13/ST1, storage/journal/sql.py — there a
  * SQL table with `(id, fragment)` upsert; here upsert-on-drain: last
  * writer wins per `(id, fragment, origin)` by `last_seen`, matching the
  * reference's dedupe_key semantics in logic/entities/buffer.py:23-241).
  *
  * Durability ordering matches the reference's yield→write→delete: staged
  * files are only deleted after the table append commits, so a crash
  * mid-drain re-appends rows — which the idempotent merge collapses.
  */
class Journal(spark: SparkSession, rootStr: String) {

  private val root = new Path(rootStr, "_graft/journal")
  private val fs = root.getFileSystem(spark.sessionState.newHadoopConf())

  /** Reference parity: auto-flush threshold, 1M journal rows
    * (repository/entities/main.py:110).
    */
  val AutoFlushRows = 1000000L

  def write(df: DataFrame): Unit =
    df.select(Statement.columns.map(col): _*)
      .write.mode("append").parquet(root.toString)

  /** Write a batch and drain into `store` once the staged row count
    * crosses the threshold — callers with many small batches never grow
    * the journal unboundedly (reference auto-flush). The count is a
    * parquet-footer read over the staging dir, not a data scan.
    */
  def writeAutoFlush(df: DataFrame, store: StatementStore,
      threshold: Long = AutoFlushRows): Unit = {
    write(df)
    if (count() >= threshold) drain(store)
  }

  private def stagedFiles(): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath).filter(_.getName.endsWith(".parquet")).toSeq

  /** Per-file footer row counts, cached by file name: the auto-flush
    * check after every batch probes only files it hasn't seen before
    * (O(new files) per write, one listing each call), instead of
    * re-opening every staged footer — which made many-small-batch ingest
    * (the journal's whole workload) O(n²) in cumulative driver IO between
    * flushes. Entries are evicted when their file leaves the staging dir
    * (drain, clear, or a concurrent writer's drain observed via listing).
    *
    * The cache is PER-INSTANCE, not shared: two `Journal` instances on
    * the same root (e.g. two JVMs, or two instances in one process) each
    * re-probe the other's files once on first sight — a cache miss costs
    * one footer read, never a wrong count, because every call re-lists
    * the directory and the footer content of an immutable staged file
    * never changes.
    */
  private val fileCounts = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Staged row count from parquet footers — incremental via
    * [[fileCounts]], no Spark job, no data scan. Unreadable files are
    * excluded (not counted, not failed): count() runs on the hot write
    * path and must not brick writers before [[drain]] gets the chance to
    * quarantine the bad file; they stay uncached so drain's fresh probe
    * decides their fate.
    */
  def count(): Long = {
    val files = stagedFiles()
    val names = files.map(_.getName).toSet
    fileCounts.keysIterator.filterNot(names).toSeq.foreach(fileCounts.remove)
    if (files.isEmpty) return 0L
    val fresh = files.filterNot(f => fileCounts.contains(f.getName))
    probeCounts(fresh).foreach { case (f, c) =>
      c.foreach(fileCounts.put(f.getName, _))
    }
    files.flatMap(f => fileCounts.get(f.getName)).sum
  }

  /** Read the staged (not yet drained) rows — the journal's live content.
    * Empty-schema DataFrame when nothing is staged.
    */
  def staged(): DataFrame = snapshot()._2

  /** A PINNED snapshot of the staging dir: the DataFrame reads exactly
    * the returned file list, so a stream-then-delete consumer (the HTTP
    * journal/flush route) can later [[clearFiles]] exactly what it
    * streamed — files staged concurrently with the stream survive.
    * Deleting via a fresh listing instead would silently discard rows
    * that were never delivered to anyone.
    */
  def snapshot(): (Seq[String], DataFrame) = {
    val files = stagedFiles().map(_.toString)
    val df =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Statement.schema)
      else spark.read.schema(Statement.schema).parquet(files: _*)
    (files, df)
  }

  private val quarantine = new Path(root, "_malformed")

  /** Quarantined journal content (unreadable staged files + rows failing
    * statement invariants) — the bad-row side-channel kept for forensics
    * instead of aborting or silently dropping (reference
    * storage/journal/base.py:159-187 logs and skips malformed rows so one
    * corrupt row can't abort the whole flush).
    */
  def malformedFiles(): Seq[String] =
    if (!fs.exists(quarantine)) Seq.empty
    else fs.listStatus(quarantine).filter(_.isFile).map(_.getPath.getName).toSeq.sorted

  /** Quarantined rows (statement-invariant failures caught at drain) as a
    * DataFrame — the other half of the forensic record, reported
    * separately from [[malformedFiles]] (whole unreadable staged files).
    * Empty when no drain has quarantined rows.
    */
  def malformedRows(): DataFrame = {
    val p = new Path(quarantine, "rows")
    if (!fs.exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Statement.schema)
    else spark.read.parquet(p.toString).drop("drain")
  }

  /** Footer row count per file, probed on the bounded driver IO pool —
    * O(files) metadata round trips, no data read. `None` = unreadable
    * footer (corrupt/torn file).
    */
  private def probeCounts(files: Seq[Path]): Seq[(Path, Option[Long])] = {
    if (files.isEmpty) return Seq.empty
    val conf = spark.sessionState.newHadoopConf()
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = FsOps.driverIoPool
    Await.result(
      Future.traverse(files) { f =>
        Future(f -> scala.util.Try {
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
          try r.getRecordCount finally r.close()
        }.toOption)
      }, Duration.Inf)
  }

  /** Rows a drain refuses to append: the fields every downstream operator
    * keys on must be present (the parquet twin of the reference's
    * unpack_statement failures — a wire row missing its key fields).
    */
  private val validRow: org.apache.spark.sql.Column =
    col("id").isNotNull && length(col("id")) > 0 &&
      col("entity_id").isNotNull && length(col("entity_id")) > 0 &&
      col("prop").isNotNull && col("fragment").isNotNull &&
      col("last_seen").isNotNull

  /** Delete all staged rows without draining them (reference
    * storage/journal/base.py:193-196). Returns the number of rows
    * discarded — counted from parquet footers, no data scan.
    */
  def clear(): Long = clearFiles(stagedFiles().map(_.toString))

  /** Delete exactly the named staged files (a prior [[snapshot]]'s list).
    * Files staged after the snapshot are untouched. The discarded count
    * is computed from the SAME list that gets deleted — a fresh count()
    * here would include concurrently staged rows this call does not
    * delete, misreporting them as discarded (and double-counting them on
    * the next clear). Unreadable files are deleted but count 0 rows,
    * matching count()'s exclusion.
    */
  def clearFiles(files: Seq[String]): Long = {
    if (files.isEmpty) return 0L
    val paths = files.map(new Path(_))
    val n = probeCounts(paths).flatMap(_._2).sum
    paths.foreach { f => fs.delete(f, false); fileCounts.remove(f.getName) }
    n
  }

  /** Drain the journal into the store: last-writer-wins upsert per
    * `(id, fragment, origin)`, tombstone `last_seen` bump (F7: a delete
    * must win the merge tiebreak), one sorted partitioned append, then
    * delete exactly the staged files that were read.
    *
    * Malformed content never aborts the drain (reference
    * storage/journal/base.py:159-187): staged files with unreadable
    * footers and rows failing statement invariants are moved/written to
    * the `_malformed` quarantine (logged, kept for forensics) and the
    * remaining rows drain normally.
    */
  def drain(store: StatementStore): Long = drainCounted(store)._1

  /** [[drain]] plus the number of journal rows actually consumed into
    * the store append: footer rows of the files drained, minus the rows
    * quarantined as malformed (in-batch upsert duplicates ARE consumed,
    * so they count). This is the figure the HTTP entities/flush contract
    * reports — a pre-drain `count()` would claim quarantined rows as
    * flushed and miss rows staged between the count and the drain.
    */
  def drainCounted(store: StatementStore): (Long, Long) = {
    val files = stagedFiles()
    if (files.isEmpty) return (store.version, 0L)
    val probed = probeCounts(files)
    val readable = probed.collect { case (f, Some(_)) => f }
    val corrupt = probed.collect { case (f, None) => f }
    val readableRows = probed.collect { case (_, Some(c)) => c }.sum
    if (corrupt.nonEmpty) {
      FsOps.mkdirs(fs, quarantine)
      corrupt.foreach { f =>
        System.err.println(s"[journal] quarantining unreadable staged file: ${f.getName}")
        // a failed move (e.g. name collision in quarantine) must not leave
        // the file behind to be re-probed and re-"quarantined" forever —
        // retry under a unique name, and fail loud if that loses too
        if (!FsOps.rename(fs, f, new Path(quarantine, f.getName))) {
          val alt = new Path(quarantine,
            s"${f.getName}.${java.util.UUID.randomUUID().toString.take(8)}")
          if (!FsOps.rename(fs, f, alt))
            throw new IllegalStateException(s"cannot quarantine ${f.getName}")
        }
      }
    }
    if (readable.isEmpty) return (store.version, 0L)
    val staged = spark.read.schema(Statement.schema).parquet(readable.map(_.toString): _*)
    val bad = staged.filter(!validRow)
    val badCount = bad.count()
    if (badCount > 0) {
      System.err.println(s"[journal] quarantining $badCount malformed row(s) to ${quarantine}")
      // keyed by the drained file set, overwrite-mode: a drain retried
      // after a downstream failure (e.g. fence contention in the store
      // append) rewrites the SAME quarantine partition instead of
      // appending a duplicate forensic record per attempt
      val drainKey = java.util.UUID.nameUUIDFromBytes(
        readable.map(_.getName).sorted.mkString("\n").getBytes("UTF-8")).toString
      bad.write.mode("overwrite")
        .parquet(new Path(quarantine, s"rows/drain=$drainKey").toString)
    }
    val w = Window.partitionBy(col("id"), col("fragment"), col("origin"))
      .orderBy(col("last_seen").desc, col("deleted_at").desc_nulls_last)
    val upserted = staged.filter(validRow)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("last_seen", coalesce(col("deleted_at"), col("last_seen")))
    val v = store.append(upserted)
    readable.foreach { f => fs.delete(f, false); fileCounts.remove(f.getName) }
    corrupt.foreach(f => fileCounts.remove(f.getName))
    (v, readableRows - badCount)
  }
}
