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

  def count(): Long = {
    val files = stagedFiles()
    if (files.isEmpty) 0L
    else spark.read.schema(Statement.schema).parquet(files.map(_.toString): _*).count()
  }

  /** Read the staged (not yet drained) rows — the journal's live content.
    * Empty-schema DataFrame when nothing is staged.
    */
  def staged(): DataFrame = {
    val files = stagedFiles()
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Statement.schema)
    else spark.read.schema(Statement.schema).parquet(files.map(_.toString): _*)
  }

  /** Drain the journal into the store: last-writer-wins upsert per
    * `(id, fragment, origin)`, tombstone `last_seen` bump (F7: a delete
    * must win the merge tiebreak), one sorted partitioned append, then
    * delete exactly the staged files that were read.
    */
  def drain(store: StatementStore): Long = {
    val files = stagedFiles()
    if (files.isEmpty) return store.version
    val staged = spark.read.schema(Statement.schema).parquet(files.map(_.toString): _*)
    val w = Window.partitionBy(col("id"), col("fragment"), col("origin"))
      .orderBy(col("last_seen").desc, col("deleted_at").desc_nulls_last)
    val upserted = staged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("last_seen", coalesce(col("deleted_at"), col("last_seen")))
    val v = store.append(upserted)
    files.foreach(f => fs.delete(f, false))
    v
  }
}
