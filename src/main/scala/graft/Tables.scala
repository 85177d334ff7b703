package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table. At 100 TB
  * these would be partitioned directories; `spark.read.parquet` handles both
  * transparently, and all downstream code treats the result as an ordinary
  * distributed DataFrame.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Schema cache: one footer-inference per (session, table path), reused
  // by every later read as an explicit schema. Every query construction
  // re-reads its base tables through here, and schema inference is a
  // driver-side footer fetch+parse per call — pure fixed planning cost
  // multiplied by the registry (a real catalog pins table schemas for
  // exactly this reason; StatementStore already passes its own explicit
  // schema). Metadata only — row data is never cached. Sessions are held
  // WEAKLY (a stopped session's entry — and its object graph — is
  // GC-collectable; a restarted session re-infers), and the cache assumes
  // base-table files are IMMUTABLE within a session: explicit-schema
  // reads skip footer validation, so a tool that rewrites a table in
  // place mid-session must call [[invalidate]] or it would read the new
  // file through the stale schema (wrong/null columns, not an error).
  private val schemaCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[
        String, org.apache.spark.sql.types.StructType]]())

  private def sessionSchemas(spark: SparkSession) = {
    schemaCache.synchronized {
      var m = schemaCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[
          String, org.apache.spark.sql.types.StructType]()
        schemaCache.put(spark, m)
      }
      m
    }
  }

  /** Drop the cached schema for `path` (all sessions) — for tools that
    * rewrite a base-table parquet in place within a live session.
    */
  def invalidate(path: String): Unit = schemaCache.synchronized {
    schemaCache.values.forEach(m => { m.remove(path); () })
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = sessionSchemas(spark).computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** Normalizes an events-shaped `ts` column to TimestampType (instant).
    * Generated data has shipped it three ways across rounds:
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; Sessions
    *     sets spark.sql.legacy.parquet.nanosAsLong=true so it arrives as
    *     LongType nanos — integer-divide to micros (data is micro-precise,
    *     so lossless);
    *   - TIMESTAMP_NTZ (micros, no zone): `withWatermark`/`unix_millis`
    *     require an instant type, so cast — the session timezone is pinned
    *     UTC (Sessions.configure), making the cast a deterministic
    *     reinterpretation of the same wall-clock as a UTC instant, which is
    *     exactly how the DuckDB oracle's epoch_ms reads it;
    *   - TIMESTAMP (instant): pass through.
    * Works identically on batch and streaming DataFrames.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(apply(spark, dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
