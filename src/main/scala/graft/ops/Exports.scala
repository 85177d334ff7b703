package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Export/import sinks and sources (reference S9-S12,
  * storage/parquet.py:732-764, repository/entities/main.py:361-437).
  *
  * Distributed artifacts are directories of part files, each
  * range-partitioned and internally sorted by `entity_id` — the
  * entity-contiguous layout downstream consumers rely on. Part file k
  * covers an entity range strictly before part k+1, so `cat part-*` in
  * filename order IS the reference's single sorted file; a driver-side
  * concat is only needed when one literal file is demanded.
  */
object Exports {

  /** S9: sorted CSV export. Quote/escape settings round-trip embedded
    * separators, quotes and newlines; compression via codec option.
    */
  def csvExport(df: DataFrame, path: String, sortCol: String = "entity_id",
      compression: String = "none"): Unit =
    df.repartitionByRange(col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("compression", compression)
      .csv(path)

  /** S10: CSV statement/document source with an explicit schema (never
    * inferSchema — a second scan at 100 TB).
    */
  def csvImport(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)

  /** S11: JSON-lines export (entities or statements). */
  def jsonExport(df: DataFrame, path: String, sortCol: String,
      compression: String = "none"): Unit =
    df.repartitionByRange(col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .json(path)

  /** S12 source side: JSON-lines with explicit schema. */
  def jsonImport(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
