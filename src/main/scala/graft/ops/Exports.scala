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
  * covers an entity range strictly before part k+1. For the JSON-lines
  * flavor, `cat part-*` in numeric part order IS the reference's single
  * sorted file; the CSV flavor writes a header into EVERY part (the
  * directory reads back as one table via [[csvImport]]'s header mode),
  * so a literal single sorted file comes from [[singleFileCsv]] /
  * [[singleFileJson]], which concatenate header-less parts driver-side.
  */
object Exports {

  /** Total in-partition sort order: the caller's range key first, every
    * remaining column as tiebreak. `sortCol` alone is NOT a key of a
    * statement export (one entity carries many rows), so sorting by it
    * alone leaves tie order to upstream physical layout — and artifact
    * bytes would then change whenever a merge/ingest plan reshuffles,
    * breaking the byte-reproducibility contract (streamed and batch
    * ingestion of the same rows must publish identical files).
    *
    * Unorderable columns (maps, e.g. an entity's properties) are skipped
    * as tiebreaks — exports whose rows need them for uniqueness must sort
    * on a genuine key column (the entity exports do: `id` is unique).
    */
  private def totalOrder(df: DataFrame, sortCol: String) =
    col(sortCol) +: df.schema.fields.toSeq
      .filter(f => f.name != sortCol &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      .map(f => col(f.name))

  /** S9: sorted CSV export. Quote/escape settings round-trip embedded
    * separators, quotes and newlines; compression via codec option.
    */
  def csvExport(df: DataFrame, path: String, sortCol: String = "entity_id",
      compression: String = "none"): Unit =
    df.repartitionByRange(col(sortCol))
      .sortWithinPartitions(totalOrder(df, sortCol): _*)
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
      .sortWithinPartitions(totalOrder(df, sortCol): _*)
      .write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .json(path)

  /** S12 source side: JSON-lines with explicit schema. */
  def jsonImport(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S10 statements source: read a statements.csv and RE-DERIVE the
    * columns the store owns — content-hash `id`, model `prop_type`, and
    * the shard assignment — rather than trusting the file's values
    * (reference helpers/statements.py:147-179 re-derives id + prop_type
    * on import; `external` is parsed from "true"/"1"). `fragment` and the
    * lifecycle timestamps are preserved as-is.
    */
  def statementsCsvImport(spark: SparkSession, path: String,
      shards: Int): DataFrame = {
    import graft.functions.Hashing
    import graft.model.{FtmModel, Statement}
    // read `external` as text so both "true" and "1" spellings parse
    val readSchema = StructType(Statement.schema.map {
      case f if f.name == "external" => f.copy(dataType = org.apache.spark.sql.types.StringType)
      case f => f
    })
    val typeMap = typedLit(FtmModel.propTypes.toMap)
    csvImport(spark, path, readSchema)
      .withColumn("external", lower(coalesce(col("external"), lit("false"))).isin("true", "1"))
      .withColumn("prop_type",
        when(col("prop") === Statement.BaseId, "checksum")
          .otherwise(coalesce(element_at(typeMap, col("prop")), lit("string"))))
      // compat: the reference import nulls lang for non-linguistic prop
      // types BEFORE keying (explode.py:192-196) and folds the row's
      // external flag and surviving lang into the statement id. The
      // native path keeps its own md5 recipe and the CSV's lang as-is.
      .withColumn("lang",
        if (Hashing.ftmCompat(spark))
          when(col("lang") === "" ||
            col("prop_type").isInCollection(FtmModel.nonLinguistic), lit(null))
            .otherwise(col("lang"))
        else col("lang"))
      .withColumn("id",
        if (Hashing.ftmCompat(spark))
          Hashing.ftmStatementKey(col("dataset"), col("entity_id"),
            col("prop"), col("value"), col("external"), col("lang"))
        else
          Hashing.statementKey(col("dataset"), col("entity_id"), col("prop"), col("value")))
      .withColumn("shard",
        if (Hashing.ftmCompat(spark)) Hashing.ftmShardOf(col("entity_id"), shards)
        else Hashing.shardOf(col("entity_id"), shards))
      .select(Statement.columns.map(col): _*)
  }

  /** F12: single-file sorted artifact with optional gz/zst compression —
    * the byte-reproducible file downstream mirrors checksum (reference
    * logic/compress.py, core/conventions/path.py:235-238).
    *
    * The sort is distributed (range partition + in-partition sort); only
    * the final concat streams through the driver, sequentially in part
    * order, so driver memory stays O(buffer) regardless of artifact size.
    * Determinism: `java.util.zip.GZIPOutputStream` writes a zeroed MTIME
    * header (the reference sets mtime=0 explicitly for the same reason)
    * and zstd frames carry no timestamp, so identical rows → identical
    * bytes on every run.
    */
  def singleFileCsv(df: DataFrame, dest: String, sortCol: String = "entity_id",
      compression: String = "none"): Unit = {
    val parts = dest + ".parts"
    df.repartitionByRange(col(sortCol))
      .sortWithinPartitions(totalOrder(df, sortCol): _*)
      .write.mode(SaveMode.Overwrite)
      .option("header", "false")
      .option("quote", "\"").option("escape", "\"")
      .csv(parts)
    val header = df.columns.mkString("", ",", "\n")
    concatParts(df.sparkSession, parts, dest, compression, Some(header))
  }

  /** F12 twin for JSON-lines artifacts. */
  def singleFileJson(df: DataFrame, dest: String, sortCol: String,
      compression: String = "none"): Unit = {
    val parts = dest + ".parts"
    df.repartitionByRange(col(sortCol))
      .sortWithinPartitions(totalOrder(df, sortCol): _*)
      .write.mode(SaveMode.Overwrite)
      .json(parts)
    concatParts(df.sparkSession, parts, dest, compression, None)
  }

  private def concatParts(spark: SparkSession, partsDir: String, dest: String,
      compression: String, header: Option[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // NUMERIC task order, not lexicographic name order: past 99999
    // partitions Spark emits part-100000…, which sorts by name BEFORE
    // part-99999 and would silently interleave entity ranges out of
    // order in the "sorted" artifact
    val files = fs.listStatus(new Path(partsDir))
      .map(_.getPath).filter(_.getName.startsWith("part-"))
      .sortBy { p =>
        val digits = p.getName.drop(5).takeWhile(_.isDigit)
        (if (digits.isEmpty) Long.MaxValue else digits.toLong, p.getName)
      }
    // concat into a dot-tmp sibling and publish with a replace-rename:
    // mirrors fetch these artifacts by name, and a direct overwrite
    // would expose a torn prefix during the write — worse, a crash
    // mid-concat would leave a corrupt file that LOOKS complete
    val tmp = new Path(destPath.getParent,
      s".${destPath.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val rawOut = fs.create(tmp, true)
      val out: java.io.OutputStream = compression match {
        case "gzip" | "gz" => new java.util.zip.GZIPOutputStream(rawOut)
        case "zstd" | "zst" => new com.github.luben.zstd.ZstdOutputStream(rawOut)
        case _ => rawOut
      }
      try {
        header.foreach(h => out.write(h.getBytes("UTF-8")))
        val buf = new Array[Byte](256 * 1024)
        files.foreach { f =>
          val in = fs.open(f)
          try {
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
        }
      } finally out.close()
      if (!graft.lake.FsOps.renameReplace(fs, tmp, destPath))
        throw new java.io.IOException(s"could not publish $dest")
    } finally fs.delete(tmp, false) // no-op when the rename consumed it
    fs.delete(new Path(partsDir), true)
  }
}
