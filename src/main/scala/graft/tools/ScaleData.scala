package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: build a ×N-scaled copy of a testdata directory for the
  * scale-amortization bench (`tools/bench_scaled.sh`).
  *
  * `sbt "runMain graft.tools.ScaleData <srcSfDir> <outDir> <factor>"`
  *
  * `events` and `documents` are replicated `factor` times with key
  * columns offset per replica (`id + i * (max+1)`), so ids stay unique
  * and WITHIN-replica distributions (mod-classes, origins, timestamps,
  * text content) are untouched — the scaled corpus is `factor` disjoint
  * copies of the original workload, which is exactly the shape a
  * fixed-overhead amortization measurement wants. Every other table is
  * byte-copied unchanged. Each output table is a SINGLE parquet file so
  * the DuckDB oracle's `FROM '<dir>/<t>.parquet'` view works on it.
  */
object ScaleData {

  private def singleFileParquet(spark: SparkSession, df: DataFrame, out: Path): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = out.getFileSystem(conf)
    val tmp = new Path(out.getParent, s".${out.getName}.tmp")
    // 8 MB row groups: a single-task coalesce(1) write would otherwise
    // emit ~128 MB row groups, and NO reader (Spark or DuckDB — both
    // parallelize parquet at row-group granularity) could scan the
    // scaled file with more than 1-2 threads. Small groups keep the
    // single-file-for-the-oracle contract while letting both engines
    // use the cores; stats/pruning are per-row-group and unaffected.
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", (8L << 20).toString)
      .parquet(tmp.toString)
    val part = fs.listStatus(tmp)
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(sys.error(s"no part file under $tmp"))
    if (fs.exists(out)) fs.delete(out, true)
    fs.rename(part, out)
    fs.delete(tmp, true)
  }

  private def replicate(df: DataFrame, offsets: Map[String, Long], factor: Int): DataFrame = {
    val replica = explode(sequence(lit(0), lit(factor - 1))).as("__rep")
    df.select(col("*"), replica)
      .select(df.columns.map { c =>
        if (offsets.contains(c)) (col(c) + col("__rep") * lit(offsets(c))).as(c)
        else col(c)
      }: _*)
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = graft.Sessions.local("graft-scale")
    val conf = spark.sessionState.newHadoopConf()
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(conf)
    fs.mkdirs(outPath)

    def keyOffset(table: String, keyCol: String): Long =
      spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col(keyCol))).collect()(0).getLong(0) + 1L

    // Coordinated star-schema offsets: ONE offset per logical key, shared
    // by every column referencing it, so a replicated fact row still
    // joins its own replica's dimension row — the scaled lake is `factor`
    // disjoint copies of the whole workload, graph included (the r9
    // scaled bench copied the order-fact chain unchanged, so graph
    // queries measured job-launch overhead against a CONSTANT graph).
    // nation/region stay shared dims (replicas pointing at common
    // geography changes no per-replica join cardinality).
    val custK = keyOffset("customer", "c_custkey")
    val suppK = keyOffset("supplier", "s_suppkey")
    val ordK = keyOffset("orders", "o_orderkey")
    val scaledKeys: Map[String, Map[String, Long]] = Map(
      "events" -> Map(
        "event_id" -> keyOffset("events", "event_id"),
        "user_id" -> keyOffset("events", "user_id")),
      "documents" -> Map("doc_id" -> keyOffset("documents", "doc_id")),
      "embeddings" -> Map("vec_id" -> keyOffset("embeddings", "vec_id")),
      "customer" -> Map("c_custkey" -> custK),
      "supplier" -> Map("s_suppkey" -> suppK),
      "orders" -> Map("o_orderkey" -> ordK, "o_custkey" -> custK),
      "lineitem" -> Map("l_orderkey" -> ordK, "l_suppkey" -> suppK))
    graft.Tables.all.foreach { t =>
      val srcFile = new Path(s"$src/$t.parquet")
      val outFile = new Path(outPath, s"$t.parquet")
      scaledKeys.get(t) match {
        case Some(offsets) =>
          val df = spark.read.parquet(srcFile.toString)
          singleFileParquet(spark, replicate(df, offsets, factor), outFile)
          println(s"[scale] $t: x$factor -> $outFile")
        case None =>
          org.apache.hadoop.fs.FileUtil.copy(
            fs, srcFile, fs, outFile, false, true, conf)
          println(s"[scale] $t: copied unchanged")
      }
    }
    spark.stop()
  }
}
