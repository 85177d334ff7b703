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
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = fs.listStatus(tmp)
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(sys.error(s"no part file under $tmp"))
    if (fs.exists(out)) fs.delete(out, true)
    fs.rename(part, out)
    fs.delete(tmp, true)
  }

  private def replicate(df: DataFrame, keyCols: Seq[String], factor: Int): DataFrame = {
    val maxes = df.agg(
      keyCols.head -> "max", keyCols.tail.map(_ -> "max"): _*).collect()(0)
    val offsets = keyCols.zipWithIndex.map { case (c, i) => c -> (maxes.getLong(i) + 1L) }.toMap
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
    val scaledKeys = Map(
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    graft.Tables.all.foreach { t =>
      val srcFile = new Path(s"$src/$t.parquet")
      val outFile = new Path(outPath, s"$t.parquet")
      scaledKeys.get(t) match {
        case Some(keys) =>
          val df = spark.read.parquet(srcFile.toString)
          singleFileParquet(spark, replicate(df, keys, factor), outFile)
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
