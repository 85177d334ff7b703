package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway step-timer for the cur6 funnel (round-12 investigation). */
object Cur6Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sfx100")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = graft.Sessions.local("cur6-probe")
    def t[A](name: String)(f: => A): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name $s%.3f s"); s
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("scan_warm")(docs.select(count(lit(1))).collect())
    t("scan_text")(docs.select(sum(length(col("text")))).collect())
    val ts = (1 to reps).map { i =>
      t(s"full_query_$i")(
        graft.SparkEntry.queries("cur6_curation_funnel")(spark, dir).count())
    }
    println(f"[probe] full_query_min ${ts.min}%.3f s")
    spark.stop()
  }
}
