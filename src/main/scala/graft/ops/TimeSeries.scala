package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: per-key gap-fill onto a fixed step grid
  * with last-observation-carried-forward — the resample step every
  * metrics/feature pipeline needs and Spark has no native operator for.
  * Composed Spark-first (brief §custom-operators path (a)): a bounded
  * `sequence` explode builds each key's grid, an equi-join attaches the
  * observed buckets, one window carries the last observation forward.
  *
  * Scale shape: the pre-aggregation is map-side-partial; the grid is
  * bounded by span/step per key (never a cross join against a global
  * calendar); the join is equi-keyed on (key, bucket) so AQE picks
  * hash/broadcast; the forward-fill is ONE window whose partitioning
  * matches the join key — at most two exchanges end to end.
  */
object TimeSeries {

  /** Fill `aggregated` (key, bucketMs, value columns...) onto the
    * per-key [min(bucket), max(bucket)] grid at `stepMs`. Missing
    * buckets get `fillZero` columns as 0 and carry the latest previous
    * value of each `carryForward` column; `filled` flags synthesized
    * rows.
    */
  def gapFill(aggregated: DataFrame, key: String, bucketCol: String,
      stepMs: Long, fillZero: Seq[String], carryForward: Seq[String]): DataFrame = {
    require(stepMs > 0, s"stepMs must be positive: $stepMs")
    val spans = aggregated.groupBy(col(key))
      .agg(min(col(bucketCol)).as("__mn"), max(col(bucketCol)).as("__mx"))
    val grid = spans.select(col(key),
      explode(sequence(col("__mn"), col("__mx"), lit(stepMs))).as(bucketCol))
    val joined = grid.join(aggregated, Seq(key, bucketCol), "left_outer")
    val w = Window.partitionBy(col(key)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marker = fillZero.headOption.orElse(carryForward.headOption)
      .getOrElse(sys.error("need at least one value column"))
    val zeroed: DataFrame = fillZero.foldLeft(joined) { (df, c) =>
      df.withColumn(s"__z_$c", coalesce(col(c), lit(0L)))
    }
    val carried = carryForward.foldLeft(zeroed) { (df, c) =>
      df.withColumn(s"__f_$c", last(col(c), ignoreNulls = true).over(w))
    }
    carried
      .withColumn("filled", col(marker).isNull)
      .select(col(key) +: col(bucketCol) +:
        (fillZero.map(c => col(s"__z_$c").as(c)) ++
          carryForward.map(c => col(s"__f_$c").as(c)) :+ col("filled")): _*)
  }
}
