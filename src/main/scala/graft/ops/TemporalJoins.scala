package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively, composed Spark-first
  * from existing relational pieces (brief §custom-operators path (a)) —
  * no cross product, no custom physical node needed.
  *
  * - [[asofBackward]]: for each left row, the latest right row at or
  *   before it per key — ONE shuffle on the key via union + running
  *   `last(ignoreNulls)` window, never a join explosion. The naive
  *   formulation (equi-join on key + `rt <= t` + argmax) shuffles
  *   |matches| = O(N×M/keys) rows; this shuffles N+M exactly once.
  * - [[rangeJoinBinned]]: interval × point containment join via bin
  *   bucketing — each interval registers in the O(len/width) bins it
  *   covers, each point probes exactly its own bin, so the planner gets
  *   an equi-key hash join (shuffle or AQE-broadcast) instead of the
  *   BroadcastNestedLoopJoin a raw BETWEEN predicate forces when both
  *   sides are large. Each (interval, point) pair meets in exactly one
  *   bin (the point's), so no post-join dedupe is needed.
  */
object TemporalJoins {

  /** Backward as-of join. Carries `carry` columns (plus the matched
    * right timestamp as `<prefix><tCol>`) from the latest right row
    * with `right.t <= left.t` for the same key; null when none (or none
    * within `toleranceMs`).
    *
    * Within a key, rows order by (t, side) with right rows first at
    * equal t — a right row AT the left row's timestamp matches, the
    * at-or-before semantic. Equal-timestamp right rows tie-break by the
    * carry-struct ordering, making the pick total and deterministic.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      t: String, carry: Seq[String], prefix: String = "r_",
      toleranceMs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val carryStruct = struct(col(t).as("__rt") +: carry.map(col): _*)
    val rightU = right.select(
      leftCols.map {
        case c if c == key || c == t => col(c)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      } :+ carryStruct.as("__carry") :+ lit(0).as("__side"): _*)
    val carryType = rightU.schema("__carry").dataType
    val leftU = left.select(
      leftCols.map(col) :+ lit(null).cast(carryType).as("__carry") :+
        lit(1).as("__side"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(t).asc, col("__side").asc, col("__carry").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rightU.unionByName(leftU)
      .withColumn("__asof", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol: Column = toleranceMs match {
      case Some(ms) => col("__asof").isNotNull &&
        unix_millis(col(t)) - unix_millis(col("__asof.__rt")) <= ms
      case None => col("__asof").isNotNull
    }
    val gated = matched.withColumn("__m", when(inTol, col("__asof")))
    gated.select(leftCols.map(col) ++
      (col("__m.__rt").as(s"$prefix$t") +:
        carry.map(c => col(s"__m.$c").as(s"$prefix$c"))): _*)
  }

  /** Forward as-of join: the EARLIEST right row with `right.t >= left.t`
    * per key — the mirror of [[asofBackward]] (window frame flipped to
    * [current, unbounded following] with `first(ignoreNulls)`; at equal
    * timestamps the right row sorts after the left row, so a right row
    * AT the left row's timestamp still matches). Same N+M single-shuffle
    * scale shape.
    */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      t: String, carry: Seq[String], prefix: String = "r_",
      toleranceMs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val carryStruct = struct(col(t).as("__rt") +: carry.map(col): _*)
    val rightU = right.select(
      leftCols.map {
        case c if c == key || c == t => col(c)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      } :+ carryStruct.as("__carry") :+ lit(2).as("__side"): _*)
    val carryType = rightU.schema("__carry").dataType
    val leftU = left.select(
      leftCols.map(col) :+ lit(null).cast(carryType).as("__carry") :+
        lit(1).as("__side"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(t).asc, col("__side").asc, col("__carry").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = rightU.unionByName(leftU)
      .withColumn("__asof", first(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol: Column = toleranceMs match {
      case Some(ms) => col("__asof").isNotNull &&
        unix_millis(col("__asof.__rt")) - unix_millis(col(t)) <= ms
      case None => col("__asof").isNotNull
    }
    val gated = matched.withColumn("__m", when(inTol, col("__asof")))
    gated.select(leftCols.map(col) ++
      (col("__m.__rt").as(s"$prefix$t") +:
        carry.map(c => col(s"__m.$c").as(s"$prefix$c"))): _*)
  }

  /** Containment range join on pre-binned long axes (caller converts
    * timestamps to epoch millis): every `points` row joins every
    * `intervals` row with `startCol <= point <= endCol`. `binWidth`
    * should be >= the typical interval length so most intervals cover
    * O(1) bins.
    */
  def rangeJoinBinned(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val ivBinned = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    val ptBinned = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    ptBinned.join(ivBinned,
        ptBinned("__bin") === ivBinned("__bin") &&
          col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
