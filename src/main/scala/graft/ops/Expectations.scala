package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over any table — the
  * contract-check layer (Deequ/"expectations" shape) a lakehouse runs
  * before promoting a snapshot: each expectation is a row predicate or a
  * table-level law, and the report is one row per expectation with
  * checked/violation counts.
  *
  * Scale shape: ALL row-level expectations evaluate in a SINGLE pass —
  * one map-side-combinable aggregate with a conditional sum per
  * expectation — never one scan per rule (the naive loop is rule-count ×
  * corpus scans). Table-level laws (uniqueness) need their own grouped
  * aggregate by nature; they run as one extra aggregate per law, keyed
  * on the law's columns. No driver-side row handling anywhere.
  */
object Expectations {

  /** A row-level expectation: `pred` must hold on every row. */
  final case class RowRule(name: String, pred: Column)

  /** Evaluate row rules in one pass + optional uniqueness laws (each a
    * key column set that must identify rows uniquely). Returns
    * (expectation, n_checked, n_violations) ordered by expectation.
    */
  def check(df: DataFrame, rules: Seq[RowRule],
      unique: Seq[Seq[String]] = Nil): DataFrame = {
    require(rules.nonEmpty || unique.nonEmpty, "no expectations given")
    // rule names are interpolated into the stack() SQL below — keep them
    // identifier-shaped so a name can't smuggle expression syntax
    rules.foreach(r => require(r.name.matches("[A-Za-z0-9_]+"),
      s"rule name must be identifier-shaped: `${r.name}`"))
    val spark = df.sparkSession
    val rowReport: Option[DataFrame] =
      if (rules.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +:
          rules.map(r => sum(when(!coalesce(r.pred, lit(false)), 1L)
            .otherwise(0L)).as(s"__v_${r.name}"))
        val one = df.agg(aggs.head, aggs.tail: _*)
        // unpivot the single summary row into one row per expectation
        val stacked = rules.zipWithIndex.map { case (r, i) =>
          s"'${r.name}', __n, __v_${r.name}"
        }.mkString(", ")
        Some(one.select(expr(
          s"stack(${rules.size}, $stacked) as (expectation, n_checked, n_violations)")))
      }
    val uniqueReports = unique.map { cols =>
      val name = "unique(" + cols.mkString(",") + ")"
      df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .agg(count(lit(1)).as("__groups"),
          sum(when(col("__c") > 1, col("__c")).otherwise(lit(0L))).as("__dups"))
        .select(lit(name).as("expectation"),
          col("__groups").cast("long").as("n_checked"),
          col("__dups").cast("long").as("n_violations"))
    }
    (rowReport.toSeq ++ uniqueReports)
      .reduce(_ unionByName _)
      .orderBy(col("expectation"))
  }
}
