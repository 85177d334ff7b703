package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registries live in `graft.queries.*`, one object per domain; this
  * object only aggregates them. Every key in `queries` that is
  * SQL-expressible has a matching DuckDB oracle in `oracleSql` with
  * identical output column names and total row ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q2StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.StatementOps.queries ++
      graft.queries.TrainingData.queries ++
      graft.queries.StreamingOps.queries ++
      graft.queries.GraphOps.queries ++
      graft.queries.SketchOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.StatementOps.oracle ++
      graft.queries.TrainingData.oracle ++
      graft.queries.StreamingOps.oracle ++
      graft.queries.GraphOps.oracle ++
      graft.queries.SketchOps.oracle
}
