package graft.ops

import org.apache.spark.sql.functions._

import graft.lake.{Journal, StatementStore}

/** Operation orchestration (reference §3.3: `optimize` = merge → compact →
  * vacuum; `make` = flush + every export in order, each freshness-gated by
  * tags so re-running `make` on an unchanged store does no IO).
  */
object Make {

  /** Maintenance: drain journal, merge dirty partitions, compact, vacuum.
    * Every step is incremental: a clean store is a metadata-only no-op.
    */
  def optimize(store: StatementStore, journal: Journal,
      graceCutoff: Option[org.apache.spark.sql.Column] = None): Long = {
    journal.drain(store)
    store.merge(graceCutoff)
    store.compact()
    store.vacuum()
    store.tags.touch("statements/last_optimized")
    store.version
  }

  /** Export pipeline with freshness gating: each artifact records the
    * store version it was built from; artifacts current for the version
    * are skipped (reference ST2 / operation/export.py:37-199).
    */
  def make(store: StatementStore, journal: Journal, outDir: String): Seq[String] = {
    optimize(store, journal)
    val v = store.version
    val done = scala.collection.mutable.ListBuffer.empty[String]
    def gated(name: String)(body: => Unit): Unit = {
      val tag = s"exports/$name"
      val versionTag = s"exports/$name.version"
      val current = store.tags.mtime(versionTag).contains(v)
      if (!current) {
        body
        store.tags.touch(versionTag, v) // encode version as the mtime
        store.tags.touch(tag)
        done += name
      }
    }
    gated("statements.csv") {
      Exports.csvExport(store.raw.select(
        col("id"), col("entity_id"), col("prop"), col("value"),
        col("fragment"), col("origin"), col("schema")), s"$outDir/statements.csv")
    }
    gated("entities.ftm.json") {
      Exports.jsonExport(
        EntityAssembly.assemble(store.live).toDF(), s"$outDir/entities.ftm.json", "id")
    }
    gated("statistics.json") {
      store.live.groupBy(col("bucket"), col("schema"))
        .agg(countDistinct(col("entity_id")).as("entities"),
          count(lit(1)).as("statements"))
        .coalesce(1)
        .write.mode("overwrite").json(s"$outDir/statistics.json")
    }
    done.toList
  }
}
