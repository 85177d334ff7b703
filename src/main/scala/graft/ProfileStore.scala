package graft

/** Scratch profiler for the store roundtrip phases (not part of the
  * driver contract; run manually via `runMain graft.ProfileStore`).
  */
object ProfileStore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-profile")
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm
    spark.read.parquet(s"$sfDir/events.parquet").count()
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val stmts = timed("stage-stmts") {
        graft.functions.F.materialize(
          graft.lake.EventStatements.statements(Tables.events(spark, sfDir)))
      }
      val tmp = java.nio.file.Files.createTempDirectory("graft_prof").toString
      val store = new graft.lake.StatementStore(spark, tmp, graft.lake.EventStatements.Shards)
      timed("append")(store.append(stmts))
      timed("merge")(store.merge())
      timed("readback-sort") {
        import org.apache.spark.sql.functions.col
        store.raw.orderBy(col("entity_id"), col("prop"), col("fragment"), col("id")).count()
      }
    }
    spark.stop()
  }
}
