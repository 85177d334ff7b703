package graft.tools

import org.apache.spark.sql.functions._

/** Phase decomposition of the s3 store lifecycle (append → merge →
  * read-back) — where does the wall-clock of the suite's most expensive
  * query actually go: the write jobs, the merge rewrite, or the
  * driver-side commit protocol (fence, staging moves, footer stats,
  * manifest)? Two passes; quote the second (warm) one.
  *
  * Usage: runMain graft.tools.StoreProbe [sfDir]
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("graft-store-probe")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }
    val stmts = graft.functions.F.materialize(
      graft.lake.EventStatements.statements(graft.Tables.events(spark, dir)))
    for (pass <- 1 to 2) {
      println(s"== pass $pass")
      val root = graft.functions.F.stageTempPath(spark, "store-probe")
      val store = new graft.lake.StatementStore(spark, root,
        graft.lake.EventStatements.Shards)
      t("append")(store.append(stmts))
      t("merge")(store.merge())
      t("read+sort+count") {
        store.raw.select(col("entity_id"), col("prop"), col("fragment"),
          col("id"), col("origin"), col("value"))
          .orderBy(col("entity_id"), col("prop")).count()
      }
    }
    spark.stop()
  }
}
