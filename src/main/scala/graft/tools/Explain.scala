package graft.tools

/** Dev loop: print the formatted physical plan of registry queries.
  * `sbt "runMain graft.tools.Explain <sfDir> <query> [query ...]"`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local("graft-explain")
    args.drop(1).foreach { name =>
      println(s"==== $name ====")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
