package graft.streaming

import org.apache.spark.sql.functions._

/** [[ExactlyOnceBatches.readState]]'s first-batch probe must answer the
  * same question `spark.read.parquet` would: hidden/underscore paths
  * (`_temporary` leftovers from an interrupted overwrite, `_commits`,
  * `_SUCCESS`) are invisible to the reader, so they must not make the
  * probe claim the state table has data.
  */
class StateProbeSpec extends graft.SparkSpec {

  test("readState ignores _temporary leftovers and hidden files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state-probe")
      .toAbsolutePath.toString

    // empty state dir → first batch
    assert(ExactlyOnceBatches.readState(spark, dir).isEmpty)

    // a crashed overwrite's _temporary parquet + marker noise the reader
    // never sees → still first batch (round 12 probed these and then
    // handed spark.read a dir it considers empty)
    val tmp = new java.io.File(s"$dir/_temporary/0/task-0")
    assert(tmp.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(tmp, "part-00000.parquet").toPath, Array[Byte](1, 2, 3))
    java.nio.file.Files.write(
      new java.io.File(dir, "_SUCCESS").toPath, Array.emptyByteArray)
    val commits = new java.io.File(s"$dir/_commits")
    assert(commits.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(commits, "__batch=x-0").toPath, Array.emptyByteArray)
    assert(ExactlyOnceBatches.readState(spark, dir).isEmpty)

    // a real committed partition → state exists and reads cleanly
    spark.range(3).withColumn("__batch", lit("x-0"))
      .write.mode("append").partitionBy("__batch").parquet(dir)
    assert(ExactlyOnceBatches.readState(spark, dir).exists(_.count() == 3))
  }
}
