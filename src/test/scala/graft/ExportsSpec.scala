package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.ops.Exports

/** F12: single-file sorted export artifacts — deterministic bytes across
  * runs (what downstream mirrors checksum), gz/zst codecs, readable back.
  */
class ExportsSpec extends SparkSpec {

  private def sha(path: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(Files.readAllBytes(java.nio.file.Paths.get(path)))
      .map(b => f"${b & 0xff}%02x").mkString

  test("single-file csv: sorted, deterministic bytes, gzip and zstd round-trip") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (f"e${(i * 7919) % 1000}%04d", s"v$i"))
      .toDF("entity_id", "value")
    val base = Files.createTempDirectory("graft-single").toString

    // plain: header + globally sorted rows
    Exports.singleFileCsv(df, s"$base/out.csv")
    val lines = scala.io.Source.fromFile(s"$base/out.csv").getLines().toVector
    assert(lines.head == "entity_id,value")
    val keys = lines.tail.map(_.split(",")(0))
    assert(keys == keys.sorted && keys.length == 1000)

    // byte determinism: same input, two runs, identical artifact
    Exports.singleFileCsv(df, s"$base/out2.csv.gz", compression = "gzip")
    Exports.singleFileCsv(df, s"$base/out3.csv.gz", compression = "gzip")
    assert(sha(s"$base/out2.csv.gz") == sha(s"$base/out3.csv.gz"))

    // gzip artifact reads back through Spark's codec inference
    val back = spark.read.option("header", "true").csv(s"$base/out2.csv.gz")
    assert(back.count() == 1000)

    // zstd artifact decompresses to the plain bytes
    Exports.singleFileCsv(df, s"$base/out.csv.zst", compression = "zstd")
    val zin = new com.github.luben.zstd.ZstdInputStream(
      new java.io.FileInputStream(s"$base/out.csv.zst"))
    val plain = new String(zin.readAllBytes(), "UTF-8")
    zin.close()
    assert(plain == lines.mkString("", "\n", "\n"))

    // json twin
    Exports.singleFileJson(df, s"$base/out.json.gz", "entity_id", "gzip")
    assert(spark.read.json(s"$base/out.json.gz").count() == 1000)
  }
}
