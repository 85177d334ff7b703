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

  test("statements csv import re-derives id, prop_type, and shard") {
    import spark.implicits._
    import java.sql.Timestamp
    import graft.model.Statement
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val stmts = Seq(
      Statement("WRONG", "WRONG-ID", "e1", "ds", "thing", "o1", None, "Person",
        "name", "WRONG-TYPE", "Alice", None, None, external = false, ts, ts, "", None),
      Statement("WRONG", "WRONG-ID2", "e1", "ds", "thing", "o1", None, "Person",
        Statement.BaseId, "WRONG-TYPE", "abc", None, None, external = true, ts, ts, "f1", None))
    val base = java.nio.file.Files.createTempDirectory("graft-stmtcsv").toString
    Exports.csvExport(stmts.toDS().toDF(), s"$base/statements.csv")
    val back = Exports.statementsCsvImport(spark, s"$base/statements.csv", shards = 4)
      .collect().map(r => r.getAs[String]("prop") -> r).toMap
    val name = back("name")
    // derived columns are recomputed, never trusted from the file
    val expectedId = Seq(("ds", "e1", "name", "Alice")).toDF("d", "e", "p", "v")
      .select(graft.functions.Hashing.statementKey(
        col("d"), col("e"), col("p"), col("v"))).collect()(0).getString(0)
    assert(name.getAs[String]("id") == expectedId)
    assert(name.getAs[String]("prop_type") == "name")
    assert(name.getAs[String]("shard") != "WRONG")
    val baseRow = back(Statement.BaseId)
    assert(baseRow.getAs[String]("prop_type") == "checksum")
    assert(baseRow.getAs[Boolean]("external"))
    // preserved columns survive untouched
    assert(baseRow.getAs[String]("fragment") == "f1")
    assert(name.getAs[Timestamp]("first_seen") == ts)
  }
}
