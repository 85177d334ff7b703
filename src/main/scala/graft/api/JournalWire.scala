package graft.api

import java.sql.Timestamp

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.lake.LakeRepository
import graft.model.{FtmModel, Statement}

/** JSONL statement wire shared by the HTTP journal/bulk route and the CLI
  * `statements import` (reference journal.py:20-44 + cli/statements.py):
  * one statement object per line; the shard is ALWAYS recomputed from the
  * dataset's recorded shard count (config authority, never the writer's
  * idea); id/bucket/prop_type default from the content recipe and the
  * model when absent.
  */
object JournalWire {

  private val mapper = new ObjectMapper()

  /** Rows-per-journal-write chunk: a bulk post is parsed lazily and
    * written in bounded batches, so an arbitrarily large JSONL body never
    * holds more than one chunk of Statement objects in driver memory.
    */
  val ChunkRows = 100000

  def writeRows(spark: SparkSession, r: LakeRepository, ds: String,
      lines: IterableOnce[String]): Long = {
    var n = 0L
    lines.iterator.map(_.trim).filter(_.nonEmpty)
      .grouped(ChunkRows).foreach { chunk =>
        val stmts = chunk.map(parseRow(_, ds))
        import spark.implicits._
        val compat = Hashing.ftmCompat(spark)
        val df = stmts.toDS().toDF()
          .withColumn("shard",
            if (compat) Hashing.ftmShardOf(col("entity_id"), r.shards)
            else Hashing.shardOf(col("entity_id"), r.shards))
          // compat: null lang for non-linguistic prop types before keying
          // AND storage (explode.py:192-196), then fold the wire's
          // external flag and surviving lang into the derived id
          .withColumn("lang",
            if (compat)
              when(col("prop_type").isInCollection(FtmModel.nonLinguistic),
                lit(null)).otherwise(col("lang"))
            else col("lang"))
          .withColumn("id", when(col("id") === "",
            if (compat)
              Hashing.ftmStatementKey(col("dataset"), col("entity_id"),
                col("prop"), col("value"), col("external"), col("lang"))
            else
              Hashing.statementKey(col("dataset"), col("entity_id"), col("prop"), col("value")))
            .otherwise(col("id")))
        r.journal.write(df)
        n += chunk.size
      }
    n
  }

  private[graft] def parseRow(line: String, ds: String): Statement = {
    val n =
      try mapper.readTree(line)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"invalid JSON row: ${e.getMessage}")
      }
    def str(f: String): Option[String] =
      Option(n.get(f)).filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)
    def req(f: String) = str(f).getOrElse(
      throw new IllegalArgumentException(s"missing field `$f` in journal row"))
    val schema = str("schema").getOrElse("Thing")
    val now = new Timestamp(System.currentTimeMillis() / 1000 * 1000)
    Statement(
      shard = "", // recomputed by writeRows from config authority
      id = str("id").getOrElse(""),
      entity_id = req("entity_id"), dataset = ds,
      bucket = str("bucket").getOrElse(FtmModel.bucketOf(schema)),
      // origin flows into partition values and storage paths — boundary-
      // validated like the reference (util.py safe_name on every origin)
      origin = graft.lake.Catalog.safePathComponent(
        str("origin").getOrElse("bulk"), "origin"), source = None,
      schema = schema, prop = req("prop"),
      prop_type = str("prop_type").getOrElse("string"),
      value = req("value"), original_value = str("original_value"),
      lang = str("lang"),
      // both JSON-boolean and "true"/"1" string spellings, like the CSV
      // source's external parse
      external = Option(n.get("external")).filterNot(_.isNull)
        .map(_.asText.trim.toLowerCase).exists(v => v == "true" || v == "1"),
      first_seen = str("first_seen").map(parseTs).getOrElse(now),
      last_seen = str("last_seen").map(parseTs).getOrElse(now),
      fragment = str("fragment").getOrElse(""),
      deleted_at = str("deleted_at").map(parseTs))
  }

  /** Wire timestamps are UTC regardless of the driver's zone (reference
    * treats every timestamp as UTC — helpers/statements.py:30-40,
    * tests/test_utc.py): instant and offset forms parse to their
    * absolute instant; NAIVE forms are interpreted as UTC, never the JVM
    * default zone — otherwise the same wire text would order differently
    * across differently-zoned drivers and flip last-writer-wins in the
    * journal drain. Junk maps to IllegalArgumentException (clean 400).
    */
  private[api] def parseTs(s: String): Timestamp =
    graft.functions.F.parseUtcTimestamp(s)
}
