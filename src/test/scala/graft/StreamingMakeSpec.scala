package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.lake.{Journal, StatementStore}
import graft.ops.Make
import graft.streaming.EventStream
import graft.streaming.EventStream.{Ev, SessionOut}

class StreamingMakeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stateful streaming sessionization matches the batch twin on closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(1, ts("2024-01-01 00:00:00"), 1),
      Ev(1, ts("2024-01-01 00:10:00"), 2), // same session (gap 10m)
      Ev(1, ts("2024-01-01 01:00:00"), 3), // new session (gap 50m)
      Ev(2, ts("2024-01-01 00:00:00"), 4))
    val stream = MemoryStream[Ev]
    stream.addData(evs)
    val q = EventStream.sessionizeStreaming(stream.toDS(), gapMinutes = 30)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sess_out").as[SessionOut].collect()
    // only user 1's first session is closed (by the 50m in-stream gap)
    assert(closed.toSeq == Seq(SessionOut(1, 1, 2,
      ts("2024-01-01 00:00:00").getTime, ts("2024-01-01 00:10:00").getTime)))

    // batch twin agrees on that session
    val batch = EventStream.sessionizeBatch(evs.toDF(), 30).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(batch((1L, 1L)) == ((2L,
      ts("2024-01-01 00:00:00").getTime, ts("2024-01-01 00:10:00").getTime)))
  }

  test("streaming dedupe drops in-watermark duplicates with bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(Seq(
      Ev(1, ts("2024-01-01 00:00:00"), 1),
      Ev(1, ts("2024-01-01 00:00:01"), 1), // duplicate event_id
      Ev(2, ts("2024-01-01 00:00:02"), 2),
      Ev(2, ts("2024-01-01 00:00:03"), 2), // duplicate event_id
      Ev(3, ts("2024-01-01 00:00:04"), 3)))
    val q = EventStream.dedupeStreaming(stream.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").as[Ev].collect()
    assert(out.map(_.event_id).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("streaming ingestion through the journal equals the batch import") {
    val dir = Files.createTempDirectory("graft-ingest").toString
    val store = new StatementStore(spark, dir, shards = lake.EventStatements.Shards)
    val src = spark.readStream
      .schema(spark.read.parquet(s"$sf001/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf001)
    val srcTs =
      if (spark.read.parquet(s"$sf001/events.parquet").schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
        src.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      else src
    // tiny flush threshold so the run exercises mid-stream auto-drain
    val v = streaming.IngestStream.run(spark,
      lake.EventStatements.statements(srcTs), store, flushRows = 100)
    assert(v >= 1)

    // the streamed+merged store reads back exactly the batch-merged rows
    val batch = ops.MergeDedupe.withGrace(
      lake.EventStatements.statements(Tables.events(spark, sf001)),
      org.apache.spark.sql.functions.current_timestamp() -
        org.apache.spark.sql.functions.expr("INTERVAL 30 DAYS"))
    val got = store.raw.selectExpr("id", "entity_id", "prop", "fragment", "value")
      .collect().map(_.toString).sorted
    val want = batch.selectExpr("id", "entity_id", "prop", "fragment", "value")
      .collect().map(_.toString).sorted
    assert(got.length == want.length && got.sameElements(want))
  }

  test("streaming corpus dedupe: novel docs pass, fingerprint state persists across runs") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-dedupstream").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def feed(dir: String, docs: (Long, String)*) =
      docs.toSeq.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    // feed 1: three docs, one internal duplicate (4 is 1 re-spaced — the
    // t4 normalization fingerprint collapses them)
    feed(s"$base/feed1",
      1L -> "alpha beta gamma", 2L -> "delta epsilon", 3L -> "zeta eta",
      4L -> "  alpha  beta gamma ")
    def stream(dir: String) = spark.readStream.schema(schema).parquet(dir)
    val n1 = graft.streaming.DedupStream.run(spark, stream(s"$base/feed1"),
      "doc_id", "text", s"$base/state", s"$base/out")
    assert(n1 == 3) // 4 deduped against 1 in-batch
    // feed 2 (a later run, fresh stream): one seen doc, one novel
    feed(s"$base/feed2", 5L -> "alpha beta gamma", 6L -> "theta iota")
    val n2 = graft.streaming.DedupStream.run(spark, stream(s"$base/feed2"),
      "doc_id", "text", s"$base/state", s"$base/out")
    assert(n2 == 1) // only the novel doc survives the state anti-join
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 4)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L, 6L))
  }

  test("streaming dedupe: null text dedupes across runs like in-batch (no null-key bypass)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-dedupstream-null").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def feed(dir: String, docs: (Long, String)*) =
      docs.toSeq.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    def stream(dir: String) = spark.readStream.schema(schema).parquet(dir)
    // run 1: two null-text docs + one real — the in-batch window
    // collapses the nulls to one; its fingerprint must reach the state
    // table as a JOINABLE key (null keys never match a left_anti, so an
    // un-coalesced fingerprint would re-admit null docs on every run)
    feed(s"$base/feed1", 1L -> null, 2L -> null, 3L -> "alpha beta")
    val n1 = graft.streaming.DedupStream.run(spark, stream(s"$base/feed1"),
      "doc_id", "text", s"$base/state", s"$base/out")
    assert(n1 == 2) // doc 1 (null representative) + doc 3
    // run 2: another null-text doc and a seen doc — both suppressed
    feed(s"$base/feed2", 4L -> null, 5L -> "alpha beta")
    val n2 = graft.streaming.DedupStream.run(spark, stream(s"$base/feed2"),
      "doc_id", "text", s"$base/state", s"$base/out")
    assert(n2 == 0)
    assert(spark.read.parquet(s"$base/out").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 3L))
  }

  test("streaming dedupe recovers docs from a crashed run's orphaned state partition") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-dedupstream-crash").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    Seq(1L -> "alpha beta", 2L -> "gamma delta").toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$base/feed")
    // simulate a run that died between its state write and output write:
    // doc 1's fingerprint sits in a state partition with no output twin
    Seq(1L -> "alpha beta").toDF("doc_id", "text")
      .select(graft.text.TextFunctions.fingerprint(org.apache.spark.sql.functions.col("text")).as("__fp"))
      .withColumn("__batch", org.apache.spark.sql.functions.lit("deadrun-0"))
      .write.partitionBy("__batch").mode("overwrite").parquet(s"$base/state")
    // without reconciliation the anti-join would suppress doc 1 forever
    val n = graft.streaming.DedupStream.run(spark,
      spark.readStream.schema(schema).parquet(s"$base/feed"),
      "doc_id", "text", s"$base/state", s"$base/out")
    assert(n == 2)
    assert(spark.read.parquet(s"$base/out").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L))
  }

  test("streaming near-dup: band collisions suppress within a batch and across runs") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-neardupstream").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def feed(dir: String, docs: (Long, String)*) =
      docs.toSeq.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    def stream(dir: String) = spark.readStream.schema(schema).parquet(dir)
    val a = "the quick brown fox jumps over the lazy dog tonight"
    val b = "completely different content about spark shuffles and parquet footers"
    // run 1: doc 2 is an exact near-dup of doc 1 (all bands collide) —
    // in-batch pass keeps the lowest id; doc 3 is novel
    feed(s"$base/feed1", 1L -> a, 2L -> a, 3L -> b)
    val n1 = graft.streaming.NearDupStream.run(spark, stream(s"$base/feed1"),
      "doc_id", "text", s"$base/state", s"$base/out")
    assert(n1 == 2)
    // run 2: doc 4 collides with run 1's ADMITTED state (doc 1's bands);
    // doc 5 is novel; doc 6 is below the shingle width — admitted, never
    // recorded (documented edge)
    feed(s"$base/feed2", 4L -> a, 5L -> "yet another unrelated subject entirely here now", 6L -> "too short")
    val n2 = graft.streaming.NearDupStream.run(spark, stream(s"$base/feed2"),
      "doc_id", "text", s"$base/state", s"$base/out")
    assert(n2 == 2)
    val out = spark.read.parquet(s"$base/out")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 3L, 5L, 6L))
  }

  test("streaming near-dup multi-batch drain: order-insensitive invariants + restart") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.dedupe.Dedupe
    import org.apache.spark.sql.functions.{col, lit}
    val base = Files.createTempDirectory("graft-neardup-multi").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val A = "the quick brown fox jumps over the lazy dog tonight"
    val B = "completely different content about spark shuffles and parquet footers"
    val C = "yet another unrelated subject entirely here now okay"
    val D = "graph peeling with carried decrements is a fine algorithm indeed"
    val E = "exactly once semantics require markers and reconciliation on startup"
    // one parquet FILE per planned micro-batch, modtime-ordered so the
    // file source's maxFilesPerTrigger=1 drains them as 3 batches
    val feedDir = java.nio.file.Paths.get(base, "feed")
    java.nio.file.Files.createDirectories(feedDir)
    def writeFile(name: String, order: Int, docs: (Long, String)*): Unit = {
      val tmp = s"$base/.tmp-$name"
      docs.toSeq.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val dst = feedDir.resolve(s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + order * 60000L)
    }
    val batchOf = Map(10L -> 0, 11L -> 0, 12L -> 0, 20L -> 1, 21L -> 1,
      30L -> 2, 31L -> 2, 32L -> 2, 33L -> 2)
    writeFile("f0", 0, 10L -> A, 11L -> B, 12L -> A)
    writeFile("f1", 1, 20L -> A, 21L -> C)
    writeFile("f2", 2, 30L -> B, 31L -> C, 32L -> D, 33L -> "too short")
    val n = graft.streaming.NearDupStream.run(spark,
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(feedDir.toString),
      "doc_id", "text", s"$base/state", s"$base/out")
    val out = spark.read.parquet(s"$base/out")
    val admitted = out.select("doc_id").as[Long].collect().toSet
    assert(n == 5 && admitted == Set(10L, 11L, 21L, 32L, 33L), admitted)
    // it really drained as three micro-batches
    val outBatches = out.select("__batch").as[String].collect().toSet
    assert(outBatches.size == 3, outBatches)
    // doc -> micro-batch index, parsed from the committed batch keys
    val admBatch = out.select("doc_id", "__batch").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("-").last.toInt).toMap
    assert(admBatch.forall { case (d, b) => batchOf(d) == b }, admBatch)
    // recompute every doc's band buckets batch-side
    val corpus = Seq(10L -> A, 11L -> B, 12L -> A, 20L -> A, 21L -> C,
      30L -> B, 31L -> C, 32L -> D, 33L -> "too short")
    val bandRows = Dedupe.bandRows(
      Dedupe.minhashSignatureFromTerms(
        Dedupe.shingleRows(corpus.toDF("doc_id", "text"),
          "doc_id", "text", n = 3), "doc_id", 8),
      "doc_id", 8, 2)
      .select(col("doc_id"), col("band"), col("bucket"))
      .as[(Long, Int, String)].collect()
    val buckets: Map[Long, Set[(Int, String)]] =
      bandRows.groupBy(_._1).map { case (d, rs) =>
        d -> rs.map(r => (r._2, r._3)).toSet }
    // invariant 1: no two admitted docs ever share a band bucket
    for (a <- admitted; b <- admitted if a < b)
      assert(buckets.getOrElse(a, Set.empty)
        .intersect(buckets.getOrElse(b, Set.empty)).isEmpty, s"$a collides $b")
    // invariant 2: every dropped doc collides with an admitted doc of an
    // earlier batch, or a lower-id admitted batch-mate
    val dropped = corpus.map(_._1).toSet -- admitted
    for (d <- dropped) {
      val witnesses = admitted.filter { a =>
        buckets.getOrElse(a, Set.empty)
          .intersect(buckets.getOrElse(d, Set.empty)).nonEmpty &&
          (admBatch(a) < batchOf(d) || (admBatch(a) == batchOf(d) && a < d))
      }
      assert(witnesses.nonEmpty, s"dropped $d has no admit witness")
    }
    // kill-and-restart: a torn batch (state + output, NO marker) must be
    // reconciled away, and the restarted drain must judge against the
    // COMMITTED state only
    val tornBands = Dedupe.bandRows(
      Dedupe.minhashSignatureFromTerms(
        Dedupe.shingleRows(Seq(99L -> E).toDF("doc_id", "text"),
          "doc_id", "text", n = 3), "doc_id", 8), "doc_id", 8, 2)
    tornBands.select(col("band"), col("bucket"))
      .withColumn("__batch", lit("deadrun-9"))
      .write.partitionBy("__batch").mode("append").parquet(s"$base/state")
    Seq(99L -> E).toDF("doc_id", "text")
      .withColumn("__batch", lit("deadrun-9"))
      .write.partitionBy("__batch").mode("append").parquet(s"$base/out")
    val feed2 = java.nio.file.Paths.get(base, "feed2")
    java.nio.file.Files.createDirectories(feed2)
    Seq(40L -> E, 41L -> A).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(feed2.toString)
    val n2 = graft.streaming.NearDupStream.run(spark,
      spark.readStream.schema(schema).parquet(feed2.toString),
      "doc_id", "text", s"$base/state", s"$base/out")
    val finalOut = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSet
    // 40 (E) admitted — the torn E-state was reconciled away; 41 (A)
    // dropped against batch-0's committed state; 99 gone with its torn
    // partition
    assert(n2 == 1 && finalOut == Set(10L, 11L, 21L, 32L, 33L, 40L), finalOut)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/out/__batch=deadrun-9")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/state/__batch=deadrun-9")))
  }

  test("streaming near-dup reconciles a torn uncommitted batch (crash mid-commit)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.lit
    val base = Files.createTempDirectory("graft-neardup-torn").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val a = "the quick brown fox jumps over the lazy dog tonight"
    Seq(1L -> a, 2L -> "unrelated content on parquet footer statistics")
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$base/feed")
    // crashed run: doc 1's BANDS in state and a torn output partition,
    // no commit marker — without marker-gated reconciliation the state
    // would suppress doc 1 (band collision with itself) while the torn
    // partition kept a duplicate
    val bands = graft.dedupe.Dedupe.bandRows(
      graft.dedupe.Dedupe.minhashSignatureFromTerms(
        graft.dedupe.Dedupe.shingleRows(
          Seq(1L -> a).toDF("doc_id", "text"), "doc_id", "text", n = 3),
        "doc_id", k = 8),
      "doc_id", k = 8, rowsPerBand = 2)
    bands.select($"band", $"bucket").withColumn("__batch", lit("deadrun-0"))
      .write.partitionBy("__batch").mode("overwrite").parquet(s"$base/state")
    Seq(1L -> a).toDF("doc_id", "text")
      .withColumn("__batch", lit("deadrun-0"))
      .write.partitionBy("__batch").mode("overwrite").parquet(s"$base/out")
    val n = graft.streaming.NearDupStream.run(spark,
      spark.readStream.schema(schema).parquet(s"$base/feed"),
      "doc_id", "text", s"$base/state", s"$base/out")
    assert(n == 2)
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 2)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/out/__batch=deadrun-0")))
  }

  test("streaming dedupe drops torn uncommitted batches on BOTH sides (crash mid-commit)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-dedupstream-torn").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    Seq(1L -> "alpha beta", 2L -> "gamma delta").toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$base/feed")
    // simulate a run that crashed DURING the output commit: state AND a
    // (possibly torn) output partition exist, but no _commits marker —
    // the output twin alone must not count as committed
    Seq(1L -> "alpha beta").toDF("doc_id", "text")
      .select(graft.text.TextFunctions.fingerprint(
        org.apache.spark.sql.functions.col("text")).as("__fp"))
      .withColumn("__batch", org.apache.spark.sql.functions.lit("deadrun-0"))
      .write.partitionBy("__batch").mode("overwrite").parquet(s"$base/state")
    Seq(1L -> "alpha beta").toDF("doc_id", "text")
      .withColumn("__batch", org.apache.spark.sql.functions.lit("deadrun-0"))
      .write.partitionBy("__batch").mode("overwrite").parquet(s"$base/out")
    val n = graft.streaming.DedupStream.run(spark,
      spark.readStream.schema(schema).parquet(s"$base/feed"),
      "doc_id", "text", s"$base/state", s"$base/out")
    assert(n == 2)
    val out = spark.read.parquet(s"$base/out")
    // exactly once: the torn partition was dropped, both docs re-emitted
    // under the new run's batch key
    assert(out.count() == 2)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/out/__batch=deadrun-0")))
    // the run's fence is released
    assert(!graft.lake.Locks.isLocked(
      new org.apache.hadoop.fs.Path(s"$base/state").getFileSystem(
        spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(s"$base/state")))
  }

  test("continuous ingest through catalog makeAll equals the batch-import run") {
    import org.apache.spark.sql.functions._
    // Two-dataset lake, mixed ingestion (reference e2e workflow
    // tests/test_e2e_workflows.py:105-360 — crawl/import then make):
    //   alpha: continuous path — readStream → IngestStream.run →
    //          Journal.writeAutoFlush (tiny threshold → mid-stream
    //          drains) → merge;
    //   beta:  API-writer path — journal.write, drained by makeAll's
    //          optimize step.
    // The twin lake imports the same halves with plain batch appends.
    // makeAll over both lakes must produce byte-identical data artifacts
    // — ingestion route must never leak into published bytes.
    val streamRoot = Files.createTempDirectory("graft-e2e-stream").toString
    val batchRoot = Files.createTempDirectory("graft-e2e-batch").toString
    val outStream = Files.createTempDirectory("graft-e2e-stream-out").toString
    val outBatch = Files.createTempDirectory("graft-e2e-batch-out").toString

    val stmtsBatch = lake.EventStatements.statements(Tables.events(spark, sf001))
    val half = pmod(substring(col("entity_id"), 2, 100).cast("long"), lit(2))

    // streamed lake
    val cat = new lake.Catalog(spark, streamRoot)
    cat.ensureDataset("alpha", shards = lake.EventStatements.Shards)
    cat.ensureDataset("beta", shards = lake.EventStatements.Shards)
    val src = spark.readStream
      .schema(spark.read.parquet(s"$sf001/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf001)
    val srcTs =
      if (spark.read.parquet(s"$sf001/events.parquet").schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
        src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else src
    streaming.IngestStream.run(spark,
      lake.EventStatements.statements(srcTs).filter(half === 0),
      cat.store("alpha"), flushRows = 500)
    cat.journal("beta").write(stmtsBatch.filter(half === 1))
    val builtStream = cat.makeAll(outStream)

    // batch twin lake
    val twin = new lake.Catalog(spark, batchRoot)
    twin.ensureDataset("alpha", shards = lake.EventStatements.Shards)
    twin.ensureDataset("beta", shards = lake.EventStatements.Shards)
    twin.store("alpha").append(stmtsBatch.filter(half === 0))
    twin.store("beta").append(stmtsBatch.filter(half === 1))
    val builtBatch = twin.makeAll(outBatch)

    // both runs built the full artifact set for both datasets
    for (b <- Seq(builtStream, builtBatch); ds <- Seq("alpha", "beta"))
      assert(b(ds).contains("statements.csv") && b(ds).contains("entities.ftm.json"),
        s"$ds built: ${b(ds)}")

    // deterministic single-file artifacts are byte-identical across routes
    def sha(p: String): String = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      d.digest(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
        .map("%02x".format(_)).mkString
    }
    for (ds <- Seq("alpha", "beta"); a <- Seq("statements.csv", "entities.ftm.json")) {
      assert(sha(s"$outStream/$ds/$a") == sha(s"$outBatch/$ds/$a"),
        s"artifact $ds/$a differs between streamed and batch ingestion")
    }
    // statistics.json (single JSON-lines file): same line set either route
    def statLines(root: String, ds: String): Set[String] =
      scala.io.Source.fromFile(s"$root/$ds/statistics.json")
        .getLines().filter(_.nonEmpty).toSet
    for (ds <- Seq("alpha", "beta"))
      assert(statLines(outStream, ds) == statLines(outBatch, ds))
    // the catalog index lists both datasets in both lakes
    assert(cat.listDatasets().toSet == Set("alpha", "beta"))
    val idx = scala.io.Source.fromFile(s"$streamRoot/catalog.json").mkString
    assert(idx.contains("alpha") && idx.contains("beta"))
    // and a second makeAll over the quiet streamed lake rebuilds nothing
    assert(cat.makeAll(outStream).values.forall(_.isEmpty))
  }

  test("make: exports are freshness-gated and skip when the store is current") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-make").toString
    val out = Files.createTempDirectory("graft-make-out").toString
    val store = new StatementStore(spark, dir, shards = 4)
    val journal = new Journal(spark, dir)

    val checksum = "ab" * 32
    val stmts = Seq(
      model.Statement("0", "idA", "e1", "ds", "thing", "o1", None, "Person",
        "name", "string", "Alice", None, None, external = false,
        ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None),
      // a document (with folder parent) so documents.csv has content
      model.Statement("0", "idD1", "doc1", "ds", "document", "o1", None, "PlainText",
        "fileName", "string", "a.txt", None, None, external = false,
        ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None),
      model.Statement("0", "idD2", "doc1", "ds", "document", "o1", None, "PlainText",
        "contentHash", "checksum", checksum, None, None, external = false,
        ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None),
      model.Statement("0", "idD3", "doc1", "ds", "document", "o1", None, "PlainText",
        "parent", "entity", "fold1", None, None, external = false,
        ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None),
      model.Statement("0", "idF1", "fold1", "ds", "document", "o1", None, "Folder",
        "fileName", "string", "docs", None, None, external = false,
        ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None)).toDS().toDF()
    journal.write(stmts)

    val first = Make.make(store, journal, out,
      publicUrlPrefixOpt = Some("https://example.org/archive"))
    assert(first.toSet == Set("statements.csv", "entities.ftm.json",
      "documents.csv", "statistics.json", "index.json"))
    assert(new java.io.File(s"$out/entities.ftm.json").exists())

    // all 5 reference artifacts exist; initial diff rode the entity export
    assert(new java.io.File(s"$out/documents.csv").exists())
    assert(new java.io.File(s"$out/index.json").exists())
    assert(new java.io.File(s"$out/diffs/entities.ftm.json").listFiles().nonEmpty)

    // documents.csv carries path + public url from the parent chain
    val docs = spark.read.option("header", "true").csv(s"$out/documents.csv").collect()
    assert(docs.length == 1)
    val doc = docs(0)
    assert(doc.getAs[String]("id") == "doc1")
    assert(doc.getAs[String]("path") == "docs")
    assert(doc.getAs[String]("public_url") ==
      s"https://example.org/archive/ab/ab/ab/$checksum/blob")

    // index.json lists the artifacts and the entity count
    val idx = scala.io.Source.fromFile(s"$out/index.json").mkString
    assert(idx.contains("\"entity_count\":3") && idx.contains("documents.csv"))

    // unchanged store → every export skipped
    assert(Make.make(store, journal, out).isEmpty)

    // force rebuilds everything despite freshness (reference force flag)
    assert(Make.make(store, journal, out, force = true).toSet == first.toSet)

    // new data → exports rebuild
    journal.write(stmts.limit(1)
      .withColumn("id", org.apache.spark.sql.functions.lit("idB"))
      .withColumn("entity_id", org.apache.spark.sql.functions.lit("e2")))
    assert(Make.make(store, journal, out).nonEmpty)

    // deleting the LAST document must still rewrite documents.csv (now
    // empty) and publish the DEL diff — the document-free short-circuit
    // applies only to datasets that never built the artifact, or mirrors
    // would keep serving the stale table forever
    import org.apache.spark.sql.functions.{col, lit => flit}
    journal.write(stmts.filter(col("entity_id") === "doc1")
      .withColumn("deleted_at",
        flit(ts("2024-09-01 00:00:00")).cast("timestamp"))
      .withColumn("last_seen", flit(ts("2024-09-01 00:00:00")).cast("timestamp")))
    assert(Make.make(store, journal, out).contains("documents.csv"))
    val emptied = spark.read.option("header", "true").csv(s"$out/documents.csv")
    assert(emptied.count() == 0)
    val diffDir = new java.io.File(s"$out/diffs/documents.csv")
    val lastDiff = diffDir.listFiles().map(_.getName).sorted.last
    val delRows = spark.read.option("header", "true")
      .csv(s"$out/diffs/documents.csv/$lastDiff")
      .filter(col("op") === "DEL").collect()
    assert(delRows.map(_.getAs[String]("id")).toSet == Set("doc1"))
  }
}
