package graft

import java.nio.file.Files

import graft.lake.{Catalog, DatasetConfig}

/** Multi-dataset catalog: enumeration, addressing, get-or-create, config
  * merge + versioning, and the aggregated catalog index (reference
  * catalog.py + cli `ls`/`datasets` shapes).
  */
class CatalogSpec extends SparkSpec {

  private def mkStatements(n: Int) = {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (0 until n).map { i =>
      graft.model.Statement(
        shard = (i % 4).toString, id = s"id$i", entity_id = s"e${i % 10}",
        dataset = "ds", bucket = "thing", origin = "o1", source = None,
        schema = "Person", prop = "name", prop_type = "string",
        value = s"v$i", original_value = None, lang = None, external = false,
        first_seen = ts, last_seen = ts, fragment = "", deleted_at = None)
    }.toDS().toDF()
  }

  test("name validation: reserved and malformed names rejected at the addressing boundary") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-cat").toString)
    intercept[IllegalArgumentException](cat.datasetPath("catalog"))
    intercept[IllegalArgumentException](cat.datasetPath("default"))
    intercept[IllegalArgumentException](cat.datasetPath("Bad Name"))
    intercept[IllegalArgumentException](cat.datasetPath(""))
    intercept[IllegalArgumentException](cat.datasetPath("../escape"))
    assert(Catalog.validateName("big_leak-2024") == "big_leak-2024")
  }

  test("ensure/list/exists lifecycle: creation records config, re-ensure ignores new settings") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-cat").toString)
    assert(cat.listDatasets().isEmpty)
    assert(!cat.datasetExists("alpha"))

    val created = cat.ensureDataset("alpha", shards = 8)
    assert(created.shards == 8)
    assert(cat.datasetExists("alpha"))

    // get-or-create: data ignored when the dataset already exists
    val again = cat.ensureDataset("alpha", shards = 32)
    assert(again.shards == 8)

    cat.ensureDataset("beta")
    assert(cat.listDatasets() == Seq("alpha", "beta"))

    // a bare directory without a config is not a dataset
    Files.createDirectory(java.nio.file.Paths.get(cat.rootStr, "not_a_dataset"))
    assert(cat.listDatasets() == Seq("alpha", "beta"))
  }

  test("updateDataset merges fields, keeps versioned snapshots, shards stay immutable") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-cat").toString)
    cat.ensureDataset("alpha", shards = 4, compression = "gzip")
    val updated = cat.updateDataset("alpha", compression = Some("zstd"),
      publicUrlPrefix = Some(Some("https://example.org/data")))
    assert(updated.compression == "zstd")
    assert(updated.shards == 4)
    val fs = new org.apache.hadoop.fs.Path(cat.rootStr)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(DatasetConfig.versions(fs, cat.datasetPath("alpha")) == 2)
    intercept[IllegalArgumentException](cat.updateDataset("ghost"))
  }

  test("per-dataset stores are isolated; index aggregates catalog-wide metadata") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-cat").toString)
    cat.ensureDataset("alpha", shards = 4)
    cat.ensureDataset("beta", shards = 4)
    cat.store("alpha").append(mkStatements(20))
    cat.store("beta").append(mkStatements(6))
    assert(cat.store("alpha").raw.count() == 20)
    assert(cat.store("beta").raw.count() == 6)

    val idx = cat.index().collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(idx.keySet == Set("alpha", "beta"))
    assert(idx("alpha") == 0L && idx("beta") == 0L) // both at first commit

    val written = cat.writeIndex()
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(
        new org.apache.hadoop.fs.Path(written).toUri.toString).getPath)), "UTF-8")
    assert(body.contains("\"name\":\"alpha\"") && body.contains("\"name\":\"beta\""))
  }

  test("makeAll exports every dataset under one job run and refreshes catalog.json") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-cat-make").toString)
    val out = Files.createTempDirectory("graft-cat-make-out").toString
    cat.ensureDataset("alpha", shards = 4)
    cat.ensureDataset("beta", shards = 4)
    cat.store("alpha").append(mkStatements(20))
    cat.store("beta").append(mkStatements(6))

    val built = cat.makeAll(out)
    assert(built.keySet == Set("alpha", "beta"))
    assert(built("alpha").contains("statements.csv"))
    assert(built("beta").contains("entities.ftm.json"))
    // per-dataset artifacts land under outRoot/<dataset>/
    for (ds <- Seq("alpha", "beta")) {
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(out, ds, "statements.csv")))
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(out, ds, "index.json")))
    }
    // catalog.json refreshed with both datasets at their post-make versions
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cat.rootStr, "catalog.json")), "UTF-8")
    assert(body.contains("\"name\":\"alpha\"") && body.contains("\"name\":\"beta\""))
    // the umbrella run is recorded and finished cleanly
    val jobs = new graft.lake.JobRepository(spark, cat.rootStr, "CatalogMakeJob")
    val run = jobs.latest().get
    assert(!run.running && run.errors == 0 && run.done == 2)
    // quiet lake: a second makeAll rebuilds nothing (freshness gates hold)
    val again = cat.makeAll(out)
    assert(again.values.forall(_.isEmpty))
  }

  test("catalog-wide probes batch across a many-dataset root") {
    // the reference targets catalogs of thousands of datasets
    // (catalog.py:40-166) — the per-dataset config/version probes behind
    // listDatasets/index/writeIndex run on the driver-IO pool, and the
    // answer must be byte-identical to the serial walk: complete, sorted,
    // no dataset dropped or doubled under concurrency
    val cat = new Catalog(spark, Files.createTempDirectory("graft-cat-many").toString)
    val names = (0 until 40).map(i => f"ds$i%02d")
    names.foreach(n => cat.ensureDataset(n, shards = 2))
    // non-dataset noise in the root must still be filtered out
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(cat.rootStr, "not-a-dataset"))
    assert(cat.listDatasets() == names)
    val idx = cat.index().collect()
    assert(idx.map(_.getString(0)).toSeq == names) // row order = probe order
    assert(idx.forall(_.getInt(1) == 2))
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(new org.apache.hadoop.fs.Path(
        cat.writeIndex()).toUri.toString).getPath)), "UTF-8")
    names.foreach(n => assert(body.contains(s""""name":"$n"""")))
  }

  test("safePathComponent: path-flowing strings validated at the boundary") {
    import graft.lake.Catalog.safePathComponent
    // valid origins pass through unchanged
    for (ok <- Seq("bulk", "crawl", "src:a b", "UPPER.case-1_x", "données"))
      assert(safePathComponent(ok, "origin") == ok)
    // traversal markers, separators, control chars, empties, oversize: rejected
    val bad = Seq("", ".", "..", "a/b", "a\\b", "a\nb", "\u007f", "x" * 256)
    for (v <- bad)
      assertThrows[IllegalArgumentException](safePathComponent(v, "origin"))
    // the journal wire enforces it on incoming rows
    assertThrows[IllegalArgumentException] {
      graft.api.JournalWire.parseRow(
        """{"entity_id":"e","prop":"name","value":"v","origin":"../../evil"}""",
        "ds")
    }
  }

  test("index/writeIndex skip a dataset destroyed between listing and probe") {
    // enumerate-then-stat is inherently racy: a dataset deleted mid-probe
    // must drop out of the pass, not crash the whole catalog index.
    // Simulated deterministically by forcing the stale listing.
    val cat = new Catalog(spark, Files.createTempDirectory("graft-cat-race").toString) {
      override def listDatasets(): Seq[String] = Seq("alpha", "vanished")
    }
    cat.ensureDataset("alpha", shards = 4)
    val idx = cat.index().collect()
    assert(idx.map(_.getString(0)).toSeq == Seq("alpha"))
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(new org.apache.hadoop.fs.Path(
        cat.writeIndex()).toUri.toString).getPath)), "UTF-8")
    assert(body.contains("\"name\":\"alpha\"") && !body.contains("vanished"))
  }

  test("catalog.json escapes hostile config strings and parses back") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-cat-esc").toString)
    // a URL carrying a quote, backslash and a control character must not
    // break the published JSON (hand-rolled escapers miss the control char)
    val hostile = "https://example.org/\"x\\yz"
    cat.ensureDataset("alpha", shards = 2, publicUrlPrefix = Some(hostile))
    val written = cat.writeIndex()
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(
        new org.apache.hadoop.fs.Path(written).toUri.toString).getPath))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
    assert(node.path("datasets").get(0).path("url").asText() == hostile)
  }

  test("concurrent ensureDataset: exactly one creation wins, no snapshot churn") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-cat-race2").toString)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val results = Await.result(Future.traverse((0 until 8).toList)(i =>
      Future(cat.ensureDataset("alpha", shards = 4 + (i % 2) * 4))), Duration.Inf)
    // every caller sees the single winner's config (shards immutable)
    assert(results.map(_.shards).distinct.size == 1)
    val fs = new org.apache.hadoop.fs.Path(cat.rootStr)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // one creation snapshot — re-ensures skip the write entirely
    assert(graft.lake.DatasetConfig.versions(fs, cat.datasetPath("alpha")) == 1)
    cat.ensureDataset("alpha", shards = 32)
    assert(graft.lake.DatasetConfig.versions(fs, cat.datasetPath("alpha")) == 1)
  }

  test("concurrent updateDataset merges run lock-serialized: no lost update") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-cat-race3").toString)
    cat.ensureDataset("alpha", shards = 2)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    // two field-disjoint updates racing: load-outside-lock would let the
    // loser write back the winner's field at its stale value
    Await.result(Future.sequence(Seq(
      Future(cat.updateDataset("alpha", compression = Some("zstd"))),
      Future(cat.updateDataset("alpha",
        publicUrlPrefix = Some(Some("https://example.org/d")))))), Duration.Inf)
    val fin = cat.ensureDataset("alpha")
    assert(fin.compression == "zstd")
    assert(fin.publicUrlPrefix.contains("https://example.org/d"))
  }

  test("makeAll surfaces every dataset failure, not just the first") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-cat-fail").toString)
    cat.ensureDataset("alpha", shards = 2)
    cat.ensureDataset("beta", shards = 2)
    cat.store("alpha").append(mkStatements(4))
    cat.store("beta").append(mkStatements(4))
    // outRoot is a FILE: every per-dataset export fails to create its dir
    val out = Files.createTempFile("graft-cat-fail-out", ".blk").toString
    val ex = intercept[RuntimeException](cat.makeAll(out))
    assert(ex.getMessage.contains("2/2"))
    assert(ex.getSuppressed.length == 1) // second failure rides along
    // the umbrella run records the per-dataset failure count
    val run = new graft.lake.JobRepository(spark, cat.rootStr, "CatalogMakeJob")
      .latest().get
    assert(!run.running && run.errors == 2 && run.pending == 0)
  }

  test("catalog-wide probes are deadline-bounded and name the stuck dataset") {
    import scala.concurrent.duration.Duration
    // the helper behind Catalog.parProbe (spark.graft.catalog.probeTimeoutSec):
    // a probe that never answers — a hung object-store round trip — must
    // surface as a timeout naming the stuck item, not hang the driver
    val gate = new java.util.concurrent.CountDownLatch(1)
    try {
      val ex = intercept[java.util.concurrent.TimeoutException] {
        graft.lake.FsOps.awaitAll(
          Seq("fast_a", "stuck_b", "fast_c"), Duration(300, "ms"), identity[String]) {
          name => if (name == "stuck_b") gate.await(); name.toUpperCase }
      }
      assert(ex.getMessage.contains("stuck_b"), ex.getMessage)
      assert(ex.getMessage.contains("probeTimeoutSec"), ex.getMessage)
    } finally gate.countDown() // unblock the pool thread
    // under the deadline, results come back complete and in order
    assert(graft.lake.FsOps.awaitAll(
      Seq("a", "b", "c"), Duration(30, "s"), identity[String])(_.toUpperCase) ==
      Seq("A", "B", "C"))
    // and the wired default is generous, not accidentally zero
    val cat = new Catalog(spark, Files.createTempDirectory("graft-cat-to").toString)
    cat.ensureDataset("alpha", shards = 2)
    assert(cat.listDatasets() == Seq("alpha"))
  }
}
