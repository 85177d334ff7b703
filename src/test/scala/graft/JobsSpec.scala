package graft

import java.nio.file.Files

import graft.lake.JobRepository

/** Job-run storage + lifecycle (reference test_model_job.py /
  * test_repository_job.py shapes): put/get round trip, latest-by-run-id,
  * run context management with progress saves and exception capture.
  */
class JobsSpec extends SparkSpec {

  test("put/get round trip, list ascending, latest picks the newest run id") {
    val dir = Files.createTempDirectory("graft-jobs").toString
    val repo = new JobRepository(spark, dir, "CrawlJob")
    assert(repo.latest().isEmpty)

    val id1 = repo.newRunId()
    Thread.sleep(5) // run ids embed the timestamp; ensure distinct prefixes
    val id2 = repo.newRunId()
    repo.put(graft.lake.JobRun(id1, "CrawlJob", done = 3))
    repo.put(graft.lake.JobRun(id2, "CrawlJob", done = 7))

    assert(repo.list() == Seq(id1, id2).sorted)
    assert(repo.get(id1).get.done == 3)
    assert(repo.latest().get.runId == Seq(id1, id2).max)
    assert(repo.get("nope").isEmpty)
  }

  test("run lifecycle: started/running persisted, progress saved, clean stop records took") {
    val dir = Files.createTempDirectory("graft-jobs").toString
    val repo = new JobRepository(spark, dir, "MakeJob")
    val finished = repo.run() { h =>
      // mid-run state is durable: a concurrent reader sees running=true
      val mid = repo.get(h.job.runId).get
      assert(mid.running && mid.started.nonEmpty)
      h.save(pending = 10, done = 4)
      assert(repo.get(h.job.runId).get.done == 4)
    }
    assert(!finished.running && finished.stopped.nonEmpty && finished.exc.isEmpty)
    assert(finished.done == 4 && finished.pending == 10)
    assert(repo.latest().get.runId == finished.runId)
  }

  test("a throwing run is stopped with the exception captured, then rethrown") {
    val dir = Files.createTempDirectory("graft-jobs").toString
    val repo = new JobRepository(spark, dir, "MakeJob")
    val e = intercept[RuntimeException] {
      repo.run() { _ => throw new RuntimeException("boom") }
    }
    assert(e.getMessage == "boom")
    val job = repo.latest().get
    assert(!job.running && job.errors == 1)
    assert(job.exc.exists(_.contains("boom")))
  }

  test("make records a job run on the store (export pass is lifecycle-tracked)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jobs-make").toString
    val out = Files.createTempDirectory("graft-jobs-out").toString
    val store = new graft.lake.StatementStore(spark, dir, shards = 4)
    val journal = new graft.lake.Journal(spark, dir)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    store.append(Seq(graft.model.Statement(
      "0", "idA", "e1", "ds", "thing", "o1", None, "Person", "name",
      "string", "Alice", None, None, external = false, ts, ts, "", None))
      .toDS().toDF())
    graft.ops.Make.make(store, journal, out)
    val job = new JobRepository(spark, dir, "MakeJob").latest().get
    assert(!job.running && job.exc.isEmpty && job.done >= 4)
  }
}
