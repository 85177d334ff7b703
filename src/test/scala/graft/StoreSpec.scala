package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.lake.{Journal, StatementStore}
import graft.model.Statement

/** Store lifecycle: append → snapshot versions → merge → compact → vacuum,
  * plus journal drain (reference tests/test_storage_parquet.py and
  * tests/test_storage_journal.py shapes).
  */
class StoreSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkStatements(n: Int, origin: String, lastSeen: String) = {
    import spark.implicits._
    (0 until n).map { i =>
      val entity = s"e${i % 7}"
      Statement(
        shard = f"${i % 7 % 4}%01x", id = s"id$i-$origin", entity_id = entity,
        dataset = "ds", bucket = if (i % 2 == 0) "thing" else "interval",
        origin = origin, source = None, schema = "Person", prop = "name",
        prop_type = "string", value = s"v$i", original_value = None,
        lang = None, external = false,
        first_seen = ts("2024-01-01 00:00:00"), last_seen = ts(lastSeen),
        fragment = if (i % 3 == 0) "" else s"f${i % 2}",
        deleted_at = None)
    }.toDS().toDF()
  }

  test("changed-since read skips files via manifest zone maps") {
    val dir = Files.createTempDirectory("graft-zonemap").toString
    val store = new StatementStore(spark, dir, shards = 4)
    store.append(mkStatements(20, "o1", "2024-01-02 00:00:00"))
    store.append(mkStatements(20, "o2", "2024-02-15 00:00:00"))
    val cutoff = ts("2024-02-01 00:00:00")

    val pruned = store.rawChangedSince(cutoff)
    val full = store.raw
    // file skipping: only the second append's files are opened
    assert(pruned.inputFiles.nonEmpty &&
      pruned.inputFiles.length < full.inputFiles.length,
      s"pruned=${pruned.inputFiles.length} full=${full.inputFiles.length}")
    // superset guarantee: with the exact predicate layered on top, the
    // pruned scan equals the full scan
    def changed(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("first_seen") >= lit(cutoff) || col("last_seen") >= lit(cutoff) ||
          col("deleted_at") >= lit(cutoff))
        .select("id", "origin").collect().map(_.toString).sorted.toSeq
    assert(changed(pruned) == changed(full) && changed(pruned).nonEmpty)

    // stats survive a merge commit for carried-over files
    store.merge()
    val prunedAfter = store.rawChangedSince(ts("2030-01-01 00:00:00"))
    assert(prunedAfter.inputFiles.isEmpty ||
      prunedAfter.inputFiles.length < store.raw.inputFiles.length)
  }

  test("cdf reads only the manifests' symmetric-difference files; delta is exact") {
    val dir = Files.createTempDirectory("graft-cdf").toString
    val store = new StatementStore(spark, dir, shards = 4)
    val v1 = store.append(mkStatements(20, "o1", "2024-01-02 00:00:00"))
    val v2 = store.append(mkStatements(10, "o2", "2024-01-03 00:00:00"))

    // append-only delta: exactly the o2 rows as ADD, nothing as DEL
    val delta = store.cdf(v1, v2)
    val byOp = delta.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp == Map("ADD" -> 10L))
    assert(delta.filter(col("origin") =!= "o2").count() == 0)

    // file pruning: the carried-over v1 files are never read — the cdf
    // scan's input is strictly smaller than the full v2 snapshot's
    val cdfFiles = delta.inputFiles.toSet
    val fullFiles = store.rawAt(v2).inputFiles.toSet
    assert(cdfFiles.nonEmpty && cdfFiles.subsetOf(fullFiles))
    assert(!store.rawAt(v1).inputFiles.toSet.subsetOf(cdfFiles))
    assert(cdfFiles.size < fullFiles.size)

    // merge rewrites partitions: unchanged logical rows cancel in the
    // set difference even though their files were rewritten
    val v3 = store.merge(force = true)
    val postMerge = store.cdf(v2, v3)
    // every emitted row reflects a real logical change (fragment
    // supersession / first_seen fold), never a pure rewrite echo: each
    // (id, fragment, origin) appearing as ADD must also appear as DEL
    // with different content, or correspond to a superseded row
    val adds = postMerge.filter(col("op") === "ADD").count()
    val dels = postMerge.filter(col("op") === "DEL").count()
    // the merged table holds canonicalized rows; diff must equal the
    // brute-force two-snapshot except with no file pruning
    val brute = {
      val a = store.rawAt(v3); val b = store.rawAt(v2)
      a.except(b).withColumn("op", lit("ADD"))
        .unionByName(b.except(a).withColumn("op", lit("DEL")))
    }
    val got = postMerge.collect().map(_.toString).sorted.toSeq
    val want = brute.collect().map(_.toString).sorted.toSeq
    assert(got == want, s"cdf != brute-force diff (adds=$adds dels=$dels)")
  }

  test("append/read/merge/compact/vacuum lifecycle with snapshot versions") {
    val dir = Files.createTempDirectory("graft-store").toString
    val store = new StatementStore(spark, dir, shards = 4)

    assert(store.version == -1L)
    assert(store.raw.count() == 0)

    val v0 = store.append(mkStatements(20, "o1", "2024-01-02 00:00:00"))
    assert(v0 == 0L && store.raw.count() == 20)

    // same origin, one day later: fragment groups get superseded rows and
    // non-fragment rows repeat their content ids
    val v1 = store.append(mkStatements(20, "o1", "2024-01-03 00:00:00"))
    val v1b = store.append(mkStatements(20, "o2", "2024-01-03 00:00:00"))
    assert(v1b == 2L && store.raw.count() == 60)

    // snapshot isolation: old version still reads 20 rows
    assert(store.rawAt(0).count() == 20)

    // partition columns survive the round trip with string types
    val parts = store.raw.select("shard", "bucket", "origin").distinct().collect()
    assert(parts.forall(r => r.getString(0).length == 1))

    // merge: 13 o1 fragment rows from day 2 are superseded by day 3; the
    // 7 o1 non-fragment rows collapse on their repeated content ids
    val v2 = store.merge()
    assert(v2 > v1b)
    val afterMerge = store.raw.count()
    assert(afterMerge == 40)

    // dirty tags cleared → immediate re-merge is a no-op version-wise
    assert(store.merge() == v2)

    // compact everything into fewer files; rowcount is unchanged
    store.append(mkStatements(5, "o1", "2024-01-04 00:00:00"))
    store.append(mkStatements(5, "o1", "2024-01-05 00:00:00"))
    val before = store.raw.count()
    store.compact(maxFilesPerPartition = 1)
    assert(store.raw.count() == before)

    // vacuum with retention: the previous snapshot stays readable (time
    // travel / in-flight readers), older ones are reclaimed
    val preVacuumVersion = store.version
    val removed = store.vacuum(keepVersions = 2)
    assert(removed.nonEmpty)
    assert(store.raw.count() == before)
    assert(store.rawAt(preVacuumVersion - 1).count() > 0)

    // retention 1 = current snapshot only; reclaims the rest
    val removed1 = store.vacuum(keepVersions = 1)
    assert(removed1.nonEmpty)
    assert(store.raw.count() == before)

    // log retention: expired snapshots lose their manifests too — only
    // the retained window's version files remain, and reads still work
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val manifests = fs.listStatus(
      new org.apache.hadoop.fs.Path(dir, "_graft/manifest"))
      .map(_.getPath.getName).filter(_.startsWith("v"))
    assert(manifests.length == 1, manifests.mkString(","))
    assert(store.version == preVacuumVersion)
    assert(store.raw.count() == before)

    // regression: a LATER vacuum with a wider window than a previous one
    // (default keepVersions=2 after a keepVersions=1, no new commits) must
    // not try to read the manifests the first vacuum already expired
    val removedAgain = store.vacuum(keepVersions = 2)
    assert(removedAgain.isEmpty)
    assert(store.raw.count() == before)
  }

  test("vacuum contract: keepVersions >= 2 keeps a pinned previous-version reader alive") {
    val dir = Files.createTempDirectory("graft-vacuum-pin").toString
    val store = new StatementStore(spark, dir, shards = 4)
    store.append(mkStatements(10, "o1", "2024-01-01 00:00:00"))
    (0 until 3).foreach(_ => store.append(mkStatements(10, "o1", "2024-01-02 00:00:00")))
    store.compact(maxFilesPerPartition = 1) // supersedes the old files
    val prev = store.version - 1
    // an in-flight reader pinned to the pre-compact snapshot (time travel)
    val pinned = store.rawAt(prev)
    val pinnedCount = pinned.count()
    assert(pinnedCount > 0)
    // the documented contract: keepVersions >= 2 retains v-1's files, so
    // a reader that resolved its snapshot before the vacuum still works
    store.vacuum(keepVersions = 2)
    assert(pinned.count() == pinnedCount)
    // keepVersions = 1 reclaims v-1: the pinned reader's files are GONE —
    // this is why the default is 2 and why 1 is only safe with no readers
    store.vacuum(keepVersions = 1)
    // plan re-resolution or task read — either way the snapshot is dead
    intercept[Exception](store.rawAt(prev).count())
  }

  test("snapshot pins survive vacuum; clone is frozen against source changes") {
    val dir = Files.createTempDirectory("graft-pin").toString
    val store = new StatementStore(spark, dir, shards = 4)
    store.append(mkStatements(10, "o1", "2024-01-01 00:00:00"))
    val v0count = store.raw.count()
    val pinnedV = store.pin("release-1") // pins the current version
    // clone the pinned snapshot before the table moves on
    val cloneDir = Files.createTempDirectory("graft-clone").toString
    val clone = store.cloneAt(cloneDir, pinnedV)
    assert(clone.version == 0L && clone.raw.count() == v0count)

    // advance the table well past any retention window
    (0 until 3).foreach(_ => store.append(mkStatements(10, "o1", "2024-01-02 00:00:00")))
    store.compact(maxFilesPerPartition = 1)
    // keepVersions=1 would normally reap everything below current — the
    // pin extends the window back to the pinned snapshot
    store.vacuum(keepVersions = 1)
    assert(store.pins() == Map("release-1" -> pinnedV))
    assert(store.rawAtPin("release-1").count() == v0count)
    // the clone never referenced the source's files: still intact, and
    // source mutations didn't leak in
    assert(clone.raw.count() == v0count)

    // unpinned, the old snapshot is reclaimable on the next vacuum
    store.unpin("release-1")
    store.vacuum(keepVersions = 1)
    intercept[Exception](store.rawAt(pinnedV).count())
    intercept[NoSuchElementException](store.rawAtPin("release-1"))
    // pin names are boundary-validated like every path component
    intercept[IllegalArgumentException](store.pin("../evil"))
    intercept[IllegalArgumentException](store.pin("x", 999L))
  }

  test("compact packs sub-target files per partition; full-size files are never rewritten") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val store = new StatementStore(spark, dir, shards = 4)
    (0 until 5).foreach(_ => store.append(mkStatements(30, "oC", "2024-01-02 00:00:00")))
    val before = store.raw.count()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def perPartition: Map[String, Int] = graft.lake.Manifest.liveFiles(fs, root)
      .groupBy(_.split('/').take(3).mkString("/")).map { case (p, f) => p -> f.size }
    assert(perPartition.values.max == 5)

    // default 128 MiB target: every test file is sub-target → each
    // partition packs to ceil(bytes/target) = 1 file
    store.compact(maxFilesPerPartition = 1)
    assert(perPartition.values.forall(_ == 1))
    assert(store.raw.count() == before)

    // a target below every file size means nothing qualifies as "small":
    // compact must be a no-op even though partitions hold many files
    (0 until 3).foreach(_ => store.append(mkStatements(30, "oC", "2024-01-03 00:00:00")))
    val v = store.version
    store.compact(maxFilesPerPartition = 1, targetFileBytes = 1L)
    assert(store.version == v)
    assert(perPartition.values.max == 4)

    // bin-pack SPLIT path: a target smaller than a partition's small-file
    // bytes must spread the rewrite over ceil(bytes/target) salted writer
    // tasks → more than one output file for the bigger partitions
    // (deterministic: fixed data, deterministic hash salt)
    val total = store.raw.count()
    store.compact(maxFilesPerPartition = 1, targetFileBytes = 3000L)
    assert(store.raw.count() == total) // content preserved
    assert(perPartition.values.max >= 2, perPartition.toString)
  }

  test("compact zorderBy clusters files into disjoint entity ranges; morton interleave exact") {
    // expression unit facts + SQL registration
    assert(graft.functions.ZOrderLong.interleave(3L, 0L) == 5L)
    assert(graft.functions.ZOrderLong.interleave(0L, 3L) == 10L)
    val m = (1L << 31) - 1
    assert(graft.functions.ZOrderLong.interleave(m, m) == 0x3fffffffffffffffL)
    assert(spark.sql("SELECT z_order(3, 0)").head().getLong(0) == 5L)

    def mk(ids: Range, origin: String) = {
      import spark.implicits._
      // incompressible values so parquet file sizes track row counts
      def blob(i: Int): String = {
        val md = java.security.MessageDigest.getInstance("MD5")
        (0 until 4).map(k => md.digest(s"$i-$k".getBytes)
          .map(x => f"${x & 0xff}%02x").mkString).mkString
      }
      ids.map { i =>
        Statement(
          shard = "0", id = s"id$i-$origin", entity_id = f"e$i%03d",
          dataset = "ds", bucket = "thing", origin = origin, source = None,
          schema = "Person", prop = "name", prop_type = "string",
          value = blob(i), original_value = None, lang = None,
          external = false, first_seen = ts("2024-01-01 00:00:00"),
          last_seen = ts("2024-01-02 00:00:00"), fragment = "",
          deleted_at = None)
      }.toDS().toDF()
    }
    val dir = Files.createTempDirectory("graft-zorder").toString
    val store = new StatementStore(spark, dir, shards = 4)
    // four appends each spanning the whole entity range: every pre-compact
    // file's (min,max) covers ~everything, so nothing could be skipped
    (0 until 4).foreach(k => store.append(mk(k until 800 by 4, "oZ")))
    val before = store.raw.count()
    // target sized between one input file and the small-file total, so the
    // rewrite both triggers and splits into multiple range-clustered files
    store.compact(maxFilesPerPartition = 1, targetFileBytes = 40000L,
      zorderBy = Seq("entity_id"))
    assert(store.raw.count() == before)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val live = graft.lake.Manifest.liveFiles(fs, root).toSeq.sorted
    assert(live.size >= 2, s"want a multi-file split, got $live")
    // each output file covers a DISJOINT entity range — the property that
    // lets parquet footer min/max prune whole files for entity predicates
    // (the default hash-salt path scatters: every file spans everything)
    val ranges = live.map { f =>
      val r = spark.read.parquet(s"$dir/$f")
        .agg(min("entity_id"), max("entity_id")).head()
      (r.getString(0), r.getString(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, ranges.toString)
      case _ => ()
    }
  }

  test("crash debris: uncommitted part files are invisible and vacuum reaps them") {
    val dir = Files.createTempDirectory("graft-debris").toString
    val store = new StatementStore(spark, dir, shards = 4)
    store.append(mkStatements(20, "o1", "2024-01-01 00:00:00"))
    val before = store.raw.count()
    // simulate a writer that crashed after writing a part file but before
    // its manifest commit: clone a committed file under a fresh name
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val committed = graft.lake.Manifest.liveFiles(fs, root).head
    val debris = committed.reverse.dropWhile(_ != '/').reverse + "part-crashed-debris.parquet"
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(root, committed),
      fs, new org.apache.hadoop.fs.Path(root, debris), false,
      spark.sessionState.newHadoopConf())
    // readers are manifest-scoped: the debris never shows up
    assert(store.raw.count() === before)
    // vacuum's orphan sweep = physical files minus every retained
    // snapshot's live set — exactly the crash-debris contract
    val reaped = store.vacuum(keepVersions = 2)
    assert(reaped.contains(debris), reaped.mkString(","))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, debris)))
    assert(store.raw.count() === before)
  }

  test("concurrent appends serialize on the fence; both commits land") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = Files.createTempDirectory("graft-concurrent").toString
    val store = new StatementStore(spark, dir, shards = 4)
    // two writers race the same table; the fence serializes the commits
    val fa = Future(store.append(mkStatements(30, "oA", "2024-01-02 00:00:00")))
    val fb = Future(store.append(mkStatements(30, "oB", "2024-01-03 00:00:00")))
    val (va, vb) = (Await.result(fa, 5.minutes), Await.result(fb, 5.minutes))
    // distinct versions, both batches fully present in the final snapshot
    assert(va != vb)
    assert(store.version == math.max(va, vb))
    val byOrigin = store.raw.groupBy("origin").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOrigin == Map("oA" -> 30L, "oB" -> 30L))
  }

  test("concurrent append and merge serialize; canonical read is interleaving-independent") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = Files.createTempDirectory("graft-concurrent-m").toString
    val store = new StatementStore(spark, dir, shards = 4)
    val a = mkStatements(30, "oA", "2024-01-02 00:00:00")
    val b = mkStatements(30, "oB", "2024-01-03 00:00:00")
    store.append(a)
    // merge races a second writer's append; whichever wins the fence
    // first, the canonical (read-time merged) view must equal the
    // reference canonicalization over the union of both batches
    val fb = Future(store.append(b))
    val fm = Future(store.merge())
    Await.result(fb, 5.minutes); Await.result(fm, 5.minutes)
    val cols = Seq("id", "entity_id", "prop", "fragment", "origin", "value")
    val got = store.canonical.selectExpr(cols: _*)
      .collect().map(_.toString).sorted
    val want = graft.ops.MergeDedupe.live(a.unionByName(b)).selectExpr(cols: _*)
      .collect().map(_.toString).sorted
    assert(got.length == want.length && got.sameElements(want))
  }

  test("stale-lock recovery: a crashed writer's fence is stolen; fresh locks are honored") {
    import org.apache.hadoop.fs.Path
    import graft.lake.Locks
    val dir = Files.createTempDirectory("graft-lock").toString
    val store = new StatementStore(spark, dir, shards = 4)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())

    // simulate a crashed writer: a fence file nobody will ever delete,
    // with an mtime far in the past
    val lock = new Path(root, ".LOCK")
    val out = fs.create(lock, false)
    out.writeBytes("pid=0 ts=0")
    out.close()
    fs.setTimes(lock, System.currentTimeMillis() - 60L * 60 * 1000, -1)

    // append steals the stale lock and succeeds instead of bricking
    val v = store.append(mkStatements(5, "o1", "2024-01-02 00:00:00"))
    assert(v == 0L && store.raw.count() == 5)
    assert(!Locks.isLocked(fs, root))

    // a FRESH lock is NOT stolen: bounded retries then failure
    val out2 = fs.create(lock, false)
    out2.writeBytes("pid=live ts=now")
    out2.close()
    intercept[IllegalStateException] {
      Locks.withLock(fs, root, maxRetries = 1)(())
    }
    // explicit operator unlock clears it
    assert(Locks.unlock(fs, root))
    val v2 = store.append(mkStatements(5, "o2", "2024-01-02 00:00:00"))
    assert(v2 == 1L)
  }

  test("destroy soft-drops the table: manifest gone, data files remain") {
    val dir = Files.createTempDirectory("graft-destroy").toString
    val store = new StatementStore(spark, dir, shards = 4)
    store.append(mkStatements(10, "o1", "2024-01-02 00:00:00"))
    assert(store.raw.count() == 10)
    store.destroy()
    // S8 semantics: version counter reset, reads see an empty table...
    assert(store.version == -1L)
    assert(store.raw.count() == 0)
    // ...but the physical parquet stays on disk for forensics
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(graft.lake.Manifest.physicalFiles(fs, new Path(dir)).nonEmpty)
  }

  test("dataset config: persisted snapshots, immutable shard count") {
    import org.apache.hadoop.fs.Path
    import graft.lake.DatasetConfig
    val dir = Files.createTempDirectory("graft-cfg").toString
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    assert(DatasetConfig.load(fs, root).isEmpty)
    DatasetConfig.save(fs, root, DatasetConfig("my_ds", shards = 8))
    DatasetConfig.save(fs, root, DatasetConfig("my_ds", shards = 8, compression = "zstd"))
    val cfg = DatasetConfig.load(fs, root).get
    assert(cfg.shards == 8 && cfg.compression == "zstd")
    assert(DatasetConfig.versions(fs, root) == 2)
    intercept[IllegalArgumentException] {
      DatasetConfig.save(fs, root, DatasetConfig("my_ds", shards = 4))
    }
    intercept[IllegalArgumentException] {
      DatasetConfig.save(fs, root, DatasetConfig("Bad Name!", shards = 8))
    }
  }

  test("journal write/drain: last-writer-wins upsert + tombstone bump") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-journal").toString
    val store = new StatementStore(spark, dir, shards = 4)
    val journal = new Journal(spark, dir)

    val s1 = Statement("0", "idA", "e1", "ds", "thing", "o1", None, "Person",
      "name", "string", "Alice", None, None, external = false,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None)
    // same (id, fragment, origin), newer — wins
    val s2 = s1.copy(value = "Alice2", last_seen = ts("2024-01-02 00:00:00"))
    // tombstone with deleted_at after last_seen — bump applies
    val s3 = Statement("0", "idB", "e2", "ds", "thing", "o1", None, "Person",
      "name", "string", "Bob", None, None, external = false,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "",
      Some(ts("2024-01-05 00:00:00")))

    journal.write(Seq(s1).toDS().toDF())
    journal.write(Seq(s2, s3).toDS().toDF())
    assert(journal.count() == 3)

    journal.drain(store)
    assert(journal.count() == 0)

    val rows = store.raw.collect()
    assert(rows.length == 2)
    val byId = rows.map(r => r.getAs[String]("id") -> r).toMap
    assert(byId("idA").getAs[String]("value") == "Alice2")
    // F7: tombstone's last_seen bumped to deleted_at
    assert(byId("idB").getAs[Timestamp]("last_seen") == ts("2024-01-05 00:00:00"))

    // drained journal is idempotent: second drain is a no-op
    val v = store.version
    journal.drain(store)
    assert(store.version == v)
  }

  test("journal count() is incremental: already-counted files are never re-probed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-journal-inc").toString
    val journal = new Journal(spark, dir)

    val s = Statement("0", "idA", "e1", "ds", "thing", "o1", None, "Person",
      "name", "string", "Alice", None, None, external = false,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None)
    journal.write(Seq(s).toDS().toDF())
    assert(journal.count() == 1L)

    // corrupt the ALREADY-COUNTED staged file in place (same name, junk
    // bytes): a re-probe would now find an unreadable footer and drop it
    // from the count; the incremental cache keeps the first probe's value
    // — directly observing that count() is O(new files), not O(all files)
    import scala.jdk.CollectionConverters._
    val staged = java.nio.file.Paths.get(dir, "_graft/journal")
    val f = java.nio.file.Files.list(staged).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).next()
    java.nio.file.Files.write(f, "no longer parquet".getBytes("UTF-8"))
    assert(journal.count() == 1L)

    // new files still get probed (count grows), cached ones still don't
    journal.write(Seq(s.copy(id = "idB"), s.copy(id = "idC")).toDS().toDF())
    assert(journal.count() == 3L)

    // eviction: once the file leaves the staging dir its cache entry dies
    // — a fresh count() no longer includes it
    java.nio.file.Files.delete(f)
    assert(journal.count() == 2L)
  }

  test("journal drain quarantines corrupt files and malformed rows, drains the rest") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-journal-bad").toString
    val store = new StatementStore(spark, dir, shards = 4)
    val journal = new Journal(spark, dir)

    val good = Statement("0", "idA", "e1", "ds", "thing", "o1", None, "Person",
      "name", "string", "Alice", None, None, external = false,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None)
    // rows failing statement invariants: empty id, null last_seen
    val badId = good.copy(id = "", value = "NoId")
    journal.write(Seq(good, badId).toDS().toDF())
    journal.write(Seq(good.copy(id = "idB", entity_id = "e2")).toDS().toDF()
      .withColumn("last_seen",
        org.apache.spark.sql.functions.lit(null).cast("timestamp")))
    // a staged file that is not parquet at all (torn write / corruption)
    val junk = java.nio.file.Paths.get(dir, "_graft/journal/junk.parquet")
    java.nio.file.Files.write(junk, "this is not parquet".getBytes("UTF-8"))
    // count() (the auto-flush hot path) must not brick on the junk file
    assert(journal.count() == 3L)

    journal.drain(store)
    // only the well-formed row landed
    val rows = store.raw.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("id") == "idA")
    // quarantine reports unreadable FILES and bad ROWS separately: the
    // rows/ dataset directory never masquerades as a quarantined file name
    val q = journal.malformedFiles()
    assert(q.contains("junk.parquet"))
    assert(!q.contains("rows"))
    assert(journal.malformedRows().count() == 2)
    // journal is drained; a second drain is a no-op that keeps the store
    val v = store.version
    journal.drain(store)
    assert(store.version == v)

    // clear(): discard staged rows without draining (reference parity)
    journal.write(Seq(good.copy(id = "idC")).toDS().toDF())
    assert(journal.clear() == 1L)
    assert(journal.count() == 0L)
    journal.drain(store)
    assert(store.raw.count() == 1) // cleared row never landed
  }

  test("lock heartbeat keeps a long-held fence from reading as stale") {
    val dir = Files.createTempDirectory("graft-lock-hb").toString
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // explicit heartbeat refreshes an aged fence
    graft.lake.Locks.withLock(fs, root) {
      val lp = new org.apache.hadoop.fs.Path(dir, ".LOCK")
      fs.setTimes(lp, System.currentTimeMillis() - 3600_000L, -1)
      val aged = fs.getFileStatus(lp).getModificationTime
      graft.lake.Locks.heartbeat(fs, root)
      assert(fs.getFileStatus(lp).getModificationTime > aged)
      assert(graft.lake.Locks.isLocked(fs, root))
    }
    assert(!graft.lake.Locks.isLocked(fs, root))
    // the automatic heartbeat: a hold LONGER than the TTL stays fresh —
    // with staleAfterMs=300 the daemon refreshes every ~100ms, so after
    // 700ms the fence's mtime is recent, not 700ms old
    graft.lake.Locks.withLock(fs, root, staleAfterMs = 300L) {
      val lp = new org.apache.hadoop.fs.Path(dir, ".LOCK")
      val t0 = fs.getFileStatus(lp).getModificationTime
      Thread.sleep(700L)
      assert(fs.getFileStatus(lp).getModificationTime > t0)
      assert(System.currentTimeMillis() -
        fs.getFileStatus(lp).getModificationTime < 300L)
    }
    assert(!graft.lake.Locks.isLocked(fs, root))
  }

  test("cloneAt serializes against the store lock (vacuum can't expire files mid-copy)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-clone-lock").toString
    val store = new graft.lake.StatementStore(spark, dir, shards = 2)
    val rows = graft.ops.Explode.explode(
      Seq(graft.ops.Explode.EntityPayload(
        "e1", "Person", Map("name" -> Seq("One")))).toDS(),
      "test", "default", 2, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    store.append(rows)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // while another holder (a vacuum, say) owns the fence, cloneAt must
    // WAIT, not read liveState and copy unprotected
    val dest = Files.createTempDirectory("graft-clone-lock-out").toString + "/c"
    val cloned = new java.util.concurrent.atomic.AtomicBoolean(false)
    graft.lake.Locks.withLock(fs, root) {
      val t = new Thread(() => {
        store.cloneAt(dest)
        cloned.set(true)
      })
      t.start()
      Thread.sleep(500L)
      // still blocked on the fence we hold
      assert(!cloned.get(), "cloneAt ran while another holder owned the lock")
    }
    // released: the clone proceeds and lands complete
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!cloned.get() && System.nanoTime() < deadline) Thread.sleep(50L)
    assert(cloned.get())
    assert(new graft.lake.StatementStore(spark, dest, 2).raw.count() ==
      store.raw.count())
  }

  test("journal count is incremental: already-counted footers are not re-probed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-journal-count").toString
    val journal = new Journal(spark, dir)
    val s = Statement("0", "idA", "e1", "ds", "thing", "o1", None, "Person",
      "name", "string", "Alice", None, None, external = false,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None)
    journal.write(Seq(s).toDS().toDF())
    assert(journal.count() == 1L)
    // corrupt the already-counted staged file IN PLACE: the incremental
    // count keeps reporting its cached footer count (proof it never
    // re-probed the old file — the auto-flush hot path is O(new files)),
    // while a cold instance's full probe excludes the now-unreadable file
    val jdir = java.nio.file.Paths.get(dir, "_graft/journal")
    java.nio.file.Files.list(jdir).iterator().forEachRemaining { f =>
      if (f.getFileName.toString.endsWith(".parquet"))
        java.nio.file.Files.write(f, "not parquet anymore".getBytes("UTF-8"))
    }
    journal.write(Seq(s.copy(id = "idB", entity_id = "e2")).toDS().toDF())
    assert(journal.count() == 2L)
    assert(new Journal(spark, dir).count() == 1L)
  }

  test("two journal instances on one root: per-instance caches converge on listing") {
    import spark.implicits._
    // the fileCounts cache is per-instance; cross-instance writers must
    // only cost a re-probe (one footer read on first sight), never a
    // wrong count — both instances re-list the dir on every count()
    val dir = Files.createTempDirectory("graft-journal-two").toString
    val j1 = new Journal(spark, dir)
    val j2 = new Journal(spark, dir)
    val s = Statement("0", "idA", "e1", "ds", "thing", "o1", None, "Person",
      "name", "string", "Alice", None, None, external = false,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None)
    j1.write(Seq(s).toDS().toDF())
    assert(j1.count() == 1L && j2.count() == 1L)
    j2.write(Seq(s.copy(id = "idB", entity_id = "e2")).toDS().toDF())
    assert(j1.count() == 2L && j2.count() == 2L)
    // a drain through one instance is observed by the other via listing:
    // its stale cache entries are evicted, count drops to zero
    val store = new StatementStore(spark, dir, shards = 4)
    j1.drain(store)
    assert(j1.count() == 0L && j2.count() == 0L)
  }

  test("default merge grace: fresh tombstones survive, stale ones are reaped") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-grace").toString
    val store = new StatementStore(spark, dir, shards = 4)
    val now = System.currentTimeMillis()
    def tomb(id: String, ageDays: Int) = {
      val del = new Timestamp(now - ageDays * 24L * 3600 * 1000)
      Statement("0", id, s"e-$id", "ds", "thing", "o1", None, "Person",
        "name", "string", "v", None, None, external = false,
        ts("2024-01-01 00:00:00"), del, "", Some(del))
    }
    store.append(Seq(tomb("fresh", 1), tomb("stale", 60)).toDS().toDF())
    store.merge() // default grace: 30 days
    val ids = store.raw.collect().map(_.getAs[String]("id")).toSet
    // the 1-day-old tombstone keeps shadowing late re-imports; the
    // 60-day-old one is reaped (reference ST4, 30-day default)
    assert(ids == Set("fresh"))
    // reads never see tombstones either way
    assert(store.live.count() == 0)
  }

  test("journal auto-flush drains when the staged row count crosses the threshold") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-autoflush").toString
    val store = new StatementStore(spark, dir, shards = 4)
    val journal = new Journal(spark, dir)
    val s = Statement("0", "idA", "e1", "ds", "thing", "o1", None, "Person",
      "name", "string", "Alice", None, None, external = false,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None)
    // below threshold: stays staged
    journal.writeAutoFlush(Seq(s).toDS().toDF(), store, threshold = 3)
    assert(journal.count() == 1 && store.raw.count() == 0)
    // crossing it: drains into the store and clears the journal
    journal.writeAutoFlush(Seq(s.copy(id = "idB"), s.copy(id = "idC")).toDS().toDF(),
      store, threshold = 3)
    assert(journal.count() == 0 && store.raw.count() == 3)
  }

  test("journal snapshot pins the file set: clearFiles spares concurrently staged rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-journal-snap").toString
    val journal = new Journal(spark, dir)
    val s = Statement("0", "idA", "e1", "ds", "thing", "o1", None, "Person",
      "name", "string", "Alice", None, None, external = false,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None)
    journal.write(Seq(s, s.copy(id = "idB")).toDS().toDF())
    journal.write(Seq(s.copy(id = "idC")).toDS().toDF())
    val (files, df) = journal.snapshot()
    assert(df.count() == 3)
    // a writer stages MORE rows while the snapshot's consumer streams —
    // the HTTP journal/flush shape; the delete must cover exactly the
    // snapshot, or the late rows are discarded without ever being served
    journal.write(Seq(s.copy(id = "idD")).toDS().toDF())
    assert(journal.clearFiles(files) == 3L)
    assert(journal.count() == 1L)
    assert(journal.staged().collect().map(_.getAs[String]("id")).toSet == Set("idD"))
    // full clear reports and removes the remainder
    assert(journal.clear() == 1L)
    assert(journal.count() == 0L)
  }

  test("drainCounted reports rows consumed, excluding quarantined rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-journal-dcount").toString
    val store = new StatementStore(spark, dir, shards = 4)
    val journal = new Journal(spark, dir)
    val good = Statement("0", "idA", "e1", "ds", "thing", "o1", None, "Person",
      "name", "string", "Alice", None, None, external = false,
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "", None)
    // 3 staged rows, one malformed (empty id): flushed must be 2 — a
    // pre-drain count() would have claimed 3
    journal.write(Seq(good, good.copy(id = "", value = "NoId")).toDS().toDF())
    journal.write(Seq(good.copy(id = "idB", entity_id = "e2")).toDS().toDF())
    val (v, flushed) = journal.drainCounted(store)
    assert(v == store.version)
    assert(flushed == 2L)
    assert(store.raw.count() == 2)
    // empty journal: zero consumed, version unchanged
    assert(journal.drainCounted(store) == (store.version, 0L))
  }

  test("clone of an unmerged source carries its dirty stamps; clone.merge() cleans it") {
    val dir = Files.createTempDirectory("graft-clone-dirty").toString
    val store = new StatementStore(spark, dir, shards = 4)
    // two appends of overlapping ids → pre-merge duplicates + dirt
    store.append(mkStatements(20, "o1", "2024-01-02 00:00:00"))
    store.append(mkStatements(20, "o1", "2024-02-02 00:00:00"))
    assert(store.tags.list("dirty/").nonEmpty)
    val cloneDir = Files.createTempDirectory("graft-clone-dirty-dest").toString
    val clone = store.cloneAt(cloneDir)
    // the stamps traveled: without them clone.merge() would no-op and
    // clone.live would serve the pre-merge duplicates forever
    assert(clone.tags.list("dirty/").nonEmpty)
    clone.merge()
    store.merge()
    assert(clone.live.count() == store.live.count())
    assert(clone.raw.count() == store.raw.count())
    // merged clone holds one survivor per id
    val perId = clone.raw.groupBy(col("id")).count().filter(col("count") > 1).count()
    assert(perId == 0)
  }

  test("vacuum rejects keepVersions < 1") {
    val dir = Files.createTempDirectory("graft-vacuum-guard").toString
    val store = new StatementStore(spark, dir, shards = 4)
    store.append(mkStatements(5, "o1", "2024-01-02 00:00:00"))
    val e = intercept[IllegalArgumentException](store.vacuum(keepVersions = 0))
    assert(e.getMessage.contains("keepVersions"))
    // nothing was deleted
    assert(store.raw.count() == 5)
  }

  test("FsOps.rename refuses an existing destination; renameReplace clobbers") {
    import graft.lake.FsOps
    val dir = Files.createTempDirectory("graft-fsops").toString
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def p(n: String) = new org.apache.hadoop.fs.Path(root, n)
    def read(n: String) = {
      val in = fs.open(p(n))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    FsOps.writeSmall(fs, p("a"), "A".getBytes)
    FsOps.writeSmall(fs, p("b"), "B".getBytes)
    // POSIX rename(2) silently replaces — the commit primitive must NOT:
    // manifest versions / delta-log entries / quarantine names all rely
    // on false-on-existing to detect races instead of destroying data
    assert(!FsOps.rename(fs, p("a"), p("b")))
    assert(read("b") == "B" && read("a") == "A") // both intact
    assert(FsOps.rename(fs, p("a"), p("c")))
    assert(read("c") == "A" && !fs.exists(p("a")))
    // the state-update primitive DOES replace, atomically
    FsOps.writeSmall(fs, p("d"), "D".getBytes)
    assert(FsOps.renameReplace(fs, p("d"), p("b")))
    assert(read("b") == "D" && !fs.exists(p("d")))
  }

  test("lock release is ownership-checked: a stolen fence is not deleted by the old holder") {
    import graft.lake.Locks
    val dir = Files.createTempDirectory("graft-lock-own").toString
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val lp = new org.apache.hadoop.fs.Path(root, ".LOCK")
    Locks.withLock(fs, root) {
      // simulate a TTL steal while we hold: a thief replaced the fence
      // with its own token — our release must leave it alone or a third
      // writer gets in under the thief's feet
      fs.delete(lp, false)
      graft.lake.FsOps.writeSmall(fs, lp, "pid=999 token=thief".getBytes("UTF-8"))
      1
    }
    assert(Locks.isLocked(fs, root), "old holder deleted the thief's live fence")
    Locks.unlock(fs, root)
    assert(!Locks.isLocked(fs, root))
  }

  test("a stale lock with a FRESH heartbeat sidecar is not stolen (object-store setTimes no-op)") {
    import graft.lake.Locks
    val dir = Files.createTempDirectory("graft-lock-hbside").toString
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val lp = new org.apache.hadoop.fs.Path(root, ".LOCK")
    val hp = new org.apache.hadoop.fs.Path(root, ".LOCK.hb")
    // lock file mtime far in the past (a filesystem whose setTimes is a
    // no-op never advances it) — but the holder's sidecar is FRESH
    graft.lake.FsOps.writeSmall(fs, lp, "pid=1 token=live-holder".getBytes("UTF-8"))
    graft.lake.FsOps.setMtime(fs, lp, System.currentTimeMillis() - 3600 * 1000)
    graft.lake.FsOps.writeSmall(fs, hp, "ts=now".getBytes("UTF-8"))
    val denied = intercept[IllegalStateException](
      Locks.withLock(fs, root, maxRetries = 2, staleAfterMs = 1000) { 1 })
    assert(denied.getMessage.contains("could not acquire"))
    assert(Locks.isLocked(fs, root), "live-heartbeat fence was stolen")
    // once the sidecar also goes stale, the steal proceeds
    graft.lake.FsOps.setMtime(fs, hp, System.currentTimeMillis() - 3600 * 1000)
    assert(Locks.withLock(fs, root, maxRetries = 4, staleAfterMs = 1000) { 42 } == 42)
    assert(!Locks.isLocked(fs, root))
  }

  test("tags: keys() round-trips '=' in names; '~' is rejected; listing APIs agree") {
    val dir = Files.createTempDirectory("graft-tags-mangle").toString
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val tags = new graft.lake.Tags(fs, root)
    tags.put("pins/env=prod", "3")
    assert(tags.keys("pins/") == Seq("pins/env=prod"))
    assert(tags.list("pins/") == Seq("pins/env=prod"))
    assert(tags.get("pins/env=prod").contains("3"))
    // '~' would collide with the mangled '=' twin — rejected outright
    intercept[IllegalArgumentException](tags.put("pins/env~prod", "4"))
  }

  test("job status survives torn/garbage files and skips crash-orphaned spools") {
    val dir = Files.createTempDirectory("graft-jobs-torn").toString
    val jobs = new graft.lake.JobRepository(spark, dir, "TestJob")
    val id = jobs.newRunId()
    // a torn write from an older non-atomic writer: truncated number and
    // timestamp — get() must degrade to defaults, not crash the endpoint
    val f = java.nio.file.Paths.get(dir, "_graft/jobs/TestJob")
    java.nio.file.Files.createDirectories(f)
    java.nio.file.Files.write(f.resolve(s"$id.properties"),
      s"runId=$id\npending=\nstarted=2026-08-1".getBytes("UTF-8"))
    java.nio.file.Files.write(f.resolve(s".${id}.tmp"), "garbage".getBytes("UTF-8"))
    val got = jobs.get(id).get
    assert(got.pending == 0L && got.started.isEmpty)
    assert(jobs.list() == Seq(id)) // the .tmp spool never lists as a run
  }
}
