package graft.cli

import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{Archive, Catalog, DatasetConfig, LakeRepository, Locks}
import graft.ops.Explode

/** The reference's CLI surface (cli/__init__.py and submodules) as a
  * plain Scala main over the same repository/catalog code paths the API
  * uses — no CLI framework, subcommand dispatch on argv:
  *
  * {{{
  *   graft.cli.Main --lake <root> ls
  *   graft.cli.Main --lake <root> datasets
  *   graft.cli.Main --lake <root> configure <ds> [--shards N] [--compression C] [--public-url U]
  *   graft.cli.Main --lake <root> entities iterate <ds>
  *   graft.cli.Main --lake <root> entities import <ds> < payload.ndjson
  *   graft.cli.Main --lake <root> statements iterate <ds>
  *   graft.cli.Main --lake <root> statements import <ds> < rows.jsonl
  *   graft.cli.Main --lake <root> statements sql <ds> "SELECT ... FROM statements"
  *   graft.cli.Main --lake <root> make <ds> [--out DIR] [--force]
  *   graft.cli.Main --lake <root> optimize <ds>
  *   graft.cli.Main --lake <root> unlock <ds>
  *   graft.cli.Main --lake <root> archive ls|get|head <ds> [checksum]
  *   graft.cli.Main --lake <root> delta import <ds>
  *   graft.cli.Main --lake <root> delta export <ds>
  *   graft.cli.Main --lake <root> serve [--port N]
  *   graft.cli.Main --api http://host:port <group...>   # remote lakehouse
  * }}}
  *
  * Remote mode (`--api <url>`, or an http[s] GRAFT_LAKE_URI — the
  * reference's api_delegate, core/api.py:120-143) routes
  * ls / entities / statements / stats / version / flush / optimize /
  * make / archive through [[graft.api.ApiLakeRepository]] with no local
  * SparkSession: the server's driver runs the jobs.
  *
  * Reference mapping: `ls`/`datasets`/`configure` (cli/__init__.py:168-204),
  * `entities iterate|import` (cli/entities.py), `statements
  * iterate|import|sql` (cli/statements.py — `sql` runs Spark SQL over the
  * live view registered as `statements`, where the reference hands the
  * parquet to DuckDB), `make`/`export`/`optimize`/`unlock`
  * (cli/maintenance.py), `archive` (cli/archive.py), `serve` (the S14
  * HTTP app), `zfs init` (cli/zfs.py — Spark-free host provisioning
  * through an injectable external agent, [[graft.lake.Zfs]]).
  *
  * All streaming IO is line-oriented NDJSON on stdin/stdout via
  * `toLocalIterator`, so piping a million entities through the CLI holds
  * one Spark partition in driver memory at a time.
  */
object Main {

  private val mapper = new ObjectMapper()

  def main(args: Array[String]): Unit = {
    val (flags, pos) = parseArgs(args.toList)
    // host-ops groups: no lake root, no server, no SparkSession
    if (runHostOps(flags, pos)) return
    // remote mode (reference: GRAFT/FTM lake URI may be an http[s] URL —
    // core/api.py delegates every repository call over the wire): no
    // SparkSession on the client, the server's driver runs the jobs
    val apiUrl = flags.get("api").orElse(
      sys.env.get("GRAFT_LAKE_URI").filter(_.startsWith("http")))
    if (apiUrl.isDefined) { runApi(apiUrl.get, flags, pos); return }
    val lakeRoot = flags.getOrElse("lake",
      sys.env.getOrElse("GRAFT_LAKE_URI",
        fail("--lake <root> / --api <url> or GRAFT_LAKE_URI required")))
    val spark = graft.Sessions.local("graft-cli")
    try run(spark, lakeRoot, flags, pos)
    finally spark.stop()
  }

  /** Spark-free host-infrastructure groups (reference cli/zfs.py):
    * `zfs init <ds> [--pool <zpool>] [--agent <cmd>]` provisions the
    * dataset's tuned ZFS hierarchy through the external agent command
    * ([[graft.lake.Zfs]]). Returns true when the args were handled here.
    */
  private[graft] def runHostOps(flags: Map[String, String],
      pos: List[String]): Boolean = pos match {
    case "zfs" :: "init" :: ds :: Nil =>
      val pool = flags.get("pool").orElse(sys.env.get("GRAFT_ZFS_POOL"))
        .getOrElse(fail("--pool <zpool> or GRAFT_ZFS_POOL required"))
      val agent = flags.get("agent").map(graft.lake.Zfs.tokenize)
        .getOrElse(graft.lake.Zfs.defaultAgent)
      graft.lake.Zfs.ensureDataset(pool, ds, agent).foreach(println)
      true
    case "zfs" :: _ =>
      fail("usage: zfs init <dataset> [--pool <zpool>] [--agent <cmd>]")
    case _ => false
  }

  /** The CLI groups that make sense against a remote lakehouse, routed
    * through [[graft.api.ApiLakeRepository]] — same subcommand grammar
    * as local mode, Spark-free client process.
    */
  private[graft] def runApi(url: String, flags: Map[String, String],
      pos: List[String]): Unit = {
    def repo(ds: String) = new graft.api.ApiLakeRepository(url, ds)
    pos match {
      case "ls" :: Nil =>
        // routed through the client repository so the shared-key headers
        // ride along — a GRAFT_API_KEY-gated server 401s a bare request
        graft.api.ApiLakeRepository.datasets(url).foreach(println)

      case "entities" :: "iterate" :: ds :: Nil =>
        repo(ds).queryRaw().foreach(println)

      case "entities" :: "query" :: ds :: rql :: Nil =>
        repo(ds).queryRaw(rql,
          limit = flags.get("limit").map(_.toInt)).foreach(println)

      case "entities" :: "import" :: ds :: Nil =>
        // stdin streams through in bounded batches — client memory stays
        // O(batch) however large the import. Fragments of one entity that
        // land in the SAME batch checksum together (explodeLocalBatch);
        // keep an entity's fragments adjacent in the input for id parity
        // with the embedded path.
        val r = repo(ds)
        val origin = flags.getOrElse("origin", "default")
        val n = scala.io.Source.stdin.getLines()
          .filter(_.trim.nonEmpty).map(parsePayload)
          .grouped(10000)
          .map(batch => r.addEntities(batch.toSeq, origin = origin))
          .sum
        r.flush()
        println(n)

      case "entities" :: "delete" :: ds :: id :: Nil =>
        println(repo(ds).deleteEntity(id))

      case "statements" :: "iterate" :: ds :: Nil =>
        repo(ds).statementsRaw().foreach(println)

      case "statements" :: "import" :: ds :: Nil =>
        val r = repo(ds)
        val n = r.addStatements(
          scala.io.Source.stdin.getLines().filter(_.trim.nonEmpty))
        r.flush()
        println(n)

      case "stats" :: ds :: Nil =>
        repo(ds).statistics.toSeq.sortBy(_._1)
          .foreach { case ((f, k), (e, s)) => println(s"$f\t$k\t$e\t$s") }

      case "version" :: ds :: Nil => println(repo(ds).version)
      case "flush" :: ds :: Nil => println(repo(ds).flush())
      case "optimize" :: ds :: Nil => println(repo(ds).optimize())

      case "make" :: ds :: Nil =>
        println(repo(ds).make(flags.get("out"),
          force = flags.contains("force")).mkString("\n"))

      case "archive" :: "get" :: ds :: checksum :: Nil =>
        repo(ds).archiveGet(checksum) match {
          case Some(bytes) => System.out.write(bytes); System.out.flush()
          case None => fail(s"no blob for $checksum")
        }

      case "archive" :: "head" :: ds :: checksum :: Nil =>
        println(if (repo(ds).archiveExists(checksum)) s"$checksum exists"
          else s"$checksum missing")

      case other =>
        fail("unknown/unsupported remote command: " + other.mkString(" "))
    }
  }

  private def fail(msg: String): Nothing = {
    System.err.println(s"error: $msg"); sys.exit(2)
  }

  /** `--key value` flags (plus bare `--force`) anywhere; the rest are
    * positional subcommand words.
    */
  private[graft] def parseArgs(args: List[String]): (Map[String, String], List[String]) = {
    val boolFlags = Set("force")
    def loop(rest: List[String], flags: Map[String, String],
        pos: List[String]): (Map[String, String], List[String]) = rest match {
      case Nil => (flags, pos.reverse)
      case f :: tail if f.startsWith("--") =>
        val key = f.drop(2)
        if (boolFlags(key)) loop(tail, flags + (key -> "true"), pos)
        else tail match {
          case v :: t2 => loop(t2, flags + (key -> v), pos)
          case Nil => fail(s"flag --$key needs a value")
        }
      case w :: tail => loop(tail, flags, w :: pos)
    }
    loop(args, Map.empty, Nil)
  }

  private[graft] def run(spark: SparkSession, lakeRoot: String,
      flags: Map[String, String], pos: List[String]): Unit = {
    val cat = new Catalog(spark, lakeRoot)
    def repo(ds: String): LakeRepository = {
      Catalog.validateName(ds)
      val p = cat.datasetPath(ds)
      val shards = DatasetConfig.load(
        p.getFileSystem(spark.sessionState.newHadoopConf()), p)
        .map(_.shards).getOrElse(16)
      new LakeRepository(spark, p.toString, ds, shards)
    }
    pos match {
      case "ls" :: Nil =>
        cat.listDatasets().foreach(println)

      case "datasets" :: Nil =>
        // one JSON line per dataset (reference `datasets` table output)
        cat.index().toJSON.toLocalIterator.asScala.foreach(println)

      case "configure" :: ds :: Nil =>
        Catalog.validateName(ds)
        if (!cat.datasetExists(ds))
          cat.ensureDataset(ds, shards = flags.get("shards").map(_.toInt).getOrElse(16))
        if (flags.contains("compression") || flags.contains("public-url"))
          cat.updateDataset(ds,
            compression = flags.get("compression"),
            publicUrlPrefix = flags.get("public-url").map(Some(_)))
        println(s"configured $ds")

      case "entities" :: "iterate" :: ds :: Nil =>
        repo(ds).query(graft.query.FtmQuery.Query()).toJSON
          .toLocalIterator.asScala.foreach(println)

      case "entities" :: "stream" :: ds :: Nil =>
        // reference cli/entities.py stream: byte-stream the pre-exported
        // entities.ftm.json artifact (frozen view), no re-assembly
        streamArtifact(cat, ds, "entities.ftm.json")

      case "entities" :: "import" :: ds :: Nil =>
        // NDJSON entity payloads {id, schema, properties{prop: [values]}}
        // exploded through the journal (reference cli/entities.py import)
        val r = repo(ds)
        val payloads = scala.io.Source.stdin.getLines()
          .filter(_.trim.nonEmpty).map(parsePayload).toSeq
        import spark.implicits._
        r.addEntities(payloads.toDS(), origin = flags.getOrElse("origin", "default"))
        r.flush()
        println(payloads.size)

      case "statements" :: "iterate" :: ds :: Nil =>
        repo(ds).live.drop("canonical_id").toJSON
          .toLocalIterator.asScala.foreach(println)

      case "statements" :: "stream" :: ds :: Nil =>
        streamArtifact(cat, ds, "statements.csv")

      case "statements" :: "import" :: ds :: Nil =>
        // stdin streams through the chunked wire — bounded driver memory
        val r = repo(ds)
        val n = graft.api.JournalWire.writeRows(spark, r, ds,
          scala.io.Source.stdin.getLines())
        r.flush()
        println(n)

      case "statements" :: "sql" :: ds :: query :: Nil =>
        // the reference hands the parquet path to DuckDB; here the live
        // view registers as `statements` and Spark SQL runs the query
        repo(ds).live.drop("canonical_id").createOrReplaceTempView("statements")
        spark.sql(query).toJSON.toLocalIterator.asScala.foreach(println)

      case "crawl" :: ds :: Nil =>
        // reference top-level `crawl` (cli/crawl.py): archive every file
        // under --src into the dataset blob store and import the file /
        // folder entities through the journal
        val src = flags.getOrElse("src", fail("crawl needs --src DIR"))
        val r = repo(ds)
        val srcPath = new org.apache.hadoop.fs.Path(src)
        val include = flags.get("include") match {
          case Some(glob) =>
            val m = java.nio.file.FileSystems.getDefault
              .getPathMatcher(s"glob:$glob")
            (rel: String) => m.matches(java.nio.file.Paths.get(rel))
          case None => (_: String) => true
        }
        val crawled = graft.ops.Documents.crawlDistributed(
          spark, srcPath,
          new org.apache.hadoop.fs.Path(cat.datasetPath(ds), "archive").toString,
          include)
        import spark.implicits._
        r.addEntities(graft.ops.Documents.crawlPayloads(crawled).toDS(),
          origin = flags.getOrElse("origin", "crawl"))
        r.flush()
        println(crawled.size)

      case "make" :: ds :: Nil =>
        val out = flags.getOrElse("out", cat.datasetPath(ds).toString + "/_exports")
        val built = repo(ds).make(out, force = flags.contains("force"))
        println(built.mkString("\n"))

      case "export" :: ds :: Nil =>
        val out = flags.getOrElse("out", fail("export needs --out DIR"))
        println(repo(ds).make(out, force = true).mkString("\n"))

      case "optimize" :: ds :: Nil =>
        println(repo(ds).optimize())

      case "snapshot" :: "pin" :: ds :: name :: Nil =>
        val v = flags.get("version").map(_.toLong).getOrElse(-1L)
        println(repo(ds).store.pin(name, v))

      case "snapshot" :: "unpin" :: ds :: name :: Nil =>
        repo(ds).store.unpin(name); println(s"unpinned $name")

      case "snapshot" :: "ls" :: ds :: Nil =>
        repo(ds).store.pins().toSeq.sortBy(_._1)
          .foreach { case (n, v) => println(s"$n\t$v") }

      case "snapshot" :: "clone" :: ds :: Nil =>
        val dest = flags.getOrElse("dest", fail("clone needs --dest DIR"))
        val v = flags.get("version").map(_.toLong).getOrElse(-1L)
        repo(ds).store.cloneAt(dest, v)
        println(s"cloned to $dest")

      case "delta" :: "import" :: ds :: Nil =>
        // adopt a reference-written delta-rs table in place: replay its
        // _delta_log into the graft manifest (lake/DeltaImport)
        val v = graft.lake.DeltaImport.importDeltaLog(
          spark, cat.datasetPath(ds).toString)
        println(s"imported _delta_log as manifest v$v")

      case "delta" :: "export" :: ds :: Nil =>
        // the inverse: publish the graft manifest as a _delta_log so
        // delta-rs / the reference stack can open this table in place
        val v = graft.lake.DeltaExport.exportDeltaLog(
          spark, cat.datasetPath(ds).toString)
        println(s"exported manifest as _delta_log v$v")

      case "unlock" :: ds :: Nil =>
        val p = cat.datasetPath(ds)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        println(if (Locks.unlock(fs, p)) "unlocked" else "was not locked")

      case "archive" :: "ls" :: ds :: Nil =>
        val r = repo(ds)
        r.live.filter(col("prop") === "contentHash").select("value")
          .distinct().orderBy("value")
          .toLocalIterator.asScala.foreach(row => println(row.getString(0)))

      case "archive" :: "get" :: ds :: checksum :: Nil =>
        archive(spark, cat, ds).get(checksum) match {
          case Some(bytes) => System.out.write(bytes); System.out.flush()
          case None => fail(s"no blob for $checksum")
        }

      case "archive" :: "download" :: ds :: Nil =>
        // reference cli/archive.py download → operation/download.py:
        // every document blob lands at its nice path under --target
        val target = flags.getOrElse("target", fail("download needs --target DIR"))
        val r = repo(ds)
        val docs = graft.ops.Documents.documentsTable(r.live)
        val aroot = new org.apache.hadoop.fs.Path(cat.datasetPath(ds), "archive")
        val (done, skipped) = graft.ops.Documents.downloadArchive(
          docs, aroot.toString, target)
        println(s"done=$done skipped=$skipped")

      case "archive" :: "head" :: ds :: checksum :: Nil =>
        println(
          if (archive(spark, cat, ds).exists(checksum)) s"$checksum exists"
          else s"$checksum missing")

      case "serve" :: Nil =>
        val server = new graft.api.LakeHttpServer(spark, lakeRoot,
          flags.get("port").map(_.toInt).getOrElse(8080))
        val port = server.start()
        println(s"serving lake $lakeRoot on 127.0.0.1:$port")
        Thread.currentThread().join() // until killed

      case other =>
        fail("unknown command: " + other.mkString(" "))
    }
  }

  /** Per-dataset blob root `<dataset>/archive` (reference path
    * conventions, core/conventions/path.py:144-212).
    */
  /** Byte-stream a pre-exported artifact (`_exports/<name>[.gz|.zst]`) to
    * stdout, decompressed — the reference's `stream` commands trust the
    * export and skip any re-assembly (cli/entities.py stream).
    */
  private def streamArtifact(cat: Catalog, ds: String, name: String): Unit = {
    val base = new org.apache.hadoop.fs.Path(cat.datasetPath(ds), "_exports")
    val fs = base.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val candidate = Seq(name, s"$name.gz", s"$name.zst")
      .map(new org.apache.hadoop.fs.Path(base, _))
      .find(fs.exists)
      .getOrElse(fail(s"no exported $name under $base — run `make` first"))
    val raw = fs.open(candidate)
    val in: java.io.InputStream = candidate.getName match {
      case n if n.endsWith(".gz") => new java.util.zip.GZIPInputStream(raw)
      case n if n.endsWith(".zst") => new com.github.luben.zstd.ZstdInputStream(raw)
      case _ => raw
    }
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { System.out.write(buf, 0, n); n = in.read(buf) }
      System.out.flush()
    } finally in.close()
  }

  private def archive(spark: SparkSession, cat: Catalog, ds: String): Archive = {
    val p = new org.apache.hadoop.fs.Path(cat.datasetPath(ds), "archive")
    new Archive(p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def parsePayload(line: String): Explode.EntityPayload = {
    val n = mapper.readTree(line)
    val id = Option(n.get("id")).map(_.asText).getOrElse(fail("payload missing id"))
    val schema = Option(n.get("schema")).map(_.asText).getOrElse("Thing")
    val props = Option(n.get("properties")).map { p =>
      p.fieldNames.asScala.map { k =>
        k -> p.get(k).elements.asScala.map(_.asText).toSeq
      }.toMap
    }.getOrElse(Map.empty[String, Seq[String]])
    Explode.EntityPayload(id, schema, props)
  }
}
