package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-dataset lakehouse catalog: one storage root holding one dataset
  * directory per name, with enumeration, addressing, get-or-create and a
  * catalog-wide metadata aggregation (reference catalog.py:126-166 `Catalog`,
  * catalog.py:40-125 module functions, cli/__init__.py:168-186 `ls` /
  * `datasets`).
  *
  * Scale notes: every method here is driver-side METADATA — one directory
  * listing plus one small config read per dataset, never a data scan. The
  * statistics surface ([[stats]]) is the only distributed piece and it is
  * explicitly per-dataset so callers choose which datasets to pay for.
  * Config freshness follows the reference contract (catalog.py:10-18):
  * [[StatementStore]] / [[Journal]] handles constructed via [[store]] /
  * [[journal]] read the config at construction; instances held across an
  * [[updateDataset]] keep their snapshot.
  */
class Catalog(val spark: SparkSession, val rootStr: String) {

  val root = new Path(rootStr)
  private val fs = root.getFileSystem(spark.sessionState.newHadoopConf())

  /** Validated canonical path for `name` under this catalog's root
    * (reference repository/base.py:16-30 `dataset_uri`). Validation at the
    * addressing boundary means a name can be trusted as it flows into path
    * construction downstream (reference util.py:167-191).
    */
  def datasetPath(name: String): Path = {
    Catalog.validateName(name)
    new Path(root, name)
  }

  /** Whether `name` exists (has a persisted config) — reference
    * catalog.py:50-52 `dataset_exists`.
    */
  def datasetExists(name: String): Boolean =
    DatasetConfig.load(fs, datasetPath(name)).isDefined

  /** Map `f` over `items` on the bounded driver-IO pool
    * ([[FsOps.driverIoPool]]), preserving order. Catalog-wide probes are
    * independent FS round trips (config read, manifest head, version
    * listing); at the 10k-dataset catalogs the reference targets
    * (catalog.py:40-166) a serial walk pays minutes of driver latency
    * for embarrassingly parallel metadata IO, so every catalog-wide
    * surface below batches through here. Hadoop `FileSystem` handles are
    * cached and thread-safe, so the shared `fs` is fine across workers.
    */
  private def parProbe[A, B](items: Seq[A],
      pool: scala.concurrent.ExecutionContext = FsOps.driverIoPool)(
      f: A => B): Seq[B] = {
    // bounded, not Duration.Inf: a single hung object-store probe must
    // surface as a timeout NAMING the stuck dataset instead of hanging
    // listDatasets/index/makeAll forever with no diagnostic. The budget
    // covers the whole batch (probes run concurrently on the pool, so
    // wall time is ~the slowest probe, not the sum).
    val timeoutSec = spark.conf.getOption("spark.graft.catalog.probeTimeoutSec")
      .map(_.toLong).getOrElse(600L)
    FsOps.awaitAll(items,
      scala.concurrent.duration.Duration(timeoutSec, "s"),
      (a: A) => String.valueOf(a), pool)(f)
  }

  /** Names of all datasets under the root that have a config, sorted
    * (reference catalog.py:159-165 `list_datasets`). One listing, then
    * the per-child existence probes (a config read each) batched on the
    * driver-IO pool.
    */
  def listDatasets(): Seq[String] = {
    if (!fs.exists(root)) return Nil
    val candidates = fs.listStatus(root).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(Catalog.isValidName)
      .toSeq
    parProbe(candidates)(n => if (datasetExists(n)) Some(n) else None)
      .flatten.sorted
  }

  /** Get or create a dataset (reference catalog.py:105-125
    * `ensure_dataset`): creation records `cfg`'s fields; when the dataset
    * already exists the passed config is IGNORED and the persisted one is
    * returned — layout-affecting settings are creation-time-only.
    */
  def ensureDataset(name: String, shards: Int = 16,
      compression: String = "gzip",
      publicUrlPrefix: Option[String] = None): DatasetConfig = {
    val p = datasetPath(name)
    // fast path outside the lock; the create path re-loads UNDER the
    // config lock, so two racing ensures can't both decide "absent" and
    // double-create (the loser sees the winner's config and returns it)
    DatasetConfig.load(fs, p).getOrElse {
      DatasetConfig.update(fs, p) {
        case Some(existing) => existing
        case None => DatasetConfig(name, shards, compression, publicUrlPrefix)
      }
    }
  }

  /** Merge changed fields into an existing dataset's config with a
    * versioned snapshot (reference catalog.py:81-103 `update_dataset`).
    * `shards` is immutable after first write — enforced by
    * [[DatasetConfig.save]].
    */
  def updateDataset(name: String,
      compression: Option[String] = None,
      publicUrlPrefix: Option[Option[String]] = None): DatasetConfig = {
    val p = datasetPath(name)
    // pre-check before taking the lock, so a typo'd name fails without
    // minting a lock directory under a ghost dataset path
    if (DatasetConfig.load(fs, p).isEmpty)
      throw new IllegalArgumentException(s"no such dataset: $name")
    // the merge itself runs lock→load→copy→save: loading outside the
    // lock would let two concurrent field updates both read the same
    // base and the second silently erase the first's change
    DatasetConfig.update(fs, p) {
      case None => throw new IllegalArgumentException(s"no such dataset: $name")
      case Some(existing) => existing.copy(
        compression = compression.getOrElse(existing.compression),
        publicUrlPrefix = publicUrlPrefix.getOrElse(existing.publicUrlPrefix))
    }
  }

  /** Statement-store handle for a dataset, shard count from its config
    * (reference repository factories, catalog.py:5-9). Fails for an
    * unregistered name: silently defaulting the shard count would let a
    * typo'd or premature call write partitions whose routing disagrees
    * with the config a later ensureDataset records.
    */
  def store(name: String): StatementStore = {
    val p = datasetPath(name)
    val shards = DatasetConfig.load(fs, p).map(_.shards).getOrElse(
      throw new IllegalArgumentException(
        s"no such dataset: $name (ensureDataset first — shard routing is config-bound)"))
    new StatementStore(spark, p.toString, shards)
  }

  /** Journal handle for a dataset (same addressing as [[store]]). */
  def journal(name: String): Journal =
    new Journal(spark, datasetPath(name).toString)

  /** Catalog-wide dataset metadata as a DataFrame: one row per dataset
    * with its config fields, current store version and config snapshot
    * count (reference cli/__init__.py:176-186 `datasets` — the
    * aggregation the API serves for "what is in this lake"). Pure driver
    * metadata (no data-file scan) packed into a local DataFrame so it
    * composes with SQL like every other surface.
    */
  def index(): DataFrame = {
    import spark.implicits._
    // the config load re-probes each listed name: a dataset destroyed
    // between the listing and its probe is SKIPPED, not a crash for the
    // whole catalog pass (enumerate-then-stat is inherently racy)
    parProbe(listDatasets()) { name =>
      val p = datasetPath(name)
      DatasetConfig.load(fs, p).map { cfg =>
        val version = Manifest.currentVersion(fs, p)
        (name, cfg.shards, cfg.compression, cfg.publicUrlPrefix.getOrElse(""),
          version, DatasetConfig.versions(fs, p))
      }
    }.flatten.toDF("dataset", "shards", "compression", "public_url_prefix",
      "store_version", "config_versions")
  }

  /** Aggregated `catalog.json` at the catalog root: the list of datasets
    * with their metadata — the multi-dataset twin of the per-dataset
    * `index.json` [[graft.ops.Make]] emits (reference get_dataset_index
    * fallback semantics, catalog.py:66-78: published index enriched from
    * config). Returns the written path.
    */
  def writeIndex(): String = {
    // Jackson, not hand-rolled escaping: config strings are
    // user-supplied (publicUrlPrefix especially) and a control
    // character a quote-only escaper misses breaks the whole file
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = mapper.createObjectNode()
    val arr = rootNode.putArray("datasets")
    // mid-probe deletions skip their entry rather than failing the pass
    parProbe(listDatasets()) { name =>
      val p = datasetPath(name)
      DatasetConfig.load(fs, p).map(cfg =>
        (name, cfg, Manifest.currentVersion(fs, p)))
    }.flatten.foreach { case (name, cfg, version) =>
      val o = arr.addObject()
      o.put("name", name)
      o.put("shards", cfg.shards)
      o.put("compression", cfg.compression)
      o.put("version", version)
      cfg.publicUrlPrefix.foreach(u => o.put("url", u))
    }
    rootNode.put("updated_at", java.time.Instant.now().toString)
    // atomic publish: a reader polling catalog.json sees the old or the
    // new complete file, never a torn prefix of a half-flushed write
    val out = new Path(root, "catalog.json")
    FsOps.publishSmall(fs, out, mapper.writeValueAsBytes(rootNode))
    out.toString
  }

  /** Catalog-wide make: run the full export pipeline for EVERY dataset
    * under one catalog-level job run, then refresh `catalog.json`
    * (reference operation/make.py applied per dataset + the catalog.py
    * aggregation the API serves). Per-dataset artifacts land under
    * `outRoot/<dataset>/`. Returns dataset → artifacts (re)built.
    *
    * Freshness rides [[graft.ops.Make.make]]'s per-artifact version
    * gating — a dataset whose store version hasn't moved rebuilds
    * nothing, so a catalog-wide make over a mostly-quiet lake costs one
    * metadata probe per quiet dataset — and those per-dataset makes run
    * CONCURRENTLY on the driver-IO pool (they are independent: distinct
    * store roots, distinct `outRoot/<dataset>` targets, own MakeJob
    * runs; a stale dataset's Spark jobs schedule from its worker thread
    * like any multi-tenant driver). Each dataset still records its own
    * MakeJob run; this run is the umbrella with per-dataset progress.
    * Failures are collected, not fail-fast: every dataset gets its
    * attempt, progress is recorded under the run, then the first error
    * fails the umbrella (a crashed makeAll leaves a failed run and the
    * previous catalog.json, never a half-true index).
    */
  def makeAll(outRoot: String, force: Boolean = false): Map[String, Seq[String]] = {
    val names = listDatasets()
    val jobs = new JobRepository(spark, rootStr, "CatalogMakeJob")
    var results = Map.empty[String, Seq[String]]
    jobs.run() { h =>
      h.save(pending = names.size)
      val lock = new Object
      // NOT driverIoPool: Make.make internally Awaits futures ON that
      // pool (journal flush, compact, delta export) — outer workers
      // holding every IO thread while blocked on inner IO futures would
      // deadlock, so dataset-level fan-out gets its own small pool
      val outcomes = parProbe(names, Catalog.makePool) { name =>
        // worker threads need the session pinned for any code path that
        // resolves SparkSession.active during the per-dataset exports
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
        val attempt = scala.util.Try(graft.ops.Make.make(store(name), journal(name),
          new Path(new Path(outRoot), name).toString, force = force))
        attempt.foreach { built =>
          lock.synchronized {
            results += name -> built
            h.save(pending = (names.size - results.size).toLong,
              done = results.size.toLong)
          }
        }
        name -> attempt
      }
      val failures = outcomes.collect { case (n, scala.util.Failure(e)) => (n, e) }
      if (failures.nonEmpty) {
        // every dataset got its attempt — surface ALL failures, not just
        // the first (the rest ride along as suppressed exceptions), and
        // leave the run's counters truthful before the umbrella fails.
        // run()'s catch bumps errors once more on the rethrow, so the
        // recorded total lands exactly on the failed-dataset count.
        h.save(pending = 0L, errors = (failures.size - 1).toLong)
        val ex = new RuntimeException(
          s"makeAll failed for ${failures.size}/${names.size} dataset(s): " +
            failures.map(_._1).mkString(", "), failures.head._2)
        failures.drop(1).foreach { case (_, e) => ex.addSuppressed(e) }
        throw ex
      }
      writeIndex()
    }
    results
  }
}

object Catalog {

  /** Bounded worker pool for dataset-level fan-out ([[Catalog.makeAll]]).
    * Distinct from [[FsOps.driverIoPool]] because each worker's
    * Make.make blocks on futures scheduled ON the IO pool — sharing it
    * would let the outer layer starve the inner one into deadlock. Four
    * concurrent dataset makes saturate a driver fine: each one fans its
    * own Spark jobs across the whole cluster.
    */
  lazy val makePool: scala.concurrent.ExecutionContextExecutorService =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4, r => {
        val t = new Thread(r, "graft-catalog-make")
        t.setDaemon(true)
        t
      }))

  /** Reserved names that are never datasets (reference util.py:183-189). */
  val ReservedNames: Set[String] = Set("catalog", "default")

  def isValidName(name: String): Boolean =
    name.matches("[a-z0-9][a-z0-9_-]*") && !ReservedNames.contains(name)

  /** Lowercase alphanumeric/underscore/dash, non-reserved — the same check
    * at every external entry point so a name is path- and SQL-safe
    * downstream (reference util.py:167-191 `validate_dataset_name`).
    */
  def validateName(name: String): String = {
    require(name.nonEmpty, "dataset name must not be empty")
    require(!ReservedNames.contains(name), s"invalid dataset name: `$name` (reserved)")
    require(name.matches("[a-z0-9][a-z0-9_-]*"), s"invalid dataset name: `$name`")
    name
  }

  /** Validate a caller-supplied string that flows into a path component
    * or partition value (`origin`, file ids) — rejects empty, `.`/`..`,
    * path separators, control characters, and over-long values
    * (reference util.py:38-76 `safe_name`). Spark's partition writer
    * URL-escapes values, so traversal cannot actually escape the table
    * root — but a hostile origin would still mint unreadable partition
    * keys and storage paths downstream; the boundary rejects it early,
    * like the reference.
    */
  def safePathComponent(value: String, field: String = "name"): String = {
    require(value != null && value.nonEmpty, s"$field must not be empty")
    require(value.length <= 255, s"$field too long (${value.length} > 255)")
    require(value != "." && value != "..", s"$field must not be a path marker: `$value`")
    require(!value.exists(c => c < ' ' || c == '\u007f'),
      s"$field must not contain control characters")
    require(!value.contains('/') && !value.contains('\\'),
      s"$field must not contain path separators: `$value`")
    value
  }
}
