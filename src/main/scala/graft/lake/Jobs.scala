package graft.lake

import java.time.Instant

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Job-run status record (reference model/job.py:21-75 `JobModel`):
  * lifecycle timestamps, progress counters, error capture, wall-clock.
  */
case class JobRun(
    runId: String,
    jobType: String,
    started: Option[Instant] = None,
    stopped: Option[Instant] = None,
    lastUpdated: Option[Instant] = None,
    pending: Long = 0L,
    done: Long = 0L,
    errors: Long = 0L,
    running: Boolean = false,
    exc: Option[String] = None,
    tookMs: Long = 0L) {

  /** Stamp progress (reference JobModel.touch). */
  def touch: JobRun = copy(lastUpdated = Some(Instant.now()))

  /** Mark stopped, capturing the failure if any (reference JobModel.stop):
    * `took` is the started→stopped wall-clock.
    */
  def stop(e: Option[Throwable] = None): JobRun = {
    val end = Instant.now()
    copy(running = false, stopped = Some(end), exc = e.map(_.toString),
      tookMs = started.map(s => end.toEpochMilli - s.toEpochMilli).getOrElse(0L))
  }
}

/** Job-run storage + lifecycle (reference repository/job.py `JobRepository`
  * / `JobRun`): one status file per (job type, run id) under the dataset
  * root, run ids timestamp-prefixed so the latest run is the lexicographic
  * max — no file mtimes involved, object-store safe. Pure driver-side
  * metadata: a status file is O(100 bytes), written at start/progress/stop
  * of long-running distributed operations, never per task.
  */
class JobRepository(val spark: SparkSession, rootStr: String, val jobType: String) {

  private val dir = new Path(new Path(rootStr, "_graft/jobs"), jobType)
  private val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())

  /** Timestamp-prefixed run id (reference: "run ID contains timestamp, so
    * the latest is the last in alphabetical order"). Fixed-width epoch
    * millis, NOT Instant.toString — ISO-8601 fractions are
    * variable-precision ("..32Z" vs "..32.500Z") and do not sort
    * lexicographically in time order.
    */
  def newRunId(): String =
    f"${Instant.now().toEpochMilli}%013d-${java.util.UUID.randomUUID().toString.take(8)}"

  private def fileOf(runId: String) = new Path(dir, s"$runId.properties")

  def put(job: JobRun): Unit = {
    val body = Seq(
      s"runId=${job.runId}",
      s"jobType=${job.jobType}",
      s"started=${job.started.map(_.toString).getOrElse("")}",
      s"stopped=${job.stopped.map(_.toString).getOrElse("")}",
      s"lastUpdated=${job.lastUpdated.map(_.toString).getOrElse("")}",
      s"pending=${job.pending}",
      s"done=${job.done}",
      s"errors=${job.errors}",
      s"running=${job.running}",
      s"exc=${job.exc.map(_.replace("\n", " ")).getOrElse("")}",
      s"tookMs=${job.tookMs}").mkString("\n")
    // write-aside + atomic replace: put() is called repeatedly during a
    // long run while monitors poll get() on the same file — an in-place
    // truncate-and-write would expose torn lines whose throwing parses
    // (Instant.parse, toLong) crash the status endpoint
    val tmp = new Path(dir, s".${job.runId}.tmp")
    FsOps.writeSmall(fs, tmp, body.getBytes("UTF-8"))
    if (!FsOps.renameReplace(fs, tmp, fileOf(job.runId)))
      throw new java.io.IOException(s"could not publish job status ${job.runId}")
  }

  def get(runId: String): Option[JobRun] = {
    val p = fileOf(runId)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val props = try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k -> v)
          case _ => None
        }
      }.toMap
    } finally in.close()
    // tolerant parses: the atomic-replace write keeps files whole, but a
    // file from an older writer (or a torn non-atomic filesystem) must
    // degrade to defaults, not crash the status endpoint
    def inst(k: String) = props.get(k).filter(_.nonEmpty)
      .flatMap(v => scala.util.Try(Instant.parse(v)).toOption)
    def num(k: String) = props.get(k)
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption).getOrElse(0L)
    Some(JobRun(
      runId = props.getOrElse("runId", runId),
      jobType = props.getOrElse("jobType", jobType),
      started = inst("started"), stopped = inst("stopped"),
      lastUpdated = inst("lastUpdated"),
      pending = num("pending"),
      done = num("done"),
      errors = num("errors"),
      running = props.get("running").exists(_.trim == "true"),
      exc = props.get("exc").filter(_.nonEmpty),
      tookMs = num("tookMs")))
  }

  /** All run ids for this job type, ascending (oldest first). */
  def list(): Seq[String] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".properties")) // skip crash-orphaned .tmp spools
      .map(_.stripSuffix(".properties"))
      .toSeq.sorted

  /** Latest run, by the timestamp embedded in the run id (reference
    * repository/job.py `latest`).
    */
  def latest(): Option[JobRun] = list().lastOption.flatMap(get)

  /** Run `body` under job lifecycle management (reference JobRun context
    * manager): started+running persisted up front, progress saves via the
    * handle, stopped (with the exception captured, then rethrown) on the
    * way out — a crashed operation leaves an inspectable failed run, not
    * a dangling `running=true` file.
    */
  def run[T](runId: Option[String] = None)(body: RunHandle => T): JobRun = {
    val id = runId.getOrElse(newRunId())
    val handle = new RunHandle(this,
      JobRun(id, jobType, started = Some(Instant.now()), running = true))
    put(handle.job)
    try {
      body(handle)
      handle.job = handle.job.stop(None)
      put(handle.job)
      handle.job
    } catch {
      case e: Throwable =>
        handle.job = handle.job.copy(errors = handle.job.errors + 1).stop(Some(e))
        put(handle.job)
        throw e
    }
  }
}

/** Mutable handle passed to [[JobRepository.run]] bodies for progress
  * reporting (reference JobRun.save).
  */
final class RunHandle(repo: JobRepository, var job: JobRun) {
  def save(pending: Long = -1, done: Long = -1, errors: Long = -1): Unit = {
    job = job.copy(
      pending = if (pending >= 0) pending else job.pending,
      done = if (done >= 0) done else job.done,
      errors = if (errors >= 0) errors else job.errors).touch
    repo.put(job)
  }
}
