package graft.lake

/** Tuned ZFS dataset provisioning — the host-storage convenience the
  * reference ships as `ftm-lakehouse zfs init` (core/zfs.py:1-80,
  * cli/zfs.py:27-49). Only the per-storage-type tuning and the
  * client-side caller live here; the transport (local `zfs` subprocess
  * vs. socket agent, mountpoint chown, peer auth) is an EXTERNAL agent
  * command, exactly as in the reference — injectable so agent-less
  * hosts and tests substitute their own binary.
  *
  * Why the tuning is what it is (reference zfs.py:22-54):
  *  - statements/: parquet output is already ZSTD-compressed inside the
  *    writer, so ZFS-level compression burns CPU per block and almost
  *    never shrinks high-entropy parquet further → compression=off, and
  *    1M records match the columnar write pattern;
  *  - archive/: content-addressed blobs of arbitrary mime → 128K
  *    records, zstd-9 (cold data, compress hard once);
  *  - the parent turns atime off and packs xattrs into dnodes.
  */
object Zfs {

  /** Per-storage-type ZFS properties (reference zfs.py `DatasetConfig`
    * — renamed here: [[graft.lake.DatasetConfig]] is the lake config). */
  final case class StorageProps(
      recordsize: String = "128K",
      compression: String = "zstd",
      sync: String = "standard",
      logbias: String = "throughput",
      extra: Seq[(String, String)] = Nil) {
    def toProps: Seq[(String, String)] = Seq(
      "recordsize" -> recordsize, "compression" -> compression,
      "sync" -> sync, "logbias" -> logbias) ++ extra
  }

  val Archive: StorageProps =
    StorageProps(recordsize = "128K", compression = "zstd-9")
  val Statements: StorageProps =
    StorageProps(recordsize = "1M", compression = "off")
  val ParentProps: Seq[(String, String)] =
    Seq("atime" -> "off", "xattr" -> "sa", "dnodesize" -> "auto")

  /** The `create` invocations for one dataset: parent plus one child per
    * storage type, in `create -p -o k=v ... <name>` grammar (`-p` =
    * idempotent ensure, like the reference's cached ensure). Exposed
    * separately from [[ensureDataset]] for dry runs and specs.
    */
  def createCommands(pool: String, dataset: String): Seq[Seq[String]] = {
    Catalog.validateName(dataset)
    require(pool.nonEmpty && !pool.startsWith("-") && !pool.contains(" "),
      s"invalid zfs pool: `$pool`")
    val base = s"$pool/$dataset"
    def cmd(name: String, props: Seq[(String, String)]) =
      (Seq("create", "-p") ++
        props.flatMap { case (k, v) => Seq("-o", s"$k=$v") }) :+ name
    Seq(
      cmd(base, ParentProps),
      cmd(s"$base/archive", Archive.toProps),
      cmd(s"$base/statements", Statements.toProps))
  }

  /** Shell-style tokenization for agent command strings: whitespace
    * splits, single or double quotes group — so an agent binary living
    * at a path with spaces (`'/opt/my tools/agent' --sudo`) is
    * expressible. No escapes, no expansion: the string is tokenized,
    * never handed to a shell. An unterminated quote throws rather than
    * silently swallowing the rest of the command.
    */
  def tokenize(s: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var inTok = false
    s.foreach { c =>
      if (quote != 0) {
        if (c == quote) quote = 0 else cur += c
      } else if (c == '\'' || c == '"') { quote = c; inTok = true }
      else if (c.isWhitespace) {
        if (inTok) { out += cur.result(); cur.clear(); inTok = false }
      } else { cur += c; inTok = true }
    }
    require(quote == 0, s"unterminated quote in agent command: `$s`")
    if (inTok) out += cur.result()
    out.toList
  }

  /** Agent command from the environment (`GRAFT_ZFS_AGENT`, may carry
    * its own arguments; quotes group tokens — see [[tokenize]]),
    * defaulting to the reference's external `zfs-agent` binary on PATH.
    */
  def defaultAgent: Seq[String] =
    sys.env.get("GRAFT_ZFS_AGENT").map(_.trim).filter(_.nonEmpty)
      .map(tokenize).getOrElse(Seq("zfs-agent"))

  /** Create the dataset's tuned ZFS hierarchy under `pool` by running
    * each create through the agent command (reference
    * `ensure_zfs_dataset`). Returns the provisioned dataset names. The
    * agent's combined output is captured and surfaced only on failure —
    * provisioning is a driver-side host operation, never Spark work.
    */
  def ensureDataset(pool: String, dataset: String,
      agent: Seq[String] = defaultAgent): Seq[String] =
    createCommands(pool, dataset).map { args =>
      val cmd = agent ++ args
      val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      val rc = proc.waitFor()
      if (rc != 0)
        throw new RuntimeException(
          s"zfs agent failed (exit $rc): ${cmd.mkString(" ")}\n${out.take(2000)}")
      args.last
    }
}
