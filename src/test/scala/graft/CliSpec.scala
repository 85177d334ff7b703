package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

/** The CLI surface (reference cli/__init__.py + submodules) driven through
  * `Main.run` with captured stdout/stdin: configure → import → iterate →
  * sql → make → optimize → unlock over a real lake.
  */
class CliSpec extends SparkSpec {

  private def cli(root: String, args: String*)(stdin: String = ""): String = {
    val out = new ByteArrayOutputStream()
    val oldIn = System.in
    val oldOut = System.out
    try {
      System.setIn(new ByteArrayInputStream(stdin.getBytes("UTF-8")))
      // both streams: println goes through Console, the byte-streaming
      // commands (archive get, entities/statements stream) write System.out
      System.setOut(new PrintStream(out, true, "UTF-8"))
      Console.withOut(new PrintStream(out, true, "UTF-8")) {
        val (flags, pos) = graft.cli.Main.parseArgs(args.toList)
        graft.cli.Main.run(spark, root, flags, pos)
      }
    } finally { System.setIn(oldIn); System.setOut(oldOut) }
    out.toString("UTF-8").trim
  }

  test("cli lifecycle: configure, import, iterate, sql, make, optimize, unlock") {
    val root = Files.createTempDirectory("graft-cli").toString

    assert(cli(root, "configure", "clitest")() == "configured clitest")
    assert(cli(root, "ls")() == "clitest")
    assert(cli(root, "datasets")().contains("\"dataset\":\"clitest\""))

    // statements import: JSONL rows through the shared wire, flushed
    val rows = Seq(
      """{"entity_id":"e1","schema":"Person","prop":"name","value":"Ann","prop_type":"name"}""",
      """{"entity_id":"e2","schema":"Person","prop":"name","value":"Bob","prop_type":"name"}""")
    assert(cli(root, "statements", "import", "clitest")(rows.mkString("\n")) == "2")

    // statements iterate: canonical live rows as NDJSON
    val it = cli(root, "statements", "iterate", "clitest")().split("\n")
    assert(it.length == 2 && it.forall(_.contains("\"schema\":\"Person\"")))

    // statements sql over the registered live view
    val sql = cli(root, "statements", "sql", "clitest",
      "SELECT entity_id FROM statements ORDER BY entity_id")().split("\n")
    assert(sql.toSeq == Seq("{\"entity_id\":\"e1\"}", "{\"entity_id\":\"e2\"}"))

    // entities import (payload shape) + iterate round trip
    val payload = """{"id":"acme","schema":"Company","properties":{"name":["Acme"]}}"""
    assert(cli(root, "entities", "import", "clitest")(payload) == "1")
    val ents = cli(root, "entities", "iterate", "clitest")()
    assert(ents.contains("\"id\":\"acme\"") && ents.contains("\"id\":\"e1\""))

    // make builds the artifact set; optimize reports the version
    val out = Files.createTempDirectory("graft-cli-out").toString
    val made = cli(root, "make", "clitest", "--out", out)()
    assert(made.contains("statements.csv") && made.contains("entities.ftm.json"))
    assert(new java.io.File(s"$out/statements.csv").exists())
    assert(cli(root, "optimize", "clitest")().toLong >= 0)
    assert(cli(root, "unlock", "clitest")() == "was not locked")

    // stream commands: byte-stream the default _exports artifacts
    // default out dir <dataset>/_exports; --force because the earlier
    // make stamped the per-artifact freshness tags (they are dataset-
    // scoped, not out-dir-scoped)
    cli(root, "make", "clitest", "--force")()
    val streamed = cli(root, "entities", "stream", "clitest")()
    assert(streamed.contains("\"id\":\"acme\""), streamed.take(200))
    val stCsv = cli(root, "statements", "stream", "clitest")()
    assert(stCsv.linesIterator.next().contains("entity_id"), stCsv.take(200))

    // archive download: crawl a tree in, download blobs to nice paths
    val src = Files.createTempDirectory("graft-cli-src")
    Files.writeString(src.resolve("doc.txt"), "cli crawl body")
    assert(cli(root, "crawl", "clitest", "--src", src.toString)() == "1")
    val dl = Files.createTempDirectory("graft-cli-dl")
    val res = cli(root, "archive", "download", "clitest",
      "--target", dl.toString)()
    assert(res.startsWith("done=1"), res)
    assert(Files.readString(dl.resolve("doc.txt")) == "cli crawl body")

    // snapshot pins + clone round-trip through the CLI. The earlier
    // `make` left its diff-state pin behind — VISIBLE by design, so an
    // operator can see what holds vacuum retention — so listings are
    // compared modulo that standing pin.
    def userPins(): Set[String] =
      cli(root, "snapshot", "ls", "clitest")().linesIterator
        .filterNot(_.startsWith("diff-")).toSet
    val pv = cli(root, "snapshot", "pin", "clitest", "stable")().toLong
    assert(userPins() == Set(s"stable\t$pv"))
    val cdir = Files.createTempDirectory("graft-cli-clone").toString
    assert(cli(root, "snapshot", "clone", "clitest", "--dest", cdir)()
      == s"cloned to $cdir")
    assert(new java.io.File(s"$cdir/_graft/manifest").exists())
    assert(cli(root, "snapshot", "unpin", "clitest", "stable")() == "unpinned stable")
    assert(userPins() == Set.empty)
  }

  test("cli remote mode: --api drives the full group set over the wire") {
    val root = Files.createTempDirectory("graft-cli-api").toString
    new graft.lake.Catalog(spark, root).ensureDataset("remote", shards = 4)
    val server = new graft.api.LakeHttpServer(spark, root)
    val port = server.start()
    val url = s"http://127.0.0.1:$port"

    def cliApi(args: String*)(stdin: String = ""): String = {
      val out = new ByteArrayOutputStream()
      val oldIn = System.in
      val oldOut = System.out
      try {
        System.setIn(new ByteArrayInputStream(stdin.getBytes("UTF-8")))
        System.setOut(new PrintStream(out, true, "UTF-8"))
        Console.withOut(new PrintStream(out, true, "UTF-8")) {
          val (flags, pos) = graft.cli.Main.parseArgs(args.toList)
          graft.cli.Main.runApi(url, flags, pos)
        }
      } finally { System.setIn(oldIn); System.setOut(oldOut) }
      out.toString("UTF-8").trim
    }

    try {
      assert(cliApi("ls")() == "remote")
      val payload = """{"id":"acme","schema":"Company","properties":{"name":["Acme"]}}"""
      assert(cliApi("entities", "import", "remote")(payload) == "1")
      val ents = cliApi("entities", "iterate", "remote")()
      assert(ents.contains("\"id\":\"acme\""), ents)
      val q = cliApi("entities", "query", "remote", """eq(name, "Acme")""")()
      assert(q.contains("\"id\":\"acme\""), q)
      val st = cliApi("statements", "iterate", "remote")()
      assert(st.linesIterator.forall(_.contains("\"entity_id\":\"acme\"")), st)
      assert(cliApi("version", "remote")().toLong >= 0)
      assert(cliApi("stats", "remote")().contains("thing/Company"))
      assert(cliApi("optimize", "remote")().toLong >= 0)
      assert(cliApi("entities", "delete", "remote", "acme")().toLong > 0)
      assert(cliApi("flush", "remote")().toLong >= 0)
      assert(cliApi("entities", "iterate", "remote")() == "")
    } finally server.stop()
  }

  test("cli crawl: files archived, file/folder entities imported, paths resolve") {
    val root = Files.createTempDirectory("graft-cli-crawl").toString
    cli(root, "configure", "crawltest")()
    val src = Files.createTempDirectory("graft-cli-src")
    Files.createDirectories(src.resolve("inner/deep"))
    Files.write(src.resolve("top.txt"), "top level".getBytes)
    Files.write(src.resolve("inner/deep/leaf.pdf"), "%PDF-1.4 x".getBytes)

    assert(cli(root, "crawl", "crawltest", "--src", src.toString)() == "2")

    // blobs are in the dataset archive, listed via contentHash statements
    val sums = cli(root, "archive", "ls", "crawltest")().split("\n")
    assert(sums.length == 2)
    assert(cli(root, "archive", "head", "crawltest", sums(0))().endsWith("exists"))
    val topSum = java.security.MessageDigest.getInstance("SHA-256")
      .digest("top level".getBytes).map("%02x".format(_)).mkString
    assert(new String(
      cliBytes(root, "archive", "get", "crawltest", topSum)) == "top level")

    // entities: 2 files + 2 folders (inner, inner/deep) with parent chain
    val ents = cli(root, "entities", "iterate", "crawltest")().split("\n")
    assert(ents.length == 4, ents.mkString("|"))
    assert(ents.count(_.contains("\"schema\":\"Folder\"")) == 2)
    // documents.csv resolves leaf.pdf's folder path through the chain
    val out = Files.createTempDirectory("graft-cli-crawl-out").toString
    cli(root, "make", "crawltest", "--out", out)()
    val csv = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/documents.csv")))
    assert(csv.contains("inner/deep"), csv)
  }

  test("cli zfs init: tuned hierarchy provisioned through the injectable agent") {
    val dir = Files.createTempDirectory("graft-zfs")
    val log = dir.resolve("calls.log")
    val script = dir.resolve("fake-agent.sh")
    Files.write(script,
      ("#!/bin/sh\necho \"$@\" >> " + log.toString + "\n").getBytes("UTF-8"))
    script.toFile.setExecutable(true)
    val out = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(out, true, "UTF-8")) {
      val (flags, pos) = graft.cli.Main.parseArgs(List(
        "zfs", "init", "alpha", "--pool", "tank", "--agent", script.toString))
      assert(graft.cli.Main.runHostOps(flags, pos))
    }
    // parent + archive + statements, announced in order
    assert(out.toString("UTF-8").trim.linesIterator.toSeq == Seq(
      "tank/alpha", "tank/alpha/archive", "tank/alpha/statements"))
    val calls = new String(Files.readAllBytes(log), "UTF-8").trim.linesIterator.toSeq
    assert(calls.size == 3)
    // reference property sets (core/zfs.py:37-54): parent packs dnodes,
    // statements turns ZFS compression off under 1M records (parquet is
    // already ZSTD inside), archive compresses hard at 128K
    assert(calls(0) == "create -p -o atime=off -o xattr=sa -o dnodesize=auto tank/alpha")
    assert(calls(1).contains("-o recordsize=128K") && calls(1).contains("-o compression=zstd-9")
      && calls(1).endsWith("tank/alpha/archive"))
    assert(calls(2).contains("-o recordsize=1M") && calls(2).contains("-o compression=off")
      && calls(2).endsWith("tank/alpha/statements"))
    // re-init is an ensure: same commands again (the -p create is the
    // idempotence, matching the reference's cached ensure)
    graft.lake.Zfs.ensureDataset("tank", "alpha", Seq(script.toString))
    assert(new String(Files.readAllBytes(log), "UTF-8").trim
      .linesIterator.size == 6)
    // validation at the boundary: hostile names never reach the agent
    assertThrows[IllegalArgumentException](
      graft.lake.Zfs.createCommands("tank", "../evil"))
    assertThrows[IllegalArgumentException](
      graft.lake.Zfs.createCommands("-o", "alpha"))
    // an agent failure surfaces its exit code and output
    val bad = dir.resolve("bad-agent.sh")
    Files.write(bad, "#!/bin/sh\necho boom\nexit 3\n".getBytes("UTF-8"))
    bad.toFile.setExecutable(true)
    val ex = intercept[RuntimeException](
      graft.lake.Zfs.ensureDataset("tank", "alpha", Seq(bad.toString)))
    assert(ex.getMessage.contains("exit 3") && ex.getMessage.contains("boom"))
  }

  test("zfs agent tokenization: quoted paths with spaces survive, junk rejected") {
    import graft.lake.Zfs.tokenize
    // plain whitespace split
    assert(tokenize("zfs-agent --sudo") == Seq("zfs-agent", "--sudo"))
    assert(tokenize("  zfs-agent  ") == Seq("zfs-agent"))
    // quotes group: a binary path containing spaces is expressible
    assert(tokenize("'/opt/my tools/agent' --sudo") ==
      Seq("/opt/my tools/agent", "--sudo"))
    assert(tokenize("\"/opt/my tools/agent\" -v") ==
      Seq("/opt/my tools/agent", "-v"))
    // adjacent quoted/unquoted segments concatenate (shell semantics)
    assert(tokenize("pre'fix suf'fix") == Seq("prefix suffix"))
    // empty quoted token is a real (empty) argument
    assert(tokenize("a '' b") == Seq("a", "", "b"))
    // unterminated quote throws instead of silently eating the tail
    assertThrows[IllegalArgumentException](tokenize("'/opt/agent --sudo"))

    // end to end: an agent living at a path with a space, passed quoted
    // through the CLI flag, is invoked correctly
    val dir = Files.createTempDirectory("graft-zfs sp")
    val log = dir.resolve("calls.log")
    val script = dir.resolve("fake agent.sh")
    Files.write(script,
      ("#!/bin/sh\necho \"$@\" >> '" + log.toString + "'\n").getBytes("UTF-8"))
    script.toFile.setExecutable(true)
    Console.withOut(new PrintStream(new ByteArrayOutputStream(), true, "UTF-8")) {
      val (flags, pos) = graft.cli.Main.parseArgs(List(
        "zfs", "init", "alpha", "--pool", "tank",
        "--agent", "'" + script.toString + "'"))
      assert(graft.cli.Main.runHostOps(flags, pos))
    }
    val calls = new String(Files.readAllBytes(log), "UTF-8").trim.linesIterator.toSeq
    assert(calls.size == 3 && calls.head.endsWith("tank/alpha"), calls)
  }

  private def cliBytes(root: String, args: String*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val old = System.out
    try {
      System.setOut(new PrintStream(out, true, "UTF-8"))
      val (flags, pos) = graft.cli.Main.parseArgs(args.toList)
      graft.cli.Main.run(spark, root, flags, pos)
    } finally System.setOut(old)
    out.toByteArray
  }
}
