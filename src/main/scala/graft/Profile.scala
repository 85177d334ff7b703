package graft

import org.apache.spark.sql.functions._

/** Scratch profiling harness (dev-only, not part of the public surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-profile")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm the session + staged tables like Bench does
    time("warm-entry") { try SparkEntry.entry(spark).count() catch { case _: Throwable => () } }
    time("warm-a7") { SparkEntry.queries("a7_distinct_partitions")(spark, sfDir).count() }
    time("warm-a5") { SparkEntry.queries("a5_count_entities")(spark, sfDir).count() }

    args.headOption.getOrElse("s3") match {
      case "s3" =>
        // replicate the real query: session-staged stmts feed the store
        val staged = time("stage-stmts") {
          graft.functions.F.materialize(
            graft.lake.EventStatements.statements(Tables.events(spark, sfDir)))
        }
        for (i <- 1 to 3) {
          val tmp = graft.functions.F.stageTempPath(spark, "prof-e2e")
          val store = new graft.lake.StatementStore(spark, tmp, graft.lake.EventStatements.Shards)
          time(s"[$i] append") { store.append(staged) }
          time(s"[$i] merge") { store.merge() }
          time(s"[$i] read+count") { store.raw.count() }
          val fs = new org.apache.hadoop.fs.Path(tmp)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          val it = fs.listFiles(new org.apache.hadoop.fs.Path(tmp), true)
          var n = 0
          while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
          println(s"PROF [$i] parquet-files $n")
        }
      case "wr" =>
        val staged = graft.functions.F.materialize(
          graft.lake.EventStatements.statements(Tables.events(spark, sfDir)))
        val pcols = graft.model.Statement.partitionColumns.map(col)
        val scols = graft.model.Statement.appendSortColumns.map(col) :+ col("last_seen").desc
        def wvar(label: String, codec: String, pinned: Boolean): Unit = {
          spark.conf.set("spark.sql.parquet.compression.codec", codec)
          for (i <- 1 to 2) time(s"$label[$i]") {
            val tmp = graft.functions.F.stageTempPath(spark, "prof-wr")
            val base = if (pinned) staged.repartition(32, pcols: _*) else staged.repartition(pcols: _*)
            base.sortWithinPartitions(scols: _*)
              .write.partitionBy(graft.model.Statement.partitionColumns: _*)
              .mode("overwrite").parquet(tmp)
          }
        }
        wvar("zstd-aqe", "zstd", pinned = false)
        wvar("zstd-pin", "zstd", pinned = true)
        wvar("snappy-pin", "snappy", pinned = true)
        wvar("snappy-aqe", "snappy", pinned = false)
        spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
      case "fs" =>
        import org.apache.hadoop.fs.{FileSystem, Path => HPath}
        val conf = spark.sparkContext.hadoopConfiguration
        val p = new HPath("/dev/shm/fsbench")
        val cfs = p.getFileSystem(conf)
        val raw = FileSystem.getLocal(conf).getRaw
        def fsb(label: String, f: FileSystem): Unit = {
          val base = new HPath(p, label)
          f.mkdirs(base)
          time(s"$label-create64") {
            for (i <- 0 until 64) { val o = f.create(new HPath(base, s"f$i")); o.write(1); o.close() }
          }
          time(s"$label-rename64") {
            for (i <- 0 until 64) f.rename(new HPath(base, s"f$i"), new HPath(base, s"g$i"))
          }
          f.delete(base, true)
        }
        fsb("checksummed", cfs)
        fsb("raw", raw)
        fsb("checksummed2", cfs)
        fsb("raw2", raw)
      case "s3x" =>
        val staged = graft.functions.F.materialize(
          graft.lake.EventStatements.statements(Tables.events(spark, sfDir)))
        val pcols = graft.model.Statement.partitionColumns
        val scols = graft.model.Statement.appendSortColumns.map(col) :+ col("last_seen").desc
        for (i <- 1 to 2) {
          val tmp = graft.functions.F.stageTempPath(spark, "prof-s3x")
          val root = new org.apache.hadoop.fs.Path(tmp)
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val stage = new org.apache.hadoop.fs.Path(root, "_graft/ingest/x")
          time(s"[$i] lock") { graft.lake.Locks.withLock(fs, root)(()) }
          time(s"[$i] write") {
            staged.select(graft.model.Statement.columns.map(col): _*)
              .repartition(pcols.map(col): _*)
              .sortWithinPartitions(scols: _*)
              .write.partitionBy(pcols: _*).mode("overwrite").parquet(stage.toString)
          }
          val fresh = scala.collection.mutable.Set.empty[String]
          time(s"[$i] list+rename") {
            val stageBase = stage.toUri.getPath.stripSuffix("/")
            val it = fs.listFiles(stage, true)
            while (it.hasNext) {
              val f = it.next().getPath
              if (f.getName.endsWith(".parquet")) {
                val rel = f.toUri.getPath.stripPrefix(stageBase).stripPrefix("/")
                val dest = new org.apache.hadoop.fs.Path(root, rel)
                fs.mkdirs(dest.getParent)
                fs.rename(f, dest)
                fresh += rel
              }
            }
            fs.delete(stage, true)
          }
          val tags = new graft.lake.Tags(fs, root)
          time(s"[$i] tags") {
            fresh.map(_.split('/').take(pcols.length).mkString("/"))
              .foreach(p => tags.touch(s"dirty/$p"))
          }
          time(s"[$i] commit") {
            graft.lake.Manifest.commit(fs, root,
              graft.lake.Manifest.liveFiles(fs, root) ++ fresh, "append")
          }
          println(s"PROF [$i] files=${fresh.size}")
        }
      case "d3b" =>
        for (i <- 1 to 3) {
          val sig = time(s"[$i] sig-compute+mat") {
            graft.functions.F.materialize(
              graft.dedupe.Dedupe.simhash32FromTerms(
                graft.dedupe.Dedupe.tokenRows(Tables.documents(spark, sfDir), "doc_id", "text"), "doc_id")
                .select(col("doc_id"), col("simhash")))
          }
          time(s"[$i] pairs") {
            val bands = sig.select(col("doc_id").as("__id"), col("simhash"),
              explode(sequence(lit(0), lit(3))).as("__band"))
              .withColumn("__byte", expr("(simhash >> (__band * 8)) & 255"))
            val l = bands.select(col("__band"), col("__byte"), col("__id").as("id_a"), col("simhash").as("__sa"))
            val r = bands.select(col("__band"), col("__byte"), col("__id").as("id_b"), col("simhash").as("__sb"))
            l.join(r, Seq("__band", "__byte"))
              .filter(col("id_a") < col("id_b"))
              .select(col("id_a"), col("id_b"), bit_count(col("__sa").bitwiseXOR(col("__sb"))).as("hamming"))
              .distinct()
              .filter(col("hamming") <= 3)
              .count()
          }
          time(s"[$i] full-query") {
            SparkEntry.queries("d3b_simhash_pairs")(spark, sfDir).count()
          }
        }
      case "j4" =>
        for (i <- 1 to 3)
          time(s"[$i] j4") { SparkEntry.queries("j4_parent_chain")(spark, sfDir).count() }
      case q =>
        for (i <- 1 to 3)
          time(s"[$i] $q") { SparkEntry.queries(q)(spark, sfDir).count() }
    }
    spark.stop()
  }
}
