package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** GraftExtensions: SQL surface of the native expressions + the
  * zero-offset-lead optimizer guard.
  */
class ExtensionsSpec extends SparkSpec {

  test("quantized_cosine is callable from SQL and matches the kernel") {
    val r = spark.sql(
      "SELECT quantized_cosine(array(1L,2L), array(3L,4L), 5L, 5L) AS c")
      .collect()(0).getDouble(0)
    // dot = 1*3 + 2*4 = 11; sqrt(5*5) = 5
    assert(math.abs(r - 11.0 / 5.0) < 1e-15)
  }

  test("int8_cosine is callable from SQL and matches the kernel") {
    val r = spark.sql(
      "SELECT int8_cosine(array(1Y,2Y), array(3Y,4Y), 5L, 25L) AS c")
      .collect()(0).getDouble(0)
    // dot = 1*3 + 2*4 = 11; sqrt(5*25) = sqrt(125)
    assert(math.abs(r - 11.0 / math.sqrt(125.0)) < 1e-15)
  }

  test("strip_namespace is callable from SQL with the F4 edge cases") {
    val rows = spark.sql(
      """SELECT strip_namespace(x) AS s FROM VALUES
        |  ('a.b'), ('plain'), ('.lead'), ('trail.') AS t(x)""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    // trailing dot = empty namespace, stripped (matches the f4 oracle);
    // leading dot = empty local part, passes through unchanged
    assert(rows == Seq("a", "plain", ".lead", "trail"))
  }

  test("wav_pcm_stats / bmp_pixel_stats are callable from SQL") {
    // a minimal WAV (one sample, value -2) through the SQL surface
    val wavHex = "52494646" + "26000000" + "57415645" +
      "666D7420" + "10000000" + "0100" + "0100" + "401F0000" + "803E0000" +
      "0200" + "1000" + "64617461" + "02000000" + "FEFF"
    val r = spark.sql(
      s"SELECT wav_pcm_stats(unhex('$wavHex')) AS w, " +
        "bmp_pixel_stats(unhex('00')) AS b").collect()(0)
    val w = r.getStruct(0)
    assert((w.getInt(0), w.getInt(1), w.getLong(2)) === ((1, 2, 2L)))
    assert(r.isNullAt(1)) // not a BMP → null, never an exception
  }

  test("graft_table/graft_live TVFs: snapshot reads, time travel, pushdown-capable plan") {
    import java.nio.file.Files
    import java.sql.Timestamp
    import spark.implicits._
    import graft.model.Statement
    val dir = Files.createTempDirectory("graft-tvf").toString
    val store = new graft.lake.StatementStore(spark, dir, shards = 4)
    def mk(n: Int, origin: String, del: Boolean) = (0 until n).map { i =>
      Statement(shard = "0", id = s"id$i-$origin", entity_id = s"e$i", dataset = "ds",
        bucket = "thing", origin = origin, source = None, schema = "Person",
        prop = "name", prop_type = "string", value = s"v$i", original_value = None,
        lang = None, external = false,
        first_seen = Timestamp.valueOf("2024-01-01 00:00:00"),
        last_seen = Timestamp.valueOf("2024-01-02 00:00:00"), fragment = "",
        deleted_at = if (del && i == 0) Some(Timestamp.valueOf("2024-01-03 00:00:00")) else None)
    }.toDS().toDF()
    val v1 = store.append(mk(3, "o1", del = false))
    store.append(mk(2, "o2", del = true))
    // current snapshot via SQL, with a pushable filter
    val cur = spark.sql(s"SELECT COUNT(*) FROM graft_table('$dir') WHERE origin = 'o1'")
      .collect()(0).getLong(0)
    assert(cur == 3L)
    assert(spark.sql(s"SELECT COUNT(*) FROM graft_table('$dir')").collect()(0).getLong(0) == 5L)
    // time travel to the first commit
    assert(spark.sql(s"SELECT COUNT(*) FROM graft_table('$dir', $v1)")
      .collect()(0).getLong(0) == 3L)
    // live view filters the tombstone
    assert(spark.sql(s"SELECT COUNT(*) FROM graft_live('$dir')").collect()(0).getLong(0) == 4L)
    // the TVF expands to a parquet relation: filters reach the scan
    val plan = spark.sql(s"SELECT entity_id FROM graft_table('$dir') WHERE origin = 'o1'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("origin"), plan)
    // changed-since TVF: zone maps prune the first commit's files (both
    // appends carry last_seen 2024-01-02; the tombstone bumps commit 2's
    // max changed stat to 2024-01-03)
    val changed = spark.sql(
      s"SELECT * FROM graft_changed_since('$dir', '2024-01-02 12:00:00')")
    assert(changed.inputFiles.length <
      spark.sql(s"SELECT * FROM graft_table('$dir')").inputFiles.length)
    assert(changed.count() == 2L) // the o2 commit's rows only
    // cutoff literals are UTC by contract (naive == Z == offset form, on
    // any driver zone): the offset spelling of the same instant must
    // select the same rows — Timestamp.valueOf would have rejected it
    // and parsed the naive form in the driver's zone
    assert(spark.sql(s"SELECT * FROM graft_changed_since('$dir', " +
      "'2024-01-02T14:00:00+02:00')").count() == 2L)
    assert(spark.sql(s"SELECT * FROM graft_changed_since('$dir', " +
      "'2024-01-02T12:00:00Z')").count() == 2L)
  }

  test("graft.<dataset> relations resolve to the catalog's live view") {
    import java.nio.file.Files
    import java.sql.Timestamp
    import spark.implicits._
    import graft.model.Statement
    val root = Files.createTempDirectory("graft-sqlcat").toString
    val cat = new graft.lake.Catalog(spark, root)
    cat.ensureDataset("alpha", shards = 4)
    val rows = (0 until 4).map { i =>
      Statement(shard = "0", id = s"id$i", entity_id = s"e$i", dataset = "alpha",
        bucket = "thing", origin = "o1", source = None, schema = "Person",
        prop = "name", prop_type = "string", value = s"v$i", original_value = None,
        lang = None, external = false,
        first_seen = Timestamp.valueOf("2024-01-01 00:00:00"),
        last_seen = Timestamp.valueOf("2024-01-02 00:00:00"), fragment = "",
        deleted_at = if (i == 0) Some(Timestamp.valueOf("2024-01-03 00:00:00")) else None)
    }.toDS().toDF()
    cat.store("alpha").append(rows)
    spark.conf.set("spark.graft.lake.root", root)
    try {
      // live view through the name: tombstoned e0 is filtered
      assert(spark.sql("SELECT COUNT(*) FROM graft.alpha").collect()(0).getLong(0) == 3L)
      // filters reach the parquet scan through the resolved relation
      val plan = spark.sql("SELECT entity_id FROM graft.alpha WHERE origin = 'o1'")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("origin"), plan)
      // unknown dataset fails with the catalog's error, not a silent scan
      val err = intercept[Exception](spark.sql("SELECT * FROM graft.nope").collect())
      assert(err.getMessage.contains("no such dataset") ||
        Option(err.getCause).exists(_.getMessage.contains("no such dataset")), err.getMessage)
      // joins across two datasets by name
      cat.ensureDataset("beta", shards = 4)
      cat.store("beta").append(rows.withColumn("dataset",
        org.apache.spark.sql.functions.lit("beta")))
      val joined = spark.sql(
        """SELECT COUNT(*) FROM graft.alpha a JOIN graft.beta b
          |ON a.entity_id = b.entity_id""".stripMargin).collect()(0).getLong(0)
      assert(joined == 3L)
    } finally spark.conf.unset("spark.graft.lake.root")
  }

  test("lead(c, 0) windows collapse to a projection (quadratic-frame guard)") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val w = Window.partitionBy($"k").orderBy($"v")
    val bad = df.withColumn("x", lead($"v", 0).over(w))
    val optimized = bad.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Window"), optimized)
    // semantics preserved: lead at offset 0 is the row's own value
    assert(bad.collect().forall(r => r.getString(1) == r.getString(2)))
    // non-zero offsets keep their window
    val good = df.withColumn("x", lead($"v", 1).over(w))
    assert(good.queryExecution.optimizedPlan.toString.contains("Window"))
  }
}
