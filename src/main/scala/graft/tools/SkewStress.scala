package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{EntityAssembly, MergeDedupe}

/** Measured hot-entity skew stress for the core lake path (round-13
  * verdict item 1): fixtures with the reference's routine mega-entity
  * shapes (bucket=pages — one statement per page on ONE entity,
  * docs/architecture.md:99, logic/parquet.py:253; plus the pathological
  * single (entity, prop, fragment) group), run through
  *
  *  - A1 merge ([[MergeDedupe.canonicalize]], aggregation-form group
  *    stats) vs its window-form twin (the pre-round-14 shape whose hot
  *    group sorts through one task), and
  *  - A4 assembly ([[EntityAssembly.assemble]], two-phase per-prop fold)
  *    vs the one-phase `mapGroups(toVector)` twin that buffers every raw
  *    statement row of the entity in one task's heap.
  *
  * Prints one JSON line with wall seconds per (operator, fixture, form)
  * so the straggler-vs-distributed claim is a measured artifact row, not
  * a plan-read argument. SkewStressSpec proves both forms EQUAL; this
  * tool measures why the distributed form is the production one.
  *
  * Usage: runMain graft.tools.SkewStress [rows] (default 1000000)
  */
object SkewStress {

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  /** Pre-round-14 A1 (window-form group statistics). Shared with
    * SkewStressSpec, where it is the semantics reference the production
    * aggregation form must equal — ONE definition so the tool's
    * measurement and the spec's equality proof can never drift apart.
    */
  def canonicalizeWindowTwin(df: DataFrame): DataFrame = {
    val grain = Seq("shard", "bucket", "origin")
    val byRecency = Seq(col("last_seen").desc, col("deleted_at").desc_nulls_last,
      col("value"), col("lang").asc_nulls_first,
      col("original_value").asc_nulls_first)
    val nonFragKeys = (grain :+ "id").map(col)
    val nonFrag = df.filter(col("fragment") === "")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(nonFragKeys: _*).orderBy(byRecency: _*)))
      .withColumn("__min_fs", min(col("first_seen")).over(
        Window.partitionBy(nonFragKeys: _*)))
      .filter(col("__rn") === 1)
    val fragKeys = (grain ++ Seq("entity_id", "prop", "fragment")).map(col)
    val frag = df.filter(col("fragment") =!= "")
      .withColumn("__max_ls", max(col("last_seen")).over(
        Window.partitionBy(fragKeys: _*)))
      .withColumn("__min_fs", min(col("first_seen")).over(
        Window.partitionBy(fragKeys: _*)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy((fragKeys :+ col("id")): _*).orderBy(byRecency: _*)))
      .filter(col("last_seen") === col("__max_ls") && col("__rn") === 1)
      .drop("__max_ls")
    nonFrag.unionByName(frag)
      .withColumn("first_seen", col("__min_fs"))
      .drop("__rn", "__min_fs")
  }

  /** Pre-round-14 A4 (one-phase fold over raw rows in one task).
    * Shared with SkewStressSpec — see [[canonicalizeWindowTwin]].
    */
  def assembleOnePhaseTwin(live: DataFrame) = {
    val spark = live.sparkSession
    import spark.implicits._
    live.select(
      col("canonical_id"), col("entity_id"), col("schema"), col("prop"),
      col("value"), col("dataset"), col("origin"), col("first_seen"),
      col("last_seen"))
      .as[EntityAssembly.StmtLite]
      .groupByKey(_.canonical_id)
      .mapGroups((id, it) => EntityAssembly.fold(id, it))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = graft.Sessions.local("graft-skew-stress")

    // fixtures share the statement schema of the lake; built inline so
    // the tool needs no testdata dir
    def fixture(mode: String): DataFrame = {
      val base = spark.range(0L, n.toLong, 1L, 32)
      val (entity, prop, fragment, id, lastSeen, firstSeen) = mode match {
        case "pages" =>
          // 1 entity × n distinct fragments (one per page)
          (lit("mega"), lit("indexText"),
            concat(lit("pg"), col("id")), concat(lit("s"), col("id")),
            lit(0L), lit(1000L))
        case "hotgroup" =>
          // 1 entity × ONE (prop, fragment) group × n rows, half tied at
          // the group-max last_seen
          (lit("hot"), lit("alias"), lit("f0"),
            concat(lit("s"), col("id")),
            when(col("id") % 2 === 0, 9000L).otherwise(1000L).cast("long"),
            lit(2000L))
        case _ =>
          // uniform control: n/10 entities × 10 fragments
          (concat(lit("e"), (col("id") % (n / 10)).cast("string")),
            lit("name"), concat(lit("f"), (col("id") / (n / 10)).cast("string")),
            concat(lit("s"), col("id")), lit(0L), lit(1000L))
      }
      base.select(
        lit("0").as("shard"), id.as("id"), entity.as("entity_id"),
        lit("ds").as("dataset"), lit("thing").as("bucket"),
        lit("o1").as("origin"), lit(null).cast("string").as("source"),
        lit("Person").as("schema"), prop.as("prop"),
        lit("string").as("prop_type"),
        concat(lit("v"), col("id")).as("value"),
        lit(null).cast("string").as("original_value"),
        lit(null).cast("string").as("lang"), lit(false).as("external"),
        timestamp_millis(lit(1700000000000L) + firstSeen).as("first_seen"),
        timestamp_millis(lit(1700000000000L) + lastSeen).as("last_seen"),
        fragment.as("fragment"),
        lit(null).cast("timestamp").as("deleted_at"))
    }

    // this host shows documented multi-10x hypervisor stalls — a single
    // sample is noise; min over reps is the engine's cost (same policy
    // as Bench)
    val reps = sys.env.getOrElse("SPARK_GRAFT_SKEW_REPS", "3").toInt
    def time(body: => Long): (Double, Long) = {
      var best = Double.MaxValue
      var rows = 0L
      for (_ <- 0 until reps) {
        val t0 = System.nanoTime()
        rows = body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    val fixtures = Seq("pages", "hotgroup", "uniform")
      .map(m => m -> graft.functions.F.materialize(fixture(m))).toMap
    fixtures.values.foreach(_.count()) // stage off the clock

    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString(" ")
      catch { case _: Throwable => "" }
    val loadBefore = loadavg()

    val out = new StringBuilder
    out ++= s"""{"rows":$n,"reps":$reps,"a1":{"""
    out ++= fixtures.keys.toSeq.sorted.map { m =>
      val (agg, nAgg) = time(MergeDedupe.canonicalize(fixtures(m)).count())
      val (win, nWin) = time(canonicalizeWindowTwin(fixtures(m)).count())
      require(nAgg == nWin, s"a1 $m: $nAgg != $nWin")
      s""""$m":{"agg_form_sec":${fmt(agg)},"window_twin_sec":${fmt(win)},"survivors":$nAgg}"""
    }.mkString(",")
    out ++= s"""},"a4":{"""
    out ++= fixtures.keys.toSeq.sorted.map { m =>
      val live = fixtures(m).withColumn("canonical_id", col("entity_id"))
      val (two, nTwo) = time(EntityAssembly.assemble(live).count())
      val (one, nOne) = time(assembleOnePhaseTwin(live).count())
      require(nTwo == nOne, s"a4 $m: $nTwo != $nOne")
      s""""$m":{"two_phase_sec":${fmt(two)},"one_phase_twin_sec":${fmt(one)},"entities":$nTwo}"""
    }.mkString(",")
    out ++= s"""},"loadavg_before":"$loadBefore","loadavg_after":"${loadavg()}"}"""
    println(out.toString)
    spark.stop()
  }
}
