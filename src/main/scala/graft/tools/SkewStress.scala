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
  *  - A1 merge ([[MergeDedupe.canonicalize]], one-pass window form —
  *    production) vs [[canonicalizeAggForm]], the skew-safe aggregation
  *    alternative (per-id min_by + group-stats agg + tie-keep join), and
  *  - A4 assembly ([[EntityAssembly.assemble]], two-phase per-prop fold)
  *    vs the one-phase `mapGroups(toVector)` twin that buffers every raw
  *    statement row of the entity in one task's heap.
  *
  * Prints one JSON line with wall seconds per (operator, fixture, form)
  * so both sides of the MergeDedupe class-doc trade are measured rows:
  * the aggregation form wins only on the pathological single-group
  * fixture; on realistic shapes its extra scan + exchanges cost
  * 1.5-3.6× across the store lifecycle (bench ×10), which is why the
  * window form is production and this form is the documented fallback.
  * SkewStressSpec proves both forms EQUAL.
  *
  * Usage: runMain graft.tools.SkewStress [rows] (default 1000000)
  */
object SkewStress {

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  /** The skew-safe AGGREGATION form of A1 (round-14's experiment): per-id
    * survivor via `min_by` over a recency sort key, supersession-group
    * stats as a declarative aggregation off the raw rows, tie-keep join
    * back. Hot groups collapse map-side, so no single-task sort — but the
    * diamond over the full-width scan costs a second scan + exchanges on
    * every merge (measured 1.5-3.6× on realistic shapes; see
    * MergeDedupe's class doc). Shared with SkewStressSpec, where it is
    * proved row-equal to the production window form — ONE definition so
    * the tool's measurement and the spec's equality proof cannot drift.
    */
  def canonicalizeAggForm(df: DataFrame): DataFrame = {
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
      .drop("__rn")
    val fragKeyNames = Seq("shard", "bucket", "origin", "entity_id", "prop", "fragment")
    val fragRows = df.filter(col("fragment") =!= "")
    // byRecency as ONE min-orderable struct: timestamps negate for DESC
    // with null mapped to Long.MaxValue (plain `.desc` is
    // desc_NULLS_LAST, but a null struct field would sort FIRST);
    // strings are ASC with nulls first = struct ordering's own null rule
    val recencyKey = struct(
      when(col("last_seen").isNull, lit(Long.MaxValue))
        .otherwise(-unix_micros(col("last_seen"))).as("k_ls"),
      when(col("deleted_at").isNull, lit(Long.MaxValue))
        .otherwise(-unix_micros(col("deleted_at"))).as("k_del"),
      col("value").as("k_val"),
      col("lang").as("k_lang"),
      col("original_value").as("k_orig"))
    val perId = fragRows
      .groupBy((fragKeyNames :+ "id").map(col): _*)
      .agg(min_by(struct(fragRows.columns.map(col): _*), recencyKey).as("__row"))
      .select(col("__row.*"))
    val groupStats = fragRows.groupBy(fragKeyNames.map(col): _*)
      .agg(max(col("last_seen")).as("__max_ls"),
        min(col("first_seen")).as("__min_fs"))
    val frag = perId
      .join(groupStats, fragKeyNames)
      .filter(col("last_seen") === col("__max_ls"))
      .drop("__max_ls")
    nonFrag.unionByName(frag)
      .withColumn("first_seen", col("__min_fs"))
      .drop("__min_fs")
  }

  /** Pre-round-14 A4 (one-phase fold over raw rows in one task).
    * Shared with SkewStressSpec — see [[canonicalizeAggForm]].
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
      val (win, nWin) = time(MergeDedupe.canonicalize(fixtures(m)).count())
      val (agg, nAgg) = time(canonicalizeAggForm(fixtures(m)).count())
      require(nAgg == nWin, s"a1 $m: $nAgg != $nWin")
      s""""$m":{"window_form_sec":${fmt(win)},"agg_form_sec":${fmt(agg)},"survivors":$nAgg}"""
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
