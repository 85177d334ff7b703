package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Alias, CaseWhen, Expression, ExpressionInfo, GreaterThan, Lead, Length, Literal, NamedExpression, Substring, SubstringIndex, Subtract, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.QuantizedCosine

/** Session extensions: the engine's Catalyst surface, activated with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (Sessions.local sets
  * it). Ships the native expressions as SQL functions and the optimizer
  * guard rules, so `spark.sql` users get the same kernels the DataFrame
  * API uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("quantized_cosine"),
      new ExpressionInfo(classOf[QuantizedCosine].getName, "quantized_cosine"),
      (args: Seq[Expression]) => QuantizedCosine(args(0), args(1), args(2), args(3))))
    ext.injectFunction((
      FunctionIdentifier("int8_cosine"),
      new ExpressionInfo(classOf[graft.functions.Int8Cosine].getName, "int8_cosine"),
      (args: Seq[Expression]) =>
        graft.functions.Int8Cosine(args(0), args(1), args(2), args(3))))
    // catalyst twin of F.stripNamespace (the Column recipe can't pass
    // through injectFunction — the analyzer doesn't descend into lazy
    // column nodes — so the builder assembles the same tree directly)
    ext.injectFunction((
      FunctionIdentifier("strip_namespace"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "strip_namespace"),
      (args: Seq[Expression]) => {
        val id = args.head
        val suffix = SubstringIndex(id, Literal("."), Literal(-1))
        val keep = Subtract(Subtract(Length(id), Length(suffix)), Literal(1))
        CaseWhen(
          Seq((GreaterThan(keep, Literal(0)), Substring(id, Literal(1), keep))),
          Some(id))
      }))
    ext.injectFunction((
      FunctionIdentifier("token_hash"),
      new ExpressionInfo(classOf[graft.functions.TokenHash].getName, "token_hash"),
      (args: Seq[Expression]) => graft.functions.TokenHash(args.head)))
    ext.injectFunction((
      FunctionIdentifier("media_probe"),
      new ExpressionInfo(classOf[graft.functions.MediaProbe].getName, "media_probe"),
      (args: Seq[Expression]) => graft.functions.MediaProbe(args.head)))
    ext.injectFunction((
      FunctionIdentifier("wav_pcm_stats"),
      new ExpressionInfo(classOf[graft.functions.WavPcmStats].getName, "wav_pcm_stats"),
      (args: Seq[Expression]) => graft.functions.WavPcmStats(args.head)))
    ext.injectFunction((
      FunctionIdentifier("bmp_pixel_stats"),
      new ExpressionInfo(classOf[graft.functions.BmpPixelStats].getName, "bmp_pixel_stats"),
      (args: Seq[Expression]) => graft.functions.BmpPixelStats(args.head)))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[graft.functions.PqEncode].getName, "pq_encode"),
      (args: Seq[Expression]) => graft.functions.PqEncode(args.head)))
    ext.injectFunction((
      FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[graft.functions.PqAdc].getName, "pq_adc"),
      (args: Seq[Expression]) => graft.functions.PqAdc(args.head)))
    ext.injectFunction((
      FunctionIdentifier("z_order"),
      new ExpressionInfo(classOf[graft.functions.ZOrderLong].getName, "z_order"),
      (args: Seq[Expression]) => graft.functions.ZOrderLong(
        org.apache.spark.sql.catalyst.expressions.Cast(args(0),
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.LongType))))
    // table functions: the versioned statement store as a SQL-queryable
    // relation — `SELECT * FROM graft_table('<root>' [, version])` (time
    // travel by snapshot) and `graft_live('<root>')` (tombstone-filtered
    // live view). The builder expands to the manifest-scoped parquet
    // relation's analyzed plan, so scans keep vectorized reads, column
    // pruning, and predicate pushdown — the TVF is resolution sugar, not
    // an execution layer.
    ext.injectTableFunction((
      FunctionIdentifier("graft_table"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_table"),
      (args: Seq[Expression]) => GraftExtensions.storePlan(args, live = false)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_live"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_live"),
      (args: Seq[Expression]) => GraftExtensions.storePlan(args, live = true)))
    // `graft_changed_since('<root>', '<ts>')`: the zone-map-pruned
    // changed-files read (P8 file skipping) as a SQL relation — incremental
    // consumers layer their exact row predicate on top
    ext.injectTableFunction((
      FunctionIdentifier("graft_changed_since"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_changed_since"),
      (args: Seq[Expression]) => GraftExtensions.changedSincePlan(args)))
    ext.injectOptimizerRule(_ => RewriteZeroOffsetLead)
    // name-based SQL over the lake catalog: `SELECT ... FROM
    // graft.<dataset>` resolves to the dataset's LIVE view (the read
    // surface), rooted at spark.graft.lake.root — the resolution-rule
    // twin of a DSv2 TableCatalog, expanding straight to the
    // manifest-scoped parquet plan so pushdown/pruning stay intact
    ext.injectResolutionRule(s => ResolveGraftRelations(s))
  }
}

/** Resolves `graft.<dataset>` relations against the catalog at
  * `spark.graft.lake.root`. Only the two-part `graft.x` namespace is
  * claimed; every other unresolved relation passes through untouched.
  */
case class ResolveGraftRelations(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") =>
      val root = spark.conf.getOption("spark.graft.lake.root").getOrElse(
        throw new IllegalArgumentException(
          "set spark.graft.lake.root to resolve graft.<dataset> relations"))
      val cat = new graft.lake.Catalog(spark, root)
      // Catalog.store validates the dataset exists and reads its shard
      // config; .live is the canonical read view (A1 + tombstone filter)
      cat.store(u.multipartIdentifier(1)).live.queryExecution.analyzed
  }
}

object GraftExtensions {

  /** Expand a `graft_table`/`graft_live` call into the store's analyzed
    * scan plan. Arguments must be foldable literals (a path, optionally a
    * snapshot version) — they select which files to read, which must be
    * known at resolution time.
    */
  private def litValue(e: Expression): Any = e match {
    case l: Literal => l.value
    case other => throw new IllegalArgumentException(
      s"graft table-function arguments must be literals, got: $other")
  }

  private[plans] def storePlan(args: Seq[Expression], live: Boolean): LogicalPlan = {
    val path = String.valueOf(litValue(args.head))
    val version = args.drop(1).headOption.map(e => String.valueOf(litValue(e)).toLong).getOrElse(-1L)
    val spark = org.apache.spark.sql.SparkSession.active
    val store = new graft.lake.StatementStore(spark, path)
    val df = if (live) store.live else store.rawAt(version)
    df.queryExecution.analyzed
  }

  private[plans] def changedSincePlan(args: Seq[Expression]): LogicalPlan = {
    val path = String.valueOf(litValue(args.head))
    // UTC parse, not Timestamp.valueOf: the cutoff literal must denote
    // the same instant on every driver regardless of its default zone
    // (the session — and the stored last_seen instants — are UTC)
    val cutoff = graft.functions.F.parseUtcTimestamp(
      String.valueOf(litValue(args(1))))
    val spark = org.apache.spark.sql.SparkSession.active
    new graft.lake.StatementStore(spark, path)
      .rawChangedSince(cutoff).queryExecution.analyzed
  }
}

/** Rewrites `lead(e, 0)` / `lag(e, 0)` windows to plain `e`.
  *
  * A zero-offset frameless offset function is the identity on its input,
  * but Spark's O(1) offset-frame fast path only engages for non-zero
  * offsets — a `lead(e, 0)` window falls back to re-scanning the frame
  * per row and turns quadratic in partition size (measured: minutes vs
  * milliseconds on 10^5-row partitions). Code SHOULD pass the column
  * directly (see Dedupe.shingleRows), but generated/user SQL does not
  * always get that right; this rule makes the engine immune.
  *
  * Conservative shape: only a Window node whose window expressions are
  * ALL zero-offset leads/lags collapses (to a Project over the child);
  * mixed nodes keep their exchange anyway, so rewriting them buys
  * nothing and risks breaking Window invariants.
  */
object RewriteZeroOffsetLead extends Rule[LogicalPlan] {

  private def zeroOffset(e: Expression): Option[Expression] = e match {
    case WindowExpression(Lead(in, Literal(0, _), _, false), _) => Some(in)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case w @ Window(wexprs, _, _, child, _)
        if wexprs.nonEmpty && wexprs.forall {
          case Alias(we, _) => zeroOffset(we).isDefined
          case _ => false
        } =>
      val rewritten: Seq[NamedExpression] = wexprs.map {
        case a @ Alias(we, name) =>
          Alias(zeroOffset(we).get, name)(a.exprId, a.qualifier, a.explicitMetadata)
      }
      Project(child.output ++ rewritten, child)
  }
}
