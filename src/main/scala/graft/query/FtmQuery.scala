package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.FtmModel

/** The engine's query language: a filter tree + order + slice compiled onto
  * statement DataFrames (reference: ftmq `Query` / RQL wire format,
  * api/dependencies.py:78-167; compile funnel storage/parquet.py:185-195).
  *
  * Two filter grains, exactly like the reference:
  *  - statement-grain predicates (dataset/origin/schema/entity_id/...)
  *    become plain pushdown-friendly `Column` filters;
  *  - property predicates (`P(name = "Jane")`) are entity-grain: the
  *    entities with ANY matching statement are selected, then ALL their
  *    statements returned — a distinct-ids semi-join (J2), never an IN
  *    literal.
  *
  * Schema filters fold into a `bucket IN (...)` partition prune (P2) plus
  * a descendant-expanded `schema IN (...)` row filter (P3).
  */
object FtmQuery {

  sealed trait Comparator
  case object EqOp extends Comparator
  case object NotOp extends Comparator
  case object InOp extends Comparator
  case object NotInOp extends Comparator
  case object GteOp extends Comparator
  case object LteOp extends Comparator
  case object GtOp extends Comparator
  case object LtOp extends Comparator
  case object LikeOp extends Comparator
  case object NullOp extends Comparator
  case object NotNullOp extends Comparator

  /** Statement-grain predicate on a physical column. */
  case class M(field: String, op: Comparator, values: Seq[String] = Seq.empty)
  /** Entity-grain predicate on a property value. */
  case class P(prop: String, op: Comparator, values: Seq[String] = Seq.empty)

  case class Query(
      schemata: Option[String] = None, // expands to descendants
      origin: Option[String] = None,
      statementFilters: Seq[M] = Seq.empty,
      propFilters: Seq[P] = Seq.empty,
      orderByProps: Seq[(String, Boolean)] = Seq.empty, // (prop, descending), significance order
      limit: Option[Int] = None,
      offset: Int = 0)

  /** DoS bounds mirroring the reference API caps (core/settings.py:89-93). */
  val MaxFilterLeaves = 20
  val MaxInValues = 10000

  private def compare(c: Column, op: Comparator, values: Seq[String]): Column = op match {
    case EqOp => c === values.head
    case NotOp => c =!= values.head
    case InOp => c.isin(values: _*)
    case NotInOp => !c.isin(values: _*)
    case GteOp => c >= values.head
    case LteOp => c <= values.head
    case GtOp => c > values.head
    case LtOp => c < values.head
    case LikeOp => c.like(values.head)
    case NullOp => c.isNull
    case NotNullOp => c.isNotNull
  }

  /** The ONE value-arity spec per comparator, shared by [[validate]] and
    * [[Rql.parse]] so the wire and programmatic layers cannot drift:
    * scalar comparators read `values.head` and take EXACTLY one value
    * (more would be silently dropped — worse than a reject); IN/NOT-IN
    * take any number including zero (empty is well-defined: matches
    * nothing / everything, and `render` round-trips it); NULL checks
    * carry none. `None` = unconstrained.
    */
  def requiredValues(op: Comparator): Option[Int] = op match {
    case NullOp | NotNullOp => Some(0)
    case InOp | NotInOp => None
    case _ => Some(1)
  }

  private def validate(q: Query): Unit = {
    val leaves = q.statementFilters.size + q.propFilters.size
    require(leaves <= MaxFilterLeaves, s"too many filter leaves: $leaves")
    val leafOps = q.statementFilters.map(m => (m.field, m.op, m.values)) ++
      q.propFilters.map(p => (p.prop, p.op, p.values))
    leafOps.foreach { case (k, op, vs) =>
      require(vs.size <= MaxInValues, s"too many IN values: ${vs.size}")
      requiredValues(op).foreach(n => require(vs.size == n,
        s"comparator $op on `$k` takes exactly $n value(s), got ${vs.size}"))
    }
  }

  /** Compile the query against a live statement DataFrame. Returns the
    * matching statements (all statements of matching entities).
    */
  def compile(q: Query, live: DataFrame): DataFrame = {
    validate(q)
    var df = live

    q.schemata.foreach { s =>
      val desc = FtmModel.descendants(s)
      val buckets = desc.map(FtmModel.bucketOf)
      // derived bucket prune reaches partition pruning; schema filter
      // narrows rows within surviving partitions
      df = df.filter(col("bucket").isin(buckets.toSeq: _*) &&
        col("schema").isin(desc.toSeq: _*))
    }
    q.origin.foreach(o => df = df.filter(col("origin") === o))
    q.statementFilters.foreach(m => df = df.filter(compare(col(m.field), m.op, m.values)))

    if (q.propFilters.nonEmpty) {
      // J2 two-phase: entity ids with ANY statement matching EVERY prop
      // predicate, then left-semi back to all their statements.
      val idSets = q.propFilters.map { p =>
        live.filter(col("prop") === p.prop && compare(col("value"), p.op, p.values))
          .select("entity_id").distinct()
      }
      // No broadcast hint: the matching-id set is unbounded (a predicate
      // matching most of a 100 TB corpus selects billions of ids). AQE
      // converts the shuffle join to a broadcast one at runtime when the
      // built side turns out small, and degrades gracefully when it isn't.
      val ids = idSets.reduce(_.intersect(_))
      df = df.join(ids, Seq("entity_id"), "left_semi")
    }
    df
  }

  /** Entity-grain execution: matching entity ids in query order, sliced.
    * Sorted/sliced queries run as ONE global plan (reference O4's
    * `_needs_global` split): Catalyst turns orderBy+limit into a
    * distributed top-k, never a full global sort.
    */
  def entityIds(q: Query, live: DataFrame): DataFrame = {
    val (page, sortCols) = entityIdPage(q, live)
    // re-assert the page order: the contract is ids IN QUERY ORDER, and
    // the offset branch's filter does not guarantee it structurally
    page.orderBy(sortCols: _*).select("entity_id")
  }

  /** [[entityIds]] keeping the per-entity sort KEYS alongside the page,
    * plus the sort columns to order by — for callers whose downstream
    * joins destroy row order (entity assembly) and must re-establish
    * query order by re-sorting on these keys rather than collecting an
    * ordered id list to the driver.
    */
  def entityIdPage(q: Query, live: DataFrame): (DataFrame, Seq[Column]) = {
    val matched = compile(q, live)
    val ids = matched.select("entity_id").distinct()
    // one sort key per order prop (min value per entity, reference O5);
    // all keys come out of ONE aggregation pass, not one scan per prop
    val sortCols: Seq[Column] =
      q.orderByProps.zipWithIndex.map { case ((_, desc), i) =>
        if (desc) col(s"__key$i").desc_nulls_last else col(s"__key$i").asc_nulls_last
      } :+ col("entity_id")
    val keyed =
      if (q.orderByProps.isEmpty) ids
      else {
        val keyAggs = q.orderByProps.zipWithIndex.map { case ((prop, _), i) =>
          min(when(col("prop") === prop, col("value"))).as(s"__key$i")
        }
        val keys = matched.groupBy("entity_id").agg(keyAggs.head, keyAggs.tail: _*)
        ids.join(keys, Seq("entity_id"), "left_outer")
      }
    val ordered = keyed.orderBy(sortCols: _*)
    // slice: limit first (distributed top-k), then drop the offset prefix.
    val sliced = q.limit match {
      case Some(n) =>
        // Int-safe bound: wire callers are capped (Rql.MaxWireOffset /
        // MaxWireLimit) but the programmatic Query API is uncapped, and
        // `offset + n` wrapping negative would crash in Spark analysis
        val bound = q.offset.toLong + n.toLong
        require(bound <= Int.MaxValue,
          s"offset (${q.offset}) + limit ($n) = $bound exceeds Int.MaxValue — " +
            "page with a keyset cursor instead")
        ordered.limit(bound.toInt)
      case None => ordered
    }
    val out =
      if (q.offset <= 0) sliced
      else q.limit match {
        case Some(_) =>
          // bounded drop: `sliced` is already the distributed
          // top-(offset+n) — ≤ offset+n rows by construction — so this
          // single-partition window is bounded the same way as the
          // whitelisted registry sites. No registry query takes this
          // branch, so it is sanctioned by its own dedicated lint
          // (PlanLintSpec "offset+limit page") that builds the plan
          // here and asserts the window's input IS a top-k head; it
          // reuses the one top-k scan instead of re-scanning the match
          // set for a second head
          sliced
            .withColumn("__rn", row_number().over(
              org.apache.spark.sql.expressions.Window.orderBy(sortCols: _*)))
            .filter(col("__rn") > q.offset)
            .drop("__rn")
        case None =>
          // open-ended slice (ftmq's legal `[100:]`): the drop set is
          // exactly the global top-`offset` rows, and the sort order is
          // STRICT (entity_id — unique per row — is the final key), so
          // that head is a uniquely-determined id set: an anti-join
          // against it equals a row_number drop. The round-≤12 window
          // form here pulled the WHOLE ordered match set through ONE
          // partition — the exact shape the reference's global path
          // exists to avoid (storage/parquet.py:197-219). Both sides
          // stay distributed: the head is a top-k (TakeOrdered,
          // ≤ offset rows), the drop a shuffle anti-join AQE converts
          // to broadcast when the head is small. Cost: a second top-k
          // pass over the match set — at scale, two scans beat one
          // single-partition global sort by orders of magnitude.
          val head = ordered.limit(q.offset).select("entity_id")
          sliced.join(head, Seq("entity_id"), "left_anti")
      }
    (out, sortCols)
  }
}
