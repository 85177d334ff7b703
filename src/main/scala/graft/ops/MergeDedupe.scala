package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's core operator: two-branch merge dedupe (SURVEY.md §2.4
  * A1; reference semantics in ftm_lakehouse/logic/parquet.py:72-162 and
  * docs/architecture.md:106-117).
  *
  * Rows are routed on `fragment = ''` vs `fragment != ''` BEFORE any window:
  *
  *  - Non-fragment branch: exactly one survivor per
  *    `(shard, bucket, origin, id)` — the row with the greatest
  *    `last_seen` (ties broken by `deleted_at` DESC NULLS LAST). Because
  *    statement ids are content hashes, this collapses re-imports of the
  *    same fact.
  *
  *  - Fragment branch: per supersession group
  *    `(shard, bucket, origin, entity_id, prop, fragment)` only rows tied
  *    at the group-max `last_seen` survive (a fresh fragment emission
  *    supersedes ALL older values of the prop, but multi-valued props
  *    emitted together all survive), AND within each id one row survives.
  *
  * Both branches fold `first_seen` to the group minimum computed over the
  * pre-filter window — dropped duplicates still contribute their
  * `first_seen`, so re-imports never look new. The result is idempotent:
  * `dedupe(dedupe(df)) == dedupe(df)`.
  *
  * Execution shape: ONE scan, ONE exchange, window functions in a single
  * sort pass per branch. This is a MEASURED choice between two forms:
  *
  *  - The window form (this code). Its group-stats windows partition by
  *    the supersession-group key, so a pathological hot
  *    (entity, prop, fragment) group sorts through one task. The
  *    reference's own per-entity envelope bounds that group: a
  *    pages-bucket mega-entity carries one statement per PAGE under
  *    DISTINCT fragments (docs/architecture.md:99, logic/parquet.py:253),
  *    so a million-row single-(prop, fragment) group requires a single
  *    fragment emitting a million values for one prop — outside the
  *    reference's write envelope. tools/SkewStress measures the cost
  *    when it IS violated: ~4× on a synthetic 4M-row single group.
  *
  *  - The aggregation form (kept in tools/SkewStress as
  *    `canonicalizeAggForm`, proved row-equal in SkewStressSpec): per-id
  *    `min_by` + group-stats aggregation + tie-keep join. Skew-safe
  *    (declarative aggs collapse map-side), but its diamond over the
  *    full-width scan costs a second scan + extra exchanges on EVERY
  *    merge: measured 1.5-3.6× slower across the store lifecycle
  *    queries at bench ×10 (s3 3.6×, cdf1 2.6×, a3 1.7×, a1 1.5×) on
  *    realistic non-skewed data — the common case.
  *
  * Paying 1.5-3.6× on every real merge to insure against a shape the
  * data model already bounds is the wrong trade; the window form is
  * production, the aggregation form stays as the documented fallback for
  * stores that violate the envelope.
  */
object MergeDedupe {

  private val grain = Seq("shard", "bucket", "origin")

  // Recency order plus enough tiebreaks that row_number is deterministic
  // even when two physical rows share an id and timestamps but differ in a
  // non-key column (lang / original_value are outside the id recipe).
  private def byRecency: Seq[Column] =
    Seq(col("last_seen").desc, col("deleted_at").desc_nulls_last,
      col("value"), col("lang").asc_nulls_first,
      col("original_value").asc_nulls_first)

  /** A1 canonicalization without the tombstone filter: returns the merged
    * physical rows (tombstones included) so callers choose the liveness
    * predicate (read-time vs merge-with-grace).
    */
  def canonicalize(df: DataFrame): DataFrame = {
    // Non-fragment branch: group key is (grain, id) — the id is a content
    // hash, so this group is the re-import multiplicity of one identical
    // fact (bounded operationally, see class doc). min(first_seen) shares
    // the row_number's partitioning, so both ride ONE shuffle and the
    // window stays the right tool here.
    val nonFragKeys = (grain :+ "id").map(col)
    val wNfOrd = Window.partitionBy(nonFragKeys: _*).orderBy(byRecency: _*)
    val wNf = Window.partitionBy(nonFragKeys: _*)
    val nonFrag = df.filter(col("fragment") === "")
      .withColumn("__rn", row_number().over(wNfOrd))
      .withColumn("__min_fs", min(col("first_seen")).over(wNf))
      .filter(col("__rn") === 1)

    // Fragment branch: one sort pass computes the supersession-group
    // stats (max last_seen, min first_seen over PRE-filter rows — dropped
    // duplicates still witness first_seen) and the per-id survivor rank.
    // Both windows share the clustering the merge driver already
    // provides, so the whole branch is one scan + one exchange — see the
    // class doc for the measured choice of this form over the skew-safe
    // aggregation form (tools/SkewStress.canonicalizeAggForm).
    val fragKeys = (grain ++ Seq("entity_id", "prop", "fragment")).map(col)
    val idKeys = fragKeys :+ col("id")
    val wGroup = Window.partitionBy(fragKeys: _*)
    val wIdOrd = Window.partitionBy(idKeys: _*).orderBy(byRecency: _*)
    val frag = df.filter(col("fragment") =!= "")
      .withColumn("__max_ls", max(col("last_seen")).over(wGroup))
      .withColumn("__min_fs", min(col("first_seen")).over(wGroup))
      .withColumn("__rn", row_number().over(wIdOrd))
      .filter(col("last_seen") === col("__max_ls") && col("__rn") === 1)
      .drop("__max_ls")

    nonFrag.unionByName(frag)
      .drop("__rn")
      .withColumn("first_seen", col("__min_fs"))
      .drop("__min_fs")
  }

  /** Live read view: canonicalized rows minus tombstones (deleted_at set). */
  def live(df: DataFrame): DataFrame =
    canonicalize(df).filter(col("deleted_at").isNull)

  /** Merge-with-grace: tombstones younger than `graceCutoff` are kept as
    * physical rows so they keep shadowing any late-arriving live duplicates
    * until reaped (reference ST4, logic/parquet.py:92-97).
    */
  def withGrace(df: DataFrame, graceCutoff: Column): DataFrame =
    canonicalize(df)
      .filter(col("deleted_at").isNull || col("deleted_at") > graceCutoff)

  /** A3: read-time canonicalization of only the entities changed since a
    * watermark — diffs match a post-merge read without rewriting anything.
    * The changed-id scope is a semi-join (never a giant IN literal). No
    * broadcast hint: the changed-id set is unbounded — after a bulk
    * re-import EVERY entity is "changed" — so the plan must degrade to a
    * shuffle join; AQE promotes it to broadcast at runtime when the side
    * is actually small.
    */
  def changedCanonical(raw: DataFrame, watermark: Column): DataFrame = {
    val changedIds = raw
      .filter(col("first_seen") >= watermark || col("deleted_at") >= watermark)
      .select("entity_id").distinct()
    live(raw.join(changedIds, Seq("entity_id"), "left_semi"))
  }
}
