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
  * Execution shape: the non-fragment branch keeps its windows — their
  * partition key INCLUDES the statement id, so group size is the
  * physical-duplicate multiplicity of one identical fact (bounded by
  * appends-since-last-compaction; every merge collapses it back to 1 —
  * an operational constant, never data scale). The FRAGMENT branch has
  * no window at all: the reference's data model makes mega-groups
  * routine (bucket=pages puts one statement per page on one entity —
  * docs/architecture.md:99, logic/parquet.py:253), and a window
  * partitioned by the supersession-group key would funnel a hot
  * (entity, prop, fragment) group through ONE task's sort. Instead the
  * per-id pick is a `min_by` over a recency sort key (a declarative
  * aggregate — hot groups collapse map-side before the shuffle), group
  * stats are a second tiny aggregation over the per-id survivors, and
  * the tie-keep joins back on the group key (AQE broadcasts the group
  * table when small, skew-splits the join otherwise). No driver-side
  * state; scales with executor count.
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

    // Fragment branch: NO window anywhere — a hot (entity,prop,fragment)
    // group (1M values emitted under one fragment) would sort through one
    // task. Instead:
    //  1. per-id survivor pick as min_by over a recency SORT KEY — a
    //     declarative aggregate, so the hot group collapses map-side to
    //     one partial per input partition before the 7-key shuffle (the
    //     shuffle carries ~distinct ids, not raw duplicates);
    //  2. supersession-group stats as a separate aggregation STRAIGHT
    //     OFF the raw fragment rows (not off step 1's output — that
    //     subtree is consumed with different column prunings, so Spark
    //     would compute the heavy min_by twice instead of reusing the
    //     exchange): a pruned 8-column scan + map-combined max/min;
    //  3. tie-keep as a join back on the 6-part group key (AQE
    //     broadcasts the group table when small, skew-splits otherwise).
    // Dropped duplicates still contribute first_seen: step 2 reads the
    // PRE-filter rows, so its group min sees every physical row.
    val fragKeyNames = Seq("shard", "bucket", "origin", "entity_id", "prop", "fragment")
    val fragRows = df.filter(col("fragment") =!= "")
    // byRecency as ONE min-orderable struct (lexicographic field order =
    // the tiebreak order): timestamps negate for DESC, with null mapped
    // to Long.MaxValue because plain `.desc` is desc_NULLS_LAST — a bare
    // -unix_micros(null) would stay null and struct ordering sorts null
    // fields FIRST, silently inverting the window form for null
    // timestamps; string fields are ASC with nulls first, which IS
    // struct ordering's null semantics (proved equal to the window form
    // on randomized colliding input in SkewStressSpec, including null
    // last_seen and null-tiebreak collisions).
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

    nonFrag.drop("__rn").unionByName(frag)
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
