package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedupe.Dedupe

/** Distributed frequency/cardinality/membership sketches for corpus
  * statistics at training-data scale — the estimators a 100 TB pipeline
  * runs where exact global aggregation is too expensive, built so that
  * every estimate is EXACT integer arithmetic over `Dedupe.tokenHash`
  * (md5-prefix, 32-bit): a SQL oracle replays the same bits, so the
  * approximation itself is deterministic and hash-checkable.
  *
  * The reference stops at statement-lake statistics (`logic/dataset.py`
  * stats aggregation); these are the corpus-scale estimators layered on
  * the same lake for LLM-data curation decisions (vocabulary sizing,
  * heavy-hitter stop lists, benchmark-membership screens).
  *
  * Hash family: g_i(h) = ((a_i·h + b_i) mod P) mod width, P = 4294967311
  * (prime > 2^32, covering the tokenHash domain — a smaller modulus would
  * collide h with h+P for every (a_i, b_i)), h = tokenHash ∈ [0, 2^32).
  * All products stay below 2^63 — no overflow, no floating point anywhere.
  *
  * Scale shapes:
  *   - count-min: the sketch IS the aggregate — depth×width rows
  *     (constant, ~4k) out of a map-side-combinable groupBy; lookups
  *     broadcast the sketch.
  *   - KMV: per-group k-smallest distinct hashes via the same salted
  *     two-stage build as [[graft.text.Search.postings]] — hot groups
  *     never concentrate on one task.
  *   - Bloom: the bit table is bounded by `m` (constant) — broadcast to
  *     the probe scan; the probe side is one pass, no shuffle of the
  *     corpus.
  */
object Sketches {

  /** Prime > 2^32 — modulus of the universal-hash family. Must exceed
    * the 32-bit tokenHash domain: with a modulus smaller than the input
    * domain, h and h+P collide for every (a,b) and the family is not
    * pairwise-independent (same prime as [[graft.dedupe.Dedupe.P]]).
    * 64-bit-safe: max operand a·h ≈ 8191·2^32 < 2^63.
    */
  val P = 4294967311L

  private def gHash(h: Column, a: Long, b: Long, width: Long): Column =
    pmod(pmod(h * lit(a) + lit(b), lit(P)), lit(width))

  // fixed hash-row constants: the sketch layout is part of the operator
  // contract (the oracle replays them), so they are named, not seeded
  val CmsA = Seq(31L, 131L, 1031L, 8191L)
  val CmsB = Seq(7L, 17L, 29L, 43L)
  val BloomA = Seq(31L, 131L, 1031L)
  val BloomB = Seq(7L, 17L, 29L)

  /** Count-min sketch from a pre-aggregated (term, count) table: the
    * depth×width cell counts. Building from term FREQUENCIES rather than
    * raw occurrences is the distributed form — the heavy shuffle is the
    * upstream term count (map-side combinable), after which the sketch
    * build explodes only |vocabulary| rows and aggregates to a CONSTANT
    * depth·width cells.
    */
  /** The depth cells (row, bucket) a term hashes to — the shared
    * expansion of batch build, streaming build, and lookup. */
  def cmsCells(term: Column, width: Int = 1024): Column =
    cmsCellsFromHash(Dedupe.tokenHash(term), width)

  /** [[cmsCells]] from an already-computed term hash — callers that
    * pre-aggregate by the hash (grouping by `tokenHash(term)` is
    * cell-equivalent to grouping by the term, since the cells are a pure
    * function of the hash) skip re-hashing per row.
    */
  def cmsCellsFromHash(h: Column, width: Int = 1024): Column =
    array(CmsA.zip(CmsB).zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row"), gHash(h, a, b, width.toLong).as("bucket"))
    }: _*)

  def countMinFromCounts(termCounts: DataFrame, termCol: String,
      countCol: String, width: Int = 1024): DataFrame =
    termCounts
      .select(col(countCol).as("__n"),
        explode(cmsCells(col(termCol), width)).as("__rb"))
      .groupBy(col("__rb.row").as("row"), col("__rb.bucket").as("bucket"))
      .agg(sum(col("__n")).as("n"))

  /** Point estimates for probe terms: min over the sketch's depth rows —
    * the classic CMS upper bound (estimate ≥ true count, never under).
    * The sketch is depth×width rows (constant) → explicit broadcast is
    * provably bounded, unlike data-sized build sides.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, termCol: String,
      width: Int = 1024): DataFrame = {
    probes
      .select(col(termCol), explode(cmsCells(col(termCol), width)).as("__rb"))
      .select(col(termCol), col("__rb.row").as("row"), col("__rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left_outer")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per group, alongside
    * the exact distinct count for calibration: estimate =
    * (k−1)·2^32 div m_k where m_k is the k-th smallest DISTINCT hash;
    * groups with fewer than k distinct hashes report that exact hash
    * count (the sketch holds the whole set). Truncating integer division
    * — the oracle replays it bit-for-bit. Estimates cardinality of the
    * HASH set (term-collision error ≤ |V|²/2^33 — negligible and, being
    * deterministic, identical on both sides).
    *
    * Salted two-stage k-smallest (same shape as `Search.postings`): the
    * salt partitions each group's distinct-hash space `salts` ways, each
    * salted cell keeps its own k smallest (bounded state), and the
    * group-grain merge sees ≤ salts·k pre-capped values — a hot group
    * (every doc in one source) never concentrates its distinct set on a
    * single task.
    */
  def kmvDistinct(items: DataFrame, groupCol: String, itemCol: String,
      k: Int = 64, salts: Int = 16): DataFrame = {
    require(k > 0 && salts > 0, s"k/salts must be positive: $k/$salts")
    val M = 4294967296L // 2^32 — tokenHash range
    // staged: the distinct table feeds BOTH the exact count and the
    // sketch build — unstaged, the corpus-wide distinct shuffle runs
    // twice (the exact side exists for calibration; a pure-sketch
    // production run drops it and the staging with it)
    val dt = graft.functions.F.materialize(
      items.select(col(groupCol), col(itemCol)).distinct())
    val exact = dt.groupBy(col(groupCol)).agg(count(lit(1)).as("n_exact"))
    val withH = dt.withColumn("__h", Dedupe.tokenHash(col(itemCol)))
    val partial = withH
      .groupBy(col(groupCol), pmod(col("__h"), lit(salts.toLong)).as("__salt"))
      .agg(collect_set(col("__h")).as("__hs"))
      // salt cells partition the hash space: partial distinct counts ADD,
      // and the global k smallest are among each cell's k smallest
      .select(col(groupCol), size(col("__hs")).cast("long").as("__pc"),
        slice(sort_array(col("__hs")), 1, k).as("__pl"))
    val kth = partial.groupBy(col(groupCol))
      .agg(sum(col("__pc")).as("__nh"),
        slice(sort_array(flatten(collect_list(col("__pl")))), 1, k).as("__ks"))
      .select(col(groupCol), col("__nh"),
        element_at(col("__ks"),
          greatest(least(col("__nh"), lit(k.toLong)), lit(1L)).cast("int")).as("__mk"))
    exact.join(kth, Seq(groupCol))
      .withColumn("kmv_est",
        when(col("__nh") < k, col("__nh"))
          .otherwise(expr(s"${(k - 1).toLong * M}L div greatest(__mk, 1L)")))
      .select(col(groupCol), col("n_exact"), col("kmv_est"))
  }

  /** Bloom bit-position table for a build-side item set: the DISTINCT
    * g_j positions over [[BloomA]]/[[BloomB]], j = 3 hash functions over
    * an m-bit space. Output is bounded by m rows regardless of input
    * size — the broadcastable screen a 100 TB probe scans against.
    */
  def bloomBits(items: DataFrame, itemCol: String, m: Int = 65536): DataFrame = {
    val h = Dedupe.tokenHash(col(itemCol))
    val ps = BloomA.zip(BloomB).map { case (a, b) => gHash(h, a, b, m.toLong) }
    items.select(explode(array(ps: _*)).as("pos")).distinct()
  }

  /** The bloom bit table as a driver-side bitmask: m bits packed into
    * m/64 longs (8 KB at the default m=65536). The collect is BOUNDED BY
    * CONSTRUCTION — each scan partition returns ONE m/8-byte partial
    * mask regardless of the build corpus size — the same class of driver
    * materialization as the nlist-bounded centroid broadcasts, and the
    * price of turning the screen into a literal the probe SCAN evaluates
    * (see [[bloomScreen]]) instead of a join it shuffles toward.
    */
  def bloomMask(items: DataFrame, itemCol: String, m: Int = 65536): Array[Long] = {
    require(m % 64 == 0, s"m must pack into longs: $m")
    val spark = items.sparkSession
    import spark.implicits._
    val words = m / 64
    // shuffle-FREE build: each partition folds its items' positions into
    // a partial mask (bit-set is idempotent — no distinct needed, dup
    // items just re-set the same bits) and the driver ORs the partials.
    // One scan stage, numPartitions × m/8-byte rows collected — the only
    // mapPartitions in the sketch family, and it earns its exit from
    // codegen by deleting the explode+distinct exchange entirely.
    val h = Dedupe.tokenHash(col(itemCol))
    val ps = BloomA.zip(BloomB).map { case (a, b) => gHash(h, a, b, m.toLong) }
    // null items carry no positions (a null never "is in" the filter —
    // matching the join probe, where null positions just miss)
    val partials = items.filter(col(itemCol).isNotNull)
      .select(explode(array(ps: _*)).as("pos")).as[Long]
      .mapPartitions { it =>
        val w = new Array[Long](words)
        it.foreach(p => w((p >>> 6).toInt) |= 1L << (p & 63))
        Iterator.single(w)
      }.collect()
    val mask = new Array[Long](words)
    partials.foreach(w => (0 until words).foreach(i => mask(i) |= w(i)))
    mask
  }

  /** Scan-side bloom membership screen — the 100 TB shape: the ≤ 8 KB
    * [[bloomMask]] rides into the plan as a reference object of the
    * fused [[graft.functions.BloomMaskHit]] expression — one digest, all
    * three g_j probes, and the primitive bit tests in a single codegen'd
    * call. No join, no shuffle, no broadcast exchange: the screen
    * evaluates inside the probe scan's WholeStageCodegen span, so rows
    * failing it never leave the scan stage. Hit arithmetic is identical
    * to [[bloomProbe]] (same positions, same one-sided semantics, same
    * deterministic false positives), so oracles replaying the position
    * math are unchanged.
    */
  def bloomScreen(probe: DataFrame, itemCol: String, mask: Array[Long],
      m: Int = 65536): DataFrame = {
    require(mask.length == m / 64, s"mask/${m}-bit mismatch: ${mask.length}")
    // coalesce: a null item is a miss (0), exactly like the join form's
    // null-position lookup — not a null flag
    probe.withColumn("bloom_hit",
      coalesce(
        graft.functions.BloomMaskHit(
          Dedupe.tokenHash(col(itemCol)), mask, BloomA, BloomB, m.toLong)
          .cast("long"),
        lit(0L)))
  }

  /** Probe items against a bloom bit table: an item "hits" iff ALL its
    * positions are set — the standard one-sided test (no false negatives;
    * false positives at the classic (1−e^{−kn/m})^k rate, and
    * deterministic, so the oracle twin reports the same hits). The bit
    * table is ≤ m rows → provably-bounded broadcast; the probe side is a
    * single pass with three broadcast-hash lookups, never a shuffle of
    * the probe corpus. Prefer [[bloomScreen]] where an action is
    * acceptable at plan-build time — it keeps the screen inside the scan;
    * this join form exists for fully-lazy pipelines.
    */
  def bloomProbe(probe: DataFrame, itemCol: String, bits: DataFrame,
      m: Int = 65536): DataFrame = {
    val h = Dedupe.tokenHash(col(itemCol))
    val ps = BloomA.zip(BloomB).map { case (a, b) => gHash(h, a, b, m.toLong) }
    val withP = probe.withColumns(Map(
      "__p0" -> ps(0), "__p1" -> ps(1), "__p2" -> ps(2)))
    val flagged = Seq(0, 1, 2).foldLeft(withP) { (df, j) =>
      df.join(
        broadcast(bits.select(col("pos").as(s"__p$j"), lit(1L).as(s"__b$j"))),
        Seq(s"__p$j"), "left_outer")
    }
    flagged
      .withColumn("bloom_hit",
        (col("__b0").isNotNull && col("__b1").isNotNull && col("__b2").isNotNull)
          .cast("long"))
      .drop("__p0", "__p1", "__p2", "__b0", "__b1", "__b2")
  }

  /** HyperLogLog distinct-count estimate per group (Flajolet et al. 2007),
    * fixed m = 64 registers (b = 6 index bits over the 32-bit tokenHash):
    * register j keeps the max rank (leading-zero count + 1) of the
    * remaining 26 hash bits, and the raw estimator is
    * α·m²/Σⱼ2^(−Mⱼ) with α₆₄ ≈ 0.709.
    *
    * Every step is integer arithmetic: rank comes from the bit length of
    * the 26-bit suffix (`bin()` string length — no FP log), and the
    * estimate multiplies through by 2^27 so the denominator
    * Σⱼ2^(27−Mⱼ) ≤ 64·2^27 stays an exact BIGINT; α is the rational
    * 709/1000. The oracle replays identical bits. The raw estimator is
    * reported without the small-range linear-counting correction (which
    * needs ln) — the calibration query pairs it with the exact count, and
    * the sketch's production regime (n ≫ 2.5·m) is exactly where raw is
    * the published estimator.
    *
    * Scale shape: the register table IS the aggregate — the groupBy is
    * map-side-combinable down to ≤ m rows per group, mergeable across
    * corpus shards by register-wise max (same merge law a count-min uses
    * cell-wise sum). The m-row grid join keeps empty registers in the
    * denominator without densifying anything upstream.
    */
  private val HllM = 64
  private val HllSuffixBits = 26 // 32 - log2(m)

  /** The per-group register table (group, __idx, __mj) — max rank per
    * register, dup-insensitive (max of a multiset ignores repeats), so
    * the SAME aggregation serves the batch build, the streaming build
    * (Complete-mode stateful max over constant group×m state — no
    * `distinct` needed before a streaming sink, which is what makes HLL
    * the streaming cardinality sketch), and cross-shard merging.
    */
  def hllRegisters(items: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val h = Dedupe.tokenHash(col(itemCol))
    items
      .select(col(groupCol), h.as("__h"))
      .withColumn("__idx", shiftright(col("__h"), HllSuffixBits))
      .withColumn("__w", col("__h").bitwiseAND(lit((1L << HllSuffixBits) - 1)))
      // rank ρ(w) = leading zeros in the 26-bit suffix + 1
      //           = 27 − bit_length(w), with ρ(0) = 27
      .withColumn("__rho", lit(HllSuffixBits + 1) -
        when(col("__w") === 0, lit(0)).otherwise(length(bin(col("__w")))))
      .groupBy(col(groupCol), col("__idx"))
      .agg(max(col("__rho")).as("__mj"))
  }

  /** Finish a register table into (group, hll_est). */
  def hllEstimateFromRegisters(regs: DataFrame, groupCol: String): DataFrame = {
    // all m registers per group: an empty register contributes 2^27 (ρ=0)
    val grid = regs.select(col(groupCol)).distinct()
      .select(col(groupCol), explode(sequence(lit(0L), lit(HllM - 1L))).as("__idx"))
    grid.join(regs.select(col(groupCol), col("__idx"), col("__mj")),
        Seq(groupCol, "__idx"), "left_outer")
      .withColumn("__t",
        expr(s"shiftleft(cast(1 as bigint), ${HllSuffixBits + 1} - coalesce(__mj, 0L))"))
      .groupBy(col(groupCol)).agg(sum(col("__t")).as("__s"))
      // α·m²·2^27 / Σ — exact integer numerator 709·64²·2^27 / 1000·Σ
      .withColumn("hll_est",
        expr(s"(709L * ${HllM.toLong * HllM} * ${1L << (HllSuffixBits + 1)}) div (1000L * __s)"))
      .select(col(groupCol), col("hll_est"))
  }

  def hllDistinct(items: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val dt = graft.functions.F.materialize(
      items.select(col(groupCol), col(itemCol)).distinct())
    val exact = dt.groupBy(col(groupCol)).agg(count(lit(1)).as("n_exact"))
    exact.join(
      hllEstimateFromRegisters(hllRegisters(dt, groupCol, itemCol), groupCol),
      Seq(groupCol))
  }
}
