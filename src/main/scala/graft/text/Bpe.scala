package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over tokenized documents (Sennrich
  * et al. 2016 — the vocabulary-induction loop under BPE/WordPiece
  * tokenizers): each round finds the globally most frequent ADJACENT
  * token pair and merges its non-overlapping occurrences greedily left
  * to right, producing the next round's token stream. The learned merge
  * list IS the tokenizer vocabulary.
  *
  * Determinism: the winning pair tie-breaks on (count desc, a, b); the
  * greedy scan is defined positionally (below), so every round is a pure
  * function of the corpus — a SQL twin replays it bit for bit.
  *
  * Greedy-without-a-scan: a merge consumes its right token, so among
  * MATCH STARTS (positions i with (wᵢ,wᵢ₊₁) = pair) a start is taken
  * iff an ODD number of consecutive match starts immediately precede it
  * (itself included). Distinct-token pairs can't have adjacent starts —
  * every start is taken; equal-token runs ("aaaa") alternate. That turns
  * the inherently sequential tokenizer scan into three window
  * aggregates: cumulative match index (run id = pos − index is constant
  * within a run of consecutive starts, strictly increasing across runs),
  * in-run rank, parity test — NO joins, no per-doc UDF loop.
  *
  * Scale shape: every window partitions on doc_id with the same
  * ordering, so one exchange + one sort per round serves the lead,
  * run-id, rank, lag, and renumber steps (Spark reuses the child
  * ordering); the pair count is a map-side-combinable groupBy whose
  * top-1 is a TakeOrdered broadcast back. Docs bound window state (a
  * document's tokens, never the corpus). Each round's stream is staged:
  * round r+1 re-reads a columnar file, not a 5-window lineage.
  */
object Bpe {

  /** One merge round. `toks`: (doc_id, pos, w) with pos consecutive
    * from 1 per doc. Returns the merged stream (same shape, renumbered)
    * and a 1-row summary (a, b, n_pair) of the winning pair.
    *
    * Merged units join with `+`; a production tokenizer keeps the merge
    * PAIR list as the vocabulary artifact (token strings containing a
    * literal `+` would alias — use the pair list, not string surgery,
    * to interpret merged units).
    */
  def mergeRound(toks: DataFrame): (DataFrame, DataFrame) = {
    val top = topPair(toks)
    (applyMerge(toks, top), top)
  }

  /** The round's winning adjacent pair: 1 row (a, b, n_pair), tie-broken
    * (count desc, a, b); empty when the corpus has no adjacent pair.
    */
  def topPair(toks: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks.withColumn("__nx", lead(col("w"), 1).over(byDoc))
      .filter(col("__nx").isNotNull)
      .groupBy(col("w").as("a"), col("__nx").as("b"))
      .agg(count(lit(1)).as("n_pair"))
      .orderBy(col("n_pair").desc, col("a"), col("b")).limit(1)
  }

  /** Greedily merge occurrences of the (1-row) winning pair `top` —
    * split from the pair count so a caller can STAGE the winner once
    * and reuse it (tok2 reads it again for its summary report; without
    * staging, the full pair aggregation re-runs in every consumer).
    */
  def applyMerge(toks: DataFrame, top: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val cum = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withNext = toks.withColumn("__nx", lead(col("w"), 1).over(byDoc))
    // LEFT broadcast join, not crossJoin: when the corpus has no adjacent
    // pair at all, `top` is empty and a crossJoin would silently drop
    // every token — a left join keeps the stream intact (and hash-joins
    // on the pair key instead of nested-looping)
    val flagged = withNext.join(broadcast(top),
        col("w") === col("a") && col("__nx") === col("b"), "left")
      .withColumn("__m", col("a").isNotNull)
      .withColumn("__run",
        col("pos") - sum(when(col("__m"), 1L).otherwise(0L)).over(cum))
    val runCum = Window.partitionBy(col("doc_id"), col("__run"))
      .orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val selected = flagged
      .withColumn("__rr", sum(when(col("__m"), 1L).otherwise(0L)).over(runCum))
      .withColumn("__sel", col("__m") && col("__rr") % 2 === 1)
      .withColumn("__consumed",
        coalesce(lag(col("__sel"), 1).over(byDoc), lit(false)))
    selected.filter(!col("__consumed"))
      .select(col("doc_id"),
        row_number().over(byDoc).as("pos"),
        when(col("__sel"), concat_ws("+", col("w"), col("__nx")))
          .otherwise(col("w")).as("w"))
  }
}
