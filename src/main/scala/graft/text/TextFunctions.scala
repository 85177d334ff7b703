package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, token statistics, quality scoring, language-ID heuristic,
  * document fingerprinting. All pure `functions._` column expressions —
  * codegen'd, no UDFs, fully pushdown/AQE friendly, and each one has an
  * exact DuckDB-SQL twin for the oracle harness.
  */
object TextFunctions {

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Distinct n-word shingles (default 3): the discriminative term set for
    * MinHash/Jaccard near-dup detection. Short texts (< n tokens) yield a
    * single shingle covering the whole text.
    *
    * SHORT-DOC SEMANTICS DIFFER from [[graft.dedupe.Dedupe.shingleRows]],
    * deliberately: this columnar form pads a short doc to one whole-text
    * shingle (so exact short duplicates still collide), while the
    * row-grain `shingleRows` yields NO rows for it (short docs carry no
    * near-dup signal and stay out of the LSH candidate space). Signatures
    * and verification for one pipeline must be built through the SAME
    * entry point — mixing them silently drops short docs from one side
    * of the candidate join.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** BPE-ish subword count: alpha runs, digit runs, and single other chars.
    * A cheap proxy for LLM token budgeting at corpus scale.
    */
  // case-insensitive letter runs: fingerprint() lowercases because
  // mixed-case input is expected, so counting every CAPITAL as a
  // separate "other" char would misread ordinary prose as markup
  val SubwordPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def subwordCount(text: Column): Column = regexp_count(text, lit(SubwordPattern))

  /** Punctuation ratio: non-alnum non-space chars over all chars. High
    * values flag markup/noise documents.
    */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[^a-zA-Z0-9 ]")).cast("double") / length(text).cast("double")

  /** Tiny English stopword list for the density heuristic — natural prose
    * sits in a mid band; keyword-stuffed or non-linguistic text falls out
    * of it.
    */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as")

  def stopwordRatio(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(Stopwords))).cast("double") /
      tokenCount(text).cast("double")

  /** Normalized-text fingerprint: lowercase, collapse whitespace, trim,
    * md5. Two documents differing only in case/spacing collide.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Rolling-hash fingerprint sketch: polynomial hash over each word
    * trigram window (Rabin-Karp shape, base 64 over md5-derived token
    * hashes, mod a prime), then the min-`k` distinct window hashes as
    * the document's sketch. Two documents sharing long runs share window
    * hashes, so sketch overlap survives edits far from the runs — the
    * fuzzy-matching property the flat md5 fingerprint lacks. Built on
    * the same shuffle-first positional window as shingling.
    */
  def rollingFingerprint(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 8): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val P = 1000003L
    val toks = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("__pos", "__w")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val h0 = graft.dedupe.Dedupe.tokenHash(col("__w"))
    val h1 = graft.dedupe.Dedupe.tokenHash(lead(col("__w"), 1).over(w))
    val h2 = graft.dedupe.Dedupe.tokenHash(lead(col("__w"), 2).over(w))
    val sketches = toks
      .withColumn("__roll", (h0 * 4096L + h1 * 64L + h2) % P)
      .filter(col("__roll").isNotNull)
      .groupBy(col(idCol))
      .agg(array_join(transform(
        slice(sort_array(collect_set(col("__roll"))), 1, k),
        _.cast("string")), ",").as("sketch"))
    // EVERY document gets a sketch row: a doc under 3 tokens has no
    // trigram window, and silently emitting nothing would drop it from
    // any inner-joined fuzzy-match coverage — it carries the EMPTY
    // sketch instead (overlaps with nothing, present in the table)
    docs.select(col(idCol)).distinct()
      .join(sketches, Seq(idCol), "left_outer")
      .na.fill("", Seq("sketch"))
  }

  /** Type-token ratio — low values flag boilerplate/repetition. */
  def typeTokenRatio(text: Column): Column =
    distinctTokenCount(text).cast("double") / tokenCount(text).cast("double")

  /** Mean token length: non-space chars over tokens. */
  def meanTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - lit(1))).cast("double") /
      tokenCount(text).cast("double")

  /** Composite quality score in [0,1]: lexical diversity + length credit.
    * Deterministic double arithmetic (single divisions, least(), no
    * accumulation order dependence).
    */
  def qualityScore(text: Column): Column =
    lit(0.5) * typeTokenRatio(text) +
      lit(0.5) * least(lit(1.0), tokenCount(text).cast("double") / lit(100.0))

  /** Hashed-feature linear classifier score (the fastText-style quality
    * filter shape): each token maps to one of `dim` feature buckets via
    * the md5-prefix token hash, each bucket carries a fixed INTEGER
    * weight derived from the bucket index (Knuth multiplicative mix mod
    * a prime, centered), and the document score is the mean bucket
    * weight over its tokens. Swapping the derived weights for a trained
    * vector (broadcast lookup or a `dim`-entry CASE) keeps the identical
    * plan shape.
    *
    * Scale shape: a stateless per-row projection — `aggregate` over the
    * token array, zero shuffles, whole-stage codegen. This is the form
    * a learned quality classifier takes at 100 TB: no feature
    * materialization, no join, just a fused scan.
    *
    * Integer weights are the float-parity trick: per-token contributions
    * sum EXACTLY (order-free), so Spark's left-to-right array fold and
    * any other engine's sum agree bit-for-bit; the only float op is one
    * final division.
    */
  def hashedLinearScore(text: Column, dim: Int = 4096): Column = {
    val toks = tokens(text)
    val total = aggregate(toks, lit(0L), (acc, w) => {
      val bucket = pmod(graft.dedupe.Dedupe.tokenHash(w), lit(dim.toLong))
      acc + ((bucket * lit(2654435761L) + lit(12345L)) % lit(1000003L) - lit(500001L))
    })
    total.cast("double") / (lit(1000003.0) * size(toks).cast("double"))
  }

  /** Marker-token hit count: how many of `markers` occur in the text's
    * token set.
    */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(text)),
      array(markers.map(lit): _*)))

  /** Language-ID heuristic: argmax of per-language marker-token hits with
    * a fixed preference order on ties; 'und' when nothing matches. The
    * marker lists are data, not code — swap in real stopword profiles for
    * natural corpora.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and", "fast", "slow"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "es", "y"),
    "fr" -> Seq("le", "la", "les", "est", "et"),
    "zh" -> Seq("的", "是", "在"))

  def langId(text: Column): Column = {
    val scored = langMarkers.map { case (l, m) => (l, markerHits(text, m)) }
    // fold in preference order: later candidates must strictly beat the
    // incumbent, so ties resolve to the earlier language.
    val (bestLang, _) = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((accLang, accScore), (l, s)) =>
        (when(s > accScore, lit(l)).otherwise(accLang),
          when(s > accScore, s).otherwise(accScore))
    }
    val maxScore = scored.map(_._2).reduce((a, b) => greatest(a, b))
    when(maxScore === 0, "und").otherwise(bestLang)
  }
}
