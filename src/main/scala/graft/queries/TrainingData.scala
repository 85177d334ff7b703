package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedupe.Dedupe
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.text.TextFunctions

/** Training-data pipeline operators over the documents/embeddings tables:
  * text analysis, exact + near dedupe (MinHash/LSH, SimHash, Jaccard),
  * embedding similarity search (brute-force + bucketed ANN), multimodal
  * metadata plumbing. All hashes/scores are integer arithmetic or
  * single-step IEEE doubles, so every query is DuckDB-hash-checkable.
  */
object TrainingData {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  // positional token stream (doc_id, pos, w), session-staged: in
  // production the tokenized corpus is a maintained artifact refreshed
  // per ingest (the same precedent as the session-staged statement
  // table and graph edge lists), not something each tokenizer-training
  // round re-explodes from raw text
  private val stagedPosToks = new graft.functions.SessionScoped[String]
  private def posTokens(spark: SparkSession, dir: String): DataFrame = {
    val path = stagedPosToks.getOrCompute(spark, s"$dir#postoks") {
      val tmp = graft.functions.F.stageTempPath(spark, "pos-toks")
      docs(spark, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("__p", "w")))
        .select(col("doc_id"), (col("__p") + 1).as("pos"), col("w"))
        .write.mode("overwrite").parquet(tmp)
      tmp
    }
    spark.read.parquet(path)
  }
  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)

  // ---- text analysis ----

  def t1LangId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"), col("lang"),
      TextFunctions.langId(col("text")).as("predicted"),
      TextFunctions.markerHits(col("text"), TextFunctions.langMarkers.head._2).as("en_hits"))
      .orderBy(col("doc_id"))

  def t2Quality(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.distinctTokenCount(col("text")).as("n_distinct"),
      TextFunctions.typeTokenRatio(col("text")).as("ttr"),
      TextFunctions.punctRatio(col("text")).as("punct_ratio"),
      TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
      TextFunctions.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  def t3Tokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars_measured"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.subwordCount(col("text")).as("n_subwords"))
      .orderBy(col("doc_id"))

  def t4Fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  // The min-8 sketch is a session-staged artifact (same precedent as the
  // shingle tables): a production pipeline computes it once and feeds
  // fingerprint export AND decontamination from the staged table.
  private def docSketch(spark: SparkSession, dir: String): DataFrame =
    stagedTermTable(spark, dir, "sketch8") {
      TextFunctions.rollingFingerprint(docs(spark, dir), "doc_id", "text", k = 8)
    }

  def t5RollingFingerprint(spark: SparkSession, dir: String): DataFrame =
    docSketch(spark, dir).orderBy(col("doc_id"))

  // ---- dedupe ----

  private def prefixKey = md5(array_join(slice(split(col("text"), " "), 1, 5), " "))

  def d1ExactDup(spark: SparkSession, dir: String): DataFrame =
    Dedupe.exactDupGroups(docs(spark, dir), "doc_id", prefixKey)
      .orderBy(col("dup_key"))

  private val MinhashK = 8

  // The shingled/tokenized corpus is staged once per (session, sf-dir) and
  // read back by every signature/verification stage — the same precedent
  // as the session-staged statement table in StatementOps: a production
  // dedupe pipeline materializes the token artifact once (it feeds MinHash,
  // LSH, and Jaccard verification across the whole campaign), it never
  // re-explodes the corpus per consumer.
  // a plain synchronized memo, NOT ConcurrentHashMap.computeIfAbsent:
  // staged artifacts build on each other (jacpairs → minhash8 →
  // shingle3_multi), and computeIfAbsent forbids reentrant updates of the
  // same map (throws "Recursive update" when the nested key shares a bin).
  // The monitor is reentrant, so nested staging from the same thread works.
  private val stagedTerms =
    scala.collection.mutable.Map.empty[(SparkSession, String, String), DataFrame]

  private def stagedTermTable(spark: SparkSession, dir: String, kind: String)(
      mk: => DataFrame): DataFrame = stagedTerms.synchronized {
    stagedTerms.getOrElseUpdate((spark, dir, kind), graft.functions.F.materialize(mk))
  }

  // MinHash is duplicate-insensitive, so the signature path skips the
  // distinct shuffle; Jaccard verification (d4/d6) keeps distinct rows
  // (staged FROM the multi table — one extra exchange once per session,
  // never a re-explode).
  private def docShingleRowsMulti(spark: SparkSession, dir: String): DataFrame =
    stagedTermTable(spark, dir, "shingle3_multi") {
      Dedupe.shingleRows(docs(spark, dir), "doc_id", "text", 3, distinct = false)
    }

  private[queries] def docShingleRows(spark: SparkSession, dir: String): DataFrame =
    stagedTermTable(spark, dir, "shingle3") {
      docShingleRowsMulti(spark, dir).dropDuplicates("doc_id", "__tok")
    }

  private def docTokenRows(spark: SparkSession, dir: String): DataFrame =
    stagedTermTable(spark, dir, "unigram") {
      Dedupe.tokenRows(docs(spark, dir), "doc_id", "text")
    }

  // Sketch artifacts (MinHash + SimHash signatures, verified near-dup
  // pairs) are session-staged like the term tables above: a dedupe
  // campaign computes each signature table once and feeds every downstream
  // consumer (banding, verification, clustering, export) from the staged
  // parquet — it never recomputes a corpus-wide signature per consumer.
  private def minhashSig(spark: SparkSession, dir: String): DataFrame =
    stagedTermTable(spark, dir, "minhash8") {
      Dedupe.minhashSignatureFromTerms(docShingleRowsMulti(spark, dir), "doc_id", MinhashK)
    }

  private def simhashSig(spark: SparkSession, dir: String): DataFrame =
    stagedTermTable(spark, dir, "simhash32") {
      Dedupe.simhash32FromTerms(docTokenRows(spark, dir), "doc_id")
    }

  /** Verified near-dup pairs (LSH candidates + Jaccard >= 0.5): the shared
    * artifact d4 exports and d6 clusters over.
    */
  private def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    stagedTermTable(spark, dir, "jacpairs") {
      Dedupe.nearDupJaccardFromSig(minhashSig(spark, dir), "doc_id",
        docShingleRows(spark, dir), MinhashK, rowsPerBand = 2, threshold = 0.5)
    }

  def d2Minhash(spark: SparkSession, dir: String): DataFrame =
    minhashSig(spark, dir).orderBy(col("doc_id"))

  def d2bLshPairs(spark: SparkSession, dir: String): DataFrame =
    Dedupe.lshCandidatePairs(minhashSig(spark, dir), "doc_id", MinhashK, rowsPerBand = 2)
      .orderBy(col("id_a"), col("id_b"))

  /** D14: incremental LSH — pairs touching a simulated new-ingest batch
    * (hash-bucketed 10% of docs), recomputed over dirty band buckets
    * only. The oracle is deliberately the OTHER algorithm (full d2b
    * recompute filtered to touching pairs): passing proves the
    * dirty-bucket shortcut exact on touched pairs.
    */
  def d14IncrementalLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSig(spark, dir)
    val newIds = sig
      .filter(pmod(Dedupe.tokenHash(col("doc_id").cast("string")), lit(10)) === 0)
      .select(col("doc_id"))
    Dedupe.incrementalLshPairs(sig, newIds, "doc_id", MinhashK, rowsPerBand = 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  def d3Simhash(spark: SparkSession, dir: String): DataFrame =
    simhashSig(spark, dir).orderBy(col("doc_id"))

  def d3bSimhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedupe.simhashPairs(simhashSig(spark, dir), "doc_id", maxHamming = 3)
      .withColumn("hamming", col("hamming").cast("int"))
      .orderBy(col("id_a"), col("id_b"))

  def d4JaccardPairs(spark: SparkSession, dir: String): DataFrame =
    jaccardPairs(spark, dir).orderBy(col("id_a"), col("id_b"))

  // Dedup canonical-pick: connected components over the verified pairs,
  // one cluster id per doc. Staged: the cluster assignment feeds both the
  // cluster export (d6) and the keep-one selection (d8).
  private def dupClusters(spark: SparkSession, dir: String): DataFrame =
    stagedTermTable(spark, dir, "clusters") {
      Dedupe.dupClusters(jaccardPairs(spark, dir).select(col("id_a"), col("id_b")))
    }

  def d6DupClusters(spark: SparkSession, dir: String): DataFrame =
    dupClusters(spark, dir).orderBy(col("doc_id"))

  // D8: the dedupe DECISION — keep exactly one document per duplicate
  // cluster, chosen by quality score (t2's formula) with doc_id as the
  // deterministic tiebreak. One join (clusters are pair-bounded, AQE
  // broadcasts) + one per-cluster window; "drop the rest" is then a
  // pushdown-friendly `keep` filter on the output.
  def d8ClusterPick(spark: SparkSession, dir: String): DataFrame = {
    val quality = docs(spark, dir).select(
      col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id")).orderBy(col("quality").desc, col("doc_id"))
    dupClusters(spark, dir).join(quality, Seq("doc_id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("quality"), col("keep"))
      .orderBy(col("cluster_id"), col("doc_id"))
  }

  // ---- embedding similarity ----

  def d5EmbedDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(emb(spark, dir), "vec_id", "label", 0.35)
      .orderBy(col("label"), col("id_a"), col("id_b"))

  // SemDeDup-style semantic dedup: IVF cluster assignment (deterministic
  // seed centroids) + within-cluster greedy cosine prune — the lowest id
  // of each near-dup group survives. The curation op LLM pipelines run
  // between exact dedupe and quality filtering.
  def d9SemanticDedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(emb(spark, dir), "vec_id", 8, 0.35)
      .orderBy(col("vec_id"))

  // Cross-document boilerplate-span removal (CCNet/MassiveText line-level
  // dedupe, adapted to word spans): segments shared by more than
  // maxDocFreq docs are dropped corpus-wide, docs reassemble from the
  // surviving spans. The hot set is the only join side — bounded, AQE
  // broadcasts it.
  def d10BoilerplateScrub(spark: SparkSession, dir: String): DataFrame =
    Dedupe.boilerplateScrub(docs(spark, dir), "doc_id", "text",
      span = 3, maxDocFreq = 3L)
      .orderBy(col("doc_id"))

  // SQ8 brute-force top-k: the int8 scalar-quantized scoring path — 1/8th
  // the candidate-table bytes of sim1's exact-integer codes, cosine over
  // the codes directly (scale-invariant), same fused codegen kernel shape.
  def sim5Sq8TopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Similarity.sq8TopK(e, "vec_id", e.filter(col("vec_id") < 10), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  // IVF-SQ8: coarse-quantizer assignment (exact kernel, nlist-bounded) +
  // SQ8 codes in the inverted lists — the artifact that shuffles at
  // corpus size carries 1-byte codes.
  def sim6IvfSq8(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Similarity.ivfSq8TopK(e, "vec_id", e.filter(col("vec_id") < 10), k = 3,
      nlist = 8, nprobe = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  // PQ encode + asymmetric-distance scan: every vector compresses to 8
  // four-bit codes against the derived per-subspace codebook, then the
  // fixed probe scores the whole corpus through centroid lookups alone —
  // never touching the original vectors. Exact integer arithmetic end to
  // end (see Similarity PQ block), so the DuckDB twin is bit-identical.
  def sim7PqAdc(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    e.select(col("vec_id"),
        Similarity.pqCodes(Similarity.quantize(col("embedding"))).as("codes"))
      .withColumn("pq_dist", Similarity.pqAdcDist(col("codes")))
      .orderBy(col("pq_dist"), col("vec_id"))
      .limit(20)
      // comma-joined codes: the oracle comparator can't sort array columns
      .withColumn("codes",
        expr("array_join(transform(codes, x -> cast(x as string)), ',')"))
  }

  // IVF+PQ composite: coarse-quantizer routing + residual PQ codes in
  // the inverted lists + asymmetric-distance candidate scoring — the
  // full FAISS IVFPQ shape, deterministic end to end.
  def sim8IvfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Similarity.ivfPqTopK(e, "vec_id", e.filter(col("vec_id") < 10), k = 3,
      nlist = 8, nprobe = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  // Label-free twin: blocks come from the embedding itself (sign-LSH over
  // the leading components) — the 100 TB path when no cluster label
  // exists. Same per-block pair loop, same quantized arithmetic.
  def d5bEmbedDupLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("__bkt",
      Similarity.signBucket(Similarity.quantize(col("embedding")), 6))
    Similarity.nearDupPairs(e, "vec_id", "__bkt", 0.35)
      .withColumnRenamed("__bkt", "bucket")
      .orderBy(col("bucket"), col("id_a"), col("id_b"))
  }

  def sim1TopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Similarity.bruteForceTopK(e, "vec_id", e.filter(col("vec_id") < 10), 5)
      .orderBy(col("query_id"), col("rank"))
  }

  def sim2AnnBucket(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Similarity.bucketedTopK(e, "vec_id", e.filter(col("vec_id") < 20), 3, bits = 4)
      .orderBy(col("query_id"), col("rank"))
  }

  def sim3IvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Similarity.ivfTopK(e, "vec_id", e.filter(col("vec_id") < 10), k = 3,
      nlist = 8, nprobe = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  // IVF training: one k-means update over the centroid assignment —
  // element-wise means per inverted list. Looped, this trains the sim3
  // coarse quantizer; a single deterministic iteration is what the
  // oracle can replay.
  def sim4KmeansUpdate(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansUpdate(emb(spark, dir), "vec_id", nlist = 8)
      .orderBy(col("cid"), col("dim"))

  // sim9: the PRODUCTION quantizer path — IVF probe against centroids
  // TRAINED by kmeansTrain (two deterministic spherical-k-means rounds
  // from the seed quantizer). Deterministic end to end: seed cents are
  // the first nlist vectors, assignment tie-breaks on lowest cid, means
  // requantize on the exact-integer grid — so the oracle replays both
  // training rounds and the probe in SQL.
  def sim9IvfTrained(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cents = Similarity.kmeansTrain(e, "vec_id", nlist = 8, iters = 2)
    Similarity.ivfTopKWithCents(e, "vec_id", e.filter(col("vec_id") < 10),
        k = 3, cents, nprobe = 2)
      .orderBy(col("query_id"), col("rank"))
  }

  // E1: int8 embedding quantization export — the compression step before
  // shipping vectors to an ANN index (4× smaller than float32, exact
  // integer arithmetic downstream). Clamped symmetric quantization at a
  // fixed scale; the L2 norm of the quantized vector rides along so the
  // index never recomputes it. Pure per-row map — no shuffle.
  def e1QuantizeExport(spark: SparkSession, dir: String): DataFrame = {
    val q8 = transform(col("embedding"), x =>
      greatest(lit(-127L), least(lit(127L), round(x.cast("double") * 127).cast("long"))))
    emb(spark, dir).select(
      col("vec_id"),
      array_join(transform(q8, _.cast("string")), ",").as("q8csv"),
      aggregate(q8, lit(0L), (acc, v) => acc + v * v).as("l2q8"))
      .orderBy(col("vec_id"))
  }

  // ---- corpus curation: splits, sampling, scrubbing ----

  // Deterministic train/val/test assignment by content-stable hash:
  // reproducible across runs/engines, no RNG state, pure map — the
  // standard split mechanism for a corpus too large to shuffle globally.
  def d7SplitAssign(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      pmod(Dedupe.tokenHash(col("doc_id").cast("string")), lit(100)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
      .orderBy(col("doc_id"))

  // Stratified deterministic sample: per-language strata sampled by hash
  // threshold (here 1-in-5). A pure pushdown-friendly filter — no shuffle,
  // no RNG, stable under re-runs and engine changes.
  def smp1Stratified(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .filter(pmod(Dedupe.tokenHash(col("doc_id").cast("string")), lit(5)) === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  // Per-source frequency cap: keep at most N docs per source, ranked by
  // a deterministic quality proxy (longest first, id tiebreak) — the
  // over-represented-domain guard corpus curation applies so one crawl
  // host can't dominate the training mix. Scale shape: one shuffle on
  // source, per-partition rank window (a per-source heap, no global
  // sort); the final orderBy is only the oracle-compare determinism.
  def cur1SourceCap(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs(spark, dir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("source"), col("doc_id"), col("n_chars"), col("rank"))
      .orderBy(col("source"), col("rank"))
  }

  // Mixture-weight sampler: deterministically subsample the corpus so the
  // kept set approximates a target language mixture (the domain-rebalance
  // step of training-data curation — e.g. upweight code, downweight web).
  // Feasible total T = min over groups of n_g / w_g; keep rate per group
  // is w_g·T / n_g; membership is a pure hash test on the doc id —
  // deterministic, replayable, no shuffle beyond the group counts.
  //
  // Scale shape: counts are one map-side-partial groupBy over a handful
  // of groups; the rates table is bounded by the mixture's cardinality
  // (broadcast hint justified, like the centroid table); the sample
  // itself is a broadcast-join + filter — the corpus is scanned once and
  // never shuffled or ranked.
  def cur2MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir)
    val weights = Seq(("en", 0.4), ("de", 0.2), ("es", 0.2), ("fr", 0.1),
      ("zh", 0.1)).toDF("lang", "w")
    // staged: the per-lang count table feeds both the feasible-total agg
    // and the rate projection — unstaged, the corpus agg runs twice
    val j = graft.functions.F.materialize(
      d.groupBy(col("lang")).agg(count(lit(1)).cast("double").as("n"))
        .join(weights, Seq("lang")))
    val rates = j
      .crossJoin(broadcast(j.agg(min(col("n") / col("w")).as("t"))))
      .select(col("lang"),
        least(lit(1.0), col("w") * col("t") / col("n")).as("rate"))
    d.join(broadcast(rates), Seq("lang"))
      .withColumn("__frac",
        Dedupe.tokenHash(col("doc_id").cast("string")).cast("double") / 4294967296.0)
      .filter(col("__frac") < col("rate"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  // Temperature-scaled mixture planning over TOKEN budgets: sampling
  // weight per source ∝ n_tokens^T with T = 1/2 (the multilingual
  // temperature-sampling recipe — upweights small sources, tempers big
  // ones), then per-source keep rates that land a fixed total token
  // budget. T = 1/2 is deliberate: sqrt is IEEE correctly-rounded in
  // every engine while pow(x, 0.3) is libm-implementation-defined, and
  // the weights/targets stay in floor'd integer arithmetic (exact,
  // order-free) with one final division per double column — bit-exact
  // against the oracle.
  //
  // Scale shape: one map-side-partial groupBy over the source column;
  // everything after operates on #sources rows.
  def cur3TempMixture(spark: SparkSession, dir: String): DataFrame = {
    val budget = 100000L
    // staged: feeds both the per-source rows and the global s_total —
    // unstaged, the corpus token aggregation runs twice
    val tok = graft.functions.F.materialize(docs(spark, dir)
      .select(col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("__nt"))
      .groupBy(col("source")).agg(sum(col("__nt")).as("n_tokens"))
      .withColumn("s", floor(sqrt(col("n_tokens").cast("double"))).cast("long")))
    tok.crossJoin(broadcast(tok.agg(sum(col("s")).as("s_total"))))
      .withColumn("p", col("s").cast("double") / col("s_total").cast("double"))
      .withColumn("target_tokens", expr(s"s * $budget div s_total"))
      .withColumn("rate", least(lit(1.0),
        col("target_tokens").cast("double") / col("n_tokens").cast("double")))
      .select(col("source"), col("n_tokens"), col("s"), col("p"),
        col("target_tokens"), col("rate"))
      .orderBy(col("source"))
  }

  // CUR4: materialize cur3's mixture plan as an actual document draw —
  // the plan→draw step a curation pipeline runs next. Per-source
  // inclusion is a deterministic hash threshold, cross-multiplied so the
  // per-doc test `hb/M < alloc/src_tok` stays in exact integers:
  // `hb * src_tok < alloc * M`. One groupBy for source totals
  // (map-side-partial), the per-source allocation is a #sources-row
  // broadcast into the corpus scan — the draw itself never shuffles.
  def cur4MixtureDraw(spark: SparkSession, dir: String): DataFrame = {
    val budget = 100000L
    val M = 1000000L
    val tok = docs(spark, dir).select(col("source"), col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("__nt"))
    // staged: sq feeds its own global total, the draw join, and the
    // report join — unstaged, each consumer re-aggregates the corpus
    // (the explain showed 10 full scans; staged it is 2: sq build + draw)
    val sq = graft.functions.F.materialize(
      tok.groupBy(col("source")).agg(sum(col("__nt")).as("src_tok"))
        .withColumn("s", floor(sqrt(col("src_tok").cast("double"))).cast("long")))
    val alloc = sq.crossJoin(broadcast(sq.agg(sum(col("s")).as("s_total"))))
      .withColumn("alloc_tok", expr(s"($budget * s) div s_total"))
      .select(col("source"), col("src_tok"), col("alloc_tok"))
    val drawn = tok
      .join(broadcast(alloc), Seq("source"))
      .withColumn("__hb",
        pmod(Dedupe.tokenHash(col("doc_id").cast("string")), lit(M)))
      .filter(col("__hb") * col("src_tok") < col("alloc_tok") * lit(M))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sel"), sum(col("__nt")).as("tok_sel"))
    alloc.join(drawn, Seq("source"), "left_outer")
      .select(col("source"), col("src_tok"), col("alloc_tok"),
        coalesce(col("n_sel"), lit(0L)).as("n_sel"),
        coalesce(col("tok_sel"), lit(0L)).as("tok_sel"))
      .orderBy(col("source"))
  }

  /** cur5: DSIR-style hashed importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling") —
    * rank raw-corpus documents by how target-like their hashed unigram
    * distribution is. Features hash into 1024 buckets; each bucket gets
    * an add-one-smoothed probability ratio p_target/p_raw, and a doc
    * scores the mean ratio over its token stream (multiplicity kept —
    * it's a distribution estimate, not a set test).
    *
    * Integer-exact twist on the paper: the published method sums log
    * likelihood ratios; engine-portable determinism wants no
    * transcendental functions, so the ratio is scaled to 1e4 with
    * truncating division and AVERAGED instead of log-summed — the same
    * monotone "more target-like ⇒ higher score" ordering for the
    * flat-ish ratios hashed buckets produce. Operand bound: the summed
    * numerator stays < 2⁶³ up to ~10⁹-token targets; shard the bucket
    * stats beyond that.
    *
    * Scale shape: the token table stages once and feeds (a) the 1024-row
    * bucket-stat aggregate — map-side combinable, broadcast back — and
    * (b) the per-doc score. The totals row rides the same broadcast
    * cross-join trick as cur3's allocation. No shuffle carries more than
    * the token table once.
    */
  def cur5DsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirWeights(docs(spark, dir), Seq("src0", "src1"), limit = 50)

  /** Core of cur5 over any (doc_id, source, text) corpus — see
    * [[cur5DsirWeights]] for the estimator contract.
    */
  def dsirWeights(corpus: DataFrame, targetSources: Seq[String],
      limit: Int): DataFrame = {
    val isT = col("source").isin(targetSources: _*)
    val toks = graft.functions.F.materialize(
      corpus
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("__tok"))
        .withColumn("__b", pmod(Dedupe.tokenHash(col("__tok")), lit(1024L)))
        .select(col("doc_id"), col("source"), col("__b")))
    val buckets = toks.groupBy(col("__b")).agg(
      count(lit(1)).as("cnt_r"),
      sum(when(isT, 1L).otherwise(0L)).as("cnt_t"))
    val totals = toks.agg(
      count(lit(1)).as("rtot"),
      sum(when(isT, 1L).otherwise(0L)).as("ttot"))
    val wb = buckets.crossJoin(broadcast(totals))
      .select(col("__b"),
        expr("((cnt_t + 1) * (rtot + 1024) * 10000) div ((cnt_r + 1) * (ttot + 1024))")
          .as("__w"))
    toks.join(broadcast(wb), Seq("__b"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__w")).as("__sw"))
      .withColumn("score", expr("__sw div n_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(limit)
  }

  /** tok2: two rounds of BPE merge training over the corpus token
    * stream (see [[graft.text.Bpe]] for the greedy-as-windows
    * construction and the scale shape) — reports each round's winning
    * pair, its adjacent-pair count, how many occurrences actually
    * merged (overlaps collapse: "a a a" has 2 pairs but 1 greedy
    * merge), and the corpus token count after the round.
    */
  def tok2BpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.F
    // Job-count shape: the naive form recomputed each round's top-pair
    // aggregation in the final summary action (the broadcast inside the
    // merge plan AND the report read it) and ran separate count() scans
    // for the before/after token totals — 22 jobs for two rounds. Now
    // the 1-row winner is STAGED once per round and re-read by both
    // consumers, and both totals ride the merge job itself as observe
    // metrics (input-node count = before, output count = after), so a
    // round is exactly two jobs: top-pair aggregate + merge write.
    val t0 = posTokens(spark, dir)
    // Observed-small fast path (the GraphLocal precedent): greedy BPE is
    // inherently sequential per document, so when the staged token table
    // measures small (exact file bytes — driver metadata, no job) BOTH
    // rounds run as ONE executor-local task over interned-int token
    // arrays ([[graft.text.Bpe.localSummary]] — exactness argument and
    // the parity-rule equivalence there; locked by a forced-distributed
    // spec and the tok2 oracle). At 100 TB the token stream dwarfs the
    // gate and the staged rounds below run unchanged.
    if (F.isPlainScan(t0) && graft.graph.EntityGraph.smallEnoughForLocal(
        Seq(t0), "spark.graft.text.localBytes", 32L << 20)) {
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("round",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("pair",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_pair",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_merged",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("tokens_after",
          org.apache.spark.sql.types.LongType, nullable = false)))
      return t0.select(col("doc_id"), col("pos"), col("w"))
        .coalesce(1)
        .mapPartitions(it => graft.text.Bpe.localSummary(it, 2))(
          org.apache.spark.sql.Encoders.row(outSchema))
        .orderBy(col("round"))
    }
    def round(toks: DataFrame): (DataFrame, DataFrame, Long, Long) = {
      val top = F.materialize(graft.text.Bpe.topPair(toks))
      val obsIn = org.apache.spark.sql.Observation()
      val merged = graft.text.Bpe.applyMerge(
        toks.observe(obsIn, count(lit(1)).as("nb")), top)
      val (staged, na) = F.materializeObserved(merged, count(lit(1)))
      val nb = obsIn.get("nb") match {
        case null => 0L
        case n: Number => n.longValue()
      }
      (staged, top, nb, na)
    }
    val (t1, top1, nb1, na1) = round(t0)
    val (_, top2, nb2, na2) = round(t1)
    def summary(r: Int, top: DataFrame, nb: Long, na: Long) =
      top.select(lit(r).as("round"),
        concat_ws(" ", col("a"), col("b")).as("pair"),
        col("n_pair"),
        lit(nb - na).as("n_merged"),
        lit(na).as("tokens_after"))
    summary(1, top1, nb1, na1).unionByName(summary(2, top2, nb2, na2))
      .orderBy(col("round"))
  }

  /** cur6: the curation FUNNEL — the gates this library provides, chained
    * the way a production corpus build runs them, with per-stage
    * survivor counts (the report a data team reads before training):
    * raw → Gopher quality gates (t8's bounds) → exact dedupe (min-id per
    * text hash, d1's rule) → per-source cap (cur1's rank rule, top 15) →
    * sqrt-temperature mixture draw (cur4's integer threshold, 8k-token
    * budget over the SURVIVORS).
    *
    * The point is composition — and ONE corpus pass, with NOTHING
    * corpus-sized written anywhere. The row-local gate is decided in
    * the scan and rejected rows never reach the dedupe exchange; the
    * dedupe gate is one well-distributed window (binary-md5-key
    * partitioning) over the gate's survivors only; the stage-0/1/2
    * counts ride that same job as `observe` metrics (CollectMetricsExec
    * — accumulator scalars, 6 values, NOT a row collect); the
    * per-source cap runs as
    * a SALTED two-phase top-k so no window ever hashes survivors onto
    * |sources| partitions, and only that ≤15·|sources| capped set is
    * staged. Stages 3-4 (allocation, draw) live entirely on the staged
    * tiny set; the report is the observed literals `stack`ed with the
    * tiny stage-3/4 aggregate. Net plan: one corpus scan (token count
    * via [[graft.functions.TokenCount]] — no per-row split array),
    * one survivors-only window shuffle, one tiny write.
    * The naive per-stage-branch union re-scanned the corpus (and re-ran
    * the dedupe shuffle) once per stage — the shape whose cost GROWS
    * with data while the oracle's CTEs get cached; it showed up as the
    * ×10→×100 ratio rising 1.49→1.79 in BENCH_scaled r11, and the r11
    * single-pass fix still staged the WHOLE flagged corpus (the staged
    * write alone was ~2 s of the 4.2 s ×100 total).
    */
  def cur6CurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{F, TokenCount}
    val W = org.apache.spark.sql.expressions.Window
    val nt = TokenCount(col("text"))
    val wl = (length(col("text")).cast("long") - (nt - lit(1))).cast("double") /
      nt.cast("double")
    // count(when(g, 1)) → 0 on an empty stage, sum(when(g, nt)) → null:
    // exactly what per-stage count(*)/sum() over a filtered branch gives
    def cnt(g: org.apache.spark.sql.Column) = count(when(g, lit(1)))
    def tok(g: org.apache.spark.sql.Column) = sum(when(g, col("__nt")))
    // The gopher gate is decided IN the scan and rejected rows never
    // reach the dedupe exchange (55% selectivity at sf0.01 ≈ 45% less
    // shuffle); the key ships as 16-byte binary md5 — the same grouping
    // as the oracle's md5(text) string at half the width. Stage-0/1
    // stats are OBSERVED on the pre-filter scan node, stage-2 on the
    // post-window node: all six ride the one top-k job below as
    // accumulator scalars instead of a second corpus aggregate.
    val obs01 = org.apache.spark.sql.Observation()
    val parsed = docs(spark, dir).select(
      col("doc_id"), col("source"), col("n_chars"), nt.as("__nt"),
      (nt >= 50 && nt <= 100000 && wl >= 3.0 && wl <= 10.0).as("__g1"),
      unhex(md5(col("text"))).as("__key"))
      .observe(obs01,
        count(lit(1)).as("c0"), sum(col("__nt")).as("t0"),
        cnt(col("__g1")).as("c1"), tok(col("__g1")).as("t1"))
    // all rows past this point are g1: min doc_id per key IS d1's rule
    val mn = min(col("doc_id")).over(W.partitionBy(col("__key")))
    val obs2 = org.apache.spark.sql.Observation()
    val flagged = parsed.filter(col("__g1"))
      .withColumn("__g2", col("doc_id") === mn)
      .observe(obs2,
        cnt(col("__g2")).as("c2"), tok(col("__g2")).as("t2"))
    // Per-source top-15 cap, SALTED two-phase: a plain per-source window
    // hashes all survivors onto |sources| partitions — the skew shape
    // that stalls at 100 TB. Phase 1 ranks within (source, salt) at full
    // parallelism; phase 2 re-ranks only the ≤ sources×salts×15 per-salt
    // survivors, so the serial window touches a bounded candidate set.
    // Exact: every global top-15 row is within its salt bucket's top-15.
    val ord: Seq[org.apache.spark.sql.Column] =
      Seq(col("n_chars").desc, col("doc_id"))
    val cands = flagged.filter(col("__g2"))
      .withColumn("__salt", pmod(hash(col("doc_id")), lit(32)))
      .withColumn("__rs", row_number().over(
        W.partitionBy(col("source"), col("__salt")).orderBy(ord: _*)))
      .filter(col("__rs") <= 15)
    // the ONE action over the corpus: stage the ≤15·|sources| capped set
    // (reused by stages 3-5) — observed metrics complete with this job
    val g3set = F.materialize(cands
      .withColumn("__rk", row_number().over(
        W.partitionBy(col("source")).orderBy(ord: _*)))
      .filter(col("__rk") <= 15)
      .select(col("doc_id"), col("source"), col("__nt")))
    val m = obs01.get ++ obs2.get
    def obsLit(k: String): org.apache.spark.sql.Column = m(k) match {
      case null => lit(null).cast("long")
      case n: Number => lit(n.longValue())
    }
    // stages 3/4 live entirely on the tiny capped set (≤ 15·|sources|
    // rows): allocation, draw, and their counts never touch the corpus
    val sq = g3set.groupBy(col("source")).agg(sum(col("__nt")).as("src_tok"))
      .withColumn("s", floor(sqrt(col("src_tok").cast("double"))).cast("long"))
    val alloc = sq.crossJoin(broadcast(sq.agg(sum(col("s")).as("s_total"))))
      .withColumn("alloc_tok", expr("(8000 * s) div s_total"))
      .select(col("source"), col("src_tok"), col("alloc_tok"))
    val g4 = pmod(Dedupe.tokenHash(col("doc_id").cast("string")), lit(1000000L)) *
      col("src_tok") < col("alloc_tok") * lit(1000000L)
    val big = spark.range(1).select(
      obsLit("c0").as("c0"), obsLit("t0").as("t0"),
      obsLit("c1").as("c1"), obsLit("t1").as("t1"),
      obsLit("c2").as("c2"), obsLit("t2").as("t2"))
    val small = g3set.join(broadcast(alloc), Seq("source"))
      .withColumn("__g4", g4)
      .agg(count(lit(1)).as("c3"), sum(col("__nt")).as("t3"),
        cnt(col("__g4")).as("c4"), tok(col("__g4")).as("t4"))
    big.crossJoin(broadcast(small)).select(expr(
      """stack(5,
        |  0, 'raw',          c0, t0,
        |  1, 'gopher',       c1, t1,
        |  2, 'exact_dedupe', c2, t2,
        |  3, 'source_cap',   c3, t3,
        |  4, 'mixture_draw', c4, t4)
        |  AS (stage, stage_name, n_docs, n_tokens)""".stripMargin))
      .orderBy(col("stage"))
  }

  /** qc2: train the hashed-feature quality/language classifier IN the
    * engine — a batch perceptron over 64 hashed-unigram count features
    * (positive class: lang = 'en'), two epochs, all-integer. The batch
    * (not online) update rule is what makes training a DISTRIBUTED
    * aggregate: each epoch scores every doc against the broadcast
    * weight vector (map-side), collects the misclassified set, and sums
    * their signed feature vectors into one 64-row weight delta —
    * order-free, so the result is independent of partitioning and a SQL
    * twin replays it exactly (epoch 1 from w=0 degenerates to the sum
    * over ALL docs, since y·0 ≤ 0 counts as misclassified).
    *
    * Scale shape: the (doc, bucket, count) table stages once; per epoch
    * one broadcast join (64-row weights) + two map-side-combinable
    * aggregates. Weights stay bounded (|w| ≤ epochs·corpus tokens).
    * qc1 SCORES with fixed weights; qc2 closes the loop by LEARNING
    * them from labels — the fastText-style classifier shape of corpus
    * quality filtering, minus FP softmax (perceptron keeps it integer).
    */
  def qc2Perceptron(spark: SparkSession, dir: String): DataFrame =
    perceptronWeights(
      docs(spark, dir).select(col("doc_id"),
        (col("lang") === "en").cast("boolean").as("label"), col("text")))

  /** Core of qc2: two-epoch batch perceptron over any
    * (doc_id, label, text) corpus; returns (bucket, w1, w2).
    */
  def perceptronWeights(corpus: DataFrame): DataFrame = {
    val tb = graft.functions.F.materialize(
      corpus
        .select(col("doc_id"),
          when(col("label"), 1L).otherwise(-1L).as("__y"),
          explode(split(col("text"), " ")).as("__tok"))
        .withColumn("__b", pmod(Dedupe.tokenHash(col("__tok")), lit(64L)))
        .groupBy(col("doc_id"), col("__y"), col("__b"))
        .agg(count(lit(1)).as("__x")))
    // epoch 1 from w = 0: every doc has y·score = 0 ≤ 0 → the update is
    // the signed feature sum over the whole corpus
    val w1 = tb.groupBy(col("__b"))
      .agg(sum(col("__y") * col("__x")).as("w1"))
    val scored = tb
      .join(broadcast(w1), Seq("__b"), "left_outer")
      .groupBy(col("doc_id"), col("__y"))
      .agg(sum(col("__x") * coalesce(col("w1"), lit(0L))).as("__score"))
    val mis = scored.filter(col("__y") * col("__score") <= 0)
      .select(col("doc_id"))
    val upd = tb.join(mis, Seq("doc_id"), "left_semi")
      .groupBy(col("__b")).agg(sum(col("__y") * col("__x")).as("__dw"))
    val grid = tb.sparkSession.range(0, 64).select(col("id").as("bucket"))
    grid
      .join(w1.select(col("__b").as("bucket"), col("w1")), Seq("bucket"), "left_outer")
      .join(upd.select(col("__b").as("bucket"), col("__dw")), Seq("bucket"), "left_outer")
      .select(col("bucket"), coalesce(col("w1"), lit(0L)).as("w1"),
        (coalesce(col("w1"), lit(0L)) + coalesce(col("__dw"), lit(0L))).as("w2"))
      .orderBy(col("bucket"))
  }

  /** sim10: ANN recall calibration — recall@3 of the IVF index (sim3's
    * nlist=8 / nprobe=2 configuration) against the brute-force exact
    * top-3, per query. THE metric an ANN deployment tracks before
    * trusting an index at scale; both arms are deterministic, so the
    * measurement itself sits in the correctness gate. One broadcast-able
    * join on (query, neighbor) between two k·|Q|-row results.
    */
  def sim10Recall(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, "vec_id", q, 3)
      .select(col("query_id"), col("neighbor_id"))
    val ivf = Similarity.ivfTopK(e, "vec_id", q, k = 3, nlist = 8, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    exact.join(ivf, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("k").cast("double"))
      .orderBy(col("query_id"))
  }

  // QS1: per-source token-length quantiles from a 256-bin histogram —
  // the MERGEABLE form of t9's exact percentile (bounded state per
  // source, partial-aggregable, the 100 TB path where a global sort per
  // group is off the table). Quantile = lower bound of the first bin
  // whose cumulative count clears ceil(q·total), all integer arithmetic.
  def qs1HistQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = docs(spark, dir)
      .select(col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("__n"))
      .select(col("source"), least(expr("__n div 32"), lit(255L)).as("bin"))
    val hist = binned.groupBy(col("source"), col("bin")).agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("source")).orderBy(col("bin"))))
      .withColumn("total", sum(col("c")).over(Window.partitionBy(col("source"))))
    val quantileCols = Seq(("p50_lo", 50L), ("p90_lo", 90L), ("p99_lo", 99L)).map {
      case (nm, q) =>
        min(when(col("cum") * 100 >= col("total") * q, col("bin") * 32)).as(nm)
    }
    cum.groupBy(col("source"))
      .agg(max(col("total")).as("n_docs"), quantileCols: _*)
      .orderBy(col("source"))
  }

  // PII scrub: email/URL redaction with per-doc hit counts and the
  // fingerprint of the redacted text. Synthetic contacts are injected
  // deterministically so the scrub has real work on the test corpus.
  def t6Scrub(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9.]+@[a-z0-9.]+"
    val urlRe = "https?://[a-z0-9./]+"
    val enriched = concat(col("text"),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com or https://example.com/u/"), col("doc_id")))
        .otherwise(lit("")))
    docs(spark, dir).select(
      col("doc_id"),
      regexp_count(enriched, lit(emailRe)).as("n_emails"),
      regexp_count(enriched, lit(urlRe)).as("n_urls"),
      md5(regexp_replace(regexp_replace(enriched, urlRe, "<url>"), emailRe, "<email>")).as("scrubbed_md5"))
      .orderBy(col("doc_id"))
  }

  // DC1: train/test decontamination — the pre-training hygiene pass that
  // finds evaluation documents leaking into the train split. Membership
  // comes from the deterministic d7 hash split; overlap is measured on the
  // min-8 rolling-hash sketch (t5), so the join carries 8 rows per
  // document instead of the full shingle set — at 100 TB the shuffle is
  // sketch-sized, not corpus-sized, and a near-identical pair still
  // shares most sketch values. A (test, train) pair with >= 4 of 8
  // shared sketch hashes is flagged; output is per test doc.
  def dc1Decontam(spark: SparkSession, dir: String): DataFrame = {
    val sk = docSketch(spark, dir)
      .select(col("doc_id"), explode(split(col("sketch"), ",")).as("h"))
    val bucket = pmod(Dedupe.tokenHash(col("doc_id").cast("string")), lit(100))
    val withB = sk.withColumn("__b", bucket)
    val train = withB.filter(col("__b") < 80).select(col("doc_id").as("train_id"), col("h"))
    val test = withB.filter(col("__b") >= 90).select(col("doc_id").as("test_id"), col("h"))
    test.join(train, Seq("h"))
      .groupBy(col("test_id"), col("train_id")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 4)
      .groupBy(col("test_id").as("doc_id"))
      .agg(count(lit(1)).as("n_contam_sources"), max(col("n_shared")).as("max_overlap"))
      .orderBy(col("doc_id"))
  }

  // Per-doc contamination FRACTION against a benchmark split — the
  // overlap report (GPT-3/PaLM appendix style) that complements dc1's
  // drop decision: how much of each training doc's distinct shingle set
  // appears anywhere in the held-out set. One shuffle on the shingle
  // key; the benchmark side is distinct'd before the join so each
  // (doc, shingle) matches at most once, and the per-doc count is a
  // map-side-partial aggregation.
  def d13ContamFrac(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(Dedupe.tokenHash(col("doc_id").cast("string")), lit(100))
    val withB = docShingleRows(spark, dir).withColumn("__b", bucket)
    val train = withB.filter(col("__b") < 80).select(col("doc_id"), col("__tok"))
    val bench = withB.filter(col("__b") >= 90).select(col("__tok")).distinct()
    train.join(bench.withColumn("__hit", lit(1L)), Seq("__tok"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contam_frac",
        col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
      .orderBy(col("doc_id"))
  }

  // T8: Gopher-style quality rules — the word-count / mean-word-length /
  // digit-density gates of the standard pre-training filter stack. All
  // column arithmetic (no lambdas): total word chars = length - (n-1)
  // separators, so the mean is one exact subtraction and one IEEE divide.
  def t8GopherRules(spark: SparkSession, dir: String): DataFrame = {
    // token_count ≡ size(split(text,' ')) (see TokenCount) minus the
    // per-row array; cast keeps t8's original INT column type
    val n = graft.functions.TokenCount(col("text")).cast("int")
    val meanWl = (length(col("text")) - (n - lit(1))).cast("double") / n.cast("double")
    val digitFrac = regexp_count(col("text"), lit("[0-9]")).cast("double") /
      length(col("text")).cast("double")
    docs(spark, dir).select(
      col("doc_id"), n.as("n_words"), meanWl.as("mean_word_len"),
      digitFrac.as("digit_char_frac"),
      (n >= 50 && n <= 100000 && meanWl >= 3.0 && meanWl <= 10.0).as("keep"))
      .orderBy(col("doc_id"))
  }

  // T9: per-language length distribution — exact discrete quantiles via
  // rank selection (value at ceil(q*n)), NOT approx sketches: the profile
  // a curation pipeline thresholds against must be reproducible, and the
  // rank formulation is engine-portable where approx_percentile isn't.
  // One window sort per stratum + one aggregation; at 100 TB the sort is
  // per-language partitions, not a global order.
  /** t10: per-document shingle NOVELTY — the fraction (ppm, integer) of
    * a document's distinct 3-gram shingles that occur in no other
    * document. The standard "how much of this doc is boilerplate shared
    * with the corpus" curation metric (the complement of ovl1's
    * source-grain overlap, measured at document grain): low novelty =
    * template/mirror content, high = unique prose worth keeping.
    *
    * Scale shape: one map-side-combinable count per shingle (the corpus
    * dictionary), one hash join back to the staged per-doc shingle rows,
    * one per-doc aggregate — the d4/ovl1 shape, no pair space. Shingle
    * rows are staged once because the dictionary build and the join both
    * consume them. Integer ppm with truncating div — oracle-exact.
    */
  def t10Novelty(spark: SparkSession, dir: String): DataFrame = {
    // the session-staged distinct 3-gram table (the same rows this
    // operator staged privately before — shingleRows(n=3) is distinct by
    // default): the dictionary build and the join consume ONE staged
    // artifact shared with g1/d2/d11 instead of re-exploding and
    // re-writing the corpus per invocation
    val sh = docShingleRows(spark, dir)
    val dict = sh.groupBy(col("__tok")).agg(count(lit(1)).as("__nd"))
    sh.join(dict, Seq("__tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__nd") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_shingles"))
      .orderBy(col("doc_id"))
  }

  def t9LengthStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
    val ranked = docs(spark, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("lang"))))
    ranked.groupBy(col("lang"))
      .agg(
        min(col("__n")).as("n_docs"),
        min(when(col("__rn") === ceil(col("__n") * 0.5), col("n_chars"))).as("p50_chars"),
        min(when(col("__rn") === ceil(col("__n") * 0.9), col("n_chars"))).as("p90_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))
  }

  // T7: intra-document repetition — duplicated 5-gram ratio, the standard
  // boilerplate/spam signal (high ratio = template or looped text). One
  // aggregation over the positional shingle rows; no joins.
  def t7Repetition(spark: SparkSession, dir: String): DataFrame =
    Dedupe.shingleRows(docs(spark, dir), "doc_id", "text", 5, distinct = false)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), countDistinct(col("__tok")).as("n_distinct"))
      .withColumn("rep_ratio",
        (col("n_grams") - col("n_distinct")).cast("double") / col("n_grams").cast("double"))
      .orderBy(col("doc_id"))

  // G1: corpus heavy hitters — top n-grams by document frequency (the
  // input to frequency-based filtering / stop-shingle lists). Distinct
  // (doc, shingle) rows -> one count-distinct-free aggregation ->
  // TakeOrderedAndProject top-k (per-partition heaps, no global sort).
  def g1TopNgrams(spark: SparkSession, dir: String): DataFrame =
    docShingleRows(spark, dir)
      .groupBy(col("__tok").as("ngram"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram"))
      .limit(20)

  // TOK1: tokenizer vocabulary coverage — fix the vocab to the corpus's
  // top-1000 tokens (count-ranked, ties token-asc), then score every
  // doc's OOV rate against it: the coverage statistic a tokenizer build
  // reports before committing to a vocab. Scale shape: the token table
  // is staged (it feeds BOTH the vocab ranking and the scoring join);
  // the ranked vocab is a bounded top-k (TakeOrderedAndProject) and is
  // explicitly broadcast onto the scoring side — the corpus-sized table
  // never shuffles for the join, only for the per-doc count.
  def tok1VocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.functions.F.materialize(docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok")))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("tok")).limit(1000)
      .select(col("tok"), lit(1).as("__v"))
    toks.join(broadcast(vocab), Seq("tok"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
      .orderBy(col("doc_id"))
  }

  // PK1: sequence packing — assign documents to fixed-token-budget chunks
  // (the concat-and-chunk step before tensorization). Global greedy
  // packing is inherently sequential, so the scalable form packs within
  // hash buckets: a window cumsum over each bucket's deterministic doc
  // order yields each doc's chunk as floor(tokens_before / budget).
  // Buckets pack independently (one window sort per bucket partition, no
  // global order); waste is bounded by one partial chunk per bucket.
  def pk1PackChunks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 512L
    val bucket = pmod(Dedupe.tokenHash(col("doc_id").cast("string")), lit(8))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(spark, dir)
      .select(col("doc_id"), bucket.as("bucket"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("chunk", floor((col("__cum") - col("n_tokens")) / budget).cast("long"))
      .select(col("doc_id"), col("bucket"), col("n_tokens"), col("chunk"))
      .orderBy(col("doc_id"))
  }

  // CH1: context-window chunking — split each document into fixed-size
  // character windows (500 chars, stride 400 → 100-char overlap), the
  // pre-tokenization chunking step for pretraining corpora and RAG
  // indexing. sequence+explode is generator-shaped: no driver loop, each
  // task fans out only its own documents, and a 10 MB document yields a
  // ~25k-int offset array, never a 10 MB×windows blow-up. Output carries
  // an md5 per window instead of the window text, so result width is
  // constant regardless of document size.
  def ch1ChunkDocs(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("pos",
        explode(sequence(lit(1L), greatest(col("n_chars"), lit(1L)), lit(400L))))
      .select(col("doc_id"),
        expr("CAST((pos - 1) div 400 AS INT)").as("chunk_idx"),
        expr("md5(substr(text, CAST(pos AS INT), 500))").as("chunk_md5"),
        expr("CAST(length(substr(text, CAST(pos AS INT), 500)) AS BIGINT)").as("chunk_len"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  // ---- multimodal plumbing ----

  def mm1MediaMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.withMetadata(
      docs(spark, dir).withColumn("payload", col("text").cast("binary")),
      "doc_id", "payload")
      .withColumn("fake_feature",
        conv(substring(col("sha"), 1, 4), 16, 10).cast("long"))
      .orderBy(col("media_id"))

  // MM2: the frame-sampling fan-out with hex-encoded frame payloads —
  // the UDTF-shaped explode runs in executor-side flatMap (a real demuxer
  // replaces one function body); the oracle replays the deterministic
  // stub arithmetic over hex strings.
  def mm2FrameSample(spark: SparkSession, dir: String): DataFrame = {
    // explicit stub opt-in: this oracle query exercises the PLUMBING
    // (fan-out shape, schema, batching); the demux itself stays gated so
    // production can't silently ship fake frames
    spark.conf.set(Multimodal.StubConfKey, "true")
    Multimodal.sampleFrames(
      docs(spark, dir).withColumn("payload", col("text").cast("binary")),
      "doc_id", "payload")
      .toDF()
      .select(col("media_id"), col("frame_idx"), col("frame_ms"),
        lower(hex(col("frame"))).as("frame_hex"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  // MM3: REAL header parsing (no stub, no gate). The fixture constructs
  // valid PNG / JPEG / WAV byte streams with dimensions and audio params
  // derived from doc_id; Spark runs the genuine MediaProbe parser
  // (marker scan, chunk walk) over them, while the oracle computes the
  // expected values arithmetically from the construction — a
  // known-answer test in both engines.
  def mm3MediaProbe(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val w = id % 1024 + 16
    val h = (id * 7) % 1024 + 16
    val sr = id % 40000 + 8000
    val ch = id % 2 + 1
    def be32(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
    def be16(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
    def b2(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
    def le16(c: org.apache.spark.sql.Column) =
      concat(b2(c.bitwiseAND(lit(255L))), b2(shiftright(c, 8).bitwiseAND(lit(255L))))
    def le32(c: org.apache.spark.sql.Column) =
      concat(le16(c), b2(shiftright(c, 16).bitwiseAND(lit(255L))),
        b2(shiftright(c, 24).bitwiseAND(lit(255L))))
    val png = concat(lit("89504E470D0A1A0A0000000D49484452"),
      be32(w), be32(h), lit("0806000000DEADBEEF"))
    val jpeg = concat(lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
      be16(h), be16(w), lit("03011100021101031101FFD9"))
    val wav = concat(lit("524946462400000057415645666D7420100000000100"),
      le16(ch), le32(sr), lit("00000000040010006461746100000000"))
    val payload = unhex(when(id % 3 === 0, png).when(id % 3 === 1, jpeg).otherwise(wav))
    Multimodal.probed(
        docs(spark, dir).withColumn("payload", payload), "doc_id", "payload")
      .drop("byte_len")
      .orderBy(col("media_id"))
  }

  /** MM4: REAL media decode for the uncompressed containers — PCM WAV
    * samples and 24-bit BMP pixels parse from plain byte layouts with no
    * codec library, so [[graft.functions.MediaDecode]] produces
    * production numbers (loudness stats, channel sums), unlike the gated
    * compressed-codec stubs. The fixture constructs VALID files whose
    * sample/pixel bytes derive from doc_id; Spark runs the genuine
    * chunk-walking decoders over them while the oracle computes the
    * expected aggregates arithmetically from the construction — the mm3
    * known-answer pattern extended from headers to payload decode.
    */
  def mm4PcmBmpDecode(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val id = col("doc_id")
    def b2(c: Column) = lpad(hex(c.bitwiseAND(lit(255L))), 2, "0")
    def le16(c: Column) = concat(b2(c), b2(shiftright(c, 8).bitwiseAND(lit(255L))))
    def le32(c: Column) = concat(le16(c.bitwiseAND(lit(65535L))),
      le16(shiftright(c, 16).bitwiseAND(lit(65535L))))
    // WAV: n = id%16+4 samples of 16-bit PCM; stored word i is
    // (id*131 + i*2311) % 65536 — multipliers sized so the words wrap
    // past 32768 and the decoder's SIGNED interpretation is exercised
    // in-gate, not just in the spec
    val n = id % 16 + 4
    val dataHex = array_join(transform(sequence(lit(0L), n - 1),
      i => le16((id * 131 + i * 2311) % 65536)), "")
    val wav = concat(
      lit("52494646"), le32(n * 2 + 36), lit("57415645"),
      lit("666D7420"), le32(lit(16L)), le16(lit(1L)), le16(lit(1L)),
      le32(lit(8000L)), le32(lit(16000L)), le16(lit(2L)), le16(lit(16L)),
      lit("64617461"), le32(n * 2), dataHex)
    // BMP: W×H 24bpp, rows padded to 4 bytes; pixel-array byte j is
    // (id*13 + j*7) % 256
    val w = id % 4 + 1
    val h = id % 3 + 1
    val rowSize = expr("(((doc_id % 4 + 1) * 3 + 3) div 4) * 4")
    val pixHex = array_join(transform(sequence(lit(0L), rowSize * h - 1),
      j => b2((id * 13 + j * 7) % 256)), "")
    val bmp = concat(
      lit("424D"), le32(rowSize * h + 54), lit("00000000"), le32(lit(54L)),
      le32(lit(40L)), le32(w), le32(h), le16(lit(1L)), le16(lit(24L)),
      le32(lit(0L)), le32(lit(0L)), le32(lit(0L)), le32(lit(0L)),
      le32(lit(0L)), le32(lit(0L)), pixHex)
    docs(spark, dir)
      .withColumn("payload", unhex(when(id % 2 === 0, wav).otherwise(bmp)))
      .select(id.cast("long").as("media_id"),
        when(id % 2 === 0, lit("wav")).otherwise(lit("bmp")).as("kind"),
        graft.functions.WavPcmStats(col("payload")).as("__w"),
        graft.functions.BmpPixelStats(col("payload")).as("__b"))
      .select(col("media_id"), col("kind"),
        col("__w.n_samples").as("n_samples"), col("__w.peak").as("peak"),
        col("__w.sum_abs").as("sum_abs"),
        col("__b.width").as("width"), col("__b.height").as("height"),
        col("__b.sum_r").as("sum_r"), col("__b.sum_g").as("sum_g"),
        col("__b.sum_b").as("sum_b"))
      .orderBy(col("media_id"))
  }

  /** Substring-level exact-dup coverage (Lee et al. 2022 k-gram window
    * stand-in for the suffix array), k=8 over whitespace tokens.
    */
  def d11SubstringDup(spark: SparkSession, dir: String): DataFrame =
    Dedupe.substringDupCoverage(docs(spark, dir), "doc_id", "text", k = 8)
      .orderBy(col("doc_id"))

  /** Source-pair corpus overlap matrix over the staged 3-shingle table:
    * exact intersection, directed containments, Jaccard per pair.
    */
  def ovl1SourceOverlap(spark: SparkSession, dir: String): DataFrame =
    Dedupe.groupShingleOverlap(docs(spark, dir), "source", "doc_id",
        docShingleRows(spark, dir))
      .orderBy(col("src_a"), col("src_b"))

  /** BM25 top-20 for a fixed 3-term query (rational-idf parity variant;
    * see [[graft.text.Search]]).
    */
  /** HYB1: hybrid retrieval — BM25 text arm fused with a cosine vector
    * arm by reciprocal-rank fusion (RRF, c=60; Cormack et al. 2009).
    * Scale shape: each arm is a bounded top-k FIRST (TakeOrderedAndProject
    * / per-query window), so the rank windows and the full-outer fusion
    * join run over ≤k rows by construction — the corpus is scanned once
    * per arm and never joined against itself. The rrf score is a single
    * fixed-order IEEE expression, bit-replayable in SQL.
    */
  def hyb1RrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 50
    val textTop = graft.text.Search.bm25TopK(docs(spark, dir), "doc_id", "text",
        Seq("spark", "vector", "customer"), k)
      .select(col("doc_id"), col("score"))
    // single-partition window is sanctioned here (PlanLintSpec
    // whitelist): input is the k-row top-k result, bounded by construction
    val wT = Window.orderBy(col("score").desc, col("doc_id"))
    val textRank = textTop
      .withColumn("t_rank", row_number().over(wT).cast("long"))
      .select(col("doc_id"), col("t_rank"))
    val e = emb(spark, dir)
    val vecRank = Similarity.bruteForceTopK(
        e, "vec_id", e.filter(col("vec_id") === 0), k)
      .select(col("neighbor_id").as("doc_id"), col("rank").cast("long").as("v_rank"))
    textRank.join(vecRank, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("t_rank").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("v_rank").cast("double")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  def srch1Bm25(spark: SparkSession, dir: String): DataFrame =
    graft.text.Search.bm25TopK(docs(spark, dir), "doc_id", "text",
      Seq("spark", "vector", "customer"), k = 20)

  /** Hashed-feature linear quality classifier (fastText shape): mean
    * integer bucket weight over tokens, dim=4096 — zero-shuffle scan.
    */
  def qc1LinearQuality(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.hashedLinearScore(col("text")).as("score"))
      .withColumn("keep", col("score") >= 0)
      .orderBy(col("doc_id"))

  /** Per-doc top-3 tf-idf keywords (rational idf, windowed top-k over
    * the doc's distinct terms).
    */
  def kw1TfidfTerms(spark: SparkSession, dir: String): DataFrame =
    graft.text.Search.tfIdfTopTerms(docs(spark, dir), "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("rank"))

  /** Inverted-index posting lists: exact df + 100 smallest doc ids per
    * term via the salted two-stage build (hot terms never concentrate).
    * The posting list is emitted comma-joined (not as an array column):
    * the oracle comparator sorts on every output column, and arrays are
    * unsortable there — the string form round-trips the same information.
    */
  def idx1Postings(spark: SparkSession, dir: String): DataFrame =
    graft.text.Search.postings(docs(spark, dir), "doc_id", "text", cap = 100)
      .withColumn("postings",
        expr("array_join(transform(postings, x -> cast(x as string)), ',')"))
      .orderBy(col("term"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d11_substring_dup" -> (d11SubstringDup _),
    "ovl1_source_overlap" -> (ovl1SourceOverlap _),
    "srch1_bm25" -> (srch1Bm25 _),
    "hyb1_rrf_fusion" -> (hyb1RrfFusion _),
    "qc1_linear_quality" -> (qc1LinearQuality _),
    "kw1_tfidf_terms" -> (kw1TfidfTerms _),
    "idx1_postings" -> (idx1Postings _),
    "t1_langid" -> (t1LangId _),
    "t2_quality" -> (t2Quality _),
    "t3_tokens" -> (t3Tokens _),
    "t4_fingerprint" -> (t4Fingerprint _),
    "t5_rolling_fingerprint" -> (t5RollingFingerprint _),
    "d1_exact_dup" -> (d1ExactDup _),
    "d2_minhash" -> (d2Minhash _),
    "d2b_lsh_pairs" -> (d2bLshPairs _),
    "d14_incremental_lsh" -> (d14IncrementalLsh _),
    "d3_simhash" -> (d3Simhash _),
    "d3b_simhash_pairs" -> (d3bSimhashPairs _),
    "d4_jaccard_pairs" -> (d4JaccardPairs _),
    "d6_dup_clusters" -> (d6DupClusters _),
    "d8_cluster_pick" -> (d8ClusterPick _),
    "t8_gopher_rules" -> (t8GopherRules _),
    "t9_length_stats" -> (t9LengthStats _),
    "t10_novelty" -> (t10Novelty _),
    "pk1_pack_chunks" -> (pk1PackChunks _),
    "ch1_chunk_docs" -> (ch1ChunkDocs _),
    "e1_quantize_export" -> (e1QuantizeExport _),
    "d5_embed_dup" -> (d5EmbedDup _),
    "d5b_embed_dup_lsh" -> (d5bEmbedDupLsh _),
    "d9_semantic_dedup" -> (d9SemanticDedup _),
    "d10_boilerplate_scrub" -> (d10BoilerplateScrub _),
    "sim1_topk" -> (sim1TopK _),
    "sim2_ann_bucket" -> (sim2AnnBucket _),
    "sim3_ivf_topk" -> (sim3IvfTopK _),
    "sim4_kmeans_update" -> (sim4KmeansUpdate _),
    "sim9_ivf_trained" -> (sim9IvfTrained _),
    "sim5_sq8_topk" -> (sim5Sq8TopK _),
    "sim6_ivf_sq8" -> (sim6IvfSq8 _),
    "sim7_pq_adc" -> (sim7PqAdc _),
    "sim8_ivf_pq" -> (sim8IvfPq _),
    "d7_split_assign" -> (d7SplitAssign _),
    "smp1_stratified" -> (smp1Stratified _),
    "cur1_source_cap" -> (cur1SourceCap _),
    "cur2_mixture_sample" -> (cur2MixtureSample _),
    "cur3_temp_mixture" -> (cur3TempMixture _),
    "cur4_mixture_draw" -> (cur4MixtureDraw _),
    "cur5_dsir_weights" -> (cur5DsirWeights _),
    "sim10_recall" -> (sim10Recall _),
    "tok2_bpe_merges" -> (tok2BpeMerges _),
    "qc2_perceptron" -> (qc2Perceptron _),
    "cur6_curation_funnel" -> (cur6CurationFunnel _),
    "qs1_hist_quantiles" -> (qs1HistQuantiles _),
    "t6_scrub" -> (t6Scrub _),
    "dc1_decontam" -> (dc1Decontam _),
    "d13_contam_frac" -> (d13ContamFrac _),
    "t7_repetition" -> (t7Repetition _),
    "g1_top_ngrams" -> (g1TopNgrams _),
    "tok1_vocab_coverage" -> (tok1VocabCoverage _),
    "mm1_media_meta" -> (mm1MediaMeta _),
    "mm2_frame_sample" -> (mm2FrameSample _),
    "mm3_media_probe" -> (mm3MediaProbe _),
    "mm4_pcm_bmp_decode" -> (mm4PcmBmpDecode _))

  // ---- DuckDB oracle twins ----

  private val tokH = "(('0x'||substr(md5(w),1,8))::BIGINT)"

  private[queries] val sigCte =
    s"""sig AS (
       |  SELECT doc_id,
       |    MIN(($tokH*3+12345) % 4294967311) AS mh0,
       |    MIN(($tokH*5+12346) % 4294967311) AS mh1,
       |    MIN(($tokH*7+12347) % 4294967311) AS mh2,
       |    MIN(($tokH*9+12348) % 4294967311) AS mh3,
       |    MIN(($tokH*11+12349) % 4294967311) AS mh4,
       |    MIN(($tokH*13+12350) % 4294967311) AS mh5,
       |    MIN(($tokH*15+12351) % 4294967311) AS mh6,
       |    MIN(($tokH*17+12352) % 4294967311) AS mh7
       |  FROM (SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(string_split(text,' '))-2),
       |    i -> array_to_string((string_split(text,' '))[i:i+2], ' ')))) AS w FROM documents)
       |  GROUP BY doc_id)""".stripMargin

  private[queries] val bandedCte =
    """banded AS (
      |  SELECT doc_id, 0 AS band, md5(mh0::VARCHAR||','||mh1::VARCHAR) AS bucket FROM sig
      |  UNION ALL SELECT doc_id, 1, md5(mh2::VARCHAR||','||mh3::VARCHAR) FROM sig
      |  UNION ALL SELECT doc_id, 2, md5(mh4::VARCHAR||','||mh5::VARCHAR) FROM sig
      |  UNION ALL SELECT doc_id, 3, md5(mh6::VARCHAR||','||mh7::VARCHAR) FROM sig),
      |cand AS (
      |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      |  FROM banded l JOIN banded r
      |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id)""".stripMargin

  private val qCte =
    """q AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |p AS (
      |  SELECT vec_id, label, qv,
      |    list_sum(list_transform(list_zip(qv, qv), z -> CAST(z[1] AS BIGINT)*z[2])) AS nrm
      |  FROM q)""".stripMargin

  private val simExpr =
    "CAST(list_sum(list_transform(list_zip(a.qv, b.qv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(a.nrm*b.nrm AS DOUBLE))"

  /** One spherical-k-means round as oracle CTEs: argmax assignment under
    * `$prev` (highest cosine, lowest cid — the assignNearest tie-break),
    * per-(cid, dim) rounded integer mean, rebuilt centroid lists with
    * empty clusters keeping their previous centroid — the exact
    * kmeansTrain recipe.
    */
  private def kmRoundCtes(prev: String, r: Int): String = {
    val (a, m, f, next) = (s"a$r", s"m$r", s"f$r", s"cents$r")
    s"""$a AS (
       |  SELECT vec_id, qv, cid FROM (
       |    SELECT p.vec_id, p.qv, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
       |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
       |        c.cid) AS crn
       |    FROM p CROSS JOIN $prev c) WHERE crn = 1),
       |$m AS (
       |  SELECT cid, dim, CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mq
       |  FROM (SELECT cid, unnest(generate_series(1, len(qv))) - 1 AS dim, unnest(qv) AS v FROM $a)
       |  GROUP BY cid, dim),
       |$f AS (SELECT cid, list(mq ORDER BY dim) AS kv FROM $m GROUP BY cid),
       |$next AS (
       |  SELECT c.cid, COALESCE(f.kv, c.kv) AS kv,
       |    list_sum(list_transform(list_zip(COALESCE(f.kv, c.kv), COALESCE(f.kv, c.kv)), z -> CAST(z[1] AS BIGINT)*z[2])) AS knrm
       |  FROM $prev c LEFT JOIN $f f ON c.cid = f.cid)""".stripMargin
  }

  /** One BPE merge round as oracle CTEs — the [[graft.text.Bpe]] recipe
    * verbatim: top pair by (count desc, a, b), greedy left-to-right via
    * the run-parity windows, consumed-right-token drop, renumber.
    */
  private def bpeRoundCtes(prev: String, next: String, r: Int): String =
    s"""pc$r AS (SELECT a, b, COUNT(*) AS n_pair FROM (
       |  SELECT w AS a, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS b
       |  FROM $prev) WHERE b IS NOT NULL GROUP BY 1, 2),
       |top$r AS (SELECT a, b, n_pair FROM pc$r ORDER BY n_pair DESC, a, b LIMIT 1),
       |f$r AS (SELECT t.doc_id, t.pos, t.w,
       |    lead(t.w) OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS nx
       |  FROM $prev t),
       |m$r AS (SELECT f.*, (f.w = top.a AND f.nx = top.b) AS m FROM f$r f, top$r top),
       |g$r AS (SELECT *, pos - SUM(CASE WHEN m THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS run
       |  FROM m$r),
       |h$r AS (SELECT *, SUM(CASE WHEN m THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id, run ORDER BY pos ROWS UNBOUNDED PRECEDING) AS rr
       |  FROM g$r),
       |u$r AS (SELECT *, (m AND rr % 2 = 1) AS sel,
       |    COALESCE(lag(m AND rr % 2 = 1)
       |      OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS consumed
       |  FROM h$r),
       |$next AS (SELECT doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos,
       |    CASE WHEN sel THEN w || '+' || nx ELSE w END AS w
       |  FROM u$r WHERE NOT consumed)""".stripMargin

  // SQ8 twin of qCte/simExpr: per-vector max-abs int8 codes (cosine is
  // scale-invariant, so the scale never appears past quantization).
  private val sq8Cte =
    """q8 AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x ->
      |      CAST(coalesce(round(CAST(x AS DOUBLE) / nullif(sc, 0.0) * 127.0), 0.0) AS BIGINT)) AS qv8
      |  FROM (SELECT vec_id, embedding,
      |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS sc
      |        FROM embeddings)),
      |p8 AS (
      |  SELECT vec_id, qv8,
      |    list_sum(list_transform(list_zip(qv8, qv8), z -> CAST(z[1] AS BIGINT)*z[2])) AS nrm8
      |  FROM q8)""".stripMargin

  private val sim8Expr =
    "CAST(list_sum(list_transform(list_zip(a.qv8, b.qv8), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(a.nrm8*b.nrm8 AS DOUBLE))"

  /** Shared CTE chain: LSH candidates → Jaccard verify → connected
    * components (min-label reachability) → `clusters(doc_id, cluster_id)`.
    * Callers must open with `WITH RECURSIVE`.
    */
  private val clustersCte =
    s"""$sigCte,
       |$bandedCte,
       |toks AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, len(string_split(text,' '))-2),
       |    i -> array_to_string((string_split(text,' '))[i:i+2], ' ')))) AS w FROM documents),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id_a, c.id_b, COUNT(*) AS i
       |  FROM cand c JOIN toks ta ON ta.doc_id = c.id_a
       |              JOIN toks tb ON tb.doc_id = c.id_b AND tb.w = ta.w
       |  GROUP BY c.id_a, c.id_b),
       |verified AS (
       |  SELECT c.id_a, c.id_b
       |  FROM cand c
       |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |  JOIN sizes sa ON sa.doc_id = c.id_a
       |  JOIN sizes sb ON sb.doc_id = c.id_b
       |  WHERE CAST(COALESCE(i.i,0) AS DOUBLE) / CAST(sa.n + sb.n - COALESCE(i.i,0) AS DOUBLE) >= 0.5),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM verified
       |  UNION ALL SELECT id_b, id_a FROM verified),
       |reach(src, dst) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
       |clusters AS (
       |  SELECT src AS doc_id, MIN(dst) AS cluster_id
       |  FROM reach GROUP BY src)""".stripMargin

  val oracle: Map[String, String] = Map(
    "qc1_linear_quality" ->
      """SELECT doc_id, len(ws) AS n_tokens,
        |  CAST(list_sum(list_transform(ws, w ->
        |    (((('0x'||substr(md5(w),1,8))::BIGINT % 4096) * 2654435761 + 12345) % 1000003 - 500001)))
        |    AS DOUBLE) / (1000003.0 * CAST(len(ws) AS DOUBLE)) AS score,
        |  CAST(list_sum(list_transform(ws, w ->
        |    (((('0x'||substr(md5(w),1,8))::BIGINT % 4096) * 2654435761 + 12345) % 1000003 - 500001)))
        |    AS DOUBLE) / (1000003.0 * CAST(len(ws) AS DOUBLE)) >= 0 AS keep
        |FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "kw1_tfidf_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, w AS term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    CAST(tf.tf AS DOUBLE) *
        |      ((CAST(n.n - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5)) AS tfidf
        |  FROM tf JOIN df USING (term), n)
        |SELECT doc_id, term, tf, df, tfidf, rank FROM (
        |  SELECT s.*, ROW_NUMBER() OVER
        |    (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank FROM s)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "idx1_postings" ->
      """WITH pairs AS (
        |  SELECT DISTINCT w AS term, doc_id
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents))
        |SELECT term, COUNT(*) AS df,
        |  array_to_string((list_sort(list(doc_id)))[1:100], ',') AS postings
        |FROM pairs GROUP BY term ORDER BY term""".stripMargin,
    "d11_substring_dup" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, i, array_to_string(ws[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-7)) AS i
        |        FROM toks WHERE len(ws) >= 8)),
        |dup AS (SELECT g FROM g GROUP BY g HAVING MIN(doc_id) <> MAX(doc_id)),
        |cov AS (SELECT doc_id, COUNT(DISTINCT pos) AS n_dup_tokens
        |        FROM (SELECT doc_id, unnest(generate_series(i, i+7)) AS pos
        |              FROM g JOIN dup USING (g))
        |        GROUP BY doc_id)
        |SELECT t.doc_id, len(t.ws) AS n_tokens,
        |  COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens,
        |  CAST(COALESCE(c.n_dup_tokens, 0) AS DOUBLE) / CAST(len(t.ws) AS DOUBLE) AS dup_frac
        |FROM toks t LEFT JOIN cov c USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "ovl1_source_overlap" ->
      """WITH toks AS (SELECT source, string_split(text,' ') AS ws FROM documents),
        |st AS (SELECT DISTINCT source, array_to_string(ws[i:i+2],' ') AS g
        |       FROM (SELECT source, ws, unnest(generate_series(1, len(ws)-2)) AS i
        |             FROM toks WHERE len(ws) >= 3)),
        |sz AS (SELECT source, COUNT(*) AS n FROM st GROUP BY source),
        |inter AS (SELECT a.source AS sa, b.source AS sb, COUNT(*) AS nc
        |          FROM st a JOIN st b ON a.g = b.g AND a.source < b.source
        |          GROUP BY 1,2),
        |pairs AS (SELECT za.source AS sa, zb.source AS sb, za.n AS n_a, zb.n AS n_b
        |          FROM sz za JOIN sz zb ON za.source < zb.source)
        |SELECT p.sa AS src_a, p.sb AS src_b, p.n_a, p.n_b,
        |  COALESCE(i.nc, 0) AS n_common,
        |  CAST(COALESCE(i.nc, 0) AS DOUBLE)/CAST(p.n_a AS DOUBLE) AS containment_a,
        |  CAST(COALESCE(i.nc, 0) AS DOUBLE)/CAST(p.n_b AS DOUBLE) AS containment_b,
        |  CAST(COALESCE(i.nc, 0) AS DOUBLE)/CAST(p.n_a + p.n_b - COALESCE(i.nc, 0) AS DOUBLE) AS jaccard
        |FROM pairs p LEFT JOIN inter i ON p.sa = i.sa AND p.sb = i.sb
        |ORDER BY src_a, src_b""".stripMargin,
    "hyb1_rrf_fusion" ->
      s"""WITH $qCte,
         |d AS (SELECT doc_id, len(ws) AS dl,
         |    len(list_filter(ws, w -> w = 'spark')) AS tf1,
         |    len(list_filter(ws, w -> w = 'vector')) AS tf2,
         |    len(list_filter(ws, w -> w = 'customer')) AS tf3
         |  FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents)),
         |st AS (SELECT COUNT(*) AS n, SUM(dl) AS l,
         |    SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         |    SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
         |    SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3 FROM d),
         |s AS (SELECT doc_id, dl, tf1, tf2, tf3,
         |    CAST(l AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl,
         |    (CAST(n - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5) AS idf1,
         |    (CAST(n - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5) AS idf2,
         |    (CAST(n - df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5) AS idf3
         |  FROM d, st),
         |tscore AS (SELECT doc_id,
         |    (idf1 * ((CAST(tf1 AS DOUBLE) * 2.2) / (CAST(tf1 AS DOUBLE) + (1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / avgdl)))))
         |  + (idf2 * ((CAST(tf2 AS DOUBLE) * 2.2) / (CAST(tf2 AS DOUBLE) + (1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / avgdl)))))
         |  + (idf3 * ((CAST(tf3 AS DOUBLE) * 2.2) / (CAST(tf3 AS DOUBLE) + (1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / avgdl))))) AS score
         |  FROM s),
         |ttop AS (SELECT doc_id, score FROM tscore ORDER BY score DESC, doc_id LIMIT 50),
         |trank AS (SELECT doc_id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS t_rank
         |  FROM ttop),
         |vrank AS (SELECT doc_id, v_rank FROM (
         |  SELECT b.vec_id AS doc_id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY $simExpr DESC, b.vec_id) AS BIGINT) AS v_rank
         |  FROM p a JOIN p b ON a.vec_id = 0 AND b.vec_id <> 0)
         |  WHERE v_rank <= 50),
         |f AS (SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id, t.t_rank, v.v_rank
         |  FROM trank t FULL OUTER JOIN vrank v ON t.doc_id = v.doc_id)
         |SELECT doc_id, t_rank, v_rank,
         |  COALESCE(1.0 / (60.0 + CAST(t_rank AS DOUBLE)), CAST(0.0 AS DOUBLE))
         |    + COALESCE(1.0 / (60.0 + CAST(v_rank AS DOUBLE)), CAST(0.0 AS DOUBLE)) AS rrf
         |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "srch1_bm25" ->
      """WITH d AS (SELECT doc_id, len(ws) AS dl,
        |    len(list_filter(ws, w -> w = 'spark')) AS tf1,
        |    len(list_filter(ws, w -> w = 'vector')) AS tf2,
        |    len(list_filter(ws, w -> w = 'customer')) AS tf3
        |  FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents)),
        |st AS (SELECT COUNT(*) AS n, SUM(dl) AS l,
        |    SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |    SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
        |    SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3 FROM d),
        |s AS (SELECT doc_id, dl, tf1, tf2, tf3,
        |    CAST(l AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl,
        |    (CAST(n - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5) AS idf1,
        |    (CAST(n - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5) AS idf2,
        |    (CAST(n - df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5) AS idf3
        |  FROM d, st)
        |SELECT doc_id, tf1, tf2, tf3,
        |    (idf1 * ((CAST(tf1 AS DOUBLE) * 2.2) / (CAST(tf1 AS DOUBLE) + (1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / avgdl)))))
        |  + (idf2 * ((CAST(tf2 AS DOUBLE) * 2.2) / (CAST(tf2 AS DOUBLE) + (1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / avgdl)))))
        |  + (idf3 * ((CAST(tf3 AS DOUBLE) * 2.2) / (CAST(tf3 AS DOUBLE) + (1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / avgdl))))) AS score
        |FROM s ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "t1_langid" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    len(list_intersect(list_distinct(string_split(text,' ')), ['the','a','is','of','and','fast','slow'])) AS en,
        |    len(list_intersect(list_distinct(string_split(text,' ')), ['der','die','das','und','ist'])) AS de,
        |    len(list_intersect(list_distinct(string_split(text,' ')), ['el','la','los','es','y'])) AS es,
        |    len(list_intersect(list_distinct(string_split(text,' ')), ['le','la','les','est','et'])) AS fr,
        |    len(list_intersect(list_distinct(string_split(text,' ')), ['的','是','在'])) AS zh
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN greatest(en,de,es,fr,zh) = 0 THEN 'und'
        |       WHEN en = greatest(en,de,es,fr,zh) THEN 'en'
        |       WHEN de = greatest(en,de,es,fr,zh) THEN 'de'
        |       WHEN es = greatest(en,de,es,fr,zh) THEN 'es'
        |       WHEN fr = greatest(en,de,es,fr,zh) THEN 'fr'
        |       ELSE 'zh' END AS predicted,
        |  en AS en_hits
        |FROM scored ORDER BY doc_id""".stripMargin,
    "t2_quality" ->
      """SELECT doc_id,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_distinct,
        |  CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / CAST(len(string_split(text,' ')) AS DOUBLE) AS ttr,
        |  CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio,
        |  CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'))) AS DOUBLE)
        |    / CAST(len(string_split(text,' ')) AS DOUBLE) AS stopword_ratio,
        |  CAST(0.5 AS DOUBLE) * (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / CAST(len(string_split(text,' ')) AS DOUBLE))
        |    + CAST(0.5 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), CAST(len(string_split(text,' ')) AS DOUBLE) / CAST(100.0 AS DOUBLE)) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t3_tokens" ->
      """SELECT doc_id,
        |  length(text) AS n_chars_measured,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t4_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t5_rolling_fingerprint" ->
      """WITH rolls AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(ws)-2),
        |    i -> ((('0x'||substr(md5(ws[i]),1,8))::BIGINT)*4096
        |        + (('0x'||substr(md5(ws[i+1]),1,8))::BIGINT)*64
        |        + (('0x'||substr(md5(ws[i+2]),1,8))::BIGINT)) % 1000003)) AS r
        |  FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents))
        |SELECT d.doc_id, COALESCE(s.sketch, '') AS sketch
        |FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN (
        |  SELECT doc_id,
        |    array_to_string(list_sort(list_distinct(list(r)))[1:8], ',') AS sketch
        |  FROM rolls WHERE r IS NOT NULL GROUP BY doc_id) s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "d1_exact_dup" ->
      """SELECT md5(array_to_string((string_split(text,' '))[1:5], ' ')) AS dup_key,
        |  COUNT(*) AS group_size,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY CAST(doc_id AS VARCHAR)) AS members
        |FROM documents
        |GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY dup_key""".stripMargin,
    "d2_minhash" ->
      s"WITH $sigCte\nSELECT * FROM sig ORDER BY doc_id",
    "d2b_lsh_pairs" ->
      s"WITH $sigCte,\n$bandedCte\nSELECT id_a, id_b FROM cand ORDER BY id_a, id_b",
    "d14_incremental_lsh" ->
      s"""WITH $sigCte,
         |$bandedCte,
         |nw AS (SELECT doc_id FROM sig
         |  WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10 = 0)
         |SELECT id_a, id_b FROM cand
         |WHERE id_a IN (SELECT doc_id FROM nw) OR id_b IN (SELECT doc_id FROM nw)
         |ORDER BY id_a, id_b""".stripMargin,
    "d3_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $tokH AS h
         |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS w FROM documents)),
         |votes AS (
         |  SELECT doc_id, bit, SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM toks, (SELECT unnest(generate_series(0,31)) AS bit)
         |  GROUP BY doc_id, bit)
         |SELECT doc_id,
         |  CAST(SUM(CASE WHEN v >= 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END) AS BIGINT) AS simhash
         |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d3b_simhash_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $tokH AS h
         |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS w FROM documents)),
         |votes AS (
         |  SELECT doc_id, bit, SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
         |  FROM toks, (SELECT unnest(generate_series(0,31)) AS bit)
         |  GROUP BY doc_id, bit),
         |sh AS (
         |  SELECT doc_id,
         |    CAST(SUM(CASE WHEN v >= 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END) AS BIGINT) AS simhash
         |  FROM votes GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, simhash, b, (simhash >> (b*8)) & 255 AS byte
         |  FROM sh, (SELECT unnest(generate_series(0,3)) AS b)),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         |    l.simhash AS sa, r.simhash AS sb
         |  FROM bands l JOIN bands r
         |    ON l.b = r.b AND l.byte = r.byte AND l.doc_id < r.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "d4_jaccard_pairs" ->
      s"""WITH $sigCte,
         |$bandedCte,
         |toks AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(string_split(text,' '))-2),
         |    i -> array_to_string((string_split(text,' '))[i:i+2], ' ')))) AS w FROM documents),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
         |inter AS (
         |  SELECT c.id_a, c.id_b, COUNT(*) AS i
         |  FROM cand c JOIN toks ta ON ta.doc_id = c.id_a
         |              JOIN toks tb ON tb.doc_id = c.id_b AND tb.w = ta.w
         |  GROUP BY c.id_a, c.id_b)
         |SELECT c.id_a, c.id_b,
         |  CAST(COALESCE(i.i,0) AS DOUBLE) / CAST(sa.n + sb.n - COALESCE(i.i,0) AS DOUBLE) AS jaccard
         |FROM cand c
         |LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
         |JOIN sizes sa ON sa.doc_id = c.id_a
         |JOIN sizes sb ON sb.doc_id = c.id_b
         |WHERE CAST(COALESCE(i.i,0) AS DOUBLE) / CAST(sa.n + sb.n - COALESCE(i.i,0) AS DOUBLE) >= 0.5
         |ORDER BY c.id_a, c.id_b""".stripMargin,
    "d6_dup_clusters" ->
      s"""WITH RECURSIVE $clustersCte
         |SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id""".stripMargin,
    "d8_cluster_pick" ->
      s"""WITH RECURSIVE $clustersCte,
         |q AS (
         |  SELECT doc_id,
         |    CAST(0.5 AS DOUBLE) * (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / CAST(len(string_split(text,' ')) AS DOUBLE))
         |      + CAST(0.5 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), CAST(len(string_split(text,' ')) AS DOUBLE) / CAST(100.0 AS DOUBLE)) AS quality
         |  FROM documents)
         |SELECT c.doc_id, c.cluster_id, q.quality,
         |  (ROW_NUMBER() OVER (PARTITION BY c.cluster_id ORDER BY q.quality DESC, c.doc_id) = 1) AS keep
         |FROM clusters c JOIN q ON c.doc_id = q.doc_id
         |ORDER BY c.cluster_id, c.doc_id""".stripMargin,
    "t8_gopher_rules" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    len(string_split(text,' ')) AS n_words,
        |    CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
        |      / CAST(len(string_split(text,' ')) AS DOUBLE) AS mean_word_len,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS digit_char_frac
        |  FROM documents)
        |SELECT doc_id, n_words, mean_word_len, digit_char_frac,
        |  (n_words >= 50 AND n_words <= 100000 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "pk1_pack_chunks" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 8 AS bucket,
        |    len(string_split(text,' ')) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, bucket, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM b)
        |SELECT doc_id, bucket, n_tokens,
        |  CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS chunk
        |FROM c ORDER BY doc_id""".stripMargin,
    "ch1_chunk_docs" ->
      """WITH p AS (
        |  SELECT doc_id, text,
        |    UNNEST(generate_series(1, GREATEST(n_chars, 1), 400)) AS pos
        |  FROM documents)
        |SELECT doc_id,
        |  CAST((pos - 1) // 400 AS INT) AS chunk_idx,
        |  md5(substr(text, CAST(pos AS INT), 500)) AS chunk_md5,
        |  CAST(len(substr(text, CAST(pos AS INT), 500)) AS BIGINT) AS chunk_len
        |FROM p ORDER BY doc_id, chunk_idx""".stripMargin,
    "t10_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(string_split(text,' '))-2),
        |    i -> array_to_string((string_split(text,' '))[i:i+2], ' ')))) AS w FROM documents),
        |nd AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY 1)
        |SELECT t.doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN nd.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST((CAST(SUM(CASE WHEN nd.c = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |    // COUNT(*) AS BIGINT) AS novelty_ppm
        |FROM toks t JOIN nd ON t.w = nd.w
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t9_length_stats" ->
      """WITH ranked AS (
        |  SELECT lang, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT lang, MIN(n) AS n_docs,
        |  MIN(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN n_chars END) AS p50_chars,
        |  MIN(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN n_chars END) AS p90_chars,
        |  MAX(n_chars) AS max_chars
        |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin,
    "e1_quantize_export" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> greatest(-127::BIGINT, least(127::BIGINT, CAST(round(CAST(x AS DOUBLE)*127) AS BIGINT)))) AS q8
        |  FROM embeddings)
        |SELECT vec_id,
        |  array_to_string(list_transform(q8, v -> CAST(v AS VARCHAR)), ',') AS q8csv,
        |  CAST(list_sum(list_transform(q8, v -> v*v)) AS BIGINT) AS l2q8
        |FROM q ORDER BY vec_id""".stripMargin,
    "d5_embed_dup" ->
      s"""WITH $qCte
         |SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b
         |FROM p a JOIN p b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE $simExpr > 0.35
         |ORDER BY a.label, id_a, id_b""".stripMargin,
    "d9_semantic_dedup" ->
      s"""WITH $qCte,
         |cents AS (SELECT vec_id AS cid, qv AS kv, nrm AS knrm FROM p WHERE vec_id < 8),
         |assign AS (
         |  SELECT vec_id, qv, nrm, cid FROM (
         |    SELECT p.vec_id, p.qv, p.nrm, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
         |        c.cid) AS crn
         |    FROM p CROSS JOIN cents c) WHERE crn = 1),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id FROM assign a JOIN assign b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE $simExpr > 0.35)
         |SELECT a.vec_id, a.cid AS cluster,
         |  a.vec_id NOT IN (SELECT vec_id FROM dropped) AS keep
         |FROM assign a ORDER BY a.vec_id""".stripMargin,
    "d10_boilerplate_scrub" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |idx AS (SELECT doc_id, ws,
        |  unnest(generate_series(1, CAST(ceil(len(ws)/3.0) AS BIGINT))) AS ci FROM base),
        |chunks AS (SELECT doc_id, ci,
        |  array_to_string(ws[(ci-1)*3+1 : least(ci*3, len(ws))], ' ') AS chunk FROM idx),
        |hot AS (SELECT chunk FROM chunks GROUP BY chunk HAVING COUNT(DISTINCT doc_id) > 3),
        |flagged AS (SELECT c.doc_id, c.ci, c.chunk, h.chunk IS NOT NULL AS is_hot
        |  FROM chunks c LEFT JOIN hot h USING (chunk))
        |SELECT doc_id,
        |  COUNT(*) AS n_chunks,
        |  COUNT(*) FILTER (WHERE is_hot) AS n_dropped,
        |  COALESCE(string_agg(chunk, ' ' ORDER BY ci) FILTER (WHERE NOT is_hot), '') AS scrubbed
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d5b_embed_dup_lsh" ->
      s"""WITH $qCte,
         |bkt AS (
         |  SELECT *,
         |    (CASE WHEN qv[1] >= 0 THEN 1 ELSE 0 END) + (CASE WHEN qv[2] >= 0 THEN 2 ELSE 0 END)
         |    + (CASE WHEN qv[3] >= 0 THEN 4 ELSE 0 END) + (CASE WHEN qv[4] >= 0 THEN 8 ELSE 0 END)
         |    + (CASE WHEN qv[5] >= 0 THEN 16 ELSE 0 END) + (CASE WHEN qv[6] >= 0 THEN 32 ELSE 0 END) AS bucket
         |  FROM p)
         |SELECT a.bucket, a.vec_id AS id_a, b.vec_id AS id_b
         |FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE $simExpr > 0.35
         |ORDER BY a.bucket, id_a, id_b""".stripMargin,
    "sim1_topk" ->
      s"""WITH $qCte,
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $simExpr DESC, b.vec_id) AS rank
         |  FROM p a JOIN p b ON a.vec_id < 10 AND b.vec_id <> a.vec_id)
         |SELECT query_id, neighbor_id, rank FROM scored
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "sim5_sq8_topk" ->
      s"""WITH $sq8Cte,
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $sim8Expr DESC,
         |      b.vec_id) AS rank
         |  FROM p8 a JOIN p8 b ON a.vec_id < 10 AND b.vec_id <> a.vec_id)
         |SELECT query_id, neighbor_id, rank FROM scored
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "sim6_ivf_sq8" ->
      s"""WITH $qCte,
         |$sq8Cte,
         |cents AS (SELECT vec_id AS cid, qv AS kv, nrm AS knrm FROM p WHERE vec_id < 8),
         |corpus_assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT p.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
         |        c.cid) AS crn
         |    FROM p CROSS JOIN cents c) WHERE crn = 1),
         |query_assign AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT p.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
         |        c.cid) AS crn
         |    FROM p CROSS JOIN cents c WHERE p.vec_id < 10) WHERE crn <= 2),
         |ca8 AS (SELECT a.vec_id, a.cid, b.qv8, b.nrm8
         |  FROM corpus_assign a JOIN p8 b ON a.vec_id = b.vec_id),
         |qa8 AS (SELECT a.vec_id, a.cid, b.qv8, b.nrm8
         |  FROM query_assign a JOIN p8 b ON a.vec_id = b.vec_id),
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $sim8Expr DESC,
         |      b.vec_id) AS rank
         |  FROM qa8 a JOIN ca8 b ON a.cid = b.cid AND b.vec_id <> a.vec_id)
         |SELECT query_id, neighbor_id, rank FROM scored
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "sim8_ivf_pq" ->
      s"""WITH $qCte,
         |cents AS (SELECT vec_id AS cid, qv AS kv, nrm AS knrm FROM p WHERE vec_id < 8),
         |corpus_assign AS (
         |  SELECT vec_id, cid, kv FROM (
         |    SELECT p.vec_id, c.cid, c.kv,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
         |        c.cid) AS crn
         |    FROM p CROSS JOIN cents c) WHERE crn = 1),
         |res AS (
         |  SELECT a.vec_id, a.cid,
         |    list_transform(list_zip(p.qv, a.kv), z -> CAST(z[1] AS BIGINT) - z[2]) AS r
         |  FROM corpus_assign a JOIN p ON p.vec_id = a.vec_id),
         |grid AS (
         |  SELECT vec_id, cid, mm.m AS m, kk.k AS k,
         |    list_sum(list_transform(range(0, 8), j ->
         |      (r[mm.m*8 + j + 1] - ((((mm.m*131 + kk.k*31 + j*17 + 7) % 97) - 48) * 62)) *
         |      (r[mm.m*8 + j + 1] - ((((mm.m*131 + kk.k*31 + j*17 + 7) % 97) - 48) * 62)))) AS d
         |  FROM res, (SELECT unnest(range(0, 8)) AS m) mm,
         |            (SELECT unnest(range(0, 16)) AS k) kk),
         |codes AS (
         |  SELECT vec_id, cid, m, k FROM (
         |    SELECT vec_id, cid, m, k,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
         |    FROM grid) t WHERE rn = 1),
         |query_assign AS (
         |  SELECT vec_id, cid, kv FROM (
         |    SELECT p.vec_id, c.cid, c.kv,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
         |        c.cid) AS crn
         |    FROM p CROSS JOIN cents c WHERE p.vec_id < 10) WHERE crn <= 2),
         |qres AS (
         |  SELECT a.vec_id, a.cid,
         |    list_transform(list_zip(p.qv, a.kv), z -> CAST(z[1] AS BIGINT) - z[2]) AS qr
         |  FROM query_assign a JOIN p ON p.vec_id = a.vec_id),
         |dist AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(SUM(list_sum(list_transform(range(0, 8), j ->
         |      (q.qr[c.m*8 + j + 1] - ((((c.m*131 + c.k*31 + j*17 + 7) % 97) - 48) * 62)) *
         |      (q.qr[c.m*8 + j + 1] - ((((c.m*131 + c.k*31 + j*17 + 7) % 97) - 48) * 62))))) AS BIGINT) AS pq_dist
         |  FROM qres q JOIN codes c ON c.cid = q.cid AND c.vec_id <> q.vec_id
         |  GROUP BY q.vec_id, c.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, pq_dist,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY pq_dist, neighbor_id) AS rank
         |  FROM dist)
         |SELECT query_id, neighbor_id, pq_dist, rank FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "sim2_ann_bucket" ->
      s"""WITH $qCte,
         |bkt AS (
         |  SELECT *,
         |    (CASE WHEN qv[1] >= 0 THEN 1 ELSE 0 END) + (CASE WHEN qv[2] >= 0 THEN 2 ELSE 0 END)
         |    + (CASE WHEN qv[3] >= 0 THEN 4 ELSE 0 END) + (CASE WHEN qv[4] >= 0 THEN 8 ELSE 0 END) AS b
         |  FROM p),
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $simExpr DESC, b.vec_id) AS rank
         |  FROM bkt a JOIN bkt b ON a.b = b.b AND a.vec_id < 20 AND b.vec_id <> a.vec_id)
         |SELECT query_id, neighbor_id, rank FROM scored
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "sim3_ivf_topk" ->
      s"""WITH $qCte,
         |cents AS (SELECT vec_id AS cid, qv AS kv, nrm AS knrm FROM p WHERE vec_id < 8),
         |corpus_assign AS (
         |  SELECT vec_id, qv, nrm, cid FROM (
         |    SELECT p.vec_id, p.qv, p.nrm, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
         |        c.cid) AS crn
         |    FROM p CROSS JOIN cents c) WHERE crn = 1),
         |query_assign AS (
         |  SELECT vec_id, qv, nrm, cid FROM (
         |    SELECT p.vec_id, p.qv, p.nrm, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
         |        c.cid) AS crn
         |    FROM p CROSS JOIN cents c WHERE p.vec_id < 10) WHERE crn <= 2),
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $simExpr DESC, b.vec_id) AS rank
         |  FROM query_assign a JOIN corpus_assign b
         |    ON a.cid = b.cid AND b.vec_id <> a.vec_id)
         |SELECT query_id, neighbor_id, rank FROM scored
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "sim9_ivf_trained" ->
      s"""WITH $qCte,
         |cents0 AS (SELECT vec_id AS cid, qv AS kv, nrm AS knrm FROM p WHERE vec_id < 8),
         |${kmRoundCtes("cents0", 1)},
         |${kmRoundCtes("cents1", 2)},
         |corpus_assign AS (
         |  SELECT vec_id, qv, nrm, cid FROM (
         |    SELECT p.vec_id, p.qv, p.nrm, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
         |        c.cid) AS crn
         |    FROM p CROSS JOIN cents2 c) WHERE crn = 1),
         |query_assign AS (
         |  SELECT vec_id, qv, nrm, cid FROM (
         |    SELECT p.vec_id, p.qv, p.nrm, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
         |        c.cid) AS crn
         |    FROM p CROSS JOIN cents2 c WHERE p.vec_id < 10) WHERE crn <= 2),
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $simExpr DESC, b.vec_id) AS rank
         |  FROM query_assign a JOIN corpus_assign b
         |    ON a.cid = b.cid AND b.vec_id <> a.vec_id)
         |SELECT query_id, neighbor_id, rank FROM scored
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "sim4_kmeans_update" ->
      s"""WITH $qCte,
         |cents AS (SELECT vec_id AS cid, qv AS kv, nrm AS knrm FROM p WHERE vec_id < 8),
         |assign AS (
         |  SELECT vec_id, qv, cid FROM (
         |    SELECT p.vec_id, p.qv, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
         |        c.cid) AS crn
         |    FROM p CROSS JOIN cents c) WHERE crn = 1),
         |parts AS (
         |  SELECT cid, unnest(generate_series(1, len(qv))) - 1 AS dim, unnest(qv) AS v
         |  FROM assign)
         |SELECT cid, dim, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
         |  CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_q
         |FROM parts GROUP BY cid, dim ORDER BY cid, dim""".stripMargin,
    "d7_split_assign" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "smp1_stratified" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 5 = 0
        |ORDER BY doc_id""".stripMargin,
    "cur1_source_cap" ->
      """SELECT source, doc_id, n_chars, rank FROM (
        |  SELECT source, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents)
        |WHERE rank <= 10
        |ORDER BY source, rank""".stripMargin,
    "cur2_mixture_sample" ->
      """WITH counts AS (
        |  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY lang),
        |weights AS (
        |  SELECT 'en' AS lang, 0.4::DOUBLE AS w UNION ALL
        |  SELECT 'de', 0.2::DOUBLE UNION ALL SELECT 'es', 0.2::DOUBLE UNION ALL
        |  SELECT 'fr', 0.1::DOUBLE UNION ALL SELECT 'zh', 0.1::DOUBLE),
        |j AS (SELECT c.lang, n, w FROM counts c JOIN weights USING (lang)),
        |t AS (SELECT MIN(n / w) AS t FROM j),
        |rates AS (SELECT lang, least(1.0::DOUBLE, w * t.t / n) AS rate FROM j, t)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN rates USING (lang)
        |WHERE (('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,8))::BIGINT)::DOUBLE / 4294967296.0 < rate
        |ORDER BY d.doc_id""".stripMargin,
    "d13_contam_frac" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(string_split(text,' '))-2),
        |    i -> array_to_string((string_split(text,' '))[i:i+2], ' ')))) AS w
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, w,
        |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 AS bk
        |  FROM toks),
        |bench AS (SELECT DISTINCT w FROM b WHERE bk >= 90),
        |train AS (SELECT doc_id, w FROM b WHERE bk < 80)
        |SELECT t.doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN bench.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |  CAST(SUM(CASE WHEN bench.w IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS contam_frac
        |FROM train t LEFT JOIN bench ON t.w = bench.w
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "sim7_pq_adc" ->
      """WITH qv AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*10000) AS BIGINT)) AS q
        |  FROM embeddings),
        |grid AS (
        |  SELECT vec_id, mm.m AS m, kk.k AS k,
        |    list_sum(list_transform(range(0, 8), j ->
        |      (q[mm.m*8 + j + 1] - ((((mm.m*131 + kk.k*31 + j*17 + 7) % 97) - 48) * 62)) *
        |      (q[mm.m*8 + j + 1] - ((((mm.m*131 + kk.k*31 + j*17 + 7) % 97) - 48) * 62)))) AS d
        |  FROM qv, (SELECT unnest(range(0, 8)) AS m) mm,
        |            (SELECT unnest(range(0, 16)) AS k) kk),
        |best AS (
        |  SELECT vec_id, m, k FROM (
        |    SELECT vec_id, m, k,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
        |    FROM grid) t
        |  WHERE rn = 1),
        |adc AS (
        |  SELECT vec_id, list(k ORDER BY m) AS codes,
        |    CAST(SUM(list_sum(list_transform(range(0, 8), j ->
        |      ((((m*8 + j)*37 + 11) % 89 - 44) * 68 - ((((m*131 + k*31 + j*17 + 7) % 97) - 48) * 62)) *
        |      ((((m*8 + j)*37 + 11) % 89 - 44) * 68 - ((((m*131 + k*31 + j*17 + 7) % 97) - 48) * 62))))) AS BIGINT) AS pq_dist
        |  FROM best GROUP BY vec_id)
        |SELECT vec_id, array_to_string(codes, ',') AS codes, pq_dist FROM adc
        |ORDER BY pq_dist, vec_id LIMIT 20""".stripMargin,
    "cur3_temp_mixture" ->
      """WITH tok AS (
        |  SELECT source, CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |sq AS (SELECT source, n_tokens,
        |  CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s FROM tok),
        |tot AS (SELECT CAST(SUM(s) AS BIGINT) AS s_total FROM sq)
        |SELECT source, n_tokens, s,
        |  CAST(s AS DOUBLE) / CAST(s_total AS DOUBLE) AS p,
        |  (s * 100000) // s_total AS target_tokens,
        |  least(1.0, CAST((s * 100000) // s_total AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS rate
        |FROM sq, tot ORDER BY source""".stripMargin,
    "cur4_mixture_draw" ->
      """WITH tok AS (
        |  SELECT source, doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |src AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tok FROM tok GROUP BY source),
        |sq AS (SELECT source, src_tok,
        |  CAST(floor(sqrt(CAST(src_tok AS DOUBLE))) AS BIGINT) AS s FROM src),
        |tot AS (SELECT CAST(SUM(s) AS BIGINT) AS s_total FROM sq),
        |alloc AS (SELECT source, src_tok, (100000 * s) // s_total AS alloc_tok FROM sq, tot),
        |drawn AS (
        |  SELECT t.source, t.n_tok FROM tok t JOIN alloc a USING (source)
        |  WHERE (('0x'||substr(md5(CAST(t.doc_id AS VARCHAR)),1,8))::BIGINT % 1000000)
        |        * a.src_tok < a.alloc_tok * 1000000),
        |agg AS (SELECT source, COUNT(*) AS n_sel,
        |  CAST(SUM(n_tok) AS BIGINT) AS tok_sel FROM drawn GROUP BY source)
        |SELECT a.source, a.src_tok, a.alloc_tok,
        |  COALESCE(g.n_sel, 0) AS n_sel, COALESCE(g.tok_sel, 0) AS tok_sel
        |FROM alloc a LEFT JOIN agg g USING (source) ORDER BY a.source""".stripMargin,
    "cur5_dsir_weights" ->
      """WITH toks AS (SELECT doc_id, source, unnest(string_split(text,' ')) AS w
        |  FROM documents),
        |tb AS (SELECT doc_id, source,
        |    (('0x'||substr(md5(w),1,8))::BIGINT) % 1024 AS b FROM toks),
        |bc AS (SELECT b, COUNT(*) AS cnt_r,
        |    COUNT(*) FILTER (WHERE source IN ('src0','src1')) AS cnt_t
        |  FROM tb GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS rtot,
        |    COUNT(*) FILTER (WHERE source IN ('src0','src1')) AS ttot FROM tb),
        |wb AS (SELECT b,
        |    ((cnt_t + 1) * (rtot + 1024) * 10000) // ((cnt_r + 1) * (ttot + 1024)) AS w_b
        |  FROM bc, tot),
        |sc AS (SELECT tb.doc_id, tb.source, COUNT(*) AS n_tokens, SUM(w_b) AS sw
        |  FROM tb JOIN wb USING (b) GROUP BY 1, 2)
        |SELECT doc_id, source, n_tokens, CAST(sw // n_tokens AS BIGINT) AS score
        |FROM sc ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,
    "cur6_curation_funnel" ->
      """WITH base AS (SELECT doc_id, source, n_chars, md5(text) AS key,
        |    len(string_split(text,' ')) AS nt,
        |    CAST(length(text) - (len(string_split(text,' ')) - 1) AS DOUBLE)
        |      / CAST(len(string_split(text,' ')) AS DOUBLE) AS wl
        |  FROM documents),
        |s1 AS (SELECT * FROM base
        |  WHERE nt >= 50 AND nt <= 100000 AND wl >= 3.0 AND wl <= 10.0),
        |s2 AS (SELECT * FROM (
        |    SELECT *, MIN(doc_id) OVER (PARTITION BY key) AS mn FROM s1)
        |  WHERE doc_id = mn),
        |s3 AS (SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rk FROM s2)
        |  WHERE rk <= 15),
        |sq AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS src_tok,
        |    CAST(FLOOR(SQRT(CAST(SUM(nt) AS DOUBLE))) AS BIGINT) AS s
        |  FROM s3 GROUP BY source),
        |tot AS (SELECT CAST(SUM(s) AS BIGINT) AS s_total FROM sq),
        |alloc AS (SELECT source, src_tok, (8000 * s) // s_total AS alloc_tok
        |  FROM sq, tot),
        |s4 AS (SELECT t.* FROM s3 t JOIN alloc a USING (source)
        |  WHERE (('0x'||substr(md5(CAST(t.doc_id AS VARCHAR)),1,8))::BIGINT % 1000000)
        |        * a.src_tok < a.alloc_tok * 1000000)
        |SELECT 0 AS stage, 'raw' AS stage_name, COUNT(*) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS n_tokens FROM base
        |UNION ALL SELECT 1, 'gopher', COUNT(*), CAST(SUM(nt) AS BIGINT) FROM s1
        |UNION ALL SELECT 2, 'exact_dedupe', COUNT(*), CAST(SUM(nt) AS BIGINT) FROM s2
        |UNION ALL SELECT 3, 'source_cap', COUNT(*), CAST(SUM(nt) AS BIGINT) FROM s3
        |UNION ALL SELECT 4, 'mixture_draw', COUNT(*), CAST(SUM(nt) AS BIGINT) FROM s4
        |ORDER BY stage""".stripMargin,
    "qc2_perceptron" ->
      """WITH toks AS (SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
        |    unnest(string_split(text,' ')) AS w FROM documents),
        |tb AS (SELECT doc_id, y,
        |    (('0x'||substr(md5(w),1,8))::BIGINT) % 64 AS b, COUNT(*) AS x
        |  FROM toks GROUP BY 1, 2, 3),
        |w1 AS (SELECT b, CAST(SUM(y*x) AS BIGINT) AS w FROM tb GROUP BY b),
        |s2 AS (SELECT tb.doc_id, MAX(tb.y) AS y,
        |    SUM(tb.x * COALESCE(w1.w, 0)) AS score
        |  FROM tb LEFT JOIN w1 USING (b) GROUP BY tb.doc_id),
        |mis AS (SELECT doc_id FROM s2 WHERE y * score <= 0),
        |upd AS (SELECT tb.b, CAST(SUM(tb.y * tb.x) AS BIGINT) AS dw
        |  FROM tb JOIN mis USING (doc_id) GROUP BY tb.b),
        |grid AS (SELECT unnest(range(0,64)) AS bucket)
        |SELECT grid.bucket, COALESCE(w1.w, 0) AS w1,
        |  COALESCE(w1.w, 0) + COALESCE(upd.dw, 0) AS w2
        |FROM grid LEFT JOIN w1 ON w1.b = grid.bucket
        |LEFT JOIN upd ON upd.b = grid.bucket
        |ORDER BY grid.bucket""".stripMargin,
    "tok2_bpe_merges" ->
      s"""WITH s0 AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
         |t0 AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos,
         |  unnest(ws) AS w FROM s0),
         |${bpeRoundCtes("t0", "t1", 1)},
         |${bpeRoundCtes("t1", "t2", 2)},
         |c0 AS (SELECT COUNT(*) AS n FROM t0),
         |c1 AS (SELECT COUNT(*) AS n FROM t1),
         |c2 AS (SELECT COUNT(*) AS n FROM t2)
         |SELECT 1 AS round, top1.a || ' ' || top1.b AS pair, top1.n_pair,
         |  c0.n - c1.n AS n_merged, c1.n AS tokens_after FROM top1, c0, c1
         |UNION ALL
         |SELECT 2, top2.a || ' ' || top2.b, top2.n_pair, c1.n - c2.n, c2.n
         |FROM top2, c1, c2
         |ORDER BY round""".stripMargin,
    "sim10_recall" ->
      s"""WITH $qCte,
         |ex AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $simExpr DESC, b.vec_id) AS rank
         |    FROM p a JOIN p b ON a.vec_id < 10 AND b.vec_id <> a.vec_id) t
         |  WHERE rank <= 3),
         |cents AS (SELECT vec_id AS cid, qv AS kv, nrm AS knrm FROM p WHERE vec_id < 8),
         |corpus_assign AS (
         |  SELECT vec_id, qv, nrm, cid FROM (
         |    SELECT p.vec_id, p.qv, p.nrm, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
         |        c.cid) AS crn
         |    FROM p CROSS JOIN cents c) WHERE crn = 1),
         |query_assign AS (
         |  SELECT vec_id, qv, nrm, cid FROM (
         |    SELECT p.vec_id, p.qv, p.nrm, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(p.qv, c.kv), z -> CAST(z[1] AS BIGINT)*z[2])) AS DOUBLE) / sqrt(CAST(p.nrm*c.knrm AS DOUBLE)) DESC,
         |        c.cid) AS crn
         |    FROM p CROSS JOIN cents c WHERE p.vec_id < 10) WHERE crn <= 2),
         |iv AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $simExpr DESC, b.vec_id) AS rank
         |    FROM query_assign a JOIN corpus_assign b
         |      ON a.cid = b.cid AND b.vec_id <> a.vec_id) t
         |  WHERE rank <= 3)
         |SELECT ex.query_id, COUNT(*) AS k,
         |  CAST(COUNT(iv.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST(COUNT(iv.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
         |FROM ex LEFT JOIN iv
         |  ON ex.query_id = iv.query_id AND ex.neighbor_id = iv.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "qs1_hist_quantiles" ->
      """WITH b AS (
        |  SELECT source,
        |    least(CAST(len(string_split(text,' ')) AS BIGINT) // 32, 255) AS bin
        |  FROM documents),
        |h AS (SELECT source, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
        |cw AS (SELECT source, bin, c,
        |    SUM(c) OVER (PARTITION BY source ORDER BY bin
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(c) OVER (PARTITION BY source) AS total FROM h)
        |SELECT source, CAST(MAX(total) AS BIGINT) AS n_docs,
        |  MIN(CASE WHEN cum*100 >= total*50 THEN bin*32 END) AS p50_lo,
        |  MIN(CASE WHEN cum*100 >= total*90 THEN bin*32 END) AS p90_lo,
        |  MIN(CASE WHEN cum*100 >= total*99 THEN bin*32 END) AS p99_lo
        |FROM cw GROUP BY source ORDER BY source""".stripMargin,
    "t6_scrub" ->
      """WITH e AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 0
        |      THEN ' contact user' || doc_id || '@example.com or https://example.com/u/' || doc_id
        |      ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[a-z0-9.]+@[a-z0-9.]+')) AS n_emails,
        |  len(regexp_extract_all(t, 'https?://[a-z0-9./]+')) AS n_urls,
        |  md5(regexp_replace(regexp_replace(t, 'https?://[a-z0-9./]+', '<url>', 'g'), '[a-z0-9.]+@[a-z0-9.]+', '<email>', 'g')) AS scrubbed_md5
        |FROM e ORDER BY doc_id""".stripMargin,
    "dc1_decontam" ->
      """WITH rolls AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(ws)-2),
        |    i -> ((('0x'||substr(md5(ws[i]),1,8))::BIGINT)*4096
        |        + (('0x'||substr(md5(ws[i+1]),1,8))::BIGINT)*64
        |        + (('0x'||substr(md5(ws[i+2]),1,8))::BIGINT)) % 1000003)) AS r
        |  FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents)),
        |sk AS (
        |  SELECT doc_id, unnest(list_sort(list_distinct(list(r)))[1:8]) AS h
        |  FROM rolls WHERE r IS NOT NULL GROUP BY doc_id),
        |sp AS (
        |  SELECT doc_id,
        |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 AS b
        |  FROM documents),
        |pairs AS (
        |  SELECT te.doc_id AS test_id, tr.doc_id AS train_id, COUNT(*) AS n_shared
        |  FROM sk te JOIN sp spe ON te.doc_id = spe.doc_id AND spe.b >= 90
        |       JOIN sk tr ON tr.h = te.h
        |       JOIN sp spt ON tr.doc_id = spt.doc_id AND spt.b < 80
        |  GROUP BY te.doc_id, tr.doc_id HAVING COUNT(*) >= 4)
        |SELECT test_id AS doc_id, COUNT(*) AS n_contam_sources, MAX(n_shared) AS max_overlap
        |FROM pairs GROUP BY test_id ORDER BY doc_id""".stripMargin,
    "t7_repetition" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(string_split(text,' '))-4),
        |    i -> array_to_string((string_split(text,' '))[i:i+4], ' '))) AS w
        |  FROM documents)
        |SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT w) AS n_distinct,
        |  CAST(COUNT(*) - COUNT(DISTINCT w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rep_ratio
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "g1_top_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(string_split(text,' '))-2),
        |    i -> array_to_string((string_split(text,' '))[i:i+2], ' ')))) AS w
        |  FROM documents)
        |SELECT w AS ngram, COUNT(*) AS df FROM toks
        |GROUP BY w ORDER BY df DESC, ngram LIMIT 20""".stripMargin,
    "tok1_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
        |vocab AS (SELECT tok FROM (
        |  SELECT tok, COUNT(*) AS n FROM toks
        |  GROUP BY tok ORDER BY n DESC, tok LIMIT 1000)),
        |j AS (SELECT t.doc_id, v.tok AS vtok
        |      FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(SUM(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS oov_rate
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "mm2_frame_sample" ->
      """WITH b AS (
        |  SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    lower(hex(CAST(text AS BLOB))) AS hx,
        |    octet_length(CAST(text AS BLOB)) AS len
        |  FROM documents),
        |f AS (
        |  SELECT media_id, hx, len,
        |    unnest(generate_series(0, least(16, greatest(1, len // 64)) - 1)) AS fi
        |  FROM b)
        |SELECT media_id, CAST(fi AS INT) AS frame_idx, fi * 1000 AS frame_ms,
        |  substr(hx, CAST((fi * 64) % greatest(len, 1) AS BIGINT) * 2 + 1, 128) AS frame_hex
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    "mm4_pcm_bmp_decode" ->
      """WITH m AS (
        |  SELECT doc_id, doc_id % 16 + 4 AS n,
        |    doc_id % 4 + 1 AS w, doc_id % 3 + 1 AS h,
        |    (((doc_id % 4 + 1) * 3 + 3) // 4) * 4 AS row_size
        |  FROM documents),
        |wavs AS (
        |  SELECT doc_id, CAST(n AS INT) AS n_samples,
        |    CAST(list_max(list_transform(range(0, n), i ->
        |      abs(CASE WHEN (doc_id*131 + i*2311) % 65536 < 32768
        |           THEN (doc_id*131 + i*2311) % 65536
        |           ELSE (doc_id*131 + i*2311) % 65536 - 65536 END))) AS INT) AS peak,
        |    CAST(list_sum(list_transform(range(0, n), i ->
        |      abs(CASE WHEN (doc_id*131 + i*2311) % 65536 < 32768
        |           THEN (doc_id*131 + i*2311) % 65536
        |           ELSE (doc_id*131 + i*2311) % 65536 - 65536 END))) AS BIGINT) AS sum_abs
        |  FROM m WHERE doc_id % 2 = 0),
        |bmps AS (
        |  SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |    CAST(list_sum(list_transform(range(0, w*h), p ->
        |      (doc_id*13 + ((p // w)*row_size + 3*(p % w) + 2)*7) % 256)) AS BIGINT) AS sum_r,
        |    CAST(list_sum(list_transform(range(0, w*h), p ->
        |      (doc_id*13 + ((p // w)*row_size + 3*(p % w) + 1)*7) % 256)) AS BIGINT) AS sum_g,
        |    CAST(list_sum(list_transform(range(0, w*h), p ->
        |      (doc_id*13 + ((p // w)*row_size + 3*(p % w))*7) % 256)) AS BIGINT) AS sum_b
        |  FROM m WHERE doc_id % 2 = 1)
        |SELECT CAST(m.doc_id AS BIGINT) AS media_id,
        |  CASE WHEN m.doc_id % 2 = 0 THEN 'wav' ELSE 'bmp' END AS kind,
        |  wv.n_samples, wv.peak, wv.sum_abs,
        |  bp.width, bp.height, bp.sum_r, bp.sum_g, bp.sum_b
        |FROM m LEFT JOIN wavs wv USING (doc_id) LEFT JOIN bmps bp USING (doc_id)
        |ORDER BY media_id""".stripMargin,
    "mm3_media_probe" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
        |  CASE WHEN doc_id % 3 IN (0, 1) THEN CAST(doc_id % 1024 + 16 AS INT) END AS width,
        |  CASE WHEN doc_id % 3 IN (0, 1) THEN CAST((doc_id * 7) % 1024 + 16 AS INT) END AS height,
        |  CASE WHEN doc_id % 3 = 2 THEN CAST(doc_id % 40000 + 8000 AS INT) END AS sample_rate,
        |  CASE WHEN doc_id % 3 = 2 THEN CAST(doc_id % 2 + 1 AS INT) END AS channels
        |FROM documents ORDER BY media_id""".stripMargin,
    "mm1_media_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  octet_length(CAST(text AS BLOB)) AS byte_len,
        |  sha256(text) AS sha,
        |  CASE WHEN substr(lower(hex(CAST(text AS BLOB))),1,8) LIKE '89504e47%' THEN 'png'
        |       WHEN substr(lower(hex(CAST(text AS BLOB))),1,4) LIKE 'ffd8%' THEN 'jpeg'
        |       WHEN substr(lower(hex(CAST(text AS BLOB))),1,6) LIKE '494433%' THEN 'mp3'
        |       WHEN substr(lower(hex(CAST(text AS BLOB))),1,6) LIKE '000000%' THEN 'mp4'
        |       ELSE 'bin' END AS format,
        |  ('0x'||substr(sha256(text),1,4))::BIGINT AS fake_feature
        |FROM documents ORDER BY media_id""".stripMargin)
}
