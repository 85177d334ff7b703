package graft.dedupe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash signatures + LSH banding (near-dup candidate
  * generation without the quadratic join), SimHash bit-vector
  * fingerprints, and verified n-gram Jaccard.
  *
  * Scale shape: everything is hash-partitioned groupBy/join on derived
  * keys — at 100 TB the LSH band join shuffles only (band, bucket) keys,
  * never the quadratic pair space; candidate verification touches only
  * bucket-collision pairs. All hashes are md5-derived integer arithmetic
  * (exact, engine-portable, no floating point).
  */
object Dedupe {

  /** Stable 32-bit token hash: first 8 hex chars of md5 as unsigned int. */
  def tokenHash(token: Column): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long")

  /** Large prime > 2^32 for the universal-hash family. */
  val P = 4294967311L

  /** MinHash family member j (affine universal hashing mod P). */
  def hashParams(j: Int): (Long, Long) = (2L * j + 3L, 12345L + j)

  /** Per-document MinHash signature columns mh0..mh{k-1} over the given
    * distinct term set (unigram tokens or shingles). One explode + one groupBy — linear, no joins.
    */
  def minhashSignature(df: DataFrame, idCol: String, terms: Column, k: Int): DataFrame = {
    val toks = df.select(col(idCol), explode(terms).as("__tok"))
      .withColumn("__h", tokenHash(col("__tok")))
    val aggs = (0 until k).map { j =>
      val (a, b) = hashParams(j)
      min((col("__h") * a + b) % P).as(s"mh$j")
    }
    toks.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: split the k signature columns into bands of `rowsPerBand`
    * and emit one bucket key per band. Documents sharing any band bucket
    * become candidate pairs — the join runs on (band, bucket) keys, never
    * the full cross product.
    */
  def lshCandidatePairs(sig: DataFrame, idCol: String, k: Int, rowsPerBand: Int): DataFrame = {
    val bands = k / rowsPerBand
    val banded = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"mh$j"))
      sig.select(col(idCol), lit(b).as("band"),
        md5(concat_ws(",", cols: _*)).as("bucket"))
    }.reduce(_ unionByName _)
    banded.as("l").join(banded.as("r"),
      col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .distinct()
  }

  /** 32-bit SimHash over the distinct token set: per bit position, the
    * sign of the summed ±1 votes from each token's hash bit. Hamming-close
    * SimHashes ⇒ similar token sets. Integer-only — engine-portable.
    */
  def simhash32(df: DataFrame, idCol: String, terms: Column): DataFrame = {
    val toks = df.select(col(idCol), explode(terms).as("__tok"))
      .withColumn("__h", tokenHash(col("__tok")))
    toks
      .select(col(idCol), col("__h"), explode(sequence(lit(0), lit(31))).as("__bit"))
      .withColumn("__vote",
        when(expr("(__h >> __bit) & 1") === 1, lit(1)).otherwise(lit(-1)))
      .groupBy(col(idCol), col("__bit"))
      .agg(sum(col("__vote")).as("__votes"))
      .withColumn("__bitval",
        when(col("__votes") >= 0, expr("CAST(shiftleft(CAST(1 AS BIGINT), __bit) AS BIGINT)"))
          .otherwise(lit(0L)))
      .groupBy(col(idCol))
      .agg(sum(col("__bitval")).as("simhash"))
  }

  /** Exact-duplicate groups by an arbitrary key expression: groups with
    * >1 member, with sorted member lists. Pure hash aggregation.
    */
  def exactDupGroups(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.select(key.as("dup_key"), col(idCol).cast("string").as("__id"))
      .groupBy(col("dup_key"))
      .agg(count(lit(1)).as("group_size"),
        array_join(sort_array(collect_list(col("__id"))), ",").as("members"))
      .filter(col("group_size") > 1)

  /** Verified Jaccard over distinct token sets for candidate pairs
    * (id_a, id_b): |A∩B| / |A∪B| via an exploded token join — shuffles
    * only the tokens of candidate documents. The single final division is
    * order-independent, so the double is engine-deterministic.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, terms: Column,
      pairs: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"), explode(terms).as("__tok"))
    val sizes = toks.groupBy("__id").agg(count(lit(1)).as("__n"))
    val ta = toks.select(col("__id").as("id_a"), col("__tok"))
    val tb = toks.select(col("__id").as("id_b"), col("__tok"))
    val inter = pairs.join(ta, Seq("id_a")).join(tb, Seq("id_b", "__tok"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__inter"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left_outer")
      .na.fill(0L, Seq("__inter"))
      .join(sizes.select(col("__id").as("id_a"), col("__n").as("__na")), Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("__n").as("__nb")), Seq("id_b"))
      .withColumn("jaccard", col("__inter").cast("double") /
        (col("__na") + col("__nb") - col("__inter")).cast("double"))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
