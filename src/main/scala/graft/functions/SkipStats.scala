package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Named skip counters for the capped in-task pair loops (LSH buckets,
  * SimHash byte-bands, embedding blocks, xref blocking keys).
  *
  * Every one of those operators drops an oversized bucket in-task — the
  * signal-free-hot-block policy that bounds task memory at 100 TB. The
  * drop itself is correct (a bucket holding a large corpus fraction
  * carries no discriminating signal), but at scale a SYSTEMATICALLY hot
  * bucket — empty-text fingerprints, a boilerplate cluster — silently
  * lowers recall with nothing in any artifact saying so. These
  * accumulators make every drop observable: per (session, operator),
  * `<op>.skipped_buckets` counts dropped groups and `<op>.skipped_rows`
  * counts the member rows they held, visible in the Spark UI (named
  * accumulators) and queryable after any action via [[value]].
  *
  * Accumulator semantics caveat (by Spark's design): counts are
  * ACTION-cumulative and task-retry-inclusive — a retried task adds its
  * skips again. They are a diagnostic telltale ("recall was capped,
  * investigate the hot key"), not an exact audit number; zero is exact
  * in both directions.
  */
object SkipStats {

  private val accs = new SessionScoped[LongAccumulator]

  /** Get-or-register the named counter for this session. */
  def acc(spark: SparkSession, name: String): LongAccumulator =
    accs.getOrCompute(spark, name)(
      spark.sparkContext.longAccumulator(s"graft.skip.$name"))

  /** Current count (0 when the counter was never touched). */
  def value(spark: SparkSession, name: String): Long =
    acc(spark, name).value

  /** The (skipped_buckets, skipped_rows) pair for one capped operator. */
  def pair(spark: SparkSession, op: String): (LongAccumulator, LongAccumulator) =
    (acc(spark, s"$op.skipped_buckets"), acc(spark, s"$op.skipped_rows"))
}
