package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism gate for the ingest-side "spreading" repartition.
  *
  * The bench fixtures are single-row-group parquet files, so their scan is
  * ONE task — without a spread, every per-row signature/vector pipeline
  * (CPU-heavy hash/dot kernels) runs on one core. A hash repartition fixes
  * that locally, but applied unconditionally it is a FULL data-sized
  * shuffle that buys nothing at scale: a 100 TB corpus scan already has
  * tens of thousands of splits, and when the scan already parallelizes,
  * the "spread" is not dwarfed by the compute — it IS the largest shuffle
  * in the plan.
  *
  * [[ifNarrow]] therefore repartitions ONLY when the scan's parallelism is
  * below the session's default parallelism — true for the single-row-group
  * fixtures, false for any real multi-split corpus — so "the corpus is
  * never shuffled" holds literally on wide inputs (pinned by
  * SpreadGateSpec).
  */
object Spread {

  /** `df` hash-repartitioned on `key` iff its physical scan has fewer
    * partitions than the session's default parallelism. The partition-count
    * probe plans the query but runs no job — and planning isn't free
    * (~60 ms warm per probe: analysis + physical planning of the scan), so
    * the result is MEMOIZED per (session, canonical plan): the gated bases
    * are a handful of raw table reads asked about once per query build,
    * and without the cache the probe tax showed up as a 1.7x bench
    * regression on the cheapest dedup queries. Stale only if the files
    * under an identical plan change mid-session, which no caller does.
    */
  def ifNarrow(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // key on the canonicalized plan OBJECT (structural equals/hashCode),
    // not its hashCode — a 32-bit collision between two different base
    // reads would silently reuse the wrong partition count
    val cacheKey = (System.identityHashCode(df.sparkSession),
      df.queryExecution.analyzed.canonicalized)
    if (probeCache.size > 256) probeCache.clear() // bases are few; bound anyway
    val n = probeCache.computeIfAbsent(cacheKey, _ => df.rdd.getNumPartitions)
    if (n < target) df.repartition(key) else df
  }

  private val probeCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan), Int]()
}
