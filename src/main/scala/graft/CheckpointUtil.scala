package graft

import org.apache.spark.sql.DataFrame

/** Release helpers for iterative operators that roll generations of
  * persisted / localCheckpoint'd DataFrames.
  *
  * Two distinct release operations — conflating them frees blocks that are
  * still someone's recompute root:
  *
  *  - [[releasePersist]]: a superseded `persist()` generation. Frees ONLY
  *    the CacheManager entry for this df. Its logical plan may EMBED an
  *    earlier generation's checkpoint `LogicalRDD` as a leaf; those blocks
  *    must NOT be freed here — live later generations still root their
  *    lineage at that checkpoint (losing a persist block is recoverable by
  *    recompute exactly as long as the checkpoint underneath survives).
  *  - [[releaseCheckpoint]]: a superseded `localCheckpoint()` generation —
  *    its plan is a bare `LogicalRDD` leaf (lineage truncated), and
  *    `Dataset.unpersist` never reaches the checkpointed RDD's blocks.
  *    Only call when NO live generation's lineage can reach it anymore; a
  *    locally-checkpointed RDD cannot be recomputed after unpersisting.
  *
  * Storage that outlives its builder (a returned result's caches, a loop's
  * last generations, helper-scoped persists) is registered here by
  * [[track]]/[[trackPersist]] and freed BETWEEN queries via
  * [[releaseStragglers]] — after the query's output is fully materialized —
  * because `spark.catalog.clearCache()` never reaches checkpoint blocks
  * (ADVICE r01). References are STRONG: release must be deterministic (a
  * round-9 weak-ref design raced the GC — a collected weak entry could
  * never be unpersisted again, because the CacheManager's InMemoryRelation
  * pins cached RDDs against ContextCleaner forever). The registry is the
  * library caller's whole release story: materialize, then ONE
  * releaseStragglers(). A caller that never drains leaks exactly what an
  * unreleased cache always leaked — nothing more — and the registry itself
  * only adds the Dataset handles. The driver harness (Verify/Bench) and
  * every spec drain between queries.
  */
object CheckpointUtil {

  private val stragglers =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Record a just-created localCheckpoint (or loop-surviving persist) df;
    * anything not explicitly released by its loop is freed at the next
    * [[releaseStragglers]]. */
  def track(df: DataFrame): DataFrame = synchronized {
    stragglers += df
    df
  }

  /** [[track]] for helper-scoped `persist()`s — same registry, named at
    * the call site for the persist-vs-checkpoint release distinction
    * documented above. */
  def trackPersist(df: DataFrame): DataFrame = track(df)

  def releasePersist(df: DataFrame): Unit =
    df.unpersist(blocking = false)

  def releaseCheckpoint(df: DataFrame): Unit = {
    synchronized { stragglers.filterInPlace(_ ne df) }
    freeBlocks(df)
  }

  /** Free every tracked df. Call between queries, once the previous
    * query's output is fully materialized. */
  def releaseStragglers(): Unit = {
    val pending = synchronized {
      val p = stragglers.toList
      stragglers.clear()
      p
    }
    pending.foreach(freeBlocks)
  }

  /** CacheManager entry + any checkpoint blocks behind LogicalRDD leaves. */
  private def freeBlocks(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.logical.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }
  }
}
