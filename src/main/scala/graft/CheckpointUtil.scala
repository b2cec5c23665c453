package graft

import scala.ref.WeakReference

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
  * Storage that outlives its loop (a returned result, the loop's last
  * generations) is tracked here WEAKLY and freed by the driver harness
  * BETWEEN queries via [[releaseStragglers]] — after the query's output is
  * fully materialized — because `spark.catalog.clearCache()` never reaches
  * checkpoint blocks (ADVICE r01). Weak references keep the registry from
  * pinning DataFrames in processes that never drain it (tests, embedded
  * callers): once a tracked df is unreachable, ContextCleaner can GC its
  * blocks and the entry drops out here.
  */
object CheckpointUtil {

  private val stragglers =
    scala.collection.mutable.ArrayBuffer.empty[WeakReference[DataFrame]]

  /** Record a just-created localCheckpoint (or loop-surviving persist) df;
    * anything not explicitly released by its loop is freed at the next
    * [[releaseStragglers]]. */
  def track(df: DataFrame): DataFrame = synchronized {
    if (stragglers.length > 64)
      stragglers.filterInPlace(_.get.isDefined) // drop GC-cleared entries
    stragglers += WeakReference(df)
    df
  }

  def releasePersist(df: DataFrame): Unit =
    df.unpersist(blocking = false)

  def releaseCheckpoint(df: DataFrame): Unit = {
    synchronized { stragglers.filterInPlace(_.get.exists(_ ne df)) }
    freeBlocks(df)
  }

  /** Free every tracked df still alive. Call between queries, once the
    * previous query's output is fully materialized. */
  def releaseStragglers(): Unit = {
    val pending = synchronized {
      val p = stragglers.toList.flatMap(_.get)
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
