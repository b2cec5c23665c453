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
  * Checkpoints that outlive their loop (a returned result, the loop's last
  * generations) are tracked here and freed by the driver harness BETWEEN
  * queries via [[releaseStragglers]] — after the query's output is fully
  * materialized — because `spark.catalog.clearCache()` never reaches
  * checkpoint blocks (ADVICE r01).
  */
object CheckpointUtil {

  private val stragglers = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Record a just-created localCheckpoint df; anything not explicitly
    * released by its loop is freed at the next [[releaseStragglers]]. */
  def track(df: DataFrame): DataFrame = synchronized {
    stragglers += df
    df
  }

  def releasePersist(df: DataFrame): Unit =
    df.unpersist(blocking = false)

  def releaseCheckpoint(df: DataFrame): Unit = {
    synchronized { stragglers -= df }
    df.unpersist(blocking = false)
    df.queryExecution.logical.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }
  }

  /** Free every tracked checkpoint still alive. Call between queries, once
    * the previous query's output is fully materialized. */
  def releaseStragglers(): Unit = {
    val pending = synchronized {
      val p = stragglers.toList
      stragglers.clear()
      p
    }
    pending.foreach { df =>
      df.unpersist(blocking = false)
      df.queryExecution.logical.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ =>
      }
    }
  }
}
