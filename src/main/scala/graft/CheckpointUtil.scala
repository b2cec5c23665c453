package graft

import org.apache.spark.sql.DataFrame

/** Release helpers for iterative operators that roll generations of
  * persisted / localCheckpoint'd DataFrames.
  */
object CheckpointUtil {

  /** Fully release a superseded DataFrame's storage.
    *
    * `Dataset.unpersist` only clears the CacheManager entry behind
    * `persist()`. A `localCheckpoint()` result is different: its blocks
    * belong to the checkpointed RDD inside the plan's `LogicalRDD` leaf,
    * which `unpersist` never touches — without this, every iteration of a
    * loop leaks its checkpoint blocks until ContextCleaner happens to GC
    * the reference (and `spark.catalog.clearCache()` between driver queries
    * doesn't free them either).
    *
    * Only call on generations that are provably never executed again: a
    * locally-checkpointed RDD has truncated lineage and CANNOT be
    * recomputed after unpersisting.
    */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.logical.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }
  }
}
