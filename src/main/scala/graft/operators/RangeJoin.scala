package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join via time-bucket equi-decomposition — the
  * scale pattern for a join Spark has no native operator for. A naive
  * `a.join(b, keys && point.between(start, end))` on anything but tiny
  * inputs degenerates: the only equi-part of the condition is `keys`, so
  * every point meets every interval of its key (hot keys → quadratic
  * tasks, and a pure theta-join is a broadcast-nested-loop).
  *
  * Decomposition: intervals are replicated to each `bucketWidth`-wide time
  * bucket they overlap (replication factor ≈ len/bucketWidth + 1 — pick a
  * width near the typical interval length); points land in exactly ONE
  * bucket. The join key becomes (keys..., bucket) — a plain shuffled
  * equi-join whose buckets only hold temporally-near rows — and the exact
  * `BETWEEN` filter runs post-join on those candidates. Because a point
  * has a single bucket, each qualifying (point, interval) pair meets
  * exactly once: no dedup pass.
  *
  * The reference (ispras/pu4spark) has no join operators of any kind
  * (SURVEY.md §2.3); north-star relational surface, same family as
  * `AsOfJoin` (at-or-before match) — this is the containment-match
  * complement.
  */
object RangeJoin {

  /** Join `points` (with a `pointCol` timestamp/number) to the intervals
    * in `intervals` (`[startCol, endCol]`, inclusive both ends) that
    * contain them, equi-matching on `keys` first. Output: all columns of
    * both inputs (keys once). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointCol: String,
                      startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    import Packing.DivOps
    val p = points.withColumn("graft_bucket", col(pointCol) div bucketWidth)
    val iv = intervals.withColumn("graft_bucket",
      explode(sequence(col(startCol) div bucketWidth, col(endCol) div bucketWidth)))
    p.join(iv, keys :+ "graft_bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("graft_bucket")
  }
}
