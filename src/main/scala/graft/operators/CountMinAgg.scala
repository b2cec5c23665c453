package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch as a mergeable typed aggregate: approximate frequency
  * counts in `depth × width` longs of state, independent of the number of
  * distinct keys. The heavy-hitter / frequency primitive of a corpus
  * pipeline ("how often does this token/URL/fingerprint occur?") at 100 TB
  * scale: map-side partial sketches, merge is elementwise sum, so a global
  * token-frequency sketch moves `groups × depth·width × 8` bytes over the
  * wire instead of a vocabulary-sized shuffle. Estimates only ever
  * OVER-count (collisions add, never subtract) — the spec pins
  * `exact <= est` and the merge law.
  *
  * Determinism contract: row positions come from the same LCG-derived
  * universal-hash family as [[BloomFilterAgg]] (`((a_j·h + b_j) mod P) mod
  * width`), so a DuckDB oracle replays the exact cell layout — unlike
  * Spark's `count_min_sketch`, whose internal hashing isn't replicable
  * across engines.
  *
  * The reference (ispras/pu4spark) has no aggregates (SURVEY.md §2.3);
  * this completes the engine's sketch family (MinHash, Bloom, HLL, top-k,
  * CMS) Spark-first.
  */
class CountMinAgg(val width: Int, val depth: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(width > 0 && depth >= 1, s"bad CMS shape ($width x $depth)")

  override def zero: Array[Long] = new Array[Long](width * depth)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < depth) {
      buf(j * width + BloomFilterAgg.position(h, j, width).toInt) += 1L
      j += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Column form: `agg(new CountMinAgg(128, 3).column(col("h")))`. */
  def column(h: Column): Column = udaf(this).apply(h)
}

object CountMinAgg {
  /** Point estimate from a (broadcast) sketch column: `min_j
    * cms[j·width + pos_j(h)]`. Pure column arithmetic — probes run inside
    * whole-stage codegen with the sketch as the only non-local input. */
  def estimate(cms: Column, h: Column, width: Int, depth: Int): Column = {
    val cells = (0 until depth).map { j =>
      element_at(cms,
        (BloomFilterAgg.positionCol(h, j, width) + lit(j.toLong * width))
          .cast("int") + 1)
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }
}
