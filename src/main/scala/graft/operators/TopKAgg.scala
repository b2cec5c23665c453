package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a mergeable typed aggregate: per group, the k (score,
  * id) pairs with the highest score, ties broken by LOWEST id — the exact
  * order `row_number() OVER (ORDER BY score DESC, id)` produces.
  *
  * This is the skew-safe shape for "top k per group" at 100 TB. The window
  * formulation must route EVERY row of a group to one task and sort them
  * (a hot group = a straggler partition by construction, and AQE cannot
  * split a window partition). This aggregate's state is O(k) per group,
  * Spark runs it with map-side partial aggregation (ObjectHashAggregate),
  * so each input partition ships at most k rows per group into the
  * shuffle, and the final merge is k-way-bounded regardless of group
  * skew. The same merge law makes it usable in streaming update-mode aggs.
  *
  * The buffer is kept sorted (score desc, id asc) and truncated at k, so
  * reduce is an insertion into a ≤k vector and merge is a bounded merge —
  * both O(k). Deterministic for distinct (score, id) pairs, hence
  * oracle-checkable (unlike sketch-style aggregates).
  */
class TopKAgg(k: Int)
  extends Aggregator[(Double, Long), Vector[(Double, Long)], Seq[(Double, Long)]] {

  // score desc, id asc — with NaN ordered GREATEST, matching both engines'
  // `ORDER BY score DESC` (Spark's nanSafeCompare and DuckDB both rank NaN
  // above every finite value; the plain `>` would instead sink NaN rows to
  // the bottom and silently drop them from a full buffer, diverging from
  // the row_number formulation this aggregate replaces on any NaN-bearing
  // input). Two NaNs compare equal and fall to the id tie-break.
  private def scoreGt(x: Double, y: Double): Boolean =
    if (x.isNaN) !y.isNaN else !y.isNaN && x > y
  private def scoreEq(x: Double, y: Double): Boolean =
    (x.isNaN && y.isNaN) || x == y
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    scoreGt(a._1, b._1) || (scoreEq(a._1, b._1) && a._2 < b._2)

  override def zero: Vector[(Double, Long)] = Vector.empty

  override def reduce(buf: Vector[(Double, Long)], row: (Double, Long)): Vector[(Double, Long)] = {
    if (buf.length == k && !lt(row, buf.last)) buf
    else {
      val i = buf.indexWhere(b => lt(row, b)) match {
        case -1 => buf.length
        case n => n
      }
      (buf.patch(i, Seq(row), 0)).take(k)
    }
  }

  override def merge(x: Vector[(Double, Long)], y: Vector[(Double, Long)]): Vector[(Double, Long)] = {
    // bounded merge of two sorted ≤k vectors; an element present in BOTH
    // (same score AND id) is taken once — ids are unique per group, so
    // equal pairs are the same logical element, and the idempotent union
    // makes re-merging overlapping states (e.g. recovered streaming state)
    // a no-op rather than a duplication
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < x.length || j < y.length)) {
      if (i < x.length && j < y.length && x(i) == y(j)) { out += x(i); i += 1; j += 1 }
      else {
        val takeX = j >= y.length || (i < x.length && lt(x(i), y(j)))
        if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
      }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Vector[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Vector[(Double, Long)]] =
    ExpressionEncoder[Vector[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  /** Column form: returns `array<struct<_1: score, _2: id>>` sorted
    * (score desc, id asc), length ≤ k. Explode + posexplode for ranks.
    */
  def column(k: Int, score: Column, id: Column): Column =
    udaf(new TopKAgg(k), ExpressionEncoder[(Double, Long)]()).apply(score, id)
}
