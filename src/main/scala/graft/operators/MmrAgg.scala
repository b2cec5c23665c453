package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Maximal-marginal-relevance (MMR, Carbonell & Goldstein 1998) diversified
  * top-k as ONE mergeable typed aggregate: per query group, keep the `n`
  * highest-relevance candidates (with their unit vectors) as bounded
  * [[TopKAgg]]-law state, then run the greedy MMR selection over that pool
  * in `finish` — pick argmax of `λ·rel − (1−λ)·max_{s∈S} cos(c, s)`
  * (first pick: `λ·rel`, the empty-selection term), ties to the LOWEST id,
  * until `k` picks.
  *
  * This is the scale shape for "diverse top-k per query" at 100 TB: the
  * candidate scan feeds a map-side-partial aggregation (each input
  * partition ships at most `n` candidates per query into the shuffle —
  * state is n·(dim+2) doubles, ~10 KB at n=20/dim=64), and the greedy —
  * inherently sequential, O(n·k·dim) — runs once per query INSIDE the
  * aggregate's finish, distributed over queries. No join-back, no second
  * pass, no window. The two-stage alternative (top-n, re-join vectors,
  * per-query loop) costs an extra corpus-sized join and still serializes
  * the greedy.
  *
  * Determinism: the pool is the exact (rel desc, id asc) top-n (TopKAgg's
  * proven merge law extended with a payload); pairwise cosines fold dims
  * ascending from 0.0 over elementwise-normalized unit vectors — the same
  * operation order as the DuckDB twin's `list_reduce`/`list_transform`
  * chain — and max-over-selected is order-free, so the whole selection is
  * hash-exact cross-engine.
  */
class MmrAgg(n: Int, k: Int, lambda: Double)
  extends Aggregator[(Double, Long, Seq[Double]),
                     Vector[(Double, Long, Seq[Double])],
                     Seq[(Long, Double, Double)]] {

  // (rel desc, id asc) — inputs are finite (zero-norm vectors are dropped
  // upstream), but keep TopKAgg's NaN-greatest law so the pool boundary
  // can never silently diverge from the row_number formulation
  private def scoreGt(x: Double, y: Double): Boolean =
    if (x.isNaN) !y.isNaN else !y.isNaN && x > y
  private def scoreEq(x: Double, y: Double): Boolean =
    (x.isNaN && y.isNaN) || x == y
  private def lt(a: (Double, Long, Seq[Double]),
                 b: (Double, Long, Seq[Double])): Boolean =
    scoreGt(a._1, b._1) || (scoreEq(a._1, b._1) && a._2 < b._2)

  override def zero: Vector[(Double, Long, Seq[Double])] = Vector.empty

  override def reduce(buf: Vector[(Double, Long, Seq[Double])],
                      row: (Double, Long, Seq[Double])): Vector[(Double, Long, Seq[Double])] = {
    // finish()'s greedy comparisons (`score > best`, `score == best`) are
    // both false for NaN, which would degrade the (score desc, id asc)
    // tie rule to pool-position order. A silent drop here would FORK from
    // the DuckDB greedy twin (which ranks NaN greatest via ORDER BY DESC)
    // if the zero-norm-drop invariant upstream ever broke — fail loudly
    // instead, so a broken invariant surfaces as an error, never as a
    // quiet engine/oracle divergence.
    require(!row._1.isNaN,
      s"MmrAgg: NaN relevance for candidate id=${row._2} — a zero-norm " +
        "vector leaked past the upstream nrm>0 filter")
    if (buf.length == n && !lt(row, buf.last)) buf
    else {
      val i = buf.indexWhere(b => lt(row, b)) match {
        case -1 => buf.length
        case m => m
      }
      buf.patch(i, Seq(row), 0).take(n)
    }
  }

  override def merge(x: Vector[(Double, Long, Seq[Double])],
                     y: Vector[(Double, Long, Seq[Double])]): Vector[(Double, Long, Seq[Double])] = {
    val out = Vector.newBuilder[(Double, Long, Seq[Double])]
    var (i, j, m) = (0, 0, 0)
    while (m < n && (i < x.length || j < y.length)) {
      // same (rel, id) == the same logical candidate (ids unique per
      // group): idempotent union, as in TopKAgg
      if (i < x.length && j < y.length &&
          x(i)._1 == y(j)._1 && x(i)._2 == y(j)._2) { out += x(i); i += 1; j += 1 }
      else {
        val takeX = j >= y.length || (i < x.length && lt(x(i), y(j)))
        if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
      }
      m += 1
    }
    out.result()
  }

  /** Greedy MMR over the pooled top-n: (vec_id, rel, mmr_score) in pick
    * order. Dims fold ascending from 0.0 (the dotSql order). */
  override def finish(buf: Vector[(Double, Long, Seq[Double])]): Seq[(Long, Double, Double)] = {
    val out = Vector.newBuilder[(Long, Double, Double)]
    val remaining = scala.collection.mutable.ArrayBuffer.from(buf)
    val sel = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    var picks = 0
    while (picks < k && remaining.nonEmpty) {
      var bi = -1; var bScore = 0.0; var bId = 0L
      var i = 0
      while (i < remaining.length) {
        val (rel, id, u) = remaining(i)
        val score =
          if (sel.isEmpty) lambda * rel
          else {
            var ms = Double.NegativeInfinity
            var j = 0
            while (j < sel.length) {
              val d = dot(u, sel(j)); if (d > ms) ms = d; j += 1
            }
            lambda * rel - (1.0 - lambda) * ms
          }
        if (bi < 0 || score > bScore || (score == bScore && id < bId)) {
          bi = i; bScore = score; bId = id
        }
        i += 1
      }
      val (rel, id, u) = remaining.remove(bi)
      sel += u
      out += ((id, rel, bScore))
      picks += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[Vector[(Double, Long, Seq[Double])]] =
    ExpressionEncoder[Vector[(Double, Long, Seq[Double])]]()
  override def outputEncoder: Encoder[Seq[(Long, Double, Double)]] =
    ExpressionEncoder[Seq[(Long, Double, Double)]]()
}

object MmrAgg {
  /** Column form: `array<struct<_1: vec_id, _2: rel, _3: mmr_score>>` in
    * pick order, length ≤ k. posexplode for ranks. */
  def column(n: Int, k: Int, lambda: Double,
             rel: Column, id: Column, u: Column): Column =
    udaf(new MmrAgg(n, k, lambda),
      ExpressionEncoder[(Double, Long, Seq[Double])]()).apply(rel, id, u)
}
