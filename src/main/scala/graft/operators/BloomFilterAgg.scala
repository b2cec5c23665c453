package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{HashMod => P}

/** Bit-packed Bloom filter as a mergeable typed aggregate, plus the
  * membership-test column. The "have we already trained on this document?"
  * primitive of a training-data pipeline: build the filter over the seen
  * corpus's content fingerprints (one tiny bitmap per group — map-side
  * partial agg, merge is bitwise OR, so a 100 TB build moves only
  * `groups × m/8` bytes over the wire), broadcast it, and probe every
  * candidate document with pure column arithmetic inside the scan.
  *
  * Determinism contract: the k probe positions come from the engine's
  * universal-hash family `((a_j·fp + b_j) mod P) mod m` (same LCG-derived
  * `a_j`/`b_j` constants as the MinHash family, `fp < P` so products stay
  * under 2^63), so the DuckDB oracle replays the exact same bit positions —
  * unlike library Bloom filters (Spark's `bloom_filter_agg`, Guava), whose
  * internal hashing is not replicable across engines. False positives are
  * possible by design (bounded by the (m, k, n) sizing); false negatives
  * are not — the spec pins both properties.
  *
  * The reference (ispras/pu4spark) has no aggregates of any kind
  * (SURVEY.md §2.3); this fills the membership-sketch category Spark-first.
  */
class BloomFilterAgg(val mBits: Int, val k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64, got $mBits")
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(buf: Array[Long], fp: Long): Array[Long] = {
    var j = 0
    while (j < k) {
      val pos = BloomFilterAgg.position(fp, j, mBits)
      buf((pos >> 6).toInt) |= (1L << (pos & 63))
      j += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Column form: `agg(new BloomFilterAgg(512, 3).column(col("fp")))`. */
  def column(fp: Column): Column = udaf(this).apply(fp)
}

object BloomFilterAgg {
  private def hashA(j: Int): Long = (1103515245L * (j + 1) + 12345L) % P
  private def hashB(j: Int): Long = (1103515245L * (j + 7) + 54321L) % P

  /** Bit position of probe j for fingerprint `fp`. floorMod (not Scala %)
    * so a negative fingerprint still yields a position in [0, mBits) —
    * in-repo callers feed polyHash in [0, P), but the class is public API
    * over negative-capable Long and the probe path ([[positionCol]]) uses
    * `pmod`, which must agree. Domain bound: `|fp|` must keep `hashA*fp`
    * inside Long (|fp| ≲ 8.4e9) — beyond that [[positionCol]] throws under
    * ANSI arithmetic while this wraps; pre-hash wider keys into [0, P)
    * (spec pins path agreement across the supported range). */
  def position(fp: Long, j: Int, mBits: Int): Long =
    Math.floorMod(Math.floorMod(hashA(j) * fp + hashB(j), P), mBits.toLong)

  /** `((a_j*fp + b_j) % P) % m` as a Column (same value as [[position]]). */
  def positionCol(fp: Column, j: Int, mBits: Int): Column =
    pmod(pmod(lit(hashA(j)) * fp + lit(hashB(j)), lit(P)), lit(mBits))

  /** Membership test: true iff all k probe bits of `fp` are set in the
    * bit-packed `bloom` (array<bigint>, little-endian words). Pure column
    * arithmetic — the probe runs inside whole-stage codegen in the scan
    * stage, with the (broadcast) bitmap as the only non-local input.
    * Shift amounts are data-dependent, so the SQL `shiftright` form is used
    * (the Scala `functions.shiftright` only accepts literal shifts).
    */
  def mightContain(bloom: Column, fp: Column, mBits: Int, k: Int): Column =
    (0 until k).map { j =>
      val pos = positionCol(fp, j, mBits)
      val word = element_at(bloom, (pos.cast("int") / 64).cast("int") + 1)
      expr_bit(word, pos % 64) === 1L
    }.reduce(_ && _)

  /** `(word >> (bit)) & 1` with a non-literal shift, via the SQL function
    * (ShiftRight the expression accepts any int child). */
  private def expr_bit(word: Column, bit: Column): Column =
    call_function("shiftright", word, bit.cast("int")).bitwiseAND(lit(1L))
}
