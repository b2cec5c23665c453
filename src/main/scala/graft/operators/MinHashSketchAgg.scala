package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.functions.TextFunctions.{HashMod => P}

/** Mergeable MinHash sketch as a custom typed aggregate: collapses any
  * number of shingle-hash sets into one k-min signature per group.
  *
  * The per-doc [[Dedup.minhashSignature]] is a scalar expression; THIS is
  * the aggregate form — `zero`/`reduce`/`merge` are the classic sketch
  * monoid (elementwise min), which Spark executes with map-side partial
  * aggregation: each input partition reduces to one 16-long buffer before
  * the shuffle, so a 100 TB corpus moves only (groups × 128 bytes) across
  * the wire. The same merge law makes it usable in Structured Streaming
  * update-mode aggregations. The reference has no aggregates of any kind
  * (SURVEY.md §2.3); this fills the UDAF/sketch category Spark-first.
  */
object MinHashSketchAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  val K: Int = Dedup.MinHashK

  private def hashA(j: Int): Long = (1103515245L * (j + 1) + 12345L) % P
  private def hashB(j: Int): Long = (1103515245L * (j + 7) + 54321L) % P

  override def zero: Array[Long] = Array.fill(K)(P)

  override def reduce(buf: Array[Long], shingleHashes: Seq[Long]): Array[Long] = {
    var j = 0
    while (j < K) {
      val a = hashA(j); val b = hashB(j)
      var m = buf(j)
      val it = shingleHashes.iterator
      while (it.hasNext) {
        val v = (a * it.next() + b) % P
        if (v < m) m = v
      }
      buf(j) = m
      j += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var j = 0
    while (j < K) { if (y(j) < x(j)) x(j) = y(j); j += 1 }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Column form: `groupBy(...).agg(MinHashSketchAgg.column(col("shh")))`. */
  def column(shingleHashes: Column): Column = udaf(this).apply(shingleHashes)
}
