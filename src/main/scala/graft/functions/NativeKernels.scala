package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Per-row scalar kernels called from both interpreted `eval` and the Java
  * emitted by whole-stage codegen (`NativeExpressions`).
  *
  * TOP-LEVEL on purpose: Janino compiles generated code against *binary*
  * class names. A nested Scala object like `NativeExpressions.PolyHash`
  * has binary name `graft.functions.NativeExpressions$PolyHash$`, and the
  * dotted source form `NativeExpressions.PolyHash$` does not resolve —
  * codegen would silently fall back to full-interpreted execution for the
  * whole stage. A top-level object's module class
  * (`graft.functions.NativeKernels$`) is directly addressable from Java.
  */
object NativeKernels {

  private val P = 1000000007L

  /** Rolling hash `acc := (acc*31 + charCodeUnit) mod 1e9+7`. */
  def polyHash(u: UTF8String): Long = {
    val s = u.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31L + s.charAt(i)) % P
      i += 1
    }
    acc
  }

  // Java regex \s = [ \t\n\x0B\f\r]; mirrored exactly here. NOTE: DuckDB's
  // RE2 \s does NOT include \x0B (vertical tab) — oracle parity for
  // tokenization assumes the corpus contains no \x0B (see the oracle
  // contract note in TextFunctions).
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Whitespace-run tokenization + per-token [[polyHash]], one pass. */
  def tokenHashes(u: UTF8String): ArrayData = {
    val s = u.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) {
        var acc = 0L
        while (i < n && !isWs(s.charAt(i))) {
          acc = (acc * 31L + s.charAt(i)) % P
          i += 1
        }
        out += acc
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  /** Ascending-index single-accumulator dot product (IEEE order matches the
    * `aggregate(zip_with(...))` HOF twin).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Size of the intersection of two strictly-ascending long arrays
    * (sorted-distinct token-hash sets from `array_sort(array_distinct(…))`).
    * Linear merge — replaces the interpreted
    * `size(array_intersect(a,b))` in the Jaccard hot path.
    */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}
