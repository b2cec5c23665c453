package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions with whole-stage codegen for the per-row
  * kernels of the text/dedup/similarity pipelines.
  *
  * Spark's higher-order functions (`transform`/`aggregate`) are ALWAYS
  * interpreted — every element evaluation walks an expression tree through
  * virtual `eval` calls. For hash-per-character and multiply-add-per-
  * dimension kernels that interpretive overhead dominates by an order of
  * magnitude. These expressions compute the same results (bit-identical —
  * the DuckDB oracle gate stays green) as the HOF formulations they
  * replace, but compile to tight scalar loops inside whole-stage codegen.
  *
  * Preference order per the build brief: compose built-ins where semantics
  * allow (everything else in this package), custom codegen `Expression`
  * where the built-in formulation can't reach native speed (here).
  */
object NativeExpressions {

  private val P = 1000000007L

  /** Rolling hash `acc := (acc*31 + charCodeUnit) mod 1e9+7` over a string.
    * Identical to `aggregate(split(s,''), 0L, (a,c) -> (a*31+ascii(c))%P)`
    * — UTF-16 code-unit iteration matches split-per-char + ascii for BMP
    * text (and the oracle corpus is ASCII).
    */
  case class PolyHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def withNewChildInternal(newChild: Expression): PolyHash =
      copy(child = newChild)

    override protected def nullSafeEval(input: Any): Any =
      PolyHash.hash(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeExpressions.PolyHash$$.MODULE$$.hash($c)")
  }

  object PolyHash {
    def hash(u: UTF8String): Long = {
      val s = u.toString
      var acc = 0L
      var i = 0
      while (i < s.length) {
        acc = (acc * 31L + s.charAt(i)) % P
        i += 1
      }
      acc
    }
  }

  /** Whitespace-run tokenization + per-token [[PolyHash]], one pass, no
    * regex. Identical to
    * `when(length(trim(s))=0, array()).otherwise(transform(split(trim(s),'\\s+'), polyHash))`
    * — `\s` in Java regex is exactly [ \t\n\f\r], mirrored here.
    */
  case class TokenHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def withNewChildInternal(newChild: Expression): TokenHashes =
      copy(child = newChild)

    override protected def nullSafeEval(input: Any): Any =
      TokenHashes.compute(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.NativeExpressions.TokenHashes$$.MODULE$$.compute($c)")
  }

  object TokenHashes {
    private def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    def compute(u: UTF8String): ArrayData = {
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
  }

  /** Sequential-order dot product of two double arrays — identical IEEE
    * result to `aggregate(zip_with(a,b,multiply), 0.0, plus)` (ascending
    * index, single accumulator). Nulls: any null input → null (inputs here
    * are cast float arrays, never null-elemented).
    */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true // also null on ragged lengths
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      // length mismatch => null, matching the HOF twin (zip_with pads with
      // null and the sum propagates it) — a ragged row must surface as
      // null, not as a plausible-looking truncated dot product
      if (aa.numElements() != bb.numElements()) null
      else DotProduct.dot(aa, bb)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = graft.functions.NativeExpressions.DotProduct$$.MODULE$$.dot($a, $b);
           |}
         """.stripMargin)
  }

  object DotProduct {
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
  }

  // Column-level entry points
  def polyHash(c: Column): Column =
    GraftColumnBridge.column(PolyHash(GraftColumnBridge.expression(c)))
  def tokenHashes(c: Column): Column =
    GraftColumnBridge.column(TokenHashes(GraftColumnBridge.expression(c)))
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
