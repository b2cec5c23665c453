package graft.plans

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.NativeExpressions.{DotProduct, PolyHash, TokenHashes}

/** SparkSessionExtensions entry point: registers graft's native codegen
  * expressions as SQL functions, so pure-SQL users (spark.sql, JDBC,
  * notebooks) reach them without the Scala DSL:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)               // programmatic
  *   // or spark.sql.extensions=graft.plans.GraftExtensions
  *   .getOrCreate()
  * spark.sql("SELECT graft_polyhash(text), graft_token_hashes(text) FROM docs")
  * }}}
  *
  * This is the (c) tier of the customization ladder (compose built-ins →
  * custom Expression → extension registration); no custom logical plans or
  * strategies are needed anywhere in graft — every operator compiles to
  * built-in plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_polyhash"),
        info("graft_polyhash", "graft_polyhash(str) - rolling hash mod 1e9+7"),
        (args: Seq[Expression]) => PolyHash(args.head)),
      (FunctionIdentifier("graft_token_hashes"),
        info("graft_token_hashes", "graft_token_hashes(str) - per-token rolling hashes"),
        (args: Seq[Expression]) => TokenHashes(args.head)),
      (FunctionIdentifier("graft_dot"),
        info("graft_dot", "graft_dot(arr, arr) - sequential-order dot product"),
        (args: Seq[Expression]) => DotProduct(args(0), args(1))))

  /** Register into an already-running session (extensions only apply at
    * session construction; this covers REPL/test sessions). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (ident, inf, builder) =>
      GraftColumnBridge.registerFunction(spark, ident, inf, builder)
    }
}
