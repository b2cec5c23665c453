package graft.plans

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.functions.NativeExpressions._

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
        (args: Seq[Expression]) => DotProduct(args(0), args(1))),
      (FunctionIdentifier("graft_text_stats"),
        info("graft_text_stats",
          "graft_text_stats(str) - [len, nTokens, sumTokLen, nStop, nPunct, nSubwords] in one pass"),
        (args: Seq[Expression]) => TextStats(args.head)),
      (FunctionIdentifier("graft_lang_marker_counts"),
        info("graft_lang_marker_counts",
          "graft_lang_marker_counts(str) - per-language marker-token hit counts"),
        (args: Seq[Expression]) => LangMarkerCounts(args.head)),
      (FunctionIdentifier("graft_shingle_hashes"),
        info("graft_shingle_hashes",
          "graft_shingle_hashes(str, n) - sorted-distinct word n-gram hashes"),
        (args: Seq[Expression]) => ShingleHashes(args(0), intArg(args(1), "n"))),
      (FunctionIdentifier("graft_minhash"),
        info("graft_minhash", "graft_minhash(arr, k) - k-long MinHash signature"),
        (args: Seq[Expression]) => MinHashSignature(args(0), intArg(args(1), "k"))),
      (FunctionIdentifier("graft_simhash"),
        info("graft_simhash", "graft_simhash(arr) - 30-bit frequency-weighted SimHash"),
        (args: Seq[Expression]) => SimHash(args.head)),
      (FunctionIdentifier("graft_band_hashes"),
        info("graft_band_hashes",
          "graft_band_hashes(sig, bands, rows) - per-band base-31 combines"),
        (args: Seq[Expression]) =>
          BandHashes(args(0), intArg(args(1), "bands"), intArg(args(2), "rows"))),
      (FunctionIdentifier("graft_repetition_stats"),
        info("graft_repetition_stats",
          "graft_repetition_stats(str) - [nTokens, nDistinct, topFreq, nBigrams, nDistinctBigrams] in one pass"),
        (args: Seq[Expression]) => RepetitionStats(args.head)),
      (FunctionIdentifier("graft_int_dot"),
        info("graft_int_dot", "graft_int_dot(arr<tinyint>, arr<tinyint>) - exact integer dot as bigint"),
        (args: Seq[Expression]) => IntDot(args(0), args(1))),
      (FunctionIdentifier("graft_sorted_intersect_size"),
        info("graft_sorted_intersect_size",
          "graft_sorted_intersect_size(a, b) - |a ∩ b| of strictly-ascending arrays"),
        (args: Seq[Expression]) => SortedIntersectSize(args(0), args(1))))

  /** Shape parameters (shingle width, signature length, banding) must be
    * literal ints — they select a kernel specialization, they are not data. */
  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** Register into an already-running session (extensions only apply at
    * session construction; this covers REPL/test sessions). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (ident, inf, builder) =>
      GraftColumnBridge.registerFunction(spark, ident, inf, builder)
    }
}
