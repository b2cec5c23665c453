package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.{SparkSuite, Tables}

/** The codegen'd native expressions must be BIT-IDENTICAL to the built-in
  * higher-order formulations they replaced (the DuckDB oracle mirrors the
  * HOF semantics). Checked over the real corpus plus edge strings. */
class NativeExpressionsSpec extends SparkSuite {

  private def hofPolyHash(s: org.apache.spark.sql.Column) =
    aggregate(split(s, ""), lit(0L),
      (acc, c) => (acc * lit(31L) + ascii(c)) % lit(1000000007L))

  test("PolyHash == aggregate(split) formulation on corpus + edges") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sf0001).select(col("text"))
      .unionAll(Seq("", " ", "a", "a b\t c", "\ttrailing ").toDF("text"))
    val diff = corpus.select(
      NativeExpressions.polyHash(col("text")).as("native"),
      hofPolyHash(col("text")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("TokenHashes == transform(split(trim)) formulation on corpus + edges") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sf0001).select(col("text"))
      .unionAll(Seq("", "   ", "one", " a  b\tc\r\nd ").toDF("text"))
    val hof = when(length(trim(col("text"))) === 0, array().cast("array<bigint>"))
      .otherwise(transform(split(trim(col("text")), "\\s+"), t => hofPolyHash(t)))
    val diff = corpus.select(
      NativeExpressions.tokenHashes(col("text")).as("native"), hof.as("hof"))
      .filter(not(col("native") === col("hof"))).count()
    assert(diff == 0)
  }

  test("SortedIntersectSize == size(array_intersect) on sorted-distinct shingles") {
    import spark.implicits._
    val shingles = Tables.documents(spark, sf0001)
      .select(TextFunctions.shingleHashes(col("text"), 3).as("s"))
      .filter(size(col("s")) > 0)
    val pairs = shingles.limit(60).crossJoin(shingles.limit(60).select(col("s").as("t")))
    val diff = pairs.select(
      NativeExpressions.sortedIntersectSize(col("s"), col("t")).as("native"),
      size(array_intersect(col("s"), col("t"))).as("builtin"))
      .filter(col("native") =!= col("builtin")).count()
    assert(diff == 0)
    // edge cases: empty vs non-empty, disjoint, identical, subset
    val edges = Seq(
      (Seq.empty[Long], Seq(1L, 2L), 0),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L), 0),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3),
      (Seq(2L, 3L), Seq(1L, 2L, 3L, 9L), 2)).toDF("a", "b", "want")
    assert(edges.filter(
      NativeExpressions.sortedIntersectSize(col("a"), col("b")) =!= col("want"))
      .count() == 0)
  }

  test("native expressions stay inside whole-stage codegen") {
    // fallback=false in the session makes a Janino failure throw, but also
    // assert the positive: the projection is inside a WholeStageCodegen span.
    val df = Tables.documents(spark, sf0001).select(
      NativeExpressions.polyHash(col("text")),
      NativeExpressions.tokenHashes(col("text")))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, s"no codegen span in:\n${df.queryExecution.executedPlan}")
  }

  test("DotProduct == aggregate(zip_with) formulation on embeddings") {
    val e = Tables.embeddings(spark, sf0001)
      .select(transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
    val pairs = e.limit(50).crossJoin(e.limit(50).select(col("v").as("w")))
    val hof = aggregate(zip_with(col("v"), col("w"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diff = pairs.select(
      NativeExpressions.dot(col("v"), col("w")).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }
}
