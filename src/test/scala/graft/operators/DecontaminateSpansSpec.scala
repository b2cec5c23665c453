package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}
import graft.functions.TextFunctions

/** `pipeline_decontaminate_spans` invariants: the span report flags
  * exactly the docs the membership rule flags (forensics never disagrees
  * with the gate), and the positional evidence is internally consistent.
  */
class DecontaminateSpansSpec extends SparkSuite {

  private val n = CurationPipeline.DecontNgram

  private lazy val spans =
    SparkEntry.queries("pipeline_decontaminate_spans")(spark, sf0001).persist()

  test("span forensics flags exactly the membership-rule docs") {
    val docs = Tables.documents(spark, sf0001)
    val shh = TextFunctions.shingleHashes(col("text"), n)
    val evalShh = docs.filter(col("source") === "src19")
      .select(explode(shh).as("sh")).distinct()
    val flagged = docs.filter(col("source") =!= "src19")
      .select(col("doc_id"), explode(shh).as("sh"))
      .join(broadcast(evalShh), Seq("sh"), "left_semi")
      .select("doc_id").distinct()
    assert(spans.count() > 0)
    assert(spans.select("doc_id").exceptAll(flagged).count() == 0)
    assert(flagged.exceptAll(spans.select("doc_id")).count() == 0)
  }

  test("excision is interval-union-consistent with the span report") {
    val ex = SparkEntry.queries("pipeline_excise")(spark, sf0001)
    val joined = ex.join(spans, "doc_id").persist()
    // same flagged set
    assert(joined.count() == spans.count() && joined.count() == ex.count())
    // union coverage bounds: 4 + (n_hits-1)·1 <= n_removed <= n_hits·4,
    // and the removed mass never exceeds the doc
    assert(joined.filter(col("n_removed") > col("n_hits") * n ||
      col("n_removed") < col("n_hits") + (n - 1)).count() == 0)
    assert(joined.filter(col("n_after") < 0 ||
      col("n_before") - col("n_removed") =!= col("n_after")).count() == 0)
  }

  test("positional evidence is consistent: ordered hits inside the token range") {
    assert(spans.filter(col("first_hit") < 1 ||
      col("first_hit") > col("last_hit")).count() == 0)
    assert(spans.filter(col("n_hits") < 1 ||
      col("n_hits") > col("last_hit") - col("first_hit") + 1).count() == 0)
    val ntok = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("nt"))
    assert(spans.join(ntok, "doc_id")
      .filter(col("last_hit") > col("nt") - (n - 1)).count() == 0,
      "a hit position past the last possible shingle start")
  }
}
