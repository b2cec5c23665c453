package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}
import graft.functions.TextFunctions

/** `text_keywords` invariants: the top-3 are distinct terms of the doc
  * itself, the winner's score is positive, and docs with tokens are all
  * covered.
  */
class KeywordsSpec extends SparkSuite {

  private lazy val kw =
    SparkEntry.queries("text_keywords")(spark, sf0001).persist()

  test("coverage and well-formedness") {
    val withToks = Tables.documents(spark, sf0001)
      .filter(TextFunctions.tokenCount(col("text")) > 0).count()
    assert(kw.count() == withToks)
    assert(kw.filter(col("kw1_score") <= 0.0).count() == 0)
    assert(kw.filter(col("kw1") === "").count() == 0)
    // the three keywords are pairwise distinct where present
    assert(kw.filter(col("kw2") =!= "" &&
      (col("kw1") === col("kw2") || col("kw2") === col("kw3") ||
        (col("kw3") =!= "" && col("kw1") === col("kw3")))).count() == 0)
  }

  test("every keyword is a token of its own document") {
    val bad = kw.join(Tables.documents(spark, sf0001), "doc_id")
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .filter(!array_contains(col("toks"), col("kw1")) ||
        (col("kw2") =!= "" && !array_contains(col("toks"), col("kw2"))) ||
        (col("kw3") =!= "" && !array_contains(col("toks"), col("kw3"))))
    assert(bad.count() == 0)
  }
}
