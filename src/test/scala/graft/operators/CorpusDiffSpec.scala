package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.{SparkEntry, SparkSuite, Tables}
import graft.functions.TextFunctions

/** `pipeline_corpus_diff` beyond the hash-exact oracle: the diff is a
  * PATCH — applying it to snapshot v1 must reproduce snapshot v2 exactly,
  * and each status row carries the fingerprint evidence for its claim.
  */
class CorpusDiffSpec extends SparkSuite {

  private def salted(tag: String) = pmod(TextFunctions.polyHash(
    concat(lit(tag), col("doc_id").cast(StringType))), lit(tag match {
      case "add" => 17; case "rm" => 19; case _ => 13
    }))

  // the same deterministic two-snapshot simulation the query uses
  private lazy val d = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text"),
      salted("add").as("ha"), salted("rm").as("hr"), salted("chg").as("hc"))
  private lazy val v1: DataFrame = d.filter(col("ha") =!= 3).select(col("doc_id"),
    when(col("hc") === 1, TextFunctions.fingerprint(
        expr("substring(text, 1, greatest(length(text) - 1, 0))")))
      .otherwise(TextFunctions.fingerprint(col("text"))).as("fp"))
  private lazy val v2: DataFrame = d.filter(col("hr") =!= 5).select(col("doc_id"),
    TextFunctions.fingerprint(col("text")).as("fp"))

  private lazy val diff =
    SparkEntry.queries("pipeline_corpus_diff")(spark, sf0001).persist()

  test("every status row carries consistent fingerprint evidence") {
    assert(diff.count() > 0)
    assert(diff.filter(!col("status").isin("added", "removed", "changed")).count() == 0)
    assert(diff.filter(col("status") === "added" &&
      (col("old_fp") =!= -1L || col("new_fp") === -1L)).count() == 0)
    assert(diff.filter(col("status") === "removed" &&
      (col("new_fp") =!= -1L || col("old_fp") === -1L)).count() == 0)
    assert(diff.filter(col("status") === "changed" &&
      (col("old_fp") === -1L || col("new_fp") === -1L ||
        col("old_fp") === col("new_fp"))).count() == 0)
  }

  test("the diff is a patch: v1 + diff == v2, id for id and byte for byte") {
    val dropped = diff.filter(col("status").isin("removed", "changed"))
      .select("doc_id")
    val applied = v1.join(dropped, Seq("doc_id"), "left_anti")
      .unionByName(diff.filter(col("status").isin("added", "changed"))
        .select(col("doc_id"), col("new_fp").as("fp")))
    assert(applied.exceptAll(v2).count() == 0)
    assert(v2.exceptAll(applied).count() == 0)
  }

  test("unchanged docs never appear: diff size equals the simulated churn") {
    val both = v1.withColumnRenamed("fp", "old_fp")
      .join(v2.withColumnRenamed("fp", "new_fp"), "doc_id")
    val churn = both.filter(col("old_fp") =!= col("new_fp")).count() +
      v1.join(v2, Seq("doc_id"), "left_anti").count() +
      v2.join(v1, Seq("doc_id"), "left_anti").count()
    assert(diff.count() == churn)
  }
}
