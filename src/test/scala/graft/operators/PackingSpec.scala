package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{SparkSuite, Tables}
import graft.functions.TextFunctions

class PackingSpec extends SparkSuite {

  private def docTokens = Tables.documents(spark, sf0001)
    .select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast(LongType).as("n_tokens"))

  test("globalCumSum equals the single-task window formulation") {
    val got = Packing.globalCumSum(docTokens, "doc_id", "n_tokens", "cum")
      .select("doc_id", "cum")
    val want = docTokens.withColumn("cum",
      coalesce(sum(col("n_tokens")).over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("doc_id", "cum")
    assert(got.join(want.withColumnRenamed("cum", "want"), "doc_id")
      .filter(col("cum") =!= col("want")).count() == 0)
    assert(got.count() == docTokens.count())
  }

  test("globalCumSum result does not depend on input partitioning") {
    val scrambled = docTokens.repartition(7, pmod(col("doc_id"), lit(13)))
    val a = Packing.globalCumSum(docTokens, "doc_id", "n_tokens", "cum")
    val b = Packing.globalCumSum(scrambled, "doc_id", "n_tokens", "cum")
    assert(a.select("doc_id", "cum").exceptAll(b.select("doc_id", "cum")).count() == 0)
  }

  test("packAssignments is contiguous concat-and-cut: offsets advance by doc length mod budget") {
    val b = 512L
    val packed = Packing.packAssignments(docTokens, "doc_id", "n_tokens", b)
    // reconstruct: cum_before of the next doc == cum_before + n_tokens
    val w = Window.orderBy("doc_id")
    val bad = packed
      .withColumn("next_cum", lead(col("cum_before"), 1).over(w))
      .filter(col("next_cum").isNotNull &&
        col("next_cum") =!= col("cum_before") + col("n_tokens"))
      .count()
    assert(bad == 0)
    // pack_id/pack_offset are the div/mod decomposition of cum_before
    val badDecomp = packed.filter(
      col("pack_id") * b + col("pack_offset") =!= col("cum_before")).count()
    assert(badDecomp == 0)
    // pack ids are dense from 0 to total/b
    val total = docTokens.agg(sum("n_tokens")).head.getLong(0)
    val maxPack = packed.agg(max("pack_id")).head.getLong(0)
    assert(maxPack <= total / b)
  }

  test("globalCumSum's output plan is the zero-shuffle accumulate: no Window, no Exchange") {
    // the range exchange runs BEFORE the eager localCheckpoint (lineage is
    // truncated, so it cannot appear here); downstream must be only the
    // per-partition mapPartitions pass over the checkpointed blocks
    val plan = Packing.globalCumSum(docTokens, "doc_id", "n_tokens", "cum")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("MapPartitions"), plan)
    assert(plan.contains("Scan ExistingRDD"), plan)
  }

  test("chunks partition each document exactly: lengths sum to n_tokens, all full but the last") {
    val c = 64
    val chunks = Packing.chunks(docTokens, "doc_id", "n_tokens", c)
    val sums = chunks.groupBy("doc_id")
      .agg(sum("chunk_len").as("s"), max("chunk_id").as("last"), count(lit(1)).as("k"))
      .join(docTokens.filter(col("n_tokens") > 0), "doc_id")
    assert(sums.filter(col("s") =!= col("n_tokens")).count() == 0)
    assert(sums.filter(col("k") =!= col("last") + 1).count() == 0)
    // every chunk except the last is exactly c long; all positive, none over c
    assert(chunks.filter(col("chunk_len") <= 0 || col("chunk_len") > c).count() == 0)
    val notLastShort = chunks.as("x")
      .join(sums.select(col("doc_id"), col("last")), "doc_id")
      .filter(col("chunk_id") < col("last") && col("chunk_len") =!= c)
    assert(notLastShort.count() == 0)
  }
}
