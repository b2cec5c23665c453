package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}
import graft.functions.TextFunctions

/** `pipeline_pack_shelf` invariants: capacity, conservation, and the
  * shelf rule (every pack of a class except its last is full). */
class ShelfPackSpec extends SparkSuite {

  private val C = TrainingDataQueries.ShelfTokens

  private lazy val packs =
    SparkEntry.queries("pipeline_pack_shelf")(spark, sf0001).persist()

  test("capacity and padding identity hold for every pack") {
    assert(packs.count() > 0)
    assert(packs.filter(col("tokens_used") > C ||
      col("padding") =!= lit(C) - col("tokens_used") ||
      col("padding") < 0).count() == 0)
  }

  test("every eligible doc lands in exactly one pack") {
    val eligible = Tables.documents(spark, sf0001)
      .select(TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .filter(col("n") > 0 && col("n") <= C)
      .count()
    val packed = packs.agg(sum("n_docs")).head.getLong(0)
    assert(packed == eligible, s"packed $packed of $eligible eligible docs")
  }

  test("shelf rule: only the last pack of a class may be short") {
    val short = packs.filter(col("n_docs") < col("size_class"))
    val lastSeq = packs.groupBy("size_class")
      .agg(max("pack_seq").as("last_seq"))
    // every short pack must be its class's final pack
    assert(short.join(lastSeq, "size_class")
      .filter(col("pack_seq") =!= col("last_seq")).count() == 0)
    // and no pack exceeds its class's doc budget
    assert(packs.filter(col("n_docs") > col("size_class")).count() == 0)
  }

  test("capacity split is exercised: some class needs more than one pack") {
    assert(packs.filter(col("pack_seq") >= 1).count() > 0,
      "fixture dial must force multi-pack classes")
  }
}
