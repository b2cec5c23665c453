package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** `pipeline_curriculum` invariants: the output is a total training order
  * (a permutation), bins are consumed strictly best-first, and the
  * within-bin order is the salted hash shuffle — not a leak of the
  * upstream doc_id order.
  */
class CurriculumSpec extends SparkSuite {

  private lazy val cur =
    SparkEntry.queries("pipeline_curriculum")(spark, sf0001).persist()

  test("curriculum_pos is a 1..n permutation over the whole corpus") {
    val n = cur.count()
    assert(n > 0)
    val agg = cur.agg(min("curriculum_pos").as("lo"), max("curriculum_pos").as("hi"),
      countDistinct("curriculum_pos").as("d")).head
    assert(agg.getLong(0) == 1L && agg.getLong(1) == n && agg.getLong(2) == n)
  }

  test("bins are consumed best-first: bin is non-increasing along the curriculum") {
    val w = Window.orderBy("curriculum_pos")
    val bad = cur.withColumn("next_bin", lead(col("bin"), 1).over(w))
      .filter(col("next_bin").isNotNull && col("next_bin") > col("bin"))
    assert(bad.count() == 0)
    assert(cur.select("bin").distinct().count() > 1,
      "fixture should populate more than one quality bin")
  }

  test("within-bin order is the hash shuffle, not the upstream doc_id order") {
    val w = Window.partitionBy("bin").orderBy("curriculum_pos")
    val inversions = cur.withColumn("next_id", lead(col("doc_id"), 1).over(w))
      .filter(col("next_id").isNotNull && col("next_id") < col("doc_id"))
      .count()
    assert(inversions > 0, "curriculum preserved ascending doc_id — order leaked")
  }
}
