package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** `pipeline_lm_partition` (CCNet-style per-language head/middle/tail)
  * invariants: the output is a partition of the corpus, per-language ranks
  * are contiguous from 1, tercile sizes are balanced to within one doc,
  * and the head of every language is at least as LM-typical as its tail
  * (checked against the independently-computed text_lm_score surface).
  */
class LmPartitionSpec extends SparkSuite {

  private lazy val part =
    SparkEntry.queries("pipeline_lm_partition")(spark, sf0001).persist()

  test("partition of the corpus with contiguous per-language ranks") {
    val n = part.count()
    assert(n == graft.Tables.documents(spark, sf0001).count())
    assert(part.select("doc_id").distinct().count() == n)
    // ranks within each language are exactly 1..n_lang
    val bad = part.groupBy("lang")
      .agg(count(lit(1)).as("n"), min("lm_rank").as("lo"),
        max("lm_rank").as("hi"), countDistinct("lm_rank").as("nd"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n") || col("nd") =!= col("n"))
    assert(bad.count() == 0)
  }

  test("tercile sizes balanced to within one per language") {
    val sizes = part.groupBy("lang", "bucket").agg(count(lit(1)).as("c"))
      .groupBy("lang").agg(max("c").as("mx"), min("c").as("mn"),
        countDistinct("bucket").as("nb"), sum("c").as("n"))
    // languages with >= 3 docs fill all three buckets, sizes within 1
    assert(sizes.filter(col("n") >= 3 &&
      (col("nb") =!= 3 || col("mx") - col("mn") > 1)).count() == 0)
  }

  test("head is at least as LM-typical as tail, per language") {
    val scores = SparkEntry.queries("text_lm_score")(spark, sf0001)
      .select("doc_id", "mean_p")
    val j = part.join(scores, "doc_id")
    val heads = j.filter(col("bucket") === "head")
      .groupBy("lang").agg(min("mean_p").as("head_min"))
    val tails = j.filter(col("bucket") === "tail")
      .groupBy("lang").agg(max("mean_p").as("tail_max"))
    assert(heads.join(tails, "lang")
      .filter(col("head_min") < col("tail_max")).count() == 0)
  }

  test("release spec-scoped caches") {
    part.unpersist()
  }
}
