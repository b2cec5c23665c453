package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}

/** `mm_interleave` and `q_funnel` invariants. */
class InterleaveFunnelSpec extends SparkSuite {

  test("interleave: cost accounting, modality rule, and pack continuity") {
    val r = SparkEntry.queries("mm_interleave")(spark, sf0001).persist()
    assert(r.count() == Tables.documents(spark, sf0001).count())
    // modality follows the illustrated rule; text-only docs carry no patches
    assert(r.filter((pmod(col("doc_id"), lit(3)) === 0) =!=
      (col("modality") === "text+image")).count() == 0)
    assert(r.filter(col("modality") === "text" &&
      (col("n_patches") =!= 0 ||
        col("n_total") =!= col("n_tokens"))).count() == 0)
    // illustrated docs: total = tokens + patches + 1 placeholder
    assert(r.filter(col("modality") === "text+image" &&
      col("n_total") =!= col("n_tokens") + col("n_patches") + 1).count() == 0)
    // both modalities appear and image mass is non-vacuous
    assert(r.filter(col("n_patches") > 0).count() > 0)
    // concat-and-cut continuity: offsets stay inside the budget and the
    // packed mass reconciles with the per-doc costs
    val budget = TrainingDataQueries.PackTokens
    assert(r.filter(col("pack_offset") < 0 || col("pack_offset") >= budget)
      .count() == 0)
    val mass = r.agg(sum("n_total")).head.getLong(0)
    val lastPack = r.agg(max("pack_id")).head.getLong(0)
    assert(lastPack == (mass - 1) / budget || mass == 0)
    r.unpersist()
  }

  test("funnel: stage times are ordered and stage counts are consistent") {
    val f = SparkEntry.queries("q_funnel")(spark, sf0001).persist()
    assert(f.count() > 0)
    // sentinel/stage consistency
    assert(f.filter(col("stages_completed") === 1 &&
      (col("t_click") =!= -1 || col("t_purchase") =!= -1)).count() == 0)
    assert(f.filter(col("stages_completed") === 2 &&
      (col("t_click") === -1 || col("t_purchase") =!= -1)).count() == 0)
    assert(f.filter(col("stages_completed") === 3 &&
      (col("t_click") === -1 || col("t_purchase") === -1)).count() == 0)
    // staircase order where present
    assert(f.filter(col("t_click") =!= -1 && col("t_click") < col("t_view"))
      .count() == 0)
    assert(f.filter(col("t_purchase") =!= -1 &&
      col("t_purchase") < col("t_click")).count() == 0)
    // the funnel narrows (weakly) stage over stage, and deeper stages exist
    val s1 = f.count()
    val s2 = f.filter(col("stages_completed") >= 2).count()
    val s3 = f.filter(col("stages_completed") >= 3).count()
    assert(s1 >= s2 && s2 >= s3 && s2 > 0)
    f.unpersist()
  }
}
