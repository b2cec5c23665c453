package graft.pu

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Ranking-quality pin for the PU pipeline quality model (the rows-only
  * real-LR arm of `pu_pipeline_filter`): seed positives are Gopher-passing
  * docs with EVEN doc_id, so the odd-id Gopher passers are a masked
  * holdout the learner never saw as positives. A useful quality model must
  * rank that holdout above the docs that FAIL the Gopher rules — pairwise
  * AUC, same assertion shape as TextPUSpec. */
class PuPipelineFilterSpec extends SparkSuite {

  test("PU quality model ranks masked good docs above Gopher failures") {
    val scored = graft.SparkEntry.queries("pu_pipeline_filter")(spark, sf0001)
    val flags = graft.SparkEntry.queries("text_gopher_filters")(spark, sf0001)
      .select(col("doc_id"), col("keep"))
    val j = scored.join(flags, "doc_id").persist()
    val h = j.filter(col("keep") && col("doc_id") % 2 === 1)
      .select(col("score").as("hs"))
    val n = j.filter(!col("keep")).select(col("score").as("ns"))
    val Array(wins, total) = h.crossJoin(n)
      .agg(sum(when(col("hs") > col("ns"), 1L).otherwise(0L)), count(lit(1)))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(total > 0L, "vacuous: no holdout/failure pairs at sf0.001")
    val auc = wins.toDouble / total
    assert(auc > 0.85, s"AUC=$auc ($wins/$total)")
    spark.catalog.clearCache()
    graft.CheckpointUtil.releaseStragglers()
  }

  test("calibration table: covers the corpus, deciles well-formed, seed mass ranks high") {
    val cal = graft.SparkEntry.queries("pu_calibration")(spark, sf0001).persist()
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(cal.agg(sum("n_docs")).head.getLong(0) == nDocs)
    // decile bin edges are honest: scores stay inside their bin
    val badBin = cal.filter(
      col("min_score") < col("decile") / 10.0 ||
        (col("decile") < 9 && col("max_score") >= (col("decile") + 1) / 10.0))
      .count()
    assert(badBin == 0)
    // ranking quality at the table's grain: the top half of the score
    // range holds a strictly larger seed-positive RATE than the bottom
    val top = cal.filter(col("decile") >= 5)
      .agg(sum("n_seed_pos"), sum("n_docs")).head
    val bot = cal.filter(col("decile") < 5)
      .agg(sum("n_seed_pos"), sum("n_docs")).head
    val topRate = top.getLong(0).toDouble / top.getLong(1)
    val botRate = if (bot.getLong(1) == 0) 0.0
      else bot.getLong(0).toDouble / bot.getLong(1)
    assert(topRate > botRate,
      s"seed positives do not concentrate in high deciles: $topRate <= $botRate")
    spark.catalog.clearCache()
    graft.CheckpointUtil.releaseStragglers()
  }
}
