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
}
