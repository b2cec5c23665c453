package graft.pu

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** End-to-end Liu-2002 text use case: TF-IDF → PU learner separates masked
  * positives (docs containing the marker token, hidden from training) from
  * true negatives. */
class TextPUSpec extends SparkSuite {

  test("text PU pipeline: held-out positives score above true negatives") {
    val df = PU.puDocuments(spark, sf0001)
    val learner = TraditionalPULearnerConfig(0.5, 1, LogisticRegressionConfig()).build()
    val scored = learner.weight(
      df.select("doc_id", "puLabel", "features", "holdoutPos", "isPos"),
      "puLabel", "features", "score")
    // Absolute probabilities are tiny (the masked positives sit in the
    // zeroStep "negative" pool — the core PU difficulty), so assert RANK
    // separation: pairwise AUC of holdout-positives vs true negatives.
    val h = scored.filter(col("holdoutPos")).select(col("score").as("hs"))
    val n = scored.filter(!col("isPos")).select(col("score").as("ns"))
    val Array(wins, total) = h.crossJoin(n)
      .agg(sum(when(col("hs") > col("ns"), 1L).otherwise(0L)), count(lit(1)))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    val auc = wins.toDouble / total
    assert(auc > 0.85, s"AUC=$auc ($wins/$total)")
  }
}
