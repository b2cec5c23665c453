package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}
import graft.functions.NativeExpressions

/** Adaptive-radius probe selection (`sim_topk_ivf_adaptive` /
  * [[graft.functions.NativeKernels.adaptiveProbeIds]]). The driver oracle
  * pins the whole tier hash-exactly; this spec pins the kernel's rule in
  * isolation — radius inclusion with the exact `>=` boundary, the cap,
  * order — and the adaptivity fact on the real corpus: per-query probe
  * counts actually VARY (the reason the tier exists).
  */
class AdaptiveProbeSpec extends SparkSuite {

  // cnrms are supplied, not derived, so boundary cosines are exact: with
  // unit query [1,0], c3 scores 0.7 — exactly best(1.0) − delta(0.3)
  private val cents = Seq(
    (0L, Seq(1.0, 0.0), 1.0),
    (1L, Seq(0.7071067811865476, 0.7071067811865476), 1.0),
    (2L, Seq(0.0, 1.0), 1.0),
    (3L, Seq(0.7, 0.0), 1.0))

  private def probe(nMax: Int, delta: Double): Seq[Long] = {
    import spark.implicits._
    Seq((Seq(1.0, 0.0), 1.0)).toDF("v", "nrm")
      .select(NativeExpressions.adaptiveProbeIds(
        col("v"), col("nrm"), cents, nMax, delta).as("p"))
      .collect().head.getSeq[Long](0).toSeq
  }

  test("radius rule: inclusive boundary, cap, (cos desc, id asc) order") {
    // cosines: c0=1.0, c1≈0.7071, c2=0.0, c3=0.7; cutoff = 1.0 − 0.3 = 0.7
    assert(probe(4, 0.3) == Seq(0L, 1L, 3L),
      "a centroid EXACTLY at best − delta is kept (>= boundary)")
    assert(probe(2, 0.3) == Seq(0L, 1L), "the cap truncates the radius set")
    assert(probe(4, 0.0) == Seq(0L), "delta 0 probes only the best list")
    assert(probe(4, 2.0) == Seq(0L, 1L, 3L, 2L),
      "a radius wider than the score range probes everything, rank order")
  }

  test("the probe count actually varies per query on the real corpus") {
    val corpus = Similarity.prepare(Tables.embeddings(spark, sf0001)).persist()
    val centSeq = Similarity.collectCentroids(
      Similarity.centroids(corpus, SimilarityQueries.NCentroids))
    val counts = corpus.filter(
        col("vec_id") >= SimilarityQueries.NCentroids &&
        col("vec_id") < SimilarityQueries.NCentroids + SimilarityQueries.NQueries)
      .select(size(NativeExpressions.adaptiveProbeIds(col("v"), col("nrm"),
        centSeq, SimilarityQueries.NProbeMax, SimilarityQueries.ProbeDelta)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(counts.nonEmpty && counts.forall(n => n >= 1 &&
      n <= SimilarityQueries.NProbeMax))
    assert(counts.distinct.length > 1,
      s"probe counts must vary with quantizer ambiguity: $counts")
  }
}
