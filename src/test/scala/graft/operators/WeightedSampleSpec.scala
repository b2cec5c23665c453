package graft.operators

import graft.SparkSuite

/** Weight-proportional sampling (`pipeline_weighted_sample`): the consumer
  * of `dedup_soft_weight`'s `weight_ppm`. Pins, on a planted two-weight
  * fixture pushed through the EXACT production draw
  * ([[DedupQueries.weightedSampleFrom]]):
  *
  *  (a) '''exact draw''': the emitted sample equals an independent
  *      driver-side recomputation of the sequential-Poisson priorities
  *      (u·10⁶ div w, u = polyHash("wsamp"+id) — integer arithmetic,
  *      reproduced here from the hash definition, not the kernel);
  *  (b) '''mass proportionality''': docs at 8× the weight are drawn at
  *      ≈8× the rate (heavy-half count near the 8:1 closed form 88.9);
  *  (c) '''merge law''': 1 partition == 7 partitions (the draw is a
  *      mergeable aggregate, not a partition-order accident).
  */
class WeightedSampleSpec extends SparkSuite {

  private def phash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)

  /** The draw's uniform variate: LCG-scrambled polyHash (see the
    * weightedSampleFrom scaladoc — raw polyHash of short-suffix ids is
    * band-clustered and would encode id LENGTH in the priority). */
  private def uvar(s: String): Long =
    (phash(s) * 1103515245L + 12345L) % 1000000007L

  test("planted two-weight fixture: exact draw, 8:1 mass law, merge law") {
    import spark.implicits._
    val n = 400
    val k = 100
    val rows = (0L until n).map(i =>
      (i, "x", if (i < 200) 1000000L else 125000L))
    val w = rows.toDF("doc_id", "source", "weight_ppm")

    val got = DedupQueries.weightedSampleFrom(w, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2)

    // (a) independent recomputation of the draw
    val pris = rows.map { case (id, _, wppm) =>
      (uvar(s"wsamp$id") * 1000000L / wppm, id)
    }.sorted
    val expect = pris.take(k).zipWithIndex.map { case ((pri, id), i) =>
      ("x", (i + 1).toLong, id, pri)
    }
    assert(got.toSeq == expect)

    // (b) heavy half (8× weight) drawn ≈8× as often: closed form for the
    // 100-of-400 draw is ~88.9 heavy picks; generous band for one
    // deterministic hash realization
    val heavy = got.count(_._3 < 200)
    assert(heavy >= 78 && heavy <= 97, s"heavy=$heavy of $k")

    // (c) merge law
    val re = DedupQueries.weightedSampleFrom(w.repartition(7), k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2)
    assert(re.toSeq == got.toSeq)
    drain()
  }

  test("DSIR resampling pulls importance upward: sampled mean score beats the corpus mean") {
    val scores = TrainingDataQueries.queries("pipeline_dsir_weights")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val drawn = TrainingDataQueries.queries("pipeline_dsir_sample")(spark, sf0001)
      .collect().map(_.getLong(2))
    assert(drawn.nonEmpty && drawn.distinct.length == drawn.length)
    val sampleMean = drawn.map(scores).sum / drawn.length
    val corpusMean = scores.values.sum / scores.size
    assert(sampleMean > corpusMean,
      s"importance-weighted draw must raise the mean: $sampleMean <= $corpusMean")
    drain()
  }

  /** The weight chains persist/localCheckpoint tracked intermediates —
    * drain so later cache-budget assertions don't depend on suite order. */
  private def drain(): Unit = {
    spark.catalog.clearCache()
    graft.CheckpointUtil.releaseStragglers()
  }
}
