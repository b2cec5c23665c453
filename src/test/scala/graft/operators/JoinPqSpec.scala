package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Bulk served ANN (`sim_join_pq`): a corpus-sized distributed query
  * relation joined against the persisted cen_id-bucketed PQ-coded table
  * (the r14 "What's missing" item 1 — the one serving regime the r14 tree
  * didn't cover). The driver oracle pins the ranking hash-exactly to the
  * shared ivfPqRankedCtes replay; this spec pins
  *
  *  (a) '''the degenerate-exactness law''': with exhaustive probing
  *      (all lists, rescore pool >= corpus) the coarse ADC pass can drop
  *      nothing, so the bulk join must equal brute force over the same
  *      query relation ROW FOR ROW;
  *  (b) '''the serving plan shape''': coarse leg reads the BUCKETED
  *      table (bucketed read actually used = that side exchange-free)
  *      column-pruned to codes WITHOUT the full vector; the probes side
  *      is shuffled TO the bucket partitioning; every join is
  *      shuffle-hash (nothing |Q|-proportional is broadcast); and no
  *      LocalTableScan — the probe set never visits the driver.
  */
class JoinPqSpec extends SparkSuite {

  test("exhaustive probing degenerates to brute force row-for-row") {
    val corpus = Similarity.prepare(Tables.embeddings(spark, sf0001)).persist()
    val queries = corpus.filter(col("vec_id") % 5 === 2)
    val (tbl, centSeq, codebook) =
      SimilarityQueries.ivfPqServing(spark, sf0001, corpus)
    val n = corpus.count().toInt
    val bulk = SimilarityQueries.joinPqTopK(spark, tbl, codebook,
        SimilarityQueries.PqM, queries, centSeq,
        nProbe = SimilarityQueries.NCentroids, candidates = n,
        k = SimilarityQueries.K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2))
    val brute = Similarity.bruteForceTopK(corpus, queries, SimilarityQueries.K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2))
    assert(bulk.nonEmpty)
    assert(bulk.toSeq == brute.toSeq,
      "exhaustive-probe bulk join must equal brute force")
    spark.catalog.clearCache()
  }

  test("salted arm is row-identical, and both hot and tail paths are exercised") {
    val plain = SimilarityQueries.queries("sim_join_pq")(spark, sf0001)
      .collect().map(_.toSeq)
    val salted = SimilarityQueries.queries("sim_join_pq_salted")(spark, sf0001)
      .collect().map(_.toSeq)
    assert(plain.nonEmpty && salted.toSeq == plain.toSeq)
    // non-vacuity: with hotThreshold = the MEAN list size, the
    // near-uniform fixture must have lists on BOTH sides of it
    val corpus = Similarity.prepare(Tables.embeddings(spark, sf0001)).persist()
    val (tbl, _, _) = SimilarityQueries.ivfPqServing(spark, sf0001, corpus)
    val sizes = spark.table(tbl).groupBy("cen_id").count()
      .collect().map(_.getLong(1))
    val mean = corpus.count() / SimilarityQueries.NCentroids
    assert(sizes.exists(_ > mean) && sizes.exists(_ <= mean),
      s"fixture exercises only one salt arm: sizes=${sizes.toSeq.sorted}")
    spark.catalog.clearCache()
  }

  test("plan: bucketed coarse leg codes-only and exchange-free, all joins shuffle-hash, no driver collect") {
    val df = SimilarityQueries.queries("sim_join_pq")(spark, sf0001)
    df.collect() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan.toString
    // coarse scan: the bucketed layout is USED (Spark only prints
    // "Bucketed: true" when the read exploits the bucket partitioning —
    // i.e. that side of the cen_id join has no exchange) and reads codes
    // without the full-vector column
    val coarseScan = plan.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("codes")).toSeq
    assert(coarseScan.nonEmpty, plan)
    assert(coarseScan.exists(l => l.contains("Bucketed: true")
        && !l.contains("v:array")),
      coarseScan.mkString("\n"))
    // the probes side shuffles TO the bucket partitioning (16 lists)
    assert(plan.contains("Exchange hashpartitioning(cen_id"), plan)
    // every relation in this regime is |Q|-proportional: nothing may be
    // broadcast, and the probe set never visits the driver
    assert(!plan.contains("BroadcastHashJoin"), "bulk regime must not broadcast")
    assert(!plan.contains("LocalTableScan"), "no driver-side probe collect")
    assert(plan.contains("ShuffledHashJoin"), plan)
    spark.catalog.clearCache()
  }
}
