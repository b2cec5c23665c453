package graft.operators

import graft.SparkSuite

/** Served e2e retrieval (`pipeline_e2e_retrieve_served`): the retrieval
  * chain whose arms read the PERSISTED artifacts — the cen_id-bucketed
  * IVF-PQ table for the vector arm, the materialized BM25 score table for
  * the lexical arm. Pins:
  *
  *  (a) '''row compatibility with the exact chain''': with exhaustive
  *      probing (all lists probed, rescore pool ≥ corpus) the IVF-PQ arm's
  *      exact-cosine rescore degenerates to brute force, so the whole
  *      served ranking must equal `pipeline_e2e_retrieve` ROW FOR ROW —
  *      the two chains share fusion/greedy/metadata builders and may
  *      differ only in what the approximate arm surfaces;
  *  (b) '''default-probe sanity''': full rank prefix, rrf/mmr laws intact
  *      (mmr descends, rank 1 carries λ·rrf-max of the pool);
  *  (c) '''serving plan shape''': the coarse ADC pass is bucket-pruned
  *      (SelectedBucketsCount < total) and column-pruned (a scan reading
  *      codes WITHOUT the full vector column), lists broadcast-joined —
  *      never the shuffled side.
  */
class ServedRetrieveSpec extends SparkSuite {

  test("exhaustive probing degenerates to the exact chain row-for-row") {
    val corpusSize = graft.Tables.embeddings(spark, sf0001).count().toInt
    val served = SimilarityQueries
      .retrieveServedRanked(spark, sf0001,
        nProbe = SimilarityQueries.NCentroids, candidates = corpusSize)
      .select("rank", "doc_id", "rrf", "mmr", "source", "lang")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val exact = SimilarityQueries.queries("pipeline_e2e_retrieve")(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(served.nonEmpty)
    assert(served.toSeq == exact.toSeq,
      "exhaustive-probe served chain must equal the brute-arm chain")
    spark.catalog.clearCache()
  }

  test("default probing: rank prefix, fused-score and greedy laws hold") {
    val got = SimilarityQueries.queries("pipeline_e2e_retrieve_served")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.length == SimilarityQueries.MmrK)
    assert(got.map(_._1).toSeq == (1 to SimilarityQueries.MmrK).map(_.toLong))
    assert(got.map(_._2).distinct.length == got.length, "picks are distinct docs")
    // first pick is the pool's relevance argmax with no diversity term
    // yet: mmr(1) = λ·max(rrf). (Later picks' scores are NOT monotone —
    // a negative max-cosine to the selection BOOSTS λ·rel, legitimately,
    // on a near-isotropic corpus — so no descend assertion here; the
    // greedy law itself is pinned by E2eRetrieveSpec / the DuckDB twin.)
    val lam = SimilarityQueries.MmrLambda
    assert(math.abs(got.head._4 - lam * got.map(_._3).max) < 1e-12)
    spark.catalog.clearCache()
  }

  test("IVF-PQ append arm == the one-shot build, row for row") {
    val once = SimilarityQueries.queries("src_ivfpq_bucketed")(spark, sf0001)
      .collect().map(_.toSeq)
    spark.catalog.clearCache()
    val appended = SimilarityQueries.queries("src_ivfpq_append")(spark, sf0001)
      .collect().map(_.toSeq)
    assert(once.nonEmpty && once.toSeq == appended.toSeq,
      "ingest must not change answers")
    spark.catalog.clearCache()
  }

  test("fidelity report covers both arms and flags their disagreement") {
    val fid = SimilarityQueries.queries("sim_retrieve_fidelity")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val k = SimilarityQueries.MmrK
    assert(fid.count(_._2 > 0) == k && fid.count(_._3 > 0) == k,
      s"both arms contribute their full top-$k: $fid")
    assert(fid.map(_._1).distinct.length == fid.length)
    // exact rows must BE pipeline_e2e_retrieve's ranking
    val exact = SimilarityQueries.queries("pipeline_e2e_retrieve")(spark, sf0001)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    fid.filter(_._2 > 0).foreach { case (doc, re, _) =>
      assert(exact(doc) == re, s"doc $doc exact-rank parity") }
    spark.catalog.clearCache()
  }

  test("multi-query serving: each query gets its own full MMR group with intact laws") {
    val got = SimilarityQueries.queries("pipeline_retrieve_multi")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val k = SimilarityQueries.MmrK
    val groups = got.groupBy(_._1)
    assert(groups.keySet == (0L until SimilarityQueries.MultiNQueries).toSet)
    val lam = SimilarityQueries.MmrLambda
    groups.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to k).toSeq, s"query $q rank prefix")
      assert(sorted.map(_._3).distinct.length == k, s"query $q distinct picks")
      assert(!sorted.exists(_._3 == q), s"query $q must not retrieve itself")
      // first pick is the pool's relevance argmax: its mmr = λ·rel and its
      // rel is the max over the group's picks (picks ⊆ pool, argmax picked)
      assert(math.abs(sorted.head._5 - lam * rows.map(_._4).max) < 1e-12,
        s"query $q first-pick law")
    }
    spark.catalog.clearCache()
  }

  test("serving plan: coarse scan bucket-pruned and codes-only, lists never shuffle") {
    val plan = SimilarityQueries.queries("pipeline_e2e_retrieve_served")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, plan)
    assert(m.get.group(1).toInt < m.get.group(2).toInt, m.get.matched)
    val schemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.exists(l => l.contains("codes") && !l.contains("v:array")),
      schemas.mkString("\n"))
    // the pruned list scans are broadcast-joined against the probe set —
    // the index is never the shuffled side of anything. (No blanket
    // no-SortMergeJoin pin here: the RRF fusion is a full-outer join of
    // the two ≤HybridK-row arm rankings, which cannot broadcast — a
    // 2×20-row sort, not a corpus shuffle.)
    assert(plan.contains("BroadcastHashJoin"), plan)
    spark.catalog.clearCache()
  }
}
