package graft.operators

import graft.SparkSuite

/** Persisted late-interaction serving (`src_maxsim_bucketed`): the
  * chunk-grain maxsim index written bucketed by cen_id once and probed
  * per query batch — the r14 directive-4 serving story. Pins:
  *
  *  (a) '''read-path neutrality''': the persisted probe equals the
  *      in-query IVF arm (`sim_maxsim_ivf`) ROW FOR ROW — writing the
  *      assigned chunk table and probing it may change where bytes come
  *      from, never the ranking (the driver oracle is shared verbatim;
  *      this pins it in-engine too);
  *  (b) '''the serving plan shape''': the chunk scan is bucket-pruned to
  *      the probed lists (SelectedBucketsCount below total) and the probe
  *      set is broadcast-joined — the persisted chunk lists never shuffle.
  */
class MaxsimServedSpec extends SparkSuite {

  test("persisted probe == in-query IVF arm row-for-row") {
    val served = SimilarityQueries.queries("src_maxsim_bucketed")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val inQuery = SimilarityQueries.queries("sim_maxsim_ivf")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(served.nonEmpty)
    assert(served.toSeq == inQuery.toSeq)
    spark.catalog.clearCache()
  }

  test("append and compacted arms == the one-shot build, row for row") {
    // ingest must not change answers, and neither may the file-layout
    // rewrite — all three read paths share the full-rebuild oracle; this
    // pins the identity in-engine too
    val once = SimilarityQueries.queries("src_maxsim_bucketed")(spark, sf0001)
      .collect().map(_.toSeq)
    val appended = SimilarityQueries.queries("src_maxsim_append")(spark, sf0001)
      .collect().map(_.toSeq)
    val compacted = SimilarityQueries.queries("src_maxsim_compact")(spark, sf0001)
      .collect().map(_.toSeq)
    assert(once.nonEmpty)
    assert(appended.toSeq == once.toSeq)
    assert(compacted.toSeq == once.toSeq)
    spark.catalog.clearCache()
  }

  test("fidelity report covers both arms with full rank prefixes") {
    val got = SimilarityQueries.queries("sim_maxsim_fidelity")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val k = SimilarityQueries.MaxsimK
    // each arm contributes its full 1..k ranking exactly once; rank 0
    // rows are docs present in only one arm
    assert(got.map(_._2).filter(_ > 0).sorted.toSeq == (1L to k))
    assert(got.map(_._3).filter(_ > 0).sorted.toSeq == (1L to k))
    assert(got.forall(r => r._2 > 0 || r._3 > 0))
    // and the report composes the REGISTERED chains: the exact column
    // matches sim_maxsim_topk's ranking row for row
    val exact = SimilarityQueries.queries("sim_maxsim_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toMap // doc -> rank
    got.filter(_._2 > 0).foreach { r =>
      assert(exact.get(r._1).contains(r._2), s"fidelity exact column drifted: $r")
    }
    spark.catalog.clearCache()
  }

  test("plan: chunk scan bucket-pruned to probed lists, probes broadcast, lists never shuffle") {
    val df = SimilarityQueries.queries("src_maxsim_bucketed")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, plan)
    assert(m.get.group(1).toInt < m.get.group(2).toInt, m.get.matched)
    assert(plan.contains("BroadcastHashJoin"), plan)
    spark.catalog.clearCache()
  }
}
