package graft.operators

import graft.SparkSuite

/** Shuffle-count regression bound over every registered query. Exchange
  * counts are a coarse proxy, but a future edit that accidentally turns a
  * broadcast join into a shuffled one, loses a persist (recomputing a
  * signature pipeline per branch), or adds an unintended repartition shows
  * up here as a jump — caught at spec time instead of in the bench.
  * Bounds are the audited round-3 values + headroom of 2.
  */
class ShuffleAuditSpec extends SparkSuite {
  // queries whose plans legitimately need the most exchanges (banded
  // incremental dedup unions three candidate generations; IVF probes twice)
  private val bounds = Map(
    "dedup_incremental" -> 16,
    "dedup_minhash_pairs" -> 11,
    // two batch-scoped candidate arms union before ONE distinct, then the
    // two text join-backs + the final sort (measured 9 in plan text; the
    // persisted corpus slice reprints under its references as elsewhere)
    "dedup_editdist_incremental" -> 11,
    // round-5 re-audit: IVF assignment became an in-scan kernel (no
    // crossJoin+window argmax) and every similarity tier selects top-k via
    // TopKAgg instead of a row_number window — measured counts dropped to
    // 9/6/7/6/5 (semantic/ivf/quantized/kmeans/lsh); bounds = measured + 2
    "dedup_semantic" -> 11, "dedup_semantic_text" -> 11,
    "sim_topk_ivf" -> 8, "sim_topk_ivf_kmeans" -> 8, "sim_topk_filtered" -> 8,
    "sim_topk_quantized" -> 9, "sim_topk_lsh" -> 7,
    // PQ tiers reference the persisted corpus from four branches, and a
    // MATERIALIZED cache prints its AQE plan twice (Initial + Final), so
    // prepare()'s single runtime repartition shows up 8x in the text
    // (measured 11 total; the runtime shuffle count is 3-4)
    "sim_topk_pq" -> 13, "sim_topk_ivfpq" -> 13,
    // trained tiers share the pq/ivfpq plan shape (persisted corpus fanned
    // out over four branches, cached-plan text doubled under AQE)
    "sim_topk_pq_trained" -> 13, "sim_topk_ivfpq_trained" -> 13,
    "sim_topk_pq_lloyd" -> 13,
    "src_ivf_bucketed" -> 8, "src_ivf_append" -> 8, "src_ivfpq_bucketed" -> 8,
    // the distributed ANN join shuffles BOTH sides on cen_id by design
    // (query side is corpus-sized — broadcast is the wrong shape), plus
    // TopKAgg's partial-agg exchange; persisted-corpus plan text doubles
    // under AQE as above (measured 8; runtime shuffles are 3-4)
    "sim_join_ivf" -> 10,
    // the salted arm adds the skew-stats aggregate (one map-side-combined
    // exchange over distinct cen_ids) on top of the join's two sides
    // (measured 12 in plan text; cached-corpus doubling as above)
    "sim_join_ivf_salted" -> 14,
    // two directional distributed kNN joins (each: both cen_id sides +
    // the fused topk+mean agg partial), the vec_id margin join's two
    // sides, the best-per-source partial agg and the final sort; the
    // persisted corpus reprints under its references as in the sim_topk_*
    // entries (measured 17 in plan text after fusing the neighborhood
    // mean into the TopKAgg pass — 26 before)
    "sim_margin_pairs" -> 19,
    // the k-NN graph is sim_join_ivf with query side == corpus: the same
    // two cen_id join sides + TopKAgg partial exchange, persisted-corpus
    // plan text doubled under AQE (measured 8; runtime shuffles 3-4)
    "sim_knn_graph" -> 10,
    // radius join: the two cen_id sides + the final sort; no TopKAgg
    // state at all (measured 7 in plan text, cached doubling as above)
    "sim_range_join" -> 9,
    // the per-lang count agg + its cached reprint under both the min()
    // and rates branches + the final sort (measured 7; the corpus itself
    // shuffles zero times — the rate table broadcasts)
    "pipeline_mix_temperature" -> 9,
    // persisted shingle base referenced from three branches (eval distinct,
    // exact semi-join, probe side) — cached-plan text repeats as above
    "pipeline_decontaminate_bloom" -> 11,
    // measured 10 in plan text, of which 5 are the ONE Spread repartition
    // reprinted under every scan/cached-emb reference; runtime shuffles
    // are the two distinct aggs (sem + eval shingles) and the final sort.
    // The tau join itself is a BROADCAST hash join on cen_id (eval side
    // bounded by definition) — the corpus never shuffles for it.
    "pipeline_decontaminate_semantic" -> 12,
    "pipeline_bloom" -> 8, "dedup_srp_pairs" -> 8, "dedup_simhash_pairs" -> 8,
    "text_lm_score" -> 8, // persisted 2-branch base: plan text expands twice
    // persisted (doc,tok) tf grain referenced twice (df agg + scoring
    // join) — its agg exchange reprints under the InMemoryRelation;
    // runtime shuffles are tf, df, the tok join side, the doc-grain
    // gather, and the final sort (measured 7 in plan text)
    "text_keywords" -> 9,
    "text_hll_distinct" -> 7, "q_setop_nations" -> 7,
    // the 7-stage composition: measured 21 in plan text, of which 16 are
    // ONE cached Spread repartition reprinted under every InMemoryRelation
    // reference — runtime shuffles are the stage set by design (paragraph
    // canonical agg + join-back on h, survivor aggs on doc_id, the pack
    // range exchange, semantic's cen_id); every stage-joining join is
    // broadcast. No extra exchanges vs the sum of the standalone stages.
    "pipeline_e2e_curate" -> 23,
    // same chain with the PU stage-0 gate: the PU scoring lineage joins in
    // twice (stage-1 gate + final evidence), both persisted; measured 21 in
    // plan text with the same cached-Spread reprinting as above
    "pipeline_e2e_curate_pu" -> 23,
    // identical chain shape under the PU-LEA gate (measured 22 in plan
    // text, same cached-Spread reprinting)
    "pipeline_e2e_curate_pulea" -> 24,
    // survivor chain + quota/mix/split/pack tail: the tail adds the
    // source-quota agg, the pack range exchange, and the manifest pack_id
    // agg on top of the stage 1-4 set; same plan-text doubling as above
    "pipeline_e2e_full" -> 25,
    // Gopher∧DSIR → survivor-scoped excision → shelf composition:
    // measured 18 in plan text — the persisted surv/after frames reprint
    // their build lineage (incl. the DSIR rank's range exchange and the
    // 64-bucket count agg) under each InMemoryRelation reference, as in
    // the sibling chains. Runtime shuffles are the stage set by design:
    // DSIR's feature agg + rank exchange, the survivor shingle-ownership
    // agg (its broadcast-back is exchange-free), the coverage agg, the
    // shelf rank exchange + class-minimum agg, and the final sort.
    "pipeline_e2e_surgical" -> 24,
    // round-12 re-audit: the adaptive ownership probe persists the owners
    // table, whose build lineage (the shingle-grain agg exchange) now
    // reprints under the InMemoryRelation reference — measured 7 (excise)
    // / 22 (surgical, two consumers) in plan text; the RUNTIME shuffle
    // set is unchanged (the probe's agg is the same one the join reads,
    // now computed once via the cache)
    "dedup_substring_excise" -> 9,
    "dedup_substring_spans" -> 9,
    // same round-12 pattern: the persisted paras AND boiler frames both
    // reprint their build lineage (scan + two-step rollup exchanges)
    // under their InMemoryRelation references — measured 10 in plan
    // text; runtime shuffles are unchanged (the two rollup aggs + the
    // final sort; the join-back broadcasts)
    "pipeline_boilerplate" -> 12,
    // three user-grain stage aggs + their join sides + the final sort
    // (measured 7); each later stage's input is funnel-survivor-
    // proportional, and all shuffles share the user_id key
    "q_funnel_windowed" -> 9,
    // composes the registered brute and IVF top-k queries verbatim (the
    // point: the report can never describe other parameters) — each
    // brings its own persisted corpus whose plan text doubles under AQE,
    // as in the sim_topk_* entries above (measured 14; runtime shuffles
    // are the two TopKAgg partials + the overlap agg + the final sort)
    "sim_recall_report" -> 16,
    // the persisted (cluster, source) counts reprint their build lineage
    // (spread + doc join + first agg) under the InMemoryRelation for both
    // consumers — measured 9 in plan text; runtime shuffles are the
    // spread, the doc-metadata equi-join, the (cen_id, source) agg, the
    // k-bounded cen_id agg, the single-row total, and the final sort
    "pipeline_domain_discover" -> 9,
    // incremental kNN graph, measured 13: the standing graph is a
    // checkpoint leaf; what remains is the batch-arm cen_id join + its
    // TopKAgg partial, the standing-update join + its TopKAgg partial
    // over (old edges ∪ batch candidates), the union's two sort legs and
    // the final sort — the persisted full corpus reprints under its
    // standing/batch references as in the sim_topk_* entries
    "sim_knn_graph_incremental" -> 15,
    // label propagation, measured 7: the graph and rounds 0/1 are
    // lineage-free localCheckpoint leaves (the loop convention — plan
    // text was 55 with persist lineage re-embedding), so what remains is
    // round 2's vote join + two agg partials, the two assembly joins on
    // node, and the final sort
    "sim_label_prop" -> 9,
    // context pack = the SERVED retrieve chain + the single-partition
    // window over the ≤k-row ranked frame (the n_tokens count rides the
    // chain's one documents join) — the extra legs are k-row-sized
    "pipeline_context_pack" -> 14,
    // e2e retrieve, measured 12: the hybrid fusion's own exchanges (its
    // BM25 single-row agg, the two arm top-k partials, the 2×20-row
    // fusion join) plus the ≤40-row embedding join-back, the single-group
    // MMR agg partial, the k-row metadata join and the final sort —
    // everything after the two arm scans is k-bounded
    "pipeline_e2e_retrieve" -> 14,
    // served e2e retrieve, measured 10 — FEWER than the in-query chain
    // (12) although it adds the coarse→rescore leg: both arms read
    // persisted tables (the bucketed lists and the materialized BM25
    // scores are exchange-free leaves; the corpus-side BM25 rebuild and
    // brute-force arm shuffles are gone), leaving the two arm top-k
    // partials, the coarse TopKAgg partials, the 2×20-row fusion join's
    // sort legs, the single-group MMR partials, and the final sort —
    // everything past the pruned scans is k-bounded
    "pipeline_e2e_retrieve_served" -> 12,
    // hybrid RRF, measured 10: four are the fixture-only Spread gates,
    // three are agg partials (BM25 stats single row; the two global
    // TopKAgg arms move <=k rows per partition), and the rest shuffle
    // the <=20-row-per-side fusion join + the <=40-row final sort —
    // nothing corpus-sized crosses a wire after the arm top-ks
    "sim_hybrid_rrf" -> 12,
    // state and batch frames are eagerly localCheckpoint'd (lineage-free
    // standing state), so most of the count is REAL: the batch-side
    // canonical/evidence aggs, the cen_id self-join's two sides, the
    // victims union-distinct, decontamination's distincts, and the final
    // sort — all batch-sized; the corpus crosses no wire. Measured 20 in
    // plan text, of which ~8 are the decontamination stage's persisted
    // contaminated set reprinting its build lineage under the
    // InMemoryRelation (runtime shuffles stay ~12)
    "pipeline_e2e_incremental" -> 22,
    // weighted sampling = the dedup_soft_weight chain (LSH→CC cluster
    // sizing + the corpus-side weight join) + the per-source TopKAgg's
    // two agg partials and the final sort — measured 7; everything past
    // the weight frame moves ≤ sources×k rows
    "pipeline_weighted_sample" -> 9,
    // fidelity report = BOTH full retrieval chains side by side by
    // design (the in-query exact arm's 12 + the served arm's 10) plus
    // the k×k-row comparison join and final sort — measured 26; the
    // report is an offline acceptance check, its cost IS two chains
    "sim_retrieve_fidelity" -> 28,
    // bulk served ANN, measured 9 in plan text: runtime shuffles are the
    // probes' cen_id exchange INTO the bucket partitioning (the table
    // side is exchange-free — bucketed read), the coarse TopKAgg
    // exchange, the rescore join's two vec_id exchanges (survivors and
    // the table's full-vector leg — the one corpus-sized wire crossing of
    // the regime), the final TopKAgg exchange and the output sort; the
    // persisted corpus's Spread REPARTITION_BY_COL reprints under its two
    // InMemoryRelation references as in the sim_topk_* entries
    "sim_join_pq" -> 11,
    // the salted arm, measured 8: the skew-stats key agg + the salted
    // (cen_id, salt) exchange REPLACE the plain arm's single cen_id
    // exchange and forfeit the bucketed read by design (splitting a hot
    // list IS re-shuffling it); the rescore/final legs are sim_join_pq's
    "sim_join_pq_salted" -> 10,
    // perceptual near-dup, measured 8 in plan text: the band self-join's
    // two sides, the hot-band-cap agg (its anti-join broadcasts on the
    // fixture), the candidate distinct, the two verify join-backs against
    // the persisted feature frame, and the final sort — everything past
    // the banding is candidate-proportional, and payload bytes never
    // shuffle (only 4x24-byte band rows + 64-long histograms do)
    "mm_perceptual_dedup" -> 10,
    // the incremental arm shares the full arm's plan with one extra
    // batch filter on the join's build side — measured 8, same legs
    "mm_perceptual_incremental" -> 10,
    // fidelity = BOTH registered maxsim chains by design (the exact
    // all-chunks arm's aggs + the served probe's aggs) + the k x k-row
    // comparison join and final sort — measured 9
    "sim_maxsim_fidelity" -> 11
  ).withDefaultValue(6)

  test("every query plan builds, and its shuffle count stays within the audited bound") {
    val over = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      val shuffles = "Exchange".r.findAllIn(plan).length -
        "BroadcastExchange".r.findAllIn(plan).length
      spark.catalog.clearCache()
      graft.CheckpointUtil.releaseStragglers()
      if (shuffles > bounds(name)) Some(s"$name: $shuffles > ${bounds(name)}") else None
    }
    assert(over.isEmpty, over.mkString("; "))
  }
}
