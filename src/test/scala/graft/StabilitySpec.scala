package graft

import org.apache.spark.sql.functions.col

/** Within-session rerun stability of the hash-exact surface's riskiest
  * shapes. The oracle gate proves a run matches DuckDB ONCE; this pins
  * that a second run of the same query in the same session produces
  * byte-identical rows — the property that fails when an ordering the
  * result depends on (collect_list without sort_array, a partition-
  * dependent sample, an unseeded tiebreak) is only coincidentally stable.
  * Queries chosen for having list-fold / hash-combine / top-k outputs
  * whose value depends on an internal order.
  */
class StabilitySpec extends SparkSuite {

  private val Suspects = Seq(
    "pipeline_pack_manifest", // collect_list -> sort_array -> combine hash
    "pipeline_shard",         // struct-sorted order hash
    "pipeline_domain_cap",    // TopKAgg quota + kept-order hash
    "pipeline_length_buckets",// sorted-id combine per bucket
    "text_inverted_index",    // collect_set -> sort_array postings hash
    "dedup_minhash_by_source",// mergeable sketch agg across partitions
    "dedup_paragraph",        // min(struct) canonical + ordered kept hash
    "pipeline_bpe",           // learned merge table folded into pieces hash
    "sim_topk_filtered",      // TopKAgg under a corpus predicate
    "src_ivf_compact",        // write/compact/probe lifecycle end to end
    "pipeline_e2e_full",      // quota TopKAgg + mix explode + prefix-sum pack + key-list hash
    "pipeline_e2e_incremental"// checkpointed state frames + broadcast probes + victim union
  )

  test("order-sensitive hash-exact queries are byte-identical across reruns") {
    Suspects.foreach { name =>
      val run = () => SparkEntry.queries(name)(spark, sf0001)
        .collect().map(_.toString).toSeq
      val a = run()
      spark.catalog.clearCache()
      CheckpointUtil.releaseStragglers()
      val b = run()
      spark.catalog.clearCache()
      CheckpointUtil.releaseStragglers()
      assert(a == b, s"$name diverged across reruns")
      assert(a.nonEmpty, s"$name returned nothing — vacuous stability")
    }
  }

  test("consistent-hash sampling is invariant to the input's partitioning") {
    // the property df.sample lacks: the draw must not depend on how rows
    // are packed into partitions
    val base = Tables.documents(spark, sf0001)
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    def sampleOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(org.apache.spark.sql.functions.pmod(
          graft.functions.TextFunctions.polyHash(col("doc_id").cast("string")),
          org.apache.spark.sql.functions.lit(100)) < 10)
        .select("doc_id").collect().map(key).toSet
    val s1 = sampleOf(base)
    val s2 = sampleOf(base.repartition(7))
    val s3 = sampleOf(base.repartition(1))
    assert(s1.nonEmpty)
    assert(s1 == s2 && s2 == s3)
  }
}
