package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}

/** `sim_range_search` semantics the hash-exact oracle can't state:
  * consistency with the top-k tier (same probe set ⇒ every top-k hit above
  * tau is a range hit and vice versa), the tau gate is exact on the probed
  * candidates, and recall against brute force stays ANN-reasonable.
  */
class RangeSearchSpec extends SparkSuite {
  import SimilarityQueries.{K, NQueries, TauRange}

  private lazy val range =
    SparkEntry.queries("sim_range_search")(spark, sf0001).persist()
  private lazy val topk =
    SparkEntry.queries("sim_topk_ivf")(spark, sf0001).persist()

  test("non-empty, every score >= tau, no self matches") {
    assert(range.count() > 0)
    assert(range.filter(col("cos") < TauRange).count() == 0)
    assert(range.filter(col("query_id") === col("vec_id")).count() == 0)
  }

  test("agrees with the top-k tier on the shared probe set") {
    // every top-k hit with cos >= tau must be a range hit
    val missing = topk.filter(col("cos") >= TauRange)
      .select("query_id", "vec_id")
      .join(range.select("query_id", "vec_id"),
        Seq("query_id", "vec_id"), "left_anti")
    assert(missing.count() == 0)
    // and a range hit absent from top-k can only be rank-crowded-out:
    // its query must have a FULL top-k list whose floor beats tau
    val floor = topk.groupBy("query_id")
      .agg(count(lit(1)).as("nk"), min("cos").as("kth"))
    val bad = range.join(topk.select("query_id", "vec_id")
        .withColumn("in_topk", lit(true)), Seq("query_id", "vec_id"), "left")
      .filter(col("in_topk").isNull)
      .join(floor, "query_id")
      .filter(col("nk") < K || col("kth") < TauRange)
    assert(bad.count() == 0)
  }

  test("distributed range join agrees with the broadcast range path on shared queries") {
    // sim_range_join's query side is vec_id % 5 == 2; sim_range_search's
    // is vec_id < NQueries — query 2 and 7 are in both. On that overlap
    // the two executions (broadcast probes vs shuffle-hash join) must be
    // row-identical: one probe rule, one tau, two physical plans.
    val join = SparkEntry.queries("sim_range_join")(spark, sf0001)
      .filter(col("query_id") < NQueries)
    val search = range.filter(col("query_id") % 5 === 2)
    assert(join.count() > 0)
    assert(join.exceptAll(search).count() == 0)
    assert(search.exceptAll(join).count() == 0)
  }

  test("k-NN graph covers every node with exactly KGraph ranked neighbors") {
    import SimilarityQueries.KGraph
    val g = SparkEntry.queries("sim_knn_graph")(spark, sf0001).persist()
    val nV = Similarity.prepare(Tables.embeddings(spark, sf0001)).count()
    assert(g.select("query_id").distinct().count() == nV,
      "a corpus vector is missing from its own k-NN graph")
    assert(g.filter(col("rank") < 1 || col("rank") > KGraph).count() == 0)
    val deg = g.groupBy("query_id").count()
    assert(deg.filter(col("count") =!= KGraph).count() == 0,
      "a node has fewer than KGraph neighbors — probed lists too sparse")
    assert(g.filter(col("query_id") === col("vec_id")).count() == 0)
  }

  test("mutual-kNN clustering: symmetric membership, real structure, degree-bounded") {
    import SimilarityQueries.{KGraph, KnnClusterTau}
    val cl = SparkEntry.queries("sim_cluster_knn")(spark, sf0001).persist()
    val n = cl.count()
    assert(n > 0)
    // non-degenerate structure at fixture scale: several clusters, none
    // swallowing the clustered set
    val sizes = cl.groupBy("cluster_id").count()
    assert(sizes.count() >= 5, "expected multiple clusters")
    assert(sizes.agg(max("count")).head.getLong(0) < n,
      "one giant component — tau dial lost its structure")
    // every member's cluster id is a member, and is the minimum member
    val byId = cl.groupBy("cluster_id").agg(min("id").as("min_id"))
    assert(byId.filter(col("cluster_id") =!= col("min_id")).count() == 0)
    // a clustered node appears once
    assert(cl.select("id").distinct().count() == n)
    // mutuality bounds the degree: a node's cluster stems from <= KGraph
    // reciprocal edges, so no node can appear with rank > KGraph in the
    // graph — sanity via the graph itself
    val g = SparkEntry.queries("sim_knn_graph")(spark, sf0001)
    assert(g.filter(col("rank") > KGraph).count() == 0)
    assert(KnnClusterTau > 0.0)
  }

  test("range recall vs exact brute-force threshold search is >= 0.8") {
    val corpus = Similarity.prepare(Tables.embeddings(spark, sf0001)).persist()
    val q = corpus.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val exact = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", Dedup.cosine(col("qv"), col("v"), col("qnrm"), col("nrm")))
      .filter(col("cos") >= TauRange)
      .select("query_id", "vec_id")
    val nExact = exact.count()
    val hit = exact.join(range.select("query_id", "vec_id"),
      Seq("query_id", "vec_id"), "left_semi").count()
    assert(nExact > 0)
    assert(hit.toDouble / nExact >= 0.8,
      s"range recall $hit/$nExact below 0.8")
  }
}
