package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Incremental kNN-graph maintenance (`sim_knn_graph_incremental`). The
  * driver oracle already pins it hash-exactly to the full rebuild's twin;
  * this spec pins the equivalence IN-ENGINE (row-identical to
  * `ivfJoinTopK(full, full)`) and the two non-vacuity facts that make the
  * test meaningful: batch nodes enter the graph, and at least one
  * STANDING node's neighborhood actually changed (so the update path —
  * not just the append path — is exercised).
  */
class KnnGraphIncrementalSpec extends SparkSuite {

  test("incremental == full rebuild, and both paths are non-vacuous") {
    import SimilarityQueries._
    val got = SimilarityQueries.queries("sim_knn_graph_incremental")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2))

    val full = Similarity.prepare(Tables.embeddings(spark, sf0001)).persist()
    val rebuild = Similarity.ivfJoinTopK(full, full, NCentroids, NProbe, KGraph)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == rebuild.toSeq)

    val isBatch = (id: Long) => id >= NCentroids && id % 10 == 7
    assert(got.exists(r => isBatch(r._1)), "batch nodes must appear as queries")
    // the standing-update path fired: some standing node has a batch
    // neighbor in its final top-k (its old edge was displaced)
    assert(got.exists(r => !isBatch(r._1) && isBatch(r._3)),
      "some standing node's neighborhood must absorb a batch vector")
    // and the standing graph wasn't wholesale recomputed into different
    // rows: most standing edges survive from the pre-batch graph
    val standing = full.filter(!(col("vec_id") >= NCentroids && col("vec_id") % 10 === 7))
    val old = Similarity.ivfJoinTopK(standing, standing, NCentroids, NProbe, KGraph)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val kept = got.filter(r => !isBatch(r._1)).count(r => old.contains((r._1, r._3)))
    val standingEdges = got.count(r => !isBatch(r._1))
    assert(kept * 10 >= standingEdges * 8,
      s"a 10% batch should displace <20% of standing edges ($kept/$standingEdges kept)")
  }

  test("loud guard: a batch id anywhere in the quantizer window throws, even a gap-filler") {
    import SimilarityQueries._
    val full = Similarity.prepare(Tables.embeddings(spark, sf0001))
    // standing lacks id 3 — a GAP inside [0, NCentroids). Its quantizer is
    // {0,1,2,4,…}; the rebuild oracle over (standing ∪ batch) would include
    // 3 as a centroid, so the equivalence breaks WITHOUT the batch row
    // colliding with any collected standing-centroid id — the case the
    // membership-only guard missed.
    val standing = full.filter(col("vec_id") =!= 3L)
    val graph = Similarity.ivfJoinTopK(standing, standing, NCentroids, NProbe, KGraph)
    val batch = full.filter(col("vec_id") === 3L)
    val e = intercept[IllegalArgumentException] {
      Similarity.knnGraphIncremental(standing, graph, batch,
        NCentroids, NProbe, KGraph).collect()
    }
    assert(e.getMessage.contains("quantizer"), e.getMessage)
  }
}
