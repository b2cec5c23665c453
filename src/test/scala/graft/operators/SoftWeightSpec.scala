package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** `dedup_soft_weight` invariants: per-cluster training mass is conserved
  * (one document's worth per cluster, up to integer-division truncation),
  * singletons are untouched, and the cluster assignment is the SAME one
  * the hard keep/drop queries use — soft and hard dedup may not fork.
  */
class SoftWeightSpec extends SparkSuite {

  private lazy val w =
    SparkEntry.queries("dedup_soft_weight")(spark, sf0001).persist()

  test("every doc appears once; singletons keep full weight") {
    val n = w.count()
    assert(n > 0 && w.select("doc_id").distinct().count() == n)
    assert(w.filter(col("n_members") === 1 &&
      col("weight_ppm") =!= 1000000L).count() == 0)
  }

  test("cluster mass is one document's worth, up to div truncation") {
    val bad = w.groupBy(col("cluster_id"))
      .agg(sum(col("weight_ppm")).as("mass"), max(col("n_members")).as("m"),
        count(lit(1)).as("k"))
      // every member reports the same size, and the size is the count
      .filter(col("m") =!= col("k") ||
        col("mass") > 1000000L || col("mass") <= lit(1000000L) - col("k"))
    assert(bad.count() == 0)
  }

  test("cluster assignment agrees with the hard-dedup clusters query") {
    val hard = SparkEntry.queries("dedup_clusters")(spark, sf0001)
      .select(col("id").as("doc_id"), col("canonical_id"))
    val disagree = w.join(hard, "doc_id")
      .filter(col("cluster_id") =!= col("canonical_id")).count()
    assert(disagree == 0)
    // and docs OUTSIDE any cluster are their own singleton cluster
    val loners = w.join(hard, Seq("doc_id"), "left_anti")
    assert(loners.filter(col("cluster_id") =!= col("doc_id") ||
      col("n_members") =!= 1).count() == 0)
  }
}
