package graft

// Throwaway r17 diagnostic: time connectedComponents over the
// sim_cluster_knn mutual edge set. Not part of the library surface.
object CcDebug {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = Tables.localSession(32)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.operators.{Dedup, Similarity}
    val corpus = Similarity.prepare(Tables.embeddings(spark, sf)).persist()
    val g = Similarity.ivfJoinTopK(corpus, corpus, 16, 4, 5)
      .filter(col("cos") >= 0.35)
      .select(col("query_id").as("id_a"), col("vec_id").as("id_b"))
      .persist()
    val mutual = g.join(
      g.select(col("id_b").as("id_a"), col("id_a").as("id_b")),
      Seq("id_a", "id_b"), "left_semi")
    val mu = CheckpointUtil.track(mutual.localCheckpoint(true))
    println("[ccdebug] mutual rows: " + mu.count())
    for (round <- Seq("cold", "warm", "warm2")) {
      val t0 = System.nanoTime()
      val (labels, iters) = Dedup.connectedComponentsWithStats(mu)
      val n = labels.count()
      println(f"[ccdebug] cc $round: ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"iters=$iters labels=$n")
    }
    spark.stop()
  }
}
