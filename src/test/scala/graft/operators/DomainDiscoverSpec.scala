package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Unsupervised domain discovery (`pipeline_domain_discover`): Lloyd
  * centers over the embedding corpus -> in-scan nearest-center
  * assignment -> per-cluster size/share/modal-source report. Pins the
  * share accounting, the modal source against an independent
  * recomputation, and the (-count, source) min-struct tie-break on a
  * constructed exact tie.
  */
class DomainDiscoverSpec extends SparkSuite {

  test("fixture invariants: shares account for every assigned doc; modal source matches recomputation") {
    val rep = SimilarityQueries.queries("pipeline_domain_discover")(spark, sf0001)
      .collect()
    assert(rep.length == SimilarityQueries.NCentroids)
    val total = rep.map(_.getLong(1)).sum
    // every non-zero-norm embedding is assigned exactly once
    val assigned = Similarity.prepare(Tables.embeddings(spark, sf0001)).count()
    assert(total == assigned)
    // truncated ppm shares: each row floor-truncates, so the sum is in
    // (1e6 - nClusters, 1e6]
    val ppm = rep.map(_.getLong(2)).sum
    assert(ppm <= 1000000L && ppm > 1000000L - rep.length)
    // modal source cross-check via an independent formulation (window max)
    val corpus = Similarity.prepare(Tables.embeddings(spark, sf0001))
    val cents = Similarity.lloydCentroids(corpus, SimilarityQueries.NCentroids,
      SimilarityQueries.LloydIters, 60, SimilarityQueries.LloydMaxSample)
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("source"))
    val modal = Similarity.ivfAssign(corpus, cents)
      .join(docs, col("vec_id") === col("doc_id"))
      .groupBy("cen_id", "source").agg(count(lit(1)).as("c"))
      .collect().groupBy(_.getLong(0)).map { case (cid, rows) =>
        val best = rows.map(r => (-r.getLong(2), r.getString(1))).min
        cid -> (best._2, -best._1)
      }
    rep.foreach { r =>
      val (src, cnt) = modal(r.getLong(0))
      assert(r.getString(3) == src, s"cluster ${r.getLong(0)}")
      assert(r.getLong(4) == cnt * 1000000L / r.getLong(1))
    }
  }

  test("exact source tie in a cluster -> lexicographically smallest source wins") {
    import spark.implicits._
    val dir = "/tmp/domain_tie_fixture"
    // two blobs of IDENTICAL unit vectors (axes 0 and 1), 32 docs each;
    // within a blob half the docs are source zz, half aa -> exact modal
    // tie in every discovered cluster, aa must win. 64 vectors keep the
    // 60%-hash Lloyd sample above k=16.
    def vec(axis: Int): Seq[Double] =
      Seq.tabulate(64)(d => if (d == axis) 1.0 else 0.0)
    (0 until 64).map(i => (i.toLong, vec(i % 2), 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    (0 until 64).map(i => (i.toLong, s"doc $i text", "en",
        if ((i / 2) % 2 == 0) "zz" else "aa", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rep = SimilarityQueries.queries("pipeline_domain_discover")(spark, dir)
      .collect()
    // every reported cluster has an exact zz/aa tie; min-struct must
    // resolve it to the lexicographically smaller source
    assert(rep.nonEmpty)
    rep.foreach { r =>
      assert(r.getString(3) == "aa",
        s"cluster ${r.getLong(0)}: expected tie-break to aa, got ${r.getString(3)}")
      assert(r.getLong(4) == 500000L, s"tie share must be exactly half: $r")
    }
    assert(rep.map(_.getLong(1)).sum == 64L)
  }
}
