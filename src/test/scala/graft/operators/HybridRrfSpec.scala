package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Hybrid retrieval with reciprocal-rank fusion (`sim_hybrid_rrf`).
  * Pins (a) the fused score as an exact recomputation from the emitted
  * ranks, (b) each arm's membership/ranks against its standalone
  * formulation (TopKAgg global top-k == orderBy/limit; vector ranks ==
  * bruteForceTopK), (c) the emitted ordering, and (d) the closed-form
  * RRF property on a planted fixture: a doc ranked 2nd in BOTH arms
  * must out-fuse each arm's rank-1 doc (2/62 > 1/61 + anything ≤ 0 —
  * the reason RRF exists).
  */
class HybridRrfSpec extends SparkSuite {

  private val K0 = SimilarityQueries.RrfK0

  test("fusion math, arm parity, and ordering on the real corpus") {
    val fused = SimilarityQueries.queries("sim_hybrid_rrf")(spark, sf0001)
      .collect()
    assert(fused.nonEmpty && fused.length <= 2 * SimilarityQueries.HybridK)

    // (a) rrf recomputes bit-exactly from the emitted integer ranks
    fused.foreach { r =>
      val (l, v) = (r.getLong(1), r.getLong(2))
      val expect = (if (l > 0) 1.0 / (K0 + l) else 0.0) +
        (if (v > 0) 1.0 / (K0 + v) else 0.0)
      assert(r.getDouble(3) == expect, s"doc ${r.getLong(0)}")
      assert(l > 0 || v > 0, "a fused doc must come from at least one arm")
    }

    // (b) lexical arm == window-free recomputation via orderBy/limit
    val lexTruth = TrainingDataQueries.bm25Scored(spark, sf0001)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(SimilarityQueries.HybridK)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1).toLong }.toMap
    val lexGot = fused.filter(_.getLong(1) > 0)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lexGot == lexTruth)

    // vector arm == bruteForceTopK of the single query vector
    val corpus = Similarity.prepare(Tables.embeddings(spark, sf0001))
    val vecTruth = Similarity.bruteForceTopK(corpus,
        corpus.filter(col("vec_id") === SimilarityQueries.HybridQueryVec),
        SimilarityQueries.HybridK)
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    val vecGot = fused.filter(_.getLong(2) > 0)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(vecGot == vecTruth)

    // (c) emitted order is (rrf desc, doc_id)
    val keys = fused.map(r => (-r.getDouble(3), r.getLong(0))).toSeq
    assert(keys == keys.sorted)
  }

  test("planted fixture: both-arms rank-2 doc out-fuses each arm's rank-1 doc") {
    import spark.implicits._
    val dir = "/tmp/hybrid_rrf_fixture"
    // 30 vectors, dim 64. Query = vec 0 (axis e0). Vector arm: doc 1 at
    // cos 1.0 (rank 1), doc 2 at cos 0.9 (rank 2), docs 4..29 at cos
    // ~0.5 (ranks 3..28 — doc 3 at cos 0 falls OUTSIDE top-20).
    // Lexical arm: doc 3 saturated in all three BM25 terms (rank 1),
    // doc 2 one occurrence of each (rank 2), nobody else matches.
    // So: doc 2 = (2, 2) -> rrf 2/62; doc 3 = (1, -) and doc 1 = (-, 1)
    // -> rrf 1/61 each. 2/62 > 1/61: doc 2 MUST top the fused list.
    def vec(i: Int): Seq[Double] = i match {
      case 0 => Seq.tabulate(64)(d => if (d == 0) 1.0 else 0.0)
      case 1 => Seq.tabulate(64)(d => if (d == 0) 1.0 else 0.0)
      case 2 => Seq.tabulate(64)(d =>
        if (d == 0) 0.9 else if (d == 1) math.sqrt(1.0 - 0.81) else 0.0)
      case 3 => Seq.tabulate(64)(d => if (d == 2) 1.0 else 0.0)
      case i => Seq.tabulate(64)(d =>
        if (d == 0) 0.5 else if (d == 3 + (i % 7)) math.sqrt(0.75) else 0.0)
    }
    (0 until 30).map(i => (i.toLong, vec(i), 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def text(i: Int): String = i match {
      case 3 => Seq.fill(10)("join hash scan").mkString(" ")
      case 2 => "join hash scan " + Seq.fill(7)("filler words here").mkString(" ")
      case i => s"plain doc $i with nothing relevant at all"
    }
    (0 until 30).map(i => (i.toLong, text(i), "en", "srcA", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val fused = SimilarityQueries.queries("sim_hybrid_rrf")(spark, dir)
      .collect()
    val byId = fused.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // the planted arms came out as designed
    assert(byId(3L)._1 == 1L && byId(3L)._2 == 0L, s"doc 3: ${byId(3L)}")
    assert(byId(1L)._1 == 0L && byId(1L)._2 == 1L, s"doc 1: ${byId(1L)}")
    assert(byId(2L)._1 == 2L && byId(2L)._2 == 2L, s"doc 2: ${byId(2L)}")
    // closed-form fused scores and the RRF reranking property
    assert(byId(2L)._3 == 1.0 / (K0 + 2) + 1.0 / (K0 + 2))
    assert(byId(3L)._3 == 1.0 / (K0 + 1) && byId(1L)._3 == 1.0 / (K0 + 1))
    assert(fused.head.getLong(0) == 2L,
      "the both-arms rank-2 doc must top the fused list")
    // doc 3 (cos 0) was pushed out of the vector top-20 by construction
    assert(byId(3L)._2 == 0L)
  }
}
