package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** E2E retrieval composition (`pipeline_e2e_retrieve`): hybrid RRF fusion
  * → MMR diversification → metadata. Pins (a) stage parity — the fused
  * scores the composition consumes are EXACTLY `sim_hybrid_rrf`'s rows,
  * (b) the MMR stage against an independent driver-side greedy over that
  * fused pool, and (c) shape/metadata integrity.
  */
class E2eRetrieveSpec extends SparkSuite {

  test("composition == hybrid fusion piped through an independent greedy") {
    val got = SimilarityQueries.queries("pipeline_e2e_retrieve")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getString(4), r.getString(5)))
      .sortBy(_._1)
    assert(got.length == SimilarityQueries.MmrK)
    assert(got.map(_._1).toSeq == (1 to SimilarityQueries.MmrK).map(_.toLong))

    // stage parity: the upstream fusion, exactly as sim_hybrid_rrf emits it
    val fused = SimilarityQueries.queries("sim_hybrid_rrf")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    got.foreach { case (_, id, rrf, _, _, _) =>
      assert(fused(id) == rrf, s"doc $id rrf must match sim_hybrid_rrf") }

    // independent greedy over (fused ∩ embeddings) with rel = rrf
    val emb = Similarity.prepare(Tables.embeddings(spark, sf0001))
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val lam = SimilarityQueries.MmrLambda
    val pool = scala.collection.mutable.ArrayBuffer.from(
      fused.toSeq.collect { case (id, rrf) if emb.contains(id) => (rrf, id, emb(id)) }
        .sortBy { case (rrf, id, _) => (-rrf, id) })
    val sel = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    while (expect.length < SimilarityQueries.MmrK && pool.nonEmpty) {
      val scored = pool.toSeq.map { case (rel, id, u) =>
        val s = if (sel.isEmpty) lam * rel
                else lam * rel - (1.0 - lam) * sel.map(dot(u, _)).max
        (s, id, u)
      }
      val best = scored.minBy { case (s, id, _) => (-s, id) }
      pool.remove(pool.indexWhere(_._2 == best._2))
      sel += best._3
      expect += ((best._2, best._1))
    }
    assert(got.map(r => (r._2, r._4)).toSeq == expect.toSeq)

    // metadata integrity: source/lang come from the documents table
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("lang"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    got.foreach { case (_, id, _, _, src, lang) =>
      assert(docs(id) == ((src, lang)), s"doc $id metadata") }
  }
}
