package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** MMR diversified rerank (`sim_mmr_rerank` / [[MmrAgg]]). Pins (a) the
  * whole query against an independent driver-side greedy recomputation
  * from the raw scored pairs on the real corpus, (b) partition-invariance
  * of the mergeable pool (1 vs 7 partitions — the merge law), and (c) the
  * diversity property MMR exists for, on a planted fixture: a
  * near-duplicate of the top pick is DEMOTED below a less-relevant but
  * orthogonal candidate.
  */
class MmrSpec extends SparkSuite {

  private val (n, k, lam) =
    (SimilarityQueries.MmrN, SimilarityQueries.MmrK, SimilarityQueries.MmrLambda)

  /** Reference greedy, independent of MmrAgg: pool = top-n by
    * (rel desc, id asc), then argmax λ·rel − (1−λ)·maxSim, ties to the
    * lowest id. */
  private def greedy(cands: Seq[(Double, Long, Seq[Double])]): Seq[(Long, Double, Double)] = {
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val pool = scala.collection.mutable.ArrayBuffer.from(
      cands.sortBy { case (rel, id, _) => (-rel, id) }.take(n))
    val sel = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    val out = Seq.newBuilder[(Long, Double, Double)]
    var picks = 0
    while (picks < k && pool.nonEmpty) {
      val scored = pool.toSeq.map { case (rel, id, u) =>
        val s = if (sel.isEmpty) lam * rel
                else lam * rel - (1.0 - lam) * sel.map(dot(u, _)).max
        (s, id, rel, u)
      }
      val best = scored.minBy { case (s, id, _, _) => (-s, id) }
      pool.remove(pool.indexWhere(_._2 == best._2))
      sel += best._4
      out += ((best._2, best._3, best._1))
      picks += 1
    }
    out.result()
  }

  test("query matches an independent greedy recomputation on the real corpus") {
    val got = SimilarityQueries.queries("sim_mmr_rerank")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)

    val corpus = Similarity.prepare(graft.Tables.embeddings(spark, sf0001)).persist()
    val q = corpus.filter(col("vec_id") < SimilarityQueries.NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val raw = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("rel"),
        transform(col("v"), x => x / col("nrm")).as("u"))
      .collect()
      .map(r => (r.getLong(0), (r.getDouble(2), r.getLong(1), r.getSeq[Double](3))))
      .groupBy(_._1)
    val expect = raw.toSeq.sortBy(_._1).flatMap { case (qid, rows) =>
      greedy(rows.map(_._2).toSeq).zipWithIndex.map { case ((id, rel, s), i) =>
        (qid, (i + 1).toLong, id, rel, s)
      }
    }
    assert(got.sortBy(r => (r._1, r._2)).toSeq == expect)
    // non-vacuous: at least one query's MMR order differs from pure-rel order
    val reordered = expect.groupBy(_._1).exists { case (_, picks) =>
      picks.sortBy(_._2).map(_._4) != picks.map(_._4).sorted(Ordering[Double].reverse)
    }
    assert(reordered, "MMR must actually reorder somewhere on the real corpus")
  }

  test("pool merge law: 1 partition == 7 partitions") {
    import spark.implicits._
    val rows = (0 until 100).map { i =>
      val u = Seq.tabulate(8)(d => if (d == i % 8) 1.0 else 0.0)
      (1L, 1.0 - i * 0.003, (i + 10).toLong, u)
    }
    def run(parts: Int) = rows.toDF("qid", "rel", "id", "u")
      .repartition(parts)
      .groupBy("qid")
      .agg(MmrAgg.column(n, k, lam, col("rel"), col("id"), col("u")).as("sel"))
      .select(posexplode(col("sel")))
      .collect().map(r => (r.getInt(0), r.getStruct(1).getLong(0)))
      .toSeq.sortBy(_._1)
    assert(run(1) == run(7))
  }

  test("planted fixture: the near-duplicate of pick 1 is demoted below an orthogonal doc") {
    import spark.implicits._
    // A1 (rel .99) and its near-dup A2 (rel .98, cos(A1,A2) ≈ .998); B
    // exactly orthogonal to both (rel .60 — the aggregator takes rel as
    // an input, so the unit test decouples it from the geometry). Pure
    // top-3 by rel: A1, A2, B. MMR at λ=0.7: after A1, A2 scores
    // .7·.98 − .3·.998 ≈ .387 while B scores .7·.60 − .3·0 = .42 —
    // B must be picked second, the near-dup demoted to third.
    def unit(v: Seq[Double]): Seq[Double] = {
      val nrm = math.sqrt(v.map(x => x * x).sum); v.map(_ / nrm)
    }
    val a1 = unit(Seq.tabulate(16)(d => if (d == 0) 0.99 else if (d == 1) 0.141 else 0.0))
    val a2 = unit(Seq.tabulate(16)(d => if (d == 0) 0.98 else if (d == 1) 0.2 else 0.0))
    val b = Seq.tabulate(16)(d => if (d == 2) 1.0 else 0.0)
    val cands = Seq((0.99, 11L, a1), (0.98, 12L, a2), (0.60, 13L, b))
    val got = cands.map { case (rel, id, u) => (1L, rel, id, u) }
      .toDF("qid", "rel", "id", "u")
      .groupBy("qid")
      .agg(MmrAgg.column(n, 3, lam, col("rel"), col("id"), col("u")).as("sel"))
      .select(posexplode(col("sel")))
      .collect().sortBy(_.getInt(0))
      .map(_.getStruct(1).getLong(0)).toSeq
    assert(got == Seq(11L, 13L, 12L),
      s"MMR must demote the near-duplicate: got $got")
    // control: the same pool ranked purely by relevance keeps the dup 2nd
    assert(cands.sortBy(-_._1).map(_._2) == Seq(11L, 12L, 13L))
  }
}
