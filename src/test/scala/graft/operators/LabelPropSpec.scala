package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** kNN label propagation (`sim_label_prop`). Pins (a) the modal-vote
  * round's tie rule and no-edge fallback on a hand-built edge list,
  * (b) the full query against an independent driver-side recomputation
  * of both rounds from the emitted graph on the real corpus, and (c) the
  * denoising property on a planted two-cluster fixture: a single
  * mislabeled node snaps to its neighborhood's consensus in one round
  * and the assignment is stable by round two.
  */
class LabelPropSpec extends SparkSuite {

  test("modal vote: majority wins, ties to the smallest label, no-edge node keeps") {
    import spark.implicits._
    // node 0 votes {4:2, 2:2, 9:1} -> tie between 4 and 2 -> 2 wins;
    // node 99 has no out-edges -> keeps its label 8
    val g = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L))
      .toDF("node", "nbr")
    val prev = Seq(0L -> 1L, 1L -> 4L, 2L -> 4L, 3L -> 2L, 4L -> 2L,
      5L -> 9L, 99L -> 8L).toDF("node", "l")
    val out = Similarity.lpRound(g, prev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 2L, s"tie must break to the smallest label: $out")
    assert(out(99L) == 8L, "a node with no out-edges keeps its label")
    assert(out(5L) == 9L && out(1L) == 4L, "non-voting nodes keep theirs")
  }

  test("both rounds match an independent recomputation on the real corpus") {
    val got = SimilarityQueries.queries("sim_label_prop")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.nonEmpty)

    val corpus = Similarity.prepareWith(Tables.embeddings(spark, sf0001),
      col("label")).persist()
    val edges = Similarity.ivfJoinTopK(corpus, corpus,
        SimilarityQueries.NCentroids, SimilarityQueries.NProbe,
        SimilarityQueries.KGraph)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val l0 = corpus.select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def round(prev: Map[Long, Long]): Map[Long, Long] = {
      val modal = edges.groupBy(_._1).map { case (n, es) =>
        n -> es.map(e => prev(e._2)).groupBy(identity).toSeq
          .map { case (l, xs) => (-xs.size, l) }.min._2
      }
      prev.map { case (n, l) => n -> modal.getOrElse(n, l) }
    }
    val (l1, l2) = { val a = round(l0); (a, round(a)) }
    assert(got.keySet == l0.keySet)
    got.foreach { case (n, (g0, g1, g2)) =>
      assert(g0 == l0(n) && g1 == l1(n) && g2 == l2(n), s"node $n")
    }
    // the pass is non-vacuous on the real corpus: some label changed
    assert(got.exists { case (_, (g0, g1, _)) => g0 != g1 })
  }

  test("planted two-cluster fixture: the mislabeled node snaps to consensus") {
    import spark.implicits._
    val dir = "/tmp/label_prop_fixture"
    // ids 0..11 cluster A on axis e0 (distinct tiny per-node perturbation
    // dims keep kNN deterministic), ids 12..23 cluster B on axis e1 —
    // orthogonal, so no cross-cluster edges exist. Labels: A all 3 except
    // node 5 mislabeled 7; B all 5.
    def vec(i: Int): Seq[Double] =
      if (i < 12) Seq.tabulate(64)(d =>
        if (d == 0) 1.0 else if (d == 2 + i) 0.1 * (i + 1) else 0.0)
      else Seq.tabulate(64)(d =>
        if (d == 1) 1.0 else if (d == 20 + (i - 12)) 0.1 * (i - 11) else 0.0)
    def label(i: Int): Int = if (i == 5) 7 else if (i < 12) 3 else 5
    (0 until 24).map(i => (i.toLong, vec(i), label(i)))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = SimilarityQueries.queries("sim_label_prop")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size == 24)
    assert(got(5L) == ((7L, 3L, 3L)),
      s"the mislabel must snap to the cluster consensus: ${got(5L)}")
    (0 until 12).filter(_ != 5).foreach(i =>
      assert(got(i.toLong) == ((3L, 3L, 3L)), s"A node $i"))
    (12 until 24).foreach(i =>
      assert(got(i.toLong) == ((5L, 5L, 5L)), s"B node $i"))
    // stability: round 2 changed nothing anywhere on this fixture
    assert(got.values.forall { case (_, g1, g2) => g1 == g2 })
  }
}
