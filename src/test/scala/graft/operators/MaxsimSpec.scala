package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Late-interaction retrieval (`sim_maxsim_topk`). The planted fixture is
  * the case maxsim exists for: a MULTI-TOPIC doc M that covers both query
  * topics in separate chunks but carries a large off-topic tail, vs a
  * single-topic doc B. A whole-doc embedding dilutes M's on-topic mass
  * into the tail (cos ≈ 0.45 < B's 0.71 — single-vector ranks B first,
  * wrongly), while maxsim matches each query chunk against M's best
  * chunk (≈3 full matches vs B's ≈1.3) and ranks M first. Also pins
  * partition invariance of the two-agg + TopKAgg pipeline.
  */
class MaxsimSpec extends SparkSuite {

  private def phash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)

  test("planted multi-topic doc: maxsim ranks it first where single-vector cosine fails") {
    import spark.implicits._
    val dim = SimilarityQueries.MaxsimDim

    // pick 10 words landing in 10 DISTINCT hashEmbed buckets, so topic
    // directions are orthogonal by construction
    val words = Iterator.from(0).map(i => s"w$i")
      .scanLeft(Vector.empty[String]) { (acc, w) =>
        if (acc.map(x => phash(x) % dim).contains(phash(w) % dim)) acc else acc :+ w
      }.dropWhile(_.length < 10).next()
    val Seq(alpha, omega) = words.take(2)
    val noise = words.drop(2).take(8)

    def rep(w: String, n: Int): String = Seq.fill(n)(w).mkString(" ")
    val query = rep(alpha, 64) + " " + rep(omega, 64)
    val docM = query + " " + noise.map(rep(_, 64)).mkString(" ") // both topics + 512-token tail
    val docB = rep(alpha, 128)                                   // single topic
    val docs = Seq(
      (0L, query), (10L, docM), (11L, docB),
      (12L, rep(noise(0), 96)), (13L, rep(noise(1), 96))
    ).toDF("doc_id", "text")

    // maxsim: the multi-topic doc wins
    val got = SimilarityQueries.maxsimTopK(docs, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.head._2 == 10L, s"maxsim must rank the multi-topic doc first: ${got.toSeq}")
    // M's prefix IS the query, but its 640-token chunk grid differs from
    // the query's 128-token grid, so the third query chunk matches at
    // cos≈0.95 rather than 1.0: score ≈ 2.95 of 3 possible — still more
    // than twice B's single-topic ≈1.3
    assert(got.head._3 > (2.8 * 1048576).toLong, s"M must near-fully match: ${got.toSeq}")
    assert(got.head._3 > 2 * got(1)._3, s"M must dominate the pure doc: ${got.toSeq}")

    // single whole-doc vector: the SAME embedder ranks the single-topic
    // doc above M — the dilution failure maxsim repairs
    import graft.functions.NativeExpressions
    val dv = docs
      .select(col("doc_id"), NativeExpressions.hashEmbed(col("text"), dim).as("v"))
      .withColumn("nrm", Dedup.l2norm(col("v")))
    val qv = dv.filter(col("doc_id") === 0L)
      .select(col("v").as("qv"), col("nrm").as("qnrm"))
    val single = dv.filter(col("doc_id") =!= 0L).crossJoin(qv)
      .select(col("doc_id"),
        Dedup.cosine(col("qv"), col("v"), col("qnrm"), col("nrm")).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(single(11L) > single(10L),
      s"single-vector must (wrongly) prefer the pure doc: $single")

    // partition invariance
    val re = SimilarityQueries.maxsimTopK(docs.repartition(7), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(re.toSeq == got.toSeq)
    spark.catalog.clearCache()
    graft.CheckpointUtil.releaseStragglers()
  }

  test("IVF arm tracks the exact arm: top-1 agreement on the fixture, high overlap on the corpus") {
    // real corpus: the probed arm must find most of what brute maxsim finds
    val k = SimilarityQueries.MaxsimK
    val exact = SimilarityQueries.queries("sim_maxsim_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    val ivf = SimilarityQueries.queries("sim_maxsim_ivf")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    assert(exact.length == k && ivf.length == k)
    assert(exact.head._2 == ivf.head._2,
      s"top-1 must agree: exact=${exact.head} ivf=${ivf.head}")
    val overlap = exact.map(_._2).toSet.intersect(ivf.map(_._2).toSet).size
    assert(overlap >= k * 6 / 10,
      s"recall@$k must be >= 0.6 at 4/16 probes on the near-isotropic fixture, got $overlap/$k")
    graft.CheckpointUtil.releaseStragglers()
  }
}
