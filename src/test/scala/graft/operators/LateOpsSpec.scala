package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}

/** Invariants for the late-round operators (multi-suite decontamination,
  * IVF health, exact median, snapshot swap, top bigrams). */
class LateOpsSpec extends SparkSuite {

  test("multi-suite flags agree with the single-suite membership rule") {
    val multi = SparkEntry.queries("pipeline_decontaminate_multi")(spark, sf0001)
      .persist()
    assert(multi.count() > 0)
    // every flagged row carries at least one suite hit
    assert(multi.filter(!col("hit_src18") && !col("hit_src19")).count() == 0)
    // both suites must be individually non-vacuous at fixture scale
    assert(multi.filter(col("hit_src18")).count() > 0)
    assert(multi.filter(col("hit_src19")).count() > 0)
    multi.unpersist()
  }

  test("IVF health report reconciles with the assignment pass") {
    val h = SparkEntry.queries("sim_ivf_health")(spark, sf0001).persist()
    assert(h.count() == SimilarityQueries.NCentroids)
    val total = h.agg(sum("n_members")).head.getLong(0)
    val corpus = Similarity.prepare(Tables.embeddings(spark, sf0001)).count()
    assert(total == corpus, s"members $total must cover the $corpus vectors")
    // cosine to own centroid is at most 1 (2^20 units) and positive mass
    assert(h.filter(col("sum_cos_units") > col("n_members") * 1048576L ||
      col("sum_cos_units") < 0).count() == 0)
    h.unpersist()
  }

  test("two-pass exact median equals the sort-based median") {
    val r = SparkEntry.queries("q_exact_median")(spark, sf0001).head
    val x = Tables.lineitem(spark, sf0001)
      .select(col("l_extendedprice").as("x"))
    val n = x.count()
    val k = ((n + 1) / 2).toInt
    val kth = x.orderBy("x").limit(k).agg(max("x")).head.getDouble(0)
    assert(r.getLong(0) == n && r.getDouble(1) == kth)
  }

  test("snapshot swap: current reads as v2, v1 survives, delete batch applied") {
    val rows = SparkEntry.queries("src_snapshot_swap")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("current") == rows("v2"), "the pointer must resolve to v2")
    assert(rows("v1") != rows("v2"), "the delete batch must change content")
    val full = Tables.documents(spark, sf0001).count()
    val kept = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(10)) =!= 7).count()
    assert(rows("v1")._1 == full && rows("v2")._1 == kept && kept < full)
  }

  test("top bigrams: counts bounded by the token mass and properly ordered") {
    val b = SparkEntry.queries("text_top_bigrams")(spark, sf0001).collect()
    assert(b.length == 20)
    val ns = b.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, c) => a >= c }, "descending counts")
    assert(ns.head > 1, "the head bigram must actually repeat")
  }

  test("token drift: planted shift yields the closed-form ppm deltas") {
    import spark.implicits._
    // ids 0..9 -> boundary 9*4/5 = 7: base = 8 docs of "a b"
    // (a:8, b:8, t=16), batch = 2 docs of "a a a b" (a:6, b:2, t=8)
    val docs = ((0L to 7L).map(i => (i, "a b")) ++
      (8L to 9L).map(i => (i, "a a a b"))).toDF("doc_id", "text")
    val r = TrainingDataQueries.tokenDrift(docs).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))
      .toMap
    assert(r("a") == ((8L, 6L, 500000L, 750000L, 250000L)), r("a").toString)
    assert(r("b") == ((8L, 2L, 500000L, 250000L, -250000L)), r("b").toString)
    assert(r.size == 2)
    // fixture: the report is non-degenerate (some token actually drifts)
    val fix = SparkEntry.queries("pipeline_token_drift")(spark, sf0001).collect()
    assert(fix.nonEmpty && fix.length <= TrainingDataQueries.DriftTopK)
    assert(fix.exists(_.getLong(5) != 0L), "degenerate: zero drift everywhere")
    graft.CheckpointUtil.releaseStragglers()
  }

  test("ngram novelty: planted batch yields the closed-form novelty ppm") {
    import spark.implicits._
    // base = ids 0..7, all "t0 .. t9" (3 distinct 8-gram shingles);
    // batch doc 8 repeats the base text (0/3 novel), batch doc 9 keeps
    // the first 8 tokens and rewrites the last 2 (windows 2,3 novel ->
    // 2*1e6 // 3 = 666666 ppm)
    val baseTxt = (0 until 10).map("t" + _).mkString(" ")
    val mixTxt = ((0 until 8).map("t" + _) ++ Seq("zz", "yy")).mkString(" ")
    val docs = ((0L to 8L).map(i => (i, baseTxt)) :+ ((9L, mixTxt)))
      .toDF("doc_id", "text")
    val r = TrainingDataQueries.ngramNovelty(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r == Map(8L -> ((3L, 0L, 0L)), 9L -> ((3L, 2L, 666666L))), r.toString)
    // fixture: batch docs exist on both ends of the novelty range's
    // interior (shared structure AND novel text), never degenerate
    val fix = SparkEntry.queries("pipeline_ngram_novelty")(spark, sf0001)
      .collect().map(_.getLong(3))
    assert(fix.nonEmpty)
    assert(fix.exists(_ < 1000000L), "degenerate: every batch doc fully novel")
    assert(fix.exists(_ > 0L), "degenerate: no novelty anywhere")
    graft.CheckpointUtil.releaseStragglers()
  }
}
