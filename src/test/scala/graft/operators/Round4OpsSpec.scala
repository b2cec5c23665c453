package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.TextFunctions

/** Semantics pins for the round-4 operators (beyond the DuckDB oracles):
  * the greedy keep policy of semantic dedup, MERGE precedence rules,
  * redaction behavior, index consistency, and two-phase == single-stage
  * distinct equality.
  */
class Round4OpsSpec extends SparkSuite {

  test("dedup_semantic: dropped iff a lower-id tau-near list-mate exists") {
    val out = DedupQueries.queries("dedup_semantic")(spark, sf0001)
      .select("vec_id", "cen_id", "keep").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    // independent brute-force within-list check
    val corpus = Similarity.prepare(graft.Tables.embeddings(spark, sf0001))
    val assigned = Similarity.ivfAssign(corpus, Similarity.centroids(corpus, 16))
      .select("vec_id", "cen_id", "v", "nrm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray, r.getDouble(3)))
    def cos(a: Array[Double], b: Array[Double], na: Double, nb: Double) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s / (na * nb)
    }
    assert(out.size == assigned.length)
    for ((id, cen, v, nrm) <- assigned) {
      val expectDrop = assigned.exists { case (id2, cen2, v2, nrm2) =>
        cen2 == cen && id2 < id && cos(v, v2, nrm, nrm2) >= 0.4
      }
      assert(out(id)._1 == cen, s"vec $id assigned list mismatch")
      assert(out(id)._2 == !expectDrop, s"vec $id keep policy mismatch")
    }
    spark.catalog.clearCache()
  }

  test("pipeline_upsert: delete wins, inserts/updates/unchanged classified") {
    val out = TrainingDataQueries.queries("pipeline_upsert")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), TextFunctions.polyHash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- base.keys) {
      if (id % 17 == 5) assert(!out.contains(id), s"deleted $id survived")
      else if (id % 10 == 3) {
        assert(out(id)._1 == 1L, s"update $id not classified rev=1")
        assert(out(id)._2 != base(id), s"update $id kept the old text hash")
      } else {
        assert(out(id)._1 == 0L && out(id)._2 == base(id), s"unchanged $id altered")
      }
      if (id % 50 == 7) {
        val nid = id + 1000000000L
        assert(out.contains(nid) && out(nid)._1 == 2L, s"insert $nid missing")
      }
    }
    // rows = base - deletes + inserts (insert keys never collide or die)
    val dels = base.keys.count(_ % 17 == 5)
    val ins = base.keys.count(_ % 50 == 7)
    assert(out.size == base.size - dels + ins)
  }

  test("compactLatest keeps the seq-greatest change per key; compact-then-apply never fans out") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((1L, 1L, "x1"), (1L, 3L, "x3"), (1L, 2L, "x2"),
      (3L, 1L, "n1"), (3L, 2L, "n2")).toDF("k", "seq", "v")
    val compact = Upsert.compactLatest(changes, "k", Seq("seq"))
    assert(compact.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      == Set((1L, 3L, "x3"), (3L, 2L, "n2")))
    // the compacted batch satisfies Upsert's unique-key contract: one
    // output row per key, correct classification
    val applied = Upsert(base, compact.drop("seq"), Seq.empty[Long].toDF("k"), "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(applied == Set((1L, "x3", 1L), (2L, "b", 0L), (3L, "n2", 2L)))
    // the plan is an aggregate, not a window: hot CDC keys stay splittable
    val plan = Upsert.compactLatest(changes, "k", Seq("seq"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("Upsert classifies by key presence, not payload nullness") {
    import spark.implicits._
    // base row 1 has a NULL payload; upsert row 2 carries a NULL payload.
    // Neither null may change the rev classification or the delete.
    val base = Seq((1L, null), (2L, "b2"), (3L, "b3"), (4L, "b4"))
      .toDF("k", "v")
    val ups = Seq((2L, null), (5L, "new5")).toDF("k", "v")
    val dels = Seq(Tuple1(3L), Tuple1(5L)).toDF("k") // delete wins over insert too
    val got = Upsert(base, ups, dels, "k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, None, 0L),          // unchanged despite NULL payload
      (2L, Some("b2"), 1L),    // updated; NULL new value falls back to base
      (4L, Some("b4"), 0L)))   // 3 deleted, 5 insert-then-deleted
  }

  test("pipeline_shard: shards partition the corpus, balanced, rerun-stable") {
    val run = () => graft.SparkEntry.queries("pipeline_shard")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val shards = run()
    assert(shards.map(_._1).toSet == (0L until TrainingDataQueries.NShards).toSet)
    assert(shards.map(_._2).sum == 500L) // every doc lands in exactly one shard
    // hash-uniform balance: no shard further than 3x sigma from the mean
    val mean = 500.0 / TrainingDataQueries.NShards
    val tol = 3 * math.sqrt(mean)
    shards.foreach { case (id, n, _, _) =>
      assert(math.abs(n - mean) <= tol, s"shard $id holds $n docs (mean $mean)")
    }
    // determinism: membership, counts, and within-shard ORDER (the folded
    // hash) reproduce exactly on a rerun
    assert(run().toSeq == shards.toSeq)
    spark.catalog.clearCache()
  }

  test("text_pii: seeded docs redact to a different fingerprint, others intact") {
    val out = graft.functions.TextQueries.queries("text_pii")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val raw = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), TextFunctions.polyHash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, (nEmail, nIp, fp)) <- out) {
      if (id % 7 == 0) {
        assert(nEmail >= 1 && nIp >= 1, s"doc $id: seeded PII not found")
        assert(fp != raw(id), s"doc $id: redaction did not change the text")
      } else {
        // corpus text has no @ so no email match; IP-shaped numerics could
        // in principle appear, in which case fp may legitimately differ
        if (nEmail == 0 && nIp == 0) assert(fp == raw(id), s"doc $id altered")
      }
    }
  }

  test("text_inverted_index: stats are mutually consistent and df-ordered") {
    val rows = graft.functions.TextQueries.queries("text_inverted_index")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(rows.nonEmpty && rows.length <= 50)
    for ((tok, df, tf) <- rows) {
      assert(df >= 1 && df <= nDocs, s"$tok df out of range")
      assert(tf >= df, s"$tok has fewer occurrences than documents")
    }
    val dfs = rows.map(_._2)
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b }, "not df-descending")
  }

  test("CountMinAgg: overestimate-only, exact on collision-free input, merge law") {
    import spark.implicits._
    val w = 8; val d = 2
    val agg = new CountMinAgg(w, d)
    // overestimate-only: for ANY key set, estimate >= exact
    val keys = Seq(3L, 3L, 3L, 17L, 17L, 99L, 123456789L, 99L, 3L)
    val sketch = keys.toDF("h").agg(agg.column(col("h")).as("cms"))
    val est = keys.distinct.toDF("h").crossJoin(sketch)
      .select(col("h"), CountMinAgg.estimate(col("cms"), col("h"), w, d).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((k, n) <- exact) assert(est(k) >= n, s"under-count for $k")
    // merge law: sketch(a ++ b) == merge(sketch(a), sketch(b))
    val (a, b) = keys.splitAt(4)
    val sa = a.foldLeft(agg.zero)(agg.reduce)
    val sb = b.foldLeft(agg.zero)(agg.reduce)
    val whole = keys.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(sa, sb).toSeq == whole.toSeq)
    // exact when width is collision-free for the key set
    val big = new CountMinAgg(1024, 3)
    val s2 = keys.foldLeft(big.zero)(big.reduce)
    for ((k, n) <- exact) {
      val e = (0 until 3).map(j => s2(j * 1024 + BloomFilterAgg.position(k, j, 1024).toInt)).min
      assert(e == n, s"collision-free sketch not exact for $k")
    }
  }

  test("salted join is row-identical to the plain join, and the salt reaches the join keys") {
    import graft.Tables
    val li = Tables.lineitem(spark, sf0001)
    val ord = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val salted = SaltedJoin.join(li, ord.hint("shuffle_hash"), "l_orderkey",
      col("l_linenumber"), 4)
    val plain = li.join(ord, "l_orderkey")
    assert(salted.count() == plain.count())
    // aggregate equality (same bag of rows => same group sums)
    val agg = (df: org.apache.spark.sql.DataFrame) => df
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().map(_.toSeq.toList).toList
    assert(agg(salted.select("o_orderpriority", "l_extendedprice"))
      == agg(plain.select("o_orderpriority", "l_extendedprice")))
    // the executed join must key on (l_orderkey, graft_salt) — i.e. hot-key
    // rows really are spread across 4 sub-buckets, not re-funneled
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("graft_salt"), plan)
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  test("salted join == plain join for every fan-out on random skewed tables") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    // skewed probe: 60% of rows share key 0; build has duplicate keys too
    // (each probe row must match EVERY build row of its key, once)
    // ~10% NULL salt values: those rows must still join (bucket 0), not
    // silently vanish (pmod(NULL) never equi-joins)
    val probe = (1 to 300).map { i =>
      (if (rnd.nextInt(10) < 6) 0L else rnd.nextInt(20).toLong,
        if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(i.toLong))
    }.toDF("k", "payload")
    val build = (1 to 40).map { _ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong)
    }.toDF("k", "attr")
    val want = probe.join(build, "k").collect()
      .map(_.toSeq.toList).groupBy(identity).view.mapValues(_.length).toMap
    for (s <- Seq(1, 2, 5, 8)) {
      val got = SaltedJoin.join(probe, build, "k", col("payload"), s).collect()
        .map(_.toSeq.toList).groupBy(identity).view.mapValues(_.length).toMap
      assert(got == want, s"fan-out $s changed the join result bag")
    }
  }

  test("skew-aware salted join == plain join, and build blowup is bounded by tail + hot x s") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val probe = (1 to 400).map { i =>
      (if (rnd.nextInt(10) < 5) 0L else rnd.nextInt(25).toLong,
        if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(i.toLong))
    }.toDF("k", "payload")
    val build = (1 to 60).map { _ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong)
    }.toDF("k", "attr")
    val want = probe.join(build, "k").collect()
      .map(_.toSeq.toList).groupBy(identity).view.mapValues(_.length).toMap
    for (s <- Seq(1, 4, 7); thr <- Seq(1L, 10L, 1000L)) {
      val got = SaltedJoin.joinSkewAware(probe, build, "k", col("payload"), s, thr)
        .collect().map(_.toSeq.toList).groupBy(identity).view.mapValues(_.length).toMap
      assert(got == want, s"(s=$s, thr=$thr) changed the join result bag")
      // replication bound: ONLY hot-key build rows fan out
      val hotKeys = SaltedJoin.skewStats(probe, "k", thr)
        .select("k").as[Long].collect().toSet
      val buildKeys = build.select("k").as[Long].collect()
      val expected = buildKeys.count(hotKeys) * s + buildKeys.count(!hotKeys(_))
      val actual = SaltedJoin.replicateHot(
        build, SaltedJoin.skewStats(probe, "k", thr), "k", s).count()
      assert(actual == expected,
        s"(s=$s, thr=$thr) replicated $actual rows, bound is $expected")
    }
    // threshold above every key's count must degrade to the UNsalted build
    val untouched = SaltedJoin.replicateHot(
      build, SaltedJoin.skewStats(probe, "k", 1000L), "k", 7).count()
    assert(untouched == build.count())
    // sampled skew stats: the hot set may differ, the RESULT may not
    for (fraction <- Seq(0.1, 0.5, 1.0)) {
      val got = SaltedJoin.joinSkewAwareSampled(
          probe, build, "k", col("payload"), 5, 10L, fraction)
        .collect().map(_.toSeq.toList).groupBy(identity).view.mapValues(_.length).toMap
      assert(got == want, s"sampled stats (fraction=$fraction) changed the join result bag")
    }
  }

  test("histogram quantile estimator lands within one bin of the true quantile") {
    // the integral driver query degenerates to exact; pin the general
    // contract on random CONTINUOUS data: the estimated edge is within one
    // bin width above the true quantile (the estimator returns the upper
    // edge of the first bin whose cumulative mass reaches q)
    val rnd = new scala.util.Random(99)
    val bins = 50; val lo = 0.0; val hi = 100.0
    val width = (hi - lo) / bins
    for (trial <- 1 to 50) {
      val xs = Array.fill(200 + rnd.nextInt(800))(lo + rnd.nextDouble() * (hi - lo))
      val counts = new Array[Long](bins)
      xs.foreach { x =>
        counts(math.min(bins - 1, math.max(0, ((x - lo) / width).toInt)) ) += 1
      }
      for (q <- Seq(0.5, 0.95)) {
        val need = math.ceil(q * xs.length).toLong
        var cum = 0L; var bin = -1
        var i = 0
        while (i < bins && bin < 0) { cum += counts(i); if (cum >= need) bin = i; i += 1 }
        val est = lo + (bin + 1) * width // upper edge, mirrors the query's bin+1
        val sorted = xs.sorted
        val truth = sorted((need - 1).toInt)
        assert(truth <= est && est - truth <= 2 * width,
          s"trial $trial q=$q: est $est vs truth $truth")
      }
    }
  }

  test("text_lm_score mean equals the independent explode-join derivation") {
    val got = graft.functions.TextQueries.queries("text_lm_score")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    spark.catalog.clearCache()
    // independent derivation: explode tokens, join corpus probabilities,
    // average per doc (order-free mean — compare with tolerance, since the
    // query's sequential fold is a different summation order)
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(length(trim(col("text"))) > 0)
    val toks = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("double").as("t")).collect()(0).getDouble(0)
    val want = toks.join(counts, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("cnt").cast("double") / lit(total)).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2) / r.getLong(1))).toMap
    assert(want.nonEmpty)
    for ((id, (n, mean)) <- want) {
      assert(got(id)._1 == n, s"doc $id token count")
      assert(math.abs(got(id)._2 - mean) < 1e-9, s"doc $id mean_p")
    }
  }

  test("q_distinct_twophase equals the single-stage distinct formulation") {
    val two = RelationalQueries.queries("q_distinct_twophase")(spark, sf0001).collect()
    val one = graft.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("l_returnflag").collect()
    assert(two.map(_.toSeq.toList).toList == one.map(_.toSeq.toList).toList)
  }
}
