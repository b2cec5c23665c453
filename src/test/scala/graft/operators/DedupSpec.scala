package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}
import graft.functions.TextFunctions

class DedupSpec extends SparkSuite {

  test("incremental candidates ∪ corpus-only candidates == full self-join") {
    import org.apache.spark.sql.functions._
    import graft.{functions => gf}
    val d = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), gf.TextFunctions.shingleHashes(col("text"), 3).as("shh"))
      .withColumn("bands", Dedup.bandHashes(Dedup.minhashSignature(col("shh"))))
      .select("doc_id", "bands").persist()
    val isNew = col("doc_id") % 5 === 4
    val full = Dedup.lshCandidatePairs(d, "doc_id", "bands")
    val split = Dedup.incrementalCandidatePairs(
        d.filter(isNew), d.filter(!isNew), "doc_id", "bands")
      .unionAll(Dedup.lshCandidatePairs(d.filter(!isNew), "doc_id", "bands"))
      .distinct()
    assert(full.count() > 0)
    assert(full.exceptAll(split).isEmpty && split.exceptAll(full).isEmpty)
  }

  test("SRP signature is scale-invariant and separates opposite vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Array.tabulate(Dedup.SrpDim)(i => math.sin(i * 1.7) + 0.1)
    val rows = Seq(
      (1L, base.toSeq),
      (2L, base.map(_ * 3.5).toSeq),  // same direction, different scale
      (3L, base.map(-_).toSeq))       // opposite direction
    val sigs = rows.toDF("id", "v")
      .withColumn("sig", Dedup.srpSignature(col("v")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sigs(1L) == sigs(2L)) // cosine LSH: direction only
    // the opposite vector flips every decided bit
    assert(sigs(3L) == (~sigs(1L) & ((1L << Dedup.SrpPlanes) - 1)))
  }

  test("exactDedup collapses true duplicates to the min id") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val got = Dedup.exactDedup(df, "doc_id", "text")
      .orderBy("canonical_id")
      .select("canonical_id", "n_copies").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash signature of identical shingle sets is identical; jaccard=1") {
    import spark.implicits._
    val df = Seq((1L, "p q r s t"), (2L, "p q r s t")).toDF("doc_id", "text")
      .withColumn("shh", TextFunctions.shingleHashes(col("text"), 3))
      .withColumn("sig", Dedup.minhashSignature(col("shh")))
    val sigs = df.select("sig").as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1) && sigs(0).length == Dedup.MinHashK)
    val j = df.agg(Dedup.jaccard(first(col("shh")), last(col("shh")))).head.getDouble(0)
    assert(j == 1.0)
  }

  test("LSH banding finds exactly the planted >=0.5-jaccard pairs at sf0.001") {
    // ground truth by brute force on the small sf
    val d = Tables.documents(spark, sf0001)
      .select(col("doc_id"), TextFunctions.shingleHashes(col("text"), 3).as("shh"))
    val brute = d.as("a").crossJoin(d.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", Dedup.jaccard(col("a.shh"), col("b.shh")))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id")).collect().toSet
    val banded = DedupQueries.queries("dedup_minhash_pairs")(spark, sf0001)
      .select(col("id_a"), col("id_b")).collect().toSet
    assert(banded == brute)
    assert(brute.nonEmpty)
  }

  test("simhash hamming is 0 for identical docs and large for disjoint docs") {
    import spark.implicits._
    val df = Seq((1L, "p q r s t u"), (2L, "p q r s t u"), (3L, "j k l m n o"))
      .toDF("doc_id", "text")
      .withColumn("sh", Dedup.simhash(TextFunctions.shingleHashes(col("text"), 3)))
    val a = df.as("a"); val b = df.as("b")
    val hd = a.crossJoin(b).filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        Dedup.hamming(col("a.sh"), col("b.sh")).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(hd((1L, 2L)) == 0)
    assert(hd((1L, 3L)) > 3)
  }

  test("MinHashSketchAgg: group sketch == elementwise min of per-doc signatures") {
    import spark.implicits._
    val d = Tables.documents(spark, sf0001)
      .select(col("source"), TextFunctions.shingleHashes(col("text"), 3).as("shh"))
    val agged = d.groupBy("source").agg(MinHashSketchAgg.column(col("shh")).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    val perDoc = d.withColumn("sig", Dedup.minhashSignature(col("shh")))
      .select("source", "sig").as[(String, Seq[Long])].collect()
      .groupBy(_._1).view
      .mapValues(_.map(_._2).reduce((a, b) => a.zip(b).map(t => math.min(t._1, t._2))))
      .toMap
    assert(agged == perDoc)
    assert(agged.nonEmpty)
  }

  test("connectedComponents: chains collapse to min id, isolated pairs keep theirs") {
    import spark.implicits._
    // chain 5-4-3-2-1 (needs multiple propagation rounds) + separate pair (10,11)
    val pairs = Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: 64-node chain converges in O(log diameter) rounds") {
    import spark.implicits._
    // worst case for plain propagation: a single chain 1-2-...-64 (diameter
    // 63 → 63 propagation rounds). Pointer doubling must do it in ≤ 8.
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.connectedComponentsWithStats(pairs)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == (1L to 64L).map(_ -> 1L).toMap)
    assert(rounds <= 8, s"took $rounds rounds — pointer doubling not engaging")
  }

  test("connectedComponents throws loudly instead of returning unconverged labels") {
    import spark.implicits._
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponentsWithStats(pairs, maxIters = 2)
    }
  }

  test("simhash 4-band split guarantees candidacy at hamming <= 3 (pigeonhole)") {
    import spark.implicits._
    // every possible 3-bit flip of a 30-bit simhash must share >=1 band
    val base = 0x2AAAAAAAL & ((1L << 30) - 1) // alternating bits
    val flips = for {
      i <- 0 until 30; j <- i until 30; k <- j until 30
    } yield base ^ (1L << i) ^ (1L << j) ^ (1L << k)
    val df = flips.distinct.toDF("flipped").withColumn("base", lit(base))
      .withColumn("ba", Dedup.simhashBands(col("base")))
      .withColumn("bb", Dedup.simhashBands(col("flipped")))
    val missed = df.filter(size(arrays_zip(col("ba"), col("bb"))
      .cast("array<struct<x:bigint,y:bigint>>")) =!= 4 ||
      !exists(zip_with(col("ba"), col("bb"), (x, y) => x === y), b => b)).count()
    assert(missed == 0)
  }

  test("containment flags a strict subset at 1.0 where jaccard stays low") {
    import spark.implicits._
    // A = {1..4} fully inside B = {1..20}: the quote-in-a-long-doc shape
    val df = Seq((Seq(1L, 2L, 3L, 4L), (1L to 20L).toSeq, Seq.empty[Long]))
      .toDF("a", "b", "e")
    val r = df.select(
      Dedup.containment(col("a"), col("b")),
      Dedup.jaccard(col("a"), col("b")),
      Dedup.containment(col("a"), col("e"))).head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.2) // 4/20 — symmetric near-dup would miss it
    assert(r.getDouble(2) == 0.0) // empty side: vacuous, never a signal
  }

  test("paragraph dedup: fixture has cross-doc duplicate windows; canonical survives, later copies drop") {
    val rows = graft.SparkEntry.queries("dedup_paragraph")(spark, sf0001).collect()
    assert(rows.length == 500)
    // the gate proves exactness vs the twin; pin non-vacuity here — the
    // fixture corpus really contains repeated 20-token windows
    val totalDup = rows.map(_.getLong(2)).sum
    assert(totalDup > 0, "no duplicate paragraphs in fixture — operator untested")
    // a doc can never drop ALL paragraphs AND still hash nonzero
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2)) // n_paras >= n_dup
      if (r.getLong(1) == r.getLong(2)) assert(r.getLong(3) == 0L)
    }
    spark.catalog.clearCache()
  }

  test("canonical selection keeps each cluster's max-quality member, not its min id") {
    val reps = graft.SparkEntry.queries("dedup_canonical")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(reps.nonEmpty)
    val members = graft.SparkEntry.queries("dedup_clusters")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = members.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val quality = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.TextFunctions.qualityScore(col("text")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(reps.map(_._1).toSet == byCluster.keySet)
    reps.foreach { case (cluster, n, repId, repQ) =>
      val ids = byCluster(cluster)
      assert(n == ids.size)
      assert(ids.contains(repId))
      assert(repQ == ids.map(quality).max)
      // the rep rule is argmax-quality — prove it DIFFERS from min-id
      // somewhere in the fixture (otherwise the operator is vacuous)
    }
    assert(reps.exists { case (cluster, _, repId, _) => repId != cluster },
      "every representative equals the min-id canonical — quality argmax untested")
    spark.catalog.clearCache()
  }

  test("hashEmbed: signed-count buckets, hand-checked; text semantic dedup is non-vacuous") {
    import spark.implicits._
    import graft.functions.NativeExpressions
    // token "a" -> polyHash 97 -> bucket 33, sign + (97/64 = 1, odd);
    // token "b" -> 98 -> bucket 34, sign +; doubled "a" accumulates
    val v = Seq("a a b").toDF("text")
      .select(NativeExpressions.hashEmbed(col("text"), 64).as("v"))
      .head().getSeq[Double](0)
    assert(v.length == 64)
    assert(v(33) == 2.0 && v(34) == 1.0)
    assert(v.map(math.abs).sum == 3.0)

    val rows = graft.SparkEntry.queries("dedup_semantic_text")(spark, sf0001).collect()
    assert(rows.length == 500)
    val dropped = rows.count(!_.getBoolean(2))
    assert(dropped > 0 && dropped < rows.length,
      s"degenerate dedup: $dropped/${rows.length} dropped")
    spark.catalog.clearCache()
  }

  test("soft-weight and corpus-prep adaptive joins are row-identical across arms") {
    // budget 0 -> the probe can never fit -> the shuffle-hash arm; the
    // default budget broadcasts at fixture scale. Same assertion pair as
    // the boilerplate/ownership arms (ParagraphHygieneSpec,
    // SubstringDedupSpec): outputs identical, physical join actually swaps.
    assertArmsIdentical(DedupQueries.softWeightFrame(spark, sf0001),
      DedupQueries.softWeightFrame(spark, sf0001, maxRows = 0L))
    assertArmsIdentical(DedupQueries.corpusPrepFrame(spark, sf0001),
      DedupQueries.corpusPrepFrame(spark, sf0001, maxRows = 0L))
    graft.CheckpointUtil.releaseStragglers()
  }

  test("leakproof split is cluster-closed, non-vacuous vs the naive split, and degrade-safe") {
    val r = DedupQueries.leakproofSplit(spark, sf0001).persist()
    // the invariant the operator exists for: no near-dup cluster
    // straddles two splits
    assert(r.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count() == 0,
      "a near-dup cluster straddles train/eval")
    // every doc appears exactly once, and all three splits are populated
    assert(r.count() == Tables.documents(spark, sf0001).count())
    assert(r.select("split").distinct().count() == 3)
    // non-vacuous: some clustered doc actually moved relative to the
    // doc-hash split (otherwise the fixture can't witness the fix)
    val naive = pmod(graft.functions.TextFunctions.polyHash(
      col("doc_id").cast(org.apache.spark.sql.types.StringType)), lit(100))
    val naiveSplit = when(naive < 90, "train").when(naive < 95, "valid")
      .otherwise("test")
    assert(r.filter(col("split") =!= naiveSplit).count() > 0,
      "vacuous: cluster-keyed split equals the doc-keyed split everywhere")
    r.unpersist()
    // adaptive degrade arm: row-identical, join actually swaps
    assertArmsIdentical(DedupQueries.leakproofSplit(spark, sf0001),
      DedupQueries.leakproofSplit(spark, sf0001, maxRows = 0L))
    graft.CheckpointUtil.releaseStragglers()
  }

  test("editdist blocking is recall-complete vs brute force and finds planted edits") {
    import org.apache.spark.sql.types.LongType
    val fix = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getLong(2))
    val docs = Tables.documents(spark, sf0001)
    val blocked = DedupQueries.editDistPairs(docs).collect().map(fix).toSet
    // brute force over the same contract (nested-loop is fine at 500):
    // longer member >= EdMinLen, in-band partner down to EdMinLen - EdK
    val d = docs
      .filter(length(col("text")) >= DedupQueries.EdMinLen - DedupQueries.EdK)
      .select(col("doc_id"), col("text"), length(col("text")).as("l"))
    val brute = d.as("a").join(d.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.l") - col("b.l")) <= DedupQueries.EdK &&
          greatest(col("a.l"), col("b.l")) >= DedupQueries.EdMinLen)
      .withColumn("dist",
        levenshtein(col("a.text"), col("b.text"), DedupQueries.EdK).cast(LongType))
      .filter(col("dist") >= 0)
      .select(col("a.doc_id"), col("b.doc_id"), col("dist"))
      .collect().map(fix).toSet
    assert(blocked.nonEmpty, "vacuous fixture: no edit-distance pairs at all")
    assert(blocked == brute,
      s"blocked != brute: missing ${(brute -- blocked).take(5)}, extra ${(blocked -- brute).take(5)}")

    // planted: k substitutions scattered across one long doc (positions
    // chosen to damage several anchor blocks but by pigeonhole not all)
    val donor = docs.filter(col("doc_id") === 0).select(col("text")).head.getString(0)
    assert(donor.length >= DedupQueries.EdMinLen)
    val mutated = donor.toCharArray
    for (p <- Seq(1, 9, 17, 33)) mutated(p) = if (mutated(p) == 'q') 'z' else 'q'
    import spark.implicits._
    val planted = Seq((100000L, donor), (100001L, new String(mutated)))
      .toDF("doc_id", "text")
    val found = DedupQueries.editDistPairs(planted).collect().map(fix)
    assert(found.exists(t => t._1 == 100000L && t._2 == 100001L && t._3 <= 4),
      s"planted 4-substitution pair not found: ${found.mkString(",")}")

    // the band EDGE: a 40-char doc vs a 2-deletion 38-char copy — the
    // shorter member is under EdMinLen, but the longer one indexes, so
    // the pair is guaranteed (this was a silent recall hole before the
    // longer-member contract: both-sides filtering dropped the 38-char
    // doc entirely)
    val edgeDonor = donor.substring(0, DedupQueries.EdMinLen)
    val edgeShort = edgeDonor.substring(0, 11) + edgeDonor.substring(13)
    val edge = Seq((200000L, edgeDonor), (200001L, edgeShort))
      .toDF("doc_id", "text")
    val edgeFound = DedupQueries.editDistPairs(edge).collect().map(fix)
    assert(edgeFound.exists(t => t._1 == 200000L && t._2 == 200001L && t._3 == 2L),
      s"band-edge (40,38) pair not found: ${edgeFound.mkString(",")}")

    // Unicode: the engine side is code-point consistent end to end —
    // blocking (substr/length) and verification (levenshtein) must agree
    // on the character grain for BMP and ASTRAL text, or a guaranteed
    // pair near the length band silently drops. One doc of repeated
    // 2-char CJK+accent tokens and one astral-bearing doc, each with an
    // in-band partner at small code-point distance. (The DuckDB oracle is
    // byte-based for levenshtein, so this property is only checkable
    // in-engine — see the query comment's Unicode contract.)
    val uniDonor = ("é水x " * 13).trim // 51 code points, >= EdMinLen
    val uniMut = uniDonor.toCharArray
    uniMut(0) = 'q'; uniMut(21) = 'q' // 2 substitutions
    val astralDonor = "𝄞🚀 ab " * 8 + "tail" // astral chars throughout
    // java substring is UTF-16-unit indexed: units 2..5 are "🚀 a" —
    // 4 code UNITS, 6 UTF-8 BYTES, but 3 CODE POINTS (🚀 is one
    // surrogate pair). The expected distance is the code-point count,
    // pinning that blocking and levenshtein agree on that grain.
    val astralShort = astralDonor.substring(0, 2) + astralDonor.substring(6)
    val uni = Seq(
      (500000L, uniDonor), (500001L, new String(uniMut)),
      (600000L, astralDonor), (600001L, astralShort)).toDF("doc_id", "text")
    val uniFound = DedupQueries.editDistPairs(uni).collect().map(fix).toSet
    assert(uniFound.contains((500000L, 500001L, 2L)),
      s"BMP pair at code-point distance 2 not found: $uniFound")
    assert(uniFound.contains((600000L, 600001L, 3L)),
      s"astral pair at code-point distance 3 not found: $uniFound")

    // clusters: every verified pair must land in one component, and the
    // canonical must be the component's least member
    val canon = graft.SparkEntry.queries("dedup_editdist_clusters")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon.nonEmpty)
    blocked.foreach { case (a, b, _) =>
      assert(canon(a) == canon(b), s"pair ($a,$b) straddles clusters")
    }
    canon.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"canonical $c is not the least member")
    }
    graft.CheckpointUtil.releaseStragglers()
  }

  test("editdist incremental equals the full rebuild restricted to batch pairs") {
    val fix = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getLong(2))
    val docs = Tables.documents(spark, sf0001)
    val isNew = col("doc_id") % 5 === 4
    val full = DedupQueries.editDistPairs(docs).collect().map(fix).toSet
    val fullBatch = full.filter { case (a, b, _) => a % 5 == 4 || b % 5 == 4 }
    val incr = DedupQueries.editDistPairsIncremental(docs, isNew)
      .collect().map(fix).toSet
    assert(fullBatch.nonEmpty, "vacuous fixture: no batch-touching pairs")
    assert(incr == fullBatch,
      s"incremental != full|batch: missing ${(fullBatch -- incr).take(5)}, " +
        s"extra ${(incr -- fullBatch).take(5)}")

    // planted arms: the coverage argument has two sides — each must find
    // its pair, and a corpus-only pair must be EXCLUDED even when in range.
    // ids chosen so % 5 == 4 marks exactly the "new" docs.
    val donor = docs.filter(col("doc_id") === 0).select(col("text"))
      .head.getString(0).substring(0, DedupQueries.EdMinLen + 10)
    def drop2(s: String) = s.substring(0, 5) + s.substring(7)
    import spark.implicits._
    val planted = Seq(
      1000004L -> donor,          // NEW, longer member vs 1000010 (idx(new) x prb(old))
      1000010L -> drop2(donor),   // corpus, shorter
      2000000L -> donor,          // corpus, longer member vs NEW 2000004 (idx(all) x prb(new))
      2000004L -> drop2(donor),   // NEW, shorter
      3000000L -> donor,          // corpus x corpus: must NOT be emitted
      3000010L -> drop2(donor),
      4000004L -> donor,          // NEW x NEW
      4000009L -> drop2(donor)
    ).toDF("doc_id", "text")
    val got = DedupQueries.editDistPairsIncremental(planted, isNew)
      .collect().map(fix).toSet
    assert(got.contains((1000004L, 1000010L, 2L)), s"new-longer arm missed: $got")
    assert(got.contains((2000000L, 2000004L, 2L)), s"new-shorter arm missed: $got")
    assert(got.contains((4000004L, 4000009L, 2L)), s"new-new pair missed: $got")
    assert(!got.exists { case (a, b, _) => a % 5 != 4 && b % 5 != 4 },
      s"corpus-only pair leaked into the incremental surface: $got")
    graft.CheckpointUtil.releaseStragglers()
  }

  test("cosine is 1 for parallel vectors, 0 for orthogonal") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(2.0f, 0.0f), Seq(0.0f, 3.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Dedup.cosine(Dedup.toDoubleArray(col("a")), Dedup.toDoubleArray(col("b")),
        Dedup.l2norm(Dedup.toDoubleArray(col("a"))), Dedup.l2norm(Dedup.toDoubleArray(col("b")))),
      Dedup.cosine(Dedup.toDoubleArray(col("a")), Dedup.toDoubleArray(col("c")),
        Dedup.l2norm(Dedup.toDoubleArray(col("a"))), Dedup.l2norm(Dedup.toDoubleArray(col("c")))))
      .head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }
}
