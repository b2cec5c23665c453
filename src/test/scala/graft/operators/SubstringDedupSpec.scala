package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}
import graft.functions.TextFunctions

/** Corpus-internal substring dedup (`dedup_substring_spans` /
  * `dedup_substring_excise`) invariants: the keep-first ownership rule
  * (an owner never loses its own span), forensics/excision agreement,
  * interval-union coverage bounds, and a closed-form planted-span check.
  */
class SubstringDedupSpec extends SparkSuite {

  private val n = TrainingDataQueries.SubstrNgram

  private lazy val spans =
    SparkEntry.queries("dedup_substring_spans")(spark, sf0001).persist()
  private lazy val excise =
    SparkEntry.queries("dedup_substring_excise")(spark, sf0001).persist()

  test("flagged docs are exactly the non-owner repeaters") {
    val docs = Tables.documents(spark, sf0001)
    val shh = TextFunctions.shingleHashes(col("text"), n)
    val pairs = docs.select(col("doc_id"), explode(shh).as("sh"))
    // independent formulation of "repeats someone else's span": the doc
    // shares a shingle with a STRICTLY SMALLER doc_id
    val expected = pairs.as("a")
      .join(pairs.as("b"), col("a.sh") === col("b.sh") &&
        col("b.doc_id") < col("a.doc_id"), "left_semi")
      .select(col("doc_id")).distinct()
    assert(spans.count() > 0, "fixture must carry repeated spans")
    assert(spans.select("doc_id").exceptAll(expected).count() == 0)
    assert(expected.exceptAll(spans.select("doc_id")).count() == 0)
  }

  test("the global first-occurrence doc is never excised") {
    // the smallest doc_id carrying any repeated shingle owns at least its
    // first span, but a global owner may still repeat ANOTHER doc's span;
    // the airtight ownership invariant: the minimum doc_id across the
    // whole corpus can never be flagged (nothing is smaller than it)
    val minDoc = Tables.documents(spark, sf0001)
      .agg(min(col("doc_id"))).head.getLong(0)
    assert(spans.filter(col("doc_id") === minDoc).count() == 0)
    assert(excise.filter(col("doc_id") === minDoc).count() == 0)
  }

  test("excision agrees with the span report and respects union bounds") {
    val joined = excise.join(spans, "doc_id").persist()
    assert(joined.count() == spans.count() && joined.count() == excise.count())
    // first hit covers n tokens, each later hit adds between 1 and n
    assert(joined.filter(col("n_removed") > col("n_hits") * n ||
      col("n_removed") < col("n_hits") + (n - 1)).count() == 0)
    assert(joined.filter(col("n_after") < 0 ||
      col("n_before") - col("n_removed") =!= col("n_after")).count() == 0)
    joined.unpersist()
  }

  test("wide (64-bit) shingle arm: hit-set containment with a bounded mod-P excess") {
    // a TRUE repeated span hashes equal in both spaces, and a mod-P
    // collision can only ENLARGE the colliding set (the min-owner only
    // gets smaller), so the wide hit set is contained in the mod-P one
    // with strict inequality exactly at mod-P's false hits. At the
    // fixture's ~60k windows the birthday prediction n²/2P is ~2 rows —
    // and indeed ONE false mod-P hit already exists at sf0.001 (found by
    // this spec's first run: the excess is real data, not theory).
    // DedupStressSpec pins the scale contrast at 3.65M windows.
    val docs = Tables.documents(spark, sf0001)
    val modP = TrainingDataQueries.repeatedSpanHits(docs)
    val wide = TrainingDataQueries.repeatedSpanHits(docs, wide = true)
    assert(wide.exceptAll(modP).count() == 0,
      "wide-only substring hits: the 64-bit arm changed the semantics")
    val excess = modP.exceptAll(wide).count()
    info(s"mod-P-only substring hits at sf0.001: $excess (predicted ~2)")
    assert(excess <= 8, s"mod-P excess $excess is beyond the birthday budget")
    // same containment for the decontamination hit definition
    val cModP = TrainingDataQueries.contaminationHits(spark, sf0001)
    val cWide = TrainingDataQueries.contaminationHits(spark, sf0001, wide = true)
    assert(cWide.exceptAll(cModP).count() == 0,
      "wide-only contamination hits: the 64-bit arm changed the semantics")
    val cExcess = cModP.exceptAll(cWide).count()
    info(s"mod-P-only contamination hits at sf0.001: $cExcess")
    assert(cExcess <= 8, s"contamination mod-P excess $cExcess beyond budget")
    // the incremental arm: hit containment lifts to COVERAGE containment
    // (interval union is monotone in the hit set), so every wide-flagged
    // doc must appear in the mod-P output with at least as many tokens
    // removed
    val iModP = TrainingDataQueries.incrementalSubstringCoverage(docs)
    val iWide = TrainingDataQueries.incrementalSubstringCoverage(docs, wide = true)
    val j = iWide.select(col("doc_id"), col("n_removed").as("w"))
      .join(iModP.select(col("doc_id"), col("n_removed").as("m")),
        Seq("doc_id"), "left")
    assert(j.filter(col("m").isNull || col("w") > col("m")).count() == 0,
      "wide incremental coverage escaped the mod-P envelope")
    assert(iWide.count() > 0, "wide incremental arm found nothing — vacuous")
    graft.CheckpointUtil.releaseStragglers()
  }

  test("ownership degrade arm is row-identical and actually swaps the join") {
    val docs = Tables.documents(spark, sf0001)
    // budget 0 → the probe can never fit → the shuffle-hash arm (NOT a
    // forced broadcast that would OOM the driver at the scale that
    // triggers it)
    assertArmsIdentical(TrainingDataQueries.repeatedSpanHits(docs),
      TrainingDataQueries.repeatedSpanHits(docs, maxOwnersBroadcast = 0L))
    graft.CheckpointUtil.releaseStragglers()
  }

  test("planted contiguous duplicate span is excised in closed form") {
    import spark.implicits._
    // doc 1 owns tokens; doc 2 repeats a contiguous 12-token run of doc 1
    // inside otherwise-unique text. With n = 8, the run contributes
    // 12 - 8 + 1 = 5 hits whose interval union covers exactly 12 tokens.
    val run = (1 to 12).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, "srcA", s"alpha beta gamma $run delta epsilon"),
      (2L, "srcB", s"zeta eta theta iota kappa $run lambda mu nu xi")
    ).toDF("doc_id", "source", "text")
    val th = TextFunctions.tokenHashes(col("text"))
    val posSh = transform(sequence(lit(1), size(th) - (n - 1)),
      i => struct(i.cast("long").as("pos"),
        aggregate(slice(th, i, lit(n)), lit(0L),
          (a, h) => pmod(a * 31 + h, lit(TextFunctions.HashMod))).as("sh")))
    val ps = docs.select(col("doc_id"), explode(posSh).as("u"))
      .select(col("doc_id"), col("u.pos").as("pos"), col("u.sh").as("sh"))
    val owners = ps.groupBy("sh")
      .agg(min("doc_id").as("own"), max("doc_id").as("mx"))
      .filter(col("own") =!= col("mx"))
    val hits = ps.join(owners, "sh").filter(col("doc_id") =!= col("own"))
    val byDoc = hits.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(2L -> 5L), s"expected 5 hits on doc 2, got $byDoc")
    // interval union: 8 for the first + 1 for each of the 4 successors
    val positions = hits.select("pos").as[Long].collect().sorted
    val covered = positions.zip(-1L +: positions.dropRight(1))
      .map { case (p, prev) => if (prev < 0) n.toLong else math.min(n.toLong, p - prev) }
      .sum
    assert(covered == 12L, s"union must cover the 12-token run, got $covered")
  }
}
