package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Dedup at 100× the driver fixture — the mirror of [[AnnStressSpec]] for
  * the dedup family: a SEEDED in-repo generator builds a 50k-document
  * corpus with PLANTED duplicate structure (the 500-row fixture exercises
  * correctness, not behavior at scale), and this suite pins, with runtime
  * evidence rather than plan text:
  *
  *   1. MinHash banding finds every planted near-dup pair AND stays
  *      near-planted in candidate volume — banding must prune the 1.25
  *      BILLION possible pairs to the colliding few, or 100 TB dedup is
  *      quadratic and dead on arrival;
  *   2. paragraph dedup recovers the planted per-class duplicate counts
  *      exactly (clone/near/paragraph-graft classes each have a closed-form
  *      n_dup) over 200k paragraphs;
  *   3. pointer-doubling connected components recovers exactly the planted
  *      clusters in O(log diameter) rounds — the converged round count is
  *      asserted, not assumed.
  *
  * Corpus shape: ids 0..49999, 80 tokens each from a 10k-word vocabulary,
  * splitmix-seeded (no Random, no partition sensitivity — every count
  * below is exact-repeatable). Planted structure per thousand-block:
  * id%1000==0 is a LEADER; ==1,2 are exact clones of the leader; ==3 is a
  * near-dup (last 5 of 80 tokens rewritten → shingle Jaccard ≈ 0.84);
  * ==4 grafts the leader's first paragraph (20 tokens) onto unique text;
  * everything else is unique. 50 blocks → 50 planted clusters.
  */
class DedupStressSpec extends SparkSuite {
  import DedupStressSpec.{N, docOf}

  private lazy val corpus: DataFrame = {
    val s = spark
    import s.implicits._
    s.range(0, N, 1, 8).map(id => (id, docOf(id))).toDF("doc_id", "text")
      .persist()
  }

  private val leaders = (0 until 50).map(_ * 1000L)

  test("LSH banding finds all planted near-dups and prunes to near-planted volume at 50k docs") {
    val d = corpus
      .select(col("doc_id"),
        graft.functions.TextFunctions.shingleHashes(col("text"), 3).as("shh"))
      .withColumn("bands", Dedup.bandHashes(Dedup.minhashSignature(col("shh"))))
      .persist()
    val cands = Dedup.lshCandidatePairs(
      d.select("doc_id", "bands"), "doc_id", "bands").persist()
    val nCands = cands.count()
    // every planted >=0.5-Jaccard pair must be a candidate: per block the
    // clones pair with the leader and each other (3 pairs) and the
    // near-dup pairs with all three exact twins (3 pairs)
    val verified = cands
      .join(d.select(col("doc_id").as("id_a"), col("shh").as("shh_a")), "id_a")
      .join(d.select(col("doc_id").as("id_b"), col("shh").as("shh_b")), "id_b")
      .withColumn("j", Dedup.jaccard(col("shh_a"), col("shh_b")))
      .filter(col("j") >= 0.5)
      .select("id_a", "id_b").persist()
    val nVerified = verified.count()
    val planted = leaders.flatMap { l =>
      val grp = Seq(l, l + 1, l + 2, l + 3)
      for (a <- grp; b <- grp if a < b) yield (a, b)
    }.toSet
    val got = verified.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(got),
      s"missing planted pairs: ${(planted -- got).take(5)} of ${planted.size}")
    info(s"candidates=$nCands verified=$nVerified planted=${planted.size}")
    // banding pruned 1.25e9 possible pairs to the colliding few: allow
    // random band collisions but nothing remotely quadratic, and the
    // verified set must not drown the planted structure in noise
    assert(nCands < 10L * planted.size,
      s"$nCands candidates — banding is not pruning")
    assert(nVerified < 2L * planted.size,
      s"$nVerified verified pairs — false structure beyond the planted clusters")
    // targeted release: clearCache() would also evict the suite-shared
    // corpus cache, forcing later tests to regenerate 50k docs per action
    Seq(d, cands, verified).foreach(_.unpersist(blocking = false))
    graft.CheckpointUtil.releaseStragglers()
  }

  test("paragraph dedup recovers the planted per-class duplicate counts over 200k paragraphs") {
    // 80 tokens / ParaWindow=20 → 4 paragraphs per doc, 200k total.
    // Closed-form expectation per thousand-block: leader n_dup=0 (lowest
    // id owns every canonical), clones n_dup=4 (all four paragraphs are
    // re-occurrences), near-dup n_dup=3 (last paragraph rewritten),
    // paragraph-graft n_dup=1 (first paragraph only) — and the ~49.8k
    // unique docs collide on no 20-token window.
    val pagg = CurationPipeline.paragraphAgg(corpus).persist()
    val dupDocs = pagg.filter(col("n_dup") > 0)
      .select(col("doc_id"), col("n_dup")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = leaders.flatMap { l =>
      Seq(l + 1 -> 4L, l + 2 -> 4L, l + 3 -> 3L, l + 4 -> 1L)
    }.toMap
    // every planted doc must carry its exact closed-form count...
    val planted = dupDocs.view.filterKeys(expected.contains).toMap
    assert(planted == expected,
      s"per-class n_dup drifted: ${(expected.toSet -- planted.toSet).take(5)}")
    // ...and the only extras allowed are BIRTHDAY collisions of the
    // paragraph hash itself: windowHashes lives in the mod-1e9+7 space
    // (cross-engine oracle parity), so 200k paragraphs expect ~n²/2P ≈ 20
    // false dup-pairs — each adds exactly one n_dup=1 doc (observed: 20,
    // matching the birthday estimate exactly). THE SCALE
    // LESSON this suite exists to surface: at 10¹⁰ paragraphs a 31-bit
    // paragraph hash is structurally blind (≈ every paragraph collides);
    // production-at-100TB widens the space (polyHash64 / double-hash
    // combine), trading oracle replay for headroom.
    val extras = dupDocs -- expected.keys
    info(s"birthday-collision extras at 1e9+7 hash space: ${extras.size}")
    assert(extras.size <= 40 && extras.values.forall(_ == 1L),
      s"extras beyond the birthday budget: ${extras.take(8)}")
    // and every doc kept its full paragraph count
    assert(pagg.filter(col("n_paras") =!= 4).count() == 0L)
    // THE CONTRAST: the wide (64-bit) production hash over the SAME 200k
    // paragraphs — birthday bound n²/2⁶⁵ ≈ 0, so the planted structure is
    // recovered with ZERO extras where mod-P produced its predicted 20
    val wide = CurationPipeline.paragraphAgg(corpus, wide = true)
      .filter(col("n_dup") > 0)
      .select(col("doc_id"), col("n_dup")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(wide == expected,
      s"64-bit paragraph hash not collision-free at 200k: " +
        s"extras=${(wide -- expected.keys).take(5)}")
    pagg.unpersist(blocking = false)
    graft.CheckpointUtil.releaseStragglers()
  }

  test("STANDALONE dedup_paragraph wide arm: containment in mod-P and zero extras at 200k paragraphs") {
    // the r14 directive-2 gap: paragraphAgg (the e2e stage) got the wide
    // flag in r12, the standalone query body did not. Same fixture, same
    // laws: the wide arm recovers exactly the planted structure (its
    // birthday bound is n²/2⁶⁵), its dup set is CONTAINED in the mod-P
    // arm's (a 64-bit window equality is a mod-P equality up to the
    // ~2⁻⁶⁴ reverse-collision odds), and the mod-P excess stays inside
    // the n²/2P budget that r11 measured at exactly 20.
    val expected = leaders.flatMap { l =>
      Seq(l + 1 -> 4L, l + 2 -> 4L, l + 3 -> 3L, l + 4 -> 1L)
    }.toMap
    val modp = DedupQueries.paragraphDedup(corpus)
      .filter(col("n_dup") > 0).select(col("doc_id"), col("n_dup"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val wide = DedupQueries.paragraphDedup(corpus, wide = true)
      .filter(col("n_dup") > 0).select(col("doc_id"), col("n_dup"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(wide == expected,
      s"standalone wide arm extras: ${(wide -- expected.keys).take(5)}")
    // containment: every wide dup doc is a mod-P dup doc with >= count
    val escaped = wide.filter { case (d, n) => !modp.get(d).exists(_ >= n) }
    assert(escaped.isEmpty, s"wide dups escaping mod-P: ${escaped.take(5)}")
    val extras = modp -- expected.keys
    info(s"standalone mod-P birthday extras: ${extras.size}")
    assert(extras.size <= 40 && extras.values.forall(_ == 1L),
      s"mod-P extras beyond the birthday budget: ${extras.take(8)}")
    spark.catalog.clearCache()
    graft.CheckpointUtil.releaseStragglers()
  }

  test("pointer-doubling CC recovers exactly the planted clusters, in logarithmic rounds") {
    val d = corpus
      .select(col("doc_id"),
        graft.functions.TextFunctions.shingleHashes(col("text"), 3).as("shh"))
      .withColumn("bands", Dedup.bandHashes(Dedup.minhashSignature(col("shh"))))
      .persist()
    val cands = Dedup.lshCandidatePairs(
      d.select("doc_id", "bands"), "doc_id", "bands")
    val pairs = cands
      .join(d.select(col("doc_id").as("id_a"), col("shh").as("shh_a")), "id_a")
      .join(d.select(col("doc_id").as("id_b"), col("shh").as("shh_b")), "id_b")
      .filter(Dedup.jaccard(col("shh_a"), col("shh_b")) >= 0.5)
      .select("id_a", "id_b")
    val (labels, iters) = Dedup.connectedComponentsWithStats(pairs)
    val comps = labels.groupBy(col("canonical_id"))
      .agg(sort_array(collect_list(col("id"))).as("members"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toMap
    val expected = leaders.map(l => l -> Seq(l, l + 1, l + 2, l + 3)).toMap
    assert(comps == expected,
      s"cluster structure drifted (got ${comps.size} components)")
    // pointer doubling: 4-member chains resolve in O(log) rounds — the
    // fixpoint check costs one extra round beyond the work
    info(s"cc converged in $iters rounds over ${comps.size} clusters")
    assert(iters <= 4, s"cc took $iters rounds for diameter-3 clusters")
    d.unpersist(blocking = false)
    graft.CheckpointUtil.releaseStragglers()
  }

  test("editdist blocking finds all planted char-level pairs at 75k docs without going quadratic") {
    val s = spark
    import s.implicits._
    // 500 mutation donors from the UNIQUE class (role 50 — untouched by
    // the token-level planted structure), each cloned to id+N with 4
    // scattered char substitutions: TRUE edit-distance-4 pairs the
    // shingle passes would score as near-identical but whose detection
    // here must be exact. Together with the exact-clone pairs (dist 0)
    // the expected output has a closed form.
    val donors = (0L until N).filter(_ % 100 == 50)
    val mutants = s.createDataset(donors).map { id =>
      val t = DedupStressSpec.docOf(id).toCharArray
      for (p <- Seq(1, 9, 17, 33)) t(p) = if (t(p) == 'q') 'z' else 'q'
      (N + id, new String(t))
    }.toDF("doc_id", "text")
    val docs = corpus.unionByName(mutants)

    val t0 = System.nanoTime()
    val got = DedupQueries.editDistPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val secs = (System.nanoTime() - t0) / 1e9
    // closed form: per planted block the three exact-clone pairs at dist
    // 0; per donor the (donor, mutant) pair at dist 4. Levenshtein verify
    // is exact, so NO false positives are possible — equality, not subset.
    val expected =
      leaders.flatMap { l =>
        Seq((l, l + 1, 0L), (l, l + 2, 0L), (l + 1, l + 2, 0L))
      }.toSet ++ donors.map(id => (id, N + id, 4L))
    assert(got.length == expected.size && got.toSet == expected,
      s"pairs drifted: missing=${(expected -- got.toSet).take(5)} " +
        s"extra=${(got.toSet -- expected).take(5)}")
    // the pruning claim with the production expressions: on this corpus
    // (10k-word vocab, so ~7.5 docs share any given anchor-block value)
    // the candidate volume is LINEAR in the corpus — measured ~0.66
    // candidates per doc (49.8k total), five orders of magnitude under
    // the 75.5k-doc all-pairs cliff of 2.85e9. The bound is per-doc, not
    // per-planted-pair: block collisions scale with corpus size, and a
    // production corpus with a larger vocabulary (or a wider W) only
    // gets MORE selective. Anything remotely quadratic fails loudly here.
    val d = docs.filter(length(col("text")) >= DedupQueries.EdMinLen)
      .select(col("doc_id"), col("text"), length(col("text")).as("l"))
      .persist()
    val nCand = DedupQueries.editDistCandidates(d).count()
    info(f"pairs=${got.length} candidates=$nCand verify_time=$secs%.1fs")
    assert(nCand >= expected.size && nCand < 2L * (N + donors.size),
      s"$nCand candidates for ${N + donors.size} docs — blocking is not pruning")
    // clusters over the same graph have a closed form too: one
    // {leader, clone, clone} triangle per block (canonical = leader) and
    // one {donor, mutant} pair per donor (canonical = donor)
    val comps = Dedup.connectedComponents(
        spark.createDataset(got.toSeq.map(t => (t._1, t._2)))
          .toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expectComps =
      leaders.flatMap(l => Seq(l -> l, (l + 1) -> l, (l + 2) -> l)).toMap ++
        donors.flatMap(id => Seq(id -> id, (N + id) -> id)).toMap
    assert(comps == expectComps,
      s"editdist cluster structure drifted (got ${comps.size} members)")

    // incremental arm at the same scale: the mutants play the daily batch
    // (750 docs against the 75k standing corpus). Closed form: the only
    // batch-touching pairs are the (donor, mutant) edits — the clone
    // triangles are corpus-only and must NOT be re-emitted. The candidate
    // JOIN OUTPUT must be batch-proportional: the standing corpus
    // contributes one scan-and-shuffle pass (its probe blocks meet the
    // batch's index blocks in the equi-join) but never self-joins, so
    // candidates scale with the batch, not the corpus.
    val isNew = col("doc_id") >= N
    val gotIncr = DedupQueries.editDistPairsIncremental(docs, isNew)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expectIncr = donors.map(id => (id, N + id, 4L)).toSet
    assert(gotIncr == expectIncr,
      s"incremental pairs drifted: missing=${(expectIncr -- gotIncr).take(5)} " +
        s"extra=${(gotIncr -- expectIncr).take(5)}")
    val nCandIncr = DedupQueries.editDistCandidatesIncremental(
      d.filter(isNew), d.filter(!isNew)).count()
    info(s"incremental: pairs=${gotIncr.size} candidates=$nCandIncr " +
      s"batch=${donors.size} (full-arm candidates=$nCand)")
    assert(nCandIncr < 10L * donors.size,
      s"$nCandIncr candidates for a ${donors.size}-doc batch — " +
        "incremental blocking is not batch-proportional")
    d.unpersist(blocking = false)
    graft.CheckpointUtil.releaseStragglers()
  }

  test("substring-span dedup recovers planted coverage at 50k docs, within the mod-P birthday excess") {
    // the corpus yields ~3.65M distinct 8-gram shingles; in the mod-P
    // (1e9+7) hash space that predicts ~6.7k colliding pairs (n²/2P) →
    // ~23% of docs carry at least one spuriously-shared shingle. Planted
    // structure must come through exactly where full coverage makes the
    // value collision-proof, and the spurious breadth must stay inside
    // ~2× the prediction — the same measured evidence as the paragraph
    // pass that the 100 TB path needs the 64-bit hash space.
    val docs = corpus.withColumn("source", lit("s"))
    val cov = TrainingDataQueries.excisedCoverage(
        TrainingDataQueries.repeatedSpanHits(docs),
        TrainingDataQueries.SubstrNgram)
      .withColumn("role", col("doc_id") % 1000)
      .persist()
    // exact clones: every window repeats the leader's → full 80-token
    // cover (spurious extras cannot exceed an already-full union)
    assert(cov.filter(col("role").isin(1, 2)).count() == 100)
    assert(cov.filter(col("role").isin(1, 2) && col("n_removed") =!= 80)
      .count() == 0)
    // near-dups: the 75-token planted prefix at least, the doc at most
    assert(cov.filter(col("role") === 3).count() == 50)
    assert(cov.filter(col("role") === 3 &&
      (col("n_removed") < 75 || col("n_removed") > 80)).count() == 0)
    // paragraph grafts: the 20-token planted span at least
    assert(cov.filter(col("role") === 4).count() == 50)
    assert(cov.filter(col("role") === 4 && col("n_removed") < 20).count() == 0)
    // spurious breadth: unique docs (and leaders) hit only by hash
    // collisions — bounded by twice the birthday prediction
    val spurious = cov.filter(!col("role").isin(1, 2, 3, 4)).count()
    info(s"spurious-hit docs: $spurious (predicted ~11.5k)")
    assert(spurious < 23000, s"spurious-hit docs: $spurious")
    // THE CONTRAST (the 100 TB lesson made runnable): the wide (64-bit)
    // arm over the SAME ~3.65M windows — birthday bound n²/2⁶⁵ ≈ 0, so
    // the planted classes come through at their closed-form coverage with
    // ZERO spurious-hit docs where mod-P produced thousands
    val covW = TrainingDataQueries.excisedCoverage(
        TrainingDataQueries.repeatedSpanHits(docs, wide = true),
        TrainingDataQueries.SubstrNgram)
      .withColumn("role", col("doc_id") % 1000)
      .persist()
    assert(covW.filter(!col("role").isin(1, 2, 3, 4)).count() == 0,
      "64-bit substring arm produced spurious hits at 3.65M windows")
    assert(covW.count() == 200, "wide arm lost planted flagged docs")
    assert(covW.filter(col("role").isin(1, 2) && col("n_removed") =!= 80)
      .count() == 0)
    assert(covW.filter(col("role") === 3 &&
      (col("n_removed") < 75 || col("n_removed") > 80)).count() == 0)
    assert(covW.filter(col("role") === 4 && col("n_removed") < 20).count() == 0)
    Seq(cov, covW).foreach(_.unpersist(blocking = false))
    graft.CheckpointUtil.releaseStragglers()
  }
}

/** Generator on the module (Serializable) so Dataset closures never
  * capture the suite instance — same pattern as [[AnnStressSpec]]. */
object DedupStressSpec extends Serializable {
  val N = 50000L
  private val Vocab = 10000
  private val Toks = 80

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  // mix the seed BEFORE combining with the position: a single linear
  // combination (seed*a + j*b) aliases whole windows whenever
  // a*Δseed = b*Δj, and the outer mix preserves those collisions exactly
  private def tok(seed: Long, j: Int): String =
    "w" + java.lang.Math.floorMod(mix(mix(seed) + j * 7919L), Vocab.toLong)

  /** Deterministic document text for `id` (see class doc for the planted
    * classes). */
  def docOf(id: Long): String = {
    val role = id % 1000
    val leader = id - role
    role match {
      case 1 | 2 => (0 until Toks).map(tok(leader, _)).mkString(" ")
      case 3 =>
        ((0 until Toks - 5).map(tok(leader, _)) ++
          (Toks - 5 until Toks).map(tok(id, _))).mkString(" ")
      case 4 =>
        ((0 until 20).map(tok(leader, _)) ++
          (20 until Toks).map(tok(id, _))).mkString(" ")
      case _ => (0 until Toks).map(tok(id, _)).mkString(" ")
    }
  }
}
