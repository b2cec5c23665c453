package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{SparkEntry, SparkSuite, Tables}
import graft.functions.NativeExpressions

/** Invariants for the two round-12 paragraph-hygiene passes:
  *
  *  - `pipeline_boilerplate` (CCNet/C4-style): a window hash in >=
  *    BoilerplateDf distinct docs is dropped from EVERY doc, and only
  *    those are.
  *  - `pipeline_indoc_dedup`: later same-doc repeats of a window are
  *    dropped; first occurrences and all cross-doc structure untouched.
  *
  * Both recomputed here against an independent window-grain formulation
  * (explode + window/semi-join) — the spec twin is a DIFFERENT Spark
  * plan shape than the queries, so a shared-plan bug can't self-verify.
  */
class ParagraphHygieneSpec extends SparkSuite {

  private val w = TrainingDataQueries.ParaWindow

  private lazy val paras = Tables.documents(spark, sf0001)
    .select(col("doc_id"),
      posexplode(NativeExpressions.windowHashes(col("text"), w)))
    .select(col("doc_id"), col("pos").cast(LongType).as("pidx"),
      col("col").as("h"))
    .persist()

  test("boilerplate: drop counts equal the independent frequency rule") {
    val bp = SparkEntry.queries("pipeline_boilerplate")(spark, sf0001).persist()
    // independent formulation: distinct + countDistinct window function
    val expected = paras
      .withColumn("nd", size(collect_set(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("h")))))
      .withColumn("boiler", col("nd") >= TrainingDataQueries.BoilerplateDf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("e_paras"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("e_boiler"))
    val joined = bp.join(expected, "doc_id")
    assert(joined.count() == bp.count())
    assert(joined.filter(col("n_paras") =!= col("e_paras") ||
      col("n_boiler") =!= col("e_boiler")).count() == 0)
    // the drop path is exercised at this scale (fixture-audited >= 3-doc
    // windows exist) — a vacuous pass would hide a broken threshold
    assert(bp.agg(sum(col("n_boiler"))).head.getLong(0) > 0)
    bp.unpersist()
  }

  test("boilerplate and keep-first paragraph dedup agree on totals") {
    // every boilerplate OCCURRENCE is, by definition, part of a hash with
    // >= 2 occurrences — so dedup_paragraph (keep-first) must drop at
    // least n_boiler - (#boiler hashes kept once) of them; cheaper exact
    // check: a doc's boilerplate drops never exceed its paragraph count
    val bp = SparkEntry.queries("pipeline_boilerplate")(spark, sf0001)
    assert(bp.filter(col("n_boiler") > col("n_paras")).count() == 0)
    // kept_hash = 0 exactly when everything was dropped
    assert(bp.filter(col("n_boiler") === col("n_paras") &&
      col("kept_hash") =!= 0L).count() == 0)
  }

  test("boilerplate wide (64-bit) arm: identical drop decisions on the collision-free fixture") {
    // the 100 TB arm swaps the hash SPACE, not the law: on a fixture with
    // no mod-P birthday collisions the per-doc (n_paras, n_boiler) counts
    // must be identical; kept_hash legitimately differs (it combines the
    // h values themselves)
    val docs = Tables.documents(spark, sf0001)
    val modp = TrainingDataQueries.boilerplateAgg(docs)
      .select("doc_id", "n_paras", "n_boiler").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val wide = TrainingDataQueries.boilerplateAgg(docs, wide = true)
      .select("doc_id", "n_paras", "n_boiler").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(wide == modp)
    assert(wide.values.map(_._2).sum > 0, "drop path not exercised")
    graft.CheckpointUtil.releaseStragglers()
  }

  test("in-doc dedup: drops are exactly the later same-doc repeats") {
    val q = SparkEntry.queries("pipeline_indoc_dedup")(spark, sf0001).persist()
    // independent formulation over the AUGMENTED text: explode + window
    val bannerTail = " " + (2 to w).map("b" + _).mkString(" ")
    val banner = concat(lit("g"), col("doc_id").cast("string"), lit(bannerTail))
    val aug = when(col("doc_id") % 7 === 3,
      concat(banner, lit(" "), banner, lit(" "), col("text")))
      .otherwise(col("text"))
    val augParas = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        posexplode(NativeExpressions.windowHashes(aug, w)))
      .select(col("doc_id"), col("pos").as("pidx"), col("col").as("h"))
    val expected = augParas
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col("doc_id"), col("h")).orderBy(col("pidx"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("e_paras"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("e_dup"))
    val joined = q.join(expected, "doc_id")
    assert(joined.filter(col("n_paras") =!= col("e_paras") ||
      col("n_dup_indoc") =!= col("e_dup")).count() == 0)
    // every 7th doc carries the doubled banner -> exactly one drop there;
    // and docs WITHOUT the banner have no natural repeats at this window
    assert(q.filter(col("doc_id") % 7 === 3 && col("n_dup_indoc") < 1)
      .count() == 0)
    q.unpersist()
  }

  test("in-doc dedup is idempotent (kept windows are pairwise distinct)") {
    val bannerTail = " " + (2 to w).map("b" + _).mkString(" ")
    val banner = concat(lit("g"), col("doc_id").cast("string"), lit(bannerTail))
    val aug = when(col("doc_id") % 7 === 3,
      concat(banner, lit(" "), banner, lit(" "), col("text")))
      .otherwise(col("text"))
    val kept = Tables.documents(spark, sf0001)
      .withColumn("wh", NativeExpressions.windowHashes(aug, w))
      .withColumn("kept", filter(col("wh"),
        (h, i) => array_position(col("wh"), h) === (i + 1).cast(LongType)))
    assert(kept.filter(size(col("kept")) =!=
      size(array_distinct(col("kept")))).count() == 0)
  }

  test("boilerplate join-back degrade is row-identical and actually swaps the join") {
    import graft.Tables
    val docs = Tables.documents(spark, sf0001)
    // budget 0 → the probe can never fit → the shuffle-hash arm
    assertArmsIdentical(TrainingDataQueries.boilerplateAgg(docs),
      TrainingDataQueries.boilerplateAgg(docs, maxBoilerBroadcast = 0L))
    graft.CheckpointUtil.releaseStragglers()
  }

  test("release spec-scoped caches") {
    paras.unpersist()
  }
}
