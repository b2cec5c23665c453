package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}

/** `pipeline_e2e_surgical` composition invariants: the gates compose
  * exactly, survivor-scoped excision is a subset of corpus-scoped, and
  * the shelf stage respects its class budgets. */
class E2eSurgicalSpec extends SparkSuite {

  private lazy val surgical =
    SparkEntry.queries("pipeline_e2e_surgical")(spark, sf0001).persist()

  test("survivors are exactly quality ∩ DSIR-keep with positive packed mass") {
    val quality = CurationPipeline
      .qualitySurvivors(Tables.documents(spark, sf0001)).select("doc_id")
    val keep = SparkEntry.queries("pipeline_dsir_weights")(spark, sf0001)
      .filter(col("keep")).select("doc_id")
    val expected = quality.join(keep, "doc_id")
    assert(surgical.select("doc_id").exceptAll(expected).count() == 0)
    // the shelf stage may drop only docs whose post-excision mass is 0 or
    // over the budget (oversized docs route to chunking in a real DAG)
    val eligible = CurationPipeline
      .qualitySurvivors(Tables.documents(spark, sf0001))
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("nb"))
      .join(keep, "doc_id")
      .filter(col("nb") > 0 && col("nb") <= TrainingDataQueries.ShelfTokens)
    // an in-budget survivor may vanish ONLY by being excised to zero
    // tokens — a full clone, which surgical dedup rightly removes
    // entirely. Full survivor-scoped cover implies full corpus-scoped
    // cover (the hit set only shrinks), so every missing doc must show
    // corpus_removed == its token count.
    val missing = eligible
      .join(surgical.select("doc_id"), Seq("doc_id"), "left_anti")
    val corpusScoped = SparkEntry.queries("dedup_substring_excise")(spark, sf0001)
      .select(col("doc_id"), col("n_removed").as("corpus_removed"))
    assert(missing.join(corpusScoped, Seq("doc_id"), "left")
      .filter(col("corpus_removed").isNull ||
        col("corpus_removed") =!= col("nb")).count() == 0,
      "only fully-excised clones may fall out of the shelf stage")
    assert(surgical.count() > 0)
  }

  test("accounting holds and the excision stage is non-vacuous") {
    assert(surgical.filter(col("n_after") =!=
      col("n_before") - col("n_removed")).count() == 0)
    assert(surgical.filter(col("n_removed") < 0 || col("n_after") < 0).count() == 0)
    assert(surgical.filter(col("n_removed") > 0).count() > 0,
      "the survivor corpus must carry at least one repeated span")
  }

  test("survivor-scoped excision removes no more than corpus-scoped") {
    // ownership re-resolution among survivors can only SHRINK the hit set
    // (a surviving doc may become the new owner; it can never lose a span
    // to a doc the gates dropped)
    val corpusScoped = SparkEntry.queries("dedup_substring_excise")(spark, sf0001)
      .select(col("doc_id"), col("n_removed").as("corpus_removed"))
    assert(surgical.join(corpusScoped, "doc_id")
      .filter(col("n_removed") > col("corpus_removed")).count() == 0)
    assert(surgical.filter(col("n_removed") > 0)
      .join(corpusScoped, Seq("doc_id"), "left_anti").count() == 0,
      "a survivor-scoped hit must also be a corpus-scoped hit")
  }

  test("shelf stage: class budgets hold on the packed survivors") {
    val packs = surgical.groupBy("size_class", "pack_seq")
      .agg(count(lit(1)).as("n_docs"), sum("n_after").as("used"))
    assert(packs.filter(col("n_docs") > col("size_class")).count() == 0)
    assert(packs.filter(col("used") > TrainingDataQueries.ShelfTokens).count() == 0)
  }
}
