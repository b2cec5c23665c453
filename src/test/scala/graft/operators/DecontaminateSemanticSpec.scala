package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Behavioural guard for `pipeline_decontaminate_semantic`. The DuckDB
  * oracle proves the two engines agree; what it cannot prove is that the
  * semantic arm EARNS ITS KEEP — a tau high enough to catch nothing would
  * still hash-match. This spec pins, at fixture scale:
  *   - the semantic pass catches docs the exact 8-gram pass is blind to
  *     (the whole reason the operator exists);
  *   - the output covers every non-eval doc exactly once, flags complete;
  *   - the empty-eval-slice guard: no eval docs means no centroids means
  *     nothing contaminated, not a crash in the assignment kernel.
  */
class DecontaminateSemanticSpec extends SparkSuite {

  test("semantic arm catches paraphrases invisible to the 8-gram pass") {
    val out = graft.SparkEntry.queries("pipeline_decontaminate_semantic")(spark, sf0001)
      .persist()
    val docs = Tables.documents(spark, sf0001)
    assert(out.count() == docs.filter(col("source") =!= "src19").count(),
      "output must cover every non-eval doc exactly once")
    val semOnly = out.filter(col("semantic_contaminated") && !col("exact_contaminated")).count()
    assert(semOnly > 0,
      "no semantic-only catch at sf0.001 — the semantic arm is vacuous")
    // no eval doc may appear in the compared surface at all
    assert(out.join(docs.filter(col("source") === "src19").select("doc_id"), "doc_id")
      .count() == 0L)
    out.unpersist()
  }

  test("empty eval slice: zero contamination, no crash") {
    val dir = Files.createTempDirectory("graft_decon_sem_noeval").toString
    Tables.documents(spark, sf0001).filter(col("source") =!= "src19")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("pipeline_decontaminate_semantic")(spark, dir)
      .persist()
    assert(out.filter(col("semantic_contaminated") || col("exact_contaminated"))
      .count() == 0L, "an empty eval slice contaminated something")
    assert(out.count() > 0, "non-eval docs must still be emitted")
    out.unpersist()
    spark.catalog.clearCache()
  }
}
