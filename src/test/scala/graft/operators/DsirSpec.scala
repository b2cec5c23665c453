package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}
import graft.functions.TextFunctions

/** `pipeline_dsir_weights` invariants: the rank is a permutation aligned
  * with the score order, the keep rule selects exactly the top quartile,
  * and the feature count matches the doc's bigram count. */
class DsirSpec extends SparkSuite {

  private lazy val w =
    SparkEntry.queries("pipeline_dsir_weights")(spark, sf0001).persist()

  test("rank is a 1..N permutation ordered by (score desc, doc_id)") {
    val rows = w.select("dsir_rank", "score", "doc_id")
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (sa, sb) = (a.getDouble(1), b.getDouble(1))
        assert(sa > sb || (sa == sb && a.getLong(2) < b.getLong(2)),
          s"rank order must follow (score desc, doc_id): $a then $b")
      case _ =>
    }
  }

  test("keep selects exactly the top quartile") {
    val total = w.count()
    assert(w.filter(col("keep")).count() == total / 4)
    assert(w.filter(col("keep") && col("dsir_rank") > lit(total / 4)).count() == 0)
  }

  test("n_feats is the doc's bigram count; target slice is excluded") {
    val expected = Tables.documents(spark, sf0001)
      .filter(col("source") =!= "src19")
      .select(col("doc_id"),
        greatest(TextFunctions.tokenCount(col("text")).cast("long") - 1, lit(0L))
          .as("exp_feats"))
    assert(w.join(expected, "doc_id")
      .filter(col("n_feats") =!= col("exp_feats")).count() == 0)
    assert(w.count() == expected.count())
  }
}
