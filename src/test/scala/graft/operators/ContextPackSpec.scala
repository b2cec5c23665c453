package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Context packing (`pipeline_context_pack`): prefix-packs the SERVED
  * ranking (`pipeline_e2e_retrieve_served` — the persisted-index read
  * path) into [[SimilarityQueries.ContextBudget]] tokens. Pins the prefix
  * law (emitted = exactly ranks 1..m, running sums correct and within
  * budget, rank m+1 would NOT have fit) and token-count parity with the
  * shared kernel.
  */
class ContextPackSpec extends SparkSuite {

  test("prefix law and token parity against the unpacked ranking") {
    val packed = SimilarityQueries.queries("pipeline_context_pack")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(packed.nonEmpty)

    // the unpacked ranking with independent token counts
    val full = SimilarityQueries.queries("pipeline_e2e_retrieve_served")(spark, sf0001)
      .select(col("rank"), col("doc_id"))
      .join(Tables.documents(spark, sf0001).select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("nt")), Seq("doc_id"))
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2)))
      .sortBy(_._1)

    val budget = SimilarityQueries.ContextBudget
    val m = packed.length
    assert(packed.map(_._1).toSeq == (1L to m).toSeq, "a contiguous rank prefix")
    var cum = 0L
    packed.zip(full.take(m)).foreach { case ((rk, id, nt, c), (frk, fid, fnt)) =>
      assert(rk == frk && id == fid && nt == fnt, s"rank $rk row parity")
      cum += nt
      assert(c == cum && c <= budget, s"rank $rk running sum")
    }
    // the cut is real: the next-ranked doc would have overflowed
    assert(m == full.length || cum + full(m)._3 > budget,
      s"rank ${m + 1} must not fit (cum=$cum next=${full.lift(m)})")
    assert(m < full.length, "the budget must actually cut the list at sf0.001")
  }
}
