package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Sliding-window chunker (`pipeline_chunk_overlap`): W=64-token windows
  * at stride 48 with a right-aligned final window. Pins the closed-form
  * window layout, the short-doc degenerate case, and the corpus-wide
  * coverage/no-containment invariants the layout rule guarantees.
  */
class ChunkOverlapSpec extends SparkSuite {
  import TrainingDataQueries.{ChunkTokens => W, ChunkStride => S}

  private def chunksOf(text: String) = {
    import spark.implicits._
    val df = Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = s"/tmp/chunk_spec_${text.length}_${text.hashCode.abs}"
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TrainingDataQueries.queries("pipeline_chunk_overlap")(spark, dir).collect()
  }

  test("closed-form layout: 100 tokens -> windows [0,64) and right-aligned [36,100)") {
    val toks = (1 to 100).map(i => s"t$i")
    val rows = chunksOf(toks.mkString(" "))
    assert(rows.length == 2)
    val r0 = rows(0); val r1 = rows(1)
    assert((r0.getLong(1), r0.getLong(2), r0.getLong(3)) == (0L, 0L, W.toLong))
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == (1L, 36L, W.toLong))
    assert(r0.getString(4) == toks.take(W).mkString(" "))
    assert(r1.getString(4) == toks.drop(36).mkString(" "))
    // overlap between the two windows is W - (100 - W) = 28 tokens
    assert(W - (100 - W) == 28)
  }

  test("short doc (n <= W) -> exactly one whitespace-normalized chunk") {
    val rows = chunksOf("  alpha \t beta\n gamma  ")
    assert(rows.length == 1)
    assert(rows(0).getLong(2) == 0L && rows(0).getLong(3) == 3L)
    assert(rows(0).getString(4) == "alpha beta gamma")
    assert(chunksOf("   \t  ").isEmpty)
  }

  test("fixture invariants: every token covered, no window contained in another, stride bound") {
    val rows = TrainingDataQueries.queries("pipeline_chunk_overlap")(spark, sf0001)
      .select("doc_id", "start_tok", "n_tok").collect()
      .groupBy(_.getLong(0)).values
    assert(rows.nonEmpty)
    rows.foreach { rs =>
      val iv = rs.map(r => (r.getLong(1), r.getLong(1) + r.getLong(2))).sortBy(_._1)
      val n = iv.map(_._2).max
      // coverage: consecutive windows overlap or touch, first starts at 0
      assert(iv.head._1 == 0L)
      iv.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 <= e1)
        case _ =>
      }
      assert(iv.last._2 == n)
      // no strict containment; starts strictly increase by <= stride
      iv.sliding(2).foreach {
        case Array((s1, e1), (s2, e2)) =>
          assert(s1 < s2 && e1 < e2)
          assert(s2 - s1 <= S)
        case _ =>
      }
    }
  }
}
