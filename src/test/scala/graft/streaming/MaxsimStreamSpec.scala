package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.operators.SimilarityQueries

/** Streaming late-interaction serving ([[StreamingDedup.maxsimServeStream]]):
  * micro-batches of query documents against the persisted maxsim chunk
  * table. Pins stream==batch (the union of per-batch answers equals the
  * batch multi-query serve row-for-row — shared query front and probe
  * body, so a fork is structurally impossible, and this proves it stayed
  * that way) and that every micro-batch's scan is bucket-pruned to its
  * own probed lists. */
class MaxsimStreamSpec extends SparkSuite {

  test("streaming maxsim serve == batch multi-query serve; every batch bucket-pruned") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf0001)
    val ch = SimilarityQueries.chunkVecs(docs).persist()
    val cents = SimilarityQueries.maxsimCentroids(ch)
    val tbl = "graft_maxsim_stream_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    SimilarityQueries.writeMaxsimChunks(ch, tbl, cents)

    val qdocs = docs.filter(col("doc_id") < SimilarityQueries.MultiNQueries)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val source = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = StreamingDedup.maxsimServeStream(
        source.toDF().toDF("id", "text"), "id", "text", tbl, cents,
        SimilarityQueries.MaxsimK) { (df, _) =>
      plans += df.queryExecution.executedPlan.toString
      got ++= df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }.start()
    qdocs.grouped(2).foreach { b => source.addData(b.toSeq); q.processAllAvailable() }
    q.stop()

    assert(plans.size == 2, s"expected 2 micro-batch plans, got ${plans.size}")
    plans.foreach { p =>
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
      assert(m.isDefined, p)
      assert(m.get.group(1).toInt < m.get.group(2).toInt, m.get.matched)
      assert(!p.contains("SortMergeJoin"), p) // chunk lists never shuffle
    }
    val want = SimilarityQueries.queries("src_maxsim_multi")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(want.nonEmpty && got.toSet == want,
      s"stream (${got.size}) != batch (${want.size})")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.catalog.clearCache()
    graft.CheckpointUtil.releaseStragglers()
  }
}
