package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Diagnostic main (test scope): prints the stream-stream join's state
  * watermark predicates for the streaming dedup operators — empirical
  * proof that the time-bound join conditions DO translate into state
  * eviction (the per-attribute `StreamingJoinHelper` WARNs during
  * planning are solver noise for non-time attributes, not a failure).
  * Run: `sbt "Test/runMain graft.StreamStateAudit"`.
  */
object StreamStateAudit {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(4, "graft-stream-audit")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val sfDir = "/root/testdata/sf0.001"
    val corpus = graft.operators.Similarity.prepare(Tables.embeddings(spark, sfDir))
      .filter(col("vec_id") < 100).persist()
    val cents = graft.operators.Similarity.collectCentroids(
      graft.operators.Similarity.centroids(corpus, 8))
    val rows = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
      .select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

    val source = MemoryStream[(Long, java.sql.Timestamp, Seq[Float])]
    val q = streaming.StreamingDedup.semanticDupPairs(
        source.toDF().toDF("vec_id", "ts", "embedding"),
        "vec_id", "ts", "embedding", cents, horizon = "2 hours", tau = 0.3)
      .writeStream.format("memory").queryName("audit_semdup")
      .outputMode("append").start()
      .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery
    source.addData(rows.map { case (id, e) =>
      (id, new java.sql.Timestamp(1704067200000L + id * 20000L), e) }.toSeq)
    q.processAllAvailable()
    q.lastExecution.executedPlan.foreach {
      case j: org.apache.spark.sql.execution.streaming.operators.stateful.join.StreamingSymmetricHashJoinExec =>
        println(s"JOIN stateWatermarkPredicates: ${j.stateWatermarkPredicates}")
      case _ =>
    }
    q.stop()
    spark.stop()
  }
}
