package graft

import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_agg_pricing_summary", "q_join_revenue_by_nation", "dedup_minhash_sig", "sim_topk_brute", "sim_topk_quantized", "q_topk_parts", "q_topk_grouped_agg", "text_quality", "dedup_semantic", "q_salted_join", "pipeline_upsert", "text_cms_counts", "q_distinct_twophase")) {
      println(s"===== $q")
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01").queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l => l.contains("Scan") || l.contains("PushedFilters") || l.contains("Broadcast") || l.contains("ReadSchema") || l.contains("TakeOrdered") || l.contains("Exchange")).mkString("\n").take(3000))
    }
    spark.stop()
  }
}
