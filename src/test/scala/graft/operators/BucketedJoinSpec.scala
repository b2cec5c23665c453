package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Demonstrates the co-located join path for repeated fact-fact joins: both
  * sides bucketed + sorted on the join key make the sort-merge join read
  * bucket-aligned files with NO shuffle exchange — at 100 TB this turns the
  * dominant repeated cost (shuffling the fact table per join) into a
  * one-time write-side layout decision. Asserted on the physical plan.
  */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed+sorted tables sort-merge join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // remove orphaned locations a previously-aborted run may have left
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // force SMJ (hint on an input) so the assertion is about exchanges,
    // not join strategy — at real scale neither side broadcasts anyway
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(joined.count() > 0)

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
  }
}
