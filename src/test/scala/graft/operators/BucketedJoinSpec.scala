package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Demonstrates the co-located join path for repeated fact-fact joins: both
  * sides bucketed + sorted on the join key make the sort-merge join read
  * bucket-aligned files with NO shuffle exchange — at 100 TB this turns the
  * dominant repeated cost (shuffling the fact table per join) into a
  * one-time write-side layout decision. Asserted on the physical plan.
  */
class BucketedJoinSpec extends SparkSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

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

  test("distributed ANN join against the bucketed list table loses the corpus-side exchange") {
    import graft.functions.NativeExpressions
    val tbl = "graft_annjoin_bucketed_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    locally {
      val dir = new java.io.File(graft.sources.Scratch.warehouseDir(spark), tbl)
      if (dir.exists()) { import scala.reflect.io.Directory; new Directory(dir).deleteRecursively() }
    }
    val corpus = Similarity.prepare(Tables.embeddings(spark, sf0001)).persist()
    val cents = Similarity.collectCentroids(Similarity.centroids(corpus, 16))
    graft.sources.Layouts.writeBucketed(
      Similarity.ivfAssignWith(corpus, cents), tbl, "cen_id",
      nBuckets = 16, sortCols = Seq("cen_id", "vec_id"))

    def probes = corpus.filter(col("vec_id") % 5 === 2)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
      .withColumn("cen_id",
        explode(NativeExpressions.topNCosineIds(col("qv"), col("qnrm"), cents, 4)))
    def body(lists: org.apache.spark.sql.DataFrame) =
      Similarity.topKPerQuery(
        lists.join(probes.hint("shuffle_hash"), "cen_id")
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cos",
            Dedup.cosine(col("qv"), col("v"), col("qnrm"), col("nrm"))), 10)
    // count real exchange NODES in the final adaptive plan (the plan
    // STRING doubles under AQE: Initial + Final sections)
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      collectWithSubqueries(df.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.length
    val overTable = body(spark.table(tbl))
    val overScan = body(Similarity.ivfAssignWith(corpus, cents))
    // same answers either way... (collect first: AQE finalizes the plan)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(overTable.collect().map(key).toSet == overScan.collect().map(key).toSet)
    // ...but the bucketed read SATISFIES the join's distribution: its side
    // contributes no exchange (the write paid it once), leaving exactly the
    // probe-side shuffle and TopKAgg's partial-agg shuffle
    val p = overTable.queryExecution.executedPlan.toString
    assert(p.contains("Bucketed: true"), p)
    assert(exchanges(overTable) == 2 && exchanges(overScan) == 3,
      s"expected exactly the corpus-side exchange gone: " +
        s"${exchanges(overTable)} vs ${exchanges(overScan)}\n$p")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    corpus.unpersist()
  }
}
