package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}

/** `q_bloom_join` invariants: the Bloom prefilter actually prunes the
  * fact side before the exchange, the join stays shuffle-hash (the
  * at-scale plan the query pins), and the result is identical to the
  * plain unfiltered join. */
class BloomJoinSpec extends SparkSuite {

  test("bloom prefilter prunes most of the fact side, losing no match") {
    val li = Tables.lineitem(spark, sf0001)
    val urgent = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = urgent.agg(new BloomFilterAgg(
      RelationalQueries.JoinBloomBits, RelationalQueries.JoinBloomK)
      .column(col("o_orderkey")).as("bloom"))
    val kept = li.crossJoin(broadcast(bloom))
      .filter(BloomFilterAgg.mightContain(col("bloom"), col("l_orderkey"),
        RelationalQueries.JoinBloomBits, RelationalQueries.JoinBloomK))
    val total = li.count()
    val keptN = kept.count()
    val trueMatches = li.join(urgent, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    assert(keptN >= trueMatches, "a Bloom must have no false negatives")
    assert(keptN < total / 2,
      s"prefilter must prune the ~80% non-urgent mass, kept $keptN of $total")
  }

  test("result equals the plain join and the physical join is shuffle-hash") {
    val q = SparkEntry.queries("q_bloom_join")(spark, sf0001)
    val li = Tables.lineitem(spark, sf0001)
    val plain = li.join(Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
    assert(q.exceptAll(plain).count() == 0 && plain.exceptAll(q).count() == 0)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("ShuffledHashJoin"),
      s"expected a shuffle-hash join in:\n$physical")
  }
}
