package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.{SparkEntry, SparkSuite, Tables}

/** `q_grouping_sets` semantics: the result is EXACTLY the union of the
  * three named slices — each slice equal to its plain groupBy, and no
  * cube cross-product rows smuggled in.
  */
class GroupingSetsSpec extends SparkSuite {

  private lazy val out =
    SparkEntry.queries("q_grouping_sets")(spark, sf0001).persist()

  test("each named slice equals its plain groupBy") {
    val orders = Tables.orders(spark, sf0001)
    val byPri = orders.groupBy(col("o_orderpriority"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType)
        .as("sum_price"), count(lit(1)).as("n_orders"))
    val slicePri = out.filter(col("g_pri") === 0 && col("g_st") === 1)
      .select("o_orderpriority", "sum_price", "n_orders")
    assert(slicePri.exceptAll(byPri).count() == 0)
    assert(byPri.exceptAll(slicePri).count() == 0)
    val grand = out.filter(col("g_pri") === 1 && col("g_st") === 1)
    assert(grand.count() == 1)
    assert(grand.head.getAs[Long]("n_orders") == orders.count())
  }

  test("ntile quartiles are equal-frequency within every segment (sizes differ by <= 1)") {
    val n = SparkEntry.queries("q_ntile_spend")(spark, sf0001)
    val spread = n.groupBy("c_mktsegment")
      .agg((max("n_customers") - min("n_customers")).as("d"),
        countDistinct("quartile").as("nq"))
    assert(spread.count() > 0)
    assert(spread.filter(col("d") > 1).count() == 0)
    assert(spread.filter(col("nq") =!= 4).count() == 0)
  }

  test("above-average filter: strictly fewer survivors than members, never zero overall") {
    val a = SparkEntry.queries("q_above_avg_parts")(spark, sf0001)
    val sizes = Tables.part(spark, sf0001).groupBy("p_type").count()
    val j = a.join(sizes, "p_type")
    assert(j.count() > 0)
    assert(j.filter(col("n_above") >= col("count")).count() == 0,
      "a group where everything is above its own average")
  }

  test("no cube cross-product rows: (pri, status) pairs never appear") {
    assert(out.filter(col("g_pri") === 0 && col("g_st") === 0).count() == 0)
    val nPri = Tables.orders(spark, sf0001)
      .select("o_orderpriority").distinct().count()
    val nSt = Tables.orders(spark, sf0001)
      .select("o_orderstatus").distinct().count()
    assert(out.count() == nPri + nSt + 1)
  }
}
