package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.{SparkSuite, Tables}

class TopKAggSpec extends SparkSuite {

  private val agg = new TopKAgg(3)

  test("reduce keeps the buffer sorted (score desc, id asc) and bounded at k") {
    val rows = Seq((5.0, 10L), (7.0, 2L), (5.0, 3L), (9.0, 8L), (1.0, 1L))
    val buf = rows.foldLeft(agg.zero)(agg.reduce)
    assert(buf == Vector((9.0, 8L), (7.0, 2L), (5.0, 3L)))
  }

  test("merge law: associative-in-effect bounded merge equals global sort") {
    val all = Seq((5.0, 10L), (7.0, 2L), (5.0, 3L), (9.0, 8L), (1.0, 1L),
      (9.0, 4L), (2.0, 6L), (7.0, 7L))
    val (a, b) = all.splitAt(3)
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    val expected = all.sortBy { case (s, i) => (-s, i) }.take(3).toVector
    assert(merged == expected)
    // merging with an empty buffer is the identity
    assert(agg.merge(merged, agg.zero) == merged)
    assert(agg.merge(agg.zero, merged) == merged)
    // idempotent union: re-merging overlapping states never duplicates
    assert(agg.merge(merged, merged) == merged)
    assert(agg.merge(merged, merged.take(2)) == merged)
  }

  test("NaN scores rank GREATEST (as both engines' ORDER BY DESC does), ties by id") {
    val nan = Double.NaN
    val rows = Seq((5.0, 10L), (nan, 7L), (9.0, 8L), (nan, 2L), (1.0, 1L))
    val buf = rows.foldLeft(agg.zero)(agg.reduce)
    assert(buf.map(_._2) == Vector(2L, 7L, 8L)) // NaNs first, then 9.0
    assert(buf(0)._1.isNaN && buf(1)._1.isNaN && buf(2)._1 == 9.0)
    // merge keeps the same total order across partitions
    val (a, b) = rows.splitAt(2)
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(merged.map(_._2) == Vector(2L, 7L, 8L))
  }

  test("aggregate equals the window row_number formulation on orders") {
    val orders = Tables.orders(spark, sf0001)
    val viaWindow = orders
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("rank").cast(LongType).as("rank"),
        col("o_orderkey"), col("o_totalprice"))
    val viaAgg = orders
      .groupBy(col("o_custkey"))
      .agg(TopKAgg.column(3, col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col._2").as("o_orderkey"), col("col._1").as("o_totalprice"))
    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("the physical plan partial-aggregates before the shuffle") {
    val plan = Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey"))
      .agg(TopKAgg.column(3, col("o_totalprice"), col("o_orderkey")).as("top"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate appears twice (partial below the exchange, final
    // above) — the property that bounds shuffled bytes at k rows per group
    // per input partition
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan)
  }
}
