package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** 100×-fixture stress for the two scale-path order primitives —
  * [[Packing.globalCumSum]] and [[graft.pu.PU.globalRankByScore]] — the
  * machinery under pack, manifest, curriculum, train-order, and tokenize.
  * The fixture specs prove the algebra at 500 rows; this proves the
  * offset/pinned-pid plumbing holds at 1M rows across MORE range
  * partitions than shuffle.partitions, under heavy ties and a skewed
  * (clumped) order key — the regimes where a stage-local partition-id
  * bug or offset misalignment would actually corrupt results.
  */
class RankStressSpec extends SparkSuite {

  private val N = 1000000L

  // skewed order key: 90% of rows clump into 10% of the key space (the
  // range partitioner must split the clump), values in [0, 1000)
  private def big = spark.range(N).toDF("id")
    .withColumn("okey",
      when(pmod(col("id"), lit(10)) < 9, pmod(col("id"), lit(100000)))
        .otherwise(pmod(col("id"), lit(1000000)) + 100000))
    .withColumn("val", pmod(col("id") * 2654435761L, lit(1000)))
    .repartition(57, pmod(col("id"), lit(13))) // scrambled, odd partition count

  test("globalCumSum at 1M rows == the single-task window, under skew and ties") {
    // okey is NOT unique — cumsum only needs a total PREORDER; to compare
    // against the window deterministically, order on (okey, id) via a
    // fused unique key
    val keyed = big.withColumn("k", col("okey") * lit(10000000L) + col("id"))
    val got = Packing.globalCumSum(keyed, "k", "val", "cum")
    val want = keyed.withColumn("want", coalesce(sum(col("val")).over(
      Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val joined = got.select(col("k"), col("cum"))
      .join(want.select(col("k"), col("want")), "k")
    assert(joined.count() == N)
    assert(joined.filter(col("cum") =!= col("want")).count() == 0)
  }

  test("globalRankByOrder composite (group ASC, score DESC) at 1M rows == per-group row_number") {
    // the pipeline_lm_partition shape: group-major total order, per-group
    // rank recovered by subtracting the group's min rank — 23 skewed
    // groups (one holds ~39% of rows via the val skew), rank must come
    // out exactly row_number() OVER (PARTITION BY grp ORDER BY ...)
    val grouped = big.withColumn("grp", pmod(col("val"), lit(23)))
    val ranked = graft.pu.PU.globalRankByOrder(grouped,
      Seq(col("grp").asc, col("val").desc, col("id").asc), "grank")
    val stats = ranked.groupBy("grp").agg(min(col("grank")).as("g0"))
    val got = ranked.join(broadcast(stats), "grp")
      .withColumn("grp_rank", col("grank") - col("g0") + lit(1L))
    val want = grouped.withColumn("want", row_number().over(
      Window.partitionBy(col("grp")).orderBy(col("val").desc, col("id"))).cast("long"))
    val joined = got.select(col("id"), col("grp_rank"))
      .join(want.select(col("id"), col("want")), "id")
    assert(joined.count() == N)
    assert(joined.filter(col("grp_rank") =!= col("want")).count() == 0)
  }

  test("globalRankByScore at 1M rows == row_number, with millions of score ties") {
    // score has only 1000 distinct values -> ~1000-way ties per value;
    // the unique tiebreak must produce a clean permutation anyway
    val got = graft.pu.PU.globalRankByScore(big, "val", col("id"))
    val want = big.withColumn("want",
      row_number().over(Window.orderBy(col("val").desc, col("id"))).cast("long"))
    val joined = got.select(col("id"), col("rank"))
      .join(want.select(col("id"), col("want")), "id")
    assert(joined.count() == N)
    assert(joined.filter(col("rank") =!= col("want")).count() == 0)
  }
}
