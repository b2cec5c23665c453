package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}

/** `src_zorder` locality: every bucket must be a small rectangle in
  * (custkey, day) space — the property min/max row-group stats prune on —
  * and measurably tighter than a one-dimensional layout. */
class ZOrderSpec extends SparkSuite {

  private lazy val z =
    SparkEntry.queries("src_zorder")(spark, sf001).persist()

  private def area = (col("x_hi") - col("x_lo") + 1) *
    (col("y_hi") - col("y_lo") + 1)

  test("buckets cover all rows with sane bounds") {
    val total = z.agg(sum("n_rows")).head.getLong(0)
    assert(total == Tables.orders(spark, sf001).count())
    assert(z.filter(col("x_lo") > col("x_hi") || col("y_lo") > col("y_hi") ||
      col("x_lo") < 0 || col("y_lo") < 0 ||
      col("x_hi") > 1023 || col("y_hi") > 1023).count() == 0)
  }

  test("z-order buckets are tighter than an orderkey-ordered layout in BOTH dims") {
    // baseline: the same bucket size over the natural o_orderkey order
    val ord = Tables.orders(spark, sf001).select(col("o_orderkey"),
        col("o_custkey"), (unix_micros(col("o_orderdate"))
          .divide(86400000000L)).cast("long").as("day"))
    val xmax = ord.agg(max("o_custkey")).head.getLong(0)
    val Seq(dmin, dmax) = ord.agg(min("day"), max("day")).head
      .toSeq.map(_.asInstanceOf[Long])
    val base = ord
      .withColumn("xb", (col("o_custkey") * 1024L).divide(xmax + 1).cast("long"))
      .withColumn("yb", ((col("day") - dmin) * 1024L)
        .divide(dmax - dmin + 1).cast("long"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("o_orderkey")))
      .withColumn("bucket", ((col("r") - 1) / SourceQueries.ZBucketRows).cast("long"))
      .groupBy("bucket")
      .agg(min("xb").as("x_lo"), max("xb").as("x_hi"),
        min("yb").as("y_lo"), max("yb").as("y_hi"))
    val zArea = z.agg(avg(area)).head.getDouble(0)
    val baseArea = base.agg(avg(area)).head.getDouble(0)
    assert(zArea < baseArea / 4,
      s"z-order avg bucket area $zArea must be far under baseline $baseArea")
    // wide buckets exist only at z-curve quadrant seams — a thin minority
    // (an orderkey-ordered layout spans the full x range in EVERY bucket)
    val wide = z.filter(col("x_hi") - col("x_lo") > 512 ||
      col("y_hi") - col("y_lo") > 512).count()
    assert(wide <= z.count() / 10,
      s"$wide of ${z.count()} buckets span a half-dimension")
  }
}
