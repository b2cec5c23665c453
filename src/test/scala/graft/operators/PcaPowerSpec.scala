package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}

/** `sim_pca_power` semantics: the returned direction is unit-norm and
  * captures at least as much variance as any coordinate axis — i.e. the
  * iteration genuinely converged toward the dominant direction rather
  * than just being deterministic. */
class PcaPowerSpec extends SparkSuite {

  test("dominant direction is unit-norm and beats every coordinate axis") {
    val rows = SparkEntry.queries("sim_pca_power")(spark, sf001)
      .orderBy("dim").collect()
    assert(rows.length == 64)
    val v = rows.map(_.getDouble(1))
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    assert(rows.exists(_.getLong(2) != 0L), "mat-vec units must be non-zero")

    // Rayleigh quotient of v vs the best coordinate axis
    val emb = Tables.embeddings(spark, sf001).select(col("embedding"))
    val vLit = array(v.toSeq.map(lit): _*)
    val y = aggregate(
      zip_with(col("embedding"), vLit, (e, w) => e.cast("double") * w),
      lit(0.0), (a, x) => a + x)
    val rayV = emb.select(sum(y * y).as("r")).head.getDouble(0)
    val axis = emb.select(posexplode(col("embedding")).as(Seq("j", "e")))
      .groupBy("j").agg(sum(col("e") * col("e")).as("r"))
      .agg(max("r")).head.getDouble(0)
    assert(rayV >= 0.95 * axis,
      s"Rayleigh(v)=$rayV must approach/beat the best axis ($axis)")
  }
}
