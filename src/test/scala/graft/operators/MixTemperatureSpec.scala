package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}

/** `pipeline_mix_temperature` semantics: α = 1/2 flattening — the
  * smallest language is untouched, head languages shed mass, and the
  * post-mix language imbalance is strictly smaller than the corpus's.
  */
class MixTemperatureSpec extends SparkSuite {

  private lazy val out =
    SparkEntry.queries("pipeline_mix_temperature")(spark, sf0001).persist()

  test("the smallest language keeps everything; every rate is a valid ppm") {
    val counts = Tables.documents(spark, sf0001)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val nMin = counts.agg(min("n")).head.getLong(0)
    assert(out.filter(col("n_lang") === nMin &&
      col("rate_ppm") =!= 1000000L).count() == 0)
    assert(out.filter(col("rate_ppm") < 1 ||
      col("rate_ppm") > 1000000L).count() == 0)
    // kept rows of the smallest language == its full corpus slice
    val minLangs = counts.filter(col("n") === nMin).select("lang")
    val keptMin = out.join(minLangs, "lang").count()
    val corpusMin = Tables.documents(spark, sf0001).join(minLangs, "lang").count()
    assert(keptMin == corpusMin)
  }

  test("flattening: post-mix max/min language ratio shrinks toward uniform") {
    val pre = Tables.documents(spark, sf0001)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .agg(max("n").cast("double").as("mx"), min("n").cast("double").as("mn")).head
    val post = out.groupBy("lang").agg(count(lit(1)).as("n"))
      .agg(max("n").cast("double").as("mx"), min("n").cast("double").as("mn")).head
    val preRatio = pre.getDouble(0) / pre.getDouble(1)
    val postRatio = post.getDouble(0) / post.getDouble(1)
    assert(preRatio > 1.5, s"fixture should be skewed, ratio $preRatio")
    assert(postRatio < preRatio,
      s"temperature mix did not flatten: $preRatio -> $postRatio")
    // every language still present — temperature never empties a slice
    assert(out.select("lang").distinct().count() ==
      Tables.documents(spark, sf0001).select("lang").distinct().count())
  }
}
