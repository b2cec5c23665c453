package graft.pu

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The iterative loops run against the deterministic stub classifier: with
  * scores fixed, the reference recurrences give exact expected outputs.
  * Fixture rows: (id, puLabel, score) with score = features(0); boundary
  * case score == threshold included (strict `<` keeps it undefined —
  * reference TraditionalPULearner.scala:81). */
class StubbedLoopSpec extends SparkSuite {

  private val theta = 0.5
  // (id, puLabel, score)
  private val rows = Seq(
    (1L, 1, 0.9), // observed positive — must NEVER change label
    (2L, 0, 0.1), // unlabeled, low score -> reliable negative
    (3L, 0, 0.5), // unlabeled, score == theta -> stays undefined (strict <)
    (4L, 0, 0.7), // unlabeled, high score -> stays undefined
    (5L, 0, 0.49999) // unlabeled, just under -> reliable negative
  )

  private def stub(): StubProbClassifier =
    new StubProbClassifier()
      .setLabelCol(ProbabilisticClassifierConfig.labelName)
      .setFeaturesCol(ProbabilisticClassifierConfig.featuresName)

  private def fixture = {
    import spark.implicits._
    rows.toDF("id", "puLabel", "score")
      .withColumn("features", org.apache.spark.ml.functions
        .array_to_vector(array(col("score"))))
  }

  test("Traditional with stub: exact label partition and early exit") {
    val learner = new TraditionalPULearner(theta, 5, stub())
    val out = learner.weight(fixture.select("id", "puLabel", "features"),
      "puLabel", "features", "w")
    // scores are stable => iteration 2 converts nothing new => early exit
    // with prevLabel/curLabel still present; final weights = stub scores
    val got = out.select("id", "w", "curLabel").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(got(1L) == (0.9, 1)) // positive preserved
    assert(got(2L)._2 == 0 && got(5L)._2 == 0) // reliable negatives
    assert(got(3L)._2 == -1) // boundary stays undefined (strict <)
    assert(got(4L)._2 == -1)
    rows.foreach { case (id, _, s) => assert(got(id)._1 == s) }
  }

  test("GradualReduction with stub: stable scores terminate after one pass") {
    val learner = new GradualReductionPULearner(theta, stub())
    val out = learner.weight(fixture.select("id", "puLabel", "features"),
      "puLabel", "features", "w")
    // entry threshold fixes RN = {2,5}; the in-loop re-threshold promotes
    // nothing (scores constant) => curGain = 0 => predicate fails => stop
    val got = out.select("id", "w", "curLabel").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(got(1L)._2 == 1)
    assert(got(2L)._2 == 0 && got(5L)._2 == 0)
    assert(got(3L)._2 == -1 && got(4L)._2 == -1)
    rows.foreach { case (id, _, s) => assert(got(id)._1 == s) }
  }
}
