package graft.pu

import org.apache.spark.ml.classification.{ProbabilisticClassificationModel, ProbabilisticClassifier}
import org.apache.spark.ml.feature.VectorIndexer
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Two-step PU learning skeleton: step one picks "reliable negatives" from
  * the unlabeled pool, step two trains a binary classifier on positives +
  * reliable negatives (reference:
  * src/main/scala/ru/ispras/pu4spark/TwoStepPULearner.scala:12-23).
  *
  * Scale changes vs the reference (SURVEY.md §4.3):
  *  - per-row logic is native expressions (see [[PUExpressions]]), no UDFs;
  *  - iteration state management truncates lineage and unpersists superseded
  *    iterations (the reference `cache()`s every iteration and never frees —
  *    unbounded plan growth + a memory leak at scale).
  */
abstract class TwoStepPULearner[
    E <: ProbabilisticClassifier[Vector, E, M],
    M <: ProbabilisticClassificationModel[Vector, M]](
    classifier: ProbabilisticClassifier[Vector, E, M]) extends PositiveUnlabeledLearner {

  import PUExpressions._

  /** Transient columns appended by `model.transform` that must be dropped
    * before the next fit/transform (name collisions) and before returning
    * (reference drops them piecemeal at TraditionalPULearner.scala:31-32,71).
    */
  protected val transientCols: Seq[String] =
    Seq("probability", "prediction", "rawPrediction", ProbabilisticClassifierConfig.labelName)

  /** Step zero: treat every unlabeled row as negative, fit, and score all
    * rows; the score is a reliability measure over the unlabeled pool
    * (reference: TwoStepPULearner.scala:40-60).
    *
    * The reference always runs VectorIndexer(maxCategories=4) before the fit
    * (TwoStepPULearner.scala:47-54) because RandomForest needs categorical
    * metadata. That is one extra full pass over the features; it is kept for
    * behavioral parity (it is the identity on continuous features).
    * A deliberately-skipped MinMaxScaler in the reference
    * (TwoStepPULearner.scala:43-45) is likewise not reproduced.
    */
  def zeroStep(df: DataFrame, labelColumnName: String, featuresColumnName: String,
               finalLabel: String): DataFrame = {
    val dfWithMeta =
      indexLabelColumn(df, labelColumnName, ProbabilisticClassifierConfig.labelName, Seq("0", "1"))
    val featureIndexer = new VectorIndexer()
      .setInputCol(featuresColumnName)
      .setOutputCol(ProbabilisticClassifierConfig.featuresName)
      .setMaxCategories(4) // >4 distinct values => treated as continuous
    val preparedDf = featureIndexer.fit(dfWithMeta).transform(dfWithMeta)

    val model: M = classifier.fit(preparedDf)
    val predictions = model.transform(preparedDf)
    predictions.withColumn(finalLabel, probOfPositive(col("probability")))
  }

  /** Fit on the currently-labeled subset and rescore ALL rows, overwriting
    * `finalLabel`; shared by both iterative learners (reference:
    * TraditionalPULearner.scala:56-71, GradualReductionPULearner.scala:54-66).
    */
  protected def refitAndRescore(curDF: DataFrame, curLabel: String,
                                finalLabel: String): DataFrame = {
    val labeled = curDF.filter(col(curLabel) =!= undefLabel)
    val prepared = indexLabelColumn(labeled, curLabel,
      ProbabilisticClassifierConfig.labelName, Seq("0", "1"))
    val model = classifier.fit(prepared)
    model.transform(curDF)
      .withColumn(finalLabel, probOfPositive(col("probability")))
      .drop(transientCols: _*)
  }

  /** Iteration-state manager: persists the current iteration (explicit
    * MEMORY_AND_DISK for deterministic spill), truncates lineage every
    * `checkpointEvery` iterations via localCheckpoint (iterative
    * withColumn/rename otherwise grows an unbounded Catalyst plan — analysis
    * time blows up past ~10 iterations), and unpersists the superseded
    * iteration once the new one is materialized.
    */
  protected final class IterationState(checkpointEvery: Int = 3) {
    private var prev: Option[(DataFrame, Boolean)] = None
    private var prevPrev: Option[(DataFrame, Boolean)] = None
    // a superseded CHECKPOINT can't be freed when its two-generation turn
    // comes: the still-live persist generations after it root their lineage
    // at it (they recompute from it if their own blocks are evicted). It is
    // unreachable only once the NEXT checkpoint has truncated lineage and
    // every persist generation rooted at the old one has itself been
    // superseded — which is exactly when the next checkpoint's own release
    // turn arrives. So checkpoint frees are deferred one checkpoint cycle.
    private var deferredCheckpoint: Option[DataFrame] = None
    private var iter = 0

    def advance(df: DataFrame): DataFrame = {
      iter += 1
      val isCheckpoint = checkpointEvery > 0 && iter % checkpointEvery == 0
      val cur =
        if (isCheckpoint)
          graft.CheckpointUtil.track(df.localCheckpoint(eager = true))
        else
          df.persist(StorageLevel.MEMORY_AND_DISK)
      // persist() is lazy: unpersisting `prev` NOW would evict it before
      // `cur` is ever materialized, forcing a full lineage recompute. Keep
      // two generations — by the next advance(), actions (iterMetrics/fit)
      // have materialized `cur`, so its grandparent is safely evictable.
      prevPrev.foreach { case (g, wasCheckpoint) =>
        if (wasCheckpoint) {
          deferredCheckpoint.foreach(graft.CheckpointUtil.releaseCheckpoint)
          deferredCheckpoint = Some(g)
        } else graft.CheckpointUtil.releasePersist(g)
      }
      prevPrev = prev
      prev = Some((cur, isCheckpoint))
      cur
    }
  }
}
