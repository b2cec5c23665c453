package graft.pu

import org.apache.spark.ml.classification.{ProbabilisticClassificationModel, ProbabilisticClassifier}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.Dataset

/** Deterministic classifier for pinning the PU learners' *dataflow*
  * (SURVEY.md §5.2 item 2): P(positive) := features(0) clamped to [0,1],
  * independent of training data. With scores fixed, every threshold,
  * count, rotation, and convergence decision of the iterative learners is
  * exactly predictable. */
class StubProbClassifier(override val uid: String)
  extends ProbabilisticClassifier[Vector, StubProbClassifier, StubProbModel] {
  def this() = this(Identifiable.randomUID("stubc"))
  override def train(dataset: Dataset[_]): StubProbModel = new StubProbModel(uid)
  override def copy(extra: ParamMap): StubProbClassifier = defaultCopy(extra)
}

class StubProbModel(override val uid: String)
  extends ProbabilisticClassificationModel[Vector, StubProbModel] {
  override def numClasses: Int = 2
  private def p(features: Vector): Double = math.min(1.0, math.max(0.0, features(0)))
  override def predictRaw(features: Vector): Vector =
    Vectors.dense(1.0 - p(features), p(features))
  override def raw2probabilityInPlace(raw: Vector): Vector = raw
  override def copy(extra: ParamMap): StubProbModel = defaultCopy(extra)
}
