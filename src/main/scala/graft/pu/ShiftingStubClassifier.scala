package graft.pu

import org.apache.spark.ml.classification.{ProbabilisticClassificationModel, ProbabilisticClassifier}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.Dataset

/** Deterministic, fit-order-dependent classifier that makes the FULL
  * iterative PU loops (O16 Traditional, O17 PU-LEA) oracle-checkable.
  *
  * The k-th `fit` (0-based; the zeroStep fit is k=0) yields a model scoring
  * `P(positive) = clamp01(features(0) + k*delta)`, ignoring the training
  * rows. Scores therefore shift deterministically per refit:
  *  - `delta < 0` drives the Traditional loop: each refit lowers scores, so
  *    a fresh band of unlabeled rows falls under the reliable-negative
  *    threshold every iteration — the loop genuinely iterates;
  *  - `delta > 0` drives PU-LEA: each refit raises scores, so previously
  *    reliable negatives get promoted back to undefined — the gradual
  *    reduction and its three-term convergence predicate are exercised.
  *
  * With scores a closed-form function of (row, refit count), the entire
  * iterated recurrence — thresholds, rotations, early exit, convergence —
  * unrolls into static SQL, giving the loops hash-exact DuckDB oracle rows
  * instead of rows-only checks (the ML-backed queries stay rows-only; this
  * is the same-loop-different-seam companion, as the stubbed loop specs are
  * for the boundary cases).
  *
  * Driver-side mutable state (`fits`) is safe: fits happen sequentially on
  * the driver, and each query constructs a fresh instance.
  */
/** Marker for classifiers whose `train` is TOTAL — well-defined on an
  * empty or one-class training set (a deterministic stub that ignores its
  * input). PU loop guards that protect a real estimator from a degenerate
  * refit must NOT fire for these: the stub twins define the loop's
  * semantics through the degenerate entry, and forcing an early return
  * would fork engine from oracle (caught on the adversarial fixture). */
trait DegenerateFitSafe

class ShiftingStubClassifier(override val uid: String, delta: Double)
  extends ProbabilisticClassifier[Vector, ShiftingStubClassifier, ShiftingStubModel]
  with DegenerateFitSafe {
  def this(delta: Double) = this(Identifiable.randomUID("shiftstub"), delta)
  private var fits = 0
  override def train(dataset: Dataset[_]): ShiftingStubModel = {
    val m = new ShiftingStubModel(uid, fits * delta)
    fits += 1
    m
  }
  // defaultCopy would reflectively look for a (String) constructor this
  // class doesn't have and crash (e.g. under Pipeline/fit(paramMap), which
  // copy the estimator). The copy starts its own fit counter — each oracle
  // query constructs a fresh instance anyway.
  override def copy(extra: ParamMap): ShiftingStubClassifier =
    copyValues(new ShiftingStubClassifier(uid, delta), extra)
}

class ShiftingStubModel(override val uid: String, val shift: Double)
  extends ProbabilisticClassificationModel[Vector, ShiftingStubModel] {
  override def numClasses: Int = 2
  // same operation order as the oracle's LEAST(1.0, GREATEST(0.0, f0 + s))
  private def p(features: Vector): Double =
    math.min(1.0, math.max(0.0, features(0) + shift))
  override def predictRaw(features: Vector): Vector =
    Vectors.dense(1.0 - p(features), p(features))
  override def raw2probabilityInPlace(raw: Vector): Vector = raw
  override def copy(extra: ParamMap): ShiftingStubModel =
    copyValues(new ShiftingStubModel(uid, shift), extra)
}
