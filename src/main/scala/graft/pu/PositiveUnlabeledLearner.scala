package graft.pu

import org.apache.spark.sql.DataFrame

/** Positive-Unlabeled (PU) learning: train a binary classifier from only
  * positive and unlabeled examples.
  *
  * Re-expression of the reference API surface
  * (reference: src/main/scala/ru/ispras/pu4spark/PositiveUnlabeledLearner.scala:11-26)
  * on modern Spark. Differences from the reference, by design:
  *
  *  - default parameter values are corrected — the reference swaps them
  *    (labelColumnName defaults to "featuresCol" and vice versa at
  *    PositiveUnlabeledLearner.scala:23-24, a latent bug never exercised
  *    in-repo; SURVEY.md §1.3);
  *  - `finalLabel` holds P(positive) ∈ [0,1] per row, matching the reference
  *    *implementation* and README (reference README.md:78-80), not its
  *    scaladoc's "1 / -1" claim;
  *  - feature vectors are `org.apache.spark.ml.linalg.Vector` (the reference
  *    used legacy mllib vectors; its own README flags the migration,
  *    reference README.md:25-27).
  */
trait PositiveUnlabeledLearner {

  /** Applies PU learning, appending a column with P(positive) per row.
    *
    * @param df dataframe containing the label and features columns. Other
    *           columns pass through; the input label column is CONSUMED
    *           (replaced by internal ternary iteration labels `prevLabel`/
    *           `curLabel`, which remain on the output — reference behavior,
    *           TraditionalPULearner.scala:40,72-73)
    * @param labelColumnName column with 1 = positive, 0 = unlabeled
    * @param featuresColumnName column with the assembled
    *                           `ml.linalg.Vector` (e.g. VectorAssembler or
    *                           `ml.functions.array_to_vector` output)
    * @param finalLabel name of the appended column: P(positive) ∈ [0,1]
    */
  def weight(df: DataFrame,
             labelColumnName: String = "labelCol",
             featuresColumnName: String = "featuresCol",
             finalLabel: String = "finalLabel"): DataFrame
}

/** Serializable "query text" of the library: case-class configs build
  * learners (reference: PositiveUnlabeledLearner.scala:28-40).
  */
trait PositiveUnlabeledLearnerConfig {
  def build(): PositiveUnlabeledLearner
}

/** Registry for JSON (de)serialization via short type hints
  * (reference: PositiveUnlabeledLearner.scala:35-40).
  */
object PositiveUnlabeledLearnerConfig {
  val subclasses: List[Class[_]] =
    List(classOf[TraditionalPULearnerConfig], classOf[GradualReductionPULearnerConfig])
}
