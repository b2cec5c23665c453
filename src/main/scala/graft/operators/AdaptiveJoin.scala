package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The probe-adaptive small-side join used everywhere a join's build side
  * is *duplicate-proportional* (ownership tables, boilerplate sets, near-dup
  * cluster maps): tiny on a clean corpus, but unbounded in the adversarial
  * direction — a duplicate- or boilerplate-heavy corpus can push it past any
  * broadcast budget, and a forced `broadcast()` hint would then OOM the
  * driver at exactly the scale that needs the degrade (the ADVICE-r11
  * mismatch class: a comment promising a degrade the hint makes impossible).
  *
  * A limit-bounded size probe (`limit(max+1).count()` — never materializes
  * more than max+1 rows, and only on executors) picks the arm: broadcast
  * while the build side holds at most `maxRows` rows, shuffle-hash join on
  * the keys beyond. Row-identical by construction — the join type and
  * predicate are the same either way, only the physical strategy moves —
  * so the degrade can never change results; each call site's spec pins
  * both arms (ParagraphHygieneSpec, SubstringDedupSpec, DedupSpec).
  *
  * `small` MUST be persisted (registry-tracked) by the caller: the probe
  * and the join both consume it, and for the duplicate-proportional frames
  * here the lineage above it (LSH→CC, shingle-grain aggs) is the expensive
  * part. The cache is partition-spillable, never driver-resident.
  */
private[graft] object AdaptiveJoin {

  /** One sanity ceiling for every call site: ~16-byte key pairs → ~160 MB
    * at 10M rows, the order of a sane broadcast (see
    * [[TrainingDataQueries.SpanOwnersExactMax]], which aliases this). */
  val DefaultMaxBroadcastRows: Long = 10L * 1000 * 1000

  def apply(big: DataFrame, small: DataFrame, keys: Seq[String],
      joinType: String, maxRows: Long): DataFrame = {
    // the probe is Int-limited; a budget at/above Int.MaxValue could never
    // be exceeded by it and would silently disable the degrade
    require(maxRows < Int.MaxValue,
      s"broadcast budget $maxRows would defeat the size probe")
    val fits = small.limit(maxRows.toInt + 1).count() <= maxRows
    if (fits) big.join(broadcast(small), keys, joinType)
    else big.join(small.hint("shuffle_hash"), keys, joinType)
  }
}
