package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join: the exact-result skew mitigation for LARGE×LARGE joins
  * on a hot key. A plain shuffle join sends every row of a join key to ONE
  * reducer — a key holding 1% of 100 TB makes a 1 TB straggler task. A
  * broadcast join is the fix when one side is small; when both sides are
  * large, salting splits each hot key's rows across `s` sub-partitions:
  *
  *   - the probe (skewed) side gets `salt = saltExpr % s` appended to its
  *     join key, where `saltExpr` is any DETERMINISTIC per-row expression
  *     (a secondary column, a row hash — determinism matters: salting by
  *     `rand()`/partition-id changes row→salt assignment under task retry
  *     or AQE re-planning, which breaks exactly-once outputs downstream);
  *   - the build side is replicated `s`-fold (explode over 0..s-1), so
  *     every (key, salt) bucket finds its build rows.
  *
  * Join on (key, salt) then drop the salt: the result is row-identical to
  * the unsalted join — pinned by the oracle twin and the equality spec.
  *
  * [[join]] replicates the WHOLE build side `s`-fold — simple, but an s×
  * blowup of the build at scale. [[joinSkewAware]] is the production
  * refinement: a skew-stats pass finds the keys that actually need
  * splitting, only THOSE replicate (and only their probe rows salt; the
  * long tail keeps salt = 0), bounding the blowup to hotKeys × s rows.
  * Spark's AQE skew-join does this adaptively for sort-merge joins; the
  * explicit form works for any join strategy and any engine.
  *
  * The reference contains no joins at all (SURVEY.md §2.3) — this is
  * north-star surface.
  */
object SaltedJoin {

  /** Inner equi-join of `probe` and `build` on `key`, salted `s` ways by
    * `saltExpr` (must be deterministic per probe row). */
  def join(probe: DataFrame, build: DataFrame, key: String, saltExpr: Column,
           s: Int): DataFrame = {
    require(s >= 1, s"salt fan-out must be >= 1, got $s")
    // coalesce: a NULL salt expression must still land in SOME bucket —
    // pmod(NULL) is NULL, which never equi-joins, and the row would be
    // silently DROPPED relative to the plain join
    val salted = probe.withColumn("graft_salt",
      coalesce(pmod(saltExpr, lit(s)), lit(0)).cast("int"))
    val replicated = build
      .withColumn("graft_salt", explode(sequence(lit(0), lit(s - 1))))
    salted.join(replicated, Seq(key, "graft_salt")).drop("graft_salt")
  }

  /** [[join]], but only keys whose probe-side row count exceeds
    * `hotThreshold` are salted/replicated; tail keys join at salt 0 with
    * exactly one build copy. The skew-stats aggregate is over probe KEYS
    * (map-side combined: shuffle size is the distinct-key count, not the
    * row count), and the hot-key set — small by construction, a key is hot
    * because there are few like it — broadcasts into both sides as a
    * semi-join marker. Result is row-identical to the plain join for every
    * (s, hotThreshold): pinned by the equality/property specs and the
    * oracle twin. At 100 TB the exact count can be replaced by a sample or
    * a CMS sketch ([[CountMinAgg]]); exact keeps the demo deterministic.
    */
  def joinSkewAware(probe: DataFrame, build: DataFrame, key: String,
                    saltExpr: Column, s: Int, hotThreshold: Long): DataFrame = {
    require(hotThreshold >= 1, s"hot threshold must be >= 1, got $hotThreshold")
    joinWithHot(probe, build, key, saltExpr, s,
      skewStats(probe, key, hotThreshold))
  }

  /** The shared salted-probe + replicated-build body: salt rule and both
    * joins live HERE only, so the exact and sampled stats variants cannot
    * diverge. */
  private def joinWithHot(probe: DataFrame, build: DataFrame, key: String,
                          saltExpr: Column, s: Int, hot: DataFrame): DataFrame = {
    require(s >= 1, s"salt fan-out must be >= 1, got $s")
    val salted = probe.join(broadcast(hot), Seq(key), "left")
      .withColumn("graft_salt",
        when(col("graft_hot").isNotNull,
          coalesce(pmod(saltExpr, lit(s)), lit(0)).cast("int"))
          .otherwise(lit(0)))
      .drop("graft_hot")
    salted.join(replicateHot(build, hot, key, s), Seq(key, "graft_salt"))
      .drop("graft_salt")
  }

  /** [[joinSkewAware]] with the skew-stats pass over a seeded Bernoulli
    * SAMPLE of the probe (threshold scaled by the fraction): at 100 TB the
    * exact key count is itself a full pass, and the hot-key set only needs
    * to be roughly right — the RESULT is row-identical to the plain join
    * for ANY hot set (a missed hot key costs a straggler, a false positive
    * costs replication; neither costs correctness, which the equality spec
    * pins across fractions). Seeded → deterministic per Spark version. */
  def joinSkewAwareSampled(probe: DataFrame, build: DataFrame, key: String,
                           saltExpr: Column, s: Int, hotThreshold: Long,
                           fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"bad sample fraction $fraction")
    val scaled = math.max(1L, math.round(hotThreshold * fraction))
    joinWithHot(probe, build, key, saltExpr, s,
      skewStats(probe.sample(withReplacement = false, fraction, seed), key, scaled))
  }

  /** The keys of `probe` with more than `hotThreshold` rows, marked
    * `graft_hot` — the skew-stats pass of [[joinSkewAware]]. */
  def skewStats(probe: DataFrame, key: String, hotThreshold: Long): DataFrame =
    probe.groupBy(col(key)).agg(count(lit(1)).as("graft_cnt"))
      .filter(col("graft_cnt") > hotThreshold)
      .select(col(key), lit(true).as("graft_hot"))

  /** Build side with hot keys replicated s-fold and tail keys kept single
    * at salt 0 — exactly tail + hotBuildRows × s output rows (the bound the
    * property spec pins). */
  private[operators] def replicateHot(build: DataFrame, hot: DataFrame,
                                      key: String, s: Int): DataFrame =
    build.join(broadcast(hot), Seq(key), "left")
      .withColumn("graft_salt", explode(
        when(col("graft_hot").isNotNull, sequence(lit(0), lit(s - 1)))
          .otherwise(array(lit(0)))))
      .drop("graft_hot")
}
