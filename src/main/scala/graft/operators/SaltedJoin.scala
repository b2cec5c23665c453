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
  * Production refinement (documented, not needed for result-correctness):
  * replicate ONLY the hot keys (skew-stats driven) and leave salt = 0 for
  * the long tail, bounding the build-side blowup to hotKeys × s rows.
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
}
