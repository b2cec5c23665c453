package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE/upsert apply — the CDC step of a continuously-refreshed corpus:
  * apply a change batch (upserts + deletes) to a base snapshot keyed by
  * `key`. Precedence: delete wins over a same-key upsert.
  *
  * Plan shape: ONE shuffle join on the key (full-outer against the upsert
  * set, anti against the delete set — the delete set is usually tiny and
  * broadcasts). At 100 TB the whole change batch is typically small
  * relative to the snapshot and Spark broadcasts both joins; the
  * full-outer formulation stays correct when it is not.
  *
  * Output columns: `key`, every payload column coalesced
  * (upsert-then-base), and `graft_rev`: 0 = unchanged base row,
  * 1 = updated, 2 = inserted (key absent from base). Presence is tracked
  * with explicit marker columns, NOT payload nullness — a legitimately
  * NULL payload value must not reclassify the row.
  *
  * Contract (caller's responsibility, mirrored in UpsertSpec):
  *  - '''set-to-NULL is unsupported''': payload values merge with
  *    `coalesce(new, old)`, so an upsert carrying NULL in a column keeps
  *    the base value (the row still classifies `graft_rev = 1`). SQL MERGE
  *    `UPDATE SET c = NULL` semantics would need per-column presence
  *    markers; a pipeline that needs them models deletion-of-a-value as a
  *    sentinel or a delete+insert.
  *  - '''upsert keys must be unique''': a duplicate key in the change batch
  *    fans out the full-outer join into duplicate output rows. Compact the
  *    batch to latest-per-key first (e.g. the TopKAgg(1) shape over a
  *    change sequence number) — this operator applies, it does not compact.
  *
  * The reference has no joins at all (SURVEY.md §2.3) — north-star surface.
  */
object Upsert {

  def apply(base: DataFrame, upserts: DataFrame, deletes: DataFrame,
            key: String): DataFrame = {
    val payload = base.columns.filter(_ != key)
    require(upserts.columns.toSet == base.columns.toSet,
      s"upserts must carry the base schema; got ${upserts.columns.mkString(",")}")
    val b = base.withColumn("graft_in_base", lit(true))
    val u = payload.foldLeft(upserts) { (df, c) =>
      df.withColumnRenamed(c, s"graft_new_$c")
    }.withColumn("graft_in_new", lit(true))
    b.join(u, Seq(key), "full_outer")
      .join(deletes.select(col(key)), Seq(key), "left_anti")
      .select(
        col(key) +:
          payload.map(c => coalesce(col(s"graft_new_$c"), col(c)).as(c)) :+
          when(col("graft_in_base").isNull, lit(2L))
            .when(col("graft_in_new").isNull, lit(0L))
            .otherwise(lit(1L)).as("graft_rev"): _*)
  }

  /** CDC compaction — the pick-latest step [[apply]]'s contract requires
    * before a change batch with repeated keys can be applied: one row per
    * key, the one with the greatest `seqCols` (lexicographic; make the
    * tuple unique per key — a change sequence number or (ts, change_id)).
    *
    * Shape: `max(struct(seq..., payload...))` per key — an ordinary
    * map-side-combinable aggregate, so each input partition contributes one
    * candidate row per key to the shuffle. The window formulation
    * (`row_number over partitionBy(key) orderBy(seq desc)`) routes EVERY
    * change of a key through one task — a hot key (a row updated millions
    * of times a day is exactly the CDC hot case) makes that a straggler by
    * construction. Struct comparison is field-order lexicographic, so ties
    * on the sequence fall to the payload — unique `seqCols` make that
    * unreachable, and the driver query's (ts, event_id) is unique.
    */
  def compactLatest(changes: DataFrame, key: String, seqCols: Seq[String]): DataFrame = {
    val payload = changes.columns.filter(c => c != key && !seqCols.contains(c))
    val ordered = seqCols ++ payload
    changes.groupBy(col(key))
      .agg(max(struct(ordered.map(col): _*)).as("graft_latest"))
      .select(col(key) +: ordered.map(c => col(s"graft_latest.$c").as(c)): _*)
  }
}
