package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single most recent right row with
  * `rightTs <= leftTs` in the same key group. Spark has no such operator
  * (the brief's canonical example); the naive encodings are a range join
  * (candidate explosion: every right row in the window per left row, then
  * a per-left-row argmax) or a per-left-row correlated subquery.
  *
  * Composition used here: tag and UNION the two inputs, one window over
  * (key; ts, tag) carrying the latest right payload forward with
  * `last(_, ignoreNulls = true)` — left rows contribute NULL payloads, so
  * the forward fill sees only right rows. Cost: ONE shuffle on the key and
  * one sort of |L|+|R| rows, independent of match multiplicity — at 100 TB
  * this is the difference between a merge-scan and an exploded join. At
  * equal timestamps the right row sorts first (tag order), making the
  * match inclusive (`rightTs <= leftTs`), matching ASOF JOIN semantics.
  *
  * `right` must be unique per (key, rightTs) — dedup first (e.g. keep the
  * max-id row) or the carried payload is order-dependent.
  */
object AsOfJoin {

  /** @param keys      equi-join key columns (same names both sides)
    * @param leftTs    left event-time column name
    * @param rightTs   right event-time column name
    * @param payload   right columns to carry (become nullable on misses);
    *                  names must not collide with left's columns
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val clash = payload.filter(leftCols.contains)
    require(clash.isEmpty,
      s"payload columns collide with left columns: ${clash.mkString(", ")} — alias one side")
    val reserved = Seq("graft_ts", "graft_tag", "graft_payload")
    require(!(leftCols ++ right.columns).exists(reserved.contains),
      s"inputs must not contain reserved columns ${reserved.mkString(", ")}")

    // the payload travels as ONE struct, null on left rows, so the forward
    // fill picks the latest right ROW atomically — per-column fills would
    // mix fields of different right rows whenever the newest row carries a
    // NULL field (and would skip an all-NULL-payload row entirely)
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p).copy(name = p)))
    val tagged = left
      .withColumn("graft_ts", col(leftTs))
      .withColumn("graft_tag", lit(1))
      .select((keys ++ Seq("graft_ts", "graft_tag")).map(col) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(payloadType).as("graft_payload"): _*)
    val rightTagged = right
      .withColumn("graft_ts", col(rightTs))
      .withColumn("graft_tag", lit(0))
      .select((keys ++ Seq("graft_ts", "graft_tag")).map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("graft_payload"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("graft_ts"), col("graft_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = tagged.unionByName(rightTagged)
      .withColumn("graft_payload", last(col("graft_payload"), ignoreNulls = true).over(w))
    filled.filter(col("graft_tag") === 1)
      .select((keys ++ leftCols.filterNot(keys.contains)).map(col) ++
        payload.map(p => col(s"graft_payload.$p").as(p)): _*)
  }
}
