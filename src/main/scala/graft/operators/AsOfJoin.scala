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
    * @param payload   right columns to carry (become nullable on misses)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tagged = left
      .withColumn("graft_ts", col(leftTs))
      .withColumn("graft_tag", lit(1))
      .select((keys ++ Seq("graft_ts", "graft_tag")).map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val rightTagged = right
      .withColumn("graft_ts", col(rightTs))
      .withColumn("graft_tag", lit(0))
      .select((keys ++ Seq("graft_ts", "graft_tag")).map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("graft_ts"), col("graft_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = tagged.unionByName(rightTagged)
      .select(Seq(col("graft_tag")) ++ (keys ++ leftCols.filterNot(keys.contains)).map(col) ++
        payload.map(p => last(col(p), ignoreNulls = true).over(w).as(p)): _*)
    filled.filter(col("graft_tag") === 1).drop("graft_tag")
  }
}
