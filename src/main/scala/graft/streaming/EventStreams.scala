package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface over the `events` table. The reference is
  * batch-only (SURVEY.md §2.3: no streaming of any kind); this module adds
  * the streaming shape a production event pipeline needs, with each
  * streaming computation paired with a batch twin so correctness is
  * oracle-checkable (the driver's DuckDB gate runs the batch twin; specs
  * assert stream == batch on the same input).
  *
  * Scale notes: windowed aggregation state is bounded by the watermark (2h
  * late tolerance → ~2-3 open windows per event_type); sessionization state
  * holds every not-yet-watermark-sealed interval per active user — bounded
  * by the watermark delay (an interval seals, emits, and drops as soon as
  * `end + gap < watermark`) — both shapes run indefinitely without
  * unbounded state growth.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)
  /** One gap-merged interval of events (micros). */
  case class Iv(startUs: Long, endUs: Long, n: Long)
  /** Per-user open-session state for flatMapGroupsWithState: EVERY interval
    * the watermark has not yet sealed, not just the latest. */
  case class OpenSessions(ivs: Seq[Iv])

  val SessionGapMicros: Long = 30L * 60 * 1000000L

  /** Full-precision epoch micros (Timestamp.getTime alone truncates to
    * milliseconds; the sub-ms part lives in getNanos). */
  def tsMicros(ts: java.sql.Timestamp): Long =
    ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L

  /** Tumbling 1-hour counts by event type. Same transform for batch and
    * streaming; streaming adds a 2-hour watermark (append-able state). */
  def hourlyCounts(events: DataFrame, streaming: Boolean = false): DataFrame = {
    val src = if (streaming) events.withWatermark("ts", "2 hours") else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("hour_start"), col("event_type"), col("n"))
  }

  /** Batch sessionization: 30-minute-gap sessions via lag + running sum —
    * two windows over (user_id; ts, event_id), shuffle once on user_id.
    * The DuckDB-oracle-checkable twin of [[sessionizeStream]]. */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > SessionGapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(w))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"))
  }

  /** Streaming sessionization. State per user is the FULL set of intervals
    * the watermark has not yet sealed; a session is emitted only once
    * `end + gap < watermark` — the one condition that makes extension or
    * backward bridging impossible for any event Spark will still accept
    * (every future row has ts ≥ watermark > end + gap).
    *
    * Being followed by another interval does NOT seal a session: a
    * still-in-watermark out-of-order event can land in the hole between two
    * intervals and bridge toward the earlier one — an earlier version
    * emitted `merged.init` eagerly and silently diverged from the batch
    * twin on exactly that arrival order. Out-of-order events across
    * micro-batches are handled by sort + gap-merge of (state ∪ new);
    * an event earlier than (interval start - gap) forms its own interval.
    */
  def sessionizeStream(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, newEvents: Iterator[Event], state: GroupState[OpenSessions]) =>
          val existing = state.getOption.map(_.ivs.toVector).getOrElse(Vector.empty)
          val incoming = newEvents
            .map(e => { val us = tsMicros(e.ts); Iv(us, us, 1L) }).toVector
          val merged = (existing ++ incoming)
            .sortBy(iv => (iv.startUs, iv.endUs))
            .foldLeft(Vector.empty[Iv]) { (acc, iv) =>
              acc.lastOption match {
                case Some(Iv(s0, e0, n0)) if iv.startUs - e0 <= SessionGapMicros =>
                  acc.init :+ Iv(s0, math.max(e0, iv.endUs), n0 + iv.n)
                case _ => acc :+ iv
              }
            }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition(_.endUs + SessionGapMicros < wmUs)
          if (open.nonEmpty) {
            state.update(OpenSessions(open))
            // fire when the watermark passes the EARLIEST unsealed end+gap
            // (one firing seals everything sealable at that point); must be
            // strictly beyond the current watermark or Spark rejects it
            state.setTimeoutTimestamp(math.max(
              open.map(_.endUs + SessionGapMicros).min / 1000L,
              state.getCurrentWatermarkMs() + 1L))
          } else state.remove()
          closed.iterator.map(iv => Session(userId, iv.startUs, iv.endUs, iv.n))
      }
  }

  /** Attribution lookback window: a purchase is attributed to the same
    * user's clicks in the preceding hour. */
  val AttributionWindowMicros: Long = 3600000000L

  /** Batch attribution: (purchase, click) pairs per user with the click in
    * `(purchase_ts - 1h, purchase_ts]`. Physically an equi-join on user_id
    * (one shuffle each side) with the range as a post-join predicate —
    * never a cross product. The DuckDB-oracle-checkable twin of
    * [[attributionStream]]. */
  def attributionBatch(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("p_us"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
        unix_micros(col("ts")).as("c_us"))
    purchases.join(clicks,
        col("user_id") === col("c_user_id") &&
          col("c_us") <= col("p_us") &&
          col("c_us") > col("p_us") - AttributionWindowMicros)
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("p_us"), col("c_us"))
  }

  /** Stream-stream self-join: purchases against clicks of the same source
    * stream. Both sides carry a 1-hour watermark and the join condition
    * bounds `c_ts` to a closed interval around `p_ts`, so Spark derives a
    * state-eviction horizon for BOTH sides — state is each side's last
    * ~2 hours, not the whole history. The time condition must stay on the
    * timestamp columns (that's what the state-cleanup analysis reads);
    * micros are derived only in the output projection. */
  def attributionStream(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
        col("user_id") === col("c_user_id") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") > col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
  }

  /** Streaming exact dedup: drop repeated event_ids, keeping state only
    * within the watermark horizon (bounded state — the streaming analogue
    * of the batch hash-groupBy exact dedup in [[graft.operators.Dedup]]). */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** File-source streaming read of an events parquet file with the same
    * ts normalization the batch loader applies (legacy nanos-as-long and
    * TIMESTAMP_NTZ generator flavors both → TimestampType; watermarks and
    * `unix_micros` require TIMESTAMP — see [[graft.Tables.load]]). The file
    * stream source requires a directory base path, so we stream the parent
    * directory with a glob filter on the file name. */
  def readEventStream(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val schema = spark.read.parquet(path).schema
    val dir = path.substring(0, path.lastIndexOf('/'))
    val fileName = path.substring(path.lastIndexOf('/') + 1)
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", fileName).parquet(dir)
    if (schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))) // integer div: see Tables.load
    else if (schema("ts").dataType == TimestampNTZType)
      raw.withColumn("ts", col("ts").cast(TimestampType))
    else raw
  }
}
