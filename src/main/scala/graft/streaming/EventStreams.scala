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

  /** Funnel completion window: click and purchase must land within this
    * of the first view for the conversion to count. The bound is what
    * makes a STREAMING funnel possible at all — without it a
    * one-stage-deep user's funnel can never seal (a qualifying click may
    * arrive arbitrarily far in the future), so state would be unbounded
    * and emission undecidable. Batch `q_funnel` stays unwindowed (the
    * whole-history view a backfill computes); the windowed pair below is
    * the stream-vs-batch-pinned semantics. */
  val FunnelWindowMicros: Long = 2L * 3600000000L

  /** Funnel min-chain over user-grain filtered aggs: first view, first
    * click at-or-after it, first purchase at-or-after that — optionally
    * bounded to `window` micros past the first view (the semantics the
    * streaming funnel can seal on). ONE definition behind the driver's
    * `q_funnel` (window = None), `q_funnel_windowed`, and the
    * FunnelStreamSpec batch side, so the staircase rule cannot fork.
    * -1 sentinels for missing stages. */
  def funnelBatch(events: DataFrame, window: Option[Long]): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    def inWindow = window.map(w => col("us") <= col("t_view") + w)
      .getOrElse(lit(true))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("us") >= col("t_view") && inWindow)
      .groupBy(col("user_id")).agg(min(col("us")).as("t_click"))
    // the purchase stage needs t_view only when the window bound is on —
    // unwindowed, joining v back would add a wasted exchange
    val pIn = if (window.isDefined) c.join(v, "user_id") else c
    val p = e.filter(col("event_type") === "purchase")
      .join(pIn, "user_id")
      .filter(col("us") >= col("t_click") && inWindow)
      .groupBy(col("user_id")).agg(min(col("us")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1L) + when(col("t_click").isNotNull, 1L).otherwise(0L)
          + when(col("t_purchase").isNotNull, 1L).otherwise(0L))
          .as("stages_completed"),
        col("t_view"),
        coalesce(col("t_click"), lit(-1L)).as("t_click"),
        coalesce(col("t_purchase"), lit(-1L)).as("t_purchase"))
  }

  /** [[funnelBatch]] with the [[FunnelWindowMicros]] completion bound —
    * the streaming twin's exact batch semantics. */
  def funnelBatchWindowed(events: DataFrame): DataFrame =
    funnelBatch(events, Some(FunnelWindowMicros))

  case class FunnelResult(user_id: Long, stages_completed: Long,
                          t_view: Long, t_click: Long, t_purchase: Long)
  /** Per-user funnel state: min view time (Long.MaxValue = none yet,
    * Long.MinValue = sealed-and-emitted tombstone) and the pruned
    * candidate click/purchase times. The tombstone is what keeps the
    * stream equal to the whole-history batch twin: a user converts ONCE
    * (the batch min-chain anchors on the globally first view), so events
    * after the seal must not restart the funnel. Tombstones are NOT kept
    * forever: a second event-time timeout expires each one
    * [[FunnelTombstoneRetentionMicros]] after its seal point, so sealed
    * users cost state only for the retention period. `expiryUs` carries
    * that deadline INSIDE the tombstone: Spark clears a stored timeout on
    * every invocation that does not re-set it (straggler absorption would
    * otherwise silently disarm the retention clock — verified against
    * FlatMapGroupsWithStateExec), so the sealed branch must re-arm from
    * state it still holds.
    *
    * STATE-SCHEMA BREAK: adding `expiryUs` changed the
    * flatMapGroupsWithState state encoder schema — a streaming job
    * restored from a checkpoint written by the earlier 3-field
    * FunnelState will fail (or misread state) on upgrade, because
    * Spark's state store does not evolve case-class state schemas.
    * Upgrading deployments must restart from a fresh checkpoint (replay
    * the source); there is no in-place migration path. */
  case class FunnelState(tv: Long, clicks: Seq[Long], purchases: Seq[Long],
                         expiryUs: Long = 0L)

  /** How long a sealed user's tombstone outlives its seal point (event
    * time). Within the retention, post-seal events are absorbed (exact
    * whole-history batch parity); after it the tombstone is dropped and
    * later activity opens a FRESH funnel — "one result per user per
    * retention epoch", the standard production semantics that keeps
    * total state bounded by ACTIVE users instead of ever-seen users.
    * 30 days dwarfs every fixture/spec time range, so the parity suites
    * exercise the held-tombstone regime. */
  val FunnelTombstoneRetentionMicros: Long = 30L * 24 * 3600000000L

  /** Streaming windowed funnel. A user's funnel seals — emits exactly one
    * [[FunnelResult]] and drops its state — when the watermark passes
    * `t_view + FunnelWindowMicros`: from then on no acceptable event can
    * lower t_view (any future ts ≥ watermark > t_view) or land inside the
    * completion window. Out-of-order safety is by candidate buffering
    * with a proven prune: a buffered click/purchase can matter only if it
    * can still be ≥ the FINAL t_view, and t_view_final ≥ min(current tv,
    * watermark) — so anything below that bound drops. A user with no view
    * yet keeps only candidates ≥ watermark (a future view ≥ watermark can
    * only make later events eligible); if none remain, the state is
    * removed entirely. UNSEALED state is therefore bounded by the
    * watermark delay plus the funnel window; sealed users leave a
    * tombstone that a second event-time timeout removes
    * [[FunnelTombstoneRetentionMicros]] after the seal — total state is
    * O(users active within the retention window), indefinitely
    * runnable. */
  def funnelStream(events: Dataset[Event]): Dataset[FunnelResult] = {
    import events.sparkSession.implicits._
    val W = FunnelWindowMicros
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, newEvents: Iterator[Event], state: GroupState[FunnelState]) =>
          val prev0 = state.getOption.getOrElse(
            FunnelState(Long.MaxValue, Vector.empty, Vector.empty))
          // Sealed-state epoch gate: an event whose ts is PAST the
          // tombstone's retention deadline belongs to the NEXT epoch — it
          // opens a FRESH funnel immediately, replacing the tombstone.
          // Without the gate, a sustained straggler trickle keeps
          // re-arming the timeout to wm+1 once the watermark passes the
          // deadline, so the tombstone (and the "one result per retention
          // epoch" reset) never expires. In-epoch stragglers
          // (ts <= expiryUs — only deliverable while wm <= expiry, the
          // watermark filter drops rows older than wm) absorb as before.
          val (prev, events2) =
            if (prev0.tv == Long.MinValue) {
              val fresh = newEvents.filter(e => tsMicros(e.ts) > prev0.expiryUs)
              if (fresh.hasNext)
                (FunnelState(Long.MaxValue, Vector.empty, Vector.empty), fresh)
              else (prev0, Iterator.empty[Event])
            } else (prev0, newEvents)
          if (prev.tv == Long.MinValue) {
            // sealed, nothing from a later epoch: absorb and keep the
            // retention clock. RE-ARM on every absorption: GroupState
            // resets an unset timeout to NO_TIMESTAMP each time the
            // function runs, so a straggler that did not re-set it would
            // disarm the retention clock forever — the deadline rides in
            // the tombstone itself.
            if (state.hasTimedOut) state.remove()
            else state.setTimeoutTimestamp(math.max(
              prev.expiryUs / 1000L, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          } else {
          var tv = prev.tv
          var clicks = prev.clicks.toVector
          var purchases = prev.purchases.toVector
          events2.foreach { e =>
            val us = tsMicros(e.ts)
            e.event_type match {
              case "view"     => if (us < tv) tv = us
              case "click"    => clicks :+= us
              case "purchase" => purchases :+= us
              case _          =>
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // prune: below min(tv, wm) can never be inside the final window;
          // above tv + W (tv only decreases) can never re-enter it
          val lo = math.min(tv, wmUs)
          clicks = clicks.filter(c => c >= lo && (tv == Long.MaxValue || c <= tv + W))
          purchases = purchases.filter(p => p >= lo && (tv == Long.MaxValue || p <= tv + W))
          if (tv != Long.MaxValue && wmUs > tv + W) {
            // sealed: compute the min-chain, emit once, leave a tombstone
            // carrying its retention deadline (needed to RE-ARM the
            // timeout on straggler absorption — see the sealed branch)
            val expiryUs = tv + W + FunnelTombstoneRetentionMicros
            state.update(FunnelState(Long.MinValue, Vector.empty,
              Vector.empty, expiryUs))
            state.setTimeoutTimestamp(math.max(
              expiryUs / 1000L, state.getCurrentWatermarkMs() + 1L))
            val tc = clicks.filter(c => c >= tv && c <= tv + W)
              .minOption.getOrElse(-1L)
            val tp = if (tc < 0) -1L
              else purchases.filter(p => p >= tc && p <= tv + W)
                .minOption.getOrElse(-1L)
            val stages = 1L + (if (tc >= 0) 1L else 0L) + (if (tp >= 0) 1L else 0L)
            Iterator.single(FunnelResult(userId, stages, tv, tc, tp))
          } else if (tv == Long.MaxValue && clicks.isEmpty && purchases.isEmpty) {
            // no view and nothing a future view could still use
            state.remove()
            Iterator.empty
          } else {
            state.update(FunnelState(tv, clicks, purchases))
            // fire when the watermark passes the seal point (views pending)
            // or keep riding the watermark while only candidates are held
            val target = if (tv != Long.MaxValue) (tv + W) / 1000L + 1L
                         else state.getCurrentWatermarkMs() + 1L
            state.setTimeoutTimestamp(
              math.max(target, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
          }
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
