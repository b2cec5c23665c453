package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Driver-facing batch twins of the streaming computations. The streaming
  * execution itself (file-source read, watermark, flatMapGroupsWithState)
  * is asserted equal to these twins in StreamingSpec; the twins carry the
  * DuckDB oracle. `q_events_hourly` (RelationalQueries) is the hourly
  * window's twin; `q_sessions` is the sessionizer's.
  */
object StreamingQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sessions" -> ((s, dir) => {
      EventStreams.sessionizeBatch(Tables.events(s, dir))
        .select(col("user_id"), col("session_seq").cast(LongType).as("session_seq"),
          col("start_us"), col("end_us"), col("n_events"))
        .orderBy("user_id", "session_seq")
    }),
    "q_attribution" -> ((s, dir) => {
      EventStreams.attributionBatch(Tables.events(s, dir))
        .orderBy("purchase_id", "click_id")
    }),
    // range (containment) join: each error event matched to the session
    // interval it falls inside — the bucketed equi-decomposition
    // (RangeJoin.pointInInterval) instead of a theta-join; 1-hour buckets
    // fit the 30-min session gap.
    "q_interval_sessions" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sessions = EventStreams.sessionizeBatch(ev)
        .select(col("user_id"), col("session_seq").cast(LongType).as("session_seq"),
          col("start_us"), col("end_us"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      graft.operators.RangeJoin.pointInInterval(errors, sessions,
          Seq("user_id"), "us", "start_us", "end_us", 3600000000L)
        .select(col("event_id"), col("user_id"), col("session_seq"))
        .orderBy("event_id")
    }),
    // as-of join: each purchase matched to the user's single most recent
    // click at-or-before it (vs q_attribution's ALL clicks in a window) —
    // tagged-union + forward-fill composition, one shuffle, no candidate
    // explosion; oracle is DuckDB's native ASOF LEFT JOIN
    "q_asof_click" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("c_us"))
        // unique per (key, ts): the as-of contract
        .groupBy(col("user_id"), col("c_us")).agg(max(col("click_id")).as("click_id"))
      graft.operators.AsOfJoin.asOf(purchases, clicks, Seq("user_id"),
          "p_us", "c_us", Seq("click_id", "c_us"))
        .orderBy("purchase_id")
    }),
    // Ordered event FUNNEL: per user, the first view, the first click
    // at-or-after that view, and the first purchase at-or-after that
    // click — the conversion staircase every event-analytics engine
    // ships. Expressed as a min-chain of filtered user-grain aggs (view
    // min → click min gated on it → purchase min gated on that): every
    // stage shuffles only on user_id (co-partitioned end to end under
    // AQE), each later stage's input is funnel-survivor-proportional,
    // and there is no per-user window or event-list collection — an
    // unbounded user history never materializes anywhere. -1 sentinels
    // instead of NULLs keep the stage columns hash-portable.
    "q_funnel" -> ((s, dir) => {
      EventStreams.funnelBatch(Tables.events(s, dir), None)
        .orderBy("user_id")
    }),
    // COHORT RETENTION — the week-over-week activity matrix: users
    // grouped by first-active week (their cohort), each later week's
    // surviving actives counted at the (cohort, offset) grain. No
    // count-distinct Expand anywhere: activity dedups to (user, week)
    // grain in one agg, cohorts are a second user-grain agg on the SAME
    // key (co-partitioned join, no extra exchange under AQE), and the
    // final matrix is a tiny rollup. Offset 0 carries the cohort size.
    "q_retention_cohorts" -> ((s, dir) => {
      val weeks = Tables.events(s, dir)
        .select(col("user_id"),
          call_function("div", unix_micros(col("ts")), lit(604800000000L))
            .as("week"))
        .groupBy(col("user_id"), col("week")).agg(count(lit(1)).as("_n"))
        .select(col("user_id"), col("week"))
      val cohorts = weeks.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      weeks.join(cohorts, "user_id")
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // RESAMPLE + FORWARD-FILL — the time-series regularization every
    // metrics/feature pipeline needs: each user's irregular event stream
    // sampled onto a daily grid spanning the user's own activity window,
    // each grid point carrying the user's most recent observation
    // at-or-before it. Grid bounds are per-user aggregates (one shuffle);
    // the fill is the as-of composition (tag + union + one forward-fill
    // window) — ONE more shuffle on user_id and a merge-scan sort,
    // independent of how many events each grid point skips over. Grid
    // days are integer epoch-day arithmetic so the twin is exact; the
    // observation at a duplicate (user, ts) is the max-event_id row (the
    // as-of uniqueness contract).
    "q_resample_ffill" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("e_us"), col("value"))
      val obs = ev.groupBy(col("user_id"), col("e_us"))
        .agg(max_by(col("value"), col("event_id")).as("obs_value"))
      val grid = ev.groupBy(col("user_id"))
        .agg(call_function("div", min(col("e_us")), lit(86400000000L)).as("d0"),
          call_function("div", max(col("e_us")), lit(86400000000L)).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
        .withColumn("grid_us", (col("day") + 1) * 86400000000L - 1)
      graft.operators.AsOfJoin.asOf(grid, obs, Seq("user_id"),
          "grid_us", "e_us", Seq("obs_value", "e_us"))
        .select(col("user_id"), col("day"), col("obs_value"),
          coalesce(col("e_us"), lit(-1L)).as("obs_us"))
        .orderBy("user_id", "day")
    }),

    // The WINDOWED funnel (stages must complete within
    // EventStreams.FunnelWindowMicros of the first view) — the semantics
    // the streaming funnel can actually seal on (FunnelStreamSpec pins
    // funnelStream == this twin); same min-chain shape as q_funnel.
    "q_funnel_windowed" -> ((s, dir) => {
      EventStreams.funnelBatchWindowed(Tables.events(s, dir))
        .orderBy("user_id")
    })
  )

  /** The session-reconstruction CTE chain (shared by q_sessions and the
    * range-join twin). */
  private val sessionCtes =
    s"""e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
       |l AS (SELECT user_id, event_id, us,
       |  lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us FROM e),
       |n AS (SELECT user_id, event_id, us,
       |  CASE WHEN prev_us IS NULL OR us - prev_us > ${EventStreams.SessionGapMicros} THEN 1 ELSE 0 END AS is_new FROM l),
       |s AS (SELECT user_id, us,
       |  SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id) AS seq FROM n)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_sessions" ->
      s"""WITH $sessionCtes
         |SELECT user_id, CAST(seq AS BIGINT) AS session_seq,
         |  MIN(us) AS start_us, MAX(us) AS end_us, COUNT(*) AS n_events
         |FROM s GROUP BY user_id, seq
         |ORDER BY user_id, session_seq""".stripMargin,
    "q_interval_sessions" ->
      s"""WITH $sessionCtes,
         |sess AS (SELECT user_id, CAST(seq AS BIGINT) AS session_seq,
         |  MIN(us) AS start_us, MAX(us) AS end_us FROM s GROUP BY user_id, seq),
         |err AS (SELECT event_id, user_id, epoch_us(ts) AS us
         |  FROM events WHERE event_type = 'error')
         |SELECT err.event_id, err.user_id, sess.session_seq
         |FROM err JOIN sess ON err.user_id = sess.user_id
         |  AND err.us BETWEEN sess.start_us AND sess.end_us
         |ORDER BY event_id""".stripMargin,
    "q_attribution" ->
      s"""WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
         |           FROM events WHERE event_type = 'purchase'),
         |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
         |      FROM events WHERE event_type = 'click')
         |SELECT p.purchase_id, c.click_id, p.user_id, p.p_us, c.c_us
         |FROM p JOIN c ON p.user_id = c.user_id
         | AND c.c_us <= p.p_us
         | AND c.c_us > p.p_us - ${EventStreams.AttributionWindowMicros}
         |ORDER BY purchase_id, click_id""".stripMargin,
    "q_asof_click" ->
      s"""WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
         |           FROM events WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, epoch_us(ts) AS c_us, MAX(event_id) AS click_id
         |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         |SELECT p.user_id, p.purchase_id, p.p_us, c.click_id, c.c_us
         |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.c_us <= p.p_us
         |ORDER BY purchase_id""".stripMargin,
    "q_funnel" -> funnelSql(window = None),
    "q_retention_cohorts" ->
      s"""WITH w AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
         |  FROM events),
         |c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id)
         |SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
         |  count(*) AS n_users
         |FROM w JOIN c USING (user_id)
         |GROUP BY c.cohort_week, week_offset
         |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_resample_ffill" ->
      s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS e_us, value FROM events),
         |obs AS (SELECT user_id, e_us, arg_max(value, event_id) AS obs_value
         |  FROM ev GROUP BY user_id, e_us),
         |b AS (SELECT user_id, min(e_us) // 86400000000 AS d0,
         |  max(e_us) // 86400000000 AS d1 FROM ev GROUP BY user_id),
         |grid AS (SELECT user_id, CAST(u AS BIGINT) AS day,
         |  (CAST(u AS BIGINT) + 1) * 86400000000 - 1 AS grid_us
         |  FROM (SELECT user_id, unnest(range(d0, d1 + 1)) AS u FROM b))
         |SELECT grid.user_id, grid.day, obs.obs_value,
         |  COALESCE(obs.e_us, -1) AS obs_us
         |FROM grid ASOF LEFT JOIN obs
         |  ON grid.user_id = obs.user_id AND obs.e_us <= grid.grid_us
         |ORDER BY grid.user_id, day""".stripMargin,
    "q_funnel_windowed" ->
      funnelSql(window = Some(EventStreams.FunnelWindowMicros))
  )

  /** Twin of [[EventStreams.funnelBatch]], parameterized on the same
    * optional completion window — shared by both funnel oracles so the
    * staircase rule cannot fork in SQL either. */
  private def funnelSql(window: Option[Long]): String = {
    val w = window.map(w => s" AND us <= t_view + $w").getOrElse("")
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
       |v AS (SELECT user_id, min(us) AS t_view FROM e
       |  WHERE event_type = 'view' GROUP BY user_id),
       |c AS (SELECT e.user_id, min(us) AS t_click
       |  FROM e JOIN v USING (user_id)
       |  WHERE event_type = 'click' AND us >= t_view$w GROUP BY e.user_id),
       |p AS (SELECT e.user_id, min(us) AS t_purchase
       |  FROM e JOIN c USING (user_id) JOIN v USING (user_id)
       |  WHERE event_type = 'purchase' AND us >= t_click$w GROUP BY e.user_id)
       |SELECT v.user_id,
       |  CAST(1 + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
       |    + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stages_completed,
       |  v.t_view,
       |  COALESCE(c.t_click, -1) AS t_click,
       |  COALESCE(p.t_purchase, -1) AS t_purchase
       |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
       |ORDER BY user_id""".stripMargin
  }
}
