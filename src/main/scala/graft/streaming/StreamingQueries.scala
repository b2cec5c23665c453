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
         |ORDER BY purchase_id""".stripMargin
  )
}
