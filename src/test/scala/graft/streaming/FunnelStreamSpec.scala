package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import EventStreams.{Event, FunnelResult}

/** Streaming windowed funnel == batch twin, including out-of-order
  * arrival within the watermark tolerance. */
class FunnelStreamSpec extends SparkSuite {

  private val sfDir = sf0001

  private def batchWindowed: Seq[FunnelResult] = {
    import spark.implicits._
    EventStreams.funnelBatchWindowed(Tables.events(spark, sfDir))
      .as[FunnelResult].collect().sortBy(_.user_id).toSeq
  }

  private def runStream(chunks: Seq[Seq[Event]]): Seq[FunnelResult] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Event]
    val q = EventStreams.funnelStream(source.toDS())
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    chunks.foreach { c => source.addData(c); q.processAllAvailable() }
    val maxTs = chunks.flatten.map(_.ts.getTime).max
    // push the watermark past every seal point (t_view + window)
    source.addData(Event(Long.MaxValue,
      new java.sql.Timestamp(maxTs + 86400000L), -1L, "flush", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_stream").as[FunnelResult].collect()
      .filter(_.user_id != -1L).sortBy(_.user_id).toSeq
    spark.sql("DROP VIEW IF EXISTS funnel_stream")
    got
  }

  private def fixtureEvents: Seq[Event] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event].collect().toSeq
  }

  test("streaming funnel == windowed batch twin (single-batch replay)") {
    val got = runStream(Seq(fixtureEvents))
    val want = batchWindowed
    assert(want.nonEmpty)
    assert(got == want)
    // the fixture must exercise depth: some user converts past stage 1
    assert(want.exists(_.stages_completed >= 2))
  }

  test("streaming funnel == batch under out-of-order multi-batch replay") {
    // time-ordered chunks (so the watermark never drops an event), each
    // chunk internally scrambled by a deterministic hash — out-of-order
    // WITHIN the watermark tolerance
    val sorted = fixtureEvents.sortBy(e => (e.ts.getTime, e.event_id))
    val chunks = sorted.grouped(math.max(1, sorted.size / 5))
      .map(_.sortBy(e => e.event_id * 2654435761L % 1000003)).toSeq
    assert(runStream(chunks) == batchWindowed)
  }

  test("tombstones absorb in-retention stragglers, expire after retention, then a fresh funnel opens") {
    def ev(id: Long, us: Long, user: Long, typ: String) =
      Event(id, new java.sql.Timestamp(us / 1000L), user, typ, 0.0)
    val W = EventStreams.FunnelWindowMicros
    val R = EventStreams.FunnelTombstoneRetentionMicros
    val base = 1700000000000000L // any µs epoch
    val H = 3600000000L // 1h in µs (the watermark delay is 30 min)
    val got = runStream(Seq(
      // funnel 1: view + click
      Seq(ev(1, base, 7L, "view"), ev(2, base + W / 2, 7L, "click")),
      // foreign no-op pushes the watermark past tv+W at THIS batch's end
      // — the seal timeout fires, user 7 emits and leaves a TOMBSTONE
      // (the watermark the state function sees lags one batch, so every
      // phase below gets its own chunk)
      Seq(ev(90, base + W + H, -1L, "flush")),
      // straggler delivered to the LIVE tombstone (user 7 is sealed now,
      // watermark ≈ base+W+30min): must be absorbed — and must NOT
      // disarm the retention timeout (GroupState clears a timeout the
      // function doesn't re-set; this chunk is the regression trap for
      // exactly that bug)
      Seq(ev(3, base + W + R / 2, 7L, "view")),
      // watermark past seal+retention: the re-armed timeout fires and
      // the tombstone drops
      Seq(ev(91, base + W + R + W + H, -1L, "flush")),
      // tombstone gone: THIS view opens a fresh funnel (sealed by
      // runStream's final flush event)
      Seq(ev(4, base + W + R + W + H, 7L, "view"))))
    val mine = got.filter(_.user_id == 7L)
    assert(mine.map(_.t_view) == Seq(base, base + W + R + W + H),
      s"expected the sealed funnel and ONE post-retention restart, got $mine")
    // the in-retention straggler produced no second result
    assert(!mine.exists(_.t_view == base + W + R / 2), s"straggler restarted: $mine")
  }

  test("a post-epoch event reaching a LIVE tombstone opens a fresh funnel (no trickle immortality)") {
    def ev(id: Long, us: Long, user: Long, typ: String) =
      Event(id, new java.sql.Timestamp(us / 1000L), user, typ, 0.0)
    val W = EventStreams.FunnelWindowMicros
    val R = EventStreams.FunnelTombstoneRetentionMicros
    val base = 1700000000000000L
    val H = 3600000000L
    val got = runStream(Seq(
      // funnel 1: view, then seal it (watermark past tv+W)
      Seq(ev(1, base, 7L, "view")),
      Seq(ev(90, base + W + H, -1L, "flush")),
      // the tombstone is ALIVE (watermark ≈ base+W+30min, far below the
      // retention deadline) but this event's TS is past expiryUs — it
      // belongs to the next epoch. Pre-fix behavior absorbed it and
      // re-armed the timeout, losing the view; under a sustained trickle
      // of such events the tombstone re-armed to wm+1 forever and the
      // documented per-epoch reset never happened. The epoch gate must
      // open a fresh funnel instead (sealed by runStream's final flush).
      Seq(ev(5, base + W + R + 1000000L, 7L, "view"))))
    val mine = got.filter(_.user_id == 7L)
    assert(mine.map(_.t_view) == Seq(base, base + W + R + 1000000L),
      s"expected the sealed funnel and the post-epoch restart, got $mine")
  }
}
