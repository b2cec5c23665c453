package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.streaming.EventStreams

class RangeJoinSpec extends SparkSuite {

  private def parts = {
    val ev = Tables.events(spark, sf0001)
    val sessions = EventStreams.sessionizeBatch(ev)
      .select(col("user_id"), col("session_seq"), col("start_us"), col("end_us"))
    val points = ev.select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    (points, sessions)
  }

  test("bucketed point-in-interval join == the naive theta-join, at several bucket widths") {
    val (points, sessions) = parts
    val want = points.join(sessions, Seq("user_id"))
      .filter(col("us") >= col("start_us") && col("us") <= col("end_us"))
      .select("event_id", "session_seq")
    for (width <- Seq(1000L, 60L * 1000000L, 3600L * 1000000L, 1L << 60)) {
      val got = RangeJoin.pointInInterval(points, sessions, Seq("user_id"),
        "us", "start_us", "end_us", width)
        .select("event_id", "session_seq")
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"width=$width")
    }
  }

  test("every event lands in exactly one of its user's sessions (no dup pairs)") {
    val (points, sessions) = parts
    val got = RangeJoin.pointInInterval(points, sessions, Seq("user_id"),
      "us", "start_us", "end_us", 3600000000L)
    assert(got.count() == points.count())
    assert(got.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }
}
