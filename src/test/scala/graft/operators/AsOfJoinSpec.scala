package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {

  test("asOf picks the most recent right row at-or-before each left row") {
    import spark.implicits._
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "lts", "lname")
    val right = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 15L, "c"), (3L, 1L, "x"))
      .toDF("k", "rts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts", Seq("v"))
      .select("k", "lts", "lname", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(got == Set(
      (1L, 10L, "p1", Some("b")), // inclusive: rts == lts matches
      (1L, 20L, "p2", Some("c")),
      (2L, 5L, "p3", None)))      // key with no right rows → null
  }

  test("asOf carries the latest right ROW atomically, even with null fields") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "lts")
    val right = Seq((1L, 1L, Some("c1"), Some("m1")), (1L, 2L, Some("c2"), None))
      .toDF("k", "rts", "click", "meta")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts", Seq("click", "meta"))
      .select("click", "meta").head
    // per-column fills would produce the frankenrow ("c2", "m1")
    assert(got.getString(0) == "c2" && got.isNullAt(1))
  }

  test("asOf rejects payload/left name collisions and reserved columns") {
    import spark.implicits._
    val l = Seq((1L, 1L, "x")).toDF("k", "lts", "v")
    val r = Seq((1L, 1L, "y")).toDF("k", "rts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, Seq("k"), "lts", "rts", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asOf == naive per-row argmax on random data; one shuffle, no explosion") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1L to 300L).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i))
      .toDF("k", "lts", "lid")
    val right = (1L to 200L).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i))
      .toDF("k", "rts", "rid")
      .groupBy("k", "rts").agg(max("rid").as("rid")) // unique per (k, ts)
    val got = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts", Seq("rid"))
      .select("lid", "rid")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val rights = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = left.collect().map { l =>
      val (k, lts, lid) = (l.getLong(0), l.getLong(1), l.getLong(2))
      val m = rights.filter(r => r._1 == k && r._2 <= lts)
      lid -> (if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
    }.toMap
    assert(got == want)
    // plan shape: one shuffle for the window (plus the input unions), and
    // exactly one Window — no join node at all
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }
}
