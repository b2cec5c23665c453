package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Pins the Bench stdout-window contract (the r14 directive-7 headroom
  * item): the degradation ladder must keep a >=220-query surface inside
  * the driver's window UNTRIMMED — the 202-query r14 line sat at
  * 1835/1850 chars, so the next few queries would have started dropping
  * entries without the new ladder steps. Pure string checks, no Spark.
  */
class BenchStdoutSpec extends AnyFunSuite {

  /** The real registered names plus synthetic same-shaped extras up to
    * `total`, with a realistic value spread (0.3–7.3 s, like BENCH_r14). */
  private def surface(total: Int): Seq[(String, Double)] = {
    val real = SparkEntry.queries.keys.toSeq.sorted
    val extra = (real.length until total).map { i =>
      val p = BenchStdout.prefixes(i % BenchStdout.prefixes.length)._1
      s"${p}synthetic_future_query_$i"
    }
    (real ++ extra).zipWithIndex.map { case (n, i) =>
      n -> (0.3 + (i % 70) * 0.1)
    }
  }

  /** Number of per-query entries the rendered line carries, across both
    * the object modes ("queries") and the array mode ("qv"). */
  private def entryCount(line: String): Int =
    JsonMethods.parse(line) \ "queries" match {
      case JObject(fields) => fields.length
      case _ => (JsonMethods.parse(line) \ "qv": @unchecked) match {
        case JArray(vs) => vs.length
      }
    }

  test("current registered surface fits untrimmed") {
    val qs = surface(SparkEntry.queries.size)
    val line = BenchStdout.render(qs, qs.map(_._2).sum, qs.map(_._2).sum * 1.2,
      "/root/testdata/sf0.1")
    assert(line.length <= 1850, s"len=${line.length}")
    assert(!line.contains("\"trimmed\""), line.takeRight(120))
    assert(entryCount(line) == qs.size, "every query present")
  }

  test("a simulated 230-query surface fits untrimmed") {
    val qs = surface(230)
    val line = BenchStdout.render(qs, qs.map(_._2).sum, qs.map(_._2).sum * 1.2,
      "/root/testdata/sf0.1")
    assert(line.length <= 1850, s"len=${line.length}")
    assert(!line.contains("\"trimmed\""), line.takeRight(120))
    assert(entryCount(line) == 230, "every query present")
    assert(line.contains("\"qunit\":\"decisec\""),
      "expected a decisecond ladder step at 230 queries: " + line.take(200))
  }

  test("array mode holds a 400-query surface untrimmed, with failures visible") {
    val qs = surface(400).zipWithIndex.map { case ((n, v), i) =>
      n -> (if (i == 7) -1.0 else v)
    }
    val line = BenchStdout.render(qs, qs.filter(_._2 > 0).map(_._2).sum, 0.0,
      "/root/testdata/sf0.1")
    assert(line.length <= 1850, s"len=${line.length}")
    assert(line.contains("\"qenc\":\"sorted-names\""), line.take(200))
    val vs = (JsonMethods.parse(line) \ "qv": @unchecked) match {
      case JArray(a) => a.map { case JInt(v) => v.toInt; case x => fail(x.toString) }
    }
    assert(vs.length == 400)
    // position = rank of the name in ascending sort; the failure sentinel
    // must sit exactly at its query's sorted position
    val failedName = qs(7)._1
    val pos = qs.map(_._1).sorted.indexOf(failedName)
    assert(vs(pos) == -10, s"sentinel not at sorted position $pos")
    assert(vs.count(_ == -10) == 1)
  }

  test("past the array mode's reach, trimming is explicit and failures survive it") {
    val qs = surface(600).zipWithIndex.map { case ((n, v), i) =>
      n -> (if (i == 599) -1.0 else v)
    }
    val line = BenchStdout.render(qs, qs.map(_._2).max * qs.size, 0.0,
      "/root/testdata/sf0.1")
    assert(line.length <= 1850, s"len=${line.length}")
    assert(line.contains("\"trimmed\":"), "600 queries cannot fit — must trim explicitly")
    assert(line.contains(":-10,") || line.contains(":-10}"),
      "the failed query's sentinel must never be trimmed")
  }
}
