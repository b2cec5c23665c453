package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Pins the parallelism gate on the ingest "spread" repartition
  * ([[Spread.ifNarrow]]): it must fire for the single-row-group fixtures
  * (one scan task would starve every other core of the signature/vector
  * kernels) and must be a NO-OP on an input whose scan already
  * parallelizes — at 100 TB the scan has thousands of splits, and an
  * unconditional repartition there is a full data-sized shuffle that buys
  * nothing. "The corpus is never shuffled" has to be literally true on
  * wide inputs.
  */
class SpreadGateSpec extends SparkSuite {

  test("narrow fixture scan: the spread fires; wide input: same DataFrame back, untouched") {
    val docs = Tables.documents(spark, sf0001)
    val target = spark.sparkContext.defaultParallelism
    assert(docs.rdd.getNumPartitions < target, "fixture unexpectedly multi-split")
    val spreadPlan = Spread.ifNarrow(docs, col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(spreadPlan.contains("Exchange"), spreadPlan)

    val wide = docs.repartition(target, col("doc_id"))
    // the gate returns the input REFERENCE — no wrapping, no new exchange
    assert(Spread.ifNarrow(wide, col("doc_id")) eq wide)
  }

  test("probe memo is per-session and weak: dead sessions' plans get evicted") {
    val docs = Tables.documents(spark, sf0001)
    Spread.ifNarrow(docs, col("doc_id"))
    val before = Spread.probeSessionCount
    // a sibling session probes the same base: its memo is its own entry,
    // never a cross-session reuse of (or eviction victim for) ours
    var other = spark.newSession()
    Spread.ifNarrow(other.read.parquet(s"$sf0001/documents.parquet"), col("doc_id"))
    assert(Spread.probeSessionCount == before + 1)
    // drop the strong references — the weak key must let the memo go.
    // Running a query set `other` as the thread-local active session, so
    // restore ours or the thread-local would pin it forever (exactly the
    // long-lived-driver leak shape the weak map exists to survive).
    // a sentinel that answers "did the JVM actually reclaim the session?"
    // separately from "did the map let it go?" — gc() is advisory, so a
    // still-reachable sentinel is an environmental cancel, not a leak fail
    val sentinel = new java.lang.ref.WeakReference(other)
    other = null
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (sentinel.get != null && System.nanoTime() < deadline) {
      val pressure = new Array[Byte](16 << 20) // nudge the collector
      pressure(0) = 1
      System.gc()
      Thread.sleep(100)
    }
    if (sentinel.get != null)
      cancel("JVM declined to reclaim the dead session within 30s — " +
        "environmental, not a probe-memo leak")
    assert(Spread.probeSessionCount == before,
      "session was reclaimed but its probe memo entry survived — the map pins it")
    // the surviving session's memo still works (no wholesale clear)
    assert(Spread.ifNarrow(docs, col("doc_id")) ne docs)
  }

  test("planKey: same-schema non-file leaves with different data never collide") {
    import spark.implicits._
    def key(df: org.apache.spark.sql.DataFrame): String =
      Spread.planKey(df.queryExecution.analyzed.canonicalized)
    val a = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val b = Seq((3L, "c"), (4L, "d")).toDF("id", "s")
    // same schema, same canonical treeString — only the data differs; a
    // collision here would silently reuse the wrong partition count the
    // day a non-file leaf is gated
    assert(key(a) != key(b))
    // and identical data still HITS the memo (no over-discrimination)
    val a2 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    assert(key(a) == key(a2))
  }

  test("similarity prepare over an already-parallel corpus plans ZERO shuffles") {
    import spark.implicits._
    val target = spark.sparkContext.defaultParallelism
    val rows = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq
    // RDD-backed input with full parallelism — the shape of a real
    // multi-split corpus scan (no exchange of its own)
    val wide = spark.sparkContext.parallelize(rows, target).toDF("vec_id", "embedding")
    val plan = Similarity.prepare(wide).queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(plan).length -
      "BroadcastExchange".r.findAllIn(plan).length
    assert(shuffles == 0, plan)
  }
}
