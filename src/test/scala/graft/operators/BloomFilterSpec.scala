package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.TextFunctions

class BloomFilterSpec extends SparkSuite {

  private val m = 512
  private val k = 3

  private def fps = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("source"),
      TextFunctions.fingerprint(col("text")).as("fp"))

  test("no false negatives: every inserted fingerprint is reported present") {
    val build = fps.filter(col("source").isin("src0", "src1"))
    val bloom = build.agg(new BloomFilterAgg(m, k).column(col("fp")).as("bloom"))
    val missed = build.crossJoin(broadcast(bloom))
      .filter(!BloomFilterAgg.mightContain(col("bloom"), col("fp"), m, k))
      .count()
    assert(missed == 0)
  }

  test("merge law: the filter is independent of partitioning (OR is the monoid)") {
    val build = fps.filter(col("source").isin("src0", "src1"))
    val a = build.repartition(1)
      .agg(new BloomFilterAgg(m, k).column(col("fp"))).head.getSeq[Long](0)
    val b = build.repartition(11, pmod(col("doc_id"), lit(5)))
      .agg(new BloomFilterAgg(m, k).column(col("fp"))).head.getSeq[Long](0)
    assert(a == b)
  }

  test("mightContain agrees with a driver-side recomputation of the probe bits") {
    val build = fps.filter(col("source").isin("src0", "src1"))
    val bitmap = build
      .agg(new BloomFilterAgg(m, k).column(col("fp"))).head.getSeq[Long](0).toArray
    def refContains(fp: Long): Boolean = (0 until k).forall { j =>
      val pos = BloomFilterAgg.position(fp, j, m)
      (bitmap((pos >> 6).toInt) >> (pos & 63) & 1L) == 1L
    }
    val bloom = build.agg(new BloomFilterAgg(m, k).column(col("fp")).as("bloom"))
    val rows = fps.crossJoin(broadcast(bloom))
      .select(col("fp"),
        BloomFilterAgg.mightContain(col("bloom"), col("fp"), m, k).as("got"))
      .collect()
    rows.foreach(r => assert(r.getBoolean(1) == refContains(r.getLong(0)),
      s"fp=${r.getLong(0)}"))
  }

  test("position and positionCol agree on NEGATIVE fingerprints (floorMod vs pmod)") {
    import spark.implicits._
    // the class is public API over arbitrary Long: a negative fingerprint
    // must land where the pmod-based column probe looks for it (Scala %
    // would have gone negative and desynced build from probe — ADVICE r4)
    // domain: |fp| within ~8e9 (hashA*fp must not overflow Long — beyond
    // that the ANSI column path throws; polyHash callers are in [0, P))
    val fps = Seq(-1L, -7L, -1000000007L, -8000000000L, 3L, 0L).toDF("fp")
    for (j <- 0 until k) {
      val got = fps.select(col("fp"), BloomFilterAgg.positionCol(col("fp"), j, m))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got.foreach { case (fp, want) =>
        val pos = BloomFilterAgg.position(fp, j, m)
        assert(pos == want && pos >= 0 && pos < m, s"fp=$fp j=$j: $pos != $want")
      }
    }
  }

  test("the probe plan broadcasts the bitmap and the build fingerprints — no sort-merge join") {
    val q = TrainingDataQueries.queries("pipeline_bloom")(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("false-positive rate at the demo sizing is nonzero but bounded") {
    // 512 bits / 3 probes over the 5-source build set: small enough to
    // exercise the FP path, far from saturated (all-true would be useless)
    val build = fps.filter(col("source")
      .isin("src0", "src1", "src2", "src3", "src4"))
    val bloom = build.agg(new BloomFilterAgg(m, k).column(col("fp")).as("bloom"))
    val outside = fps.join(build.select("fp").distinct(), Seq("fp"), "left_anti")
    val n = outside.count()
    val falsePos = outside.crossJoin(broadcast(bloom))
      .filter(BloomFilterAgg.mightContain(col("bloom"), col("fp"), m, k))
      .count()
    assert(falsePos < n / 2, s"$falsePos of $n outside docs flagged — filter saturated")
  }
}
