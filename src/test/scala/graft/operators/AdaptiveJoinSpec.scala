package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Unit pins for the shared probe-adaptive join: the arm flips at
  * EXACTLY maxRows (<=: broadcast, maxRows+1: shuffle-hash), both arms
  * agree row-for-row on every join type the call sites use, and a budget
  * at/above Int.MaxValue is rejected loudly (it would silently disable
  * the degrade by capping the probe). The call-site specs pin each
  * production frame; this suite pins the helper itself. */
class AdaptiveJoinSpec extends SparkSuite {
  import spark.implicits._

  private def big = (1L to 100L).map(i => (i, i % 7)).toDF("k", "v")
  private def small(n: Int) =
    (1L to n.toLong).map(i => (i, i * 10)).toDF("k", "w").persist()

  test("the arm flips at exactly the budget") {
    val s5 = small(5)
    val atBudget = AdaptiveJoin(big, s5, Seq("k"), "left", maxRows = 5L)
    assert(atBudget.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "n == maxRows must broadcast")
    val overBudget = AdaptiveJoin(big, s5, Seq("k"), "left", maxRows = 4L)
    assert(overBudget.queryExecution.executedPlan.toString
      .contains("ShuffledHashJoin"), "n == maxRows+1 must degrade")
    assert(atBudget.exceptAll(overBudget).count() == 0 &&
      overBudget.exceptAll(atBudget).count() == 0)
    s5.unpersist()
  }

  test("arms agree on every call-site join type") {
    val s3 = small(3)
    for (jt <- Seq("inner", "left", "left_outer", "left_anti", "left_semi")) {
      val b = AdaptiveJoin(big, s3, Seq("k"), jt, maxRows = 100L)
      val d = AdaptiveJoin(big, s3, Seq("k"), jt, maxRows = 0L)
      assert(b.exceptAll(d).count() == 0 && d.exceptAll(b).count() == 0,
        s"arms diverge for $jt")
    }
    s3.unpersist()
  }

  test("a probe-defeating budget is rejected") {
    val s1 = small(1)
    intercept[IllegalArgumentException] {
      AdaptiveJoin(big, s1, Seq("k"), "inner", maxRows = Int.MaxValue.toLong)
    }
    s1.unpersist()
  }
}
