package graft

/** Diagnostic main (test scope, never shipped): per-query executed-plan
  * node counts — shuffle exchanges, broadcast exchanges, windows — the
  * numbers ShuffleAuditSpec / PlanShapeSpec pin. Run with
  * `sbt "Test/runMain graft.PlanAudit [substring]"` after a plan-shape
  * change to re-audit the bounds instead of guessing them.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession(4, "graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val filter = args.headOption.getOrElse("")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.contains(filter))
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, "/root/testdata/sf0.001")
            .queryExecution.executedPlan.toString
          val sh = "Exchange".r.findAllIn(plan).length -
            "BroadcastExchange".r.findAllIn(plan).length
          val bc = "BroadcastExchange".r.findAllIn(plan).length
          val win = "Window".r.findAllIn(plan).length
          println(f"$name%-28s shuffles=$sh%2d broadcasts=$bc%2d windows=$win%2d")
          if (args.length > 1 && args(1).nonEmpty)
            plan.linesIterator.filter(_.contains(args(1)))
              .foreach(l => println("    " + l.trim.take(800)))
        } catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
        spark.catalog.clearCache()
        CheckpointUtil.releaseStragglers()
      }
  }
}
