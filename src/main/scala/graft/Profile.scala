package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev utility (guide §1: measure first): run queries with a stage-metrics
  * listener and report, per query, the job count, stage count, task count,
  * total executor run time, shuffle bytes, and the slowest stages — the
  * numbers that say whether a query's wall-clock is scheduling overhead,
  * shuffle latency, or real compute.
  * Usage: sbt "runMain graft.Profile <query> [query...]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCED", "1m"))
      // AQE runtime SMJ->SHJ conversion: DEFAULT OFF ("0" = stock) — see
      // Bench.scala for the r17 A/B that retired the r16 128m setting.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "0"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    case class St(id: Int, name: String, tasks: Int, wallMs: Long,
                  execMs: Long, shufReadB: Long, shufWriteB: Long, inputB: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    var jobs = 0
    // listener writes and main-thread reads share stages' own monitor so
    // the snapshot after waitUntilEmpty is never torn (ADVICE r16)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        stages.synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val si = sc.stageInfo
          val m = si.taskMetrics
          val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
          stages += St(si.stageId, si.name.takeWhile(_ != '\n'), si.numTasks, wall,
            m.executorRunTime, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    for (q <- args) {
      for (round <- Seq("cold", "warm")) {
        stages.synchronized { stages.clear(); jobs = 0 }
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        CheckpointUtil.releaseStragglers()
        // drain listener events deterministically (ADVICE r16: the fixed
        // sleep could read a short buffer on a loaded box)
        org.apache.spark.sql.GraftColumnBridge.waitForListeners(spark, 10000)
        val (snap, nJobs) = stages.synchronized { (stages.toList, jobs) }
        val totTasks = snap.map(_.tasks).sum
        val totExec = snap.map(_.execMs).sum
        val totStageWall = snap.map(_.wallMs).sum
        val shufW = snap.map(_.shufWriteB).sum
        println(f"== $q [$round] wall=$wall%.2fs jobs=$nJobs stages=${snap.size} tasks=$totTasks execCpu=${totExec / 1e3}%.2fs stageWallSum=${totStageWall / 1e3}%.2fs shufWrite=${shufW / 1e6}%.1fMB")
        if (round == "warm") {
          for (s <- snap.sortBy(-_.wallMs).take(12))
            println(f"   stage ${s.id}%4d wall=${s.wallMs / 1e3}%6.2fs exec=${s.execMs / 1e3}%6.2fs tasks=${s.tasks}%4d in=${s.inputB / 1e6}%7.1fMB sr=${s.shufReadB / 1e6}%6.1fMB sw=${s.shufWriteB / 1e6}%6.1fMB  ${s.name.take(60)}")
        }
      }
    }
    spark.stop()
  }
}
