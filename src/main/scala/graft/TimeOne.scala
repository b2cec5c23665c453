package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual SparkEntry queries at sf0.1 (2 runs each —
  * cold shows planning/codegen overhead, warm shows steady-state cost).
  * Usage: sbt "runMain graft.TimeOne <query> [query...]" */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args; _ <- 1 to 2) {
      val t0 = System.nanoTime()
      // noop sink, not count(): count(1) lets Catalyst prune all columns
      // and skip the actual operator work (see Bench)
      SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"$q t=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache() // match Bench: no cross-run cache reuse
      CheckpointUtil.releaseStragglers() // and no accumulating checkpoint blocks
    }
    spark.stop()
  }
}
