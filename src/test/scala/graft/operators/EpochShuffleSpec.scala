package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}

/** `pipeline_epoch_shuffle` invariants: every epoch is a full 1..N
  * permutation and no two epochs replay the same order. */
class EpochShuffleSpec extends SparkSuite {

  private lazy val ep =
    SparkEntry.queries("pipeline_epoch_shuffle")(spark, sf0001).persist()

  test("every epoch is a complete 1..N permutation of the corpus") {
    val n = Tables.documents(spark, sf0001).count()
    assert(ep.count() == n * TrainingDataQueries.NEpochs)
    val perEpoch = ep.groupBy("epoch").agg(
      count(lit(1)).as("cnt"),
      countDistinct(col("doc_id")).as("docs"),
      min("epoch_pos").as("lo"), max("epoch_pos").as("hi"),
      countDistinct(col("epoch_pos")).as("positions"))
    assert(perEpoch.filter(col("cnt") =!= n || col("docs") =!= n ||
      col("lo") =!= 1 || col("hi") =!= n || col("positions") =!= n).count() == 0)
  }

  test("epoch orders are pairwise different") {
    val e0 = ep.filter(col("epoch") === 0).select(col("doc_id"), col("epoch_pos").as("p0"))
    val e1 = ep.filter(col("epoch") === 1).select(col("doc_id"), col("epoch_pos").as("p1"))
    val agree = e0.join(e1, "doc_id").filter(col("p0") === col("p1")).count()
    // identical orders would agree on every position; independent salted
    // hashes agree only by coincidence (expected ~1 fixed point)
    assert(agree < e0.count() / 10, s"epochs 0 and 1 agree on $agree positions")
  }
}
