package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Invariants of `pipeline_delete_propagate` that the hash-exact oracle
  * can't state directly: tombstones vanish, clean packs are untouched,
  * compaction appends strictly after the standing tail, and every dirty
  * pack is fully drained (each member either deleted or repacked).
  */
class DeletePropagateSpec extends SparkSuite {

  private lazy val out =
    SparkEntry.queries("pipeline_delete_propagate")(spark, sf0001).persist()

  test("statuses partition the corpus and tombstones get no new pack") {
    val n = out.count()
    assert(n > 0)
    val byStatus = out.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet == Set("deleted", "repacked", "kept"),
      s"expected all three statuses at fixture scale, got $byStatus")
    assert(byStatus.values.sum == n)
    assert(out.filter(col("status") === "deleted" &&
      col("new_pack_id") =!= -1L).count() == 0)
  }

  test("kept docs stay in their pack; repacked docs move strictly past the old tail") {
    assert(out.filter(col("status") === "kept" &&
      col("new_pack_id") =!= col("old_pack_id")).count() == 0)
    val maxOld = out.agg(max("old_pack_id")).head.getLong(0)
    assert(out.filter(col("status") === "repacked" &&
      col("new_pack_id") <= maxOld).count() == 0)
  }

  test("pack granularity: a pack is either fully clean (all kept) or fully drained") {
    val packState = out.groupBy(col("old_pack_id"))
      .agg(sum(when(col("status") === "kept", 1).otherwise(0)).as("n_kept"),
        sum(when(col("status") =!= "kept", 1).otherwise(0)).as("n_moved"))
    assert(packState.filter(col("n_kept") > 0 && col("n_moved") > 0).count() == 0)
  }

  test("compaction pack ids are dense from the old tail + 1") {
    val maxOld = out.agg(max("old_pack_id")).head.getLong(0)
    val newIds = out.filter(col("status") === "repacked")
      .select(col("new_pack_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(newIds.nonEmpty)
    assert(newIds.head == maxOld + 1)
    assert(newIds.zip(newIds.tail).forall { case (a, b) => b == a + 1 },
      s"compaction ids not dense: ${newIds.mkString(",")}")
  }
}
