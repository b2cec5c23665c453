package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Property: the grid decomposition emits exactly the naive blocked
  * self-join's pair set — no duplicates, no losses — for any block/bucket
  * layout (including same-bucket pairs and singleton blocks). Seeded
  * random layouts (scalacheck's scalatest bridge isn't on the frozen
  * classpath, so generation is hand-rolled). */
class GridPairsSpec extends SparkSuite {

  test("gridBlockedPairs == naive blocked self-join on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = rnd.nextInt(61)
      val blocks = 1 + rnd.nextInt(4)
      val ids = Seq.fill(n)(rnd.nextLong(1000L)).distinct
      val df = ids.map(i => (i, (i % blocks).toString)).toDF("id", "blk")
      val naive = df.as("a").join(df.as("b"),
          col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"))
        .as[(Long, Long)].collect().toSeq
      val grid = Dedup.gridBlockedPairs(df, "blk", "id", g = 4)
        .select(col("id_a"), col("id_b"))
        .as[(Long, Long)].collect().toSeq
      assert(grid.sorted == naive.sorted, s"trial $trial n=$n blocks=$blocks")
      assert(grid.size == grid.distinct.size, s"trial $trial dup pairs")
    }
  }
}
