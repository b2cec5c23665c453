package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The k-NN graph + mutual-kNN clustering at 100× the driver fixture —
  * the r11 VERDICT's named gap: the two most expensive similarity queries
  * had only fixture-scale evidence. Reuses [[AnnStressSpec]]'s seeded
  * 50k-vector / 64-tight-cluster corpus (exact-repeatable, no Random) and
  * pins, with RUNTIME evidence rather than plan text:
  *
  *   1. the graph build's candidate volume is LIST-SCOPED — the join's
  *      runtime numOutputRows stays ~N·nProbe·listSize, three orders of
  *      magnitude under the N²/2 all-pairs cliff that kills 100 TB
  *      clustering;
  *   2. the executed plan runs a bounded number of real shuffles (and the
  *      corpus-sized join is shuffle-hash on cen_id, never broadcast —
  *      a corpus cannot broadcast);
  *   3. output grain is exact: every node gets exactly KGraph ranked
  *      neighbors, and on this corpus every edge stays inside its
  *      planted cluster (inter-cluster cosine ~0, intra >= ~0.9);
  *   4. mutual-kNN + pointer-doubling CC recovers the planted structure:
  *      every component is PURE (one planted cluster) and all 64
  *      clusters are represented — no false merge at 50k scale.
  */
class KnnGraphStressSpec extends SparkSuite {
  import AnnStressSpec.{Clusters, N, vecOf}

  private val KGraph = 5
  private val NProbe = 2

  private lazy val corpus: DataFrame = {
    val s = spark
    import s.implicits._
    s.range(0, N, 1, 8).map(id => (id, vecOf(id))).toDF("vec_id", "v")
      .withColumn("nrm", Dedup.l2norm(col("v")))
      .persist()
  }

  /** Sum of runtime numOutputRows over join nodes of an EXECUTED plan
    * (AQE stages unwrapped) — the real candidate volume, not a plan
    * shape claim. */
  private def joinRows(plan: SparkPlan): Long = {
    def walk(p: SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      // the suite persists the graph, so the join executes inside the
      // cache build — descend into the cached relation's plan
      case i: InMemoryTableScanExec => walk(i.relation.cachedPlan)
      case j: BaseJoinExec =>
        j.metrics.get("numOutputRows").map(_.value).getOrElse(0L) +
          j.children.map(walk).sum
      case n => n.children.map(walk).sum + n.subqueries.map(walk).sum
    }
    walk(plan)
  }

  private def walkCount(plan: SparkPlan)(pred: SparkPlan => Boolean): Int = {
    def walk(p: SparkPlan): Int = {
      val self = if (pred(p)) 1 else 0
      p match {
        case a: AdaptiveSparkPlanExec => self + walk(a.executedPlan)
        case q: QueryStageExec => self + walk(q.plan)
        case i: InMemoryTableScanExec => self + walk(i.relation.cachedPlan)
        case n => self + n.children.map(walk).sum + n.subqueries.map(walk).sum
      }
    }
    walk(plan)
  }

  test("kNN graph at 50k: exact grain, list-scoped join volume, bounded shuffles, no cross-cluster edge") {
    val g = Similarity.ivfJoinTopK(corpus, corpus, Clusters, NProbe, KGraph)
      .persist()
    val rows = g.count() // executes THIS df so ITS metrics fill
    // grain: every node emits exactly KGraph ranked neighbors (a 780-
    // vector list always has >= 5 peers)
    assert(rows == N.toLong * KGraph, s"graph rows $rows != ${N.toLong * KGraph}")
    assert(g.groupBy("query_id").count()
      .filter(col("count") =!= KGraph).count() == 0, "uneven out-degree")
    assert(g.filter(col("rank") < 1 || col("rank") > KGraph).count() == 0)
    val plan = g.queryExecution.executedPlan
    // RUNTIME candidate volume: each vector scores against its NProbe
    // probed lists (~2N/Clusters rows each, the 2x covering generator
    // skew headroom) — vs the ~1.25e9 all-pairs cliff. The bound is the
    // shape claim "cost is probe-proportional, not corpus-quadratic".
    val cand = joinRows(plan)
    val bound = N.toLong * NProbe * (4L * N / Clusters)
    info(s"runtime join rows at 50k: $cand (bound $bound, all-pairs ${N.toLong * N / 2})")
    assert(cand > 0L, "join metrics empty — the pin is vacuous")
    assert(cand <= bound, s"join volume $cand exceeds the list-scoped bound $bound")
    // the executed plan's real shuffle count stays bounded (the two join
    // sides on cen_id + TopKAgg's partial agg + presentation), and the
    // corpus-sized join is NOT a broadcast: a corpus cannot broadcast
    val nShuffles = walkCount(plan)(_.isInstanceOf[ShuffleExchangeLike])
    info(s"executed-plan shuffles: $nShuffles")
    assert(nShuffles <= 6, s"$nShuffles shuffles in the executed plan")
    assert(walkCount(plan) {
      case _: BroadcastHashJoinExec => true; case _ => false } == 0,
      "corpus-sized join planned as broadcast")
    // semantic pin: the generator's clusters are far apart, so every
    // kNN edge must stay inside its planted cluster
    val cross = g.filter(col("query_id") % Clusters =!= col("vec_id") % Clusters)
      .count()
    assert(cross == 0L, s"$cross cross-cluster edges in the 50k kNN graph")
    g.unpersist(blocking = false)
    graft.CheckpointUtil.releaseStragglers()
  }

  test("mutual-kNN clustering recovers the planted clusters at 50k: pure components, full coverage") {
    // the sim_cluster_knn composition at 100x: graph -> tau gate ->
    // mutuality semi-join -> pointer-doubling CC
    val g = Similarity.ivfJoinTopK(corpus, corpus, Clusters, NProbe, KGraph)
      .filter(col("cos") >= 0.35)
      .select(col("query_id").as("id_a"), col("vec_id").as("id_b"))
      .persist()
    val mutual = g.join(
      g.select(col("id_b").as("id_a"), col("id_a").as("id_b")),
      Seq("id_a", "id_b"), "left_semi")
    val (labels, iters) = Dedup.connectedComponentsWithStats(mutual)
    val byComp = labels
      .withColumn("planted", col("id") % Clusters)
      .groupBy(col("canonical_id"))
      .agg(countDistinct(col("planted")).as("nPlanted"),
        count(lit(1)).as("sz"))
      .persist()
    val nComps = byComp.count()
    val impure = byComp.filter(col("nPlanted") =!= 1).count()
    val covered = labels.select((col("id") % Clusters).as("planted"))
      .distinct().count()
    info(s"50k mutual-kNN CC: $nComps components in $iters rounds, " +
      s"largest ${byComp.agg(max(col("sz"))).head().getLong(0)}")
    // purity is the load-bearing claim: a single cross-cluster mutual
    // edge would weld two planted clusters into one impure component
    assert(impure == 0L, s"$impure impure components — clusters welded")
    assert(covered == Clusters.toLong, s"only $covered/$Clusters clusters present")
    assert(nComps >= Clusters.toLong, s"components $nComps < $Clusters")
    // pointer doubling converges logarithmically in the largest
    // component's DIAMETER — mutual-kNN cores here are chainy (measured:
    // 14 rounds for a 675-node largest component), so the bound is
    // log-of-n shaped, not the planted-clique 4 of DedupStressSpec
    assert(iters <= 16, s"CC took $iters rounds for N=$N")
    Seq(g, byComp).foreach(_.unpersist(blocking = false))
    graft.CheckpointUtil.releaseStragglers()
  }
}
