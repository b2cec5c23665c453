package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSuite, Tables}

/** The COMBINED index lifecycle under failure, in one spec: PQ-coded
  * streaming ingest with a forced mid-stream foreachBatch retry, a
  * mid-stream compaction snapshot, continued ingest with a second retry —
  * and [[StreamingDedup.annServePq]] serving THROUGHOUT, every answer
  * equal to the batch IVF-PQ twin over exactly the rows ingested so far.
  * The single-step specs (ingest==rebuild, replay idempotence, compaction
  * layout, serve==batch) each pass alone; this is the composition, where
  * a replay that half-applies, a compaction that drops the bucket spec,
  * or an ingest column-order drift would surface as a serving mismatch.
  */
class ReplayLifecycleSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def dropWithDir(tbl: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    def del(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(del); f.delete()
    }
    del(new java.io.File(graft.sources.Scratch.warehouseDir(spark), tbl))
  }

  private def parquetFiles(tbl: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(graft.sources.Scratch.warehouseDir(spark), tbl))
      .count(_.getName.endsWith(".parquet"))
  }

  test("ingest+retry -> compact mid-stream -> continued ingest+retry, PQ serving == batch throughout") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Similarity

    val corpus = Similarity.prepare(Tables.embeddings(spark, sfDir)).persist()
    val cents = Similarity.collectCentroids(Similarity.centroids(corpus, 16))
    // first-16 codebook — the same rule ivfPqTopK's batch twin derives
    // internally, so serving and twin quantize identically
    val codebook: Seq[Seq[Double]] = cents.map(_._2)
    val M = 8
    val tbl = "graft_lifecycle_ingest"
    val tblC = "graft_lifecycle_compact"
    dropWithDir(tbl)
    dropWithDir(tblC)

    // 4 ingest batches of 125 ids in vec_id order: after batch b the table
    // holds exactly vec_id < 125*(b+1), so every serving phase has an
    // exact batch twin over a plain prefix filter
    val rows = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val batches = rows.grouped(125).toSeq
    assert(batches.size == 4)

    val src = MemoryStream[(Long, Seq[Float])]
    val ingest = StreamingDedup.ivfIngest(
      src.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      tbl, cents, nBuckets = 16, codebook = Some((codebook, M))).start()

    def replay(i: Int): Unit = StreamingDedup.ivfIngestBatch(
      batches(i).toSeq.toDF("vec_id", "embedding"), batchId = i.toLong,
      "vec_id", "embedding", tbl, cents, nBuckets = 16,
      codebook = Some((codebook, M)))

    def tableState(t: String): (Long, Set[(Long, Long, String)]) =
      (spark.table(t).count(),
        spark.table(t).select("vec_id", "cen_id", "codes").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Any](2).mkString(","))).toSet)

    def serve(t: String): (Set[(Long, Long, Long, Double)], Seq[String]) = {
      val qs = MemoryStream[(Long, Seq[Float])]
      val plans = scala.collection.mutable.ArrayBuffer.empty[String]
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
      val sq = StreamingDedup.annServePq(
          qs.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
          t, cents, codebook, m = M, nProbe = 4, candidates = 32, k = 10) { (df, _) =>
        plans += df.queryExecution.executedPlan.toString
        got ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      }.start()
      qs.addData(rows.filter(_._1 < 6).toSeq)
      sq.processAllAvailable()
      sq.stop()
      (got.toSet, plans.toSeq)
    }
    def want(c: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
      Similarity.ivfPqTopK(c, col("vec_id") < 6, 16, 4, 16, M, 32, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    def assertPruned(plans: Seq[String]): Unit = plans.foreach { p =>
      val ms = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findAllMatchIn(p).toSeq
      assert(ms.size >= 2, p) // coarse ADC scan AND the rescore scan
      ms.foreach(m => assert(m.group(1).toInt < m.group(2).toInt, m.matched))
      assert(!p.contains("SortMergeJoin"), p)
    }

    // ---- phase 1: ingest half the corpus, force a batch-1 retry
    batches.take(2).foreach { b => src.addData(b.toSeq); ingest.processAllAvailable() }
    val afterHalf = tableState(tbl)
    replay(1) // at-least-once delivery: the replay must change NOTHING
    assert(tableState(tbl) == afterHalf, "batch-1 replay was not idempotent")

    val halfWant = want(corpus.filter(col("vec_id") < 250))
    assert(halfWant.nonEmpty)
    val (gotHalf, plansHalf) = serve(tbl)
    assert(gotHalf == halfWant, "serving the half-built index != batch twin over the prefix")
    assertPruned(plansHalf)

    // ---- phase 2: compact the live table into a serving snapshot
    val filesBefore = parquetFiles(tbl)
    graft.sources.Layouts.compactBucketed(spark, tbl, tblC, "cen_id",
      nBuckets = 16, sortCols = Seq("cen_id", "vec_id"))
    val filesAfter = parquetFiles(tblC)
    assert(filesAfter <= 16 && filesAfter < filesBefore, s"$filesBefore -> $filesAfter")
    val (gotC, plansC) = serve(tblC)
    assert(gotC == halfWant, "compacted snapshot serves different answers")
    assertPruned(plansC)

    // ---- phase 3: the stream keeps ingesting past the compaction; force
    // a retry of the FINAL batch, then the full-corpus serve
    batches.drop(2).foreach { b => src.addData(b.toSeq); ingest.processAllAvailable() }
    ingest.stop()
    val afterFull = tableState(tbl)
    replay(3)
    assert(tableState(tbl) == afterFull, "batch-3 replay was not idempotent")

    // maintained table == one-shot coded rebuild, codes included
    val rebuilt = Similarity.ivfAssignWith(corpus, cents)
      .withColumn("codes",
        graft.functions.NativeExpressions.pqEncode(col("v"), codebook, M))
      .select("vec_id", "cen_id", "codes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Any](2).mkString(","))).toSet
    assert(afterFull._2 == rebuilt && afterFull._1 == rebuilt.size)

    val fullWant = want(corpus)
    assert(fullWant != halfWant, "fixture too small: full == prefix answers")
    val (gotFull, plansFull) = serve(tbl)
    assert(gotFull == fullWant, "serving after the full lifecycle != batch twin")
    assertPruned(plansFull)

    dropWithDir(tbl)
    dropWithDir(tblC)
    corpus.unpersist()
  }
}
