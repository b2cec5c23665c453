package graft.operators

import graft.SparkSuite

/** Span-grain pack manifest (`pipeline_pack_spans`): the loss-mask /
  * attention-boundary contract. Pins
  *
  *  (a) '''tiling''': within every pack, spans sorted by token_start are
  *      contiguous from 0 — no overlap, no gap; every pack except the last
  *      ends exactly at [[TrainingDataQueries.PackTokens]];
  *  (b) '''conservation''': each document's span lengths sum to its token
  *      count, and the grand total equals the corpus token total;
  *  (c) '''assignment parity''': each document's FIRST span sits exactly
  *      where `pipeline_pack` says it starts (pack_id, pack_offset).
  */
class PackSpansSpec extends SparkSuite {

  test("spans tile each pack exactly and conserve every document's tokens") {
    val spans = TrainingDataQueries.queries("pipeline_pack_spans")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.nonEmpty)
    val pt = TrainingDataQueries.PackTokens

    // (a) tiling per pack
    val lastPack = spans.map(_._1).max
    spans.groupBy(_._1).foreach { case (pack, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"pack $pack must start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"pack $pack: span gap/overlap at $a -> $b")
        case _ =>
      }
      sorted.foreach { case (_, _, s, e) =>
        assert(s < e && e <= pt, s"pack $pack span bounds ($s,$e)") }
      if (pack != lastPack)
        assert(sorted.last._4 == pt, s"non-final pack $pack must fill to $pt")
    }

    // (b) conservation at doc and corpus grain
    val assigns = TrainingDataQueries.queries("pipeline_pack")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4))))
      .toMap // doc_id -> (n_tokens, pack_id, pack_offset)
    val perDoc = spans.groupBy(_._2).view.mapValues(_.map(s => s._4 - s._3).sum)
    perDoc.foreach { case (doc, tot) =>
      assert(tot == assigns(doc)._1, s"doc $doc spans must sum to its n_tokens") }
    assert(spans.map(s => s._4 - s._3).sum ==
      assigns.values.map(_._1).sum, "corpus token total conserved")

    // (c) first span of each doc == its pipeline_pack assignment
    spans.groupBy(_._2).foreach { case (doc, ss) =>
      val first = ss.minBy(s => (s._1, s._3))
      val (_, packId, off) = assigns(doc)
      assert(first._1 == packId && first._3 == off,
        s"doc $doc first span $first != assignment ($packId, $off)")
    }

    // (d) the cu_seqlens contract (pipeline_pack_attention) agrees with
    // the spans at every pack: boundary count, fill, and the folded
    // [0 ++ ordered ends] array recomputed independently
    val att = TrainingDataQueries.queries("pipeline_pack_attention")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def fold(xs: Seq[Long]): Long = // NativeKernels.polyCombine law
      xs.foldLeft(0L)((a, h) => (a * 31 + h) % 1000000007L)
    spans.groupBy(_._1).foreach { case (pack, ss) =>
      val (n, fill, h) = att(pack)
      assert(n == ss.length, s"pack $pack boundary count")
      assert(fill == ss.map(_._4).max, s"pack $pack fill")
      assert(h == fold(0L +: ss.map(_._4).sorted), s"pack $pack cu_seqlens hash")
    }
    drain()
  }

  test("incremental arm == full repack restricted to the batch, spliced mid-pack") {
    val split = TrainingDataQueries.PackIncrSplit
    val full = TrainingDataQueries.queries("pipeline_pack_spans")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val incr = TrainingDataQueries.queries("pipeline_pack_spans_incremental")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(incr.nonEmpty)
    assert(incr.sorted.toSeq == full.filter(_._2 >= split).sorted.toSeq,
      "incremental must equal the full repack's batch rows")
    // splice point in closed form: the batch's first span starts exactly
    // where the standing corpus's token total left off
    val baseTotal = full.filter(_._2 < split).map(s => s._4 - s._3).sum
    val pt = TrainingDataQueries.PackTokens
    val first = incr.minBy(s => (s._1, s._3))
    assert(first._1 == baseTotal / pt && first._3 == baseTotal % pt,
      s"first batch span $first vs baseTotal=$baseTotal")
    assert(baseTotal % pt != 0L,
      "fixture must splice MID-pack or the offset path is vacuous")
    drain()
  }

  /** The packing chain localCheckpoints its range-partitioned frame
    * (globalCumSum) — drain it so later suites' cache-budget assertions
    * never depend on this suite having run. */
  private def drain(): Unit = {
    spark.catalog.clearCache()
    graft.CheckpointUtil.releaseStragglers()
  }
}
