package graft.operators

/** Byte-pair-encoding merge-table LEARNING — classic greedy BPE over the
  * corpus's token-frequency histogram (the form every BPE trainer uses:
  * learning never touches the corpus again after the one vocabulary
  * aggregation; at 100 TB the histogram is millions of rows where the
  * corpus is trillions, and a frequency cap bounds the driver collect).
  *
  * Per round: count adjacent segment pairs across the vocabulary
  * (weighted by token frequency, overlapping occurrences each counted),
  * take the single best pair — ties broken by the sep-joined pair key
  * ascending, which for a below-ASCII separator equals (left, right)
  * component order — and merge its non-overlapping occurrences
  * left-to-right in every segmentation. Deterministic, and replayed
  * EXACTLY by the unrolled-rounds DuckDB twin of `pipeline_bpe`, so the
  * learned table (not just the apply) sits inside the hash-exact compared
  * surface.
  *
  * Applying the table to text is the in-scan kernel
  * [[graft.functions.NativeKernels.bpeStats]] (canonical rank-order
  * apply, from scratch per token).
  */
object Bpe {

  /** Separator for pair keys — below every corpus character, so key
    * string order == (left, right) component order (the DuckDB twin uses
    * chr(1) the same way). */
  val Sep: Char = '\u0001'

  /** `rounds` greedy merges over `vocab` = (token, occurrence count).
    * Throws if the pair space exhausts before `rounds` merges — the twin
    * unrolls exactly `rounds` rounds, so a short table must fail loudly,
    * not silently desync. */
  def learnMerges(vocab: Seq[(String, Long)], rounds: Int): Seq[(String, String)] = {
    var segs: Array[(Array[String], Long)] =
      vocab.map { case (t, w) => (t.map(_.toString).toArray, w) }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    while (k < rounds) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      segs.foreach { case (seg, w) =>
        var i = 0
        while (i < seg.length - 1) {
          val key = seg(i) + Sep + seg(i + 1)
          counts.update(key, counts.getOrElse(key, 0L) + w)
          i += 1
        }
      }
      require(counts.nonEmpty, s"BPE pair space exhausted after $k merges")
      val best = counts.toSeq.minBy { case (key, c) => (-c, key) }._1
      val cut = best.indexOf(Sep.toInt)
      val (l, r) = (best.substring(0, cut), best.substring(cut + 1))
      merges += ((l, r))
      segs = segs.map { case (seg, w) => (mergePair(seg, l, r), w) }
      k += 1
    }
    merges.result()
  }

  /** Left-to-right non-overlapping merge of (l, r) in a segmentation —
    * the same fold the DuckDB twin's list_reduce performs. */
  private[operators] def mergePair(seg: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < seg.length) {
      if (j < seg.length - 1 && seg(j) == l && seg(j + 1) == r) { out += l + r; j += 2 }
      else { out += seg(j); j += 1 }
    }
    out.toArray
  }
}
