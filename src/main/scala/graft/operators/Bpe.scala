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
    * not silently desync. Likewise throws on a token containing [[Sep]]:
    * the separator must sit below every corpus character (pair keys and
    * the twin's string_split both assume it), so a violation fails loudly
    * instead of silently forking pair keys. */
  def learnMerges(vocab: Seq[(String, Long)], rounds: Int): Seq[(String, String)] = {
    vocab.foreach { case (t, _) =>
      require(t.indexOf(Sep.toInt) < 0,
        "BPE vocabulary token contains the reserved separator U+0001 — " +
          "pair keys would be ambiguous (Sep must sort below every corpus character)")
    }
    // initial segmentation is per CODE POINT (surrogate pairs stay whole),
    // mirroring both the apply kernel (NativeKernels.bpeApply) and the
    // twin's character indexing — per-UTF-16-unit segmentation would learn
    // lone-surrogate merges the apply side can never match
    var segs: Array[(Array[String], Long)] =
      vocab.map { case (t, w) => (codePointSegments(t), w) }.toArray
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
      // ties broken by pair key ascending in UTF-8 BYTE order — DuckDB's
      // binary collation — not Java's UTF-16 code-unit order (the two
      // disagree when a supplementary char ties against [U+E000,U+FFFF])
      var best: String = null
      var bestC = Long.MinValue
      counts.foreach { case (key, c) =>
        if (c > bestC || (c == bestC && utf8Compare(key, best) < 0)) { best = key; bestC = c }
      }
      val cut = best.indexOf(Sep.toInt)
      val (l, r) = (best.substring(0, cut), best.substring(cut + 1))
      merges += ((l, r))
      segs = segs.map { case (seg, w) => (mergePair(seg, l, r), w) }
      k += 1
    }
    merges.result()
  }

  /** Token split into code-point segments (the same iteration
    * NativeKernels.bpeApply uses). */
  private[operators] def codePointSegments(t: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < t.length) {
      val n = Character.charCount(t.codePointAt(i))
      out += t.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Lexicographic compare of the strings' UTF-8 encodings (unsigned
    * bytes) — DuckDB's default binary collation for ORDER BY. UTF-8
    * unsigned-byte order equals code-point order, so this walks code
    * points directly instead of materializing two byte arrays per call —
    * this runs inside the per-round tie scan over the whole pair
    * histogram, where the old per-compare allocations dominated. */
  private[operators] def utf8Compare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    (a.length - i) - (b.length - j)
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
