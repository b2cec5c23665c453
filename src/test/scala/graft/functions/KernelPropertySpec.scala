package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopKAgg

/** Seeded-random property checks of the native kernels against naive
  * reference implementations, and of the TopKAgg merge law under arbitrary
  * partitionings/merge orders. Pure JVM — no Spark session — so these run
  * thousands of cases cheaply. (scalacheck's scalatest bridge isn't on the
  * frozen classpath; generation is hand-rolled, same pattern as
  * GridPairsSpec.)
  */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(4242)

  // Java regex \s — the kernels' whitespace definition
  private val Ws = " \t\n\u000B\f\r"

  // alphabet exercising every branch: all 6 Java-\s whitespace chars,
  // letters/digits, punctuation, and whole stopword/marker tokens
  private def randomText(): String = {
    val pieces = Seq("the", "a", "of", "de", "el", "you", "cat", "x!",
      "ab,cd", "1234", "longertoken9", "!?;", "", "q")
    val ws = Seq(" ", "\t", "\n", "\u000B", "\f", "\r", "  ", "")
    (0 until rnd.nextInt(12)).map { _ =>
      pieces(rnd.nextInt(pieces.length)) + ws(rnd.nextInt(ws.length))
    }.mkString
  }

  private def naiveTokens(s: String): Seq[String] =
    s.split(s"[$Ws]+").filter(_.nonEmpty).toSeq

  test("kernels fold CODE POINTS and tokenize whitespace RUNS (unicode/artifact edges)") {
    import graft.functions.{NativeKernels => K}
    def u(s: String) = UTF8String.fromString(s)
    def naiveCp(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    // a supplementary character is ONE fold step with its code point —
    // the oracle's unicode() semantics, not two UTF-16 surrogate units
    assert(K.polyHash(u("🚀")) == 0x1F680L)
    for (s <- Seq("café", "数据 处理", "a🚀b", "naïve résumé", "", "x"))
      assert(K.polyHash(u(s)) == naiveCp(s), s)
    // tokenization = maximal non-ws runs: no '' artifacts on leading/
    // trailing non-space whitespace, per-token fold is code-point-based
    val th = K.tokenHashes(u("\tfoo 🚀\n")).toLongArray()
    assert(th.toSeq == Seq(naiveCp("foo"), 0x1F680L))
    assert(K.tokenHashes(u("\n\t \n")).numElements() == 0)
    // textStats lengths are code points: "café" is a 4-char token
    val st = K.textStats(u("café 🚀")).toLongArray()
    assert(st(0) == 6, st.mkString(","))  // total chars incl. the space
    assert(st(1) == 2 && st(2) == 5, st.mkString(","))  // 2 tokens, len 4+1
    // BPE segmentation starts per code point: an emoji is ONE segment
    val b = K.bpeStats(u("🚀🚀 ab"),
      new java.util.HashMap[String, Integer](), Array.empty[Array[String]])
      .toLongArray()
    assert(b(0) == 2, b.mkString(","))  // 2 tokens
    assert(b(1) == 4, b.mkString(","))  // pieces: [🚀,🚀] + [a,b]
  }

  test("textStats == naive reference on 2000 random strings") {
    val stop = Set("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")
    for (_ <- 1 to 2000) {
      val s = randomText()
      val got = NativeKernels.textStats(UTF8String.fromString(s)).toLongArray.toSeq
      val toks = naiveTokens(s)
      val want = Seq(
        s.length.toLong,
        toks.length.toLong,
        toks.map(_.length.toLong).sum,
        toks.count(stop).toLong,
        s.count(c => !Ws.contains(c) && !c.isLetterOrDigit).toLong,
        toks.map(t => (t.length + 3L) / 4L).sum)
      assert(got == want, s"text=${s.map(c => if (c < ' ') '?' else c)}")
    }
  }

  test("langMarkerCounts == naive per-language filters on 2000 random strings") {
    val sets = NativeKernels.LangTokenMarkers.map(_._2.toSet)
    val scripts = NativeKernels.LangScriptRanges.map(_._2)
    // mix genuine multi-script fragments into the random text so the
    // script-range counting branch is actually exercised
    val fragments = Seq("", "数据", "データ", "테스트", "данных", "بيانات",
      "δοκιμή", "डेटा", "ทดสอบ", "🚀", "café")
    for (_ <- 1 to 2000) {
      val s = randomText() + fragments(rnd.nextInt(fragments.length))
      val got = NativeKernels.langMarkerCounts(UTF8String.fromString(s)).toLongArray.toSeq
      val toks = naiveTokens(s)
      // naive script model over CODE POINTS (all ranges are BMP, so this
      // equals the kernel's UTF-16 walk — the documented invariant)
      val cps = s.codePoints().toArray
      val want = sets.map(set => toks.count(set).toLong) ++
        scripts.map(rs => cps.count(c => rs.exists { case (lo, hi) =>
          c >= lo && c <= hi }).toLong)
      assert(got == want, s"text=$s")
    }
  }

  test("TopKAgg: any partitioning + any merge order == global sort take k") {
    for (trial <- 1 to 500) {
      val k = 1 + rnd.nextInt(5)
      val agg = new TopKAgg(k)
      val n = rnd.nextInt(30)
      val rows = Seq.fill(n)((rnd.nextInt(8).toDouble, rnd.nextLong(1000L)))
        .distinctBy(_._2) // unique ids (the aggregate's contract)
      // random partitioning into up to 5 buffers, each reduced in input order
      val parts = rows.groupBy(_ => rnd.nextInt(1 + rnd.nextInt(5))).values.toSeq
      val reduced = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      // fold the partials in shuffled order
      val merged = rnd.shuffle(reduced).foldLeft(agg.zero)(agg.merge)
      val want = rows.sortBy { case (sc, i) => (-sc, i) }.take(k).toVector
      assert(merged == want, s"trial $trial k=$k n=$n")
      // idempotency: re-merging already-included elements is a no-op
      if (reduced.nonEmpty)
        assert(agg.merge(merged, reduced.head.filter(merged.contains)) == merged)
    }
  }

  test("sortedIntersectSize == set intersection on random sorted-distinct arrays") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    for (_ <- 1 to 2000) {
      val a = Seq.fill(rnd.nextInt(20))(rnd.nextLong(30L)).distinct.sorted
      val b = Seq.fill(rnd.nextInt(20))(rnd.nextLong(30L)).distinct.sorted
      val got = NativeKernels.sortedIntersectSize(
        ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray))
      assert(got == a.toSet.intersect(b.toSet).size)
    }
  }

  test("intDot == BigInt dot on 2000 random byte arrays (no silent overflow)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    for (_ <- 1 to 2000) {
      val n = rnd.nextInt(80)
      val a = Array.fill(n)((rnd.nextInt(256) - 128).toByte)
      val b = Array.fill(n)((rnd.nextInt(256) - 128).toByte)
      val got = NativeKernels.intDot(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      val want = a.zip(b).map { case (x, y) => BigInt(x.toInt) * BigInt(y.toInt) }.sum
      assert(BigInt(got) == want)
    }
  }

  test("termCounts == naive token equality counts on 2000 random strings") {
    val terms = Array("the", "cat", "1234", "q", "absent")
    for (_ <- 1 to 2000) {
      val s = randomText()
      val got = NativeKernels.termCounts(UTF8String.fromString(s), terms)
        .toLongArray.toSeq
      val toks = naiveTokens(s)
      val want = terms.toSeq.map(t => toks.count(_ == t).toLong)
      assert(got == want, s"text=${s.map(c => if (c < ' ') '?' else c)}")
    }
  }

  test("repetitionStats == naive reference on 2000 random strings") {
    val P = 1000000007L
    for (_ <- 1 to 2000) {
      val s = randomText()
      val got = NativeKernels.repetitionStats(UTF8String.fromString(s))
        .toLongArray.toSeq
      val th = naiveTokens(s).map { t =>
        t.foldLeft(0L)((acc, c) => (acc * 31L + c) % P)
      }
      val bigrams = th.sliding(2).filter(_.length == 2)
        .map(p => (p(0) * 31L + p(1)) % P).toSeq
      val want = Seq(
        th.length.toLong,
        th.distinct.length.toLong,
        if (th.isEmpty) 0L else th.groupBy(identity).values.map(_.size).max.toLong,
        math.max(th.length - 1, 0).toLong,
        bigrams.distinct.length.toLong)
      assert(got == want, s"text=${s.map(c => if (c < ' ') '?' else c)}")
    }
  }
}
