package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.NativeExpressions

class BpeSpec extends SparkSuite {

  test("learnMerges: greedy argmax with (count desc, pair asc) tie-break, weighted pair counts") {
    // vocab "aaab" x2, "aab" x1 — round 1 counts: (a,a) 2*2+1=5, (a,b) 2+1=3
    val m = Bpe.learnMerges(Seq(("aaab", 2L), ("aab", 1L)), 2)
    assert(m.head == (("a", "a")))
    // after merging (a,a): aaab -> [aa,a,b], aab -> [aa,b]
    // round 2 counts: (aa,a) 2, (a,b) 2, (aa,b) 1 — tie between (aa,a) and
    // (a,b) breaks on the sep-joined key: "a<sep>b" < "aa<sep>a" because the
    // below-ASCII separator sorts before 'a'
    assert(m(1) == (("a", "b")))
  }

  test("learnMerges segments by code point — surrogate pairs never split") {
    // U+1F600 is a surrogate pair in UTF-16; per-char segmentation would
    // learn a lone-surrogate merge the apply kernel can never match
    val emoji = "😀"
    val m = Bpe.learnMerges(Seq((emoji + emoji, 3L)), 1)
    assert(m.head == ((emoji, emoji)))
  }

  test("learnMerges breaks ties in UTF-8 byte order, not UTF-16 code-unit order") {
    // U+10000 (UTF-8 F0 90 80 80, UTF-16 D800 DC00) vs U+E000 (UTF-8 EE 80
    // 80, UTF-16 E000): Java String order puts U+10000 first (D800 < E000),
    // DuckDB's binary collation puts U+E000 first (EE < F0)
    val supp = new String(Character.toChars(0x10000))
    val priv = "\uE000"
    val m = Bpe.learnMerges(Seq(("a" + supp, 1L), ("a" + priv, 1L)), 1)
    assert(m.head == (("a", priv)))
  }

  test("learnMerges rejects a vocabulary token containing the reserved separator") {
    intercept[IllegalArgumentException] {
      Bpe.learnMerges(Seq(("a\u0001b", 1L)), 1)
    }
  }

  test("learnMerges throws when the pair space exhausts before the requested rounds") {
    intercept[IllegalArgumentException] {
      Bpe.learnMerges(Seq(("ab", 1L)), 3) // one pair, then nothing
    }
  }

  test("bpeStats kernel: rank-order apply with multi-level merges, hand-checked") {
    import spark.implicits._
    // merges: rank1 (a,b), rank2 (ab,c) — multi-level: abc -> [ab, c] -> [abc]
    val merges = Seq(("a", "b"), ("ab", "c"))
    val got = Seq("abc xabcy ab c q").toDF("text")
      .select(NativeExpressions.bpeStats(col("text"), merges).as("b"))
      .head().getSeq[Long](0)
    // tokens: abc -> [abc]; xabcy -> [x, ab, c, y] -> [x, abc, y];
    // ab -> [ab]; c -> [c]; q -> [q]   => 4 tokens? no: 5 tokens, pieces 1+3+1+1+1 = 7
    assert(got(0) == 5L)
    assert(got(1) == 7L)
    // hash = ordered base-31 combine of piece polyHashes — recompute by hand
    val P = 1000000007L
    def phs(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c) % P)
    val pieces = Seq("abc", "x", "abc", "y", "ab", "c", "q")
    val want = pieces.foldLeft(0L)((a, p) => (a * 31 + phs(p)) % P)
    assert(got(2) == want)
  }

  test("bpeStats of empty and whitespace-only text is all zeros") {
    import spark.implicits._
    val merges = Seq(("a", "b"))
    val rows = Seq("", "   ").toDF("text")
      .select(NativeExpressions.bpeStats(col("text"), merges).as("b"))
      .collect().map(_.getSeq[Long](0))
    rows.foreach(r => assert(r == Seq(0L, 0L, 0L)))
  }

  test("pipeline_bpe produces pieces for every token and is rerun-deterministic") {
    val q = graft.SparkEntry.queries("pipeline_bpe")
    val a = q(spark, sf0001).collect()
    val b = q(spark, sf0001).collect()
    assert(a.nonEmpty)
    assert(a.toSeq == b.toSeq)
    // every token yields at least one piece and merges can only shrink:
    // n_tokens <= n_pieces <= total chars
    a.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1)) // n_pieces >= n_tokens
    }
  }

  test("utf8Compare: allocation-free code-point walk == UTF-8 byte-array order") {
    // the reference semantics the fast path must preserve exactly
    def byteCompare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    val rnd = new scala.util.Random(777)
    // alphabet straddling every UTF-8 width boundary and the UTF-16
    // disagreement zone: ASCII, 2/3-byte BMP, U+E000 private use (3-byte,
    // AFTER supplementary in UTF-16 order), supplementary (4-byte)
    val cps = Array(0x41, 0x42, Bpe.Sep.toInt, 0x7F, 0x80, 0x7FF, 0x800,
      0xE000, 0xFFFD, 0x10000, 0x10FFFF)
    def randStr(): String = {
      val sb = new java.lang.StringBuilder
      (0 until rnd.nextInt(6)).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      sb.toString
    }
    (0 until 20000).foreach { _ =>
      val (a, b) = (randStr(), randStr())
      assert(Integer.signum(Bpe.utf8Compare(a, b)) == Integer.signum(byteCompare(a, b)),
        s"diverged on ${a.codePoints().toArray.toSeq} vs ${b.codePoints().toArray.toSeq}")
    }
  }
}
