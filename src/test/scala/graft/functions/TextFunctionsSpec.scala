package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class TextFunctionsSpec extends SparkSuite {
  import TextFunctions._

  private def one[T](c: org.apache.spark.sql.Column, s: String): T = {
    import spark.implicits._
    Seq(s).toDF("text").select(c).collect().head.get(0).asInstanceOf[T]
  }

  test("tokenCount: blank→0, whitespace runs collapse") {
    assert(one[Int](tokenCount(col("text")), "") == 0)
    assert(one[Int](tokenCount(col("text")), "   ") == 0)
    assert(one[Int](tokenCount(col("text")), "a  b\tc") == 3)
  }

  test("polyHash matches the reference recurrence") {
    def ph(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    for (s <- Seq("", "a", "hello world", "the quick brown fox"))
      assert(one[Long](polyHash(col("text")), s) == ph(s))
  }

  test("wordShingles: fewer than n tokens → empty, else size-n windows") {
    assert(one[collection.Seq[String]](wordShingles(col("text"), 3), "a b").isEmpty)
    assert(one[collection.Seq[String]](wordShingles(col("text"), 3), "a b c d")
      .toSeq == Seq("a b c", "b c d"))
  }

  test("shingleHashes is distinct and sorted") {
    val h = one[collection.Seq[Long]](shingleHashes(col("text"), 2), "a b a b a").toSeq
    assert(h == h.distinct.sorted)
    assert(h.size == 2) // "a b" and "b a"
  }

  test("langId picks the dominant marker language, und on none") {
    assert(one[String](langId(col("text")), "the cat of the house is big") == "en")
    assert(one[String](langId(col("text")), "el la de que") == "es")
    assert(one[String](langId(col("text")), "xyz qrs") == "und")
  }

  test("qualityScore in [0,1] on corpus docs") {
    val bounds = graft.Tables.documents(spark, sf0001)
      .select(min(qualityScore(col("text"))), max(qualityScore(col("text"))))
      .collect().head
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
  }
}
