package graft.plans

import graft.SparkSuite

class GraftExtensionsSpec extends SparkSuite {

  test("registered SQL functions are usable from spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT graft_polyhash('hello world') AS h, " +
        "graft_token_hashes('  a  b ') AS th, " +
        "graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head
    assert(row.getLong(0) == 204910434L) // cross-checked against DuckDB
    assert(row.getSeq[Long](1) == Seq(97L, 98L))
    assert(row.getDouble(2) == 11.0)
  }

  test("signature-pipeline and stats functions are usable from spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT graft_text_stats('the cat, sat!') AS ts, " +
        "graft_lang_marker_counts('the el de') AS lc, " +
        "graft_shingle_hashes('a b c d', 3) AS sh, " +
        "graft_simhash(array(3L)) AS si, " +
        "graft_sorted_intersect_size(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS is").head
    // 'the cat, sat!': len 13, 3 tokens, 11 token chars, 1 stopword, 2 punct,
    // 3 subwords (ceil(3/4)+ceil(4/4)+ceil(4/4))
    assert(row.getSeq[Long](0) == Seq(13L, 3L, 11L, 1L, 2L, 3L))
    // 'the' hits en; 'el' + 'de' hit es; nothing else (22 langs wide now —
    // 12 token-marker + 10 script-range, all script counts 0 on ASCII)
    assert(row.getSeq[Long](1) ==
      Seq(1L, 2L) ++ Seq.fill(graft.functions.NativeKernels.LangNames.size - 2)(0L))
    assert(row.getSeq[Long](2).length == 2) // 4 tokens, width 3 → 2 shingles
    assert(row.getLong(3) == 3L) // single element: its low bits
    assert(row.getInt(4) == 2)
  }

  test("shape parameters must be literals") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes('a b', CAST(rand()*3 AS INT))").head
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
