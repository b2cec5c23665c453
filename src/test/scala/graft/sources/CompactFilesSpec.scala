package graft.sources

import graft.{SparkEntry, SparkSuite, Tables}

/** `src_compact_files` invariants: the rewrite actually collapses the
  * file count and preserves content exactly. */
class CompactFilesSpec extends SparkSuite {

  test("compaction collapses 32 small files and loses no rows") {
    val rows = SparkEntry.queries("src_compact_files")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (smallFiles, smallRows, smallHash) = rows("small")
    val (compFiles, compRows, compHash) = rows("compacted")
    val n = Tables.documents(spark, sf0001).count()
    assert(smallRows == n && compRows == n)
    assert(smallHash == compHash, "content hash must survive the rewrite")
    assert(smallFiles == math.min(32L, n))
    assert(compFiles ==
      (n + SourceQueries.CompactRecordsPerFile - 1) / SourceQueries.CompactRecordsPerFile)
    assert(compFiles < smallFiles)
  }
}
