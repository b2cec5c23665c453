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
}
