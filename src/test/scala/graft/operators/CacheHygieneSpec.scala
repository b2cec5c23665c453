package graft.operators

/** Serving paths run forever: a per-query `persist` that nothing
  * unpersists accumulates cached blocks until the executors evict working
  * memory. This pins the serving probe's cache budget — exactly the ONE
  * deliberate corpus persist, never a second (the probe set enters the
  * plan as a collected local relation, not a cached DataFrame).
  */
class CacheHygieneSpec extends graft.SparkSuite {

  test("bucketed ANN serving leaves only the corpus persist behind — no probe-set cache leak") {
    spark.catalog.clearCache()
    graft.SparkEntry.queries("src_ivf_bucketed")(spark, sf0001)
      .write.format("noop").mode("overwrite").save()
    val cached = spark.sparkContext.getPersistentRDDs
    assert(cached.size <= 1, s"leaked caches: ${cached.values.map(_.name)}")
    spark.catalog.clearCache()
  }
}
