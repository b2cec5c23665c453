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
    // drain OTHER suites' tracked localCheckpoint blocks too — they show
    // in getPersistentRDDs but catalog.clearCache never touches them, so
    // without this the assertion depends on suite order
    graft.CheckpointUtil.releaseStragglers()
    graft.SparkEntry.queries("src_ivf_bucketed")(spark, sf0001)
      .write.format("noop").mode("overwrite").save()
    val cached = spark.sparkContext.getPersistentRDDs
    assert(cached.size <= 1, s"leaked caches: ${cached.values.map(_.name)}")
    spark.catalog.clearCache()
  }

  test("e2e curation chains release every cache after one straggler drain") {
    // every CurationPipeline persist/localCheckpoint is CheckpointUtil-
    // tracked, so a library caller's whole release story is ONE
    // releaseStragglers() call after materializing the result — pinned
    // here over the heaviest compositions end to end
    for (q <- Seq("pipeline_e2e_curate", "pipeline_e2e_full",
        "pipeline_e2e_incremental")) {
      spark.catalog.clearCache()
      graft.CheckpointUtil.releaseStragglers()
      graft.SparkEntry.queries(q)(spark, sf0001)
        .write.format("noop").mode("overwrite").save()
      graft.CheckpointUtil.releaseStragglers()
      // released blocks drop asynchronously (unpersist(blocking=false));
      // what must be TRUE immediately is that nothing remains registered
      // as an active cache entry holding storage
      val leaked = spark.sparkContext.getPersistentRDDs
        .filter { case (_, rdd) => rdd.getStorageLevel.useMemory ||
          rdd.getStorageLevel.useDisk }
      assert(leaked.isEmpty,
        s"$q leaked ${leaked.size} caches: ${leaked.values.map(_.name)}")
    }
    spark.catalog.clearCache()
  }
}
