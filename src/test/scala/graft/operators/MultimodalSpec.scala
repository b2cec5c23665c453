package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}
import graft.functions.TextFunctions

class MultimodalSpec extends SparkSuite {

  private lazy val media = Multimodal.mediaTable(Tables.documents(spark, sf0001))

  test("decode checksum over ASCII payload equals polyHash of the text") {
    val feats = Multimodal.decodeFeatures(spark, media).toDF()
    val expect = Tables.documents(spark, sf0001)
      .select(col("doc_id").as("id"),
        TextFunctions.polyHash(col("text")).as("expect_cs"),
        length(col("text")).cast("long").as("expect_len"))
    val joined = feats.join(expect, "id")
    assert(joined.filter(col("checksum") =!= col("expect_cs")).count() == 0)
    assert(joined.filter(col("n_bytes") =!= col("expect_len")).count() == 0)
    assert(joined.count() > 0)
  }

  test("frame sampling emits ceil(bytes/64) frames per video row") {
    val frames = Multimodal.sampleFrames(spark, media, "fake/src0").toDF()
      .groupBy("id").agg(count(lit(1)).as("n_frames"), max("frame_idx").as("max_idx"))
    val expect = media.filter(col("meta.mime") === "fake/src0")
      .select(col("id"), ceil(length(col("data")) / lit(64.0)).as("expect_frames"))
    val joined = frames.join(expect, "id")
    assert(joined.filter(col("n_frames") =!= col("expect_frames")).count() == 0)
    assert(joined.filter(col("max_idx") =!= col("n_frames") - 1).count() == 0)
    assert(joined.count() > 0)
  }

  test("resizeMeta caps the max dimension and preserves aspect direction") {
    val r = Multimodal.resizeMeta(media, 256)
      .select(col("resized.width").as("w"), col("resized.height").as("h"),
        col("meta.width").as("ow"), col("meta.height").as("oh"))
    assert(r.filter(col("w") > 256 || col("h") > 256).count() == 0)
    // unscaled rows keep dims
    assert(r.filter(col("ow") <= 256 && col("oh") <= 256 &&
      (col("w") =!= col("ow") || col("h") =!= col("oh"))).count() == 0)
  }

  test("payload column is pruned for metadata-only queries") {
    val plan = Multimodal.resizeMeta(media, 256)
      .select("id", "resized").queryExecution.optimizedPlan.toString
    assert(!plan.contains("encode("), s"payload not pruned:\n$plan")
  }

  test("shard manifest: contiguous shards, conservation of items and bytes") {
    val m = graft.SparkEntry.queries("mm_shard_manifest")(spark, sf0001).persist()
    val ids = m.select("shard_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids.nonEmpty && ids.head == 0L && ids == (0L until ids.length).toSeq)
    val docs = Tables.documents(spark, sf0001)
    assert(m.agg(sum("n_items")).head.getLong(0) == docs.count())
    assert(m.agg(sum("bytes_started")).head.getLong(0) ==
      docs.agg(sum(octet_length(col("text")))).head.getLong(0))
    // id ranges of consecutive shards never interleave
    val ranges = m.orderBy("shard_id")
      .select("first_id", "last_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ranges.zip(ranges.tail).forall { case ((_, l1), (f2, _)) => f2 > l1 })
  }

  test("payload dedup: every re-ingested copy is caught, canonical is the original") {
    val groups = graft.SparkEntry.queries("mm_payload_dedup")(spark, sf0001)
      .persist()
    assert(groups.count() > 0)
    assert(groups.filter(col("n_copies") < 2).count() == 0)
    // min-id canonical is always an ORIGINAL id, never a re-upload
    assert(groups.filter(col("canonical_id") >= 10000000L).count() == 0)
    // every simulated re-upload is a true content duplicate of its
    // original, so the number of docs in dup groups is at least twice the
    // re-uploaded count
    val reups = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(7)) === 0).count()
    val dupDocs = groups.agg(sum("n_copies")).head.getLong(0)
    assert(dupDocs >= 2 * reups,
      s"expected >= ${2 * reups} docs in dup groups, got $dupDocs")
  }
}
