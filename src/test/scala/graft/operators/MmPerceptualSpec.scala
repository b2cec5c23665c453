package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Perceptual multimodal near-dup (`mm_perceptual_dedup`): the class
  * exact payload dedup misses — re-encoded copies. Pins:
  *
  *  (a) every planted byte-rotated copy is caught at L1 = 0 with
  *      `byte_identical = false` — i.e. the EXACT key (checksum) had
  *      already lost the pair, which is this operator's reason to exist;
  *  (b) the exact-dedup law itself (decodeFeatures' (n_bytes, checksum,
  *      hist_hash) key) confirms the miss: original and rotated copy land
  *      in different exact groups;
  *  (c) a LOSSY re-encode (one byte substituted within one band) is still
  *      caught through the pigeonhole bands at L1 = 2;
  *  (d) unrelated payloads do not pass the verify.
  */
class MmPerceptualSpec extends SparkSuite {

  test("rotated copies: caught perceptually, missed byte-exactly") {
    val got = MultimodalQueries.queries("mm_perceptual_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // every planted (id, id+2e7) pair for payloads long enough that the
    // rotation actually permutes (len > 7 bytes; ASCII fixture: n_chars > 7)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), length(col("text")).as("len")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val planted = docs.filter { case (id, len) => id % 11 == 0 && len > 7 }.map(_._1)
    assert(planted.nonEmpty)
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    planted.foreach { id =>
      assert(gotPairs.contains((id, id + 20000000L)), s"planted copy of $id missed")
      val row = got.find(p => p._1 == id && p._2 == id + 20000000L).get
      assert(row._3 == 0L, s"rotation must preserve the histogram: $row")
      assert(!row._4, s"rotation must break the checksum (the exact-miss class): $row")
    }
    // (b) the exact key really does lose them: group keys differ
    val base = Multimodal.mediaTable(Tables.documents(spark, sf0001))
    val copies = base.filter(pmod(col("id"), lit(11)) === 0)
      .select((col("id") + 20000000L).as("id"), col("meta"),
        concat(expr("substring(data, 8, length(data))"),
          expr("substring(data, 1, 7)")).as("data"))
    val keys = Multimodal.decodeFeatures(spark, base.unionByName(copies)).toDF()
      .select(col("id"), col("n_bytes"), col("checksum"), col("hist_hash"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    planted.foreach { id =>
      assert(keys(id) != keys(id + 20000000L),
        s"exact key caught the rotation for $id — fixture defect, rotation was identity")
    }
  }

  test("incremental arm == full arm restricted to batch-touching pairs") {
    val full = MultimodalQueries.queries("mm_perceptual_dedup")(spark, sf0001)
      .collect().map(_.toSeq)
    val incr = MultimodalQueries.queries("mm_perceptual_incremental")(spark, sf0001)
      .collect().map(_.toSeq)
    val restricted = full.filter(_.apply(1).asInstanceOf[Long] >= 20000000L)
    assert(incr.nonEmpty && incr.toSeq == restricted.toSeq)
    // the restriction is non-vacuous in BOTH directions on this fixture:
    // the full arm has batch pairs (the planted copies) and would also
    // have standing-only pairs if any exist — either way incremental must
    // never exceed full
    assert(incr.length <= full.length)
    spark.catalog.clearCache()
  }

  test("lossy in-band edit is caught through the pigeonhole bands; unrelated payloads are not") {
    val s = spark
    import s.implicits._
    // 'a' (bin 33) -> 'b' (bin 34): both bins in band 2, so bands 0/1/3
    // are intact and the pair survives banding with L1 = 2
    val payload = "the quick brown fox jumps over the lazy dog"
    val lossy = payload.replaceFirst("a", "b")
    val other = "completely different content with other letters entirely!"
    val media = Seq((1L, payload), (2L, lossy), (3L, other))
      .toDF("id", "text")
      .select(col("id"),
        struct(lit("fake/spec").as("mime"), lit(0).as("width"), lit(0).as("height")).as("meta"),
        encode(col("text"), "UTF-8").as("data"))
    val got = MultimodalQueries.perceptualPairs(
        Multimodal.decodePerceptual(spark, media).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((1L, 2L, 2L, false)), got.mkString(","))
    spark.catalog.clearCache()
  }
}
