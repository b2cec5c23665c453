package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.functions.TextFunctions

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * decoded/feature-extracted in per-partition batches.
  *
  * Design (the part that is REAL and tested):
  *  - media rows are `(id, meta struct, data binary)` — the schema shape a
  *    100 TB image/audio corpus uses (payload stays opaque to Catalyst;
  *    metadata columns prune/filter/partition normally, so a
  *    `WHERE meta.mime = 'video/fake'` never deserializes payload bytes of
  *    other rows);
  *  - processing is `Dataset[MediaRow].mapPartitions` — one JVM batch per
  *    partition (the Scala-native analogue of Python's mapInPandas batch
  *    UDFs), returning typed rows through Encoders, so downstream is
  *    ordinary columnar Spark again;
  *  - partitioning: payloads never shuffle — decode is map-side; only the
  *    small feature outputs flow onward.
  *
  * The DECODE ITSELF IS A STUB (this container has no image/audio codecs):
  * a deterministic byte-level computation stands in for "decode then
  * featurize". The stub is chosen so that, for ASCII payloads built from
  * `documents.text`, the oracle can recompute it from code points — the
  * binary path gets a hash-exact correctness gate, unusual for media code.
  */
object Multimodal {

  /** Typed media row: payload + the metadata a real pipeline carries. */
  case class MediaRow(id: Long, mime: String, width: Int, height: Int,
                      data: Array[Byte])

  /** Decoded "features": per-payload byte stats + a 16-bin histogram
    * (the stub stand-in for decode→resize→embed). */
  case class MediaFeatures(id: Long, n_bytes: Long, checksum: Long,
                           hist_hash: Long)

  case class Frame(id: Long, frame_idx: Long, frame_checksum: Long)

  /** Fake media table over documents: payload = UTF-8 bytes of `text`,
    * mime rotated by source, dimensions derived from n_chars. The payload
    * column is genuine BinaryType — everything downstream treats it as an
    * opaque blob. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("id"),
      struct(
        concat(lit("fake/"), col("source")).as("mime"),
        (col("n_chars") % 640).cast(IntegerType).as("width"),
        (col("n_chars") % 480).cast(IntegerType).as("height")).as("meta"),
      encode(col("text"), "UTF-8").as("data"))

  private val P = TextFunctions.HashMod

  /** The stub "decode": byte count, rolling checksum (same recurrence as
    * [[TextFunctions.polyHash]] — for ASCII payloads the two agree), and a
    * rolling combine of the 16-bin high-nibble byte histogram. A real
    * pipeline would replace the body with codec calls; the surrounding
    * plumbing (batching, encoders, schema) would not change. */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      var checksum = 0L
      val hist = new Array[Long](16)
      var i = 0
      while (i < r.data.length) {
        val b = r.data(i) & 0xff
        checksum = (checksum * TextFunctions.HashBase + b) % P
        hist(b >> 4) += 1
        i += 1
      }
      var histHash = 0L
      var j = 0
      while (j < 16) {
        histHash = (histHash * TextFunctions.HashBase + hist(j)) % P
        j += 1
      }
      MediaFeatures(r.id, r.data.length.toLong, checksum, histHash)
    }

  /** Perceptual decode row: the fine (64-bin, byte % 64) payload
    * histogram alongside the byte-exact checksum — the signature pair
    * `mm_perceptual_dedup` keys on. A re-ENCODED copy (bytes reordered by
    * a codec round-trip; here: a deterministic byte rotation) keeps the
    * histogram and loses the checksum, which is exactly the miss class of
    * exact payload dedup. */
  case class MediaPerceptual(id: Long, n_bytes: Long, checksum: Long,
                             hist: Array[Long])

  /** The perceptual stand-in for "decode then downsample": one byte pass
    * accumulating the rolling checksum AND the 64-bin histogram (the
    * 16-bin [[decodeBatch]] pass, refined — an aHash/dHash would
    * THRESHOLD these bins, but mean-threshold bits are degenerate on a
    * shared-alphabet corpus: measured 1673 distinct 64-bit sigs over
    * 5000 sf0.1 payloads → 3.3M banded candidate pairs, so the exact
    * bin counts themselves are the discriminative signature and the
    * near-tolerance moves to the BANDING, editdist-pigeonhole style). */
  def decodePerceptualBatch(rows: Iterator[MediaRow]): Iterator[MediaPerceptual] =
    rows.map { r =>
      var checksum = 0L
      val hist = new Array[Long](64)
      var i = 0
      while (i < r.data.length) {
        val b = r.data(i) & 0xff
        checksum = (checksum * TextFunctions.HashBase + b) % P
        hist(b % 64) += 1
        i += 1
      }
      MediaPerceptual(r.id, r.data.length.toLong, checksum, hist)
    }

  /** perceptual decode over the media table: typed mapPartitions — same
    * plumbing contract as [[decodeFeatures]] (payloads never shuffle). */
  def decodePerceptual(spark: SparkSession, media: DataFrame): Dataset[MediaPerceptual] = {
    import spark.implicits._
    media.select(col("id"), col("meta.mime").as("mime"),
        col("meta.width").as("width"), col("meta.height").as("height"), col("data"))
      .as[MediaRow]
      .mapPartitions(decodePerceptualBatch)
  }

  /** decode/feature-extract over the media table: typed mapPartitions. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("meta.mime").as("mime"),
        col("meta.width").as("width"), col("meta.height").as("height"), col("data"))
      .as[MediaRow]
      .mapPartitions(decodeBatch)
  }

  /** Stub frame sampler: every 64-byte block of a "video" payload is one
    * frame; emits (id, frame_idx, frame checksum). flatMap shape — row
    * counts change, schema stays typed. Exact mime match ("fake/src1" as a
    * prefix would also catch src10..src19 — not prefix-free). */
  def sampleFrames(spark: SparkSession, media: DataFrame, mime: String,
                   frameBytes: Int = 64): Dataset[Frame] = {
    import spark.implicits._
    media.filter(col("meta.mime") === mime)
      .select(col("id"), col("meta.mime").as("mime"),
        col("meta.width").as("width"), col("meta.height").as("height"), col("data"))
      .as[MediaRow]
      .flatMap { r =>
        r.data.grouped(frameBytes).zipWithIndex.map { case (block, idx) =>
          var cs = 0L
          var i = 0
          while (i < block.length) {
            cs = (cs * TextFunctions.HashBase + (block(i) & 0xff)) % P
            i += 1
          }
          Frame(r.id, idx.toLong, cs)
        }
      }
  }

  case class AudioChunk(id: Long, chunk_idx: Long, start_byte: Long,
                        chunk_checksum: Long)

  /** Stub audio segmentation: OVERLAPPING strided windows (`window` bytes
    * every `stride` bytes — the speech-pipeline shape: a 30 s window every
    * 10 s, here 96 bytes every 64), vs [[sampleFrames]]' disjoint blocks.
    * Same plumbing contract: payloads never shuffle, the flatMap emits only
    * the small typed chunk rows; a real pipeline swaps the checksum body
    * for a codec+featurizer call. */
  def chunkWindows(spark: SparkSession, media: DataFrame, mime: String,
                   window: Int = 96, stride: Int = 64): Dataset[AudioChunk] = {
    import spark.implicits._
    media.filter(col("meta.mime") === mime)
      .select(col("id"), col("meta.mime").as("mime"),
        col("meta.width").as("width"), col("meta.height").as("height"), col("data"))
      .as[MediaRow]
      .flatMap { r =>
        val n = r.data.length
        val nWin = if (n == 0) 0 else (n + stride - 1) / stride
        (0 until nWin).iterator.map { k =>
          val start = k * stride
          val end = math.min(start + window, n)
          var cs = 0L
          var i = start
          while (i < end) {
            cs = (cs * TextFunctions.HashBase + (r.data(i) & 0xff)) % P
            i += 1
          }
          AudioChunk(r.id, k.toLong, start.toLong, cs)
        }
      }
  }

  /** Metadata-only "resize": pure column arithmetic — no payload touch, no
    * shuffle; Catalyst prunes `data` out of the scan entirely. */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width").cast(LongType)
    val h = col("meta.height").cast(LongType)
    val m = greatest(w, h, lit(1L))
    val scale = when(m > maxDim, lit(maxDim).cast("double") / m.cast("double"))
      .otherwise(lit(1.0))
    media.withColumn("resized",
      struct(col("meta.mime").cast(StringType).as("mime"),
        floor(w.cast("double") * scale).cast(IntegerType).as("width"),
        floor(h.cast("double") * scale).cast(IntegerType).as("height")))
  }
}
