package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`). Three tiers, trading recall for scan cost:
  *
  *  1. [[bruteForceTopK]] — exact: broadcast the (small) query set against
  *     the corpus, cosine per pair, per-query top-k window. The baseline
  *     and the oracle-checkable ground truth. Cost: O(|Q|·|corpus|·dim),
  *     embarrassingly parallel, zero shuffle on the corpus side (queries
  *     are broadcast; the window partitions by query id).
  *  2. [[ivfTopK]] — IVF (inverted-file) ANN: coarse-quantize the corpus to
  *     centroids, probe only the nProbe nearest lists per query. Cost drops
  *     by ~nProbe/nCentroids. Deterministic (centroid choice + argmax
  *     tie-breaks are fixed), so this tier is ALSO oracle-checkable — rare
  *     for an ANN index. At 100 TB: centroids broadcast, assignment is
  *     map-side, lists are bucketed by centroid id so a probe is a
  *     partition-pruned read, not a scan.
  *  3. [[lshTopK]] — Spark ML BucketedRandomProjectionLSH: the built-in
  *     scale path (hash-partitioned candidate join). Seeded but its
  *     internals aren't oracle-replicable → rows-only driver check.
  *
  * The reference contains no similarity operators (SURVEY.md §2.3); this is
  * north-star surface.
  */
object Similarity {
  import Dedup.{cosine, l2norm, toDoubleArray}

  /** vec_id, v (array<double>), nrm — the working shape for cosine tiers.
    * Repartition spreads the interpreted per-pair dot products across
    * cores (bench files are single-row-group → one scan task).
    * Zero-norm vectors are dropped: cosine is undefined for them, and a
    * NaN score sorts FIRST under a descending window — one all-zero
    * embedding would otherwise poison every query's top-1. */
  def prepare(embeddings: DataFrame): DataFrame =
    embeddings.repartition(col("vec_id"))
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .filter(col("nrm") > 0.0)

  /** Exact top-k: for each query vector, the k corpus vectors with highest
    * cosine (self excluded); ties broken by vec_id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("v").as("qv"),
      col("nrm").as("qnrm"))
    val pairs = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v"), col("qnrm"), col("nrm")))
    pairs
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("cos"))
  }

  /** Deterministic coarse centroids: the first `nCentroids` corpus vectors
    * by id. A production pipeline would k-means sample-train these; the
    * IVF *machinery* (assign → bucket → probe) is identical and is what
    * this operator exercises. */
  def centroids(corpus: DataFrame, nCentroids: Int): DataFrame =
    corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cen_id"), col("v").as("cv"), col("nrm").as("cnrm"))

  /** Assign every corpus vector to its nearest centroid by cosine (argmax,
    * ties to lowest cen_id). Centroids are broadcast; assignment is
    * map-side + a per-vector window over nCentroids rows. */
  def ivfAssign(corpus: DataFrame, cents: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("v"), col("cv"), col("nrm"), col("cnrm")))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cen_id"))))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("cen_id"), col("v"), col("nrm"))

  /** Trained coarse centroids via Spark ML k-means (k-means|| init, fixed
    * seed): the production alternative to [[centroids]]. Vectors are
    * L2-normalized before training (spherical k-means), so Euclidean argmin
    * on the trained centers agrees with the cosine argmax [[ivfAssign]]
    * uses. Balanced lists mean probe cost is ~|corpus|·nProbe/nCentroids
    * even on clustered corpora, where first-N centroids can degenerate.
    * Seeded-deterministic per Spark version but not oracle-replicable
    * (like [[lshTopK]]) → rows-only driver check + recall spec. */
  def kmeansCentroids(corpus: DataFrame, nCentroids: Int, maxIter: Int = 5,
                      seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    val unit = corpus.select(
      array_to_vector(transform(col("v"), x => x / col("nrm")).cast("array<double>"))
        .as("features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(nCentroids).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features")
      .fit(unit)
    val rows = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toArray) }
    import spark.implicits._
    rows.toDF("cen_id", "cv").withColumn("cnrm", Dedup.l2norm(col("cv")))
  }

  /** IVF top-k: probe the `nProbe` nearest centroid lists per query, exact
    * cosine within the probed lists only. */
  def ivfTopK(corpus: DataFrame, queryPred: Column, nCentroids: Int,
              nProbe: Int, k: Int): DataFrame =
    ivfTopKWith(centroids(corpus, nCentroids), corpus, queryPred, nProbe, k)

  /** IVF top-k over k-means-trained lists — same probe machinery, trained
    * coarse quantizer. */
  def ivfTopKKMeans(corpus: DataFrame, queryPred: Column, nCentroids: Int,
                    nProbe: Int, k: Int): DataFrame =
    ivfTopKWith(kmeansCentroids(corpus, nCentroids), corpus, queryPred, nProbe, k)

  /** Probe machinery shared by the deterministic and k-means tiers. */
  def ivfTopKWith(cents: DataFrame, corpus: DataFrame, queryPred: Column,
                  nProbe: Int, k: Int): DataFrame = {
    val assigned = ivfAssign(corpus, cents)

    val q = corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("pcos", cosine(col("qv"), col("cv"), col("qnrm"), col("cnrm")))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("pcos").desc, col("cen_id"))))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qnrm"), col("cen_id"))

    probes.join(assigned, "cen_id") // list lookup: shuffle on cen_id only
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v"), col("qnrm"), col("nrm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("cos"))
  }

  /** Per-vector symmetric int8 scalar quantization: `qv[i] =
    * round(v[i] * 127/max|v|)` as `array<tinyint>`, with the scale kept for
    * dequantized scoring. At 100 TB this is the memory/IO lever: the coarse
    * scan reads an 8× narrower column (byte vs double per element), and the
    * integer dot is exact arithmetic — fully deterministic, so unlike most
    * ANN shortcuts this tier is oracle-checkable end to end. */
  def quantize(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("qm", array_max(transform(col("v"), x => abs(x))))
      .withColumn("qscale",
        when(col("qm") === 0.0, lit(0.0)).otherwise(lit(127.0) / col("qm")))
      .withColumn("qv",
        transform(col("v"), x => round(x * col("qscale")).cast("tinyint")))
      .drop("qm")

  /** Quantized top-k: coarse-rank by the int8·int8 dot (dequantized by the
    * two scales and norms), keep `candidates` per query, then rescore those
    * exactly from the full-precision vectors and take top-k.
    *
    * Plan shape: the coarse pass cross-joins the (broadcast, quantized)
    * queries against ONLY the slim quantized columns; full-precision
    * vectors are joined back for the ≤ |Q|·candidates survivors — the wide
    * column is never scanned for losers.
    */
  def quantizedTopK(corpus: DataFrame, queryPred: Column, candidates: Int,
                    k: Int): DataFrame = {
    val qz = quantize(corpus)
    val slim = qz.select(col("vec_id"), col("qv"), col("qscale"), col("nrm"))
    val q = qz.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("qscale").as("qqscale"), col("nrm").as("qnrm"), col("v").as("query_v"))

    val coarse = slim.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      // codegen'd exact int8 dot (graft.functions.NativeExpressions.IntDot):
      // the HOF `aggregate(zip_with(...))` form allocated + interpreted per
      // corpus×query pair and dominated this query's profile
      .withColumn("idot",
        graft.functions.NativeExpressions.intDot(col("qv"), col("qqv")))
      .withColumn("coarse",
        (col("idot").cast("double") / (col("qscale") * col("qqscale"))) /
          (col("nrm") * col("qnrm")))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("coarse").desc, col("vec_id"))))
      .filter(col("crn") <= candidates)
      .select(col("query_id"), col("query_v"), col("qnrm"), col("vec_id"))

    coarse.join(corpus.select(col("vec_id"), col("v"), col("nrm")), "vec_id")
      .withColumn("cos", cosine(col("query_v"), col("v"), col("qnrm"), col("nrm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("cos"))
  }

  /** Spark ML LSH scale path: seeded BucketedRandomProjectionLSH
    * approxSimilarityJoin then per-query top-k by actual cosine. */
  def lshTopK(embeddings: DataFrame, queryPred: Column, k: Int,
              numHashTables: Int = 4, bucketLength: Double = 4.0): DataFrame = {
    val prepared = prepare(embeddings)
      .withColumn("features", array_to_vector(col("v").cast("array<double>")))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setBucketLength(bucketLength).setSeed(42L)
    val model = lsh.fit(prepared)
    val q = prepared.filter(queryPred)
    val joined = model.approxSimilarityJoin(q, prepared, Double.MaxValue, "dist")
      .select(
        col("datasetA.vec_id").as("query_id"),
        col("datasetA.v").as("qv"), col("datasetA.nrm").as("qnrm"),
        col("datasetB.vec_id").as("vec_id"),
        col("datasetB.v").as("v"), col("datasetB.nrm").as("nrm"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v"), col("qnrm"), col("nrm")))
    joined
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("cos"))
  }
}
