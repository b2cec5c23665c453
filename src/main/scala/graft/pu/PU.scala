package graft.pu

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Convenience entry points around the PU learners. */
object PU {

  /** Deterministic PU-labeling of the embeddings table (SURVEY.md §7.2):
    * rows of `posClass` with even vec_id become observed positives (1); the
    * odd-vec_id half of `posClass` is masked to unlabeled (0) along with all
    * other classes — those masked rows are the known-positive holdout for
    * separation assertions. Features: `embedding list<float>` →
    * `ml.linalg.Vector` via `array_to_vector`.
    */
  def puEmbeddings(spark: SparkSession, sfDir: String, posClass: Int = 5): DataFrame =
    Tables.embeddings(spark, sfDir)
      .withColumn("puLabel",
        when(col("label") === posClass && col("vec_id") % 2 === 0, 1).otherwise(0))
      .withColumn("holdoutPos",
        col("label") === posClass && col("vec_id") % 2 === 1)
      .withColumn("features", array_to_vector(col("embedding")))

  /** PU-labeled documents — the reference's original use case (Liu et al.
    * 2002 is a *text* PU paper; the reference README assembles text features
    * caller-side, README.md:74-89). Pipeline: Tokenizer → HashingTF → IDF →
    * features. Positive class: docs containing `posToken` (default "dup",
    * the planted near-duplicate marker, ~5% of the corpus — a realistic PU
    * rate); even doc_ids of that class are observed positives, odd ones are
    * masked to unlabeled and flagged `holdoutPos` for separation checks.
    *
    * Scale: tokenize/hash/IDF are map-side; IDF.fit is one aggregation over
    * the corpus. numFeatures=1024 keeps vectors sparse and fits far larger
    * vocabularies by hashing.
    */
  def puDocuments(spark: SparkSession, sfDir: String,
                  posToken: String = "dup"): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
    val docs = Tables.documents(spark, sfDir)
    val toks = new Tokenizer().setInputCol("text").setOutputCol("toks")
      .transform(docs)
    val tf = new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setNumFeatures(1024).transform(toks)
    val feat = new IDF().setInputCol("tf").setOutputCol("features")
      .fit(tf).transform(tf)
    feat
      .withColumn("isPos", array_contains(col("toks"), posToken))
      .withColumn("puLabel",
        when(col("isPos") && col("doc_id") % 2 === 0, 1).otherwise(0))
      .withColumn("holdoutPos", col("isPos") && col("doc_id") % 2 === 1)
      .drop("toks", "tf")
  }

  /** Rank-by-score output mode — the reference's build.gradle:118-119 pulls
    * in spark-hive "for ranking by windows", a vestige of planned
    * functionality that never shipped (SURVEY.md §2.3); provided here via a
    * plain window, no Hive involved.
    *
    * NOTE scale: an unpartitioned window is a single-task sort. Fine for
    * top-of-ranking inspection at any scale IF preceded by a score filter;
    * for full-corpus ranking at 100 TB use a sort-based global rank instead
    * (sort + per-partition offsets), or rank within partitions.
    */
  def rankByScore(df: DataFrame, scoreCol: String, tieBreak: Column,
                  rankCol: String = "rank"): DataFrame =
    df.withColumn(rankCol,
      row_number().over(Window.orderBy(col(scoreCol).desc, tieBreak)))
}
