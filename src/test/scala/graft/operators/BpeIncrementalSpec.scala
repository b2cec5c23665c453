package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.functions.NativeExpressions

/** Drift-gated incremental BPE (`pipeline_bpe_incremental`): the gate is
  * `pipeline_token_drift`'s law reduced to sum|delta_ppm| over the
  * top-64 head; below [[TrainingDataQueries.BpeDriftGatePpm]] the
  * STANDING base-trained merge table is kept, above it the table
  * retrains on the full corpus.
  *
  * Planted fixture: 64 single-char filler types (no pairs — they only
  * occupy the drift head), one 10-char chain token in every BASE doc
  * (pair weight 80 — the base merge chain), and `nZ` batch docs that are
  * single 9-char z-runs. At nZ=11 the (z,z) pair weight (11 docs x 8
  * overlapping pairs = 88) BEATS the chain's 80 under full training while
  * head drift stays ~19k ppm — so below the gate the two tables provably
  * differ, and "kept the base table" is observable in the z-run's piece
  * count, not just in the flag.
  */
class BpeIncrementalSpec extends SparkSuite {

  private val fillers = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9'))
    .take(64).map(_.toString)

  /** ids 0..99 → boundary 79: base = 80 docs (fillers + chain token),
    * batch = 20 (fillers, except the last `nZ` are pure z-runs). */
  private def corpus(nZ: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (0L until 100L).map { id =>
      val base = id <= 79
      val text =
        if (!base && id >= 100 - nZ) "zzzzzzzzz"
        else if (base) fillers.mkString(" ") + " qrstuvwxyj"
        else fillers.mkString(" ")
      (id, text)
    }.toDF("doc_id", "text")
  }

  private def run(docs: DataFrame) =
    TrainingDataQueries.bpeIncremental(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))

  /** Fresh full-corpus training, the `bpeMerges` law recomputed
    * independently. */
  private def freshPieces(docs: DataFrame): Map[Long, Long] = {
    val vocab = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("w"))
      .orderBy(col("w").desc, col("tok"))
      .limit(TrainingDataQueries.BpeVocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = Bpe.learnMerges(vocab, TrainingDataQueries.BpeRounds)
    docs.select(col("doc_id"),
        NativeExpressions.bpeStats(col("text"), merges).as("b"))
      .select(col("doc_id"), col("b").getItem(1).as("n_pieces"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  test("below the gate: the BASE table is kept, and it is observably not the full-trained one") {
    val docs = corpus(nZ = 11)
    val got = run(docs)
    assert(got.forall(!_._6), "must not retrain below the gate")
    // drift_ppm column == the independently computed frame scalar, under the gate
    val drift = TrainingDataQueries.tokenDrift(docs)
      .agg(coalesce(sum(abs(col("delta_ppm"))), lit(0L))).head.getLong(0)
    assert(got.forall(_._5 == drift) && drift < TrainingDataQueries.BpeDriftGatePpm,
      s"drift=$drift")
    // the base table knows no z merges → the z-run stays 9 pieces ...
    val zRow = got.find(_._1 == 99L).get
    assert(zRow._2 == 1L && zRow._3 == 9L, s"z-run under the base table: $zRow")
    // ... while fresh FULL training learns (z,z) first (weight 88 > 80)
    // and collapses it — the keep arm demonstrably applied the OLD table
    val fz = freshPieces(docs)(99L)
    assert(fz < 9L, s"fixture defect: full training left the z-run whole ($fz)")
  }

  test("above the gate: retrains, and retrain == fresh full training row-for-row") {
    val docs = corpus(nZ = 18) // head rates crater → drift ~122k > gate
    val got = run(docs)
    assert(got.forall(_._6), "must retrain above the gate")
    assert(got.forall(_._5 > TrainingDataQueries.BpeDriftGatePpm))
    val fresh = freshPieces(docs)
    assert(got.forall(r => fresh(r._1) == r._3),
      "retrain must equal fresh full training")
    val zRow = got.find(_._1 == 99L).get
    assert(zRow._3 < 9L, s"retrained table left the z-run unmerged: $zRow")
  }
}
