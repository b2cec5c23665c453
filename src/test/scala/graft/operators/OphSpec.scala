package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}
import graft.functions.NativeExpressions

/** One-permutation MinHash (OPH) with rotation densification
  * ([[graft.functions.NativeKernels.ophSignature]]): the one-pass
  * signature tier. Pins (a) bit-equality with the built-in HOF
  * formulation over the real corpus + edges, (b) the densification
  * search order against a hand-computed case, (c) the empty-set
  * sentinel, and (d) tier equivalence at the fixture: OPH pairs ==
  * classic minhash pairs == the brute-force >=0.5-Jaccard truth.
  */
class OphSpec extends SparkSuite {

  private val P = 1000000007L
  private val K = Dedup.MinHashK

  test("OphSignature == HOF formulation on corpus + edges") {
    import spark.implicits._
    def bound(arr: org.apache.spark.sql.Column)(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      element_at(transform(array(arr), a => f(a)), 1)
    // slots: min shingle hash per h mod K (NULL when empty), then the
    // densify walk as an unrolled coalesce — NULL+lit propagates NULL, so
    // term t is taken exactly when it is the first non-empty slot.
    def hofOph(shh: org.apache.spark.sql.Column) = {
      val slots = transform(sequence(lit(0), lit(K - 1)), j =>
        array_min(filter(shh, h => h % K === j)))
      bound(slots) { sm =>
        transform(sequence(lit(0), lit(K - 1)), j =>
          coalesce(
            (Seq(element_at(sm, j + lit(1))) ++
              (1 until K).map(t =>
                element_at(sm, ((j + lit(t)) % K) + lit(1)) + lit(t.toLong * P)) ++
              Seq(lit(P))): _*))
      }
    }
    val corpus = Tables.documents(spark, sf0001).select(col("text"))
      .unionAll(Seq("", "   ", "one", "a b", "a b c", "a b c d e a b c").toDF("text"))
      .withColumn("shh", NativeExpressions.shingleHashes(col("text"), 3))
    val diff = corpus
      .withColumn("nat", NativeExpressions.ophSignature(col("shh"), K))
      .withColumn("hof", hofOph(col("shh")))
      .filter(not(col("nat") === col("hof"))).count()
    assert(diff == 0)
  }

  test("densification walk: hand-computed case [5, 18]") {
    import spark.implicits._
    // raw slots: 5 -> slot 5, 18 -> slot 2, all others empty. Expected
    // out[j] = first non-empty slot t steps right (circular) + t*P.
    val expected = Seq(
      18 + 2 * P, 18 + P, 18L, 5 + 2 * P, 5 + P, 5L,
      18 + 12 * P, 18 + 11 * P, 18 + 10 * P, 18 + 9 * P, 18 + 8 * P,
      18 + 7 * P, 18 + 6 * P, 18 + 5 * P, 18 + 4 * P, 18 + 3 * P)
    val got = Seq(Seq(5L, 18L)).toDF("shh")
      .select(NativeExpressions.ophSignature(col("shh"), K).as("sig"))
      .head().getSeq[Long](0)
    assert(got == expected)
  }

  test("empty shingle set -> sentinel P in every slot (matches minhash)") {
    import spark.implicits._
    val got = Seq(Seq.empty[Long]).toDF("shh")
      .select(NativeExpressions.ophSignature(col("shh"), K).as("sig"))
      .head().getSeq[Long](0)
    assert(got == Seq.fill(K)(P))
  }

  test("fixture tier equivalence: OPH pairs == minhash pairs == brute-force truth (28)") {
    val oph = DedupQueries.queries("dedup_oph_pairs")(spark, sf0001)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = DedupQueries.queries("dedup_minhash_pairs")(spark, sf0001)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force >=0.5-Jaccard truth over all 500x499/2 doc pairs: the
    // non-equi self-join is the ORACLE side of this pin (fixture-sized
    // only; the tiers under test never do this)
    val d = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.TextFunctions.shingleHashes(col("text"), 3).as("shh"))
    val truth = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(Dedup.jaccard(col("a.shh"), col("b.shh")) >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size == 28, s"truth=${truth.size}")
    assert(oph == truth, s"oph=${oph.size} truth=${truth.size}")
    assert(mh == truth, s"mh=${mh.size} truth=${truth.size}")
  }
}
