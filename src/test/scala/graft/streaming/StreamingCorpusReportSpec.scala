package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSuite, Tables}
import graft.functions.{NativeExpressions, TextFunctions}
import graft.operators.{Gopher, TrainingDataQueries}

/** The corpus health report as a LIVE ingest monitor: documents arrive in
  * micro-batches, the per-source stats aggregate in complete mode, and the
  * result equals the batch `pipeline_corpus_report` — same kernels, same
  * rules, so a dashboard over the stream and the nightly batch report can
  * never disagree. The distinct-text column is the one part exact batch
  * countDistinct can't stream; the mergeable register shape (max-rho per
  * (source, bucket), `text_hll_distinct`'s rule) streams in its place and
  * is asserted register-identical to the batch computation.
  */
class StreamingCorpusReportSpec extends AnyFunSuite with SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def docRows =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

  test("streaming per-source report in complete mode == batch pipeline_corpus_report") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def report(df: org.apache.spark.sql.DataFrame) = {
      val st = NativeExpressions.textStats(col("text"))
      val rep = NativeExpressions.repetitionStats(col("text"))
      df.select(col("source"), col("lang"), col("n_chars"),
          TextFunctions.tokenCount(col("text")).cast("long").as("ntok"),
          when(Gopher.keep(st, rep), 1L).otherwise(0L).as("gpass"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"),
          sum(col("n_chars")).as("sum_chars"), sum(col("gpass")).as("n_gopher_pass"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
    }

    val source = MemoryStream[(Long, String, String, String, Long)]
    val q = report(source.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"))
      .writeStream.format("memory").queryName("live_report")
      .outputMode("complete").start()
    docRows.grouped(200).foreach { b => source.addData(b.toSeq); q.processAllAvailable() }
    q.stop()

    val got = spark.table("live_report").orderBy("source").collect().toSeq
    val want = SparkEntry.queries("pipeline_corpus_report")(spark, sfDir)
      .drop("n_distinct_texts").orderBy("source").collect().toSeq
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("the distinct-text column streams as mergeable HLL-style registers") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = TrainingDataQueries.HllRegisters.toLong

    def registers(df: org.apache.spark.sql.DataFrame) = {
      val h = TextFunctions.fingerprint(col("text"))
      val v = call_function("div", h, lit(m))
      val rho = when(v === 0L, lit(23L))
        .otherwise(lit(1L) + bit_count(v.bitwiseAND(-v) - lit(1L)).cast("long"))
      df.select(col("source"), pmod(h, lit(m)).as("bucket"), rho.as("rho"))
        .groupBy(col("source"), col("bucket")).agg(max(col("rho")).as("max_rho"))
    }

    val source = MemoryStream[(Long, String, String, String, Long)]
    val df = source.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
    val q = registers(df).writeStream.format("memory").queryName("live_regs")
      .outputMode("complete").start()
    docRows.grouped(150).foreach { b => source.addData(b.toSeq); q.processAllAvailable() }
    q.stop()

    val got = spark.table("live_regs")
      .orderBy("source", "bucket").collect().toSeq
    val want = registers(Tables.documents(spark, sfDir))
      .orderBy("source", "bucket").collect().toSeq
    assert(want.nonEmpty)
    assert(got == want)
  }
}
