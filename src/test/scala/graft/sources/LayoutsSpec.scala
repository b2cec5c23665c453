package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{SparkSuite, Tables}

/** Layout decisions verified on the PHYSICAL PLAN, not just results: a
  * partition predicate must prune at listing time, a data predicate must
  * reach the parquet reader as a pushed filter, and schema-explicit
  * CSV/JSONL round-trips must preserve values and types exactly.
  */
class LayoutsSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("bucketed append preserves the layout; a mismatched bucket spec fails loudly") {
    import spark.implicits._
    val tbl = "graft_layouts_append_spec"
    val base = (0L until 100L).map(i => (i, i % 7)).toDF("id", "k")
    val incr = (100L until 150L).map(i => (i, i % 7)).toDF("id", "k")
    Layouts.writeBucketed(base, tbl, "k", nBuckets = 8, sortCols = Seq("k", "id"))
    Layouts.writeBucketed(incr, tbl, "k", nBuckets = 8, sortCols = Seq("k", "id"),
      mode = "append")
    assert(spark.table(tbl).count() == 150)
    // an append that would silently CORRUPT the bucket layout (different
    // bucket count -> rows hashed into the wrong files, every downstream
    // bucket-pruned read wrong) must throw instead
    intercept[Exception] {
      Layouts.writeBucketed(incr, tbl, "k", nBuckets = 4, sortCols = Seq("k", "id"),
        mode = "append")
    }
    assert(spark.table(tbl).count() == 150) // the failed append wrote nothing
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("compactBucketed: one file per bucket, contents and pruning preserved") {
    import spark.implicits._
    val tbl = "graft_layouts_compact_from"
    val out = "graft_layouts_compact_to"
    // a prior SESSION's managed-table dir outlives its (in-memory) catalog
    // entry; CTAS refuses an existing location, so clear both layers
    Seq(tbl, out).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(del); f.delete()
      }
      del(new java.io.File(Scratch.warehouseDir(spark), t))
    }
    val mk = (lo: Long, hi: Long) => (lo until hi).map(i => (i, i % 7)).toDF("id", "k")
    Layouts.writeBucketed(mk(0, 100), tbl, "k", nBuckets = 8, sortCols = Seq("k", "id"))
    Layouts.writeBucketed(mk(100, 150), tbl, "k", nBuckets = 8,
      sortCols = Seq("k", "id"), mode = "append")
    Layouts.writeBucketed(mk(150, 200), tbl, "k", nBuckets = 8,
      sortCols = Seq("k", "id"), mode = "append")
    def parquetFiles(t: String): Int = {
      val dir = new java.io.File(Scratch.warehouseDir(spark), t)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(dir).count(_.getName.endsWith(".parquet"))
    }
    val before = parquetFiles(tbl)
    assert(before >= 21, s"expected >= 3 files x 7 touched buckets, saw $before")
    Layouts.compactBucketed(spark, tbl, out, "k", nBuckets = 8, sortCols = Seq("k", "id"))
    val after = parquetFiles(out)
    // one scan partition per bucket in -> one file per touched bucket out
    assert(after <= 8 && after < before, s"$before -> $after")
    // row-identical contents, and the compacted table still bucket-prunes
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    assert(spark.table(out).collect().map(key).toSet
      == spark.table(tbl).collect().map(key).toSet)
    // a bare filter makes autoBucketedScan drop the bucketed layout as
    // "no operator benefits"; force it on to pin that the compacted table
    // still CARRIES a prunable bucket spec (the serving reads that benefit
    // are pinned elsewhere)
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(autoKey)
    val plan = try {
      spark.conf.set(autoKey, "false")
      spark.table(out).filter(col("k") === 3)
        .queryExecution.executedPlan.toString
    } finally spark.conf.set(autoKey, prev)
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined && m.get.group(1).toInt == 1, plan)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS $out")
  }

  test("partitioned write prunes directories on a partition predicate") {
    val dir = tmp("graft_part")
    val docs = Tables.documents(spark, sf0001)
    Layouts.writePartitioned(docs, dir, "source")
    val sources = docs.select("source").distinct().collect().map(_.getString(0))
    assert(sources.length > 1) // pruning is only meaningful with >1 dir

    val one = Layouts.readPartitioned(spark, dir).filter(col("source") === sources.head)
    val scan = one.queryExecution.executedPlan.collectLeaves().head.toString
    // the predicate lands in PartitionFilters (listing-time pruning),
    // NOT in PushedFilters / a post-scan Filter
    assert(scan.contains("PartitionFilters: [") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("source"), scan)
    assert(one.count() ==
      docs.filter(col("source") === sources.head).count())
  }

  test("data predicate reaches the parquet scan as a pushed filter") {
    val li = Tables.lineitem(spark, sf0001).filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val scan = li.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [") &&
      scan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("GreaterThan(l_quantity"), scan)
    // and column pruning: the read schema carries ONLY the projected columns
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity"), scan)
  }

  test("CSV round-trip with explicit schema preserves values and types") {
    val dir = tmp("graft_csv")
    val nation = Tables.nation(spark, sf0001)
    Layouts.writeCsv(nation, dir)
    val schema = nation.schema
    val back = Layouts.readCsv(spark, dir, schema)
    assert(back.schema == schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("FAILFAST surfaces malformed rows instead of silently nulling them") {
    val dir = tmp("graft_badcsv")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "bad.csv"),
      "id,score\n1,2.5\nnot_a_number,oops\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    val e = intercept[org.apache.spark.SparkException] {
      Layouts.readCsv(spark, dir, schema).collect()
    }
    // the default PERMISSIVE mode would have returned (null, null) — data
    // loss without a trace; FAILFAST names the malformed record
    assert(e.getMessage.contains("Malformed") ||
      Option(e.getCause).exists(_.getMessage.contains("Malformed")), e.getMessage)
  }

  test("JSONL round-trip; absent fields are never parsed (projected schema)") {
    val dir = tmp("graft_jsonl")
    val docs = Tables.documents(spark, sf0001).select("doc_id", "source", "text")
    Layouts.writeJsonLines(docs, dir)
    // projected read: schema without `text` — the wide column is skipped
    val slim = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType)))
    val back = Layouts.readJsonLines(spark, dir, slim)
    assert(back.schema == slim)
    assert(back.count() == docs.count())
    assert(back.agg(countDistinct("source")).head.getLong(0) ==
      docs.agg(countDistinct("source")).head.getLong(0))
  }

  test("merged parquet read unions schema vintages; old-vintage rows null the new column") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("lang"))
    val dir = java.nio.file.Files.createTempDirectory("graft_evo_").toString
    docs.filter(col("doc_id") % 2 === 0).drop("lang")
      .write.mode("overwrite").parquet(s"$dir/v1")
    docs.filter(col("doc_id") % 2 === 1)
      .write.mode("overwrite").parquet(s"$dir/v2")
    val merged = Layouts.readParquetMerged(spark, dir)
    assert(merged.schema.fieldNames.toSet == Set("doc_id", "source", "lang"))
    assert(merged.count() == docs.count())
    // exactly the v1 vintage reads null for the added column
    assert(merged.filter(col("lang").isNull && col("doc_id") % 2 =!= 0).count() == 0)
    assert(merged.filter(col("lang").isNull).count() ==
      docs.filter(col("doc_id") % 2 === 0).count())
    // and the DEFAULT single-footer read is exactly the hazard the merged
    // read exists to avoid: depending on which footer wins, the new
    // column may be silently absent — mergeSchema makes it deterministic
    val defaultRead = spark.read.option("recursiveFileLookup", "true").parquet(dir)
    assert(defaultRead.count() == docs.count())
  }
}
