package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Write-side layout decisions and non-parquet ingestion seams.
  *
  * The reference (ispras/pu4spark) has no I/O layer — ingestion is the
  * caller's job (reference README.md:74-77) — so [[graft.Tables]] is the
  * read seam and this module is the WRITE seam: how a 100 TB corpus should
  * be laid out so that every downstream graft query scans the minimum.
  *
  * Three layout levers, in the order they pay off at scale:
  *
  *  1. '''Partition columns''' ([[writePartitioned]]): directory-level
  *     pruning. A predicate on the partition column never opens non-matching
  *     files — the scan's `PartitionFilters` handles it at listing time.
  *     Right for low-cardinality columns queries slice by (date, source,
  *     language). Wrong for high-cardinality keys (millions of tiny dirs
  *     kill the file listing and the driver's memory).
  *  2. '''Bucketing''' ([[writeBucketed]]): co-located joins and
  *     aggregations. Both sides bucketed+sorted on the join key make a
  *     sort-merge join exchange-free — the dominant repeated cost of a
  *     fact-fact join becomes a one-time write-side decision
  *     (plan-asserted in BucketedJoinSpec/LayoutsSpec).
  *  3. '''Sort within files''' (`sortCols`): row-group min/max statistics
  *     turn point/range predicates on the sort column into row-group skips
  *     (parquet predicate pushdown shows as `PushedFilters`).
  */
object Layouts {

  /** Parquet partitioned by `partitionCols` (directory pruning). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed + sorted managed table: the co-located join layout. Spark's
    * file-source bucketing requires `saveAsTable` (bucket metadata lives in
    * the catalog, not the files).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int,
                    sortCols: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    val w = df.write.bucketBy(nBuckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .mode(mode).saveAsTable(table)
  }

  /** Small-files compaction for a bucketed table, layout-preserving: after
    * N append passes every bucket holds ≥N files (each append lands one
    * file per bucket per task), and at some point open-file overhead beats
    * pruning gains. Reading a bucketed table plans ONE partition per
    * bucket, so rewriting it under the SAME bucket spec emits one file per
    * bucket — and because the bucket function, count, and sort are
    * unchanged, serving reads keep pruning and the contents are
    * row-identical (gate- and spec-pinned). Compaction targets a NEW table
    * then swaps at the catalog: Spark (correctly) refuses to overwrite a
    * table it is reading, and the swap keeps the index serveable for the
    * whole rewrite — the operational requirement of a live index.
    *
    * The explicit repartition clusters rows by `hash(key) % nBuckets` —
    * the SAME function the bucket spec uses — so every bucket's rows land
    * whole in one write task and each task emits one file per bucket it
    * holds: ≤ nBuckets files total. The partition expression is the
    * DERIVED bucket id, not the raw key, deliberately: a bucketed-table
    * scan advertises hash-partitioning on the key, so a repartition on the
    * key itself is optimized away as redundant — while the actual read is
    * packed by FILE (one task spanning several buckets' small files is the
    * exact state being compacted), and the elision reproduces the
    * fragmentation in the output. That one bucket-aligned exchange is the
    * cost of compaction; it is the only shuffle in the rewrite. */
  def compactBucketed(spark: SparkSession, from: String, to: String, key: String,
                      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    writeBucketed(
      spark.table(from).repartition(nBuckets, pmod(hash(col(key)), lit(nBuckets))),
      to, key, nBuckets, sortCols)
  }

  /** CSV with an EXPLICIT schema. Schema inference is a full extra pass over
    * the data and types drift between runs — never acceptable at scale.
    * `mode=FAILFAST` surfaces malformed rows instead of silently nulling
    * them (`PERMISSIVE` default loses data without a trace).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.option("header", header.toString).mode("overwrite").csv(path)

  /** JSON-lines with an explicit schema — same inference/permissive caveats
    * as CSV. The schema doubles as column pruning: fields not in it are
    * never parsed (Jackson skips them), so a wide-payload corpus reads at
    * the cost of the projected fields only.
    */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Parquet union read across file sets written under DIFFERENT schema
    * versions (subdirectories of `path`): `mergeSchema` folds every
    * footer's schema into one superset, columns absent in an older file
    * read as null. This is the deliberate, bounded-cost form of schema
    * evolution — merging reads every FOOTER once at planning (not the
    * data), vs the default which trusts a single footer and silently
    * drops newer columns. Additive evolution only: a type CHANGE for an
    * existing column fails loudly at merge time instead of coercing.
    */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .option("recursiveFileLookup", "true").parquet(path)
}
