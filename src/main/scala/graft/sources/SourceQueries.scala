package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-facing layout queries: the write-side levers exercised end to
  * end (write → pruned read → aggregate), not just plan-asserted. The
  * scratch dir is the JVM tmpdir, suffixed with the Spark application id:
  * two concurrent drivers on one box (a bench sweep next to a test run)
  * would otherwise interleave overwrite-and-read on the same fixed path
  * and fail, or worse, read a partially-written layout.
  */
object SourceQueries {

  /** Integer division (SQL `div`) — `/` on longs is double division. */
  private implicit class DivOps(val c: org.apache.spark.sql.Column) {
    def div(d: Long): org.apache.spark.sql.Column =
      call_function("div", c, lit(d))
  }

  /** Catalog-table scratch name (bucketed writes need saveAsTable, not a
    * path) — same stale-sweep discipline as the path variant below. */
  private def scratchTable(s: SparkSession, name: String): String = {
    val own = name + "_" + s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
    Scratch.sweepStale(Scratch.warehouseDir(s), name + "_", exclude = Set(own))
    s.sql(s"DROP TABLE IF EXISTS $own")
    own
  }

  private def scratch(s: SparkSession, name: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    // reclaim prior runs' leaked copies before writing this run's; never
    // this session's own artifact, whatever its age
    Scratch.sweepStale(tmp, s"${name}_",
      exclude = Set(s"${name}_${s.sparkContext.applicationId}"))
    s"$tmp/${name}_${s.sparkContext.applicationId}"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Partition-pruned roundtrip: events written partitioned by
    // event_type, read back with a partition predicate — the scan lists
    // only the two matching directories (PartitionFilters, pinned in
    // PlanShapeSpec); non-matching partitions are never opened. The
    // aggregate's correctness gate proves the layout roundtrip loses
    // nothing.
    "src_partition_prune" -> ((s, dir) => {
      val out = scratch(s, "graft_events_by_type")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
      Layouts.writePartitioned(ev, out, "event_type")
      Layouts.readPartitioned(s, out)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("user_id")).as("sum_user"))
        .orderBy("event_type")
    }),

    // JSONL roundtrip with an EXPLICIT projected schema: the corpus is
    // written as JSON lines and read back with a 2-field schema — fields
    // not in the schema are never parsed (Jackson skips them), so a
    // wide-payload corpus reads at the cost of the projected fields.
    // FAILFAST: a malformed line kills the job instead of nulling rows.
    "src_jsonl_schema" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val out = scratch(s, "graft_docs_jsonl")
      Layouts.writeJsonLines(
        Tables.documents(s, dir).select(col("doc_id"), col("source"), col("lang")), out)
      Layouts.readJsonLines(s, out, StructType(Seq(
          StructField("doc_id", LongType), StructField("lang", StringType))))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
        .orderBy("lang")
    }),

    // Schema EVOLUTION roundtrip — the lakehouse reality of a standing
    // corpus: half the docs were written by pipeline v1 (doc_id, source),
    // half by v2 which ADDED a lang column; one merged read unions both
    // vintages (mergeSchema folds the footers, v1 rows surface lang as
    // null) and the aggregate proves nothing is lost or fabricated:
    // per-source doc count, how many rows actually carry the new column,
    // and an id checksum across both vintages.
    "src_schema_evolution" -> ((s, dir) => {
      val out = scratch(s, "graft_docs_evolution")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("lang"))
      docs.filter(col("doc_id") % 2 === 0).drop("lang")
        .write.mode("overwrite").parquet(s"$out/v1")
      docs.filter(col("doc_id") % 2 === 1)
        .write.mode("overwrite").parquet(s"$out/v2")
      Layouts.readParquetMerged(s, out)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lang").isNotNull, 1L).otherwise(0L)).as("n_with_lang"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy("source")
    }),

    // CSV roundtrip with an EXPLICIT typed schema — no inference pass (at
    // scale inference is a full extra scan of the data, and inferred types
    // drift between runs), FAILFAST instead of PERMISSIVE's silent nulls.
    // CSV is positional, so the schema names every column (unlike the
    // JSONL read, which prunes by field name); the aggregate's gate
    // proves the typed roundtrip loses nothing.
    "src_csv_schema" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val out = scratch(s, "graft_docs_csv")
      Layouts.writeCsv(
        Tables.documents(s, dir).select(col("doc_id"), col("source"), col("lang")), out)
      Layouts.readCsv(s, out, StructType(Seq(
          StructField("doc_id", LongType), StructField("source", StringType),
          StructField("lang", StringType))))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
        .orderBy("source")
    }),

    // Bucketed AGGREGATION — the other half of what a bucketed layout
    // buys (BucketedJoinSpec pins the join half): a groupBy on the bucket
    // key plans with NO hash exchange, because the table's bucket spec
    // already guarantees key-locality per file. At 100 TB this turns
    // every recurring per-source/per-tenant rollup from a full shuffle
    // into a scan — the pre-aggregated-layout pattern. The written table
    // is re-read for the rollup so the gate proves the layout roundtrip,
    // and PlanShapeSpec pins the exchange-free plan.
    "src_bucketed_agg" -> ((s, dir) => {
      val tbl = scratchTable(s, "graft_docs_by_source")
      Layouts.writeBucketed(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        tbl, "source", nBuckets = 8, sortCols = Seq("source", "doc_id"))
      s.table(tbl)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
        .orderBy("source")
    }),

    // SNAPSHOT-POINTER atomic swap — the minimal table-format
    // transaction (what Delta/Iceberg commit logs reduce to): immutable
    // version directories plus one tiny pointer file naming the current
    // snapshot, swapped by write-temp-then-rename (atomic on a POSIX
    // dir; an object store would use a conditional put). Readers opening
    // mid-swap see EITHER v1 or v2, never a mix, and v1 stays readable
    // after the swap (time travel for free). The query commits v1,
    // swaps to v2 (a deterministic delete batch: doc_id % 10 == 7
    // dropped), and emits the accounting for v1, v2, and a read THROUGH
    // the pointer — which must equal v2 row-for-row.
    "src_snapshot_swap" -> ((s, dir) => {
      import graft.functions.NativeExpressions
      val root = scratch(s, "graft_snapshots")
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      docs.write.mode("overwrite").parquet(s"$root/v1")
      val pointer = new java.io.File(root, "CURRENT")
      def commit(version: String): Unit = {
        val tmp = new java.io.File(root, s".CURRENT.$version.tmp")
        java.nio.file.Files.writeString(tmp.toPath, version)
        java.nio.file.Files.move(tmp.toPath, pointer.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      commit("v1")
      docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
        .write.mode("overwrite").parquet(s"$root/v2")
      commit("v2")
      val current = java.nio.file.Files.readString(pointer.toPath).trim
      def snap(name: String, path: String) =
        s.read.parquet(path)
          .agg(count(lit(1)).as("n_docs"),
            NativeExpressions.polyCombine(
              sort_array(collect_list(col("doc_id")))).as("ids_hash"))
          .select(lit(name).as("snapshot"), col("n_docs"), col("ids_hash"))
      snap("current", s"$root/$current")
        .unionByName(snap("v1", s"$root/v1"))
        .unionByName(snap("v2", s"$root/v2"))
        .orderBy("snapshot")
    }),

    // Small-file COMPACTION — the table-maintenance pass every long-lived
    // lake table needs: an ingest-shaped layout (32 hash directories, one
    // tiny file each — the "too many small files" state that drowns a
    // 100 TB scan in open() calls and planner splits) rewritten into
    // record-bounded files (coalesced write, maxRecordsPerFile). Both
    // layouts are REAL writes; file counts come from listing the actual
    // artifacts, and both phases re-read their layout so the accounting
    // row proves the rewrite lost nothing. Deterministic end to end: the
    // small layout's file count is the partition-directory count, the
    // compacted one is ceil(rows / CompactRecordsPerFile).
    "src_compact_files" -> ((s, dir) => {
      import graft.functions.NativeExpressions
      val smallOut = scratch(s, "graft_small_files")
      val compactOut = scratch(s, "graft_compacted")
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), pmod(col("doc_id"), lit(32)).as("bucket"))
      Layouts.writePartitioned(docs, smallOut, "bucket")
      val small = Layouts.readPartitioned(s, smallOut)
      small.coalesce(1)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", CompactRecordsPerFile)
        .parquet(compactOut)
      val compacted = s.read.parquet(compactOut)
      def listParquet(p: String): Long =
        new java.io.File(p).listFiles((_, n) => n.endsWith(".parquet"))
          .map(_ => 1L).sum
      def smallFiles: Long = new java.io.File(smallOut)
        .listFiles((f, n) => n.startsWith("bucket=")).map(d =>
          d.listFiles((_, n) => n.endsWith(".parquet")).length.toLong).sum
      def phaseRow(phase: String, df: DataFrame, nFiles: Long): DataFrame =
        df.agg(count(lit(1)).as("n_rows"),
            NativeExpressions.polyCombine(
              sort_array(collect_list(col("doc_id")))).as("ids_hash"))
          .select(lit(phase).as("phase"), lit(nFiles).as("n_files"),
            col("n_rows"), col("ids_hash"))
      phaseRow("compacted", compacted, listParquet(compactOut))
        .unionByName(phaseRow("small", small, smallFiles))
        .orderBy("phase")
    }),

    // Z-ORDER clustering — the multi-dimensional data-skipping layout
    // (Delta/Iceberg OPTIMIZE ZORDER) Spark has no native operator for:
    // orders sorted by the bit-interleaved key of (custkey, order day),
    // both range-normalized to 10 bits from a 3-long bounds agg (a
    // constant-size driver collect at any scale). Writing in zkey order
    // makes every file/row-group a small rectangle in (customer, time)
    // space, so min/max stats prune scans filtered on EITHER dimension —
    // the locality the emitted per-bucket bounds table exhibits directly
    // (and ZOrderSpec quantifies against a one-dimensional sort). The
    // rank is the scale-path range-partition rank: the sort that would
    // feed the writer, no single-task pass.
    "src_zorder" -> ((s, dir) => {
      val ord = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_custkey").as("x"),
        (unix_micros(col("o_orderdate")) div 86400000000L).as("day"))
      val b = ord.agg(max(col("x")).as("xmax"), min(col("day")).as("dmin"),
        max(col("day")).as("dmax")).head
      val (xmax, dmin, dmax) = (b.getLong(0), b.getLong(1), b.getLong(2))
      val keyed = ord
        .withColumn("xb", (col("x") * 1024L) div (xmax + 1))
        .withColumn("yb", ((col("day") - dmin) * 1024L) div (dmax - dmin + 1))
        .withColumn("zkey", (0 until 10).map { i =>
          shiftleft(shiftright(col("xb"), i).bitwiseAND(lit(1L)), 2 * i) +
            shiftleft(shiftright(col("yb"), i).bitwiseAND(lit(1L)), 2 * i + 1)
        }.reduce(_ + _))
      graft.pu.PU.globalRankByOrder(keyed,
          Seq(col("zkey"), col("o_orderkey")), "zrank")
        .withColumn("bucket", (col("zrank") - 1) div ZBucketRows)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("xb")).as("x_lo"), max(col("xb")).as("x_hi"),
          min(col("yb")).as("y_lo"), max(col("yb")).as("y_hi"))
        .orderBy("bucket")
    })
  )

  /** Rows per Z-order "file" in the bucket-bounds table — the stand-in
    * for a parquet row group whose min/max stats drive skipping. */
  val ZBucketRows = 256L

  /** Record cap per compacted file — sized so the fixture compacts 32
    * small files into a deterministic handful (ceil(n_docs / cap)). */
  val CompactRecordsPerFile = 200L

  def oracles: Map[String, String] = Map(
    "src_partition_prune" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(user_id) AS BIGINT) AS sum_user
        |FROM events
        |WHERE event_type IN ('click', 'purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "src_csv_schema" ->
      """SELECT source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM documents
        |GROUP BY source ORDER BY source""".stripMargin,
    "src_schema_evolution" ->
      """SELECT source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_lang,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM documents
        |GROUP BY source ORDER BY source""".stripMargin,
    "src_jsonl_schema" ->
      """SELECT lang,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM documents
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "src_bucketed_agg" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "src_snapshot_swap" ->
      s"""WITH full_h AS (SELECT count(*) AS n,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), list(doc_id ORDER BY doc_id)),
         |    (a, x) -> (a*31 + x) % 1000000007) AS h FROM documents),
         |v2_h AS (SELECT count(*) AS n,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), list(doc_id ORDER BY doc_id)),
         |    (a, x) -> (a*31 + x) % 1000000007) AS h
         |  FROM documents WHERE doc_id % 10 <> 7)
         |SELECT 'current' AS snapshot, CAST(n AS BIGINT) AS n_docs, h AS ids_hash FROM v2_h
         |UNION ALL SELECT 'v1', CAST(n AS BIGINT), h FROM full_h
         |UNION ALL SELECT 'v2', CAST(n AS BIGINT), h FROM v2_h
         |ORDER BY snapshot""".stripMargin,

    "src_compact_files" ->
      s"""WITH h AS (SELECT count(*) AS n,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), list(doc_id ORDER BY doc_id)),
         |    (a, x) -> (a*31 + x) % 1000000007) AS ids_hash
         |  FROM documents),
         |f AS (SELECT count(DISTINCT doc_id % 32) AS small_files FROM documents)
         |SELECT 'compacted' AS phase,
         |  CAST((n + ${CompactRecordsPerFile - 1}) // $CompactRecordsPerFile AS BIGINT) AS n_files,
         |  n AS n_rows, ids_hash FROM h
         |UNION ALL
         |SELECT 'small' AS phase, CAST(small_files AS BIGINT) AS n_files,
         |  n AS n_rows, ids_hash FROM h CROSS JOIN f
         |ORDER BY phase""".stripMargin,
    "src_zorder" -> {
      val zterms = (0 until 10).map(i =>
        s"((xb // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
          s"((yb // ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
        .mkString(" + ")
      s"""WITH o AS (SELECT o_orderkey, o_custkey AS x,
         |  epoch_us(o_orderdate) // 86400000000 AS day FROM orders),
         |b AS (SELECT max(x) AS xmax, min(day) AS dmin, max(day) AS dmax FROM o),
         |k AS (SELECT o_orderkey,
         |  (x * 1024) // (xmax + 1) AS xb,
         |  ((day - dmin) * 1024) // (dmax - dmin + 1) AS yb
         |  FROM o CROSS JOIN b),
         |z AS (SELECT o_orderkey, xb, yb, $zterms AS zkey FROM k),
         |r AS (SELECT xb, yb,
         |  row_number() OVER (ORDER BY zkey, o_orderkey) AS zrank FROM z)
         |SELECT (zrank - 1) // $ZBucketRows AS bucket, count(*) AS n_rows,
         |  min(xb) AS x_lo, max(xb) AS x_hi, min(yb) AS y_lo, max(yb) AS y_hi
         |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin
    }
  )
}
